"""Recurrent (mamba) model family: golden logits vs transformers, the
parallel-prefix-scan prefill vs sequential decode, and the engine's
recurrent-state scheduling rules (exact-extension prefix reuse, dirty
states after discarded chain tails, no context shift).

Reference parity: llama-box serves mamba GGUFs through llama.cpp's
ssm_conv/ssm_scan ops with a recurrent-state "KV" cache; this suite is
the TPU build's equivalent of those graphs' correctness guarantees.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.models import load_model
from llama_box_tpu.models.mamba import (
    copy_rec_state, init_rec_cache, rec_decode_chain, rec_prefill_batch_impl,
    rec_prefill_impl, reset_rec_slot,
)
from llama_box_tpu.server import CompletionsTask, Engine, EngineConfig
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_mamba import write_tiny_mamba
from .fixtures.make_tiny_model import build_vocab
from .test_engine import greedy, run_task


@pytest.fixture(scope="module")
def hf_setup(tmp_path_factory):
    """Tiny HF MambaForCausalLM exported to GGUF via the llama.cpp
    conversion conventions — transformers is the golden reference."""
    torch = pytest.importorskip("torch")
    from transformers import MambaConfig, MambaForCausalLM

    from .fixtures.make_tiny_mamba import (D_CONV, D_INNER, D_STATE,
                                           DT_RANK, N_EMBD, N_LAYERS)
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    hc = MambaConfig(vocab_size=len(vocab), hidden_size=N_EMBD,
                     state_size=D_STATE, num_hidden_layers=N_LAYERS,
                     conv_kernel=D_CONV, intermediate_size=D_INNER,
                     time_step_rank=DT_RANK, use_cache=False)
    hm = MambaForCausalLM(hc).eval()
    state = {k: v.detach().numpy() for k, v in hm.state_dict().items()}
    state.setdefault("lm_head.weight", state["backbone.embeddings.weight"])
    path = str(tmp_path_factory.mktemp("mamba") / "tiny_mamba.gguf")
    write_tiny_mamba(path, state=state)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return hm, path, cfg, params, tok


def test_mamba_config_detect(hf_setup):
    _, _, cfg, _, _ = hf_setup
    assert cfg.recurrent
    assert (cfg.ssm_d_conv, cfg.ssm_d_state) == (4, 8)


def test_mamba_matches_transformers(hf_setup):
    """Full-prompt prefill logits match transformers at every position
    the last position exposes, and the associative-scan prefill equals
    HF's sequential recurrence to f32 tolerance."""
    import torch
    hm, _, cfg, params, _ = hf_setup
    rng = np.random.default_rng(1)
    T = 13
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    cache = init_rec_cache(cfg, 2)
    logits, _ = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(T))
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=2e-4, rtol=1e-3)


def test_mamba_chunked_prefill_identity(hf_setup):
    """Prefill in two chunks (state carried) == one chunk."""
    _, _, cfg, params, _ = hf_setup
    rng = np.random.default_rng(2)
    toks = rng.integers(3, cfg.vocab_size, (16,)).astype(np.int32)
    cache = init_rec_cache(cfg, 1)
    full, cfull = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                   jnp.int32(0), jnp.int32(0), jnp.int32(16))
    cache2 = init_rec_cache(cfg, 1)
    _, cache2 = rec_prefill_impl(params, cfg, jnp.asarray(toks[:9]), cache2,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(9))
    part, cpart = rec_prefill_impl(params, cfg, jnp.asarray(toks[9:]),
                                   cache2, jnp.int32(0), jnp.int32(9),
                                   jnp.int32(7))
    np.testing.assert_allclose(np.asarray(part), np.asarray(full),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cpart.ssm), np.asarray(cfull.ssm),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cpart.conv),
                               np.asarray(cfull.conv), atol=1e-5, rtol=1e-5)


def test_mamba_padded_chunk_matches_exact(hf_setup):
    """A bucket-padded chunk (n_valid < T) must produce the same logits
    and states as the exact-length chunk — pad rows feed scan identity
    elements."""
    _, _, cfg, params, _ = hf_setup
    rng = np.random.default_rng(3)
    toks = rng.integers(3, cfg.vocab_size, (10,)).astype(np.int32)
    cache = init_rec_cache(cfg, 1)
    exact, cexact = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                     jnp.int32(0), jnp.int32(0),
                                     jnp.int32(10))
    padded = np.zeros(16, np.int32)
    padded[:10] = toks
    cache = init_rec_cache(cfg, 1)
    got, cgot = rec_prefill_impl(params, cfg, jnp.asarray(padded), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(10))
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cgot.ssm), np.asarray(cexact.ssm),
                               atol=1e-6)


def test_mamba_batch_prefill_matches_single(hf_setup):
    """Batched multi-slot prefill (ragged n_valid, one idle row) equals
    per-slot prefill; idle rows keep their states bit-exactly."""
    _, _, cfg, params, _ = hf_setup
    rng = np.random.default_rng(4)
    t0 = rng.integers(3, cfg.vocab_size, (12,)).astype(np.int32)
    t1 = rng.integers(3, cfg.vocab_size, (7,)).astype(np.int32)
    cache = init_rec_cache(cfg, 3)
    marker = cache.ssm.at[:, 2].set(1.25)
    cache = cache._replace(ssm=marker)
    tokens = np.zeros((3, 12), np.int32)
    tokens[0] = t0
    tokens[1, :7] = t1
    lg, cb = rec_prefill_batch_impl(
        params, cfg, jnp.asarray(tokens), jnp.zeros(3, jnp.int32),
        jnp.asarray([12, 7, 0], jnp.int32), cache)
    single0, c0 = rec_prefill_impl(params, cfg, jnp.asarray(t0),
                                   init_rec_cache(cfg, 1), jnp.int32(0),
                                   jnp.int32(0), jnp.int32(12))
    single1, c1 = rec_prefill_impl(params, cfg, jnp.asarray(t1),
                                   init_rec_cache(cfg, 1), jnp.int32(0),
                                   jnp.int32(0), jnp.int32(7))
    np.testing.assert_allclose(np.asarray(lg[0]), np.asarray(single0),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lg[1]), np.asarray(single1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cb.ssm[:, 2]),
                                  np.asarray(cache.ssm[:, 2]))
    np.testing.assert_allclose(np.asarray(cb.ssm[:, 0]),
                               np.asarray(c0.ssm[:, 0]), atol=1e-5)


def test_mamba_greedy_matches_transformers_generate(hf_setup):
    """End-to-end engine greedy decode == transformers greedy generate."""
    import torch
    hm, _, cfg, params, tok = hf_setup
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, cfg.vocab_size, (9,)).astype(np.int32).tolist()
    N = 12
    with torch.no_grad():
        ref = hm.generate(torch.tensor([prompt]), max_new_tokens=N,
                          do_sample=False)
    ref_new = ref[0, len(prompt):].tolist()

    eng = Engine(cfg, params, tok, EngineConfig(n_slots=2, n_ctx=256))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=N, stream=False))
    finally:
        eng.stop()
    got = final.generated[:len(ref_new)]
    # stop on EOG could shorten ours; compare the overlapping prefix
    assert got == ref_new[:len(got)] and len(got) >= min(N, 4), \
        (got, ref_new)


def test_mamba_engine_chain_equals_unchained(hf_setup):
    """Greedy output identical with decode chaining on and off (the
    engine invariant the attention path enforces, kept for recurrent)."""
    _, _, cfg, params, tok = hf_setup
    prompt = tok.encode("hello world test")
    outs = []
    for chain in (1, 5):
        eng = Engine(cfg, params, tok,
                     EngineConfig(n_slots=2, n_ctx=128, decode_chain=chain))
        eng.start()
        try:
            final, _ = run_task(eng, CompletionsTask(
                prompt, greedy(), tokenizer=tok, max_tokens=11,
                stream=False))
            outs.append(final.generated)
        finally:
            eng.stop()
    assert outs[0] == outs[1]


def test_mamba_prefix_reuse_exact_extension(hf_setup):
    """A follow-up prompt extending the previous request's full history
    reuses the recurrent state (multi-turn append); any other overlap
    recomputes from scratch — and both match a cold engine."""
    _, _, cfg, params, tok = hf_setup
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=256))
    eng.start()
    try:
        p1 = tok.encode("the world is")
        f1, _ = run_task(eng, CompletionsTask(
            p1, greedy(), tokenizer=tok, max_tokens=4, stream=False))
        # turn 2 extends turn 1's prompt + generation exactly
        p2 = p1 + f1.generated + tok.encode("and hello")
        f2, _ = run_task(eng, CompletionsTask(
            p2, greedy(), tokenizer=tok, max_tokens=4, stream=False))
        # the final sampled token is never fed back, so the reusable
        # history is one short of prompt+generated
        assert f2.n_cached == len(p1) + len(f1.generated) - 1, f2.n_cached
        # partial-overlap prompt (shares a prefix, then diverges):
        # exact-extension rule forces a full recompute
        p3 = p1 + tok.encode("a totally different tail here")
        f3, _ = run_task(eng, CompletionsTask(
            p3, greedy(), tokenizer=tok, max_tokens=4, stream=False))
        assert f3.n_cached == 0
    finally:
        eng.stop()
    # cold engines agree with both
    for prompt, want in ((p2, f2.generated), (p3, f3.generated)):
        eng2 = Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=256))
        eng2.start()
        try:
            fc, _ = run_task(eng2, CompletionsTask(
                prompt, greedy(), tokenizer=tok, max_tokens=4,
                stream=False))
        finally:
            eng2.stop()
        assert fc.generated == want


def test_mamba_dirty_state_after_chain_tail(hf_setup):
    """A request finishing mid-chain leaves the slot state ahead of its
    token history; the engine must refuse to reuse it (output equals a
    cold run)."""
    _, _, cfg, params, tok = hf_setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=1, n_ctx=256, decode_chain=8))
    eng.start()
    try:
        p1 = tok.encode("hello hello hello")
        # max_tokens NOT a multiple of the chain: finishes mid-chain
        f1, _ = run_task(eng, CompletionsTask(
            p1, greedy(), tokenizer=tok, max_tokens=3, stream=False))
        assert eng.slots[0].rec_dirty
        p2 = p1 + f1.generated + tok.encode("more")
        f2, _ = run_task(eng, CompletionsTask(
            p2, greedy(), tokenizer=tok, max_tokens=3, stream=False))
        assert f2.n_cached == 0   # dirty state not reused
    finally:
        eng.stop()
    eng2 = Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=256,
                                                 decode_chain=1))
    eng2.start()
    try:
        fc, _ = run_task(eng2, CompletionsTask(
            p2, greedy(), tokenizer=tok, max_tokens=3, stream=False))
    finally:
        eng2.stop()
    assert fc.generated == f2.generated


def test_mamba_multislot_concurrent_greedy(hf_setup):
    """Two concurrent requests on different slots decode independently
    and match single-slot cold runs (mixed-batch identity masking)."""
    _, _, cfg, params, tok = hf_setup
    p1 = tok.encode("hello world and the test")
    p2 = tok.encode("a is the world of hello")
    cold = []
    for p in (p1, p2):
        eng = Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=256))
        eng.start()
        try:
            f, _ = run_task(eng, CompletionsTask(
                p, greedy(), tokenizer=tok, max_tokens=8, stream=False))
            cold.append(f.generated)
        finally:
            eng.stop()
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=2, n_ctx=512))
    eng.start()
    try:
        ta = CompletionsTask(p1, greedy(), tokenizer=tok, max_tokens=8,
                             stream=False)
        tb = CompletionsTask(p2, greedy(), tokenizer=tok, max_tokens=8,
                             stream=False)
        eng.submit(ta)
        eng.submit(tb)
        outs = []
        for t in (ta, tb):
            while True:
                kind, payload = t.result_q.get(timeout=60)
                if kind == "final":
                    outs.append(payload.generated)
                    break
                if kind == "error":
                    raise payload
    finally:
        eng.stop()
    assert outs == cold


def test_mamba_state_ops():
    """reset_rec_slot zeroes one slot; copy_rec_state moves src -> dst."""
    from llama_box_tpu.models.mamba import RecCache
    rng = np.random.default_rng(0)
    conv = jnp.asarray(rng.normal(size=(2, 3, 3, 8)), jnp.float32)
    ssm = jnp.asarray(rng.normal(size=(2, 3, 8, 4)), jnp.float32)
    conv_h, ssm_h = np.asarray(conv).copy(), np.asarray(ssm).copy()
    c = RecCache(conv=conv, ssm=ssm)
    c2 = copy_rec_state(c, jnp.int32(0), jnp.int32(2))
    np.testing.assert_array_equal(np.asarray(c2.ssm[:, 2]), ssm_h[:, 0])
    np.testing.assert_array_equal(np.asarray(c2.conv[:, 1]), conv_h[:, 1])
    c3 = reset_rec_slot(c2, jnp.int32(1))
    assert float(jnp.abs(c3.ssm[:, 1]).max()) == 0.0
    np.testing.assert_array_equal(np.asarray(c3.ssm[:, 0]), ssm_h[:, 0])


@pytest.fixture(scope="module")
def hf2_setup(tmp_path_factory):
    """Tiny HF Mamba2ForCausalLM exported to GGUF (SSD variant)."""
    torch = pytest.importorskip("torch")
    from transformers import Mamba2Config, Mamba2ForCausalLM

    from .fixtures.make_tiny_mamba import (M2_D_CONV, M2_D_STATE,
                                           M2_HEAD_DIM, M2_N_EMBD,
                                           M2_N_GROUPS, M2_N_HEADS,
                                           M2_N_LAYERS, write_tiny_mamba2)
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    hc = Mamba2Config(vocab_size=len(vocab), hidden_size=M2_N_EMBD,
                      state_size=M2_D_STATE, num_hidden_layers=M2_N_LAYERS,
                      conv_kernel=M2_D_CONV, head_dim=M2_HEAD_DIM,
                      num_heads=M2_N_HEADS, n_groups=M2_N_GROUPS, expand=2,
                      use_cache=False, layer_norm_epsilon=1e-5)
    hm = Mamba2ForCausalLM(hc).eval()
    state = {k: v.detach().numpy() for k, v in hm.state_dict().items()}
    state.setdefault("lm_head.weight", state["backbone.embeddings.weight"])
    path = str(tmp_path_factory.mktemp("mamba2") / "tiny_mamba2.gguf")
    write_tiny_mamba2(path, state=state)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return hm, cfg, params, tok


def test_mamba2_matches_transformers(hf2_setup):
    """Mamba2 (SSD: per-head scalar decay, grouped B/C, gated norm)
    prefill logits match transformers Mamba2ForCausalLM."""
    import torch
    hm, cfg, params, _ = hf2_setup
    assert cfg.recurrent and cfg.ssm_n_group == 2
    rng = np.random.default_rng(7)
    T = 14
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    cache = init_rec_cache(cfg, 2)
    logits, _ = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(T))
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=2e-4, rtol=1e-3)


def test_mamba2_engine_greedy_matches_transformers(hf2_setup):
    """Engine greedy decode (chunked prefill + chained decode) equals
    transformers greedy generate on the SSD variant."""
    import torch
    hm, cfg, params, tok = hf2_setup
    rng = np.random.default_rng(8)
    prompt = rng.integers(3, cfg.vocab_size, (10,)).astype(np.int32).tolist()
    N = 10
    with torch.no_grad():
        ref = hm.generate(torch.tensor([prompt]), max_new_tokens=N,
                          do_sample=False)
    ref_new = ref[0, len(prompt):].tolist()
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=256, n_ubatch=8,
                              decode_chain=4))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=N, stream=False))
    finally:
        eng.stop()
    got = final.generated[:len(ref_new)]
    assert got == ref_new[:len(got)] and len(got) >= min(N, 4), \
        (got, ref_new)


@pytest.fixture(scope="module")
def jamba_setup(tmp_path_factory):
    """Tiny HF JambaForCausalLM (hybrid mamba+attention) to GGUF."""
    torch = pytest.importorskip("torch")
    from transformers import JambaConfig, JambaForCausalLM

    from .fixtures.make_tiny_mamba import (J_D_CONV, J_D_STATE, J_DT_RANK,
                                           J_FF, J_N_EMBD, J_N_HEADS,
                                           J_N_KV_HEADS, J_N_LAYERS,
                                           write_tiny_jamba)
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    hc = JambaConfig(vocab_size=len(vocab), hidden_size=J_N_EMBD,
                     intermediate_size=J_FF, num_hidden_layers=J_N_LAYERS,
                     num_attention_heads=J_N_HEADS,
                     num_key_value_heads=J_N_KV_HEADS, attn_layer_period=2,
                     attn_layer_offset=1, expert_layer_period=2,
                     expert_layer_offset=1, num_experts=1,
                     mamba_d_state=J_D_STATE, mamba_d_conv=J_D_CONV,
                     mamba_expand=2, mamba_dt_rank=J_DT_RANK,
                     use_cache=False, use_mamba_kernels=False,
                     rms_norm_eps=1e-6, tie_word_embeddings=False)
    hm = JambaForCausalLM(hc).eval()
    state = {k: v.detach().numpy() for k, v in hm.state_dict().items()}
    state.setdefault("lm_head.weight", state["model.embed_tokens.weight"])
    path = str(tmp_path_factory.mktemp("jamba") / "tiny_jamba.gguf")
    write_tiny_jamba(path, state=state)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return hm, cfg, params, tok


def test_jamba_matches_transformers(jamba_setup):
    """Hybrid (mamba + attention) prefill logits match transformers
    JambaForCausalLM; attention layers get a real KV cache slice."""
    import torch
    hm, cfg, params, _ = jamba_setup
    assert cfg.recurrent and cfg.rope_mode == "none"
    assert "layer_groups" in params
    rng = np.random.default_rng(11)
    T = 13
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    cache = init_rec_cache(cfg, 2, capacity=64, params=params)
    assert cache.k is not None and cache.k.shape[0] == 1
    logits, _ = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(T))
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=2e-4, rtol=1e-3)


def test_jamba_engine_greedy_matches_transformers(jamba_setup):
    """Engine greedy (chunked prefill + chained decode over the hybrid
    cache) equals transformers greedy generate."""
    import torch
    hm, cfg, params, tok = jamba_setup
    rng = np.random.default_rng(12)
    prompt = rng.integers(3, cfg.vocab_size, (11,)).astype(np.int32).tolist()
    N = 10
    with torch.no_grad():
        ref = hm.generate(torch.tensor([prompt]), max_new_tokens=N,
                          do_sample=False)
    ref_new = ref[0, len(prompt):].tolist()
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=256, n_ubatch=8,
                              decode_chain=4))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=N, stream=False))
    finally:
        eng.stop()
    got = final.generated[:len(ref_new)]
    assert got == ref_new[:len(got)] and len(got) >= min(N, 4), \
        (got, ref_new)


def test_jamba_multiturn_reuse(jamba_setup):
    """Exact-extension reuse works for hybrid state (mamba states + KV
    rows both carried) and matches a cold run."""
    _, cfg, params, tok = jamba_setup
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=1, n_ctx=128, decode_chain=1))
    eng.start()
    try:
        p1 = tok.encode("hello world the test")
        f1, _ = run_task(eng, CompletionsTask(
            p1, greedy(), tokenizer=tok, max_tokens=4, stream=False))
        p2 = p1 + f1.generated + tok.encode("and more")
        f2, _ = run_task(eng, CompletionsTask(
            p2, greedy(), tokenizer=tok, max_tokens=4, stream=False))
        assert f2.n_cached == len(p1) + len(f1.generated) - 1
    finally:
        eng.stop()
    eng2 = Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=128))
    eng2.start()
    try:
        fc, _ = run_task(eng2, CompletionsTask(
            p2, greedy(), tokenizer=tok, max_tokens=4, stream=False))
    finally:
        eng2.stop()
    assert fc.generated == f2.generated


def test_jamba_moe_matches_transformers(tmp_path):
    """Jamba with MoE FFN layers: softmax -> top-k routing WITHOUT
    renormalization (HF JambaSparseMoeBlock semantics)."""
    torch = pytest.importorskip("torch")
    from transformers import JambaConfig, JambaForCausalLM

    from .fixtures.make_tiny_mamba import (J_D_CONV, J_D_STATE, J_DT_RANK,
                                           J_FF, J_N_EMBD, J_N_HEADS,
                                           J_N_KV_HEADS, J_N_LAYERS,
                                           write_tiny_jamba)
    vocab, _, _ = build_vocab()
    torch.manual_seed(1)
    X, K = 4, 2
    hc = JambaConfig(vocab_size=len(vocab), hidden_size=J_N_EMBD,
                     intermediate_size=J_FF, num_hidden_layers=J_N_LAYERS,
                     num_attention_heads=J_N_HEADS,
                     num_key_value_heads=J_N_KV_HEADS, attn_layer_period=2,
                     attn_layer_offset=1, expert_layer_period=1,
                     expert_layer_offset=0, num_experts=X,
                     num_experts_per_tok=K, mamba_d_state=J_D_STATE,
                     mamba_d_conv=J_D_CONV, mamba_expand=2,
                     mamba_dt_rank=J_DT_RANK, use_cache=False,
                     use_mamba_kernels=False, rms_norm_eps=1e-6,
                     tie_word_embeddings=False, router_aux_loss_coef=0.0)
    hm = JambaForCausalLM(hc).eval()
    state = {k: v.detach().numpy() for k, v in hm.state_dict().items()}
    state.setdefault("lm_head.weight", state["model.embed_tokens.weight"])
    path = str(tmp_path / "tiny_jamba_moe.gguf")
    write_tiny_jamba(path, state=state, n_experts=X, n_experts_used=K)
    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.expert_count == X and not cfg.expert_weights_norm

    rng = np.random.default_rng(13)
    T = 12
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    cache = init_rec_cache(cfg, 1, capacity=64, params=params)
    logits, _ = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(T))
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=3e-4, rtol=2e-3)


@pytest.fixture(scope="module")
def bamba_setup(tmp_path_factory):
    """Tiny HF BambaForCausalLM: mamba2 mixers + ROPED attention layers
    (the granite-hybrid class) exported to GGUF."""
    torch = pytest.importorskip("torch")
    from transformers import BambaConfig, BambaForCausalLM

    from llama_box_tpu.gguf import GGUFWriter
    vocab, _, _ = build_vocab()
    E, H, HKV, D, FFB = 64, 4, 2, 16, 128
    DI, DS, NH, NG, DC = 128, 16, 8, 1, 4
    torch.manual_seed(0)
    hc = BambaConfig(vocab_size=len(vocab), hidden_size=E,
                     intermediate_size=FFB, num_hidden_layers=2,
                     num_attention_heads=H, num_key_value_heads=HKV,
                     attn_layer_indices=[1], mamba_n_heads=NH,
                     mamba_d_head=DI // NH, mamba_d_state=DS,
                     mamba_n_groups=NG, mamba_d_conv=DC, mamba_expand=2,
                     attn_rotary_emb=D, rope_theta=10000.0,
                     rms_norm_eps=1e-5, use_cache=False, pad_token_id=0,
                     tie_word_embeddings=False)
    hm = BambaForCausalLM(hc).eval()
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in hm.state_dict().items()}
    st.setdefault("lm_head.weight", st["model.embed_tokens.weight"])

    path = str(tmp_path_factory.mktemp("bamba") / "tiny_bamba.gguf")
    w = GGUFWriter(path, architecture="bamba")
    conv_dim = DI + 2 * NG * DS
    for k, v in [("block_count", 2), ("context_length", 1024),
                 ("embedding_length", E), ("feed_forward_length", FFB),
                 ("attention.head_count", H),
                 ("attention.layer_norm_rms_epsilon", 1e-5),
                 # HF bamba defaults to partial_rotary_factor = 0.5
                 ("rope.freq_base", 10000.0),
                 ("rope.dimension_count", D // 2),
                 ("ssm.conv_kernel", DC), ("ssm.inner_size", DI),
                 ("ssm.state_size", DS), ("ssm.time_step_rank", NH),
                 ("ssm.group_count", NG), ("vocab_size", len(vocab))]:
        w.add_kv(f"bamba.{k}", v)
    w.add_kv("bamba.attention.head_count_kv", [0, HKV])
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.zeros(len(vocab), np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.ones(len(vocab), np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_tensor("token_embd.weight", st["model.embed_tokens.weight"])
    w.add_tensor("output_norm.weight", st["model.final_layernorm.weight"])
    w.add_tensor("output.weight", st["lm_head.weight"])
    for i in range(2):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     st[p + "input_layernorm.weight"])
        w.add_tensor(o + "ffn_norm.weight",
                     st[p + "pre_ff_layernorm.weight"])
        if i == 0:   # mamba2 mixer
            w.add_tensor(o + "ssm_in.weight", st[p + "mamba.in_proj.weight"])
            w.add_tensor(o + "ssm_conv1d.weight",
                         st[p + "mamba.conv1d.weight"]
                         .reshape(conv_dim, DC))
            w.add_tensor(o + "ssm_conv1d.bias", st[p + "mamba.conv1d.bias"])
            w.add_tensor(o + "ssm_dt.bias", st[p + "mamba.dt_bias"])
            w.add_tensor(o + "ssm_a.weight",
                         -np.exp(st[p + "mamba.A_log"]))
            w.add_tensor(o + "ssm_d.weight", st[p + "mamba.D"])
            w.add_tensor(o + "ssm_norm.weight", st[p + "mamba.norm.weight"])
            w.add_tensor(o + "ssm_out.weight",
                         st[p + "mamba.out_proj.weight"])
        else:
            for hfk, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                            ("v_proj", "attn_v"),
                            ("o_proj", "attn_output")):
                w.add_tensor(o + gg + ".weight",
                             st[p + f"self_attn.{hfk}.weight"])
        w.add_tensor(o + "ffn_gate.weight",
                     st[p + "feed_forward.gate_proj.weight"])
        w.add_tensor(o + "ffn_up.weight",
                     st[p + "feed_forward.up_proj.weight"])
        w.add_tensor(o + "ffn_down.weight",
                     st[p + "feed_forward.down_proj.weight"])
    w.write()
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return hm, cfg, params, tok


def test_bamba_matches_transformers(bamba_setup):
    """Hybrid mamba2 + roped attention (granite-hybrid class): prefill
    logits match transformers BambaForCausalLM."""
    import torch
    from llama_box_tpu.models.llama import make_rope
    hm, cfg, params, _ = bamba_setup
    assert cfg.recurrent and cfg.rope_mode == "neox"
    rng = np.random.default_rng(21)
    T = 13
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    cache = init_rec_cache(cfg, 2, capacity=64, params=params)
    cos, sin = make_rope(cfg, 64)
    logits, _ = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(T),
                                 cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=3e-4, rtol=2e-3)


def test_bamba_engine_greedy_matches_transformers(bamba_setup):
    import torch
    hm, cfg, params, tok = bamba_setup
    rng = np.random.default_rng(22)
    prompt = rng.integers(3, cfg.vocab_size, (9,)).astype(np.int32).tolist()
    N = 10
    with torch.no_grad():
        ref = hm.generate(torch.tensor([prompt]), max_new_tokens=N,
                          do_sample=False)
    ref_new = ref[0, len(prompt):].tolist()
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=256, n_ubatch=8,
                              decode_chain=4))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=N, stream=False))
    finally:
        eng.stop()
    got = final.generated[:len(ref_new)]
    assert got == ref_new[:len(got)] and len(got) >= min(N, 4), \
        (got, ref_new)


def test_mamba_spec_decode_rejected(hf_setup):
    _, _, cfg, params, tok = hf_setup
    with pytest.raises(ValueError, match="speculative"):
        Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=64),
               draft=(cfg, params))


def test_mamba_length_cap_at_slot_boundary(hf_setup):
    """No context shift for recurrent models: generation finishes with
    'length' at the slot boundary instead of shifting."""
    _, _, cfg, params, tok = hf_setup
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=32))
    eng.start()
    try:
        p = tok.encode("hello world")
        f, _ = run_task(eng, CompletionsTask(
            p, greedy(), tokenizer=tok, max_tokens=500, stream=False))
        assert f.finish_reason in ("length", "stop")
        assert len(p) + len(f.generated) <= 32
    finally:
        eng.stop()


@pytest.fixture(scope="module")
def falcon_h1_setup(tmp_path_factory):
    """Tiny HF FalconH1: EVERY layer runs attention and a mamba2 mixer in
    PARALLEL on the same normed input (x + attn + mamba, then the FFN).
    The mup/branch multipliers are all linear-boundary scalings, so the
    export folds them into the adjacent weights exactly like llama.cpp's
    FalconH1 converter (no multiplier hparams in the GGUF)."""
    torch = pytest.importorskip("torch")
    from transformers import FalconH1Config, FalconH1ForCausalLM

    from llama_box_tpu.gguf import GGUFWriter
    vocab, _, _ = build_vocab()
    E, H, HKV, D, FFB = 64, 4, 2, 16, 96
    DI, DS, NH, NG, DC = 64, 16, 8, 1, 4
    torch.manual_seed(0)
    hc = FalconH1Config(
        vocab_size=len(vocab), hidden_size=E, intermediate_size=FFB,
        num_hidden_layers=2, num_attention_heads=H, num_key_value_heads=HKV,
        head_dim=D, mamba_d_ssm=DI, mamba_n_heads=NH, mamba_d_head=DI // NH,
        mamba_d_state=DS, mamba_n_groups=NG, mamba_d_conv=DC,
        mamba_expand=1, rope_theta=10000.0, rms_norm_eps=1e-5,
        use_cache=False, pad_token_id=0, tie_word_embeddings=False,
        embedding_multiplier=2.0, attention_in_multiplier=0.5,
        attention_out_multiplier=1.5, ssm_in_multiplier=0.8,
        ssm_out_multiplier=1.2, key_multiplier=2.0,
        mlp_multipliers=[1.3, 0.7], lm_head_multiplier=0.9,
        ssm_multipliers=[1.1, 0.9, 1.2, 0.8, 1.05])
    hm = FalconH1ForCausalLM(hc).eval()
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in hm.state_dict().items()}

    # mup vector over the zxbcdt layout: z | x | B | C | dt
    mup = np.concatenate([
        np.full(DI, 1.1), np.full(DI, 0.9), np.full(NG * DS, 1.2),
        np.full(NG * DS, 0.8), np.full(NH, 1.05)]).astype(np.float32)

    path = str(tmp_path_factory.mktemp("fh1") / "tiny_falcon_h1.gguf")
    w = GGUFWriter(path, architecture="falcon-h1")
    conv_dim = DI + 2 * NG * DS
    for k, v in [("block_count", 2), ("context_length", 1024),
                 ("embedding_length", E), ("feed_forward_length", FFB),
                 ("attention.head_count", H),
                 ("attention.head_count_kv", HKV),
                 ("attention.key_length", D),
                 ("attention.layer_norm_rms_epsilon", 1e-5),
                 ("rope.freq_base", 10000.0),
                 ("rope.dimension_count", D),
                 ("ssm.conv_kernel", DC), ("ssm.inner_size", DI),
                 ("ssm.state_size", DS), ("ssm.time_step_rank", NH),
                 ("ssm.group_count", NG), ("vocab_size", len(vocab))]:
        w.add_kv(f"falcon-h1.{k}", v)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.zeros(len(vocab), np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.ones(len(vocab), np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_tensor("token_embd.weight",
                 st["model.embed_tokens.weight"] * 2.0)
    w.add_tensor("output_norm.weight", st["model.final_layernorm.weight"])
    w.add_tensor("output.weight", st["lm_head.weight"] * 0.9)
    for i in range(2):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     st[p + "input_layernorm.weight"])
        w.add_tensor(o + "ffn_norm.weight",
                     st[p + "pre_ff_layernorm.weight"])
        w.add_tensor(o + "attn_q.weight",
                     st[p + "self_attn.q_proj.weight"] * 0.5)
        w.add_tensor(o + "attn_k.weight",
                     st[p + "self_attn.k_proj.weight"] * 0.5 * 2.0)
        w.add_tensor(o + "attn_v.weight",
                     st[p + "self_attn.v_proj.weight"] * 0.5)
        w.add_tensor(o + "attn_output.weight",
                     st[p + "self_attn.o_proj.weight"] * 1.5)
        w.add_tensor(o + "ssm_in.weight",
                     st[p + "mamba.in_proj.weight"] * 0.8
                     * mup[:, None])
        w.add_tensor(o + "ssm_conv1d.weight",
                     st[p + "mamba.conv1d.weight"].reshape(conv_dim, DC))
        w.add_tensor(o + "ssm_conv1d.bias", st[p + "mamba.conv1d.bias"])
        w.add_tensor(o + "ssm_dt.bias", st[p + "mamba.dt_bias"])
        w.add_tensor(o + "ssm_a.weight", -np.exp(st[p + "mamba.A_log"]))
        w.add_tensor(o + "ssm_d.weight", st[p + "mamba.D"])
        w.add_tensor(o + "ssm_out.weight",
                     st[p + "mamba.out_proj.weight"] * 1.2)
        w.add_tensor(o + "ffn_gate.weight",
                     st[p + "feed_forward.gate_proj.weight"] * 1.3)
        w.add_tensor(o + "ffn_up.weight",
                     st[p + "feed_forward.up_proj.weight"])
        w.add_tensor(o + "ffn_down.weight",
                     st[p + "feed_forward.down_proj.weight"] * 0.7)
    w.write()
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return hm, cfg, params, tok


def test_falcon_h1_matches_transformers(falcon_h1_setup):
    """Parallel-hybrid prefill logits match transformers FalconH1."""
    import torch
    from llama_box_tpu.models.llama import make_rope
    hm, cfg, params, _ = falcon_h1_setup
    assert cfg.recurrent and cfg.rope_mode == "neox"
    rng = np.random.default_rng(31)
    T = 13
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    cache = init_rec_cache(cfg, 2, capacity=64, params=params)
    cos, sin = make_rope(cfg, 64)
    logits, _ = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(T),
                                 cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=5e-4, rtol=2e-3)


def test_falcon_h1_engine_greedy_matches_transformers(falcon_h1_setup):
    import torch
    hm, cfg, params, tok = falcon_h1_setup
    prompt = tok.encode("a b c a b")
    N = 10
    with torch.no_grad():
        ref = hm.generate(torch.tensor([prompt]), max_new_tokens=N,
                          do_sample=False)
    ref_new = ref[0, len(prompt):].tolist()
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=256, n_ubatch=8,
                              decode_chain=4))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=N, stream=False))
    finally:
        eng.stop()
    got = final.generated[:len(ref_new)]
    assert got == ref_new[:len(got)] and len(got) >= min(N, 4), \
        (got, ref_new)


@pytest.fixture(scope="module")
def lfm2_setup(tmp_path_factory):
    """Tiny HF LFM2: gated short-conv mixer layers (y = C *
    causal_conv(B*x), conv-tail-only state) interleaved with per-head-
    QK-normed attention layers."""
    torch = pytest.importorskip("torch")
    from transformers import Lfm2Config, Lfm2ForCausalLM

    from llama_box_tpu.gguf import GGUFWriter
    vocab, _, _ = build_vocab()
    E, H, HKV, D, FFL, LC = 64, 4, 2, 16, 96, 3
    torch.manual_seed(0)
    hc = Lfm2Config(vocab_size=len(vocab), hidden_size=E,
                    num_hidden_layers=4, num_attention_heads=H,
                    num_key_value_heads=HKV, intermediate_size=FFL,
                    conv_L_cache=LC, rope_theta=10000.0, norm_eps=1e-5,
                    layer_types=["conv", "full_attention",
                                 "conv", "full_attention"],
                    use_cache=False, pad_token_id=0,
                    tie_word_embeddings=False)
    hm = Lfm2ForCausalLM(hc).eval()
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in hm.state_dict().items()}

    path = str(tmp_path_factory.mktemp("lfm2") / "tiny_lfm2.gguf")
    w = GGUFWriter(path, architecture="lfm2")
    for k, v in [("block_count", 4), ("context_length", 1024),
                 ("embedding_length", E), ("feed_forward_length", FFL),
                 ("attention.head_count", H),
                 ("attention.head_count_kv", HKV),
                 ("attention.key_length", D),
                 ("attention.layer_norm_rms_epsilon", 1e-5),
                 ("rope.freq_base", 10000.0),
                 ("rope.dimension_count", D),
                 ("shortconv.l_cache", LC), ("vocab_size", len(vocab))]:
        w.add_kv(f"lfm2.{k}", v)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.zeros(len(vocab), np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.ones(len(vocab), np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_tensor("token_embd.weight", st["model.embed_tokens.weight"])
    w.add_tensor("output_norm.weight", st["model.embedding_norm.weight"])
    w.add_tensor("output.weight", st["lm_head.weight"])
    for i in range(4):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     st[p + "operator_norm.weight"])
        w.add_tensor(o + "ffn_norm.weight", st[p + "ffn_norm.weight"])
        if i % 2 == 0:   # gated short-conv mixer
            w.add_tensor(o + "shortconv.in_proj.weight",
                         st[p + "conv.in_proj.weight"])
            w.add_tensor(o + "shortconv.out_proj.weight",
                         st[p + "conv.out_proj.weight"])
            w.add_tensor(o + "shortconv.conv.weight",
                         st[p + "conv.conv.weight"].reshape(E, LC))
        else:
            w.add_tensor(o + "attn_q.weight",
                         st[p + "self_attn.q_proj.weight"])
            w.add_tensor(o + "attn_k.weight",
                         st[p + "self_attn.k_proj.weight"])
            w.add_tensor(o + "attn_v.weight",
                         st[p + "self_attn.v_proj.weight"])
            w.add_tensor(o + "attn_output.weight",
                         st[p + "self_attn.out_proj.weight"])
            w.add_tensor(o + "attn_q_norm.weight",
                         st[p + "self_attn.q_layernorm.weight"])
            w.add_tensor(o + "attn_k_norm.weight",
                         st[p + "self_attn.k_layernorm.weight"])
        w.add_tensor(o + "ffn_gate.weight",
                     st[p + "feed_forward.w1.weight"])
        w.add_tensor(o + "ffn_down.weight",
                     st[p + "feed_forward.w2.weight"])
        w.add_tensor(o + "ffn_up.weight",
                     st[p + "feed_forward.w3.weight"])
    w.write()
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return hm, cfg, params, tok


def test_lfm2_matches_transformers(lfm2_setup):
    import torch
    from llama_box_tpu.models.llama import make_rope
    hm, cfg, params, _ = lfm2_setup
    assert cfg.recurrent and cfg.shortconv_l_cache == 3
    rng = np.random.default_rng(41)
    T = 13
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    cache = init_rec_cache(cfg, 2, capacity=64, params=params)
    cos, sin = make_rope(cfg, 64)
    logits, _ = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(T),
                                 cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=5e-4, rtol=2e-3)


def test_lfm2_engine_greedy_matches_transformers(lfm2_setup):
    import torch
    hm, cfg, params, tok = lfm2_setup
    prompt = tok.encode("a b c a b")
    N = 10
    with torch.no_grad():
        ref = hm.generate(torch.tensor([prompt]), max_new_tokens=N,
                          do_sample=False)
    ref_new = ref[0, len(prompt):].tolist()
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=256, n_ubatch=8,
                              decode_chain=4))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=N, stream=False))
    finally:
        eng.stop()
    got = final.generated[:len(ref_new)]
    assert got == ref_new[:len(got)] and len(got) >= min(N, 4), \
        (got, ref_new)


@pytest.fixture(scope="module")
def qwen3next_setup(tmp_path_factory):
    """Tiny HF Qwen3Next: gated-DeltaNet linear-attention layers (3:1)
    interleaved with gated full attention (per-head output gate split out
    of the fused q_proj at export), qwen2moe-style MoE with shared
    expert + gate, partial rotary."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    from llama_box_tpu.gguf import GGUFWriter
    vocab, _, _ = build_vocab()
    E, H, HKV, D = 64, 4, 2, 16
    HK, HV, DK, DV, DC = 2, 4, 16, 16, 4
    X, K = 4, 2
    torch.manual_seed(0)
    hc = Qwen3NextConfig(
        vocab_size=len(vocab), hidden_size=E, num_hidden_layers=4,
        num_attention_heads=H, num_key_value_heads=HKV, head_dim=D,
        intermediate_size=96, moe_intermediate_size=48,
        shared_expert_intermediate_size=48, num_experts=X,
        num_experts_per_tok=K, decoder_sparse_step=1, norm_topk_prob=True,
        linear_num_value_heads=HV, linear_num_key_heads=HK,
        linear_key_head_dim=DK, linear_value_head_dim=DV,
        linear_conv_kernel_dim=DC, partial_rotary_factor=0.25,
        rope_theta=10000.0, rms_norm_eps=1e-5, use_cache=False,
        pad_token_id=0, tie_word_embeddings=False)
    hm = Qwen3NextForCausalLM(hc).eval()
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in hm.state_dict().items()}

    path = str(tmp_path_factory.mktemp("q3n") / "tiny_qwen3next.gguf")
    w = GGUFWriter(path, architecture="qwen3next")
    conv_dim = 2 * HK * DK + HV * DV
    for k, v in [("block_count", 4), ("context_length", 1024),
                 ("embedding_length", E), ("feed_forward_length", 96),
                 ("attention.head_count", H),
                 ("attention.head_count_kv", HKV),
                 ("attention.key_length", D),
                 ("attention.layer_norm_rms_epsilon", 1e-5),
                 ("rope.freq_base", 10000.0),
                 ("rope.dimension_count", D // 4),
                 ("expert_count", X), ("expert_used_count", K),
                 ("expert_weights_norm", True),
                 ("ssm.conv_kernel", DC), ("ssm.inner_size", HV * DV),
                 ("ssm.state_size", DK), ("ssm.time_step_rank", HV),
                 ("ssm.group_count", HK), ("vocab_size", len(vocab))]:
        w.add_kv(f"qwen3next.{k}", v)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.zeros(len(vocab), np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.ones(len(vocab), np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    # Qwen3NextRMSNorm is ZERO-CENTERED ((1+w) * normed) — store the
    # effective weight like llama.cpp's gemma/nemotron +1 convention.
    # The gated DeltaNet norm (Qwen3NextRMSNormGated) is NOT zero-centered.
    w.add_tensor("token_embd.weight", st["model.embed_tokens.weight"])
    w.add_tensor("output_norm.weight", st["model.norm.weight"] + 1.0)
    w.add_tensor("output.weight", st["lm_head.weight"])
    for i in range(4):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     st[p + "input_layernorm.weight"] + 1.0)
        w.add_tensor(o + "ffn_norm.weight",
                     st[p + "post_attention_layernorm.weight"] + 1.0)
        if (i + 1) % 4 == 0:   # gated full attention
            qg = st[p + "self_attn.q_proj.weight"] \
                .reshape(H, 2 * D, E)
            w.add_tensor(o + "attn_q.weight",
                         qg[:, :D].reshape(H * D, E))
            w.add_tensor(o + "attn_gate.weight",
                         qg[:, D:].reshape(H * D, E))
            w.add_tensor(o + "attn_k.weight",
                         st[p + "self_attn.k_proj.weight"])
            w.add_tensor(o + "attn_v.weight",
                         st[p + "self_attn.v_proj.weight"])
            w.add_tensor(o + "attn_output.weight",
                         st[p + "self_attn.o_proj.weight"])
            w.add_tensor(o + "attn_q_norm.weight",
                         st[p + "self_attn.q_norm.weight"] + 1.0)
            w.add_tensor(o + "attn_k_norm.weight",
                         st[p + "self_attn.k_norm.weight"] + 1.0)
        else:                  # gated DeltaNet
            w.add_tensor(o + "ssm_in.weight",
                         st[p + "linear_attn.in_proj_qkvz.weight"])
            w.add_tensor(o + "ssm_beta_alpha.weight",
                         st[p + "linear_attn.in_proj_ba.weight"])
            w.add_tensor(o + "ssm_conv1d.weight",
                         st[p + "linear_attn.conv1d.weight"]
                         .reshape(conv_dim, DC))
            if p + "linear_attn.conv1d.bias" in st:
                w.add_tensor(o + "ssm_conv1d.bias",
                             st[p + "linear_attn.conv1d.bias"])
            w.add_tensor(o + "ssm_dt.bias", st[p + "linear_attn.dt_bias"])
            w.add_tensor(o + "ssm_a.weight",
                         -np.exp(st[p + "linear_attn.A_log"]))
            w.add_tensor(o + "ssm_norm.weight",
                         st[p + "linear_attn.norm.weight"])
            w.add_tensor(o + "ssm_out.weight",
                         st[p + "linear_attn.out_proj.weight"])
        w.add_tensor(o + "ffn_gate_inp.weight", st[p + "mlp.gate.weight"])
        for hfk, gg in (("gate_proj", "ffn_gate_exps"),
                        ("up_proj", "ffn_up_exps"),
                        ("down_proj", "ffn_down_exps")):
            w.add_tensor(o + gg + ".weight", np.stack([
                st[p + f"mlp.experts.{j}.{hfk}.weight"]
                for j in range(X)]))
        for hfk, gg in (("gate_proj", "ffn_gate_shexp"),
                        ("up_proj", "ffn_up_shexp"),
                        ("down_proj", "ffn_down_shexp")):
            w.add_tensor(o + gg + ".weight",
                         st[p + f"mlp.shared_expert.{hfk}.weight"])
        w.add_tensor(o + "ffn_gate_inp_shexp.weight",
                     st[p + "mlp.shared_expert_gate.weight"])
    w.write()
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return hm, cfg, params, tok


def test_qwen3next_matches_transformers(qwen3next_setup):
    import torch
    from llama_box_tpu.models.llama import make_rope
    hm, cfg, params, _ = qwen3next_setup
    assert cfg.recurrent
    rng = np.random.default_rng(51)
    T = 13
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    cache = init_rec_cache(cfg, 2, capacity=64, params=params)
    cos, sin = make_rope(cfg, 64)
    logits, _ = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(T),
                                 cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=1e-3, rtol=2e-3)


def test_qwen3next_engine_greedy_matches_transformers(qwen3next_setup):
    import torch
    hm, cfg, params, tok = qwen3next_setup
    prompt = tok.encode("a b c a b")
    N = 10
    with torch.no_grad():
        ref = hm.generate(torch.tensor([prompt]), max_new_tokens=N,
                          do_sample=False)
    ref_new = ref[0, len(prompt):].tolist()
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=256, n_ubatch=8,
                              decode_chain=4))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=N, stream=False))
    finally:
        eng.stop()
    got = final.generated[:len(ref_new)]
    assert got == ref_new[:len(got)] and len(got) >= min(N, 4), \
        (got, ref_new)


def test_nemotron_h_matches_composite_reference(tmp_path):
    """nemotron-h hybrid: each block is norm + ONE of {mamba2 mixer,
    unroped attention, squared-ReLU MLP}. No transformers module exists;
    the golden composes independent references per block type — the
    mamba2 block runs through transformers' Mamba2Block (torch_forward),
    attention and MLP are numpy. Also checks engine greedy decode is
    consistent with prefill next-token argmax (decode-path wiring of the
    FFN-only group)."""
    import torch
    from transformers.models.mamba2.configuration_mamba2 import Mamba2Config
    from transformers.models.mamba2.modeling_mamba2 import Mamba2Block

    from llama_box_tpu.gguf import GGUFWriter
    from llama_box_tpu.models.llama import make_rope

    from .fixtures.make_tiny_mamba import (M2_D_CONV, M2_D_STATE,
                                           M2_HEAD_DIM, M2_N_EMBD,
                                           M2_N_GROUPS, M2_N_HEADS)
    vocab, scores, types = build_vocab()
    V = len(vocab)
    E = M2_N_EMBD
    H, HKV = 4, 2
    D = E // H
    FF = 96
    di, ds, ng, nh = (M2_N_HEADS * M2_HEAD_DIM, M2_D_STATE, M2_N_GROUPS,
                      M2_N_HEADS)
    conv_dim = di + 2 * ng * ds

    torch.manual_seed(0)
    hc = Mamba2Config(vocab_size=V, hidden_size=E, state_size=ds,
                      num_hidden_layers=1, conv_kernel=M2_D_CONV,
                      head_dim=M2_HEAD_DIM, num_heads=nh, n_groups=ng,
                      expand=2, use_cache=False, layer_norm_epsilon=1e-5)
    block = Mamba2Block(hc, layer_idx=0).eval()
    bs = {k: v.detach().numpy().astype(np.float32)
          for k, v in block.state_dict().items()}

    rng = np.random.default_rng(4)

    def r(*shape, scale=0.05):
        return rng.normal(size=shape, scale=scale).astype(np.float32)

    embd = r(V, E)
    out_norm = 1 + r(E, scale=0.1)
    out_w = r(V, E)
    attn = {"norm": 1 + r(E, scale=0.1), "wq": r(H * D, E),
            "wk": r(HKV * D, E), "wv": r(HKV * D, E), "wo": r(E, H * D)}
    ffn = {"norm": 1 + r(E, scale=0.1), "up": r(FF, E), "down": r(E, FF)}

    def rms(x, w):
        return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w

    def ref(toks):
        T = len(toks)
        x = embd[toks]
        with torch.no_grad():
            x = block(torch.tensor(x[None]))[0].numpy()   # mamba2 block
        h = rms(x, attn["norm"])                          # attention block
        q = (h @ attn["wq"].T).reshape(T, H, D)
        k = (h @ attn["wk"].T).reshape(T, HKV, D)
        v = (h @ attn["wv"].T).reshape(T, HKV, D)
        kx = np.repeat(k, H // HKV, axis=1)
        vx = np.repeat(v, H // HKV, axis=1)
        sc = np.einsum("qhd,khd->hqk", q, kx) / np.sqrt(D)
        sc = np.where(np.tril(np.ones((T, T), bool))[None], sc, -1e30)
        p = np.exp(sc - sc.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ao = np.einsum("hqk,khd->qhd", p, vx).reshape(T, H * D)
        x = x + ao @ attn["wo"].T
        h = rms(x, ffn["norm"])                           # relu^2 MLP block
        x = x + (np.maximum(h @ ffn["up"].T, 0) ** 2) @ ffn["down"].T
        return rms(x, out_norm) @ out_w.T

    path = str(tmp_path / "nemotron_h.gguf")
    w = GGUFWriter(path, architecture="nemotron_h")
    a = "nemotron_h"
    w.add_kv(f"{a}.block_count", 3)
    w.add_kv(f"{a}.context_length", 256)
    w.add_kv(f"{a}.embedding_length", E)
    w.add_kv(f"{a}.feed_forward_length", FF)
    w.add_kv(f"{a}.attention.head_count", H)
    w.add_kv(f"{a}.attention.head_count_kv", [0, HKV, 0])
    w.add_kv(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{a}.ssm.conv_kernel", M2_D_CONV)
    w.add_kv(f"{a}.ssm.inner_size", di)
    w.add_kv(f"{a}.ssm.state_size", ds)
    w.add_kv(f"{a}.ssm.time_step_rank", nh)
    w.add_kv(f"{a}.ssm.group_count", ng)
    w.add_kv(f"{a}.vocab_size", V)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(scores, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array(types, np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.add_bos_token", True)
    w.add_tensor("token_embd.weight", embd)
    w.add_tensor("output_norm.weight", out_norm)
    w.add_tensor("output.weight", out_w)
    # blk.0: mamba2 (write_tiny_mamba2 conversion conventions)
    w.add_tensor("blk.0.attn_norm.weight", bs["norm.weight"])
    w.add_tensor("blk.0.ssm_in.weight", bs["mixer.in_proj.weight"])
    w.add_tensor("blk.0.ssm_conv1d.weight",
                 bs["mixer.conv1d.weight"].reshape(conv_dim, M2_D_CONV))
    w.add_tensor("blk.0.ssm_conv1d.bias", bs["mixer.conv1d.bias"])
    w.add_tensor("blk.0.ssm_dt.bias", bs["mixer.dt_bias"])
    w.add_tensor("blk.0.ssm_a.weight", -np.exp(bs["mixer.A_log"]))
    w.add_tensor("blk.0.ssm_d.weight", bs["mixer.D"])
    w.add_tensor("blk.0.ssm_norm.weight", bs["mixer.norm.weight"])
    w.add_tensor("blk.0.ssm_out.weight", bs["mixer.out_proj.weight"])
    # blk.1: unroped attention
    w.add_tensor("blk.1.attn_norm.weight", attn["norm"])
    w.add_tensor("blk.1.attn_q.weight", attn["wq"])
    w.add_tensor("blk.1.attn_k.weight", attn["wk"])
    w.add_tensor("blk.1.attn_v.weight", attn["wv"])
    w.add_tensor("blk.1.attn_output.weight", attn["wo"])
    # blk.2: squared-ReLU MLP only
    w.add_tensor("blk.2.attn_norm.weight", ffn["norm"])
    w.add_tensor("blk.2.ffn_up.weight", ffn["up"])
    w.add_tensor("blk.2.ffn_down.weight", ffn["down"])
    w.write()

    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.recurrent and cfg.rope_mode == "none" \
        and cfg.act_fn == "relu2" and not cfg.ffn_gated
    T = 12
    toks = rng.integers(3, V, (T,)).astype(np.int32)
    cache = init_rec_cache(cfg, 2, capacity=64, params=params)
    cos, sin = make_rope(cfg, 64)
    logits, _ = rec_prefill_impl(params, cfg, jnp.asarray(toks), cache,
                                 jnp.int32(0), jnp.int32(0), jnp.int32(T),
                                 cos, sin)
    ref_logits = ref(toks)
    np.testing.assert_allclose(np.asarray(logits), ref_logits[-1],
                               atol=2e-3, rtol=5e-3)

    # engine greedy must agree with prefill next-token argmax at every
    # step (decode-path wiring of the hybrid incl. the FFN-only group)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    prompt = toks[:6].tolist()
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=2, n_ctx=128))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=6, stream=False))
    finally:
        eng.stop()
    seq = list(prompt)
    for got in final.generated:
        want = int(np.argmax(ref(np.asarray(seq, np.int32))[-1]))
        assert got == want, (final.generated, seq)
        seq.append(got)
