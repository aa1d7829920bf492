"""T5 encoder-decoder serving: transformers goldens for the encoder
(bidirectional relative-position bias), decoder (causal bias + static
cross-attention), chained decode, and the engine integration (the
reference serves t5 GGUFs through llama.cpp's T5 graphs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models.t5_serve import (init_t5_cache, load_t5_serve,
                                           t5_decode_chain,
                                           t5_decode_verify_sample,
                                           t5_prefill_impl)
from llama_box_tpu.sampling import (SamplerParams, init_sampler_state,
                                    make_sampler_arrays)
from llama_box_tpu.server import CompletionsTask, Engine, EngineConfig
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_model import build_vocab
from .test_engine import greedy, run_task

torch = pytest.importorskip("torch")

E, DKV, FF, L, H = 64, 16, 128, 2, 4


def write_tiny_t5(path, state, n_vocab, vocab, scores, types):
    st = state
    w = GGUFWriter(path, architecture="t5")
    for k, v in [("block_count", L), ("context_length", 512),
                 ("embedding_length", E), ("feed_forward_length", FF),
                 ("attention.head_count", H),
                 ("attention.key_length", DKV),
                 ("attention.relative_buckets_count", 32),
                 ("attention.layer_norm_rms_epsilon", 1e-6),
                 ("decoder_start_token_id", 1), ("vocab_size", n_vocab)]:
        w.add_kv(f"t5.{k}", v)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_tensor("token_embd.weight", st["shared.weight"])
    w.add_tensor("output.weight", st["lm_head.weight"])
    w.add_tensor("enc.output_norm.weight",
                 st["encoder.final_layer_norm.weight"])
    w.add_tensor("dec.output_norm.weight",
                 st["decoder.final_layer_norm.weight"])
    w.add_tensor("enc.blk.0.attn_rel_b.weight",
                 st["encoder.block.0.layer.0.SelfAttention."
                    "relative_attention_bias.weight"])
    w.add_tensor("dec.blk.0.attn_rel_b.weight",
                 st["decoder.block.0.layer.0.SelfAttention."
                    "relative_attention_bias.weight"])
    for i in range(L):
        pe = f"encoder.block.{i}."
        o = f"enc.blk.{i}."
        for nm, gg in (("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v"),
                       ("o", "attn_o")):
            w.add_tensor(o + gg + ".weight",
                         st[pe + f"layer.0.SelfAttention.{nm}.weight"])
        w.add_tensor(o + "attn_norm.weight",
                     st[pe + "layer.0.layer_norm.weight"])
        w.add_tensor(o + "ffn_gate.weight",
                     st[pe + "layer.1.DenseReluDense.wi_0.weight"])
        w.add_tensor(o + "ffn_up.weight",
                     st[pe + "layer.1.DenseReluDense.wi_1.weight"])
        w.add_tensor(o + "ffn_down.weight",
                     st[pe + "layer.1.DenseReluDense.wo.weight"])
        w.add_tensor(o + "ffn_norm.weight",
                     st[pe + "layer.1.layer_norm.weight"])
        pd = f"decoder.block.{i}."
        o = f"dec.blk.{i}."
        for nm, gg in (("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v"),
                       ("o", "attn_o")):
            w.add_tensor(o + gg + ".weight",
                         st[pd + f"layer.0.SelfAttention.{nm}.weight"])
        w.add_tensor(o + "attn_norm.weight",
                     st[pd + "layer.0.layer_norm.weight"])
        for nm, gg in (("q", "cross_attn_q"), ("k", "cross_attn_k"),
                       ("v", "cross_attn_v"), ("o", "cross_attn_o")):
            w.add_tensor(o + gg + ".weight",
                         st[pd + f"layer.1.EncDecAttention.{nm}.weight"])
        w.add_tensor(o + "cross_attn_norm.weight",
                     st[pd + "layer.1.layer_norm.weight"])
        w.add_tensor(o + "ffn_gate.weight",
                     st[pd + "layer.2.DenseReluDense.wi_0.weight"])
        w.add_tensor(o + "ffn_up.weight",
                     st[pd + "layer.2.DenseReluDense.wi_1.weight"])
        w.add_tensor(o + "ffn_down.weight",
                     st[pd + "layer.2.DenseReluDense.wo.weight"])
        w.add_tensor(o + "ffn_norm.weight",
                     st[pd + "layer.2.layer_norm.weight"])
    w.write()
    return path


@pytest.fixture(scope="module")
def t5_setup(tmp_path_factory):
    from transformers import T5Config, T5ForConditionalGeneration
    vocab, scores, types = build_vocab()
    V = len(vocab)
    torch.manual_seed(0)
    hc = T5Config(vocab_size=V, d_model=E, d_kv=DKV, d_ff=FF,
                  num_layers=L, num_heads=H,
                  relative_attention_num_buckets=32,
                  relative_attention_max_distance=128,
                  feed_forward_proj="gated-gelu",
                  decoder_start_token_id=1, pad_token_id=0,
                  eos_token_id=2, tie_word_embeddings=False,
                  dropout_rate=0.0)
    hm = T5ForConditionalGeneration(hc).eval()
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in hm.state_dict().items()}
    path = str(tmp_path_factory.mktemp("t5") / "tiny_t5.gguf")
    write_tiny_t5(path, st, V, vocab, scores, types)
    cfg, params = load_t5_serve(path)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return hm, path, cfg, params, tok


def test_t5_greedy_matches_transformers(t5_setup):
    """Encoder + prefill + chained greedy decode == HF generate."""
    hm, _, cfg, params, _ = t5_setup
    rng = np.random.default_rng(7)
    src = rng.integers(3, cfg.vocab_size, (11,)).astype(np.int32)
    N = 8
    with torch.no_grad():
        gen = hm.generate(torch.tensor(src[None].astype(np.int64)),
                          max_new_tokens=N, do_sample=False)
    ref = gen[0].tolist()[1:]
    S = 2
    cache = init_t5_cache(cfg, S, capacity=64, enc_capacity=16,
                          n_dec_layers=L)
    lg, cache = t5_prefill_impl(params, cfg, jnp.asarray(src), cache,
                                jnp.int32(0), jnp.int32(0), jnp.int32(11))
    first = int(np.argmax(np.asarray(lg)))
    assert first == ref[0]
    sstate = init_sampler_state(S, cfg.vocab_size)
    arrs = make_sampler_arrays([SamplerParams(temp=0.0, seed=0)] * S, [2])
    toks, *_, cache, sstate = t5_decode_chain(
        params, cfg, jnp.asarray([first, 0], jnp.int32),
        jnp.asarray([1, 0], jnp.int32), cache, sstate, arrs,
        jnp.asarray([True, False]), n_steps=N - 1)
    ours = [first] + np.asarray(toks)[0].tolist()
    for i in range(min(len(ours), len(ref))):
        assert ours[i] == ref[i], (ours, ref)
        if ref[i] == 2:
            break


def test_t5_padded_prompt_matches_exact(t5_setup):
    """Bucket-padded encoder input (n_valid < T) gives identical first
    logits — pad rows are masked out of the encoder attention and the
    cross attention."""
    _, _, cfg, params, _ = t5_setup
    rng = np.random.default_rng(8)
    src = rng.integers(3, cfg.vocab_size, (9,)).astype(np.int32)
    cache = init_t5_cache(cfg, 1, capacity=32, enc_capacity=16,
                          n_dec_layers=L)
    lg1, _ = t5_prefill_impl(params, cfg, jnp.asarray(src), cache,
                             jnp.int32(0), jnp.int32(0), jnp.int32(9))
    buf = np.zeros(16, np.int32)
    buf[:9] = src
    cache = init_t5_cache(cfg, 1, capacity=32, enc_capacity=16,
                          n_dec_layers=L)
    lg2, _ = t5_prefill_impl(params, cfg, jnp.asarray(buf), cache,
                             jnp.int32(0), jnp.int32(0), jnp.int32(9))
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               atol=1e-5, rtol=1e-5)


def test_t5_unchained_step_matches_chain(t5_setup):
    """One t5_decode_verify_sample step == the first chained step."""
    _, _, cfg, params, _ = t5_setup
    rng = np.random.default_rng(9)
    src = rng.integers(3, cfg.vocab_size, (7,)).astype(np.int32)
    S = 2

    def prefill():
        cache = init_t5_cache(cfg, S, capacity=32, enc_capacity=8,
                              n_dec_layers=L)
        lg, cache = t5_prefill_impl(params, cfg, jnp.asarray(src), cache,
                                    jnp.int32(0), jnp.int32(0),
                                    jnp.int32(7))
        return int(np.argmax(np.asarray(lg))), cache

    first, cache = prefill()
    sstate = init_sampler_state(S, cfg.vocab_size)
    arrs = make_sampler_arrays([SamplerParams(temp=0.0, seed=0)] * S, [2])
    toks, *_rest = t5_decode_verify_sample(
        params, cfg, jnp.asarray([[first], [0]], jnp.int32),
        jnp.asarray([[1], [0]], jnp.int32), jnp.zeros((S,), jnp.int32),
        cache, jnp.asarray([True, False]), jnp.asarray([True, False]),
        sstate, arrs)
    one = int(np.asarray(toks)[0, 0])

    first2, cache = prefill()
    assert first2 == first
    sstate = init_sampler_state(S, cfg.vocab_size)
    toksc, *_ = t5_decode_chain(
        params, cfg, jnp.asarray([first, 0], jnp.int32),
        jnp.asarray([1, 0], jnp.int32), cache, sstate, arrs,
        jnp.asarray([True, False]), n_steps=3)
    assert int(np.asarray(toksc)[0, 0]) == one


def test_t5_engine_greedy_matches_transformers(t5_setup):
    """Full engine serving on a t5 GGUF == HF generate (encoder-decoder
    branch: one-shot encode prefill, chained decoder sampling)."""
    hm, _, cfg, params, tok = t5_setup
    rng = np.random.default_rng(10)
    prompt = rng.integers(3, cfg.vocab_size, (9,)).astype(np.int32).tolist()
    N = 8
    with torch.no_grad():
        gen = hm.generate(torch.tensor([prompt]), max_new_tokens=N,
                          do_sample=False)
    ref_new = gen[0].tolist()[1:]
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=128, decode_chain=4))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=N, stream=False))
    finally:
        eng.stop()
    got = final.generated[:len(ref_new)]
    assert got == ref_new[:len(got)] and len(got) >= 4, (got, ref_new)
