"""Transformers-golden numerics for the classic decoder families
(gptneox / falcon / phi2 / starcoder2): build a tiny HF model, export its
state dict to GGUF following llama.cpp's conversion conventions (qkv
de-interleave, norm/tensor name maps), and require our prefill logits to
match HF — this is what caught the ungated-FFN activation bug (these
families use GELU / squared-ReLU, not SiLU).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile, GGUFWriter
from llama_box_tpu.models import load_model
from llama_box_tpu.models.llama import init_kv_cache, make_rope, prefill_impl
from llama_box_tpu.server import CompletionsTask, Engine, EngineConfig
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_model import build_vocab
from .test_engine import greedy, run_task

torch = pytest.importorskip("torch")

L, E, H, D, FF = 2, 64, 4, 16, 128


def _gguf_header(path, arch, n_kv_heads, rope_dim, extra=(), ff=FF,
                 n_layers=L):
    vocab, scores, types = build_vocab()
    w = GGUFWriter(path, architecture=arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.context_length", 256)
    w.add_kv(f"{arch}.embedding_length", E)
    w.add_kv(f"{arch}.feed_forward_length", ff)
    w.add_kv(f"{arch}.attention.head_count", H)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv_heads)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", rope_dim)
    w.add_kv(f"{arch}.vocab_size", len(vocab))
    for k, v in extra:
        w.add_kv(f"{arch}.{k}", v)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(scores, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array(types, np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.add_bos_token", True)
    return w, len(vocab)


def _np(state, key):
    return state[key].detach().to(torch.float32).numpy()


def _compare(hm, path, atol=3e-3, decode_check=False):
    cfg, params = load_model(path, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    T = 12
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    logits, _ = prefill_impl(params, cfg, jnp.asarray(toks), kv,
                             jnp.int32(0), jnp.int32(0), jnp.int32(T),
                             cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=atol, rtol=5e-3)
    if not decode_check:
        return
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    prompt = toks[:6].tolist()
    N = 8
    with torch.no_grad():
        gen = hm.generate(torch.tensor([prompt]), max_new_tokens=N,
                          do_sample=False)
    ref_new = gen[0, len(prompt):].tolist()
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=2, n_ctx=128))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=N, stream=False))
    finally:
        eng.stop()
    got = final.generated[:len(ref_new)]
    assert got == ref_new[:len(got)], (got, ref_new)
    # the engine stops on EOG tokens HF's generate keeps emitting past
    assert len(got) >= 4 or tok.is_eog(got[-1]), (got, ref_new)


def test_gptneox_matches_transformers(tmp_path):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    hc = GPTNeoXConfig(vocab_size=len(vocab), hidden_size=E,
                       num_hidden_layers=L, num_attention_heads=H,
                       intermediate_size=FF, rotary_pct=0.5,
                       hidden_act="gelu_pytorch_tanh",
                       use_parallel_residual=True, layer_norm_eps=1e-5,
                       tie_word_embeddings=False, use_cache=False)
    hm = GPTNeoXForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "neox.gguf")
    w, V = _gguf_header(path, "gptneox", H, D // 2,
                        [("use_parallel_residual", True)])
    w.add_tensor("token_embd.weight", _np(st, "gpt_neox.embed_in.weight"))
    w.add_tensor("output_norm.weight",
                 _np(st, "gpt_neox.final_layer_norm.weight"))
    w.add_tensor("output_norm.bias",
                 _np(st, "gpt_neox.final_layer_norm.bias"))
    w.add_tensor("output.weight", _np(st, "embed_out.weight"))
    for i in range(L):
        p = f"gpt_neox.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "attn_norm.bias", _np(st, p + "input_layernorm.bias"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.bias",
                     _np(st, p + "post_attention_layernorm.bias"))
        # HF stores qkv interleaved per head [H, 3, D]; GGUF is sequential
        qkv = _np(st, p + "attention.query_key_value.weight")
        qkv = qkv.reshape(H, 3, D, E).transpose(1, 0, 2, 3).reshape(3 * H * D, E)
        w.add_tensor(o + "attn_qkv.weight", qkv)
        qkvb = _np(st, p + "attention.query_key_value.bias")
        qkvb = qkvb.reshape(H, 3, D).transpose(1, 0, 2).reshape(3 * H * D)
        w.add_tensor(o + "attn_qkv.bias", qkvb)
        w.add_tensor(o + "attn_output.weight", _np(st, p + "attention.dense.weight"))
        w.add_tensor(o + "attn_output.bias", _np(st, p + "attention.dense.bias"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.dense_h_to_4h.weight"))
        w.add_tensor(o + "ffn_up.bias", _np(st, p + "mlp.dense_h_to_4h.bias"))
        w.add_tensor(o + "ffn_down.weight", _np(st, p + "mlp.dense_4h_to_h.weight"))
        w.add_tensor(o + "ffn_down.bias", _np(st, p + "mlp.dense_4h_to_h.bias"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_starcoder2_matches_transformers(tmp_path):
    from transformers import Starcoder2Config, Starcoder2ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = Starcoder2Config(vocab_size=len(vocab), hidden_size=E,
                          num_hidden_layers=L, num_attention_heads=H,
                          num_key_value_heads=HKV, intermediate_size=FF,
                          hidden_act="gelu_pytorch_tanh",
                          norm_epsilon=1e-5, tie_word_embeddings=False,
                          use_cache=False, sliding_window=None,
                          rope_theta=10000.0)
    hm = Starcoder2ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "sc2.gguf")
    w, V = _gguf_header(path, "starcoder2", HKV, D)
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output_norm.bias", _np(st, "model.norm.bias"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "attn_norm.bias", _np(st, p + "input_layernorm.bias"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.bias",
                     _np(st, p + "post_attention_layernorm.bias"))
        for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                       ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            w.add_tensor(o + gg + ".weight",
                         _np(st, p + f"self_attn.{hf}.weight"))
            w.add_tensor(o + gg + ".bias",
                         _np(st, p + f"self_attn.{hf}.bias"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.c_fc.weight"))
        w.add_tensor(o + "ffn_up.bias", _np(st, p + "mlp.c_fc.bias"))
        w.add_tensor(o + "ffn_down.weight", _np(st, p + "mlp.c_proj.weight"))
        w.add_tensor(o + "ffn_down.bias", _np(st, p + "mlp.c_proj.bias"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_phi2_matches_transformers(tmp_path):
    from transformers import PhiConfig, PhiForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    hc = PhiConfig(vocab_size=len(vocab), hidden_size=E,
                   num_hidden_layers=L, num_attention_heads=H,
                   num_key_value_heads=H, intermediate_size=FF,
                   partial_rotary_factor=0.5, hidden_act="gelu_new",
                   layer_norm_eps=1e-5, tie_word_embeddings=False,
                   use_cache=False, qk_layernorm=False)
    hm = PhiForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "phi2.gguf")
    w, V = _gguf_header(path, "phi2", H, D // 2)
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight",
                 _np(st, "model.final_layernorm.weight"))
    w.add_tensor("output_norm.bias", _np(st, "model.final_layernorm.bias"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    w.add_tensor("output.bias", _np(st, "lm_head.bias"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "attn_norm.bias", _np(st, p + "input_layernorm.bias"))
        for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                       ("v_proj", "attn_v"), ("dense", "attn_output")):
            w.add_tensor(o + gg + ".weight",
                         _np(st, p + f"self_attn.{hf}.weight"))
            w.add_tensor(o + gg + ".bias",
                         _np(st, p + f"self_attn.{hf}.bias"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.fc1.weight"))
        w.add_tensor(o + "ffn_up.bias", _np(st, p + "mlp.fc1.bias"))
        w.add_tensor(o + "ffn_down.weight", _np(st, p + "mlp.fc2.weight"))
        w.add_tensor(o + "ffn_down.bias", _np(st, p + "mlp.fc2.bias"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_gpt2_matches_transformers(tmp_path):
    """gpt2: learned absolute position embeddings (position_embd table),
    no rope, Conv1D (in, out) weight layout transposed at export."""
    from transformers import GPT2Config, GPT2LMHeadModel
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    hc = GPT2Config(vocab_size=len(vocab), n_embd=E, n_layer=L, n_head=H,
                    n_positions=256, n_inner=FF,
                    activation_function="gelu_new",
                    layer_norm_epsilon=1e-5, use_cache=False,
                    attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    hm = GPT2LMHeadModel(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "gpt2.gguf")
    w, V = _gguf_header(path, "gpt2", H, D)
    w.add_tensor("token_embd.weight", _np(st, "transformer.wte.weight"))
    w.add_tensor("position_embd.weight", _np(st, "transformer.wpe.weight"))
    w.add_tensor("output_norm.weight", _np(st, "transformer.ln_f.weight"))
    w.add_tensor("output_norm.bias", _np(st, "transformer.ln_f.bias"))
    w.add_tensor("output.weight", _np(st, "transformer.wte.weight"))
    for i in range(L):
        p = f"transformer.h.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", _np(st, p + "ln_1.weight"))
        w.add_tensor(o + "attn_norm.bias", _np(st, p + "ln_1.bias"))
        w.add_tensor(o + "ffn_norm.weight", _np(st, p + "ln_2.weight"))
        w.add_tensor(o + "ffn_norm.bias", _np(st, p + "ln_2.bias"))
        # HF gpt2 Conv1D stores (in, out); ggml wants (out, in)
        w.add_tensor(o + "attn_qkv.weight",
                     _np(st, p + "attn.c_attn.weight").T.copy())
        w.add_tensor(o + "attn_qkv.bias", _np(st, p + "attn.c_attn.bias"))
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "attn.c_proj.weight").T.copy())
        w.add_tensor(o + "attn_output.bias",
                     _np(st, p + "attn.c_proj.bias"))
        w.add_tensor(o + "ffn_up.weight",
                     _np(st, p + "mlp.c_fc.weight").T.copy())
        w.add_tensor(o + "ffn_up.bias", _np(st, p + "mlp.c_fc.bias"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.c_proj.weight").T.copy())
        w.add_tensor(o + "ffn_down.bias", _np(st, p + "mlp.c_proj.bias"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_bloom_matches_transformers(tmp_path):
    """bloom: ALiBi position bias (no rope, no position table), embedding
    LayerNorm, per-head-interleaved fused qkv."""
    from transformers import BloomConfig, BloomForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    hc = BloomConfig(vocab_size=len(vocab), hidden_size=E, n_layer=L,
                     n_head=H, layer_norm_epsilon=1e-5, use_cache=False,
                     hidden_dropout=0.0, attention_dropout=0.0)
    hm = BloomForCausalLM(hc).eval()
    st = hm.state_dict()
    FFB = 4 * E   # bloom MLP is a fixed 4x expansion

    path = str(tmp_path / "bloom.gguf")
    w, V = _gguf_header(path, "bloom", H, D, ff=FFB)
    w.add_tensor("token_embd.weight",
                 _np(st, "transformer.word_embeddings.weight"))
    w.add_tensor("token_embd_norm.weight",
                 _np(st, "transformer.word_embeddings_layernorm.weight"))
    w.add_tensor("token_embd_norm.bias",
                 _np(st, "transformer.word_embeddings_layernorm.bias"))
    w.add_tensor("output_norm.weight", _np(st, "transformer.ln_f.weight"))
    w.add_tensor("output_norm.bias", _np(st, "transformer.ln_f.bias"))
    w.add_tensor("output.weight",
                 _np(st, "transformer.word_embeddings.weight"))
    for i in range(L):
        p = f"transformer.h.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "attn_norm.bias",
                     _np(st, p + "input_layernorm.bias"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.bias",
                     _np(st, p + "post_attention_layernorm.bias"))
        qkv = _np(st, p + "self_attention.query_key_value.weight")
        qkv = qkv.reshape(H, 3, D, E).transpose(1, 0, 2, 3) \
            .reshape(3 * H * D, E)
        w.add_tensor(o + "attn_qkv.weight", qkv)
        qkvb = _np(st, p + "self_attention.query_key_value.bias")
        qkvb = qkvb.reshape(H, 3, D).transpose(1, 0, 2).reshape(3 * H * D)
        w.add_tensor(o + "attn_qkv.bias", qkvb)
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "self_attention.dense.weight"))
        w.add_tensor(o + "attn_output.bias",
                     _np(st, p + "self_attention.dense.bias"))
        w.add_tensor(o + "ffn_up.weight",
                     _np(st, p + "mlp.dense_h_to_4h.weight"))
        w.add_tensor(o + "ffn_up.bias", _np(st, p + "mlp.dense_h_to_4h.bias"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.dense_4h_to_h.weight"))
        w.add_tensor(o + "ffn_down.bias",
                     _np(st, p + "mlp.dense_4h_to_h.bias"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_mpt_matches_transformers(tmp_path):
    """mpt: ALiBi, bias-free LayerNorm, fused sequential qkv."""
    from transformers import MptConfig, MptForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    hc = MptConfig(vocab_size=len(vocab), d_model=E, n_heads=H, n_layers=L,
                   expansion_ratio=2, max_seq_len=256, use_cache=False,
                   layer_norm_epsilon=1e-5)
    hm = MptForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "mpt.gguf")
    w, V = _gguf_header(path, "mpt", H, D,
                        extra=[("attention.max_alibi_bias", 8.0)])
    w.add_tensor("token_embd.weight", _np(st, "transformer.wte.weight"))
    w.add_tensor("output_norm.weight", _np(st, "transformer.norm_f.weight"))
    w.add_tensor("output.weight", _np(st, "transformer.wte.weight"))
    for i in range(L):
        p = f"transformer.blocks.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", _np(st, p + "norm_1.weight"))
        w.add_tensor(o + "ffn_norm.weight", _np(st, p + "norm_2.weight"))
        w.add_tensor(o + "attn_qkv.weight", _np(st, p + "attn.Wqkv.weight"))
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "attn.out_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "ffn.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "ffn.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def _qkvo(w, st, p, o, permute_heads=None, hkv=None, bias=False):
    """Export separate q/k/v/o projections; optionally apply the
    llama-family head permutation to q and k."""
    for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                   ("v_proj", "attn_v"), ("o_proj", "attn_output")):
        t = _np(st, p + f"self_attn.{hf}.weight")
        if permute_heads and hf == "q_proj":
            t = _permute_llama_qk(t, permute_heads)
        if permute_heads and hf == "k_proj":
            t = _permute_llama_qk(t, hkv)
        w.add_tensor(o + gg + ".weight", t)
        if bias and (p + f"self_attn.{hf}.bias") in st:
            w.add_tensor(o + gg + ".bias",
                         _np(st, p + f"self_attn.{hf}.bias"))


def test_gemma2_matches_transformers(tmp_path):
    """gemma2: minus-one norm storage, sandwich norms, attn/logit
    softcaps, sqrt(E) embedding scale, geglu, alternating SWA."""
    from transformers import Gemma2Config, Gemma2ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = Gemma2Config(vocab_size=len(vocab), hidden_size=E,
                      num_hidden_layers=L, num_attention_heads=H,
                      num_key_value_heads=HKV, head_dim=D,
                      intermediate_size=FF, rms_norm_eps=1e-5,
                      use_cache=False, rope_theta=10000.0,
                      attn_logit_softcapping=50.0,
                      final_logit_softcapping=30.0,
                      query_pre_attn_scalar=D, sliding_window=128,
                      tie_word_embeddings=True)
    hm = Gemma2ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "gemma2.gguf")
    w, V = _gguf_header(path, "gemma2", HKV, D,
                        extra=[("attention.key_length", D),
                               ("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attn_logit_softcapping", 50.0),
                               ("final_logit_softcapping", 30.0),
                               ("attention.sliding_window", 128)])

    def m1(key):   # gemma GGUFs store EFFECTIVE norm weights (hf_w + 1)
        return _np(st, key) + 1.0

    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", m1("model.norm.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     m1(p + "input_layernorm.weight"))
        w.add_tensor(o + "post_attention_norm.weight",
                     m1(p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     m1(p + "pre_feedforward_layernorm.weight"))
        w.add_tensor(o + "post_ffw_norm.weight",
                     m1(p + "post_feedforward_layernorm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_cohere_matches_transformers(tmp_path):
    """command-r: bias-free LayerNorm, parallel attn+ffn residual,
    logit_scale, llama-family q/k permutation."""
    from transformers import CohereConfig, CohereForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 4
    hc = CohereConfig(vocab_size=len(vocab), hidden_size=E,
                      num_hidden_layers=L, num_attention_heads=H,
                      num_key_value_heads=HKV, intermediate_size=FF,
                      layer_norm_eps=1e-5, logit_scale=0.5,
                      use_cache=False, rope_theta=10000.0, use_qk_norm=False,
                      tie_word_embeddings=True)
    hm = CohereForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "cohere.gguf")
    w, V = _gguf_header(path, "command-r", HKV, D,
                        extra=[("logit_scale", 0.5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        _qkvo(w, st, p, o, permute_heads=H, hkv=HKV)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_cohere2_matches_transformers(tmp_path):
    """cohere2 (command-r7b): 3-sliding:1-full layer pattern where the
    full-attention layers are UNROPED (llama.cpp applies rope only on
    is_swa layers); shared-norm parallel residual + logit_scale like
    command-r."""
    from transformers import Cohere2Config, Cohere2ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, NL = 2, 4
    hc = Cohere2Config(vocab_size=len(vocab), hidden_size=E,
                       num_hidden_layers=NL, num_attention_heads=H,
                       num_key_value_heads=HKV, intermediate_size=FF,
                       sliding_window=8, sliding_window_pattern=4,
                       layer_norm_eps=1e-5, logit_scale=0.5,
                       use_cache=False, rope_theta=10000.0,
                       tie_word_embeddings=True)
    hm = Cohere2ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "cohere2.gguf")
    w, V = _gguf_header(path, "cohere2", HKV, D, n_layers=NL,
                        extra=[("logit_scale", 0.5),
                               ("attention.sliding_window", 8)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    for i in range(NL):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_stablelm_matches_transformers(tmp_path):
    """stablelm: partial rotary, biased LayerNorm, gated SiLU FFN."""
    from transformers import StableLmConfig, StableLmForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = StableLmConfig(vocab_size=len(vocab), hidden_size=E,
                        num_hidden_layers=L, num_attention_heads=H,
                        num_key_value_heads=HKV, intermediate_size=FF,
                        partial_rotary_factor=0.5, layer_norm_eps=1e-5,
                        use_cache=False, rope_theta=10000.0,
                        use_qkv_bias=False, use_parallel_residual=False,
                        qk_layernorm=False, tie_word_embeddings=False)
    hm = StableLmForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "stablelm.gguf")
    w, V = _gguf_header(path, "stablelm", HKV, D // 2)
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output_norm.bias", _np(st, "model.norm.bias"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "attn_norm.bias",
                     _np(st, p + "input_layernorm.bias"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.bias",
                     _np(st, p + "post_attention_layernorm.bias"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_granite_matches_transformers(tmp_path):
    """granite: the four multipliers (embedding/residual/logits/attention)
    on a llama skeleton."""
    from transformers import GraniteConfig, GraniteForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = GraniteConfig(vocab_size=len(vocab), hidden_size=E,
                       num_hidden_layers=L, num_attention_heads=H,
                       num_key_value_heads=HKV, intermediate_size=FF,
                       rms_norm_eps=1e-5, use_cache=False,
                       rope_theta=10000.0, embedding_multiplier=2.0,
                       residual_multiplier=0.5, logits_scaling=4.0,
                       attention_multiplier=0.125,
                       tie_word_embeddings=False)
    hm = GraniteForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "granite.gguf")
    w, V = _gguf_header(path, "granite", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("embedding_scale", 2.0),
                               ("residual_scale", 0.5),
                               ("logit_scale", 1.0 / 4.0),
                               ("attention.scale", 0.125)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, permute_heads=H, hkv=HKV)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_minicpm_matches_transformers(tmp_path):
    """minicpm (v1/v2): a llama skeleton with embedding scale (scale_emb),
    residual scale (scale_depth/sqrt(L)) and logit scale
    (1/(hidden/dim_model_base)), tied embeddings. Mathematically the
    granite multiplier set with the default attention scale — the golden
    anchors the minicpm.* metadata spellings against transformers'
    Granite implementation with identical multipliers."""
    from transformers import GraniteConfig, GraniteForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(2)
    HKV = 2
    scale_emb, scale_depth, dim_base = 12.0, 1.4, 16
    hc = GraniteConfig(vocab_size=len(vocab), hidden_size=E,
                       num_hidden_layers=L, num_attention_heads=H,
                       num_key_value_heads=HKV, intermediate_size=FF,
                       rms_norm_eps=1e-5, use_cache=False,
                       rope_theta=10000.0,
                       embedding_multiplier=scale_emb,
                       residual_multiplier=scale_depth / (L ** 0.5),
                       logits_scaling=E / dim_base,
                       attention_multiplier=D ** -0.5,
                       tie_word_embeddings=True)
    hm = GraniteForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "minicpm.gguf")
    w, V = _gguf_header(path, "minicpm", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("embedding_scale", scale_emb),
                               ("residual_scale",
                                scale_depth / (L ** 0.5)),
                               ("logit_scale", dim_base / E)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    # tied embeddings: no output.weight in the GGUF
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, permute_heads=H, hkv=HKV)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_granitemoe_matches_transformers(tmp_path):
    """granitemoe: the granite multipliers + MoE with fused input_linear
    (rows 0..F = gate, F..2F = up, split at export like llama.cpp) and
    topk-then-softmax routing (== softmax + renormalize)."""
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 4, 2
    hc = GraniteMoeConfig(vocab_size=len(vocab), hidden_size=E,
                          num_hidden_layers=L, num_attention_heads=H,
                          num_key_value_heads=HKV, intermediate_size=FF,
                          num_local_experts=X, num_experts_per_tok=K,
                          rms_norm_eps=1e-5, use_cache=False,
                          rope_theta=10000.0, embedding_multiplier=2.0,
                          residual_multiplier=0.5, logits_scaling=4.0,
                          attention_multiplier=0.125,
                          tie_word_embeddings=False)
    hm = GraniteMoeForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "granitemoe.gguf")
    w, V = _gguf_header(path, "granitemoe", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("embedding_scale", 2.0),
                               ("residual_scale", 0.5),
                               ("logit_scale", 1.0 / 4.0),
                               ("attention.scale", 0.125),
                               ("expert_count", X),
                               ("expert_used_count", K)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, permute_heads=H, hkv=HKV)
        w.add_tensor(o + "ffn_gate_inp.weight",
                     _np(st, p + "block_sparse_moe.router.layer.weight"))
        inp = _np(st, p + "block_sparse_moe.input_linear.weight")  # [X,2F,E]
        w.add_tensor(o + "ffn_gate_exps.weight", inp[:, :FF])
        w.add_tensor(o + "ffn_up_exps.weight", inp[:, FF:])
        w.add_tensor(o + "ffn_down_exps.weight",
                     _np(st, p + "block_sparse_moe.output_linear.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_olmo2_matches_transformers(tmp_path):
    """olmo2: post-norm-only blocks, whole-row q/k RMS norms."""
    from transformers import Olmo2Config, Olmo2ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 4
    hc = Olmo2Config(vocab_size=len(vocab), hidden_size=E,
                     num_hidden_layers=L, num_attention_heads=H,
                     num_key_value_heads=HKV, intermediate_size=FF,
                     rms_norm_eps=1e-5, use_cache=False,
                     rope_theta=10000.0, tie_word_embeddings=False)
    hm = Olmo2ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "olmo2.gguf")
    w, V = _gguf_header(path, "olmo2", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "post_attention_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "post_ffw_norm.weight",
                     _np(st, p + "post_feedforward_layernorm.weight"))
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_glm4_matches_transformers(tmp_path):
    """glm4: four-norm sandwich blocks, interleaved partial rotary
    (adjacent-pair "norm" mode), fused gate|up, qkv biases."""
    from transformers import Glm4Config, Glm4ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = Glm4Config(vocab_size=len(vocab), hidden_size=E,
                    num_hidden_layers=L, num_attention_heads=H,
                    num_key_value_heads=HKV, head_dim=D,
                    intermediate_size=FF, partial_rotary_factor=0.5,
                    rms_norm_eps=1e-5, use_cache=False,
                    rope_theta=10000.0, attention_bias=True,
                    pad_token_id=0, eos_token_id=2,
                    tie_word_embeddings=False)
    hm = Glm4ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "glm4.gguf")
    w, V = _gguf_header(path, "glm4", HKV, D // 2,
                        extra=[("attention.key_length", D),
                               ("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "post_attention_norm.weight",
                     _np(st, p + "post_self_attn_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "post_ffw_norm.weight",
                     _np(st, p + "post_mlp_layernorm.weight"))
        _qkvo(w, st, p, o, bias=True)
        w.add_tensor(o + "ffn_up.weight",
                     _np(st, p + "mlp.gate_up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_nemotron_matches_transformers(tmp_path):
    """nemotron: LayerNorm1P (effective weight = 1+w, stored effective in
    GGUF like gemma), squared-ReLU ungated FFN, partial neox rotary."""
    from transformers import NemotronConfig, NemotronForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = NemotronConfig(vocab_size=len(vocab), hidden_size=E,
                        num_hidden_layers=L, num_attention_heads=H,
                        num_key_value_heads=HKV, intermediate_size=FF,
                        partial_rotary_factor=0.5, norm_eps=1e-5,
                        use_cache=False, rope_theta=10000.0,
                        tie_word_embeddings=False)
    hm = NemotronForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "nemotron.gguf")
    w, V = _gguf_header(path, "nemotron", HKV, D // 2)

    def w1(key):   # llama.cpp stores nemotron norm weights as (hf + 1)
        return _np(st, key) + 1.0

    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", w1("model.norm.weight"))
    w.add_tensor("output_norm.bias", _np(st, "model.norm.bias"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", w1(p + "input_layernorm.weight"))
        w.add_tensor(o + "attn_norm.bias", _np(st, p + "input_layernorm.bias"))
        w.add_tensor(o + "ffn_norm.weight",
                     w1(p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.bias",
                     _np(st, p + "post_attention_layernorm.bias"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_olmoe_matches_transformers(tmp_path):
    """olmoe: whole-row q/k RMS norms + every-layer MoE without top-k
    renormalization."""
    from transformers import OlmoeConfig, OlmoeForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 4, 2
    hc = OlmoeConfig(vocab_size=len(vocab), hidden_size=E,
                     num_hidden_layers=L, num_attention_heads=H,
                     num_key_value_heads=HKV, intermediate_size=E,
                     num_experts=X, num_experts_per_tok=K,
                     norm_topk_prob=False, rms_norm_eps=1e-5,
                     use_cache=False, rope_theta=10000.0,
                     tie_word_embeddings=False)
    hm = OlmoeForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "olmoe.gguf")
    w, V = _gguf_header(path, "olmoe", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("expert_count", X),
                               ("expert_used_count", K)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight"))
        w.add_tensor(o + "ffn_gate_inp.weight", _np(st, p + "mlp.gate.weight"))
        for hfk, gg in (("gate_proj", "ffn_gate_exps"),
                        ("up_proj", "ffn_up_exps"),
                        ("down_proj", "ffn_down_exps")):
            w.add_tensor(o + gg + ".weight", np.stack([
                _np(st, p + f"mlp.experts.{j}.{hfk}.weight")
                for j in range(X)]))
    w.write()
    _compare(hm, path, decode_check=True)


def test_gemma3_text_matches_transformers(tmp_path):
    """gemma3 (text): per-head q/k norms, dual rope bases (local layers at
    their own base), sandwich norms, 5-local:1-global SWA pattern."""
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = Gemma3TextConfig(vocab_size=len(vocab), hidden_size=E,
                          num_hidden_layers=L, num_attention_heads=H,
                          num_key_value_heads=HKV, head_dim=D,
                          intermediate_size=FF, rms_norm_eps=1e-5,
                          use_cache=False, rope_theta=50000.0,
                          rope_local_base_freq=10000.0,
                          query_pre_attn_scalar=D, sliding_window=8,
                          sliding_window_pattern=2, rope_scaling=None,
                          tie_word_embeddings=True,
                          max_position_embeddings=256)
    hm = Gemma3ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "gemma3.gguf")
    w, V = _gguf_header(path, "gemma3", HKV, D,
                        extra=[("attention.key_length", D),
                               ("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attention.sliding_window", 8),
                               ("attention.sliding_window_pattern", 2),
                               ("rope.local_freq_base", 10000.0)])

    def m1(key):   # gemma GGUFs store EFFECTIVE norm weights (hf_w + 1)
        return _np(st, key) + 1.0

    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", m1("model.norm.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", m1(p + "input_layernorm.weight"))
        w.add_tensor(o + "post_attention_norm.weight",
                     m1(p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     m1(p + "pre_feedforward_layernorm.weight"))
        w.add_tensor(o + "post_ffw_norm.weight",
                     m1(p + "post_feedforward_layernorm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "attn_q_norm.weight",
                     m1(p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     m1(p + "self_attn.k_norm.weight"))
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    # overwrite the default rope base with gemma3's global base
    cfg, params = load_model(path, dtype=jnp.float32,
                             metadata_overrides={"gemma3.rope.freq_base":
                                                 50000.0})
    rng = np.random.default_rng(6)
    T = 12
    toks = rng.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    logits, _ = prefill_impl(params, cfg, jnp.asarray(toks), kv,
                             jnp.int32(0), jnp.int32(0), jnp.int32(T),
                             cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=3e-3, rtol=5e-3)


def test_phi3_longrope_matches_transformers(tmp_path):
    """phi3: fused qkv + fused gate|up (SWIGLU order), LongRoPE per-dim
    frequency factors with the sqrt(1+ln(scale)/ln(orig)) magnitude —
    the test context exceeds the original window so the LONG factors and
    the magnitude scale are both exercised."""
    from transformers import Phi3Config, Phi3ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    ORIG, MAXP = 8, 64
    rng = np.random.default_rng(0)
    long_f = (1.0 + rng.uniform(0.5, 3.0, D // 2)).round(3).tolist()
    short_f = (1.0 + rng.uniform(0.0, 0.3, D // 2)).round(3).tolist()
    hc = Phi3Config(vocab_size=len(vocab), hidden_size=E,
                    num_hidden_layers=L, num_attention_heads=H,
                    num_key_value_heads=HKV, intermediate_size=FF,
                    rms_norm_eps=1e-5, use_cache=False,
                    rope_theta=10000.0, tie_word_embeddings=False,
                    max_position_embeddings=MAXP,
                    original_max_position_embeddings=ORIG,
                    pad_token_id=0, bos_token_id=1, eos_token_id=2,
                    rope_scaling={"type": "longrope",
                                  "long_factor": long_f,
                                  "short_factor": short_f})
    hm = Phi3ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "phi3.gguf")
    w, V = _gguf_header(path, "phi3", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("rope.scaling.original_context_length",
                                ORIG)])
    w.add_tensor("rope_factors_long.weight",
                 np.asarray(long_f, np.float32))
    w.add_tensor("rope_factors_short.weight",
                 np.asarray(short_f, np.float32))
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "attn_qkv.weight",
                     _np(st, p + "self_attn.qkv_proj.weight"))
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "self_attn.o_proj.weight"))
        w.add_tensor(o + "ffn_up.weight",
                     _np(st, p + "mlp.gate_up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()

    # context_length (=256 from the header) > ORIG -> the engine/rope
    # builds with the LONG factors; transformers switches dynamically by
    # seq_len, so drive past ORIG tokens to compare in long mode
    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.extra.get("rope_factors_long")
    rng2 = np.random.default_rng(4)
    T = 12            # > ORIG: HF uses long factors for the whole pass
    toks = rng2.integers(3, cfg.vocab_size, (T,)).astype(np.int32)
    with torch.no_grad():
        ref = hm(torch.tensor(toks[None].astype(np.int64))).logits[0]
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    logits, _ = prefill_impl(params, cfg, jnp.asarray(toks), kv,
                             jnp.int32(0), jnp.int32(0), jnp.int32(T),
                             cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref[-1].numpy(),
                               atol=3e-3, rtol=5e-3)


def test_deepseek2_mla_matches_transformers(tmp_path):
    """deepseek2 MLA (low-rank q/kv, decoupled rope head, dense+MoE layer
    groups, shared expert): logits match transformers DeepseekV2. The
    rope-slice channels are permuted interleaved->half at export exactly
    like llama.cpp's converter."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM
    vocab, _, _ = build_vocab()
    V = len(vocab)
    torch.manual_seed(0)
    QLORA, KVLORA, ROPE, NOPE, VD, FFD = 32, 32, 8, 16, 24, 96
    X, K = 4, 2
    hc = DeepseekV2Config(
        vocab_size=V, hidden_size=E, num_hidden_layers=L,
        num_attention_heads=H, num_key_value_heads=H,
        q_lora_rank=QLORA, kv_lora_rank=KVLORA,
        qk_rope_head_dim=ROPE, qk_nope_head_dim=NOPE, v_head_dim=VD,
        intermediate_size=FFD, moe_intermediate_size=FFD // 2,
        n_routed_experts=X, num_experts_per_tok=K, n_shared_experts=1,
        first_k_dense_replace=1, moe_layer_freq=1, n_group=1, topk_group=1,
        topk_method="greedy", norm_topk_prob=False,
        routed_scaling_factor=1.0, rms_norm_eps=1e-5, use_cache=False,
        rope_theta=10000.0, tie_word_embeddings=False, attention_bias=False)
    hm = DeepseekV2ForCausalLM(hc).eval()
    st = hm.state_dict()

    idx = np.concatenate([np.arange(0, ROPE, 2), np.arange(1, ROPE, 2)])
    path = str(tmp_path / "ds2.gguf")
    w, _ = _gguf_header(path, "deepseek2", H, ROPE, ff=FFD,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attention.q_lora_rank", QLORA),
                               ("attention.kv_lora_rank", KVLORA),
                               ("attention.key_length", NOPE + ROPE),
                               ("attention.value_length", VD),
                               ("expert_count", X),
                               ("expert_used_count", K),
                               ("expert_weights_scale", 1.0),
                               ("expert_shared_count", 1)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        qb = _np(st, p + "self_attn.q_b_proj.weight") \
            .reshape(H, NOPE + ROPE, QLORA).copy()
        qb[:, NOPE:] = qb[:, NOPE:][:, idx]
        kva = _np(st, p + "self_attn.kv_a_proj_with_mqa.weight").copy()
        kva[KVLORA:] = kva[KVLORA:][idx]
        w.add_tensor(o + "attn_q_a.weight",
                     _np(st, p + "self_attn.q_a_proj.weight"))
        w.add_tensor(o + "attn_q_a_norm.weight",
                     _np(st, p + "self_attn.q_a_layernorm.weight"))
        w.add_tensor(o + "attn_q_b.weight",
                     qb.reshape(H * (NOPE + ROPE), QLORA))
        w.add_tensor(o + "attn_kv_a_mqa.weight", kva)
        w.add_tensor(o + "attn_kv_a_norm.weight",
                     _np(st, p + "self_attn.kv_a_layernorm.weight"))
        w.add_tensor(o + "attn_kv_b.weight",
                     _np(st, p + "self_attn.kv_b_proj.weight"))
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "self_attn.o_proj.weight"))
        if i == 0:
            w.add_tensor(o + "ffn_gate.weight",
                         _np(st, p + "mlp.gate_proj.weight"))
            w.add_tensor(o + "ffn_up.weight",
                         _np(st, p + "mlp.up_proj.weight"))
            w.add_tensor(o + "ffn_down.weight",
                         _np(st, p + "mlp.down_proj.weight"))
        else:
            w.add_tensor(o + "ffn_gate_inp.weight",
                         _np(st, p + "mlp.gate.weight"))
            for hfk, gg in (("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps"),
                            ("down_proj", "ffn_down_exps")):
                w.add_tensor(o + gg + ".weight", np.stack([
                    _np(st, p + f"mlp.experts.{j}.{hfk}.weight")
                    for j in range(X)]))
            for hfk, gg in (("gate_proj", "ffn_gate_shexp"),
                            ("up_proj", "ffn_up_shexp"),
                            ("down_proj", "ffn_down_shexp")):
                w.add_tensor(o + gg + ".weight",
                             _np(st, p + f"mlp.shared_experts.{hfk}.weight"))
    w.write()
    _compare(hm, path, atol=5e-4, decode_check=True)


def test_deepseek3_noaux_tc_routing_matches_transformers(tmp_path):
    """deepseek-v3/r1 routing on the deepseek2 arch: sigmoid scores,
    exp_probs_b selection bias, group-limited top-k (top-2-sum group
    scores), weights from UNCORRECTED scores, renormalized and scaled by
    routed_scaling_factor."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM
    vocab, _, _ = build_vocab()
    V = len(vocab)
    torch.manual_seed(0)
    QLORA, KVLORA, ROPE, NOPE, VD, FFD = 32, 32, 8, 16, 24, 96
    X, K = 8, 2
    hc = DeepseekV3Config(
        vocab_size=V, hidden_size=E, num_hidden_layers=L,
        num_attention_heads=H, num_key_value_heads=H,
        q_lora_rank=QLORA, kv_lora_rank=KVLORA,
        qk_rope_head_dim=ROPE, qk_nope_head_dim=NOPE, v_head_dim=VD,
        intermediate_size=FFD, moe_intermediate_size=FFD // 2,
        n_routed_experts=X, num_experts_per_tok=K, n_shared_experts=1,
        first_k_dense_replace=1, moe_layer_freq=1, n_group=4, topk_group=2,
        norm_topk_prob=True, routed_scaling_factor=2.5,
        rms_norm_eps=1e-5, use_cache=False, rope_theta=10000.0,
        rope_scaling=None, tie_word_embeddings=False, attention_bias=False)
    hm = DeepseekV3ForCausalLM(hc).eval()
    st = hm.state_dict()
    # random correction bias (init is zeros, which would not exercise the
    # biased-selection path)
    with torch.no_grad():
        for i in range(1, L):
            st[f"model.layers.{i}.mlp.gate.e_score_correction_bias"] \
                .normal_(0.0, 0.5)

    idx = np.concatenate([np.arange(0, ROPE, 2), np.arange(1, ROPE, 2)])
    path = str(tmp_path / "ds3.gguf")
    w, _ = _gguf_header(path, "deepseek2", H, ROPE, ff=FFD,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attention.q_lora_rank", QLORA),
                               ("attention.kv_lora_rank", KVLORA),
                               ("attention.key_length", NOPE + ROPE),
                               ("attention.value_length", VD),
                               ("expert_count", X),
                               ("expert_used_count", K),
                               ("expert_weights_scale", 2.5),
                               ("expert_weights_norm", True),
                               ("expert_gating_func", 2),
                               ("expert_group_count", 4),
                               ("expert_group_used_count", 2),
                               ("expert_shared_count", 1)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        qb = _np(st, p + "self_attn.q_b_proj.weight") \
            .reshape(H, NOPE + ROPE, QLORA).copy()
        qb[:, NOPE:] = qb[:, NOPE:][:, idx]
        kva = _np(st, p + "self_attn.kv_a_proj_with_mqa.weight").copy()
        kva[KVLORA:] = kva[KVLORA:][idx]
        w.add_tensor(o + "attn_q_a.weight",
                     _np(st, p + "self_attn.q_a_proj.weight"))
        w.add_tensor(o + "attn_q_a_norm.weight",
                     _np(st, p + "self_attn.q_a_layernorm.weight"))
        w.add_tensor(o + "attn_q_b.weight",
                     qb.reshape(H * (NOPE + ROPE), QLORA))
        w.add_tensor(o + "attn_kv_a_mqa.weight", kva)
        w.add_tensor(o + "attn_kv_a_norm.weight",
                     _np(st, p + "self_attn.kv_a_layernorm.weight"))
        w.add_tensor(o + "attn_kv_b.weight",
                     _np(st, p + "self_attn.kv_b_proj.weight"))
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "self_attn.o_proj.weight"))
        if i == 0:
            w.add_tensor(o + "ffn_gate.weight",
                         _np(st, p + "mlp.gate_proj.weight"))
            w.add_tensor(o + "ffn_up.weight",
                         _np(st, p + "mlp.up_proj.weight"))
            w.add_tensor(o + "ffn_down.weight",
                         _np(st, p + "mlp.down_proj.weight"))
        else:
            w.add_tensor(o + "ffn_gate_inp.weight",
                         _np(st, p + "mlp.gate.weight"))
            w.add_tensor(o + "exp_probs_b.bias",
                         _np(st, p + "mlp.gate.e_score_correction_bias"))
            for hfk, gg in (("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps"),
                            ("down_proj", "ffn_down_exps")):
                w.add_tensor(o + gg + ".weight", np.stack([
                    _np(st, p + f"mlp.experts.{j}.{hfk}.weight")
                    for j in range(X)]))
            for hfk, gg in (("gate_proj", "ffn_gate_shexp"),
                            ("up_proj", "ffn_up_shexp"),
                            ("down_proj", "ffn_down_shexp")):
                w.add_tensor(o + gg + ".weight",
                             _np(st, p + f"mlp.shared_experts.{hfk}.weight"))
    w.write()
    _compare(hm, path, atol=1e-3, decode_check=True)


def _permute_llama_qk(w, n_head):
    """llama.cpp's LlamaModel.permute for 'norm'-mode rope conversion."""
    return (w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def test_mixtral_matches_transformers(tmp_path):
    """mixtral MoE: softmax -> top-k -> renormalize routing; llama-family
    q/k permutation at export."""
    from transformers import MixtralConfig, MixtralForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 4, 2
    hc = MixtralConfig(vocab_size=len(vocab), hidden_size=E,
                       num_hidden_layers=L, num_attention_heads=H,
                       num_key_value_heads=HKV, intermediate_size=FF,
                       num_local_experts=X, num_experts_per_tok=K,
                       rms_norm_eps=1e-5, tie_word_embeddings=False,
                       use_cache=False, rope_theta=10000.0,
                       router_jitter_noise=0.0)
    hm = MixtralForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "mixtral.gguf")
    w, V = _gguf_header(path, "mixtral", HKV, D,
                        extra=[("expert_count", X),
                               ("expert_used_count", K),
                               ("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "attn_q.weight",
                     _permute_llama_qk(_np(st, p + "self_attn.q_proj.weight"), H))
        w.add_tensor(o + "attn_k.weight",
                     _permute_llama_qk(_np(st, p + "self_attn.k_proj.weight"), HKV))
        w.add_tensor(o + "attn_v.weight", _np(st, p + "self_attn.v_proj.weight"))
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "self_attn.o_proj.weight"))
        w.add_tensor(o + "ffn_gate_inp.weight",
                     _np(st, p + "block_sparse_moe.gate.weight"))
        for hfk, gg in (("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                        ("w2", "ffn_down_exps")):
            stacked = np.stack([
                _np(st, p + f"block_sparse_moe.experts.{j}.{hfk}.weight")
                for j in range(X)])
            w.add_tensor(o + gg + ".weight", stacked)
    w.write()
    _compare(hm, path, decode_check=True)


def test_gpt_oss_matches_transformers(tmp_path):
    """gpt-oss: per-head attention sinks (softmax denominator logit),
    clamped swiglu-oai MoE (alpha=1.702, limit=7.0) with router/expert
    biases, alternating SWA starting sliding at layer 0, neox rotary.
    Export follows llama.cpp's GptOssModel conversion: interleaved
    gate_up_proj de-interleaved (gate=even, up=odd columns) and expert
    stacks transposed to ggml [X, F, E]/[X, E, F] layouts."""
    from transformers import GptOssConfig, GptOssForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 4, 2
    hc = GptOssConfig(vocab_size=len(vocab), hidden_size=E,
                      num_hidden_layers=L, num_attention_heads=H,
                      num_key_value_heads=HKV, head_dim=D,
                      intermediate_size=FF, num_local_experts=X,
                      num_experts_per_tok=K, sliding_window=8,
                      rope_theta=10000.0, rope_scaling=None,
                      rms_norm_eps=1e-5, use_cache=False,
                      tie_word_embeddings=False)
    hm = GptOssForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "gptoss.gguf")
    w, V = _gguf_header(path, "gpt-oss", HKV, D,
                        extra=[("expert_count", X),
                               ("expert_used_count", K),
                               ("attention.key_length", D),
                               ("attention.value_length", D),
                               ("attention.sliding_window", 8),
                               ("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, bias=True)
        w.add_tensor(o + "attn_sinks.weight",
                     _np(st, p + "self_attn.sinks"))
        w.add_tensor(o + "ffn_gate_inp.weight",
                     _np(st, p + "mlp.router.weight"))
        w.add_tensor(o + "ffn_gate_inp.bias",
                     _np(st, p + "mlp.router.bias"))
        gu = _np(st, p + "mlp.experts.gate_up_proj")     # [X, E, 2F]
        gub = _np(st, p + "mlp.experts.gate_up_proj_bias")  # [X, 2F]
        w.add_tensor(o + "ffn_gate_exps.weight",
                     gu[:, :, 0::2].transpose(0, 2, 1))  # -> [X, F, E]
        w.add_tensor(o + "ffn_up_exps.weight",
                     gu[:, :, 1::2].transpose(0, 2, 1))
        w.add_tensor(o + "ffn_gate_exps.bias", gub[:, 0::2])
        w.add_tensor(o + "ffn_up_exps.bias", gub[:, 1::2])
        w.add_tensor(o + "ffn_down_exps.weight",
                     _np(st, p + "mlp.experts.down_proj")
                     .transpose(0, 2, 1))                # -> [X, E, F]
        w.add_tensor(o + "ffn_down_exps.bias",
                     _np(st, p + "mlp.experts.down_proj_bias"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_openelm_matches_numpy_reference(tmp_path):
    """openelm: PER-LAYER head counts and FFN widths (metadata arrays),
    fused qkv, shared [D] q/k RMS norms, neox rope over the full head
    dim, SwiGLU FFN, tied embeddings. The loader zero-pads every layer
    to the max geometry (grouped-by-kv-head q layout) so the stacked
    engine paths work; the golden is an independent numpy implementation
    computing each layer at its TRUE geometry — padding must be exact.
    No transformers module exists for openelm."""
    vocab, _, _ = build_vocab()
    rng = np.random.default_rng(12)
    V = len(vocab)
    Dh = 16
    hc = [4, 4, 8]
    hk = [1, 2, 2]
    ffs = [96, 128, 64]
    NL = 3

    def r(*shape, scale=0.05):
        return rng.normal(size=shape, scale=scale).astype(np.float32)

    embd = r(V, E)
    out_norm = 1 + r(E, scale=0.1)
    layers = []
    for i in range(NL):
        nq, nk, ff = hc[i], hk[i], ffs[i]
        layers.append({
            "attn_norm": 1 + r(E, scale=0.1),
            "wqkv": r((nq + 2 * nk) * Dh, E),
            "wo": r(E, nq * Dh),
            "q_norm": 1 + r(Dh, scale=0.1),
            "k_norm": 1 + r(Dh, scale=0.1),
            "ffn_norm": 1 + r(E, scale=0.1),
            "w_gate": r(ff, E), "w_up": r(ff, E), "w_down": r(E, ff),
        })

    def rms(x, w, eps=1e-5):
        return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * w

    def rope_neox(x, pos):
        half = Dh // 2
        inv = 1.0 / (10000.0 ** (np.arange(half) / half))
        ang = np.outer(pos, inv)
        c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
        x0, x1 = x[..., :half], x[..., half:]
        return np.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], -1)

    def silu(x):
        return x / (1 + np.exp(-x))

    def ref(toks):
        T = len(toks)
        pos = np.arange(T)
        x = embd[toks]
        for i, lw in enumerate(layers):
            nq, nk = hc[i], hk[i]
            h = rms(x, lw["attn_norm"])
            qkv = h @ lw["wqkv"].T
            q = qkv[:, :nq * Dh].reshape(T, nq, Dh)
            k = qkv[:, nq * Dh:(nq + nk) * Dh].reshape(T, nk, Dh)
            v = qkv[:, (nq + nk) * Dh:].reshape(T, nk, Dh)
            q = rope_neox(rms(q, lw["q_norm"]), pos)
            k = rope_neox(rms(k, lw["k_norm"]), pos)
            g = nq // nk
            kx = np.repeat(k, g, axis=1)
            vx = np.repeat(v, g, axis=1)
            sc = np.einsum("qhd,khd->hqk", q, kx) / np.sqrt(Dh)
            sc = np.where(np.tril(np.ones((T, T), bool))[None], sc, -1e30)
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ao = np.einsum("hqk,khd->qhd", p, vx).reshape(T, nq * Dh)
            x = x + ao @ lw["wo"].T
            h = rms(x, lw["ffn_norm"])
            x = x + (silu(h @ lw["w_gate"].T) * (h @ lw["w_up"].T)) \
                @ lw["w_down"].T
        return rms(x, out_norm) @ embd.T   # tied embeddings

    path = str(tmp_path / "openelm.gguf")
    w, _ = _gguf_header(path, "openelm", hk, Dh,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attention.key_length", Dh),
                               ("feed_forward_length", ffs)],
                        n_layers=NL)
    # per-layer head-count arrays override the scalar header keys
    w.add_kv("openelm.attention.head_count", hc)
    w.add_kv("openelm.attention.head_count_kv", hk)
    w.add_tensor("token_embd.weight", embd)
    w.add_tensor("output_norm.weight", out_norm)
    for i, lw in enumerate(layers):
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", lw["attn_norm"])
        w.add_tensor(o + "attn_qkv.weight", lw["wqkv"])
        w.add_tensor(o + "attn_output.weight", lw["wo"])
        w.add_tensor(o + "attn_q_norm.weight", lw["q_norm"])
        w.add_tensor(o + "attn_k_norm.weight", lw["k_norm"])
        w.add_tensor(o + "ffn_norm.weight", lw["ffn_norm"])
        w.add_tensor(o + "ffn_gate.weight", lw["w_gate"])
        w.add_tensor(o + "ffn_up.weight", lw["w_up"])
        w.add_tensor(o + "ffn_down.weight", lw["w_down"])
    w.write()

    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.n_heads == 8 and cfg.n_kv_heads == 2 and cfg.n_ff == 128
    rng2 = np.random.default_rng(3)
    T = 11
    toks = rng2.integers(3, V, (T,)).astype(np.int32)
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    logits, _ = prefill_impl(params, cfg, jnp.asarray(toks), kv,
                             jnp.int32(0), jnp.int32(0), jnp.int32(T),
                             cos, sin)
    ref_logits = ref(toks)
    np.testing.assert_allclose(np.asarray(logits), ref_logits[-1],
                               atol=3e-3, rtol=5e-3)

    # engine greedy decode consistency with prefill argmax (padded-head
    # decode path)
    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.tokenizer import Tokenizer
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    prompt = toks[:5].tolist()
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=2, n_ctx=128,
                                                decode_chain=4))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            prompt, greedy(), tokenizer=tok, max_tokens=5, stream=False))
    finally:
        eng.stop()
    seq = list(prompt)
    for got in final.generated:
        want = int(np.argmax(ref(np.asarray(seq, np.int32))[-1]))
        assert got == want, (final.generated, seq)
        seq.append(got)


def test_grok_matches_numpy_reference(tmp_path):
    """grok-1: sqrt(E) embedding scale, tanh softcaps on attention scores
    (30), router logits (30) and final logits (30 after the 1/sqrt(3)
    scale), sandwich norms stored as attn_output_norm/layer_output_norm,
    gelu GeGLU MoE with top-2 renormalized routing, neox rope. No
    transformers module exists for grok, so the golden is an independent
    numpy implementation of the published architecture
    (llama.cpp llm_build_grok)."""
    vocab, _, _ = build_vocab()
    rng = np.random.default_rng(9)
    HKV, X, K = 2, 4, 2
    V = len(vocab)

    def r(*shape, scale=0.05):
        return rng.normal(size=shape, scale=scale).astype(np.float32)

    wts = {
        "embd": r(V, E), "out_norm": 1 + r(E, scale=0.1), "out": r(V, E),
        "layers": [
            {"attn_norm": 1 + r(E, scale=0.1),
             "wq": r(H * D, E), "wk": r(HKV * D, E), "wv": r(HKV * D, E),
             "wo": r(E, H * D),
             "attn_post": 1 + r(E, scale=0.1),
             "ffn_norm": 1 + r(E, scale=0.1),
             "ffn_post": 1 + r(E, scale=0.1),
             "router": r(X, E),
             "gate": r(X, FF, E), "up": r(X, FF, E), "down": r(X, E, FF)}
            for _ in range(L)],
    }

    def rms(x, w):
        return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w

    def rope_neox(x, pos):
        # x [T, h, D]: neox half-split rotation
        half = D // 2
        inv = 1.0 / (10000.0 ** (np.arange(half) / half))
        ang = np.outer(pos, inv)
        c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
        x0, x1 = x[..., :half], x[..., half:]
        return np.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], -1)

    def gelu(x):
        return 0.5 * x * (1 + np.tanh(
            np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))

    def ref(toks):
        T = len(toks)
        pos = np.arange(T)
        x = wts["embd"][toks] * np.sqrt(E)
        G = H // HKV
        for lw in wts["layers"]:
            h = rms(x, lw["attn_norm"])
            q = (h @ lw["wq"].T).reshape(T, H, D)
            k = (h @ lw["wk"].T).reshape(T, HKV, D)
            v = (h @ lw["wv"].T).reshape(T, HKV, D)
            q, k = rope_neox(q, pos), rope_neox(k, pos)
            kx = np.repeat(k, G, axis=1)
            vx = np.repeat(v, G, axis=1)
            sc = np.einsum("qhd,khd->hqk", q, kx) / np.sqrt(D)
            sc = 30.0 * np.tanh(sc / 30.0)
            mask = np.tril(np.ones((T, T), bool))
            sc = np.where(mask[None], sc, -1e30)
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            attn = np.einsum("hqk,khd->qhd", p, vx).reshape(T, H * D)
            attn = rms(attn @ lw["wo"].T, lw["attn_post"])
            x = x + attn
            h = rms(x, lw["ffn_norm"])
            rl = h @ lw["router"].T
            rl = 30.0 * np.tanh(rl / 30.0)
            pr = np.exp(rl - rl.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            topi = np.argsort(-pr, axis=-1)[:, :K]
            y = np.zeros_like(h)
            for t in range(T):
                wsum = pr[t, topi[t]].sum()
                for j in topi[t]:
                    g = gelu(h[t] @ lw["gate"][j].T)
                    u = h[t] @ lw["up"][j].T
                    y[t] += (pr[t, j] / wsum) * ((g * u) @ lw["down"][j].T)
            x = x + rms(y, lw["ffn_post"])
        x = rms(x, wts["out_norm"])
        logits = (x @ wts["out"].T) * 0.5773502691896257
        return 30.0 * np.tanh(logits / 30.0)

    path = str(tmp_path / "grok.gguf")
    w, _ = _gguf_header(path, "grok", HKV, D,
                        extra=[("expert_count", X),
                               ("expert_used_count", K),
                               ("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", wts["embd"])
    w.add_tensor("output_norm.weight", wts["out_norm"])
    w.add_tensor("output.weight", wts["out"])
    for i, lw in enumerate(wts["layers"]):
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", lw["attn_norm"])
        w.add_tensor(o + "attn_q.weight", lw["wq"])
        w.add_tensor(o + "attn_k.weight", lw["wk"])
        w.add_tensor(o + "attn_v.weight", lw["wv"])
        w.add_tensor(o + "attn_output.weight", lw["wo"])
        w.add_tensor(o + "attn_output_norm.weight", lw["attn_post"])
        w.add_tensor(o + "ffn_norm.weight", lw["ffn_norm"])
        w.add_tensor(o + "layer_output_norm.weight", lw["ffn_post"])
        w.add_tensor(o + "ffn_gate_inp.weight", lw["router"])
        w.add_tensor(o + "ffn_gate_exps.weight", lw["gate"])
        w.add_tensor(o + "ffn_up_exps.weight", lw["up"])
        w.add_tensor(o + "ffn_down_exps.weight", lw["down"])
    w.write()

    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.attn_softcap == 30.0 and cfg.router_softcap == 30.0
    assert cfg.logit_softcap == 30.0
    rng2 = np.random.default_rng(3)
    T = 10
    toks = rng2.integers(3, V, (T,)).astype(np.int32)
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    logits, _ = prefill_impl(params, cfg, jnp.asarray(toks), kv,
                             jnp.int32(0), jnp.int32(0), jnp.int32(T),
                             cos, sin)
    ref_logits = ref(toks)
    np.testing.assert_allclose(np.asarray(logits), ref_logits[-1],
                               atol=3e-3, rtol=5e-3)


def test_dbrx_matches_transformers(tmp_path):
    """dbrx: fused Wqkv with clip_qkv clamp, LayerNorm WITHOUT biases,
    neox rotary (no q/k permute at conversion), pre-MoE norm stored as
    attn_output_norm (HF norm_attn_norm.norm_2), 16-expert top-k routing
    with p1-renormalized weights. Export follows llama.cpp's DbrxModel
    conversion: flat [X*FF, E] expert mats viewed to [X, FF, E]; w2
    (down) additionally transposed to [X, E, FF]."""
    from transformers import DbrxConfig, DbrxForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 4, 2
    hc = DbrxConfig(d_model=E, n_heads=H, n_layers=L, max_seq_len=256,
                    vocab_size=len(vocab),
                    attn_config={"clip_qkv": 6.0, "kv_n_heads": HKV,
                                 "rope_theta": 10000.0},
                    ffn_config={"ffn_hidden_size": FF,
                                "moe_num_experts": X, "moe_top_k": K,
                                "moe_jitter_eps": None,
                                "moe_normalize_expert_weights": 1.0},
                    use_cache=False)
    hm = DbrxForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "dbrx.gguf")
    w, V = _gguf_header(path, "dbrx", HKV, D,
                        extra=[("expert_count", X),
                               ("expert_used_count", K),
                               ("attention.clamp_kqv", 6.0)])
    w.add_tensor("token_embd.weight", _np(st, "transformer.wte.weight"))
    w.add_tensor("output_norm.weight", _np(st, "transformer.norm_f.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"transformer.blocks.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "norm_attn_norm.norm_1.weight"))
        w.add_tensor(o + "attn_qkv.weight",
                     _np(st, p + "norm_attn_norm.attn.Wqkv.weight"))
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "norm_attn_norm.attn.out_proj.weight"))
        w.add_tensor(o + "attn_output_norm.weight",
                     _np(st, p + "norm_attn_norm.norm_2.weight"))
        w.add_tensor(o + "ffn_gate_inp.weight",
                     _np(st, p + "ffn.router.layer.weight"))
        w1 = _np(st, p + "ffn.experts.mlp.w1").reshape(X, FF, E)
        v1 = _np(st, p + "ffn.experts.mlp.v1").reshape(X, FF, E)
        w2 = _np(st, p + "ffn.experts.mlp.w2").reshape(X, FF, E)
        w.add_tensor(o + "ffn_gate_exps.weight", w1)
        w.add_tensor(o + "ffn_up_exps.weight", v1)
        w.add_tensor(o + "ffn_down_exps.weight", w2.transpose(0, 2, 1))
    w.write()
    _compare(hm, path, decode_check=True)


def test_qwen3moe_matches_transformers(tmp_path):
    """qwen3moe: per-head q/k RMS norms + ALWAYS-renormalized top-k
    routing (the reference hardcodes norm_w=true for this arch)."""
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 4, 2
    hc = Qwen3MoeConfig(vocab_size=len(vocab), hidden_size=E,
                        num_hidden_layers=L, num_attention_heads=H,
                        num_key_value_heads=HKV, head_dim=D,
                        intermediate_size=FF, moe_intermediate_size=FF,
                        num_experts=X, num_experts_per_tok=K,
                        norm_topk_prob=True, decoder_sparse_step=1,
                        mlp_only_layers=[], rms_norm_eps=1e-5,
                        tie_word_embeddings=False, use_cache=False,
                        rope_theta=10000.0)
    hm = Qwen3MoeForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "qwen3moe.gguf")
    w, V = _gguf_header(path, "qwen3moe", HKV, D,
                        extra=[("expert_count", X),
                               ("expert_used_count", K),
                               ("attention.key_length", D),
                               ("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        for hfk, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                        ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            w.add_tensor(o + gg + ".weight",
                         _np(st, p + f"self_attn.{hfk}.weight"))
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight"))
        w.add_tensor(o + "ffn_gate_inp.weight",
                     _np(st, p + "mlp.gate.weight"))
        for hfk, gg in (("gate_proj", "ffn_gate_exps"),
                        ("up_proj", "ffn_up_exps"),
                        ("down_proj", "ffn_down_exps")):
            stacked = np.stack([
                _np(st, p + f"mlp.experts.{j}.{hfk}.weight")
                for j in range(X)])
            w.add_tensor(o + gg + ".weight", stacked)
    w.write()
    _compare(hm, path, decode_check=True)


def test_ernie4_5_matches_transformers(tmp_path):
    """ernie4.5 (dense): plain llama skeleton under the ernie4_5 arch
    name (neox rotary, no biases, tied embeddings common)."""
    from transformers import Ernie4_5Config, Ernie4_5ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = Ernie4_5Config(vocab_size=len(vocab), hidden_size=E,
                        num_hidden_layers=L, num_attention_heads=H,
                        num_key_value_heads=HKV, head_dim=D,
                        intermediate_size=FF, use_bias=False,
                        rms_norm_eps=1e-5, use_cache=False,
                        rope_theta=10000.0, tie_word_embeddings=True)
    hm = Ernie4_5ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "ernie.gguf")
    w, V = _gguf_header(path, "ernie4_5", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_seed_oss_matches_transformers(tmp_path):
    """seed-oss: llama skeleton + q/k/v biases, explicit head_dim."""
    from transformers import SeedOssConfig, SeedOssForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = SeedOssConfig(vocab_size=len(vocab), hidden_size=E,
                       num_hidden_layers=L, num_attention_heads=H,
                       num_key_value_heads=HKV, head_dim=D,
                       intermediate_size=FF, attention_bias=True,
                       rms_norm_eps=1e-5, use_cache=False,
                       rope_theta=10000.0, tie_word_embeddings=False)
    hm = SeedOssForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "seedoss.gguf")
    w, V = _gguf_header(path, "seed_oss", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attention.key_length", D),
                               ("attention.value_length", D)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, bias=True)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_exaone4_matches_transformers(tmp_path):
    """exaone4: post-norm-only blocks (olmo2 style), per-head QK norms,
    3-sliding:1-full pattern with NoPE on the full layers."""
    from transformers import Exaone4Config, Exaone4ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, NL = 2, 4
    hc = Exaone4Config(vocab_size=len(vocab), hidden_size=E,
                       num_hidden_layers=NL, num_attention_heads=H,
                       num_key_value_heads=HKV, head_dim=D,
                       intermediate_size=FF, sliding_window=8,
                       sliding_window_pattern=4, rms_norm_eps=1e-5,
                       use_cache=False, rope_theta=10000.0,
                       tie_word_embeddings=False)
    hm = Exaone4ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "exaone4.gguf")
    w, V = _gguf_header(path, "exaone4", HKV, D, n_layers=NL,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attention.key_length", D),
                               ("attention.value_length", D),
                               ("attention.sliding_window", 8),
                               ("attention.sliding_window_pattern", 4)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(NL):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "post_attention_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "post_ffw_norm.weight",
                     _np(st, p + "post_feedforward_layernorm.weight"))
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_dots1_matches_transformers(tmp_path):
    """dots1: qwen3-style per-head QK norms + deepseek-v3 MoE (sigmoid
    scores, exp_probs_b selection bias, group-limited top-k, shared
    expert, routed scaling)."""
    from transformers import Dots1Config, Dots1ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K, FFD = 2, 8, 2, 96
    hc = Dots1Config(vocab_size=len(vocab), hidden_size=E,
                     num_hidden_layers=L, num_attention_heads=H,
                     num_key_value_heads=HKV, head_dim=D,
                     intermediate_size=FFD, moe_intermediate_size=FFD // 2,
                     n_routed_experts=X, num_experts_per_tok=K,
                     n_shared_experts=1, first_k_dense_replace=1,
                     n_group=4, topk_group=2, norm_topk_prob=True,
                     routed_scaling_factor=2.5, rms_norm_eps=1e-5,
                     use_cache=False, rope_theta=10000.0,
                     tie_word_embeddings=False)
    hm = Dots1ForCausalLM(hc).eval()
    st = hm.state_dict()
    with torch.no_grad():
        st["model.layers.1.mlp.gate.e_score_correction_bias"] \
            .normal_(0.0, 0.5)

    path = str(tmp_path / "dots1.gguf")
    w, V = _gguf_header(path, "dots1", HKV, D, ff=FFD,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attention.key_length", D),
                               ("attention.value_length", D),
                               ("expert_count", X),
                               ("expert_used_count", K),
                               ("expert_weights_scale", 2.5),
                               ("expert_weights_norm", True),
                               ("expert_gating_func", 2),
                               ("expert_group_count", 4),
                               ("expert_group_used_count", 2),
                               ("expert_shared_count", 1)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight"))
        _qkvo(w, st, p, o)
        if i == 0:
            w.add_tensor(o + "ffn_gate.weight",
                         _np(st, p + "mlp.gate_proj.weight"))
            w.add_tensor(o + "ffn_up.weight",
                         _np(st, p + "mlp.up_proj.weight"))
            w.add_tensor(o + "ffn_down.weight",
                         _np(st, p + "mlp.down_proj.weight"))
        else:
            w.add_tensor(o + "ffn_gate_inp.weight",
                         _np(st, p + "mlp.gate.weight"))
            w.add_tensor(o + "exp_probs_b.bias",
                         _np(st, p + "mlp.gate.e_score_correction_bias"))
            for hfk, gg in (("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps"),
                            ("down_proj", "ffn_down_exps")):
                w.add_tensor(o + gg + ".weight", np.stack([
                    _np(st, p + f"mlp.experts.{j}.{hfk}.weight")
                    for j in range(X)]))
            for hfk, gg in (("gate_proj", "ffn_gate_shexp"),
                            ("up_proj", "ffn_up_shexp"),
                            ("down_proj", "ffn_down_shexp")):
                w.add_tensor(o + gg + ".weight",
                             _np(st, p + f"mlp.shared_experts.{hfk}.weight"))
    w.write()
    _compare(hm, path, atol=1e-3, decode_check=True)


def test_bitnet_matches_transformers(tmp_path):
    """bitnet b1.58: sub-norms before the attention/FFN output
    projections + squared-ReLU GATED FFN (the ternary quantization is a
    storage format, orthogonal to the graph — tested in test_quants)."""
    import transformers
    from transformers import BitNetConfig
    mb = transformers.models.bitnet.modeling_bitnet
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = BitNetConfig(vocab_size=len(vocab), hidden_size=E,
                      num_hidden_layers=L, num_attention_heads=H,
                      num_key_value_heads=HKV, intermediate_size=FF,
                      rms_norm_eps=1e-5, use_cache=False,
                      rope_theta=10000.0, tie_word_embeddings=False)
    hm = mb.BitNetForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "bitnet.gguf")
    w, V = _gguf_header(path, "bitnet", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, permute_heads=H, hkv=HKV)
        w.add_tensor(o + "attn_sub_norm.weight",
                     _np(st, p + "self_attn.attn_sub_norm.weight"))
        w.add_tensor(o + "ffn_sub_norm.weight",
                     _np(st, p + "mlp.ffn_sub_norm.weight"))
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_gemma3n_text_matches_transformers(tmp_path):
    """gemma3n: AltUp streams (predict/correct), Laurel residuals,
    per-layer token embeddings with gated injection, KV-shared tail
    layers (per attention type), activation sparsity on early layers,
    unscaled attention, 4-sliding:1-full pattern with dual rope bases."""
    from transformers import Gemma3nTextConfig
    from transformers.models.gemma3n.modeling_gemma3n import (
        Gemma3nForCausalLM,
    )
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, NL, P, NALT, RANK = 2, 10, 8, 2, 4
    spars = [0.95, 0.95] + [0.0] * (NL - 2)
    lt = ["full_attention" if (i + 1) % 5 == 0 else "sliding_attention"
          for i in range(NL)]
    hc = Gemma3nTextConfig(
        vocab_size=len(vocab), vocab_size_per_layer_input=len(vocab),
        hidden_size=E, hidden_size_per_layer_input=P,
        num_hidden_layers=NL, num_attention_heads=H,
        num_key_value_heads=HKV, head_dim=D, intermediate_size=FF,
        altup_num_inputs=NALT, altup_active_idx=0, altup_coef_clip=None,
        altup_correct_scale=True, laurel_rank=RANK,
        num_kv_shared_layers=4, activation_sparsity_pattern=spars,
        layer_types=lt, sliding_window=8, rope_theta=10000.0,
        rope_local_base_freq=10000.0, rms_norm_eps=1e-6,
        final_logit_softcapping=30.0, use_cache=True,
        tie_word_embeddings=False)
    # use_cache=True: HF only activates KV sharing when a cache exists
    # (uncached forwards compute per-layer k/v and silently skip sharing)
    hm = Gemma3nForCausalLM(hc).eval()
    st = hm.state_dict()
    # randomize correct_output_scale away from zeros init
    with torch.no_grad():
        for i in range(NL):
            st[f"model.layers.{i}.altup.correct_output_scale"] \
                .normal_(1.0, 0.2)

    path = str(tmp_path / "g3n.gguf")
    w, V = _gguf_header(path, "gemma3n", HKV, D, n_layers=NL,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-6),
                               ("attention.key_length", D),
                               ("attention.value_length", D),
                               ("attention.sliding_window", 8),
                               ("attention.sliding_window_pattern", 5),
                               ("attention.shared_kv_layers", 4),
                               ("activation_sparsity_scale",
                                np.array(spars, np.float32)),
                               ("final_logit_softcapping", 30.0)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    w.add_tensor("per_layer_token_embd.weight",
                 _np(st, "model.embed_tokens_per_layer.weight"))
    w.add_tensor("per_layer_model_proj.weight",
                 _np(st, "model.per_layer_model_projection.weight"))
    w.add_tensor("per_layer_proj_norm.weight",
                 _np(st, "model.per_layer_projection_norm.weight"))
    w.add_tensor("altup_proj.weight", np.stack(
        [_np(st, f"model.altup_projections.{i}.weight")
         for i in range(NALT - 1)]))
    w.add_tensor("altup_unembed_proj.weight", np.stack(
        [_np(st, f"model.altup_unembed_projections.{i}.weight")
         for i in range(NALT - 1)]))
    for i in range(NL):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "post_attention_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "pre_feedforward_layernorm.weight"))
        w.add_tensor(o + "post_ffw_norm.weight",
                     _np(st, p + "post_feedforward_layernorm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight"))
        w.add_tensor(o + "altup_correct_coef.weight",
                     _np(st, p + "altup.correction_coefs.weight"))
        w.add_tensor(o + "altup_predict_coef.weight",
                     _np(st, p + "altup.prediction_coefs.weight"))
        w.add_tensor(o + "altup_router.weight",
                     _np(st, p + "altup.modality_router.weight"))
        w.add_tensor(o + "altup_router_norm.weight",
                     _np(st, p + "altup.router_norm.weight"))
        w.add_tensor(o + "altup_correct_scale.weight",
                     _np(st, p + "altup.correct_output_scale"))
        w.add_tensor(o + "laurel_l.weight",
                     _np(st, p + "laurel.linear_left.weight"))
        w.add_tensor(o + "laurel_r.weight",
                     _np(st, p + "laurel.linear_right.weight"))
        w.add_tensor(o + "laurel_post_norm.weight",
                     _np(st, p + "laurel.post_laurel_norm.weight"))
        w.add_tensor(o + "inp_gate.weight",
                     _np(st, p + "per_layer_input_gate.weight"))
        w.add_tensor(o + "proj.weight",
                     _np(st, p + "per_layer_projection.weight"))
        w.add_tensor(o + "post_norm.weight",
                     _np(st, p + "post_per_layer_input_norm.weight"))
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, atol=5e-3, decode_check=True)


def test_chameleon_matches_transformers(tmp_path):
    """chameleon (text path): per-head BIASED LayerNorm on q/k with
    distinct per-head params, llama skeleton otherwise (swin_norm=False
    7B layout)."""
    import transformers
    from transformers import ChameleonConfig, ChameleonVQVAEConfig
    mc = transformers.models.chameleon.modeling_chameleon
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    vq = ChameleonVQVAEConfig(embed_dim=32, num_embeddings=8,
                              latent_channels=32, resolution=32,
                              base_channels=32, channel_multiplier=[1],
                              num_res_blocks=1, attn_resolutions=[])
    hc = ChameleonConfig(vocab_size=len(vocab), hidden_size=E,
                         num_hidden_layers=L, num_attention_heads=H,
                         num_key_value_heads=HKV, intermediate_size=FF,
                         rms_norm_eps=1e-5, use_cache=False,
                         rope_theta=10000.0, tie_word_embeddings=False,
                         swin_norm=False, vq_config=vq.to_dict(),
                         vocabulary_map={"<image>": 1})
    hm = mc.ChameleonForConditionalGeneration(hc).eval()
    st = hm.state_dict()
    # randomize the norm params away from their ones/zeros init
    with torch.no_grad():
        for i in range(L):
            for n in ("q_norm", "k_norm"):
                st[f"model.layers.{i}.self_attn.{n}.weight"].normal_(1.0, 0.2)
                st[f"model.layers.{i}.self_attn.{n}.bias"].normal_(0.0, 0.1)

    path = str(tmp_path / "chameleon.gguf")
    w, V = _gguf_header(path, "chameleon", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight").reshape(-1))
        w.add_tensor(o + "attn_q_norm.bias",
                     _np(st, p + "self_attn.q_norm.bias").reshape(-1))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight").reshape(-1))
        w.add_tensor(o + "attn_k_norm.bias",
                     _np(st, p + "self_attn.k_norm.bias").reshape(-1))
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_olmo_matches_transformers(tmp_path):
    """olmo v1: NON-PARAMETRIC LayerNorm (the GGUF ships no norm tensors;
    the loader synthesizes unit weights) + clip_qkv clamping."""
    from transformers import OlmoConfig, OlmoForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = OlmoConfig(vocab_size=len(vocab), hidden_size=E,
                    num_hidden_layers=L, num_attention_heads=H,
                    num_key_value_heads=HKV, intermediate_size=FF,
                    clip_qkv=0.03, use_cache=False, rope_theta=10000.0,
                    tie_word_embeddings=False)
    hm = OlmoForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "olmo.gguf")
    w, V = _gguf_header(path, "olmo", HKV, D,
                        extra=[("attention.layer_norm_epsilon", 1e-5),
                               ("attention.clamp_kqv", 0.03)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_gptj_matches_transformers(tmp_path):
    """gpt-j: single-shared-norm parallel residual, interleaved partial
    rotary (rotary_dim), biased fc/out layers, gelu_new FFN."""
    from transformers import GPTJConfig, GPTJForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    hc = GPTJConfig(vocab_size=len(vocab), n_embd=E, n_layer=L, n_head=H,
                    n_inner=FF, rotary_dim=D // 2,
                    activation_function="gelu_new", layer_norm_epsilon=1e-5,
                    use_cache=False, tie_word_embeddings=False)
    hm = GPTJForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "gptj.gguf")
    w, V = _gguf_header(path, "gptj", H, D // 2)
    w.add_tensor("token_embd.weight", _np(st, "transformer.wte.weight"))
    w.add_tensor("output_norm.weight", _np(st, "transformer.ln_f.weight"))
    w.add_tensor("output_norm.bias", _np(st, "transformer.ln_f.bias"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    w.add_tensor("output.bias", _np(st, "lm_head.bias"))
    for i in range(L):
        p = f"transformer.h.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", _np(st, p + "ln_1.weight"))
        w.add_tensor(o + "attn_norm.bias", _np(st, p + "ln_1.bias"))
        w.add_tensor(o + "attn_q.weight", _np(st, p + "attn.q_proj.weight"))
        w.add_tensor(o + "attn_k.weight", _np(st, p + "attn.k_proj.weight"))
        w.add_tensor(o + "attn_v.weight", _np(st, p + "attn.v_proj.weight"))
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "attn.out_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.fc_in.weight"))
        w.add_tensor(o + "ffn_up.bias", _np(st, p + "mlp.fc_in.bias"))
        w.add_tensor(o + "ffn_down.weight", _np(st, p + "mlp.fc_out.weight"))
        w.add_tensor(o + "ffn_down.bias", _np(st, p + "mlp.fc_out.bias"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_apertus_matches_transformers(tmp_path):
    """apertus: ungated xIELU FFN with per-layer learnable activation
    params (shipped as %arch%.xielu.* metadata arrays, raw pre-softplus
    values), per-head QK norms."""
    from transformers import ApertusConfig, ApertusForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = ApertusConfig(vocab_size=len(vocab), hidden_size=E,
                       num_hidden_layers=L, num_attention_heads=H,
                       num_key_value_heads=HKV, intermediate_size=FF,
                       rms_norm_eps=1e-5, use_cache=False,
                       rope_theta=10000.0, tie_word_embeddings=False)
    hm = ApertusForCausalLM(hc).eval()
    st = hm.state_dict()
    # randomize the learned activation params away from their init
    with torch.no_grad():
        for i in range(L):
            st[f"model.layers.{i}.mlp.act_fn.alpha_p"].normal_(0.5, 0.2)
            st[f"model.layers.{i}.mlp.act_fn.alpha_n"].normal_(0.5, 0.2)

    def sc(key):
        return [float(st[f"model.layers.{i}.mlp.act_fn.{key}"]
                      .reshape(-1)[0]) for i in range(L)]

    path = str(tmp_path / "apertus.gguf")
    w, V = _gguf_header(path, "apertus", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("xielu.alpha_p",
                                np.array(sc("alpha_p"), np.float32)),
                               ("xielu.alpha_n",
                                np.array(sc("alpha_n"), np.float32)),
                               ("xielu.beta",
                                np.array(sc("beta"), np.float32)),
                               ("xielu.eps",
                                np.array(sc("eps"), np.float32))])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "feedforward_layernorm.weight"))
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_falcon_matches_transformers(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = FalconConfig(vocab_size=len(vocab), hidden_size=E,
                      num_hidden_layers=L, num_attention_heads=H,
                      num_kv_heads=HKV, new_decoder_architecture=True,
                      parallel_attn=True, bias=False,
                      layer_norm_epsilon=1e-5, tie_word_embeddings=False,
                      use_cache=False, alibi=False,
                      activation="gelu_pytorch_tanh")
    hm = FalconForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "falcon.gguf")
    w, V = _gguf_header(path, "falcon", HKV, D)
    w.add_tensor("token_embd.weight",
                 _np(st, "transformer.word_embeddings.weight"))
    w.add_tensor("output_norm.weight", _np(st, "transformer.ln_f.weight"))
    w.add_tensor("output_norm.bias", _np(st, "transformer.ln_f.bias"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    g = H // HKV
    for i in range(L):
        p = f"transformer.h.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", _np(st, p + "ln_attn.weight"))
        w.add_tensor(o + "attn_norm.bias", _np(st, p + "ln_attn.bias"))
        w.add_tensor(o + "attn_norm_2.weight", _np(st, p + "ln_mlp.weight"))
        w.add_tensor(o + "attn_norm_2.bias", _np(st, p + "ln_mlp.bias"))
        # HF new-arch falcon qkv: per kv group [q x g, k, v]; GGUF wants
        # sequential q | k | v
        qkv = _np(st, p + "self_attention.query_key_value.weight")
        qkv = qkv.reshape(HKV, g + 2, D, E)
        q = qkv[:, :g].reshape(H * D, E)
        k = qkv[:, g].reshape(HKV * D, E)
        v = qkv[:, g + 1].reshape(HKV * D, E)
        w.add_tensor(o + "attn_qkv.weight",
                     np.concatenate([q, k, v], axis=0))
        w.add_tensor(o + "attn_output.weight",
                     _np(st, p + "self_attention.dense.weight"))
        w.add_tensor(o + "ffn_up.weight",
                     _np(st, p + "mlp.dense_h_to_4h.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.dense_4h_to_h.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


@pytest.mark.parametrize("arch", ["baichuan", "xverse"])
def test_llama_graph_arch_aliases(tmp_path, arch):
    """Arch strings the reference serves on a llama-identical graph:
    baichuan-7b and xverse convert with the llama q/k permutation and run
    the standard rms+SwiGLU decoder (llama.cpp LLM_ARCH_BAICHUAN /
    LLM_ARCH_XVERSE). A tiny HF Llama exported under the arch name must
    produce identical logits + engine greedy decode."""
    from transformers import LlamaConfig, LlamaForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(1)
    HKV = 2
    hc = LlamaConfig(vocab_size=len(vocab), hidden_size=E,
                     num_hidden_layers=L, num_attention_heads=H,
                     num_key_value_heads=HKV, intermediate_size=FF,
                     rms_norm_eps=1e-5, rope_theta=10000.0,
                     use_cache=False, tie_word_embeddings=False)
    hm = LlamaForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / f"{arch}.gguf")
    w, V = _gguf_header(path, arch, HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, permute_heads=H, hkv=HKV)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_orion_matches_transformers(tmp_path):
    """orion: biased LayerNorm + full neox rotary + gated SiLU on a
    llama graph (llama.cpp LLM_ARCH_ORION; converts without the q/k
    permutation). transformers ships no Orion class, but StableLm at
    partial_rotary_factor=1.0 without qkv biases IS that block, so it
    serves as the golden under the orion arch string."""
    from transformers import StableLmConfig, StableLmForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = StableLmConfig(vocab_size=len(vocab), hidden_size=E,
                        num_hidden_layers=L, num_attention_heads=H,
                        num_key_value_heads=HKV, intermediate_size=FF,
                        partial_rotary_factor=1.0, use_qkv_bias=False,
                        layer_norm_eps=1e-5, use_cache=False,
                        rope_theta=10000.0, tie_word_embeddings=False)
    hm = StableLmForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "orion.gguf")
    w, V = _gguf_header(path, "orion", HKV, D)
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output_norm.bias", _np(st, "model.norm.bias"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "attn_norm.bias",
                     _np(st, p + "input_layernorm.bias"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.bias",
                     _np(st, p + "post_attention_layernorm.bias"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_chatglm_matches_transformers(tmp_path):
    """chatglm (chatglm3 / glm-4-9b generation, llama.cpp
    LLM_ARCH_CHATGLM): glm4's interleaved partial rotary + fused gate|up
    + qkv biases WITHOUT the glm4 sandwich norms. Goldened against HF's
    GlmForCausalLM (the in-library port of that generation)."""
    from transformers import GlmConfig, GlmForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = GlmConfig(vocab_size=len(vocab), hidden_size=E,
                   num_hidden_layers=L, num_attention_heads=H,
                   num_key_value_heads=HKV, head_dim=D,
                   intermediate_size=FF, partial_rotary_factor=0.5,
                   rms_norm_eps=1e-5, use_cache=False,
                   rope_theta=10000.0, attention_bias=True,
                   pad_token_id=0, eos_token_id=2,
                   tie_word_embeddings=False)
    hm = GlmForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "chatglm.gguf")
    w, V = _gguf_header(path, "chatglm", HKV, D // 2,
                        extra=[("attention.key_length", D),
                               ("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, bias=True)
        w.add_tensor(o + "ffn_up.weight",
                     _np(st, p + "mlp.gate_up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_hunyuan_dense_matches_transformers(tmp_path):
    """hunyuan-dense (llama.cpp LLM_ARCH_HUNYUAN_DENSE): llama graph
    with per-head q/k RMSNorm applied AFTER the (neox) rotation — the
    cache stores post-norm keys like the HF reference."""
    from transformers import (HunYuanDenseV1Config,
                              HunYuanDenseV1ForCausalLM)
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = HunYuanDenseV1Config(vocab_size=len(vocab), hidden_size=E,
                              num_hidden_layers=L, num_attention_heads=H,
                              num_key_value_heads=HKV, head_dim=D,
                              intermediate_size=FF, rms_norm_eps=1e-5,
                              use_cache=False, rope_theta=10000.0,
                              attention_bias=False,
                              tie_word_embeddings=False)
    hm = HunYuanDenseV1ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "hunyuan.gguf")
    w, V = _gguf_header(path, "hunyuan-dense", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.query_layernorm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.key_layernorm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_hunyuan_moe_matches_transformers(tmp_path):
    """hunyuan-moe (llama.cpp LLM_ARCH_HUNYUAN_MOE): the dense block's
    post-rope per-head q/k norms + every-layer MoE with softmax-then-
    top-k renormalized routing and an ungated always-on shared MLP."""
    from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 4, 2
    hc = HunYuanMoEV1Config(vocab_size=len(vocab), hidden_size=E,
                            num_hidden_layers=L, num_attention_heads=H,
                            num_key_value_heads=HKV, head_dim=D,
                            intermediate_size=FF, num_experts=X,
                            moe_topk=K, rms_norm_eps=1e-5,
                            use_cache=False, rope_theta=10000.0,
                            attention_bias=False,
                            tie_word_embeddings=False)
    hm = HunYuanMoEV1ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "hunyuan_moe.gguf")
    w, V = _gguf_header(path, "hunyuan-moe", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("expert_count", X),
                               ("expert_used_count", K)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.query_layernorm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.key_layernorm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate_inp.weight",
                     _np(st, p + "mlp.gate.wg.weight"))
        for hfk, gg in (("gate_proj", "ffn_gate_exps"),
                        ("up_proj", "ffn_up_exps"),
                        ("down_proj", "ffn_down_exps")):
            w.add_tensor(o + gg + ".weight", np.stack([
                _np(st, p + f"mlp.experts.{j}.{hfk}.weight")
                for j in range(X)]))
        for hfk, gg in (("gate_proj", "ffn_gate_shexp"),
                        ("up_proj", "ffn_up_shexp"),
                        ("down_proj", "ffn_down_shexp")):
            w.add_tensor(o + gg + ".weight",
                         _np(st, p + f"mlp.shared_mlp.{hfk}.weight"))
    w.write()
    _compare(hm, path, atol=5e-4, decode_check=True)


def test_glm4moe_matches_transformers(tmp_path):
    """glm4moe (GLM-4.5, llama.cpp LLM_ARCH_GLM4_MOE): half-split
    partial rotary + optional per-head q/k norms + deepseek3-style
    routing (sigmoid scores, exp_probs_b selection bias, group-limited
    top-k, weights from uncorrected scores, renorm + scale) with dense
    first layer(s) and an always-on shared expert."""
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 8, 2
    hc = Glm4MoeConfig(vocab_size=len(vocab), hidden_size=E,
                       num_hidden_layers=L, num_attention_heads=H,
                       num_key_value_heads=HKV, head_dim=D,
                       intermediate_size=FF, moe_intermediate_size=FF // 2,
                       n_routed_experts=X, num_experts_per_tok=K,
                       n_shared_experts=1, n_group=4, topk_group=2,
                       norm_topk_prob=True, routed_scaling_factor=2.5,
                       first_k_dense_replace=1, use_qk_norm=True,
                       partial_rotary_factor=0.5, rms_norm_eps=1e-5,
                       use_cache=False, rope_theta=10000.0,
                       attention_bias=False, pad_token_id=0,
                       tie_word_embeddings=False)
    hm = Glm4MoeForCausalLM(hc).eval()
    st = hm.state_dict()
    with torch.no_grad():   # zeros would not exercise biased selection
        for i in range(1, L):
            st[f"model.layers.{i}.mlp.gate.e_score_correction_bias"] \
                .normal_(0.0, 0.5)

    path = str(tmp_path / "glm4moe.gguf")
    w, V = _gguf_header(path, "glm4moe", HKV, D // 2,
                        extra=[("attention.key_length", D),
                               ("attention.layer_norm_rms_epsilon", 1e-5),
                               ("expert_count", X),
                               ("expert_used_count", K),
                               ("expert_gating_func", 2),
                               ("expert_weights_norm", True),
                               ("expert_weights_scale", 2.5),
                               ("expert_group_count", 4),
                               ("expert_group_used_count", 2)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight"))
        _qkvo(w, st, p, o)
        if i == 0:
            w.add_tensor(o + "ffn_gate.weight",
                         _np(st, p + "mlp.gate_proj.weight"))
            w.add_tensor(o + "ffn_up.weight",
                         _np(st, p + "mlp.up_proj.weight"))
            w.add_tensor(o + "ffn_down.weight",
                         _np(st, p + "mlp.down_proj.weight"))
        else:
            w.add_tensor(o + "ffn_gate_inp.weight",
                         _np(st, p + "mlp.gate.weight"))
            w.add_tensor(o + "exp_probs_b.bias",
                         _np(st, p + "mlp.gate.e_score_correction_bias"))
            for hfk, gg in (("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps"),
                            ("down_proj", "ffn_down_exps")):
                w.add_tensor(o + gg + ".weight", np.stack([
                    _np(st, p + f"mlp.experts.{j}.{hfk}.weight")
                    for j in range(X)]))
            for hfk, gg in (("gate_proj", "ffn_gate_shexp"),
                            ("up_proj", "ffn_up_shexp"),
                            ("down_proj", "ffn_down_shexp")):
                w.add_tensor(o + gg + ".weight",
                             _np(st, p + f"mlp.shared_experts.{hfk}.weight"))
    w.write()
    _compare(hm, path, atol=5e-4, decode_check=True)


def test_jais_matches_numpy_reference(tmp_path):
    """jais (core42/inceptionai, GGUF arch 'jais'): GPT-2-style decoder
    with biased LayerNorm, ALiBi positions (max bias 8, no rope), fused
    biased attn_qkv, SwiGLU MLP (silu(c_fc) * c_fc2 -> ffn_gate/ffn_up
    under llama.cpp naming), and the muP scales: embeddings *
    embedding_scale, attention scores * 1/head_dim (scale_qk_dot_by_d),
    logits * logit_scale (width_scale). No transformers class exists
    (trust_remote_code upstream), so the golden is an independent numpy
    implementation of the published architecture (HF
    modeling_jais.py semantics; reference inherits llama.cpp
    llm_build_jais)."""
    vocab, _, _ = build_vocab()
    rng = np.random.default_rng(11)
    V = len(vocab)
    EMB_SCALE, LOGIT_SCALE, ALIBI = 9.5, 0.27, 8.0

    def r(*shape, scale=0.06):
        return rng.normal(size=shape, scale=scale).astype(np.float32)

    wts = {
        "embd": r(V, E), "onw": 1 + r(E, scale=0.1), "onb": r(E),
        "out": r(V, E),
        "layers": [
            {"anw": 1 + r(E, scale=0.1), "anb": r(E),
             "qkv": r(3 * E, E), "bqkv": r(3 * E),
             "wo": r(E, E), "bo": r(E),
             "fnw": 1 + r(E, scale=0.1), "fnb": r(E),
             "gate": r(FF, E), "bgate": r(FF),
             "up": r(FF, E), "bup": r(FF),
             "down": r(E, FF), "bdown": r(E)}
            for _ in range(L)],
    }

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5) * w + b

    def alibi_slopes(n_heads):
        import math
        n = 2 ** int(math.floor(math.log2(n_heads)))
        m0 = 2.0 ** (-ALIBI / n)
        m1 = 2.0 ** (-ALIBI / 2.0 / n)
        return np.array([m0 ** (i + 1) if i < n else m1 ** (2 * (i - n) + 1)
                         for i in range(n_heads)], np.float32)

    def silu(x):
        return x / (1 + np.exp(-x))

    def ref(toks):
        T = len(toks)
        x = wts["embd"][toks] * EMB_SCALE
        sl = alibi_slopes(H)
        for lw in wts["layers"]:
            h = ln(x, lw["anw"], lw["anb"])
            qkv = h @ lw["qkv"].T + lw["bqkv"]
            q = qkv[:, :E].reshape(T, H, D)
            k = qkv[:, E:2 * E].reshape(T, H, D)
            v = qkv[:, 2 * E:].reshape(T, H, D)
            sc = np.einsum("qhd,khd->hqk", q, k) / D   # muP 1/d
            dist = np.arange(T)[None, None, :] - np.arange(T)[None, :, None]
            sc = sc + sl[:, None, None] * dist
            mask = np.tril(np.ones((T, T), bool))
            sc = np.where(mask[None], sc, -1e30)
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            attn = np.einsum("hqk,khd->qhd", p, v).reshape(T, E)
            x = x + attn @ lw["wo"].T + lw["bo"]
            h = ln(x, lw["fnw"], lw["fnb"])
            g = silu(h @ lw["gate"].T + lw["bgate"])
            u = h @ lw["up"].T + lw["bup"]
            x = x + (g * u) @ lw["down"].T + lw["bdown"]
        x = ln(x, wts["onw"], wts["onb"])
        return (x @ wts["out"].T) * LOGIT_SCALE

    path = str(tmp_path / "jais.gguf")
    w, _ = _gguf_header(path, "jais", H, D,
                        extra=[("attention.max_alibi_bias", ALIBI),
                               ("embedding_scale", EMB_SCALE),
                               ("logit_scale", LOGIT_SCALE)])
    w.add_tensor("token_embd.weight", wts["embd"])
    w.add_tensor("output_norm.weight", wts["onw"])
    w.add_tensor("output_norm.bias", wts["onb"])
    w.add_tensor("output.weight", wts["out"])
    for i, lw in enumerate(wts["layers"]):
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", lw["anw"])
        w.add_tensor(o + "attn_norm.bias", lw["anb"])
        w.add_tensor(o + "attn_qkv.weight", lw["qkv"])
        w.add_tensor(o + "attn_qkv.bias", lw["bqkv"])
        w.add_tensor(o + "attn_output.weight", lw["wo"])
        w.add_tensor(o + "attn_output.bias", lw["bo"])
        w.add_tensor(o + "ffn_norm.weight", lw["fnw"])
        w.add_tensor(o + "ffn_norm.bias", lw["fnb"])
        w.add_tensor(o + "ffn_gate.weight", lw["gate"])
        w.add_tensor(o + "ffn_gate.bias", lw["bgate"])
        w.add_tensor(o + "ffn_up.weight", lw["up"])
        w.add_tensor(o + "ffn_up.bias", lw["bup"])
        w.add_tensor(o + "ffn_down.weight", lw["down"])
        w.add_tensor(o + "ffn_down.bias", lw["bdown"])
    w.write()

    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.norm_style == "ln" and cfg.rope_mode == "none"
    assert cfg.alibi_max_bias == ALIBI
    assert abs(cfg.attn_scale - 1.0 / D) < 1e-9
    assert cfg.embd_scale == pytest.approx(EMB_SCALE)
    assert cfg.logit_scale == pytest.approx(LOGIT_SCALE)
    rng2 = np.random.default_rng(4)
    T = 10
    toks = rng2.integers(3, V, (T,)).astype(np.int32)
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    logits, _ = prefill_impl(params, cfg, jnp.asarray(toks), kv,
                             jnp.int32(0), jnp.int32(0), jnp.int32(T),
                             cos, sin)
    ref_logits = ref(toks)
    np.testing.assert_allclose(np.asarray(logits), ref_logits[-1],
                               atol=3e-3, rtol=5e-3)


def test_arcee_matches_transformers(tmp_path):
    """arcee (AFM): llama backbone with an UNGATED relu^2 MLP
    (down(relu(up(x))^2), no gate projection)."""
    from transformers import ArceeConfig, ArceeForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV = 2
    hc = ArceeConfig(vocab_size=len(vocab), hidden_size=E,
                     num_hidden_layers=L, num_attention_heads=H,
                     num_key_value_heads=HKV, intermediate_size=FF,
                     rms_norm_eps=1e-5, use_cache=False,
                     rope_theta=10000.0, tie_word_embeddings=False)
    hm = ArceeForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "arcee.gguf")
    w, V = _gguf_header(path, "arcee", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, permute_heads=H, hkv=HKV)
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    cfg, _ = load_model(path, dtype=jnp.float32)
    assert not cfg.ffn_gated and cfg.act_fn == "relu2"
    _compare(hm, path, decode_check=True)


def test_granitemoeshared_matches_transformers(tmp_path):
    """granitemoeshared (granite 4 preview): granitemoe multipliers +
    MoE with a parallel always-on SHARED gated MLP added to the routed
    output (HF shared_mlp.input_linear = fused gate|up)."""
    from transformers import (GraniteMoeSharedConfig,
                              GraniteMoeSharedForCausalLM)
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 4, 2
    hc = GraniteMoeSharedConfig(vocab_size=len(vocab), hidden_size=E,
                                num_hidden_layers=L, num_attention_heads=H,
                                num_key_value_heads=HKV,
                                intermediate_size=FF,
                                shared_intermediate_size=FF,
                                num_local_experts=X, num_experts_per_tok=K,
                                rms_norm_eps=1e-5, use_cache=False,
                                rope_theta=10000.0,
                                embedding_multiplier=2.0,
                                residual_multiplier=0.5,
                                logits_scaling=4.0,
                                attention_multiplier=0.125,
                                tie_word_embeddings=False)
    hm = GraniteMoeSharedForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "granitemoeshared.gguf")
    w, V = _gguf_header(path, "granitemoeshared", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("embedding_scale", 2.0),
                               ("residual_scale", 0.5),
                               ("logit_scale", 1.0 / 4.0),
                               ("attention.scale", 0.125),
                               ("expert_count", X),
                               ("expert_used_count", K)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        _qkvo(w, st, p, o, permute_heads=H, hkv=HKV)
        w.add_tensor(o + "ffn_gate_inp.weight",
                     _np(st, p + "block_sparse_moe.router.layer.weight"))
        inp = _np(st, p + "block_sparse_moe.input_linear.weight")
        w.add_tensor(o + "ffn_gate_exps.weight", inp[:, :FF])
        w.add_tensor(o + "ffn_up_exps.weight", inp[:, FF:])
        w.add_tensor(o + "ffn_down_exps.weight",
                     _np(st, p + "block_sparse_moe.output_linear.weight"))
        shr = _np(st, p + "shared_mlp.input_linear.weight")   # [2F, E]
        w.add_tensor(o + "ffn_gate_shexp.weight", shr[:FF])
        w.add_tensor(o + "ffn_up_shexp.weight", shr[FF:])
        w.add_tensor(o + "ffn_down_shexp.weight",
                     _np(st, p + "shared_mlp.output_linear.weight"))
    w.write()
    _compare(hm, path, decode_check=True)


def test_phimoe_matches_transformers(tmp_path):
    """phimoe (Phi-3.5-MoE): neox rotary, q/k/v/o and lm_head biases,
    16->2 sparsemixer routing — at inference each round picks the argmax
    of the remaining scores and weights it by the jitter-masked softmax
    of the ORIGINAL scores (weights NOT renormalized)."""
    from transformers import PhimoeConfig, PhimoeForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, X, K = 2, 8, 2
    hc = PhimoeConfig(vocab_size=len(vocab), hidden_size=E,
                      num_hidden_layers=L, num_attention_heads=H,
                      num_key_value_heads=HKV, intermediate_size=FF,
                      num_local_experts=X, num_experts_per_tok=K,
                      rms_norm_eps=1e-5, use_cache=False,
                      rope_theta=10000.0, attention_bias=True,
                      lm_head_bias=True, router_jitter_noise=0.01,
                      sliding_window=None, tie_word_embeddings=False)
    hm = PhimoeForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "phimoe.gguf")
    w, V = _gguf_header(path, "phimoe", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("expert_count", X),
                               ("expert_used_count", K)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output_norm.bias", _np(st, "model.norm.bias"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    w.add_tensor("output.bias", _np(st, "lm_head.bias"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "attn_norm.bias",
                     _np(st, p + "input_layernorm.bias"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.bias",
                     _np(st, p + "post_attention_layernorm.bias"))
        _qkvo(w, st, p, o, bias=True)     # neox: no permute
        w.add_tensor(o + "attn_output.bias",
                     _np(st, p + "self_attn.o_proj.bias"))
        w.add_tensor(o + "ffn_gate_inp.weight",
                     _np(st, p + "block_sparse_moe.gate.weight"))
        gate = np.stack([_np(st, p + f"block_sparse_moe.experts.{x}."
                             "w1.weight") for x in range(X)])
        upw = np.stack([_np(st, p + f"block_sparse_moe.experts.{x}."
                            "w3.weight") for x in range(X)])
        down = np.stack([_np(st, p + f"block_sparse_moe.experts.{x}."
                             "w2.weight") for x in range(X)])
        w.add_tensor(o + "ffn_gate_exps.weight", gate)
        w.add_tensor(o + "ffn_up_exps.weight", upw)
        w.add_tensor(o + "ffn_down_exps.weight", down)
    w.write()
    cfg, _ = load_model(path, dtype=jnp.float32)
    assert cfg.expert_gating_func == 3 and cfg.rope_mode == "neox"
    _compare(hm, path, decode_check=True)


def test_olmo3_matches_transformers(tmp_path):
    """olmo3: olmo2's post-norm-only blocks + whole-row q/k norms, with
    the 3-sliding:1-full attention pattern (every 4th layer full
    context; all layers roped — unlike cohere2/exaone4's unroped full
    layers). Golden uses rope_scaling=None so sliding and full layers
    share one rope table, exactly as exported."""
    from transformers import Olmo3Config, Olmo3ForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    HKV, NL, SW = 4, 4, 8
    hc = Olmo3Config(vocab_size=len(vocab), hidden_size=E,
                     num_hidden_layers=NL, num_attention_heads=H,
                     num_key_value_heads=HKV, intermediate_size=FF,
                     rms_norm_eps=1e-5, use_cache=False,
                     rope_theta=10000.0, rope_scaling=None,
                     sliding_window=SW,
                     layer_types=["sliding_attention"] * 3
                     + ["full_attention"],
                     tie_word_embeddings=False)
    hm = Olmo3ForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "olmo3.gguf")
    w, V = _gguf_header(path, "olmo3", HKV, D, n_layers=NL,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attention.sliding_window", SW)])
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(NL):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "post_attention_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        w.add_tensor(o + "post_ffw_norm.weight",
                     _np(st, p + "post_feedforward_layernorm.weight"))
        w.add_tensor(o + "attn_q_norm.weight",
                     _np(st, p + "self_attn.q_norm.weight"))
        w.add_tensor(o + "attn_k_norm.weight",
                     _np(st, p + "self_attn.k_norm.weight"))
        _qkvo(w, st, p, o)
        w.add_tensor(o + "ffn_gate.weight",
                     _np(st, p + "mlp.gate_proj.weight"))
        w.add_tensor(o + "ffn_up.weight", _np(st, p + "mlp.up_proj.weight"))
        w.add_tensor(o + "ffn_down.weight",
                     _np(st, p + "mlp.down_proj.weight"))
    w.write()
    cfg, _ = load_model(path, dtype=jnp.float32)
    assert cfg.swa_window == SW and cfg.swa_pattern == 4
    _compare(hm, path, decode_check=True)


def test_jetmoe_matches_transformers(tmp_path):
    """jetmoe: BOTH the attention (MoA: query/output projections as
    top-k routed experts over one shared kv projection, learned output
    bias) and the FFN (fused gate|up experts + learned output bias) are
    mixtures. Export convention (ours; documented): head_count =
    n_experts * head_count_kv (the dense emulation computes every
    expert's heads — per-head softmax is independent, so it is exact —
    and the routing mask selects at the output mix); kv_proj splits to
    attn_k/attn_v; the MoA/MoE biases ride attn_output.bias /
    ffn_down.bias."""
    from transformers import JetMoeConfig, JetMoeForCausalLM
    vocab, _, _ = build_vocab()
    torch.manual_seed(0)
    KVH, X, K = 2, 4, 2
    hc = JetMoeConfig(vocab_size=len(vocab), hidden_size=E,
                      num_hidden_layers=L,
                      num_key_value_heads=KVH,
                      num_attention_heads=K * KVH,
                      kv_channels=D, intermediate_size=FF,
                      num_local_experts=X, num_experts_per_tok=K,
                      rms_norm_eps=1e-5, use_cache=False,
                      rope_theta=10000.0, activation_function="silu",
                      tie_word_embeddings=False)
    hm = JetMoeForCausalLM(hc).eval()
    st = hm.state_dict()

    path = str(tmp_path / "jetmoe.gguf")
    w, V = _gguf_header(path, "jetmoe", KVH, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("expert_count", X),
                               ("expert_used_count", K)])
    # our convention: head_count = X * KVH (overrides the helper's H);
    # head_dim = kv_channels, NOT n_embd / n_heads
    w.add_kv("jetmoe.attention.head_count", X * KVH)
    w.add_kv("jetmoe.attention.key_length", D)
    w.add_tensor("token_embd.weight", _np(st, "model.embed_tokens.weight"))
    w.add_tensor("output_norm.weight", _np(st, "model.norm.weight"))
    w.add_tensor("output.weight", _np(st, "lm_head.weight"))
    for i in range(L):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     _np(st, p + "input_layernorm.weight"))
        w.add_tensor(o + "ffn_norm.weight",
                     _np(st, p + "post_attention_layernorm.weight"))
        moa = p + "self_attention."
        w.add_tensor(o + "attn_q_exps.weight",
                     _np(st, moa + "experts.input_linear.weight"))
        w.add_tensor(o + "attn_output_exps.weight",
                     _np(st, moa + "experts.output_linear.weight"))
        w.add_tensor(o + "attn_gate_inp.weight",
                     _np(st, moa + "experts.router.layer.weight"))
        w.add_tensor(o + "attn_output.bias",
                     _np(st, moa + "experts.bias"))
        kv = _np(st, moa + "kv_proj.weight")          # [2*KVH*D, E]
        w.add_tensor(o + "attn_k.weight", kv[:KVH * D])
        w.add_tensor(o + "attn_v.weight", kv[KVH * D:])
        moe = p + "mlp."
        inp = _np(st, moe + "input_linear.weight")    # [X, 2F, E]
        w.add_tensor(o + "ffn_gate_exps.weight", inp[:, :FF])
        w.add_tensor(o + "ffn_up_exps.weight", inp[:, FF:])
        w.add_tensor(o + "ffn_down_exps.weight",
                     _np(st, moe + "output_linear.weight"))
        w.add_tensor(o + "ffn_gate_inp.weight",
                     _np(st, moe + "router.layer.weight"))
        w.add_tensor(o + "ffn_down.bias", _np(st, moe + "bias"))
    w.write()

    cfg, _ = load_model(path, dtype=jnp.float32)
    assert cfg.n_heads == X * KVH and cfg.rope_mode == "neox"
    _compare(hm, path, decode_check=True)


def _rope_norm_np(x, pos, D_):
    """llama.cpp 'norm' (adjacent-pair) rotation: GGUF-converted q/k are
    permuted so pair (2i, 2i+1) rotates at base^(-i/half)."""
    half = D_ // 2
    inv = 1.0 / (10000.0 ** (np.arange(half) / half))
    ang = np.outer(pos, inv)
    c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x0, x1 = x[..., 0::2], x[..., 1::2]
    out = np.empty_like(x)
    out[..., 0::2] = x0 * c - x1 * s
    out[..., 1::2] = x0 * s + x1 * c
    return out


def _gqa_attn_np(h, lw, pos, Hn, HKV, D_, alibi_slopes=None, rope=True):
    """Causal GQA attention on numpy weights {wq,wk,wv,wo}; pairwise rope
    (llama.cpp 'norm' mode) unless rope=False (then optional ALiBi)."""
    T = h.shape[0]
    q = (h @ lw["wq"].T).reshape(T, Hn, D_)
    k = (h @ lw["wk"].T).reshape(T, HKV, D_)
    v = (h @ lw["wv"].T).reshape(T, HKV, D_)
    if rope:
        q, k = _rope_norm_np(q, pos, D_), _rope_norm_np(k, pos, D_)
    G = Hn // HKV
    kx, vx = np.repeat(k, G, axis=1), np.repeat(v, G, axis=1)
    sc = np.einsum("qhd,khd->hqk", q, kx) / np.sqrt(D_)
    if alibi_slopes is not None:
        dist = np.arange(T)[None, None, :] - np.arange(T)[None, :, None]
        sc = sc + alibi_slopes[:, None, None] * dist
    mask = np.tril(np.ones((T, T), bool))
    sc = np.where(mask[None], sc, -1e30)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    attn = np.einsum("hqk,khd->qhd", p, vx).reshape(T, Hn * D_)
    return attn @ lw["wo"].T


def _moe_np(h, router, gate, up, down, K_, renorm=True):
    """softmax-over-all -> top-k -> (renorm) weighted silu expert mix."""
    rl = h @ router.T
    pr = np.exp(rl - rl.max(-1, keepdims=True))
    pr /= pr.sum(-1, keepdims=True)
    topi = np.argsort(-pr, axis=-1)[:, :K_]
    y = np.zeros_like(h)
    for t in range(h.shape[0]):
        wsum = pr[t, topi[t]].sum() if renorm else 1.0
        for j in topi[t]:
            g = h[t] @ gate[j].T
            u = h[t] @ up[j].T
            y[t] += (pr[t, j] / wsum) * \
                ((g / (1 + np.exp(-g)) * u) @ down[j].T)
    return y


def _numpy_greedy_check(ref, path, n_new=6, prompt_len=5):
    """Engine greedy decode must match an argmax rollout of the numpy
    reference (the ref is stateless full-attention, so each step re-runs
    it on the extended sequence). Engine stops early on EOG tokens the
    rollout keeps emitting — compare the generated prefix."""
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    cfg, params = load_model(path, dtype=jnp.float32)
    rng = np.random.default_rng(13)
    toks = rng.integers(3, cfg.vocab_size,
                        (prompt_len,)).astype(np.int32).tolist()
    seq = list(toks)
    expect = []
    for _ in range(n_new):
        nxt = int(np.argmax(ref(np.asarray(seq, np.int32))[-1]))
        expect.append(nxt)
        seq.append(nxt)
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=2, n_ctx=128))
    eng.start()
    try:
        final, _ = run_task(eng, CompletionsTask(
            toks, greedy(), tokenizer=tok, max_tokens=n_new, stream=False))
    finally:
        eng.stop()
    got = final.generated[:n_new]
    assert got == expect[:len(got)], (got, expect)
    assert len(got) >= 3 or tok.is_eog(got[-1]), (got, expect)


def test_arctic_matches_numpy_reference(tmp_path):
    """arctic (Snowflake): dense-MoE hybrid — every layer runs a dense
    SwiGLU FFN (pre-normed by ffn_norm) AND a top-2 MoE (pre-normed by
    its own ffn_norm_exps) in PARALLEL off the attention residual:
    out = ffn_inp + dense(ffn_norm(ffn_inp)) + moe(ffn_norm_exps(
    ffn_inp)). Routing is softmax-over-all then top-k with renormalized
    weights (llama.cpp llm_build_arctic / build_moe_ffn norm_w=true);
    q/k are permuted at conversion -> 'norm' rope. No transformers class
    exists (trust_remote_code upstream), so the golden is an independent
    numpy implementation of the published architecture."""
    vocab, _, _ = build_vocab()
    rng = np.random.default_rng(17)
    HKV, X, K, FE = 2, 4, 2, 64
    V = len(vocab)

    def r(*shape, scale=0.06):
        return rng.normal(size=shape, scale=scale).astype(np.float32)

    wts = {
        "embd": r(V, E), "onw": 1 + r(E, scale=0.1), "out": r(V, E),
        "layers": [
            {"anw": 1 + r(E, scale=0.1),
             "wq": r(H * D, E), "wk": r(HKV * D, E), "wv": r(HKV * D, E),
             "wo": r(E, H * D),
             "fnw": 1 + r(E, scale=0.1),
             "gate": r(FF, E), "up": r(FF, E), "down": r(E, FF),
             "fnx": 1 + r(E, scale=0.1),
             "router": r(X, E),
             "gate_x": r(X, FE, E), "up_x": r(X, FE, E),
             "down_x": r(X, E, FE)}
            for _ in range(L)],
    }

    def rms(x, w):
        return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w

    def silu(x):
        return x / (1 + np.exp(-x))

    def ref(toks):
        T = len(toks)
        pos = np.arange(T)
        x = wts["embd"][toks]
        for lw in wts["layers"]:
            h = rms(x, lw["anw"])
            x = x + _gqa_attn_np(h, lw, pos, H, HKV, D)
            h = rms(x, lw["fnw"])
            dense = (silu(h @ lw["gate"].T) * (h @ lw["up"].T)) \
                @ lw["down"].T
            hm = rms(x, lw["fnx"])
            moe = _moe_np(hm, lw["router"], lw["gate_x"], lw["up_x"],
                          lw["down_x"], K)
            x = x + dense + moe
        return rms(x, wts["onw"]) @ wts["out"].T

    path = str(tmp_path / "arctic.gguf")
    w, _ = _gguf_header(path, "arctic", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("expert_count", X),
                               ("expert_used_count", K)])
    w.add_tensor("token_embd.weight", wts["embd"])
    w.add_tensor("output_norm.weight", wts["onw"])
    w.add_tensor("output.weight", wts["out"])
    for i, lw in enumerate(wts["layers"]):
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", lw["anw"])
        w.add_tensor(o + "attn_q.weight", lw["wq"])
        w.add_tensor(o + "attn_k.weight", lw["wk"])
        w.add_tensor(o + "attn_v.weight", lw["wv"])
        w.add_tensor(o + "attn_output.weight", lw["wo"])
        w.add_tensor(o + "ffn_norm.weight", lw["fnw"])
        w.add_tensor(o + "ffn_gate.weight", lw["gate"])
        w.add_tensor(o + "ffn_up.weight", lw["up"])
        w.add_tensor(o + "ffn_down.weight", lw["down"])
        w.add_tensor(o + "ffn_norm_exps.weight", lw["fnx"])
        w.add_tensor(o + "ffn_gate_inp.weight", lw["router"])
        w.add_tensor(o + "ffn_gate_exps.weight", lw["gate_x"])
        w.add_tensor(o + "ffn_up_exps.weight", lw["up_x"])
        w.add_tensor(o + "ffn_down_exps.weight", lw["down_x"])
    w.write()

    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.rope_mode == "norm" and cfg.expert_weights_norm
    rng2 = np.random.default_rng(5)
    T = 10
    toks = rng2.integers(3, V, (T,)).astype(np.int32)
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    logits, _ = prefill_impl(params, cfg, jnp.asarray(toks), kv,
                             jnp.int32(0), jnp.int32(0), jnp.int32(T),
                             cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref(toks)[-1],
                               atol=3e-3, rtol=5e-3)
    _numpy_greedy_check(ref, path)


def test_refact_matches_numpy_reference(tmp_path):
    """refact (smallcloudai Refact-1.6B): RMS-normed decoder with
    multi-query attention (n_head_kv=1), ALiBi positions (max bias 8, no
    rope) and a SwiGLU FFN; no biases anywhere (llama.cpp
    llm_build_refact). No transformers class exists (trust_remote_code
    upstream), so the golden is an independent numpy implementation."""
    vocab, _, _ = build_vocab()
    rng = np.random.default_rng(23)
    V = len(vocab)

    def r(*shape, scale=0.06):
        return rng.normal(size=shape, scale=scale).astype(np.float32)

    wts = {
        "embd": r(V, E), "onw": 1 + r(E, scale=0.1), "out": r(V, E),
        "layers": [
            {"anw": 1 + r(E, scale=0.1),
             "wq": r(H * D, E), "wk": r(D, E), "wv": r(D, E),
             "wo": r(E, H * D),
             "fnw": 1 + r(E, scale=0.1),
             "gate": r(FF, E), "up": r(FF, E), "down": r(E, FF)}
            for _ in range(L)],
    }

    def rms(x, w):
        return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w

    def alibi_slopes(n_heads, max_bias=8.0):
        import math
        n = 2 ** int(math.floor(math.log2(n_heads)))
        m0 = 2.0 ** (-max_bias / n)
        m1 = 2.0 ** (-max_bias / 2.0 / n)
        return np.array([m0 ** (i + 1) if i < n
                         else m1 ** (2 * (i - n) + 1)
                         for i in range(n_heads)], np.float32)

    def silu(x):
        return x / (1 + np.exp(-x))

    def ref(toks):
        T = len(toks)
        pos = np.arange(T)
        x = wts["embd"][toks]
        sl = alibi_slopes(H)
        for lw in wts["layers"]:
            h = rms(x, lw["anw"])
            x = x + _gqa_attn_np(h, lw, pos, H, 1, D,
                                 alibi_slopes=sl, rope=False)
            h = rms(x, lw["fnw"])
            x = x + (silu(h @ lw["gate"].T) * (h @ lw["up"].T)) \
                @ lw["down"].T
        return rms(x, wts["onw"]) @ wts["out"].T

    path = str(tmp_path / "refact.gguf")
    w, _ = _gguf_header(path, "refact", 1, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("attention.max_alibi_bias", 8.0)])
    w.add_tensor("token_embd.weight", wts["embd"])
    w.add_tensor("output_norm.weight", wts["onw"])
    w.add_tensor("output.weight", wts["out"])
    for i, lw in enumerate(wts["layers"]):
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", lw["anw"])
        w.add_tensor(o + "attn_q.weight", lw["wq"])
        w.add_tensor(o + "attn_k.weight", lw["wk"])
        w.add_tensor(o + "attn_v.weight", lw["wv"])
        w.add_tensor(o + "attn_output.weight", lw["wo"])
        w.add_tensor(o + "ffn_norm.weight", lw["fnw"])
        w.add_tensor(o + "ffn_gate.weight", lw["gate"])
        w.add_tensor(o + "ffn_up.weight", lw["up"])
        w.add_tensor(o + "ffn_down.weight", lw["down"])
    w.write()

    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.rope_mode == "none" and cfg.alibi_max_bias == 8.0
    assert cfg.norm_style == "rms" and cfg.n_kv_heads == 1
    rng2 = np.random.default_rng(6)
    T = 10
    toks = rng2.integers(3, V, (T,)).astype(np.int32)
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    logits, _ = prefill_impl(params, cfg, jnp.asarray(toks), kv,
                             jnp.int32(0), jnp.int32(0), jnp.int32(T),
                             cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref(toks)[-1],
                               atol=3e-3, rtol=5e-3)
    _numpy_greedy_check(ref, path)


def test_bailingmoe_matches_numpy_reference(tmp_path):
    """bailingmoe (inclusionAI Ling): deepseek-lite-style MoE — leading
    dense block(s), then MoE layers with softmax top-k routing
    (renormalized, norm_topk_prob) plus an always-on shared expert added
    to the routed output; GQA attention with llama-permuted q/k ('norm'
    rope) (llama.cpp llm_build_bailingmoe). No transformers class exists
    (trust_remote_code upstream), so the golden is an independent numpy
    implementation. Also exercises the heterogeneous layer-group scan
    (dense layer 0 + MoE layer 1)."""
    vocab, _, _ = build_vocab()
    rng = np.random.default_rng(29)
    HKV, X, K, FE = 2, 4, 2, 64
    V = len(vocab)

    def r(*shape, scale=0.06):
        return rng.normal(size=shape, scale=scale).astype(np.float32)

    def attn_w():
        return {"anw": 1 + r(E, scale=0.1),
                "wq": r(H * D, E), "wk": r(HKV * D, E),
                "wv": r(HKV * D, E), "wo": r(E, H * D),
                "fnw": 1 + r(E, scale=0.1)}

    l0 = dict(attn_w(), gate=r(FF, E), up=r(FF, E), down=r(E, FF))
    l1 = dict(attn_w(), router=r(X, E),
              gate_x=r(X, FE, E), up_x=r(X, FE, E), down_x=r(X, E, FE),
              gate_sh=r(FE, E), up_sh=r(FE, E), down_sh=r(E, FE))
    wts = {"embd": r(V, E), "onw": 1 + r(E, scale=0.1), "out": r(V, E),
           "layers": [l0, l1]}

    def rms(x, w):
        return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w

    def silu(x):
        return x / (1 + np.exp(-x))

    def ref(toks):
        T = len(toks)
        pos = np.arange(T)
        x = wts["embd"][toks]
        for lw in wts["layers"]:
            h = rms(x, lw["anw"])
            x = x + _gqa_attn_np(h, lw, pos, H, HKV, D)
            h = rms(x, lw["fnw"])
            if "router" in lw:
                y = _moe_np(h, lw["router"], lw["gate_x"], lw["up_x"],
                            lw["down_x"], K)
                y = y + (silu(h @ lw["gate_sh"].T) * (h @ lw["up_sh"].T)) \
                    @ lw["down_sh"].T
            else:
                y = (silu(h @ lw["gate"].T) * (h @ lw["up"].T)) \
                    @ lw["down"].T
            x = x + y
        return rms(x, wts["onw"]) @ wts["out"].T

    path = str(tmp_path / "bailingmoe.gguf")
    w, _ = _gguf_header(path, "bailingmoe", HKV, D,
                        extra=[("attention.layer_norm_rms_epsilon", 1e-5),
                               ("expert_count", X),
                               ("expert_used_count", K),
                               ("expert_weights_norm", True),
                               ("expert_weights_scale", 1.0),
                               ("leading_dense_block_count", 1),
                               ("expert_shared_count", 1)])
    w.add_tensor("token_embd.weight", wts["embd"])
    w.add_tensor("output_norm.weight", wts["onw"])
    w.add_tensor("output.weight", wts["out"])
    for i, lw in enumerate(wts["layers"]):
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight", lw["anw"])
        w.add_tensor(o + "attn_q.weight", lw["wq"])
        w.add_tensor(o + "attn_k.weight", lw["wk"])
        w.add_tensor(o + "attn_v.weight", lw["wv"])
        w.add_tensor(o + "attn_output.weight", lw["wo"])
        w.add_tensor(o + "ffn_norm.weight", lw["fnw"])
        if "router" in lw:
            w.add_tensor(o + "ffn_gate_inp.weight", lw["router"])
            w.add_tensor(o + "ffn_gate_exps.weight", lw["gate_x"])
            w.add_tensor(o + "ffn_up_exps.weight", lw["up_x"])
            w.add_tensor(o + "ffn_down_exps.weight", lw["down_x"])
            w.add_tensor(o + "ffn_gate_shexp.weight", lw["gate_sh"])
            w.add_tensor(o + "ffn_up_shexp.weight", lw["up_sh"])
            w.add_tensor(o + "ffn_down_shexp.weight", lw["down_sh"])
        else:
            w.add_tensor(o + "ffn_gate.weight", lw["gate"])
            w.add_tensor(o + "ffn_up.weight", lw["up"])
            w.add_tensor(o + "ffn_down.weight", lw["down"])
    w.write()

    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.rope_mode == "norm" and cfg.expert_weights_norm
    rng2 = np.random.default_rng(7)
    T = 10
    toks = rng2.integers(3, V, (T,)).astype(np.int32)
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    logits, _ = prefill_impl(params, cfg, jnp.asarray(toks), kv,
                             jnp.int32(0), jnp.int32(0), jnp.int32(T),
                             cos, sin)
    np.testing.assert_allclose(np.asarray(logits), ref(toks)[-1],
                               atol=3e-3, rtol=5e-3)
    _numpy_greedy_check(ref, path)
