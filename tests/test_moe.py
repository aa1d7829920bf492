"""Mixture-of-experts FFN: tiny MoE GGUF loads and the routed forward
matches a numpy reference of the same semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.constants import GGMLType
from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models import load_model
from llama_box_tpu.models.llama import forward, init_kv_cache, make_rope

E, FF, X, K = 32, 48, 4, 2
HEADS, KV_HEADS, HEAD_DIM = 4, 2, 8
VOCAB = 64


def write_tiny_moe(path, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="qwen2moe")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    w.add_kv("qwen2moe.block_count", 1)
    w.add_kv("qwen2moe.context_length", 128)
    w.add_kv("qwen2moe.embedding_length", E)
    w.add_kv("qwen2moe.feed_forward_length", FF)
    w.add_kv("qwen2moe.attention.head_count", HEADS)
    w.add_kv("qwen2moe.attention.head_count_kv", KV_HEADS)
    w.add_kv("qwen2moe.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("qwen2moe.rope.freq_base", 10000.0)
    w.add_kv("qwen2moe.rope.dimension_count", HEAD_DIM)
    w.add_kv("qwen2moe.expert_count", X)
    w.add_kv("qwen2moe.expert_used_count", K)
    w.add_kv("qwen2moe.expert_weights_norm", False)
    w.add_kv("qwen2moe.vocab_size", VOCAB)
    w.add_kv("tokenizer.ggml.model", "llama")
    toks = ["<unk>", "<s>", "</s>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    w.add_kv("tokenizer.ggml.tokens", toks)
    w.add_kv("tokenizer.ggml.scores",
             np.zeros(VOCAB, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type",
             np.array([2, 3, 3] + [1] * (VOCAB - 3), dtype=np.int32))

    w.add_tensor("token_embd.weight", rand(VOCAB, E))
    w.add_tensor("output_norm.weight", np.ones(E, np.float32))
    w.add_tensor("output.weight", rand(VOCAB, E))
    w.add_tensor("blk.0.attn_norm.weight", np.ones(E, np.float32))
    w.add_tensor("blk.0.attn_q.weight", rand(HEADS * HEAD_DIM, E))
    w.add_tensor("blk.0.attn_k.weight", rand(KV_HEADS * HEAD_DIM, E))
    w.add_tensor("blk.0.attn_v.weight", rand(KV_HEADS * HEAD_DIM, E))
    w.add_tensor("blk.0.attn_output.weight", rand(E, HEADS * HEAD_DIM))
    w.add_tensor("blk.0.ffn_norm.weight", np.ones(E, np.float32))
    w.add_tensor("blk.0.ffn_gate_inp.weight", rand(X, E))
    # ggml 3D expert stacks: stored logical shape (X, FF, E) / (X, E, FF)
    w.add_tensor("blk.0.ffn_gate_exps.weight", rand(X, FF, E))
    w.add_tensor("blk.0.ffn_up_exps.weight", rand(X, FF, E))
    w.add_tensor("blk.0.ffn_down_exps.weight", rand(X, E, FF))
    # shared expert
    w.add_tensor("blk.0.ffn_gate_shexp.weight", rand(FF, E))
    w.add_tensor("blk.0.ffn_up_shexp.weight", rand(FF, E))
    w.add_tensor("blk.0.ffn_down_shexp.weight", rand(E, FF))
    w.add_tensor("blk.0.ffn_gate_inp_shexp.weight", rand(1, E))
    w.write()


def moe_ffn_np(h, gate_inp, g_exps, u_exps, d_exps, k, norm):
    """h: [T, E]; g/u_exps: (X, FF, E); d_exps: (X, E, FF)."""
    router = h @ gate_inp.T                  # [T, X]
    e = np.exp(router - router.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    out = np.zeros_like(h)
    for t in range(h.shape[0]):
        top = np.argsort(-probs[t])[:k]
        w = probs[t][top]
        if norm:
            w = w / w.sum()
        for wi, xi in zip(w, top):
            gate = h[t] @ g_exps[xi].T
            up = h[t] @ u_exps[xi].T
            act = (gate / (1 + np.exp(-gate))) * up
            out[t] += wi * (act @ d_exps[xi].T)
    return out


def test_moe_model_loads_and_runs(tmp_path):
    path = str(tmp_path / "moe.gguf")
    write_tiny_moe(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.expert_count == X and cfg.expert_used_count == K
    assert "w_gate_exps" in params["layers"]
    assert params["layers"]["w_gate_exps"].shape == (1, X, E, FF)

    rng = np.random.default_rng(1)
    toks = rng.integers(3, VOCAB, size=(1, 5)).astype(np.int32)
    cos, sin = make_rope(cfg, 16)
    kv = init_kv_cache(cfg, 1, 16, jnp.float32)
    logits, _ = forward(params, cfg, toks, np.arange(5, np.int32)[None, :]
                        if False else np.arange(5, dtype=np.int32)[None, :],
                        kv, np.array([5], np.int32), cos, sin)
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_ffn_matches_numpy(tmp_path):
    from llama_box_tpu.models.llama import _moe_ffn
    path = str(tmp_path / "moe2.gguf")
    write_tiny_moe(path, seed=3)
    cfg, params = load_model(path, dtype=jnp.float32)
    lp = {k: v[0] for k, v in params["layers"].items()}
    # exclude the shared expert for the plain-MoE comparison
    lp_plain = {k: v for k, v in lp.items() if "shexp" not in k}

    rng = np.random.default_rng(2)
    h = rng.normal(size=(1, 6, E)).astype(np.float32)
    got = np.asarray(_moe_ffn(jnp.asarray(h), lp_plain, cfg))[0]

    g_exps = np.swapaxes(np.asarray(lp["w_gate_exps"]), 1, 2)  # (X, FF, E)
    u_exps = np.swapaxes(np.asarray(lp["w_up_exps"]), 1, 2)
    d_exps = np.swapaxes(np.asarray(lp["w_down_exps"]), 1, 2)  # (X, E, FF)
    want = moe_ffn_np(h[0], np.asarray(lp["w_gate_inp"]).T, g_exps, u_exps,
                      d_exps, K, cfg.expert_weights_norm)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
