"""Llama 4 family: nope layers (no rope + temperature tuning), chunked
attention, weightless QK L2 norm, interleaved dense/MoE layers with
input-weighted routing."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models import load_model
from llama_box_tpu.models.llama import (
    _build_mask, _layer_is_local, forward, init_kv_cache, make_rope,
)

E, FF, LAYERS, HEADS, KV_HEADS, HEAD_DIM, VOCAB, X = 32, 64, 4, 4, 2, 8, 96, 4


def write_tiny_llama4(path, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="llama4")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_kv("llama4.block_count", LAYERS)
    w.add_kv("llama4.context_length", 128)
    w.add_kv("llama4.embedding_length", E)
    w.add_kv("llama4.feed_forward_length", FF)
    w.add_kv("llama4.attention.head_count", HEADS)
    w.add_kv("llama4.attention.head_count_kv", KV_HEADS)
    w.add_kv("llama4.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("llama4.rope.freq_base", 500000.0)
    w.add_kv("llama4.rope.dimension_count", HEAD_DIM)
    w.add_kv("llama4.vocab_size", VOCAB)
    w.add_kv("llama4.expert_count", X)
    w.add_kv("llama4.expert_used_count", 1)
    w.add_kv("llama4.attention.no_rope_layer_step", 2)
    w.add_kv("llama4.attention.chunk_size", 8)
    w.add_kv("llama4.attention.temperature_scale", 0.1)
    w.add_kv("llama4.attention.floor_scale", 4.0)
    w.add_kv("tokenizer.ggml.model", "llama")
    toks = ["<pad>", "<s>", "</s>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    w.add_kv("tokenizer.ggml.tokens", toks)
    w.add_kv("tokenizer.ggml.scores", np.zeros(VOCAB, np.float32))
    w.add_kv("tokenizer.ggml.token_type",
             np.array([2, 3, 3] + [1] * (VOCAB - 3), np.int32))

    w.add_tensor("token_embd.weight", rand(VOCAB, E))
    w.add_tensor("output_norm.weight", np.ones(E, np.float32))
    w.add_tensor("output.weight", rand(VOCAB, E))
    for i in range(LAYERS):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(E, np.float32))
        w.add_tensor(p + "attn_q.weight", rand(HEADS * HEAD_DIM, E))
        w.add_tensor(p + "attn_k.weight", rand(KV_HEADS * HEAD_DIM, E))
        w.add_tensor(p + "attn_v.weight", rand(KV_HEADS * HEAD_DIM, E))
        w.add_tensor(p + "attn_output.weight", rand(E, HEADS * HEAD_DIM))
        w.add_tensor(p + "ffn_norm.weight", np.ones(E, np.float32))
        if i % 2 == 1:   # interleaved MoE layers
            w.add_tensor(p + "ffn_gate_inp.weight", rand(X, E))
            w.add_tensor(p + "ffn_gate_exps.weight", rand(X, FF, E))
            w.add_tensor(p + "ffn_up_exps.weight", rand(X, FF, E))
            w.add_tensor(p + "ffn_down_exps.weight", rand(X, E, FF))
            w.add_tensor(p + "ffn_gate_shexp.weight", rand(FF, E))
            w.add_tensor(p + "ffn_up_shexp.weight", rand(FF, E))
            w.add_tensor(p + "ffn_down_shexp.weight", rand(E, FF))
        else:
            w.add_tensor(p + "ffn_gate.weight", rand(FF, E))
            w.add_tensor(p + "ffn_up.weight", rand(FF, E))
            w.add_tensor(p + "ffn_down.weight", rand(E, FF))
    w.write()
    return path


@pytest.fixture(scope="module")
def llama4(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "l4.gguf")
    write_tiny_llama4(path)
    return load_model(path, dtype=jnp.float32)


def test_config_probes(llama4):
    cfg, params = llama4
    assert cfg.arch == "llama4"
    assert cfg.nope_layer_step == 2 and cfg.chunked_window == 8
    assert cfg.qk_l2_norm and cfg.attn_temp_scale == pytest.approx(0.1)
    assert cfg.expert_gating_func == 2 and cfg.moe_weight_before_ffn
    # layers 2 and 4 (1-based) are nope/global
    loc = np.asarray(_layer_is_local(cfg))
    assert loc.tolist() == [1, 0, 1, 0]
    # interleaved dense/MoE -> alternating layer groups
    assert "layer_groups" in params and len(params["layer_groups"]) == 4


def test_chunked_mask(llama4):
    cfg, _ = llama4
    positions = jnp.asarray([[9, 10]], jnp.int32)   # chunk 1 (8..15)
    m = _build_mask(cfg, positions, jnp.asarray([2], jnp.int32), 2, 32)
    assert m.shape == (2, 1, 2, 32)
    mg, ml = np.asarray(m[0][0]), np.asarray(m[1][0])
    # global: plain causal — position 9 sees 0..9
    assert mg[0, :10].all() and not mg[0, 10:].any()
    # chunked: position 9 sees only 8..9 (same 8-aligned chunk)
    assert ml[0, 8:10].all() and not ml[0, :8].any() \
        and not ml[0, 10:].any()


def test_rope_identity_on_nope_layers(llama4):
    cfg, _ = llama4
    cos, sin = make_rope(cfg, 16)
    assert cos.ndim == 3      # stacked [identity, rope]
    np.testing.assert_allclose(np.asarray(cos[0]), 1.0)
    np.testing.assert_allclose(np.asarray(sin[0]), 0.0)
    assert not np.allclose(np.asarray(sin[1]), 0.0)


def test_forward_runs_and_deterministic(llama4):
    cfg, params = llama4
    toks = jnp.asarray([[1, 5, 9, 20, 33, 7]], jnp.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None, :]
    lens = jnp.asarray([6], jnp.int32)
    cos, sin = make_rope(cfg, 32)
    kv = init_kv_cache(cfg, 1, 32, jnp.float32)
    l1, _ = forward(params, cfg, toks, pos, kv, lens, cos, sin)
    kv = init_kv_cache(cfg, 1, 32, jnp.float32)
    l2, _ = forward(params, cfg, toks, pos, kv, lens, cos, sin)
    a = np.asarray(l1)
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, np.asarray(l2))


def test_prefill_matches_decode(llama4):
    """Chunked+nope semantics must be position-consistent: prefilling 6
    tokens equals prefilling 4 then decoding 2."""
    from llama_box_tpu.models.llama import prefill
    cfg, params = llama4
    cos, sin = make_rope(cfg, 32)
    ids = [1, 5, 9, 20, 33, 7]

    kv = init_kv_cache(cfg, 1, 32, jnp.float32)
    lg_full, _ = prefill(params, cfg, jnp.asarray(ids, jnp.int32), kv,
                         jnp.int32(0), jnp.int32(0), jnp.int32(6), cos, sin)

    kv = init_kv_cache(cfg, 1, 32, jnp.float32)
    _, kv = prefill(params, cfg, jnp.asarray(ids[:4], jnp.int32), kv,
                    jnp.int32(0), jnp.int32(0), jnp.int32(4), cos, sin)
    lg = None
    for i, t in enumerate(ids[4:]):
        toks = jnp.asarray([[t]], jnp.int32)
        pos = jnp.asarray([[4 + i]], jnp.int32)
        lg, kv = forward(params, cfg, toks, pos, kv,
                         jnp.asarray([1], jnp.int32), cos, sin)
    np.testing.assert_allclose(np.asarray(lg[0, -1]),
                               np.asarray(lg_full), rtol=2e-4, atol=2e-4)
