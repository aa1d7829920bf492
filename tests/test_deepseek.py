"""DeepSeek2 MLA + heterogeneous (dense/MoE) layer support: fixture loads,
prefill == token-by-token decode (validates the MLA cache/rope layout),
first-token determinism through the engine."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models import load_model
from llama_box_tpu.models.llama import forward, init_kv_cache, make_rope

E, H, ROPE, NOPE, DV, QLORA, KVLORA = 32, 4, 8, 8, 12, 24, 16
DK = ROPE + NOPE
FF, X, K_EXP, VOCAB, LAYERS = 48, 4, 2, 64, 3  # layer 0 dense, 1-2 MoE


def write_tiny_deepseek(path, seed=0, q_lora=True):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="deepseek2")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.08).astype(np.float32)

    w.add_kv("deepseek2.block_count", LAYERS)
    w.add_kv("deepseek2.context_length", 128)
    w.add_kv("deepseek2.embedding_length", E)
    w.add_kv("deepseek2.feed_forward_length", FF)
    w.add_kv("deepseek2.attention.head_count", H)
    w.add_kv("deepseek2.attention.head_count_kv", H)
    w.add_kv("deepseek2.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv("deepseek2.attention.key_length", DK)
    w.add_kv("deepseek2.attention.value_length", DV)
    w.add_kv("deepseek2.attention.q_lora_rank", QLORA if q_lora else 0)
    w.add_kv("deepseek2.attention.kv_lora_rank", KVLORA)
    w.add_kv("deepseek2.rope.dimension_count", ROPE)
    w.add_kv("deepseek2.rope.freq_base", 10000.0)
    w.add_kv("deepseek2.expert_count", X)
    w.add_kv("deepseek2.expert_used_count", K_EXP)
    w.add_kv("deepseek2.expert_weights_scale", 2.0)
    w.add_kv("deepseek2.expert_weights_norm", False)
    w.add_kv("deepseek2.vocab_size", VOCAB)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(VOCAB)])
    w.add_kv("tokenizer.ggml.scores", np.zeros(VOCAB, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.ones(VOCAB, np.int32))

    w.add_tensor("token_embd.weight", rand(VOCAB, E))
    w.add_tensor("output_norm.weight", np.ones(E, np.float32))
    w.add_tensor("output.weight", rand(VOCAB, E))
    for i in range(LAYERS):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(E, np.float32))
        if q_lora:
            w.add_tensor(p + "attn_q_a.weight", rand(QLORA, E))
            w.add_tensor(p + "attn_q_a_norm.weight", np.ones(QLORA,
                                                             np.float32))
            w.add_tensor(p + "attn_q_b.weight", rand(H * DK, QLORA))
        else:
            w.add_tensor(p + "attn_q.weight", rand(H * DK, E))
        w.add_tensor(p + "attn_kv_a_mqa.weight", rand(KVLORA + ROPE, E))
        w.add_tensor(p + "attn_kv_a_norm.weight", np.ones(KVLORA, np.float32))
        w.add_tensor(p + "attn_kv_b.weight", rand(H * (NOPE + DV), KVLORA))
        w.add_tensor(p + "attn_output.weight", rand(E, H * DV))
        w.add_tensor(p + "ffn_norm.weight", np.ones(E, np.float32))
        if i == 0:  # leading dense layer
            w.add_tensor(p + "ffn_gate.weight", rand(FF, E))
            w.add_tensor(p + "ffn_up.weight", rand(FF, E))
            w.add_tensor(p + "ffn_down.weight", rand(E, FF))
        else:       # MoE + shared expert
            w.add_tensor(p + "ffn_gate_inp.weight", rand(X, E))
            w.add_tensor(p + "ffn_gate_exps.weight", rand(X, FF, E))
            w.add_tensor(p + "ffn_up_exps.weight", rand(X, FF, E))
            w.add_tensor(p + "ffn_down_exps.weight", rand(X, E, FF))
            w.add_tensor(p + "ffn_gate_shexp.weight", rand(FF, E))
            w.add_tensor(p + "ffn_up_shexp.weight", rand(FF, E))
            w.add_tensor(p + "ffn_down_shexp.weight", rand(E, FF))
    w.write()


@pytest.mark.parametrize("q_lora", [True, False])
def test_deepseek_loads_and_runs(tmp_path, q_lora):
    path = str(tmp_path / "ds.gguf")
    write_tiny_deepseek(path, q_lora=q_lora)
    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.kv_lora_rank == KVLORA
    assert cfg.head_dim == DK and cfg.v_head_dim == DV
    assert "layer_groups" in params  # dense + MoE heterogeneity
    assert len(params["layer_groups"]) == 2

    toks = np.random.default_rng(1).integers(0, VOCAB, size=(1, 6)) \
        .astype(np.int32)
    cos, sin = make_rope(cfg, 32)
    kv = init_kv_cache(cfg, 1, 32, jnp.float32)
    assert kv.k.shape[-1] == DK and kv.v.shape[-1] == DV
    logits, _ = forward(params, cfg, toks,
                        np.arange(6, dtype=np.int32)[None, :], kv,
                        np.array([6], np.int32), cos, sin)
    assert np.isfinite(np.asarray(logits)).all()
    assert logits.shape == (1, 6, VOCAB)


def test_deepseek_prefill_decode_consistency(tmp_path):
    """Token-by-token decode must equal one prefill pass — the strongest
    check that the MLA cache layout + rope-first reordering is coherent."""
    path = str(tmp_path / "ds.gguf")
    write_tiny_deepseek(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    T = 7
    toks = rng.integers(0, VOCAB, size=T).astype(np.int32)
    cos, sin = make_rope(cfg, 32)

    kv = init_kv_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, toks[None, :],
                      np.arange(T, dtype=np.int32)[None, :], kv,
                      np.array([T], np.int32), cos, sin)

    kv = init_kv_cache(cfg, 1, 32, jnp.float32)
    steps = []
    for t in range(T):
        lg, kv = forward(params, cfg, toks[t:t + 1][None, :],
                         np.array([[t]], np.int32), kv,
                         np.array([1], np.int32), cos, sin)
        steps.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(steps), np.asarray(full[0]),
                               rtol=2e-3, atol=2e-4)
