"""Golden tests: JAX Llama forward vs independent numpy reference, and
prefill/decode consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.models import load_model
from llama_box_tpu.models.llama import forward, init_kv_cache, make_rope
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_model import write_tiny_model
from .reference_impl import llama_forward_np


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        weights = {name: g.tensor_f32(name) for name in g.tensors}
        tok = Tokenizer.from_gguf(g)
    return cfg, params, weights, tok


def test_forward_matches_numpy_reference(tiny_model):
    cfg, params, weights, tok = tiny_model
    tokens = np.array([1, 5, 99, 200, 7, 42], dtype=np.int32)
    T = len(tokens)

    ref_logits = llama_forward_np(weights, cfg, tokens)

    cos, sin = make_rope(cfg, 128)
    kv = init_kv_cache(cfg, 1, 128, dtype=jnp.float32)
    logits, kv = forward(
        params, cfg, tokens[None, :], np.arange(T, dtype=np.int32)[None, :],
        kv, np.array([T], dtype=np.int32), cos, sin)
    got = np.asarray(logits[0])

    np.testing.assert_allclose(got, ref_logits, rtol=2e-3, atol=2e-4)


def test_prefill_decode_consistency(tiny_model):
    """Decoding token-by-token must match a single prefill pass."""
    cfg, params, _, tok = tiny_model
    tokens = np.array([1, 10, 20, 30, 40], dtype=np.int32)
    T = len(tokens)
    cos, sin = make_rope(cfg, 64)

    kv = init_kv_cache(cfg, 1, 64, dtype=jnp.float32)
    full_logits, _ = forward(params, cfg, tokens[None, :],
                             np.arange(T, dtype=np.int32)[None, :], kv,
                             np.array([T], np.int32), cos, sin)

    kv = init_kv_cache(cfg, 1, 64, dtype=jnp.float32)
    step_logits = []
    for t in range(T):
        lg, kv = forward(params, cfg, tokens[t:t + 1][None, :],
                         np.array([[t]], np.int32), kv,
                         np.array([1], np.int32), cos, sin)
        step_logits.append(np.asarray(lg[0, 0]))

    np.testing.assert_allclose(np.stack(step_logits), np.asarray(full_logits[0]),
                               rtol=2e-3, atol=2e-4)


def test_padded_batch_matches_single(tiny_model):
    """Slot padding must not change another slot's logits."""
    cfg, params, _, _ = tiny_model
    cos, sin = make_rope(cfg, 64)
    toks = np.array([1, 7, 8], dtype=np.int32)

    kv1 = init_kv_cache(cfg, 1, 64, dtype=jnp.float32)
    single, _ = forward(params, cfg, toks[None, :],
                        np.arange(3, dtype=np.int32)[None, :], kv1,
                        np.array([3], np.int32), cos, sin)

    kv2 = init_kv_cache(cfg, 2, 64, dtype=jnp.float32)
    batch_tokens = np.stack([toks, np.zeros(3, np.int32)])
    batch_pos = np.stack([np.arange(3, dtype=np.int32), np.zeros(3, np.int32)])
    batched, _ = forward(params, cfg, batch_tokens, batch_pos, kv2,
                         np.array([3, 0], np.int32), cos, sin)

    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single[0]),
                               rtol=1e-4, atol=1e-5)


def test_quantized_model_loads_and_runs(tmp_path):
    from llama_box_tpu.gguf.constants import GGMLType
    path = str(tmp_path / "q4.gguf")
    write_tiny_model(path, quant=GGMLType.Q4_K)
    cfg, params = load_model(path, dtype=jnp.bfloat16)
    cos, sin = make_rope(cfg, 32)
    kv = init_kv_cache(cfg, 1, 32)
    tokens = np.array([[1, 5, 9]], dtype=np.int32)
    logits, _ = forward(params, cfg, tokens, np.arange(3, dtype=np.int32)[None, :],
                        kv, np.array([3], np.int32), cos, sin)
    assert np.isfinite(np.asarray(logits)).all()
    assert logits.shape == (1, 3, cfg.vocab_size)


def test_prefill_slot_matches_forward(tiny_model):
    """Bucketed single-slot prefill must produce the same KV + last logits as
    the batched forward program."""
    from llama_box_tpu.models.llama import prefill
    cfg, params, weights, tok = tiny_model
    rng = np.random.default_rng(7)
    toks = rng.integers(3, 50, size=9).astype(np.int32)
    cos, sin = make_rope(cfg, 64)

    kv_a = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    ref_logits, kv_a = forward(
        params, cfg, toks[None, :], np.arange(9, dtype=np.int32)[None, :],
        kv_a, np.array([9], np.int32), cos, sin)

    kv_b = init_kv_cache(cfg, 3, 16, dtype=jnp.float32)
    # pad chunk to bucket 16, prefill into slot 1
    padded = np.zeros(16, np.int32)
    padded[:9] = toks
    last, kv_b = prefill(params, cfg, jnp.asarray(padded), kv_b,
                         jnp.int32(1), jnp.int32(0), jnp.int32(9), cos, sin)
    np.testing.assert_allclose(np.asarray(last), np.asarray(ref_logits[0, -1]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kv_b.k[:, 1, :9]),
                               np.asarray(kv_a.k[:, 0, :9]), rtol=1e-5, atol=1e-5)
    # other slots untouched
    assert np.abs(np.asarray(kv_b.k[:, 0])).max() == 0


def test_shift_kv_matches_reprefill(tiny_model):
    """Context shift (drop+compact+re-rotate) must equal prefilling the
    truncated token sequence from scratch."""
    from llama_box_tpu.models.llama import make_delta_rope, prefill, shift_kv
    cfg, params, weights, tok = tiny_model
    rng = np.random.default_rng(8)
    toks = rng.integers(3, 50, size=12).astype(np.int32)
    cos, sin = make_rope(cfg, 64)
    dcos, dsin = make_delta_rope(cfg, 64)

    n_keep, n_discard = 2, 4
    kept = np.concatenate([toks[:n_keep], toks[n_keep + n_discard:]])

    kv = init_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    pad = np.zeros(16, np.int32)
    pad[:12] = toks
    _, kv = prefill(params, cfg, jnp.asarray(pad), kv, jnp.int32(0),
                    jnp.int32(0), jnp.int32(12), cos, sin)
    kv = shift_kv(kv, jnp.int32(0), jnp.int32(n_keep), jnp.int32(n_discard),
                  dcos, dsin, cfg.rope_mode)

    kv_ref = init_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    pad2 = np.zeros(16, np.int32)
    pad2[:len(kept)] = kept
    _, kv_ref = prefill(params, cfg, jnp.asarray(pad2), kv_ref, jnp.int32(0),
                        jnp.int32(0), jnp.int32(len(kept)), cos, sin)

    n = len(kept)
    # keys for the kept prefix are exact; shifted ones only differ in that the
    # hidden states came from the full (unshifted) context — compare K rotation
    np.testing.assert_allclose(np.asarray(kv.k[:, 0, :n_keep]),
                               np.asarray(kv_ref.k[:, 0, :n_keep]),
                               rtol=1e-5, atol=1e-5)
    # the first layer's K depends only on token embeddings + position, so the
    # re-rotated keys must match the re-prefilled ones exactly there
    np.testing.assert_allclose(np.asarray(kv.k[0, 0, :n]),
                               np.asarray(kv_ref.k[0, 0, :n]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(kv.v[0, 0, :n]),
                               np.asarray(kv_ref.v[0, 0, :n]),
                               rtol=1e-5, atol=1e-5)


def test_int8_kv_cache_close_to_dense(tiny_model):
    """INT8 KV (per-token-head scales) must track the f32-KV forward."""
    import jax.numpy as jnp
    from llama_box_tpu.models.llama import forward, init_kv_cache, make_rope
    cfg, params, weights, tok = tiny_model
    rng = np.random.default_rng(11)
    toks = rng.integers(3, 200, size=(2, 6)).astype(np.int32)
    pos = np.tile(np.arange(6, dtype=np.int32), (2, 1))
    lens = np.array([6, 6], np.int32)
    cos, sin = make_rope(cfg, 16)

    l1, kv1 = forward(params, cfg, toks, pos,
                      init_kv_cache(cfg, 2, 16, jnp.float32), lens, cos, sin)
    l2, kv2 = forward(params, cfg, toks, pos,
                      init_kv_cache(cfg, 2, 16, jnp.int8), lens, cos, sin)
    assert kv2.quantized and kv2.k.dtype == jnp.int8
    a = np.asarray(l1)[:, -1]
    b = np.asarray(l2)[:, -1]
    # int8 kv: small relative error on logits
    assert np.abs(a - b).mean() / (np.abs(a).mean() + 1e-6) < 0.05
    # decode continues correctly from the quantized cache
    nt = np.array([[5], [7]], np.int32)
    npos = np.full((2, 1), 6, np.int32)
    l3, _ = forward(params, cfg, nt, npos, kv2, np.array([1, 1], np.int32),
                    cos, sin)
    assert np.isfinite(np.asarray(l3)).all()


def test_fused_qkv_split(tmp_path):
    """phi3-style fused attn_qkv tensors load into separate wq/wk/wv."""
    from llama_box_tpu.gguf.writer import GGUFWriter
    rng = np.random.default_rng(0)
    E, H, HKV, D, FF, V = 32, 4, 2, 8, 64, 64
    path = str(tmp_path / "phi.gguf")
    w = GGUFWriter(path, architecture="phi3")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_kv("phi3.block_count", 1)
    w.add_kv("phi3.context_length", 64)
    w.add_kv("phi3.embedding_length", E)
    w.add_kv("phi3.feed_forward_length", FF)
    w.add_kv("phi3.attention.head_count", H)
    w.add_kv("phi3.attention.head_count_kv", HKV)
    w.add_kv("phi3.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("phi3.rope.dimension_count", D)
    w.add_kv("phi3.vocab_size", V)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(V)])
    w.add_kv("tokenizer.ggml.scores", np.zeros(V, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.ones(V, np.int32))
    w.add_tensor("token_embd.weight", rand(V, E))
    w.add_tensor("output_norm.weight", np.ones(E, np.float32))
    w.add_tensor("output.weight", rand(V, E))
    w.add_tensor("blk.0.attn_norm.weight", np.ones(E, np.float32))
    qkv = rand(H * D + 2 * HKV * D, E)
    w.add_tensor("blk.0.attn_qkv.weight", qkv)
    w.add_tensor("blk.0.attn_output.weight", rand(E, H * D))
    w.add_tensor("blk.0.ffn_norm.weight", np.ones(E, np.float32))
    w.add_tensor("blk.0.ffn_gate.weight", rand(FF, E))
    w.add_tensor("blk.0.ffn_up.weight", rand(FF, E))
    w.add_tensor("blk.0.ffn_down.weight", rand(E, FF))
    w.write()

    cfg, params = load_model(path, dtype=jnp.float32)
    assert params["layers"]["wq"].shape == (1, E, H * D)
    assert params["layers"]["wk"].shape == (1, E, HKV * D)
    np.testing.assert_allclose(np.asarray(params["layers"]["wq"][0]),
                               qkv[: H * D].T, rtol=1e-6)
    cos, sin = make_rope(cfg, 32)
    toks = np.array([[1, 2, 3]], np.int32)
    logits, _ = forward(params, cfg, toks,
                        np.arange(3, dtype=np.int32)[None, :],
                        init_kv_cache(cfg, 1, 32, jnp.float32),
                        np.array([3], np.int32), cos, sin)
    assert np.isfinite(np.asarray(logits)).all()
