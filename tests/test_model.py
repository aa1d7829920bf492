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
