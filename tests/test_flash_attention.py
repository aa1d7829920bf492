"""Flash-attention prefill kernel vs the XLA reference (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.ops.attention import attention_ref
from llama_box_tpu.ops.flash_attention import flash_attention_prefill


def ref(q, k, v, q_pos0, swa=0, softcap=0.0):
    """q: [Hkv, G, T, D]; k,v: [Hkv, C, D] -> [Hkv, G, T, D]."""
    Hkv, G, T, D = q.shape
    C = k.shape[1]
    qq = np.transpose(q, (2, 0, 1, 3)).reshape(1, T, Hkv * G, D)
    kk = np.transpose(k, (1, 0, 2)).reshape(1, C, Hkv, D)
    vv = np.transpose(v, (1, 0, 2)).reshape(1, C, Hkv, D)
    qpos = q_pos0 + np.arange(T)[:, None]
    kpos = np.arange(C)[None, :]
    mask = kpos <= qpos
    if swa > 0:
        mask &= kpos > qpos - swa
    out = attention_ref(jnp.asarray(qq), jnp.asarray(kk), jnp.asarray(vv),
                        jnp.asarray(mask[None, None]), logit_softcap=softcap)
    out = np.asarray(out)[0].reshape(T, Hkv, G, D)
    return np.transpose(out, (1, 2, 0, 3))


@pytest.mark.parametrize("swa,softcap", [(0, 0.0), (32, 0.0), (0, 30.0)])
def test_flash_matches_reference(swa, softcap, rng):
    Hkv, G, T, D, C = 2, 2, 128, 64, 512
    q = rng.normal(size=(Hkv, G, T, D)).astype(np.float32)
    k = rng.normal(size=(Hkv, C, D)).astype(np.float32)
    v = rng.normal(size=(Hkv, C, D)).astype(np.float32)
    q_pos0 = 200  # chunk starts mid-cache

    got = np.asarray(flash_attention_prefill(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), q_pos0,
        swa=swa, softcap=softcap, bq=64, bc=128, interpret=True))
    want = ref(q, k, v, q_pos0, swa=swa, softcap=softcap)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_uneven_blocks(rng):
    """T/C that don't divide the default block sizes fall back to smaller
    powers of two."""
    Hkv, G, T, D, C = 1, 4, 96, 32, 160
    q = rng.normal(size=(Hkv, G, T, D)).astype(np.float32)
    k = rng.normal(size=(Hkv, C, D)).astype(np.float32)
    v = rng.normal(size=(Hkv, C, D)).astype(np.float32)
    got = np.asarray(flash_attention_prefill(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 60,
        interpret=True))
    want = ref(q, k, v, 60)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_prefill_uses_flash_and_matches(rng):
    """A >=64-token prefill (flash path) must match the batched forward
    (einsum path) on the tiny model."""
    import jax.numpy as jnp
    from llama_box_tpu.models import load_model
    from llama_box_tpu.models.llama import forward, init_kv_cache, make_rope, prefill
    from llama_box_tpu.gguf import GGUFFile
    from .fixtures.make_tiny_model import write_tiny_model
    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    cos, sin = make_rope(cfg, 128)
    T = 80
    toks = rng.integers(3, 200, size=T).astype(np.int32)

    kv_a = init_kv_cache(cfg, 1, 128, dtype=jnp.float32)
    ref_logits, _ = forward(params, cfg, toks[None, :],
                            np.arange(T, dtype=np.int32)[None, :], kv_a,
                            np.array([T], np.int32), cos, sin)

    kv_b = init_kv_cache(cfg, 1, 128, dtype=jnp.float32)
    padded = np.zeros(128, np.int32)
    padded[:T] = toks
    last, _ = prefill(params, cfg, jnp.asarray(padded), kv_b,
                      jnp.int32(0), jnp.int32(0), jnp.int32(T), cos, sin)
    # flash computes in bf16 q/k/v with f32 accumulation
    a = np.asarray(last)
    b = np.asarray(ref_logits[0, -1])
    assert np.abs(a - b).mean() / (np.abs(b).mean() + 1e-6) < 0.02
