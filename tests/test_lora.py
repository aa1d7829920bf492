"""LoRA adapter load + merge (reference §2.1 #22): merged weights shift the
forward exactly by scale*alpha/r * B@A."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.constants import GGMLType
from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models import load_model
from llama_box_tpu.models.lora import apply_lora, load_lora

from .fixtures import make_tiny_model as mtm


def write_tiny_lora(path, rng, rank=4, alpha=8.0):
    E = mtm.N_EMBD
    w = GGUFWriter(path, architecture="llama")
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("general.name", "tiny-lora")
    w.add_kv("adapter.lora.alpha", alpha)
    A = (rng.standard_normal((rank, E)) * 0.05).astype(np.float32)
    B = (rng.standard_normal((E, rank)) * 0.05).astype(np.float32)
    w.add_tensor("blk.0.attn_q.weight.lora_a", A)
    w.add_tensor("blk.0.attn_q.weight.lora_b", B)
    w.write()
    return A, B


def test_lora_merge_shifts_weights(tmp_path):
    rng = np.random.default_rng(0)
    mpath = str(tmp_path / "m.gguf")
    lpath = str(tmp_path / "l.gguf")
    mtm.write_tiny_model(mpath)
    A, B = write_tiny_lora(lpath, rng, rank=4, alpha=8.0)

    cfg, params = load_model(mpath, dtype=jnp.float32)
    before = np.asarray(params["layers"]["wq"][0]).copy()
    ad = load_lora(lpath, scale=0.5)
    assert ad.rank == 4 and ad.alpha == 8.0
    params = apply_lora(params, cfg, [ad])
    after = np.asarray(params["layers"]["wq"][0])
    want = before + 0.5 * (8.0 / 4) * (B @ A).T
    np.testing.assert_allclose(after, want, rtol=1e-5, atol=1e-6)


def test_lora_rejects_non_adapter(tmp_path):
    mpath = str(tmp_path / "m.gguf")
    mtm.write_tiny_model(mpath)
    with pytest.raises(ValueError):
        load_lora(mpath)


def test_dynamic_lora_per_slot_scales(tmp_path):
    """Unmerged adapters with per-slot scale rows: scale 0 == base model;
    scale s == merged model (within fp tolerance)."""
    import jax.numpy as jnp
    from llama_box_tpu.models.llama import forward, init_kv_cache, make_rope
    from llama_box_tpu.models.lora import stack_dynamic

    rng = np.random.default_rng(4)
    mpath = str(tmp_path / "m.gguf")
    lpath = str(tmp_path / "l.gguf")
    mtm.write_tiny_model(mpath)
    A, B = write_tiny_lora(lpath, rng, rank=4, alpha=8.0)

    cfg, params = load_model(mpath, dtype=jnp.float32)
    cfg2, merged = load_model(mpath, dtype=jnp.float32)
    ad = load_lora(lpath, scale=0.7)
    merged = apply_lora(merged, cfg2, [ad])

    n = stack_dynamic(params, cfg, [ad])
    assert n == 1
    assert "lora_A_wq" in params["layers"]

    toks = rng.integers(3, 200, size=(2, 5)).astype(np.int32)
    pos = np.tile(np.arange(5, dtype=np.int32), (2, 1))
    lens = np.array([5, 5], np.int32)
    cos, sin = make_rope(cfg, 16)

    # slot 0 scale 0.7 (matches merged), slot 1 scale 0 (matches base)
    params["lora_scales"] = jnp.asarray([[0.7], [0.0]], jnp.float32)
    got, _ = forward(params, cfg, toks, pos,
                     init_kv_cache(cfg, 2, 16, jnp.float32), lens, cos, sin)

    base_params = load_model(mpath, dtype=jnp.float32)[1]
    want_base, _ = forward(base_params, cfg, toks, pos,
                           init_kv_cache(cfg, 2, 16, jnp.float32), lens,
                           cos, sin)
    want_merged, _ = forward(merged, cfg2, toks, pos,
                             init_kv_cache(cfg2, 2, 16, jnp.float32), lens,
                             cos, sin)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want_base[1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want_merged[0]),
                               rtol=1e-3, atol=1e-4)
