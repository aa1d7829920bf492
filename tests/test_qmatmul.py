"""Fused dequant-matmul: Pallas kernel (interpret mode) vs XLA reference vs
numpy golden dequantize (SURVEY.md §7 step 2)."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.constants import GGMLType
from llama_box_tpu.gguf.quants import dequantize, quantize
from llama_box_tpu.gguf.repack import repack
from llama_box_tpu.ops.qmatmul import (
    QTensor, mm, pack_repacked, q_matmul_pallas, q_matmul_ref,
)

FORMATS = [GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
           GGMLType.Q8_0, GGMLType.Q2_K]


def make_qtensor(fmt, in_dim, out_dim, rng, exact=True):
    """Quantize a random [out, in] GGUF-order tensor; return (QTensor,
    dequantized f32 [in, out]). exact=True stores f32 scales so results
    match the golden dequant bit-for-bit (bf16 scales are the production
    default, tested separately for bounded error)."""
    import os
    w = rng.normal(scale=0.1, size=(out_dim, in_dim)).astype(np.float32)
    raw = quantize(fmt, w.reshape(-1))
    golden = dequantize(fmt, raw, (out_dim, in_dim)).reshape(out_dim, in_dim)
    rt = repack(fmt, raw, in_dim * out_dim)
    if exact:
        os.environ["LLAMA_BOX_TPU_Q4_F32SCALES"] = "1"
    try:
        qt = pack_repacked(rt, (in_dim, out_dim))
    finally:
        os.environ.pop("LLAMA_BOX_TPU_Q4_F32SCALES", None) if exact else None
    return qt, golden.T  # [in, out]


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.name)
def test_ref_matches_golden(fmt, rng):
    in_dim, out_dim, B = 128, 64, 4
    qt, wf = make_qtensor(fmt, in_dim, out_dim, rng)
    x = rng.normal(size=(B, in_dim)).astype(np.float32)
    want = x @ wf
    got = np.asarray(q_matmul_ref(jnp.asarray(x), qt))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fmt", [GGMLType.Q4_K, GGMLType.Q6_K,
                                 GGMLType.Q8_0, GGMLType.Q4_0],
                         ids=lambda f: f.name)
def test_pallas_matches_ref(fmt, rng):
    in_dim, out_dim, B = 512, 256, 8
    qt, wf = make_qtensor(fmt, in_dim, out_dim, rng)
    x = rng.normal(size=(B, in_dim)).astype(np.float32)
    want = x @ wf
    got = np.asarray(q_matmul_pallas(jnp.asarray(x, jnp.bfloat16), qt,
                                     interpret=True))
    # kernel computes in bf16 weights/activations with f32 accumulation
    rel = np.abs(got - want) / (np.abs(want) + 1e-2)
    assert rel.mean() < 0.02, rel.mean()


@pytest.mark.parametrize("fmt", [GGMLType.Q4_K],  ids=lambda f: f.name)
def test_pallas_multi_tile(fmt, rng):
    """Shapes spanning several in/out tiles exercise the accumulator."""
    in_dim, out_dim, B = 2048, 512, 8
    qt, wf = make_qtensor(fmt, in_dim, out_dim, rng)
    x = rng.normal(size=(B, in_dim)).astype(np.float32)
    want = x @ wf
    got = np.asarray(q_matmul_pallas(jnp.asarray(x, jnp.bfloat16), qt,
                                     interpret=True))
    rel = np.abs(got - want) / (np.abs(want) + 1e-1)
    assert rel.mean() < 0.02, rel.mean()


def test_mm_dispatch_dense_and_quant(rng):
    in_dim, out_dim = 128, 64
    qt, wf = make_qtensor(GGMLType.Q8_0, in_dim, out_dim, rng)
    x = rng.normal(size=(2, 3, in_dim)).astype(np.float32)
    got = np.asarray(mm(jnp.asarray(x), qt))
    want = x.reshape(-1, in_dim) @ wf
    np.testing.assert_allclose(got.reshape(-1, out_dim), want, rtol=1e-4,
                               atol=1e-4)
    dense = jnp.asarray(wf)
    np.testing.assert_allclose(np.asarray(mm(jnp.asarray(x), dense)),
                               want.reshape(2, 3, out_dim), rtol=1e-4,
                               atol=1e-4)


def test_quantized_model_end_to_end(tmp_path):
    """Load the tiny model with quantized-resident weights; forward must be
    close to the dense dequantized load (identical math modulo f32 assoc)."""
    import jax.numpy as jnp
    from llama_box_tpu.models import load_model
    from llama_box_tpu.models.llama import forward, init_kv_cache, make_rope
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny_q.gguf")
    write_tiny_model(path, quant=GGMLType.Q4_K)
    cfg, dense = load_model(path, dtype=jnp.float32)
    cfg2, qparams = load_model(path, dtype=jnp.float32, quantized=True)
    assert isinstance(qparams["layers"]["wq"], QTensor)
    assert qparams["layers"]["wq"].w8a8   # W8A8 residency is the default

    rng = np.random.default_rng(0)
    toks = rng.integers(3, 200, size=(1, 7)).astype(np.int32)
    pos = np.arange(7, dtype=np.int32)[None, :]
    lens = np.array([7], np.int32)
    cos, sin = make_rope(cfg, 16)

    l1, _ = forward(dense, cfg, toks, pos,
                    init_kv_cache(cfg, 1, 16, jnp.float32), lens, cos, sin)
    l2, _ = forward(qparams, cfg2, toks, pos,
                    init_kv_cache(cfg2, 1, 16, jnp.float32), lens, cos, sin)
    # W8A8 adds per-row activation quantization error (~1/127 relative)
    # on top of the Q4_K weight error; compare on an absolute scale
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=0.05)
    # top-1 agreement: quantization must not flip the argmax here
    assert np.asarray(l1)[0, -1].argmax() == np.asarray(l2)[0, -1].argmax()


def test_bf16_scales_bounded_error(rng, monkeypatch):
    """Packed-nibble mode (bf16 scales): the extra error is a small
    fraction of the 4-bit quantization error itself."""
    import jax.numpy as jnp_
    monkeypatch.setenv("LLAMA_BOX_TPU_PACKED4", "1")
    in_dim, out_dim = 256, 128
    w_true = rng.normal(scale=0.1, size=(out_dim, in_dim)).astype(np.float32)
    raw = quantize(GGMLType.Q4_K, w_true.reshape(-1))
    golden = dequantize(GGMLType.Q4_K, raw, (out_dim, in_dim)).T  # [in,out]
    rt = repack(GGMLType.Q4_K, raw, in_dim * out_dim)
    qt = pack_repacked(rt, (in_dim, out_dim))
    assert qt.scales.dtype == jnp_.bfloat16

    x = rng.normal(size=(4, in_dim)).astype(np.float32)
    exact = x @ w_true.T.astype(np.float32).T if False else x @ w_true.T
    quant = x @ golden
    bf16s = np.asarray(q_matmul_ref(jnp.asarray(x), qt))
    err_quant = np.abs(quant - exact).mean()
    err_scales = np.abs(bf16s - quant).mean()
    assert err_scales < 0.35 * err_quant, (err_scales, err_quant)


def test_w8a8_bounded_error(rng):
    """W8A8 (default residency): per-column weight requant + per-row
    activation quant stays within a small multiple of the Q4_K error."""
    from llama_box_tpu.ops.qmatmul import pack_w8a8, q_matmul_ref
    import jax.numpy as jnp_
    in_dim, out_dim = 256, 128
    w_true = rng.normal(scale=0.1, size=(out_dim, in_dim)).astype(np.float32)
    raw = quantize(GGMLType.Q4_K, w_true.reshape(-1))
    golden = dequantize(GGMLType.Q4_K, raw, (out_dim, in_dim)).T  # [in,out]
    rt = repack(GGMLType.Q4_K, raw, in_dim * out_dim)
    qt = pack_w8a8(rt, (in_dim, out_dim))
    assert qt.w8a8 and qt.qs.dtype == jnp_.int8
    # weight-only error: per-column int8 on top of exact Q4_K dequant
    wf = np.asarray(qt.qs, np.float32) * np.asarray(qt.scales)[None, :]
    err_w8 = np.abs(wf - golden).max()
    err_q4 = np.abs(golden - w_true.T).max()
    assert err_w8 < 0.35 * err_q4
    # matmul path (activation quant included) vs exact dequant matmul
    x = rng.normal(size=(4, in_dim)).astype(np.float32)
    got = np.asarray(q_matmul_ref(jnp_.asarray(x), qt))
    want = x @ golden
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.02


def test_smalls_bundle_identity():
    """fuse_projections bundles the per-layer norm weights + w8a8 scale
    rows (loader._bundle_smalls); forward results are bit-identical to
    the unbundled params."""
    import numpy as np
    import jax.numpy as jnp

    from bench import make_q4_params
    from llama_box_tpu.models.config import ModelConfig
    from llama_box_tpu.models.llama import (forward_impl, init_kv_cache,
                                            make_rope)
    from llama_box_tpu.models.loader import fuse_projections

    L, H, HKV, D, FF, V = 3, 4, 2, 16, 96, 128
    E = H * D
    cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                      n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                      rope_dim=D)
    rng = np.random.default_rng(0)
    params = make_q4_params(rng, L, E, H, HKV, D, FF, V, w8a8=True)
    fused = fuse_projections(params, cfg)
    assert "smalls_all" in fused["layers"]
    # one f32 bundle of 1024-aligned segments, [L, W//128, 128]
    assert fused["layers"]["smalls_all"].shape[-1] == 128
    unbundled = dict(fused)
    unbundled["layers"] = {k: v for k, v in fused["layers"].items()
                           if not k.startswith("smalls_")}

    cos, sin = make_rope(cfg, 64)
    toks = jnp.asarray(rng.integers(0, V, (2, 4)), jnp.int32)
    pos = jnp.asarray([[0, 1, 2, 3]] * 2, jnp.int32)
    lens = jnp.asarray([4, 4], jnp.int32)

    def run(p):
        kv = init_kv_cache(cfg, 2, 64, jnp.bfloat16)
        logits, kv = forward_impl(p, cfg, toks, pos, kv, lens, cos, sin)
        return np.asarray(logits), np.asarray(kv.k)

    l1, k1 = run(fused)
    l2, k2 = run(unbundled)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(k1, k2)
