"""Quant codec tests: quantize→dequantize round trips must reconstruct within
the format's theoretical error bound, and hand-constructed bit patterns must
dequantize exactly per the GGML block-format spec."""

import numpy as np
import pytest

from llama_box_tpu.gguf.constants import GGMLType
from llama_box_tpu.gguf import quants

RT_TYPES = [
    (GGMLType.Q4_0, 0.10),
    (GGMLType.Q4_1, 0.06),
    (GGMLType.Q5_0, 0.05),
    (GGMLType.Q5_1, 0.03),
    (GGMLType.Q8_0, 0.006),
    (GGMLType.Q2_K, 0.30),
    (GGMLType.Q3_K, 0.18),
    (GGMLType.Q4_K, 0.06),
    (GGMLType.Q5_K, 0.03),
    (GGMLType.Q6_K, 0.02),
    (GGMLType.IQ4_NL, 0.10),
]


@pytest.mark.parametrize("gtype,tol", RT_TYPES)
def test_roundtrip(gtype, tol, rng):
    n = 256 * 8
    x = rng.standard_normal(n).astype(np.float32)
    raw = quants.quantize(gtype, x)
    y = quants.dequantize(gtype, raw, (n,))
    scale = np.abs(x).max()
    err = np.abs(x - y).max() / scale
    assert err < tol, f"{gtype.name}: max rel err {err:.4f} >= {tol}"


@pytest.mark.parametrize("gtype,tol", RT_TYPES)
def test_roundtrip_extreme_values(gtype, tol, rng):
    n = 512
    x = (rng.standard_normal(n) * 100.0).astype(np.float32)
    x[::37] = 0.0
    raw = quants.quantize(gtype, x)
    y = quants.dequantize(gtype, raw, (n,))
    err = np.abs(x - y).max() / np.abs(x).max()
    assert err < tol * 1.5


def test_zeros_roundtrip(rng):
    for gtype, _ in RT_TYPES:
        x = np.zeros(256, dtype=np.float32)
        y = quants.dequantize(gtype, quants.quantize(gtype, x), (256,))
        np.testing.assert_allclose(y, 0.0, atol=1e-6)


def test_q8_0_exact():
    # Hand-constructed block: d=1.0, qs = -4..27
    import struct
    d = np.float16(1.0).tobytes()
    qs = np.arange(-4, 28, dtype=np.int8).tobytes()
    out = quants.dequantize_q8_0(d + qs, 32)
    np.testing.assert_allclose(out, np.arange(-4, 28, dtype=np.float32))


def test_q4_0_exact():
    # d=2.0; qs nibble j -> elements j (lo) and j+16 (hi); value=(q-8)*d
    d = np.float16(2.0).tobytes()
    qs = bytes([(0x1 | (0xF << 4))] * 16)  # lo=1 -> -14, hi=15 -> +14
    out = quants.dequantize_q4_0(d + qs, 32)
    np.testing.assert_allclose(out[:16], -14.0)
    np.testing.assert_allclose(out[16:], 14.0)


def test_q4_1_exact():
    d = np.float16(1.0).tobytes()
    m = np.float16(5.0).tobytes()
    qs = bytes([0x30 | 0x2] * 16)  # lo=2 -> 7, hi=3 -> 8
    out = quants.dequantize_q4_1(d + m + qs, 32)
    np.testing.assert_allclose(out[:16], 7.0)
    np.testing.assert_allclose(out[16:], 8.0)


def test_f16_bf16_f32():
    x = np.array([1.5, -2.25, 0.0, 1e4], dtype=np.float32)
    np.testing.assert_allclose(quants.dequantize_f32(x.tobytes(), 4), x)
    np.testing.assert_allclose(quants.dequantize_f16(x.astype(np.float16).tobytes(), 4), x)
    bf = (x.view(np.uint32) >> 16).astype(np.uint16).tobytes()
    np.testing.assert_allclose(quants.dequantize_bf16(bf, 4), x, rtol=0.01)


def test_iq4_nl_codebook():
    # index 8 -> value 1; d = 3.0 -> 3.0
    d = np.float16(3.0).tobytes()
    qs = bytes([0x88] * 16)
    out = quants.dequantize_iq4_nl(d + qs, 32)
    np.testing.assert_allclose(out, 3.0)


def test_block_sizes_match_payload(rng):
    from llama_box_tpu.gguf.constants import GGML_BLOCK_SIZES
    for gtype, _ in RT_TYPES:
        blk, nbytes = GGML_BLOCK_SIZES[gtype]
        x = rng.standard_normal(blk * 3).astype(np.float32)
        raw = quants.quantize(gtype, x)
        assert len(raw) == 3 * nbytes, gtype.name
