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


# -- ternary (TQ1_0 / TQ2_0) -------------------------------------------------

@pytest.mark.parametrize("gtype", [GGMLType.TQ1_0, GGMLType.TQ2_0])
def test_ternary_roundtrip_exact(gtype, rng):
    """Ternary inputs (d * {-1,0,1}) survive the codec bit-exactly."""
    n = 256 * 5
    d = 0.37
    trits = rng.integers(-1, 2, size=n).astype(np.float32)
    x = trits * d
    raw = quants.quantize(gtype, x)
    y = quants.dequantize(gtype, np.frombuffer(raw, np.uint8), (n,))
    np.testing.assert_allclose(y, x, rtol=0, atol=1e-3)
    # sign/zero pattern must be exact (the payload is the ternary pattern)
    np.testing.assert_array_equal(np.sign(y), np.sign(x))


@pytest.mark.parametrize("gtype,tol", [(GGMLType.TQ1_0, 0.51),
                                       (GGMLType.TQ2_0, 0.51)])
def test_ternary_roundtrip_dense(gtype, tol, rng):
    n = 256 * 4
    x = rng.standard_normal(n).astype(np.float32)
    raw = quants.quantize(gtype, x)
    y = quants.dequantize(gtype, np.frombuffer(raw, np.uint8), (n,))
    amax = np.abs(x).max()
    assert np.abs(y - x).max() <= tol * amax


def test_tq_block_sizes(rng):
    from llama_box_tpu.gguf.constants import GGML_BLOCK_SIZES
    for gtype in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        blk, nbytes = GGML_BLOCK_SIZES[gtype]
        assert blk == 256
        raw = quants.quantize(
            gtype, rng.standard_normal(blk * 3).astype(np.float32))
        assert len(raw) == 3 * nbytes, gtype.name


# -- IQ codebook family ------------------------------------------------------

def test_iq_requires_grids_clear_error(monkeypatch):
    monkeypatch.delenv("LLAMA_BOX_TPU_IQ_GRIDS", raising=False)
    quants._iq_grids = None
    raw = np.zeros(66, np.uint8)
    with pytest.raises(NotImplementedError, match="IQ_GRIDS"):
        quants.dequantize_iq2_xxs(raw, 256)
    quants._iq_grids = None


def test_ksigns_parity():
    """The iq2xs sign table is analytic: bit7 makes the popcount even."""
    ks = quants._KSIGNS
    assert ks.shape == (128,)
    bits = np.unpackbits(ks[:, None], axis=1).sum(1)
    assert (bits % 2 == 0).all()
    assert (ks & 127 == np.arange(128)).all()


def _fake_grids(tmp_path):
    """Synthetic codebooks with the real shapes/dtypes (magnitude bytes)."""
    rng = np.random.default_rng(0)

    def packed(n, npb, dt):
        vals = rng.integers(1, 16, size=(n, npb)).astype(np.uint64)
        out = np.zeros(n, np.uint64)
        for k in range(npb):
            out |= vals[:, k] << (8 * k)
        return out.astype(dt), vals.astype(np.int8)

    path = tmp_path / "grids.npz"
    packs, raws = {}, {}
    for name, (n, dt, npb) in quants._IQ_GRID_SPECS.items():
        packs[name], raws[name] = packed(n, npb, dt)
    np.savez(path, **packs)
    return str(path), raws


def test_iq2_xxs_layout(tmp_path, monkeypatch):
    """Hand-built IQ2_XXS block dequantizes per the published layout:
    grid lookup, 7-bit parity signs, 4-bit block scale."""
    path, raws = _fake_grids(tmp_path)
    monkeypatch.setenv("LLAMA_BOX_TPU_IQ_GRIDS", path)
    quants._iq_grids = None

    d = np.float16(0.5)
    blk = np.zeros(66, np.uint8)
    blk[0:2] = np.array([d], "<f2").view(np.uint8)
    # ib32=0: grid indices [7, 0, 0, 0]; scale=3; signs[l=0]=0b0000101
    q16 = np.zeros(32, "<u2")
    q16[0] = 7          # aux32[0] low byte -> grid index of first 8 elems
    aux1 = (3 << 28) | 0b0000101
    q16[2] = aux1 & 0xFFFF
    q16[3] = aux1 >> 16
    blk[2:66] = q16.view(np.uint8)

    y = quants.dequantize_iq2_xxs(blk, 256).reshape(8, 32)
    db = float(d) * (0.5 + 3) * 0.25
    g = raws["iq2xxs_grid"][7].astype(np.float32)
    # signs: 7 explicit bits 0b0000101 -> elems 0,2 negative; parity bit
    # (popcount(5)=2, even) leaves elem 7 positive
    sg = np.array([-1, 1, -1, 1, 1, 1, 1, 1], np.float32)
    np.testing.assert_allclose(y[0, :8], db * g * sg, rtol=1e-3)
    # remaining groups decode with grid[0], scale 0 -> db=0.5*0.25*d
    quants._iq_grids = None


def test_iq1_s_layout(tmp_path, monkeypatch):
    path, raws = _fake_grids(tmp_path)
    monkeypatch.setenv("LLAMA_BOX_TPU_IQ_GRIDS", path)
    quants._iq_grids = None

    d = np.float16(1.0)
    blk = np.zeros(50, np.uint8)
    blk[0:2] = np.array([d], "<f2").view(np.uint8)
    blk[2] = 5                                   # qs[0]: grid low byte
    qh = np.zeros(8, "<u2")
    qh[0] = (0b1 << 0) | (2 << 12) | 0x8000      # hi=1 -> idx 261; ls=2; neg delta
    blk[34:50] = qh.view(np.uint8)

    y = quants.dequantize_iq1_s(blk, 256)
    dl = 1.0 * (2 * 2 + 1)
    g = raws["iq1s_grid"][5 | (1 << 8)].astype(np.float32) - 1.0
    np.testing.assert_allclose(y[:8], dl * (g - quants.IQ1S_DELTA),
                               rtol=1e-3)
    quants._iq_grids = None


def test_iq1_m_layout(tmp_path, monkeypatch):
    """IQ1_M: scattered f16 super-scale, paired 3-bit sub-scales, per-group
    delta bits (reference dequantize_row_iq1_m)."""
    path, raws = _fake_grids(tmp_path)
    monkeypatch.setenv("LLAMA_BOX_TPU_IQ_GRIDS", path)
    quants._iq_grids = None

    d = np.float16(1.0)
    d16 = int(np.array([d], "<f2").view("<u2")[0])
    blk = np.zeros(56, np.uint8)
    blk[0] = 5                                   # qs[0] of ib32=0
    # qh[0]: high-3 bits for group 0 -> idx 5|0x100; group-0 delta bit set
    blk[32] = 0b1 | 0x08
    # scales: ib32=0 sub-scales ls1=2, ls2=4; f16 d spread over top nibbles
    sc = np.zeros(4, "<u2")
    sc[0] = (2 | (4 << 3)) | ((d16 & 0x000F) << 12)
    sc[1] = ((d16 & 0x00F0) << 8)
    sc[2] = ((d16 & 0x0F00) << 4)
    sc[3] = (d16 & 0xF000)
    blk[48:56] = sc.view(np.uint8)

    y = quants.dequantize_iq1_m(blk, 256)
    g = raws["iq1s_grid"][5 | (1 << 8)].astype(np.float32) - 1.0
    # group 0: dl1 = d*(2*2+1), negative delta
    np.testing.assert_allclose(y[:8], 5.0 * (g - quants.IQ1S_DELTA),
                               rtol=1e-3)
    # group 2 (third 8): dl2 = d*(2*4+1), positive delta, grid idx 0
    g0 = raws["iq1s_grid"][0].astype(np.float32) - 1.0
    np.testing.assert_allclose(y[16:24], 9.0 * (g0 + quants.IQ1S_DELTA),
                               rtol=1e-3)
    quants._iq_grids = None


def test_iq_grid_loader_c_source(tmp_path, monkeypatch):
    """The loader parses ggml-common.h-style tables."""
    src = tmp_path / "common.h"
    vals = ", ".join(hex(0x0101010101010101 * (i % 3 + 1))
                     for i in range(256))
    src.write_text(
        "static const uint64_t iq2xxs_grid[256] = {%s};" % vals)
    monkeypatch.setenv("LLAMA_BOX_TPU_IQ_GRIDS", str(src))
    quants._iq_grids = None
    g = quants._load_iq_grids()
    assert g["iq2xxs_grid"].shape == (256, 8)
    assert (g["iq2xxs_grid"][0] == 1).all()
    assert (g["iq2xxs_grid"][1] == 2).all()
    quants._iq_grids = None
