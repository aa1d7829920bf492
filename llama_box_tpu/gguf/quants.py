"""GGML block-quant codecs (numpy reference implementations).

Dequantizers are the ground truth the Pallas fused dequant+matmul kernels are
validated against; quantizers exist to build test fixtures and to convert
models. Formats follow the public GGML block layouts (see constants.py).
The reference consumes these formats via ggml (SURVEY.md §7 step 1);
here they are implemented from the format spec, vectorized over blocks.

All dequantizers take the raw byte payload of a tensor and the element count
and return float32 of shape (n_elements,).
"""

from __future__ import annotations

import numpy as np

from .constants import GGMLType, GGML_BLOCK_SIZES, IQ4_NL_VALUES, QK_K


def _blocks(raw: np.ndarray | bytes, block_bytes: int) -> np.ndarray:
    buf = np.frombuffer(raw, dtype=np.uint8) if not isinstance(raw, np.ndarray) else raw
    assert buf.size % block_bytes == 0, (buf.size, block_bytes)
    return buf.reshape(-1, block_bytes)


def _f16(b: np.ndarray) -> np.ndarray:
    """Interpret a (nblocks, 2) uint8 slice as little-endian fp16 -> f32 (nblocks,)."""
    return np.ascontiguousarray(b).view("<f2").reshape(-1).astype(np.float32)


# ----------------------------------------------------------------------------
# simple (non-K) formats
# ----------------------------------------------------------------------------

def dequantize_f32(raw, n):
    return np.frombuffer(raw, dtype="<f4", count=n).astype(np.float32)


def dequantize_f16(raw, n):
    return np.frombuffer(raw, dtype="<f2", count=n).astype(np.float32)


def dequantize_bf16(raw, n):
    u16 = np.frombuffer(raw, dtype="<u2", count=n).astype(np.uint32) << 16
    return u16.view(np.float32).copy()


def dequantize_f64(raw, n):
    return np.frombuffer(raw, dtype="<f8", count=n).astype(np.float32)


def dequantize_i8(raw, n):
    return np.frombuffer(raw, dtype=np.int8, count=n).astype(np.float32)


def dequantize_i16(raw, n):
    return np.frombuffer(raw, dtype="<i2", count=n).astype(np.float32)


def dequantize_i32(raw, n):
    return np.frombuffer(raw, dtype="<i4", count=n).astype(np.float32)


def dequantize_i64(raw, n):
    return np.frombuffer(raw, dtype="<i8", count=n).astype(np.float32)


def dequantize_q4_0(raw, n):
    b = _blocks(raw, 18)
    d = _f16(b[:, 0:2])[:, None]
    qs = b[:, 2:18]
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    out = np.concatenate([lo, hi], axis=1).astype(np.float32) * d
    return out.reshape(-1)[:n]


def quantize_q4_0(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 32)
    amax_idx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(x.shape[0]), amax_idx]
    d = maxv / -8.0
    d[maxv == 0] = 1.0  # avoid div-by-zero; q becomes 8 -> dequant 0
    inv = np.where(d != 0, 1.0 / d, 0.0)
    q = np.clip((x * inv[:, None] + 8.5).astype(np.int32), 0, 15).astype(np.uint8)
    d16 = np.where(maxv == 0, 0.0, d).astype("<f2")
    qs = (q[:, :16] | (q[:, 16:] << 4)).astype(np.uint8)
    out = np.empty((x.shape[0], 18), dtype=np.uint8)
    out[:, 0:2] = d16.view(np.uint8).reshape(-1, 2)
    out[:, 2:18] = qs
    return out.tobytes()


def dequantize_q4_1(raw, n):
    b = _blocks(raw, 20)
    d = _f16(b[:, 0:2])[:, None]
    m = _f16(b[:, 2:4])[:, None]
    qs = b[:, 4:20]
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    out = np.concatenate([lo, hi], axis=1) * d + m
    return out.reshape(-1)[:n]


def quantize_q4_1(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 32)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = (mx - mn) / 15.0
    d[d == 0] = 1.0
    q = np.clip(np.round((x - mn[:, None]) / d[:, None]).astype(np.int32), 0, 15).astype(np.uint8)
    d = np.where(mx == mn, 0.0, d)
    out = np.empty((x.shape[0], 20), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 4:20] = (q[:, :16] | (q[:, 16:] << 4)).astype(np.uint8)
    return out.tobytes()


def dequantize_q5_0(raw, n):
    b = _blocks(raw, 22)
    d = _f16(b[:, 0:2])[:, None]
    qh = np.ascontiguousarray(b[:, 2:6]).view("<u4").reshape(-1)
    qs = b[:, 6:22]
    bits = (qh[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    lo = (qs & 0x0F).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=1) | (bits.astype(np.int32) << 4)
    out = (q - 16).astype(np.float32) * d
    return out.reshape(-1)[:n]


def quantize_q5_0(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 32)
    amax_idx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(x.shape[0]), amax_idx]
    d = np.where(maxv == 0, 1.0, maxv / -16.0)
    inv = 1.0 / d
    q = np.clip((x * inv[:, None] + 16.5).astype(np.int32), 0, 31).astype(np.uint32)
    d = np.where(maxv == 0, 0.0, d)
    qh = np.zeros(x.shape[0], dtype=np.uint32)
    for j in range(32):
        qh |= ((q[:, j] >> 4) & 1) << np.uint32(j)
    qs = ((q[:, :16] & 0xF) | ((q[:, 16:] & 0xF) << 4)).astype(np.uint8)
    out = np.empty((x.shape[0], 22), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:6] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    out[:, 6:22] = qs
    return out.tobytes()


def dequantize_q5_1(raw, n):
    b = _blocks(raw, 24)
    d = _f16(b[:, 0:2])[:, None]
    m = _f16(b[:, 2:4])[:, None]
    qh = np.ascontiguousarray(b[:, 4:8]).view("<u4").reshape(-1)
    qs = b[:, 8:24]
    bits = (qh[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    lo = (qs & 0x0F).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=1) | (bits.astype(np.int32) << 4)
    out = q.astype(np.float32) * d + m
    return out.reshape(-1)[:n]


def quantize_q5_1(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 32)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = (mx - mn) / 31.0
    dd = np.where(d == 0, 1.0, d)
    q = np.clip(np.round((x - mn[:, None]) / dd[:, None]).astype(np.int32), 0, 31).astype(np.uint32)
    qh = np.zeros(x.shape[0], dtype=np.uint32)
    for j in range(32):
        qh |= ((q[:, j] >> 4) & 1) << np.uint32(j)
    qs = ((q[:, :16] & 0xF) | ((q[:, 16:] & 0xF) << 4)).astype(np.uint8)
    out = np.empty((x.shape[0], 24), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 4:8] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    out[:, 8:24] = qs
    return out.tobytes()


def dequantize_q8_0(raw, n):
    b = _blocks(raw, 34)
    d = _f16(b[:, 0:2])[:, None]
    q = np.ascontiguousarray(b[:, 2:34]).view(np.int8)
    out = q.astype(np.float32) * d
    return out.reshape(-1)[:n]


def quantize_q8_0(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 32)
    amax = np.abs(x).max(axis=1)
    d = amax / 127.0
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = np.clip(np.round(x * inv[:, None]).astype(np.int32), -128, 127).astype(np.int8)
    out = np.empty((x.shape[0], 34), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:34] = q.view(np.uint8)
    return out.tobytes()


def dequantize_q8_1(raw, n):
    b = _blocks(raw, 36)
    d = _f16(b[:, 0:2])[:, None]
    q = np.ascontiguousarray(b[:, 4:36]).view(np.int8)
    out = q.astype(np.float32) * d
    return out.reshape(-1)[:n]


# ----------------------------------------------------------------------------
# K-quants (super-blocks of 256)
# ----------------------------------------------------------------------------

def dequantize_q2_k(raw, n):
    # layout: scales[16] | qs[64] | d f16 | dmin f16
    b = _blocks(raw, 16 + 64 + 4)
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = _f16(b[:, 80:82])[:, None]
    dmin = _f16(b[:, 82:84])[:, None]
    nb = b.shape[0]
    out = np.empty((nb, 256), dtype=np.float32)
    sc = (scales & 0x0F).astype(np.float32)  # (nb,16)
    mn = (scales >> 4).astype(np.float32)
    for half in range(2):
        qpart = qs[:, half * 32:(half + 1) * 32]
        for j in range(4):
            q = ((qpart >> (2 * j)) & 3).astype(np.float32)  # (nb,32)
            base = half * 128 + j * 32
            g0 = half * 8 + j * 2
            out[:, base:base + 16] = d * sc[:, g0:g0 + 1] * q[:, :16] - dmin * mn[:, g0:g0 + 1]
            out[:, base + 16:base + 32] = (
                d * sc[:, g0 + 1:g0 + 2] * q[:, 16:] - dmin * mn[:, g0 + 1:g0 + 2]
            )
    return out.reshape(-1)[:n]


def quantize_q2_k(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 256)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    gmin = g.min(axis=2)
    gmax = g.max(axis=2)
    gm = np.maximum(0.0, -gmin)  # stored min is subtracted
    gs = (gmax + gm) / 3.0
    gs = np.maximum(gs, 0.0)
    d = gs.max(axis=1) / 15.0
    dmin = gm.max(axis=1) / 15.0
    d_safe = np.where(d > 0, d, 1.0)
    dmin_safe = np.where(dmin > 0, dmin, 1.0)
    sc = np.clip(np.round(gs / d_safe[:, None]), 0, 15).astype(np.uint8)
    mnq = np.clip(np.round(gm / dmin_safe[:, None]), 0, 15).astype(np.uint8)
    eff_s = d[:, None] * sc
    eff_m = dmin[:, None] * mnq
    eff_s_safe = np.where(eff_s > 0, eff_s, 1.0)
    q = np.clip(
        np.round((g + eff_m[:, :, None]) / eff_s_safe[:, :, None]), 0, 3
    ).astype(np.uint8)  # (nb,16,16)
    qflat = q.reshape(nb, 256)
    qs = np.zeros((nb, 64), dtype=np.uint8)
    for half in range(2):
        for j in range(4):
            base = half * 128 + j * 32
            qs[:, half * 32:(half + 1) * 32] |= (qflat[:, base:base + 32] << (2 * j))
    out = np.empty((nb, 84), dtype=np.uint8)
    out[:, 0:16] = sc | (mnq << 4)
    out[:, 16:80] = qs
    out[:, 80:82] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 82:84] = dmin.astype("<f2").view(np.uint8).reshape(-1, 2)
    return out.tobytes()


def _q3k_unpack_scales(scales: np.ndarray) -> np.ndarray:
    """scales: (nb,12) uint8 -> (nb,16) int32 in [-32,31]."""
    nb = scales.shape[0]
    out = np.empty((nb, 16), dtype=np.int32)
    for j in range(16):
        if j < 8:
            low = scales[:, j] & 0x0F
        else:
            low = scales[:, j - 8] >> 4
        high = (scales[:, 8 + (j % 4)] >> (2 * (j // 4))) & 3
        out[:, j] = (low.astype(np.int32) | (high.astype(np.int32) << 4)) - 32
    return out


def _q3k_pack_scales(sc: np.ndarray) -> np.ndarray:
    """sc: (nb,16) int in [-32,31] -> (nb,12) uint8."""
    nb = sc.shape[0]
    stored = (sc + 32).astype(np.uint8)
    out = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(16):
        l = stored[:, j]
        if j < 8:
            out[:, j] |= l & 0x0F
        else:
            out[:, j - 8] |= (l & 0x0F) << 4
        out[:, 8 + (j % 4)] |= (l >> 4) << (2 * (j // 4))
    return out


def dequantize_q3_k(raw, n):
    # layout: hmask[32] | qs[64] | scales[12] | d f16
    b = _blocks(raw, 32 + 64 + 12 + 2)
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    scales = b[:, 96:108]
    d = _f16(b[:, 108:110])[:, None]
    sc = _q3k_unpack_scales(scales).astype(np.float32)
    nb = b.shape[0]
    out = np.empty((nb, 256), dtype=np.float32)
    for half in range(2):
        qpart = qs[:, half * 32:(half + 1) * 32]
        for j in range(4):
            bit = 1 << (half * 4 + j)
            hset = (hmask & bit) != 0  # (nb,32)
            q = ((qpart >> (2 * j)) & 3).astype(np.int32) - np.where(hset, 0, 4)
            base = half * 128 + j * 32
            g0 = half * 8 + j * 2
            out[:, base:base + 16] = d * sc[:, g0:g0 + 1] * q[:, :16].astype(np.float32)
            out[:, base + 16:base + 32] = d * sc[:, g0 + 1:g0 + 2] * q[:, 16:].astype(np.float32)
    return out.reshape(-1)[:n]


def quantize_q3_k(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 256)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    # Map the signed extreme onto -4 so the asymmetric [-4,3] range is fully
    # used without clipping error at the positive end.
    ext_idx = np.abs(g).argmax(axis=2)
    ext = np.take_along_axis(g, ext_idx[:, :, None], axis=2)[:, :, 0]
    dg = ext / -4.0
    dmax = np.abs(dg).max(axis=1)
    d = dmax / 31.0
    d_safe = np.where(d > 0, d, 1.0)
    sc = np.clip(np.round(dg / d_safe[:, None]), -32, 31).astype(np.int32)
    eff = d[:, None] * sc.astype(np.float32)
    eff_safe = np.where(np.abs(eff) > 0, eff, 1.0)
    q = np.clip(np.round(g / eff_safe[:, :, None]), -4, 3).astype(np.int32) + 4  # 0..7
    qflat = q.reshape(nb, 256).astype(np.uint8)
    qs = np.zeros((nb, 64), dtype=np.uint8)
    hmask = np.zeros((nb, 32), dtype=np.uint8)
    for half in range(2):
        for j in range(4):
            base = half * 128 + j * 32
            chunk = qflat[:, base:base + 32]
            qs[:, half * 32:(half + 1) * 32] |= (chunk & 3) << (2 * j)
            hmask |= ((chunk >> 2) & 1) << (half * 4 + j)
    out = np.empty((nb, 110), dtype=np.uint8)
    out[:, 0:32] = hmask
    out[:, 32:96] = qs
    out[:, 96:108] = _q3k_pack_scales(sc)
    out[:, 108:110] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    return out.tobytes()


def _k4_unpack_scale_min(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """scales: (nb,12) -> (sc, mn) each (nb,8) uint8 6-bit."""
    s = scales.astype(np.uint8)
    sc = np.empty((s.shape[0], 8), dtype=np.uint8)
    mn = np.empty((s.shape[0], 8), dtype=np.uint8)
    for j in range(8):
        if j < 4:
            sc[:, j] = s[:, j] & 63
            mn[:, j] = s[:, j + 4] & 63
        else:
            sc[:, j] = (s[:, j + 4] & 0x0F) | ((s[:, j - 4] >> 6) << 4)
            mn[:, j] = (s[:, j + 4] >> 4) | ((s[:, j] >> 6) << 4)
    return sc, mn


def _k4_pack_scale_min(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    nb = sc.shape[0]
    out = np.zeros((nb, 12), dtype=np.uint8)
    sc = sc.astype(np.uint8)
    mn = mn.astype(np.uint8)
    for j in range(8):
        if j < 4:
            out[:, j] |= sc[:, j] & 63
            out[:, j + 4] |= mn[:, j] & 63
        else:
            out[:, j + 4] = (sc[:, j] & 0x0F) | ((mn[:, j] & 0x0F) << 4)
            out[:, j - 4] |= (sc[:, j] >> 4) << 6
            out[:, j] |= (mn[:, j] >> 4) << 6
    return out


def dequantize_q4_k(raw, n):
    # layout: d f16 | dmin f16 | scales[12] | qs[128]
    b = _blocks(raw, 2 + 2 + 12 + 128)
    d = _f16(b[:, 0:2])[:, None]
    dmin = _f16(b[:, 2:4])[:, None]
    sc, mn = _k4_unpack_scale_min(b[:, 4:16])
    qs = b[:, 16:144]
    nb = b.shape[0]
    out = np.empty((nb, 256), dtype=np.float32)
    scf = sc.astype(np.float32)
    mnf = mn.astype(np.float32)
    for c in range(4):
        qpart = qs[:, c * 32:(c + 1) * 32]
        lo = (qpart & 0x0F).astype(np.float32)
        hi = (qpart >> 4).astype(np.float32)
        out[:, c * 64:c * 64 + 32] = d * scf[:, 2 * c:2 * c + 1] * lo - dmin * mnf[:, 2 * c:2 * c + 1]
        out[:, c * 64 + 32:c * 64 + 64] = (
            d * scf[:, 2 * c + 1:2 * c + 2] * hi - dmin * mnf[:, 2 * c + 1:2 * c + 2]
        )
    return out.reshape(-1)[:n]


def _k4_group_fit(x: np.ndarray, nbits: int):
    """Fit per-32-group scale/min for Q4_K/Q5_K. x: (nb,8,32). Returns packed pieces."""
    qmax = (1 << nbits) - 1
    gmin = x.min(axis=2)
    gmax = x.max(axis=2)
    gm = np.maximum(0.0, -gmin)
    gs = np.maximum((gmax + gm) / qmax, 0.0)
    d = gs.max(axis=1) / 63.0
    dmin = gm.max(axis=1) / 63.0
    d_safe = np.where(d > 0, d, 1.0)
    dmin_safe = np.where(dmin > 0, dmin, 1.0)
    sc = np.clip(np.round(gs / d_safe[:, None]), 0, 63).astype(np.uint8)
    mn = np.clip(np.round(gm / dmin_safe[:, None]), 0, 63).astype(np.uint8)
    eff_s = d[:, None] * sc
    eff_m = dmin[:, None] * mn
    eff_s_safe = np.where(eff_s > 0, eff_s, 1.0)
    q = np.clip(
        np.round((x + eff_m[:, :, None]) / eff_s_safe[:, :, None]), 0, qmax
    ).astype(np.uint8)
    return d, dmin, sc, mn, q


def quantize_q4_k(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 256)
    nb = x.shape[0]
    d, dmin, sc, mn, q = _k4_group_fit(x.reshape(nb, 8, 32), 4)
    qflat = q.reshape(nb, 256)
    qs = np.empty((nb, 128), dtype=np.uint8)
    for c in range(4):
        qs[:, c * 32:(c + 1) * 32] = (
            qflat[:, c * 64:c * 64 + 32] | (qflat[:, c * 64 + 32:c * 64 + 64] << 4)
        )
    out = np.empty((nb, 144), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = dmin.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 4:16] = _k4_pack_scale_min(sc, mn)
    out[:, 16:144] = qs
    return out.tobytes()


def dequantize_q5_k(raw, n):
    # layout: d f16 | dmin f16 | scales[12] | qh[32] | qs[128]
    b = _blocks(raw, 2 + 2 + 12 + 32 + 128)
    d = _f16(b[:, 0:2])[:, None]
    dmin = _f16(b[:, 2:4])[:, None]
    sc, mn = _k4_unpack_scale_min(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    nb = b.shape[0]
    out = np.empty((nb, 256), dtype=np.float32)
    scf = sc.astype(np.float32)
    mnf = mn.astype(np.float32)
    for c in range(4):
        qpart = qs[:, c * 32:(c + 1) * 32]
        lo = (qpart & 0x0F).astype(np.float32) + np.where((qh & (1 << (2 * c))) != 0, 16.0, 0.0)
        hi = (qpart >> 4).astype(np.float32) + np.where((qh & (1 << (2 * c + 1))) != 0, 16.0, 0.0)
        out[:, c * 64:c * 64 + 32] = d * scf[:, 2 * c:2 * c + 1] * lo - dmin * mnf[:, 2 * c:2 * c + 1]
        out[:, c * 64 + 32:c * 64 + 64] = (
            d * scf[:, 2 * c + 1:2 * c + 2] * hi - dmin * mnf[:, 2 * c + 1:2 * c + 2]
        )
    return out.reshape(-1)[:n]


def quantize_q5_k(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 256)
    nb = x.shape[0]
    d, dmin, sc, mn, q = _k4_group_fit(x.reshape(nb, 8, 32), 5)
    qflat = q.reshape(nb, 256)
    qs = np.empty((nb, 128), dtype=np.uint8)
    qh = np.zeros((nb, 32), dtype=np.uint8)
    for c in range(4):
        lo = qflat[:, c * 64:c * 64 + 32]
        hi = qflat[:, c * 64 + 32:c * 64 + 64]
        qs[:, c * 32:(c + 1) * 32] = (lo & 0x0F) | ((hi & 0x0F) << 4)
        qh |= ((lo >> 4) & 1) << (2 * c)
        qh |= ((hi >> 4) & 1) << (2 * c + 1)
    out = np.empty((nb, 176), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = dmin.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 4:16] = _k4_pack_scale_min(sc, mn)
    out[:, 16:48] = qh
    out[:, 48:176] = qs
    return out.tobytes()


def dequantize_q6_k(raw, n):
    # layout: ql[128] | qh[64] | scales[16] i8 | d f16
    b = _blocks(raw, 128 + 64 + 16 + 2)
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = np.ascontiguousarray(b[:, 192:208]).view(np.int8)
    d = _f16(b[:, 208:210])[:, None]
    nb = b.shape[0]
    out = np.empty((nb, 256), dtype=np.float32)
    scf = scales.astype(np.float32)
    for half in range(2):
        qlp = ql[:, half * 64:(half + 1) * 64]
        qhp = qh[:, half * 32:(half + 1) * 32]
        q0 = ((qlp[:, :32] & 0x0F).astype(np.int32) | (((qhp >> 0) & 3).astype(np.int32) << 4)) - 32
        q1 = ((qlp[:, 32:] & 0x0F).astype(np.int32) | (((qhp >> 2) & 3).astype(np.int32) << 4)) - 32
        q2 = ((qlp[:, :32] >> 4).astype(np.int32) | (((qhp >> 4) & 3).astype(np.int32) << 4)) - 32
        q3 = ((qlp[:, 32:] >> 4).astype(np.int32) | (((qhp >> 6) & 3).astype(np.int32) << 4)) - 32
        for k, q in enumerate((q0, q1, q2, q3)):
            base = half * 128 + k * 32
            # 32 elements span two 16-element scale groups
            g0 = base // 16
            out[:, base:base + 16] = d * scf[:, g0:g0 + 1] * q[:, :16].astype(np.float32)
            out[:, base + 16:base + 32] = d * scf[:, g0 + 1:g0 + 2] * q[:, 16:].astype(np.float32)
    return out.reshape(-1)[:n]


def quantize_q6_k(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 256)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    ext_idx = np.abs(g).argmax(axis=2)
    ext = np.take_along_axis(g, ext_idx[:, :, None], axis=2)[:, :, 0]
    dg = ext / -32.0  # signed extreme -> -32; q in [-32,31]
    dmax = np.abs(dg).max(axis=1)
    d = dmax / 127.0
    d_safe = np.where(d > 0, d, 1.0)
    sc = np.clip(np.round(dg / d_safe[:, None]), -128, 127).astype(np.int8)
    eff = d[:, None] * sc.astype(np.float32)
    eff_safe = np.where(np.abs(eff) > 0, eff, 1.0)
    q = np.clip(np.round(g / eff_safe[:, :, None]), -32, 31).astype(np.int32) + 32  # 0..63
    qflat = q.reshape(nb, 256).astype(np.uint8)
    ql = np.zeros((nb, 128), dtype=np.uint8)
    qh = np.zeros((nb, 64), dtype=np.uint8)
    for half in range(2):
        base = half * 128
        q0 = qflat[:, base:base + 32]
        q1 = qflat[:, base + 32:base + 64]
        q2 = qflat[:, base + 64:base + 96]
        q3 = qflat[:, base + 96:base + 128]
        ql[:, half * 64:half * 64 + 32] = (q0 & 0x0F) | ((q2 & 0x0F) << 4)
        ql[:, half * 64 + 32:half * 64 + 64] = (q1 & 0x0F) | ((q3 & 0x0F) << 4)
        qh[:, half * 32:(half + 1) * 32] = (
            (q0 >> 4) | ((q1 >> 4) << 2) | ((q2 >> 4) << 4) | ((q3 >> 4) << 6)
        )
    out = np.empty((nb, 210), dtype=np.uint8)
    out[:, 0:128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = sc.view(np.uint8)
    out[:, 208:210] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    return out.tobytes()


def dequantize_q8_k(raw, n):
    # layout: d f32 | qs[256] i8 | bsums[16] i16
    b = _blocks(raw, 4 + 256 + 32)
    d = np.ascontiguousarray(b[:, 0:4]).view("<f4").reshape(-1, 1)
    q = np.ascontiguousarray(b[:, 4:260]).view(np.int8)
    out = q.astype(np.float32) * d
    return out.reshape(-1)[:n]


_IQ4_TABLE = np.array(IQ4_NL_VALUES, dtype=np.float32)


def dequantize_iq4_nl(raw, n):
    b = _blocks(raw, 18)
    d = _f16(b[:, 0:2])[:, None]
    qs = b[:, 2:18]
    lo = _IQ4_TABLE[(qs & 0x0F).astype(np.int32)]
    hi = _IQ4_TABLE[(qs >> 4).astype(np.int32)]
    out = np.concatenate([lo, hi], axis=1) * d
    return out.reshape(-1)[:n]


def quantize_iq4_nl(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 32)
    amax = np.abs(x).max(axis=1)
    d = amax / 127.0
    d_safe = np.where(d > 0, d, 1.0)
    scaled = x / d_safe[:, None]
    idx = np.abs(scaled[:, :, None] - _IQ4_TABLE[None, None, :]).argmin(axis=2).astype(np.uint8)
    out = np.empty((x.shape[0], 18), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:18] = idx[:, :16] | (idx[:, 16:] << 4)
    return out.tobytes()


def dequantize_iq4_xs(raw, n):
    # layout: d f16 | scales_h u16 | scales_l[4] | qs[128]
    b = _blocks(raw, 2 + 2 + 4 + 128)
    d = _f16(b[:, 0:2])[:, None]
    scales_h = np.ascontiguousarray(b[:, 2:4]).view("<u2").reshape(-1)
    scales_l = b[:, 4:8]
    qs = b[:, 8:136]
    nb = b.shape[0]
    out = np.empty((nb, 256), dtype=np.float32)
    for ib in range(8):
        ls = ((scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0x0F).astype(np.int32) | (
            ((scales_h >> (2 * ib)) & 3).astype(np.int32) << 4
        )
        dl = d[:, 0] * (ls - 32).astype(np.float32)
        qpart = qs[:, ib * 16:(ib + 1) * 16]
        out[:, ib * 32:ib * 32 + 16] = dl[:, None] * _IQ4_TABLE[(qpart & 0x0F).astype(np.int32)]
        out[:, ib * 32 + 16:ib * 32 + 32] = dl[:, None] * _IQ4_TABLE[(qpart >> 4).astype(np.int32)]
    return out.reshape(-1)[:n]


# ----------------------------------------------------------------------------
# ternary (TriLM / BitNet b1.58) — reference block_tq1_0/block_tq2_0,
# llama.cpp ggml-common.h. Values are {-1, 0, +1} * d; the formats are
# fully analytic (no codebook), so dequant here is exact.
# ----------------------------------------------------------------------------

_POW3 = np.array([1, 3, 9, 27, 81, 243], dtype=np.uint16)


def dequantize_tq1_0(raw, n):
    # layout: qs[48] (5 trits/byte) | qh[4] (4 trits/byte) | d f16.
    # trit k of byte q decodes as ((uint8)(q * 3^k) * 3) >> 8 — the byte
    # stores ceil(v * 256 / 3^T) where v is the base-3 big-endian value.
    b = _blocks(raw, 54)
    d = _f16(b[:, 52:54])[:, None]
    nb = b.shape[0]
    out = np.empty((nb, 256), dtype=np.float32)
    qs0 = b[:, 0:32].astype(np.uint16)       # elems 0..160: stride 32
    qs1 = b[:, 32:48].astype(np.uint16)      # elems 160..240: stride 16
    qh = b[:, 48:52].astype(np.uint16)       # elems 240..256: stride 4
    for k in range(5):
        t = (((qs0 * _POW3[k]) & 0xFF) * 3) >> 8
        out[:, 32 * k:32 * (k + 1)] = t.astype(np.float32) - 1.0
    for k in range(5):
        t = (((qs1 * _POW3[k]) & 0xFF) * 3) >> 8
        out[:, 160 + 16 * k:160 + 16 * (k + 1)] = t.astype(np.float32) - 1.0
    for k in range(4):
        t = (((qh * _POW3[k]) & 0xFF) * 3) >> 8
        out[:, 240 + 4 * k:240 + 4 * (k + 1)] = t.astype(np.float32) - 1.0
    return (out * d).reshape(-1)[:n]


def quantize_tq1_0(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 256)
    d = np.abs(x).max(axis=1)
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    t = (np.rint(x * id_[:, None]).astype(np.int32) + 1).astype(np.uint32)

    def pack(cols, base):  # big-endian base-3, ceil-scaled to a byte
        v = np.zeros(cols.shape[:-1], np.uint32)
        for k in range(cols.shape[-1]):
            v = v * 3 + cols[..., k]
        return ((v * 256 + base - 1) // base).astype(np.uint8)

    nb = x.shape[0]
    out = np.empty((nb, 54), np.uint8)
    g0 = t[:, :160].reshape(nb, 5, 32).transpose(0, 2, 1)    # [nb, 32, 5]
    out[:, 0:32] = pack(g0, 243)
    g1 = t[:, 160:240].reshape(nb, 5, 16).transpose(0, 2, 1)
    out[:, 32:48] = pack(g1, 243)
    g2 = t[:, 240:256].reshape(nb, 4, 4).transpose(0, 2, 1)
    out[:, 48:52] = pack(g2, 81)
    out[:, 52:54] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    return out.tobytes()


def dequantize_tq2_0(raw, n):
    # layout: qs[64] (2 bits/elem) | d f16; 32-byte chunks, bit-plane-major
    b = _blocks(raw, 66)
    d = _f16(b[:, 64:66])[:, None]
    nb = b.shape[0]
    out = np.empty((nb, 256), dtype=np.float32)
    for c in range(2):                        # 32-byte chunk -> 128 elems
        qs = b[:, 32 * c:32 * (c + 1)]
        for l in range(4):
            t = (qs >> (2 * l)) & 3
            out[:, 128 * c + 32 * l:128 * c + 32 * (l + 1)] = \
                t.astype(np.float32) - 1.0
    return (out * d).reshape(-1)[:n]


def quantize_tq2_0(x: np.ndarray) -> bytes:
    x = x.astype(np.float32).reshape(-1, 256)
    d = np.abs(x).max(axis=1)
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    t = (np.rint(x * id_[:, None]).astype(np.int32) + 1).astype(np.uint8)
    nb = x.shape[0]
    out = np.empty((nb, 66), np.uint8)
    for c in range(2):
        acc = np.zeros((nb, 32), np.uint8)
        for l in range(4):
            acc |= t[:, 128 * c + 32 * l:128 * c + 32 * (l + 1)] << (2 * l)
        out[:, 32 * c:32 * (c + 1)] = acc
    out[:, 64:66] = d.astype("<f2").view(np.uint8).reshape(-1, 2)
    return out.tobytes()


# ----------------------------------------------------------------------------
# IQ codebook quants (IQ1/IQ2/IQ3 families). The block layouts, scale
# packing and sign scheme below follow the published GGUF formats
# (llama.cpp ggml-common.h / ggml-quants.c dequantize_row_iq*). The sign
# table is analytic (7 explicit sign bits + 1 even-parity bit), but the
# lattice codebooks (iq2xxs_grid &c.) are trained constant tables that are
# NOT derivable and are not present in this build. Drop any ggml-common.h
# (or an .npz with the named arrays) next to the model or point
# LLAMA_BOX_TPU_IQ_GRIDS at one to enable these formats.
# ----------------------------------------------------------------------------

# ksigns_iq2xs[i] = i with bit 7 = odd parity of i (total popcount even)
_KSIGNS = np.arange(128, dtype=np.uint8)
_KSIGNS |= ((np.unpackbits(_KSIGNS[:, None], axis=1).sum(1) & 1)
            .astype(np.uint8) << 7)

_IQ_GRID_SPECS = {
    # name: (entries, dtype, values-per-entry, bits-per-value)
    "iq2xxs_grid": (256, np.uint64, 8),
    "iq2xs_grid": (512, np.uint64, 8),
    "iq2s_grid": (1024, np.uint64, 8),
    "iq3xxs_grid": (256, np.uint32, 4),
    "iq3s_grid": (512, np.uint32, 4),
    "iq1s_grid": (2048, np.uint64, 8),
}
_iq_grids: dict | None = None


def _load_iq_grids() -> dict:
    """Load the trained IQ codebooks from LLAMA_BOX_TPU_IQ_GRIDS (a
    ggml-common.h-style C source or an .npz). Returns {} when absent."""
    global _iq_grids
    if _iq_grids is not None:
        return _iq_grids
    import os
    import re
    path = os.environ.get("LLAMA_BOX_TPU_IQ_GRIDS")
    grids: dict = {}
    if path and path.endswith(".npz"):
        with np.load(path) as z:
            grids = {k: np.asarray(z[k]) for k in z.files}
    elif path:
        with open(path, "r", errors="ignore") as f:
            src = f.read()
        for name, (n_ent, dt, _) in _IQ_GRID_SPECS.items():
            m = re.search(name + r"\s*\[\s*\d*\s*\]\s*=\s*\{([^}]*)\}", src)
            if not m:
                continue
            vals = [int(v, 0) for v in
                    re.findall(r"0[xX][0-9a-fA-F]+|\d+", m.group(1))]
            if len(vals) == n_ent:
                grids[name] = np.asarray(vals, dt)
    for name, (n_ent, dt, npb) in _IQ_GRID_SPECS.items():
        if name in grids:
            g = grids[name].astype(dt)
            # unpack packed-byte entries -> [n_ent, npb] int8 magnitudes
            grids[name] = np.stack(
                [(g >> (8 * k)).astype(np.uint8) for k in range(npb)],
                axis=1).astype(np.int8)
    _iq_grids = grids
    return grids


def _need_grid(name: str) -> np.ndarray:
    g = _load_iq_grids().get(name)
    if g is None:
        raise NotImplementedError(
            f"{name} codebook unavailable: the IQ formats need llama.cpp's "
            "trained lattice tables, which this build does not vendor. "
            "Set LLAMA_BOX_TPU_IQ_GRIDS to a ggml-common.h or .npz "
            "containing them.")
    return g


def _signs8(bits7: np.ndarray) -> np.ndarray:
    """[...,] 7-bit sign selector -> [..., 8] +-1.0 via the parity table."""
    ks = _KSIGNS[bits7]
    return 1.0 - 2.0 * ((ks[..., None] >> np.arange(8)) & 1)


def dequantize_iq2_xxs(raw, n):
    grid = _need_grid("iq2xxs_grid")          # [256, 8] magnitudes
    b = _blocks(raw, 66)
    d = _f16(b[:, 0:2])
    q16 = np.ascontiguousarray(b[:, 2:66]).view("<u2").reshape(-1, 8, 4)
    aux0 = q16[..., 0].astype(np.uint32) | (q16[..., 1].astype(np.uint32) << 16)
    aux1 = q16[..., 2].astype(np.uint32) | (q16[..., 3].astype(np.uint32) << 16)
    db = d[:, None] * (0.5 + (aux1 >> 28)) * 0.25          # [nb, 8]
    idx = np.stack([(aux0 >> (8 * l)) & 0xFF for l in range(4)], -1)
    sgn = np.stack([(aux1 >> (7 * l)) & 127 for l in range(4)], -1)
    vals = grid[idx].astype(np.float32)                    # [nb, 8, 4, 8]
    vals = vals * _signs8(sgn)
    out = vals * db[..., None, None]
    return out.reshape(len(b), 256).reshape(-1)[:n]


def dequantize_iq2_xs(raw, n):
    grid = _need_grid("iq2xs_grid")           # [512, 8]
    b = _blocks(raw, 74)
    d = _f16(b[:, 0:2])
    q16 = np.ascontiguousarray(b[:, 2:66]).view("<u2").reshape(-1, 8, 4)
    scales = b[:, 66:74]                                   # [nb, 8]
    ls = np.stack([scales & 0xF, scales >> 4], -1).astype(np.float32)
    db = d[:, None, None] * (0.5 + ls) * 0.25              # [nb, 8, 2]
    db = np.repeat(db, 2, axis=2)                          # per-l scale
    vals = grid[q16 & 511].astype(np.float32)              # [nb, 8, 4, 8]
    vals = vals * _signs8((q16 >> 9).astype(np.uint8))
    out = vals * db[..., None]
    return out.reshape(len(b), 256).reshape(-1)[:n]


def dequantize_iq2_s(raw, n):
    grid = _need_grid("iq2s_grid")            # [1024, 8]
    b = _blocks(raw, 82)
    d = _f16(b[:, 0:2])
    qs = b[:, 2:34].reshape(-1, 8, 4)                      # grid low bytes
    signs = b[:, 34:66].reshape(-1, 8, 4)                  # explicit signs
    qh = b[:, 66:74]                                       # [nb, 8]
    scales = b[:, 74:82]
    ls = np.stack([scales & 0xF, scales >> 4], -1).astype(np.float32)
    db = np.repeat(d[:, None, None] * (0.5 + ls) * 0.25, 2, axis=2)
    hi = np.stack([((qh.astype(np.uint16) << (8 - 2 * l)) & 0x300)
                   for l in range(4)], -1)
    vals = grid[qs.astype(np.uint16) | hi].astype(np.float32)
    sg = 1.0 - 2.0 * ((signs[..., None] >> np.arange(8)) & 1)
    out = vals * sg * db[..., None]
    return out.reshape(len(b), 256).reshape(-1)[:n]


def dequantize_iq3_xxs(raw, n):
    grid = _need_grid("iq3xxs_grid")          # [256, 4]
    b = _blocks(raw, 98)
    d = _f16(b[:, 0:2])
    qs = b[:, 2:66].reshape(-1, 8, 8)                      # 8 grid bytes/ib32
    aux = np.ascontiguousarray(b[:, 66:98]).view("<u4").reshape(-1, 8)
    db = d[:, None] * (0.5 + (aux >> 28)) * 0.5            # [nb, 8]
    sgn = np.stack([(aux >> (7 * l)) & 127 for l in range(4)], -1)
    vals = grid[qs].astype(np.float32).reshape(len(b), 8, 4, 8)
    vals = vals * _signs8(sgn)
    out = vals * db[..., None, None]
    return out.reshape(len(b), 256).reshape(-1)[:n]


def dequantize_iq3_s(raw, n):
    grid = _need_grid("iq3s_grid")            # [512, 4]
    b = _blocks(raw, 110)
    d = _f16(b[:, 0:2])
    qs = b[:, 2:66].reshape(-1, 8, 8)
    qh = b[:, 66:74]                                       # [nb, 8]
    signs = b[:, 74:106].reshape(-1, 8, 4)
    scales = b[:, 106:110]                                 # [nb, 4]
    ls = np.stack([scales & 0xF, scales >> 4], -1).astype(np.float32)
    db = d[:, None] * (1.0 + 2.0 * ls.reshape(len(b), 8))  # [nb, 8]
    hi = np.stack([((qh.astype(np.uint16) << (8 - l)) & 256)
                   for l in range(8)], -1)
    vals = grid[qs.astype(np.uint16) | hi].astype(np.float32) \
        .reshape(len(b), 8, 4, 8)
    sg = 1.0 - 2.0 * ((signs[..., None] >> np.arange(8)) & 1)
    out = vals * sg.reshape(len(b), 8, 4, 8) * db[..., None, None]
    return out.reshape(len(b), 256).reshape(-1)[:n]


IQ1S_DELTA = 0.125


def dequantize_iq1_s(raw, n):
    grid = _need_grid("iq1s_grid")            # [2048, 8] of 2-bit {0,1,2}
    b = _blocks(raw, 50)
    d = _f16(b[:, 0:2])
    qs = b[:, 2:34].reshape(-1, 8, 4)
    qh = np.ascontiguousarray(b[:, 34:50]).view("<u2").reshape(-1, 8)
    dl = d[:, None] * (2 * ((qh >> 12) & 7) + 1)           # [nb, 8]
    delta = np.where(qh & 0x8000, -IQ1S_DELTA, IQ1S_DELTA)
    hi = np.stack([((qh.astype(np.uint32) >> (3 * l)) & 7) << 8
                   for l in range(4)], -1)
    vals = grid[qs.astype(np.uint32) | hi].astype(np.float32)
    # grid entries store {0,1,2} biased magnitudes -> {-1,0,+1}
    vals = vals - 1.0
    out = (vals + delta[..., None, None]) * dl[..., None, None]
    return out.reshape(len(b), 256).reshape(-1)[:n]


def dequantize_iq1_m(raw, n):
    """IQ1_M (reference block_iq1_m, llama.cpp ggml-quants.c
    dequantize_row_iq1_m): same iq1s_grid codebook as IQ1_S but the block
    f16 super-scale is scattered over the top 4 bits of the four scale
    u16s, each 32-group carries two 3-bit sub-scales (one per 16-element
    half), and each 8-element group has its own +-IQ1S_DELTA shift bit."""
    grid = _need_grid("iq1s_grid")            # [2048, 8] of {0,1,2}
    b = _blocks(raw, 56)
    qs = b[:, 0:32].reshape(-1, 8, 4)                      # [nb, ib32, 4]
    qh = b[:, 32:48].reshape(-1, 8, 2)
    sc = np.ascontiguousarray(b[:, 48:56]).view("<u2").reshape(-1, 4)
    d16 = ((sc[:, 0] >> 12) | ((sc[:, 1] >> 8) & 0x00F0)
           | ((sc[:, 2] >> 4) & 0x0F00) | (sc[:, 3] & 0xF000))
    d = d16.astype(np.uint16).view(np.float16).astype(np.float32)
    ib = np.arange(8)
    six = (sc[:, ib // 2] >> (6 * (ib % 2))).astype(np.int32)  # [nb, 8]
    dl1 = d[:, None] * (2 * (six & 7) + 1).astype(np.float32)
    dl2 = d[:, None] * (2 * ((six >> 3) & 7) + 1).astype(np.float32)
    qh0 = qh[..., 0].astype(np.uint16)
    qh1 = qh[..., 1].astype(np.uint16)
    hi = np.stack([(qh0 << 8) & 0x700, (qh0 << 4) & 0x700,
                   (qh1 << 8) & 0x700, (qh1 << 4) & 0x700], -1)
    vals = grid[qs.astype(np.uint16) | hi].astype(np.float32) - 1.0
    dbit = np.stack([qh0 & 0x08, qh0 & 0x80, qh1 & 0x08, qh1 & 0x80], -1)
    delta = np.where(dbit != 0, -IQ1S_DELTA, IQ1S_DELTA).astype(np.float32)
    dl = np.stack([dl1, dl1, dl2, dl2], -1)                # [nb, 8, 4]
    out = dl[..., None] * (vals + delta[..., None])
    return out.reshape(len(b), 256).reshape(-1)[:n]


# ----------------------------------------------------------------------------
# registries
# ----------------------------------------------------------------------------

DEQUANTIZERS = {
    GGMLType.F32: dequantize_f32,
    GGMLType.F16: dequantize_f16,
    GGMLType.BF16: dequantize_bf16,
    GGMLType.F64: dequantize_f64,
    GGMLType.I8: dequantize_i8,
    GGMLType.I16: dequantize_i16,
    GGMLType.I32: dequantize_i32,
    GGMLType.I64: dequantize_i64,
    GGMLType.Q4_0: dequantize_q4_0,
    GGMLType.Q4_1: dequantize_q4_1,
    GGMLType.Q5_0: dequantize_q5_0,
    GGMLType.Q5_1: dequantize_q5_1,
    GGMLType.Q8_0: dequantize_q8_0,
    GGMLType.Q8_1: dequantize_q8_1,
    GGMLType.Q2_K: dequantize_q2_k,
    GGMLType.Q3_K: dequantize_q3_k,
    GGMLType.Q4_K: dequantize_q4_k,
    GGMLType.Q5_K: dequantize_q5_k,
    GGMLType.Q6_K: dequantize_q6_k,
    GGMLType.Q8_K: dequantize_q8_k,
    GGMLType.IQ4_NL: dequantize_iq4_nl,
    GGMLType.IQ4_XS: dequantize_iq4_xs,
    GGMLType.TQ1_0: dequantize_tq1_0,
    GGMLType.TQ2_0: dequantize_tq2_0,
    GGMLType.IQ2_XXS: dequantize_iq2_xxs,
    GGMLType.IQ2_XS: dequantize_iq2_xs,
    GGMLType.IQ2_S: dequantize_iq2_s,
    GGMLType.IQ3_XXS: dequantize_iq3_xxs,
    GGMLType.IQ3_S: dequantize_iq3_s,
    GGMLType.IQ1_S: dequantize_iq1_s,
    GGMLType.IQ1_M: dequantize_iq1_m,
}

QUANTIZERS = {
    GGMLType.F32: lambda x: x.astype("<f4").tobytes(),
    GGMLType.F16: lambda x: x.astype("<f2").tobytes(),
    GGMLType.BF16: lambda x: (
        (x.astype(np.float32).view(np.uint32) >> 16).astype("<u2").tobytes()
    ),
    GGMLType.Q4_0: quantize_q4_0,
    GGMLType.Q4_1: quantize_q4_1,
    GGMLType.Q5_0: quantize_q5_0,
    GGMLType.Q5_1: quantize_q5_1,
    GGMLType.Q8_0: quantize_q8_0,
    GGMLType.Q2_K: quantize_q2_k,
    GGMLType.Q3_K: quantize_q3_k,
    GGMLType.Q4_K: quantize_q4_k,
    GGMLType.Q5_K: quantize_q5_k,
    GGMLType.Q6_K: quantize_q6_k,
    GGMLType.IQ4_NL: quantize_iq4_nl,
    GGMLType.TQ1_0: quantize_tq1_0,
    GGMLType.TQ2_0: quantize_tq2_0,
}


def dequantize(ggml_type: GGMLType, raw, shape) -> np.ndarray:
    n = int(np.prod(shape)) if shape else 0
    if n >= (1 << 16):  # large tensors: native C++ kernels when available
        from .native import native_dequant
        out = native_dequant(int(ggml_type), raw, n)
        if out is not None:
            return out.reshape(shape)
    return _dequantize_np(ggml_type, raw, shape)


def _dequantize_np(ggml_type: GGMLType, raw, shape) -> np.ndarray:
    n = int(np.prod(shape)) if shape else 1
    fn = DEQUANTIZERS.get(GGMLType(ggml_type))
    if fn is None:
        raise NotImplementedError(f"dequantize for {GGMLType(ggml_type).name}")
    return fn(raw, n).reshape(shape)


def quantize(ggml_type: GGMLType, x: np.ndarray) -> bytes:
    fn = QUANTIZERS.get(GGMLType(ggml_type))
    if fn is None:
        raise NotImplementedError(f"quantize for {GGMLType(ggml_type).name}")
    return fn(np.ascontiguousarray(x))
