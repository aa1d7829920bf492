"""Quantized-resident weights: QTensor pytree + fused dequant-matmul.

The TPU-native replacement for ggml's quantized mat-vec kernels: weights
stay packed in HBM (int4 nibbles / int8 codes + per-group f32 scales) and
dequantization happens in VMEM inside the matmul kernel, so each decode
step streams ~0.6-1.1 bytes/weight instead of 2 (bf16).

Layout ([in, out] matmul convention, loader transposes GGUF [out, in]):
- 4-bit: qs int8 [in/2, out] — HALVES packing: byte row r holds global row
  r in the low nibble and row r + in/2 in the high nibble, so unpacking is
  two masks + two matmul accumulations with NO lane interleaving.
- 8-bit: qs int8 [in, out].
- scales f32 [in/group, out]; mins f32 [in/group, out] or None.
  w[i, o] = scales[i // group, o] * q[i, o] - mins[i // group, o]

The min term never materializes per-weight: sum_i x[b,i]*m[g(i),o] equals
(group-summed x) @ mins, one extra skinny matmul (llama.cpp's Q8_1 sum
trick, done the XLA way).

Kernel grid: (out_tiles, in_tiles), f32 accumulator in VMEM scratch,
revisiting the same out tile across the in dimension.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_pytree_node_class
class QTensor:
    """Packed quantized 2D weight (or a [L, ...] stack of them).

    w8a8: per-COLUMN int8 weights + f32 column scales; matmuls quantize
    the activations per row and run s8xs8->s32 on the MXU (half the HBM
    bytes of bf16 AND double the matmul rate — measured 2.0x on v5e).

    sharded: the tensor's leaves carry NamedShardings over a device mesh
    (the TPU-native equivalent of the reference's --tensor-split over
    quantized tensors, engine_param.hpp:286-293). It lives in the pytree
    AUX data so jit retraces when it changes: sharded grouped/packed
    tensors take the pure-XLA matmul path, which GSPMD partitions (the
    Pallas kernel is a single custom call the partitioner can't split);
    the default w8a8 path is pure XLA already and shards natively."""

    def __init__(self, qs, scales, mins, in_dim: int, group: int,
                 packed4: bool, w8a8: bool = False, sharded: bool = False):
        self.qs = qs
        self.scales = scales
        self.mins = mins
        self.in_dim = in_dim
        self.group = group
        self.packed4 = packed4
        self.w8a8 = w8a8
        self.sharded = sharded

    @property
    def out_dim(self) -> int:
        return self.qs.shape[-1]

    def tree_flatten(self):
        return (self.qs, self.scales, self.mins), (self.in_dim, self.group,
                                                   self.packed4, self.w8a8,
                                                   self.sharded)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qs, scales, mins = children
        return cls(qs, scales, mins, *aux)

    def __repr__(self):
        return (f"QTensor(in={self.in_dim}, out={self.qs.shape[-1]}, "
                f"group={self.group}, packed4={self.packed4}, "
                f"w8a8={self.w8a8}, sharded={self.sharded})")


def pack_repacked(rt, shape_in_out: tuple[int, int],
                  device: bool = True) -> QTensor:
    """RepackedTensor (flat, GGUF [out, in] row-major order) -> QTensor
    device arrays in [in, out] layout.

    Scales/mins are stored bf16 by default: measured 3.4x faster dequant
    (the scale multiply rides the VPU in bf16 and streams half the bytes);
    set LLAMA_BOX_TPU_Q4_F32SCALES=1 for exact f32 scales.

    LLAMA_BOX_TPU_Q4_INT8=1 keeps 4-bit formats resident as unpacked int8
    codes (1 byte/weight instead of 0.5): skips the nibble unpack in the
    kernel at 2x the HBM traffic.

    Default residency is W8A8 (per-column int8 + int8 activations on the
    MXU): 1 byte/weight and s8xs8->s32 matmuls, measured 2x bf16 decode.
    LLAMA_BOX_TPU_PACKED4=1 opts into the 0.5 byte/weight nibble-packed
    kernel when HBM capacity is the binding constraint.

    device=False keeps leaves as host numpy arrays (ml_dtypes bfloat16 for
    scales) so the loader can stack layers on the host and device_put once
    with a NamedSharding (pack-then-shard for multi-chip)."""
    import os

    if not (os.environ.get("LLAMA_BOX_TPU_PACKED4")
            or os.environ.get("LLAMA_BOX_TPU_Q4_INT8")
            or os.environ.get("LLAMA_BOX_TPU_Q4_F32SCALES")):
        return pack_w8a8(rt, shape_in_out, device=device)

    import ml_dtypes

    from ..gguf.repack import RepackedTensor  # noqa: F401 (doc)
    sdt = (np.float32 if os.environ.get("LLAMA_BOX_TPU_Q4_F32SCALES")
           else ml_dtypes.bfloat16)
    arr = jnp.asarray if device else np.ascontiguousarray
    out_dim, in_dim = shape_in_out[1], shape_in_out[0]
    # rt.q is flat in GGUF (out, in) order
    q = rt.q.reshape(out_dim, in_dim).T                      # [in, out]
    scales = rt.scales.reshape(out_dim, in_dim // rt.group).T
    mins = (rt.mins.reshape(out_dim, in_dim // rt.group).T
            if rt.mins is not None else None)
    if rt.qbits == 4 and not os.environ.get("LLAMA_BOX_TPU_Q4_INT8"):
        half = in_dim // 2
        packed = (q[:half].astype(np.uint8)
                  | (q[half:].astype(np.uint8) << 4)).astype(np.int8)
        qs = arr(packed)
        packed4 = True
    else:
        qs = arr(q.astype(np.int8))
        packed4 = False
    return QTensor(qs, arr(scales.astype(sdt)),
                   arr(mins.astype(sdt)) if mins is not None
                   else None, in_dim, rt.group, packed4)


def pack_w8a8(rt, shape_in_out: tuple[int, int],
              device: bool = True) -> QTensor:
    """RepackedTensor -> per-column int8 residency (W8A8). The group
    quantization is dequantized exactly, then requantized symmetric int8
    per output column."""
    arr = jnp.asarray if device else np.ascontiguousarray
    out_dim, in_dim = shape_in_out[1], shape_in_out[0]
    q = rt.q.reshape(out_dim, in_dim).astype(np.float32)
    scales = np.repeat(rt.scales.reshape(out_dim, in_dim // rt.group),
                       rt.group, axis=1)
    wf = q * scales
    if rt.mins is not None:
        wf = wf - np.repeat(rt.mins.reshape(out_dim, in_dim // rt.group),
                            rt.group, axis=1)
    wf = wf.T                                         # [in, out]
    col = np.maximum(np.abs(wf).max(axis=0), 1e-12) / 127.0   # [out]
    q8 = np.clip(np.round(wf / col), -127, 127).astype(np.int8)
    return QTensor(arr(q8), arr(col.astype(np.float32)), None,
                   in_dim, in_dim, packed4=False, w8a8=True)


def _w8a8_matmul(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    """x [B, in] any float dtype -> [B, out] f32. Per-row activation
    quantization + one s8xs8->s32 MXU matmul + rank-1 rescale (XLA fuses
    the quantize and rescale into the matmul's prologue/epilogue)."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.abs(xf).max(axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot(xq, w.qs, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * w.scales[None, :]


# -- reference implementation (XLA; used on CPU and for validation) ----------


def q_matmul_ref(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    """Dequantize-then-matmul (materializes the bf16 weight — correctness
    baseline and CPU path)."""
    if w.w8a8:
        wf = w.qs.astype(jnp.float32) * w.scales[None, :]
        return (x.astype(jnp.float32) @ wf).astype(jnp.float32)
    if w.packed4:
        lo = (w.qs & 0x0F).astype(jnp.float32)
        hi = ((w.qs >> 4) & 0x0F).astype(jnp.float32)
        q = jnp.concatenate([lo, hi], axis=0)
    else:
        q = w.qs.astype(jnp.float32)
    s = jnp.repeat(w.scales, w.group, axis=0)
    wf = q * s
    if w.mins is not None:
        wf = wf - jnp.repeat(w.mins, w.group, axis=0)
    return (x.astype(jnp.float32) @ wf).astype(jnp.float32)


# -- pallas kernel -----------------------------------------------------------


def _expand_groups(s: jnp.ndarray, group: int) -> jnp.ndarray:
    """[G, O] per-group scales -> [G*group, O] per-row (element repeat;
    pltpu.repeat has tile semantics, so build it from a broadcast)."""
    gpb, ot = s.shape
    return jnp.broadcast_to(s[:, None, :], (gpb, group, ot)).reshape(
        gpb * group, ot)


def _q4_kernel(x_lo_ref, x_hi_ref, qs_ref, sc_lo_ref, sc_hi_ref,
               mn_lo_ref, mn_hi_ref, out_ref, acc_ref, *,
               group: int, n_in_tiles: int, has_min: bool):
    """One (out_tile, in_tile) step, all operands delivered as BlockSpec
    tiles (no in-kernel dynamic slicing — Mosaic-friendly).
    qs_ref [bt, OT]: byte row r = weight rows (lo: r, hi: r + in/2)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qs = qs_ref[:].astype(jnp.int32)  # int8 bit-ops don't legalize on VPU
    lo = (qs & 0x0F).astype(jnp.float32)
    hi = ((qs >> 4) & 0x0F).astype(jnp.float32)
    w_lo = lo * _expand_groups(sc_lo_ref[:], group)
    w_hi = hi * _expand_groups(sc_hi_ref[:], group)
    if has_min:
        w_lo = w_lo - _expand_groups(mn_lo_ref[:], group)
        w_hi = w_hi - _expand_groups(mn_hi_ref[:], group)

    x_lo = x_lo_ref[:].astype(jnp.bfloat16)
    x_hi = x_hi_ref[:].astype(jnp.bfloat16)
    acc = acc_ref[:]
    acc += jnp.dot(x_lo, w_lo.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi, w_hi.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == n_in_tiles - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _q8_kernel(x_ref, qs_ref, sc_ref, mn_ref, out_ref, acc_ref, *,
               group: int, n_in_tiles: int, has_min: bool):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = qs_ref[:].astype(jnp.float32)
    w = q * _expand_groups(sc_ref[:], group)
    if has_min:
        w = w - _expand_groups(mn_ref[:], group)
    x = x_ref[:].astype(jnp.bfloat16)
    acc = acc_ref[:]
    acc += jnp.dot(x, w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == n_in_tiles - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _choose_tiles(byte_rows: int, out_dim: int, group: int
                  ) -> tuple[int, int]:
    """Largest in-tile <= 1024 byte-rows that divides byte_rows and is a
    multiple of `group`; largest dividing out-tile <= 2048.
    LLAMA_BOX_TPU_Q4_BT / _Q4_OT override for tuning. Defaults from the
    r5 on-chip sweep at the bench shape (tok/s, K-chained decode):
    bt512/ot256 1105 (old default), bt1024/ot512 1264, bt1024/ot1024
    1290, bt1024/ot2048 1337 — fewer grid steps amortize the per-tile
    unpack/dequant fixed cost; the kernel is VPU-unpack-bound, not
    HBM-bound, so bigger tiles keep paying until VMEM pressure."""
    import os
    bt_cap = int(os.environ.get("LLAMA_BOX_TPU_Q4_BT", 1024))
    ot_cap = int(os.environ.get("LLAMA_BOX_TPU_Q4_OT", 2048))
    bt = min(byte_rows, bt_cap)
    while byte_rows % bt or bt % group:
        bt //= 2
        if bt < group:
            bt = byte_rows  # tiny test shapes: single tile
            break
    ot = ot_cap
    while ot > 128 and out_dim % ot:
        ot //= 2
    if out_dim % ot:
        ot = out_dim
    return bt, ot


def q_matmul_pallas(x: jnp.ndarray, w: QTensor,
                    interpret: bool = False) -> jnp.ndarray:
    """x: [B, in] -> [B, out] f32. B should be a multiple of 8 (pad)."""
    B = x.shape[0]
    in_dim, out_dim = w.in_dim, w.out_dim
    byte_rows = w.qs.shape[0]
    bt, ot = _choose_tiles(byte_rows, out_dim, w.group)
    n_in = byte_rows // bt
    n_out = out_dim // ot
    gpb = bt // w.group
    has_min = w.mins is not None
    mins = w.mins if has_min else w.scales  # placeholder ref (unused)
    grid = (n_out, n_in)
    scratch = [pltpu.VMEM((B, ot), jnp.float32)]
    out_spec = pl.BlockSpec((B, ot), lambda i, k: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, out_dim), jnp.float32)

    if w.packed4:
        kern = functools.partial(_q4_kernel, group=w.group, n_in_tiles=n_in,
                                 has_min=has_min)
        # hi-half operands live n_in blocks after the lo half
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pl.BlockSpec((B, bt), lambda i, k: (0, k),
                             memory_space=pltpu.VMEM),           # x lo
                pl.BlockSpec((B, bt), lambda i, k: (0, k + n_in),
                             memory_space=pltpu.VMEM),           # x hi
                pl.BlockSpec((bt, ot), lambda i, k: (k, i),
                             memory_space=pltpu.VMEM),           # qs
                pl.BlockSpec((gpb, ot), lambda i, k: (k, i),
                             memory_space=pltpu.VMEM),           # sc lo
                pl.BlockSpec((gpb, ot), lambda i, k: (k + n_in, i),
                             memory_space=pltpu.VMEM),           # sc hi
                pl.BlockSpec((gpb, ot), lambda i, k: (k, i),
                             memory_space=pltpu.VMEM),           # mn lo
                pl.BlockSpec((gpb, ot), lambda i, k: (k + n_in, i),
                             memory_space=pltpu.VMEM),           # mn hi
            ],
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
        )(x, x, w.qs, w.scales, w.scales, mins, mins)

    kern = functools.partial(_q8_kernel, group=w.group, n_in_tiles=n_in,
                             has_min=has_min)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((B, bt), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ot), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, ot), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, ot), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec, out_shape=out_shape,
        scratch_shapes=scratch, interpret=interpret,
    )(x, w.qs, w.scales, mins)


# -- dispatch ----------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False


def mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul dispatch: dense jnp array or QTensor. x: [..., in]."""
    if not isinstance(w, QTensor):
        return x @ w
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    if w.w8a8:
        return _w8a8_matmul(xf, w).reshape(*lead, w.out_dim).astype(x.dtype)
    B = xf.shape[0]
    pad = (-B) % 8
    if _on_tpu() and not w.sharded:
        if pad:
            xf = jnp.pad(xf, ((0, pad), (0, 0)))
        out = q_matmul_pallas(xf, w)
        if pad:
            out = out[:B]
    else:
        out = q_matmul_ref(xf, w)
    return out.reshape(*lead, w.out_dim).astype(x.dtype)
