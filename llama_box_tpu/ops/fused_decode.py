"""Fused w8a8 decode-layer kernels (Pallas).

The decode step is HBM-bound: every weight byte streams once per step and
the MXU work is trivial at batch 4-8 rows. What the XLA program leaves on
the table is the VPU *tail* — the ~80 tiny elementwise ops per layer
(norms, activation quantization, silu, residual adds) that each pay a
fusion-boundary fixed cost inside the layer scan (profiled ~15us/layer,
~0.33ms/step on TinyLlama-1.1B). These kernels fold that tail into the
matmuls' prologues/epilogues so a layer becomes two Pallas calls plus the
attention einsums:

- fused_norm_qmm:   rms_norm -> act-quantize -> s8xs8 matmul -> rescale
                    (serves the fused wqkv projection and the output/vocab
                    matmul, replacing 2 XLA fusions + matmul each)
- fused_layer_tail: act-quantize(attn_out) -> wo matmul -> +residual ->
                    rms_norm -> quantize -> gate|up matmul -> silu*up ->
                    quantize -> down matmul -> +residual, ONE phased-grid
                    kernel streaming wo/gateup/down exactly once.

Numerics replicate the unfused path bit-for-bit where it matters: the
same f32 norm math, the same bf16 round-trips between matmuls (mm()
returns x.dtype), and the same per-row symmetric int8 activation
quantization (ops/qmatmul._w8a8_matmul), so greedy decode through these
kernels matches the XLA path (exactness asserted in
tests/test_fused_decode.py; the engine identity tests compare like paths).

Reference parity: this replaces ggml's fused mat-vec + elementwise graph
nodes on the decode hot path (llama-box httpserver.hpp:4192 fused
llama_decode; the graph executes norm/mul_mat/silu nodes back-to-back on
CUDA — on TPU the equivalent is one Mosaic program per weight stream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_ROWS = 64          # fused kernels serve decode/verify widths only


def _pick_tile(dim: int, caps=(512, 256, 128)) -> int:
    for c in caps:
        if dim % c == 0:
            return c
    return 0


def _rms_bf16(x32, nw32, eps):
    """f32 rows -> normed rows rounded to bf16 (matches ops/norm.rms_norm
    on a bf16 input followed by mm()'s f32 upcast)."""
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * nw32).astype(jnp.bfloat16)


def _quant_rows(hf):
    """Per-row symmetric int8 (exactly ops/qmatmul._w8a8_matmul)."""
    xs = jnp.maximum(jnp.abs(hf).max(axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(hf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _norm_qmm_kernel(x_ref, nw_ref, qs_ref, sc_ref, out_ref, *, eps):
    x32 = x_ref[:].astype(jnp.float32)
    h = _rms_bf16(x32, nw_ref[:].astype(jnp.float32), eps)
    xq, xs = _quant_rows(h.astype(jnp.float32))
    acc = jnp.dot(xq, qs_ref[:], preferred_element_type=jnp.int32)
    out_ref[:] = (acc.astype(jnp.float32) * xs
                  * sc_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def fused_norm_qmm(x, nw, qs, scales, *, eps: float,
                   interpret: bool = False):
    """x [R, E] -> rms_norm(x, nw) @ dequant(qs) as bf16 [R, O].

    qs: [E, O] int8 per-column weights, scales: [O] f32. R <= _MAX_ROWS
    (decode/verify widths); caller pads R to a multiple of 8."""
    R, E = x.shape
    O = qs.shape[1]
    ot = _pick_tile(O)
    assert ot and R <= _MAX_ROWS and R % 8 == 0, (R, O)
    grid = (O // ot,)
    kern = functools.partial(_norm_qmm_kernel, eps=eps)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((R, E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),              # x
            pl.BlockSpec((1, E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),              # norm w
            pl.BlockSpec((E, ot), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # weights
            pl.BlockSpec((1, ot), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # col scales
        ],
        out_specs=pl.BlockSpec((R, ot), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, O), jnp.bfloat16),
        interpret=interpret,
    )(x, nw.reshape(1, E), qs, scales.reshape(1, O))


def _act_f32(gate32, act_fn: str):
    if act_fn == "gelu":
        return jax.nn.gelu(gate32, approximate=True)
    if act_fn == "relu2":
        return jnp.square(jax.nn.relu(gate32))
    return jax.nn.silu(gate32)


def _tail_kernel(ao_ref, xres_ref, wo_qs_ref, wo_sc_ref, nw_ref,
                 gu_g_ref, gu_gsc_ref, gu_u_ref, gu_usc_ref,
                 dn_qs_ref, dn_sc_ref, out_ref,
                 xnew_ref, aoq_ref, aos_ref, hq_ref, hs_ref,
                 act_ref, actq_ref, as_ref, *,
                 eps: float, rs: float, act_fn: str,
                 n_wo: int, n_gu: int, n_dn: int):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        aoq, aos = _quant_rows(ao_ref[:].astype(jnp.float32))
        aoq_ref[:] = aoq
        aos_ref[:] = jnp.broadcast_to(aos, aos_ref.shape)

    # phase 1: attn output projection + residual, one E tile per step
    @pl.when(k < n_wo)
    def _():
        acc = jnp.dot(aoq_ref[:], wo_qs_ref[:],
                      preferred_element_type=jnp.int32)
        attn_out = (acc.astype(jnp.float32) * aos_ref[:, :1]
                    * wo_sc_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        xnew = (xres_ref[:].astype(jnp.bfloat16)
                + attn_out * jnp.bfloat16(rs))
        ot = attn_out.shape[1]
        xnew_ref[pl.ds(0, xnew.shape[0]), pl.ds(k * ot, ot)] = xnew

    # phase 2 entry: norm + quantize the FFN input once
    @pl.when(k == n_wo)
    def _():
        h = _rms_bf16(xnew_ref[:].astype(jnp.float32),
                      nw_ref[:].astype(jnp.float32), eps)
        hq, hs = _quant_rows(h.astype(jnp.float32))
        hq_ref[:] = hq
        hs_ref[:] = jnp.broadcast_to(hs, hs_ref.shape)

    # phase 2: gate|up tiles -> activation tile (bf16, matching the
    # unfused path's act.astype(x.dtype) before the down matmul)
    @pl.when((k >= n_wo) & (k < n_wo + n_gu))
    def _():
        j = k - n_wo
        hs = hs_ref[:, :1]
        g = jnp.dot(hq_ref[:], gu_g_ref[:],
                    preferred_element_type=jnp.int32)
        gate = (g.astype(jnp.float32) * hs
                * gu_gsc_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        u = jnp.dot(hq_ref[:], gu_u_ref[:],
                    preferred_element_type=jnp.int32)
        up = (u.astype(jnp.float32) * hs
              * gu_usc_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        act = (_act_f32(gate.astype(jnp.float32), act_fn)
               * up.astype(jnp.float32)).astype(jnp.bfloat16)
        otf = act.shape[1]
        act_ref[pl.ds(0, act.shape[0]), pl.ds(j * otf, otf)] = act

    # phase 3 entry: quantize the whole activation row set once
    @pl.when(k == n_wo + n_gu)
    def _():
        aq, asc = _quant_rows(act_ref[:].astype(jnp.float32))
        actq_ref[:] = aq
        as_ref[:] = jnp.broadcast_to(asc, as_ref.shape)

    # phase 3: down projection + residual, one E tile per step
    @pl.when(k >= n_wo + n_gu)
    def _():
        j = k - n_wo - n_gu
        acc = jnp.dot(actq_ref[:], dn_qs_ref[:],
                      preferred_element_type=jnp.int32)
        ffn_out = (acc.astype(jnp.float32) * as_ref[:, :1]
                   * dn_sc_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        ot = ffn_out.shape[1]
        xnew = xnew_ref[pl.ds(0, ffn_out.shape[0]), pl.ds(j * ot, ot)]
        out_ref[:] = xnew + ffn_out * jnp.bfloat16(rs)


def fused_layer_tail(ao, x_res, wo_qs, wo_sc, ffn_nw,
                     gu_qs, gu_sc, dn_qs, dn_sc, *,
                     eps: float, rs: float = 1.0, act_fn: str = "silu",
                     interpret: bool = False):
    """One kernel for the whole post-attention layer tail.

    ao [R, HD] attention output (bf16), x_res [R, E] residual stream.
    wo_qs [HD, E], gu_qs [E, 2*FF] (gate cols first), dn_qs [FF, E] —
    all per-column int8 with f32 scales. Returns x_out [R, E] bf16.
    """
    R, HD = ao.shape
    E = x_res.shape[1]
    FF2 = gu_qs.shape[1]
    FF = FF2 // 2
    ote = _pick_tile(E, (256, 128))
    otf = _pick_tile(FF, (512, 256, 128))
    assert ote and otf and R <= _MAX_ROWS and R % 8 == 0, (R, E, FF)
    n_wo, n_gu, n_dn = E // ote, FF // otf, E // ote
    grid = (n_wo + n_gu + n_dn,)

    def womap(k):
        return (0, jnp.minimum(k, n_wo - 1))

    def gmap(k):
        return (0, jnp.clip(k - n_wo, 0, n_gu - 1))

    def umap(k):
        return (0, n_gu + jnp.clip(k - n_wo, 0, n_gu - 1))

    def dmap(k):
        return (0, jnp.clip(k - n_wo - n_gu, 0, n_dn - 1))

    kern = functools.partial(_tail_kernel, eps=eps, rs=rs, act_fn=act_fn,
                             n_wo=n_wo, n_gu=n_gu, n_dn=n_dn)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((R, HD), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),               # ao
            pl.BlockSpec((R, ote), womap, memory_space=pltpu.VMEM),  # x_res
            pl.BlockSpec((HD, ote), womap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ote), womap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),               # ffn norm
            pl.BlockSpec((E, otf), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, otf), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, otf), umap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, otf), umap, memory_space=pltpu.VMEM),
            pl.BlockSpec((FF, ote), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ote), dmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, ote), dmap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, E), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((R, E), jnp.bfloat16),    # xnew
            pltpu.VMEM((R, HD), jnp.int8),       # aoq
            pltpu.VMEM((R, 128), jnp.float32),   # aos
            pltpu.VMEM((R, E), jnp.int8),        # hq
            pltpu.VMEM((R, 128), jnp.float32),   # hs
            pltpu.VMEM((R, FF), jnp.bfloat16),   # act
            pltpu.VMEM((R, FF), jnp.int8),       # actq
            pltpu.VMEM((R, 128), jnp.float32),   # as
        ],
        interpret=interpret,
    )(ao, x_res, wo_qs, wo_sc.reshape(1, E), ffn_nw.reshape(1, E),
      gu_qs, gu_sc.reshape(1, FF2), gu_qs, gu_sc.reshape(1, FF2),
      dn_qs, dn_sc.reshape(1, E))
