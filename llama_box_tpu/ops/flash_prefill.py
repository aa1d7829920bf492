"""Batched deferred flash attention for prefill (Pallas).

One kernel serves EVERY prefill shape the engine produces (reference: all
prompt processing funnels through llama_decode's unified batch):

- batched multi-slot prefill ([S, T] chunks, one row per slot)
- int8-quantized KV caches (dequantized in VMEM, block by block)
- alternating/global sliding windows and llama4 chunked attention
  (window/chunk arrive as per-layer SCALAR operands, so the layer scan
  reuses one compiled kernel for local and global layers)
- gemma3 non-causal vision spans (per-row [st, en) override window)
- attention logit softcap (gemma2)

The cache stays READ-ONLY: the current chunk's K/V rows are a separate
operand handled as one extra block in the streaming-softmax loop, so the
kernel composes with the deferred-KV design (no per-layer cache copies;
see models/llama.py:_attn_deferred).

Layouts (all post-RoPE):
    q:       [B, Hkv, G, T, D]
    k/v:     [B, C, Hkv, D]    cache (bf16/f32 or int8 + [B, C, Hkv] scales)
    k/v rows:[B, T, Hkv, Dk/Dv] current chunk (full precision)
    meta:    [B, 4] int32      (pos0, n_valid, bidir_st, bidir_en)
    win:     [2]    int32      (swa_window, chunked_window) for THIS layer
Row r of slot b attends cache index c iff c < pos0[b] and c <= pos0[b]+r,
within the sliding window / aligned chunk when set, OR c in [st, en);
plus causal in-chunk attention over the rows themselves.
Output: [B, Hkv, G, T, Dv] f32.

Grid: (B, T/bq, C/bc + 1) — cache blocks innermost, then one final block
for the in-chunk rows. ALL KV heads are processed per invocation: the
cache layout keeps (Hkv, D) as the trailing dims, and Mosaic requires the
last two block dims to be (8, 128)-divisible or full — a per-head block
(…, 1, D) is illegal for Hkv > 1, while the full (Hkv, D) block is always
legal AND fetches each cache block exactly once (no per-head re-reads).
Inside the kernel a STATIC Python loop walks the heads so only one head's
[G, bq, bc] score intermediate is live at a time (Mosaic's scoped-VMEM
stack reuses the buffers across unrolled iterations); the position mask is
shared across heads and computed once per block.
Blocks at-or-after pos0 (nothing written yet) and blocks wholly below the
window/chunk floor skip both compute and (via index-map clamping onto the
same block) their DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _masked_update(h, s, mask, v, m_ref, l_ref, acc_ref):
    """One streaming-softmax update for head h: s [G,bq,bk] scores,
    mask [bq,bk], v [bk,Dv]."""
    s = jnp.where(mask[None, :, :], s, NEG_INF)
    m_prev = m_ref[h]                              # [G, bq]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    # zero masked entries explicitly: rows whose mask is all-false in a
    # block would otherwise contribute exp(NEG_INF - NEG_INF) = 1 terms
    p = jnp.exp(s - m_new[:, :, None]) * mask[None, :, :]  # [G, bq, bk]
    l_ref[h] = l_ref[h] * alpha + p.sum(-1)
    m_ref[h] = m_new
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [G, bq, Dv]
    acc_ref[h] = acc_ref[h] * alpha[:, :, None] + pv


def _flash_batched_kernel(meta_ref, win_ref, q_ref, k_ref, v_ref,
                          ks_ref, vs_ref, kr_ref, vr_ref, snk_ref, o_ref,
                          m_ref, l_ref, acc_ref, *,
                          bq: int, bc: int, n_c: int, n_kv: int, T: int,
                          scale: float, softcap: float, quant: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    pos0 = meta_ref[b, 0]
    n_valid = meta_ref[b, 1]
    st = meta_ref[b, 2]
    en = meta_ref[b, 3]
    window = win_ref[0]
    chunk = win_ref[1]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qpos = pos0 + i * bq \
        + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)  # [bq, 1]
    qdt = q_ref.dtype

    def scores(h, k):
        # q [G, bq, D] x k [bk, D] -> [G, bq, bk]; the MXU contracts the
        # rhs minor dim natively (no transpose materialized)
        s = jax.lax.dot_general(
            q_ref[0, h], k, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        return s

    def base_mask(kpos):
        """Causal + window/chunk + bidir-span mask vs absolute key
        positions kpos [bq, bk]."""
        mask = kpos <= qpos
        # scalar-gated window/chunk terms as pure logical ops: a select on
        # i1 vectors (jnp.where of bool operands) fails Mosaic legalization
        mask &= (window <= 0) | (kpos > qpos - window)
        mask &= (chunk <= 0) | (kpos // jnp.maximum(chunk, 1)
                                == qpos // jnp.maximum(chunk, 1))
        return mask | ((kpos >= st) & (kpos < en))

    # lowest cache position any q row in this block can see (window and
    # chunk floors; the bidir span may reach below it)
    qmin = pos0 + i * bq
    lo = jnp.where(window > 0, qmin - window + 1, 0)
    lo = jnp.maximum(lo, jnp.where(chunk > 0,
                                   qmin // jnp.maximum(chunk, 1)
                                   * jnp.maximum(chunk, 1), 0))
    lo = jnp.minimum(lo, jnp.where(en > st, st, lo))
    lo = jnp.maximum(lo, 0)

    need_cache = (j < n_c) & (j * bc < pos0) & ((j + 1) * bc > lo)

    @pl.when(need_cache)
    def _():
        kpos = j * bc + jax.lax.broadcasted_iota(jnp.int32, (bq, bc), 1)
        mask = base_mask(kpos) & (kpos < pos0)
        for h in range(n_kv):
            k = k_ref[0, :, h, :]                  # [bc, Dk]
            v = v_ref[0, :, h, :]
            if quant:
                k = k.astype(jnp.float32) * ks_ref[0, :, h][:, None]
                v = v.astype(jnp.float32) * vs_ref[0, :, h][:, None]
            _masked_update(h, scores(h, k.astype(qdt)), mask,
                           v.astype(qdt), m_ref, l_ref, acc_ref)

    @pl.when(j == n_c)
    def _():
        roff = jax.lax.broadcasted_iota(jnp.int32, (bq, T), 1)
        kpos = pos0 + roff
        mask = base_mask(kpos) & (roff < n_valid)
        for h in range(n_kv):
            k = kr_ref[0, :, h, :].astype(qdt)     # [T, Dk]
            v = vr_ref[0, :, h, :].astype(qdt)
            _masked_update(h, scores(h, k), mask, v, m_ref, l_ref, acc_ref)
            if snk_ref is not None:
                # gpt-oss attention sinks: a per-head logit joins the
                # softmax max + denominator (no value row) — folded into
                # the final normalize of the streaming softmax
                snk = snk_ref[h][:, None]                     # [G, 1]
                m_fin = jnp.maximum(m_ref[h], snk)
                l_fin = (l_ref[h] * jnp.exp(m_ref[h] - m_fin)
                         + jnp.exp(snk - m_fin))
                o_ref[0, h] = (acc_ref[h]
                               * jnp.exp(m_ref[h] - m_fin)[:, :, None]) \
                    / jnp.maximum(l_fin, 1e-30)[:, :, None]
            else:
                o_ref[0, h] = acc_ref[h] \
                    / jnp.maximum(l_ref[h], 1e-30)[:, :, None]


# soft budget for operand blocks + scratch + score intermediates (real VMEM
# is ~16 MiB/core; leave headroom for Mosaic's own buffers)
_VMEM_BUDGET = 11 * 1024 * 1024


def _fit_blocks(Hkv, G, T, C, D, Dv, bq, bc, itemsize):
    """Shrink (bq, bc) until the working set fits scoped VMEM. Shrinks bc
    first: smaller cache blocks don't change total HBM traffic, while
    smaller bq multiplies cache re-reads (one pass per q-row block)."""
    def vmem_bytes(bq, bc):
        bk = max(bc, T)
        inter = G * bq * bk * 10          # s + p (f32) + p bf16 copy
        q = Hkv * G * bq * D * itemsize * 2
        kv = bc * Hkv * (D + Dv) * itemsize * 2
        rows = T * Hkv * (D + Dv) * itemsize * 2
        out = Hkv * G * bq * Dv * 4 * 2
        scratch = Hkv * G * bq * (Dv + 2) * 4
        return inter + q + kv + rows + out + scratch

    while vmem_bytes(bq, bc) > _VMEM_BUDGET and bc > 128 and bc % 2 == 0:
        bc //= 2
    while vmem_bytes(bq, bc) > _VMEM_BUDGET and bq > 32 and bq % 2 == 0:
        bq //= 2
    return bq, bc


def flash_prefill_batched(q, k_cache, v_cache, k_rows, v_rows, meta, win,
                          k_scale=None, v_scale=None, *, sinks=None,
                          scale: float | None = None, softcap: float = 0.0,
                          bq: int = 256, bc: int = 512,
                          interpret: bool = False):
    """Batched deferred flash prefill.

    q:                [B, Hkv, G, T, D]  (bf16/f32, post-RoPE)
    k_cache/v_cache:  [B, C, Hkv, Dk/Dv] (bf16/f32, or int8 with scales)
    k_rows/v_rows:    [B, T, Hkv, Dk/Dv] current chunk (full precision)
    meta:             [B, 4] int32 (pos0, n_valid, bidir_st, bidir_en)
    win:              [2] int32 (swa_window, chunked_window) this layer
    k_scale/v_scale:  [B, C, Hkv] f32 when the cache is int8
    sinks:            [Hkv, G] f32 per-head attention-sink logits (gpt-oss)
    Returns [B, Hkv, G, T, Dv] f32.
    """
    import os
    bq = int(os.environ.get("LLAMA_BOX_TPU_FLASH_BQ", bq))
    bc = int(os.environ.get("LLAMA_BOX_TPU_FLASH_BC", bc))
    B, Hkv, G, T, D = q.shape
    C = k_cache.shape[1]
    Dv = v_cache.shape[-1]
    quant = k_scale is not None
    bq = min(bq, T)
    while T % bq:
        bq //= 2
    bc = min(bc, C)
    while C % bc:
        bc //= 2
    bq, bc = _fit_blocks(Hkv, G, T, C, D, Dv, bq, bc, q.dtype.itemsize)
    n_t = T // bq
    n_c = C // bc
    if scale is None:
        scale = D ** -0.5

    def clamp_j(j):
        # keep skipped iterations on the last fetched block so Mosaic's
        # pipeline dedups the (pointless) DMA
        return jnp.clip(j, 0, n_c - 1)

    in_specs = [
        pl.BlockSpec((1, Hkv, G, bq, D),
                     lambda b, i, j, *_: (b, 0, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bc, Hkv, D),
                     lambda b, i, j, *_: (b, clamp_j(j), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bc, Hkv, Dv),
                     lambda b, i, j, *_: (b, clamp_j(j), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q, k_cache, v_cache]
    if quant:
        in_specs += [
            pl.BlockSpec((1, bc, Hkv),
                         lambda b, i, j, *_: (b, clamp_j(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, Hkv),
                         lambda b, i, j, *_: (b, clamp_j(j), 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [k_scale.astype(jnp.float32),
                     v_scale.astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec((1, T, Hkv, D), lambda b, i, j, *_: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, Hkv, Dv), lambda b, i, j, *_: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [k_rows, v_rows]
    if sinks is not None:
        in_specs.append(pl.BlockSpec((Hkv, G), lambda b, i, j, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(sinks.astype(jnp.float32))

    kern = functools.partial(
        _flash_batched_kernel, bq=bq, bc=bc, n_c=n_c, n_kv=Hkv, T=T,
        scale=scale, softcap=softcap, quant=quant)
    has_sinks = sinks is not None
    if quant and has_sinks:
        kern2 = kern
    elif quant:
        def kern2(meta, win, q_r, k_r, v_r, ks_r, vs_r, kr_r, vr_r, *rest):
            return kern(meta, win, q_r, k_r, v_r, ks_r, vs_r, kr_r, vr_r,
                        None, *rest)
    elif has_sinks:
        def kern2(meta, win, q_r, k_r, v_r, kr_r, vr_r, snk_r, *rest):
            return kern(meta, win, q_r, k_r, v_r, None, None, kr_r, vr_r,
                        snk_r, *rest)
    else:
        def kern2(meta, win, q_r, k_r, v_r, kr_r, vr_r, *rest):
            return kern(meta, win, q_r, k_r, v_r, None, None, kr_r, vr_r,
                        None, *rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_t, n_c + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, G, bq, Dv),
                               lambda b, i, j, *_: (b, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G, bq), jnp.float32),       # running max
            pltpu.VMEM((Hkv, G, bq), jnp.float32),       # running normalizer
            pltpu.VMEM((Hkv, G, bq, Dv), jnp.float32),   # output accumulator
        ],
    )
    return pl.pallas_call(
        kern2, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, T, Dv), jnp.float32),
        interpret=interpret,
    )(meta.astype(jnp.int32), win.astype(jnp.int32), *operands)
