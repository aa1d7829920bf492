"""Single-query flash attention for chained decode (Pallas).

The decode-chain hot path (engine._decode_chain) attends ONE query row per
slot against (a) the read-only KV cache and (b) the chain's own not-yet-
scattered rows. The einsum path this replaces forced two whole-cache
relayout copies plus a ranged-attention slice at every dispatch boundary
(~650us/dispatch profiled at the bench shape): XLA lays the cache out
C-minor for the QK einsum but the scan carry/scatter want the default
D-minor layout. A Pallas kernel reads the cache in its default layout
directly, so the carry never relayouts.

Two critical TPU mechanics here:

1. POSITION-proportional traffic: the cache block index maps are clamped
   by the per-slot occupied region (meta arrives via scalar prefetch,
   which Pallas index maps can read), so blocks at/after the live
   position — and blocks wholly below the sliding-window floor —
   collapse onto an already-fetched block index and Mosaic's pipeline
   skips the duplicate DMA. This is the reference's n_kv-cells behavior
   (llama.cpp graphs compute over n_kv, not n_ctx) without engine-side
   attn_len bucketing or its per-bucket program variants.

2. The cache operand is the FULL layer-stacked array ([L, B, C, Hkv, D])
   with the layer index delivered as a scalar-prefetch operand consumed
   by the index maps. Passing a lax.scan-sliced per-layer cache instead
   forces XLA to MATERIALIZE the dynamic-slice as a real buffer (a
   pallas operand cannot fuse a slice): ~4 MB copied per layer per step
   at the bench shape, which measured 2.6x slower than the einsum path
   it was meant to beat.

Layouts (post-RoPE; B = slot batch):
    q:        [B, Hkv, G, D]      current query row per slot
    k/v:      [L, B, C, Hkv, Dk/Dv]  layer-stacked cache (bf16/f32, or
                                  int8 + [L, B, C, Hkv] scales)
    kr/vr:    [B, R, Hkv, Dk/Dv]  chain rows, row i at position
                                  cpos - (nv-1) + i, rows >= nv invalid
                                  (row nv-1 IS the current token's k/v)
    li:       [1] int32           layer index into the stacked cache
    meta:     [B, 2] int32        (cpos, nv)
    win:      [2]    int32        (swa_window, chunked_window) this layer
Output: [B, Hkv, G, Dv] f32.

Masking mirrors models/llama._attn_deferred's chain semantics: cache
index c attends iff c < cpos - (nv-1) (positions covered by the chain
rows are stale in the cache) and c is inside the window/chunk; chain row
i attends iff i < nv and its absolute position is valid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _update(h, s, mask, v, m_ref, l_ref, acc_ref):
    """Streaming-softmax update for head h: s [G, bk], mask [bk],
    v [bk, Dv]."""
    s = jnp.where(mask[None, :], s, NEG_INF)
    m_prev = m_ref[h]                                  # [G]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None]) * mask[None, :]    # [G, bk]
    l_ref[h] = l_ref[h] * alpha + p.sum(-1)
    m_ref[h] = m_new
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [G, Dv]
    acc_ref[h] = acc_ref[h] * alpha[:, None] + pv


def _flash_decode_kernel(li_ref, meta_ref, win_ref, q_ref, k_ref, v_ref,
                         ks_ref, vs_ref, kr_ref, vr_ref, snk_ref, o_ref,
                         m_ref, l_ref, acc_ref, *,
                         bc: int, n_c: int, n_kv: int, R: int,
                         scale: float, softcap: float, quant: bool):
    b = pl.program_id(0)
    j = pl.program_id(1)
    cpos = meta_ref[b, 0]
    nv = meta_ref[b, 1]
    window = win_ref[0]
    chunk = win_ref[1]
    cstart = cpos - nv + 1         # first position owned by the chain rows

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qdt = q_ref.dtype

    def scores(h, k):
        # q [G, D] x k [bk, D] -> [G, bk]
        s = jax.lax.dot_general(
            q_ref[0, h], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        return s

    def pos_mask(kpos):
        mask = kpos <= cpos
        mask &= (window <= 0) | (kpos > cpos - window)
        mask &= (chunk <= 0) | (kpos // jnp.maximum(chunk, 1)
                                == cpos // jnp.maximum(chunk, 1))
        return mask

    # lowest visible cache position (window / chunk floor)
    lo = jnp.where(window > 0, jnp.maximum(cpos - window + 1, 0), 0)
    lo = jnp.maximum(lo, jnp.where(
        chunk > 0, cpos // jnp.maximum(chunk, 1) * jnp.maximum(chunk, 1), 0))

    need_cache = (j < n_c) & (j * bc < cstart) & ((j + 1) * bc > lo)

    @pl.when(need_cache)
    def _():
        kpos = j * bc + jax.lax.broadcasted_iota(jnp.int32, (1, bc), 1)[0]
        mask = pos_mask(kpos) & (kpos < cstart)
        for h in range(n_kv):
            k = k_ref[0, 0, :, h, :]                   # [bc, Dk]
            v = v_ref[0, 0, :, h, :]
            if quant:
                k = k.astype(jnp.float32) \
                    * ks_ref[0, 0, :, h].astype(jnp.float32)[:, None]
                v = v.astype(jnp.float32) \
                    * vs_ref[0, 0, :, h].astype(jnp.float32)[:, None]
            _update(h, scores(h, k.astype(qdt)), mask, v.astype(qdt),
                    m_ref, l_ref, acc_ref)

    @pl.when(j == n_c)
    def _():
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)[0]
        kpos = cstart + ri
        mask = pos_mask(kpos) & (ri < nv) & (kpos >= 0)
        for h in range(n_kv):
            k = kr_ref[0, :, h, :].astype(qdt)         # [R, Dk]
            v = vr_ref[0, :, h, :].astype(qdt)
            _update(h, scores(h, k), mask, v, m_ref, l_ref, acc_ref)
            if snk_ref is not None:
                # gpt-oss sinks: per-head logit joins max + denominator
                snk = snk_ref[h]                       # [G]
                m_fin = jnp.maximum(m_ref[h], snk)
                l_fin = (l_ref[h] * jnp.exp(m_ref[h] - m_fin)
                         + jnp.exp(snk - m_fin))
                o_ref[0, h] = (acc_ref[h]
                               * jnp.exp(m_ref[h] - m_fin)[:, None]) \
                    / jnp.maximum(l_fin, 1e-30)[:, None]
            else:
                o_ref[0, h] = acc_ref[h] \
                    / jnp.maximum(l_ref[h], 1e-30)[:, None]


def flash_decode(q, k_cache, v_cache, k_rows, v_rows, meta, win,
                 k_scale=None, v_scale=None, *, layer=None, sinks=None,
                 scale: float | None = None, softcap: float = 0.0,
                 bc: int = 512, interpret: bool = False):
    """Single-query chained-decode attention (see module docstring).

    q [B, Hkv, G, D]; k/v_cache [B, C, Hkv, Dk/Dv] — or the full
    layer-stacked [L, B, C, Hkv, Dk/Dv] with `layer` a traced int32
    index (the hot path: the kernel slices the layer via its index maps,
    where XLA would materialize a lax.scan slice). k/v_rows
    [B, R, Hkv, Dk/Dv]; meta [B, 2] (cpos, nv); win [2].
    Returns [B, Hkv, G, Dv] f32."""
    import os
    bc = int(os.environ.get("LLAMA_BOX_TPU_DECODE_BC", bc))
    B, Hkv, G, D = q.shape
    if layer is None:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        if k_scale is not None:
            k_scale = k_scale[None]
            v_scale = v_scale[None]
        layer = jnp.zeros((), jnp.int32)
    C = k_cache.shape[2]
    Dv = v_cache.shape[-1]
    R = k_rows.shape[1]
    quant = k_scale is not None
    bc = min(bc, C)
    while C % bc:
        bc //= 2
    n_c = C // bc
    if scale is None:
        scale = D ** -0.5
    li = jnp.reshape(layer, (1,)).astype(jnp.int32)

    def blk_lo(b, meta, win):
        # window/chunk floor block (matches the kernel's `lo`)
        cpos = meta[b, 0]
        lo = jnp.where(win[0] > 0, jnp.maximum(cpos - win[0] + 1, 0), 0)
        ch = jnp.maximum(win[1], 1)
        lo = jnp.maximum(lo, jnp.where(win[1] > 0, cpos // ch * ch, 0))
        return lo // bc

    def blk_hi(b, meta):
        # last block holding positions < cstart (>= blk_lo by clamping)
        cstart = meta[b, 0] - meta[b, 1] + 1
        return jnp.maximum((cstart - 1) // bc, 0)

    def cache_map(b, j, li, meta, win):
        jc = jnp.clip(j, blk_lo(b, meta, win),
                      jnp.maximum(blk_hi(b, meta), blk_lo(b, meta, win)))
        return (li[0], b, jc, 0, 0)

    def smap(b, j, li, meta, win):
        _, b_, jc, _, _ = cache_map(b, j, li, meta, win)
        return (li[0], b_, jc, 0)

    in_specs = [
        pl.BlockSpec((1, Hkv, G, D), lambda b, j, *_: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bc, Hkv, D), cache_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bc, Hkv, Dv), cache_map,
                     memory_space=pltpu.VMEM),
    ]
    operands = [q, k_cache, v_cache]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, bc, Hkv), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bc, Hkv), smap, memory_space=pltpu.VMEM),
        ]
        operands += [k_scale, v_scale]  # dtype conversion happens in VMEM
    in_specs += [
        pl.BlockSpec((1, R, Hkv, D), lambda b, j, *_: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, Hkv, Dv), lambda b, j, *_: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [k_rows, v_rows]
    if sinks is not None:
        in_specs.append(pl.BlockSpec((Hkv, G), lambda b, j, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(sinks.astype(jnp.float32))

    kern = functools.partial(
        _flash_decode_kernel, bc=bc, n_c=n_c, n_kv=Hkv, R=R,
        scale=scale, softcap=softcap, quant=quant)
    has_sinks = sinks is not None
    if quant and has_sinks:
        kern2 = kern
    elif quant:
        def kern2(li, meta, win, q_r, k_r, v_r, ks_r, vs_r, kr_r, vr_r,
                  *rest):
            return kern(li, meta, win, q_r, k_r, v_r, ks_r, vs_r, kr_r,
                        vr_r, None, *rest)
    elif has_sinks:
        def kern2(li, meta, win, q_r, k_r, v_r, kr_r, vr_r, snk_r, *rest):
            return kern(li, meta, win, q_r, k_r, v_r, None, None, kr_r,
                        vr_r, snk_r, *rest)
    else:
        def kern2(li, meta, win, q_r, k_r, v_r, kr_r, vr_r, *rest):
            return kern(li, meta, win, q_r, k_r, v_r, None, None, kr_r,
                        vr_r, None, *rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_c + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, G, Dv), lambda b, j, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G), jnp.float32),         # running max
            pltpu.VMEM((Hkv, G), jnp.float32),         # running normalizer
            pltpu.VMEM((Hkv, G, Dv), jnp.float32),     # output accumulator
        ],
    )
    return pl.pallas_call(
        kern2, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Dv), jnp.float32),
        interpret=interpret,
    )(li, meta.astype(jnp.int32), win.astype(jnp.int32), *operands)
