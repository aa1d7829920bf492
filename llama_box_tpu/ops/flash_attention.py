"""Grouped-query flash attention for prefill (Pallas).

The XLA reference path materializes [T, C] score matrices per head; for a
512-token chunk against a 4k cache that's hundreds of MB of HBM traffic per
layer. This kernel computes attention with the classic streaming-softmax
(running max / normalizer) over cache blocks, keeping everything in VMEM —
the prefill side of the "grouped-query flash attention" requirement
(BASELINE.md north star).

Layout (single slot prefill, B == 1):
    q:  [Hkv, G, T, D]   current chunk queries (post-RoPE), grouped by
                         kv head (G = n_heads / n_kv_heads)
    k,v:[Hkv, C, D]      the slot's full cache (current chunk already
                         scattered in)
    q_pos0: absolute position of q row 0; row i attends cache index c iff
            c <= q_pos0 + i (and within the sliding window if swa > 0)
Output: [Hkv, G, T, D] f32.

Grid: (Hkv, T/bq, C/bc) with the cache dimension innermost; running
(m, l, acc) live in VMEM scratch across the cache loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(qpos_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *,
                  bq: int, bc: int, n_c: int, scale: float, swa: int,
                  softcap: float):
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                      # [G, bq, D]
    k = k_ref[0]                      # [bc, D]
    v = v_ref[0]
    G, _, D = q.shape

    s = jax.lax.dot_general(
        q, k, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [G, bq, bc]
    if softcap > 0.0:
        s = softcap * jnp.tanh(s / softcap)

    qpos = qpos_ref[0] + i * bq \
        + jax.lax.broadcasted_iota(jnp.int32, (bq, bc), 0)
    kpos = j * bc + jax.lax.broadcasted_iota(jnp.int32, (bq, bc), 1)
    mask = kpos <= qpos
    if swa > 0:
        mask &= kpos > qpos - swa
    s = jnp.where(mask[None, :, :], s, NEG_INF)

    m_prev = m_ref[:]                 # [G, bq]
    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, :, None])         # [G, bq, bc]
    l_ref[:] = l_ref[:] * alpha + p.sum(-1)
    m_ref[:] = m_new

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # [G, bq, D]
    acc_ref[:] = acc_ref[:] * alpha[:, :, None] + pv

    @pl.when(j == n_c - 1)
    def _():
        o_ref[0] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)[:, :, None]


def flash_attention_prefill(q, k, v, q_pos0, *, scale: float | None = None,
                            swa: int = 0, softcap: float = 0.0,
                            bq: int = 128, bc: int = 256,
                            interpret: bool = False):
    """q: [Hkv, G, T, D]; k, v: [Hkv, C, D]; q_pos0: scalar int32.
    Returns [Hkv, G, T, D] f32."""
    Hkv, G, T, D = q.shape
    C = k.shape[1]
    bq = min(bq, T)
    while T % bq:
        bq //= 2
    bc = min(bc, C)
    while C % bc:
        bc //= 2
    n_t = T // bq
    n_c = C // bc
    if scale is None:
        scale = D ** -0.5

    kern = functools.partial(_flash_kernel, bq=bq, bc=bc, n_c=n_c,
                             scale=scale, swa=swa, softcap=softcap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hkv, n_t, n_c),
        in_specs=[
            pl.BlockSpec((1, G, bq, D), lambda h, i, j, *_: (h, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, D), lambda h, i, j, *_: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, D), lambda h, i, j, *_: (h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, bq, D), lambda h, i, j, *_: (h, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, bq), jnp.float32),       # running max
            pltpu.VMEM((G, bq), jnp.float32),       # running normalizer
            pltpu.VMEM((G, bq, D), jnp.float32),    # output accumulator
        ],
    )
    qpos = jnp.asarray([q_pos0], jnp.int32)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, G, T, D), jnp.float32),
        interpret=interpret,
    )(qpos, q, k, v)
