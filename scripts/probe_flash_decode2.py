"""Bisect the flash_decode kernel cost: which component makes it
~140us/call instead of ~10? Variants toggle index-map clamping, masks,
per-head loop shape, and the two dots."""

import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

L, S, C, Hkv, G, D = 22, 4, 1024, 4, 8, 64
N = 352
bc = 512
n_c = C // bc

rng = np.random.default_rng(0)
kc = jnp.asarray(rng.standard_normal((L, S, C, Hkv, D)), jnp.bfloat16)
vc = jnp.asarray(rng.standard_normal((L, S, C, Hkv, D)), jnp.bfloat16)
q0 = jnp.asarray(rng.standard_normal((S, Hkv, G, D)), jnp.bfloat16)
meta = jnp.asarray([[640, 8]] * S, jnp.int32)


def kernel(li_ref, meta_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
           acc_ref, *, masks: bool, second_dot: bool, heads: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    cpos = meta_ref[b, 0]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j * bc < cpos)
    def _():
        if masks:
            kpos = j * bc + jax.lax.broadcasted_iota(
                jnp.int32, (1, bc), 1)[0]
            mask = kpos < cpos
        for h in range(heads):
            k = k_ref[0, 0, :, h, :]
            s = jax.lax.dot_general(
                q_ref[0, h], k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * 0.125
            if masks:
                s = jnp.where(mask[None, :], s, -1e30)
            m_prev = m_ref[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new[:, None])
            if masks:
                p = p * mask[None, :]
            l_ref[h] = l_ref[h] * alpha + p.sum(-1)
            m_ref[h] = m_new
            if second_dot:
                v = v_ref[0, 0, :, h, :]
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_ref[h] = acc_ref[h] * alpha[:, None] + pv
            else:
                acc_ref[h] = acc_ref[h] * alpha[:, None]

    @pl.when(j == n_c - 1)
    def _():
        for h in range(heads):
            o_ref[0, h] = acc_ref[h] \
                / jnp.maximum(l_ref[h], 1e-30)[:, None]


def make(clamp: bool, masks: bool, second_dot: bool, heads: int = Hkv):
    def cache_map(b, j, li, meta):
        if clamp:
            hi = jnp.maximum((meta[b, 0] - 1) // bc, 0)
            return (li[0], b, jnp.clip(j, 0, hi), 0, 0)
        return (li[0], b, j, 0, 0)

    kern = functools.partial(kernel, masks=masks, second_dot=second_dot,
                             heads=heads)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, n_c),
        in_specs=[
            pl.BlockSpec((1, Hkv, G, D), lambda b, j, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bc, Hkv, D), cache_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bc, Hkv, D), cache_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hkv, G, D),
                               lambda b, j, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G), jnp.float32),
            pltpu.VMEM((Hkv, G), jnp.float32),
            pltpu.VMEM((Hkv, G, D), jnp.float32),
        ],
    )

    def call(q, li):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, Hkv, G, D), jnp.float32),
        )(li.reshape(1), meta, q, kc, vc)
    return call


def timed(label, call, n=4):
    @jax.jit
    def run(q):
        def body(q, i):
            o = call(q, (i % L).astype(jnp.int32))
            return (q + o.astype(q.dtype) * 1e-6).astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, jnp.arange(N, dtype=jnp.int32))
        return q
    out = run(q0)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = run(q0)
    np.asarray(out).ravel()[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt / N * 1e6:8.2f} us/call", flush=True)


timed("full (clamp+mask+2dots, 4 heads)", make(True, True, True))
timed("no clamp", make(False, True, True))
timed("no masks", make(True, False, True))
timed("one dot", make(True, True, False))
timed("1 head only", make(True, True, True, heads=1))
timed("bare (no clamp/mask, 1 dot, 1 head)", make(False, False, False, 1))
