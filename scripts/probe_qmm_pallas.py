"""Can a dedicated Pallas w8a8 matmul stream weights faster than XLA's
fusion (88% of roofline on gateup, 58-83% on wo/down at the bench shape)?

Times a scan over L stacked weights (mirrors the decode layer loop's
weight traffic) for XLA jnp.dot vs a double-buffered Pallas kernel, at
the four decode matmul shapes. Honest host-transfer sync.

Run on the real chip: python scripts/probe_qmm_pallas.py
"""

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

L = 22
M = 8          # padded slot rows


def qmm_kernel(x_ref, w_ref, s_ref, o_ref, *, bn):
    x = x_ref[...]                      # [M, K] int8
    w = w_ref[0]                        # [K, bn] int8
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[0] = acc.astype(jnp.float32) * s_ref[0].astype(jnp.float32)


def qmm_pallas(x, w, s, bn=512):
    """x [M, K] int8; w [L?, K, N] int8 sliced outside; here per-layer
    [K, N]; s [N] f32. Grid over N blocks; Mosaic double-buffers w."""
    K, N = w.shape
    while N % bn:
        bn //= 2
    grid = (N // bn,)
    return pl.pallas_call(
        functools.partial(qmm_kernel, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, bn), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, bn), lambda j: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, M, N), jnp.float32),
    )(x, w.reshape(1, K, N), s.reshape(1, N))[0]


def bench_shape(K, N, label):
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.integers(-127, 127, (L, K, N), dtype=np.int8))
    S = jnp.asarray(rng.uniform(0.001, 0.01, (L, N)).astype(np.float32))
    x = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))

    def run(fn, tag):
        # weights/scales MUST be jit ARGUMENTS (a closure-captured 500MB
        # constant is the known pathological-compile trap, CLAUDE.md)
        K_, N_ = W.shape[1:]
        rproj = jnp.asarray(rng.normal(size=(N_, 8), scale=0.1)
                            .astype(np.float32))

        @jax.jit
        def many(x8, Wa, Sa, rp):
            def it(c, _):
                def body(carry, lw):
                    w, s = lw
                    y = fn(x8, w, s)        # [M, N] f32
                    # keep the FULL matmul live: tanh(y) @ rp consumes
                    # every column through a nonlinearity, so XLA can
                    # neither narrow the dot (slice hazard) nor
                    # reassociate sum(x@W) into x@W.sum() (measured: the
                    # plain-sum version collapsed to a 240 GB/s reduce)
                    return carry + jnp.tanh(y) @ rp, None
                acc, _ = jax.lax.scan(body, c, (Wa, Sa))
                return acc, None
            out, _ = jax.lax.scan(it, jnp.zeros((M, 8), jnp.float32),
                                  None, length=20)
            return out

        r = many(x, W, S, rproj)
        np.asarray(r)
        t0 = time.perf_counter()
        r = many(x, W, S, rproj)
        np.asarray(r)
        dt = time.perf_counter() - t0
        per = dt / (20 * L)
        bw = K * N / per / 1e9
        print(f"{label} {tag}: {per * 1e6:7.2f} us/matmul "
              f"({bw:6.0f} GB/s, {bw / 819 * 100:4.1f}% roofline)",
              flush=True)

    def xla_fn(x8, w, s):
        y = jax.lax.dot_general(x8, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * s

    run(xla_fn, "xla   ")
    run(qmm_pallas, "pallas")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    bench_shape(2048, 11264, "gateup [2048x11264]")
    bench_shape(5632, 2048, "down   [5632x2048] ")
    bench_shape(2048, 2560, "wqkv   [2048x2560] ")
    bench_shape(2048, 2048, "wo     [2048x2048] ")
