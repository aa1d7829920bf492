"""HBM bandwidth probe via int8/bf16 matvec streams — KNOWN SHAPE-BOUND.

A matvec x @ ones reads the whole array once per dispatch with trivial
MXU work. Separate dispatches can't be CSE'd (a within-dispatch
repeated sum WOULD be, which is why a naive "8 passes per dispatch"
probe lies). Honest final host-transfer sync.

MEASURED 2026-08-20: int8 300 GB/s, bf16 442 GB/s — far below what the
big matmul fusions sustain (~720 GB/s incl. compute), i.e. the N=1
matvec emitter does not stream at full rate and this probe UNDERSTATES
peak bandwidth. Treat the dense matmul fusions in the real decode
program as the only trustworthy bandwidth reference on this stack
(CLAUDE.md measurement hazards)."""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

GB = 1024 ** 3
N = int(float(sys.argv[1]) * GB) if len(sys.argv) > 1 else GB
R = N // 1024


def run(dtype, name):
    x = jnp.ones((R, 1024), dtype)
    ones = jnp.ones((1024, 1), dtype)

    @jax.jit
    def mv(x, s):
        # one full read of x; the FULL dot output stays live (summing all
        # of y — a sliced output would let XLA narrow the dot, the
        # CLAUDE.md DCE microbench hazard); the scalar feeds the next
        # dispatch so dispatches serialize without host syncs
        y = jax.lax.dot_general(
            x, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                    else jnp.float32))
        return y.sum() + s

    s = mv(x, jnp.zeros((), jnp.int32 if dtype == jnp.int8
                        else jnp.float32))
    np.asarray(s)
    ITERS = 12
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = mv(x, s)
    np.asarray(s)
    dt = time.perf_counter() - t0
    bytes_read = ITERS * R * 1024 * x.dtype.itemsize
    print(f"# {name} matvec stream: {bytes_read / dt / 1e9:.1f} GB/s "
          f"({dt * 1e3 / ITERS:.2f} ms per {R * 1024 * x.dtype.itemsize / GB:.2f} GiB read)",
          flush=True)


run(jnp.int8, "int8")
run(jnp.bfloat16, "bf16")
