"""Microbench the flash_decode kernel at the bench shape via a chained
scan (single dispatches through the tunnel only measure queue latency).

Usage: python scripts/probe_flash_decode.py [bc ...]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from llama_box_tpu.ops.flash_decode import flash_decode  # noqa: E402

L, S, C, Hkv, G, D = 22, 4, 1024, 4, 8, 64
R = 16
N = 352  # kernel calls per dispatch (22 layers x 16 chain steps)

rng = np.random.default_rng(0)
kc = jnp.asarray(rng.standard_normal((L, S, C, Hkv, D)), jnp.bfloat16)
vc = jnp.asarray(rng.standard_normal((L, S, C, Hkv, D)), jnp.bfloat16)
kr = jnp.asarray(rng.standard_normal((S, R, Hkv, D)), jnp.bfloat16)
vr = jnp.asarray(rng.standard_normal((S, R, Hkv, D)), jnp.bfloat16)
q0 = jnp.asarray(rng.standard_normal((S, Hkv, G, D)), jnp.bfloat16)
meta = jnp.asarray([[640, 8]] * S, jnp.int32)
win = jnp.zeros((2,), jnp.int32)


def timed(label, fn, *args, n=4):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt / N * 1e6:8.2f} us/call "
          f"({dt * 1e3:7.1f} ms/dispatch)", flush=True)


def chain(bc):
    @jax.jit
    def run(q):
        def body(q, i):
            li = (i % L).astype(jnp.int32)
            o = flash_decode(q, kc, vc, kr, vr, meta, win, layer=li,
                             bc=bc)
            # feed output forward so nothing is DCE'd
            q2 = (q + o.astype(q.dtype) * 1e-6).astype(q.dtype)
            return q2, None

        q, _ = jax.lax.scan(body, q, jnp.arange(N, dtype=jnp.int32))
        return q
    return run


# einsum reference at the same shape/traffic (ranged to 768)
@jax.jit
def run_einsum(q):
    kcs = jax.lax.slice_in_dim(kc, 0, 768, axis=2)
    vcs = jax.lax.slice_in_dim(vc, 0, 768, axis=2)

    def body(q, i):
        li = (i % L).astype(jnp.int32)
        kf = jax.lax.dynamic_index_in_dim(kcs, li, 0, keepdims=False)
        vf = jax.lax.dynamic_index_in_dim(vcs, li, 0, keepdims=False)
        s = jnp.einsum("bhgd,bchd->bhgc", q.astype(jnp.bfloat16), kf,
                       preferred_element_type=jnp.float32) * D ** -0.5
        mask = jnp.arange(768)[None, None, None, :] < meta[:, 0, None,
                                                          None, None]
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhgc,bchd->bhgd", p.astype(jnp.bfloat16), vf,
                       preferred_element_type=jnp.float32)
        q2 = (q + o.astype(q.dtype) * 1e-6).astype(q.dtype)
        return q2, None

    q, _ = jax.lax.scan(body, q, jnp.arange(N, dtype=jnp.int32))
    return q


bcs = [int(x) for x in sys.argv[1:]] or [1024, 512, 256]
timed("einsum ranged(768) per-layer slice", run_einsum, q0)
for bc in bcs:
    timed(f"flash_decode bc={bc}", chain(bc), q0)
