"""Decode-step breakdown on the real chip (run from repo root).

Times chained variants of the decode hot path to localize the gap
between measured tok/s and the HBM roofline. Uses honest host-transfer
sync (block_until_ready is an async no-op through the tunnel).
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from llama_box_tpu.models.config import ModelConfig  # noqa: E402
from llama_box_tpu.models.llama import (  # noqa: E402
    forward_impl, init_kv_cache, make_rope,
)
from llama_box_tpu.sampling import (  # noqa: E402
    SamplerParams, init_sampler_state, make_sampler_arrays, sample_impl,
)
from bench import make_q4_params  # noqa: E402

L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
S, C = 4, 1024
E = H * D
K = 8
cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                  n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                  rope_dim=D)
rng = np.random.default_rng(0)
params = make_q4_params(rng, L, E, H, HKV, D, FF, V, w8a8=True)
cos, sin = make_rope(cfg, C)
arrs = make_sampler_arrays([SamplerParams(seed=1, temp=0.8)] * S)
active = jnp.ones((S,), bool)


def timed(fn, args, label, n=6):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
    dt = (time.perf_counter() - t0) / n / K
    print(f"{label:28s} {dt * 1e6:8.0f} us/step "
          f"({S / dt:8.0f} tok/s)", flush=True)
    return dt


def chain(sample: bool, cap: int):
    kv0 = init_kv_cache(cfg, S, cap, jnp.bfloat16)
    ss0 = init_sampler_state(S, V)
    cs, sn = make_rope(cfg, cap)

    from functools import partial

    @partial(jax.jit, donate_argnums=(1, 2))
    def run(tokens, kv, sstate):
        def body(carry, i):
            tokens, kv, sstate = carry
            positions = jnp.full((S, 1), cap // 2 + i, jnp.int32)
            logits, kv = forward_impl(params, cfg, tokens, positions, kv,
                                      jnp.ones((S,), jnp.int32), cs, sn)
            if sample:
                tok, _, _, _, sstate = sample_impl(logits[:, -1, :], sstate,
                                                arrs, active)
            else:
                tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
            return (tok[:, None], kv, sstate), None

        (tokens, kv, sstate), _ = jax.lax.scan(
            body, (tokens, kv, sstate), jnp.arange(K, dtype=jnp.int32))
        return tokens

    toks = jnp.asarray(rng.integers(0, V, (S, 1)), jnp.int32)
    return run, (toks, kv0, ss0)


for label, sample, cap in (
        ("full step (sampler), C=1024", True, 1024),
        ("argmax only, C=1024", False, 1024),
        ("argmax only, C=256", False, 256),
):
    fn, args = chain(sample, cap)
    timed(fn, args, label)
