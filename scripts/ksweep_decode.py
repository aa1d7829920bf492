"""Chain-length (K) sweep of the w8a8 decode chain on the real chip.

The post-chain cache scatter + host sync amortize over K steps; this
measures tok/s at K in {8, 16, 32} to pick the bench/serving default.
Honest sync: np.asarray of the sampled tokens after the timed loop.
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
from llama_box_tpu.models.llama import init_kv_cache, make_rope  # noqa: E402
from llama_box_tpu.sampling import (  # noqa: E402
    SamplerParams, init_sampler_state, make_sampler_arrays,
)
from llama_box_tpu.server.engine import _decode_chain  # noqa: E402
from bench import make_q4_params  # noqa: E402

L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
S, C = 4, 1024
E = H * D
cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                  n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                  rope_dim=D)
rng = np.random.default_rng(0)
from llama_box_tpu.models.loader import fuse_projections  # noqa: E402
params = fuse_projections(make_q4_params(rng, L, E, H, HKV, D, FF, V,
                                         w8a8=True), cfg)
cos, sin = make_rope(cfg, C)
arrs = make_sampler_arrays([SamplerParams(seed=1, temp=0.8)] * S)
active = jnp.ones((S,), bool)


def run(KCH: int, iters: int, warmup: int = 4, trace: str | None = None):
    kv = init_kv_cache(cfg, S, C, jnp.bfloat16)
    sstate = init_sampler_state(S, V)
    tokens = jnp.asarray(rng.integers(0, V, (S,)), jnp.int32)
    pos = C // 2
    AL = min(C, -(-(C // 2 + 128) // 256) * 256)

    def step(tokens, kv, sstate, p):
        pos0 = jnp.full((S,), p, jnp.int32)
        toks, _, _, _, kv, sstate = _decode_chain(
            params, cfg, tokens, pos0, kv, sstate, arrs, active,
            cos, sin, n_steps=KCH, attn_len=AL)
        return toks[:, -1], kv, sstate

    # fixed 128-token span so every K sweeps the same cache-fill range
    n_wrap = max(1, 128 // KCH)
    for i in range(warmup):
        tokens, kv, sstate = step(tokens, kv, sstate, pos + (i % n_wrap) * KCH)
    np.asarray(tokens)
    if trace:
        jax.profiler.start_trace(trace)
    t0 = time.perf_counter()
    for i in range(iters):
        tokens, kv, sstate = step(tokens, kv, sstate,
                                  pos + ((warmup + i) % n_wrap) * KCH)
    np.asarray(tokens)
    dt = time.perf_counter() - t0
    if trace:
        jax.profiler.stop_trace()
    tok_s = S * iters * KCH / dt
    print(f"K={KCH:3d}: {tok_s:8.1f} tok/s  ({dt / iters / KCH * 1e6:6.0f} "
          f"us/step)", flush=True)
    return tok_s


if __name__ == "__main__":
    do_trace = "--trace" in sys.argv
    run(8, 100, trace="/tmp/trace_k8" if do_trace else None)
    run(16, 50)
    run(32, 25)
