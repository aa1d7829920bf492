"""Trace the exact bench _decode_chain program (w8a8, K=16, AL=768) and
dump the profile to /tmp/tracedir. Analyze the trace.json.gz offline.

Run on the real chip:  python scripts/trace_decode_chain.py
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
from llama_box_tpu.models.loader import fuse_projections  # noqa: E402
from llama_box_tpu.sampling import (  # noqa: E402
    SamplerParams, init_sampler_state, make_sampler_arrays,
)
from llama_box_tpu.server.engine import _decode_chain  # noqa: E402
from bench import make_q4_params  # noqa: E402

L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
S, C = 4, 1024
E = H * D
KCH = 16
cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                  n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                  rope_dim=D)
rng = np.random.default_rng(0)
params = fuse_projections(make_q4_params(rng, L, E, H, HKV, D, FF, V,
                                         w8a8=True), cfg)
dtype = jnp.bfloat16
cos, sin = make_rope(cfg, C)
arrs = make_sampler_arrays([SamplerParams(seed=1, temp=0.8)] * S)
active = jnp.ones((S,), bool)
kv = init_kv_cache(cfg, S, C, dtype)
sstate = init_sampler_state(S, V)
tokens = jnp.asarray(rng.integers(0, V, (S,)), jnp.int32)
pos = C // 2
AL = min(C, -(-(C // 2 + 16 * KCH) // 256) * 256)


def step(tokens, kv, sstate, p):
    pos0 = jnp.full((S,), p, jnp.int32)
    toks, _, _, _, kv, sstate = _decode_chain(
        params, cfg, tokens, pos0, kv, sstate, arrs, active,
        cos, sin, n_steps=KCH, attn_len=AL, samp_extras=False)
    return toks[:, -1], kv, sstate


# warmup / compile
for i in range(6):
    tokens, kv, sstate = step(tokens, kv, sstate, pos + (i % 15) * KCH)
np.asarray(tokens)

t0 = time.perf_counter()
with jax.profiler.trace("/tmp/tracedir"):
    for i in range(8):
        tokens, kv, sstate = step(tokens, kv, sstate,
                                  pos + ((6 + i) % 15) * KCH)
    np.asarray(tokens)
dt = time.perf_counter() - t0
print(f"traced 8 dispatches in {dt * 1e3:.1f} ms "
      f"({dt / (8 * KCH) * 1e6:.0f} us/step, "
      f"{S * 8 * KCH / dt:.0f} tok/s)", flush=True)
