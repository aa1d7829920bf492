"""Profile the K-chained decode program on the real chip and dump a
per-op time table (the r3/r4 perf work's primary instrument).

Usage: python scripts/trace_decode_chain.py [K] [mode]
  K: chain length (default 16)
  mode: w8a8 (default) | bf16
Writes /tmp/trace_K{K}_{mode}/ and prints the op table to stdout.

The axon tunnel serves jax.profiler traces correctly (CLAUDE.md r2);
block_until_ready is an async no-op, so the trace window is closed by a
real host transfer.
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
MODE = sys.argv[2] if len(sys.argv) > 2 else "w8a8"

from bench import make_q4_params  # noqa: E402
from llama_box_tpu.models.config import ModelConfig  # noqa: E402
from llama_box_tpu.models.llama import (  # noqa: E402
    flash_decode_active, init_kv_cache, make_rope)
from llama_box_tpu.sampling import (  # noqa: E402
    SamplerParams, init_sampler_state, make_sampler_arrays)
from llama_box_tpu.server.engine import _decode_chain  # noqa: E402
from llama_box_tpu.models.loader import (  # noqa: E402
    deinterleave_rope, fuse_projections)

L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
S, C = 4, 1024
E = H * D
cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                  n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                  rope_dim=D)
rng = np.random.default_rng(0)
if MODE == "w8a8":
    params = make_q4_params(rng, L, E, H, HKV, D, FF, V, w8a8=True)
else:
    def r(*shape, scale=0.02):
        return jnp.asarray(rng.normal(size=shape, scale=scale)
                           .astype(np.float32), jnp.bfloat16)
    params = {
        "tok_embd": r(V, E), "output_norm": jnp.ones((E,), jnp.bfloat16),
        "output": r(E, V),
        "layers": {"attn_norm": jnp.ones((L, E), jnp.bfloat16),
                   "wq": r(L, E, H * D), "wk": r(L, E, HKV * D),
                   "wv": r(L, E, HKV * D), "wo": r(L, H * D, E),
                   "ffn_norm": jnp.ones((L, E), jnp.bfloat16),
                   "w_gate": r(L, E, FF), "w_up": r(L, E, FF),
                   "w_down": r(L, FF, E)},
    }
if "--keep-norm-rope" not in sys.argv:
    params, cfg = deinterleave_rope(params, cfg)
params = fuse_projections(params, cfg)
cos, sin = make_rope(cfg, C)
arrs = make_sampler_arrays([SamplerParams(seed=1, temp=0.8)] * S)
kv = init_kv_cache(cfg, S, C, jnp.bfloat16)
sstate = init_sampler_state(S, V)
active = jnp.ones((S,), bool)
tokens = jnp.asarray(rng.integers(0, V, (S,)), jnp.int32)
pos = C // 2
AL = (0 if flash_decode_active(cfg, C)
      else min(C, -(-(C // 2 + 16 * K) // 256) * 256))


import os

FAST = not os.environ.get("TRACE_NO_FAST")
# the engine's host-decided fast-path statics (_chain_fast_kw): plain
# sampler w/ top_k=40 -> kcap 64; lockstep slots -> whole-batch KV write
FKW = dict(samp_kcap=64) if FAST else {}

if os.environ.get("TRACE_AOT"):
    # AOT-compile the exact program and dump its optimized HLO so trace
    # op names map to source lines reliably (per-process numbering)
    _pos0 = jnp.full((S,), pos, jnp.int32)
    _comp = _decode_chain.lower(
        params, cfg, tokens, _pos0, kv, sstate, arrs, active, cos, sin,
        n_steps=K, attn_len=AL, samp_extras=False, **FKW).compile()
    open(f"/tmp/chain_hlo_live_K{K}_{MODE}.txt", "w").write(
        _comp.as_text())

    def step(tokens, kv, sstate, p):
        # p is a runtime argument of the compiled executable — positions
        # walk exactly like the non-AOT mode
        pos0 = jnp.full((S,), p, jnp.int32)
        toks, _, _, _, kv, sstate = _comp(
            params, tokens, pos0, kv, sstate, arrs, active, cos, sin)
        return toks[:, -1], kv, sstate
else:
    def step(tokens, kv, sstate, p):
        pos0 = jnp.full((S,), p, jnp.int32)
        toks, _, _, _, kv, sstate = _decode_chain(
            params, cfg, tokens, pos0, kv, sstate, arrs, active, cos,
            sin, n_steps=K, attn_len=AL, samp_extras=False, **FKW)
        return toks[:, -1], kv, sstate


import os

ITERS = int(os.environ.get("TRACE_ITERS", 20))
for i in range(6):
    tokens, kv, sstate = step(tokens, kv, sstate, pos + (i % 15) * K)
np.asarray(tokens)
t0 = time.perf_counter()
for i in range(ITERS):
    tokens, kv, sstate = step(tokens, kv, sstate, pos + ((6 + i) % 15) * K)
np.asarray(tokens)
dt = time.perf_counter() - t0
print(f"# wall {dt * 1e3 / ITERS:.2f} ms/chain, "
      f"{dt * 1e6 / ITERS / K:.1f} us/step, "
      f"{S * ITERS * K / dt:.1f} tok/s", flush=True)

tdir = f"/tmp/trace_K{K}_{MODE}"
with jax.profiler.trace(tdir):
    for i in range(4):
        tokens, kv, sstate = step(tokens, kv, sstate,
                                  pos + ((26 + i) % 15) * K)
    np.asarray(tokens)

# -- analyze ------------------------------------------------------------
from _trace_util import load_device_ops  # noqa: E402

by_name = load_device_ops(tdir)
rows = sorted(by_name.items(), key=lambda kvp: -kvp[1][0])
tot = sum(v[0] for _, v in rows)
print(f"# total device us over capture: {tot:.0f} "
      f"(= {tot / 4:.0f}/chain, {tot / 4 / K:.1f}/step)")
print(f"{'us/chain':>10} {'count':>6} {'us/step':>8}  name")
for name, (dur, cnt) in rows[:60]:
    print(f"{dur / 4:10.1f} {cnt:6d} {dur / 4 / K:8.2f}  {name[:110]}")
