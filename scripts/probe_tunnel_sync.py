"""Tunnel sync-cost probe: what does a host np.asarray cost when the
device work already finished, and do CONCURRENT syncs overlap?

Informs the serving decode architecture: the chain pipeline is host-sync
bound (~30 ms per chain sync), so if two outstanding transfers overlap,
a fetcher thread doubles effective sync throughput.
"""

import sys
import threading
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from llama_box_tpu.models.config import ModelConfig  # noqa: E402
from llama_box_tpu.models.llama import init_kv_cache, make_rope  # noqa: E402
from llama_box_tpu.sampling import (SamplerParams, init_sampler_state,  # noqa: E402
                                    make_sampler_arrays)
from llama_box_tpu.server.engine import _decode_chain  # noqa: E402
from bench import make_q4_params  # noqa: E402

L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
S, C, K = 4, 1024, 16
E = H * D
cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                  n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                  rope_dim=D)
rng = np.random.default_rng(0)
from llama_box_tpu.models.loader import fuse_projections  # noqa: E402
params = fuse_projections(
    make_q4_params(rng, L, E, H, HKV, D, FF, V, w8a8=True), cfg)
cos, sin = make_rope(cfg, C)
arrs = make_sampler_arrays([SamplerParams(seed=1, temp=0.8)] * S)
active = jnp.ones((S,), bool)
kv = init_kv_cache(cfg, S, C, jnp.bfloat16)
sstate = init_sampler_state(S, V)
tok = jnp.asarray(rng.integers(0, V, (S,)), jnp.int32)
AL = 768


def chain(tok, kv, sstate, p):
    pos0 = jnp.full((S,), p, jnp.int32)
    toks, _, _, _, kv, sstate = _decode_chain(
        params, cfg, tok, pos0, kv, sstate, arrs, active,
        cos, sin, n_steps=K, attn_len=AL)
    return toks, kv, sstate


# warmup/compile
toks, kv, sstate = chain(tok, kv, sstate, 512)
np.asarray(toks)

# 1) sync cost when device already idle (work long done)
toks, kv, sstate = chain(toks[:, -1], kv, sstate, 512 + K)
time.sleep(1.5)
t0 = time.perf_counter()
np.asarray(toks)
print(f"sync_after_idle: {(time.perf_counter() - t0) * 1e3:.1f} ms",
      flush=True)

# 2) sync cost right after dispatch (device must run ~32 ms first)
toks, kv, sstate = chain(toks[:, -1], kv, sstate, 512 + 2 * K)
t0 = time.perf_counter()
np.asarray(toks)
print(f"sync_hot: {(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)

# 3) serial vs threaded syncs of two outstanding chains
for label in ("serial", "threaded"):
    ts = []
    for rep in range(3):
        toksA, kv, sstate = chain(toks[:, -1], kv, sstate, 512 + 3 * K)
        toksB, kv, sstate = chain(toksA[:, -1], kv, sstate, 512 + 4 * K)
        t0 = time.perf_counter()
        if label == "serial":
            np.asarray(toksA)
            np.asarray(toksB)
        else:
            th = threading.Thread(target=lambda: np.asarray(toksA))
            th.start()
            np.asarray(toksB)
            th.join()
        ts.append((time.perf_counter() - t0) * 1e3)
        toks = toksB
    print(f"two_syncs_{label}: {min(ts):.1f} ms (runs: "
          f"{[round(t, 1) for t in ts]})", flush=True)

# 4) steady-state pipelined loop WITH emit-sized host pause, depth 2 vs 3
for depth in (2, 3):
    pend = []
    t = toks[:, -1]
    p = 512
    n = 30
    t0 = time.perf_counter()
    done = 0
    for i in range(n):
        tk, kv, sstate = chain(t, kv, sstate, p)
        pend.append(tk)
        t = tk[:, -1]
        p += 0  # stay in one AL bucket
        if len(pend) >= depth:
            np.asarray(pend.pop(0))
            done += 1
    while pend:
        np.asarray(pend.pop(0))
        done += 1
    dt = (time.perf_counter() - t0) / n
    print(f"pipelined_depth{depth}: {dt * 1e3:.1f} ms/chain "
          f"({S * K / dt:.0f} tok/s)", flush=True)
