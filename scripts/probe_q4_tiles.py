"""On-chip tile sweep for the packed-nibble (q4k) Pallas kernel and a
variant comparison for VERDICT r4 #4 (q4k_packed at 0.42x baseline).

Runs the real K-chained decode program (bench shape) under several
LLAMA_BOX_TPU_Q4_BT / _Q4_OT tile settings and residency variants, and
prints tok/s for each. Usage: python scripts/probe_q4_tiles.py
(Each variant re-execs itself in a subprocess so the env-frozen
residency/tile choices re-apply cleanly.)
"""

import os
import subprocess
import sys

# r5 sweep results (tok/s at the bench shape): bt512/ot256 1105 (old
# default), bt512/ot512 1219, bt1024/ot256 1181, bt1024/ot512 1264,
# bt1024/ot1024 1290, bt2048/ot512 1263, bt2048/ot1024 1298,
# bt1024/ot2048 1337 (NEW DEFAULT), int8-unpacked 884 (2x HBM bytes
# dominate). The kernel is VPU-unpack-bound, so fewer grid steps
# amortize the per-tile fixed cost until VMEM pressure.
VARIANTS = [
    # (label, env)
    ("packed4 bt1024 ot2048 (default)", {"LLAMA_BOX_TPU_PACKED4": "1"}),
    ("packed4 bt512 ot256 (r4 default)", {"LLAMA_BOX_TPU_PACKED4": "1",
                                          "LLAMA_BOX_TPU_Q4_BT": "512",
                                          "LLAMA_BOX_TPU_Q4_OT": "256"}),
    ("packed4 bt1024 ot1024", {"LLAMA_BOX_TPU_PACKED4": "1",
                               "LLAMA_BOX_TPU_Q4_BT": "1024",
                               "LLAMA_BOX_TPU_Q4_OT": "1024"}),
    ("packed4 bt2048 ot2048", {"LLAMA_BOX_TPU_PACKED4": "1",
                               "LLAMA_BOX_TPU_Q4_BT": "2048",
                               "LLAMA_BOX_TPU_Q4_OT": "2048"}),
    ("int8-unpacked group-quant", {"LLAMA_BOX_TPU_Q4_INT8": "1"}),
]

CHILD = r"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import make_q4_params
from llama_box_tpu.models.config import ModelConfig
from llama_box_tpu.models.llama import (flash_decode_active, init_kv_cache,
                                        make_rope)
from llama_box_tpu.models.loader import fuse_projections
from llama_box_tpu.sampling import (SamplerParams, init_sampler_state,
                                    make_sampler_arrays)
from llama_box_tpu.server.engine import _decode_chain

L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
S, C, KCH = 4, 1024, 16
E = H * D
cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                  n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                  rope_dim=D, rope_mode="neox")
rng = np.random.default_rng(0)
import os
params = make_q4_params(rng, L, E, H, HKV, D, FF, V,
                        as_int8=bool(os.environ.get("LLAMA_BOX_TPU_Q4_INT8")))
params = fuse_projections(params, cfg)
cos, sin = make_rope(cfg, C)
arrs = make_sampler_arrays([SamplerParams(seed=1, temp=0.8)] * S)
kv = init_kv_cache(cfg, S, C, jnp.bfloat16)
sstate = init_sampler_state(S, V)
active = jnp.ones((S,), bool)
tokens = jnp.asarray(rng.integers(0, V, (S,)), jnp.int32)
pos = C // 2
flash = flash_decode_active(cfg, C)

def step(tokens, kv, sstate, p):
    al = 0 if flash else min(C, -(-(p + KCH) // 256) * 256)
    pos0 = jnp.full((S,), p, jnp.int32)
    toks, _, _, _, kv, sstate = _decode_chain(
        params, cfg, tokens, pos0, kv, sstate, arrs, active, cos, sin,
        n_steps=KCH, attn_len=al, samp_extras=False, samp_kcap=64)
    return toks[:, -1], kv, sstate

for i in range(6):
    tokens, kv, sstate = step(tokens, kv, sstate, pos + (i % 15) * KCH)
np.asarray(tokens)
t0 = time.perf_counter()
ITERS = 40
for i in range(ITERS):
    tokens, kv, sstate = step(tokens, kv, sstate, pos + ((6 + i) % 15) * KCH)
np.asarray(tokens)
dt = time.perf_counter() - t0
print(f"RESULT {S * ITERS * KCH / dt:.1f} tok/s "
      f"({dt * 1e6 / ITERS / KCH:.1f} us/step)")
"""

for label, env in VARIANTS:
    e = dict(os.environ)
    e.update(env)
    r = subprocess.run([sys.executable, "-c", CHILD], env=e,
                       capture_output=True, text=True, timeout=1800)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
    print(f"{label:36s} {line[0][7:] if line else 'FAILED'}", flush=True)
    if not line:
        print(r.stderr[-800:], flush=True)
