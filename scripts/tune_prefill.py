"""Batched-prefill device-time tuner: times the engine's prefill_batch
program (4 slots x 512 tokens, w8a8 residency — the serving TTFT's
device component) under the flash-prefill block sizes given on the
command line. Run one setting per process (the blocks are baked at trace
time): python scripts/tune_prefill.py [BQ BC].
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
if len(sys.argv) >= 3:
    os.environ["LLAMA_BOX_TPU_FLASH_BQ"] = sys.argv[1]
    os.environ["LLAMA_BOX_TPU_FLASH_BC"] = sys.argv[2]

from bench import make_q4_params  # noqa: E402
from llama_box_tpu.models.config import ModelConfig  # noqa: E402
from llama_box_tpu.models.llama import (  # noqa: E402
    init_kv_cache, make_rope, prefill_batch)
from llama_box_tpu.models.loader import (  # noqa: E402
    deinterleave_rope, fuse_projections)

L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
S, C, T = 4, 1024, 512
E = H * D
cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                  n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                  rope_dim=D)
rng = np.random.default_rng(0)
params = make_q4_params(rng, L, E, H, HKV, D, FF, V, w8a8=True)
params, cfg = deinterleave_rope(params, cfg)
params = fuse_projections(params, cfg)
cos, sin = make_rope(cfg, C)
tokens = jnp.asarray(rng.integers(0, V, (S, T)), jnp.int32)
pos_base = jnp.zeros((S,), jnp.int32)
n_valid = jnp.full((S,), T, jnp.int32)
AL = 256  # engine formula at pos_base=0: ceil(max(pos,1)/256)*256

CONTIG = not os.environ.get("TUNE_PREFILL_SCATTER")
kv = init_kv_cache(cfg, S, C, jnp.bfloat16)
logits, kv = prefill_batch(params, cfg, tokens, pos_base, n_valid, kv,
                           cos, sin, attn_len=AL, contig_write=CONTIG)
np.asarray(logits[:1, :1])
# amortize the sync: N dispatches, one final transfer (dispatches
# pipeline through the tunnel; the final np.asarray drains them)
N = 20
t0 = time.perf_counter()
for _ in range(N):
    logits, kv = prefill_batch(params, cfg, tokens, pos_base, n_valid,
                               kv, cos, sin, attn_len=AL,
                               contig_write=CONTIG)
np.asarray(logits[:1, :1])
dt = (time.perf_counter() - t0) / N
bq = os.environ.get("LLAMA_BOX_TPU_FLASH_BQ", "default")
bc = os.environ.get("LLAMA_BOX_TPU_FLASH_BC", "default")
print(f"bq={bq} bc={bc}: {dt * 1e3:.2f} ms per batched 4x{T} prefill "
      f"({S * T / dt:.0f} tok/s)", flush=True)

if os.environ.get("TUNE_PREFILL_TRACE"):
    from _trace_util import load_device_ops, print_table
    tdir = "/tmp/trace_prefill"
    with jax.profiler.trace(tdir):
        for _ in range(3):
            logits, kv = prefill_batch(params, cfg, tokens, pos_base,
                                       n_valid, kv, cos, sin, attn_len=AL,
                                       contig_write=CONTIG)
        np.asarray(logits[:1, :1])
    print_table(load_device_ops(tdir), divisor=3, n_rows=40)
