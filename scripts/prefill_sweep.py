"""Batched-prefill block-size sweep on the real chip (bench shape:
TinyLlama-1.1B, 4 slots x 512 tokens, w8a8 weights). Times the engine's
prefill_batch program at several flash (bq, bc) block configurations with
honest host-transfer sync — TTFT is prefill-device-time bound through the
tunnel, so every ms here is a ms off serving TTFT.
"""

import os
import subprocess
import sys
import time

CONFIGS = [(256, 512), (512, 512), (128, 512), (256, 1024), (512, 1024),
           (256, 256), (128, 256), (64, 512)]

if os.environ.get("_SWEEP_CHILD"):
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from llama_box_tpu.models.config import ModelConfig
    from llama_box_tpu.models.llama import (init_kv_cache, make_rope,
                                            prefill_batch)
    from llama_box_tpu.models.loader import fuse_projections
    from bench import make_q4_params

    L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
    S, C, T = 4, 1024, 512
    E = H * D
    cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                      n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                      rope_dim=D)
    rng = np.random.default_rng(0)
    params = fuse_projections(
        make_q4_params(rng, L, E, H, HKV, D, FF, V, w8a8=True), cfg)
    cos, sin = make_rope(cfg, C)
    tokens = jnp.asarray(rng.integers(3, V, (S, T)), jnp.int32)
    pos_base = jnp.zeros((S,), jnp.int32)
    n_valid = jnp.full((S,), T, jnp.int32)

    def run():
        kv = init_kv_cache(cfg, S, C, jnp.bfloat16)
        logits, kv = prefill_batch(params, cfg, tokens, pos_base, n_valid,
                                   kv, cos, sin, attn_len=512)
        np.asarray(logits[:1, :1])

    run()
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"RESULT {ts[len(ts) // 2] * 1e3:.1f} ms", flush=True)
    sys.exit(0)

for bq, bc in CONFIGS:
    env = dict(os.environ, _SWEEP_CHILD="1",
               LLAMA_BOX_TPU_FLASH_BQ=str(bq),
               LLAMA_BOX_TPU_FLASH_BC=str(bc))
    r = subprocess.run([sys.executable, __file__], env=env,
                       capture_output=True, text=True, timeout=1800)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
    print(f"bq={bq:4d} bc={bc:4d}: "
          f"{line[0].split()[1] if line else 'FAIL'} ms "
          f"{'' if line else r.stderr[-300:]}", flush=True)
