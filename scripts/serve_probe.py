"""Serving-path probe on the real chip: runs bench.serve_bench alone
(TinyLlama-1.1B shape, w8a8) with a configurable decode chain, so serving
TTFT/decode changes can be measured without re-running the whole bench.

Usage: python scripts/serve_probe.py [decode_chain ...]
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
import bench  # noqa: E402

L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
E = H * D
cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                  n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                  rope_dim=D)
rng = np.random.default_rng(0)
params = bench.make_q4_params(rng, L, E, H, HKV, D, FF, V, w8a8=True)

chains = [int(a) for a in sys.argv[1:]] or [16]
for ch in chains:
    orig = bench.serve_bench.__defaults__

    def run(chain):
        from llama_box_tpu.sampling import SamplerParams
        from llama_box_tpu.server import (CompletionsTask, Engine,
                                          EngineConfig)
        import os
        r = np.random.default_rng(7)
        ramp = int(os.environ.get("SERVE_RAMP", "4"))
        eng = Engine(cfg, params, bench._BenchTokenizer(V),
                     EngineConfig(n_slots=4, n_ctx=4096, n_ubatch=512,
                                  prompt_cache=False, decode_chain=chain,
                                  chain_ramp=ramp))
        eng.start()
        try:
            def submit_all():
                tasks = []
                for _ in range(4):
                    toks = [int(t) for t in r.integers(3, V, 512)]
                    t = CompletionsTask(toks,
                                        SamplerParams(temp=0.8, seed=1),
                                        tokenizer=eng.tokenizer,
                                        max_tokens=128, stream=False)
                    eng.submit(t)
                    tasks.append(t)
                outs = []
                for t in tasks:
                    while True:
                        kind, payload = t.result_q.get(timeout=1800)
                        if kind == "final":
                            outs.append(payload)
                            break
                        if kind == "error":
                            raise payload
                return outs

            submit_all()
            t0 = time.perf_counter()
            outs = submit_all()
            wall = time.perf_counter() - t0
            ttfts = sorted(o.timings()["time_to_first_token_ms"]
                           for o in outs)
            n_gen = sum(len(o.generated) for o in outs)
            t_decode = wall - ttfts[-1] / 1e3
            return {"chain": chain,
                    "ttfts": [round(t, 1) for t in ttfts],
                    "ttft_ms_p50": round(ttfts[len(ttfts) // 2], 1),
                    "decode_tok_s": round(n_gen / max(t_decode, 1e-9), 1),
                    "e2e_tok_s": round(n_gen / wall, 1)}
        finally:
            eng.stop()

    print(run(ch), flush=True)
