"""Where does serving TTFT go? Instrument the prefill-batch pass and the
submit->admission latency at the bench shape (4 x 512-token prompts).

Run on the real chip: python scripts/ttft_probe.py
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

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

from llama_box_tpu.sampling import SamplerParams  # noqa: E402
from llama_box_tpu.server import (  # noqa: E402
    CompletionsTask, Engine, EngineConfig,
)
from llama_box_tpu.server import engine as engine_mod  # noqa: E402

marks = []
orig_batch = engine_mod.Engine._prefill_batch
orig_dispatch = engine_mod.Engine._prefill_batch_dispatch
orig_finish_d = engine_mod.Engine._finish_batch_dispatch
orig_finish_s = engine_mod.Engine._finish_batch_sync


def batch(self, slots):
    marks.append(("pass_start", time.monotonic(), len(slots)))
    r = orig_batch(self, slots)
    marks.append(("pass_end", time.monotonic(), len(slots)))
    return r


def dispatch(self, slots):
    r = orig_dispatch(self, slots)
    marks.append(("prefill_dispatched", time.monotonic(), len(slots)))
    return r


def finish_d(self, done, logits):
    r = orig_finish_d(self, done, logits)
    marks.append(("sample_dispatched", time.monotonic(), len(done)))
    return r


def finish_s(self, pend):
    r = orig_finish_s(self, pend)
    marks.append(("synced_emitted", time.monotonic(), 0))
    return r


engine_mod.Engine._prefill_batch = batch
engine_mod.Engine._prefill_batch_dispatch = dispatch
engine_mod.Engine._finish_batch_dispatch = finish_d
engine_mod.Engine._finish_batch_sync = finish_s

eng = Engine(cfg, params, bench._BenchTokenizer(V),
             EngineConfig(n_slots=4, n_ctx=4096, n_ubatch=512,
                          prompt_cache=False, decode_chain=16))
eng.start()
r = np.random.default_rng(7)


def submit_all(gen_len=24):
    tasks = []
    t_sub = time.monotonic()
    for _ in range(4):
        toks = [int(t) for t in r.integers(3, V, 512)]
        t = CompletionsTask(toks, SamplerParams(temp=0.8, seed=1),
                            tokenizer=eng.tokenizer,
                            max_tokens=gen_len, stream=False)
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
    return t_sub, outs


try:
    submit_all()            # warmup/compiles
    marks.clear()
    t_sub, outs = submit_all()
    print("timeline after submit (ms):")
    for name, t, n in marks[:12]:
        print(f"  {1e3 * (t - t_sub):8.1f}  {name} (n={n})")
    ttfts = sorted(o.timings()["time_to_first_token_ms"] for o in outs)
    print("ttfts:", [round(t, 1) for t in ttfts])
finally:
    eng.stop()
