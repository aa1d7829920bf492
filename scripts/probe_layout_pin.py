"""Does pinning the decode-chain KV carry to XLA's preferred (AUTO)
layout remove the per-dispatch relayout copies (~432us profiled)?

Compiles _decode_chain with Layout.AUTO on inputs/outputs, device_puts
the cache into the chosen input formats once, and measures steady-state
chained decode against the default-layout baseline.
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp  # noqa: E402
from jax.experimental.layout import Format, Layout  # noqa: E402

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
cos, sin = make_rope(cfg, C)
arrs = make_sampler_arrays([SamplerParams(seed=1, temp=0.8)] * S)
active = jnp.ones((S,), bool)
AL = 768


def fn(params, token0, pos0, kv, sstate, arrs, active, cos, sin):
    return _decode_chain(params, cfg, token0, pos0, kv, sstate, arrs,
                         active, cos, sin, n_steps=KCH, attn_len=AL,
                         samp_extras=False)


kv0 = init_kv_cache(cfg, S, C, jnp.bfloat16)
ss0 = init_sampler_state(S, V)
tok0 = jnp.asarray(rng.integers(0, V, (S,)), jnp.int32)
pos0 = jnp.full((S,), C // 2, jnp.int32)
args = (params, tok0, pos0, kv0, ss0, arrs, active, cos, sin)

auto = jax.tree.map(lambda _: Format(Layout.AUTO), args)
jfn = jax.jit(fn, in_shardings=auto, out_shardings=Format(Layout.AUTO),
              donate_argnums=(3, 4))
lowered = jfn.lower(*args)
compiled = lowered.compile()
in_fmt = compiled.input_formats
kv_fmt = in_fmt[0][3]
print("kv.k input layout:", kv_fmt.k.layout, flush=True)
out_fmt = compiled.output_formats
print("kv.k output layout:", out_fmt[4].k.layout, flush=True)

# place every input in its chosen format
placed = jax.tree.map(jax.device_put, args, in_fmt[0])


def run(compiled, args, label):
    (p, t0a, p0a, kv, ss, ar, ac, c_, s_) = args
    out = compiled(p, t0a, p0a, kv, ss, ar, ac, c_, s_)
    toks = out[0]
    kv, ss = out[4], out[5]
    np.asarray(out[0]).ravel()[:1]
    t0 = time.perf_counter()
    iters = 100
    tok_in = t0a
    for i in range(iters):
        out = compiled(p, tok_in, p0a, kv, ss, ar, ac, c_, s_)
        kv, ss = out[4], out[5]
    np.asarray(out[0]).ravel()[:1]
    dt = time.perf_counter() - t0
    print(f"{label}: {S * iters * KCH / dt:.1f} tok/s "
          f"({dt / iters / KCH * 1e6:.0f} us/step)", flush=True)


run(compiled, placed, "AUTO-layout pinned")

# baseline: default layouts through the same harness
jfn2 = jax.jit(fn, donate_argnums=(3, 4))
c2 = jfn2.lower(*args).compile()
kv0b = init_kv_cache(cfg, S, C, jnp.bfloat16)
args_b = (params, tok0, pos0, kv0b, init_sampler_state(S, V), arrs,
          active, cos, sin)
run(c2, args_b, "default layouts")
