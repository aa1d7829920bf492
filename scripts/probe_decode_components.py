"""Decode-step component budget on the real chip (TinyLlama-1.1B shape).

Chains K=8 iterations of each component inside one jit (dispatch cost
amortized) and syncs with a real host transfer. Components:

  full         — forward + verify/sample + row scatter (the engine step)
  fwd_argmax   — forward + argmax (no sampler chain)
  fwd_c128     — fwd_argmax with a 128-capacity cache (attention scaling)
  sampler      — sample_impl alone on carried [B, V] logits
  outmm        — output matmul alone ([B,E] x [E,V] w8a8)
  mlp          — the 22-layer matmul stack alone (no attention/norm)
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
from llama_box_tpu.models.llama import (  # noqa: E402
    apply_rows, init_kv_cache, make_rope,
)
from llama_box_tpu.ops.qmatmul import mm  # noqa: E402
from llama_box_tpu.sampling import (  # noqa: E402
    SamplerParams, init_sampler_state, make_sampler_arrays, sample_impl,
)
from llama_box_tpu.server.engine import _decode_verify_rows  # noqa: E402
from bench import make_q4_params  # noqa: E402

L, H, HKV, D, FF, V = 22, 32, 4, 64, 5632, 32000
S, C = 4, 1024
E = H * D
K = 8
cfg = ModelConfig(arch="llama", n_layers=L, n_embd=E, n_heads=H,
                  n_kv_heads=HKV, head_dim=D, n_ff=FF, vocab_size=V,
                  rope_dim=D)
rng = np.random.default_rng(0)
params = make_q4_params(rng, L, E, H, HKV, D, FF, V, w8a8=True)
arrs = make_sampler_arrays([SamplerParams(seed=1, temp=0.8)] * S)
active = jnp.ones((S,), bool)
n_draft = jnp.zeros((S,), jnp.int32)


def timed(label, fn, *args, n=6):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / n / K
    print(f"{label:14s} {dt * 1e6:8.0f} us/step ({S / dt:8.0f} tok/s)",
          flush=True)
    return dt


def chain_engine(cap, with_sampler):
    cos, sin = make_rope(cfg, cap)

    def run(params, tokens, kv, sstate):
        def body(carry, i):
            tokens, kv, sstate = carry
            positions = jnp.full((S, 1), cap // 2 + i, jnp.int32)
            if with_sampler:
                toks, _, _, _, _, _, rows, sstate = _decode_verify_rows(
                    params, cfg, tokens, positions, n_draft, kv, active,
                    active, sstate, arrs, cos, sin)
                tok = toks[:, 0]
            else:
                from llama_box_tpu.models.llama import forward_rows_impl
                logits, rows = forward_rows_impl(
                    params, cfg, tokens, positions, kv,
                    jnp.ones((S,), jnp.int32), cos, sin)
                tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
            kv = apply_rows(kv, rows, positions)
            return (tok[:, None], kv, sstate), None

        (tokens, kv, sstate), _ = jax.lax.scan(
            body, (tokens, kv, sstate), jnp.arange(K, dtype=jnp.int32))
        return tokens

    jf = jax.jit(run, donate_argnums=(2, 3))
    kv0 = init_kv_cache(cfg, S, cap, jnp.bfloat16)
    ss0 = init_sampler_state(S, V)
    toks = jnp.asarray(rng.integers(0, V, (S, 1)), jnp.int32)
    return jf, (params, toks, kv0, ss0)


def chain_sampler():
    base = jnp.asarray(rng.normal(size=(S, V), scale=2.0), jnp.float32)

    def run(x, sstate):
        def body(carry, i):
            x, sstate = carry
            tok, _, _, _, sstate = sample_impl(x, sstate, arrs, active)
            # data-dependence so steps serialize
            x = base + tok[:, None].astype(jnp.float32) * 1e-6
            return (x, sstate), None
        (x, sstate), _ = jax.lax.scan(body, (x, sstate),
                                      jnp.arange(K, dtype=jnp.int32))
        return x

    return jax.jit(run, donate_argnums=(1,)), (base, init_sampler_state(S, V))


def chain_outmm():
    x0 = jnp.asarray(rng.normal(size=(S, E)), jnp.bfloat16)

    def run(w, x):
        def body(x, i):
            y = mm(x, w)                       # [S, V]
            x = y[:, :E].astype(jnp.bfloat16) * 1e-3
            return x, None
        x, _ = jax.lax.scan(body, x, jnp.arange(K, dtype=jnp.int32))
        return x

    return jax.jit(run), (params["output"], x0)


def chain_mlp():
    x0 = jnp.asarray(rng.normal(size=(S, E)), jnp.bfloat16)

    def run(lw, x):
        def body(x, i):
            def layer(x, lp):
                wq, wk, wv, wo, g, u, d = lp
                q = mm(x, wq)
                kk = mm(x, wk)
                vv = mm(x, wv)
                a = mm(q.astype(jnp.bfloat16), wo)
                h = mm(x, g) * mm(x, u)
                o = mm(h.astype(jnp.bfloat16), d)
                return (x + a + o
                        + kk.sum(-1, keepdims=True) * 0
                        + vv.sum(-1, keepdims=True) * 0).astype(jnp.bfloat16), None
            x, _ = jax.lax.scan(
                layer, x, (lw["wq"], lw["wk"], lw["wv"], lw["wo"],
                           lw["w_gate"], lw["w_up"], lw["w_down"]))
            return x, None
        x, _ = jax.lax.scan(body, x, jnp.arange(K, dtype=jnp.int32))
        return x

    return jax.jit(run), (params["layers"], x0)


PARTS = __import__("sys").argv[1:] or ["sampler", "outmm", "mlp"]

if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    if "full" in PARTS:
        fn, args = chain_engine(C, True)
        timed("full", fn, *args)
    if "fwd" in PARTS:
        fn, args = chain_engine(C, False)
        timed("fwd_argmax", fn, *args)
    if "fwd128" in PARTS:
        fn, args = chain_engine(128, False)
        timed("fwd_c128", fn, *args)
    if "sampler" in PARTS:
        fn, args = chain_sampler()
        timed("sampler", fn, *args)
    if "outmm" in PARTS:
        fn, args = chain_outmm()
        timed("outmm", fn, *args)
    if "mlp" in PARTS:
        fn, args = chain_mlp()
        timed("mlp", fn, *args)
