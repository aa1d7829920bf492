"""Real-TPU lowering smoke for the batched flash prefill kernel.

Run under the axon backend (default on this host). Checks that Mosaic
compiles and executes the kernel for the head geometries the engine
actually serves, and cross-checks numerics vs interpret mode.
"""
import numpy as np
import jax
import jax.numpy as jnp

from llama_box_tpu.ops.flash_prefill import flash_prefill_batched


def run_case(name, B, Hkv, G, T, C, D, Dv=None, quant=False, win=(0, 0),
             softcap=0.0):
    Dv = Dv or D
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hkv, G, T, D)), jnp.bfloat16)
    kr = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    vr = jnp.asarray(rng.standard_normal((B, T, Hkv, Dv)), jnp.bfloat16)
    meta = np.zeros((B, 4), np.int32)
    meta[:, 0] = C // 4
    meta[:, 1] = T
    meta = jnp.asarray(meta)
    w = jnp.asarray(win, jnp.int32)
    kw = {}
    if quant:
        kc = jnp.asarray(rng.integers(-127, 127, (B, C, Hkv, D)), jnp.int8)
        vc = jnp.asarray(rng.integers(-127, 127, (B, C, Hkv, Dv)), jnp.int8)
        kw["k_scale"] = jnp.asarray(
            rng.uniform(0.01, 0.05, (B, C, Hkv)), jnp.float32)
        kw["v_scale"] = jnp.asarray(
            rng.uniform(0.01, 0.05, (B, C, Hkv)), jnp.float32)
    else:
        kc = jnp.asarray(rng.standard_normal((B, C, Hkv, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((B, C, Hkv, Dv)), jnp.bfloat16)
    got = np.asarray(flash_prefill_batched(
        q, kc, vc, kr, vr, meta, w, softcap=softcap, **kw))
    want = np.asarray(flash_prefill_batched(
        q, kc, vc, kr, vr, meta, w, softcap=softcap, interpret=True, **kw))
    err = np.max(np.abs(got - want))
    print(f"{name}: max|tpu-interp| = {err:.4g}", flush=True)
    assert err < 2e-2, name
    return err


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run_case("tinyllama b4", B=4, Hkv=4, G=8, T=512, C=2048, D=64)
    run_case("llama8b", B=1, Hkv=8, G=4, T=512, C=4096, D=128)
    run_case("llama8b int8kv", B=1, Hkv=8, G=4, T=512, C=4096, D=128,
             quant=True)
    run_case("gemma swa+softcap", B=2, Hkv=4, G=2, T=256, C=2048, D=256,
             win=(512, 0), softcap=30.0)
    run_case("tiny fixture", B=1, Hkv=2, G=2, T=64, C=2048, D=16)
    run_case("mha g1", B=1, Hkv=8, G=1, T=128, C=1024, D=64)
    print("ALL OK", flush=True)
