"""Batched deferred flash prefill kernel vs explicit-softmax reference.

Covers every mask mode the engine produces (reference llama.cpp builds the
same unified masks inside llama_decode): plain causal, sliding window,
llama4 chunked attention, gemma3 bidirectional spans, softcap, int8
caches, multi-row batches with distinct pos0/n_valid, and Dk != Dv.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.ops.flash_prefill import flash_prefill_batched


def ref_attn(q, kc, vc, kr, vr, meta, win, ks=None, vs=None, softcap=0.0,
             sinks=None):
    q = np.asarray(q, np.float32)
    B, Hkv, G, T, D = q.shape
    C = kc.shape[1]
    Dv = vc.shape[-1]
    kc = np.asarray(kc, np.float32)
    vc = np.asarray(vc, np.float32)
    if ks is not None:
        kc = kc * np.asarray(ks, np.float32)[..., None]
        vc = vc * np.asarray(vs, np.float32)[..., None]
    kr = np.asarray(kr, np.float32)
    vr = np.asarray(vr, np.float32)
    w, cw = int(win[0]), int(win[1])
    out = np.zeros((B, Hkv, G, T, Dv), np.float32)
    for b in range(B):
        pos0, nv, st, en = (int(x) for x in meta[b])
        # absolute positions: cache index c is position c; row r is pos0+r
        kpos = np.concatenate([np.arange(C), pos0 + np.arange(T)])
        kvalid = np.concatenate([np.arange(C) < pos0, np.arange(T) < nv])
        for h in range(Hkv):
            kall = np.concatenate([kc[b, :, h], kr[b, :, h]])   # [C+T, D]
            vall = np.concatenate([vc[b, :, h], vr[b, :, h]])
            for g in range(G):
                s = q[b, h, g] @ kall.T * (D ** -0.5)           # [T, C+T]
                if softcap > 0:
                    s = softcap * np.tanh(s / softcap)
                qpos = pos0 + np.arange(T)[:, None]
                mask = (kpos[None, :] <= qpos) & kvalid[None, :]
                if w > 0:
                    mask &= kpos[None, :] > qpos - w
                if cw > 0:
                    mask &= (kpos[None, :] // cw) == (qpos // cw)
                bid = (kpos[None, :] >= st) & (kpos[None, :] < en) \
                    & kvalid[None, :]
                mask |= bid
                s = np.where(mask, s, -1e30)
                m = s.max(-1, keepdims=True)
                if sinks is not None:
                    m = np.maximum(m, sinks[h, g])
                p = np.exp(s - m)
                den = p.sum(-1, keepdims=True) + 1e-30
                if sinks is not None:
                    den = den + np.exp(sinks[h, g] - m)
                p /= den
                out[b, h, g] = p @ vall
    return out


def make_case(rng, B=2, Hkv=2, G=2, T=64, C=128, D=32, Dv=None,
              pos0=(48, 16), n_valid=(64, 40), spans=None):
    Dv = Dv or D
    q = rng.standard_normal((B, Hkv, G, T, D), np.float32)
    kc = rng.standard_normal((B, C, Hkv, D), np.float32)
    vc = rng.standard_normal((B, C, Hkv, Dv), np.float32)
    kr = rng.standard_normal((B, T, Hkv, D), np.float32)
    vr = rng.standard_normal((B, T, Hkv, Dv), np.float32)
    meta = np.zeros((B, 4), np.int32)
    for b in range(B):
        meta[b, 0] = pos0[b]
        meta[b, 1] = n_valid[b]
        if spans is not None:
            meta[b, 2], meta[b, 3] = spans[b]
    return q, kc, vc, kr, vr, meta


@pytest.mark.parametrize("win,softcap,spans", [
    ((0, 0), 0.0, None),
    ((24, 0), 0.0, None),             # sliding window
    ((0, 32), 0.0, None),             # llama4 chunked attention
    ((0, 0), 30.0, None),             # gemma2 softcap
    ((24, 0), 0.0, [(8, 40), (0, 0)]),  # gemma3 bidir span overrides swa
])
def test_flash_matches_reference(win, softcap, spans):
    rng = np.random.default_rng(0)
    q, kc, vc, kr, vr, meta = make_case(rng, spans=spans)
    win = np.asarray(win, np.int32)
    want = ref_attn(q, kc, vc, kr, vr, meta, win, softcap=softcap)
    got = flash_prefill_batched(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(kr), jnp.asarray(vr), jnp.asarray(meta),
        jnp.asarray(win), softcap=softcap, bq=32, bc=32, interpret=True)
    assert_valid_rows_close(np.asarray(got), want, meta)


def test_flash_attention_sinks():
    """gpt-oss sinks: per-head logit in the softmax denominator, folded
    into the kernel's final normalize."""
    rng = np.random.default_rng(4)
    q, kc, vc, kr, vr, meta = make_case(rng)
    sinks = rng.standard_normal((2, 2)).astype(np.float32) * 2.0
    win = np.zeros((2,), np.int32)
    want = ref_attn(q, kc, vc, kr, vr, meta, win, sinks=sinks)
    got = flash_prefill_batched(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(kr), jnp.asarray(vr), jnp.asarray(meta),
        jnp.asarray(win), sinks=jnp.asarray(sinks),
        bq=32, bc=32, interpret=True)
    assert_valid_rows_close(np.asarray(got), want, meta)


def assert_valid_rows_close(got, want, meta, rtol=2e-5, atol=2e-5):
    """Rows past n_valid are ignored downstream (their K/V rows scatter to
    the position>=C sentinel) — a fully-masked invalid row yields zeros
    from the kernel but uniform-attention garbage from the reference."""
    for b in range(got.shape[0]):
        nv = int(meta[b, 1])
        np.testing.assert_allclose(got[b, :, :, :nv], want[b, :, :, :nv],
                                   rtol=rtol, atol=atol)


def test_flash_int8_cache():
    rng = np.random.default_rng(1)
    q, kc, vc, kr, vr, meta = make_case(rng)
    ks = rng.uniform(0.01, 0.05, (2, 128, 2)).astype(np.float32)
    vs = rng.uniform(0.01, 0.05, (2, 128, 2)).astype(np.float32)
    kq = np.clip(np.round(kc / ks[..., None]), -127, 127).astype(np.int8)
    vq = np.clip(np.round(vc / vs[..., None]), -127, 127).astype(np.int8)
    win = np.zeros((2,), np.int32)
    want = ref_attn(q, kq, vq, kr, vr, meta, win, ks=ks, vs=vs)
    got = flash_prefill_batched(
        jnp.asarray(q, jnp.float32), jnp.asarray(kq), jnp.asarray(vq),
        jnp.asarray(kr), jnp.asarray(vr), jnp.asarray(meta),
        jnp.asarray(win), k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
        bq=32, bc=32, interpret=True)
    # int8 dequant runs in bf16 inside the kernel
    assert_valid_rows_close(np.asarray(got), want, meta, rtol=2e-2,
                            atol=2e-2)


def test_flash_unequal_head_dims():
    rng = np.random.default_rng(2)
    q, kc, vc, kr, vr, meta = make_case(rng, D=32, Dv=16)
    win = np.zeros((2,), np.int32)
    want = ref_attn(q, kc, vc, kr, vr, meta, win)
    got = flash_prefill_batched(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(kr), jnp.asarray(vr), jnp.asarray(meta),
        jnp.asarray(win), bq=32, bc=32, interpret=True)
    assert_valid_rows_close(np.asarray(got), want, meta)


def test_flash_fresh_slot_no_cache_reads():
    """pos0 = 0: every cache block is skipped; only in-chunk attention."""
    rng = np.random.default_rng(3)
    q, kc, vc, kr, vr, meta = make_case(rng, pos0=(0, 0), n_valid=(64, 3))
    # poison the cache: NaNs must never be read
    kc[:] = np.nan
    vc[:] = np.nan
    win = np.zeros((2,), np.int32)
    want = ref_attn(q, np.zeros_like(kc), np.zeros_like(vc), kr, vr,
                    meta, win)
    got = flash_prefill_batched(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(kr), jnp.asarray(vr), jnp.asarray(meta),
        jnp.asarray(win), bq=32, bc=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got)[:, :, :, :3],
                               want[:, :, :, :3], rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# model-level parity: the engine's prefill programs produce the same result
# through the flash kernel (LLAMA_BOX_TPU_FORCE_FLASH, interpret mode) as
# through the masked-einsum fallback, across arch mask variants
# ---------------------------------------------------------------------------

import dataclasses

import jax.numpy as jnp2  # noqa: F401 (alias below keeps top import tidy)


def _variant_cfg(name):
    from llama_box_tpu.models.config import ModelConfig
    base = dict(arch="llama", n_layers=3, n_embd=64, n_heads=4,
                n_kv_heads=2, head_dim=16, n_ff=128, vocab_size=97,
                rope_dim=16)
    if name == "swa_alt":        # gemma3-style alternating sliding window
        base.update(swa_window=48, swa_pattern=2)
    elif name == "sinks":        # gpt-oss attention sinks + alternating SWA
        base.update(swa_window=48, swa_pattern=2)
    elif name == "chunked":      # llama4-style chunked attention + nope
        base.update(chunked_window=64, nope_layer_step=3)
    elif name == "softcap":      # gemma2 logit softcap
        base.update(attn_softcap=30.0)
    return ModelConfig(**base)


def _variant_params(rng, cfg):
    L, E = cfg.n_layers, cfg.n_embd
    H, Hkv, D, FF, V = (cfg.n_heads, cfg.n_kv_heads, cfg.head_dim,
                        cfg.n_ff, cfg.vocab_size)

    def r(*shape):
        return jnp.asarray(rng.normal(size=shape, scale=0.05), jnp.float32)

    params = {
        "tok_embd": r(V, E),
        "output_norm": jnp.ones((E,), jnp.float32),
        "output": r(E, V),
        "layers": {
            "attn_norm": jnp.ones((L, E), jnp.float32),
            "wq": r(L, E, H * D), "wk": r(L, E, Hkv * D),
            "wv": r(L, E, Hkv * D), "wo": r(L, H * D, E),
            "ffn_norm": jnp.ones((L, E), jnp.float32),
            "w_gate": r(L, E, FF), "w_up": r(L, E, FF),
            "w_down": r(L, FF, E),
        },
    }
    return params


def _run_prefills(cfg, params, kv_dtype, batched, span=None):
    from llama_box_tpu.models.llama import (init_kv_cache, make_rope,
                                            prefill_batch_impl, prefill_impl)
    rng = np.random.default_rng(7)
    C = 256
    cos, sin = make_rope(cfg, C)
    if batched:
        kv = init_kv_cache(cfg, 2, C, kv_dtype)
        outs = []
        for pos_base in (np.array([0, 0]), np.array([64, 64])):
            toks = jnp.asarray(
                rng.integers(0, cfg.vocab_size, (2, 64)), jnp.int32)
            logits, kv = prefill_batch_impl(
                params, cfg, toks, jnp.asarray(pos_base, jnp.int32),
                jnp.asarray([64, 37], jnp.int32), kv, cos, sin)
            outs.append(np.asarray(logits))
        return outs, kv
    kv = init_kv_cache(cfg, 1, C, kv_dtype)
    outs = []
    for pos_base in (0, 64):
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (64,)), jnp.int32)
        kwargs = {}
        if span is not None:
            kwargs["bidir_span"] = (jnp.int32(span[0]), jnp.int32(span[1]))
            from llama_box_tpu.models.llama import prefill_embed_impl
            x = jnp.asarray(rng.normal(size=(64, cfg.n_embd), scale=0.05),
                            jnp.float32)
            logits, kv = prefill_embed_impl(
                params, cfg, x, kv, jnp.int32(0), jnp.int32(pos_base),
                jnp.int32(64), cos, sin, **kwargs)
        else:
            logits, kv = prefill_impl(
                params, cfg, toks, kv, jnp.int32(0), jnp.int32(pos_base),
                jnp.int32(64 if pos_base == 0 else 37), cos, sin)
        outs.append(np.asarray(logits))
    return outs, kv


@pytest.mark.parametrize("variant", ["plain", "swa_alt", "chunked",
                                     "softcap"])
@pytest.mark.parametrize("batched", [False, True])
def test_model_prefill_flash_matches_einsum(monkeypatch, variant, batched):
    cfg = _variant_cfg(variant)
    params = _variant_params(np.random.default_rng(0), cfg)
    monkeypatch.delenv("LLAMA_BOX_TPU_FORCE_FLASH", raising=False)
    ref_out, ref_kv = _run_prefills(cfg, params, jnp.float32, batched)
    monkeypatch.setenv("LLAMA_BOX_TPU_FORCE_FLASH", "1")
    got_out, got_kv = _run_prefills(cfg, params, jnp.float32, batched)
    for r, g in zip(ref_out, got_out):
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4)
    # pad rows (past n_valid) hold path-dependent garbage the masks never
    # expose; compare the valid extent only (64 + 37 tokens written)
    np.testing.assert_allclose(np.asarray(got_kv.k)[:, :, :101],
                               np.asarray(ref_kv.k)[:, :, :101],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("batched", [False, True])
def test_model_prefill_flash_int8_kv(monkeypatch, batched):
    cfg = _variant_cfg("plain")
    params = _variant_params(np.random.default_rng(1), cfg)
    monkeypatch.delenv("LLAMA_BOX_TPU_FORCE_FLASH", raising=False)
    ref_out, _ = _run_prefills(cfg, params, jnp.int8, batched)
    monkeypatch.setenv("LLAMA_BOX_TPU_FORCE_FLASH", "1")
    got_out, _ = _run_prefills(cfg, params, jnp.int8, batched)
    for r, g in zip(ref_out, got_out):
        np.testing.assert_allclose(g, r, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("batched", [False, True])
def test_model_prefill_flash_sinks(monkeypatch, batched):
    """gpt-oss attention sinks through the flash kernel match the
    masked-einsum path (incl. alternating SWA)."""
    cfg = _variant_cfg("sinks")
    params = _variant_params(np.random.default_rng(5), cfg)
    rng = np.random.default_rng(6)
    params["layers"]["sinks"] = jnp.asarray(
        rng.normal(size=(cfg.n_layers, cfg.n_heads), scale=2.0),
        jnp.float32)
    monkeypatch.delenv("LLAMA_BOX_TPU_FORCE_FLASH", raising=False)
    ref_out, _ = _run_prefills(cfg, params, jnp.float32, batched)
    monkeypatch.setenv("LLAMA_BOX_TPU_FORCE_FLASH", "1")
    got_out, _ = _run_prefills(cfg, params, jnp.float32, batched)
    for r, g in zip(ref_out, got_out):
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4)


def test_model_prefill_flash_bidir_span(monkeypatch):
    """gemma3 vision span: second chunk's queries see cache entries in
    [16, 48) non-causally — flash and einsum paths agree."""
    cfg = _variant_cfg("swa_alt")
    params = _variant_params(np.random.default_rng(2), cfg)
    monkeypatch.delenv("LLAMA_BOX_TPU_FORCE_FLASH", raising=False)
    ref_out, _ = _run_prefills(cfg, params, jnp.float32, False, span=(16, 48))
    monkeypatch.setenv("LLAMA_BOX_TPU_FORCE_FLASH", "1")
    got_out, _ = _run_prefills(cfg, params, jnp.float32, False, span=(16, 48))
    for r, g in zip(ref_out, got_out):
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4)


def test_int8_kv_chain_flash_matches_einsum(tmp_path, monkeypatch):
    """Chained decode with an int8 KV cache through the flash kernel
    (interpret mode) matches the einsum dequant path: greedy tokens
    identical on the tiny fixture."""
    import jax.numpy as jnp

    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.sampling import SamplerParams
    from llama_box_tpu.server import Engine, EngineConfig
    from llama_box_tpu.server.task import CompletionsTask
    from llama_box_tpu.tokenizer import Tokenizer
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)

    def run(force_flash):
        if force_flash:
            monkeypatch.setenv("LLAMA_BOX_TPU_FORCE_FLASH", "1")
        else:
            monkeypatch.delenv("LLAMA_BOX_TPU_FORCE_FLASH", raising=False)
        cfg, params = load_model(path, dtype=jnp.float32)
        with GGUFFile(path) as g:
            tok = Tokenizer.from_gguf(g)
        eng = Engine(cfg, params, tok,
                     EngineConfig(n_slots=2, n_ctx=64, n_ubatch=16,
                                  kv_dtype="int8", decode_chain=4))
        eng.start()
        try:
            t = CompletionsTask(tok.encode("a b c d"),
                                SamplerParams(temp=0.0, seed=0),
                                tokenizer=tok, max_tokens=10, stream=False)
            eng.submit(t)
            while True:
                kind, payload = t.result_q.get(timeout=180)
                if kind == "final":
                    return payload.generated
                if kind == "error":
                    raise payload
        finally:
            eng.stop()

    base = run(False)
    flash = run(True)
    assert flash == base
