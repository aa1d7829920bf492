"""Single-query flash decode kernel (ops/flash_decode) vs explicit
softmax reference.

Covers the chain-decode mask semantics (models/llama._attn_deferred):
cache entries at positions covered by the chain window are stale and
masked; chain row i holds position cpos - (nv-1) + i; sliding window /
chunked attention floors; softcap; sinks; int8 caches; Dk != Dv; and the
index-map clamping property that blocks at/after the live region are
never read (NaN poisoning).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.ops.flash_decode import flash_decode


def ref_decode(q, kc, vc, kr, vr, meta, win, ks=None, vs=None,
               softcap=0.0, sinks=None, scale=None):
    q = np.asarray(q, np.float32)
    B, Hkv, G, D = q.shape
    C = kc.shape[1]
    Dv = vc.shape[-1]
    R = kr.shape[1]
    kc = np.asarray(kc, np.float32)
    vc = np.asarray(vc, np.float32)
    if ks is not None:
        kc = kc * np.asarray(ks, np.float32)[..., None]
        vc = vc * np.asarray(vs, np.float32)[..., None]
    kr = np.asarray(kr, np.float32)
    vr = np.asarray(vr, np.float32)
    w, cw = int(win[0]), int(win[1])
    sc = scale if scale is not None else D ** -0.5
    out = np.zeros((B, Hkv, G, Dv), np.float32)
    for b in range(B):
        cpos, nv = int(meta[b, 0]), int(meta[b, 1])
        cstart = cpos - nv + 1
        kpos = np.concatenate([np.arange(C), cstart + np.arange(R)])
        kvalid = np.concatenate([np.arange(C) < cstart,
                                 (np.arange(R) < nv)
                                 & (cstart + np.arange(R) >= 0)])
        mask = (kpos <= cpos) & kvalid
        if w > 0:
            mask &= kpos > cpos - w
        if cw > 0:
            mask &= (kpos // cw) == (cpos // cw)
        for h in range(Hkv):
            kall = np.concatenate([kc[b, :, h], kr[b, :, h]])
            vall = np.concatenate([vc[b, :, h], vr[b, :, h]])
            for g in range(G):
                s = kall @ q[b, h, g] * sc                  # [C+R]
                if softcap > 0:
                    s = softcap * np.tanh(s / softcap)
                s = np.where(mask, s, -1e30)
                m = s.max()
                if sinks is not None:
                    m = max(m, sinks[h, g])
                p = np.exp(s - m)
                den = p.sum() + 1e-30
                if sinks is not None:
                    den = den + np.exp(sinks[h, g] - m)
                out[b, h, g] = (p / den) @ vall
    return out


def make_case(rng, B=2, Hkv=2, G=2, R=8, C=128, D=32, Dv=None,
              cpos=(100, 17), nv=(5, 1)):
    Dv = Dv or D
    q = rng.standard_normal((B, Hkv, G, D), np.float32)
    kc = rng.standard_normal((B, C, Hkv, D), np.float32)
    vc = rng.standard_normal((B, C, Hkv, Dv), np.float32)
    kr = rng.standard_normal((B, R, Hkv, D), np.float32)
    vr = rng.standard_normal((B, R, Hkv, Dv), np.float32)
    meta = np.stack([np.asarray(cpos, np.int32),
                     np.asarray(nv, np.int32)], axis=1)
    return q, kc, vc, kr, vr, meta


def run_kernel(q, kc, vc, kr, vr, meta, win, **kw):
    return np.asarray(flash_decode(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(kr), jnp.asarray(vr), jnp.asarray(meta),
        jnp.asarray(win, jnp.int32), bc=32, interpret=True, **kw))


@pytest.mark.parametrize("win,softcap", [
    ((0, 0), 0.0),
    ((24, 0), 0.0),              # sliding window
    ((0, 32), 0.0),              # llama4 chunked attention
    ((0, 0), 30.0),              # gemma2 softcap
])
def test_decode_matches_reference(win, softcap):
    rng = np.random.default_rng(0)
    q, kc, vc, kr, vr, meta = make_case(rng)
    want = ref_decode(q, kc, vc, kr, vr, meta, win, softcap=softcap)
    got = run_kernel(q, kc, vc, kr, vr, meta, win, softcap=softcap)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_sinks():
    rng = np.random.default_rng(1)
    q, kc, vc, kr, vr, meta = make_case(rng)
    sinks = rng.standard_normal((2, 2)).astype(np.float32) * 2.0
    want = ref_decode(q, kc, vc, kr, vr, meta, (0, 0), sinks=sinks)
    got = run_kernel(q, kc, vc, kr, vr, meta, (0, 0),
                     sinks=jnp.asarray(sinks))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_int8_cache():
    rng = np.random.default_rng(2)
    q, kc, vc, kr, vr, meta = make_case(rng)
    ks = rng.uniform(0.01, 0.05, (2, 128, 2)).astype(np.float32)
    vs = rng.uniform(0.01, 0.05, (2, 128, 2)).astype(np.float32)
    kq = np.clip(np.round(kc / ks[..., None]), -127, 127).astype(np.int8)
    vq = np.clip(np.round(vc / vs[..., None]), -127, 127).astype(np.int8)
    want = ref_decode(q, kq, vq, kr, vr, meta, (0, 0), ks=ks, vs=vs)
    got = np.asarray(flash_decode(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq),
        jnp.asarray(kr), jnp.asarray(vr), jnp.asarray(meta),
        jnp.zeros((2,), jnp.int32), k_scale=jnp.asarray(ks),
        v_scale=jnp.asarray(vs), bc=32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_decode_unequal_head_dims():
    rng = np.random.default_rng(3)
    q, kc, vc, kr, vr, meta = make_case(rng, D=32, Dv=16)
    want = ref_decode(q, kc, vc, kr, vr, meta, (0, 0))
    got = run_kernel(q, kc, vc, kr, vr, meta, (0, 0))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_skips_dead_blocks():
    """Cache blocks at/after the live region (and the whole cache for a
    fresh slot) are clamped away by the index maps — poison them with
    NaNs and require a clean result."""
    rng = np.random.default_rng(4)
    q, kc, vc, kr, vr, meta = make_case(rng, cpos=(40, 2), nv=(3, 3))
    kc2, vc2 = kc.copy(), vc.copy()
    # slot 0: live region is [0, 38); blocks >= ceil(38/32) are dead
    kc2[0, 64:] = np.nan
    vc2[0, 64:] = np.nan
    # slot 1: cstart = 0 — the whole cache is dead
    kc2[1, :] = np.nan
    vc2[1, :] = np.nan
    want = ref_decode(q, kc, vc, kr, vr, meta, (0, 0))
    got = run_kernel(q, kc2, vc2, kr, vr, meta, (0, 0))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_window_floor_blocks_skipped():
    """With a sliding window, blocks wholly below the window floor are
    clamped away — poison them and require a clean, correct result."""
    rng = np.random.default_rng(5)
    q, kc, vc, kr, vr, meta = make_case(rng, cpos=(120, 121), nv=(2, 2))
    win = (24, 0)
    kc2, vc2 = kc.copy(), vc.copy()
    # window floor ~ cpos-23 >= 96; blocks [0, 96/32) are dead
    kc2[:, :64] = np.nan
    vc2[:, :64] = np.nan
    want = ref_decode(q, kc, vc, kr, vr, meta, win)
    got = run_kernel(q, kc2, vc2, kr, vr, meta, win)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_attn_scale():
    rng = np.random.default_rng(6)
    q, kc, vc, kr, vr, meta = make_case(rng)
    want = ref_decode(q, kc, vc, kr, vr, meta, (0, 0), scale=0.25)
    got = run_kernel(q, kc, vc, kr, vr, meta, (0, 0), scale=0.25)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_chain_decode_flash_matches_einsum_bf16(tmp_path, monkeypatch):
    """Engine chained decode (bf16 KV) through flash_decode (interpret)
    produces the same greedy tokens as the einsum path."""
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
                                  kv_dtype="float32", decode_chain=4))
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
