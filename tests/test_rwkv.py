"""RWKV6/RWKV7 family: step-by-step numpy reference vs the chunked-scan
JAX implementation, prefill/decode state consistency, and engine greedy.

transformers ships no rwkv6/7 classes (v4 only), so the golden here is an
INDEPENDENT sequential numpy implementation of the published RWKV6/RWKV7
formulas (BlinkDL/RWKV-LM; llama.cpp build_rwkv6/build_rwkv7) run against
the same GGUF weights — it exercises the conversion layout, the chunked
associative WKV scan, token-shift state handling, and batching/masking.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.models import load_model
from llama_box_tpu.models.mamba import (
    init_rec_cache, rec_prefill_batch_impl, rec_prefill_impl,
)
from llama_box_tpu.sampling import SamplerParams
from llama_box_tpu.server import CompletionsTask, Engine, EngineConfig
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_rwkv import (HEAD_SIZE, N_EMBD, write_tiny_rwkv6,
                                      write_tiny_rwkv7)


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _gn_heads(y, w, b, H, eps=64e-5):
    """y [H, hs] per-head groupnorm, flat scale/shift."""
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    yn = (y - mu) / np.sqrt(var + eps)
    return yn.reshape(-1) * w + b


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softplus(x):
    return np.logaddexp(x, 0.0)


def rwkv6_ref(p, tokens):
    """Sequential rwkv6 forward; returns logits [T, V]."""
    E, hs = N_EMBD, HEAD_SIZE
    H = E // hs
    L = len(p["layers"])
    att_prev = [np.zeros(E) for _ in range(L)]
    ffn_prev = [np.zeros(E) for _ in range(L)]
    S = [np.zeros((H, hs, hs)) for _ in range(L)]
    out = []
    for t in tokens:
        h = p["token_embd"][t].astype(np.float64)
        h = _ln(h, p["tok_norm_w"], p["tok_norm_b"])
        for li, lp in enumerate(p["layers"]):
            xa = _ln(h, lp["ln1_w"], lp["ln1_b"])
            sx = att_prev[li] - xa
            att_prev[li] = xa
            xxx = xa + sx * lp["lerp_x"]
            z = np.tanh(xxx @ lp["w1"].T).reshape(5, -1)
            m = np.einsum("fe,foe->fo", z, lp["w2"])   # w2 [5, out, in]
            xw = xa + sx * (lp["lerp_w"] + m[0])
            xk = xa + sx * (lp["lerp_k"] + m[1])
            xv = xa + sx * (lp["lerp_v"] + m[2])
            xr = xa + sx * (lp["lerp_r"] + m[3])
            xg = xa + sx * (lp["lerp_g"] + m[4])
            r = (xr @ lp["Wr"].T).reshape(H, hs)
            k = (xk @ lp["Wk"].T).reshape(H, hs)
            v = (xv @ lp["Wv"].T).reshape(H, hs)
            g_in = xg @ lp["Wg"].T
            g = g_in * _sigmoid(g_in)
            ww = lp["decay"] + np.tanh(xw @ lp["decay_w1"].T) \
                @ lp["decay_w2"].T
            w = np.exp(-np.exp(ww)).reshape(H, hs)
            u = lp["first"]
            y = np.zeros((H, hs))
            for hh in range(H):
                a = np.outer(k[hh], v[hh])
                y[hh] = r[hh] @ (S[li][hh] + u[hh][:, None] * a)
                S[li][hh] = w[hh][:, None] * S[li][hh] + a
            att = (_gn_heads(y, lp["ln_x_w"], lp["ln_x_b"], H) * g) \
                @ lp["Wo"].T
            h = h + att
            xf = _ln(h, lp["ln2_w"], lp["ln2_b"])
            sxf = ffn_prev[li] - xf
            ffn_prev[li] = xf
            xk2 = xf + sxf * lp["cm_lerp_k"]
            xr2 = xf + sxf * lp["cm_lerp_r"]
            kk = np.square(np.maximum(xk2 @ lp["cm_Wk"].T, 0.0))
            ffn = _sigmoid(xr2 @ lp["cm_Wr"].T) * (kk @ lp["cm_Wv"].T)
            h = h + ffn
        ho = _ln(h, p["output_norm_w"], p["output_norm_b"])
        out.append(ho @ p["output"].T)
    return np.stack(out)


def rwkv7_ref(p, tokens):
    """Sequential rwkv7 forward; returns logits [T, V]."""
    E, hs = N_EMBD, HEAD_SIZE
    H = E // hs
    L = len(p["layers"])
    att_prev = [np.zeros(E) for _ in range(L)]
    ffn_prev = [np.zeros(E) for _ in range(L)]
    S = [np.zeros((H, hs, hs)) for _ in range(L)]   # [H, hs_v, hs_k]
    out = []
    for t in tokens:
        h = p["token_embd"][t].astype(np.float64)
        h = _ln(h, p["tok_norm_w"], p["tok_norm_b"])
        v_first = None
        for li, lp in enumerate(p["layers"]):
            xa = _ln(h, lp["ln1_w"], lp["ln1_b"])
            sx = att_prev[li] - xa
            att_prev[li] = xa
            xr = xa + sx * lp["lerp_r"]
            xw = xa + sx * lp["lerp_w"]
            xk = xa + sx * lp["lerp_k"]
            xv = xa + sx * lp["lerp_v"]
            xaa = xa + sx * lp["lerp_a"]
            xg = xa + sx * lp["lerp_g"]
            r = xr @ lp["Wr"].T
            k = xk @ lp["Wk"].T
            v = xv @ lp["Wv"].T
            ww = -_softplus(-(lp["w0"] + np.tanh(xw @ lp["w1"].T)
                              @ lp["w2"].T)) - 0.5
            w = np.exp(-np.exp(ww)).reshape(H, hs)
            if "v0" not in lp:
                v_first = v
            else:
                vg = _sigmoid(lp["v0"] + (xv @ lp["v1"].T) @ lp["v2"].T)
                v = v + (v_first - v) * vg
            a = _sigmoid(lp["a0"] + (xaa @ lp["a1"].T) @ lp["a2"].T)
            g = _sigmoid(xg @ lp["g1"].T) @ lp["g2"].T
            kk = (k * lp["k_k"]).reshape(H, hs)
            kk = kk / np.sqrt((kk * kk).sum(-1, keepdims=True) + 1e-12)
            k2 = (k * (1.0 + (a - 1.0) * lp["k_a"])).reshape(H, hs)
            rh = r.reshape(H, hs)
            vh = v.reshape(H, hs)
            ah = a.reshape(H, hs)
            y = np.zeros((H, hs))
            for hh in range(H):
                vk = np.outer(vh[hh], k2[hh])
                ab = np.outer(-kk[hh], kk[hh] * ah[hh])
                S[li][hh] = S[li][hh] * w[hh][None, :] \
                    + S[li][hh] @ ab + vk
                y[hh] = S[li][hh] @ rh[hh]
            gn = _gn_heads(y, lp["ln_x_w"], lp["ln_x_b"], H)
            rk = lp["r_k"]
            bonus = ((rh * k2.reshape(H, hs) * rk).sum(-1, keepdims=True)
                     * vh).reshape(-1)
            att = ((gn + bonus) * g) @ lp["Wo"].T
            h = h + att
            xf = _ln(h, lp["ln2_w"], lp["ln2_b"])
            sxf = ffn_prev[li] - xf
            ffn_prev[li] = xf
            xk2 = xf + sxf * lp["cm_lerp_k"]
            kflat = np.square(np.maximum(xk2 @ lp["cm_Wk"].T, 0.0))
            h = h + kflat @ lp["cm_Wv"].T
        ho = _ln(h, p["output_norm_w"], p["output_norm_b"])
        out.append(ho @ p["output"].T)
    return np.stack(out)


@pytest.fixture(scope="module")
def rwkv6_setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rwkv6") / "tiny_rwkv6.gguf")
    raw = write_tiny_rwkv6(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return path, raw, cfg, params, tok


@pytest.fixture(scope="module")
def rwkv7_setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rwkv7") / "tiny_rwkv7.gguf")
    raw = write_tiny_rwkv7(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return path, raw, cfg, params, tok


def test_rwkv6_config_detect(rwkv6_setup):
    _, _, cfg, params, _ = rwkv6_setup
    assert cfg.recurrent
    assert cfg.wkv_head_size == HEAD_SIZE
    assert cfg.norm_style == "ln"
    assert cfg.rope_mode == "none"


def _prefill_logits(cfg, params, tokens, n_slots=1):
    cache = init_rec_cache(cfg, n_slots, 0, params)
    logits, cache = rec_prefill_impl(
        params, cfg, jnp.asarray(tokens, jnp.int32), cache, jnp.int32(0),
        jnp.int32(0), jnp.int32(len(tokens)))
    return np.asarray(logits), cache


def test_rwkv6_matches_numpy_reference(rwkv6_setup):
    _, raw, cfg, params, _ = rwkv6_setup
    rng = np.random.default_rng(3)
    toks = [int(t) for t in rng.integers(3, 250, 12)]
    want = rwkv6_ref(raw, toks)
    got, _ = _prefill_logits(cfg, params, toks)
    np.testing.assert_allclose(got, want[-1], rtol=2e-3, atol=2e-3)


def test_rwkv7_matches_numpy_reference(rwkv7_setup):
    _, raw, cfg, params, _ = rwkv7_setup
    rng = np.random.default_rng(4)
    toks = [int(t) for t in rng.integers(3, 250, 12)]
    want = rwkv7_ref(raw, toks)
    got, _ = _prefill_logits(cfg, params, toks)
    np.testing.assert_allclose(got, want[-1], rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("setup", ["rwkv6_setup", "rwkv7_setup"])
def test_rwkv_prefill_decode_consistency(setup, request):
    """prefill(T) then one-token prefill extensions == prefill(T+n):
    the chunked WKV scan and token-shift carry must agree with
    sequential stepping."""
    _, _, cfg, params, _ = request.getfixturevalue(setup)
    rng = np.random.default_rng(5)
    toks = [int(t) for t in rng.integers(3, 250, 14)]
    full, _ = _prefill_logits(cfg, params, toks)

    cache = init_rec_cache(cfg, 1, 0, params)
    logits, cache = rec_prefill_impl(
        params, cfg, jnp.asarray(toks[:9], jnp.int32), cache, jnp.int32(0),
        jnp.int32(0), jnp.int32(9))
    for i in range(9, 14):
        logits, cache = rec_prefill_impl(
            params, cfg, jnp.asarray(toks[i:i + 1], jnp.int32), cache,
            jnp.int32(0), jnp.int32(i), jnp.int32(1))
    np.testing.assert_allclose(np.asarray(logits), full, rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("setup", ["rwkv6_setup", "rwkv7_setup"])
def test_rwkv_chunk_padding_identity(setup, request):
    """A prompt that is NOT a multiple of the wkv chunk size (and rows
    with different n_valid in a batch) produce the same states as exact
    single-row prefill — exercises the chunked-scan masking."""
    _, _, cfg, params, _ = request.getfixturevalue(setup)
    rng = np.random.default_rng(6)
    t1 = [int(t) for t in rng.integers(3, 250, 11)]
    t2 = [int(t) for t in rng.integers(3, 250, 7)]
    l1, _ = _prefill_logits(cfg, params, t1)
    l2, _ = _prefill_logits(cfg, params, t2)

    cache = init_rec_cache(cfg, 2, 0, params)
    batch = np.zeros((2, 11), np.int32)
    batch[0, :11] = t1
    batch[1, :7] = t2
    logits, cache = rec_prefill_batch_impl(
        params, cfg, jnp.asarray(batch),
        jnp.asarray([0, 0], jnp.int32), jnp.asarray([11, 7], jnp.int32),
        cache)
    got = np.asarray(logits)
    np.testing.assert_allclose(got[0], l1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1], l2, rtol=2e-4, atol=2e-4)


def _engine_greedy(path, prompt="hello world", n=12, chain=1):
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=256, n_ubatch=16,
                              decode_chain=chain))
    eng.start()
    try:
        t = CompletionsTask(tok.encode(prompt), SamplerParams(temp=0.0),
                            tokenizer=tok, max_tokens=n, stream=False)
        eng.submit(t)
        while True:
            kind, payload = t.result_q.get(timeout=300)
            if kind == "final":
                return payload.generated
            if kind == "error":
                raise payload
    finally:
        eng.stop()


@pytest.mark.parametrize("setup", ["rwkv6_setup", "rwkv7_setup"])
def test_rwkv_engine_greedy_matches_reference(setup, request):
    """Engine greedy decode == argmax continuation of the numpy
    reference (chained and unchained identical)."""
    path, raw, cfg, params, tok = request.getfixturevalue(setup)
    ref_fn = rwkv6_ref if "6" in setup else rwkv7_ref
    prompt = tok.encode("hello world")
    toks = list(prompt)
    for _ in range(8):
        logits = ref_fn(raw, toks)
        toks.append(int(np.argmax(logits[-1])))
    want = toks[len(prompt):]
    got = _engine_greedy(path, n=8)
    assert got == want
    got_chain = _engine_greedy(path, n=8, chain=4)
    assert got_chain == want
