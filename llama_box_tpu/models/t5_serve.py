"""T5 encoder-decoder serving (the reference serves t5-family GGUFs
through llama.cpp's T5 graphs: llm_build_t5_enc/dec).

TPU-first layout: the whole encoder runs as ONE non-causal fused program
per prompt (relative-position bias, no rope, no 1/sqrt(d) score scale);
the decoder's cross-attention K/V over the encoder states are computed
once at prefill and stay static; autoregressive decode carries only the
decoder self-attention KV, chained K steps per dispatch like the other
engine branches.

GGUF conventions (llama.cpp T5Model conversion): token_embd shared,
enc.blk.N.* / dec.blk.N.* stacks, attn_rel_b on block 0 (shared down the
stack; bidirectional buckets for the encoder, causal for the decoder),
dec.blk.N.cross_attn_* without bias, t5.decoder_start_token_id, gated
(v1.1, GELU) or ungated (classic, ReLU) FFN, and the d_model^-0.5 logit
scale only for tied embeddings (output.weight absent).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF
from .config import ModelConfig


class T5Cache(NamedTuple):
    k: jnp.ndarray    # [Ld, S, C, H, Dkv] decoder self-attn keys
    v: jnp.ndarray
    ck: jnp.ndarray   # [Ld, S, Te, H, Dkv] cross-attn keys (per prompt)
    cv: jnp.ndarray
    enc_len: jnp.ndarray   # [S] int32 encoder valid lengths

    @property
    def capacity(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return False


def load_t5_serve(path: str, dtype=jnp.float32):
    """llama.cpp-converted T5 GGUF -> (ModelConfig, params)."""
    g = GGUFFile(path)
    cfg = ModelConfig.from_gguf(g)
    md = g.metadata
    a = cfg.arch   # "t5" / "t5encoder"
    extra = dict(cfg.extra)
    extra["t5_dec_start"] = int(md.get(f"{a}.decoder_start_token_id", 0))
    extra["t5_rel_buckets"] = int(
        md.get(f"{a}.attention.relative_buckets_count", 32))
    extra["t5_rel_max"] = 128
    extra["t5_d_kv"] = int(md.get(f"{a}.attention.key_length",
                                  cfg.n_embd // max(cfg.n_heads, 1)))
    cfg = dataclasses.replace(cfg, extra=extra)

    def t(name, transpose=False):
        if name not in g.tensors:
            return None
        x = g.tensor_f32(name)
        if transpose and x.ndim == 2:
            x = x.T
        return jnp.asarray(x, dtype)

    params = {
        "tok_embd": t("token_embd.weight"),
        "enc_norm": t("enc.output_norm.weight"),
        "dec_norm": t("dec.output_norm.weight"),
        "output": t("output.weight", True),
        "enc_rel_b": t("enc.blk.0.attn_rel_b.weight"),  # [buckets, H]
        "dec_rel_b": t("dec.blk.0.attn_rel_b.weight"),
    }

    def stack(prefix, names):
        layers = []
        i = 0
        while f"{prefix}.blk.{i}.attn_q.weight" in g.tensors:
            lp = {}
            for key, nm, tr in names:
                x = t(f"{prefix}.blk.{i}.{nm}", tr)
                if x is not None:
                    lp[key] = x
            layers.append(lp)
            i += 1
        return {k: jnp.stack([l[k] for l in layers])
                for k in layers[0] if layers[0].get(k) is not None}, i

    enc_names = [
        ("attn_norm", "attn_norm.weight", False),
        ("wq", "attn_q.weight", True), ("wk", "attn_k.weight", True),
        ("wv", "attn_v.weight", True), ("wo", "attn_o.weight", True),
        ("ffn_norm", "ffn_norm.weight", False),
        ("w_gate", "ffn_gate.weight", True),
        ("w_up", "ffn_up.weight", True),
        ("w_down", "ffn_down.weight", True),
    ]
    dec_names = enc_names + [
        ("cross_norm", "cross_attn_norm.weight", False),
        ("cq", "cross_attn_q.weight", True),
        ("ck", "cross_attn_k.weight", True),
        ("cv", "cross_attn_v.weight", True),
        ("co", "cross_attn_o.weight", True),
    ]
    params["enc"], n_enc = stack("enc", enc_names)
    params["dec"], n_dec = stack("dec", dec_names)
    g.close()
    cfg = dataclasses.replace(cfg, n_layers=n_dec)
    SRV_INF("t5_serve", "t5: enc=%d dec=%d d_model=%d heads=%d d_kv=%d "
            "gated=%s", n_enc, n_dec, cfg.n_embd, cfg.n_heads,
            extra["t5_d_kv"], "w_gate" in params["enc"])
    return cfg, params


def init_t5_cache(cfg: ModelConfig, n_slots: int, capacity: int,
                  enc_capacity: int, n_dec_layers: int,
                  dtype=jnp.float32) -> T5Cache:
    H = cfg.n_heads
    Dkv = cfg.extra["t5_d_kv"]
    if jnp.dtype(dtype) == jnp.int8:
        dtype = jnp.bfloat16
    z = jnp.zeros((n_dec_layers, n_slots, capacity, H, Dkv), dtype)
    ze = jnp.zeros((n_dec_layers, n_slots, enc_capacity, H, Dkv), dtype)
    return T5Cache(k=z, v=jnp.zeros_like(z), ck=ze, cv=jnp.zeros_like(ze),
                   enc_len=jnp.zeros((n_slots,), jnp.int32))


def _rms(x, w, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _rel_bucket(rel, n_buckets: int, max_dist: int, causal: bool):
    """T5 relative-position bucketing; rel = key_pos - query_pos."""
    if causal:
        n = n_buckets
        rel = -jnp.minimum(rel, 0)
        bucket = jnp.zeros_like(rel)
    else:
        n = n_buckets // 2
        bucket = jnp.where(rel > 0, n, 0)
        rel = jnp.abs(rel)
    max_exact = n // 2
    is_small = rel < max_exact
    big = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / np.log(max_dist / max_exact) * (n - max_exact)).astype(jnp.int32)
    big = jnp.minimum(big, n - 1)
    return bucket + jnp.where(is_small, rel, big)


def _ffn(h, lp, dtype):
    if "w_gate" in lp:   # t5 v1.1 gated GELU
        act = (jax.nn.gelu(
            (h @ lp["w_gate"]).astype(jnp.float32), approximate=True)
            * (h @ lp["w_up"]).astype(jnp.float32)).astype(dtype)
    else:                # classic t5 ReLU
        act = jax.nn.relu(h @ lp["w_up"])
    return act @ lp["w_down"]


def _encode(params, cfg: ModelConfig, tokens, n_valid):
    """tokens [T] -> encoder states [T, E] (pad rows masked)."""
    T = tokens.shape[0]
    H = cfg.n_heads
    Dkv = cfg.extra["t5_d_kv"]
    eps = cfg.rms_eps
    x = jnp.take(params["tok_embd"], tokens, axis=0, mode="clip")

    pos = jnp.arange(T)
    rel = pos[None, :] - pos[:, None]
    bucket = _rel_bucket(rel, cfg.extra["t5_rel_buckets"],
                         cfg.extra["t5_rel_max"], causal=False)
    bias = jnp.transpose(jnp.take(params["enc_rel_b"], bucket, axis=0),
                         (2, 0, 1))                    # [H, T, T]
    mask = (jnp.arange(T) < n_valid)[None, None, :]
    bias = jnp.where(mask, bias, -1e30)

    def block(x, lp):
        h = _rms(x, lp["attn_norm"], eps)
        q = (h @ lp["wq"]).reshape(T, H, Dkv)
        k = (h @ lp["wk"]).reshape(T, H, Dkv)
        v = (h @ lp["wv"]).reshape(T, H, Dkv)
        s = jnp.einsum("qhd,khd->hqk", q, k) + bias    # no 1/sqrt(d)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("hqk,khd->qhd", a, v).reshape(T, -1)
        x = x + o @ lp["wo"]
        h = _rms(x, lp["ffn_norm"], eps)
        return x + _ffn(h, lp, x.dtype), None

    x, _ = jax.lax.scan(block, x, params["enc"])
    return _rms(x, params["enc_norm"], eps)


def _dec_logits(params, cfg: ModelConfig, x):
    x = _rms(x, params["dec_norm"], cfg.rms_eps)
    out = params.get("output")
    if out is None:   # tied: classic t5 rescales before the lm head
        x = x * jnp.asarray(cfg.n_embd ** -0.5, x.dtype)
        out = params["tok_embd"].T
    return (x @ out).astype(jnp.float32)


def _dec_step(params, cfg: ModelConfig, tokens, positions, cache: T5Cache,
              active):
    """One decoder step over the slot batch: tokens [S], positions [S]
    (decoder positions); returns (logits [S, V], new cache)."""
    S = tokens.shape[0]
    H = cfg.n_heads
    Dkv = cfg.extra["t5_d_kv"]
    eps = cfg.rms_eps
    C = cache.capacity
    Te = cache.ck.shape[2]
    x = jnp.take(params["tok_embd"], tokens, axis=0, mode="clip")  # [S, E]

    kpos = jnp.arange(C)
    rel = kpos[None, :] - positions[:, None]           # [S, C]
    bucket = _rel_bucket(rel, cfg.extra["t5_rel_buckets"],
                         cfg.extra["t5_rel_max"], causal=True)
    bias = jnp.transpose(jnp.take(params["dec_rel_b"], bucket, axis=0),
                         (0, 2, 1))                    # [S, H, C]
    causal = (kpos[None, :] <= positions[:, None])[:, None, :]
    bias = jnp.where(causal, bias, -1e30)              # [S, H, C]
    cmask = (jnp.arange(Te)[None, :]
             < cache.enc_len[:, None])[:, None, :]     # [S, 1, Te]

    wpos = jnp.where(active, positions, C)             # sentinel drops

    def block(carry, inp):
        x, j = carry
        lp, k_c, v_c, ck_c, cv_c = inp
        h = _rms(x, lp["attn_norm"], eps)
        q = (h @ lp["wq"]).reshape(S, H, Dkv)
        kn = (h @ lp["wk"]).reshape(S, H, Dkv)
        vn = (h @ lp["wv"]).reshape(S, H, Dkv)
        si = jnp.arange(S)
        k_c = k_c.at[si, wpos].set(kn.astype(k_c.dtype), mode="drop")
        v_c = v_c.at[si, wpos].set(vn.astype(v_c.dtype), mode="drop")
        s = jnp.einsum("shd,schd->shc", q, k_c.astype(q.dtype)) + bias
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("shc,schd->shd", a, v_c.astype(q.dtype))
        x = x + o.reshape(S, -1) @ lp["wo"]
        # cross attention over the static encoder K/V (no bias)
        h = _rms(x, lp["cross_norm"], eps)
        q = (h @ lp["cq"]).reshape(S, H, Dkv)
        s = jnp.einsum("shd,sehd->she", q, ck_c.astype(q.dtype))
        s = jnp.where(cmask, s, -1e30)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("she,sehd->shd", a, cv_c.astype(q.dtype))
        x = x + o.reshape(S, -1) @ lp["co"]
        h = _rms(x, lp["ffn_norm"], eps)
        return (x + _ffn(h, lp, x.dtype), j + 1), (k_c, v_c)

    (x, _), (k_n, v_n) = jax.lax.scan(
        block, (x, 0), (params["dec"], cache.k, cache.v, cache.ck,
                        cache.cv))
    cache = cache._replace(k=k_n, v=v_n)
    return _dec_logits(params, cfg, x), cache


# -- engine-compatible entry points -------------------------------------------

def t5_prefill_impl(params, cfg: ModelConfig, tokens, cache: T5Cache,
                    slot, pos_base, n_valid, rope_cos=None, rope_sin=None,
                    mrope_pos=None, attn_len: int = 0):
    """Whole-prompt encode + cross-K/V build + decoder step 0 with the
    start token. Returns (logits [V], new cache)."""
    del pos_base, rope_cos, rope_sin, mrope_pos, attn_len
    H = cfg.n_heads
    Dkv = cfg.extra["t5_d_kv"]
    Te = cache.ck.shape[2]
    enc = _encode(params, cfg, tokens[:Te], jnp.minimum(n_valid, Te))
    T = enc.shape[0]

    # cross K/V for every decoder layer (static for the request)
    def ckv(carry, lp):
        k = (enc @ lp["ck"]).reshape(T, H, Dkv)
        v = (enc @ lp["cv"]).reshape(T, H, Dkv)
        return carry, (k, v)

    _, (cks, cvs) = jax.lax.scan(ckv, 0, params["dec"])   # [Ld, T, H, Dkv]
    pad = Te - T
    if pad > 0:
        cks = jnp.pad(cks, ((0, 0), (0, pad), (0, 0), (0, 0)))
        cvs = jnp.pad(cvs, ((0, 0), (0, pad), (0, 0), (0, 0)))
    cache = T5Cache(
        k=cache.k.at[:, slot].set(0.0),
        v=cache.v.at[:, slot].set(0.0),
        ck=cache.ck.at[:, slot].set(cks.astype(cache.ck.dtype)),
        cv=cache.cv.at[:, slot].set(cvs.astype(cache.cv.dtype)),
        enc_len=cache.enc_len.at[slot].set(jnp.minimum(n_valid, Te)))

    S = cache.k.shape[1]
    start = jnp.full((S,), cfg.extra["t5_dec_start"], jnp.int32)
    positions = jnp.zeros((S,), jnp.int32)
    active = jnp.arange(S) == slot
    logits, cache = _dec_step(params, cfg, start, positions, cache, active)
    return logits[slot], cache


t5_prefill = partial(jax.jit, static_argnames=("cfg", "attn_len"),
                     donate_argnames=("cache",))(t5_prefill_impl)


def t5_decode_verify_sample(params, cfg: ModelConfig, tokens, positions,
                            n_draft, cache: T5Cache, fwd_active,
                            samp_active, sstate, arrs, rope_cos=None,
                            rope_sin=None, mrope_delta=None):
    """T=1 decoder step + fused sampling (mirror of the engine's
    _decode_verify_sample; positions are DECODER positions)."""
    return _t5_decode_one(params, cfg, tokens, positions, cache,
                          fwd_active, samp_active, sstate, arrs)


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("cache", "sstate"))
def _t5_decode_one(params, cfg: ModelConfig, tokens, positions, cache,
                   fwd_active, samp_active, sstate, arrs):
    from ..sampling import verify_impl
    logits, cache = _dec_step(params, cfg, tokens[:, 0], positions[:, 0],
                              cache, fwd_active)
    logits = logits[:, None]
    zero = jnp.zeros_like(positions[:, 0])
    toks, n_emitted, ids, probs, tokps, sstate = verify_impl(
        logits, tokens[:, :1], zero, sstate, arrs, samp_active)
    return (toks, n_emitted, ids, probs, tokps, logits[:, 0], cache,
            sstate)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "attn_len"),
         donate_argnames=("cache", "sstate"))
def t5_decode_chain(params, cfg: ModelConfig, token0, pos0, cache,
                    sstate, arrs, active, rope_cos=None, rope_sin=None,
                    n_steps: int = 8, mrope_delta=None, attn_len: int = 0):
    """K chained decoder steps per dispatch (mirror of _decode_chain)."""
    del rope_cos, rope_sin, mrope_delta, attn_len
    from ..sampling import sample_impl

    def step(carry, j):
        tok, cache, sstate = carry
        positions = pos0 + j
        logits, cache = _dec_step(params, cfg, tok, positions, cache,
                                  active)
        tok2, ids, probs, tokp, sstate = sample_impl(
            logits, sstate, arrs, active)
        return (tok2, cache, sstate), (tok2, ids, probs, tokp)

    (_, cache, sstate), ys = jax.lax.scan(
        step, (token0, cache, sstate), jnp.arange(n_steps, dtype=jnp.int32))
    toks, ids, probs, tokps = ys
    swap = lambda a: jnp.swapaxes(a, 0, 1)  # noqa: E731
    return (swap(toks), swap(ids), swap(probs), swap(tokps), cache, sstate)
