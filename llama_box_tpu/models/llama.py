"""Functional Llama-family decoder (TPU-first: static shapes, lax.scan over
stacked layers, bf16 compute with f32 accumulation).

One forward program serves both prefill and batched decode: the serving
engine (SURVEY.md §2.1 #7) calls it with bucketed [B, T] token blocks and a
per-slot contiguous KV cache, mirroring the reference's single fused
llama_decode per reconcile pass (httpserver.hpp:4192).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.attention import NEG_INF
from ..ops.norm import rms_norm
from ..ops.rope import RopeParams, apply_rope, compute_rope_cache
from .config import ModelConfig


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, C, Hkv, D]
    v: jnp.ndarray  # [L, B, C, Hkv, D]

    @property
    def capacity(self) -> int:
        return self.k.shape[2]


def init_kv_cache(cfg: ModelConfig, n_slots: int, capacity: int,
                  dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.n_layers, n_slots, capacity, cfg.n_kv_heads, cfg.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def make_rope(cfg: ModelConfig, max_pos: int):
    rp = RopeParams(
        head_dim=cfg.head_dim,
        n_rot=cfg.rope_dim,
        freq_base=cfg.rope_freq_base,
        freq_scale=cfg.rope_freq_scale,
        scaling_type=cfg.rope_scaling_type,
        yarn_orig_ctx=cfg.rope_orig_ctx or cfg.n_ctx_train,
        yarn_ext_factor=cfg.yarn_ext_factor,
        yarn_attn_factor=cfg.yarn_attn_factor,
        yarn_beta_fast=cfg.yarn_beta_fast,
        yarn_beta_slow=cfg.yarn_beta_slow,
        mode=cfg.rope_mode,
    )
    return compute_rope_cache(rp, max_pos)


def _attn_layer(x, lp, positions, k_cache, v_cache, mask, cfg: ModelConfig,
                cos, sin):
    """x: [B,T,E]; k_cache/v_cache: [B,C,Hkv,D]; mask: [B,T,C] True=attend."""
    B, T, E = x.shape
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
    q = (h @ lp["wq"]).reshape(B, T, H, D)
    k = (h @ lp["wk"]).reshape(B, T, Hkv, D)
    v = (h @ lp["wv"]).reshape(B, T, Hkv, D)

    q = apply_rope(q, positions, cos, sin, cfg.rope_mode)
    k = apply_rope(k, positions, cos, sin, cfg.rope_mode)

    # scatter current K/V into the cache at the absolute positions
    bidx = jnp.arange(B)[:, None].repeat(T, 1)
    k_cache = k_cache.at[bidx, positions].set(k.astype(k_cache.dtype))
    v_cache = v_cache.at[bidx, positions].set(v.astype(v_cache.dtype))

    G = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, G, D)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scores = jnp.einsum("bthgd,bchd->bhgtc", qf, kf) * (D ** -0.5)
    if cfg.attn_softcap > 0.0:
        scores = cfg.attn_softcap * jnp.tanh(scores / cfg.attn_softcap)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    scores = scores - scores.max(axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / (probs.sum(axis=-1, keepdims=True) + 1e-30)
    attn = jnp.einsum("bhgtc,bchd->bthgd", probs, vf).reshape(B, T, H * D)

    x = x + (attn.astype(x.dtype) @ lp["wo"])

    h = rms_norm(x, lp["ffn_norm"], cfg.rms_eps)
    gate = h @ lp["w_gate"]
    up = h @ lp["w_up"]
    act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(x.dtype)
    x = x + act @ lp["w_down"]
    return x, k_cache, v_cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv",))
def forward(params, cfg: ModelConfig, tokens, positions, kv: KVCache,
            seq_lens, rope_cos, rope_sin):
    """One forward step (prefill chunk or batched decode).

    tokens:    [B, T] int32
    positions: [B, T] int32 absolute positions (also the KV write indices)
    kv:        KVCache [L, B, C, ...] (donated; updated in place)
    seq_lens:  [B] int32 — valid tokens in this step (<=T); padding beyond
    returns (logits [B, T, V] f32, new KVCache)
    """
    B, T = tokens.shape
    C = kv.capacity

    x = jnp.take(params["tok_embd"], tokens, axis=0)

    # attend to cache index c iff c <= q position (writes at absolute pos) and
    # the query slot itself is a real token
    qvalid = (jnp.arange(T)[None, :] < seq_lens[:, None])  # [B,T]
    kpos = jnp.arange(C)[None, None, :]
    mask = (kpos <= positions[:, :, None]) & qvalid[:, :, None]  # [B,T,C]
    if cfg.swa_window > 0:
        mask = mask & (kpos > positions[:, :, None] - cfg.swa_window)

    def body(x, layer):
        lp, k_c, v_c = layer
        x, k_c, v_c = _attn_layer(x, lp, positions, k_c, v_c, mask, cfg,
                                  rope_cos, rope_sin)
        return x, (k_c, v_c)

    x, (k_new, v_new) = jax.lax.scan(body, x, (params["layers"], kv.k, kv.v))

    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    out_w = params.get("output")
    if out_w is None:  # tied word embeddings
        logits = x @ params["tok_embd"].T.astype(x.dtype)
    else:
        logits = x @ out_w
    if cfg.logit_softcap > 0.0:
        logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
    return logits.astype(jnp.float32), KVCache(k=k_new, v=v_new)


def forward_embeddings(params, cfg: ModelConfig, tokens, seq_lens,
                       rope_cos, rope_sin, pooling: str = "mean"):
    """Non-causal embedding forward (SURVEY.md §3.3): no KV cache, bidirectional
    attention over each sequence, pooled output."""
    B, T = tokens.shape
    x = jnp.take(params["tok_embd"], tokens, axis=0)
    positions = jnp.arange(T)[None, :].repeat(B, 0)
    valid = positions < seq_lens[:, None]  # [B,T]
    mask = valid[:, :, None] & valid[:, None, :]  # [B,T,T]
    if cfg.causal:
        mask = mask & (jnp.arange(T)[None, :, None] >= jnp.arange(T)[None, None, :])

    kv_k = jnp.zeros((cfg.n_layers, B, T, cfg.n_kv_heads, cfg.head_dim), x.dtype)
    kv_v = jnp.zeros_like(kv_k)

    def body(x, layer):
        lp, k_c, v_c = layer
        x, _, _ = _attn_layer(x, lp, positions, k_c, v_c, mask, cfg,
                              rope_cos, rope_sin)
        return x, None

    x, _ = jax.lax.scan(body, x, (params["layers"], kv_k, kv_v))
    x = rms_norm(x, params["output_norm"], cfg.rms_eps).astype(jnp.float32)

    if pooling == "mean":
        w = valid.astype(jnp.float32)
        emb = (x * w[:, :, None]).sum(1) / jnp.maximum(w.sum(1)[:, None], 1.0)
    elif pooling == "cls":
        emb = x[:, 0]
    elif pooling == "last":
        idx = jnp.maximum(seq_lens - 1, 0)
        emb = x[jnp.arange(B), idx]
    else:
        return x  # per-token
    return emb
