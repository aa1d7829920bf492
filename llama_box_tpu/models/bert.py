"""BERT-family encoder (embeddings + rerank scoring).

Covers the reference's embedding/rerank model support incl. the model.patch
LLM_ARCH_NEW ("new") jina-reranker tensor map (SURVEY.md §2.4): post-LN
transformer with learned absolute positions, token-type embeddings, GELU
FFN, and an optional classification head that turns the [CLS] hidden state
into a relevance score (pooling == "rank").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF
from .config import ModelConfig

BERT_ARCHS = {"bert", "nomic-bert", "jina-bert-v2", "new"}


def load_bert(path: str, dtype=jnp.float32):
    """Load a BERT-family GGUF into (ModelConfig, params)."""
    g = GGUFFile(path)
    cfg = ModelConfig.from_gguf(g)
    md = g.metadata
    pooling = {0: "none", 1: "mean", 2: "cls", 3: "last", 4: "rank"}.get(
        int(md.get(f"{cfg.arch}.pooling_type", 1)), "mean")
    import dataclasses
    cfg = dataclasses.replace(cfg, causal=False, pooling=pooling)

    def t(name, transpose=False):
        if name not in g.tensors:
            return None
        x = g.tensor_f32(name)
        if transpose and x.ndim == 2:
            x = x.T
        return jnp.asarray(x, dtype)

    params = {
        "tok_embd": t("token_embd.weight"),
        "type_embd": t("token_types.weight"),
        "pos_embd": t("position_embd.weight"),
        "embd_norm": t("token_embd_norm.weight"),
        "embd_norm_b": t("token_embd_norm.bias"),
        "cls": t("cls.weight", True),
        "cls_b": t("cls.bias"),
        "cls_out": t("cls.output.weight", True),
        "cls_out_b": t("cls.output.bias"),
    }
    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layers.append({
            "wq": t(p + "attn_q.weight", True), "bq": t(p + "attn_q.bias"),
            "wk": t(p + "attn_k.weight", True), "bk": t(p + "attn_k.bias"),
            "wv": t(p + "attn_v.weight", True), "bv": t(p + "attn_v.bias"),
            "wo": t(p + "attn_output.weight", True),
            "bo": t(p + "attn_output.bias"),
            "attn_norm": t(p + "attn_output_norm.weight"),
            "attn_norm_b": t(p + "attn_output_norm.bias"),
            "w_up": t(p + "ffn_up.weight", True), "b_up": t(p + "ffn_up.bias"),
            "w_down": t(p + "ffn_down.weight", True),
            "b_down": t(p + "ffn_down.bias"),
            "ffn_norm": t(p + "layer_output_norm.weight"),
            "ffn_norm_b": t(p + "layer_output_norm.bias"),
        })
    params["layers"] = {
        k: jnp.stack([l[k] for l in layers])
        for k in layers[0] if layers[0][k] is not None
    }
    g.close()
    SRV_INF("load_bert", "arch=%s layers=%d embd=%d pooling=%s",
            cfg.arch, cfg.n_layers, cfg.n_embd, cfg.pooling)
    return cfg, params


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w
    if b is not None:
        y = y + b
    return y


def bert_forward(params, cfg: ModelConfig, tokens, seq_lens,
                 pooling: str = "mean"):
    """tokens [B, T], seq_lens [B] -> pooled [B, E] (or [B] rank scores)."""
    B, T = tokens.shape
    H = cfg.n_heads
    E = cfg.n_embd
    D = E // H
    eps = cfg.rms_eps

    x = jnp.take(params["tok_embd"], tokens, axis=0, mode="clip")
    if params.get("type_embd") is not None:
        x = x + params["type_embd"][0]
    if params.get("pos_embd") is not None:
        x = x + params["pos_embd"][:T][None, :, :]
    x = _ln(x, params.get("embd_norm"), params.get("embd_norm_b"), eps)

    valid = jnp.arange(T)[None, :] < seq_lens[:, None]
    mask = valid[:, None, None, :]  # [B, 1, 1, T]

    def layer(x, lp):
        q = (x @ lp["wq"] + lp.get("bq", 0.0)).reshape(B, T, H, D)
        k = (x @ lp["wk"] + lp.get("bk", 0.0)).reshape(B, T, H, D)
        v = (x @ lp["wv"] + lp.get("bv", 0.0)).reshape(B, T, H, D)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
        scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, E)
        attn = attn @ lp["wo"] + lp.get("bo", 0.0)
        x = _ln(x + attn, lp.get("attn_norm"), lp.get("attn_norm_b"), eps)
        h = jax.nn.gelu(x @ lp["w_up"] + lp.get("b_up", 0.0),
                        approximate=False)
        h = h @ lp["w_down"] + lp.get("b_down", 0.0)
        return _ln(x + h, lp.get("ffn_norm"), lp.get("ffn_norm_b"), eps), None

    x, _ = jax.lax.scan(layer, x, params["layers"])

    if pooling == "rank":
        # classification head on [CLS] (jina-reranker semantics)
        h = x[:, 0]
        if params.get("cls") is not None:
            h = jnp.tanh(h @ params["cls"] + params.get("cls_b", 0.0))
        if params.get("cls_out") is not None:
            h = h @ params["cls_out"] + params.get("cls_out_b", 0.0)
        return h[:, 0] if h.ndim == 2 and h.shape[-1] >= 1 else h
    if pooling == "cls":
        return x[:, 0]
    if pooling == "last":
        idx = jnp.maximum(seq_lens - 1, 0)
        return x[jnp.arange(B), idx]
    w = valid.astype(x.dtype)
    return (x * w[:, :, None]).sum(1) / jnp.maximum(
        w.sum(1)[:, None], 1.0)
