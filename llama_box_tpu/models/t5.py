"""T5 encoder (text conditioning for FLUX/SD3), TPU-native.

Encoder-only T5 v1.1 (gated-GELU FF, RMS-norm, relative position bias on
layer 0 shared across layers, NO attention-score scaling — T5 folds
1/sqrt(d) into the weights). Parity target: the reference's
--image-t5xxl-model conditioning path (stable-diffusion.cpp t5.hpp).

Tensor naming: HF `encoder.block.N.layer.{0,1}...` state-dict names, with
or without a leading `text_encoders.t5xxl.transformer.` prefix (sd.cpp
bundles), loaded from GGUF.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF

_PREFIXES = ("text_encoders.t5xxl.transformer.", "t5xxl.transformer.", "")


@dataclasses.dataclass(frozen=True)
class T5Config:
    n_layers: int
    d_model: int
    n_heads: int
    d_kv: int
    d_ff: int
    vocab_size: int
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6


def _rms(x, w, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _rel_bucket(rel, n_buckets: int, max_dist: int):
    """T5 relative-position bucketing (bidirectional encoder form)."""
    n = n_buckets // 2
    bucket = jnp.where(rel > 0, n, 0)
    rel = jnp.abs(rel)
    max_exact = n // 2
    is_small = rel < max_exact
    big = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_dist / max_exact) * (n - max_exact)).astype(jnp.int32)
    big = jnp.minimum(big, n - 1)
    return bucket + jnp.where(is_small, rel, big)


def t5_encode(params: dict, cfg: T5Config, tokens: jnp.ndarray,
              valid_len: int | None = None) -> jnp.ndarray:
    """tokens [T] int32 -> [T, d_model] f32 encoder states."""
    T = tokens.shape[0]
    x = jnp.take(params["shared"], tokens, axis=0, mode="clip")

    pos = jnp.arange(T)
    rel = pos[None, :] - pos[:, None]                 # key - query
    bucket = _rel_bucket(rel, cfg.rel_buckets, cfg.rel_max_distance)
    bias = jnp.take(params["rel_bias"], bucket, axis=0)   # [T, T, H]
    bias = jnp.transpose(bias, (2, 0, 1))                  # [H, T, T]
    if valid_len is not None:
        mask = (jnp.arange(T) < valid_len)[None, None, :]
        bias = jnp.where(mask, bias, -1e30)

    def block(x, lp):
        h = _rms(x, lp["ln0"], cfg.eps)
        q = (h @ lp["q"]).reshape(T, cfg.n_heads, cfg.d_kv)
        k = (h @ lp["k"]).reshape(T, cfg.n_heads, cfg.d_kv)
        v = (h @ lp["v"]).reshape(T, cfg.n_heads, cfg.d_kv)
        # no 1/sqrt(d): T5 bakes the scale into the projections
        s = jnp.einsum("qhd,khd->hqk", q, k) + bias
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("hqk,khd->qhd", a, v).reshape(T, -1)
        x = x + o @ lp["o"]
        h = _rms(x, lp["ln1"], cfg.eps)
        ff = jax.nn.gelu(h @ lp["wi0"], approximate=True) * (h @ lp["wi1"])
        return x + ff @ lp["wo"], None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return _rms(x, params["final_ln"], cfg.eps).astype(jnp.float32)


def load_t5(path: str, dtype=jnp.float32) -> tuple[T5Config, dict]:
    """GGUF T5 encoder checkpoint -> (config, params)."""
    g = GGUFFile(path)

    def find(suffix):
        for p in _PREFIXES:
            if p + suffix in g.tensors:
                return g.tensor_f32(p + suffix).reshape(
                    g.tensors[p + suffix].shape)
        return None

    shared = find("shared.weight")
    if shared is None:
        raise ValueError(f"{path}: no T5 shared embedding found")
    rel = find("encoder.block.0.layer.0.SelfAttention."
               "relative_attention_bias.weight")
    n_layers = 0
    while find(f"encoder.block.{n_layers}.layer.0.SelfAttention.q"
               ".weight") is not None:
        n_layers += 1
    q0 = find("encoder.block.0.layer.0.SelfAttention.q.weight")
    wi0 = find("encoder.block.0.layer.1.DenseReluDense.wi_0.weight")
    d_model = shared.shape[1]
    inner = q0.shape[0]
    n_heads = rel.shape[1] if rel is not None else max(inner // 64, 1)
    cfg = T5Config(n_layers=n_layers, d_model=d_model, n_heads=n_heads,
                   d_kv=inner // n_heads, d_ff=wi0.shape[0],
                   vocab_size=shared.shape[0],
                   rel_buckets=rel.shape[0] if rel is not None else 32)

    def wT(suffix):
        return jnp.asarray(find(suffix).T, dtype)   # [out,in] -> [in,out]

    blocks = {
        "ln0": [], "q": [], "k": [], "v": [], "o": [],
        "ln1": [], "wi0": [], "wi1": [], "wo": [],
    }
    for i in range(n_layers):
        b = f"encoder.block.{i}."
        blocks["ln0"].append(jnp.asarray(
            find(b + "layer.0.layer_norm.weight"), dtype))
        for nm in ("q", "k", "v", "o"):
            blocks[nm].append(wT(b + f"layer.0.SelfAttention.{nm}.weight"))
        blocks["ln1"].append(jnp.asarray(
            find(b + "layer.1.layer_norm.weight"), dtype))
        blocks["wi0"].append(wT(b + "layer.1.DenseReluDense.wi_0.weight"))
        blocks["wi1"].append(wT(b + "layer.1.DenseReluDense.wi_1.weight"))
        blocks["wo"].append(wT(b + "layer.1.DenseReluDense.wo.weight"))
    params = {
        "shared": jnp.asarray(shared, dtype),
        "rel_bias": jnp.asarray(rel, dtype) if rel is not None
        else jnp.zeros((cfg.rel_buckets, n_heads), dtype),
        "final_ln": jnp.asarray(find("encoder.final_layer_norm.weight"),
                                dtype),
        "blocks": {k: jnp.stack(v) for k, v in blocks.items()},
    }
    g.close()
    SRV_INF("t5", "loaded %s: %d layers, d_model=%d, heads=%d", path,
            n_layers, d_model, n_heads)
    return cfg, params
