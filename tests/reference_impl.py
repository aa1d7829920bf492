"""Independent numpy Llama forward used as golden reference for the JAX model."""

from __future__ import annotations

import numpy as np


def rms_norm(x, w, eps=1e-5):
    var = (x.astype(np.float64) ** 2).mean(-1, keepdims=True)
    return (x / np.sqrt(var + eps) * w).astype(np.float32)


def rope_norm(x, positions, rot_dim, base=10000.0):
    """Adjacent-pair rotation. x: [T, H, D]."""
    T, H, D = x.shape
    half = rot_dim // 2
    inv = base ** (-2.0 * np.arange(half) / rot_dim)
    ang = positions[:, None] * inv[None, :]  # [T, half]
    c, s = np.cos(ang), np.sin(ang)
    out = x.copy().astype(np.float32)
    x0 = x[..., 0:rot_dim:2].astype(np.float32)
    x1 = x[..., 1:rot_dim:2].astype(np.float32)
    out[..., 0:rot_dim:2] = x0 * c[:, None, :] - x1 * s[:, None, :]
    out[..., 1:rot_dim:2] = x0 * s[:, None, :] + x1 * c[:, None, :]
    return out


def llama_forward_np(weights: dict, cfg, tokens: np.ndarray) -> np.ndarray:
    """weights: raw GGUF tensors as (out,in) numpy. tokens: [T]. -> logits [T, V]."""
    T = len(tokens)
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    pos = np.arange(T, dtype=np.float64)
    x = weights["token_embd.weight"][tokens].astype(np.float32)

    for i in range(cfg.n_layers):
        p = lambda n: weights[f"blk.{i}.{n}.weight"]
        h = rms_norm(x, p("attn_norm"), cfg.rms_eps)
        q = (h @ p("attn_q").T).reshape(T, H, D)
        k = (h @ p("attn_k").T).reshape(T, Hkv, D)
        v = (h @ p("attn_v").T).reshape(T, Hkv, D)
        q = rope_norm(q, pos, cfg.rope_dim, cfg.rope_freq_base)
        k = rope_norm(k, pos, cfg.rope_dim, cfg.rope_freq_base)
        G = H // Hkv
        out = np.zeros((T, H, D), dtype=np.float32)
        for hh in range(H):
            kk = k[:, hh // G, :]
            vv = v[:, hh // G, :]
            scores = (q[:, hh, :] @ kk.T) * (D ** -0.5)
            mask = np.tril(np.ones((T, T), dtype=bool))
            scores = np.where(mask, scores, -1e30)
            scores -= scores.max(-1, keepdims=True)
            probs = np.exp(scores)
            probs /= probs.sum(-1, keepdims=True)
            out[:, hh, :] = probs @ vv
        x = x + out.reshape(T, H * D) @ p("attn_output").T
        h = rms_norm(x, p("ffn_norm"), cfg.rms_eps)
        gate = h @ p("ffn_gate").T
        up = h @ p("ffn_up").T
        silu = gate / (1.0 + np.exp(-gate))
        x = x + (silu * up) @ p("ffn_down").T

    x = rms_norm(x, weights["output_norm.weight"], cfg.rms_eps)
    out_w = weights.get("output.weight", weights["token_embd.weight"])
    return x @ out_w.T
