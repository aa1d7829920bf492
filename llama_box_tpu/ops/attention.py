"""Attention — XLA reference implementation (GQA, causal, batched decode).

This is the correctness baseline; the Pallas flash/paged kernels in
flash_prefill.py is validated against it. Kept in float32 accumulation
with bfloat16 inputs (MXU-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30


def attention_ref(
    q: jnp.ndarray,         # [B, Tq, H, D]
    k: jnp.ndarray,         # [B, Tk, Hkv, D]
    v: jnp.ndarray,         # [B, Tk, Hkv, D]
    mask: jnp.ndarray | None = None,  # broadcastable to [B, H, Tq, Tk]; True=attend
    scale: float | None = None,
    logit_softcap: float = 0.0,
) -> jnp.ndarray:
    B, Tq, H, D = q.shape
    Hkv = k.shape[2]
    assert H % Hkv == 0
    G = H // Hkv
    if scale is None:
        scale = D ** -0.5

    qf = q.astype(jnp.float32).reshape(B, Tq, Hkv, G, D)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # scores: [B, Hkv, G, Tq, Tk]
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf) * scale
    if logit_softcap > 0.0:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    if mask is not None:
        m = mask
        if m.ndim == 4:  # [B, H, Tq, Tk] or [B, 1, Tq, Tk]
            if m.shape[1] == H:
                m = m.reshape(B, Hkv, G, Tq, -1)
            else:
                m = m[:, :, None, :, :]
        scores = jnp.where(m, scores, NEG_INF)
    probs = jnp.exp(scores - scores.max(axis=-1, keepdims=True))
    probs = probs / (probs.sum(axis=-1, keepdims=True) + 1e-30)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, vf)
    return out.reshape(B, Tq, H, D).astype(q.dtype)


def causal_mask(Tq: int, Tk: int, q_start: int | jnp.ndarray = 0) -> jnp.ndarray:
    """[Tq, Tk] boolean mask: query at absolute pos q_start+i attends k<=pos."""
    qpos = jnp.arange(Tq)[:, None] + q_start
    kpos = jnp.arange(Tk)[None, :]
    return kpos <= qpos
