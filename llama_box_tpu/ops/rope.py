"""Rotary position embeddings with linear/YaRN scaling.

Supports the two GGML rotation layouts:
- 'norm'  : adjacent-pair rotation (dims 2i, 2i+1) — llama-family GGUFs
- 'neox'  : half-split rotation (dims i, i+D/2) — qwen/falcon/gemma families

and the RoPE scaling modes the reference exposes via --rope-scaling
(engine_param.hpp:377-385): none / linear / yarn.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RopeParams:
    head_dim: int
    n_rot: int = 0  # rotated dims; 0 => head_dim
    freq_base: float = 10000.0
    freq_scale: float = 1.0  # linear scaling: positions * freq_scale
    scaling_type: str = "none"  # none | linear | yarn | longrope
    yarn_orig_ctx: int = 0
    yarn_ext_factor: float = -1.0
    yarn_attn_factor: float = 1.0
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    mode: str = "norm"  # norm | neox
    # longrope (phi3 su-scaling): per-half-dim frequency divisors
    freq_factors: tuple = ()

    @property
    def rot_dim(self) -> int:
        return self.n_rot or self.head_dim


def _yarn_find_correction_dim(n_rot: int, base: float, n_orig: int, rot: float) -> float:
    return n_rot * math.log(n_orig / (rot * 2 * math.pi)) / (2 * math.log(base))


def _yarn_ramp(lo: float, hi: float, dims: np.ndarray) -> np.ndarray:
    y = (dims - lo) / max(hi - lo, 1e-3)
    return 1.0 - np.clip(y, 0.0, 1.0)


def compute_rope_cache(params: RopeParams, max_pos: int):
    """Returns (cos, sin) of shape [max_pos, rot_dim//2] (f32) and mscale."""
    half = params.rot_dim // 2
    dims = np.arange(half, dtype=np.float64)
    inv_freq = params.freq_base ** (-2.0 * dims / params.rot_dim)

    mscale = 1.0
    freq_scale = params.freq_scale
    if params.scaling_type == "longrope" and params.freq_factors:
        # phi3 LongRoPE: per-dim learned frequency divisors + a magnitude
        # factor carried in yarn_attn_factor (the caller computes
        # sqrt(1 + ln(scale)/ln(orig)) like the reference)
        inv_freq = inv_freq / np.asarray(params.freq_factors,
                                         np.float64)[:half]
        mscale = params.yarn_attn_factor
    elif params.scaling_type == "yarn" and params.yarn_orig_ctx > 0 and freq_scale != 1.0:
        # YaRN: interpolate between scaled (low-freq) and original (high-freq)
        lo = _yarn_find_correction_dim(params.rot_dim, params.freq_base,
                                       params.yarn_orig_ctx, params.yarn_beta_fast)
        hi = _yarn_find_correction_dim(params.rot_dim, params.freq_base,
                                       params.yarn_orig_ctx, params.yarn_beta_slow)
        lo, hi = max(0.0, math.floor(lo)), min(half - 1.0, math.ceil(hi))
        ramp = _yarn_ramp(lo, hi, dims)  # 1 for high-freq dims, 0 for low
        ext = params.yarn_ext_factor if params.yarn_ext_factor >= 0 else 1.0
        ramp = ramp * ext
        inv_freq = inv_freq * (ramp + freq_scale * (1.0 - ramp))
        mscale = params.yarn_attn_factor * (1.0 + 0.1 * math.log(1.0 / freq_scale))
    else:
        inv_freq = inv_freq * freq_scale

    t = np.arange(max_pos, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    cos = np.cos(freqs).astype(np.float32) * mscale
    sin = np.sin(freqs).astype(np.float32) * mscale
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_mrope(x: jnp.ndarray, positions3, cos: jnp.ndarray,
                sin: jnp.ndarray, sections: tuple) -> jnp.ndarray:
    """Multi-section RoPE (qwen2-vl M-RoPE; reference mrope.patch + §2.1
    #11): rotary half-dims are partitioned into sections (temporal, height,
    width[, extra]) and each section rotates by its own position stream.

    x: [B, T, H, D]; positions3: [S, B, T] int32 (S == len(sections) or
    fewer — missing streams reuse stream 0); neox (half-split) layout,
    which is what qwen2-vl uses."""
    half = cos.shape[-1]
    # per-half-dim section index
    sec_idx = []
    for s, n in enumerate(sections):
        sec_idx.extend([s] * n)
    sec_idx = sec_idx[:half] + [0] * (half - len(sec_idx))
    sec = jnp.asarray(sec_idx, jnp.int32)            # [half]

    S = positions3.shape[0]
    # gather cos/sin per stream: [S, B, T, half] -> select per dim
    c_all = jnp.take(cos, positions3, axis=0, mode="clip")   # [S,B,T,half]
    s_all = jnp.take(sin, positions3, axis=0, mode="clip")
    sel = jnp.clip(sec, 0, S - 1)                    # [half]
    c_all2 = jnp.moveaxis(c_all, 0, -1)              # [B, T, half, S]
    s_all2 = jnp.moveaxis(s_all, 0, -1)
    c = jnp.take_along_axis(c_all2, sel[None, None, :, None], axis=-1)[..., 0]
    s = jnp.take_along_axis(s_all2, sel[None, None, :, None], axis=-1)[..., 0]
    c = c[:, :, None, :]                              # [B, T, 1, half]
    s = s[:, :, None, :]

    rot_dim = half * 2
    d = x.shape[-1]
    xr = x[..., :rot_dim].astype(jnp.float32)
    x0 = xr[..., :half]
    x1 = xr[..., half:]
    o0 = x0 * c - x1 * s
    o1 = x0 * s + x1 * c
    rotated = jnp.concatenate([o0, o1], axis=-1).astype(x.dtype)
    if rot_dim < d:
        rotated = jnp.concatenate([rotated, x[..., rot_dim:]], axis=-1)
    return rotated


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray, mode: str = "norm") -> jnp.ndarray:
    """x: [..., T, H, D]; positions: broadcastable to [..., T] int32,
    or None when cos/sin are already gathered per position ([..., T, half]
    — the layer scan hoists the gather out of the 22-layer loop).
    mode "none": position-independent attention (gpt2 learned positional
    embeddings, bloom/mpt ALiBi) — identity."""
    if mode == "none":
        return x
    rot_dim = cos.shape[-1] * 2
    d = x.shape[-1]
    if positions is None:
        c = cos[..., None, :]
        s = sin[..., None, :]
    else:
        c = jnp.take(cos, positions, axis=0, mode="clip")[..., None, :]
        s = jnp.take(sin, positions, axis=0, mode="clip")[..., None, :]
    xr = x[..., :rot_dim].astype(jnp.float32)
    if mode == "norm":
        x0 = xr[..., 0::2]
        x1 = xr[..., 1::2]
        o0 = x0 * c - x1 * s
        o1 = x0 * s + x1 * c
        rotated = jnp.stack([o0, o1], axis=-1).reshape(xr.shape)
    elif mode == "neox":
        half = rot_dim // 2
        x0 = xr[..., :half]
        x1 = xr[..., half:]
        o0 = x0 * c - x1 * s
        o1 = x0 * s + x1 * c
        rotated = jnp.concatenate([o0, o1], axis=-1)
    else:
        raise ValueError(f"unknown rope mode {mode!r}")
    rotated = rotated.astype(x.dtype)
    if rot_dim < d:
        rotated = jnp.concatenate([rotated, x[..., rot_dim:]], axis=-1)
    return rotated
