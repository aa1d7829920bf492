"""Functional Llama-family decoder (TPU-first: static shapes, lax.scan over
stacked layers, bf16 compute with f32 accumulation).

Three compiled programs serve the engine (SURVEY.md §2.1 #7), mirroring the
reference's single fused llama_decode per reconcile pass (httpserver.hpp:4192):
- forward:  [B, T] batched step over all slots (decode T=1, or verify T=k+1)
- prefill:  [1, T] bucketed prompt chunk into ONE slot's KV slice (no wasted
            batch FLOPs during prefill)
- shift_kv: context-shift one slot (drop n_discard after n_keep, compact, and
            re-rotate moved keys by -n_discard) — llama-box's KV squash
            semantics (httpserver.hpp:3453-3537) as a device gather.

Inactive rows / padding use position C (the slot capacity) as a sentinel:
XLA scatter drops out-of-bounds KV writes and all sentinel-indexed reads
use mode="clip" (jnp.take's DEFAULT fills out-of-range with NaN — never
rely on it), so no masking state is needed beyond the attention mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.attention import NEG_INF
from ..ops.flash_decode import flash_decode
from ..ops.flash_prefill import flash_prefill_batched
from ..ops.norm import rms_norm
from ..ops.qmatmul import mm
from ..ops.rope import (RopeParams, apply_mrope, apply_rope,
                        compute_rope_cache)
from .config import ModelConfig


class KVCache(NamedTuple):
    """[L, B, C, Hkv, D]; int8 quantized caches carry per-(token, head)
    scales (the reference's -ctk/-ctv q8_0 mode done the TPU way: symmetric
    int8 with bf16 scales, halving KV bandwidth)."""
    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: jnp.ndarray | None = None  # [L, B, C, Hkv] bf16
    v_scale: jnp.ndarray | None = None

    @property
    def capacity(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_kv_cache(cfg: ModelConfig, n_slots: int, capacity: int,
                  dtype=jnp.bfloat16) -> KVCache:
    # MLA (deepseek2) caches K at qk dims and V at value_length dims
    hkv = cfg.n_kv_heads if not cfg.kv_lora_rank else cfg.n_heads
    dv = cfg.v_head_dim or cfg.head_dim
    kshape = (cfg.n_layers, n_slots, capacity, hkv, cfg.head_dim)
    vshape = (cfg.n_layers, n_slots, capacity, hkv, dv)
    if jnp.dtype(dtype) == jnp.int8:
        return KVCache(
            k=jnp.zeros(kshape, jnp.int8), v=jnp.zeros(vshape, jnp.int8),
            k_scale=jnp.zeros(kshape[:-1], jnp.bfloat16),
            v_scale=jnp.zeros(vshape[:-1], jnp.bfloat16))
    return KVCache(k=jnp.zeros(kshape, dtype), v=jnp.zeros(vshape, dtype))




def _kv_quantize(x):
    """[B, T, H, D] f32 -> (int8 codes, [B, T, H] scales)."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def _rope_params(cfg: ModelConfig, max_pos: int = 0) -> RopeParams:
    attn_factor = cfg.yarn_attn_factor
    factors = ()
    scaling_type = cfg.rope_scaling_type
    if cfg.extra.get("rope_factors_short") \
            or cfg.extra.get("rope_factors_long"):
        # real GGUFs mark longrope by shipping the factor tensors (the
        # reference detects them the same way, no scaling-type key)
        scaling_type = "longrope"
    if scaling_type == "longrope":
        # phi3 LongRoPE: learned per-dim divisors (long when the runtime
        # context exceeds the original training window, like the
        # reference's build_rope_factors) + magnitude factor
        # sqrt(1 + ln(scale)/ln(orig)) (llama.cpp load-time computation)
        import math
        orig = cfg.rope_orig_ctx or cfg.n_ctx_train
        use_long = max_pos > orig
        factors = tuple(cfg.extra.get(
            "rope_factors_long" if use_long else "rope_factors_short", ()))
        scale = cfg.n_ctx_train / max(orig, 1)
        if attn_factor == 1.0 and scale > 1.0:
            attn_factor = math.sqrt(1.0 + math.log(scale) / math.log(orig))
    return RopeParams(
        head_dim=cfg.head_dim,
        n_rot=cfg.rope_dim,
        freq_base=cfg.rope_freq_base,
        freq_scale=cfg.rope_freq_scale,
        scaling_type=scaling_type,
        yarn_orig_ctx=cfg.rope_orig_ctx or cfg.n_ctx_train,
        yarn_ext_factor=cfg.yarn_ext_factor,
        yarn_attn_factor=attn_factor,
        yarn_beta_fast=cfg.yarn_beta_fast,
        yarn_beta_slow=cfg.yarn_beta_slow,
        mode=cfg.rope_mode,
        freq_factors=factors,
    )


def make_rope(cfg: ModelConfig, max_pos: int):
    """(cos, sin) caches; for alternating-SWA archs with a distinct local
    rope base (gemma3) the caches are stacked [2, P, half]: index 0 =
    global layers, 1 = local layers."""
    cos, sin = compute_rope_cache(_rope_params(cfg, max_pos), max_pos)
    if cfg.nope_layer_step > 0:
        # llama4: global (nope) layers use the IDENTITY rotation — stack
        # [identity, rope] so the per-layer is_local select picks it
        return (jnp.stack([jnp.ones_like(cos), cos]),
                jnp.stack([jnp.zeros_like(sin), sin]))
    if cfg.swa_pattern > 0 and cfg.rope_freq_base_swa > 0:
        rp = _rope_params(cfg, max_pos)
        import dataclasses as _dc
        cos_l, sin_l = compute_rope_cache(
            _dc.replace(rp, freq_base=cfg.rope_freq_base_swa), max_pos)
        return jnp.stack([cos, cos_l]), jnp.stack([sin, sin_l])
    return cos, sin


def _layer_is_local(cfg: ModelConfig) -> jnp.ndarray:
    """[L] int32: 1 where the layer uses the sliding window (gemma2/3
    alternating pattern; plain-SWA archs are local everywhere). For llama4
    "local" = rope+chunked-attention layers; every nope_layer_step-th
    layer is global (no rope, full context, temperature-tuned)."""
    import numpy as _np
    L = cfg.n_layers
    if cfg.nope_layer_step > 0:
        idx = _np.arange(L)
        return jnp.asarray(
            ((idx + 1) % cfg.nope_layer_step != 0).astype(_np.int32))
    if cfg.swa_window <= 0:
        return jnp.zeros((L,), jnp.int32)
    if cfg.swa_pattern <= 0:
        return jnp.ones((L,), jnp.int32)
    idx = _np.arange(L)
    return jnp.asarray(((idx + 1) % cfg.swa_pattern != 0).astype(_np.int32))


def make_delta_rope(cfg: ModelConfig, max_pos: int):
    """Pure-rotation cache for KV shifting: same interpolated frequencies but
    WITHOUT the YaRN mscale amplitude (a shift by -d must be a pure rotation;
    the stored keys already carry mscale once). Stacked [2, P, half] like
    make_rope when layers use different rotations (gemma3 dual bases,
    llama4 nope layers) — pass _layer_is_local(cfg) as shift_kv's
    layer_select to pick per layer."""
    def pure(rp):
        cos, sin = compute_rope_cache(
            RopeParams(**{**rp.__dict__, "yarn_attn_factor": 1.0}), max_pos)
        if rp.scaling_type == "yarn" and rp.freq_scale != 1.0:
            # compute_rope_cache folds mscale into cos/sin; with
            # attn_factor=1 the residual is 1 + 0.1*log(1/freq_scale)
            import math
            mscale = 1.0 + 0.1 * math.log(1.0 / rp.freq_scale)
            cos = cos / mscale
            sin = sin / mscale
        return cos, sin

    rp = _rope_params(cfg, max_pos)
    cos, sin = pure(rp)
    if cfg.nope_layer_step > 0:
        # llama4: nope layers (layer_select 0) must not rotate on shift
        return (jnp.stack([jnp.ones_like(cos), cos]),
                jnp.stack([jnp.zeros_like(sin), sin]))
    if cfg.swa_pattern > 0 and cfg.rope_freq_base_swa > 0:
        import dataclasses as _dc
        cos_l, sin_l = pure(_dc.replace(rp,
                                        freq_base=cfg.rope_freq_base_swa))
        return jnp.stack([cos, cos_l]), jnp.stack([sin, sin_l])
    return cos, sin


def _lora_delta(h, lp, key, lora_scales):
    """Per-slot scaled low-rank delta (dynamic LoRA): h [B,T,E],
    lora_scales [B, n_ad] -> [B, T, out] or 0.0."""
    A = lp.get(f"lora_A_{key}")
    if A is None or lora_scales is None:
        return 0.0
    Bm = lp[f"lora_B_{key}"]
    hf = h.astype(jnp.float32)
    t = jnp.einsum("bte,are->btar", hf, A)
    d = jnp.einsum("btar,aor->btao", t, Bm)
    return (d * lora_scales[:, None, :, None]).sum(axis=2).astype(h.dtype)


def _attn_layer(x, lp, positions, k_cache, v_cache, mask, cfg: ModelConfig,
                cos, sin, k_scale=None, v_scale=None,
                lora_scales=None, is_local=jnp.int32(0), mrope_pos=None,
                deferred_kv=False, flash_meta=None, chain=None,
                rope_pre=False, extra_residual=None, layer_idx=None):
    """x: [B,T,E]; k_cache/v_cache: [B,C,Hkv,D]; mask: [B,T,C] True=attend.
    k_scale/v_scale: [B,C,Hkv] when the cache is int8-quantized.
    flash_meta: [B,4] (pos0, n_valid, bidir_st, bidir_en) when the chunk
    is contiguous (prefill) — enables the batched flash kernel.
    layer_idx: chained-decode flash path — k/v_cache (and scales) are the
    FULL layer-stacked arrays and this is the layer index; the kernel
    slices the layer via its index maps (a lax.scan slice fed to a
    pallas operand would be materialized as a real copy)."""
    B, T, E = x.shape
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    h = _pre_norm(x, lp, "attn_norm", cfg)
    moa_route = None
    if "wkv_a" in lp:
        # deepseek2 MLA: low-rank q/kv projections; rope dims stored FIRST
        # within each head so the plain rope/shift machinery applies
        q, k, v = _mla_qkv(h, lp, cfg)
        Hkv = H  # MLA expands to per-head K/V in this (non-compressed) cache
        D = cfg.head_dim
    elif "wq_exps" in lp:
        # jetmoe mixture-of-attention (MoA): query and output projections
        # are top-k routed EXPERTS over one shared kv projection. Dense
        # emulation: every expert's queries attend (per-head softmax is
        # independent, so unselected experts' heads are exact too) and
        # the routing weights select at the output mix in _layer_tail.
        # Head layout: H = n_experts * Hkv, ordered [Hkv, X] so expert
        # x's query head for kv head m rides GQA group slot x.
        Xe = lp["wq_exps"].shape[0]
        assert H == Xe * Hkv, "jetmoe: head_count must be X * head_count_kv"
        rl = (h @ lp["attn_gate_inp"].astype(h.dtype)).astype(jnp.float32)
        pr = jax.nn.softmax(rl, axis=-1)                         # [B,T,X]
        topv, topi = jax.lax.top_k(pr, max(cfg.expert_used_count, 1))
        topv = topv / (topv.sum(-1, keepdims=True) + 1e-9)
        moa_route = jnp.zeros_like(pr).at[
            jnp.arange(B)[:, None, None],
            jnp.arange(T)[None, :, None], topi].add(topv)
        q = jnp.einsum("bte,xeh->btxh", h, lp["wq_exps"].astype(h.dtype))
        q = q.reshape(B, T, Xe, Hkv, D).transpose(0, 1, 3, 2, 4) \
            .reshape(B, T, H, D)
        k = mm(h, lp["wk"]).reshape(B, T, Hkv, D)
        v = mm(h, lp["wv"]).reshape(B, T, Hkv, D)
    elif "wqkv" in lp:
        # load-time fused q/k/v projection (loader.fuse_projections):
        # one [E, (H+2*Hkv)*D] matmul; per-column contraction keeps the
        # split outputs bitwise identical to the separate matmuls
        if _fuse_qkv_ok(cfg, lp, lora_scales, x):
            # decode hot path: norm + act-quantize fused into the matmul
            # (ops/fused_decode) — same rounding as the unfused sequence
            from ..ops.fused_decode import fused_norm_qmm
            xr, R = _pad8(x.reshape(B * T, E))
            qkv = fused_norm_qmm(xr, lp["attn_norm"], lp["wqkv"].qs,
                                 lp["wqkv"].scales, eps=cfg.rms_eps,
                                 interpret=not _flash_on_tpu())
            qkv = qkv[:R].reshape(B, T, -1).astype(x.dtype)
        else:
            qkv = mm(h, lp["wqkv"])
        nq, nk = H * D, Hkv * D
        q = qkv[..., :nq] + _lora_delta(h, lp, "wq", lora_scales)
        k = qkv[..., nq:nq + nk] + _lora_delta(h, lp, "wk", lora_scales)
        v = qkv[..., nq + nk:] + _lora_delta(h, lp, "wv", lora_scales)
        if "bq" in lp:
            q = q + lp["bq"]
            k = k + lp["bk"]
            v = v + lp["bv"]
        if cfg.attn_clamp > 0.0:  # olmo clip_qkv
            c = cfg.attn_clamp
            q, k, v = (jnp.clip(t, -c, c) for t in (q, k, v))
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        if "q_norm" in lp and not cfg.qk_norm_post_rope:
            if "q_norm_b" in lp:   # chameleon per-head biased LayerNorm
                q = _ln_per_head(q, lp["q_norm"], lp["q_norm_b"], H, D)
                k = _ln_per_head(k, lp["k_norm"], lp["k_norm_b"], Hkv, D)
            elif lp["q_norm"].shape[-1] == D:  # per-head QK norm (qwen3)
                q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
                k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            else:                              # whole-row norm (olmo2)
                q = rms_norm(q.reshape(B, T, -1), lp["q_norm"],
                             cfg.rms_eps).reshape(B, T, H, D)
                k = rms_norm(k.reshape(B, T, -1), lp["k_norm"],
                             cfg.rms_eps).reshape(B, T, Hkv, D)
    else:
        q = mm(h, lp["wq"]) + _lora_delta(h, lp, "wq", lora_scales)
        k = mm(h, lp["wk"]) + _lora_delta(h, lp, "wk", lora_scales)
        v = mm(h, lp["wv"]) + _lora_delta(h, lp, "wv", lora_scales)
        if "bq" in lp:  # qwen2-style attention biases
            q = q + lp["bq"]
            k = k + lp["bk"]
            v = v + lp["bv"]
        if cfg.attn_clamp > 0.0:  # olmo clip_qkv
            c = cfg.attn_clamp
            q, k, v = (jnp.clip(t, -c, c) for t in (q, k, v))
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        if "q_norm" in lp and not cfg.qk_norm_post_rope:
            if "q_norm_b" in lp:   # chameleon per-head biased LayerNorm
                q = _ln_per_head(q, lp["q_norm"], lp["q_norm_b"], H, D)
                k = _ln_per_head(k, lp["k_norm"], lp["k_norm_b"], Hkv, D)
            elif lp["q_norm"].shape[-1] == D:  # per-head QK norm (qwen3)
                q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
                k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            else:                              # whole-row norm (olmo2)
                q = rms_norm(q.reshape(B, T, -1), lp["q_norm"],
                             cfg.rms_eps).reshape(B, T, H, D)
                k = rms_norm(k.reshape(B, T, -1), lp["k_norm"],
                             cfg.rms_eps).reshape(B, T, Hkv, D)

    if cos.ndim == 3 and rope_pre:
        # pre-gathered per-position tables (hoisted out of the layer scan)
        pass
    elif cos.ndim == 3:  # stacked global/local rope (gemma3)
        cos = jax.lax.select(is_local > 0, cos[1], cos[0])
        sin = jax.lax.select(is_local > 0, sin[1], sin[0])
    if mask.ndim == 4:  # stacked global/local masks (alternating SWA)
        mask = jax.lax.select(is_local > 0, mask[1], mask[0])
    if cfg.mrope_sections:
        # qwen2-vl M-RoPE: text tokens use identical streams; vision
        # chunks pass explicit (t, y, x) grid streams via mrope_pos
        if mrope_pos is None:
            pos3 = jnp.broadcast_to(positions[None], (3,) + positions.shape)
        else:
            pos3 = mrope_pos
        q = apply_mrope(q, pos3, cos, sin, cfg.mrope_sections)
        k = apply_mrope(k, pos3, cos, sin, cfg.mrope_sections)
    else:
        rp = None if rope_pre else positions
        q = apply_rope(q, rp, cos, sin, cfg.rope_mode)
        k = apply_rope(k, rp, cos, sin, cfg.rope_mode)
    if cfg.qk_norm_post_rope and "q_norm" in lp:
        # hunyuan: per-head q/k RMSNorm applied AFTER the rotation (HF
        # HunYuanDenseV1Attention order). The cache stores the post-norm
        # keys; context-shift re-rotation is approximate for this family
        # (rotation and the weighted norm don't commute) exactly as the
        # reference's K-shift is.
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    if cfg.qk_l2_norm:  # llama4: weightless per-head L2 norm after rope
        q = q * jax.lax.rsqrt(
            jnp.sum(jnp.square(q.astype(jnp.float32)), -1,
                    keepdims=True) + 1e-6).astype(q.dtype)
        k = k * jax.lax.rsqrt(
            jnp.sum(jnp.square(k.astype(jnp.float32)), -1,
                    keepdims=True) + 1e-6).astype(k.dtype)
    if cfg.attn_temp_scale > 0.0:
        # llama4 nope-layer temperature tuning:
        # q *= 1 + scale * log1p(floor((pos+1) / floor_scale))
        pf = jnp.floor((positions.astype(jnp.float32) + 1.0)
                       / cfg.attn_temp_floor)
        f = 1.0 + cfg.attn_temp_scale * jnp.log1p(pf)
        f = jnp.where(is_local > 0, 1.0, f)          # rope layers: off
        q = q * f[:, :, None, None].astype(q.dtype)

    if deferred_kv:
        # decode/verify/prefill: the cache stays READ-ONLY inside the
        # layer scan (carrying updated caches through scan outputs forces
        # a full cache copy per layer — profiled at ~600us/step);
        # attention runs against cache entries strictly before the chunk
        # plus an explicit in-chunk causal part, and the new rows are
        # returned for ONE fused write after the scan.
        return _attn_deferred(x, lp, positions, k_cache, v_cache, mask,
                              cfg, q, k, v, is_local, k_scale, v_scale,
                              lora_scales, flash_meta=flash_meta,
                              chain=chain, extra_residual=extra_residual,
                              layer_idx=layer_idx, attn_route=moa_route)

    # non-deferred path (embeddings forward: cache == chunk, bidirectional
    # masks): scatter current K/V in, then attend the whole cache
    if k_scale is not None:
        kq, ks = _kv_quantize(k.astype(jnp.float32))
        vq, vs = _kv_quantize(v.astype(jnp.float32))
        vals = ((kq, ks), (vq, vs))
    else:
        vals = ((k.astype(k_cache.dtype), None),
                (v.astype(v_cache.dtype), None))

    def _scatter(cache, scale, val, sval):
        bidx = jnp.arange(B)[:, None].repeat(T, 1)
        cache = cache.at[bidx, positions].set(val, mode="drop")
        if scale is not None:
            scale = scale.at[bidx, positions].set(sval, mode="drop")
        return cache, scale

    k_cache, k_scale = _scatter(k_cache, k_scale, *vals[0])
    v_cache, v_scale = _scatter(v_cache, v_scale, *vals[1])

    # attention compute dtype: bf16 when the cache is bf16/int8 (halves
    # the materialized cache traffic; MXU still accumulates f32 via
    # preferred_element_type) — f32 caches (tests, --cache-type f32)
    # keep exact f32 math
    adt = (jnp.float32 if k_cache.dtype == jnp.float32 else jnp.bfloat16)
    if k_scale is not None:
        kf = k_cache.astype(adt) * k_scale.astype(adt)[..., None]
        vf = v_cache.astype(adt) * v_scale.astype(adt)[..., None]
    else:
        kf = k_cache.astype(adt)
        vf = v_cache.astype(adt)

    G = H // Hkv
    qf = q.astype(adt).reshape(B, T, Hkv, G, D)
    scores = jnp.einsum("bthgd,bchd->bhgtc", qf, kf,
                        preferred_element_type=jnp.float32) * (cfg.attn_scale or D ** -0.5)
    if cfg.alibi_max_bias > 0.0:
        C_ = kf.shape[1]
        sl5 = _alibi_slopes(cfg)[None, :, :, None, None]
        dist = (jnp.arange(C_)[None, None, None, None, :]
                - positions[:, None, None, :, None]).astype(jnp.float32)
        scores = scores + sl5 * dist
    if cfg.attn_softcap > 0.0:
        scores = cfg.attn_softcap * jnp.tanh(scores / cfg.attn_softcap)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    m = scores.max(axis=-1, keepdims=True)
    if "sinks" in lp:
        # gpt-oss attention sinks: a per-head learnable logit joins the
        # softmax (max + denominator) but contributes no value row
        # (HF GptOssAttention: cat([scores, sinks]) -> softmax -> drop)
        snk = lp["sinks"].astype(jnp.float32).reshape(
            Hkv, G)[None, :, :, None, None]
        m = jnp.maximum(m, snk)
    probs = jnp.exp(scores - m)
    denom = probs.sum(axis=-1, keepdims=True) + 1e-30
    if "sinks" in lp:
        denom = denom + jnp.exp(snk - m)
    probs = probs / denom
    Dv = vf.shape[-1]
    attn = jnp.einsum("bhgtc,bchd->bthgd", probs.astype(adt), vf,
                      preferred_element_type=jnp.float32) \
        .reshape(B, T, H * Dv)

    x = _layer_tail(x, lp, cfg, attn, lora_scales,
                    extra_residual=extra_residual, attn_route=moa_route)
    return x, k_cache, v_cache, k_scale, v_scale


def _ln_per_head(t, w, b, Hn, D):
    """chameleon ChameleonLayerNorm: LayerNorm over head_dim with
    DISTINCT per-head weight/bias (stored flattened [H*D])."""
    tf = t.astype(jnp.float32)
    mu = tf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(tf - mu), -1, keepdims=True)
    y = (tf - mu) * jax.lax.rsqrt(var + 1e-5)
    y = y * w.astype(jnp.float32).reshape(Hn, D) \
        + b.astype(jnp.float32).reshape(Hn, D)
    return y.astype(t.dtype)


def _alibi_slopes(cfg: ModelConfig):
    """Per-head ALiBi slopes [Hkv, G] (ggml soft_max_ext formula with
    f_max_alibi_bias; equals the published 2^(-8i/H) sequence for
    power-of-two head counts)."""
    import math
    H = cfg.n_heads
    n = 2 ** int(math.floor(math.log2(H)))
    m0 = 2.0 ** (-cfg.alibi_max_bias / n)
    m1 = 2.0 ** (-cfg.alibi_max_bias / 2.0 / n)
    slopes = [m0 ** (i + 1) if i < n else m1 ** (2 * (i - n) + 1)
              for i in range(H)]
    G = H // max(1, cfg.n_kv_heads)
    return jnp.asarray(slopes, jnp.float32).reshape(cfg.n_kv_heads, G)


def _mla_qkv(h, lp, cfg: ModelConfig):
    """Deepseek2 MLA projections -> per-head q/k/v with rope dims FIRST.

    q: (q_a -> norm -> q_b) or plain wq; [B,T,H,(rope+nope)]
    kv: wkv_a -> [c_kv (kv_lora), k_pe (rope)]; k_pe is a single shared
    stream; wkv_b(norm(c_kv)) -> per-head (k_nope + v).
    """
    B, T, _ = h.shape
    H = cfg.n_heads
    rope = cfg.rope_dim
    nope = cfg.head_dim - rope
    dv = cfg.v_head_dim or cfg.head_dim

    if "wq_a" in lp:
        q = mm(rms_norm(mm(h, lp["wq_a"]), lp["q_a_norm"], cfg.rms_eps),
               lp["wq_b"])
    else:
        q = mm(h, lp["wq"])
    q = q.reshape(B, T, H, nope + rope)
    # GGUF stores q as (nope, rope) per head; reorder to (rope, nope)
    q = jnp.concatenate([q[..., nope:], q[..., :nope]], axis=-1)

    c = mm(h, lp["wkv_a"])                       # [B,T, kv_lora + rope]
    c_kv = rms_norm(c[..., :cfg.kv_lora_rank], lp["kv_a_norm"], cfg.rms_eps)
    k_pe = c[..., cfg.kv_lora_rank:]             # [B,T,rope] shared head
    kv = mm(c_kv, lp["wkv_b"]).reshape(B, T, H, nope + dv)
    k_nope = kv[..., :nope]
    v = kv[..., nope:]
    k = jnp.concatenate(
        [jnp.broadcast_to(k_pe[:, :, None, :], (B, T, H, rope)), k_nope],
        axis=-1)
    return q, k, v


def _norm_any(x, w, b, cfg: ModelConfig):
    """rms or LayerNorm (biased) per cfg.norm_style."""
    if cfg.norm_style == "ln":
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + cfg.rms_eps)
        y = y * w.astype(jnp.float32)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(x.dtype)
    return rms_norm(x, w, cfg.rms_eps)


def _pre_norm(x, lp, key, cfg: ModelConfig):
    """Input norm; absent tensor = identity (olmo2 post-norm-only blocks)."""
    if key not in lp:
        return x
    return _norm_any(x, lp[key], lp.get(key + "_b"), cfg)


def _act(gate, cfg: ModelConfig):
    if cfg.act_fn == "gelu":
        return jax.nn.gelu(gate, approximate=True)
    if cfg.act_fn == "relu2":
        return jnp.square(jax.nn.relu(gate))
    return jax.nn.silu(gate)


def _xielu(x, p):
    """apertus xIELU (HF XIELUActivation._xielu_python): p = raw
    [alpha_p, alpha_n, beta, eps]; softplus applied here, in the forward."""
    ap = jax.nn.softplus(p[0])
    beta = p[2]
    an = beta + jax.nn.softplus(p[1])
    return jnp.where(x > 0, ap * x * x + beta * x,
                     (jnp.expm1(jnp.minimum(x, p[3])) - x) * an + beta * x)


def _ffn_block(h, lp, cfg: ModelConfig, lora_scales, dtype):
    if "w_gate_inp" in lp:
        return _moe_ffn(h, lp, cfg).astype(dtype)
    if not cfg.ffn_gated:
        # up -> act -> down (falcon/gptneox/phi2/starcoder2), with biases
        up = mm(h, lp["w_up"]) + _lora_delta(h, lp, "w_up", lora_scales)
        if "b_up" in lp:
            up = up + lp["b_up"]
        if cfg.act_fn == "xielu" and "xielu" in lp:
            act = _xielu(up.astype(jnp.float32), lp["xielu"]).astype(dtype)
        else:
            act = _act(up.astype(jnp.float32), cfg).astype(dtype)
        out = mm(act, lp["w_down"]) + _lora_delta(act, lp, "w_down",
                                                  lora_scales)
        if "b_down" in lp:
            out = out + lp["b_down"]
        return out.astype(dtype)
    if "w_gateup" in lp:   # load-time fused gate|up (fuse_projections)
        gu = mm(h, lp["w_gateup"])
        ff = gu.shape[-1] // 2
        gate = gu[..., :ff] + _lora_delta(h, lp, "w_gate", lora_scales)
        up = gu[..., ff:] + _lora_delta(h, lp, "w_up", lora_scales)
    else:
        gate = mm(h, lp["w_gate"]) + _lora_delta(h, lp, "w_gate",
                                                 lora_scales)
        up = mm(h, lp["w_up"]) + _lora_delta(h, lp, "w_up", lora_scales)
    if "b_gate" in lp:          # jais biased SwiGLU
        gate = gate + lp["b_gate"]
    if "b_up" in lp:
        up = up + lp["b_up"]
    gate = gate.astype(jnp.float32)
    act = (_act(gate, cfg) * up.astype(jnp.float32)).astype(dtype)
    if "ffn_sub_norm" in lp:    # bitnet: norm before the down proj
        act = _norm_any(act, lp["ffn_sub_norm"], None, cfg)
    out = mm(act, lp["w_down"]) + _lora_delta(act, lp, "w_down",
                                              lora_scales)
    if "b_down" in lp:
        out = out + lp["b_down"]
    return out.astype(dtype)


def _layer_tail(x, lp, cfg: ModelConfig, attn, lora_scales,
                extra_residual=None, attn_route=None):
    """Shared post-attention tail: output proj (+post norm) + FFN/MoE.
    Sequential residual by default; parallel_residual archs
    (falcon/phi2/command-r) add attn and FFN of the SAME normed input.
    extra_residual: a parallel mixer's output joining the attention
    residual (falcon-h1: x + attn + mamba, then the FFN block)."""
    if extra_residual is None and _fuse_tail_ok(cfg, lp, lora_scales, x):
        # decode hot path: wo + residual + ffn_norm + gate|up + act +
        # down + residual as ONE Pallas program (ops/fused_decode)
        from ..ops.fused_decode import fused_layer_tail
        B, T, E = x.shape
        ao, R = _pad8(attn.astype(jnp.bfloat16).reshape(B * T, -1))
        xr, _ = _pad8(x.reshape(B * T, E))
        out = fused_layer_tail(
            ao, xr, lp["wo"].qs, lp["wo"].scales, lp["ffn_norm"],
            lp["w_gateup"].qs, lp["w_gateup"].scales, lp["w_down"].qs,
            lp["w_down"].scales, eps=cfg.rms_eps, rs=cfg.residual_scale,
            act_fn=cfg.act_fn, interpret=not _flash_on_tpu())
        return out[:R].reshape(B, T, E).astype(x.dtype)
    ao = attn.astype(x.dtype)
    if "attn_sub_norm" in lp:   # bitnet: norm before the output proj
        ao = _norm_any(ao, lp["attn_sub_norm"], None, cfg)
    if "wq_gate" in lp:
        # qwen3-next output gating: attn *= sigmoid(gate(norm_input))
        # before o_proj (the gate projection is split out of the fused
        # q_proj at conversion)
        hg = _pre_norm(x, lp, "attn_norm", cfg)
        ao = ao * jax.nn.sigmoid(mm(hg, lp["wq_gate"])).astype(x.dtype)
    if attn_route is not None:
        # jetmoe MoA output side: heads laid out [Hkv, X]; each expert's
        # slice projects through its own output matrix, weighted by the
        # dense routing mask (0 for unselected experts)
        B_, T_, HD = ao.shape
        Xe = lp["wo_exps"].shape[0]
        Dv = HD // (Xe * cfg.n_kv_heads)
        a4 = ao.reshape(B_, T_, cfg.n_kv_heads, Xe, Dv) \
               .transpose(0, 1, 3, 2, 4).reshape(B_, T_, Xe, -1)
        attn_out = jnp.einsum(
            "btxh,xhe->bte",
            a4 * attn_route[..., None].astype(ao.dtype),
            lp["wo_exps"].astype(ao.dtype)).astype(x.dtype)
    else:
        attn_out = (mm(ao, lp["wo"])
                    + _lora_delta(ao, lp, "wo", lora_scales)).astype(x.dtype)
    if "bo" in lp:
        attn_out = attn_out + lp["bo"].astype(x.dtype)
    if "attn_post_norm" in lp:  # gemma2/3 sandwich, olmo2 post-norm
        attn_out = _norm_any(attn_out, lp["attn_post_norm"],
                             lp.get("attn_post_norm_b"), cfg)

    rs = cfg.residual_scale
    if extra_residual is not None:
        # joins the attention residual exactly when rs == 1 (falcon-h1);
        # the /rs keeps the shared `x + attn_out*rs` lines below intact
        attn_out = attn_out + extra_residual.astype(x.dtype) / rs
    if cfg.parallel_residual:
        # the FFN input: a second norm of x when present (falcon-40b
        # attn_norm_2), else the shared attention-input norm
        if "attn_norm_2" in lp:
            h = _norm_any(x, lp["attn_norm_2"], lp.get("attn_norm_2_b"),
                          cfg)
        elif "ffn_norm" in lp:
            h = _pre_norm(x, lp, "ffn_norm", cfg)
        else:
            h = _pre_norm(x, lp, "attn_norm", cfg)
        ffn_out = _ffn_block(h, lp, cfg, lora_scales, x.dtype)
        if "ffn_post_norm" in lp:
            ffn_out = _norm_any(ffn_out, lp["ffn_post_norm"],
                                lp.get("ffn_post_norm_b"), cfg)
        return x + (attn_out + ffn_out) * rs

    x = x + attn_out * rs
    if "ffn_norm_exps" in lp:
        # arctic (snowflake): the dense FFN and the MoE run in PARALLEL
        # off the attention residual, each with its own pre-norm
        # (llama.cpp llm_build_arctic: ffn_out = ffn_inp +
        # dense(ffn_norm(ffn_inp)); out = ffn_out +
        # moe(ffn_norm_exps(ffn_inp)))
        h = _pre_norm(x, lp, "ffn_norm", cfg)
        lp_dense = {k_: v_ for k_, v_ in lp.items() if k_ != "w_gate_inp"}
        dense = _ffn_block(h, lp_dense, cfg, lora_scales, x.dtype)
        hm = _norm_any(x, lp["ffn_norm_exps"], None, cfg)
        # b_down belongs to the DENSE branch (it was applied above);
        # _moe_mix would re-add it as a jetmoe-style post-sum bias
        lp_moe = {k_: v_ for k_, v_ in lp.items() if k_ != "b_down"}
        moe = _moe_ffn(hm, lp_moe, cfg).astype(x.dtype)
        return x + (dense + moe) * rs
    if not any(k_ in lp for k_ in ("w_up", "w_gate", "w_gate_inp",
                                   "w_gateup")):
        return x   # attention-only block (nemotron-h hybrid)
    h = _pre_norm(x, lp, "ffn_norm", cfg)
    ffn_out = _ffn_block(h, lp, cfg, lora_scales, x.dtype)
    if "ffn_post_norm" in lp:
        ffn_out = _norm_any(ffn_out, lp["ffn_post_norm"],
                            lp.get("ffn_post_norm_b"), cfg)
    return x + ffn_out * rs


def _attn_deferred(x, lp, positions, k_cache, v_cache, mask, cfg, q, k, v,
                   is_local, k_scale, v_scale, lora_scales,
                   flash_meta=None, chain=None, extra_residual=None,
                   tail=True, layer_idx=None, attn_route=None):
    """Read-only-cache attention for the batched decode/verify step AND
    (via the flash kernel) batched prefill.
    Returns (x_out, rows) where rows are the new K/V entries (quantized
    when the cache is int8) for a post-scan scatter.
    flash_meta: [B, 4] int32 (pos0, n_valid, bidir_st, bidir_en) when the
    chunk rows are contiguous (prefill) — enables the batched flash
    kernel (int8 caches are dequantized inside it, block by block).
    chain: (ck [B,Kc,Hkv,D], cv [B,Kc,Hkv,Dv], cks, cvs, nc) — rows of
    the CURRENT multi-step decode chain not yet scattered into the cache
    (chain step nc queries attend the nc prior chain rows here, at
    absolute positions qpos-nc .. qpos-1; cache entries at those
    positions are stale and get masked out). Stored in cache dtype so
    chained output is bit-comparable to step-by-step decode."""
    B, T = positions.shape
    C = k_cache.shape[2] if layer_idx is not None else k_cache.shape[1]
    H = q.shape[2]
    Hkv = k.shape[2]
    D = q.shape[-1]
    G = H // Hkv
    adt = (jnp.float32 if k_cache.dtype == jnp.float32 else jnp.bfloat16)

    if k_scale is not None:
        kq_r, ks_r = _kv_quantize(k.astype(jnp.float32))
        vq_r, vs_r = _kv_quantize(v.astype(jnp.float32))
        rows = (kq_r, vq_r, ks_r, vs_r)
    else:
        rows = (k.astype(k_cache.dtype), v.astype(v_cache.dtype))

    snk = (lp["sinks"].astype(jnp.float32).reshape(Hkv, G)
           if "sinks" in lp else None)
    if flash_meta is not None and T >= 64 and _flash_ok() \
            and cfg.alibi_max_bias == 0.0 \
            and (_flash_on_tpu() or _flash_forced()):
        # per-layer window/chunk scalars: one compiled kernel serves the
        # alternating local/global layer patterns
        w = jnp.int32(0)
        cw = jnp.int32(0)
        if cfg.swa_window > 0:
            w = (jnp.where(is_local > 0, cfg.swa_window, 0)
                 if cfg.swa_pattern > 0 else jnp.int32(cfg.swa_window))
        if cfg.chunked_window > 0:
            cw = jnp.where(is_local > 0, cfg.chunked_window, 0)
        win = jnp.stack([jnp.asarray(w, jnp.int32),
                         jnp.asarray(cw, jnp.int32)])
        qg = (q.astype(adt).reshape(B, T, Hkv, G, D)
              .transpose(0, 2, 3, 1, 4))               # [B,Hkv,G,T,D]
        o = flash_prefill_batched(
            qg, k_cache, v_cache, k.astype(adt), v.astype(adt),
            flash_meta, win, k_scale=k_scale, v_scale=v_scale,
            sinks=snk, softcap=cfg.attn_softcap,
            scale=(cfg.attn_scale or None),
            interpret=not _flash_on_tpu())
        Dv = v_cache.shape[-1]
        attn = o.transpose(0, 3, 1, 2, 4).reshape(B, T, H * Dv)
        if not tail:
            return attn, rows
        return _layer_tail(x, lp, cfg, attn, lora_scales,
                           extra_residual=extra_residual,
                           attn_route=attn_route), rows

    if chain is not None and T == 1 and layer_idx is None \
            and cfg.alibi_max_bias == 0.0 and cfg.swa_window == 0 \
            and cfg.chunked_window == 0 and "sinks" not in lp \
            and flash_meta is None:
        # chained decode, merged einsum variant: the CURRENT row rides
        # the chain block at index nc (onehot merge, exactly like the
        # flash kernel's rows operand), so the step is two score blocks
        # [cache | chain] instead of three — no separate in-chunk einsum
        # or causal-mask build per layer. The chain-block masks are
        # layer-invariant here and arrive precomputed from _run_stack
        # (chain[5]), removing ~20us/step of per-layer iota/compare
        # fusions at the bench shape.
        ck, cv, cks, cvs, nc_t, *pre = chain
        Kc = ck.shape[1]
        if cks is not None:
            ckf = ck.astype(adt) * cks.astype(adt)[..., None]
            cvf0 = cv.astype(adt) * cvs.astype(adt)[..., None]
        else:
            ckf = ck.astype(adt)
            cvf0 = cv.astype(adt)
        # merge the current row at index nc via a tiny window write: a
        # [B,1,H,D] dynamic_update_slice beats the onehot where-merge,
        # whose pred[Kc] compare+broadcast re-materialized per layer
        # (~8us/step at the bench shape — XLA does not LICM it out of
        # the scan body)
        z0 = jnp.int32(0)
        kr = jax.lax.dynamic_update_slice(
            ckf, k.astype(adt)[:, :1], (z0, nc_t, z0, z0))
        vr = jax.lax.dynamic_update_slice(
            cvf0, v.astype(adt)[:, :1], (z0, nc_t, z0, z0))
        if k_scale is not None:
            kf = k_cache.astype(adt) * k_scale.astype(adt)[..., None]
            vf = v_cache.astype(adt) * v_scale.astype(adt)[..., None]
        else:
            kf = k_cache.astype(adt)
            vf = v_cache.astype(adt)
        scale = cfg.attn_scale or D ** -0.5
        qf = q.astype(adt).reshape(B, T, Hkv, G, D)
        sc = jnp.einsum("bthgd,bchd->bhgtc", qf, kf,
                        preferred_element_type=jnp.float32) * scale
        s3 = jnp.einsum("bthgd,bshd->bhgts", qf, kr,
                        preferred_element_type=jnp.float32) * scale
        if pre:
            mask_c, m3 = pre[0]
        else:
            kpos = jnp.arange(C)[None, None, :]
            mask_c = mask & (kpos < positions[:, :1, None] - nc_t)
            ci = jnp.arange(Kc)[None, None, :]
            kpos3 = positions[:, :, None] - (nc_t - ci)
            m3 = (ci <= nc_t) & (kpos3 >= 0)
        if cfg.attn_softcap > 0.0:
            sc = cfg.attn_softcap * jnp.tanh(sc / cfg.attn_softcap)
            s3 = cfg.attn_softcap * jnp.tanh(s3 / cfg.attn_softcap)
        z = jnp.concatenate(
            [jnp.where(mask_c[:, None, None, :, :], sc, NEG_INF),
             jnp.where(m3[:, None, None, :, :], s3, NEG_INF)], axis=-1)
        mx = z.max(axis=-1, keepdims=True)
        p = jnp.exp(z - mx)
        p = p / (p.sum(axis=-1, keepdims=True) + 1e-30)
        Dv = vf.shape[-1]
        attn = (jnp.einsum("bhgtc,bchd->bthgd",
                           p[..., :kf.shape[1]].astype(adt), vf,
                           preferred_element_type=jnp.float32)
                + jnp.einsum("bhgts,bshd->bthgd",
                             p[..., kf.shape[1]:].astype(adt), vr,
                             preferred_element_type=jnp.float32))
        attn = attn.reshape(B, T, H * Dv)
        if not tail:
            return attn, rows
        return _layer_tail(x, lp, cfg, attn, lora_scales,
                           extra_residual=extra_residual,
                           attn_route=attn_route), rows

    if chain is not None and T == 1 and layer_idx is not None:
        # chained decode through the single-query flash kernel
        # (ops/flash_decode): the cache is read block-by-block in its
        # DEFAULT layout (no whole-cache relayout copies at the dispatch
        # boundary, the einsum path's cost) and only blocks below the
        # live position are fetched (position-proportional traffic, no
        # attn_len bucketing). int8 caches dequantize in VMEM. The chain
        # rows ride the kernel's rows operand: rows 0..nc-1 plus the
        # current row at index nc, with nv = nc+1.
        ck, cv, cks, cvs, nc_t = chain[:5]
        Kc = ck.shape[1]
        if cks is not None:
            ckf = ck.astype(adt) * cks.astype(adt)[..., None]
            cvf0 = cv.astype(adt) * cvs.astype(adt)[..., None]
        else:
            ckf = ck.astype(adt)
            cvf0 = cv.astype(adt)
        onehot = (jnp.arange(Kc) == nc_t)[None, :, None, None]
        kr = jnp.where(onehot, k.astype(adt)[:, :1], ckf)
        vr = jnp.where(onehot, v.astype(adt)[:, :1], cvf0)
        qd = q.astype(adt).reshape(B, Hkv, G, D)
        # inactive slots carry the position >= C sentinel: clamp their
        # cpos to 0 so the kernel's index maps fetch nothing for them
        # (fully-masked rows yield zeros, discarded host-side)
        cpos = jnp.where(positions[:, 0] >= C, 0, positions[:, 0])
        meta = jnp.stack([cpos, jnp.broadcast_to(nc_t + 1, (B,))], axis=1)
        w = jnp.int32(0)
        cw = jnp.int32(0)
        if cfg.swa_window > 0:
            w = (jnp.where(is_local > 0, cfg.swa_window, 0)
                 if cfg.swa_pattern > 0 else jnp.int32(cfg.swa_window))
        if cfg.chunked_window > 0:
            cw = jnp.where(is_local > 0, cfg.chunked_window, 0)
        win = jnp.stack([jnp.asarray(w, jnp.int32),
                         jnp.asarray(cw, jnp.int32)])
        o = flash_decode(
            qd, k_cache, v_cache, kr, vr, meta, win,
            k_scale=k_scale, v_scale=v_scale, layer=layer_idx, sinks=snk,
            scale=(cfg.attn_scale or None), softcap=cfg.attn_softcap,
            interpret=not _flash_on_tpu())
        Dv = v_cache.shape[-1]
        attn = o.astype(adt).reshape(B, 1, H * Dv)
        if not tail:
            return attn, rows
        return _layer_tail(x, lp, cfg, attn, lora_scales,
                           extra_residual=extra_residual,
                           attn_route=attn_route), rows

    if k_scale is not None:
        kf = k_cache.astype(adt) * k_scale.astype(adt)[..., None]
        vf = v_cache.astype(adt) * v_scale.astype(adt)[..., None]
    else:
        kf = k_cache.astype(adt)
        vf = v_cache.astype(adt)

    # cache part: entries strictly before this chunk (and before the
    # chain window, whose rows live in the chain operand instead)
    nc = chain[4] if chain is not None else 0
    kpos = jnp.arange(C)[None, None, :]
    mask_c = mask & (kpos < positions[:, :1, None] - nc)
    qf = q.astype(adt).reshape(B, T, Hkv, G, D)
    sc = jnp.einsum("bthgd,bchd->bhgtc", qf, kf,
                    preferred_element_type=jnp.float32) * (cfg.attn_scale or D ** -0.5)
    # in-chunk part: pairwise causal over the current rows
    ss = jnp.einsum("bthgd,bshd->bhgts", qf, k.astype(adt),
                    preferred_element_type=jnp.float32) * (cfg.attn_scale or D ** -0.5)
    sl5 = None
    if cfg.alibi_max_bias > 0.0:
        # ALiBi (bloom/mpt): score += slope_h * (kpos - qpos); cache index
        # IS the absolute position in this design (ggml soft_max_ext mask
        # * slope semantics)
        sl5 = _alibi_slopes(cfg)[None, :, :, None, None]
        dist_c = (jnp.arange(C)[None, None, None, None, :]
                  - positions[:, None, None, :, None]).astype(jnp.float32)
        sc = sc + sl5 * dist_c
        dist_s = (positions[:, None, :] - positions[:, :, None]) \
            .astype(jnp.float32)              # [b, t, s] = kpos - qpos
        ss = ss + sl5 * dist_s[:, None, None, :, :]
    qp = positions
    inm = (qp[:, :, None] >= qp[:, None, :]) & (qp[:, None, :] < C)
    if cfg.swa_window > 0:
        local_ok = inm & (qp[:, None, :] > qp[:, :, None] - cfg.swa_window)
        if cfg.swa_pattern > 0:
            inm = jnp.where(is_local > 0, local_ok, inm)
        else:
            inm = local_ok
    if cfg.chunked_window > 0:
        same = (qp[:, None, :] // cfg.chunked_window
                == qp[:, :, None] // cfg.chunked_window)
        inm = jnp.where(is_local > 0, inm & same, inm)
    if flash_meta is not None:
        # bidirectional span (gemma3 vision): rows whose absolute position
        # falls in [st, en) are visible to every valid query row
        st = flash_meta[:, 2][:, None, None]
        en = flash_meta[:, 3][:, None, None]
        kp_in = qp[:, None, :]
        inm = inm | ((kp_in >= st) & (kp_in < en) & (kp_in < C))

    s3 = m3 = cvf = None
    if chain is not None:
        ck, cv, cks, cvs = chain[:4]
        Kc = ck.shape[1]
        if cks is not None:
            ckf = ck.astype(adt) * cks.astype(adt)[..., None]
            cvf = cv.astype(adt) * cvs.astype(adt)[..., None]
        else:
            ckf = ck.astype(adt)
            cvf = cv.astype(adt)
        s3 = jnp.einsum("bthgd,bshd->bhgts", qf, ckf,
                        preferred_element_type=jnp.float32) * (cfg.attn_scale or D ** -0.5)
        # chain row i holds absolute position qpos - (nc - i)
        ci = jnp.arange(Kc)[None, None, :]
        kpos3 = positions[:, :, None] - (nc - ci)            # [B, T, Kc]
        if sl5 is not None:
            s3 = s3 + sl5 * (kpos3 - positions[:, :, None]) \
                .astype(jnp.float32)[:, None, None]
        m3 = (ci < nc) & (kpos3 >= 0)
        if cfg.swa_window > 0:
            local3 = m3 & (kpos3 > positions[:, :, None] - cfg.swa_window)
            m3 = jnp.where(is_local > 0, local3, m3) \
                if cfg.swa_pattern > 0 else local3
        if cfg.chunked_window > 0:
            same3 = (kpos3 // cfg.chunked_window
                     == positions[:, :, None] // cfg.chunked_window)
            m3 = jnp.where(is_local > 0, m3 & same3, m3)

    if cfg.attn_softcap > 0.0:
        sc = cfg.attn_softcap * jnp.tanh(sc / cfg.attn_softcap)
        ss = cfg.attn_softcap * jnp.tanh(ss / cfg.attn_softcap)
        if s3 is not None:
            s3 = cfg.attn_softcap * jnp.tanh(s3 / cfg.attn_softcap)
    sc = jnp.where(mask_c[:, None, None, :, :], sc, NEG_INF)
    ss = jnp.where(inm[:, None, None, :, :], ss, NEG_INF)
    blocks = [sc, ss]
    if s3 is not None:
        blocks.append(jnp.where(m3[:, None, None, :, :], s3, NEG_INF))
    z = jnp.concatenate(blocks, axis=-1)
    m = z.max(axis=-1, keepdims=True)
    if "sinks" in lp:
        # gpt-oss attention sinks (see _attn_layer): sink logit joins the
        # max + denominator only
        snk = lp["sinks"].astype(jnp.float32).reshape(
            Hkv, G)[None, :, :, None, None]
        m = jnp.maximum(m, snk)
    p = jnp.exp(z - m)
    den = p.sum(axis=-1, keepdims=True) + 1e-30
    if "sinks" in lp:
        den = den + jnp.exp(snk - m)
    p = p / den
    pc, ps = p[..., :C], p[..., C:C + T]
    Dv = vf.shape[-1]
    attn = (jnp.einsum("bhgtc,bchd->bthgd", pc.astype(adt), vf,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bhgts,bshd->bthgd", ps.astype(adt),
                         v.astype(adt),
                         preferred_element_type=jnp.float32))
    if s3 is not None:
        attn = attn + jnp.einsum("bhgts,bshd->bthgd",
                                 p[..., C + T:].astype(adt), cvf,
                                 preferred_element_type=jnp.float32)
    attn = attn.reshape(B, T, H * Dv)

    if not tail:
        return attn, rows
    x = _layer_tail(x, lp, cfg, attn, lora_scales,
                    extra_residual=extra_residual, attn_route=attn_route)
    return x, rows


_SWIGLU_OAI_ALPHA = 1.702   # gpt-oss clamped-swiglu constants
_SWIGLU_OAI_LIMIT = 7.0


def _moe_ffn(h, lp, cfg: ModelConfig):
    """Mixture-of-experts FFN (mixtral/qwen2moe/qwen3moe; reference MoE runs
    via ggml's mul_mat_id). Decode batches are tiny, so experts are computed
    densely with a top-k routing mask — bandwidth-equivalent to gathering
    (all experts stream from HBM either way on TPU) and XLA-friendly.

    h: [B, T, E]; expert stacks lp["w_*_exps"]: [X, E, FF] / [X, FF, E].
    """
    X, K = cfg.expert_count, max(cfg.expert_used_count, 1)
    router = h @ lp["w_gate_inp"]                    # [B, T, X]
    if "b_gate_inp" in lp:                           # gpt-oss router bias
        router = router + lp["b_gate_inp"]
    if cfg.router_softcap > 0.0:                     # grok tanh cap
        router = cfg.router_softcap * jnp.tanh(router / cfg.router_softcap)
    if cfg.expert_gating_func == 3:
        # phimoe sparsemixer at inference (HF modeling_phimoe.sparsemixer
        # with training=False): pick the argmax of the remaining scores;
        # its weight is the masked softmax of the ORIGINAL scores
        # (experts whose relative gap to the current max exceeds
        # 2*jitter_eps are dropped) gathered at that argmax. Two rounds,
        # the second with the first pick set to -inf. Weights are NOT
        # renormalized.
        eps = cfg.router_jitter_eps
        s = router.astype(jnp.float32)

        def pick(masked):
            thr = masked.max(-1, keepdims=True)
            idx = masked.argmax(-1)
            factor = jnp.maximum(jnp.abs(s), thr)
            gates = jnp.where(((thr - s) / factor) > (2.0 * eps),
                              -jnp.inf, masked)
            gsm = jax.nn.softmax(gates, axis=-1)
            return idx, jnp.take_along_axis(gsm, idx[..., None], -1)[..., 0]

        i1, w1 = pick(s)
        oh1 = jax.nn.one_hot(i1, X, dtype=bool)
        i2, w2 = pick(jnp.where(oh1, -jnp.inf, s))
        topi = jnp.stack([i1, i2], axis=-1)
        topv = jnp.stack([w1, w2], axis=-1)
        probs = s
        route = jnp.zeros_like(s).at[
            jnp.arange(s.shape[0])[:, None, None],
            jnp.arange(s.shape[1])[None, :, None],
            topi].add(topv)
        return _moe_mix(h, lp, cfg, probs, route)
    if cfg.expert_gating_func == 2:                  # deepseek3 sigmoid
        probs = jax.nn.sigmoid(router.astype(jnp.float32))
    else:
        probs = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
    if "exp_probs_b" in lp:
        # deepseek3 noaux_tc: selection runs on bias-corrected scores with
        # group-limited top-k (sum of each group's top-2 picks the allowed
        # groups); the mixing WEIGHTS stay the uncorrected sigmoid scores
        # (HF DeepseekV3TopkRouter; llama.cpp build_moe_ffn exp_probs_b)
        choice = probs + lp["exp_probs_b"].astype(jnp.float32)
        ng, ug = cfg.expert_group_count, cfg.expert_group_used_count
        if ng > 1 and ug < ng:
            Bb, Tt = choice.shape[:2]
            gsc = choice.reshape(Bb, Tt, ng, X // ng)
            g2 = jax.lax.top_k(gsc, min(2, X // ng))[0].sum(-1)
            _, gi = jax.lax.top_k(g2, ug)                  # [B, T, ug]
            gmask = jnp.zeros_like(g2).at[
                jnp.arange(Bb)[:, None, None],
                jnp.arange(Tt)[None, :, None], gi].set(1.0)
            # HF masks non-selected groups to 0.0 (not -inf); replicated
            # for bit-parity on models with negative corrected scores
            choice = (gsc * gmask[..., None]).reshape(Bb, Tt, X)
        _, topi = jax.lax.top_k(choice, K)               # [B, T, K]
        topv = jnp.take_along_axis(probs, topi, axis=-1)
    else:
        topv, topi = jax.lax.top_k(probs, K)             # [B, T, K]
    if cfg.expert_weights_norm:
        topv = topv / (topv.sum(-1, keepdims=True) + 1e-9)
    # dense mask of routing weights [B, T, X]
    route = jnp.zeros_like(probs).at[
        jnp.arange(probs.shape[0])[:, None, None],
        jnp.arange(probs.shape[1])[None, :, None],
        topi].add(topv)
    return _moe_mix(h, lp, cfg, probs, route)


def _moe_mix(h, lp, cfg: ModelConfig, probs, route):
    """Dense route-weighted expert mix + shared expert (split from
    _moe_ffn so gating variants share it). route: [B, T, X] weights."""
    hf = h.astype(jnp.float32)
    if cfg.moe_weight_before_ffn:
        # llama4: the routing weight scales the expert INPUT (and FFN(0)=0
        # keeps unrouted experts exactly zero in the dense formulation)
        hx = hf[:, :, None, :] * route[..., None]     # [B, T, X, E]
        gate = jnp.einsum("btxe,xef->btxf", hx,
                          lp["w_gate_exps"].astype(jnp.float32))
        up = jnp.einsum("btxe,xef->btxf", hx,
                        lp["w_up_exps"].astype(jnp.float32))
        act = jax.nn.silu(gate) * up
        out = jnp.einsum("btxf,xfe->btxe", act,
                         lp["w_down_exps"].astype(jnp.float32))
        y = out.sum(axis=2)
    else:
        gate = jnp.einsum("bte,xef->btxf", hf,
                          lp["w_gate_exps"].astype(jnp.float32))
        up = jnp.einsum("bte,xef->btxf", hf,
                        lp["w_up_exps"].astype(jnp.float32))
        if "b_gate_exps" in lp:   # gpt-oss per-expert projection biases
            gate = gate + lp["b_gate_exps"].astype(jnp.float32)[None, None]
            up = up + lp["b_up_exps"].astype(jnp.float32)[None, None]
        if cfg.act_fn == "swiglu_oai":
            # gpt-oss clamped swiglu: gate clamps above, up symmetric;
            # out = (up + 1) * gate * sigmoid(alpha * gate)
            # (alpha/limit are fixed model constants, not GGUF hparams)
            gate = jnp.minimum(gate, _SWIGLU_OAI_LIMIT)
            up = jnp.clip(up, -_SWIGLU_OAI_LIMIT, _SWIGLU_OAI_LIMIT)
            act = (up + 1.0) * gate * jax.nn.sigmoid(
                gate * _SWIGLU_OAI_ALPHA)             # [B, T, X, F]
        else:
            act = _act(gate, cfg) * up                # [B, T, X, F]
        out = jnp.einsum("btxf,xfe->btxe", act,
                         lp["w_down_exps"].astype(jnp.float32))
        if "b_down_exps" in lp:
            # inside the route-weighted sum: weights renormalize to 1 so
            # this matches HF's per-expert (out_k + bias) weighting
            out = out + lp["b_down_exps"].astype(jnp.float32)[None, None]
        y = (out * route[..., None]).sum(axis=2)      # [B, T, E]
    if cfg.expert_weights_scale != 1.0:
        y = y * cfg.expert_weights_scale

    if "w_gate_shexp" in lp:  # always-on shared expert (qwen2moe)
        sg = jax.nn.silu((hf @ lp["w_gate_shexp"].astype(jnp.float32)))
        su = hf @ lp["w_up_shexp"].astype(jnp.float32)
        sy = (sg * su) @ lp["w_down_shexp"].astype(jnp.float32)
        if "w_gate_inp_shexp" in lp:
            sy = sy * jax.nn.sigmoid(
                hf @ lp["w_gate_inp_shexp"].astype(jnp.float32))
        y = y + sy
    if "b_down" in lp:    # jetmoe: learned bias after the weighted sum
        y = y + lp["b_down"].astype(jnp.float32)
    return y


def _flash_on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False


def _flash_ok() -> bool:
    import os
    return not os.environ.get("LLAMA_BOX_TPU_NO_FLASH")


def _flash_forced() -> bool:
    """Run the flash kernel in interpret mode off-TPU (tests)."""
    import os
    return bool(os.environ.get("LLAMA_BOX_TPU_FORCE_FLASH"))


def flash_decode_active(cfg: "ModelConfig", capacity: int) -> bool:
    """True when the chained decode will route through ops/flash_decode
    (mirror of _attn_deferred's chain gate). The engine checks this to
    skip attn_len bucketing: the kernel's index maps already clamp cache
    traffic to the live region per slot, so ranged-attention slicing
    (and its per-bucket program variants) would only add copies.

    DEFAULT OFF on-chip (LLAMA_BOX_TPU_FLASH_DECODE=1 opts in): measured
    2026-08-19 at the TinyLlama b=4 w8a8 bench, the kernel runs ~115us
    per layer-step vs ~6us for the masked einsum — the per-(head, block)
    streaming-softmax VPU chains serialize where XLA's einsum fusion
    vectorizes across heads and batch, and single-query decode has no
    q-row axis to amortize them over (the batched PREFILL kernel, 256
    q rows, is where the same structure wins). The ~650us/dispatch of
    einsum boundary relayout+slice copies it eliminates don't pay for
    ~2400us/step of kernel overhead. Kept exact + tested for retuning
    (head-concatenated score layout is the known next step)."""
    import os
    if not (os.environ.get("LLAMA_BOX_TPU_FLASH_DECODE")
            or _flash_forced()):
        return False
    return (_flash_ok() and cfg.alibi_max_bias == 0.0
            and (capacity % 128 == 0 or capacity & (capacity - 1) == 0)
            and (_flash_on_tpu() or _flash_forced()))


# -- fused w8a8 decode-layer dispatch (ops/fused_decode) ----------------------


def _layer_unroll() -> int:
    """Unroll factor for the decode-chain layer scan
    (LLAMA_BOX_TPU_LAYER_UNROLL, default 1). Unrolling trades compile
    time for removing the per-iteration parameter dynamic-slice ops
    (~2.5us/layer profiled) and letting XLA fuse across layer
    boundaries."""
    import os
    return int(os.environ.get("LLAMA_BOX_TPU_LAYER_UNROLL", 1))


def _fused_on() -> bool:
    """Opt-in only: on-chip A/B (2026-08-18) measured the fused
    decode-layer kernels at 1435 tok/s vs 1936 for the XLA path on the
    TinyLlama b=4 w8a8 bench — Mosaic's phased weight streaming loses
    more than the ~15us/layer VPU tail it recovers. Kept (exact, tested)
    for retuning; enable with LLAMA_BOX_TPU_FORCE_FUSED=1."""
    import os
    if os.environ.get("LLAMA_BOX_TPU_NO_FUSED"):
        return False
    return bool(os.environ.get("LLAMA_BOX_TPU_FORCE_FUSED"))


def _w8(w) -> bool:
    from ..ops.qmatmul import QTensor
    return isinstance(w, QTensor) and w.w8a8 and not w.sharded


def _pad8(a):
    r = a.shape[0]
    pad = (-r) % 8
    return (jnp.pad(a, ((0, pad), (0, 0))) if pad else a), r


def _fuse_qkv_ok(cfg: ModelConfig, lp, lora_scales, x) -> bool:
    from ..ops.fused_decode import _MAX_ROWS, _pick_tile
    R = x.shape[0] * x.shape[1]
    return (_fused_on() and R <= _MAX_ROWS and x.dtype == jnp.bfloat16
            and cfg.norm_style == "rms" and lora_scales is None
            and "attn_norm" in lp and "attn_norm_b" not in lp
            and "bq" not in lp and _w8(lp.get("wqkv"))
            and _pick_tile(lp["wqkv"].out_dim) != 0)


def _fuse_tail_ok(cfg: ModelConfig, lp, lora_scales, x) -> bool:
    from ..ops.fused_decode import _MAX_ROWS, _pick_tile
    R = x.shape[0] * x.shape[1]
    return (_fused_on() and R <= _MAX_ROWS and x.dtype == jnp.bfloat16
            and cfg.norm_style == "rms" and lora_scales is None
            and not cfg.parallel_residual and cfg.ffn_gated
            and cfg.act_fn in ("silu", "gelu", "relu2")
            and _w8(lp.get("wo")) and _w8(lp.get("w_gateup"))
            and _w8(lp.get("w_down"))
            and "ffn_norm" in lp and "ffn_norm_b" not in lp
            and "bo" not in lp and "b_down" not in lp
            and "b_gate" not in lp and "b_up" not in lp
            and "attn_post_norm" not in lp and "ffn_post_norm" not in lp
            and "w_gate_inp" not in lp and "wq_gate" not in lp
            and "attn_sub_norm" not in lp and "ffn_sub_norm" not in lp
            and _pick_tile(x.shape[-1], (256, 128)) != 0
            and _pick_tile(lp["w_down"].in_dim, (512, 256, 128)) != 0)


def _apply_smalls(lp, cfg: ModelConfig):
    """Rebuild a scanned layer dict from the single aligned-segment
    bundle loader._bundle_smalls built: flatten the sliced
    [W//128, 128] layer bundle back to [W] (a layout-preserving bitcast
    — the scan's layer slice was a clean whole-tile read) and extract
    each segment as a static slice at its 1024-aligned offset (a
    tile-aligned view of the T(1024) vector). The original scale/norm
    leaves this overwrites are dead and DCE'd out of the scan. Values
    are byte-identical — outputs don't change."""
    if "smalls_all" not in lp:
        return lp
    from ..ops.qmatmul import QTensor
    from .loader import SMALLS_KEYS
    lp = dict(lp)
    sa = lp.pop("smalls_all").reshape(-1)
    off = 0
    for key in SMALLS_KEYS:
        w = lp[key]
        n = w.out_dim
        lp[key] = QTensor(w.qs, jax.lax.slice_in_dim(sa, off, off + n),
                          None, w.in_dim, w.group, w.packed4, w.w8a8)
        off += n + (-n) % 1024
    E = lp["attn_norm"].shape[-1]
    for key in ("attn_norm", "ffn_norm"):
        lp[key] = jax.lax.slice_in_dim(sa, off, off + E)
        off += E + (-E) % 1024
    return lp


def _run_stack(params, cfg: ModelConfig, x, positions, kv_k, kv_v, mask,
               cos, sin, kv_ks=None, kv_vs=None,
               mrope_pos=None, deferred_kv=False,
               emit_rows=False, flash_meta=None, chain=None):
    """Scan the layer stack; returns (hidden, k_new, v_new, ks_new, vs_new).
    chain: per-layer decode-chain row accumulators
    (ck [L,B,Kc,Hkv,D], cv, cks|None, cvs|None, nc) — see _attn_deferred."""
    if "altup_proj" in params:
        # gemma3n: altup-stream stack with its own (unrolled) layer loop;
        # same signature/return contract so every caller works unchanged
        from .gemma3n import g3n_run_stack
        return g3n_run_stack(params, cfg, x, positions, kv_k, kv_v, mask,
                             cos, sin, kv_ks=kv_ks, kv_vs=kv_vs,
                             deferred_kv=deferred_kv, emit_rows=emit_rows,
                             flash_meta=flash_meta, chain=chain)
    quant = kv_ks is not None
    lora_scales = params.get("lora_scales")
    is_local = _layer_is_local(cfg)
    cvec = params.get("cvec")   # [L, E] control-vector deltas (optional)
    nc = chain[4] if chain is not None else None
    # hoist the rope table gather out of the layer scan (single-table
    # models without M-RoPE or dual bases; gemma keeps per-layer select)
    rope_pre = False
    if cos is not None and cos.ndim == 2 and mrope_pos is None \
            and not cfg.mrope_sections and cfg.nope_layer_step == 0:
        cos = jnp.take(cos, positions, axis=0, mode="clip")
        sin = jnp.take(sin, positions, axis=0, mode="clip")
        rope_pre = True

    # chained decode through ops/flash_decode: the kernel receives the
    # FULL layer-stacked cache (closure, not scan xs) plus the layer
    # index — its BlockSpec index maps do the layer slicing. Feeding a
    # lax.scan-sliced per-layer cache to a pallas operand materializes
    # the slice as a real buffer (~4 MB x 2 per layer-step at the bench
    # shape, measured 2.6x slower than the einsum path).
    fullkv = (chain is not None and deferred_kv
              and flash_decode_active(cfg, kv_k.shape[2]))

    # merged-chain einsum path: the chain-block masks depend only on
    # positions/nc — build them ONCE per step instead of per layer
    # (gates mirror _attn_deferred's merged-variant conditions)
    chain_pre = None
    if (chain is not None and deferred_kv and not fullkv
            and x.shape[1] == 1 and cfg.alibi_max_bias == 0.0
            and cfg.swa_window == 0 and cfg.chunked_window == 0
            and mask.ndim == 3):
        nc_t = chain[4]
        Kc = chain[0].shape[2]
        kpos = jnp.arange(kv_k.shape[2])[None, None, :]
        mask_c = mask & (kpos < positions[:, :1, None] - nc_t)
        ci = jnp.arange(Kc)[None, None, :]
        kpos3 = positions[:, :, None] - (nc_t - ci)
        m3 = (ci <= nc_t) & (kpos3 >= 0)
        chain_pre = (mask_c, m3)

    def body(x, layer):
        if cvec is not None:
            *layer, cv = layer
        lchain = None
        li_x = None
        if chain is not None:
            pre = (chain_pre,) if chain_pre is not None else ()
            if quant:
                *layer, ck_l, cv_l, cks_l, cvs_l = layer
                lchain = (ck_l, cv_l, cks_l, cvs_l, nc) + pre
            else:
                *layer, ck_l, cv_l = layer
                lchain = (ck_l, cv_l, None, None, nc) + pre
        if fullkv:
            lp, loc, li_x = layer
            k_c, v_c, ks, vs = kv_k, kv_v, kv_ks, kv_vs
        elif quant:
            lp, k_c, v_c, ks, vs, loc = layer
        else:
            lp, k_c, v_c, loc = layer
            ks = vs = None
        lp = _apply_smalls(lp, cfg)
        if deferred_kv:
            x, rows = _attn_layer(x, lp, positions, k_c, v_c, mask,
                                  cfg, cos, sin, ks, vs,
                                  lora_scales=lora_scales, is_local=loc,
                                  mrope_pos=mrope_pos, deferred_kv=True,
                                  flash_meta=flash_meta, chain=lchain,
                                  rope_pre=rope_pre, layer_idx=li_x)
            if cvec is not None:
                x = x + cv.astype(x.dtype)
            return x, rows
        x, k_c, v_c, ks, vs = _attn_layer(x, lp, positions, k_c, v_c, mask,
                                          cfg, cos, sin, ks, vs,
                                          lora_scales=lora_scales,
                                          is_local=loc, mrope_pos=mrope_pos)
        if cvec is not None:
            # control vector: steer the residual stream at this layer's
            # output (reference llama_apply_adapter_cvec semantics)
            x = x + cv.astype(x.dtype)
        return x, ((k_c, v_c, ks, vs) if quant else (k_c, v_c))

    def scatter_rows(rows):
        """One fused write of every layer's new K/V rows into the cache
        (rows pytree leaves are [L, B, T, ...]; position >= C drops)."""
        L = kv_k.shape[0]
        B, T = positions.shape
        li = jnp.arange(L)[:, None, None]
        bi = jnp.arange(B)[None, :, None]
        pi = jnp.broadcast_to(positions[None], (L, B, T))
        if quant:
            kq, vq, ksr, vsr = rows
            return (kv_k.at[li, bi, pi].set(kq, mode="drop"),
                    kv_v.at[li, bi, pi].set(vq, mode="drop"),
                    kv_ks.at[li, bi, pi].set(ksr, mode="drop"),
                    kv_vs.at[li, bi, pi].set(vsr, mode="drop"))
        kr, vr = rows
        return (kv_k.at[li, bi, pi].set(kr, mode="drop"),
                kv_v.at[li, bi, pi].set(vr, mode="drop"), None, None)

    def with_cv(xs, sl=None):
        if cvec is None:
            return xs
        return (*xs, cvec if sl is None else cvec[sl])

    if "layer_groups" in params and deferred_kv:
        assert chain is None, "decode chaining not supported with " \
            "heterogeneous layer groups"
        off = 0
        parts = []
        for gp in params["layer_groups"]:
            n = next(iter(gp.values())).shape[0] if not hasattr(
                next(iter(gp.values())), "qs") else \
                next(iter(gp.values())).qs.shape[0]
            sl = slice(off, off + n)
            xs = ((gp, kv_k[sl], kv_v[sl], kv_ks[sl], kv_vs[sl],
                   is_local[sl]) if quant
                  else (gp, kv_k[sl], kv_v[sl], is_local[sl]))
            x, rows = jax.lax.scan(body, x, with_cv(xs, sl))
            parts.append(rows)
            off += n
        rows = jax.tree.map(lambda *rs: jnp.concatenate(rs, 0), *parts)
        if emit_rows:
            return x, rows
        k_new, v_new, ks_new, vs_new = scatter_rows(rows)
        return x, k_new, v_new, ks_new, vs_new

    if "layer_groups" in params:
        # heterogeneous layers (deepseek2 dense+MoE): scan per group over
        # static layer-offset slices of the KV stack
        off = 0
        k_parts, v_parts, ks_parts, vs_parts = [], [], [], []
        for gp in params["layer_groups"]:
            n = next(iter(gp.values())).shape[0] if not hasattr(
                next(iter(gp.values())), "qs") else                 next(iter(gp.values())).qs.shape[0]
            sl = slice(off, off + n)
            if quant:
                x, (k_n, v_n, ks_n, vs_n) = jax.lax.scan(
                    body, x, with_cv((gp, kv_k[sl], kv_v[sl], kv_ks[sl],
                                      kv_vs[sl], is_local[sl]), sl))
                ks_parts.append(ks_n)
                vs_parts.append(vs_n)
            else:
                x, (k_n, v_n) = jax.lax.scan(
                    body, x, with_cv((gp, kv_k[sl], kv_v[sl], is_local[sl]),
                                     sl))
            k_parts.append(k_n)
            v_parts.append(v_n)
            off += n
        k_new = jnp.concatenate(k_parts, axis=0)
        v_new = jnp.concatenate(v_parts, axis=0)
        if quant:
            return (x, k_new, v_new, jnp.concatenate(ks_parts, 0),
                    jnp.concatenate(vs_parts, 0))
        return x, k_new, v_new, None, None

    if deferred_kv:
        if fullkv:
            L = kv_k.shape[0]
            xs = (params["layers"], is_local,
                  jnp.arange(L, dtype=jnp.int32))
        elif quant:
            xs = (params["layers"], kv_k, kv_v, kv_ks, kv_vs, is_local)
        else:
            xs = (params["layers"], kv_k, kv_v, is_local)
        if chain is not None:
            xs = xs + ((chain[0], chain[1], chain[2], chain[3]) if quant
                       else (chain[0], chain[1]))
        x, rows = jax.lax.scan(body, x, with_cv(xs),
                               unroll=_layer_unroll() if chain is not None
                               else 1)
        if emit_rows:
            return x, rows
        k_new, v_new, ks_new, vs_new = scatter_rows(rows)
        return x, k_new, v_new, ks_new, vs_new
    if quant:
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
            body, x, with_cv((params["layers"], kv_k, kv_v, kv_ks, kv_vs,
                              is_local)))
        return x, k_new, v_new, ks_new, vs_new
    x, (k_new, v_new) = jax.lax.scan(
        body, x, with_cv((params["layers"], kv_k, kv_v, is_local)))
    return x, k_new, v_new, None, None


def _output_logits(params, cfg: ModelConfig, x):
    out_w = params.get("output")
    from ..ops.fused_decode import _MAX_ROWS, _pick_tile
    lead = x.shape[:-1]
    R = 1
    for _d in lead:
        R *= _d
    if (_fused_on() and _w8(out_w) and R <= _MAX_ROWS
            and x.dtype == jnp.bfloat16 and cfg.norm_style == "rms"
            and "output_norm_b" not in params
            and params.get("output_b") is None
            and _pick_tile(out_w.out_dim) != 0):
        from ..ops.fused_decode import fused_norm_qmm
        xr, r = _pad8(x.reshape(R, x.shape[-1]))
        logits = fused_norm_qmm(xr, params["output_norm"], out_w.qs,
                                out_w.scales, eps=cfg.rms_eps,
                                interpret=not _flash_on_tpu())
        logits = logits[:r].reshape(*lead, out_w.out_dim)
        if cfg.logit_scale != 1.0:
            logits = logits * cfg.logit_scale
        if cfg.logit_softcap > 0.0:
            logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
        return logits.astype(jnp.float32)
    x = _norm_any(x, params["output_norm"], params.get("output_norm_b"),
                  cfg)
    if out_w is None:  # tied word embeddings
        logits = x @ params["tok_embd"].T.astype(x.dtype)
    else:
        logits = mm(x, out_w)
    if params.get("output_b") is not None:
        logits = logits + params["output_b"]
    if cfg.logit_scale != 1.0:   # command-r / granite
        logits = logits * cfg.logit_scale
    if cfg.logit_softcap > 0.0:
        logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
    return logits.astype(jnp.float32)


def _causal_mask(positions, seq_lens, T, C, swa_window):
    """[B,T,C]: attend cache index c iff c <= q position and query is valid."""
    qvalid = (jnp.arange(T)[None, :] < seq_lens[:, None])  # [B,T]
    kpos = jnp.arange(C)[None, None, :]
    mask = (kpos <= positions[:, :, None]) & qvalid[:, :, None]
    if swa_window > 0:
        mask = mask & (kpos > positions[:, :, None] - swa_window)
    return mask


def _build_mask(cfg: ModelConfig, positions, seq_lens, T, C):
    """Per-arch mask: plain [B,T,C], or stacked [2,B,T,C] (global, local)
    when SWA alternates across layers (gemma2/3) or attention is chunked
    (llama4: local layers attend within aligned chunked_window blocks)."""
    if cfg.chunked_window > 0:
        mg = _causal_mask(positions, seq_lens, T, C, 0)
        cw = cfg.chunked_window
        kchunk = jnp.arange(C)[None, None, :] // cw
        qchunk = positions[:, :, None] // cw
        return jnp.stack([mg, mg & (kchunk == qchunk)])
    if cfg.swa_window > 0 and cfg.swa_pattern > 0:
        mg = _causal_mask(positions, seq_lens, T, C, 0)
        ml = _causal_mask(positions, seq_lens, T, C, cfg.swa_window)
        return jnp.stack([mg, ml])
    return _causal_mask(positions, seq_lens, T, C, cfg.swa_window)


def _add_pos_embd(params, x, positions):
    """Learned absolute position embeddings (gpt2 wpe; reference
    llm_build: inpL = tok_embd + pos_embd). Sentinel positions clip to
    the last row — those rows are masked/dropped downstream."""
    pe = params.get("pos_embd")
    if pe is None:
        return x
    return x + jnp.take(pe, positions, axis=0, mode="clip").astype(x.dtype)


def _embed_tokens(params, cfg: ModelConfig, tokens):
    x = jnp.take(params["tok_embd"], tokens, axis=0, mode="clip")
    if cfg.embd_scale != 1.0:
        x = x * jnp.asarray(cfg.embd_scale, x.dtype)
    if "tok_embd_norm" in params:   # bloom embedding LayerNorm
        x = _norm_any(x, params["tok_embd_norm"],
                      params.get("tok_embd_norm_b"), cfg)
    if "per_layer_token_embd" in params:
        # gemma3n: per-layer token embeddings ride CONCATENATED onto the
        # embedding channels so the [*, E] plumbing to _run_stack carries
        # them (split + consumed in gemma3n.g3n_run_stack); ids beyond the
        # per-layer vocab (vision/audio tokens) embed as zeros (HF pads)
        tbl = params["per_layer_token_embd"]
        pe = jnp.take(tbl, tokens, axis=0, mode="clip")
        pe = jnp.where((tokens < tbl.shape[0])[..., None], pe, 0.0)
        P = params["per_layer_proj_norm"].shape[-1]
        pe = pe * jnp.asarray(float(P) ** 0.5, pe.dtype)
        x = jnp.concatenate([x, pe.astype(x.dtype)], axis=-1)
    return x


def forward_impl(params, cfg: ModelConfig, tokens, positions, kv: KVCache,
                 seq_lens, rope_cos, rope_sin, mrope_pos=None):
    """One forward step (prefill chunk or batched decode).

    tokens:    [B, T] int32
    positions: [B, T] int32 absolute positions (also the KV write indices;
               position >= C marks padding/inactive rows)
    kv:        KVCache [L, B, C, ...]
    seq_lens:  [B] int32 — valid tokens in this step (<=T)
    returns (logits [B, T, V] f32, new KVCache)
    """
    B, T = tokens.shape
    C = kv.capacity
    x = _add_pos_embd(params, _embed_tokens(params, cfg, tokens),
                      positions)
    mask = _build_mask(cfg, positions, seq_lens, T, C)
    x, k_new, v_new, ks, vs = _run_stack(
        params, cfg, x, positions, kv.k, kv.v, mask, rope_cos, rope_sin,
        kv.k_scale, kv.v_scale, mrope_pos=mrope_pos, deferred_kv=True)
    return _output_logits(params, cfg, x), KVCache(k=k_new, v=v_new,
                                                   k_scale=ks, v_scale=vs)


forward = partial(jax.jit, static_argnames=("cfg",),
                  donate_argnames=("kv",))(forward_impl)


def forward_rows_impl(params, cfg: ModelConfig, tokens, positions,
                      kv: KVCache, seq_lens, rope_cos, rope_sin,
                      mrope_pos=None, chain=None):
    """Decode forward WITHOUT cache writes: returns (logits, rows).
    Pairs with apply_rows — splitting the step into two dispatches lets
    the scatter run on a donated buffer whose ONLY use is the scatter,
    which XLA updates in place (the fused single-program scatter copies
    the whole cache because the layer scan also reads it)."""
    B, T = tokens.shape
    C = kv.capacity
    x = _add_pos_embd(params, _embed_tokens(params, cfg, tokens),
                      positions)
    mask = _build_mask(cfg, positions, seq_lens, T, C)
    x, rows = _run_stack(
        params, cfg, x, positions, kv.k, kv.v, mask, rope_cos, rope_sin,
        kv.k_scale, kv.v_scale, mrope_pos=mrope_pos, deferred_kv=True,
        emit_rows=True, chain=chain)
    return _output_logits(params, cfg, x), rows


forward_rows = partial(jax.jit, static_argnames=("cfg",))(forward_rows_impl)


def apply_rows_impl(kv: KVCache, rows, positions) -> KVCache:
    """Scatter per-layer K/V rows (from forward_rows) into the cache.
    kv is donated and only used by the scatters -> in-place update."""
    L = kv.k.shape[0]
    B, T = positions.shape
    li = jnp.arange(L)[:, None, None]
    bi = jnp.arange(B)[None, :, None]
    pi = jnp.broadcast_to(positions[None], (L, B, T))
    if kv.quantized:
        kq, vq, ksr, vsr = rows
        return KVCache(
            k=kv.k.at[li, bi, pi].set(kq, mode="drop"),
            v=kv.v.at[li, bi, pi].set(vq, mode="drop"),
            k_scale=kv.k_scale.at[li, bi, pi].set(ksr, mode="drop"),
            v_scale=kv.v_scale.at[li, bi, pi].set(vsr, mode="drop"))
    kr, vr = rows
    return KVCache(k=kv.k.at[li, bi, pi].set(kr, mode="drop"),
                   v=kv.v.at[li, bi, pi].set(vr, mode="drop"))


apply_rows = partial(jax.jit, donate_argnames=("kv",))(apply_rows_impl)


def _prefill_core(params, cfg: ModelConfig, x, kv: KVCache, slot,
                  pos_base, n_valid, rope_cos, rope_sin, mrope_pos=None,
                  bidir_span=None, attn_len: int = 0):
    """Shared prefill body: run a [1, T, E] chunk into one slot's KV slice.

    Deferred-KV design: the slot's cache slice stays READ-ONLY through the
    layer scan (attention = flash kernel over cache blocks + the chunk's
    own rows) and the new rows land in ONE contiguous write afterwards.
    mrope_pos: optional [3, T] grid position streams (qwen2-vl).
    bidir_span: optional (start, end) absolute positions — queries may
    attend cache entries in [start, end) regardless of causality (gemma3
    non-causal vision window; spans split across ubatches stay causal
    toward unwritten keys because end caps at the written extent)."""
    if params.get("lora_scales") is not None:
        params = dict(params)
        params["lora_scales"] = jax.lax.dynamic_slice_in_dim(
            params["lora_scales"], slot, 1, axis=0)
    T = x.shape[1]
    C = kv.capacity
    # ranged attention: the cache holds nothing at/after pos_base (the
    # chunk's own rows ride the flash kernel's rows operand), so reading
    # only [0, attn_len) is exact; the engine buckets attn_len from the
    # chunk start (256 multiples -> few program variants)
    AL = min(attn_len or C, C)

    def slot_view(cache):
        v = jax.lax.dynamic_slice_in_dim(cache, slot, 1, axis=1)
        return v if AL == C else jax.lax.slice_in_dim(v, 0, AL, axis=2)
    k_slot = slot_view(kv.k)
    v_slot = slot_view(kv.v)
    ks_slot = vs_slot = None
    if kv.quantized:
        ks_slot = slot_view(kv.k_scale)
        vs_slot = slot_view(kv.v_scale)

    offs = jnp.arange(T, dtype=jnp.int32)
    positions = jnp.where(offs < n_valid, pos_base + offs, C)[None, :]
    x = _add_pos_embd(params, x, positions)
    seq_lens = jnp.full((1,), n_valid, jnp.int32)

    mask = _build_mask(cfg, positions, seq_lens, T, AL)
    st = en = jnp.int32(0)
    if bidir_span is not None:
        st, en = bidir_span
        kpos = jnp.arange(AL)[None, None, :]
        qvalid = (offs < n_valid)[None, :, None]
        extra = (kpos >= st) & (kpos < en) & qvalid
        mask = mask | (extra[None] if mask.ndim == 4 else extra)
    meta = jnp.stack([pos_base, n_valid, jnp.asarray(st, jnp.int32),
                      jnp.asarray(en, jnp.int32)])[None, :]       # [1, 4]
    mp = mrope_pos[:, None, :] if mrope_pos is not None else None  # [3,1,T]
    x, rows = _run_stack(
        params, cfg, x, positions, k_slot, v_slot, mask, rope_cos, rope_sin,
        ks_slot, vs_slot, mrope_pos=mp, deferred_kv=True, emit_rows=True,
        flash_meta=meta)
    last = jnp.maximum(n_valid - 1, 0)
    logits = _output_logits(params, cfg,
                            jax.lax.dynamic_slice_in_dim(x[0], last, 1, 0))[0]
    return logits, _write_slot_rows(kv, rows, slot, positions, pos_base)


def _write_slot_rows(kv: KVCache, rows, slot, positions, pos_base):
    """Write one slot's per-layer prefill rows ([L, 1, T, ...]) into the
    cache. Contiguous chunks use one dynamic_update_slice (a straight
    DMA); a chunk whose BUCKET would spill past capacity falls back to a
    position scatter (dynamic_update_slice clamps its start, which would
    corrupt earlier entries; the position>=C sentinel drops pad rows).
    Pad rows written by the contiguous path land at positions the mask
    never exposes until they are overwritten by later chunks."""
    L = kv.k.shape[0]
    T = positions.shape[1]
    C = kv.capacity
    leaves = (rows if kv.quantized
              else (*rows, None, None))  # kq, vq, ks, vs

    def contig(kv_k, kv_v, kv_ks, kv_vs):
        def upd(cache, val):
            if cache is None:
                return None
            zeros = (0,) * (cache.ndim - 3)
            return jax.lax.dynamic_update_slice(
                cache, val.astype(cache.dtype),
                (0, slot, pos_base) + zeros)
        kq, vq, ksr, vsr = leaves
        return (upd(kv_k, kq), upd(kv_v, vq),
                upd(kv_ks, ksr) if kv_ks is not None else kv_ks,
                upd(kv_vs, vsr) if kv_vs is not None else kv_vs)

    def scatter(kv_k, kv_v, kv_ks, kv_vs):
        li = jnp.arange(L)[:, None]
        pi = jnp.broadcast_to(positions[0][None, :], (L, T))

        def upd(cache, val):
            if cache is None:
                return None
            return cache.at[li, slot, pi].set(
                val[:, 0].astype(cache.dtype), mode="drop")
        kq, vq, ksr, vsr = leaves
        return (upd(kv_k, kq), upd(kv_v, vq),
                upd(kv_ks, ksr) if kv_ks is not None else kv_ks,
                upd(kv_vs, vsr) if kv_vs is not None else kv_vs)

    safe = (pos_base + T) <= C
    if kv.quantized:
        k_n, v_n, ks_n, vs_n = jax.lax.cond(
            safe, contig, scatter, kv.k, kv.v, kv.k_scale, kv.v_scale)
        return KVCache(k=k_n, v=v_n, k_scale=ks_n, v_scale=vs_n)
    k_n, v_n, _, _ = jax.lax.cond(
        safe, lambda a, b: contig(a, b, None, None),
        lambda a, b: scatter(a, b, None, None), kv.k, kv.v)
    return KVCache(k=k_n, v=v_n)


def prefill_impl(params, cfg: ModelConfig, tokens, kv: KVCache, slot,
                 pos_base, n_valid, rope_cos, rope_sin, mrope_pos=None,
                 attn_len: int = 0):
    """Prefill one bucketed prompt chunk into a single slot's KV slice.

    tokens: [T] int32 chunk (padded to a bucket size)
    slot:   scalar int32 slot index
    pos_base: scalar int32 absolute position of tokens[0]
    n_valid: scalar int32 valid tokens in the chunk
    returns (logits of the last valid token [V] f32, new KVCache)
    """
    x = _embed_tokens(params, cfg, tokens[None, :])
    return _prefill_core(params, cfg, x, kv, slot, pos_base, n_valid,
                         rope_cos, rope_sin, mrope_pos, attn_len=attn_len)


prefill = partial(jax.jit, static_argnames=("cfg", "attn_len"),
                  donate_argnames=("kv",))(prefill_impl)


def prefill_embed_impl(params, cfg: ModelConfig, embeds, kv: KVCache, slot,
                       pos_base, n_valid, rope_cos, rope_sin,
                       mrope_pos=None, bidir_span=None, attn_len: int = 0):
    """Prefill a chunk of PRE-COMPUTED embeddings (vision/audio tokens from
    the multimodal projector; reference multimodal prefill §2.1 #11).
    bidir_span: (start, end) scalars — non-causal window over the image''s
    own cache positions (gemma3)."""
    x = embeds[None, :, :].astype(params["tok_embd"].dtype)
    return _prefill_core(params, cfg, x, kv, slot, pos_base, n_valid,
                         rope_cos, rope_sin, mrope_pos,
                         bidir_span=bidir_span, attn_len=attn_len)


prefill_embed = partial(jax.jit, static_argnames=("cfg", "attn_len"),
                        donate_argnames=("kv",))(prefill_embed_impl)


def prefill_batch_impl(params, cfg: ModelConfig, tokens, pos_base, n_valid,
                       kv: KVCache, rope_cos, rope_sin,
                       attn_len: int = 0, contig_write: bool = False):
    """Batched prefill: one chunk per SLOT in a single fused program (the
    reference packs multiple prefilling tasks into one llama_decode).

    tokens:   [S, T] int32 — row s is slot s's next chunk (padded)
    pos_base: [S] int32 absolute position of row starts
    n_valid:  [S] int32 valid tokens per row (0 = slot not prefilling)
    Returns (last-token logits [S, V] f32, new KVCache).
    """
    S, T = tokens.shape
    C = kv.capacity
    AL = min(attn_len or C, C)
    offs = jnp.arange(T, dtype=jnp.int32)[None, :]
    positions = jnp.where(offs < n_valid[:, None],
                          pos_base[:, None] + offs, C)
    x = _add_pos_embd(params, _embed_tokens(params, cfg, tokens),
                      positions)
    mask = _build_mask(cfg, positions, n_valid, T, AL)
    zero = jnp.zeros((S,), jnp.int32)
    meta = jnp.stack([pos_base, n_valid, zero, zero], axis=1)  # [S, 4]

    def view(cache):
        return (cache if cache is None or AL == C
                else jax.lax.slice_in_dim(cache, 0, AL, axis=2))
    x, rows = _run_stack(
        params, cfg, x, positions, view(kv.k), view(kv.v), mask, rope_cos,
        rope_sin, view(kv.k_scale), view(kv.v_scale), deferred_kv=True,
        emit_rows=True, flash_meta=meta)
    L = kv.k.shape[0]
    if contig_write:
        # per-slot contiguous window writes (the decode chain's write
        # pattern): the gather-scatter alternative streams the WHOLE
        # cache through a read+write per leaf — profiled 3.2 ms per k/v
        # leaf (18% of the batched 4x512 prefill) at the serving shape.
        # Caller guarantees max(pos_base) + T <= C; rows past n_valid
        # (and non-prefilling slots, n_valid == 0) keep their current
        # contents via the row mask.
        cols = jnp.arange(T, dtype=jnp.int32)

        def write_slot(leaf, rows_leaf, s):
            start = jnp.clip(pos_base[s], 0, C - T)
            idx = (jnp.int32(0), jnp.int32(s), start) \
                + (jnp.int32(0),) * (leaf.ndim - 3)
            cur = jax.lax.dynamic_slice(
                leaf, idx, (L, 1, T) + leaf.shape[3:])
            upd = jax.lax.dynamic_slice_in_dim(rows_leaf, s, 1, axis=1)
            ok = (cols < n_valid[s]).reshape(
                (1, 1, T) + (1,) * (leaf.ndim - 3))
            new = jnp.where(ok, upd.astype(leaf.dtype), cur)
            return jax.lax.dynamic_update_slice(leaf, new, idx)

        leaves = [kv.k, kv.v]
        rows_l = list(rows[:2])
        if kv.quantized:
            leaves += [kv.k_scale, kv.v_scale]
            rows_l += [rows[2], rows[3]]
        for s in range(S):
            leaves = [write_slot(lf, rl, s)
                      for lf, rl in zip(leaves, rows_l)]
        kv = (KVCache(k=leaves[0], v=leaves[1], k_scale=leaves[2],
                      v_scale=leaves[3]) if kv.quantized
              else KVCache(k=leaves[0], v=leaves[1]))
    else:
        li = jnp.arange(L)[:, None, None]
        bi = jnp.arange(S)[None, :, None]
        pi = jnp.broadcast_to(positions[None], (L, S, T))
        if kv.quantized:
            kq, vq, ksr, vsr = rows
            kv = KVCache(
                k=kv.k.at[li, bi, pi].set(kq, mode="drop"),
                v=kv.v.at[li, bi, pi].set(vq, mode="drop"),
                k_scale=kv.k_scale.at[li, bi, pi].set(ksr, mode="drop"),
                v_scale=kv.v_scale.at[li, bi, pi].set(vsr, mode="drop"))
        else:
            kr, vr = rows
            kv = KVCache(k=kv.k.at[li, bi, pi].set(kr, mode="drop"),
                         v=kv.v.at[li, bi, pi].set(vr, mode="drop"))
    last = jnp.maximum(n_valid - 1, 0)
    x_last = jnp.take_along_axis(
        x, last[:, None, None].astype(jnp.int32).repeat(x.shape[-1], 2),
        axis=1)[:, 0]                                   # [S, E]
    logits = _output_logits(params, cfg, x_last)
    return logits, kv


prefill_batch = partial(jax.jit,
                        static_argnames=("cfg", "attn_len",
                                         "contig_write"),
                        donate_argnames=("kv",))(prefill_batch_impl)


def shift_kv_impl(kv: KVCache, slot, n_keep, n_discard, delta_cos, delta_sin,
                  rope_mode: str, layer_select=None):
    """Context shift one slot: entries [n_keep+n_discard, C) move down by
    n_discard and their keys are rotated by -n_discard positions (RoPE is
    additive in position at fixed frequency). Mirrors llama_memory_seq_rm +
    seq_add (httpserver.hpp:3453-3537). layer_select ([L] int32, with
    stacked delta caches): per-layer rotation pick — gemma3 local layers
    rotate at their own base, llama4 nope layers stay unrotated."""
    C = kv.capacity
    idx = jnp.arange(C, dtype=jnp.int32)
    src = jnp.where(idx < n_keep, idx, jnp.minimum(idx + n_discard, C - 1))
    moved = idx >= n_keep

    k_slot = jax.lax.dynamic_slice_in_dim(kv.k, slot, 1, axis=1)[:, 0]
    v_slot = jax.lax.dynamic_slice_in_dim(kv.v, slot, 1, axis=1)[:, 0]
    k_g = jnp.take(k_slot, src, axis=1, mode="clip")   # [L, C, H, D]
    v_g = jnp.take(v_slot, src, axis=1, mode="clip")

    ks_new = vs_new = None
    if kv.quantized:
        ks_slot = jax.lax.dynamic_slice_in_dim(kv.k_scale, slot, 1, axis=1)[:, 0]
        vs_slot = jax.lax.dynamic_slice_in_dim(kv.v_scale, slot, 1, axis=1)[:, 0]
        ks_g = jnp.take(ks_slot, src, axis=1, mode="clip")  # [L,C,H]
        vs_new = jnp.take(vs_slot, src, axis=1, mode="clip")
        k_f = k_g.astype(jnp.float32) * ks_g.astype(jnp.float32)[..., None]
    else:
        k_f = k_g.astype(jnp.float32)

    # inverse rotation by n_discard: cos(dθ), -sin(dθ)
    d = jnp.full((C,), n_discard, jnp.int32)
    if layer_select is not None and delta_cos.ndim == 3:
        cl = jnp.take(delta_cos, layer_select, axis=0)    # [L, P, half]
        sl2 = jnp.take(delta_sin, layer_select, axis=0)
        k_rot = jax.vmap(
            lambda kf_l, c, s0: apply_rope(kf_l, d, c, -s0, rope_mode)
        )(k_f, cl, sl2)
    else:
        k_rot = apply_rope(k_f, d, delta_cos, -delta_sin, rope_mode)

    if kv.quantized:
        k_rot_f = jnp.where(moved[None, :, None, None], k_rot, k_f)
        amax = jnp.max(jnp.abs(k_rot_f), axis=-1)
        ks_new = (jnp.maximum(amax, 1e-6) / 127.0).astype(jnp.bfloat16)
        k_new = jnp.clip(jnp.round(
            k_rot_f / ks_new.astype(jnp.float32)[..., None]),
            -127, 127).astype(jnp.int8)
    else:
        k_new = jnp.where(moved[None, :, None, None],
                          k_rot.astype(k_g.dtype), k_g)
    return KVCache(
        k=jax.lax.dynamic_update_slice_in_dim(kv.k, k_new[:, None], slot, axis=1),
        v=jax.lax.dynamic_update_slice_in_dim(kv.v, v_g[:, None], slot, axis=1),
        k_scale=(jax.lax.dynamic_update_slice_in_dim(
            kv.k_scale, ks_new[:, None], slot, axis=1)
            if kv.quantized else None),
        v_scale=(jax.lax.dynamic_update_slice_in_dim(
            kv.v_scale, vs_new[:, None], slot, axis=1)
            if kv.quantized else None),
    )


shift_kv = partial(jax.jit, static_argnames=("rope_mode",),
                   donate_argnames=("kv",))(shift_kv_impl)


def copy_kv_prefix_impl(kv: KVCache, src, dst, n) -> KVCache:
    """Cross-slot shared-prefix reuse: copy KV rows [0, n) of slot `src`
    into slot `dst`. One HBM-bandwidth masked select per leaf — orders of
    magnitude cheaper than recomputing the shared prefix, which is what a
    new request with a sibling's system prompt otherwise pays.

    The reference's prompt cache is strictly per-slot (prefix reuse only
    against the SAME slot's previous tokens, httpserver.hpp:3760-3862);
    sharing across concurrently-decoding slots is a TPU-side improvement
    with identical observable semantics (greedy output matches a full
    recompute — tests/test_engine.py)."""
    def leaf(x):
        C = x.shape[2]
        m = (jnp.arange(C) < n).reshape((1, C) + (1,) * (x.ndim - 3))
        rows = jnp.where(m, x[:, src], x[:, dst])
        return x.at[:, dst].set(rows)
    return jax.tree.map(leaf, kv)


copy_kv_prefix = partial(jax.jit, donate_argnames=("kv",))(
    copy_kv_prefix_impl)


def forward_embeddings(params, cfg: ModelConfig, tokens, seq_lens,
                       rope_cos, rope_sin, pooling: str = "mean"):
    """Non-causal embedding forward (SURVEY.md §3.3): no KV cache, bidirectional
    attention over each sequence, pooled output."""
    B, T = tokens.shape
    x = jnp.take(params["tok_embd"], tokens, axis=0, mode="clip")
    positions = jnp.arange(T)[None, :].repeat(B, 0)
    x = _add_pos_embd(params, x, positions)
    valid = positions < seq_lens[:, None]  # [B,T]
    mask = valid[:, :, None] & valid[:, None, :]  # [B,T,T]
    if cfg.causal:
        mask = mask & (jnp.arange(T)[None, :, None] >= jnp.arange(T)[None, None, :])

    kv_k = jnp.zeros((cfg.n_layers, B, T, cfg.n_kv_heads, cfg.head_dim), x.dtype)
    kv_v = jnp.zeros_like(kv_k)
    x, _, _, _, _ = _run_stack(params, cfg, x, positions, kv_k, kv_v, mask,
                               rope_cos, rope_sin)
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
