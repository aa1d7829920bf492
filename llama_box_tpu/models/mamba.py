"""Mamba (selective state-space) model family — the recurrent branch of
the model zoo.

The reference serves mamba GGUFs through llama.cpp's ssm_conv/ssm_scan
graph ops (constant-memory recurrent state instead of a KV cache). This
module is the TPU-native equivalent:

- Prefill runs the selective scan as a PARALLEL prefix scan
  (`jax.lax.associative_scan`) over the token axis — the recurrence
  h_t = dA_t * h_{t-1} + dBx_t is associative, so a T-token prompt costs
  O(log T) sweeps of MXU/VPU-friendly elementwise work instead of T
  sequential steps. The depthwise causal conv is a static unrolled sum of
  shifted slices (d_conv is 4).
- Decode carries (conv_state, ssm_state) through `lax.scan` exactly like
  the attention decode chain (engine `_decode_chain`), sampling fused on
  device; K tokens per dispatch, one host sync per chain.
- Per-slot state lives in `RecCache` ([L, S, ...] leaves) — the analogue
  of KVCache with O(1) memory per slot. Inactive slots are preserved by
  feeding the scan identity elements (dA=1, dBx=0), so one fused program
  serves mixed batches with no gather/scatter.

Semantics follow the published Mamba formulation (Gu & Dao 2023, the
`state-spaces/mamba` reference implementation) and the GGUF conversion
conventions (ssm_a stores -exp(A_log); x_proj output order dt|B|C; in_proj
output order x|z). Numerics: state math in f32 (llama.cpp keeps ssm
states f32), matmuls in the model dtype, QTensor residency supported for
the four projections.

Engine integration notes (server/engine.py): recurrent slots cannot
context-shift (state is cumulative — the reference refuses too) and
prefix reuse is exact-extension-only: the state corresponds to ALL cached
tokens, so reuse ∈ {0, len(cache_tokens)}. Speculative decoding is gated
off (no cheap rollback without state checkpoints).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.norm import rms_norm
from ..ops.qmatmul import mm
from .config import ModelConfig


class RecCache(NamedTuple):
    """Per-slot recurrent state: conv tail + SSM state, layer-stacked.
    Hybrid models (jamba: interleaved attention layers) additionally
    carry a KV cache for the attention layers only (k/v [La, S, C, Hkv,
    D]); pure-recurrent models leave k/v as None."""
    conv: jnp.ndarray   # [Lr, S, d_conv-1, d_inner] f32
    ssm: jnp.ndarray    # [Lr, S, d_inner, d_state] f32
    k: jnp.ndarray | None = None
    v: jnp.ndarray | None = None

    @property
    def capacity(self) -> int:
        # positions are bookkeeping only for pure-recurrent models
        return self.k.shape[2] if self.k is not None else (1 << 30)

    @property
    def quantized(self) -> bool:
        return False


def _count_layers(params) -> tuple[int, int]:
    """(n_recurrent, n_attention) from the stacked param tree."""
    groups = params.get("layer_groups") or [params["layers"]]
    nr = na = 0
    for gp in groups:
        lead = next(iter(gp.values()))
        n = lead.qs.shape[0] if hasattr(lead, "qs") else lead.shape[0]
        rec = "ssm_in" in gp or "shortconv_in" in gp or "tm_k" in gp
        if rec:
            nr += n
        if "wq" in gp:
            # parallel-hybrid layers (falcon-h1) count in BOTH caches;
            # FFN-only blocks (nemotron-h) count in neither
            na += n
    return nr, na


def _ssm_style(gp_or_params, cfg: ModelConfig) -> bool:
    """True when the mixer is mamba2/SSD-style (per-head scalar A —
    stacked ssm_a is 2D [L, nh]; mamba1 keeps [L, di, ds])."""
    src = gp_or_params.get("layers", gp_or_params) \
        if isinstance(gp_or_params, dict) else gp_or_params
    a = src.get("ssm_a")
    if a is not None:
        return a.ndim == 2
    return cfg.arch == "mamba2"


def init_rec_cache(cfg: ModelConfig, n_slots: int, capacity: int = 0,
                   params=None, dtype=jnp.float32) -> RecCache:
    dc, di, ds = cfg.ssm_d_conv, cfg.ssm_d_inner, cfg.ssm_d_state
    Lr, La = (cfg.n_layers, 0) if params is None else _count_layers(params)
    k = v = None
    if La > 0:
        assert capacity > 0, "hybrid models need a KV capacity"
        if jnp.dtype(dtype) == jnp.int8:   # no quantized hybrid KV yet
            dtype = jnp.bfloat16
        D = cfg.head_dim
        k = jnp.zeros((La, n_slots, capacity, cfg.n_kv_heads, D), dtype)
        v = jnp.zeros_like(k)
    # derive the mixer geometry from the loaded tensors when available
    # (hybrid archs like bamba/granitehybrid carry mamba2 mixers under
    # their own arch name); fall back to hparams
    conv_dim = di
    mamba2 = cfg.arch == "mamba2"
    nh = cfg.ssm_dt_rank
    if cfg.wkv_head_size > 0:
        # rwkv6/7: two token-shift rows (att/ffn) + the WKV matrix state
        hs = cfg.wkv_head_size
        H = cfg.n_embd // hs
        return RecCache(
            conv=jnp.zeros((Lr, n_slots, 2, cfg.n_embd), jnp.float32),
            ssm=jnp.zeros((Lr, n_slots, H, hs, hs), jnp.float32),
            k=k, v=v)
    if params is not None:
        for gp in (params.get("layer_groups") or [params["layers"]]):
            if "shortconv_in" in gp:   # lfm2: conv tail only, no SSM state
                conv_dim = gp["shortconv_conv"].shape[-2]
                dc = gp["shortconv_conv"].shape[-1]
                return RecCache(
                    conv=jnp.zeros((Lr, n_slots, dc - 1, conv_dim),
                                   jnp.float32),
                    ssm=jnp.zeros((Lr, n_slots, 1, 1), jnp.float32),
                    k=k, v=v)
            if "ssm_ba" in gp:   # qwen3-next gated DeltaNet
                conv_dim = gp["ssm_conv_w"].shape[-2]
                dc = gp["ssm_conv_w"].shape[-1]
                nhd = gp["ssm_a"].shape[-1]
                Dv = gp["ssm_norm"].shape[-1]
                return RecCache(
                    conv=jnp.zeros((Lr, n_slots, dc - 1, conv_dim),
                                   jnp.float32),
                    ssm=jnp.zeros((Lr, n_slots, nhd, cfg.ssm_d_state, Dv),
                                  jnp.float32),
                    k=k, v=v)
            if "ssm_in" in gp:
                conv_dim = gp["ssm_conv_w"].shape[-2]
                mamba2 = gp["ssm_a"].ndim == 2
                if mamba2:
                    nh = gp["ssm_a"].shape[-1]
                break
    elif mamba2:
        conv_dim = di + 2 * max(cfg.ssm_n_group, 1) * ds
    if mamba2:
        hd = di // nh
        return RecCache(
            conv=jnp.zeros((Lr, n_slots, dc - 1, conv_dim), jnp.float32),
            ssm=jnp.zeros((Lr, n_slots, nh, hd, ds), jnp.float32),
            k=k, v=v)
    return RecCache(
        conv=jnp.zeros((Lr, n_slots, dc - 1, conv_dim), jnp.float32),
        ssm=jnp.zeros((Lr, n_slots, di, ds), jnp.float32), k=k, v=v)


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _mixer(lp, r, conv0, ssm0, seq_lens, cfg: ModelConfig):
    """One mamba mixer block over a [S, T, E] chunk.

    conv0 [S, dc-1, di] / ssm0 [S, di, ds]: entering states. seq_lens [S]:
    valid tokens per row; rows at/after seq_len feed identity elements so
    the returned states equal the states at position seq_len-1 (and rows
    with seq_len == 0 pass their states through untouched).
    Returns (out [S, T, E], conv1, ssm1)."""
    T = r.shape[1]
    di = cfg.ssm_d_inner
    ds = cfg.ssm_d_state
    dtr = cfg.ssm_dt_rank

    xz = mm(r, lp["ssm_in"])                       # [S, T, 2*di]
    xc = xz[..., :di].astype(jnp.float32)
    z = xz[..., di:].astype(jnp.float32)

    # depthwise causal conv over time: prepend the carried tail, then a
    # static sum of shifted slices (d_conv static; no gather, no pad op)
    conv, conv1 = _causal_conv(conv0, xc, lp["ssm_conv_w"],
                               lp.get("ssm_conv_b"), seq_lens)
    x_act = jax.nn.silu(conv)                      # [S, T, di]

    xdb = mm(x_act.astype(r.dtype), lp["ssm_x"])   # [S, T, dtr+2*ds]
    dt_in = xdb[..., :dtr]
    B = xdb[..., dtr:dtr + ds].astype(jnp.float32)
    C = xdb[..., dtr + ds:].astype(jnp.float32)
    if cfg.ssm_dt_b_c_rms:                         # falcon-mamba
        dt_in = rms_norm(dt_in, jnp.ones((dtr,), jnp.float32), cfg.rms_eps)
        B = rms_norm(B, jnp.ones((ds,), jnp.float32), cfg.rms_eps)
        C = rms_norm(C, jnp.ones((ds,), jnp.float32), cfg.rms_eps)
    if lp.get("ssm_dt_norm") is not None:          # jamba learned norms
        dt_in = rms_norm(dt_in, lp["ssm_dt_norm"], cfg.rms_eps)
        B = rms_norm(B, lp["ssm_b_norm"], cfg.rms_eps)
        C = rms_norm(C, lp["ssm_c_norm"], cfg.rms_eps)
    dt = mm(dt_in, lp["ssm_dt"]).astype(jnp.float32)
    if lp.get("ssm_dt_b") is not None:
        dt = dt + lp["ssm_dt_b"].astype(jnp.float32)
    dt = _softplus(dt)                             # [S, T, di]

    A = lp["ssm_a"].astype(jnp.float32)            # [di, ds], negative
    dA = jnp.exp(dt[..., None] * A[None, None])    # [S, T, di, ds]
    dBx = (dt * x_act)[..., None] * B[:, :, None, :]

    valid = (jnp.arange(T)[None, :] < seq_lens[:, None])[..., None, None]
    dA = jnp.where(valid, dA, 1.0)
    dBx = jnp.where(valid, dBx, 0.0)
    # fold the entering state into element 0: h_0 = dA_0*ssm0 + dBx_0
    dBx = dBx.at[:, 0].add(dA[:, 0] * ssm0)

    _, h = jax.lax.associative_scan(_ssd_combine, (dA, dBx), axis=1)
    # identity elements beyond seq_len-1 freeze h, so h[:, -1] is the
    # state at the last valid token (or ssm0 when seq_len == 0)
    ssm1 = h[:, -1]

    y = (h * C[:, :, None, :]).sum(-1)             # [S, T, di]
    y = y + lp["ssm_d"].astype(jnp.float32) * x_act
    y = y * jax.nn.silu(z)
    return mm(y.astype(r.dtype), lp["ssm_out"]), conv1, ssm1


def _causal_conv(conv0, xc, w, b, seq_lens):
    """Depthwise causal conv over time with a carried tail: xc [S, T, C],
    conv0 [S, dc-1, C], w [C, dc]. Returns (out [S, T, C] f32, new tail
    = the last dc-1 VALID inputs per row)."""
    T = xc.shape[1]
    dc = w.shape[1]
    ext = jnp.concatenate([conv0, xc], axis=1)     # [S, dc-1+T, C]
    w = w.astype(jnp.float32)
    out = sum(ext[:, k:k + T, :] * w[:, k][None, None, :]
              for k in range(dc))
    if b is not None:
        out = out + b.astype(jnp.float32)
    idx = seq_lens[:, None] + jnp.arange(dc - 1)[None, :]
    tail = jnp.take_along_axis(ext, idx[:, :, None], axis=1)
    return out, tail


def _ssd_combine(a, b):
    a1, b1 = a
    a2, b2 = b
    return a2 * a1, a2 * b1 + b2


def _mixer2(lp, r, conv0, ssm0, seq_lens, cfg: ModelConfig):
    """Mamba2 (SSD) mixer over a [S, T, E] chunk: per-head scalar decay,
    grouped B/C, gated RMSNorm before the output projection (published
    Mamba2 formulation; transformers Mamba2Mixer is the golden).

    conv0 [S, dc-1, conv_dim] (conv runs over x|B|C), ssm0
    [S, nh, hd, ds]. Returns (out, conv1, ssm1)."""
    S, T, _ = r.shape
    di = cfg.ssm_d_inner
    ds = cfg.ssm_d_state
    # geometry from the tensors (robust across hybrid arch names)
    nh = lp["ssm_a"].shape[-1]
    conv_dim = lp["ssm_conv_w"].shape[-2]
    ng = max((conv_dim - di) // (2 * ds), 1)
    hd = di // nh

    zxbcdt = mm(r, lp["ssm_in"])        # [S, T, 2*di + 2*ng*ds + nh]
    z = zxbcdt[..., :di].astype(jnp.float32)
    xBC = zxbcdt[..., di:di * 2 + 2 * ng * ds].astype(jnp.float32)
    dt = zxbcdt[..., -nh:].astype(jnp.float32)     # [S, T, nh]

    conv, conv1 = _causal_conv(conv0, xBC, lp["ssm_conv_w"],
                               lp.get("ssm_conv_b"), seq_lens)
    xBC = jax.nn.silu(conv)
    x = xBC[..., :di].reshape(S, T, nh, hd)
    B = xBC[..., di:di + ng * ds].reshape(S, T, ng, ds)
    C = xBC[..., di + ng * ds:].reshape(S, T, ng, ds)
    rep = nh // ng
    Bh = jnp.repeat(B, rep, axis=2)                # [S, T, nh, ds]
    Ch = jnp.repeat(C, rep, axis=2)

    if lp.get("ssm_dt_b") is not None:
        dt = dt + lp["ssm_dt_b"].astype(jnp.float32)
    dt = _softplus(dt)                             # [S, T, nh]
    A = lp["ssm_a"].astype(jnp.float32).reshape(nh)      # negative
    dA = jnp.exp(dt * A)[..., None, None]          # [S, T, nh, 1, 1]
    dBx = (dt[..., None] * x)[..., None] * Bh[:, :, :, None, :]
    # [S, T, nh, hd, ds]

    valid = (jnp.arange(T)[None, :] < seq_lens[:, None])
    dA = jnp.where(valid[..., None, None, None], dA, 1.0)
    dBx = jnp.where(valid[..., None, None, None], dBx, 0.0)
    dBx = dBx.at[:, 0].add(dA[:, 0] * ssm0)

    _, h = jax.lax.associative_scan(_ssd_combine, (dA, dBx), axis=1)
    ssm1 = h[:, -1]

    y = (h * Ch[:, :, :, None, :]).sum(-1)         # [S, T, nh, hd]
    y = y + lp["ssm_d"].astype(jnp.float32).reshape(nh)[..., None] * x
    y = y.reshape(S, T, di)
    # gated RMSNorm: rms_norm(y * silu(z)) * w (transformers
    # MambaRMSNormGated over the full inner width); falcon-h1 ships
    # without the norm (mamba_rms_norm=False) — plain silu(z) gating
    y = y * jax.nn.silu(z)
    if "ssm_norm" in lp:
        var = jnp.mean(y * y, axis=-1, keepdims=True)
        y = y * jax.lax.rsqrt(var + cfg.rms_eps)
        y = y * lp["ssm_norm"].astype(jnp.float32)
    return mm(y.astype(r.dtype), lp["ssm_out"]), conv1, ssm1


def _mixer_shortconv(lp, r, conv0, ssm0, seq_lens, cfg: ModelConfig):
    """lfm2 gated short conv: in_proj -> (B, C, x) thirds; y =
    C * causal_conv(B * x); out_proj. Carries only the conv tail
    (ssm0 passes through untouched)."""
    bcx = mm(r, lp["shortconv_in"])               # [S, T, 3E]
    E3 = bcx.shape[-1] // 3
    B = bcx[..., :E3].astype(jnp.float32)
    C = bcx[..., E3:2 * E3].astype(jnp.float32)
    xg = bcx[..., 2 * E3:].astype(jnp.float32)
    conv, conv1 = _causal_conv(conv0, B * xg, lp["shortconv_conv"],
                               lp.get("shortconv_conv_b"), seq_lens)
    y = C * conv
    return mm(y.astype(r.dtype), lp["shortconv_out"]), conv1, ssm0


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + eps)


def _mixer_deltanet(lp, r, conv0, ssm0, seq_lens, cfg: ModelConfig):
    """qwen3-next gated DeltaNet mixer (HF torch_recurrent_gated_delta_rule
    is the golden): conv+silu over the flattened q|k|v, L2-normed q/k,
    per-v-head decay alpha = exp(A * softplus(a + dt_bias)) and write
    strength beta = sigmoid(b); state S [nh, Dk, Dv] evolves as
    S' = alpha*S + k (beta (v - (alpha*S)^T k))^T, out = S'^T q / sqrt(Dk).
    Gated per-head RMSNorm (norm-then-silu(z)-gate) before out_proj.
    ssm_a stores -exp(A_log) like the mamba exports."""
    Sb, T, _ = r.shape
    nh = lp["ssm_a"].shape[-1]                     # v heads
    Dv = lp["ssm_norm"].shape[-1]
    Dk = cfg.ssm_d_state
    conv_dim = lp["ssm_conv_w"].shape[-2]          # 2*key_dim + value_dim
    value_dim = nh * Dv
    key_dim = (conv_dim - value_dim) // 2
    hk = key_dim // Dk
    R = nh // hk

    qkvz = mm(r, lp["ssm_in"]).astype(jnp.float32) \
        .reshape(Sb, T, hk, 2 * Dk + 2 * R * Dv)   # per-k-head interleave
    ba = mm(r, lp["ssm_ba"]).astype(jnp.float32).reshape(Sb, T, hk, 2 * R)
    q = qkvz[..., :Dk]
    k = qkvz[..., Dk:2 * Dk]
    v = qkvz[..., 2 * Dk:2 * Dk + R * Dv]
    z = qkvz[..., 2 * Dk + R * Dv:].reshape(Sb, T, nh, Dv)
    b = ba[..., :R].reshape(Sb, T, nh)
    a = ba[..., R:].reshape(Sb, T, nh)

    # conv runs over the flattened q | k | v concat
    mixed = jnp.concatenate([q.reshape(Sb, T, key_dim),
                             k.reshape(Sb, T, key_dim),
                             v.reshape(Sb, T, value_dim)], axis=-1)
    conv, conv1 = _causal_conv(conv0, mixed, lp["ssm_conv_w"],
                               lp.get("ssm_conv_b"), seq_lens)
    mixed = jax.nn.silu(conv)
    q = mixed[..., :key_dim].reshape(Sb, T, hk, Dk)
    k = mixed[..., key_dim:2 * key_dim].reshape(Sb, T, hk, Dk)
    v = mixed[..., 2 * key_dim:].reshape(Sb, T, nh, Dv)

    q = _l2norm(q) * (Dk ** -0.5)
    k = _l2norm(k)
    if R > 1:
        q = jnp.repeat(q, R, axis=2)
        k = jnp.repeat(k, R, axis=2)

    beta = jax.nn.sigmoid(b)                       # [S, T, nh]
    dtb = lp["ssm_dt_b"].astype(jnp.float32)
    alpha = jnp.exp(lp["ssm_a"].astype(jnp.float32) * _softplus(a + dtb))
    valid = jnp.arange(T)[None, :] < seq_lens[:, None]

    def step(S0, inp):
        q_t, k_t, v_t, al_t, be_t, ok_t = inp
        Sg = S0 * al_t[..., None, None]            # [S, nh, Dk, Dv]
        kv = (Sg * k_t[..., :, None]).sum(-2)      # [S, nh, Dv]
        delta = (v_t - kv) * be_t[..., None]
        S1 = Sg + k_t[..., :, None] * delta[..., None, :]
        S1 = jnp.where(ok_t[:, None, None, None], S1, S0)
        out = (S1 * q_t[..., :, None]).sum(-2)     # [S, nh, Dv]
        return S1, out

    tm = lambda x: jnp.moveaxis(x, 1, 0)           # time-major for scan
    ssm1, outs = jax.lax.scan(
        step, ssm0.astype(jnp.float32),
        (tm(q), tm(k), tm(v), tm(alpha), tm(beta), tm(valid)))
    y = jnp.moveaxis(outs, 0, 1)                   # [S, T, nh, Dv]

    # gated per-head RMSNorm: norm, scale, then silu(z) gate
    var = jnp.mean(y * y, axis=-1, keepdims=True)
    y = y * jax.lax.rsqrt(var + cfg.rms_eps)
    y = y * lp["ssm_norm"].astype(jnp.float32)
    y = y * jax.nn.silu(z)
    y = y.reshape(Sb, T, value_dim)
    return mm(y.astype(r.dtype), lp["ssm_out"]), conv1, ssm1


def _pick_mixer(gp, cfg: ModelConfig):
    if "ssm_ba" in gp:
        return _mixer_deltanet
    if "shortconv_in" in gp:
        return _mixer_shortconv
    return _mixer2 if _ssm_style(gp, cfg) else _mixer


def _rec_layer(lp, x, conv0, ssm0, seq_lens, cfg: ModelConfig, mixer):
    """One recurrent layer: norm -> mixer -> residual, plus the per-layer
    FFN tail hybrid models (jamba) attach after the mixer."""
    r = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
    out, conv1, ssm1 = mixer(lp, r, conv0, ssm0, seq_lens, cfg)
    x = x + out.astype(x.dtype)
    if "w_up" in lp or "w_gate_inp" in lp:
        from .llama import _ffn_block, _pre_norm
        h = _pre_norm(x, lp, "ffn_norm", cfg)
        x = x + _ffn_block(h, lp, cfg, None, x.dtype)
    return x, (conv1, ssm1)


def _run_rec_stack(params, cfg: ModelConfig, x, cache: RecCache, seq_lens,
                   positions=None, rope_cos=None, rope_sin=None):
    """Scan the layer stack; returns (hidden [S,T,E], new cache).

    Pure-recurrent models scan one homogeneous group. Hybrid models
    alternate: recurrent groups scan with their state slices (mixer style
    per GROUP — mamba1 vs mamba2/SSD detected from the tensors, so
    bamba/granitehybrid-class models work under their own arch names),
    attention groups run the standard deferred attention layer (with the
    arch's real rope: none for jamba, rotary for bamba) against their KV
    slices, and all attention rows scatter in one fused write."""
    from .rwkv import is_rwkv, rwkv_run_stack
    if is_rwkv(params):
        return rwkv_run_stack(params, cfg, x, cache, seq_lens)
    groups = params.get("layer_groups")
    if groups is None and "wq" in params["layers"]:
        # homogeneous parallel-hybrid stack (falcon-h1): every layer
        # carries both mixers — run it through the group path below
        groups = [params["layers"]]
    if groups is None:
        mixer = _pick_mixer(params["layers"], cfg)

        def body(x, inp):
            lp, conv0, ssm0 = inp
            return _rec_layer(lp, x, conv0, ssm0, seq_lens, cfg, mixer)

        x, (conv_n, ssm_n) = jax.lax.scan(
            body, x, (params["layers"], cache.conv, cache.ssm))
        return x, RecCache(conv=conv_n, ssm=ssm_n, k=cache.k, v=cache.v)

    from .llama import _attn_layer, _build_mask
    T = x.shape[1]
    C = cache.k.shape[2]
    mask = _build_mask(cfg, positions, seq_lens, T, C)
    if rope_cos is None or rope_cos.ndim < 2:
        rope_cos = rope_sin = jnp.zeros((1, 1), jnp.float32)
    o_r = o_a = 0
    conv_parts, ssm_parts, k_rows, v_rows = [], [], [], []
    for gp in groups:
        lead = next(iter(gp.values()))
        n = lead.qs.shape[0] if hasattr(lead, "qs") else lead.shape[0]
        rec = "ssm_in" in gp or "shortconv_in" in gp
        if rec and "wq" in gp:
            # falcon-h1 parallel hybrid: attention AND the mamba2 mixer
            # run on the SAME normed input, outputs joining one residual
            # (x + attn + mamba), then the FFN block — the mixer result
            # rides _attn_layer's extra_residual hook
            mixer = _pick_mixer(gp, cfg)

            def pbody(x, inp, mixer=mixer):
                lp, conv0, ssm0, k_c, v_c = inp
                r = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
                mo, conv1, ssm1 = mixer(lp, r, conv0, ssm0, seq_lens, cfg)
                x, rows = _attn_layer(
                    x, lp, positions, k_c, v_c, mask, cfg,
                    rope_cos, rope_sin, deferred_kv=True,
                    extra_residual=mo)
                return x, (conv1, ssm1, rows)

            x, (cn, sn, rows) = jax.lax.scan(
                pbody, x, (gp, cache.conv[o_r:o_r + n],
                           cache.ssm[o_r:o_r + n],
                           cache.k[o_a:o_a + n], cache.v[o_a:o_a + n]))
            conv_parts.append(cn)
            ssm_parts.append(sn)
            k_rows.append(rows[0])
            v_rows.append(rows[1])
            o_r += n
            o_a += n
        elif rec:
            mixer = _pick_mixer(gp, cfg)

            def body(x, inp, mixer=mixer):
                lp, conv0, ssm0 = inp
                return _rec_layer(lp, x, conv0, ssm0, seq_lens, cfg, mixer)

            x, (cn, sn) = jax.lax.scan(
                body, x, (gp, cache.conv[o_r:o_r + n],
                          cache.ssm[o_r:o_r + n]))
            conv_parts.append(cn)
            ssm_parts.append(sn)
            o_r += n
        elif "wq" in gp:
            def abody(x, inp):
                lp, k_c, v_c = inp
                return _attn_layer(x, lp, positions, k_c, v_c, mask, cfg,
                                   rope_cos, rope_sin, deferred_kv=True)

            x, rows = jax.lax.scan(
                abody, x, (gp, cache.k[o_a:o_a + n],
                           cache.v[o_a:o_a + n]))
            k_rows.append(rows[0])
            v_rows.append(rows[1])
            o_a += n
        else:
            # FFN-only block (nemotron-h: each block is norm + ONE of
            # {mamba2, attention, MLP}) — no state of either kind
            from .llama import _ffn_block, _pre_norm

            def fbody(x, lp):
                h = _pre_norm(x, lp, "attn_norm", cfg)
                return x + _ffn_block(h, lp, cfg, None, x.dtype), None

            x, _ = jax.lax.scan(fbody, x, gp)
    conv_n = jnp.concatenate(conv_parts, 0) if conv_parts else cache.conv
    ssm_n = jnp.concatenate(ssm_parts, 0) if ssm_parts else cache.ssm
    k_new, v_new = cache.k, cache.v
    if k_rows:
        kr = jnp.concatenate(k_rows, 0)          # [La, S, T, Hkv, D]
        vr = jnp.concatenate(v_rows, 0)
        La, S = kr.shape[0], kr.shape[1]
        li = jnp.arange(La)[:, None, None]
        bi = jnp.arange(S)[None, :, None]
        pi = jnp.broadcast_to(positions[None], (La, S, T))
        k_new = cache.k.at[li, bi, pi].set(kr.astype(cache.k.dtype),
                                           mode="drop")
        v_new = cache.v.at[li, bi, pi].set(vr.astype(cache.v.dtype),
                                           mode="drop")
    return x, RecCache(conv=conv_n, ssm=ssm_n, k=k_new, v=v_new)


def _rec_logits(params, cfg: ModelConfig, x):
    from .llama import _output_logits
    return _output_logits(params, cfg, x)


def _embed(params, cfg: ModelConfig, tokens):
    from .llama import _embed_tokens
    return _embed_tokens(params, cfg, tokens)


# -- prefill ------------------------------------------------------------------

def rec_prefill_impl(params, cfg: ModelConfig, tokens, cache: RecCache,
                     slot, pos_base, n_valid, rope_cos=None, rope_sin=None,
                     mrope_pos=None, attn_len: int = 0):
    """Single-slot chunk prefill (signature mirrors llama.prefill_impl;
    rope/attn_len args accepted and ignored — state IS the history;
    hybrid models use pos_base for their attention layers' KV writes).
    Returns (last-valid-token logits [V], new cache)."""
    del mrope_pos, attn_len
    if rope_cos is not None and rope_cos.ndim < 2:
        rope_cos = rope_sin = None
    T = tokens.shape[0]
    x = _embed(params, cfg, tokens[None, :])               # [1, T, E]

    def sl(a):
        return (None if a is None
                else jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1))

    view = RecCache(conv=sl(cache.conv), ssm=sl(cache.ssm),
                    k=sl(cache.k), v=sl(cache.v))
    seq_lens = jnp.full((1,), n_valid, jnp.int32)
    offs = jnp.arange(T, dtype=jnp.int32)
    C = cache.capacity if cache.k is not None else (1 << 30)
    positions = jnp.where(offs < n_valid, pos_base + offs, C)[None, :]
    x, new = _run_rec_stack(params, cfg, x, view, seq_lens, positions,
                            rope_cos, rope_sin)
    last = jnp.maximum(n_valid - 1, 0)
    logits = _rec_logits(params, cfg,
                         jax.lax.dynamic_slice_in_dim(x[0], last, 1, 0))[0]

    def up(full, part):
        return (None if full is None else
                jax.lax.dynamic_update_slice_in_dim(full, part, slot,
                                                    axis=1))

    cache = RecCache(conv=up(cache.conv, new.conv),
                     ssm=up(cache.ssm, new.ssm),
                     k=up(cache.k, new.k), v=up(cache.v, new.v))
    return logits, cache


rec_prefill = partial(jax.jit, static_argnames=("cfg", "attn_len"),
                      donate_argnames=("cache",))(rec_prefill_impl)


def rec_prefill_batch_impl(params, cfg: ModelConfig, tokens, pos_base,
                           n_valid, cache: RecCache, rope_cos=None,
                           rope_sin=None, attn_len: int = 0):
    """Batched prefill: one chunk per slot in one program. Rows with
    n_valid == 0 pass their states through untouched (identity masking).
    Returns (last-token logits [S, V], new cache)."""
    del attn_len
    if rope_cos is not None and rope_cos.ndim < 2:
        rope_cos = rope_sin = None
    x = _embed(params, cfg, tokens)                        # [S, T, E]
    T = tokens.shape[1]
    offs = jnp.arange(T, dtype=jnp.int32)[None, :]
    C = cache.capacity if cache.k is not None else (1 << 30)
    positions = jnp.where(offs < n_valid[:, None], pos_base[:, None] + offs,
                          C)
    x, cache = _run_rec_stack(params, cfg, x, cache, n_valid, positions,
                              rope_cos, rope_sin)
    last = jnp.maximum(n_valid - 1, 0)
    x_last = jnp.take_along_axis(
        x, last[:, None, None].astype(jnp.int32).repeat(x.shape[-1], 2),
        axis=1)[:, 0]
    return _rec_logits(params, cfg, x_last), cache


rec_prefill_batch = partial(jax.jit, static_argnames=("cfg", "attn_len"),
                            donate_argnames=("cache",))(
                                rec_prefill_batch_impl)


# -- decode -------------------------------------------------------------------

def rec_decode_verify_sample(params, cfg: ModelConfig, tokens, positions,
                             n_draft, cache: RecCache, fwd_active,
                             samp_active, sstate, arrs, rope_cos=None,
                             rope_sin=None, mrope_delta=None):
    """T=1 decode + fused sampling over the slot batch (mirror of the
    engine's _decode_verify_sample; speculative verify is gated off for
    recurrent models, so n_draft is always 0)."""
    return _rec_decode_one(params, cfg, tokens, positions, cache,
                           fwd_active, samp_active, sstate, arrs,
                           rope_cos, rope_sin)


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("cache", "sstate"))
def _rec_decode_one(params, cfg: ModelConfig, tokens, positions, cache,
                    fwd_active, samp_active, sstate, arrs,
                    rope_cos=None, rope_sin=None):
    from ..sampling import verify_impl
    if rope_cos is not None and rope_cos.ndim < 2:
        rope_cos = rope_sin = None
    seq_lens = jnp.where(fwd_active, 1, 0)
    x = _embed(params, cfg, tokens[:, :1])                 # [S, 1, E]
    x, cache = _run_rec_stack(params, cfg, x, cache, seq_lens,
                              positions[:, :1], rope_cos, rope_sin)
    logits = _rec_logits(params, cfg, x[:, 0])[:, None]    # [S, 1, V]
    zero = jnp.zeros_like(seq_lens)
    toks, n_emitted, ids, probs, tokps, sstate = verify_impl(
        logits, tokens[:, :1], zero, sstate, arrs, samp_active)
    return (toks, n_emitted, ids, probs, tokps, logits[:, 0], cache,
            sstate)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "attn_len"),
         donate_argnames=("cache", "sstate"))
def rec_decode_chain(params, cfg: ModelConfig, token0, pos0, cache,
                     sstate, arrs, active, rope_cos=None, rope_sin=None,
                     n_steps: int = 8, mrope_delta=None, attn_len: int = 0):
    """Chained multi-step recurrent decode: K sequential forward+sample
    steps in ONE dispatch, carrying (token, state, sampler) through
    lax.scan — one host sync per K tokens (mirror of _decode_chain).
    Inactive slots' states are frozen by identity masking. Hybrid
    models carry their attention KV through the scan too (correctness
    first; the accumulator trick can come later if hybrid decode ever
    dominates)."""
    del mrope_delta, attn_len
    from ..sampling import sample_impl
    if rope_cos is not None and rope_cos.ndim < 2:
        rope_cos = rope_sin = None
    seq_lens = jnp.where(active, 1, 0)
    C = cache.capacity if cache.k is not None else (1 << 30)

    def step(carry, j):
        tok, cache, sstate = carry
        positions = jnp.where(active, pos0 + j, C)[:, None]
        x = _embed(params, cfg, tok[:, None])
        x, cache = _run_rec_stack(params, cfg, x, cache, seq_lens,
                                  positions, rope_cos, rope_sin)
        logits = _rec_logits(params, cfg, x[:, 0])         # [S, V]
        tok2, ids, probs, tokp, sstate = sample_impl(
            logits, sstate, arrs, active)
        return (tok2, cache, sstate), (tok2, ids, probs, tokp)

    (_, cache, sstate), ys = jax.lax.scan(
        step, (token0, cache, sstate), jnp.arange(n_steps, dtype=jnp.int32))
    toks, ids, probs, tokps = ys                           # [K, S, ...]
    swap = lambda a: jnp.swapaxes(a, 0, 1)  # noqa: E731
    return (swap(toks), swap(ids), swap(probs), swap(tokps), cache, sstate)


@partial(jax.jit, donate_argnames=("cache",))
def reset_rec_slot(cache: RecCache, slot) -> RecCache:
    """Zero one slot's recurrent state (fresh-prompt admission). Hybrid
    KV rows stay — stale entries beyond the new positions are unreachable
    through the causal mask and get overwritten by the new prefill."""
    return cache._replace(
        conv=cache.conv.at[:, slot].set(0.0),
        ssm=cache.ssm.at[:, slot].set(0.0))


@partial(jax.jit, donate_argnames=("cache",))
def copy_rec_state(cache: RecCache, src, dst) -> RecCache:
    """Copy slot src's full state into dst (cross-slot reuse when the
    donor's ENTIRE token history is a prefix of the new prompt)."""
    def leaf(a):
        return None if a is None else a.at[:, dst].set(a[:, src])
    return RecCache(conv=leaf(cache.conv), ssm=leaf(cache.ssm),
                    k=leaf(cache.k), v=leaf(cache.v))
