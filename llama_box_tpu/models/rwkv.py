"""RWKV6 / RWKV7 — linear-attention recurrent models.

The reference serves rwkv6/rwkv7 GGUFs through llama.cpp's rwkv_wkv6 /
rwkv_wkv7 graph ops (llama.cpp build_rwkv6/build_rwkv7: constant-memory
per-layer state instead of a KV cache). This module is the TPU-native
equivalent, plugged into the recurrent engine branch (models/mamba.py
RecCache and the rec_* prefill/decode programs serve it unchanged):

- state per layer = two token-shift rows (post-ln1 / post-ln2 hidden of
  the previous token, RecCache.conv [L, S, 2, E]) + the WKV matrix state
  (RecCache.ssm [L, S, H, hs, hs]).
- rwkv6's WKV recurrence S_t = diag(w_t) S_{t-1} + k_t v_t^T is the same
  associative form as mamba's SSD, so prefill runs as a CHUNKED parallel
  prefix scan (jax.lax.associative_scan within chunks, lax.scan across)
  — O(T/cs) sequential steps with the [cs, H, hs, hs] intermediate
  bounded by the chunk size instead of the prompt length.
- rwkv7's recurrence S_t = S_{t-1} (diag(w_t) + ab_t) + v_t k_t^T has a
  rank-1-plus-diagonal matrix coefficient; prefill materializes the
  per-token [hs, hs] transitions and runs the same chunked parallel
  prefix over (A, B) pairs under (A1,B1)(A2,B2) = (A1A2, B1A2+B2) —
  log2(chunk) rounds of batched matrix products on the MXU (_wkv7_scan;
  measured within ~1.8x of rwkv6's prefill tok/s on the CPU test bench,
  vs the former per-token scan). Decode (T < 8) keeps the cheap
  sequential step.

Semantics follow the published RWKV reference implementations
(BlinkDL/RWKV-LM; HF RWKV6/7 community ports) and llama.cpp's tensor
naming/conversion conventions (time_mix_*, channel_mix_*; w2/a2/v2/g2
LoRA second factors; rescale_every halving with converter-prescaled
output projections). Numerics: state math in f32; projection matmuls in
the model dtype with QTensor residency supported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.qmatmul import mm
from .config import ModelConfig


def _ln(x, w, b, eps):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * w.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def _group_norm(y, w, b, H, eps):
    """Per-head GroupNorm over [S, T, H, hs] -> scaled flat [S, T, E]."""
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + eps)
    S_, T = y.shape[:2]
    y = y.reshape(S_, T, -1)
    y = y * w.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def _token_shift(x, prev, seq_lens):
    """x [S, T, E] f32, prev [S, E]: returns (x_prev [S, T, E], new prev =
    last VALID token's x; rows with seq_len == 0 keep their state)."""
    xp = jnp.concatenate([prev[:, None], x[:, :-1]], axis=1)
    idx = jnp.maximum(seq_lens - 1, 0)[:, None, None]
    last = jnp.take_along_axis(
        x, jnp.broadcast_to(idx, (x.shape[0], 1, x.shape[2])), axis=1)[:, 0]
    newp = jnp.where((seq_lens > 0)[:, None], last, prev)
    return xp, newp


def _combine(a, b):
    a1, b1 = a
    a2, b2 = b
    return a2 * a1, a2 * b1 + b2


def _wkv6_scan(w, a, s0, chunk: int = 32):
    """Linear recurrence S_t = w_t * S_{t-1} + a_t over the token axis.

    w [S, T, H, hs, 1] decay, a [S, T, H, hs, hs] contributions,
    s0 [S, H, hs, hs] entering state. Returns (s_prev [S, T, H, hs, hs] —
    the state BEFORE each step's update, what y_t reads — and the final
    state). Chunked: within a chunk a parallel prefix scan, across chunks
    a sequential carry, so peak memory is chunk-bounded."""
    S_, T, H, hs, _ = a.shape
    cs = min(chunk, T)
    pad = (-T) % cs
    if pad:
        w = jnp.concatenate(
            [w, jnp.ones((S_, pad) + w.shape[2:], w.dtype)], axis=1)
        a = jnp.concatenate(
            [a, jnp.zeros((S_, pad) + a.shape[2:], a.dtype)], axis=1)
    nb = (T + pad) // cs
    wb = w.reshape(S_, nb, cs, H, hs, 1).swapaxes(0, 1)
    ab = a.reshape(S_, nb, cs, H, hs, hs).swapaxes(0, 1)

    def blk(s_in, inp):
        wc, ac = inp                                   # [S, cs, ...]
        cw, ch = jax.lax.associative_scan(_combine, (wc, ac), axis=1)
        h = cw * s_in[:, None] + ch                    # state AFTER step t
        s_prev = jnp.concatenate([s_in[:, None], h[:, :-1]], axis=1)
        return h[:, -1], s_prev

    s_fin, s_prev = jax.lax.scan(blk, s0, (wb, ab))
    s_prev = s_prev.swapaxes(0, 1).reshape(S_, T + pad, H, hs, hs)
    return s_prev[:, :T], s_fin


def _lerp5(lp, E):
    """rwkv6 per-stream lerp coefficients (w, k, v, r, g): fused tensor
    [5, 1, 1, E] when present, else the five separate [1, 1, E]s."""
    if "tm_lerp_fused" in lp:
        f = lp["tm_lerp_fused"].astype(jnp.float32).reshape(5, E)
        return f[0], f[1], f[2], f[3], f[4]
    return tuple(lp[k].astype(jnp.float32).reshape(E)
                 for k in ("tm_lerp_w", "tm_lerp_k", "tm_lerp_v",
                           "tm_lerp_r", "tm_lerp_g"))


def _rwkv6_time_mix(lp, x, shift0, s0, seq_lens, cfg: ModelConfig):
    """x [S, T, E] f32 (post-ln1). shift0 [S, E], s0 [S, H, hs, hs].
    Returns (out [S, T, E], shift1, s1)."""
    S_, T, E = x.shape
    hs = cfg.wkv_head_size
    H = E // hs
    xprev, shift1 = _token_shift(x, shift0, seq_lens)
    sx = xprev - x

    lx = lp["tm_lerp_x"].astype(jnp.float32).reshape(E)
    xxx = x + sx * lx
    edim = lp["tm_w1"].shape[-1] // 5
    z = jnp.tanh(mm(xxx.astype(lp["tm_ln"].dtype), lp["tm_w1"])
                 .astype(jnp.float32)).reshape(S_, T, 5, edim)
    w2 = lp["tm_w2"].astype(jnp.float32)               # [5, edim, E]
    m = jnp.einsum("stfe,feo->stfo", z, w2)            # [S, T, 5, E]
    lw, lk, lv, lr, lg = _lerp5(lp, E)
    xw = x + sx * (lw + m[:, :, 0])
    xk = x + sx * (lk + m[:, :, 1])
    xv = x + sx * (lv + m[:, :, 2])
    xr = x + sx * (lr + m[:, :, 3])
    xg = x + sx * (lg + m[:, :, 4])

    dt = lp["tm_ln"].dtype
    r = mm(xr.astype(dt), lp["tm_r"]).astype(jnp.float32)
    k = mm(xk.astype(dt), lp["tm_k"]).astype(jnp.float32)
    v = mm(xv.astype(dt), lp["tm_v"]).astype(jnp.float32)
    g = jax.nn.silu(mm(xg.astype(dt), lp["tm_g"]).astype(jnp.float32))

    ww = lp["tm_decay"].astype(jnp.float32).reshape(E) \
        + mm(jnp.tanh(mm(xw.astype(dt), lp["tm_decay_w1"])
                      .astype(jnp.float32)).astype(dt),
             lp["tm_decay_w2"]).astype(jnp.float32)
    w = jnp.exp(-jnp.exp(ww))                          # [S, T, E]

    rh = r.reshape(S_, T, H, hs)
    kh = k.reshape(S_, T, H, hs)
    vh = v.reshape(S_, T, H, hs)
    wh = w.reshape(S_, T, H, hs)
    u = lp["tm_first"].astype(jnp.float32).reshape(H, hs)

    a = kh[..., :, None] * vh[..., None, :]            # [S,T,H,hs,hs]
    valid = (jnp.arange(T)[None, :] < seq_lens[:, None])[..., None, None,
                                                         None]
    wl = jnp.where(valid, wh[..., None], 1.0)
    al = jnp.where(valid, a, 0.0)
    s_prev, s1 = _wkv6_scan(wl, al, s0.astype(jnp.float32))
    # y_t = r_t . (S_{t-1} + u * k_t v_t^T)
    y = jnp.einsum("sthi,sthij->sthj", rh,
                   s_prev + u[None, None, :, :, None] * al)
    # ln_x eps: RWKV-LM uses (1e-5) * head_size_divisor^2 with divisor 8
    gn = _group_norm(y, lp["tm_ln"], lp.get("tm_ln_b"), H, 64e-5)
    out = mm((gn * g).astype(dt), lp["tm_o"])
    return out, shift1, s1


def _rwkv6_channel_mix(lp, x, shift0, seq_lens, cfg: ModelConfig):
    """x [S, T, E] f32 (post-ln2). Returns (out [S, T, E], shift1)."""
    xprev, shift1 = _token_shift(x, shift0, seq_lens)
    sx = xprev - x
    E = x.shape[-1]
    dt = lp["cm_k"].qs.dtype if hasattr(lp["cm_k"], "qs") else \
        lp["cm_k"].dtype
    dt = jnp.bfloat16 if dt == jnp.int8 else dt
    xk = x + sx * lp["cm_lerp_k"].astype(jnp.float32).reshape(E)
    k = jnp.square(jax.nn.relu(
        mm(xk.astype(dt), lp["cm_k"]).astype(jnp.float32)))
    kv = mm(k.astype(dt), lp["cm_v"]).astype(jnp.float32)
    if "cm_r" in lp:                                   # rwkv6 receptance
        xr = x + sx * lp["cm_lerp_r"].astype(jnp.float32).reshape(E)
        r = jax.nn.sigmoid(mm(xr.astype(dt), lp["cm_r"])
                           .astype(jnp.float32))
        return r * kv, shift1
    return kv, shift1


def _l2norm_head(x, eps=1e-12):
    return x * jax.lax.rsqrt(
        jnp.sum(x * x, -1, keepdims=True) + eps)


def _wkv7_scan(r, w, k, v, kk, a, valid, s0, chunk: int = 16):
    """Chunked parallel scan for the rwkv7 recurrence
    S_t = S_{t-1} @ A_t + B_t with A_t = diag(w_t) - kk_t (kk_t*a_t)^T
    and B_t = v_t k_t^T (the rank-1-plus-diagonal transition of
    llama.cpp's rwkv_wkv7 op, executed the TPU way): within a chunk the
    (A, B) pairs combine under the associative law
    (A1,B1)(A2,B2) = (A1A2, B1A2+B2) via lax.associative_scan — log2(c)
    rounds of [S,c,H,hs,hs] matrix products on the MXU — and chunks
    carry sequentially, so peak memory is chunk-bounded and the
    sequential depth is T/c instead of T. Replaces the per-token scan
    for prefill (decode keeps the cheap sequential step).

    r/w/k/v/kk/a: [S, T, H, hs] f32; valid: [S, T] bool;
    s0: [S, H, hs(v), hs(k)] f32. Returns (s_T, out [S, T, H, hs]).
    """
    S_, T, H, hs = r.shape
    cs = min(chunk, T)
    while T % cs:
        cs -= 1
    eye = jnp.eye(hs, dtype=jnp.float32)
    # dense per-token transition: A[j, l] = d_jl w[l] - kk[j] (kk*a)[l]
    A = (eye[None, None, None] * w[..., None, :]
         - kk[..., :, None] * (kk * a)[..., None, :])
    B = v[..., :, None] * k[..., None, :]
    ok = valid[..., None, None, None]
    A = jnp.where(ok, A, eye[None, None, None])
    B = jnp.where(ok, B, 0.0)
    nch = T // cs
    A = A.reshape(S_, nch, cs, H, hs, hs)
    B = B.reshape(S_, nch, cs, H, hs, hs)
    rr = r.reshape(S_, nch, cs, H, hs)

    def comb(x, y):
        A1, B1 = x
        A2, B2 = y
        return (jnp.einsum("...ij,...jk->...ik", A1, A2),
                jnp.einsum("...ij,...jk->...ik", B1, A2) + B2)

    def blk(s_in, inp):
        Ac, Bc, rc = inp
        P, Cc = jax.lax.associative_scan(comb, (Ac, Bc), axis=1)
        s_all = jnp.einsum("shij,schjl->schil", s_in, P) + Cc
        out = jnp.einsum("schil,schl->schi", s_all, rc)
        return s_all[:, -1], out

    tm = lambda z: jnp.moveaxis(z, 1, 0)  # noqa: E731
    s1, outs = jax.lax.scan(blk, s0.astype(jnp.float32),
                            (tm(A), tm(B), tm(rr)))
    out = jnp.moveaxis(outs, 0, 1).reshape(S_, T, H, hs)
    return s1, out


def _rwkv7_time_mix(lp, x, shift0, s0, v_first, seq_lens,
                    cfg: ModelConfig):
    """RWKV7 time mix (RWKV-LM v7 reference semantics). x [S, T, E] f32
    post-ln1; s0 [S, H, hs(v), hs(k)]; v_first [S, T, E] or None (layer 0
    sets it). Returns (out, shift1, s1, v_first)."""
    S_, T, E = x.shape
    hs = cfg.wkv_head_size
    H = E // hs
    xprev, shift1 = _token_shift(x, shift0, seq_lens)
    sx = xprev - x

    if "tm_lerp_fused" in lp:
        f = lp["tm_lerp_fused"].astype(jnp.float32).reshape(6, E)
        lr_, lw, lk, lv, la, lg = (f[i] for i in range(6))
    else:
        lr_, lw, lk, lv, la, lg = (
            lp[k].astype(jnp.float32).reshape(E)
            for k in ("tm_lerp_r", "tm_lerp_w", "tm_lerp_k",
                      "tm_lerp_v", "tm_lerp_a", "tm_lerp_g"))
    xr = x + sx * lr_
    xw = x + sx * lw
    xk = x + sx * lk
    xv = x + sx * lv
    xa = x + sx * la
    xg = x + sx * lg

    dt = lp["tm_ln"].dtype
    r = mm(xr.astype(dt), lp["tm_r"]).astype(jnp.float32)
    k = mm(xk.astype(dt), lp["tm_k"]).astype(jnp.float32)
    v = mm(xv.astype(dt), lp["tm_v"]).astype(jnp.float32)

    w0 = lp["tm_w0"].astype(jnp.float32).reshape(E)
    wl = mm(jnp.tanh(mm(xw.astype(dt), lp["tm_w1"]).astype(jnp.float32))
            .astype(dt), lp["tm_w2"]).astype(jnp.float32)
    ww = -jax.nn.softplus(-(w0 + wl)) - 0.5
    w = jnp.exp(-jnp.exp(ww))                          # [S, T, E]

    if "tm_v0" not in lp:
        # layer 0 (no v LoRA): sets the cross-layer value anchor
        v_first = v
    else:
        vg = jax.nn.sigmoid(
            lp["tm_v0"].astype(jnp.float32).reshape(E)
            + mm(mm(xv.astype(dt), lp["tm_v1"]).astype(dt),
                 lp["tm_v2"]).astype(jnp.float32))
        v = v + (v_first - v) * vg

    a = jax.nn.sigmoid(
        lp["tm_a0"].astype(jnp.float32).reshape(E)
        + mm(mm(xa.astype(dt), lp["tm_a1"]).astype(dt),
             lp["tm_a2"]).astype(jnp.float32))
    g = mm(jax.nn.sigmoid(mm(xg.astype(dt), lp["tm_g1"])
                          .astype(jnp.float32)).astype(dt),
           lp["tm_g2"]).astype(jnp.float32)

    kk = _l2norm_head((k * lp["tm_kk"].astype(jnp.float32).reshape(E))
                      .reshape(S_, T, H, hs))
    ka = lp["tm_ka"].astype(jnp.float32).reshape(E)
    k = k * (1.0 + (a - 1.0) * ka)

    rh = r.reshape(S_, T, H, hs)
    kh = k.reshape(S_, T, H, hs)
    vh = v.reshape(S_, T, H, hs)
    wh = w.reshape(S_, T, H, hs)
    ah = a.reshape(S_, T, H, hs)
    valid = jnp.arange(T)[None, :] < seq_lens[:, None]

    if T >= 8:
        # prefill: chunked matrix-product prefix scan (MXU parallelism,
        # sequential depth T/chunk)
        s1, y = _wkv7_scan(rh, wh, kh, vh, kk, ah, valid,
                           s0.astype(jnp.float32))
    else:
        def step(s, inp):
            r_t, w_t, k_t, v_t, kk_t, a_t, ok = inp
            # ab = (-kk) (kk * a)^T ; state [H, hs_v, hs_k]
            vk = v_t[..., :, None] * k_t[..., None, :]   # [S,H,hsv,hsk]
            sab = jnp.einsum("shij,shj,shl->shil", s, -kk_t, kk_t * a_t)
            s1 = s * w_t[..., None, :] + sab + vk
            s1 = jnp.where(ok[:, None, None, None], s1, s)
            out = jnp.einsum("shij,shj->shi", s1, r_t)   # [S,H,hsv]
            return s1, out

        tm = lambda z: jnp.moveaxis(z, 1, 0)  # noqa: E731
        s1, outs = jax.lax.scan(
            step, s0.astype(jnp.float32),
            (tm(rh), tm(wh), tm(kh), tm(vh), tm(kk), tm(ah), tm(valid)))
        y = jnp.moveaxis(outs, 0, 1)                     # [S, T, H, hs]

    gn = _group_norm(y, lp["tm_ln"], lp.get("tm_ln_b"), H, 64e-5)
    rk = lp["tm_rk"].astype(jnp.float32).reshape(H, hs)
    bonus = ((rh * kh * rk).sum(-1, keepdims=True) * vh).reshape(
        S_, T, E)
    out = mm(((gn + bonus) * g).astype(dt), lp["tm_o"])
    return out, shift1, s1, v_first


def is_rwkv(params) -> bool:
    gp = (params.get("layer_groups") or [params["layers"]])[0]
    return "tm_k" in gp


def rwkv_run_stack(params, cfg: ModelConfig, x, cache, seq_lens):
    """Scan the rwkv layer stack. x [S, T, E]; cache: RecCache with
    conv [L, S, 2, E] (att/ffn token-shift rows) and ssm
    [L, S, H, hs, hs]. Layer groups (rwkv7's layer 0 carries no v0/v1/v2
    LoRA) scan separately with the cross-layer v_first value anchor
    carried across groups. Returns (hidden, new RecCache)."""
    from .mamba import RecCache
    groups = params.get("layer_groups") or [params["layers"]]
    resc = cfg.rescale_every
    v_first = jnp.zeros_like(x, jnp.float32)
    off = 0
    conv_parts, ssm_parts = [], []
    for gp in groups:
        lead = gp["tm_ln"]
        n = lead.shape[0]
        is_v7 = "tm_w0" in gp
        has_v = "tm_v0" in gp

        def body(carry, inp, is_v7=is_v7, has_v=has_v):
            x, v_first = carry
            lp, conv0, ssm0, li = inp
            if not has_v:
                lp = dict(lp)
                lp.pop("tm_v0", None)
            h1 = _ln(x, lp["attn_norm"], lp.get("attn_norm_b"),
                     cfg.rms_eps)
            if is_v7:
                att, sa1, s1, v_first = _rwkv7_time_mix(
                    lp, h1, conv0[:, 0], ssm0, v_first, seq_lens, cfg)
            else:
                att, sa1, s1 = _rwkv6_time_mix(
                    lp, h1, conv0[:, 0], ssm0, seq_lens, cfg)
            x = x + att.astype(x.dtype)
            h2 = _ln(x, lp["attn_norm_2"], lp.get("attn_norm_2_b"),
                     cfg.rms_eps)
            ffn, sf1 = _rwkv6_channel_mix(lp, h2, conv0[:, 1], seq_lens,
                                          cfg)
            x = x + ffn.astype(x.dtype)
            if resc > 0:
                # llama.cpp: activations halve every rescale_every layers
                # (the converter pre-divides later layers' output
                # projections, so the composition matches the HF model)
                x = jnp.where((li + 1) % resc == 0, x * 0.5, x)
            conv1 = jnp.stack([sa1, sf1], axis=1)      # [S, 2, E]
            return (x, v_first), (conv1, s1)

        sl = slice(off, off + n)
        (x, v_first), (cn, sn) = jax.lax.scan(
            body, (x, v_first),
            (gp, cache.conv[sl], cache.ssm[sl],
             jnp.arange(off, off + n, dtype=jnp.int32)))
        conv_parts.append(cn)
        ssm_parts.append(sn)
        off += n
    conv_n = jnp.concatenate(conv_parts, 0)
    ssm_n = jnp.concatenate(ssm_parts, 0)
    return x, RecCache(conv=conv_n, ssm=ssm_n, k=cache.k, v=cache.v)
