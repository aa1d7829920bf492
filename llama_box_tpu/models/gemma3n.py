"""gemma3n (MatFormer) text stack: AltUp streams, Laurel residuals,
per-layer embeddings, KV-shared tail layers, activation sparsity.

Reference behavior: transformers Gemma3nTextModel (the golden in
tests/test_arch_goldens.py); the reference server runs this family through
its vendored llama.cpp gemma3n graph. Design notes for the TPU port:

- the hidden state is a STACK of altup_num_inputs streams — it cannot ride
  llama.py's [B, T, E] scan carry, so the stack runs as an UNROLLED Python
  loop (L ~ 30; same compile scale as the diffusion transformers)
- entered from llama.py:_run_stack via a params dispatch, so every engine
  path (prefill single/batch/embed, decode, decode chain, verify) works
  unchanged
- KV-shared layers (the last num_kv_shared_layers) reuse the post-rope
  K/V rows computed by the LAST non-shared layer of the same attention
  type; the rows are DUPLICATED into the shared layers' cache slots so the
  uniform [L, ...] cache layout, context shift, and the fused post-scan
  scatter all stay unchanged
- per-layer token embeddings arrive CONCATENATED onto the embedding
  channels by _embed_tokens (the [B,T,E] plumbing between embed and stack
  carries E + L*P channels for this arch); embedding-chunk prefill
  (vision) carries plain E channels and uses the projection-only path,
  matching HF's per_layer_inputs=None branch
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.norm import rms_norm
from ..ops.qmatmul import mm
from .config import ModelConfig


def _g3n_norm(x, w, eps):
    """Gemma3nRMSNorm: plain multiplicative weight (NOT zero-centered)."""
    return rms_norm(x, w, eps)


def _g3n_norm_nw(x, eps):
    """Weightless RMS normalize (v_norm, with_scale=False)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, -1, keepdims=True) + eps)).astype(x.dtype)


def _magnitude_match(ref, x, eps=1e-5):
    """Scale x so its per-token RMS matches ref's (HF altup projections)."""
    tgt = jnp.sqrt(jnp.mean(jnp.square(ref.astype(jnp.float32)), -1,
                            keepdims=True))
    new = jnp.sqrt(jnp.maximum(
        jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True),
        eps))
    return (x.astype(jnp.float32) * tgt / new).astype(x.dtype)


def kv_share_sources(cfg: ModelConfig) -> list[int]:
    """Per-layer cache-source index: l for normal layers; for the last
    num_kv_shared_layers, the last NON-shared layer of the same attention
    type (sliding vs full, (idx+1) % swa_pattern)."""
    L = cfg.n_layers
    shared = int(cfg.extra.get("g3n_kv_shared", 0))
    first = L - shared
    pat = max(cfg.swa_pattern, 1)
    src = list(range(L))
    for l in range(first, L):
        typ = (l + 1) % pat != 0
        for j in range(first - 1, -1, -1):
            if ((j + 1) % pat != 0) == typ:
                src[l] = j
                break
    return src


def _sparsity_cutoffs(cfg: ModelConfig) -> list[float]:
    import statistics
    pat = cfg.extra.get("g3n_act_sparsity", ())
    out = []
    for p in list(pat) + [0.0] * (cfg.n_layers - len(pat)):
        out.append(statistics.NormalDist().inv_cdf(p) if p > 0.0 else None)
    return out


def g3n_run_stack(params, cfg: ModelConfig, x, positions, kv_k, kv_v, mask,
                  cos, sin, kv_ks=None, kv_vs=None, deferred_kv=False,
                  emit_rows=False, flash_meta=None, chain=None):
    """Mirror of llama._run_stack's contract for the gemma3n stack."""
    from .llama import _attn_deferred, _ln_per_head  # noqa: F401 (cycle)
    quant = kv_ks is not None
    L = cfg.n_layers
    E = cfg.n_embd
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    eps = cfg.rms_eps
    layers = params["layers"]
    N = layers["altup_predict_coef"].shape[-2]   # [L, N, N*N] (transposed)
    P = params["per_layer_proj_norm"].shape[-1]
    B, T = positions.shape
    nc = chain[4] if chain is not None else None
    src_of = kv_share_sources(cfg)
    cutoffs = _sparsity_cutoffs(cfg)

    # -- per-layer inputs ----------------------------------------------------
    if x.shape[-1] > E:   # token path: per-layer embeddings concatenated
        x, ple_tok = x[..., :E], x[..., E:].reshape(B, T, L, P)
    else:
        ple_tok = None
    proj = mm(x, params["per_layer_model_proj"]) \
        .astype(jnp.float32) * (E ** -0.5)
    proj = proj.reshape(B, T, L, P)
    proj = _g3n_norm(proj, params["per_layer_proj_norm"], eps)
    if ple_tok is not None:
        per_layer = ((proj + ple_tok.astype(jnp.float32))
                     * (2.0 ** -0.5)).astype(x.dtype)
    else:
        per_layer = proj.astype(x.dtype)

    # -- altup stream init ---------------------------------------------------
    streams = [x]
    for i in range(N - 1):
        p = mm(x, params["altup_proj"][i])
        streams.append(_magnitude_match(x, p))

    rows_k, rows_v, rows_ks, rows_vs = [], [], [], []
    computed = {}

    for l in range(L):
        lp = {k: v[l] for k, v in layers.items()}
        is_local = (l + 1) % max(cfg.swa_pattern, 1) != 0
        active = streams[0]

        # altup predict
        rn = _g3n_norm(active, lp["altup_router_norm"], eps) * (E ** -1.0)
        mods = jnp.tanh(mm(rn, lp["altup_router"]).astype(jnp.float32))
        coefs = mm(mods.astype(active.dtype), lp["altup_predict_coef"]) \
            .reshape(B, T, N, N)
        hs = jnp.stack(streams, -1).astype(jnp.float32)      # [B,T,E,N]
        # HF: matmul(h [B,T,E,N], coefs.permute(0,1,3,2)) + h
        pred = jnp.einsum("bten,btmn->btem", hs,
                          coefs.astype(jnp.float32)) + hs
        predictions = [pred[..., i].astype(active.dtype) for i in range(N)]
        act_pred = predictions[0]

        h = _g3n_norm(act_pred, lp["attn_norm"], eps)

        # laurel
        lau = mm(mm(h, lp["laurel_l"]), lp["laurel_r"])
        lau = h + _g3n_norm(lau, lp["laurel_post_norm"], eps)

        # attention (scale 1.0; per-head q/k norms; weightless v norm)
        q = mm(h, lp["wq"]).reshape(B, T, H, D)
        q = _g3n_norm(q, lp["q_norm"], eps)
        ci = cos[1] if is_local else cos[0]
        si = sin[1] if is_local else sin[0]
        from ..ops.rope import apply_rope
        q = apply_rope(q, positions, ci, si, cfg.rope_mode)
        if src_of[l] == l:
            k = mm(h, lp["wk"]).reshape(B, T, Hkv, D)
            k = _g3n_norm(k, lp["k_norm"], eps)
            k = apply_rope(k, positions, ci, si, cfg.rope_mode)
            v = mm(h, lp["wv"]).reshape(B, T, Hkv, D)
            v = _g3n_norm_nw(v, eps)
            computed[l] = (k, v)
        else:
            k, v = computed[src_of[l]]

        mask_l = mask[1] if (mask.ndim == 4 and is_local) else (
            mask[0] if mask.ndim == 4 else mask)
        lchain = None
        if chain is not None:
            if quant:
                lchain = (chain[0][l], chain[1][l], chain[2][l],
                          chain[3][l], nc)
            else:
                lchain = (chain[0][l], chain[1][l], None, None, nc)
        attn, rows = _attn_deferred(
            h, lp, positions, kv_k[l], kv_v[l], mask_l, cfg, q, k, v,
            jnp.int32(1 if is_local else 0),
            kv_ks[l] if quant else None, kv_vs[l] if quant else None,
            None, flash_meta=flash_meta, chain=lchain, tail=False)
        if quant:
            rows_k.append(rows[0])
            rows_v.append(rows[1])
            rows_ks.append(rows[2])
            rows_vs.append(rows[3])
        else:
            rows_k.append(rows[0])
            rows_v.append(rows[1])

        attn = mm(attn.astype(x.dtype), lp["wo"])
        attn = _g3n_norm(attn, lp["attn_post_norm"], eps)
        attn_gated = act_pred + attn
        attn_laurel = (attn_gated + lau) * (2.0 ** -0.5)

        # MLP with optional gaussian-topk activation sparsity
        hf_ = _g3n_norm(attn_laurel, lp["ffn_norm"], eps)
        gate = mm(hf_, lp["w_gate"]).astype(jnp.float32)
        if cutoffs[l] is not None:
            mu = gate.mean(-1, keepdims=True)
            sd = jnp.sqrt(jnp.mean(jnp.square(gate - mu), -1,
                                   keepdims=True))
            gate = jax.nn.relu(gate - (mu + sd * cutoffs[l]))
        ffw = (jax.nn.gelu(gate, approximate=True)
               * mm(hf_, lp["w_up"]).astype(jnp.float32)).astype(x.dtype)
        ffw = mm(ffw, lp["w_down"])
        ffw = _g3n_norm(ffw, lp["ffn_post_norm"], eps)
        activated = attn_laurel + ffw

        # altup correct
        rn2 = _g3n_norm(activated, lp["altup_router_norm"], eps) * (E ** -1.0)
        mods2 = jnp.tanh(mm(rn2, lp["altup_router"]).astype(jnp.float32))
        ccoefs = mm(mods2.astype(active.dtype), lp["altup_correct_coef"]) \
            .astype(jnp.float32) + 1.0                        # [B,T,N]
        innovation = (activated - predictions[0]).astype(jnp.float32)
        corrected = [
            (innovation * ccoefs[..., i:i + 1]
             + predictions[i].astype(jnp.float32)).astype(x.dtype)
            for i in range(N)]

        first = corrected[0]
        if "altup_correct_scale" in lp:
            first = (first.astype(jnp.float32)
                     * lp["altup_correct_scale"]).astype(x.dtype)
        g = jax.nn.gelu(mm(first, lp["ple_gate"]).astype(jnp.float32),
                        approximate=True)
        g = g * per_layer[:, :, l].astype(jnp.float32)
        g = mm(g.astype(x.dtype), lp["ple_proj"])
        g = _g3n_norm(g, lp["ple_post_norm"], eps)
        streams = [corrected[0]] + [
            (corrected[i].astype(jnp.float32)
             + g.astype(jnp.float32)).astype(x.dtype)
            for i in range(1, N)]

    # -- merge streams ---------------------------------------------------
    outs = [streams[0]]
    for i in range(1, N):
        u = mm(streams[i], params["altup_unembed_proj"][i - 1])
        outs.append(_magnitude_match(streams[0], u))
    x = jnp.mean(jnp.stack(outs, 0).astype(jnp.float32), 0).astype(x.dtype)

    # -- emit rows / scatter (same contract as _run_stack) ----------------
    if quant:
        rows = (jnp.stack(rows_k, 0), jnp.stack(rows_v, 0),
                jnp.stack(rows_ks, 0), jnp.stack(rows_vs, 0))
    else:
        rows = (jnp.stack(rows_k, 0), jnp.stack(rows_v, 0))
    if deferred_kv and emit_rows:
        return x, rows
    li = jnp.arange(L)[:, None, None]
    bi = jnp.arange(B)[None, :, None]
    pi = jnp.broadcast_to(positions[None], (L, B, T))
    if quant:
        kq, vq, ksr, vsr = rows
        out = (kv_k.at[li, bi, pi].set(kq, mode="drop"),
               kv_v.at[li, bi, pi].set(vq, mode="drop"),
               kv_ks.at[li, bi, pi].set(ksr, mode="drop"),
               kv_vs.at[li, bi, pi].set(vsr, mode="drop"))
        return (x,) + out
    kr, vr = rows
    return (x, kv_k.at[li, bi, pi].set(kr.astype(kv_k.dtype), mode="drop"),
            kv_v.at[li, bi, pi].set(vr.astype(kv_v.dtype), mode="drop"),
            None, None)
