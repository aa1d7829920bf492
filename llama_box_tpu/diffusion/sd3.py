"""SD3 / SD3.5 MMDiT (joint-attention DiT, rectified flow).

Parity target: the SD3-family support the reference inherits from
stable-diffusion.cpp (mmdit.hpp). Tensor names follow the SAI state dict
preserved under `model.diffusion_model.`:

    x_embedder.proj (2x2 patch conv), pos_embed (learned grid),
    t_embedder.mlp.{0,2}, y_embedder.mlp.{0,2}, context_embedder
    joint_blocks.N.{x_block, context_block}.{attn.qkv, attn.proj,
        mlp.fc1, mlp.fc2, adaLN_modulation.1} (+ attn.ln_q/ln_k rmsnorm
        in SD3.5; final context_block is pre_only: qkv but no proj)
    final_layer.{linear, adaLN_modulation.1}

Conditioning: CLIP-L + CLIP-G penultimate states (concat, zero-padded to
the T5 width) stacked with the T5 sequence; pooled CLIP projections form
the y vector. CFG with a real negative pass (SD3 is not distilled).

Flow matching rides the same sigma==t machinery as FLUX (scheduler.py /
flux.flow_sigmas with static shift=3.0).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import SRV_INF
from .sd_models import timestep_embedding


@dataclasses.dataclass(frozen=True)
class SD3Config:
    hidden: int
    n_heads: int
    n_blocks: int
    patch: int = 2
    pos_grid: int = 0        # trained pos_embed side length
    qk_norm: bool = False    # SD3.5


def _rms(x, scale):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) * scale


def _ln(x):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6)


def _mlp2(p, x):
    return jax.nn.silu(x @ p["w0"] + p["b0"]) @ p["w2"] + p["b2"]


def sd3_forward(params: dict, cfg: SD3Config, x: jnp.ndarray,
                ctx: jnp.ndarray, t: jnp.ndarray, y: jnp.ndarray
                ) -> jnp.ndarray:
    """x [h, w, C] latents, ctx [Lc, ctx_dim], t scalar, y [y_dim]
    -> velocity [h, w, C]."""
    H = cfg.n_heads
    h, w, C = x.shape
    ph, pw = h // cfg.patch, w // cfg.patch

    # patchify: 2x2 conv == linear on flattened patches
    xt = x.reshape(ph, cfg.patch, pw, cfg.patch, C).transpose(0, 2, 1, 3, 4)
    xt = xt.reshape(ph * pw, cfg.patch * cfg.patch * C)
    img = xt @ params["x_emb_w"] + params["x_emb_b"]

    # learned positional grid, center-cropped to this resolution
    if cfg.pos_grid:
        g = cfg.pos_grid
        pe = params["pos_embed"].reshape(g, g, -1)
        top, left = (g - ph) // 2, (g - pw) // 2
        img = img + pe[top:top + ph, left:left + pw].reshape(ph * pw, -1)

    vec = _mlp2(params["t_emb"], timestep_embedding(t * 1000.0, 256))
    vec = vec + _mlp2(params["y_emb"], y)
    svec = jax.nn.silu(vec)

    ctx = ctx @ params["ctx_emb_w"] + params["ctx_emb_b"]
    Lc = ctx.shape[0]
    D = cfg.hidden // H

    def attn_inner(q, k, v):
        s = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(D)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("hqk,khd->qhd", a, v).reshape(q.shape[0], -1)

    def stream_qkv(xs, mod, bp, pre):
        hst = _ln(xs) * (1 + mod[1]) + mod[0]
        qkv = hst @ bp[pre + "qkv_w"] + bp[pre + "qkv_b"]
        q, k, v = jnp.split(qkv.reshape(xs.shape[0], 3, H, D), 3, 1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]
        if cfg.qk_norm:
            q = _rms(q, bp[pre + "lnq"])
            k = _rms(k, bp[pre + "lnk"])
        return q, k, v

    def joint_block(carry, bp):
        ctx, img = carry
        cmod = (svec @ bp["c_mod_w"] + bp["c_mod_b"])
        xmod = (svec @ bp["x_mod_w"] + bp["x_mod_b"])
        pre_only = cmod.shape[0] == 2 * cfg.hidden
        cms = cmod.reshape(-1, cfg.hidden)
        xms = xmod.reshape(6, cfg.hidden)
        qc, kc, vc = stream_qkv(ctx, cms, bp, "c_")
        qx, kx, vx = stream_qkv(img, xms, bp, "x_")
        q = jnp.concatenate([qc, qx], 0)
        k = jnp.concatenate([kc, kx], 0)
        v = jnp.concatenate([vc, vx], 0)
        a = attn_inner(q, k, v)
        ac, ax = a[:Lc], a[Lc:]
        img = img + xms[2] * (ax @ bp["x_proj_w"] + bp["x_proj_b"])
        hx = _ln(img) * (1 + xms[4]) + xms[3]
        img = img + xms[5] * (jax.nn.gelu(
            hx @ bp["x_fc1_w"] + bp["x_fc1_b"], approximate=True)
            @ bp["x_fc2_w"] + bp["x_fc2_b"])
        if not pre_only:
            ctx = ctx + cms[2] * (ac @ bp["c_proj_w"] + bp["c_proj_b"])
            hc = _ln(ctx) * (1 + cms[4]) + cms[3]
            ctx = ctx + cms[5] * (jax.nn.gelu(
                hc @ bp["c_fc1_w"] + bp["c_fc1_b"], approximate=True)
                @ bp["c_fc2_w"] + bp["c_fc2_b"])
        return (ctx, img), None

    # blocks are heterogeneous only at the tail (pre_only context); run the
    # uniform prefix via scan, the final block eagerly
    (ctx, img), _ = jax.lax.scan(joint_block, (ctx, img),
                                 params["blocks"])
    (ctx, img), _ = joint_block((ctx, img), params["last_block"])

    fm = svec @ params["final_mod_w"] + params["final_mod_b"]
    shift, scale = jnp.split(fm, 2)
    img = _ln(img) * (1 + scale) + shift
    out = img @ params["final_w"] + params["final_b"]
    out = out.reshape(ph, pw, cfg.patch, cfg.patch, C)
    return out.transpose(0, 2, 1, 3, 4).reshape(h, w, C)


# -- loading -----------------------------------------------------------------


def _get(tree, path):
    node = tree
    for p in path.split("."):
        node = node[p]
    return node


def _wb(tree, path):
    n = _get(tree, path)
    return jnp.asarray(n["weight"]).T, jnp.asarray(n["bias"])


def is_sd3_tree(unet_tree: dict) -> bool:
    return "joint_blocks" in unet_tree


def load_sd3(unet_tree: dict) -> tuple[SD3Config, dict]:
    n_blocks = len(unet_tree["joint_blocks"])
    xw = _get(unet_tree, "x_embedder.proj")["weight"]   # [hid, C, p, p]
    hidden = xw.shape[0]
    patch = xw.shape[-1]
    b0 = unet_tree["joint_blocks"]["0"]["x_block"]
    qk_norm = "ln_q" in b0.get("attn", {})
    pos = unet_tree.get("pos_embed")
    pos_grid = 0
    if pos is not None:
        pe = jnp.asarray(pos).reshape(-1, hidden)
        pos_grid = int(round(math.sqrt(pe.shape[0])))
    # head count: head_dim from the SD3.5 qk-norm scale when present,
    # else the SAI default of 64
    if qk_norm:
        head_dim = int(np.asarray(b0["attn"]["ln_q"]["weight"]).shape[0])
    else:
        head_dim = min(64, hidden)
    n_heads = hidden // head_dim
    cfg = SD3Config(hidden=hidden, n_heads=n_heads, n_blocks=n_blocks,
                    patch=patch, pos_grid=pos_grid, qk_norm=qk_norm)

    C = xw.shape[1]
    params = {
        # conv [hid, C, p, p] -> linear [(p*p*C), hid] over patch-flattened
        # pixels laid out (py, px, c)
        "x_emb_w": jnp.asarray(np.transpose(np.asarray(xw), (2, 3, 1, 0))
                               .reshape(patch * patch * C, hidden)),
        "x_emb_b": jnp.asarray(_get(unet_tree, "x_embedder.proj")["bias"]),
        "t_emb": dict(zip(("w0", "b0", "w2", "b2"),
                          (*_wb(unet_tree, "t_embedder.mlp.0"),
                           *_wb(unet_tree, "t_embedder.mlp.2")))),
        "y_emb": dict(zip(("w0", "b0", "w2", "b2"),
                          (*_wb(unet_tree, "y_embedder.mlp.0"),
                           *_wb(unet_tree, "y_embedder.mlp.2")))),
    }
    cw, cb = _wb(unet_tree, "context_embedder")
    params["ctx_emb_w"], params["ctx_emb_b"] = cw, cb
    if pos is not None:
        params["pos_embed"] = jnp.asarray(pos).reshape(-1, hidden)

    def block_params(i):
        b = unet_tree["joint_blocks"][str(i)]
        d = {}
        for key, sub in (("c_", "context_block"), ("x_", "x_block")):
            blk = b[sub]
            mw, mb = _wb(blk, "adaLN_modulation.1")
            qw, qb = _wb(blk, "attn.qkv")
            d.update({key + "mod_w": mw, key + "mod_b": mb,
                      key + "qkv_w": qw, key + "qkv_b": qb})
            if "ln_q" in blk["attn"]:
                d[key + "lnq"] = jnp.asarray(blk["attn"]["ln_q"]["weight"])
                d[key + "lnk"] = jnp.asarray(blk["attn"]["ln_k"]["weight"])
            elif qk_norm:
                hd = cfg.hidden // cfg.n_heads
                d[key + "lnq"] = jnp.ones((hd,))
                d[key + "lnk"] = jnp.ones((hd,))
            if "proj" in blk["attn"]:
                pw, pb = _wb(blk, "attn.proj")
                f1w, f1b = _wb(blk, "mlp.fc1")
                f2w, f2b = _wb(blk, "mlp.fc2")
            else:   # pre_only context tail: dead weights keep scan uniform
                pw = jnp.zeros((cfg.hidden, cfg.hidden))
                pb = jnp.zeros((cfg.hidden,))
                f1w = jnp.zeros((cfg.hidden, 4 * cfg.hidden))
                f1b = jnp.zeros((4 * cfg.hidden,))
                f2w = jnp.zeros((4 * cfg.hidden, cfg.hidden))
                f2b = jnp.zeros((cfg.hidden,))
            d.update({key + "proj_w": pw, key + "proj_b": pb,
                      key + "fc1_w": f1w, key + "fc1_b": f1b,
                      key + "fc2_w": f2w, key + "fc2_b": f2b})
        return d

    blocks = [block_params(i) for i in range(n_blocks - 1)]
    params["blocks"] = ({k: jnp.stack([bp[k] for bp in blocks])
                         for k in blocks[0]} if blocks else {})
    params["last_block"] = block_params(n_blocks - 1)

    fw, fb = _wb(unet_tree, "final_layer.linear")
    mw, mb = _wb(unet_tree, "final_layer.adaLN_modulation.1")
    params.update({"final_w": fw, "final_b": fb,
                   "final_mod_w": mw, "final_mod_b": mb})
    SRV_INF("sd3", "mmdit: hidden=%d heads=%d blocks=%d patch=%d "
            "qk_norm=%s pos_grid=%d", hidden, n_heads, n_blocks, patch,
            qk_norm, pos_grid)
    return cfg, params


# -- pipeline assembly -------------------------------------------------------

SD3_VAE_SCALE = 1.5305
SD3_VAE_SHIFT = 0.0609


def build_sd3_pipeline(path: str, tokenizer=None, t5_path: str = None,
                       clip_l_path: str = None, clip_g_path: str = None,
                       vae_path: str = None, t5_tokenizer=None,
                       dtype=jnp.float32):
    """SD3 GGUF(s) -> streaming DiffusionPipeline (CFG-capable flow)."""
    from functools import partial

    from .flux import flow_sigmas
    from .pipeline import DiffusionPipeline
    from .sd_models import clip_text_encode, load_sd, vae_decode, \
        vae_encode_scaled

    trees = load_sd(path, dtype)
    if not is_sd3_tree(trees["unet"]):
        raise ValueError(f"{path}: not an SD3 checkpoint")
    cfg, sparams = load_sd3(trees["unet"])

    def _component_tree(p, strip_prefixes, want_key=None):
        if not p:
            return None
        from ..gguf.reader import GGUFFile
        from .sd_models import _tree_insert
        tree = {}
        with GGUFFile(p) as g:
            for name in g.tensors:
                nm = name
                for pre in strip_prefixes:
                    if nm.startswith(pre):
                        nm = nm[len(pre):]
                _tree_insert(tree, nm, jnp.asarray(g.tensor_f32(name),
                                                   dtype))
        return tree

    vae_tree = trees["vae"] or _component_tree(
        vae_path, ("first_stage_model.", "vae.", "ae."))
    if not vae_tree:
        raise ValueError("SD3 needs a VAE: pass --image-vae-model")

    def _clip_tree(p, bundled_key=None):
        t = trees["text"].get(bundled_key) if bundled_key else None
        if t:
            return {"transformer": t} if "transformer" not in t else t
        tree = _component_tree(p, ("cond_stage_model.",
                                   "text_encoders.clip_l.",
                                   "text_encoders.clip_g."))
        if tree and "transformer" not in tree:
            tree = {"transformer": tree}
        return tree

    clip_l = trees["text"] or _clip_tree(clip_l_path)
    clip_g = _clip_tree(clip_g_path, bundled_key="1") \
        or (trees["text"].get("1") and
            {"transformer": trees["text"]["1"]["transformer"],
             "text_projection": trees["text"]["1"].get("transformer", {})
             .get("text_projection")})

    t5_cfg = t5_params = None
    if t5_path:
        from ..models.t5 import load_t5
        t5_cfg, t5_params = load_t5(t5_path, dtype)

    ctx_dim = sparams["ctx_emb_w"].shape[0]
    y_dim = sparams["y_emb"]["w0"].shape[0]
    fwd = jax.jit(partial(sd3_forward, sparams, cfg))

    def encode_one(prompt: str):
        parts, pools = [], []
        for tree in (clip_l, clip_g):
            if tree is None or tokenizer is None:
                continue
            ids = np.asarray(tokenizer(prompt), np.int32)
            hs, pooled = clip_text_encode(tree, ids, penultimate=True,
                                          projection=True)
            parts.append(np.asarray(hs, np.float32))
            pools.append(np.asarray(pooled, np.float32))
        Lc = parts[0].shape[0] if parts else 77
        clip_ctx = np.zeros((Lc, ctx_dim), np.float32)
        if parts:
            cat = np.concatenate(parts, -1)
            clip_ctx[:, :min(cat.shape[1], ctx_dim)] = \
                cat[:, :ctx_dim]
        if t5_params is not None:
            from ..models.t5 import t5_encode
            tok5 = t5_tokenizer or tokenizer
            ids5 = [i % t5_cfg.vocab_size for i in
                    (list(tok5(prompt))[:77] if tok5 else [])]
            n = len(ids5)
            ids5 = ids5 + [0] * (77 - n)
            t5h = np.asarray(t5_encode(t5_params, t5_cfg,
                                       jnp.asarray(ids5, jnp.int32),
                                       valid_len=n), np.float32)
            t5_ctx = np.zeros((77, ctx_dim), np.float32)
            t5_ctx[:, :min(t5h.shape[1], ctx_dim)] = t5h[:, :ctx_dim]
        else:
            t5_ctx = np.zeros((77, ctx_dim), np.float32)
        ctx = jnp.asarray(np.concatenate([clip_ctx, t5_ctx], 0), dtype)
        y = np.zeros((y_dim,), np.float32)
        if pools:
            pcat = np.concatenate(pools)
            y[:min(pcat.shape[0], y_dim)] = pcat[:y_dim]
        return (ctx, jnp.asarray(y, dtype))

    def text_encode(prompt, negative):
        return (encode_one(prompt), encode_one(negative or ""))

    def denoiser(x, sigma, cond):
        ctx, y = cond
        return fwd(jnp.asarray(x, dtype), ctx, jnp.float32(float(sigma)),
                   y).astype(jnp.float32)

    vae_dec = jax.jit(lambda z: vae_decode(vae_tree, z,
                                           scale=SD3_VAE_SCALE,
                                           shift=SD3_VAE_SHIFT))

    def venc(img):
        return vae_encode_scaled(vae_tree, jnp.asarray(img, dtype),
                                 scale=SD3_VAE_SCALE, shift=SD3_VAE_SHIFT)

    return DiffusionPipeline(
        text_encode, denoiser, vae_dec, venc, latent_channels=16,
        latent_scale=8, supports_negative=True, flow=True,
        sigma_fn=lambda n, hw: flow_sigmas(n, shift=3.0))