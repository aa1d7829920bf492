"""FLUX rectified-flow transformer (MMDiT double+single streams).

Parity target: the FLUX.1 support the reference gets from
stable-diffusion.cpp (z_stablediffusion.hpp loads flux GGUFs through the
same sd-model dispatch; flux.hpp in sd.cpp). Tensor names follow the
Black-Forest-Labs state dict that sd.cpp preserves under
`model.diffusion_model.`:

    img_in / txt_in / time_in / vector_in / guidance_in
    double_blocks.N.{img,txt}_{mod.lin, attn.qkv, attn.norm.*_norm.scale,
                              attn.proj, mlp.0, mlp.2}
    single_blocks.N.{linear1, linear2, modulation.lin, norm.*_norm.scale}
    final_layer.{linear, adaLN_modulation.1}

TPU mapping: the whole sampling step (pack -> transformer -> unpack) jits
into one XLA program; attention over the concatenated txt+img sequence is
one big MXU matmul per block; rectified flow reuses the k-diffusion
machinery (scheduler.py) because with sigma := t the velocity IS the eps
parametrization: x_t = (1-t)x0 + t*n, denoised = x - t*v.
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
class FluxConfig:
    hidden: int
    n_heads: int
    n_double: int
    n_single: int
    axes_dim: tuple = (16, 56, 56)    # rope dims per (t, y, x) axis
    theta: float = 10000.0
    guidance_embed: bool = True       # flux-dev; schnell has none

    @property
    def head_dim(self) -> int:
        return self.hidden // self.n_heads


def _rope_angles(ids: jnp.ndarray, axes_dim, theta: float) -> jnp.ndarray:
    """ids [N, 3] -> (cos, sin) [N, head_dim/2] built per axis segment."""
    parts_c, parts_s = [], []
    for ax, d in enumerate(axes_dim):
        half = d // 2
        freqs = theta ** (-jnp.arange(half) / half)
        ang = ids[:, ax:ax + 1].astype(jnp.float32) * freqs[None, :]
        parts_c.append(jnp.cos(ang))
        parts_s.append(jnp.sin(ang))
    return jnp.concatenate(parts_c, -1), jnp.concatenate(parts_s, -1)


def _apply_rope(x, cos, sin):
    """x [N, H, D] with D/2 rotation pairs interleaved (BFL convention:
    adjacent pairs)."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    c, s = cos[:, None, :], sin[:, None, :]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], -1)
    return out.reshape(x.shape)


def _rms(x, scale):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) * scale


def _mlp_embed(p, x):
    return silu(x @ p["in_w"] + p["in_b"]) @ p["out_w"] + p["out_b"]


def silu(x):
    return jax.nn.silu(x)


def _attention(q, k, v, cos, sin):
    """q/k/v [N, H, D] over the joint txt+img sequence."""
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    s = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(q.shape[-1])
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("hqk,khd->qhd", a, v).reshape(q.shape[0], -1)


def flux_forward(params: dict, cfg: FluxConfig, img: jnp.ndarray,
                 img_ids: jnp.ndarray, txt: jnp.ndarray, t: jnp.ndarray,
                 y: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
    """img [Li, 64] packed latents, txt [Lt, t5_dim], t/guidance scalars,
    y [clip_dim] pooled -> velocity [Li, 64]."""
    H, D = cfg.n_heads, cfg.head_dim
    Lt = txt.shape[0]

    vec = _mlp_embed(params["time_in"], timestep_embedding(t * 1000.0, 256))
    if cfg.guidance_embed:
        vec = vec + _mlp_embed(params["guidance_in"],
                               timestep_embedding(guidance * 1000.0, 256))
    vec = vec + _mlp_embed(params["vector_in"], y)
    svec = silu(vec)

    img = img @ params["img_in_w"] + params["img_in_b"]
    txt = txt @ params["txt_in_w"] + params["txt_in_b"]

    txt_ids = jnp.zeros((Lt, 3), jnp.int32)
    ids = jnp.concatenate([txt_ids, img_ids], 0)
    cos, sin = _rope_angles(ids, cfg.axes_dim, cfg.theta)

    def ln(x):  # non-affine layernorm (modulation supplies shift/scale)
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6)

    def double_block(carry, bp):
        img, txt = carry
        im = svec @ bp["img_mod_w"] + bp["img_mod_b"]   # [6*hidden]
        tm = svec @ bp["txt_mod_w"] + bp["txt_mod_b"]
        ims = im.reshape(6, -1)
        tms = tm.reshape(6, -1)

        def qkv(x, mod, w, b, qn, kn):
            h = ln(x) * (1 + mod[1]) + mod[0]
            out = h @ w + b
            q, k, v = jnp.split(out.reshape(x.shape[0], 3, H, D), 3, 1)
            q, k, v = q[:, 0], k[:, 0], v[:, 0]
            return _rms(q, qn), _rms(k, kn), v, h

        qi, ki, vi, _ = qkv(img, ims, bp["img_qkv_w"], bp["img_qkv_b"],
                            bp["img_qnorm"], bp["img_knorm"])
        qt, kt, vt, _ = qkv(txt, tms, bp["txt_qkv_w"], bp["txt_qkv_b"],
                            bp["txt_qnorm"], bp["txt_knorm"])
        q = jnp.concatenate([qt, qi], 0)
        k = jnp.concatenate([kt, ki], 0)
        v = jnp.concatenate([vt, vi], 0)
        attn = _attention(q, k, v, cos, sin)
        ta, ia = attn[:Lt], attn[Lt:]
        img = img + ims[2] * (ia @ bp["img_proj_w"] + bp["img_proj_b"])
        txt = txt + tms[2] * (ta @ bp["txt_proj_w"] + bp["txt_proj_b"])

        def mlp(x, mod, w0, b0, w2, b2):
            h = ln(x) * (1 + mod[4]) + mod[3]
            return mod[5] * (jax.nn.gelu(h @ w0 + b0, approximate=True)
                             @ w2 + b2)

        img = img + mlp(img, ims, bp["img_mlp0_w"], bp["img_mlp0_b"],
                        bp["img_mlp2_w"], bp["img_mlp2_b"])
        txt = txt + mlp(txt, tms, bp["txt_mlp0_w"], bp["txt_mlp0_b"],
                        bp["txt_mlp2_w"], bp["txt_mlp2_b"])
        return (img, txt), None

    (img, txt), _ = jax.lax.scan(double_block, (img, txt),
                                 params["double_blocks"])

    x = jnp.concatenate([txt, img], 0)

    def single_block(x, bp):
        mod = (svec @ bp["mod_w"] + bp["mod_b"]).reshape(3, -1)
        h = ln(x) * (1 + mod[1]) + mod[0]
        lin1 = h @ bp["lin1_w"] + bp["lin1_b"]
        qkv_flat, mlp_h = lin1[:, :3 * cfg.hidden], lin1[:, 3 * cfg.hidden:]
        q, k, v = jnp.split(qkv_flat.reshape(x.shape[0], 3, H, D), 3, 1)
        q = _rms(q[:, 0], bp["qnorm"])
        k = _rms(k[:, 0], bp["knorm"])
        attn = _attention(q, k, v[:, 0], cos, sin)
        out = jnp.concatenate(
            [attn, jax.nn.gelu(mlp_h, approximate=True)], -1)
        return x + mod[2] * (out @ bp["lin2_w"] + bp["lin2_b"]), None

    x, _ = jax.lax.scan(single_block, x, params["single_blocks"])
    x = x[Lt:]

    fm = svec @ params["final_mod_w"] + params["final_mod_b"]
    shift, scale = jnp.split(fm, 2)
    x = ln(x) * (1 + scale) + shift
    return x @ params["final_w"] + params["final_b"]


# -- latent packing ----------------------------------------------------------


def pack_latents(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[h, w, C] -> tokens [(h/2)*(w/2), 4C] + ids [(h/2)*(w/2), 3]."""
    h, w, C = z.shape
    zt = z.reshape(h // 2, 2, w // 2, 2, C).transpose(0, 2, 1, 3, 4)
    tokens = zt.reshape(h // 2 * (w // 2), 4 * C)
    ys, xs = jnp.meshgrid(jnp.arange(h // 2), jnp.arange(w // 2),
                          indexing="ij")
    ids = jnp.stack([jnp.zeros_like(ys), ys, xs], -1).reshape(-1, 3)
    return tokens, ids


def unpack_latents(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """tokens [(h/2)*(w/2), 4C] -> [h, w, C]."""
    C4 = tokens.shape[-1]
    zt = tokens.reshape(h // 2, w // 2, 2, 2, C4 // 4)
    return zt.transpose(0, 2, 1, 3, 4).reshape(h, w, C4 // 4)


# -- loading -----------------------------------------------------------------


def _get(tree: dict, path: str):
    node = tree
    for p in path.split("."):
        node = node[p]
    return node


def _wb(tree, path):
    n = _get(tree, path)
    return jnp.asarray(n["weight"]).T, jnp.asarray(n["bias"])


def _embed_tree(tree, path):
    iw, ib = _wb(tree, path + ".in_layer")
    ow, ob = _wb(tree, path + ".out_layer")
    return {"in_w": iw, "in_b": ib, "out_w": ow, "out_b": ob}


def load_flux(unet_tree: dict) -> tuple[FluxConfig, dict]:
    """model.diffusion_model.* subtree (from sd_models.load_sd) ->
    (FluxConfig, params) for flux_forward."""
    n_double = len(unet_tree.get("double_blocks", {}))
    n_single = len(unet_tree.get("single_blocks", {}))
    img_in_w, img_in_b = _wb(unet_tree, "img_in")
    hidden = img_in_w.shape[1]
    # head_dim comes straight from the per-head QK-norm scale length
    if n_double:
        qn = _get(unet_tree, "double_blocks.0.img_attn.norm.query_norm")
    else:
        qn = _get(unet_tree, "single_blocks.0.norm.query_norm")
    head_dim = int(np.asarray(qn["scale"]).shape[0])
    n_heads = hidden // head_dim
    # tiny test fixtures use small dims; derive axes from head_dim
    if head_dim == 128:
        axes = (16, 56, 56)
    else:
        q = head_dim // 8
        axes = (head_dim - 4 * q - 4 * q, 4 * q, 4 * q)
    cfg = FluxConfig(hidden=hidden, n_heads=n_heads, n_double=n_double,
                     n_single=n_single, axes_dim=axes,
                     guidance_embed="guidance_in" in unet_tree)

    txt_in_w, txt_in_b = _wb(unet_tree, "txt_in")
    params = {
        "img_in_w": img_in_w, "img_in_b": img_in_b,
        "txt_in_w": txt_in_w, "txt_in_b": txt_in_b,
        "time_in": _embed_tree(unet_tree, "time_in"),
        "vector_in": _embed_tree(unet_tree, "vector_in"),
    }
    if cfg.guidance_embed:
        params["guidance_in"] = _embed_tree(unet_tree, "guidance_in")

    def stack(items):
        return {k: jnp.stack([it[k] for it in items])
                for k in items[0]} if items else {}

    dbl = []
    for i in range(n_double):
        b = unet_tree["double_blocks"][str(i)]
        d = {}
        for pre in ("img", "txt"):
            mw, mb = _wb(b, f"{pre}_mod.lin")
            qw, qb = _wb(b, f"{pre}_attn.qkv")
            pw, pb = _wb(b, f"{pre}_attn.proj")
            m0w, m0b = _wb(b, f"{pre}_mlp.0")
            m2w, m2b = _wb(b, f"{pre}_mlp.2")
            d.update({
                f"{pre}_mod_w": mw, f"{pre}_mod_b": mb,
                f"{pre}_qkv_w": qw, f"{pre}_qkv_b": qb,
                f"{pre}_proj_w": pw, f"{pre}_proj_b": pb,
                f"{pre}_mlp0_w": m0w, f"{pre}_mlp0_b": m0b,
                f"{pre}_mlp2_w": m2w, f"{pre}_mlp2_b": m2b,
                f"{pre}_qnorm": jnp.asarray(
                    _get(b, f"{pre}_attn.norm.query_norm")["scale"]),
                f"{pre}_knorm": jnp.asarray(
                    _get(b, f"{pre}_attn.norm.key_norm")["scale"]),
            })
        dbl.append(d)
    params["double_blocks"] = stack(dbl)

    sgl = []
    for i in range(n_single):
        b = unet_tree["single_blocks"][str(i)]
        l1w, l1b = _wb(b, "linear1")
        l2w, l2b = _wb(b, "linear2")
        mw, mb = _wb(b, "modulation.lin")
        sgl.append({
            "lin1_w": l1w, "lin1_b": l1b, "lin2_w": l2w, "lin2_b": l2b,
            "mod_w": mw, "mod_b": mb,
            "qnorm": jnp.asarray(_get(b, "norm.query_norm")["scale"]),
            "knorm": jnp.asarray(_get(b, "norm.key_norm")["scale"]),
        })
    params["single_blocks"] = stack(sgl)

    fw, fb = _wb(unet_tree, "final_layer.linear")
    mw, mb = _wb(unet_tree, "final_layer.adaLN_modulation.1")
    params.update({"final_w": fw, "final_b": fb,
                   "final_mod_w": mw, "final_mod_b": mb})
    SRV_INF("flux", "flux transformer: hidden=%d heads=%d double=%d "
            "single=%d guidance=%s", hidden, n_heads, n_double, n_single,
            cfg.guidance_embed)
    return cfg, params


def is_flux_tree(unet_tree: dict) -> bool:
    return "double_blocks" in unet_tree or "single_blocks" in unet_tree


# -- flow-matching schedule --------------------------------------------------


def flow_sigmas(n_steps: int, shift: float = 3.0,
                image_seq_len: int | None = None) -> np.ndarray:
    """Rectified-flow sigma ladder: sigma == t from 1 -> 0 with timestep
    shifting (sd.cpp/BFL: t' = shift*t / (1 + (shift-1)*t)); flux-dev uses
    a resolution-dependent shift derived from the packed sequence length."""
    if image_seq_len is not None:
        # BFL dynamic shifting: mu interpolates between 0.5 (256 tokens)
        # and 1.15 (4096 tokens); shift = exp(mu)
        m = (1.15 - 0.5) / (4096 - 256)
        mu = 0.5 + m * (image_seq_len - 256)
        shift = float(np.exp(mu))
    t = np.linspace(1.0, 1.0 / n_steps, n_steps)
    t = shift * t / (1.0 + (shift - 1.0) * t)
    return np.concatenate([t, [0.0]]).astype(np.float32)


# -- pipeline assembly -------------------------------------------------------

FLUX_VAE_SCALE = 0.3611
FLUX_VAE_SHIFT = 0.1159
T5_SEQ_LEN = 256      # flux-dev conditioning length (schnell also 256)


def build_flux_pipeline(path: str, tokenizer=None, t5_path: str = None,
                        clip_l_path: str = None, vae_path: str = None,
                        t5_tokenizer=None, guidance: float = 3.5,
                        dtype=jnp.float32):
    """FLUX GGUF(s) -> streaming DiffusionPipeline.

    path: the transformer checkpoint (may also bundle clip/t5/vae trees);
    t5_path/clip_l_path/vae_path: the reference's separate component
    files (--image-t5xxl-model / --image-clip-l-model /
    --image-vae-model). tokenizer: CLIP BPE for the pooled stream;
    t5_tokenizer: optional SPM for the T5 stream (falls back to the CLIP
    tokenizer ids — degraded but functional conditioning)."""
    from functools import partial

    from .pipeline import DiffusionPipeline
    from .sd_models import clip_text_encode, load_sd, vae_decode, \
        vae_encode_scaled

    trees = load_sd(path, dtype)
    if not is_flux_tree(trees["unet"]):
        raise ValueError(f"{path}: not a FLUX checkpoint")
    cfg, fparams = load_flux(trees["unet"])

    def _subtree(p, want_key):
        t = load_sd(p, dtype) if p else None
        return t[want_key] if t else None

    vae_tree = trees["vae"] or _subtree(vae_path, "vae")
    if not vae_tree and vae_path:
        # standalone VAE files may carry bare decoder./encoder. names
        from .sd_models import _tree_insert
        from ..gguf.reader import GGUFFile
        vae_tree = {}
        with GGUFFile(vae_path) as g:
            for name in g.tensors:
                nm = name
                for pre in ("first_stage_model.", "vae.", "ae."):
                    if nm.startswith(pre):
                        nm = nm[len(pre):]
                _tree_insert(vae_tree, nm, jnp.asarray(g.tensor_f32(name),
                                                       dtype))
    if not vae_tree:
        raise ValueError("FLUX needs a VAE: pass --image-vae-model")

    clip_tree = trees["text"] or _subtree(clip_l_path, "text")
    if not clip_tree and clip_l_path:
        from .sd_models import _tree_insert
        from ..gguf.reader import GGUFFile
        clip_tree = {}
        with GGUFFile(clip_l_path) as g:
            for name in g.tensors:
                nm = name
                for pre in ("cond_stage_model.", "text_encoders.clip_l."):
                    if nm.startswith(pre):
                        nm = nm[len(pre):]
                if not nm.startswith("transformer."):
                    nm = "transformer." + nm
                _tree_insert(clip_tree, nm, jnp.asarray(g.tensor_f32(name),
                                                        dtype))

    t5_cfg = t5_params = None
    if t5_path:
        from ..models.t5 import load_t5
        t5_cfg, t5_params = load_t5(t5_path, dtype)

    txt_dim = fparams["txt_in_w"].shape[0]
    clip_dim = fparams["vector_in"]["in_w"].shape[0]
    fwd = jax.jit(partial(flux_forward, fparams, cfg))

    def text_encode(prompt, negative):
        # pooled stream (CLIP-L)
        if clip_tree is not None and tokenizer is not None:
            ids = np.asarray(tokenizer(prompt), np.int32)
            _, p = clip_text_encode(clip_tree, ids, projection=True)
            p = np.asarray(p, np.float32)
            pooled = np.zeros((clip_dim,), np.float32)
            pooled[:min(p.shape[0], clip_dim)] = p[:clip_dim]
            pooled = jnp.asarray(pooled, dtype)
        else:
            pooled = jnp.zeros((clip_dim,), dtype)
        # sequence stream (T5)
        if t5_params is not None:
            tok5 = t5_tokenizer or tokenizer
            ids5 = list(tok5(prompt))[:T5_SEQ_LEN] if tok5 else []
            ids5 = [i % t5_cfg.vocab_size for i in ids5]
            n = len(ids5)
            ids5 = ids5 + [0] * (T5_SEQ_LEN - n)
            from ..models.t5 import t5_encode
            th = np.asarray(t5_encode(t5_params, t5_cfg,
                                      jnp.asarray(ids5, jnp.int32),
                                      valid_len=n), np.float32)
            txt = np.zeros((T5_SEQ_LEN, txt_dim), np.float32)
            txt[:, :min(th.shape[1], txt_dim)] = th[:, :txt_dim]
            txt = jnp.asarray(txt, dtype)
        else:
            txt = jnp.zeros((T5_SEQ_LEN, txt_dim), dtype)
        # flux-dev is guidance-distilled: no negative stream
        return ((txt, pooled), None)

    def denoiser(x, sigma, cond):
        txt, pooled = cond
        h, w, _ = x.shape
        tokens, ids = pack_latents(jnp.asarray(x, dtype))
        v = fwd(tokens, ids, txt, jnp.float32(float(sigma)), pooled,
                jnp.float32(guidance))
        return unpack_latents(v, h, w).astype(jnp.float32)

    vae_dec = jax.jit(lambda z: vae_decode(vae_tree, z,
                                           scale=FLUX_VAE_SCALE,
                                           shift=FLUX_VAE_SHIFT))

    def venc(img):
        return vae_encode_scaled(vae_tree, jnp.asarray(img, dtype),
                                 scale=FLUX_VAE_SCALE,
                                 shift=FLUX_VAE_SHIFT)

    def sigma_fn(n_steps, lat_hw):
        if cfg.guidance_embed:   # flux-dev: resolution-shifted schedule
            seq = (lat_hw[0] // 2) * (lat_hw[1] // 2)
            return flow_sigmas(n_steps, image_seq_len=seq)
        return flow_sigmas(n_steps, shift=1.0)   # schnell: unshifted

    return DiffusionPipeline(text_encode, denoiser, vae_dec, venc,
                             latent_channels=16, latent_scale=8,
                             supports_negative=False, flow=True,
                             sigma_fn=sigma_fn)
