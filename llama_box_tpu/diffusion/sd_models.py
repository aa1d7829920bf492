"""Stable Diffusion 1.x-family models from GGUF (text encoder + UNet + VAE).

Replaces the reference's vendored stable-diffusion.cpp engine
(z_stablediffusion.hpp): GGUF checkpoints converted by sd.cpp keep the
original SD tensor names —
    cond_stage_model.transformer.text_model.*   (CLIP-L text encoder)
    model.diffusion_model.*                     (UNet)
    first_stage_model.*                         (VAE)
— and are assembled here into the three callables the streaming pipeline
needs (pipeline.DiffusionPipeline): text_encode / denoiser / vae_decode
(+ vae_encode for img2img).

Convs run NHWC via lax.conv_general_dilated (XLA maps them onto the MXU);
attention is plain jnp einsum (shapes are small at SD1 resolutions).
"""

from __future__ import annotations

import math
import re

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF, SRV_WRN
from .pipeline import DiffusionPipeline
from .scheduler import NoiseSchedule


# -- generic building blocks -------------------------------------------------


def conv2d(x, w, b=None, stride=1, padding=1):
    """x: [H, W, Cin]; w: [Cout, Cin, kh, kw] (torch order)."""
    out = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),
        jnp.transpose(w, (2, 3, 1, 0)).astype(jnp.float32),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    if b is not None:
        out = out + b
    return out


def group_norm(x, w, b, groups=32, eps=1e-5):
    """x: [H, W, C]."""
    H, W, C = x.shape
    g = min(groups, C)
    xg = x.reshape(H, W, g, C // g)
    mu = xg.mean(axis=(0, 1, 3), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(0, 1, 3), keepdims=True)
    xn = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(H, W, C)
    return xn * w + b


def layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def silu(x):
    return jax.nn.silu(x)


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    args = t * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)])


# -- parameter tree loading --------------------------------------------------


def _tree_insert(tree: dict, path: str, value):
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_sd(path: str, dtype=jnp.float32):
    """Parse an sd.cpp GGUF into nested param trees + model hyper-info."""
    g = GGUFFile(path)
    text, unet, vae = {}, {}, {}
    for name in g.tensors:
        x = g.tensor_f32(name)
        arr = jnp.asarray(x, dtype)
        if name.startswith("cond_stage_model."):
            _tree_insert(text, name[len("cond_stage_model."):], arr)
        elif name.startswith("model.diffusion_model."):
            _tree_insert(unet, name[len("model.diffusion_model."):], arr)
        elif name.startswith("first_stage_model."):
            _tree_insert(vae, name[len("first_stage_model."):], arr)
    meta = dict(g.metadata)
    g.close()
    SRV_INF("load_sd", "sd gguf: text=%d unet=%d vae=%d tensors",
            _count(text), _count(unet), _count(vae))
    return {"text": text, "unet": unet, "vae": vae, "meta": meta}


def _count(tree) -> int:
    if isinstance(tree, dict):
        return sum(_count(v) for v in tree.values())
    return 1


# -- CLIP text encoder -------------------------------------------------------


def clip_text_encode(params: dict, tokens: np.ndarray,
                     penultimate: bool = False,
                     projection: bool = False):
    """tokens [77] -> [77, width] hidden states. params: subtree with
    transformer.text_model. penultimate: return layer N-1 output (SDXL
    "clip skip"); projection: also return the pooled+projected embedding
    (SDXL conditioning)."""
    tm = params["transformer"]["text_model"]
    emb = tm["embeddings"]
    vocab = emb["token_embedding"]["weight"].shape[0]
    ids = jnp.clip(jnp.asarray(tokens), 0, vocab - 1)  # jnp.take OOB = NaN
    x = jnp.take(emb["token_embedding"]["weight"], ids, 0)
    x = x + emb["position_embedding"]["weight"][: x.shape[0]]
    layers = tm["encoder"]["layers"]
    n_layers = len(layers)
    width = x.shape[-1]
    heads = width // 64
    T = x.shape[0]
    causal = jnp.tril(jnp.ones((T, T), bool))

    penult = None
    for i in range(n_layers):
        if penultimate and i == n_layers - 1:
            penult = x
        lp = layers[str(i)]
        h = layer_norm(x, lp["layer_norm1"]["weight"],
                       lp["layer_norm1"]["bias"])
        sa = lp["self_attn"]

        def proj(p, h):
            return h @ p["weight"].T + p["bias"]

        q = proj(sa["q_proj"], h).reshape(T, heads, 64)
        k = proj(sa["k_proj"], h).reshape(T, heads, 64)
        v = proj(sa["v_proj"], h).reshape(T, heads, 64)
        s = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(64)
        s = jnp.where(causal[None], s, -1e30)
        a = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(s, -1), v)
        x = x + proj(sa["out_proj"], a.reshape(T, width))
        h = layer_norm(x, lp["layer_norm2"]["weight"],
                       lp["layer_norm2"]["bias"])
        h = proj(lp["mlp"]["fc1"], h)
        h = h * jax.nn.sigmoid(1.702 * h)   # quick-gelu (CLIP)
        x = x + proj(lp["mlp"]["fc2"], h)
    final = layer_norm(x, tm["final_layer_norm"]["weight"],
                       tm["final_layer_norm"]["bias"])
    hidden = penult if penult is not None else final
    if projection:
        # pooled: first EOT-ish position = argmax token id (CLIP convention)
        eot = int(np.argmax(np.asarray(tokens)))
        pooled = final[eot]
        tp = params.get("text_projection")
        if tp is None and "transformer" in params:
            tp = params["transformer"].get("text_projection")
        if tp is not None:
            w = tp["weight"] if isinstance(tp, dict) else tp
            pooled = pooled @ w.T if w.ndim == 2 else pooled
        return hidden, pooled
    return hidden


# -- UNet --------------------------------------------------------------------


def _resblock(p, x, emb):
    h = group_norm(x, p["in_layers"]["0"]["weight"], p["in_layers"]["0"]["bias"])
    h = conv2d(silu(h), p["in_layers"]["2"]["weight"],
               p["in_layers"]["2"]["bias"])
    eo = silu(emb) @ p["emb_layers"]["1"]["weight"].T \
        + p["emb_layers"]["1"]["bias"]
    h = h + eo
    h = group_norm(h, p["out_layers"]["0"]["weight"],
                   p["out_layers"]["0"]["bias"])
    h = conv2d(silu(h), p["out_layers"]["3"]["weight"],
               p["out_layers"]["3"]["bias"])
    if "skip_connection" in p:
        sc = p["skip_connection"]
        x = conv2d(x, sc["weight"], sc["bias"], padding=0)
    return x + h


def _cross_attn(p, x, ctx):
    """x: [N, C]; ctx: [M, Cc]."""
    q = x @ p["to_q"]["weight"].T
    k = ctx @ p["to_k"]["weight"].T
    v = ctx @ p["to_v"]["weight"].T
    inner = q.shape[-1]
    heads = max(inner // 64, 1)
    d = inner // heads
    q = q.reshape(-1, heads, d)
    k = k.reshape(-1, heads, d)
    v = v.reshape(-1, heads, d)
    s = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(d)
    a = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(s, -1), v)
    a = a.reshape(-1, inner)
    return a @ p["to_out"]["0"]["weight"].T + p["to_out"]["0"]["bias"]


def _transformer_block(p, x, ctx):
    h = layer_norm(x, p["norm1"]["weight"], p["norm1"]["bias"])
    x = x + _cross_attn(p["attn1"], h, h)
    x = x + _cross_attn(p["attn2"], layer_norm(
        x, p["norm2"]["weight"], p["norm2"]["bias"]), ctx)
    h = layer_norm(x, p["norm3"]["weight"], p["norm3"]["bias"])
    gp = p["ff"]["net"]["0"]["proj"]
    h = h @ gp["weight"].T + gp["bias"]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(b, approximate=False)   # GEGLU
    x = x + (h @ p["ff"]["net"]["2"]["weight"].T + p["ff"]["net"]["2"]["bias"])
    return x


def _spatial_transformer(p, x, ctx):
    H, W, C = x.shape
    h = group_norm(x, p["norm"]["weight"], p["norm"]["bias"])
    pi = p["proj_in"]
    if pi["weight"].ndim == 4:
        h = conv2d(h, pi["weight"], pi["bias"], padding=0)
    else:
        h = h @ pi["weight"].T + pi["bias"]
    h = h.reshape(H * W, C)
    keys = sorted(p["transformer_blocks"], key=int)
    for kk in keys:
        h = _transformer_block(p["transformer_blocks"][kk], h, ctx)
    h = h.reshape(H, W, C)
    po = p["proj_out"]
    if po["weight"].ndim == 4:
        h = conv2d(h, po["weight"], po["bias"], padding=0)
    else:
        h = h @ po["weight"].T + po["bias"]
    return x + h


def _apply_block(p: dict, x, emb, ctx):
    """One input/output block entry: dict of numbered sub-modules."""
    for kk in sorted(p, key=int):
        sub = p[kk]
        if "in_layers" in sub:
            x = _resblock(sub, x, emb)
        elif "transformer_blocks" in sub:
            x = _spatial_transformer(sub, x, ctx)
        elif "op" in sub:      # downsample conv stride 2
            x = conv2d(x, sub["op"]["weight"], sub["op"]["bias"], stride=2)
        elif "conv" in sub:    # upsample: nearest 2x + conv
            H, W, C = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, 0), 2, 1)
            x = conv2d(x, sub["conv"]["weight"], sub["conv"]["bias"])
    return x


def unet_forward(params: dict, x, t, ctx, aug=None, control=None):
    """x: [H, W, C_lat]; t: scalar timestep; ctx: [M, Cc] -> eps [H, W, C].
    aug: SDXL conditioning vector (pooled text + fourier size ids) fed
    through label_emb and added to the time embedding.
    control: optional (skip_residuals list, middle_residual) from
    controlnet_forward, added to the saved skips / middle output."""
    model_ch = params["time_embed"]["0"]["weight"].shape[1]
    temb = timestep_embedding(t, model_ch)
    temb = temb @ params["time_embed"]["0"]["weight"].T \
        + params["time_embed"]["0"]["bias"]
    temb = silu(temb) @ params["time_embed"]["2"]["weight"].T \
        + params["time_embed"]["2"]["bias"]
    if aug is not None and "label_emb" in params:
        le = params["label_emb"]["0"]
        a = aug @ le["0"]["weight"].T + le["0"]["bias"]
        a = silu(a) @ le["2"]["weight"].T + le["2"]["bias"]
        temb = temb + a

    hs = []
    h = x
    for kk in sorted(params["input_blocks"], key=int):
        blk = params["input_blocks"][kk]
        if kk == "0":
            c = blk["0"]
            h = conv2d(h, c["weight"], c["bias"])
        else:
            h = _apply_block(blk, h, temb, ctx)
        hs.append(h)

    h = _apply_block(params["middle_block"], h, temb, ctx)
    ctrl_skips = None
    if control is not None:
        ctrl_skips, ctrl_mid = control
        ctrl_skips = list(ctrl_skips)
        h = h + ctrl_mid

    for kk in sorted(params["output_blocks"], key=int):
        skip = hs.pop()
        if ctrl_skips is not None:
            skip = skip + ctrl_skips.pop()
        h = jnp.concatenate([h, skip], axis=-1)
        h = _apply_block(params["output_blocks"][kk], h, temb, ctx)

    h = group_norm(h, params["out"]["0"]["weight"], params["out"]["0"]["bias"])
    return conv2d(silu(h), params["out"]["2"]["weight"],
                  params["out"]["2"]["bias"])


# -- VAE ---------------------------------------------------------------------


def _vae_resblock(p, x):
    h = group_norm(x, p["norm1"]["weight"], p["norm1"]["bias"])
    h = conv2d(silu(h), p["conv1"]["weight"], p["conv1"]["bias"])
    h = group_norm(h, p["norm2"]["weight"], p["norm2"]["bias"])
    h = conv2d(silu(h), p["conv2"]["weight"], p["conv2"]["bias"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"]["weight"], p["nin_shortcut"]["bias"],
                   padding=0)
    return x + h


def _vae_attn(p, x):
    H, W, C = x.shape
    h = group_norm(x, p["norm"]["weight"], p["norm"]["bias"])

    def prj(name):
        w = p[name]["weight"]
        v = h.reshape(-1, C)
        if w.ndim == 4:
            return v @ w[:, :, 0, 0].T + p[name]["bias"]
        return v @ w.T + p[name]["bias"]

    q, k, v = prj("q"), prj("k"), prj("v")
    s = (q @ k.T) / math.sqrt(C)
    a = jax.nn.softmax(s, -1) @ v
    w = p["proj_out"]["weight"]
    if w.ndim == 4:
        a = a @ w[:, :, 0, 0].T + p["proj_out"]["bias"]
    else:
        a = a @ w.T + p["proj_out"]["bias"]
    return x + a.reshape(H, W, C)


def vae_decode(params: dict, z, scale: float = 0.18215,
               shift: float = 0.0):
    """z: [h, w, C] latents -> [H, W, 3] image in [0, 1].
    scale/shift: per-family latent normalization (SD1.x 0.18215, SDXL
    0.13025, FLUX 0.3611 with shift 0.1159 — sd.cpp VERSION tables)."""
    z = z / scale + shift
    if "post_quant_conv" in params:
        z = conv2d(z, params["post_quant_conv"]["weight"],
                   params["post_quant_conv"]["bias"], padding=0)
    d = params["decoder"]
    h = conv2d(z, d["conv_in"]["weight"], d["conv_in"]["bias"])
    h = _vae_resblock(d["mid"]["block_1"], h)
    h = _vae_attn(d["mid"]["attn_1"], h)
    h = _vae_resblock(d["mid"]["block_2"], h)
    for kk in sorted(d["up"], key=int, reverse=True):
        up = d["up"][kk]
        for bk in sorted(up["block"], key=int):
            h = _vae_resblock(up["block"][bk], h)
        if "upsample" in up:
            h = jnp.repeat(jnp.repeat(h, 2, 0), 2, 1)
            h = conv2d(h, up["upsample"]["conv"]["weight"],
                       up["upsample"]["conv"]["bias"])
    h = group_norm(h, d["norm_out"]["weight"], d["norm_out"]["bias"])
    h = conv2d(silu(h), d["conv_out"]["weight"], d["conv_out"]["bias"])
    return (h + 1.0) / 2.0


def vae_encode(params: dict, img):
    """img: [H, W, 3] in [0,1] -> [h, w, C] latents (deterministic mean,
    unscaled; see vae_encode_scaled)."""
    e = params.get("encoder")
    if e is None:
        raise ValueError("this sd gguf has no VAE encoder (txt2img only)")
    x = img * 2.0 - 1.0
    h = conv2d(x, e["conv_in"]["weight"], e["conv_in"]["bias"])
    for kk in sorted(e["down"], key=int):
        dn = e["down"][kk]
        for bk in sorted(dn["block"], key=int):
            h = _vae_resblock(dn["block"][bk], h)
        if "downsample" in dn:
            h = jnp.pad(h, ((0, 1), (0, 1), (0, 0)))
            h = conv2d(h, dn["downsample"]["conv"]["weight"],
                       dn["downsample"]["conv"]["bias"], stride=2, padding=0)
    h = _vae_resblock(e["mid"]["block_1"], h)
    h = _vae_attn(e["mid"]["attn_1"], h)
    h = _vae_resblock(e["mid"]["block_2"], h)
    h = group_norm(h, e["norm_out"]["weight"], e["norm_out"]["bias"])
    h = conv2d(silu(h), e["conv_out"]["weight"], e["conv_out"]["bias"])
    if "quant_conv" in params:
        h = conv2d(h, params["quant_conv"]["weight"],
                   params["quant_conv"]["bias"], padding=0)
    mean = h[..., : h.shape[-1] // 2]
    return np.asarray(mean * 1.0)


def vae_encode_scaled(params: dict, img, scale: float = 0.18215,
                      shift: float = 0.0):
    return np.asarray((vae_encode(params, img) - shift) * scale)


# -- pipeline assembly -------------------------------------------------------


def build_sd_pipeline(path: str, tokenizer=None, dtype=jnp.float32,
                      prediction: str = "eps",
                      control_net_path: str = None,
                      control_strength: float = 0.9) -> DiffusionPipeline:
    """GGUF -> streaming DiffusionPipeline. SD1.x and SDXL (detected by the
    UNet label_emb / second text encoder) checkpoints.

    prediction: "eps" (SD1.x/SDXL) or "v" (SD2.x-768-style v-prediction;
    converted to eps in sigma space so the k-diffusion samplers are shared:
    eps = c_in * v + sigma * c_in^2 * x, c_in = 1/sqrt(1+sigma^2))."""
    trees = load_sd(path, dtype)
    schedule = NoiseSchedule()
    train_sigmas = schedule.sigmas()
    is_xl = "label_emb" in trees["unet"] or "1" in trees["text"]

    vae_scale = 0.13025 if is_xl else 0.18215
    cn_tree = None
    if control_net_path:
        from .controlnet import load_controlnet
        cn_tree = load_controlnet(control_net_path, dtype)
    unet_jit = jax.jit(lambda x, t, c, a: unet_forward(trees["unet"], x, t,
                                                       c, a))

    def unet_ctrl(x, t, c, a, hint_lat):
        from .controlnet import controlnet_forward
        skips, mid = controlnet_forward(cn_tree, x, hint_lat, t, c, a)
        sw = control_strength
        return unet_forward(trees["unet"], x, t, c, a,
                            control=([s * sw for s in skips], mid * sw))

    unet_ctrl_jit = jax.jit(unet_ctrl)
    hint_jit = jax.jit(lambda img: __import__(
        "llama_box_tpu.diffusion.controlnet",
        fromlist=["embed_hint"]).embed_hint(cn_tree, img))
    vae_dec_jit = jax.jit(lambda z: vae_decode(trees["vae"], z,
                                               scale=vae_scale))

    def encode_prompt(prompt: str):
        if tokenizer is None:
            raise ValueError("sd pipeline needs a CLIP tokenizer")
        ids = np.asarray(tokenizer(prompt), np.int32)
        if not is_xl:
            return (clip_text_encode(trees["text"], ids), None)
        h1 = clip_text_encode(trees["text"], ids, penultimate=True)
        t2 = trees["text"].get("1", trees["text"])
        h2, pooled = clip_text_encode(t2, ids, penultimate=True,
                                      projection=True)
        ctx = jnp.concatenate([h1, h2], axis=-1)
        return (ctx, pooled)

    def text_encode(prompt, negative):
        return (encode_prompt(prompt), encode_prompt(negative or ""))

    def _aug(pooled, hw):
        if pooled is None:
            return None
        # SDXL size conditioning: (orig_h, orig_w, crop_t, crop_l, h, w)
        ids = jnp.asarray([hw[0], hw[1], 0, 0, hw[0], hw[1]], jnp.float32)
        four = jnp.concatenate([timestep_embedding(i, 256) for i in ids])
        return jnp.concatenate([pooled, four])

    def denoiser(x, sigma, cond, control=None):
        sigma = float(sigma)
        t = int(np.abs(train_sigmas - sigma).argmin())
        c_in = 1.0 / math.sqrt(1.0 + sigma * sigma)
        ctx, pooled = cond
        hw = (x.shape[0] * 8, x.shape[1] * 8)
        # discrete model: x_t = x * c_in at integer timestep t
        if control is not None and cn_tree is not None:
            out = unet_ctrl_jit(x * c_in, jnp.float32(t), ctx,
                                _aug(pooled, hw), control)
        else:
            out = unet_jit(x * c_in, jnp.float32(t), ctx, _aug(pooled, hw))
        if prediction == "v":
            out = c_in * out + (sigma * c_in * c_in) * x
        return out

    def vdec(z):
        return vae_dec_jit(z)

    def venc(img):
        return vae_encode_scaled(trees["vae"], jnp.asarray(img, dtype),
                                 scale=vae_scale)

    pl = DiffusionPipeline(text_encode, denoiser, vdec, venc,
                           latent_channels=4, latent_scale=8,
                           schedule=schedule)
    if cn_tree is not None:
        pl.hint_embed = lambda img: np.asarray(hint_jit(
            jnp.asarray(img, dtype)))
    return pl
