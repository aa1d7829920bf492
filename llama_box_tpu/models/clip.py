"""CLIP/SigLIP vision tower + multimodal projector from mmproj GGUF.

TPU-native replacement for the reference's clip.cpp path
(z_multimodal.hpp:93-196 tokenize_image): a ViT encoder turns preprocessed
pixels into patch embeddings, the projector maps them into the language
model's embedding space; the engine splices them into the prompt as
embedding chunks.

Supported projector types (clip.projector_type): mlp (llava), mlp_norm,
idefics3/"resampler-less" passthrough; qwen2vl merger (2x2 patch merge).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF, SRV_WRN


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    image_size: int = 336
    patch_size: int = 14
    n_embd: int = 1024
    n_ff: int = 4096
    n_layers: int = 24
    n_heads: int = 16
    proj_dim: int = 4096
    eps: float = 1e-5
    projector: str = "mlp"
    use_silu: bool = False
    # llama.cpp clip semantics: clip.use_gelu=true -> (tanh) GELU;
    # otherwise the CLIP-default QUICK gelu (x * sigmoid(1.702x))
    use_gelu: bool = False
    use_gelu_quick: bool = True
    has_class_embd: bool = True
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    merge_size: int = 1          # qwen2vl merger: 2
    minicpmv_version: int = 0    # >0 => resampler projector + tiling
    wa_pattern: int = 0          # qwen2.5vl: every n-th block full-attn,
                                 # the rest attend within 8x8-patch windows
    vit_rms: bool = False        # qwen2.5vl / pixtral: RMSNorm tower
    rope_theta: float = 10000.0  # pixtral 2D rope base
    proj_scale: int = 2          # idefics3/smolvlm pixel-shuffle factor
    gelu_tanh: bool = False      # siglip gelu_pytorch_tanh towers

    @property
    def n_patches_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.n_patches_side ** 2


def load_clip(path: str, dtype=jnp.float32) -> tuple[ClipConfig, dict]:
    g = GGUFFile(path)
    md = g.metadata

    def kv(key, default=None):
        return md.get(f"clip.vision.{key}", md.get(f"clip.{key}", default))

    proj = str(md.get("clip.projector_type", "mlp"))
    cfg = ClipConfig(
        image_size=int(kv("image_size", 336)),
        patch_size=int(kv("patch_size", 14)),
        n_embd=int(kv("embedding_length", 1024)),
        n_ff=int(kv("feed_forward_length", 4096)),
        n_layers=int(kv("block_count", 24)),
        n_heads=int(kv("attention.head_count", 16)),
        proj_dim=int(kv("projection_dim", 4096)),
        eps=float(kv("attention.layer_norm_epsilon", 1e-5)),
        projector=proj,
        use_silu=bool(md.get("clip.use_silu", False)),
        use_gelu=bool(md.get("clip.use_gelu", False)),
        use_gelu_quick=not bool(md.get("clip.use_gelu", False)),
        has_class_embd="v.class_embd" in g.tensors,
        image_mean=tuple(np.asarray(kv("image_mean",
                                       (0.48145466, 0.4578275, 0.40821073)))
                         .tolist()),
        image_std=tuple(np.asarray(kv("image_std",
                                      (0.26862954, 0.26130258, 0.27577711)))
                        .tolist()),
        merge_size=2 if "qwen2" in proj else 1,
        minicpmv_version=int(md.get("clip.minicpmv_version",
                                    2 if proj == "resampler" else 0)),
        wa_pattern=int(kv("n_wa_pattern", 0) or 0),
        vit_rms="2.5" in proj or "qwen25" in proj or proj == "pixtral",
        rope_theta=float(kv("rope_theta", 10000.0) or 10000.0),
        proj_scale=int(kv("projector.scale_factor", 2) or 2),
        gelu_tanh=bool(md.get("clip.use_gelu_tanh",
                              proj == "idefics3")),
    )

    def t(name, transpose=False):
        if name not in g.tensors:
            return None
        x = g.tensor_f32(name)
        if transpose and x.ndim == 2:
            x = x.T
        return jnp.asarray(x, dtype)

    params: dict = {
        "patch_embd": t("v.patch_embd.weight"),       # [E, 3, P, P]
        "patch_embd_1": t("v.patch_embd.weight.1"),   # qwen2vl temporal slice
        "patch_embd_b": t("v.patch_embd.bias"),
        "class_embd": t("v.class_embd"),
        "pos_embd": t("v.position_embd.weight"),      # [n_pos, E]
        "pre_ln": t("v.pre_ln.weight"),
        "pre_ln_b": t("v.pre_ln.bias"),
        "post_ln": t("v.post_ln.weight"),
        "post_ln_b": t("v.post_ln.bias"),
    }
    layers = []
    for i in range(cfg.n_layers):
        p = f"v.blk.{i}."
        layers.append({
            "ln1": t(p + "ln1.weight"), "ln1_b": t(p + "ln1.bias"),
            "wq": t(p + "attn_q.weight", True), "bq": t(p + "attn_q.bias"),
            "wk": t(p + "attn_k.weight", True), "bk": t(p + "attn_k.bias"),
            "wv": t(p + "attn_v.weight", True), "bv": t(p + "attn_v.bias"),
            "wo": t(p + "attn_out.weight", True), "bo": t(p + "attn_out.bias"),
            "ln2": t(p + "ln2.weight"), "ln2_b": t(p + "ln2.bias"),
            "w_up": t(p + "ffn_up.weight", True), "b_up": t(p + "ffn_up.bias"),
            "w_down": t(p + "ffn_down.weight", True),
            "b_down": t(p + "ffn_down.bias"),
            "w_gate": t(p + "ffn_gate.weight", True),   # qwen2.5vl SwiGLU
            "b_gate": t(p + "ffn_gate.bias"),
            # internvl layer-scale (per-channel residual gains)
            "ls1": t(p + "ls1.weight"),
            "ls2": t(p + "ls2.weight"),
        })
    # stack for lax.scan (all layers homogeneous)
    params["layers"] = {
        k: jnp.stack([l[k] for l in layers])
        for k in layers[0] if layers[0][k] is not None
    }
    if cfg.wa_pattern > 0:
        # qwen2.5vl: every wa_pattern-th block is full attention
        params["layers"]["is_full"] = jnp.asarray(
            [(i + 1) % cfg.wa_pattern == 0 for i in range(cfg.n_layers)],
            jnp.int32)
    # projector
    for name in list(g.tensors):
        if name.startswith("mm."):
            params[name.replace(".", "_")] = t(
                name, transpose=name.endswith(".weight"))
    if any(n.startswith("resampler.") for n in g.tensors):
        # minicpmv perceiver resampler (llama.cpp clip.cpp resampler.*)
        params["resampler"] = {
            "query": t("resampler.query"),
            "kv_w": t("resampler.kv.weight", True),
            "kv_b": t("resampler.kv.bias"),
            "q_w": t("resampler.attn.q.weight", True),
            "q_b": t("resampler.attn.q.bias"),
            "k_w": t("resampler.attn.k.weight", True),
            "k_b": t("resampler.attn.k.bias"),
            "v_w": t("resampler.attn.v.weight", True),
            "v_b": t("resampler.attn.v.bias"),
            "o_w": t("resampler.attn.out.weight", True),
            "o_b": t("resampler.attn.out.bias"),
            "ln_q": t("resampler.ln_q.weight"),
            "ln_q_b": t("resampler.ln_q.bias"),
            "ln_kv": t("resampler.ln_kv.weight"),
            "ln_kv_b": t("resampler.ln_kv.bias"),
            "ln_post": t("resampler.ln_post.weight"),
            "ln_post_b": t("resampler.ln_post.bias"),
            "proj": t("resampler.proj.weight", True),
        }
    g.close()
    SRV_INF("load_clip", "clip: %d layers embd=%d patches=%d proj=%s",
            cfg.n_layers, cfg.n_embd, cfg.n_patches, cfg.projector)
    return cfg, params


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * w + (b if b is not None else 0.0)


def _gelu_quick(x):
    return x * jax.nn.sigmoid(1.702 * x)


def encode_image_impl(params, cfg: ClipConfig, pixels: jnp.ndarray
                      ) -> jnp.ndarray:
    """pixels: [H, W, 3] normalized f32 -> projected embeddings [N, proj]."""
    P = cfg.patch_size
    S = cfg.n_patches_side
    E = cfg.n_embd

    # conv patch embed == unfold + matmul (MXU-friendly)
    patches = pixels.reshape(S, P, S, P, 3).transpose(0, 2, 4, 1, 3)
    patches = patches.reshape(S * S, 3 * P * P)
    w = params["patch_embd"].reshape(E, 3 * P * P).T   # [3PP, E]
    x = patches @ w
    if params.get("patch_embd_b") is not None:
        x = x + params["patch_embd_b"]

    if cfg.has_class_embd and params.get("class_embd") is not None:
        x = jnp.concatenate([params["class_embd"][None, :], x], axis=0)
    n_pos = x.shape[0]
    if cfg.projector == "idefics3" and params.get("pos_embd") is not None:
        # HF Idefics3VisionEmbeddings buckets fractional coordinates
        # (torch.bucketize right=True == searchsorted side='left'), which
        # at full size yields ids like [0, 0, 1, 2] per axis — NOT arange
        bounds = np.arange(1, S) / S
        axis = np.searchsorted(bounds, np.arange(S) / S, side="left")
        ids = (axis[:, None] * S + axis[None, :]).reshape(-1)
        x = x + params["pos_embd"][jnp.asarray(ids)]
    elif params.get("pos_embd") is not None:
        x = x + params["pos_embd"][:n_pos]
    if params.get("pre_ln") is not None:
        x = _ln(x, params["pre_ln"], params.get("pre_ln_b"), cfg.eps)

    H = cfg.n_heads
    D = E // H

    def layer(x, lp):
        h = _ln(x, lp["ln1"], lp.get("ln1_b"), cfg.eps)
        q = (h @ lp["wq"] + lp.get("bq", 0.0)).reshape(-1, H, D)
        k = (h @ lp["wk"] + lp.get("bk", 0.0)).reshape(-1, H, D)
        v = (h @ lp["wv"] + lp.get("bv", 0.0)).reshape(-1, H, D)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (D ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(-1, E)
        ao = attn @ lp["wo"] + lp.get("bo", 0.0)
        if "ls1" in lp:   # internvl layer-scale
            ao = ao * lp["ls1"]
        x = x + ao
        h = _ln(x, lp["ln2"], lp.get("ln2_b"), cfg.eps)
        h = h @ lp["w_up"] + lp.get("b_up", 0.0)
        if cfg.use_silu:
            h = jax.nn.silu(h)
        elif cfg.use_gelu_quick:
            h = _gelu_quick(h)
        else:
            h = jax.nn.gelu(h, approximate=cfg.gelu_tanh)
        h = h @ lp["w_down"] + lp.get("b_down", 0.0)
        if "ls2" in lp:
            h = h * lp["ls2"]
        return x + h, None

    x, _ = jax.lax.scan(layer, x, params["layers"])

    if params.get("post_ln") is not None:
        x = _ln(x, params["post_ln"], params.get("post_ln_b"), cfg.eps)

    # drop CLS for the projector (llava semantics)
    if cfg.has_class_embd:
        x = x[1:]

    if cfg.merge_size > 1:  # qwen2vl merger: 2x2 spatial merge before MLP
        m = cfg.merge_size
        x = x.reshape(S // m, m, S // m, m, E).transpose(0, 2, 1, 3, 4)
        x = x.reshape((S // m) * (S // m), m * m * E)

    if params.get("resampler") is not None:
        return _resampler_project(params["resampler"], cfg, x)

    if cfg.projector == "internvl":
        # pixel shuffle (0.5 downscale; HF InternVLModel.pixel_shuffle's
        # exact view/permute sequence) + mlp1 (LN -> fc -> GELU -> fc;
        # original mlp1.{0,1,3} indices -> mm.0/mm.1/mm.3)
        v = x.reshape(S, S // 2, 2 * E)
        v = v.transpose(1, 0, 2).reshape(S // 2, S // 2, 4 * E)
        x = v.transpose(1, 0, 2).reshape((S // 2) * (S // 2), 4 * E)
        x = _ln(x, params["mm_0_weight"], params.get("mm_0_bias"), cfg.eps)
        x = x @ params["mm_1_weight"] + params.get("mm_1_bias", 0.0)
        x = jax.nn.gelu(x, approximate=False)
        return x @ params["mm_3_weight"] + params.get("mm_3_bias", 0.0)

    if cfg.projector == "idefics3":
        # smolvlm/idefics3 connector: pixel shuffle (HF Idefics3Connector's
        # exact view/permute sequence, scale from metadata) + one linear
        sf = cfg.proj_scale
        v = x.reshape(S, S // sf, E * sf)
        v = v.transpose(1, 0, 2).reshape(S // sf, S // sf, E * sf * sf)
        x = v.transpose(1, 0, 2).reshape((S // sf) ** 2, E * sf * sf)
        return x @ params["mm_model_fc_weight"] \
            + params.get("mm_model_fc_bias", 0.0)

    # projector: mm.0 (+gelu) mm.2 for mlp; single mm.0 otherwise
    if "mm_0_weight" in params:
        x = x @ params["mm_0_weight"] + params.get("mm_0_bias", 0.0)
        if "mm_2_weight" in params:
            x = jax.nn.gelu(x, approximate=False)
            x = x @ params["mm_2_weight"] + params.get("mm_2_bias", 0.0)
    return x


def encode_image_pixtral_impl(params, cfg: ClipConfig, pixels: jnp.ndarray,
                              grid_hw: tuple[int, int]) -> jnp.ndarray:
    """Pixtral tower at the image's NATIVE (patch-quantized) size
    (transformers PixtralVisionModel is the golden; reference serves this
    family via its clip.cpp pixtral branch): patch conv without bias or
    CLS or learned positions, RMS norms, 2D rope whose head dims
    alternate height/width frequency slices, gated SiLU FFN, llava-style
    2-layer GELU projector (mm.1 / mm.2)."""
    gh, gw = grid_hw
    P = cfg.patch_size
    E = cfg.n_embd
    H = cfg.n_heads
    D = E // H

    patches = pixels.reshape(gh, P, gw, P, 3).transpose(0, 2, 4, 1, 3)
    patches = patches.reshape(gh * gw, 3 * P * P)
    w = params["patch_embd"].reshape(E, 3 * P * P).T
    x = patches @ w
    if params.get("patch_embd_b") is not None:
        x = x + params["patch_embd_b"]

    def rms(x, wt):
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True)
                               + cfg.eps)
        return (y * wt).astype(x.dtype)

    if params.get("pre_ln") is not None:
        x = rms(x, params["pre_ln"])

    # 2D rope: even head-dim pairs rotate by height freqs, odd by width
    # (PixtralRotaryEmbedding: freqs_h = outer(h, freqs[::2]),
    # freqs_w = outer(w, freqs[1::2]), concat per (h, w) position)
    half = D // 2
    freqs = 1.0 / (cfg.rope_theta
                   ** (np.arange(0, D, 2, dtype=np.float32) / D))
    fh = np.outer(np.arange(gh, dtype=np.float32), freqs[0::2])
    fw = np.outer(np.arange(gw, dtype=np.float32), freqs[1::2])
    ang = np.concatenate(
        [np.repeat(fh[:, None, :], gw, 1),
         np.repeat(fw[None, :, :], gh, 0)], axis=-1).reshape(gh * gw, half)
    cos = jnp.asarray(np.cos(ang), x.dtype)
    sin = jnp.asarray(np.sin(ang), x.dtype)

    def rope(t):   # [N, H, D] half-split rotate
        t1, t2 = t[..., :half], t[..., half:]
        c = cos[:, None, :]
        s = sin[:, None, :]
        return jnp.concatenate([t1 * c - t2 * s, t2 * c + t1 * s], -1)

    def layer(x, lp):
        h = rms(x, lp["ln1"])
        q = rope((h @ lp["wq"]).reshape(-1, H, D))
        k = rope((h @ lp["wk"]).reshape(-1, H, D))
        v = (h @ lp["wv"]).reshape(-1, H, D)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (D ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(-1, E)
        x = x + attn @ lp["wo"]
        h = rms(x, lp["ln2"])
        h = jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])
        return x + h @ lp["w_down"], None

    x, _ = jax.lax.scan(layer, x, params["layers"])

    if "mm_1_weight" in params:
        x = x @ params["mm_1_weight"] + params.get("mm_1_bias", 0.0)
        if "mm_2_weight" in params:
            x = jax.nn.gelu(x, approximate=False)
            x = x @ params["mm_2_weight"] + params.get("mm_2_bias", 0.0)
    return x


encode_image_pixtral = jax.jit(encode_image_pixtral_impl,
                               static_argnames=("cfg", "grid_hw"))


def pixtral_fit_resize(w: int, h: int, cfg: ClipConfig,
                       cap: int = 0) -> tuple[int, int]:
    """Pixtral native sizing: scale so the longest side fits image_size
    (and the optional server cap), then ceil to patch multiples."""
    import math
    P = cfg.patch_size
    limit = cfg.image_size if cap <= 0 else min(cfg.image_size, cap)
    scale = min(1.0, limit / max(w, h))
    W = max(P, math.ceil(w * scale / P) * P)
    H = max(P, math.ceil(h * scale / P) * P)
    return W, H


def _sincos_pos_2d(dim: int, side: int) -> np.ndarray:
    """2D sine-cosine position embedding [side*side, dim] (the minicpmv
    resampler adds this to keys; llama.cpp builds the same table)."""
    half = dim // 2
    omega = 1.0 / (10000.0 ** (np.arange(half // 2) / (half / 2.0)))
    pos = np.arange(side, dtype=np.float32)
    out = np.einsum("p,f->pf", pos, omega)          # [side, half/2]
    emb_1d = np.concatenate([np.sin(out), np.cos(out)], -1)  # [side, half]
    eh = np.repeat(emb_1d, side, axis=0)            # rows vary slowly
    ew = np.tile(emb_1d, (side, 1))
    return np.concatenate([eh, ew], -1).astype(np.float32)


def _resampler_project(rp, cfg: ClipConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Perceiver resampler: learned queries cross-attend the ViT patch
    grid (keys carry a 2D sincos position signal). x: [N, E_vit]."""
    q = rp["query"]                                   # [Q, D]
    D = q.shape[-1]
    heads = max(D // 128, 1)
    hd = D // heads
    kv = x @ rp["kv_w"] + (rp["kv_b"] if rp["kv_b"] is not None else 0.0)
    kv = _ln(kv, rp["ln_kv"], rp["ln_kv_b"], cfg.eps)
    side = int(np.sqrt(x.shape[0]))
    pos = jnp.asarray(_sincos_pos_2d(D, side))[: x.shape[0]]
    qn = _ln(q, rp["ln_q"], rp["ln_q_b"], cfg.eps)
    qh = (qn @ rp["q_w"] + rp["q_b"]).reshape(-1, heads, hd)
    kh = ((kv + pos) @ rp["k_w"] + rp["k_b"]).reshape(-1, heads, hd)
    vh = (kv @ rp["v_w"] + rp["v_b"]).reshape(-1, heads, hd)
    s = jnp.einsum("qhd,khd->hqk", qh, kh) * (hd ** -0.5)
    a = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(s, -1), vh)
    out = a.reshape(-1, D) @ rp["o_w"] + rp["o_b"]
    out = _ln(out, rp["ln_post"], rp["ln_post_b"], cfg.eps)
    pw = rp["proj"]
    if pw.shape[0] != D:      # orientation differs between converters
        pw = pw.T
    return out @ pw


encode_image = jax.jit(encode_image_impl, static_argnames=("cfg",))


def _vit_2d_rope_angles(grid_h: int, grid_w: int, head_dim: int
                        ) -> np.ndarray:
    """Qwen2-VL vision rope: per-patch angles [n, head_dim/2] — first half
    of the rotary dims follows the row index, second half the column."""
    quarter = head_dim // 4
    inv_freq = 1.0 / (10000.0 ** (np.arange(quarter) / quarter))
    rows = np.repeat(np.arange(grid_h), grid_w)
    cols = np.tile(np.arange(grid_w), grid_h)
    fh = np.outer(rows, inv_freq)
    fw = np.outer(cols, inv_freq)
    return np.concatenate([fh, fw], axis=1)  # [n, head_dim/2]


def _apply_vit_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
                    ) -> jnp.ndarray:
    """x: [n, H, D]; cos/sin: [n, D/2] (neox half-split)."""
    half = x.shape[-1] // 2
    x0 = x[..., :half]
    x1 = x[..., half:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    return jnp.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)


def encode_image_qwen2vl_impl(params, cfg: ClipConfig, pixels: jnp.ndarray,
                              grid_hw: tuple[int, int] | None = None
                              ) -> jnp.ndarray:
    """Qwen2-VL ViT: temporal patch conv, NO learned positions, 2D rotary
    attention, 2x2 merger MLP. pixels: [gh*P, gw*P, 3] -> [n_merged, proj].

    grid_hw = (gh, gw) patch grid — the tower runs at the image's NATIVE
    grid-quantized resolution (the reference sizes the ViT per image via
    the max_image_size hparams, patches/llama.cpp/clip.patch:67-91);
    None = the trained square (back-compat)."""
    P = cfg.patch_size
    if grid_hw is None:
        grid_hw = (cfg.n_patches_side, cfg.n_patches_side)
    GH, GW = grid_hw
    E = cfg.n_embd
    H = cfg.n_heads
    D = E // H

    patches = pixels.reshape(GH, P, GW, P, 3).transpose(0, 2, 4, 1, 3)
    patches = patches.reshape(GH * GW, 3 * P * P)
    w = params["patch_embd"].reshape(E, 3 * P * P)
    if params.get("patch_embd_1") is not None:
        # temporal kernel: static images repeat the frame, so the two
        # temporal slices act as a summed weight
        w = w + params["patch_embd_1"].reshape(E, 3 * P * P)
    x = patches @ w.T
    if params.get("patch_embd_b") is not None:
        x = x + params["patch_embd_b"]

    ang = _vit_2d_rope_angles(GH, GW, D)
    cos = jnp.asarray(np.cos(ang), x.dtype)
    sin = jnp.asarray(np.sin(ang), x.dtype)

    def norm(x, w, b):
        if cfg.vit_rms:
            var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1,
                           keepdims=True)
            return (x * jax.lax.rsqrt(var + cfg.eps)).astype(x.dtype) * w
        return _ln(x, w, b, cfg.eps)

    # qwen2.5vl window attention: 8x8-patch windows (112px / patch 14);
    # the mask keeps patches in natural order (equivalent to llama.cpp's
    # window_index reorder — attention is permutation-invariant)
    if cfg.wa_pattern > 0:
        win = 8
        rows = jnp.arange(GH * GW) // GW
        cols = jnp.arange(GH * GW) % GW
        wid = (rows // win) * GW + (cols // win)
        mask_w = (wid[:, None] == wid[None, :])
    else:
        mask_w = None

    def layer(x, lp):
        h = norm(x, lp["ln1"], lp.get("ln1_b"))
        q = (h @ lp["wq"] + lp.get("bq", 0.0)).reshape(-1, H, D)
        k = (h @ lp["wk"] + lp.get("bk", 0.0)).reshape(-1, H, D)
        v = (h @ lp["wv"] + lp.get("bv", 0.0)).reshape(-1, H, D)
        q = _apply_vit_rope(q, cos, sin)
        k = _apply_vit_rope(k, cos, sin)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (D ** -0.5)
        if mask_w is not None:
            full = lp["is_full"] > 0
            keep = jnp.where(full, jnp.ones_like(mask_w), mask_w)
            scores = jnp.where(keep[None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(-1, E)
        x = x + (attn @ lp["wo"] + lp.get("bo", 0.0))
        h = norm(x, lp["ln2"], lp.get("ln2_b"))
        if "w_gate" in lp:    # qwen2.5vl gated FFN
            g = jax.nn.silu(h @ lp["w_gate"] + lp.get("b_gate", 0.0))
            h = g * (h @ lp["w_up"] + lp.get("b_up", 0.0))
        else:
            h = h @ lp["w_up"] + lp.get("b_up", 0.0)
            h = (jax.nn.silu(h) if cfg.use_silu
                 else _gelu_quick(h) if cfg.use_gelu_quick
                 else jax.nn.gelu(h, approximate=False))
        h = h @ lp["w_down"] + lp.get("b_down", 0.0)
        return x + h, None

    x, _ = jax.lax.scan(layer, x, params["layers"])

    # merger: ln_q (post_ln tensors) then 2x2 spatial merge + 2-layer MLP
    if params.get("post_ln") is not None:
        x = _ln(x, params["post_ln"], params.get("post_ln_b"), cfg.eps)
    m = max(cfg.merge_size, 1)
    x = x.reshape(GH // m, m, GW // m, m, E).transpose(0, 2, 1, 3, 4)
    x = x.reshape((GH // m) * (GW // m), m * m * E)
    x = x @ params["mm_0_weight"] + params.get("mm_0_bias", 0.0)
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["mm_2_weight"] + params.get("mm_2_bias", 0.0)
    return x


encode_image_qwen2vl = jax.jit(encode_image_qwen2vl_impl,
                               static_argnames=("cfg", "grid_hw"))


def qwen2vl_smart_resize(w: int, h: int, cfg: ClipConfig,
                         max_side: int = 0) -> tuple[int, int]:
    """Pick the native grid-quantized pixel size (W, H) for an image:
    aspect-preserving, rounded to PIXEL_QUANT multiples, area clamped to
    [min, max] pixels (the published Qwen2-VL smart_resize; the reference
    exposes the cap as clip.patch max_image_size hparams). Pixel sizes are
    quantized to 2 merged tokens (2*merge*patch px) per side to bound the
    number of distinct XLA compiles."""
    P = cfg.patch_size
    m = max(cfg.merge_size, 1)
    factor = 2 * P * m                       # compile-shape quantization
    max_px = cfg.image_size * cfg.image_size * 4
    if max_side and max_side > 0:
        max_px = min(max_px, max_side * max_side)
    min_px = factor * factor

    def rnd(v):
        return max(factor, int(round(v / factor)) * factor)

    W, H = rnd(w), rnd(h)
    if W * H > max_px:
        s = (max_px / (w * h)) ** 0.5
        W = max(factor, int(w * s / factor) * factor)
        H = max(factor, int(h * s / factor) * factor)
    elif W * H < min_px:
        s = (min_px / (w * h)) ** 0.5
        W, H = rnd(w * s), rnd(h * s)
    return W, H


def preprocess_image_native(img, cfg: ClipConfig, size_wh: tuple[int, int]
                            ) -> np.ndarray:
    """PIL image -> normalized [H, W, 3] f32 at an explicit pixel size."""
    from PIL import Image
    img = img.convert("RGB").resize(size_wh, Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    return (x - mean) / std


def preprocess_image(img, cfg: ClipConfig) -> np.ndarray:
    """PIL image -> normalized [H, W, 3] f32 (bicubic resize to the tower's
    input size; reference uses its own bicubic at z_multimodal/clip)."""
    from PIL import Image
    img = img.convert("RGB").resize((cfg.image_size, cfg.image_size),
                                    Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    return (x - mean) / std
