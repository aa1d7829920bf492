"""ControlNet for SD1.x (+ host-side Canny preprocessor).

Parity target: the reference's --image-control-net-model /
--image-control-strength / --image-control-canny path and the image-edit
multipart `control` field (httpserver.hpp:1913-2037; sd.cpp control.hpp).

The control model is a trainable copy of the UNet encoder: an input-hint
conv stack embeds the control image at latent resolution, the encoder +
middle blocks run with the hint added, and per-block zero-convs emit
residuals that the base UNet adds to its skip connections
(unet_forward(control=...)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF
from .sd_models import (
    _apply_block, _tree_insert, conv2d, silu, timestep_embedding,
)


def load_controlnet(path: str, dtype=jnp.float32) -> dict:
    """GGUF controlnet (control_model.* tensor names) -> param tree."""
    tree: dict = {}
    with GGUFFile(path) as g:
        for name in g.tensors:
            nm = name
            if nm.startswith("control_model."):
                nm = nm[len("control_model."):]
            _tree_insert(tree, nm, jnp.asarray(
                g.tensor_f32(name).reshape(g.tensors[name].shape), dtype))
    if "input_hint_block" not in tree or "zero_convs" not in tree:
        raise ValueError(f"{path}: not a ControlNet checkpoint "
                         "(no input_hint_block/zero_convs)")
    SRV_INF("controlnet", "loaded %s: %d input blocks", path,
            len(tree.get("input_blocks", {})))
    return tree


def controlnet_forward(params: dict, x, hint_latent, t, ctx, aug=None):
    """x: [h, w, C] latents; hint_latent: [h, w, model_ch] pre-embedded
    hint (see embed_hint); returns (skip residuals list, middle residual)."""
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

    outs = []
    h = x
    for kk in sorted(params["input_blocks"], key=int):
        blk = params["input_blocks"][kk]
        if kk == "0":
            c = blk["0"]
            h = conv2d(h, c["weight"], c["bias"])
            h = h + hint_latent
        else:
            h = _apply_block(blk, h, temb, ctx)
        zc = params["zero_convs"][kk]["0"]
        outs.append(conv2d(h, zc["weight"], zc["bias"], padding=0))

    h = _apply_block(params["middle_block"], h, temb, ctx)
    mo = params["middle_block_out"]["0"]
    mid = conv2d(h, mo["weight"], mo["bias"], padding=0)
    return outs, mid


def embed_hint(params: dict, hint_img):
    """Control image [H, W, 3] in [0,1] -> latent-res hint embedding via
    the strided input_hint_block (convs stride at the channel-raising
    positions: the stack downscales x8 total)."""
    p = params["input_hint_block"]
    idx = sorted(p, key=int)
    convs = [p[k] for k in idx if isinstance(p[k], dict) and "weight" in p[k]]
    h = jnp.asarray(hint_img)
    n_down = 0
    for j, c in enumerate(convs):
        cin, cout = c["weight"].shape[1], c["weight"].shape[0]
        stride = 2 if cout > cin and j > 0 and n_down < 3 else 1
        if stride == 2:
            n_down += 1
        h = conv2d(h, c["weight"], c["bias"], stride=stride)
        if j < len(convs) - 1:
            h = silu(h)
    return h


# -- Canny edge preprocessor (host, numpy; sd.cpp preprocess_canny) ----------


def canny(img: np.ndarray, low: float = 0.08, high: float = 0.16
          ) -> np.ndarray:
    """img [H, W, 3] f32 in [0,1] -> white-on-black edge map [H, W, 3]."""
    gray = img @ np.asarray([0.2989, 0.587, 0.114], np.float32)
    # 5x5 gaussian
    k1 = np.asarray([1, 4, 6, 4, 1], np.float32)
    k1 = k1 / k1.sum()
    pad = np.pad(gray, 2, mode="edge")
    blur = np.apply_along_axis(
        lambda r: np.convolve(r, k1, "valid"), 1, pad)
    blur = np.apply_along_axis(
        lambda c: np.convolve(c, k1, "valid"), 0, blur)
    gx = np.zeros_like(blur)
    gy = np.zeros_like(blur)
    gx[1:-1, 1:-1] = (blur[1:-1, 2:] - blur[1:-1, :-2]) * 2 \
        + blur[:-2, 2:] - blur[:-2, :-2] + blur[2:, 2:] - blur[2:, :-2]
    gy[1:-1, 1:-1] = (blur[2:, 1:-1] - blur[:-2, 1:-1]) * 2 \
        + blur[2:, 2:] - blur[:-2, 2:] + blur[2:, :-2] - blur[:-2, :-2]
    mag = np.hypot(gx, gy)
    ang = np.arctan2(gy, gx)
    # non-maximum suppression along the quantized gradient direction
    q = ((np.round(ang / (np.pi / 4)) % 4).astype(int))
    off = {0: (0, 1), 1: (1, 1), 2: (1, 0), 3: (1, -1)}
    nms = np.zeros_like(mag)
    H, W = mag.shape
    pm = np.pad(mag, 1)

    def shifted(dy, dx):
        return pm[1 + dy:H + 1 + dy, 1 + dx:W + 1 + dx]

    for d in range(4):
        dy, dx = off[d]
        sel = q == d
        keep = sel & (mag >= shifted(dy, dx)) & (mag >= shifted(-dy, -dx))
        nms[keep] = mag[keep]
    strong = nms >= high
    weak = (nms >= low) & ~strong
    # one-pass hysteresis: weak pixels touching a strong pixel survive
    grow = strong.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grow |= np.roll(np.roll(strong, dy, 0), dx, 1)
    edges = strong | (weak & grow)
    out = edges.astype(np.float32)
    return np.repeat(out[:, :, None], 3, axis=2)
