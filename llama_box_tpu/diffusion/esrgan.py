"""ESRGAN / Real-ESRGAN x4 upscaler (RRDBNet), TPU-native.

Parity target: the reference's `--image-upscale-model` path, which hands
generated images to stable-diffusion.cpp's ESRGAN upscaler for
`--image-upscale-repeats` rounds of x4 super-resolution
(z_stablediffusion.hpp:339-349 `upscale(upscaler_ctx, img, 4)`).

Architecture (RealESRGAN_x4plus state-dict naming):
    conv_first -> nb x RRDB -> conv_body (+residual) ->
    2x[nearest-up + conv_up{1,2}] -> conv_hr -> conv_last
Each RRDB = 3 residual-dense blocks (5 convs, dense concat, beta=0.2).

All convs run NHWC through XLA (MXU-tiled); the image is processed in
overlapping tiles so arbitrarily large outputs fit VMEM/HBM.
"""

from __future__ import annotations

import functools
import re

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF


def _conv(x, w, b, lrelu: bool):
    """x [H,W,Cin], w [Cout,Cin,3,3] (torch layout), stride 1, pad 1."""
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"))[0]
    out = out + b
    if lrelu:
        out = jnp.where(out >= 0, out, 0.2 * out)
    return out


def _rdb(p: dict, x):
    """Residual dense block: 5 convs, each seeing all previous features."""
    feats = [x]
    for i in range(1, 5):
        w, b = p[f"conv{i}"]
        feats.append(_conv(jnp.concatenate(feats, -1), w, b, lrelu=True))
    w, b = p["conv5"]
    out = _conv(jnp.concatenate(feats, -1), w, b, lrelu=False)
    return x + 0.2 * out


def _rrdb(p: dict, x):
    out = x
    for name in ("rdb1", "rdb2", "rdb3"):
        out = _rdb(p[name], out)
    return x + 0.2 * out


def _upx2(x):
    H, W, C = x.shape
    return jnp.broadcast_to(x[:, None, :, None, :],
                            (H, 2, W, 2, C)).reshape(H * 2, W * 2, C)


def rrdbnet_forward(params: dict, img):
    """img f32 [H, W, 3] in [0,1] -> [4H, 4W, 3] in [0,1]."""
    fea = _conv(img, *params["conv_first"], lrelu=False)
    trunk = fea
    for blk in params["body"]:
        trunk = _rrdb(blk, trunk)
    fea = fea + _conv(trunk, *params["conv_body"], lrelu=False)
    fea = _conv(_upx2(fea), *params["conv_up1"], lrelu=True)
    fea = _conv(_upx2(fea), *params["conv_up2"], lrelu=True)
    fea = _conv(fea, *params["conv_hr"], lrelu=True)
    out = _conv(fea, *params["conv_last"], lrelu=False)
    return jnp.clip(out, 0.0, 1.0)


_OLD_ARCH = {
    # classic ESRGAN "model.N" serialization -> RealESRGAN names
    "model.0": "conv_first", "model.3": "conv_up1", "model.6": "conv_up2",
    "model.8": "conv_hr", "model.10": "conv_last",
}


def _canon(name: str) -> str | None:
    """Map a checkpoint tensor name to the canonical RealESRGAN name."""
    name = name.removesuffix(".weight").removesuffix(".bias")
    if name.startswith(("conv_", "body.")):
        return name
    m = re.match(r"model\.1\.sub\.(\d+)\.RDB(\d)\.conv(\d)\.0", name)
    if m:
        return f"body.{m.group(1)}.rdb{m.group(2)}.conv{m.group(3)}"
    if name == "model.1.sub.23":  # trunk conv in old arch
        return "conv_body"
    return _OLD_ARCH.get(name)


def load_esrgan(path: str, dtype=jnp.float32) -> dict:
    """GGUF ESRGAN/RealESRGAN checkpoint -> params tree for
    rrdbnet_forward. Accepts both RealESRGAN (`body.N.rdbM.convK`) and
    classic ESRGAN (`model.1.sub.N.RDBM.convK.0`) tensor namings."""
    rd = GGUFFile(path)
    raw: dict[str, np.ndarray] = {}
    for name, info in rd.tensors.items():
        base = _canon(name)
        if base is None:
            continue
        kind = "weight" if name.endswith(".weight") else "bias"
        raw[f"{base}.{kind}"] = rd.tensor_f32(name).reshape(info.shape)

    def wb(base):
        w = raw[f"{base}.weight"]
        b = raw.get(f"{base}.bias")
        cout = w.shape[0] if w.ndim == 4 else 1
        if w.ndim != 4:
            raise ValueError(f"{base}: expected conv weight, got {w.shape}")
        if b is None:
            b = np.zeros(cout, np.float32)
        return (jnp.asarray(w, dtype), jnp.asarray(b, dtype))

    nb = 1 + max((int(k.split(".")[1]) for k in raw if k.startswith("body.")),
                 default=-1)
    if nb == 0:
        raise ValueError(f"{path}: no RRDB body blocks found "
                         "(not an ESRGAN checkpoint?)")
    params = {
        "conv_first": wb("conv_first"),
        "conv_body": wb("conv_body"),
        "conv_up1": wb("conv_up1"),
        "conv_up2": wb("conv_up2"),
        "conv_hr": wb("conv_hr"),
        "conv_last": wb("conv_last"),
        "body": [
            {rdb: {f"conv{i}": wb(f"body.{n}.{rdb}.conv{i}")
                   for i in range(1, 6)}
             for rdb in ("rdb1", "rdb2", "rdb3")}
            for n in range(nb)
        ],
    }
    SRV_INF("esrgan", "loaded %s: %d RRDB blocks, nf=%d", path, nb,
            params["conv_first"][0].shape[0])
    return params


class Upscaler:
    """Tiled x4 ESRGAN upscaler (parity with sd.cpp's upscaler_ctx)."""

    SCALE = 4

    def __init__(self, path: str, tile: int = 128, overlap: int = 8,
                 dtype=jnp.float32):
        self.params = load_esrgan(path, dtype)
        self.tile = tile
        self.overlap = overlap
        self._fwd = jax.jit(functools.partial(rrdbnet_forward, self.params))

    def upscale(self, img: np.ndarray) -> np.ndarray:
        """uint8 [H, W, 3] -> uint8 [4H, 4W, 3], tiled with overlap
        blending so any resolution fits on-chip memory."""
        x = np.asarray(img, np.float32) / 255.0
        H, W, _ = x.shape
        S, T, OV = self.SCALE, self.tile, self.overlap
        if H <= T and W <= T:
            out = np.asarray(self._fwd(jnp.asarray(x)))
            return (out * 255.0 + 0.5).astype(np.uint8)
        acc = np.zeros((H * S, W * S, 3), np.float32)
        wgt = np.zeros((H * S, W * S, 1), np.float32)
        step = T - 2 * OV
        for y0 in range(0, H, step):
            for x0 in range(0, W, step):
                ys, xs = max(0, y0 - OV), max(0, x0 - OV)
                ye, xe = min(H, y0 + step + OV), min(W, x0 + step + OV)
                tile_out = np.asarray(self._fwd(jnp.asarray(x[ys:ye, xs:xe])))
                ramp_y = _ramp(ye - ys, OV, ys > 0, ye < H)
                ramp_x = _ramp(xe - xs, OV, xs > 0, xe < W)
                w2 = np.repeat(ramp_y, S)[:, None] * np.repeat(ramp_x, S)[None]
                acc[ys * S:ye * S, xs * S:xe * S] += tile_out * w2[..., None]
                wgt[ys * S:ye * S, xs * S:xe * S, 0] += w2
        out = acc / np.maximum(wgt, 1e-8)
        return (np.clip(out, 0, 1) * 255.0 + 0.5).astype(np.uint8)


def _ramp(n: int, ov: int, fade_lo: bool, fade_hi: bool) -> np.ndarray:
    w = np.ones(n, np.float32)
    if ov > 0:
        edge = np.linspace(1.0 / (ov + 1), 1.0, ov, dtype=np.float32)
        if fade_lo:
            w[:ov] = edge
        if fade_hi:
            w[-ov:] = edge[::-1]
    return w
