"""TAESD (tiny autoencoder) decoder for fast latent previews.

Parity target: the reference's --image-taesd-model preview path
(z_stablediffusion.hpp streams per-step previews through sd.cpp's TAESD).
The decoder is a small sequential conv net (madebyollin/taesd):

    Clamp, conv(C,64), ReLU,
    3 x [Block x3, Upsample x2, conv(64,64,no-bias)],
    Block, conv(64,3)

where Block(x) = ReLU(conv-ReLU-conv-ReLU-conv (x) + x).

Loading is shape-driven from the torch-sequential state dict names
(`decoder.<i>.weight`, `decoder.<i>.conv.<j>.weight`): parameterless
layers (Clamp/ReLU/Upsample) leave index gaps, and the bias-less convs
are exactly the ones that follow an upsample — so the structure
reconstructs from the tensors alone, robust to depth variants.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF

_PREFIXES = ("first_stage_model.", "taesd.", "decoder.")


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),
        jnp.transpose(w, (2, 3, 1, 0)).astype(jnp.float32),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return out + b if b is not None else out


def load_taesd(path: str) -> list:
    """GGUF TAESD checkpoint -> ordered decoder op list for taesd_decode.
    Ops: ("conv", w, b, upsample_before: bool) | ("block", [w,b]x3)."""
    g = GGUFFile(path)
    items: dict[int, dict] = {}
    for name in g.tensors:
        nm = name
        for p in _PREFIXES:
            if nm.startswith(p):
                nm = nm[len(p):]
        m = re.match(r"^(\d+)\.(weight|bias)$", nm)
        mb = re.match(r"^(\d+)\.conv\.(\d+)\.(weight|bias)$", nm)
        if m:
            d = items.setdefault(int(m.group(1)), {})
            d[m.group(2)] = g.tensor_f32(name).reshape(
                g.tensors[name].shape)
        elif mb:
            d = items.setdefault(int(mb.group(1)), {})
            d.setdefault("conv", {}).setdefault(
                int(mb.group(2)), {})[mb.group(3)] = \
                g.tensor_f32(name).reshape(g.tensors[name].shape)
    g.close()
    if not items:
        raise ValueError(f"{path}: no TAESD decoder tensors found")
    ops = []
    for i in sorted(items):
        d = items[i]
        if "weight" in d:
            w = jnp.asarray(d["weight"])
            b = jnp.asarray(d["bias"]) if "bias" in d else None
            # bias-less convs follow an Upsample in the TAESD decoder
            ops.append(("conv", w, b, b is None))
        elif "conv" in d:
            convs = [(jnp.asarray(d["conv"][j]["weight"]),
                      jnp.asarray(d["conv"][j].get("bias"))
                      if d["conv"][j].get("bias") is not None else None)
                     for j in sorted(d["conv"])]
            ops.append(("block", convs))
    SRV_INF("taesd", "loaded %s: %d decoder ops", path, len(ops))
    return ops


def taesd_decode_impl(ops: list, z: jnp.ndarray) -> jnp.ndarray:
    """z [h, w, C] latents -> [8h, 8w, 3] preview in [0, 1]."""
    x = jnp.tanh(z / 3.0) * 3.0          # Clamp
    for op in ops:
        if op[0] == "conv":
            _, w, b, up = op
            if up:
                H, W, Cc = x.shape
                x = jnp.broadcast_to(
                    x[:, None, :, None, :], (H, 2, W, 2, Cc)
                ).reshape(H * 2, W * 2, Cc)
            x = _conv(x, w, b)
        else:
            h = x
            for j, (w, b) in enumerate(op[1]):
                if j:
                    h = jax.nn.relu(h)
                h = _conv(h, w, b)
            x = jax.nn.relu(h + x)
        if op is ops[0]:
            x = jax.nn.relu(x)
    return jnp.clip(x, 0.0, 1.0)


class TaesdPreview:
    """Jitted TAESD preview decoder (per-shape compile, tiny net)."""

    def __init__(self, path: str):
        self.ops = load_taesd(path)
        self._fn = jax.jit(lambda z: taesd_decode_impl(self.ops, z))

    def __call__(self, latents) -> np.ndarray:
        out = np.asarray(self._fn(jnp.asarray(latents, jnp.float32)))
        return (out * 255.0 + 0.5).astype(np.uint8)
