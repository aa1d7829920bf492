"""GGUF → JAX parameter loading.

GGUF 2D tensors arrive as numpy (out_features, in_features) row-major (the
reader reverses ggml dim order); JAX matmuls want (in, out), so weights are
transposed here once at load. Layer weights are stacked along a leading L
axis for lax.scan.

Round-1 path dequantizes to bf16 in HBM; the quantized-resident path (packed
blocks + Pallas fused dequant-matmul) plugs in behind the same param tree.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF, SRV_WRN
from .config import ModelConfig

_LAYER_WEIGHTS = {
    "attn_norm": ("blk.{i}.attn_norm.weight", False),
    "wq": ("blk.{i}.attn_q.weight", True),
    "wk": ("blk.{i}.attn_k.weight", True),
    "wv": ("blk.{i}.attn_v.weight", True),
    "wo": ("blk.{i}.attn_output.weight", True),
    "ffn_norm": ("blk.{i}.ffn_norm.weight", False),
    "w_gate": ("blk.{i}.ffn_gate.weight", True),
    "w_up": ("blk.{i}.ffn_up.weight", True),
    "w_down": ("blk.{i}.ffn_down.weight", True),
}


def _to_device(x: np.ndarray, dtype, sharding=None):
    arr = jnp.asarray(x, dtype=dtype)
    if sharding is not None:
        arr = jax.device_put(arr, sharding)
    return arr


def load_model(
    path: str,
    dtype=jnp.bfloat16,
    shard_fn: Callable[[str, tuple], object] | None = None,
) -> tuple[ModelConfig, dict]:
    """Load a GGUF model into a stacked-layer param tree.

    shard_fn(name, shape) -> optional jax Sharding for multi-chip placement
    (parallel/mesh.py provides the tensor-parallel policy).
    """
    g = GGUFFile(path)
    cfg = ModelConfig.from_gguf(g)
    SRV_INF("load_model", "arch=%s layers=%d embd=%d heads=%d/%d ff=%d vocab=%d",
            cfg.arch, cfg.n_layers, cfg.n_embd, cfg.n_heads, cfg.n_kv_heads,
            cfg.n_ff, cfg.vocab_size)

    def fetch(name: str, transpose: bool) -> np.ndarray:
        x = g.tensor_f32(name)
        return x.T if (transpose and x.ndim == 2) else x

    def put(name: str, x: np.ndarray):
        sh = shard_fn(name, x.shape) if shard_fn else None
        return _to_device(x, dtype, sh)

    params: dict = {}
    params["tok_embd"] = put("tok_embd", fetch("token_embd.weight", False))
    params["output_norm"] = put("output_norm", fetch("output_norm.weight", False))
    if "output.weight" in g.tensors:
        params["output"] = put("output", fetch("output.weight", True))
    else:
        SRV_INF("load_model", "output.weight absent -> tied embeddings")

    layers: dict[str, list[np.ndarray]] = {k: [] for k in _LAYER_WEIGHTS}
    optional_missing = set()
    for i in range(cfg.n_layers):
        for key, (pattern, transpose) in _LAYER_WEIGHTS.items():
            name = pattern.format(i=i)
            if name not in g.tensors:
                optional_missing.add(key)
                continue
            layers[key].append(fetch(name, transpose))
    for key in optional_missing:
        SRV_WRN("load_model", "missing layer tensor class %s", key)
        layers.pop(key, None)

    params["layers"] = {
        key: put(f"layers.{key}", np.stack(vals)) for key, vals in layers.items()
    }
    g.close()
    return cfg, params
