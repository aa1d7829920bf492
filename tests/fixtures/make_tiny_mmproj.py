"""Tiny CLIP mmproj GGUF fixture (matches make_tiny_model's n_embd=64)."""

import numpy as np

from llama_box_tpu.gguf.constants import GGMLType
from llama_box_tpu.gguf.writer import GGUFWriter

IMAGE_SIZE = 16
PATCH = 8          # 2x2 = 4 patches
V_EMBD = 32
V_FF = 64
V_LAYERS = 2
V_HEADS = 4
PROJ_DIM = 64      # == tiny LM n_embd


def write_tiny_mmproj(path: str, seed: int = 0, resampler: bool = False,
                      minicpmv_version: int = 3):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="clip")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type",
             "resampler" if resampler else "mlp")
    if resampler:
        w.add_kv("clip.minicpmv_version", minicpmv_version)
    w.add_kv("clip.vision.image_size", IMAGE_SIZE)
    w.add_kv("clip.vision.patch_size", PATCH)
    w.add_kv("clip.vision.embedding_length", V_EMBD)
    w.add_kv("clip.vision.feed_forward_length", V_FF)
    w.add_kv("clip.vision.block_count", V_LAYERS)
    w.add_kv("clip.vision.attention.head_count", V_HEADS)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.vision.projection_dim", PROJ_DIM)
    w.add_kv("clip.vision.image_mean",
             np.array([0.5, 0.5, 0.5], dtype=np.float32))
    w.add_kv("clip.vision.image_std",
             np.array([0.5, 0.5, 0.5], dtype=np.float32))

    w.add_tensor("v.patch_embd.weight", rand(V_EMBD, 3, PATCH, PATCH))
    w.add_tensor("v.patch_embd.bias", rand(V_EMBD))
    w.add_tensor("v.class_embd", rand(V_EMBD))
    n_pos = (IMAGE_SIZE // PATCH) ** 2 + 1
    w.add_tensor("v.position_embd.weight", rand(n_pos, V_EMBD))
    w.add_tensor("v.pre_ln.weight", 1.0 + rand(V_EMBD))
    w.add_tensor("v.pre_ln.bias", rand(V_EMBD))
    w.add_tensor("v.post_ln.weight", 1.0 + rand(V_EMBD))
    w.add_tensor("v.post_ln.bias", rand(V_EMBD))
    for i in range(V_LAYERS):
        p = f"v.blk.{i}."
        w.add_tensor(p + "ln1.weight", 1.0 + rand(V_EMBD))
        w.add_tensor(p + "ln1.bias", rand(V_EMBD))
        w.add_tensor(p + "attn_q.weight", rand(V_EMBD, V_EMBD))
        w.add_tensor(p + "attn_q.bias", rand(V_EMBD))
        w.add_tensor(p + "attn_k.weight", rand(V_EMBD, V_EMBD))
        w.add_tensor(p + "attn_k.bias", rand(V_EMBD))
        w.add_tensor(p + "attn_v.weight", rand(V_EMBD, V_EMBD))
        w.add_tensor(p + "attn_v.bias", rand(V_EMBD))
        w.add_tensor(p + "attn_out.weight", rand(V_EMBD, V_EMBD))
        w.add_tensor(p + "attn_out.bias", rand(V_EMBD))
        w.add_tensor(p + "ln2.weight", 1.0 + rand(V_EMBD))
        w.add_tensor(p + "ln2.bias", rand(V_EMBD))
        w.add_tensor(p + "ffn_up.weight", rand(V_FF, V_EMBD))
        w.add_tensor(p + "ffn_up.bias", rand(V_FF))
        w.add_tensor(p + "ffn_down.weight", rand(V_EMBD, V_FF))
        w.add_tensor(p + "ffn_down.bias", rand(V_EMBD))
    if resampler:
        D, Q = V_EMBD, 4   # resampler dim, learned query count
        w.add_tensor("resampler.query", rand(Q, D))
        w.add_tensor("resampler.kv.weight", rand(D, V_EMBD))
        for nm in ("q", "k", "v", "out"):
            w.add_tensor(f"resampler.attn.{nm}.weight", rand(D, D))
            w.add_tensor(f"resampler.attn.{nm}.bias", rand(D))
        for nm in ("ln_q", "ln_kv", "ln_post"):
            w.add_tensor(f"resampler.{nm}.weight", 1.0 + rand(D))
            w.add_tensor(f"resampler.{nm}.bias", rand(D))
        w.add_tensor("resampler.proj.weight", rand(PROJ_DIM, D))
    else:
        w.add_tensor("mm.0.weight", rand(PROJ_DIM, V_EMBD))
        w.add_tensor("mm.0.bias", rand(PROJ_DIM))
        w.add_tensor("mm.2.weight", rand(PROJ_DIM, PROJ_DIM))
        w.add_tensor("mm.2.bias", rand(PROJ_DIM))
    w.write()
    return path
