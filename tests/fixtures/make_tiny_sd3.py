"""Tiny SD3-style MMDiT fixture (joint_blocks, learned pos grid)."""

import numpy as np

from llama_box_tpu.gguf.writer import GGUFWriter

HID = 32          # hidden (2 heads of 16; head_dim read from ln_q)
LATC = 16
CTXD = 48         # context_embedder input width
YD = 64           # pooled conditioning width (== CLIP width)
NB = 3            # joint blocks (last context block pre_only)
GRID = 8          # pos_embed grid side


def write_tiny_sd3(path: str, seed: int = 0, qk_norm: bool = True):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="sd3")

    def rand(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    def lin(name, o, i):
        w.add_tensor(name + ".weight", rand(o, i))
        w.add_tensor(name + ".bias", rand(o))

    u = "model.diffusion_model."
    w.add_tensor(u + "x_embedder.proj.weight", rand(HID, LATC, 2, 2))
    w.add_tensor(u + "x_embedder.proj.bias", rand(HID))
    w.add_tensor(u + "pos_embed", rand(1, GRID * GRID, HID))
    lin(u + "t_embedder.mlp.0", HID, 256)
    lin(u + "t_embedder.mlp.2", HID, HID)
    lin(u + "y_embedder.mlp.0", HID, YD)
    lin(u + "y_embedder.mlp.2", HID, HID)
    lin(u + "context_embedder", HID, CTXD)
    for i in range(NB):
        pre_only = i == NB - 1
        for sub in ("context_block", "x_block"):
            b = u + f"joint_blocks.{i}.{sub}."
            is_pre = pre_only and sub == "context_block"
            lin(b + "adaLN_modulation.1", (2 if is_pre else 6) * HID, HID)
            lin(b + "attn.qkv", 3 * HID, HID)
            if qk_norm:
                w.add_tensor(b + "attn.ln_q.weight", 1.0 + rand(HID // 2))
                w.add_tensor(b + "attn.ln_k.weight", 1.0 + rand(HID // 2))
            if not is_pre:
                lin(b + "attn.proj", HID, HID)
                lin(b + "mlp.fc1", 4 * HID, HID)
                lin(b + "mlp.fc2", HID, 4 * HID)
    lin(u + "final_layer.linear", 2 * 2 * LATC, HID)
    lin(u + "final_layer.adaLN_modulation.1", 2 * HID, HID)

    _write_vae_and_clip(w, rng, rand, lin)
    w.write()
    return path


def _write_vae_and_clip(w, rng, rand, lin):
    VCH, LATC_, CLIPD = 32, 16, 64
    v = "first_stage_model."

    def vae_res(prefix, cin, cout):
        w.add_tensor(prefix + "norm1.weight", 1.0 + rand(cin))
        w.add_tensor(prefix + "norm1.bias", rand(cin))
        w.add_tensor(prefix + "conv1.weight", rand(cout, cin, 3, 3))
        w.add_tensor(prefix + "conv1.bias", rand(cout))
        w.add_tensor(prefix + "norm2.weight", 1.0 + rand(cout))
        w.add_tensor(prefix + "norm2.bias", rand(cout))
        w.add_tensor(prefix + "conv2.weight", rand(cout, cout, 3, 3))
        w.add_tensor(prefix + "conv2.bias", rand(cout))

    def vae_attn(prefix, c):
        w.add_tensor(prefix + "norm.weight", 1.0 + rand(c))
        w.add_tensor(prefix + "norm.bias", rand(c))
        for nm in ("q", "k", "v", "proj_out"):
            w.add_tensor(prefix + nm + ".weight", rand(c, c, 1, 1))
            w.add_tensor(prefix + nm + ".bias", rand(c))

    w.add_tensor(v + "decoder.conv_in.weight", rand(VCH, LATC_, 3, 3))
    w.add_tensor(v + "decoder.conv_in.bias", rand(VCH))
    vae_res(v + "decoder.mid.block_1.", VCH, VCH)
    vae_attn(v + "decoder.mid.attn_1.", VCH)
    vae_res(v + "decoder.mid.block_2.", VCH, VCH)
    for lvl in ("2", "1", "0"):
        vae_res(v + f"decoder.up.{lvl}.block.0.", VCH, VCH)
        w.add_tensor(v + f"decoder.up.{lvl}.upsample.conv.weight",
                     rand(VCH, VCH, 3, 3))
        w.add_tensor(v + f"decoder.up.{lvl}.upsample.conv.bias", rand(VCH))
    w.add_tensor(v + "decoder.norm_out.weight", 1.0 + rand(VCH))
    w.add_tensor(v + "decoder.norm_out.bias", rand(VCH))
    w.add_tensor(v + "decoder.conv_out.weight", rand(3, VCH, 3, 3))
    w.add_tensor(v + "decoder.conv_out.bias", rand(3))

    p = "cond_stage_model.transformer.text_model."
    w.add_tensor(p + "embeddings.token_embedding.weight", rand(100, CLIPD))
    w.add_tensor(p + "embeddings.position_embedding.weight",
                 rand(77, CLIPD))
    for i in range(2):
        q = p + f"encoder.layers.{i}."
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(q + f"self_attn.{nm}", CLIPD, CLIPD)
        for nm in ("layer_norm1", "layer_norm2"):
            w.add_tensor(q + f"{nm}.weight", 1.0 + rand(CLIPD))
            w.add_tensor(q + f"{nm}.bias", rand(CLIPD))
        lin(q + "mlp.fc1", CLIPD * 2, CLIPD)
        lin(q + "mlp.fc2", CLIPD, CLIPD * 2)
    w.add_tensor(p + "final_layer_norm.weight", 1.0 + rand(CLIPD))
    w.add_tensor(p + "final_layer_norm.bias", rand(CLIPD))
