"""Tiny FLUX-style fixtures: transformer+VAE+CLIP bundle and a T5 file."""

import numpy as np

from llama_box_tpu.gguf.writer import GGUFWriter

HID = 32          # transformer hidden
HD = 16           # head dim (2 heads)
T5D = 24          # t5 d_model
CLIPD = 64        # clip width (pooled dim)
LATC = 16         # latent channels
VCH = 32          # vae channels
ND = 2            # double blocks
NS = 2            # single blocks


def write_tiny_flux(path: str, seed: int = 0, guidance: bool = True):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="flux")

    def rand(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    def lin(name, o, i):
        w.add_tensor(name + ".weight", rand(o, i))
        w.add_tensor(name + ".bias", rand(o))

    u = "model.diffusion_model."
    lin(u + "img_in", HID, 4 * LATC)
    lin(u + "txt_in", HID, T5D)
    lin(u + "time_in.in_layer", HID, 256)
    lin(u + "time_in.out_layer", HID, HID)
    lin(u + "vector_in.in_layer", HID, CLIPD)
    lin(u + "vector_in.out_layer", HID, HID)
    if guidance:
        lin(u + "guidance_in.in_layer", HID, 256)
        lin(u + "guidance_in.out_layer", HID, HID)
    for n in range(ND):
        b = u + f"double_blocks.{n}."
        for pre in ("img", "txt"):
            lin(b + f"{pre}_mod.lin", 6 * HID, HID)
            lin(b + f"{pre}_attn.qkv", 3 * HID, HID)
            w.add_tensor(b + f"{pre}_attn.norm.query_norm.scale",
                         1.0 + rand(HD))
            w.add_tensor(b + f"{pre}_attn.norm.key_norm.scale",
                         1.0 + rand(HD))
            lin(b + f"{pre}_attn.proj", HID, HID)
            lin(b + f"{pre}_mlp.0", 4 * HID, HID)
            lin(b + f"{pre}_mlp.2", HID, 4 * HID)
    for n in range(NS):
        b = u + f"single_blocks.{n}."
        lin(b + "linear1", 3 * HID + 4 * HID, HID)
        lin(b + "linear2", HID, HID + 4 * HID)
        lin(b + "modulation.lin", 3 * HID, HID)
        w.add_tensor(b + "norm.query_norm.scale", 1.0 + rand(HD))
        w.add_tensor(b + "norm.key_norm.scale", 1.0 + rand(HD))
    lin(u + "final_layer.linear", 4 * LATC, HID)
    lin(u + "final_layer.adaLN_modulation.1", 2 * HID, HID)

    # ---- 16-channel VAE (decoder + encoder, no quant convs) ----
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

    w.add_tensor(v + "decoder.conv_in.weight", rand(VCH, LATC, 3, 3))
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
    w.add_tensor(v + "encoder.conv_in.weight", rand(VCH, 3, 3, 3))
    w.add_tensor(v + "encoder.conv_in.bias", rand(VCH))
    for lvl in ("0", "1", "2"):
        vae_res(v + f"encoder.down.{lvl}.block.0.", VCH, VCH)
        w.add_tensor(v + f"encoder.down.{lvl}.downsample.conv.weight",
                     rand(VCH, VCH, 3, 3))
        w.add_tensor(v + f"encoder.down.{lvl}.downsample.conv.bias",
                     rand(VCH))
    vae_res(v + "encoder.mid.block_1.", VCH, VCH)
    vae_attn(v + "encoder.mid.attn_1.", VCH)
    vae_res(v + "encoder.mid.block_2.", VCH, VCH)
    w.add_tensor(v + "encoder.norm_out.weight", 1.0 + rand(VCH))
    w.add_tensor(v + "encoder.norm_out.bias", rand(VCH))
    w.add_tensor(v + "encoder.conv_out.weight", rand(2 * LATC, VCH, 3, 3))
    w.add_tensor(v + "encoder.conv_out.bias", rand(2 * LATC))

    # ---- CLIP-L text encoder (pooled stream), width CLIPD ----
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
    w.write()
    return path


def write_tiny_t5(path: str, seed: int = 1, n_layers: int = 2,
                  vocab: int = 64):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="t5")

    def rand(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    inner = 16   # 2 heads x 8
    w.add_tensor("shared.weight", rand(vocab, T5D))
    for i in range(n_layers):
        b = f"encoder.block.{i}."
        for nm in ("q", "k", "v"):
            w.add_tensor(b + f"layer.0.SelfAttention.{nm}.weight",
                         rand(inner, T5D))
        w.add_tensor(b + "layer.0.SelfAttention.o.weight",
                     rand(T5D, inner))
        if i == 0:
            w.add_tensor(b + "layer.0.SelfAttention."
                         "relative_attention_bias.weight", rand(32, 2))
        w.add_tensor(b + "layer.0.layer_norm.weight", 1.0 + rand(T5D))
        w.add_tensor(b + "layer.1.DenseReluDense.wi_0.weight",
                     rand(48, T5D))
        w.add_tensor(b + "layer.1.DenseReluDense.wi_1.weight",
                     rand(48, T5D))
        w.add_tensor(b + "layer.1.DenseReluDense.wo.weight",
                     rand(T5D, 48))
        w.add_tensor(b + "layer.1.layer_norm.weight", 1.0 + rand(T5D))
    w.add_tensor("encoder.final_layer_norm.weight", 1.0 + rand(T5D))
    w.write()
    return path
