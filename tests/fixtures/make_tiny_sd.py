"""Tiny Stable-Diffusion-style GGUF fixture (sd.cpp tensor naming)."""

import numpy as np

from llama_box_tpu.gguf.writer import GGUFWriter

CH = 32          # model channels
CTX = 64         # cross-attention context dim (text width)
TEMB = 128       # time embedding dim
VOCAB = 100
N_POS = 77


def write_tiny_sdxl(path: str, seed: int = 0):
    """Tiny SDXL-style checkpoint: second text encoder + label_emb."""
    write_tiny_sd(path, seed=seed, xl=True)
    return path


def write_tiny_sd(path: str, seed: int = 0, with_encoder: bool = True,
                  xl: bool = False):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="stable-diffusion")

    def rand(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    def T(name, arr):
        w.add_tensor(name, arr)

    # ---- CLIP text encoder (width=CTX, 1 head of 64, 2 layers) ----
    p = "cond_stage_model.transformer.text_model."
    T(p + "embeddings.token_embedding.weight", rand(VOCAB, CTX))
    T(p + "embeddings.position_embedding.weight", rand(N_POS, CTX))
    for i in range(2):
        q = p + f"encoder.layers.{i}."
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            T(q + f"self_attn.{nm}.weight", rand(CTX, CTX))
            T(q + f"self_attn.{nm}.bias", rand(CTX))
        for nm in ("layer_norm1", "layer_norm2"):
            T(q + f"{nm}.weight", 1.0 + rand(CTX))
            T(q + f"{nm}.bias", rand(CTX))
        T(q + "mlp.fc1.weight", rand(CTX * 2, CTX))
        T(q + "mlp.fc1.bias", rand(CTX * 2))
        T(q + "mlp.fc2.weight", rand(CTX, CTX * 2))
        T(q + "mlp.fc2.bias", rand(CTX))
    T(p + "final_layer_norm.weight", 1.0 + rand(CTX))
    T(p + "final_layer_norm.bias", rand(CTX))

    if xl:
        # second text encoder (bigG stand-in, same width) + projection
        p2 = "cond_stage_model.1.transformer.text_model."
        T(p2 + "embeddings.token_embedding.weight", rand(VOCAB, CTX))
        T(p2 + "embeddings.position_embedding.weight", rand(N_POS, CTX))
        for i in range(2):
            q = p2 + f"encoder.layers.{i}."
            for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
                T(q + f"self_attn.{nm}.weight", rand(CTX, CTX))
                T(q + f"self_attn.{nm}.bias", rand(CTX))
            for nm in ("layer_norm1", "layer_norm2"):
                T(q + f"{nm}.weight", 1.0 + rand(CTX))
                T(q + f"{nm}.bias", rand(CTX))
            T(q + "mlp.fc1.weight", rand(CTX * 2, CTX))
            T(q + "mlp.fc1.bias", rand(CTX * 2))
            T(q + "mlp.fc2.weight", rand(CTX, CTX * 2))
            T(q + "mlp.fc2.bias", rand(CTX))
        T(p2 + "final_layer_norm.weight", 1.0 + rand(CTX))
        T(p2 + "final_layer_norm.bias", rand(CTX))
        T("cond_stage_model.1.transformer.text_projection.weight",
          rand(CTX, CTX))

    # ---- UNet ----
    u = "model.diffusion_model."

    def resblock(prefix, cin, cout):
        T(prefix + "in_layers.0.weight", 1.0 + rand(cin))
        T(prefix + "in_layers.0.bias", rand(cin))
        T(prefix + "in_layers.2.weight", rand(cout, cin, 3, 3))
        T(prefix + "in_layers.2.bias", rand(cout))
        T(prefix + "emb_layers.1.weight", rand(cout, TEMB))
        T(prefix + "emb_layers.1.bias", rand(cout))
        T(prefix + "out_layers.0.weight", 1.0 + rand(cout))
        T(prefix + "out_layers.0.bias", rand(cout))
        T(prefix + "out_layers.3.weight", rand(cout, cout, 3, 3))
        T(prefix + "out_layers.3.bias", rand(cout))
        if cin != cout:
            T(prefix + "skip_connection.weight", rand(cout, cin, 1, 1))
            T(prefix + "skip_connection.bias", rand(cout))

    ctx_dim = 2 * CTX if xl else CTX  # SDXL concatenates both encoders

    def spatial(prefix, c):
        T(prefix + "norm.weight", 1.0 + rand(c))
        T(prefix + "norm.bias", rand(c))
        T(prefix + "proj_in.weight", rand(c, c, 1, 1))
        T(prefix + "proj_in.bias", rand(c))
        b = prefix + "transformer_blocks.0."
        for nm in ("norm1", "norm2", "norm3"):
            T(b + nm + ".weight", 1.0 + rand(c))
            T(b + nm + ".bias", rand(c))
        for attn, kdim in (("attn1", c), ("attn2", ctx_dim)):
            T(b + attn + ".to_q.weight", rand(c, c))
            T(b + attn + ".to_k.weight", rand(c, kdim))
            T(b + attn + ".to_v.weight", rand(c, kdim))
            T(b + attn + ".to_out.0.weight", rand(c, c))
            T(b + attn + ".to_out.0.bias", rand(c))
        T(b + "ff.net.0.proj.weight", rand(c * 4, c))
        T(b + "ff.net.0.proj.bias", rand(c * 4))
        T(b + "ff.net.2.weight", rand(c, c * 2))
        T(b + "ff.net.2.bias", rand(c))
        T(prefix + "proj_out.weight", rand(c, c, 1, 1))
        T(prefix + "proj_out.bias", rand(c))

    T(u + "time_embed.0.weight", rand(TEMB, CH))
    T(u + "time_embed.0.bias", rand(TEMB))
    T(u + "time_embed.2.weight", rand(TEMB, TEMB))
    T(u + "time_embed.2.bias", rand(TEMB))
    if xl:
        aug_dim = CTX + 6 * 256   # pooled + fourier(size ids)
        T(u + "label_emb.0.0.weight", rand(TEMB, aug_dim))
        T(u + "label_emb.0.0.bias", rand(TEMB))
        T(u + "label_emb.0.2.weight", rand(TEMB, TEMB))
        T(u + "label_emb.0.2.bias", rand(TEMB))

    T(u + "input_blocks.0.0.weight", rand(CH, 4, 3, 3))
    T(u + "input_blocks.0.0.bias", rand(CH))
    resblock(u + "input_blocks.1.0.", CH, CH)
    spatial(u + "input_blocks.1.1.", CH)
    T(u + "input_blocks.2.0.op.weight", rand(CH, CH, 3, 3))
    T(u + "input_blocks.2.0.op.bias", rand(CH))
    resblock(u + "input_blocks.3.0.", CH, CH * 2)

    resblock(u + "middle_block.0.", CH * 2, CH * 2)
    spatial(u + "middle_block.1.", CH * 2)
    resblock(u + "middle_block.2.", CH * 2, CH * 2)

    resblock(u + "output_blocks.0.0.", CH * 4, CH * 2)
    resblock(u + "output_blocks.1.0.", CH * 3, CH)
    T(u + "output_blocks.1.1.conv.weight", rand(CH, CH, 3, 3))
    T(u + "output_blocks.1.1.conv.bias", rand(CH))
    resblock(u + "output_blocks.2.0.", CH * 2, CH)
    spatial(u + "output_blocks.2.1.", CH)
    resblock(u + "output_blocks.3.0.", CH * 2, CH)

    T(u + "out.0.weight", 1.0 + rand(CH))
    T(u + "out.0.bias", rand(CH))
    T(u + "out.2.weight", rand(4, CH, 3, 3))
    T(u + "out.2.bias", rand(4))

    # ---- VAE ----
    v = "first_stage_model."

    def vae_res(prefix, cin, cout):
        T(prefix + "norm1.weight", 1.0 + rand(cin))
        T(prefix + "norm1.bias", rand(cin))
        T(prefix + "conv1.weight", rand(cout, cin, 3, 3))
        T(prefix + "conv1.bias", rand(cout))
        T(prefix + "norm2.weight", 1.0 + rand(cout))
        T(prefix + "norm2.bias", rand(cout))
        T(prefix + "conv2.weight", rand(cout, cout, 3, 3))
        T(prefix + "conv2.bias", rand(cout))
        if cin != cout:
            T(prefix + "nin_shortcut.weight", rand(cout, cin, 1, 1))
            T(prefix + "nin_shortcut.bias", rand(cout))

    def vae_attn(prefix, c):
        T(prefix + "norm.weight", 1.0 + rand(c))
        T(prefix + "norm.bias", rand(c))
        for nm in ("q", "k", "v", "proj_out"):
            T(prefix + nm + ".weight", rand(c, c, 1, 1))
            T(prefix + nm + ".bias", rand(c))

    T(v + "post_quant_conv.weight", rand(4, 4, 1, 1))
    T(v + "post_quant_conv.bias", rand(4))
    T(v + "decoder.conv_in.weight", rand(CH, 4, 3, 3))
    T(v + "decoder.conv_in.bias", rand(CH))
    vae_res(v + "decoder.mid.block_1.", CH, CH)
    vae_attn(v + "decoder.mid.attn_1.", CH)
    vae_res(v + "decoder.mid.block_2.", CH, CH)
    # three up levels: two upsamples (latent x8 needs 3 ups for real SD; tiny
    # uses scale 8 = 2^3)
    for lvl, has_up in (("2", True), ("1", True), ("0", True)):
        vae_res(v + f"decoder.up.{lvl}.block.0.", CH, CH)
        if has_up:
            T(v + f"decoder.up.{lvl}.upsample.conv.weight",
              rand(CH, CH, 3, 3))
            T(v + f"decoder.up.{lvl}.upsample.conv.bias", rand(CH))
    T(v + "decoder.norm_out.weight", 1.0 + rand(CH))
    T(v + "decoder.norm_out.bias", rand(CH))
    T(v + "decoder.conv_out.weight", rand(3, CH, 3, 3))
    T(v + "decoder.conv_out.bias", rand(3))

    if with_encoder:
        T(v + "quant_conv.weight", rand(8, 8, 1, 1))
        T(v + "quant_conv.bias", rand(8))
        T(v + "encoder.conv_in.weight", rand(CH, 3, 3, 3))
        T(v + "encoder.conv_in.bias", rand(CH))
        for lvl in ("0", "1", "2"):
            vae_res(v + f"encoder.down.{lvl}.block.0.", CH, CH)
            T(v + f"encoder.down.{lvl}.downsample.conv.weight",
              rand(CH, CH, 3, 3))
            T(v + f"encoder.down.{lvl}.downsample.conv.bias", rand(CH))
        vae_res(v + "encoder.mid.block_1.", CH, CH)
        vae_attn(v + "encoder.mid.attn_1.", CH)
        vae_res(v + "encoder.mid.block_2.", CH, CH)
        T(v + "encoder.norm_out.weight", 1.0 + rand(CH))
        T(v + "encoder.norm_out.bias", rand(CH))
        T(v + "encoder.conv_out.weight", rand(8, CH, 3, 3))
        T(v + "encoder.conv_out.bias", rand(8))

    w.write()
    return path
