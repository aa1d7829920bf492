"""Qwen2-VL transformers goldens: the vision tower (temporal patch conv,
2D rotary, 2x2 merger) against Qwen2VisionTransformerPretrainedModel, and
the full vision-chat stack (text + image embeds + M-RoPE positions)
against Qwen2VLForConditionalGeneration — this is the end-to-end check of
the published M-RoPE scheme our engine implements.

The tower golden caught a real bug: llama.cpp's clip.use_gelu flag means
plain GELU with QUICK-gelu as the default, and the mapping was inverted.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models import load_model
from llama_box_tpu.models.clip import encode_image_qwen2vl_impl, load_clip
from llama_box_tpu.models.llama import (init_kv_cache, make_rope,
                                        prefill_embed_impl, prefill_impl)

from .fixtures.make_tiny_model import build_vocab

torch = pytest.importorskip("torch")

VE, VH, VL, P, TPS, M, OUT = 32, 4, 2, 4, 2, 2, 64
GH, GW = 4, 6
E, H, HKV, D, FF, L = 64, 4, 2, 16, 128, 2


def _vision_cfg():
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig)
    return Qwen2VLVisionConfig(
        depth=VL, embed_dim=VE, hidden_size=OUT, num_heads=VH,
        patch_size=P, temporal_patch_size=TPS, spatial_merge_size=M,
        in_channels=3, mlp_ratio=2, hidden_act="quick_gelu")


def _write_mmproj(path, st):
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "qwen2vl_merger")
    w.add_kv("clip.vision.image_size", 32)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", VE)
    w.add_kv("clip.vision.feed_forward_length", VE * 2)
    w.add_kv("clip.vision.block_count", VL)
    w.add_kv("clip.vision.attention.head_count", VH)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.projection_dim", OUT)
    w.add_kv("clip.vision.image_mean", np.array([0.5] * 3, np.float32))
    w.add_kv("clip.vision.image_std", np.array([0.5] * 3, np.float32))
    conv = st["patch_embed.proj.weight"]          # [VE, 3, TPS, P, P]
    w.add_tensor("v.patch_embd.weight", conv[:, :, 0].copy())
    w.add_tensor("v.patch_embd.weight.1", conv[:, :, 1].copy())
    for i in range(VL):
        p = f"blocks.{i}."
        o = f"v.blk.{i}."
        qkv = st[p + "attn.qkv.weight"]           # [3*VE, VE] sequential
        qkvb = st[p + "attn.qkv.bias"]
        for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            w.add_tensor(o + nm + ".weight",
                         qkv[j * VE:(j + 1) * VE].copy())
            w.add_tensor(o + nm + ".bias", qkvb[j * VE:(j + 1) * VE].copy())
        w.add_tensor(o + "attn_out.weight", st[p + "attn.proj.weight"])
        w.add_tensor(o + "attn_out.bias", st[p + "attn.proj.bias"])
        w.add_tensor(o + "ln1.weight", st[p + "norm1.weight"])
        w.add_tensor(o + "ln1.bias", st[p + "norm1.bias"])
        w.add_tensor(o + "ln2.weight", st[p + "norm2.weight"])
        w.add_tensor(o + "ln2.bias", st[p + "norm2.bias"])
        w.add_tensor(o + "ffn_up.weight", st[p + "mlp.fc1.weight"])
        w.add_tensor(o + "ffn_up.bias", st[p + "mlp.fc1.bias"])
        w.add_tensor(o + "ffn_down.weight", st[p + "mlp.fc2.weight"])
        w.add_tensor(o + "ffn_down.bias", st[p + "mlp.fc2.bias"])
    w.add_tensor("v.post_ln.weight", st["merger.ln_q.weight"])
    w.add_tensor("v.post_ln.bias", st["merger.ln_q.bias"])
    w.add_tensor("mm.0.weight", st["merger.mlp.0.weight"])
    w.add_tensor("mm.0.bias", st["merger.mlp.0.bias"])
    w.add_tensor("mm.2.weight", st["merger.mlp.2.weight"])
    w.add_tensor("mm.2.bias", st["merger.mlp.2.bias"])
    w.write()


def _hf_patchify(img):
    """Qwen2VLImageProcessor patch flattening (merger-block order) on a
    pre-normalized [H, W, 3] image."""
    x = img.transpose(2, 0, 1)[None]
    x = np.repeat(x, TPS, axis=0)
    pat = x.reshape(1, TPS, 3, GH // M, M, P, GW // M, M, P)
    pat = pat.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return pat.reshape(GH * GW, 3 * TPS * P * P)


def test_qwen2vl_tower_matches_transformers(tmp_path):
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel)
    torch.manual_seed(0)
    vt = Qwen2VisionTransformerPretrainedModel(_vision_cfg()).eval()
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in vt.state_dict().items()}
    rng = np.random.default_rng(0)
    img = rng.uniform(-1.5, 1.5, (GH * P, GW * P, 3)).astype(np.float32)
    with torch.no_grad():
        ref = vt(torch.tensor(_hf_patchify(img)),
                 grid_thw=torch.tensor([[1, GH, GW]])).numpy()
    path = str(tmp_path / "mmproj.gguf")
    _write_mmproj(path, st)
    ccfg, cparams = load_clip(path)
    out = encode_image_qwen2vl_impl(cparams, ccfg, jnp.asarray(img),
                                    grid_hw=(GH, GW))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_qwen2vl_full_stack_matches_transformers(tmp_path):
    """Text + image-embed prefill with M-RoPE grid positions == HF
    Qwen2VLForConditionalGeneration logits (HF computes its own rope
    index; our positions follow the published scheme)."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration
    vocab, _, _ = build_vocab()
    V = len(vocab)
    VS_TOK, IMG_TOK = 285, 286          # <|im_start|> / <|im_end|> reused
    torch.manual_seed(0)
    hc = Qwen2VLConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=L,
        num_attention_heads=H, num_key_value_heads=HKV,
        intermediate_size=FF, rms_norm_eps=1e-5, use_cache=False,
        rope_theta=10000.0, tie_word_embeddings=False,
        vision_start_token_id=VS_TOK, image_token_id=IMG_TOK,
        vision_config=_vision_cfg().to_dict(),
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]})
    hm = Qwen2VLForConditionalGeneration(hc).eval()
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in hm.state_dict().items()}

    def find(suffix):
        for k in st:
            if k.endswith(suffix):
                return st[k]
        raise KeyError(suffix)

    # LLM GGUF (qwen2vl: attention biases, neox rope, M-RoPE sections)
    path = str(tmp_path / "qwen2vl.gguf")
    w = GGUFWriter(path, architecture="qwen2vl")
    for k, v in [("block_count", L), ("context_length", 256),
                 ("embedding_length", E), ("feed_forward_length", FF),
                 ("attention.head_count", H),
                 ("attention.head_count_kv", HKV),
                 ("attention.layer_norm_rms_epsilon", 1e-5),
                 ("rope.freq_base", 10000.0), ("rope.dimension_count", D),
                 ("vocab_size", V)]:
        w.add_kv(f"qwen2vl.{k}", v)
    w.add_kv("qwen2vl.rope.dimension_sections",
             np.array([2, 3, 3, 0], np.int32))
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.zeros(V, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.ones(V, np.int32))
    pfx = ("model.language_model."
           if any(k.startswith("model.language_model.") for k in st)
           else "model.")
    w.add_tensor("token_embd.weight", find("embed_tokens.weight"))
    w.add_tensor("output_norm.weight", st[pfx + "norm.weight"])
    w.add_tensor("output.weight", st["lm_head.weight"])
    for i in range(L):
        p = f"{pfx}layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     st[p + "input_layernorm.weight"])
        w.add_tensor(o + "ffn_norm.weight",
                     st[p + "post_attention_layernorm.weight"])
        for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                       ("v_proj", "attn_v")):
            w.add_tensor(o + gg + ".weight",
                         st[p + f"self_attn.{hf}.weight"])
            w.add_tensor(o + gg + ".bias", st[p + f"self_attn.{hf}.bias"])
        w.add_tensor(o + "attn_output.weight",
                     st[p + "self_attn.o_proj.weight"])
        w.add_tensor(o + "ffn_gate.weight", st[p + "mlp.gate_proj.weight"])
        w.add_tensor(o + "ffn_up.weight", st[p + "mlp.up_proj.weight"])
        w.add_tensor(o + "ffn_down.weight", st[p + "mlp.down_proj.weight"])
    w.write()

    # vision tower -> image embeds (tower golden-checked above)
    vst = {k[len("visual."):]: v for k, v in st.items()
           if k.startswith("visual.")}
    if not vst:
        vst = {k[len("model.visual."):]: v for k, v in st.items()
               if k.startswith("model.visual.")}
    mmpath = str(tmp_path / "mmproj.gguf")
    _write_mmproj(mmpath, vst)
    ccfg, cparams = load_clip(mmpath)
    rng = np.random.default_rng(1)
    img = rng.uniform(-1.5, 1.5, (GH * P, GW * P, 3)).astype(np.float32)
    emb = np.asarray(encode_image_qwen2vl_impl(cparams, ccfg,
                                               jnp.asarray(img),
                                               grid_hw=(GH, GW)))
    n_img = emb.shape[0]
    gh, gw = GH // M, GW // M

    t1 = [1, 263, 270, VS_TOK]
    t2 = [269, 272, 260]
    input_ids = t1 + [IMG_TOK] * n_img + t2
    with torch.no_grad():
        ref = hm(input_ids=torch.tensor([input_ids]),
                 pixel_values=torch.tensor(_hf_patchify(img)),
                 image_grid_thw=torch.tensor([[1, GH, GW]]),
                 ).logits[0, -1].numpy()

    # ours: chunked prefill with the published M-RoPE position streams
    cfg, params = load_model(path, dtype=jnp.float32)
    kv = init_kv_cache(cfg, 1, 64, jnp.float32)
    cos, sin = make_rope(cfg, 64)
    n1 = len(t1)
    pos1 = np.tile(np.arange(n1, dtype=np.int32), (3, 1))
    _, kv = prefill_impl(params, cfg, jnp.asarray(t1, jnp.int32), kv,
                         jnp.int32(0), jnp.int32(0), jnp.int32(n1),
                         cos, sin, mrope_pos=jnp.asarray(pos1))
    posi = np.zeros((3, n_img), np.int32)
    idx = np.arange(n_img)
    posi[0] = n1
    posi[1] = n1 + idx // gw
    posi[2] = n1 + idx % gw
    _, kv = prefill_embed_impl(params, cfg, jnp.asarray(emb), kv,
                               jnp.int32(0), jnp.int32(n1),
                               jnp.int32(n_img), cos, sin,
                               mrope_pos=jnp.asarray(posi))
    nxt = n1 + max(gh, gw)
    pos2 = np.tile(np.arange(nxt, nxt + len(t2), dtype=np.int32), (3, 1))
    logits, kv = prefill_impl(params, cfg, jnp.asarray(t2, jnp.int32), kv,
                              jnp.int32(0), jnp.int32(n1 + n_img),
                              jnp.int32(len(t2)), cos, sin,
                              mrope_pos=jnp.asarray(pos2))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3,
                               rtol=5e-3)
