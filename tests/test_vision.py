"""Vision pipeline tests: CLIP tower load/encode, projected-embedding cache,
chunked multimodal prefill through the engine (SURVEY.md §2.1 #11/#12)."""

import base64
import io

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.models import load_model
from llama_box_tpu.models.clip import load_clip
from llama_box_tpu.sampling import SamplerParams
from llama_box_tpu.server import CompletionsTask, Engine, EngineConfig
from llama_box_tpu.server.multimodal import (
    MTMD_MARKER, MultimodalProcessor, build_chunks, fetch_image_bytes,
)
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_mmproj import write_tiny_mmproj
from .fixtures.make_tiny_model import write_tiny_model


def png_bytes(color=(255, 0, 0), size=(20, 20)):
    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", size, color).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def vis(tmp_path_factory):
    d = tmp_path_factory.mktemp("m")
    lm_path = str(d / "tiny.gguf")
    mm_path = str(d / "mmproj.gguf")
    write_tiny_model(lm_path)
    write_tiny_mmproj(mm_path)
    cfg, params = load_model(lm_path, dtype=jnp.float32)
    with GGUFFile(lm_path) as g:
        tok = Tokenizer.from_gguf(g)
    ccfg, cparams = load_clip(mm_path)
    mp = MultimodalProcessor(ccfg, cparams, max_cache=2)
    return cfg, params, tok, ccfg, mp


def test_clip_encode_shape_and_cache(vis):
    cfg, params, tok, ccfg, mp = vis
    img = png_bytes()
    emb, h = mp.encode(img)
    assert emb.shape == (4, 64)  # 4 patches -> LM embd 64
    emb2, h2 = mp.encode(img)
    assert h2 == h and emb2 is emb  # LRU hit
    emb3, h3 = mp.encode(png_bytes(color=(0, 255, 0)))
    assert h3 != h
    assert not np.allclose(emb, emb3)


def test_fetch_image_data_uri():
    img = png_bytes()
    uri = "data:image/png;base64," + base64.b64encode(img).decode()
    assert fetch_image_bytes(uri) == img
    assert fetch_image_bytes(base64.b64encode(img).decode()) == img


def test_build_chunks(vis):
    cfg, params, tok, ccfg, mp = vis
    prompt = f"look at this {MTMD_MARKER} picture"
    flat, chunks = build_chunks(prompt, [png_bytes()], tok, mp)
    kinds = [c[0] for c in chunks]
    assert kinds == ["tokens", "embed", "tokens"]
    assert len(flat) == sum(len(c[1]) for c in chunks)
    dummies = chunks[1][2]
    assert all(t < 0 for t in dummies)
    with pytest.raises(ValueError):
        build_chunks("no markers", [png_bytes()], tok, mp)


def test_engine_vision_prefill(vis):
    """Chunked prefill: text + image embeds + text generates tokens, and the
    prefix cache reuses identical image prompts."""
    cfg, params, tok, ccfg, mp = vis
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=128, n_ubatch=16))
    eng.start()
    try:
        prompt = f"describe {MTMD_MARKER} now"
        flat, chunks = build_chunks(prompt, [png_bytes()], tok, mp)

        def run():
            t = CompletionsTask(list(flat), SamplerParams(temp=0.0, seed=0),
                                tokenizer=tok, max_tokens=4, stream=False,
                                chunks=chunks)
            eng.submit(t)
            while True:
                kind, payload = t.result_q.get(timeout=120)
                if kind == "final":
                    return payload
                if kind == "error":
                    raise payload

        f1 = run()
        assert len(f1.generated) == 4
        f2 = run()
        assert f2.generated == f1.generated
        assert f2.n_cached >= len(flat) - 1  # image dummies prefix-cached
    finally:
        eng.stop()


def test_pixtral_tower_matches_transformers(tmp_path):
    """Pixtral rope-2D ViT at a NON-SQUARE native grid: tower hidden
    states match transformers PixtralVisionModel (RMS norms, alternating
    h/w rope frequency slices, gated SiLU FFN)."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers import PixtralVisionConfig, PixtralVisionModel

    from llama_box_tpu.gguf import GGUFWriter
    from llama_box_tpu.models.clip import (encode_image_pixtral_impl,
                                           load_clip, pixtral_fit_resize)

    E, FF, NL, H, D, P = 64, 96, 2, 4, 16, 8
    torch.manual_seed(0)
    hc = PixtralVisionConfig(hidden_size=E, intermediate_size=FF,
                             num_hidden_layers=NL, num_attention_heads=H,
                             head_dim=D, patch_size=P, image_size=64,
                             rope_theta=10000.0, hidden_act="silu")
    hm = PixtralVisionModel(hc).eval()
    st = {k: v.detach().numpy() for k, v in hm.state_dict().items()}

    path = str(tmp_path / "pixtral_mmproj.gguf")
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.projector_type", "pixtral")
    w.add_kv("clip.vision.image_size", 64)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", E)
    w.add_kv("clip.vision.feed_forward_length", FF)
    w.add_kv("clip.vision.block_count", NL)
    w.add_kv("clip.vision.attention.head_count", H)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.vision.rope_theta", 10000.0)
    w.add_kv("clip.use_silu", True)
    w.add_tensor("v.patch_embd.weight", st["patch_conv.weight"])
    w.add_tensor("v.pre_ln.weight", st["ln_pre.weight"])
    for i in range(NL):
        p = f"transformer.layers.{i}."
        o = f"v.blk.{i}."
        w.add_tensor(o + "ln1.weight", st[p + "attention_norm.weight"])
        w.add_tensor(o + "ln2.weight", st[p + "ffn_norm.weight"])
        w.add_tensor(o + "attn_q.weight", st[p + "attention.q_proj.weight"])
        w.add_tensor(o + "attn_k.weight", st[p + "attention.k_proj.weight"])
        w.add_tensor(o + "attn_v.weight", st[p + "attention.v_proj.weight"])
        w.add_tensor(o + "attn_out.weight",
                     st[p + "attention.o_proj.weight"])
        w.add_tensor(o + "ffn_gate.weight",
                     st[p + "feed_forward.gate_proj.weight"])
        w.add_tensor(o + "ffn_up.weight",
                     st[p + "feed_forward.up_proj.weight"])
        w.add_tensor(o + "ffn_down.weight",
                     st[p + "feed_forward.down_proj.weight"])
    w.write()
    cfg, params = load_clip(path)
    assert cfg.vit_rms and cfg.projector == "pixtral"

    rng = np.random.default_rng(0)
    GH, GW = 3, 5   # non-square grid
    pixels = rng.standard_normal((GH * P, GW * P, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hm(torch.tensor(pixels.transpose(2, 0, 1)[None]),
                 image_sizes=torch.tensor([[GH * P, GW * P]]))
    got = encode_image_pixtral_impl(params, cfg, jnp.asarray(pixels),
                                    (GH, GW))
    np.testing.assert_allclose(np.asarray(got),
                               ref.last_hidden_state[0].numpy(),
                               atol=2e-4, rtol=2e-3)
    assert pixtral_fit_resize(100, 37, cfg) == (64, 24)


def test_internvl_tower_matches_transformers(tmp_path):
    """InternVL ViT (layer-scale residual gains, CLS + learned positions,
    biased attention projection) + pixel-shuffle projector: matches
    transformers InternVLVisionModel / InternVLMultiModalProjector."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers import InternVLVisionConfig, InternVLVisionModel
    from transformers.models.internvl import modeling_internvl as mi

    from llama_box_tpu.gguf import GGUFWriter
    from llama_box_tpu.models.clip import encode_image_impl, load_clip

    E, FF, NL, H, P, IMG = 64, 96, 2, 4, 8, 32
    S = IMG // P
    torch.manual_seed(0)
    hc = InternVLVisionConfig(hidden_size=E, intermediate_size=FF,
                              num_hidden_layers=NL, num_attention_heads=H,
                              image_size=[IMG, IMG], patch_size=[P, P],
                              use_absolute_position_embeddings=True,
                              layer_scale_init_value=0.1, use_qk_norm=False,
                              use_mask_token=False, use_mean_pooling=False,
                              hidden_act="gelu", layer_norm_eps=1e-5)
    hm = InternVLVisionModel(hc).eval()
    st = {k: v.detach().numpy() for k, v in hm.state_dict().items()}
    # randomize layer scales away from the constant init
    with torch.no_grad():
        for i in range(NL):
            hm.state_dict()[f"encoder.layer.{i}.lambda_1"].normal_(0.5, 0.2)
            hm.state_dict()[f"encoder.layer.{i}.lambda_2"].normal_(0.5, 0.2)
    st = {k: v.detach().numpy() for k, v in hm.state_dict().items()}

    # projector (text hidden = 48)
    torch.manual_seed(1)
    class _PCfg:
        class vision_config:
            hidden_size = E
        class text_config:
            hidden_size = 48
        downsample_ratio = 0.5
        projector_hidden_act = "gelu"
    proj = mi.InternVLMultiModalProjector(_PCfg()).eval()
    pst = {k: v.detach().numpy() for k, v in proj.state_dict().items()}

    path = str(tmp_path / "internvl_mmproj.gguf")
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.projector_type", "internvl")
    w.add_kv("clip.vision.image_size", IMG)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", E)
    w.add_kv("clip.vision.feed_forward_length", FF)
    w.add_kv("clip.vision.block_count", NL)
    w.add_kv("clip.vision.attention.head_count", H)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.use_gelu", True)
    w.add_tensor("v.patch_embd.weight",
                 st["embeddings.patch_embeddings.projection.weight"])
    w.add_tensor("v.patch_embd.bias",
                 st["embeddings.patch_embeddings.projection.bias"])
    w.add_tensor("v.class_embd", st["embeddings.cls_token"].reshape(E))
    w.add_tensor("v.position_embd.weight",
                 st["embeddings.position_embeddings"][0])
    # final LayerNorm (use_mean_pooling=False keeps a REAL layernorm)
    w.add_tensor("v.post_ln.weight", st["layernorm.weight"])
    w.add_tensor("v.post_ln.bias", st["layernorm.bias"])
    for i in range(NL):
        p = f"encoder.layer.{i}."
        o = f"v.blk.{i}."
        w.add_tensor(o + "ln1.weight", st[p + "layernorm_before.weight"])
        w.add_tensor(o + "ln1.bias", st[p + "layernorm_before.bias"])
        w.add_tensor(o + "ln2.weight", st[p + "layernorm_after.weight"])
        w.add_tensor(o + "ln2.bias", st[p + "layernorm_after.bias"])
        w.add_tensor(o + "attn_q.weight", st[p + "attention.q_proj.weight"])
        w.add_tensor(o + "attn_k.weight", st[p + "attention.k_proj.weight"])
        w.add_tensor(o + "attn_v.weight", st[p + "attention.v_proj.weight"])
        w.add_tensor(o + "attn_out.weight",
                     st[p + "attention.projection_layer.weight"])
        w.add_tensor(o + "attn_out.bias",
                     st[p + "attention.projection_layer.bias"])
        w.add_tensor(o + "ls1.weight", st[p + "lambda_1"])
        w.add_tensor(o + "ls2.weight", st[p + "lambda_2"])
        w.add_tensor(o + "ffn_up.weight", st[p + "mlp.fc1.weight"])
        w.add_tensor(o + "ffn_up.bias", st[p + "mlp.fc1.bias"])
        w.add_tensor(o + "ffn_down.weight", st[p + "mlp.fc2.weight"])
        w.add_tensor(o + "ffn_down.bias", st[p + "mlp.fc2.bias"])
    w.add_tensor("mm.0.weight", pst["layer_norm.weight"])
    w.add_tensor("mm.0.bias", pst["layer_norm.bias"])
    w.add_tensor("mm.1.weight", pst["linear_1.weight"])
    w.add_tensor("mm.1.bias", pst["linear_1.bias"])
    w.add_tensor("mm.3.weight", pst["linear_2.weight"])
    w.add_tensor("mm.3.bias", pst["linear_2.bias"])
    w.write()
    cfg, params = load_clip(path)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        hid = hm(torch.tensor(pixels.transpose(2, 0, 1)[None])) \
            .last_hidden_state          # [1, 1+S*S, E]
        feat = hid[:, 1:].reshape(1, S, S, E)
        # HF InternVLModel.pixel_shuffle sequence
        v = feat.reshape(1, S, S // 2, 2 * E).permute(0, 2, 1, 3)
        v = v.reshape(1, S // 2, S // 2, 4 * E).permute(0, 2, 1, 3)
        ref = proj(v.reshape(1, -1, 4 * E))[0].numpy()
    got = encode_image_impl(params, cfg, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_idefics3_smolvlm_matches_transformers(tmp_path):
    """SmolVLM/Idefics3: SigLIP tower (tanh-GELU, learned positions, no
    CLS) + pixel-shuffle connector with a single modality projection;
    matches transformers Idefics3VisionTransformer + Idefics3Connector."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers import Idefics3VisionConfig
    from transformers.models.idefics3 import modeling_idefics3 as mi

    from llama_box_tpu.gguf import GGUFWriter
    from llama_box_tpu.models.clip import encode_image_impl, load_clip

    E, FF, NL, H, P, IMG, SF = 64, 96, 2, 4, 8, 32, 2
    S = IMG // P
    torch.manual_seed(0)
    hc = Idefics3VisionConfig(hidden_size=E, intermediate_size=FF,
                              num_hidden_layers=NL, num_attention_heads=H,
                              image_size=IMG, patch_size=P,
                              hidden_act="gelu_pytorch_tanh",
                              layer_norm_eps=1e-6)
    hm = mi.Idefics3VisionTransformer._from_config(hc).eval()
    st = {k: v.detach().numpy() for k, v in hm.state_dict().items()}

    class _CCfg:
        scale_factor = SF
        class vision_config:
            hidden_size = E
        class text_config:
            hidden_size = 48
    torch.manual_seed(1)
    conn = mi.Idefics3Connector(_CCfg()).eval()
    cst = {k: v.detach().numpy() for k, v in conn.state_dict().items()}

    path = str(tmp_path / "smolvlm_mmproj.gguf")
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.projector_type", "idefics3")
    w.add_kv("clip.vision.image_size", IMG)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", E)
    w.add_kv("clip.vision.feed_forward_length", FF)
    w.add_kv("clip.vision.block_count", NL)
    w.add_kv("clip.vision.attention.head_count", H)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.projector.scale_factor", SF)
    w.add_kv("clip.use_gelu", True)
    w.add_tensor("v.patch_embd.weight",
                 st["embeddings.patch_embedding.weight"])
    w.add_tensor("v.patch_embd.bias", st["embeddings.patch_embedding.bias"])
    w.add_tensor("v.position_embd.weight",
                 st["embeddings.position_embedding.weight"])
    w.add_tensor("v.post_ln.weight", st["post_layernorm.weight"])
    w.add_tensor("v.post_ln.bias", st["post_layernorm.bias"])
    for i in range(NL):
        p = f"encoder.layers.{i}."
        o = f"v.blk.{i}."
        w.add_tensor(o + "ln1.weight", st[p + "layer_norm1.weight"])
        w.add_tensor(o + "ln1.bias", st[p + "layer_norm1.bias"])
        w.add_tensor(o + "ln2.weight", st[p + "layer_norm2.weight"])
        w.add_tensor(o + "ln2.bias", st[p + "layer_norm2.bias"])
        for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                       ("v_proj", "attn_v"), ("out_proj", "attn_out")):
            w.add_tensor(o + gg + ".weight",
                         st[p + f"self_attn.{hf}.weight"])
            w.add_tensor(o + gg + ".bias", st[p + f"self_attn.{hf}.bias"])
        w.add_tensor(o + "ffn_up.weight", st[p + "mlp.fc1.weight"])
        w.add_tensor(o + "ffn_up.bias", st[p + "mlp.fc1.bias"])
        w.add_tensor(o + "ffn_down.weight", st[p + "mlp.fc2.weight"])
        w.add_tensor(o + "ffn_down.bias", st[p + "mlp.fc2.bias"])
    w.add_tensor("mm.model.fc.weight",
                 cst["modality_projection.proj.weight"])
    w.write()
    cfg, params = load_clip(path)
    assert cfg.projector == "idefics3" and cfg.gelu_tanh

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        hid = hm(torch.tensor(pixels.transpose(2, 0, 1)[None])) \
            .last_hidden_state
        ref = conn(hid)[0].numpy()
    got = encode_image_impl(params, cfg, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)
