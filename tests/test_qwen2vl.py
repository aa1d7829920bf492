"""Qwen2-VL M-RoPE position plumbing: published position scheme, chunked
prefill with grid streams, decode delta continuation."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models import load_model
from llama_box_tpu.sampling import SamplerParams
from llama_box_tpu.server import CompletionsTask, Engine, EngineConfig
from llama_box_tpu.server.multimodal import MTMD_MARKER, build_chunks_mrope
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_mmproj import write_tiny_mmproj
from .fixtures.make_tiny_model import build_vocab

E, HEADS, KV_HEADS, HEAD_DIM, FF, LAYERS = 64, 4, 2, 16, 128, 2


def write_tiny_qwen2vl(path, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="qwen2vl")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_kv("qwen2vl.block_count", LAYERS)
    w.add_kv("qwen2vl.context_length", 256)
    w.add_kv("qwen2vl.embedding_length", E)
    w.add_kv("qwen2vl.feed_forward_length", FF)
    w.add_kv("qwen2vl.attention.head_count", HEADS)
    w.add_kv("qwen2vl.attention.head_count_kv", KV_HEADS)
    w.add_kv("qwen2vl.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv("qwen2vl.rope.freq_base", 10000.0)
    w.add_kv("qwen2vl.rope.dimension_count", HEAD_DIM)
    w.add_kv("qwen2vl.rope.dimension_sections",
             np.array([2, 3, 3, 0], dtype=np.int32))
    vocab, scores, types = build_vocab()
    VOCAB = len(vocab)
    w.add_kv("qwen2vl.vocab_size", VOCAB)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(scores, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array(types, np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    w.add_tensor("token_embd.weight", rand(VOCAB, E))
    w.add_tensor("output_norm.weight", np.ones(E, np.float32))
    w.add_tensor("output.weight", rand(VOCAB, E))
    for i in range(LAYERS):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(E, np.float32))
        w.add_tensor(p + "attn_q.weight", rand(HEADS * HEAD_DIM, E))
        w.add_tensor(p + "attn_q.bias", rand(HEADS * HEAD_DIM))
        w.add_tensor(p + "attn_k.weight", rand(KV_HEADS * HEAD_DIM, E))
        w.add_tensor(p + "attn_k.bias", rand(KV_HEADS * HEAD_DIM))
        w.add_tensor(p + "attn_v.weight", rand(KV_HEADS * HEAD_DIM, E))
        w.add_tensor(p + "attn_v.bias", rand(KV_HEADS * HEAD_DIM))
        w.add_tensor(p + "attn_output.weight", rand(E, HEADS * HEAD_DIM))
        w.add_tensor(p + "ffn_norm.weight", np.ones(E, np.float32))
        w.add_tensor(p + "ffn_gate.weight", rand(FF, E))
        w.add_tensor(p + "ffn_up.weight", rand(FF, E))
        w.add_tensor(p + "ffn_down.weight", rand(E, FF))
    w.write()


def test_qwen2vl_config(tmp_path):
    path = str(tmp_path / "q.gguf")
    write_tiny_qwen2vl(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.arch == "qwen2vl"
    assert cfg.mrope_sections == (2, 3, 3, 0)
    assert cfg.rope_mode == "neox"
    assert "bq" in params["layers"]  # attention biases


def test_mrope_position_scheme(tmp_path):
    """Positions follow the published Qwen2-VL scheme: text sequential;
    image (t const, y rows, x cols) starting at `next`; next advances by
    max(grid) not token count."""
    import io

    from PIL import Image

    lm = str(tmp_path / "lm.gguf")
    mm = str(tmp_path / "mm.gguf")
    write_tiny_qwen2vl(lm)
    write_tiny_mmproj(mm)

    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models.clip import load_clip
    from llama_box_tpu.server.multimodal import MultimodalProcessor
    with GGUFFile(lm) as g:
        tok = Tokenizer.from_gguf(g)
    ccfg, cparams = load_clip(mm)
    mp = MultimodalProcessor(ccfg, cparams)

    buf = io.BytesIO()
    Image.new("RGB", (20, 20), (255, 0, 0)).save(buf, format="PNG")
    img = buf.getvalue()

    prompt = f"hello world {MTMD_MARKER} done"
    flat, chunks, delta = build_chunks_mrope(
        prompt, [img], tok, mp, grids=[(2, 2)])
    kinds = [c[0] for c in chunks]
    assert kinds == ["tokens", "embed", "tokens"]
    t0 = chunks[0][2]
    n_txt = t0.shape[1]
    np.testing.assert_array_equal(t0[0], np.arange(n_txt))  # sequential
    np.testing.assert_array_equal(t0[0], t0[1])
    p_img = chunks[1][3]
    assert p_img.shape == (3, 4)
    np.testing.assert_array_equal(p_img[0], [n_txt] * 4)        # t const
    np.testing.assert_array_equal(p_img[1], n_txt + np.array([0, 0, 1, 1]))
    np.testing.assert_array_equal(p_img[2], n_txt + np.array([0, 1, 0, 1]))
    p_tail = chunks[2][2]
    assert p_tail[0][0] == n_txt + 2  # next advanced by max(grid)=2
    # delta: decode positions = kv_pos + delta; kv len = len(flat)
    assert delta == (n_txt + 2 + p_tail.shape[1]) - len(flat)


def test_qwen2vl_engine_vision_chat(tmp_path):
    import io

    from PIL import Image

    lm = str(tmp_path / "lm.gguf")
    mm = str(tmp_path / "mm.gguf")
    write_tiny_qwen2vl(lm)
    write_tiny_mmproj(mm)
    cfg, params = load_model(lm, dtype=jnp.float32)
    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models.clip import load_clip
    from llama_box_tpu.server.multimodal import MultimodalProcessor
    with GGUFFile(lm) as g:
        tok = Tokenizer.from_gguf(g)
    ccfg, cparams = load_clip(mm)
    mp = MultimodalProcessor(ccfg, cparams)

    buf = io.BytesIO()
    Image.new("RGB", (20, 20), (0, 255, 0)).save(buf, format="PNG")
    img = buf.getvalue()
    flat, chunks, delta = build_chunks_mrope(
        f"describe {MTMD_MARKER} now", [img], tok, mp, grids=[(2, 2)])

    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=128, n_ubatch=16))
    eng.start()
    try:
        def run():
            t = CompletionsTask(list(flat), SamplerParams(temp=0.0, seed=0),
                                tokenizer=tok, max_tokens=5, stream=False,
                                chunks=chunks)
            t.mrope_delta = delta
            eng.submit(t)
            while True:
                k, pl = t.result_q.get(timeout=120)
                if k == "final":
                    return pl
                if k == "error":
                    raise pl

        f1 = run()
        assert len(f1.generated) == 5
        f2 = run()
        assert f2.generated == f1.generated
    finally:
        eng.stop()


def test_qwen2vl_vit_tower(tmp_path):
    """Qwen2-VL-style ViT (2D rope, temporal patch conv, merger) encodes to
    the merged grid size."""
    import io

    from PIL import Image

    from llama_box_tpu.gguf.writer import GGUFWriter
    from llama_box_tpu.models.clip import encode_image_qwen2vl, load_clip

    rng = np.random.default_rng(0)
    path = str(tmp_path / "mm.gguf")
    VE, VFF, VL, VH, P, IMG, PROJ = 32, 64, 2, 4, 4, 16, 64
    w = GGUFWriter(path, architecture="clip")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_kv("clip.projector_type", "qwen2vl_merger")
    w.add_kv("clip.vision.image_size", IMG)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", VE)
    w.add_kv("clip.vision.feed_forward_length", VFF)
    w.add_kv("clip.vision.block_count", VL)
    w.add_kv("clip.vision.attention.head_count", VH)
    w.add_kv("clip.vision.projection_dim", PROJ)
    w.add_tensor("v.patch_embd.weight", rand(VE, 3, P, P))
    w.add_tensor("v.patch_embd.weight.1", rand(VE, 3, P, P))
    w.add_tensor("v.patch_embd.bias", rand(VE))
    w.add_tensor("v.post_ln.weight", 1.0 + rand(VE))
    w.add_tensor("v.post_ln.bias", rand(VE))
    for i in range(VL):
        p = f"v.blk.{i}."
        w.add_tensor(p + "ln1.weight", 1.0 + rand(VE))
        w.add_tensor(p + "ln1.bias", rand(VE))
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", rand(VE, VE))
            w.add_tensor(p + nm + ".bias", rand(VE))
        w.add_tensor(p + "ln2.weight", 1.0 + rand(VE))
        w.add_tensor(p + "ln2.bias", rand(VE))
        w.add_tensor(p + "ffn_up.weight", rand(VFF, VE))
        w.add_tensor(p + "ffn_up.bias", rand(VFF))
        w.add_tensor(p + "ffn_down.weight", rand(VE, VFF))
        w.add_tensor(p + "ffn_down.bias", rand(VE))
    w.add_tensor("mm.0.weight", rand(PROJ, 4 * VE))
    w.add_tensor("mm.0.bias", rand(PROJ))
    w.add_tensor("mm.2.weight", rand(PROJ, PROJ))
    w.add_tensor("mm.2.bias", rand(PROJ))
    w.write()

    ccfg, cparams = load_clip(path)
    assert ccfg.merge_size == 2
    pixels = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    out = encode_image_qwen2vl(cparams, ccfg, jnp.asarray(pixels))
    # 4x4 patches -> 16 tokens -> 2x2 merge -> 4 merged tokens
    assert out.shape == (4, PROJ)
    assert np.isfinite(np.asarray(out)).all()
    # shifting the image changes outputs (2D rope is position-sensitive)
    out2 = encode_image_qwen2vl(cparams, ccfg,
                                jnp.asarray(np.roll(pixels, P, axis=1)))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_qwen25vl_vit_window_attention(tmp_path):
    """Qwen2.5-VL ViT: RMS norms, gated FFN, 8x8-patch window attention
    with full-attention blocks every n_wa_pattern layers."""
    from llama_box_tpu.gguf.writer import GGUFWriter
    from llama_box_tpu.models.clip import encode_image_qwen2vl, load_clip

    rng = np.random.default_rng(1)
    # 16x16 patch grid (image 64 / patch 4) -> window ids span 2x2 windows
    VE, VFF, VL, VH, P, IMG, PROJ = 32, 64, 4, 4, 4, 64, 64

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    def build(path, wa_pattern):
        w = GGUFWriter(path, architecture="clip")
        w.add_kv("clip.projector_type", "qwen2.5vl_merger")
        w.add_kv("clip.vision.image_size", IMG)
        w.add_kv("clip.vision.patch_size", P)
        w.add_kv("clip.vision.embedding_length", VE)
        w.add_kv("clip.vision.feed_forward_length", VFF)
        w.add_kv("clip.vision.block_count", VL)
        w.add_kv("clip.vision.attention.head_count", VH)
        w.add_kv("clip.vision.projection_dim", PROJ)
        if wa_pattern:
            w.add_kv("clip.vision.n_wa_pattern", wa_pattern)
        rng2 = np.random.default_rng(7)

        def r2(*shape):
            return (rng2.standard_normal(shape) * 0.05).astype(np.float32)

        w.add_tensor("v.patch_embd.weight", r2(VE, 3, P, P))
        w.add_tensor("v.patch_embd.weight.1", r2(VE, 3, P, P))
        w.add_tensor("v.patch_embd.bias", r2(VE))
        w.add_tensor("v.post_ln.weight", 1.0 + r2(VE))
        for i in range(VL):
            p = f"v.blk.{i}."
            w.add_tensor(p + "ln1.weight", 1.0 + r2(VE))
            for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
                w.add_tensor(p + nm + ".weight", r2(VE, VE))
                w.add_tensor(p + nm + ".bias", r2(VE))
            w.add_tensor(p + "ln2.weight", 1.0 + r2(VE))
            w.add_tensor(p + "ffn_gate.weight", r2(VFF, VE))
            w.add_tensor(p + "ffn_gate.bias", r2(VFF))
            w.add_tensor(p + "ffn_up.weight", r2(VFF, VE))
            w.add_tensor(p + "ffn_up.bias", r2(VFF))
            w.add_tensor(p + "ffn_down.weight", r2(VE, VFF))
            w.add_tensor(p + "ffn_down.bias", r2(VE))
        w.add_tensor("mm.0.weight", r2(PROJ, 4 * VE))
        w.add_tensor("mm.0.bias", r2(PROJ))
        w.add_tensor("mm.2.weight", r2(PROJ, PROJ))
        w.add_tensor("mm.2.bias", r2(PROJ))
        w.write()
        return path

    pw = build(str(tmp_path / "w.gguf"), wa_pattern=4)
    pf = build(str(tmp_path / "f.gguf"), wa_pattern=0)
    cw, pw_params = load_clip(pw)
    cf, pf_params = load_clip(pf)
    assert cw.wa_pattern == 4 and cw.vit_rms and cw.merge_size == 2
    assert "w_gate" in pw_params["layers"]
    assert "is_full" in pw_params["layers"]
    # layer 4 (1-based) is the only full-attention block
    assert np.asarray(pw_params["layers"]["is_full"]).tolist() == [0, 0, 0, 1]

    pixels = np.random.default_rng(3).uniform(
        -1, 1, (IMG, IMG, 3)).astype(np.float32)
    ow = np.asarray(encode_image_qwen2vl(pw_params, cw,
                                         jnp.asarray(pixels)))
    of = np.asarray(encode_image_qwen2vl(pf_params, cf,
                                         jnp.asarray(pixels)))
    assert ow.shape == of.shape == (64, PROJ)
    assert np.isfinite(ow).all()
    # same weights, different attention topology -> different outputs
    assert not np.allclose(ow, of)


def _write_qwen2vl_mmproj(path, rng, VE=32, VFF=64, VL=2, VH=4, P=4,
                          IMG=16, PROJ=64):
    from llama_box_tpu.gguf.writer import GGUFWriter
    w = GGUFWriter(path, architecture="clip")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_kv("clip.projector_type", "qwen2vl_merger")
    w.add_kv("clip.vision.image_size", IMG)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", VE)
    w.add_kv("clip.vision.feed_forward_length", VFF)
    w.add_kv("clip.vision.block_count", VL)
    w.add_kv("clip.vision.attention.head_count", VH)
    w.add_kv("clip.vision.projection_dim", PROJ)
    w.add_tensor("v.patch_embd.weight", rand(VE, 3, P, P))
    w.add_tensor("v.patch_embd.weight.1", rand(VE, 3, P, P))
    w.add_tensor("v.patch_embd.bias", rand(VE))
    w.add_tensor("v.post_ln.weight", 1.0 + rand(VE))
    w.add_tensor("v.post_ln.bias", rand(VE))
    for i in range(VL):
        p = f"v.blk.{i}."
        w.add_tensor(p + "ln1.weight", 1.0 + rand(VE))
        w.add_tensor(p + "ln1.bias", rand(VE))
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", rand(VE, VE))
            w.add_tensor(p + nm + ".bias", rand(VE))
        w.add_tensor(p + "ln2.weight", 1.0 + rand(VE))
        w.add_tensor(p + "ln2.bias", rand(VE))
        w.add_tensor(p + "ffn_up.weight", rand(VFF, VE))
        w.add_tensor(p + "ffn_up.bias", rand(VFF))
        w.add_tensor(p + "ffn_down.weight", rand(VE, VFF))
        w.add_tensor(p + "ffn_down.bias", rand(VE))
    w.add_tensor("mm.0.weight", rand(PROJ, 4 * VE))
    w.add_tensor("mm.0.bias", rand(PROJ))
    w.add_tensor("mm.2.weight", rand(PROJ, PROJ))
    w.add_tensor("mm.2.bias", rand(PROJ))
    w.write()


def test_qwen2vl_dynamic_resolution(tmp_path):
    """The ViT runs at the image's native patch grid: a non-square image
    yields grid-shaped merged tokens, and the square grid matches the
    fixed-size path exactly (VERDICT r1 item 8; reference
    clip.patch:67-91 max_image_size hparams)."""
    from llama_box_tpu.models.clip import encode_image_qwen2vl, load_clip

    rng = np.random.default_rng(0)
    path = str(tmp_path / "mm.gguf")
    _write_qwen2vl_mmproj(path, rng)
    ccfg, cparams = load_clip(path)
    P, PROJ = 4, 64

    # non-square: 2x6 patch grid -> (2/2)*(6/2) = 3 merged tokens
    pixels = rng.uniform(-1, 1, (2 * P, 6 * P, 3)).astype(np.float32)
    out = encode_image_qwen2vl(cparams, ccfg, jnp.asarray(pixels),
                               grid_hw=(2, 6))
    assert out.shape == (3, PROJ)
    assert np.isfinite(np.asarray(out)).all()

    # square at the trained size == the default fixed path, bit-for-bit
    sq = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    a = np.asarray(encode_image_qwen2vl(cparams, ccfg, jnp.asarray(sq)))
    b = np.asarray(encode_image_qwen2vl(cparams, ccfg, jnp.asarray(sq),
                                        grid_hw=(4, 4)))
    np.testing.assert_array_equal(a, b)

    # the wide grid is NOT just the square rope reused: same pixel
    # content placed in a different grid geometry encodes differently
    wide = rng.uniform(-1, 1, (2 * P, 4 * P, 3)).astype(np.float32)
    tall = np.ascontiguousarray(wide.reshape(4 * P, 2 * P, 3))
    ow = np.asarray(encode_image_qwen2vl(cparams, ccfg, jnp.asarray(wide),
                                         grid_hw=(2, 4)))
    ot = np.asarray(encode_image_qwen2vl(cparams, ccfg, jnp.asarray(tall),
                                         grid_hw=(4, 2)))
    assert ow.shape == ot.shape == (2, PROJ)
    assert not np.allclose(ow, ot)


def test_qwen2vl_smart_resize(tmp_path):
    from llama_box_tpu.models.clip import load_clip, qwen2vl_smart_resize

    rng = np.random.default_rng(0)
    path = str(tmp_path / "mm.gguf")
    _write_qwen2vl_mmproj(path, rng)
    ccfg, _ = load_clip(path)
    factor = 2 * ccfg.patch_size * ccfg.merge_size  # 16

    W, H = qwen2vl_smart_resize(300, 100, ccfg)
    assert W % factor == 0 and H % factor == 0
    # area cap = 4x the trained square (16*16*4 = 1024 px)
    assert W * H <= ccfg.image_size ** 2 * 4
    assert W > H  # aspect preserved

    # tiny images are scaled UP to at least one factor block
    W, H = qwen2vl_smart_resize(5, 5, ccfg)
    assert W >= factor and H >= factor

    # explicit max_side wins when tighter
    W, H = qwen2vl_smart_resize(2000, 2000, ccfg, max_side=factor)
    assert W * H <= factor * factor


def test_qwen2vl_processor_grid_flows_to_mrope(tmp_path):
    """Processor records the native token grid; build_chunks_mrope uses
    it for the (t, y, x) position streams."""
    import io

    from PIL import Image

    from llama_box_tpu.models.clip import load_clip
    from llama_box_tpu.server.multimodal import (MTMD_MARKER,
                                                 MultimodalProcessor,
                                                 build_chunks_mrope)

    rng = np.random.default_rng(0)
    path = str(tmp_path / "mm.gguf")
    _write_qwen2vl_mmproj(path, rng)
    ccfg, cparams = load_clip(path)
    mp = MultimodalProcessor(ccfg, cparams)

    # a wide image: native grid should be wider than tall
    img = Image.fromarray((rng.uniform(0, 255, (40, 120, 3))
                           ).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    emb, h = mp.encode(buf.getvalue())
    g = mp.image_grid(h)
    assert g is not None and g[1] > g[0]
    assert emb.shape[0] == g[0] * g[1]

    class _Tok:
        add_bos = False
        bos_id = None

        def encode(self, s, **kw):
            return [1] * len(s.split())

    flat, chunks, delta = build_chunks_mrope(
        "look " + MTMD_MARKER + " end", [buf.getvalue()], _Tok(), mp, [])
    kind, emb2, dummies, pos3 = [c for c in chunks if c[0] == "embed"][0]
    # width stream advances gw times per row
    assert pos3[2].max() - pos3[2].min() == g[1] - 1
    assert pos3[1].max() - pos3[1].min() == g[0] - 1
