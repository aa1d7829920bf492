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
