"""ESRGAN upscaler + v-prediction conversion tests."""

import numpy as np
import pytest

from llama_box_tpu.diffusion.esrgan import Upscaler, load_esrgan, \
    rrdbnet_forward
from tests.fixtures.make_tiny_esrgan import write_tiny_esrgan


@pytest.fixture(scope="module")
def esrgan_path(tmp_path_factory):
    return write_tiny_esrgan(
        str(tmp_path_factory.mktemp("esrgan") / "up.gguf"))


def test_rrdbnet_shapes(esrgan_path):
    params = load_esrgan(esrgan_path)
    assert len(params["body"]) == 2
    img = np.random.default_rng(0).random((16, 12, 3)).astype(np.float32)
    out = np.asarray(rrdbnet_forward(params, img))
    assert out.shape == (64, 48, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_old_arch_naming(tmp_path, esrgan_path):
    """Classic ESRGAN `model.N` serialization loads to the same tree."""
    old = write_tiny_esrgan(str(tmp_path / "old.gguf"), old_arch=True)
    pa = load_esrgan(esrgan_path)
    pb = load_esrgan(old)
    np.testing.assert_allclose(np.asarray(pa["conv_first"][0]),
                               np.asarray(pb["conv_first"][0]))
    np.testing.assert_allclose(
        np.asarray(pa["body"][1]["rdb3"]["conv5"][0]),
        np.asarray(pb["body"][1]["rdb3"]["conv5"][0]))


def test_tiled_matches_whole(esrgan_path):
    """Tiled upscale == whole-image upscale away from fp blend noise."""
    up = Upscaler(esrgan_path, tile=16, overlap=4)
    rng = np.random.default_rng(1)
    img = (rng.random((24, 20, 3)) * 255).astype(np.uint8)
    tiled = up.upscale(img)
    whole = Upscaler(esrgan_path, tile=1024).upscale(img)
    assert tiled.shape == whole.shape == (96, 80, 3)
    # blending at tile seams introduces tiny differences only
    diff = np.abs(tiled.astype(int) - whole.astype(int))
    assert np.quantile(diff, 0.99) <= 2


def test_engine_applies_upscaler(esrgan_path, tmp_path):
    """_finish_images runs the model upscaler on finished streams."""
    from llama_box_tpu.server.engine import Engine, EngineConfig
    from llama_box_tpu.models.config import ModelConfig

    class _FakeStream:
        def result(self):
            return np.zeros((8, 8, 3), np.uint8)

    class _Task:
        rid = "t"
        stream = False
        preview = False
        images = []
        cancelled = False
        steps_done = 0

        def emit(self, *a):
            pass

    eng = Engine(ModelConfig(), None, None, EngineConfig(n_slots=1, n_ctx=16),
                 images_pipeline=object(), upscaler=Upscaler(esrgan_path),
                 upscale_repeats=1)
    task = _Task()
    task.streams = [_FakeStream()]
    eng._finish_images(task)
    from PIL import Image
    import io
    img = Image.open(io.BytesIO(task.images[0]))
    assert img.size == (32, 32)


def test_v_prediction_recovers_eps():
    """eps = c_in*v + sigma*c_in^2*x inverts v = a*eps - b*x0 exactly."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((4, 4, 2)).astype(np.float32)
    for sigma in (0.1, 1.0, 7.5):
        c_in = 1.0 / np.sqrt(1.0 + sigma * sigma)
        x0 = x - sigma * eps
        # what a v-model would output given DDPM-scaled input x*c_in
        v = c_in * eps - (sigma * c_in) * x0
        eps_rec = c_in * v + (sigma * c_in * c_in) * x
        np.testing.assert_allclose(eps_rec, eps, atol=1e-5)


def test_sd_pipeline_v_prediction_runs(tmp_path):
    from llama_box_tpu.diffusion.sd_models import build_sd_pipeline
    from llama_box_tpu.diffusion.pipeline import GenerationParams
    from llama_box_tpu.tokenizer.clip_bpe import HashTokenizer
    from tests.fixtures.make_tiny_sd import write_tiny_sd

    path = write_tiny_sd(str(tmp_path / "sd.gguf"))
    pl_eps = build_sd_pipeline(path, tokenizer=HashTokenizer())
    pl_v = build_sd_pipeline(path, tokenizer=HashTokenizer(),
                             prediction="v")
    p = GenerationParams(prompt="a cat", width=32, height=32, steps=2,
                         seed=3)
    st_e, st_v = pl_eps.txt2img_stream(p), pl_v.txt2img_stream(p)
    st_e.step()
    st_v.step()
    a, b = np.asarray(st_e.latents), np.asarray(st_v.latents)
    assert a.shape == b.shape and not np.allclose(a, b)
