"""SD3 MMDiT tests: loader, forward, CFG flow pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from llama_box_tpu.diffusion.pipeline import GenerationParams
from llama_box_tpu.diffusion.sd3 import build_sd3_pipeline, load_sd3, \
    sd3_forward
from llama_box_tpu.diffusion.sd_models import load_sd
from llama_box_tpu.tokenizer.clip_bpe import HashTokenizer
from tests.fixtures.make_tiny_sd3 import write_tiny_sd3


@pytest.fixture(scope="module")
def sd3_path(tmp_path_factory):
    return write_tiny_sd3(
        str(tmp_path_factory.mktemp("sd3") / "sd3.gguf"))


def test_loader_shapes(sd3_path):
    trees = load_sd(sd3_path)
    cfg, params = load_sd3(trees["unet"])
    assert cfg.hidden == 32 and cfg.n_heads == 2 and cfg.n_blocks == 3
    assert cfg.qk_norm and cfg.pos_grid == 8
    # uniform scan prefix has n_blocks-1 entries, the pre_only tail is
    # eager; its context modulation is 2 chunks
    assert params["blocks"]["x_qkv_w"].shape[0] == 2
    assert params["last_block"]["c_mod_b"].shape[0] == 2 * 32


def test_forward_velocity_shape(sd3_path):
    trees = load_sd(sd3_path)
    cfg, params = load_sd3(trees["unet"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 8, 16)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((20, 48)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    v = sd3_forward(params, cfg, x, ctx, jnp.float32(0.5), y)
    v = np.asarray(v)
    assert v.shape == (8, 8, 16) and np.isfinite(v).all()
    # conditioning reaches the image stream
    v2 = np.asarray(sd3_forward(params, cfg, x, ctx * 0.0,
                                jnp.float32(0.5), y))
    assert not np.allclose(v, v2)


def test_sd3_txt2img_cfg(sd3_path):
    pl = build_sd3_pipeline(sd3_path, tokenizer=HashTokenizer())
    assert pl.flow and pl.supports_negative
    p = GenerationParams(prompt="a cat", negative_prompt="blurry",
                         width=64, height=64, steps=3, seed=2,
                         cfg_scale=4.0)
    st = pl.txt2img_stream(p)
    assert st.latents.shape == (8, 8, 16)
    while not st.done:
        st.step()
    img = st.result()
    assert img.shape == (64, 64, 3) and np.isfinite(
        np.asarray(st.latents)).all()


def test_sd3_deterministic(sd3_path):
    pl = build_sd3_pipeline(sd3_path, tokenizer=HashTokenizer())
    outs = []
    for _ in range(2):
        st = pl.txt2img_stream(GenerationParams(
            prompt="p", width=32, height=32, steps=2, seed=4))
        while not st.done:
            st.step()
        outs.append(st.result())
    np.testing.assert_array_equal(outs[0], outs[1])
