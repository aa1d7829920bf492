"""FLUX rectified-flow transformer + T5 + flow scheduling tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from llama_box_tpu.diffusion.flux import build_flux_pipeline, flow_sigmas, \
    pack_latents, unpack_latents
from llama_box_tpu.diffusion.pipeline import GenerationParams
from llama_box_tpu.tokenizer.clip_bpe import HashTokenizer
from tests.fixtures.make_tiny_flux import write_tiny_flux, write_tiny_t5


@pytest.fixture(scope="module")
def flux_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("flux")
    return (write_tiny_flux(str(d / "flux.gguf")),
            write_tiny_t5(str(d / "t5.gguf")))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((8, 6, 16)).astype(np.float32))
    toks, ids = pack_latents(z)
    assert toks.shape == (12, 64) and ids.shape == (12, 3)
    np.testing.assert_allclose(np.asarray(unpack_latents(toks, 8, 6)),
                               np.asarray(z))
    # ids enumerate the 2x2-packed grid row-major
    assert ids[0].tolist() == [0, 0, 0]
    assert ids[-1].tolist() == [0, 3, 2]


def test_flow_sigmas_properties():
    s = flow_sigmas(8, shift=1.0)
    assert s[0] == pytest.approx(1.0) and s[-1] == 0.0
    assert np.all(np.diff(s) < 0)
    s3 = flow_sigmas(8, shift=3.0)
    # shifting pushes mass toward high noise
    assert np.all(s3[1:-1] >= s[1:-1])
    sd = flow_sigmas(8, image_seq_len=4096)
    assert sd[0] == pytest.approx(1.0)


def test_t5_encode_shapes(flux_paths):
    from llama_box_tpu.models.t5 import load_t5, t5_encode
    _, t5p = flux_paths
    cfg, params = load_t5(t5p)
    assert cfg.n_layers == 2 and cfg.d_model == 24 and cfg.n_heads == 2
    out = t5_encode(params, cfg, jnp.asarray([3, 7, 11, 0], jnp.int32),
                    valid_len=3)
    assert out.shape == (4, 24)
    assert np.isfinite(np.asarray(out)).all()
    # masking: padding rows don't change valid-token outputs
    out2 = t5_encode(params, cfg, jnp.asarray([3, 7, 11, 42], jnp.int32),
                     valid_len=3)
    np.testing.assert_allclose(np.asarray(out[:3]), np.asarray(out2[:3]),
                               atol=1e-5)


def test_flux_txt2img_stream(flux_paths):
    fp, t5p = flux_paths
    pl = build_flux_pipeline(fp, tokenizer=HashTokenizer(), t5_path=t5p)
    assert pl.flow and pl.latent_channels == 16
    p = GenerationParams(prompt="a red cube", width=64, height=64, steps=3,
                         seed=5, sampler="euler_a")  # maps to euler (flow)
    st = pl.txt2img_stream(p)
    assert st.sampler_name == "euler"
    assert st.latents.shape == (8, 8, 16)
    while not st.done:
        st.step()
    img = st.result()
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8


def test_flux_img2img_flow_mixing(flux_paths):
    fp, t5p = flux_paths
    pl = build_flux_pipeline(fp, tokenizer=HashTokenizer(), t5_path=t5p)
    rng = np.random.default_rng(0)
    init = rng.random((64, 64, 3)).astype(np.float32)
    p = GenerationParams(prompt="x", width=64, height=64, steps=3, seed=1,
                         strength=0.5)
    st = pl.img2img_stream(p, init)
    while not st.done:
        st.step()
    assert st.result().shape == (64, 64, 3)


def test_flux_deterministic(flux_paths):
    fp, t5p = flux_paths
    pl = build_flux_pipeline(fp, tokenizer=HashTokenizer(), t5_path=t5p)
    outs = []
    for _ in range(2):
        st = pl.txt2img_stream(GenerationParams(
            prompt="p", width=32, height=32, steps=2, seed=9))
        while not st.done:
            st.step()
        outs.append(st.result())
    np.testing.assert_array_equal(outs[0], outs[1])
