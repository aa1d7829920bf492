"""ControlNet: loader, hint embedding, guided denoise, canny."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.diffusion.controlnet import canny, embed_hint, \
    load_controlnet
from llama_box_tpu.diffusion.pipeline import GenerationParams
from llama_box_tpu.diffusion.sd_models import build_sd_pipeline
from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.tokenizer.clip_bpe import HashTokenizer
from tests.fixtures.make_tiny_sd import CH, CTX, TEMB, write_tiny_sd


def write_tiny_controlnet(path, seed=5):
    """Control copy of make_tiny_sd's UNet encoder + hint stack."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="controlnet")

    def rand(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    u = "control_model."

    def lin(name, o, i):
        w.add_tensor(u + name + ".weight", rand(o, i))
        w.add_tensor(u + name + ".bias", rand(o))

    def conv(name, cout, cin, k=3):
        w.add_tensor(u + name + ".weight", rand(cout, cin, k, k))
        w.add_tensor(u + name + ".bias", rand(cout))

    def resblock(prefix, cin, cout):
        w.add_tensor(u + prefix + "in_layers.0.weight", 1.0 + rand(cin))
        w.add_tensor(u + prefix + "in_layers.0.bias", rand(cin))
        conv(prefix + "in_layers.2", cout, cin)
        lin(prefix + "emb_layers.1", cout, TEMB)
        w.add_tensor(u + prefix + "out_layers.0.weight", 1.0 + rand(cout))
        w.add_tensor(u + prefix + "out_layers.0.bias", rand(cout))
        conv(prefix + "out_layers.3", cout, cout)
        if cin != cout:
            conv(prefix + "skip_connection", cout, cin, k=1)

    def spatial(prefix, c):
        w.add_tensor(u + prefix + "norm.weight", 1.0 + rand(c))
        w.add_tensor(u + prefix + "norm.bias", rand(c))
        conv(prefix + "proj_in", c, c, k=1)
        b = prefix + "transformer_blocks.0."
        for nm in ("norm1", "norm2", "norm3"):
            w.add_tensor(u + b + nm + ".weight", 1.0 + rand(c))
            w.add_tensor(u + b + nm + ".bias", rand(c))
        for attn, kdim in (("attn1", c), ("attn2", CTX)):
            w.add_tensor(u + b + attn + ".to_q.weight", rand(c, c))
            w.add_tensor(u + b + attn + ".to_k.weight", rand(c, kdim))
            w.add_tensor(u + b + attn + ".to_v.weight", rand(c, kdim))
            lin(b + attn + ".to_out.0", c, c)
        lin(b + "ff.net.0.proj", c * 4, c)
        lin(b + "ff.net.2", c, c * 2)
        conv(prefix + "proj_out", c, c, k=1)

    lin("time_embed.0", TEMB, CH)
    lin("time_embed.2", TEMB, TEMB)
    # hint stack: 3 -> 4 -> 8 -> 16 -> CH with x2 strides at raises
    conv("input_hint_block.0", 4, 3)
    conv("input_hint_block.2", 8, 4)
    conv("input_hint_block.4", 16, 8)
    conv("input_hint_block.6", CH, 16)
    conv("input_blocks.0.0", CH, 4)
    resblock("input_blocks.1.0.", CH, CH)
    spatial("input_blocks.1.1.", CH)
    conv("input_blocks.2.0.op", CH, CH)
    resblock("input_blocks.3.0.", CH, CH * 2)
    for i, c in ((0, CH), (1, CH), (2, CH), (3, CH * 2)):
        conv(f"zero_convs.{i}.0", c, c, k=1)
    resblock("middle_block.0.", CH * 2, CH * 2)
    spatial("middle_block.1.", CH * 2)
    resblock("middle_block.2.", CH * 2, CH * 2)
    conv("middle_block_out.0", CH * 2, CH * 2, k=1)
    w.write()
    return path


@pytest.fixture(scope="module")
def cn_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("cn")
    sd = write_tiny_sd(str(d / "sd.gguf"))
    cn = write_tiny_controlnet(str(d / "cn.gguf"))
    return sd, cn


def test_loader_and_hint_embed(cn_setup):
    _, cn = cn_setup
    tree = load_controlnet(cn)
    hint = jnp.asarray(np.random.default_rng(0).random(
        (64, 64, 3)).astype(np.float32))
    emb = embed_hint(tree, hint)
    # x8 downscale to latent res, CH channels
    assert emb.shape == (8, 8, CH)


def test_guided_generation_differs(cn_setup):
    sd, cn = cn_setup
    pl = build_sd_pipeline(sd, tokenizer=HashTokenizer(),
                           control_net_path=cn, control_strength=1.0)
    assert hasattr(pl, "hint_embed")
    p = GenerationParams(prompt="a house", width=64, height=64, steps=2,
                         seed=3)
    rng = np.random.default_rng(1)
    ctl = rng.random((64, 64, 3)).astype(np.float32)

    st_plain = pl.txt2img_stream(p)
    st_ctl = pl.txt2img_stream(p, control=ctl)
    while not st_plain.done:
        st_plain.step()
    while not st_ctl.done:
        st_ctl.step()
    a, b = np.asarray(st_plain.latents), np.asarray(st_ctl.latents)
    assert a.shape == b.shape and not np.allclose(a, b)
    assert np.isfinite(b).all()


def test_control_without_model_raises(cn_setup):
    sd, _ = cn_setup
    pl = build_sd_pipeline(sd, tokenizer=HashTokenizer())
    with pytest.raises(ValueError, match="ControlNet"):
        pl.txt2img_stream(GenerationParams(prompt="x", width=64, height=64),
                          control=np.zeros((64, 64, 3), np.float32))


def test_canny_edges():
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0          # vertical step edge
    out = canny(img)
    assert out.shape == (32, 32, 3)
    # the edge column lights up, flat regions stay dark
    assert out[10, 15:17].max() == 1.0
    assert out[:, 3].max() == 0.0 and out[:, 28].max() == 0.0


def _spin_cn_server(cn_setup):
    """Start an Engine + HTTP server over the tiny ControlNet pipeline;
    returns (port, loop, engine)."""
    import asyncio
    import socket
    import threading

    from llama_box_tpu.models.config import ModelConfig
    from llama_box_tpu.server.engine import Engine, EngineConfig
    from llama_box_tpu.server.http import HTTPServer, run_app

    sd, cn = cn_setup
    pl = build_sd_pipeline(sd, tokenizer=HashTokenizer(),
                           control_net_path=cn)
    eng = Engine(ModelConfig(), None, None,
                 EngineConfig(n_slots=1, n_ctx=16), images_pipeline=pl)
    eng.start()
    server = HTTPServer(eng, model_name="sd-cn",
                        capabilities={"image": True, "completion": False,
                                      "embedding": False},
                        image_defaults={"control_canny": True})
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def go():
            await run_app(server, "127.0.0.1", port)
            started.set()

        loop.run_until_complete(go())
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    assert started.wait(30)
    return port, loop, eng


def _png_bytes(color):
    import io as _io

    from PIL import Image
    img = Image.new("RGB", (64, 64), color)
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    buf.seek(0)
    return buf


def test_http_images_edit_with_control(cn_setup):
    """Multipart /v1/images/edits with a control image drives the
    ControlNet-guided pipeline end to end."""
    import base64
    import io as _io

    import requests
    from PIL import Image

    port, loop, eng = _spin_cn_server(cn_setup)

    png_bytes = _png_bytes
    try:
        r = requests.post(
            f"http://127.0.0.1:{port}/v1/images/edits",
            data={"prompt": "a house", "size": "64x64",
                  "sample_steps": "2", "seed": "3"},
            files={"image": ("i.png", png_bytes((40, 80, 120)), "image/png"),
                   "control": ("c.png", png_bytes((0, 0, 0)), "image/png")},
            timeout=300)
        assert r.status_code == 200, r.text
        png = base64.b64decode(r.json()["data"][0]["b64_json"])
        assert Image.open(_io.BytesIO(png)).size == (64, 64)
    finally:
        loop.call_soon_threadsafe(loop.stop)
        eng.stop()


def test_http_images_generations_control_image_json(cn_setup):
    """JSON /v1/images/generations with a base64 control_image (the np-import
    regression path, ADVICE r1)."""
    import base64
    import io as _io

    import requests
    from PIL import Image

    port, loop, eng = _spin_cn_server(cn_setup)
    try:
        ctl_b64 = base64.b64encode(_png_bytes((0, 0, 0)).read()).decode()
        r = requests.post(
            f"http://127.0.0.1:{port}/v1/images/generations",
            json={"prompt": "a house", "size": "64x64", "sample_steps": 2,
                  "seed": 3, "control_image": ctl_b64},
            timeout=300)
        assert r.status_code == 200, r.text
        png = base64.b64decode(r.json()["data"][0]["b64_json"])
        assert Image.open(_io.BytesIO(png)).size == (64, 64)
        # malformed base64 is a 400, not a 500
        r = requests.post(
            f"http://127.0.0.1:{port}/v1/images/generations",
            json={"prompt": "a house", "size": "64x64",
                  "control_image": "not-base64!!"},
            timeout=60)
        assert r.status_code == 400, r.text
    finally:
        loop.call_soon_threadsafe(loop.stop)
        eng.stop()
