"""Diffusion subsystem tests: samplers converge with an oracle denoiser, the
engine interleaves image streams with progress events, and the HTTP images
API returns PNGs (reference §2.1 #18, §3.4)."""

import asyncio
import base64
import io
import json
import socket
import threading
import time

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.diffusion import (
    DiffusionPipeline, GenerationParams, NoiseSchedule,
)
from llama_box_tpu.server import Engine, EngineConfig
from llama_box_tpu.server.task import ImagesTask


def make_oracle_pipeline(target: np.ndarray) -> DiffusionPipeline:
    """Denoiser that knows the answer: eps = (x - target) / sigma. Every
    sampler must converge to `target` (latent space == pixel space/8)."""
    tgt = jnp.asarray(target)

    def text_encode(prompt, negative):
        return (prompt, None)

    def denoiser(x, sigma, cond):
        return (x - tgt) / max(float(sigma), 1e-6)

    def vae_decode(lat):
        # pixel = nearest-upscale of latent (keeps the oracle exact)
        lat = jnp.clip(lat, 0, 1)
        return jnp.repeat(jnp.repeat(lat[:, :, :3], 8, 0), 8, 1)

    def vae_encode(img):
        return np.asarray(img[::8, ::8, :3], np.float32) * 0 + np.asarray(
            target[:, :, :3])[:img.shape[0] // 8, :img.shape[1] // 8] \
            if False else np.concatenate(
            [img[::8, ::8, :], np.zeros_like(img[::8, ::8, :1])], -1)

    return DiffusionPipeline(text_encode, denoiser, vae_decode, vae_encode,
                             latent_channels=4, latent_scale=8)


@pytest.mark.parametrize("sampler", ["euler", "euler_a", "dpm++2m"])
def test_samplers_converge(sampler):
    rng = np.random.default_rng(0)
    target = rng.uniform(0.2, 0.8, size=(8, 8, 4)).astype(np.float32)
    pl = make_oracle_pipeline(target)
    p = GenerationParams(prompt="x", width=64, height=64, steps=12,
                         cfg_scale=1.0, sampler=sampler, seed=1)
    st = pl.txt2img_stream(p)
    while not st.done:
        st.step()
    final_lat = np.asarray(st.latents)
    assert np.abs(final_lat - target).mean() < 0.05, sampler


def test_engine_images_progress_and_result(tiny_engine_with_images):
    eng, target = tiny_engine_with_images
    gp = GenerationParams(prompt="a", width=64, height=64, steps=6,
                          cfg_scale=1.0, sampler="euler", seed=7)
    task = ImagesTask(gp, n=2, stream=True)
    eng.submit(task)
    progress, final = [], None
    while final is None:
        kind, payload = task.result_q.get(timeout=120)
        if kind == "progress":
            progress.append(payload)
        elif kind == "final":
            final = payload
        elif kind == "error":
            raise payload
    assert len(final.images) == 2
    from PIL import Image
    img = Image.open(io.BytesIO(final.images[0]))
    assert img.size == (64, 64)
    # both streams progressed step by step
    assert len(progress) == 2 * 6
    u = final.usage()
    assert u["generation_per_second"] > 0


@pytest.fixture(scope="module")
def tiny_engine_with_images(tmp_path_factory):
    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.tokenizer import Tokenizer

    from .fixtures.make_tiny_model import write_tiny_model

    rng = np.random.default_rng(1)
    target = rng.uniform(0.2, 0.8, size=(8, 8, 4)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=64),
                 images_pipeline=make_oracle_pipeline(target))
    eng.start()
    yield eng, target
    eng.stop()


def test_http_images_endpoint(tiny_engine_with_images):
    import requests

    from llama_box_tpu.server.http import HTTPServer, run_app

    eng, target = tiny_engine_with_images
    server = HTTPServer(eng, model_name="tiny-sd",
                        capabilities={"image": True})
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
    url = f"http://127.0.0.1:{port}"

    r = requests.post(url + "/v1/images/generations", json={
        "prompt": "a red square", "size": "64x64", "sample_steps": 4,
        "cfg_scale": 1.0, "seed": 3})
    assert r.status_code == 200, r.text
    data = r.json()
    png = base64.b64decode(data["data"][0]["b64_json"])
    from PIL import Image
    assert Image.open(io.BytesIO(png)).size == (64, 64)
    assert "generation_per_second" in data["usage"]

    # validation errors
    r = requests.post(url + "/v1/images/generations", json={})
    assert r.status_code == 400
    r = requests.post(url + "/v1/images/generations",
                      json={"prompt": "x", "size": "100x100"})
    assert r.status_code == 400
    r = requests.post(url + "/v1/images/generations",
                      json={"prompt": "x", "sampler": "warp"})
    assert r.status_code == 400

    # streaming with progress
    r = requests.post(url + "/v1/images/generations", json={
        "prompt": "x", "size": "64x64", "sample_steps": 3, "stream": True,
        "cfg_scale": 1.0}, stream=True)
    events = [json.loads(l[6:]) for l in r.iter_lines()
              if l.startswith(b"data: ") and l != b"data: [DONE]"]
    assert any("progress" in e["data"][0] for e in events)
    assert "b64_json" in events[-1]["data"][0]

    # chunked result streaming (reference stream bridge,
    # httpserver.hpp:5068-5100): the final image's b64 arrives split
    # into chunk_size pieces; only the per-event item schema changes —
    # reassembling the chunks must give back the identical PNG
    r = requests.post(url + "/v1/images/generations", json={
        "prompt": "x", "size": "64x64", "sample_steps": 3, "seed": 3,
        "stream": True, "cfg_scale": 1.0,
        "stream_options": {"chunk_result": True, "chunk_size": 512,
                           "include_usage": True}}, stream=True)
    events = [json.loads(l[6:]) for l in r.iter_lines()
              if l.startswith(b"data: ") and l != b"data: [DONE]"]
    items = [e["data"][0] for e in events]
    for it in items:
        assert {"index", "object", "progressed_steps", "progress_steps",
                "progress", "finish_reason"} <= set(it)
    finals = [it for it in items if it["finish_reason"] == "stop"]
    assert len(finals) > 1            # chunked: > 1 piece
    assert all(len(it["b64_json"]) <= 512 for it in finals)
    png2 = base64.b64decode("".join(it["b64_json"] for it in finals))
    from PIL import Image as _I
    assert _I.open(io.BytesIO(png2)).size == (64, 64)
    assert any(e.get("usage") for e in events)

    # multipart-flattened stream options parse (image edits path)
    import os
    buf = io.BytesIO()
    _I.new("RGB", (64, 64), (200, 30, 30)).save(buf, format="PNG")
    r = requests.post(url + "/v1/images/edits",
                      data={"prompt": "bluer", "size": "64x64",
                            "sample_steps": "2", "stream": "true",
                            "cfg_scale": "1.0",
                            "stream_options_chunk_result": "true",
                            "stream_options_chunk_size": "600"},
                      files={"image": ("a.png", buf.getvalue(),
                                       "image/png")}, stream=True)
    assert r.status_code == 200, r.text
    events = [json.loads(l[6:]) for l in r.iter_lines()
              if l.startswith(b"data: ") and l != b"data: [DONE]"]
    finals = [e["data"][0] for e in events
              if e["data"][0]["finish_reason"] == "stop"]
    assert len(finals) > 1
    assert all(len(it["b64_json"]) <= 600 for it in finals)
    loop.call_soon_threadsafe(loop.stop)
