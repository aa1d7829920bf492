"""HTTP/OpenAI API golden tests: a real server (engine + aiohttp) on the tiny
CPU model, exercised with a sync client. Mirrors the reference's E2E testing
style (tools/chat.sh) but automated (SURVEY.md §4)."""

import asyncio
import json
import socket
import threading
import time

import pytest
import requests
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.models import load_model
from llama_box_tpu.sampling import SamplerParams
from llama_box_tpu.server.chat import ChatTemplates
from llama_box_tpu.server.engine import Engine, EngineConfig
from llama_box_tpu.server.http import HTTPServer, run_app
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_model import write_tiny_model


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def base_url(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    engine = Engine(cfg, params, tok,
                    EngineConfig(n_slots=2, n_ctx=128, n_ubatch=32))
    engine.start()
    server = HTTPServer(engine, model_name="tiny",
                        defaults=SamplerParams(temp=0.0),
                        chat_templates=ChatTemplates(tok))
    port = free_port()
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def go():
            await run_app(server, "127.0.0.1", port)
            started.set()

        loop.run_until_complete(go())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(timeout=30)
    url = f"http://127.0.0.1:{port}"
    for _ in range(50):
        try:
            if requests.get(url + "/health", timeout=5).ok:
                break
        except requests.ConnectionError:
            time.sleep(0.1)
    yield url
    loop.call_soon_threadsafe(loop.stop)
    engine.stop()


def test_health(base_url):
    r = requests.get(base_url + "/health")
    assert r.status_code == 200
    assert r.json()["status"] == "ok"


def test_models(base_url):
    r = requests.get(base_url + "/v1/models")
    assert r.status_code == 200
    data = r.json()
    assert data["object"] == "list"
    m = data["data"][0]
    assert m["id"] == "tiny"
    assert m["meta"]["support_completion"] is True


def test_tokenize_detokenize_roundtrip(base_url):
    r = requests.post(base_url + "/tokenize",
                      json={"content": "hello world", "add_special": False})
    assert r.status_code == 200
    toks = r.json()["tokens"]
    assert toks
    r2 = requests.post(base_url + "/detokenize", json={"tokens": toks})
    assert r2.status_code == 200
    assert r2.json()["content"].strip() == "hello world"


def test_tokenize_with_pieces(base_url):
    r = requests.post(base_url + "/tokenize",
                      json={"content": "ab", "with_pieces": True})
    assert all("id" in t and "piece" in t for t in r.json()["tokens"])


def test_completions_blocking(base_url):
    r = requests.post(base_url + "/v1/completions", json={
        "prompt": "a b c", "max_tokens": 4, "temperature": 0.0})
    assert r.status_code == 200
    data = r.json()
    assert data["object"] == "text_completion"
    assert data["choices"][0]["finish_reason"] in ("stop", "length")
    u = data["usage"]
    assert u["completion_tokens"] == 4
    assert u["total_tokens"] == u["prompt_tokens"] + 4
    assert "tokens_per_second" in u and "time_to_first_token_ms" in u


def test_chat_completions_blocking(base_url):
    r = requests.post(base_url + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 4, "temperature": 0.0})
    assert r.status_code == 200
    data = r.json()
    assert data["object"] == "chat.completion"
    msg = data["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert data["usage"]["completion_tokens"] == 4


def test_chat_completions_stream(base_url):
    r = requests.post(base_url + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 4, "temperature": 0.0, "stream": True,
        "stream_options": {"include_usage": True}}, stream=True)
    assert r.status_code == 200
    assert r.headers["Content-Type"].startswith("text/event-stream")
    events = []
    for line in r.iter_lines():
        if line.startswith(b"data: "):
            payload = line[6:]
            if payload == b"[DONE]":
                events.append("DONE")
            else:
                events.append(json.loads(payload))
    assert events[-1] == "DONE"
    chunks = [e for e in events if isinstance(e, dict)]
    assert chunks[0]["object"] == "chat.completion.chunk"
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    # usage chunk has empty choices
    assert chunks[-1]["choices"] == [] and "usage" in chunks[-1]
    finishes = [c["choices"][0]["finish_reason"] for c in chunks
                if c["choices"]]
    assert finishes[-1] in ("stop", "length")


def test_completions_stream(base_url):
    r = requests.post(base_url + "/v1/completions", json={
        "prompt": "x y", "max_tokens": 3, "temperature": 0.0,
        "stream": True}, stream=True)
    lines = [l for l in r.iter_lines() if l.startswith(b"data: ")]
    assert lines[-1] == b"data: [DONE]"


def test_embeddings(base_url):
    r = requests.post(base_url + "/v1/embeddings", json={
        "input": ["hello", "world"]})
    assert r.status_code == 200
    data = r.json()
    assert len(data["data"]) == 2
    assert data["data"][0]["object"] == "embedding"
    assert len(data["data"][0]["embedding"]) == 64  # tiny model n_embd


def test_validation_errors(base_url):
    # missing prompt
    r = requests.post(base_url + "/v1/completions", json={})
    assert r.status_code == 400
    assert r.json()["error"]["type"] == "invalid_request_error"
    # bad messages
    r = requests.post(base_url + "/v1/chat/completions",
                      json={"messages": "nope"})
    assert r.status_code == 400
    # bad temperature type
    r = requests.post(base_url + "/v1/completions",
                      json={"prompt": "x", "temperature": "hot"})
    assert r.status_code == 400
    assert r.json()["error"]["param"] == "temperature"
    # bad role
    r = requests.post(base_url + "/v1/chat/completions",
                      json={"messages": [{"role": "alien", "content": "x"}]})
    assert r.status_code == 400
    # stream_options without stream
    r = requests.post(base_url + "/v1/completions", json={
        "prompt": "x", "stream_options": {"include_usage": True}})
    assert r.status_code == 400
    # logit_bias out of range token
    r = requests.post(base_url + "/v1/completions", json={
        "prompt": "x", "logit_bias": {"999999": 5}})
    assert r.status_code == 400


def test_request_id_propagation(base_url):
    r = requests.get(base_url + "/health",
                     headers={"X-Request-ID": "test-rid-123"})
    assert r.headers["X-Request-ID"] == "test-rid-123"


def test_metrics(base_url):
    r = requests.get(base_url + "/metrics")
    assert r.status_code == 200
    text = r.text
    assert "llamabox:prompt_tokens_total" in text
    assert "llamabox:kv_cache_usage_ratio" in text


def test_logprobs(base_url):
    r = requests.post(base_url + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 2, "temperature": 0.0,
        "logprobs": True, "top_logprobs": 3})
    assert r.status_code == 200
    lp = r.json()["choices"][0]["logprobs"]
    assert len(lp["content"]) == 2
    assert len(lp["content"][0]["top_logprobs"]) == 3


def test_embeddings_base64(base_url):
    import base64 as b64

    import numpy as np
    r = requests.post(base_url + "/v1/embeddings", json={
        "input": "hello", "encoding_format": "base64"})
    assert r.status_code == 200
    emb = r.json()["data"][0]["embedding"]
    assert isinstance(emb, str)
    v = np.frombuffer(b64.b64decode(emb), np.float32)
    assert v.shape == (64,)
    r2 = requests.post(base_url + "/v1/embeddings", json={
        "input": "hello", "encoding_format": "npz"})
    assert r2.status_code == 400


def test_models_param_counts(base_url):
    m = requests.get(base_url + "/v1/models").json()["data"][0]
    assert m["meta"]["n_params"] > 0
    assert m["meta"]["size"] > 0


# -- strictness matrix (reference validation semantics,
#    httpserver.hpp:486-2041) ------------------------------------------------

def _bad(base_url, path, body, param=None, match=None):
    r = requests.post(base_url + path, json=body)
    assert r.status_code == 400, (path, body, r.status_code, r.text[:200])
    err = r.json()["error"]
    assert err["type"] == "invalid_request_error"
    if param is not None:
        assert err.get("param") == param, (err, param)
    if match is not None:
        assert match in err["message"], (err["message"], match)
    return err


def test_strict_completions(base_url):
    # stop: must be a string or list of strings
    _bad(base_url, "/v1/completions",
         {"prompt": "x", "stop": [1, 2]}, match="stop")
    _bad(base_url, "/v1/completions",
         {"prompt": "x", "stop": {"a": 1}}, match="stop")
    # logit_bias: map, integer-string keys, values in [-100, 100]
    _bad(base_url, "/v1/completions",
         {"prompt": "x", "logit_bias": [1, 2]}, param="logit_bias")
    _bad(base_url, "/v1/completions",
         {"prompt": "x", "logit_bias": {"abc": 1}}, param="logit_bias")
    _bad(base_url, "/v1/completions",
         {"prompt": "x", "logit_bias": {"1": 500}}, param="logit_bias")
    # max_tokens must fit the context
    _bad(base_url, "/v1/completions",
         {"prompt": "x", "max_tokens": 1 << 24}, match="context")
    # completions-style logprobs is an int in [0, 5]
    _bad(base_url, "/v1/completions",
         {"prompt": "x", "logprobs": 99}, param="logprobs")


def test_strict_chat(base_url):
    # top_logprobs requires logprobs:true and range [0, 20]
    _bad(base_url, "/v1/chat/completions",
         {"messages": [{"role": "user", "content": "x"}],
          "logprobs": True, "top_logprobs": 50}, param="top_logprobs")
    _bad(base_url, "/v1/chat/completions",
         {"messages": [{"role": "user", "content": "x"}],
          "top_logprobs": 5}, match="logprobs")
    # tools must be an array; tool_choice string or object
    _bad(base_url, "/v1/chat/completions",
         {"messages": [{"role": "user", "content": "x"}],
          "tools": {"a": 1}}, match="tools")
    _bad(base_url, "/v1/chat/completions",
         {"messages": [{"role": "user", "content": "x"}],
          "tools": [{"type": "function",
                     "function": {"name": "f", "parameters": {}}}],
          "tool_choice": 42}, match="tool_choice")
    # response_format type gate
    _bad(base_url, "/v1/chat/completions",
         {"messages": [{"role": "user", "content": "x"}],
          "response_format": {"type": "yaml"}}, match="response_format")
    _bad(base_url, "/v1/chat/completions",
         {"messages": [{"role": "user", "content": "x"}],
          "response_format": {"type": "json_schema"}},
         match="json_schema")
    # content list items need a type; unknown types rejected
    _bad(base_url, "/v1/chat/completions",
         {"messages": [{"role": "user", "content": [{"no_type": 1}]}]},
         match="type")
    _bad(base_url, "/v1/chat/completions",
         {"messages": [{"role": "user",
                        "content": [{"type": "video_url",
                                     "video_url": {"url": "x"}}]}]})
    # message without content or tool_calls
    _bad(base_url, "/v1/chat/completions",
         {"messages": [{"role": "assistant"}]})


def test_strict_embeddings_rerank(base_url):
    _bad(base_url, "/v1/embeddings", {}, match="input")
    _bad(base_url, "/v1/embeddings",
         {"input": "x", "encoding_format": "hex"},
         match="encoding_format")
    r = requests.post(base_url + "/v1/rerank",
                      json={"documents": ["a"]})
    if r.status_code != 404:   # rerank is capability-gated
        assert r.status_code == 400
        r = requests.post(base_url + "/v1/rerank",
                          json={"query": "q", "documents": []})
        assert r.status_code == 400
        r = requests.post(base_url + "/v1/rerank",
                          json={"query": "q", "documents": ["a"],
                                "top_n": 0})
        assert r.status_code == 400
