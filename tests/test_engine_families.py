"""Engine-level integration: quantized (W8A8) residency and llama4
models serve end-to-end through the continuous-batching loop."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.models import load_model
from llama_box_tpu.sampling import SamplerParams
from llama_box_tpu.server import Engine, EngineConfig
from llama_box_tpu.server.task import CompletionsTask
from llama_box_tpu.tokenizer import Tokenizer


def _run_task(eng, toks, n=8, temp=0.0, seed=1):
    task = CompletionsTask(list(toks), SamplerParams(temp=temp, seed=seed),
                           tokenizer=eng.tokenizer, max_tokens=n,
                           stream=False)
    eng.submit(task)
    while True:
        kind, payload = task.result_q.get(timeout=180)
        if kind == "final":
            return payload.generated
        if kind == "error":
            raise payload


def test_engine_w8a8_quantized_serving(tmp_path):
    from llama_box_tpu.gguf.constants import GGMLType
    from tests.fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "q.gguf")
    write_tiny_model(path, quant=GGMLType.Q4_K)
    cfg, params = load_model(path, dtype=jnp.bfloat16, quantized=True)
    from llama_box_tpu.ops.qmatmul import QTensor
    assert isinstance(params["layers"]["wq"], QTensor) \
        and params["layers"]["wq"].w8a8
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=2, n_ctx=128))
    eng.start()
    try:
        out = _run_task(eng, [1, 5, 9, 12], n=6)
        assert len(out) == 6
        # greedy determinism through the quantized path
        out2 = _run_task(eng, [1, 5, 9, 12], n=6)
        assert out == out2
    finally:
        eng.stop()


def test_engine_llama4_serving(tmp_path):
    from tests.test_llama4 import write_tiny_llama4

    path = str(tmp_path / "l4.gguf")
    write_tiny_llama4(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=2, n_ctx=96))
    eng.start()
    try:
        out = _run_task(eng, [1, 5, 9], n=6)
        assert len(out) == 6
        # two slots decode concurrently without interference
        t1 = CompletionsTask([1, 4, 7], SamplerParams(temp=0.0, seed=1),
                             tokenizer=tok, max_tokens=5, stream=False)
        t2 = CompletionsTask([1, 9, 2], SamplerParams(temp=0.0, seed=2),
                             tokenizer=tok, max_tokens=5, stream=False)
        eng.submit(t1)
        eng.submit(t2)
        outs = []
        for t in (t1, t2):
            while True:
                kind, payload = t.result_q.get(timeout=180)
                if kind == "final":
                    outs.append(payload.generated)
                    break
                if kind == "error":
                    raise payload
        assert all(len(o) == 5 for o in outs)
    finally:
        eng.stop()
