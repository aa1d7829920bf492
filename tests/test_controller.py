"""Multi-host control plane: plan serialization + PUB/SUB op stream with a
mock engine, PLUS end-to-end integration against a REAL worker process
running the CLI's worker mode (the cross-host transport that replaces
ggml-RPC, SURVEY §2.2; robustness bar: rpcserver.hpp:240-318, :797-814)."""

import os
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from llama_box_tpu.parallel.controller import (
    ControlPlane, OP_STOP, WorkerDied, WorkerLoop, _pack, _unpack,
)


def test_pack_roundtrip():
    arrays = {"tokens": np.arange(8, dtype=np.int32).reshape(2, 4),
              "active": np.array([True, False])}
    scalars = {"slot": 3, "pos": 17, "name": "x"}
    op, seq, a2, s2 = _unpack(_pack("decode", 42, arrays, scalars))
    assert op == "decode" and seq == 42
    np.testing.assert_array_equal(a2["tokens"], arrays["tokens"])
    np.testing.assert_array_equal(a2["active"], arrays["active"])
    assert s2 == scalars


def test_pubsub_op_stream():
    port = 28765
    cp = ControlPlane(bind=f"tcp://127.0.0.1:{port}")
    seen = []

    def make_op(name):
        def fn(arrays, scalars):
            seen.append((name, scalars.get("slot"),
                         arrays.get("tokens").sum()
                         if "tokens" in arrays else None))
        return fn

    wl = WorkerLoop(f"tcp://127.0.0.1:{port}",
                    {"prefill": make_op("prefill"),
                     "decode": make_op("decode")})
    t = threading.Thread(target=lambda: _quiet_run(wl),
                 daemon=True)
    t.start()
    time.sleep(0.3)  # SUB join

    cp.broadcast("prefill", {"tokens": np.ones(4, np.int32)}, {"slot": 1})
    cp.broadcast("decode", {"tokens": np.full(2, 3, np.int32)}, {"slot": 0})
    cp.stop()
    t.join(timeout=10)
    assert not t.is_alive()
    assert seen == [("prefill", 1, 4), ("decode", 0, 6)]


# -- end-to-end: a REAL worker process replaying engine ops ------------------

def _quiet_run(wl):
    """run_forever in a test thread: the die/error scenarios END the
    worker loop by raising — expected here, so swallow the exception
    instead of tripping PytestUnhandledThreadExceptionWarning."""
    try:
        wl.run_forever()
    except BaseException:  # noqa: BLE001 — deliberate worker death
        pass


def _greedy(seed=0, **kw):
    from llama_box_tpu.sampling import SamplerParams
    return SamplerParams(temp=0.0, seed=seed, **kw)


def _run_task(engine, task, timeout=120):
    engine.submit(task)
    while True:
        kind, payload = task.result_q.get(timeout=timeout)
        if kind == "final":
            return payload
        if kind == "error":
            raise payload


def _make_host_engine(gguf_path, control=None):
    import jax.numpy as jnp

    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.server import Engine, EngineConfig
    from llama_box_tpu.tokenizer import Tokenizer

    cfg, params = load_model(gguf_path, dtype=jnp.float32)
    with GGUFFile(gguf_path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=64, n_ubatch=16))
    eng.control = control
    return eng


def test_worker_process_end_to_end(tmp_path):
    """Fork the CLI's worker mode as a real subprocess, drive a full
    serving sequence (multi-slot prefill -> batched decode -> context
    shift -> sampler resets) through the ControlPlane, then assert (a)
    greedy output is identical to a control-plane-less engine, and (b)
    the worker's device state digest matches host 0's bitwise."""
    from .fixtures.make_tiny_model import write_tiny_model

    gguf = str(tmp_path / "tiny.gguf")
    write_tiny_model(gguf)
    addr = f"ipc://{tmp_path}/plans"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize shim registers the real-TPU backend whenever
    # this is set — the worker replica must run on the same CPU backend
    # as the host-0 test engine (bitwise digest identity)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = \
            (flags + " --xla_force_host_platform_device_count=8").strip()
    worker = subprocess.Popen(
        [sys.executable, "-m", "llama_box_tpu.cli", "-m", gguf,
         "--host-id", "1", "--control-connect", addr,
         "-np", "2", "-c", "64", "-ub", "16", "--weights-dtype", "f32"],
        env=env, stdout=open(tmp_path / "worker.log", "wb"),
        stderr=subprocess.STDOUT)
    try:
        cp = ControlPlane(bind=addr, n_workers=1, ack_timeout=120.0)
        cp.wait_ready(timeout=180.0)

        eng = _make_host_engine(gguf, control=cp)
        eng.start()
        tok = eng.tokenizer

        # two concurrent greedy tasks (multi-slot decode) + one long enough
        # to run past the 32-token slot capacity and trigger context shift
        from llama_box_tpu.server import CompletionsTask
        t1 = CompletionsTask(tok.encode("a b c d"), _greedy(),
                             tokenizer=tok, max_tokens=40, stream=False)
        t2 = CompletionsTask(tok.encode("x y z"), _greedy(seed=7),
                             tokenizer=tok, max_tokens=8, stream=False)
        eng.submit(t1)
        f2 = _run_task(eng, t2)
        f1 = _run_task(eng, t1)
        # 40 > slot capacity (32): either it ran through a context shift
        # or greedy hit EOG first — both replayed identically by the worker
        assert len(f1.generated) == 40 or f1.finish_reason == "stop"
        assert len(f2.generated) == 8 or f2.finish_reason == "stop"

        # quiesce, then bitwise replica-state verification
        time.sleep(0.5)
        eng.verify_replicas(timeout=120.0)

        eng.stop()
        cp.stop()
        worker.wait(timeout=60)
        assert worker.returncode == 0, \
            (tmp_path / "worker.log").read_text()[-2000:]
    finally:
        if worker.poll() is None:
            worker.kill()

    # greedy identity vs a plain single-process engine
    ref = _make_host_engine(gguf)
    ref.start()
    r1 = _run_task(ref, CompletionsTask(
        ref.tokenizer.encode("a b c d"), _greedy(), tokenizer=ref.tokenizer,
        max_tokens=40, stream=False))
    ref.stop()
    assert r1.generated == f1.generated


def test_dead_worker_detected():
    """A worker that dies mid-stream must surface as WorkerDied on host 0
    instead of hanging the collective (VERDICT r1 item 4)."""
    port = 28767
    cp = ControlPlane(bind=f"tcp://127.0.0.1:{port}", n_workers=1,
                      ack_timeout=1.0)

    def op_ok(a, s):
        pass

    def op_die(a, s):
        raise SystemExit(1)  # simulates the process vanishing

    wl = WorkerLoop(f"tcp://127.0.0.1:{port}", {"ok": op_ok, "die": op_die})
    t = threading.Thread(target=lambda: _quiet_run(wl),
                 daemon=True)
    t.start()
    cp.wait_ready(timeout=30.0)

    seq = cp.broadcast("ok")
    cp.wait_acked(seq, timeout=30.0)
    cp.check_health()  # healthy

    cp.broadcast("die")
    deadline = time.monotonic() + 30.0
    with pytest.raises(WorkerDied):
        while time.monotonic() < deadline:
            cp.check_health()
            time.sleep(0.1)
    cp.stop()


def test_worker_error_reported():
    """An op that raises on the worker propagates as WorkerDied (err ack)
    rather than a silent desync."""
    port = 28769
    cp = ControlPlane(bind=f"tcp://127.0.0.1:{port}", n_workers=1,
                      ack_timeout=5.0)

    def op_bad(a, s):
        raise ValueError("boom")

    wl = WorkerLoop(f"tcp://127.0.0.1:{port}", {"bad": op_bad})
    t = threading.Thread(target=lambda: _quiet_run(wl),
                 daemon=True)
    t.start()
    cp.wait_ready(timeout=30.0)

    cp.broadcast("bad")
    deadline = time.monotonic() + 30.0
    with pytest.raises(WorkerDied, match="boom"):
        while time.monotonic() < deadline:
            cp.check_health()
            time.sleep(0.05)
    cp.stop()
