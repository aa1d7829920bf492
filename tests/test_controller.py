"""Multi-host control plane: plan serialization + PUB/SUB op stream with a
mock engine (the cross-host transport that replaces ggml-RPC, SURVEY §2.2)."""

import threading
import time

import numpy as np
import pytest

from llama_box_tpu.parallel.controller import (
    ControlPlane, OP_STOP, WorkerLoop, _pack, _unpack,
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
    t = threading.Thread(target=wl.run_forever, daemon=True)
    t.start()
    time.sleep(0.3)  # SUB join

    cp.broadcast("prefill", {"tokens": np.ones(4, np.int32)}, {"slot": 1})
    cp.broadcast("decode", {"tokens": np.full(2, 3, np.int32)}, {"slot": 0})
    cp.stop()
    t.join(timeout=10)
    assert not t.is_alive()
    assert seen == [("prefill", 1, 4), ("decode", 0, 6)]
