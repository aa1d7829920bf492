"""Multi-host serving control plane (TPU-native replacement for the
reference's RPC server mode, SURVEY.md §2.2/§3.5).

Topology: all hosts join one jax.distributed process group and share a
GLOBAL (tp-only) mesh whose ICI spans hosts (pod slice). Every host must
execute the SAME jitted programs with the SAME host-side inputs, so:

- host 0 runs the HTTP server + reconcile scheduler; before each device
  operation it broadcasts a StepPlan (op name + numpy args) on a zmq PUB
  socket, then executes the op locally;
- workers run WorkerLoop: SUB-receive each StepPlan and execute the same
  op through their engine replica (weights/KV are global sharded arrays,
  so XLA's collectives do the actual cross-host work; the plan only
  carries tiny host metadata — tokens, positions, flags).

Replaces: ggml-RPC's GRAPH_COMPUTE/SET_TENSOR protocol (rpcserver.hpp) —
there is no tensor wire traffic at all; weights load from a local GGUF
copy per host (the RPC tensor cache's job, SURVEY.md §5) and activations
ride ICI inside XLA.
"""

from __future__ import annotations

import io
import threading
from typing import Callable

import numpy as np

from ..utils.logging import SRV_ERR, SRV_INF

OP_STOP = "__stop__"


def _pack(op: str, seq: int, arrays: dict, scalars: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    import msgpack
    head = msgpack.packb({"op": op, "seq": seq, "scalars": scalars})
    return len(head).to_bytes(4, "big") + head + buf.getvalue()


def _unpack(data: bytes):
    import msgpack
    n = int.from_bytes(data[:4], "big")
    head = msgpack.unpackb(data[4:4 + n])
    arrays = dict(np.load(io.BytesIO(data[4 + n:]), allow_pickle=False))
    return head["op"], head["seq"], arrays, head["scalars"]


class ControlPlane:
    """Host-0 side: PUB socket broadcasting step plans."""

    def __init__(self, bind: str = "tcp://*:18182", n_workers: int = 0):
        import zmq
        self._ctx = zmq.Context.instance()
        self._pub = self._ctx.socket(zmq.PUB)
        self._pub.bind(bind)
        self._seq = 0
        self._lock = threading.Lock()
        self.n_workers = n_workers
        SRV_INF("control", "control plane PUB on %s", bind)

    def broadcast(self, op: str, arrays: dict | None = None,
                  scalars: dict | None = None) -> None:
        with self._lock:
            self._seq += 1
            self._pub.send(_pack(op, self._seq, arrays or {}, scalars or {}))

    def stop(self) -> None:
        self.broadcast(OP_STOP)
        self._pub.close(0)


class WorkerLoop:
    """Worker side: executes the op stream against an op registry."""

    def __init__(self, connect: str, ops: dict[str, Callable]):
        import zmq
        self._ctx = zmq.Context.instance()
        self._sub = self._ctx.socket(zmq.SUB)
        self._sub.connect(connect)
        self._sub.setsockopt(zmq.SUBSCRIBE, b"")
        self.ops = ops
        self._last_seq = 0

    def run_forever(self) -> None:
        SRV_INF("control", "worker loop started")
        while True:
            op, seq, arrays, scalars = _unpack(self._sub.recv())
            if op == OP_STOP:
                SRV_INF("control", "worker loop stopping")
                return
            if seq <= self._last_seq:
                continue  # replay guard
            if seq != self._last_seq + 1 and self._last_seq:
                SRV_ERR("control", "missed plans %d..%d — desync, aborting",
                        self._last_seq + 1, seq - 1)
                raise RuntimeError("control-plane desync")
            self._last_seq = seq
            fn = self.ops.get(op)
            if fn is None:
                raise RuntimeError(f"unknown control op {op!r}")
            fn(arrays, scalars)


def engine_ops(engine) -> dict[str, Callable]:
    """Op registry mapping step plans onto an Engine replica's device calls.
    Each op mirrors one host-0 call site; the worker passes the same numpy
    inputs so the global jitted program executes collectively."""
    import jax.numpy as jnp

    from ..models.llama import prefill, prefill_embed, shift_kv
    from ..sampling import push_tokens, reset_slot, sample_one

    def op_prefill(a, s):
        from ..server import engine as eng_mod
        logits, engine.kv = prefill(
            engine.params, engine.cfg, jnp.asarray(a["tokens"]), engine.kv,
            jnp.int32(s["slot"]), jnp.int32(s["pos"]), jnp.int32(s["n"]),
            engine.rope_cos, engine.rope_sin)

    def op_prefill_embed(a, s):
        bidir = None
        if s.get("bidir0") is not None:
            bidir = (jnp.int32(s["bidir0"]), jnp.int32(s["bidir1"]))
        logits, engine.kv = prefill_embed(
            engine.params, engine.cfg, jnp.asarray(a["embeds"]), engine.kv,
            jnp.int32(s["slot"]), jnp.int32(s["pos"]), jnp.int32(s["n"]),
            engine.rope_cos, engine.rope_sin, None, bidir_span=bidir)

    def op_decode(a, s):
        from ..server.engine import _decode_verify_sample
        out = _decode_verify_sample(
            engine.params, engine.cfg, jnp.asarray(a["tokens"]),
            jnp.asarray(a["positions"]), jnp.asarray(a["n_draft"]),
            engine.kv, jnp.asarray(a["active"]), jnp.asarray(a["samp_active"]),
            engine.sstate, engine.arrs, engine.rope_cos, engine.rope_sin)
        engine.kv, engine.sstate = out[6], out[7]

    def op_shift(a, s):
        engine.kv = shift_kv(engine.kv, jnp.int32(s["slot"]),
                             jnp.int32(s["keep"]), jnp.int32(s["discard"]),
                             engine.delta_cos, engine.delta_sin,
                             engine.cfg.rope_mode,
                             layer_select=getattr(engine, "delta_select",
                                                  None))

    def op_reset_slot(a, s):
        engine.sstate = reset_slot(engine.sstate, jnp.int32(s["slot"]),
                                   jnp.uint32(s["seed"]))

    def op_push_tokens(a, s):
        engine.sstate = push_tokens(engine.sstate, jnp.int32(s["slot"]),
                                    jnp.asarray(a["tokens"]),
                                    jnp.int32(s["n"]), jnp.int32(s["last_n"]))

    def op_sample_one(a, s):
        from ..sampling import make_sampler_arrays
        _, _, _, _, engine.sstate = sample_one(
            jnp.asarray(a["logits"]), jnp.int32(s["slot"]), engine.sstate,
            engine.arrs)

    def op_set_arrs(a, s):
        from ..sampling import SamplerArrays
        engine.arrs = SamplerArrays(**{k: jnp.asarray(v)
                                       for k, v in a.items()})

    return {
        "prefill": op_prefill,
        "prefill_embed": op_prefill_embed,
        "decode": op_decode,
        "shift": op_shift,
        "reset_slot": op_reset_slot,
        "push_tokens": op_push_tokens,
        "sample_one": op_sample_one,
        "set_arrs": op_set_arrs,
    }
