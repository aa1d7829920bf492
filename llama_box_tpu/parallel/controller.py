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

Liveness (reference equivalent: rpcserver.hpp:240-318 retry/diagnose and
the :797-814 handshake): workers PUSH acks back on a second socket —
"hello" on join, one ack per executed plan, "err" on failure. Host 0
waits for every worker's hello AND a ping-ack (proving its SUB pipe is
actually receiving — zmq slow-joiner) before serving, and each reconcile
pass checks ack progress so a dead worker fails tasks instead of hanging
the collective.

Replaces: ggml-RPC's GRAPH_COMPUTE/SET_TENSOR protocol (rpcserver.hpp) —
there is no tensor wire traffic at all; weights load from a local GGUF
copy per host (the RPC tensor cache's job, SURVEY.md §5) and activations
ride ICI inside XLA.
"""

from __future__ import annotations

import io
import threading
import time
from typing import Callable

import numpy as np

from ..utils.logging import SRV_ERR, SRV_INF, SRV_WRN

OP_STOP = "__stop__"
OP_PING = "__ping__"


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


def ack_addr(plan_addr: str) -> str:
    """Ack channel address = plan address with port+1 (tcp://host:18182 ->
    tcp://host:18183); ipc:// addresses get an \"-ack\" suffix."""
    if plan_addr.startswith("ipc://"):
        return plan_addr + "-ack"
    host, _, port = plan_addr.rpartition(":")
    return f"{host}:{int(port) + 1}"


class WorkerDied(RuntimeError):
    pass


class ControlPlane:
    """Host-0 side: PUB socket broadcasting step plans + PULL socket
    collecting worker hellos/acks/errors."""

    def __init__(self, bind: str = "tcp://*:18182", n_workers: int = 0,
                 ack_timeout: float = 60.0):
        import zmq
        self._ctx = zmq.Context.instance()
        self._pub = self._ctx.socket(zmq.PUB)
        self._pub.bind(bind)
        self._seq = 0
        self._lock = threading.Lock()
        self.n_workers = n_workers
        self.ack_timeout = ack_timeout
        # worker id -> {"seq": last acked, "seen": monotonic, "err": str}
        self._workers: dict[int, dict] = {}
        self._werr: str | None = None
        self._stop_listener = threading.Event()
        self._pull = self._ctx.socket(zmq.PULL)
        self._pull.bind(ack_addr(bind))
        self._pull.setsockopt(zmq.RCVTIMEO, 200)
        self._listener = threading.Thread(target=self._listen, daemon=True,
                                          name="control-acks")
        self._listener.start()
        SRV_INF("control", "control plane PUB on %s, acks on %s", bind,
                ack_addr(bind))

    def _listen(self) -> None:
        import msgpack
        import zmq
        while not self._stop_listener.is_set():
            try:
                msg = msgpack.unpackb(self._pull.recv())
            except zmq.Again:
                continue
            except zmq.ZMQError:
                return
            wid = int(msg.get("worker", -1))
            st = self._workers.setdefault(wid, {"seq": 0, "seen": 0.0,
                                                "err": None})
            st["seen"] = time.monotonic()
            kind = msg.get("type")
            if kind == "ack":
                st["seq"] = max(st["seq"], int(msg.get("seq", 0)))
            elif kind == "err":
                st["err"] = str(msg.get("msg", "unknown worker error"))
                self._werr = f"worker {wid}: {st['err']}"
                SRV_ERR("control", "worker %d reported: %s", wid, st["err"])

    def broadcast(self, op: str, arrays: dict | None = None,
                  scalars: dict | None = None) -> int:
        with self._lock:
            self._seq += 1
            self._pub.send(_pack(op, self._seq, arrays or {}, scalars or {}))
            return self._seq

    def wait_ready(self, timeout: float = 120.0) -> None:
        """Block until all n_workers have joined AND acked a ping — a hello
        alone proves the PUSH pipe, not that the SUB pipe is receiving
        (zmq slow-joiner drops plans sent before SUB connects)."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            self.broadcast(OP_PING)
            time.sleep(0.1)
            # any ack at all proves the worker's SUB pipe is receiving
            live = [w for w, st in self._workers.items()
                    if st["seq"] >= 1 and st["err"] is None]
            if len(live) >= self.n_workers:
                SRV_INF("control", "%d worker(s) ready", len(live))
                return
        raise WorkerDied(
            f"only {len(self._workers)}/{self.n_workers} workers joined "
            f"within {timeout}s")

    def wait_acked(self, seq: int | None = None,
                   timeout: float = 60.0) -> None:
        """Block until every worker has acked plan `seq` (default: the
        latest broadcast). Raises WorkerDied on a reported error or
        timeout — used by Engine.verify_replicas and the shutdown path."""
        if seq is None:
            with self._lock:
                seq = self._seq
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if self._werr:
                raise WorkerDied(self._werr)
            done = [w for w, st in self._workers.items()
                    if st["seq"] >= seq]
            if len(done) >= self.n_workers:
                return
            time.sleep(0.02)
        raise WorkerDied(
            f"workers did not ack plan {seq} within {timeout}s "
            f"(progress: { {w: st['seq'] for w, st in self._workers.items()} })")

    def check_health(self) -> None:
        """Raise WorkerDied if a worker reported an error or stopped acking
        while plans are outstanding. Call once per reconcile pass so tasks
        fail instead of the next collective hanging forever."""
        if self._werr:
            raise WorkerDied(self._werr)
        now = time.monotonic()
        with self._lock:
            cur = self._seq
        for wid, st in self._workers.items():
            if st["seq"] < cur and now - st["seen"] > self.ack_timeout:
                raise WorkerDied(
                    f"worker {wid} stopped acking (last seq {st['seq']}/"
                    f"{cur}, silent {now - st['seen']:.0f}s)")

    def stop(self) -> None:
        self.broadcast(OP_STOP)
        self._stop_listener.set()
        self._listener.join(timeout=2)
        self._pub.close(0)
        self._pull.close(0)


class WorkerLoop:
    """Worker side: executes the op stream against an op registry and acks
    every executed plan back to host 0."""

    def __init__(self, connect: str, ops: dict[str, Callable],
                 worker_id: int = 1, ack_connect: str | None = None):
        import zmq
        self._ctx = zmq.Context.instance()
        self._sub = self._ctx.socket(zmq.SUB)
        self._sub.connect(connect)
        self._sub.setsockopt(zmq.SUBSCRIBE, b"")
        self._push = self._ctx.socket(zmq.PUSH)
        self._push.connect(ack_connect or ack_addr(connect))
        self.ops = ops
        self.worker_id = worker_id
        self._last_seq = 0

    def _send(self, kind: str, **kw) -> None:
        import msgpack
        self._push.send(msgpack.packb({"type": kind,
                                       "worker": self.worker_id, **kw}))

    def run_forever(self) -> None:
        SRV_INF("control", "worker %d loop started", self.worker_id)
        self._send("hello")
        while True:
            op, seq, arrays, scalars = _unpack(self._sub.recv())
            if op == OP_STOP:
                SRV_INF("control", "worker loop stopping")
                self._send("ack", seq=seq)
                return
            if seq <= self._last_seq:
                continue  # replay guard
            if op == OP_PING:
                # handshake/liveness probe: joins are allowed to start
                # mid-stream here (first real plan resyncs _last_seq)
                self._last_seq = seq
                self._send("ack", seq=seq)
                continue
            if seq != self._last_seq + 1 and self._last_seq:
                msg = (f"missed plans {self._last_seq + 1}..{seq - 1} — "
                       "desync")
                SRV_ERR("control", "%s, aborting", msg)
                self._send("err", msg=msg)
                raise RuntimeError("control-plane desync")
            self._last_seq = seq
            fn = self.ops.get(op)
            if fn is None:
                self._send("err", msg=f"unknown control op {op!r}")
                raise RuntimeError(f"unknown control op {op!r}")
            try:
                fn(arrays, scalars)
            except Exception as exc:  # noqa: BLE001 — report then die
                self._send("err", msg=f"op {op!r} failed: {exc!r}")
                raise
            self._send("ack", seq=seq)


def state_digest(engine) -> str:
    """Deterministic digest of an engine replica's device state (KV cache +
    sampler state). Replicas executing the same op stream on the same
    backend must agree bitwise; host 0 broadcasts its digest periodically
    (Engine.verify_replicas) and any worker that diverged reports err —
    the TPU-native analogue of the reference RPC server's graph-hash
    consistency checks (rpcserver.hpp:1339-1393)."""
    import hashlib

    import jax

    h = hashlib.sha256()
    for path, digest in state_leaf_digests(engine).items():
        h.update(path.encode())
        h.update(digest.encode())
    return h.hexdigest()


def state_leaf_digests(engine) -> dict:
    """Per-leaf digests (tree path -> sha256) — lets a diverged worker
    name WHICH piece of state differs."""
    import hashlib

    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            (engine.kv, engine.sstate))[0]:
        a = np.asarray(leaf)
        h = hashlib.sha256()
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
        out[jax.tree_util.keystr(path)] = h.hexdigest()
    return out


def engine_ops(engine) -> dict[str, Callable]:
    """Op registry mapping step plans onto an Engine replica's device calls.
    Each op mirrors one host-0 call site; the worker passes the same numpy
    inputs so the global jitted program executes collectively."""
    import jax.numpy as jnp

    from ..models.llama import (copy_kv_prefix, prefill, prefill_batch,
                                prefill_embed, shift_kv)
    from ..sampling import push_tokens, reset_slot, sample_one

    rec = bool(getattr(engine, "rec", False))
    encdec = bool(getattr(engine, "encdec", False))
    if rec:
        from ..models import mamba as _mamba
    if encdec:
        from ..models import t5_serve as _t5

    def op_prefill(a, s):
        if encdec:
            logits, engine.kv = _t5.t5_prefill(
                engine.params, engine.cfg, jnp.asarray(a["tokens"]),
                engine.kv, jnp.int32(s["slot"]), jnp.int32(0),
                jnp.int32(min(int(s["n"]), a["tokens"].shape[0])))
            return
        if rec:
            logits, engine.kv = _mamba.rec_prefill(
                engine.params, engine.cfg, jnp.asarray(a["tokens"]),
                engine.kv, jnp.int32(s["slot"]), jnp.int32(s["pos"]),
                jnp.int32(s["n"]))
            return
        logits, engine.kv = prefill(
            engine.params, engine.cfg, jnp.asarray(a["tokens"]), engine.kv,
            jnp.int32(s["slot"]), jnp.int32(s["pos"]), jnp.int32(s["n"]),
            engine.rope_cos, engine.rope_sin,
            attn_len=int(s.get("attn_len", 0)))

    def op_prefill_batch(a, s):
        logits, engine.kv = prefill_batch(
            engine.params, engine.cfg, jnp.asarray(a["tokens"]),
            jnp.asarray(a["pos_base"]), jnp.asarray(a["n_valid"]),
            engine.kv, engine.rope_cos, engine.rope_sin,
            attn_len=int(s.get("attn_len", 0)),
            contig_write=bool(s.get("contig", False)))

    def op_prefill_embed(a, s):
        bidir = None
        if s.get("bidir0") is not None:
            bidir = (jnp.int32(s["bidir0"]), jnp.int32(s["bidir1"]))
        logits, engine.kv = prefill_embed(
            engine.params, engine.cfg, jnp.asarray(a["embeds"]), engine.kv,
            jnp.int32(s["slot"]), jnp.int32(s["pos"]), jnp.int32(s["n"]),
            engine.rope_cos, engine.rope_sin, None, bidir_span=bidir,
            attn_len=int(s.get("attn_len", 0)))

    def op_decode(a, s):
        if encdec:
            fn = _t5.t5_decode_verify_sample
        elif rec:
            fn = _mamba.rec_decode_verify_sample
        else:
            from ..server.engine import _decode_verify_sample
            fn = _decode_verify_sample
        out = fn(
            engine.params, engine.cfg, jnp.asarray(a["tokens"]),
            jnp.asarray(a["positions"]), jnp.asarray(a["n_draft"]),
            engine.kv, jnp.asarray(a["active"]), jnp.asarray(a["samp_active"]),
            engine.sstate, engine.arrs, engine.rope_cos, engine.rope_sin)
        engine.kv, engine.sstate = out[6], out[7]

    def op_decode_chain(a, s):
        if encdec:
            fn = _t5.t5_decode_chain
        elif rec:
            fn = _mamba.rec_decode_chain
        else:
            from ..server.engine import _decode_chain
            fn = _decode_chain
        md = a.get("mrope_delta")
        kw = {}
        if fn.__name__.endswith("_decode_chain") and not (rec or encdec):
            # replay the host's static fast-path flags exactly: samp_kcap
            # changes the seeded gumbel stream, so digest identity
            # requires the same candidate-set size on every worker
            kw = {"samp_extras": bool(s.get("samp_extras", True)),
                  "samp_kcap": int(s.get("samp_kcap", 0))}
        out = fn(
            engine.params, engine.cfg, jnp.asarray(a["token0"]),
            jnp.asarray(a["pos0"]), engine.kv, engine.sstate, engine.arrs,
            jnp.asarray(a["active"]), engine.rope_cos, engine.rope_sin,
            n_steps=int(s["k"]), attn_len=int(s.get("attn_len", 0)),
            mrope_delta=jnp.asarray(md) if md is not None else None, **kw)
        engine.kv, engine.sstate = out[4], out[5]

    def op_shift(a, s):
        engine.kv = shift_kv(engine.kv, jnp.int32(s["slot"]),
                             jnp.int32(s["keep"]), jnp.int32(s["discard"]),
                             engine.delta_cos, engine.delta_sin,
                             engine.cfg.rope_mode,
                             layer_select=getattr(engine, "delta_select",
                                                  None))

    def op_copy_kv_prefix(a, s):
        engine.kv = copy_kv_prefix(engine.kv, jnp.int32(s["src"]),
                                   jnp.int32(s["dst"]), jnp.int32(s["n"]))

    def op_copy_rec_state(a, s):
        engine.kv = _mamba.copy_rec_state(engine.kv, jnp.int32(s["src"]),
                                          jnp.int32(s["dst"]))

    def op_reset_rec_slot(a, s):
        engine.kv = _mamba.reset_rec_slot(engine.kv, jnp.int32(s["slot"]))

    def op_reset_slot(a, s):
        engine.sstate = reset_slot(engine.sstate, jnp.int32(s["slot"]),
                                   jnp.uint32(s["seed"]))

    def op_push_tokens(a, s):
        engine.sstate = push_tokens(engine.sstate, jnp.int32(s["slot"]),
                                    jnp.asarray(a["tokens"]),
                                    jnp.int32(s["n"]), jnp.int32(s["last_n"]))

    def op_sample_one(a, s):
        _, _, _, _, engine.sstate = sample_one(
            jnp.asarray(a["logits"]), jnp.int32(s["slot"]), engine.sstate,
            engine.arrs)

    def op_check_digest(a, s):
        mine = state_digest(engine)
        if mine != s["digest"]:
            bad = "?"
            theirs = s.get("leaves")
            if theirs:
                ours = state_leaf_digests(engine)
                bad = ", ".join(p for p, d in theirs.items()
                                if ours.get(p) != d) or "leaf set differs"
            raise RuntimeError(
                f"replica state diverged: host-0 digest {s['digest'][:12]}…"
                f" != local {mine[:12]}… (leaves: {bad})")

    def op_set_arrs(a, s):
        from ..sampling import SamplerArrays
        engine.arrs = SamplerArrays(**{k: jnp.asarray(v)
                                       for k, v in a.items()})

    return {
        "decode_chain": op_decode_chain,
        "prefill": op_prefill,
        "prefill_batch": op_prefill_batch,
        "prefill_embed": op_prefill_embed,
        "decode": op_decode,
        "shift": op_shift,
        "copy_kv_prefix": op_copy_kv_prefix,
        "copy_rec_state": op_copy_rec_state,
        "reset_rec_slot": op_reset_rec_slot,
        "reset_slot": op_reset_slot,
        "push_tokens": op_push_tokens,
        "sample_one": op_sample_one,
        "set_arrs": op_set_arrs,
        "check_digest": op_check_digest,
    }
