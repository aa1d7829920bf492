"""Device mesh + sharding policy (TPU-native replacement for the reference's
--tensor-split/--split-mode/RPC device model, SURVEY.md §2.3).

One mesh with axes (dp, tp):
- tp: tensor parallelism over ICI — attention heads and FFN columns are
  sharded; XLA GSPMD inserts the per-layer all-reduces (psum over tp) that
  ggml's --split-mode row does by hand with NCCL/RPC.
- dp: slot parallelism — KV-cache slots (continuous-batching sequences) are
  sharded so each dp group decodes its own slice of the batch.

Multi-host: the same mesh spans hosts via jax.distributed; ICI carries tp,
DCN carries dp (the reference's multi-host RPC placement becomes "more hosts
join the mesh", SURVEY.md §2.3 TPU-native equivalents).

Weight layout reminder (models/loader.py): 2D weights are (in, out);
stacked per-layer weights are [L, in, out].
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    tp: int = 1


def parse_mesh_spec(spec: str | None, n_devices: int | None = None
                    ) -> MeshConfig:
    """Parse 'tp=4' / 'dp=2,tp=4'; default: all devices on tp."""
    n = n_devices if n_devices is not None else len(jax.devices())
    if not spec:
        return MeshConfig(dp=1, tp=n)
    kv = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        kv[k.strip()] = int(v)
    dp = kv.get("dp", 1)
    tp = kv.get("tp", max(1, n // dp))
    if dp * tp > n:
        raise ValueError(f"mesh {spec} needs {dp * tp} devices, have {n}")
    return MeshConfig(dp=dp, tp=tp)


def make_mesh(mc: MeshConfig, devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    grid = np.asarray(devices[:mc.dp * mc.tp]).reshape(mc.dp, mc.tp)
    return Mesh(grid, axis_names=("dp", "tp"))


# -- sharding policy ---------------------------------------------------------

# stacked layer weights [L, in, out]
_LAYER_SPECS = {
    "wq": P(None, None, "tp"),       # column-parallel (heads)
    "wk": P(None, None, "tp"),
    "wv": P(None, None, "tp"),
    "wo": P(None, "tp", None),       # row-parallel (psum after)
    "w_gate": P(None, None, "tp"),
    "w_up": P(None, None, "tp"),
    "w_down": P(None, "tp", None),
    "attn_norm": P(None, None),
    "ffn_norm": P(None, None),
    # attention biases follow their column-parallel projections
    "bq": P(None, "tp"),
    "bk": P(None, "tp"),
    "bv": P(None, "tp"),
    # per-head / sandwich norms: tiny, replicate
    "q_norm": P(),
    "k_norm": P(),
    "attn_post_norm": P(),
    "ffn_post_norm": P(),
    # deepseek2 MLA: skinny low-rank A projections replicated; the fat B
    # projections column-parallel over heads
    "wq_a": P(),
    "q_a_norm": P(),
    "wq_b": P(None, None, "tp"),
    "wkv_a": P(),
    "kv_a_norm": P(),
    "wkv_b": P(None, None, "tp"),
    # MoE [L, X, E, FF] expert stacks: shard the FF axis over tp (tensor
    # parallel WITHIN every expert — the router stays replicated so no
    # token redistribution collective is needed); down is row-parallel
    "w_gate_inp": P(),
    "w_gate_exps": P(None, None, None, "tp"),
    "w_up_exps": P(None, None, None, "tp"),
    "w_down_exps": P(None, None, "tp", None),
    "w_gate_shexp": P(None, None, "tp"),
    "w_up_shexp": P(None, None, "tp"),
    "w_down_shexp": P(None, "tp", None),
    "w_gate_inp_shexp": P(),
}

_TOP_SPECS = {
    "tok_embd": P(None, None),       # replicated (gather-heavy)
    "output": P(None, "tp"),         # vocab-parallel logits
    "output_norm": P(None),
}


def param_pspec(name: str, shape: tuple | None = None) -> P:
    """PartitionSpec for a parameter by its tree path name.

    QTensor leaves address as '<param>.qs' / '.scales' / '.mins':
    qs keeps the dense weight's spec (same [.., in, out] layout; packed4's
    halved byte-row dim still shards along the same axis). Grouped scales/
    mins are [.., in/group, out] — also the dense spec. w8a8 per-column
    scales are [.., out] (one dim short): the `in` axis is dropped from
    the spec so the column shard survives."""
    leaf = None
    for s in (".qs", ".scales", ".mins"):
        if name.endswith(s):
            leaf, name = s[1:], name[: -len(s)]
            break
    if name.startswith("layers."):
        spec = _LAYER_SPECS.get(name.split(".", 1)[1], P())
    else:
        spec = _TOP_SPECS.get(name, P())
    if (leaf in ("scales", "mins") and shape is not None and len(spec)
            and len(shape) == len(spec) - 1):
        spec = P(*(list(spec[:-2]) + [spec[-1]]))
    return spec


def fit_spec(mesh: Mesh, spec: P, shape: tuple) -> NamedSharding:
    """Drop sharded axes whose dimension doesn't divide the mesh axis (e.g.
    odd vocab sizes, fewer KV heads than tp) — replicate those instead."""
    spec = list(spec)
    spec += [None] * (len(shape) - len(spec))
    fixed = []
    for dim, ax in zip(shape, spec):
        if ax is not None and dim % mesh.shape[ax] != 0:
            ax = None
        fixed.append(ax)
    return NamedSharding(mesh, P(*fixed))


def make_shard_fn(mesh: Mesh):
    """shard_fn(name, shape) for models/loader.py (QTensor leaves address
    as '<param>.qs'/'.scales'/'.mins')."""
    def fn(name: str, shape: tuple) -> NamedSharding:
        return fit_spec(mesh, param_pspec(name, shape), shape)
    fn.mesh = mesh
    return fn


def _put_named(mesh: Mesh, name: str, x):
    """device_put one value (array or QTensor) under the policy."""
    from ..ops.qmatmul import QTensor

    def leaf(n, v):
        return jax.device_put(v, fit_spec(mesh, param_pspec(n, v.shape),
                                          v.shape))

    if isinstance(x, QTensor):
        return QTensor(
            qs=leaf(f"{name}.qs", x.qs),
            scales=leaf(f"{name}.scales", x.scales),
            mins=(leaf(f"{name}.mins", x.mins)
                  if x.mins is not None else None),
            in_dim=x.in_dim, group=x.group, packed4=x.packed4,
            w8a8=x.w8a8, sharded=True)
    return leaf(name, x)


def shard_params(mesh: Mesh, params: dict) -> dict:
    """device_put the param tree (dense arrays AND QTensors, incl.
    heterogeneous layer_groups) with the tensor-parallel policy."""
    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = {kk: _put_named(mesh, f"layers.{kk}", vv)
                      for kk, vv in v.items()}
        elif k == "layer_groups":
            out[k] = [{kk: _put_named(mesh, f"layers.{kk}", vv)
                       for kk, vv in grp.items()} for grp in v]
        else:
            out[k] = _put_named(mesh, k, v)
    return out


def kv_pspec() -> P:
    # [L, slots, C, Hkv, D]: slots over dp, kv heads over tp
    return P(None, "dp", None, "tp", None)


def shard_kv(mesh: Mesh, kv):
    sh = fit_spec(mesh, kv_pspec(), kv.k.shape)
    scale_sh = fit_spec(mesh, P(None, "dp", None, "tp"),
                        kv.k_scale.shape) if kv.k_scale is not None else None
    return type(kv)(
        k=jax.device_put(kv.k, sh), v=jax.device_put(kv.v, sh),
        k_scale=(jax.device_put(kv.k_scale, scale_sh)
                 if kv.k_scale is not None else None),
        v_scale=(jax.device_put(kv.v_scale, scale_sh)
                 if kv.v_scale is not None else None),
    )


def shard_sampler_state(mesh: Mesh, state):
    """Sampler state is small: shard rows over dp, replicate over tp."""
    def put(x, spec):
        return jax.device_put(x, fit_spec(mesh, spec, x.shape))

    return type(state)(
        counts=put(state.counts, P("dp", None)),
        ring=put(state.ring, P("dp", None)),
        ring_len=put(state.ring_len, P("dp")),
        step=put(state.step, P("dp")),
        keys=put(state.keys, P("dp")),
    )
