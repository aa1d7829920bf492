"""LoRA adapter loading + merge (reference LoRA runtime, SURVEY.md §2.1 #22).

GGUF adapter files (general.type == "adapter", adapter.type == "lora") carry
per-tensor low-rank pairs `<base>.lora_a` (r x in) and `<base>.lora_b`
(out x r); the effective weight is W + scale * (B @ A) with
scale = adapter.lora.alpha / r * user_scale.

TPU-native choice: adapters are MERGED into the dense weights at load
(static adapters from the CLI). The reference's per-request scale override
partitions batches by LoRA set; that is deferred — per-request `lora`
fields referencing non-default scales are rejected with 400.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF, SRV_WRN


@dataclasses.dataclass
class LoraAdapter:
    name: str
    path: str
    alpha: float
    scale: float                     # user scale (CLI --lora-scaled)
    pairs: dict                      # base tensor name -> (A [r,in], B [out,r])

    @property
    def rank(self) -> int:
        for a, _ in self.pairs.values():
            return a.shape[0]
        return 0


def load_lora(path: str, scale: float = 1.0) -> LoraAdapter:
    g = GGUFFile(path)
    gtype = str(g.metadata.get("general.type", ""))
    atype = str(g.metadata.get("adapter.type", ""))
    if gtype not in ("adapter", "") or (atype and atype != "lora"):
        g.close()
        raise ValueError(f"{path} is not a LoRA adapter GGUF "
                         f"(type={gtype}/{atype})")
    alpha = float(g.metadata.get("adapter.lora.alpha", 16.0))
    name = str(g.metadata.get("general.name", path.rsplit("/", 1)[-1]))
    pairs: dict = {}
    for tname in g.tensors:
        if tname.endswith(".lora_a"):
            base = tname[: -len(".lora_a")]
            b_name = base + ".lora_b"
            if b_name not in g.tensors:
                SRV_WRN("lora", "missing %s; skipping %s", b_name, base)
                continue
            pairs[base] = (g.tensor_f32(tname), g.tensor_f32(b_name))
    g.close()
    if not pairs:
        raise ValueError(f"{path} contains no lora_a/lora_b tensor pairs")
    SRV_INF("lora", "loaded %s: %d tensor pairs, alpha=%.1f scale=%.2f",
            name, len(pairs), alpha, scale)
    return LoraAdapter(name=name, path=path, alpha=alpha, scale=scale,
                       pairs=pairs)


def stack_dynamic(params: dict, cfg, adapters: list[LoraAdapter]) -> int:
    """Register adapters UNMERGED for per-request scaling: per-layer low-rank
    stacks params["layers"]["lora_A_<key>"] [L, n_ad, r_max, in] and
    ["lora_B_<key>"] [L, n_ad, out, r_max]. The forward applies
    y += sum_a slot_scale[a] * (x @ A_a.T) @ B_a.T — every slot can run a
    different adapter mix inside ONE batch (the reference instead partitions
    batches by LoRA set, httpserver.hpp:3682-3723). Returns n_adapters."""
    import jax.numpy as jnp

    layers = params["layers"]
    n_layers = cfg.n_layers
    r_max = max((a.rank for a in adapters), default=0)
    if r_max == 0:
        return 0
    by_key: dict = {}
    for ai, ad in enumerate(adapters):
        eff = ad.alpha / max(ad.rank, 1)
        for base, (A, B) in ad.pairs.items():
            if not base.startswith("blk."):
                continue
            _, idx, rest = base.split(".", 2)
            key = _TARGETS.get(rest)
            if key is None or key not in layers:
                continue
            by_key.setdefault(key, {})[(ai, int(idx))] = (A * eff, B)
    n_ad = len(adapters)
    from ..ops.qmatmul import QTensor
    for key, entries in by_key.items():
        W = layers[key]
        if isinstance(W, QTensor):
            in_dim, out_dim = W.in_dim, W.out_dim  # works on quantized base
        else:
            in_dim, out_dim = W.shape[1], W.shape[2]
        A_stack = np.zeros((n_layers, n_ad, r_max, in_dim), np.float32)
        B_stack = np.zeros((n_layers, n_ad, out_dim, r_max), np.float32)
        for (ai, li), (A, B) in entries.items():
            r = A.shape[0]
            A_stack[li, ai, :r, :] = A
            B_stack[li, ai, :, :r] = B
        layers[f"lora_A_{key}"] = jnp.asarray(A_stack)
        layers[f"lora_B_{key}"] = jnp.asarray(B_stack)
    return n_ad


# base tensor name -> (param tree location, transposed?)
_TARGETS = {
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up",
    "ffn_down.weight": "w_down",
}


def apply_lora(params: dict, cfg, adapters: list[LoraAdapter]) -> dict:
    """Merge adapters into the (dense) stacked layer weights in place.
    Quantized-resident weights cannot be merged; those tensors are skipped
    with a warning (load dense to use LoRA)."""
    import jax.numpy as jnp

    from ..ops.qmatmul import QTensor

    layers = params["layers"]
    merged = 0
    for ad in adapters:
        eff = ad.scale * (ad.alpha / max(ad.rank, 1))
        for base, (A, B) in ad.pairs.items():
            if not base.startswith("blk."):
                if base in ("output.weight",) and "output" in params:
                    delta = (B @ A).T * eff       # [in, out]
                    if isinstance(params["output"], QTensor):
                        SRV_WRN("lora", "cannot merge %s into quantized "
                                "weights; skipped", base)
                        continue
                    params["output"] = params["output"] + jnp.asarray(
                        delta, params["output"].dtype)
                    merged += 1
                continue
            _, idx, rest = base.split(".", 2)
            key = _TARGETS.get(rest)
            if key is None or key not in layers:
                SRV_WRN("lora", "no target for %s; skipped", base)
                continue
            W = layers[key]
            if isinstance(W, QTensor):
                SRV_WRN("lora", "cannot merge %s into quantized weights; "
                        "load with dense weights to use LoRA", base)
                continue
            i = int(idx)
            delta = (B @ A).T * eff               # [in, out]
            layers[key] = W.at[i].add(jnp.asarray(delta, W.dtype))
            merged += 1
    SRV_INF("lora", "merged %d tensor deltas from %d adapter(s)", merged,
            len(adapters))
    return params
