"""GGUF → JAX parameter loading.

GGUF 2D tensors arrive as numpy (out_features, in_features) row-major (the
reader reverses ggml dim order); JAX matmuls want (in, out), so weights are
transposed here once at load. Layer weights are stacked along a leading L
axis for lax.scan.

Two weight formats:
- dense (default): dequantize to bf16/f32 in HBM.
- quantized=True: keep supported block-quant formats packed in HBM as
  QTensor (int4/int8 + group scales) and fuse dequant into the matmul
  (ops/qmatmul.py) — the TPU equivalent of ggml executing quantized weights
  directly. Unsupported formats and 1D tensors fall back to dense.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..gguf.repack import REPACKERS, repack
from ..ops.qmatmul import QTensor, pack_repacked
from ..utils.logging import SRV_INF, SRV_WRN
from .config import ModelConfig

_LAYER_WEIGHTS = {
    "wq": ("blk.{i}.attn_q.weight", True),
    "wk": ("blk.{i}.attn_k.weight", True),
    "wv": ("blk.{i}.attn_v.weight", True),
    "wo": ("blk.{i}.attn_output.weight", True),
    "w_gate": ("blk.{i}.ffn_gate.weight", True),
    "w_up": ("blk.{i}.ffn_up.weight", True),
    "w_down": ("blk.{i}.ffn_down.weight", True),
    # mamba mixer projections (models/mamba.py); quantized residency OK
    "ssm_in": ("blk.{i}.ssm_in.weight", True),
    "shortconv_in": ("blk.{i}.shortconv.in_proj.weight", True),
    "shortconv_out": ("blk.{i}.shortconv.out_proj.weight", True),
    # qwen3-next gated DeltaNet: fused q|k|v|z projection rides ssm_in;
    # beta|alpha gates and the per-head attention output gate are new
    "ssm_ba": ("blk.{i}.ssm_beta_alpha.weight", True),
    "wq_gate": ("blk.{i}.attn_gate.weight", True),
    "ssm_x": ("blk.{i}.ssm_x.weight", True),
    "ssm_dt": ("blk.{i}.ssm_dt.weight", True),
    "ssm_out": ("blk.{i}.ssm_out.weight", True),
    # rwkv6/7 time-mix and channel-mix projections (models/rwkv.py;
    # llama.cpp LLM_ARCH_RWKV6/RWKV7 tensor names)
    "tm_k": ("blk.{i}.time_mix_key.weight", True),
    "tm_v": ("blk.{i}.time_mix_value.weight", True),
    "tm_r": ("blk.{i}.time_mix_receptance.weight", True),
    "tm_g": ("blk.{i}.time_mix_gate.weight", True),
    "tm_o": ("blk.{i}.time_mix_output.weight", True),
    "cm_k": ("blk.{i}.channel_mix_key.weight", True),
    "cm_r": ("blk.{i}.channel_mix_receptance.weight", True),
    "cm_v": ("blk.{i}.channel_mix_value.weight", True),
}

# optional per-layer tensors (qwen2 attention biases etc.)
_LAYER_OPTIONAL = {
    # norms are optional: olmo2 blocks are post-norm-only, falcon/gptneox
    # norms carry biases, falcon-40b has a second input norm for the
    # parallel FFN branch
    "attn_norm": ("blk.{i}.attn_norm.weight", False),
    "attn_norm_b": ("blk.{i}.attn_norm.bias", False),
    "attn_norm_2": ("blk.{i}.attn_norm_2.weight", False),
    "attn_norm_2_b": ("blk.{i}.attn_norm_2.bias", False),
    "ffn_norm": ("blk.{i}.ffn_norm.weight", False),
    "ffn_norm_b": ("blk.{i}.ffn_norm.bias", False),
    # dbrx stores its pre-MoE norm (HF norm_attn_norm.norm_2) as
    # attn_output_norm (llama.cpp LLM_TENSOR_ATTN_OUT_NORM) — aliased to
    # ffn_norm after load when no ffn_norm exists; grok uses the same
    # tensor as a SANDWICH norm (post-attention, pre-residual) alongside
    # ffn_norm, aliased to attn_post_norm instead
    "attn_out_norm": ("blk.{i}.attn_output_norm.weight", False),
    "attn_out_norm_b": ("blk.{i}.attn_output_norm.bias", False),
    # grok post-MoE sandwich norm (llama.cpp LLM_TENSOR_LAYER_OUT_NORM)
    "layer_out_norm": ("blk.{i}.layer_output_norm.weight", False),
    "attn_post_norm_b": ("blk.{i}.post_attention_norm.bias", False),
    "ffn_post_norm_b": ("blk.{i}.post_ffw_norm.bias", False),
    "bo": ("blk.{i}.attn_output.bias", False),
    "b_gate": ("blk.{i}.ffn_gate.bias", False),   # jais SwiGLU biases
    "b_up": ("blk.{i}.ffn_up.bias", False),
    "b_down": ("blk.{i}.ffn_down.bias", False),
    "bq": ("blk.{i}.attn_q.bias", False),
    "bk": ("blk.{i}.attn_k.bias", False),
    "bv": ("blk.{i}.attn_v.bias", False),
    "q_norm": ("blk.{i}.attn_q_norm.weight", False),
    "k_norm": ("blk.{i}.attn_k_norm.weight", False),
    # bitnet b1.58: sub-norms before the attn/ffn output projections
    "attn_sub_norm": ("blk.{i}.attn_sub_norm.weight", False),
    "ffn_sub_norm": ("blk.{i}.ffn_sub_norm.weight", False),
    # chameleon: per-head BIASED LayerNorm on q/k
    "q_norm_b": ("blk.{i}.attn_q_norm.bias", False),
    "k_norm_b": ("blk.{i}.attn_k_norm.bias", False),
    # gemma2/3 sandwich norms
    "attn_post_norm": ("blk.{i}.post_attention_norm.weight", False),
    "ffn_post_norm": ("blk.{i}.post_ffw_norm.weight", False),
    # deepseek2 multi-head latent attention (MLA)
    "wq_a": ("blk.{i}.attn_q_a.weight", True),
    "q_a_norm": ("blk.{i}.attn_q_a_norm.weight", False),
    "wq_b": ("blk.{i}.attn_q_b.weight", True),
    "wkv_a": ("blk.{i}.attn_kv_a_mqa.weight", True),
    "kv_a_norm": ("blk.{i}.attn_kv_a_norm.weight", False),
    "wkv_b": ("blk.{i}.attn_kv_b.weight", True),
    # mixture-of-experts (mixtral/qwen2moe/qwen3moe); 3D expert stacks are
    # stored (n_expert, FF, E) by the reader -> transposed to (X, E, FF)
    "w_gate_inp": ("blk.{i}.ffn_gate_inp.weight", True),
    "w_gate_exps": ("blk.{i}.ffn_gate_exps.weight", "3d"),
    "w_up_exps": ("blk.{i}.ffn_up_exps.weight", "3d"),
    "w_down_exps": ("blk.{i}.ffn_down_exps.weight", "3d"),
    # shared expert (qwen2moe/deepseek2)
    # gpt-oss: per-head attention-sink logits + router/expert biases
    # (llama.cpp LLM_ARCH_OPENAI_MOE tensor names; sinks feed the softmax
    # denominator, see _attn_layer)
    "sinks": ("blk.{i}.attn_sinks.weight", False),
    # deepseek3: expert-score correction bias (selection only, not weights)
    "exp_probs_b": ("blk.{i}.exp_probs_b.bias", False),
    # arctic (snowflake): the MoE branch's own pre-norm — the dense FFN
    # and the MoE run in parallel off the attention residual, each with
    # its own norm (llama.cpp LLM_TENSOR_FFN_NORM_EXPS)
    "ffn_norm_exps": ("blk.{i}.ffn_norm_exps.weight", False),
    "b_gate_inp": ("blk.{i}.ffn_gate_inp.bias", False),
    "b_gate_exps": ("blk.{i}.ffn_gate_exps.bias", False),
    "b_up_exps": ("blk.{i}.ffn_up_exps.bias", False),
    "b_down_exps": ("blk.{i}.ffn_down_exps.bias", False),
    # jetmoe mixture-of-attention: q/output projections as experts over
    # a shared kv projection; the router weight is stored [X, E]
    "wq_exps": ("blk.{i}.attn_q_exps.weight", "3d"),
    "wo_exps": ("blk.{i}.attn_output_exps.weight", "3d"),
    "attn_gate_inp": ("blk.{i}.attn_gate_inp.weight", True),
    "w_gate_shexp": ("blk.{i}.ffn_gate_shexp.weight", True),
    "w_up_shexp": ("blk.{i}.ffn_up_shexp.weight", True),
    "w_down_shexp": ("blk.{i}.ffn_down_shexp.weight", True),
    "w_gate_inp_shexp": ("blk.{i}.ffn_gate_inp_shexp.weight", True),
    # mamba mixer smalls (conv kernel / biases / A / D stay dense f32)
    "ssm_conv_w": ("blk.{i}.ssm_conv1d.weight", False),
    "ssm_conv_b": ("blk.{i}.ssm_conv1d.bias", False),
    "ssm_dt_b": ("blk.{i}.ssm_dt.bias", False),
    "ssm_a": ("blk.{i}.ssm_a.weight", False),
    "ssm_d": ("blk.{i}.ssm_d.weight", False),
    "ssm_norm": ("blk.{i}.ssm_norm.weight", False),  # mamba2 gated norm
    # gemma3n: altup / laurel / per-layer-input blocks (per-layer)
    "altup_correct_coef": ("blk.{i}.altup_correct_coef.weight", True),
    "altup_predict_coef": ("blk.{i}.altup_predict_coef.weight", True),
    "altup_router": ("blk.{i}.altup_router.weight", True),
    "altup_router_norm": ("blk.{i}.altup_router_norm.weight", False),
    "altup_correct_scale": ("blk.{i}.altup_correct_scale.weight", False),
    "laurel_l": ("blk.{i}.laurel_l.weight", True),
    "laurel_r": ("blk.{i}.laurel_r.weight", True),
    "laurel_post_norm": ("blk.{i}.laurel_post_norm.weight", False),
    "ple_gate": ("blk.{i}.inp_gate.weight", True),
    "ple_proj": ("blk.{i}.proj.weight", True),
    "ple_post_norm": ("blk.{i}.post_norm.weight", False),
    # lfm2 gated short-conv mixer
    "shortconv_conv": ("blk.{i}.shortconv.conv.weight", False),
    "shortconv_conv_b": ("blk.{i}.shortconv.conv.bias", False),
    # jamba learned dt/B/C norms
    "ssm_dt_norm": ("blk.{i}.ssm_dt_norm.weight", False),
    "ssm_b_norm": ("blk.{i}.ssm_b_norm.weight", False),
    "ssm_c_norm": ("blk.{i}.ssm_c_norm.weight", False),
    # rwkv6 time-mix smalls: data-dependent lerp LoRA, decay LoRA, bonus,
    # per-head group norm. w1 is (out=5*edim, in=E) -> [E, 5*edim]; w2 is
    # 3D (5, E, edim) -> [5, edim, E] via the "3d" swap
    "tm_w1": ("blk.{i}.time_mix_w1.weight", True),
    "tm_w2": ("blk.{i}.time_mix_w2.weight", "3d"),
    "tm_lerp_x": ("blk.{i}.time_mix_lerp_x.weight", False),
    "tm_lerp_w": ("blk.{i}.time_mix_lerp_w.weight", False),
    "tm_lerp_k": ("blk.{i}.time_mix_lerp_k.weight", False),
    "tm_lerp_v": ("blk.{i}.time_mix_lerp_v.weight", False),
    "tm_lerp_r": ("blk.{i}.time_mix_lerp_r.weight", False),
    "tm_lerp_g": ("blk.{i}.time_mix_lerp_g.weight", False),
    "tm_lerp_fused": ("blk.{i}.time_mix_lerp_fused.weight", False),
    "tm_first": ("blk.{i}.time_mix_first.weight", False),
    "tm_decay": ("blk.{i}.time_mix_decay.weight", False),
    "tm_decay_w1": ("blk.{i}.time_mix_decay_w1.weight", True),
    "tm_decay_w2": ("blk.{i}.time_mix_decay_w2.weight", True),
    "tm_ln": ("blk.{i}.time_mix_ln.weight", False),
    "tm_ln_b": ("blk.{i}.time_mix_ln.bias", False),
    "cm_lerp_k": ("blk.{i}.channel_mix_lerp_k.weight", False),
    "cm_lerp_r": ("blk.{i}.channel_mix_lerp_r.weight", False),
    # rwkv7 extras: w0/a0/a1/a2/v0/v1/v2/g1/g2 LoRAs, k_k/k_a/r_k gates
    "tm_w0": ("blk.{i}.time_mix_w0.weight", False),
    "tm_a0": ("blk.{i}.time_mix_a0.weight", False),
    "tm_a1": ("blk.{i}.time_mix_a1.weight", True),
    "tm_a2": ("blk.{i}.time_mix_a2.weight", True),
    "tm_v0": ("blk.{i}.time_mix_v0.weight", False),
    "tm_v1": ("blk.{i}.time_mix_v1.weight", True),
    "tm_v2": ("blk.{i}.time_mix_v2.weight", True),
    "tm_g1": ("blk.{i}.time_mix_g1.weight", True),
    "tm_g2": ("blk.{i}.time_mix_g2.weight", True),
    "tm_lerp_a": ("blk.{i}.time_mix_lerp_a.weight", False),
    "tm_kk": ("blk.{i}.time_mix_k_k.weight", False),
    "tm_ka": ("blk.{i}.time_mix_k_a.weight", False),
    "tm_rk": ("blk.{i}.time_mix_r_k.weight", False),
}


def _to_device(x: np.ndarray, dtype, sharding=None):
    arr = jnp.asarray(x, dtype=dtype)
    if sharding is not None:
        arr = jax.device_put(arr, sharding)
    return arr


def _quantizable(info, shape) -> bool:
    if info.ggml_type not in REPACKERS or len(shape) != 2:
        return False
    out_dim, in_dim = shape
    return in_dim % 64 == 0 and out_dim % 64 == 0


def _stack_qtensors(qts: list[QTensor]) -> QTensor:
    stk = np.stack if isinstance(qts[0].qs, np.ndarray) else jnp.stack
    return QTensor(
        qs=stk([q.qs for q in qts]),
        scales=stk([q.scales for q in qts]),
        mins=(stk([q.mins for q in qts])
              if qts[0].mins is not None else None),
        in_dim=qts[0].in_dim, group=qts[0].group, packed4=qts[0].packed4,
        w8a8=qts[0].w8a8)


def parse_kv_overrides(specs: list[str]) -> dict:
    """--override-kv KEY=TYPE:VALUE (reference engine_param.hpp semantics:
    types int/float/bool/str)."""
    out = {}
    for spec in specs or []:
        key, _, rest = spec.partition("=")
        typ, _, val = rest.partition(":")
        if not key or not typ or val == "":
            raise ValueError(f"bad --override-kv {spec!r} "
                             "(KEY=TYPE:VALUE)")
        if typ == "int":
            out[key] = int(val)
        elif typ == "float":
            out[key] = float(val)
        elif typ == "bool":
            out[key] = val.lower() in ("1", "true", "yes")
        elif typ == "str":
            out[key] = val
        else:
            raise ValueError(f"bad --override-kv type {typ!r}")
    return out


def load_model(
    path: str,
    dtype=jnp.bfloat16,
    shard_fn: Callable[[str, tuple], object] | None = None,
    quantized: bool = False,
    metadata_overrides: dict | None = None,
) -> tuple[ModelConfig, dict]:
    """Load a GGUF model into a stacked-layer param tree.

    shard_fn(name, shape) -> optional jax Sharding for multi-chip placement
    (parallel/mesh.py provides the tensor-parallel policy). Quantized
    weights shard too: packing happens on the host, layers stack in numpy,
    and each QTensor leaf is device_put once with its NamedSharding —
    the TPU-native equivalent of the reference splitting quantized GGUF
    tensors across devices (--tensor-split, engine_param.hpp:286-293).
    """
    g = GGUFFile(path)
    if metadata_overrides:
        for k, v in metadata_overrides.items():
            SRV_INF("load_model", "override %s = %r", k, v)
            g.metadata[k] = v
    cfg = ModelConfig.from_gguf(g)
    SRV_INF("load_model", "arch=%s layers=%d embd=%d heads=%d/%d ff=%d "
            "vocab=%d quantized=%s", cfg.arch, cfg.n_layers, cfg.n_embd,
            cfg.n_heads, cfg.n_kv_heads, cfg.n_ff, cfg.vocab_size, quantized)
    if cfg.arch == "gemma3n":
        # the altup stack runs UNROLLED (per-layer dict indexing); keep
        # dense residency until QTensor stacks support per-layer slicing
        if quantized:
            SRV_WRN("load_model", "gemma3n: quantized residency not yet "
                    "supported; loading dense")
        quantized = False
        cfg.extra["g3n_kv_shared"] = int(
            g.metadata.get("gemma3n.attention.shared_kv_layers", 0) or 0)
        sp = g.metadata.get("gemma3n.activation_sparsity_scale")
        if sp is not None:
            cfg.extra["g3n_act_sparsity"] = tuple(float(x) for x in sp)
    varheads = cfg.arch == "openelm" and (
        "head_count_arr" in cfg.extra or "n_ff_arr" in cfg.extra)
    if varheads and quantized:
        # per-layer geometry is padded to the max AFTER load (dense numpy)
        SRV_WRN("load_model", "openelm: variable per-layer geometry — "
                "loading dense (padding precedes packing)")
        quantized = False

    def fetch(name: str, transpose) -> np.ndarray:
        # NOTE: gemma GGUFs store RMSNorm weights in EFFECTIVE form —
        # llama.cpp's converter adds the +1 (HF keeps (w_eff - 1)) and the
        # runtime multiplies directly, so no adjustment happens here.
        # (An earlier +1.0 here double-counted; caught by the gemma2
        # transformers golden, tests/test_arch_goldens.py.)
        x = g.tensor_f32(name)
        if transpose == "3d":
            if x.ndim == 3:
                return np.swapaxes(x, 1, 2)  # (X, FF, E) -> (X, E, FF)
            return x.T if x.ndim == 2 else x  # rwkv7 2D time_mix_w2
        return x.T if (transpose is True and x.ndim == 2) else x

    def fetch_maybe_q(name: str, transpose: bool):
        """Return QTensor (packed; host numpy leaves when sharding) or
        dense numpy array."""
        info = g.tensors[name]
        if quantized and transpose and _quantizable(info, info.shape):
            raw = g.tensor_raw(name)
            rt = repack(info.ggml_type, raw, info.n_elements)
            out_dim, in_dim = info.shape
            return pack_repacked(rt, (in_dim, out_dim),
                                 device=shard_fn is None)
        return fetch(name, transpose)

    def put_qtensor(name: str, q: QTensor) -> QTensor:
        """device_put each packed leaf with its NamedSharding (shard_fn
        addresses QTensor leaves as '<param>.qs'/'.scales'/'.mins')."""
        def leaf(suffix, x):
            sh = shard_fn(f"{name}.{suffix}", x.shape)
            return jax.device_put(jnp.asarray(x), sh)

        return QTensor(
            qs=leaf("qs", q.qs), scales=leaf("scales", q.scales),
            mins=leaf("mins", q.mins) if q.mins is not None else None,
            in_dim=q.in_dim, group=q.group, packed4=q.packed4,
            w8a8=q.w8a8, sharded=True)

    def put(name: str, x):
        if isinstance(x, QTensor):
            if shard_fn is None:
                return x  # already device arrays
            return put_qtensor(name, x)
        sh = shard_fn(name, x.shape) if shard_fn else None
        return _to_device(x, dtype, sh)

    # phi3 LongRoPE per-dim frequency factors (root tensors; make_rope
    # picks long/short by the runtime context vs the original window)
    for tname, key in (("rope_factors_long.weight", "rope_factors_long"),
                       ("rope_factors_short.weight", "rope_factors_short")):
        if tname in g.tensors:
            cfg.extra[key] = tuple(
                float(x) for x in g.tensor_f32(tname).reshape(-1))

    params: dict = {}
    params["tok_embd"] = put("tok_embd", fetch("token_embd.weight", False))
    if "position_embd.weight" in g.tensors:   # gpt2 learned positions
        params["pos_embd"] = put("pos_embd",
                                 fetch("position_embd.weight", False))
    if "token_embd_norm.weight" in g.tensors:  # bloom embedding LayerNorm
        params["tok_embd_norm"] = put(
            "tok_embd_norm", fetch("token_embd_norm.weight", False))
        if "token_embd_norm.bias" in g.tensors:
            params["tok_embd_norm_b"] = put(
                "tok_embd_norm_b", fetch("token_embd_norm.bias", False))
    if "per_layer_token_embd.weight" in g.tensors:   # gemma3n
        params["per_layer_token_embd"] = put(
            "per_layer_token_embd",
            fetch("per_layer_token_embd.weight", False))
        params["per_layer_model_proj"] = put(
            "per_layer_model_proj",
            fetch("per_layer_model_proj.weight", True))
        params["per_layer_proj_norm"] = put(
            "per_layer_proj_norm", fetch("per_layer_proj_norm.weight",
                                         False))
        # [N-1, E, E] stacks; swap to (in, out) per slice for x @ W
        params["altup_proj"] = put(
            "altup_proj", np.swapaxes(
                g.tensor_f32("altup_proj.weight"), 1, 2))
        params["altup_unembed_proj"] = put(
            "altup_unembed_proj", np.swapaxes(
                g.tensor_f32("altup_unembed_proj.weight"), 1, 2))
    if "output_norm.weight" in g.tensors:
        params["output_norm"] = put("output_norm",
                                    fetch("output_norm.weight", False))
    else:
        # olmo (v1): non-parametric LayerNorm everywhere — the GGUF ships
        # no norm tensors at all; unit weights make _norm_any exact
        params["output_norm"] = put(
            "output_norm", np.ones((cfg.n_embd,), np.float32))
    if "output_norm.bias" in g.tensors:   # LN archs (falcon/gptneox/phi2)
        params["output_norm_b"] = put("output_norm_b",
                                      fetch("output_norm.bias", False))
    if "output.weight" in g.tensors:
        params["output"] = put("output", fetch_maybe_q("output.weight", True))
    else:
        SRV_INF("load_model", "output.weight absent -> tied embeddings")
    if "output.bias" in g.tensors:        # phi2
        params["output_b"] = put("output_b", fetch("output.bias", False))

    hc_arr = cfg.extra.get("head_count_arr")
    hckv_arr = cfg.extra.get("head_count_kv_arr")

    def split_qkv(i: int) -> dict | None:
        """phi3/gptneox-style fused blk.N.attn_qkv.weight -> wq/wk/wv
        (openelm: per-layer head counts)."""
        name = f"blk.{i}.attn_qkv.weight"
        if name not in g.tensors:
            return None
        w = fetch(name, True)  # [in, q+k+v]
        qd = (hc_arr[i] if hc_arr else cfg.n_heads) * cfg.head_dim
        kvd = (hckv_arr[i] if hckv_arr else cfg.n_kv_heads) * cfg.head_dim
        out = {"wq": w[:, :qd], "wk": w[:, qd:qd + kvd],
               "wv": w[:, qd + kvd:qd + 2 * kvd]}
        bname = f"blk.{i}.attn_qkv.bias"
        if bname in g.tensors:
            b = fetch(bname, False)
            out.update({"bq": b[:qd], "bk": b[qd:qd + kvd],
                        "bv": b[qd + kvd:qd + 2 * kvd]})
        return out

    def split_gate_up(i: int) -> dict | None:
        """phi3-style fused blk.N.ffn_up.weight ([E, 2*FF], gate columns
        first — ggml SWIGLU split order) -> w_gate/w_up."""
        name = f"blk.{i}.ffn_up.weight"
        if (name not in g.tensors or not cfg.ffn_gated or cfg.n_ff <= 0
                or f"blk.{i}.ffn_gate.weight" in g.tensors):
            return None
        out_dim = g.tensors[name].shape[0]
        if out_dim != 2 * cfg.n_ff:
            return None
        w = fetch(name, True)   # [E, 2*FF]
        return {"w_gate": w[:, :cfg.n_ff], "w_up": w[:, cfg.n_ff:]}

    layers: dict[str, list] = {k: [] for k in _LAYER_WEIGHTS}
    optional_missing = set()
    fused_gu_layers = set()
    for i in range(cfg.n_layers):
        fused = split_qkv(i)
        gu = split_gate_up(i)
        if gu is not None:
            fused_gu_layers.add(i)
        for key, (pattern, transpose) in _LAYER_WEIGHTS.items():
            name = pattern.format(i=i)
            if gu and key in gu:
                layers[key].append(gu[key])
                continue
            if name not in g.tensors:
                if fused and key in fused:
                    layers[key].append(fused[key])
                    continue
                optional_missing.add(key)
                continue
            layers[key].append(fetch_maybe_q(name, transpose))
        if fused and "bq" in fused:
            for bk in ("bq", "bk", "bv"):
                layers.setdefault(bk, []).append(fused[bk])
        for key, (pattern, transpose) in _LAYER_OPTIONAL.items():
            name = pattern.format(i=i)
            if name in g.tensors:
                layers.setdefault(key, []).append(fetch(name, transpose))
    # keys missing in some layers are fine now: layers are grouped by
    # signature below (e.g. deepseek2 dense + MoE mix)

    # layers may be heterogeneous (e.g. deepseek2: dense leading layers,
    # MoE for the rest). Group CONSECUTIVE same-signature layers; each group
    # scans separately in the model (models/llama.py:_run_stack).
    per_layer: list[dict] = [dict() for _ in range(cfg.n_layers)]
    counters = {k: 0 for k in layers}
    for i in range(cfg.n_layers):
        for key, (pattern, transpose) in list(_LAYER_WEIGHTS.items()) \
                + list(_LAYER_OPTIONAL.items()):
            if i in fused_gu_layers and key in ("w_gate", "w_up"):
                per_layer[i][key] = layers[key][counters[key]]
                counters[key] += 1
                continue
            name = pattern.format(i=i)
            if name in g.tensors:
                per_layer[i][key] = layers[key][counters[key]]
                counters[key] += 1
        # fused qkv splits were appended in order too
        if "wq" in layers and f"blk.{i}.attn_q.weight" not in g.tensors \
                and f"blk.{i}.attn_qkv.weight" in g.tensors:
            for kk in ("wq", "wk", "wv", "bq", "bk", "bv"):
                if kk in layers and counters.get(kk, 0) < len(layers[kk]):
                    per_layer[i][kk] = layers[kk][counters[kk]]
                    counters[kk] += 1

    # dbrx: attn_output_norm plays the pre-FFN norm role; grok: it's the
    # post-attention sandwich norm (ffn_norm exists there) and
    # layer_output_norm the post-MoE one
    for i in range(cfg.n_layers):
        if "attn_out_norm" in per_layer[i]:
            key = ("attn_post_norm" if "ffn_norm" in per_layer[i]
                   else "ffn_norm")
            per_layer[i][key] = per_layer[i].pop("attn_out_norm")
            if "attn_out_norm_b" in per_layer[i]:
                per_layer[i][key + "_b"] = \
                    per_layer[i].pop("attn_out_norm_b")
        if "layer_out_norm" in per_layer[i]:
            per_layer[i]["ffn_post_norm"] = \
                per_layer[i].pop("layer_out_norm")

    # olmo (v1): synthesize unit weights for the non-parametric LNs
    if cfg.arch == "olmo":
        ones = np.ones((cfg.n_embd,), np.float32)
        for i in range(cfg.n_layers):
            per_layer[i].setdefault("attn_norm", ones)
            per_layer[i].setdefault("ffn_norm", ones)

    if varheads:
        # openelm: per-layer head counts / FFN widths. Zero-pad every
        # layer to the max geometry so the stacked/scanned engine paths
        # (incl. decode chains and flash kernels) see uniform shapes:
        # padded q heads contribute nothing (their wo rows are zero),
        # padded KV heads see k=v=0 (wo-killed anyway), padded FFN
        # columns give silu(0)*0 = 0. Q heads are laid out GROUPED by kv
        # head at stride G_max so the GQA head->kv mapping stays
        # h // (H_pad/Hkv_max) — matching HF's repeat_interleave.
        import dataclasses
        D = cfg.head_dim
        L_ = cfg.n_layers
        hc = list(hc_arr or [cfg.n_heads] * L_)
        hk = list(hckv_arr or [cfg.n_kv_heads] * L_)
        ffs = list(cfg.extra.get("n_ff_arr") or [cfg.n_ff] * L_)
        gmax = max(hc[i] // hk[i] for i in range(L_))
        hkv_max = max(hk)
        h_pad = hkv_max * gmax
        ff_max = max(ffs)

        def padc(w, n):        # pad columns to n
            out = np.zeros((w.shape[0], n), w.dtype)
            out[:, :w.shape[1]] = w
            return out

        def padr(w, n):        # pad rows to n
            out = np.zeros((n, w.shape[1]), w.dtype)
            out[:w.shape[0]] = w
            return out

        for i, lp in enumerate(per_layer):
            g_i = hc[i] // hk[i]
            wq = np.zeros((cfg.n_embd, h_pad * D), lp["wq"].dtype)
            wo = np.zeros((h_pad * D, cfg.n_embd), lp["wo"].dtype)
            for k in range(hk[i]):
                src = slice(k * g_i * D, (k + 1) * g_i * D)
                dst = slice(k * gmax * D, (k * gmax + g_i) * D)
                wq[:, dst] = lp["wq"][:, src]
                wo[dst, :] = lp["wo"][src, :]
            lp["wq"], lp["wo"] = wq, wo
            lp["wk"] = padc(lp["wk"], hkv_max * D)
            lp["wv"] = padc(lp["wv"], hkv_max * D)
            if "w_gate" in lp:
                lp["w_gate"] = padc(lp["w_gate"], ff_max)
            lp["w_up"] = padc(lp["w_up"], ff_max)
            lp["w_down"] = padr(lp["w_down"], ff_max)
        cfg = dataclasses.replace(cfg, n_heads=h_pad, n_kv_heads=hkv_max,
                                  n_ff=ff_max)
        SRV_INF("load_model", "openelm: padded to %d/%d heads, ff=%d",
                h_pad, hkv_max, ff_max)

    # apertus xIELU per-layer activation params ride GGUF metadata arrays
    # (%arch%.xielu.alpha_p/alpha_n/beta/eps — RAW learned values; softplus
    # is applied in the forward like HF's XIELUActivation)
    _xap = g.metadata.get(f"{cfg.arch}.xielu.alpha_p")
    if _xap is not None:
        _xan = g.metadata.get(f"{cfg.arch}.xielu.alpha_n")
        _xb = g.metadata.get(f"{cfg.arch}.xielu.beta",
                             [0.5] * cfg.n_layers)
        _xe = g.metadata.get(f"{cfg.arch}.xielu.eps",
                             [-1e-6] * cfg.n_layers)
        for i in range(cfg.n_layers):
            per_layer[i]["xielu"] = np.array(
                [_xap[i], _xan[i], _xb[i], _xe[i]], np.float32)

    def stack_group(group: list[dict]) -> dict:
        out = {}
        for key in group[0]:
            vals = [d[key] for d in group]
            if isinstance(vals[0], QTensor):
                out[key] = put(f"layers.{key}", _stack_qtensors(vals))
            else:
                out[key] = put(f"layers.{key}", np.stack(vals))
        return out

    groups: list[list[dict]] = []
    for d in per_layer:
        sig = frozenset(d.keys())
        if groups and frozenset(groups[-1][0].keys()) == sig:
            groups[-1].append(d)
        else:
            groups.append([d])
    if len(groups) == 1:
        params["layers"] = stack_group(groups[0])
    else:
        SRV_INF("load_model", "heterogeneous layers: %s",
                [len(gr) for gr in groups])
        params["layer_groups"] = [stack_group(gr) for gr in groups]
    g.close()
    return cfg, params


# -- projection fusion (single-chip decode bandwidth) ------------------------

def _cat_weights(ws):
    """Concatenate projection weights along the output dim: dense arrays
    or QTensors (w8a8 / grouped / packed4) with identical layout params.
    Returns None when the set is heterogeneous (no fusion)."""
    if all(isinstance(w, jnp.ndarray) or isinstance(w, np.ndarray)
           for w in ws):
        if len({w.dtype for w in ws}) != 1 \
                or len({w.shape[:-1] for w in ws}) != 1:
            return None
        return jnp.concatenate([jnp.asarray(w) for w in ws], axis=-1)
    if not all(isinstance(w, QTensor) for w in ws):
        return None
    w0 = ws[0]
    if any(w.w8a8 != w0.w8a8 or w.packed4 != w0.packed4
           or w.group != w0.group or w.in_dim != w0.in_dim
           or w.sharded or (w.mins is None) != (w0.mins is None)
           for w in ws):
        return None
    return QTensor(
        qs=jnp.concatenate([w.qs for w in ws], axis=-1),
        scales=jnp.concatenate([w.scales for w in ws], axis=-1),
        mins=(jnp.concatenate([w.mins for w in ws], axis=-1)
              if w0.mins is not None else None),
        in_dim=w0.in_dim, group=w0.group, packed4=w0.packed4,
        w8a8=w0.w8a8)


def deinterleave_rope(params: dict, cfg: ModelConfig):
    """Load-time rope-layout change: permute wq/wk OUTPUT columns from
    ggml's adjacent-pair ('norm') order to half-split ('neox') order, so
    the runtime rotation needs no pair deinterleave. The 'norm' path's
    strided slices + stack/reshape thrash TPU tile layouts (profiled
    ~97us/decode-step at the bench shape — ~5% of the whole step); after
    this transform apply_rope takes the half-split path (two lane-aligned
    muls + one concat). Attention is invariant: each output column is an
    independent contraction, and q.k sums the same per-dim products (the
    f32 accumulation order changes, so results are allclose, not
    bitwise). The KV cache simply stores the permuted-k layout
    consistently; context-shift re-rotation follows cfg.rope_mode.

    Returns (params, cfg') with cfg'.rope_mode == 'neox', or the inputs
    unchanged when the transform doesn't apply (already neox, MLA,
    M-RoPE, per-layer groups, dynamic q/k LoRA, sharded QTensors, or
    layouts that don't match n_heads*head_dim). Mesh engines never
    reach this (fuse_params returns before it); only sharded QTensor
    leaves are explicitly checked here.
    """
    import dataclasses

    from ..ops.qmatmul import QTensor
    lay = params.get("layers")
    if (cfg.rope_mode != "norm" or cfg.mrope_sections
            or cfg.kv_lora_rank or "layer_groups" in params
            or not isinstance(lay, dict)
            or "wq" not in lay or "wk" not in lay
            or "lora_A_wq" in lay or "lora_A_wk" in lay):
        return params, cfg
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rot = cfg.rope_dim or D
    if rot % 2:
        return params, cfg

    def out_dim(w):
        return w.qs.shape[-1] if isinstance(w, QTensor) else w.shape[-1]

    if out_dim(lay["wq"]) != H * D or out_dim(lay["wk"]) != Hkv * D:
        return params, cfg
    if any(isinstance(lay[k], QTensor) and lay[k].sharded
           for k in ("wq", "wk")):
        return params, cfg

    base = np.concatenate([np.arange(0, rot, 2), np.arange(1, rot, 2),
                           np.arange(rot, D)])

    def perm_cols(w, n_heads):
        idx = jnp.asarray(np.concatenate(
            [h * D + base for h in range(n_heads)]))

        def take(a):
            return None if a is None else jnp.take(a, idx, axis=-1)
        if isinstance(w, QTensor):
            return QTensor(take(w.qs), take(w.scales), take(w.mins),
                           w.in_dim, w.group, w.packed4, w.w8a8)
        return take(w)

    lay = dict(lay)
    lay["wq"] = perm_cols(lay["wq"], H)
    lay["wk"] = perm_cols(lay["wk"], Hkv)
    for key, n in (("bq", H), ("bk", Hkv)):
        if key in lay:
            lay[key] = perm_cols(lay[key], n)
    for key in ("q_norm", "k_norm", "q_norm_b", "k_norm_b"):
        if key in lay:
            w = lay[key]
            if w.shape[-1] == D:      # per-head norm, shared across heads
                lay[key] = jnp.take(w, jnp.asarray(base), axis=-1)
            else:                     # whole-row [H*D]
                n = H if key[0] == "q" else Hkv
                lay[key] = perm_cols(w, n)
    out = dict(params)
    out["layers"] = lay
    return out, dataclasses.replace(cfg, rope_mode="neox")


def fuse_projections(params: dict, cfg: ModelConfig) -> dict:
    """Fuse per-layer q/k/v and gate/up projections into single matmuls
    (wqkv / w_gateup). Decode at batch 4 is HBM-bound and XLA's emitter
    runs small-N matmuls (wk/wv: [E, 256]) at a fraction of the big-N
    stream rate — one [E, 2560] matmul replaces three and one [E, 2*FF]
    replaces two (profiled: wk/wv at ~16% of roofline standalone).
    Single-device layouts only: a tp-sharded concat would split across
    the q/k/v boundary. Outputs are bitwise identical (each output column
    is an independent contraction; w8a8 activation scales are per-row of
    x, shared by construction)."""
    out = dict(params)
    for field in ("layers",):
        layers = params.get(field)
        if not isinstance(layers, dict):
            continue
        layers = dict(layers)
        if "altup_router" in layers:   # gemma3n stack uses split tensors
            out[field] = layers
            continue
        if all(k in layers for k in ("wq", "wk", "wv")) \
                and "wkv_a" not in layers:
            f = _cat_weights([layers["wq"], layers["wk"], layers["wv"]])
            if f is not None:
                layers["wqkv"] = f
                del layers["wq"], layers["wk"], layers["wv"]
        if all(k in layers for k in ("w_gate", "w_up")) \
                and "w_gate_inp" not in layers:
            f = _cat_weights([layers["w_gate"], layers["w_up"]])
            if f is not None:
                layers["w_gateup"] = f
                del layers["w_gate"], layers["w_up"]
        _bundle_smalls(layers)
        out[field] = layers
    return out


# the w8a8 decode-layer weights whose per-column scales ride the bundle,
# in bundle order (models/llama._apply_smalls splits by these offsets)
SMALLS_KEYS = ("wqkv", "wo", "w_gateup", "w_down")


def _bundle_smalls(layers: dict) -> None:
    """Bundle the per-layer SMALL tensors the decode layer reads — the
    four w8a8 per-column scale rows and the two norm weights (widened to
    f32, exact) — into ONE f32 stack of 1024-element-aligned segments,
    reshaped to [L, W//128, 128].

    Why this exact layout (all measured on-chip at the bench shape):
    - a dynamic-slice over dim 0 of a flat [L, n] stack crosses TPU
      (8, 128) tile sublanes — the slice relayouts 8x the bytes
      (~1.4us/layer); with the trailing [.., 128] axis the layer slice
      is a clean whole-tile read and the flatten back is a bitcast;
    - six separate per-layer slice fusions still cost ~0.35us of fixed
      VPU-stream overhead EACH (~45us/step total) — one bundle is one
      slice, and the in-step segment extracts are static slices at
      1024-aligned offsets of a T(1024) vector (tile-aligned views);
    - norms ride the f32 bundle so their bf16->f32 convert fusions
      (~7us/step x2) disappear; f32 widening is exact, and rms/ln
      consume f32 anyway.

    The original scale/norm leaves stay in place — models/llama.
    _apply_smalls overwrites them from the bundle and the dead scan
    slices are DCE'd. Values are byte-identical, so outputs don't
    change."""
    from ..ops.qmatmul import QTensor
    if not all(k in layers for k in ("attn_norm", "ffn_norm")
               + SMALLS_KEYS):
        return
    ws = [layers[k] for k in SMALLS_KEYS]
    if not all(isinstance(w, QTensor) and w.w8a8 and not w.sharded
               and w.scales.dtype == jnp.float32 for w in ws):
        return
    an, fn = layers["attn_norm"], layers["ffn_norm"]
    if isinstance(an, QTensor) or isinstance(fn, QTensor) \
            or an.dtype != fn.dtype or an.ndim != 2 \
            or an.shape != fn.shape:
        return
    L = an.shape[0]
    segs = []
    for w in ws:
        segs.append(w.scales)
        pad = (-w.scales.shape[-1]) % 1024
        if pad:
            segs.append(jnp.zeros((L, pad), jnp.float32))
    for g in (an, fn):
        segs.append(g.astype(jnp.float32))
        pad = (-g.shape[-1]) % 1024
        if pad:
            segs.append(jnp.zeros((L, pad), jnp.float32))
    sa = jnp.concatenate(segs, axis=-1)
    layers["smalls_all"] = sa.reshape(L, -1, 128)
