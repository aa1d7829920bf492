"""Model hyperparameter config extracted from GGUF metadata.

Mirrors the capability/arch probes the reference performs at load
(httpserver.hpp:2686-3164: arch detect, rope params, SWA/causal probes).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

# architectures using neox-style (half-split) rope rotation; llama-family
# GGUFs are converted with permuted q/k for 'norm' (adjacent-pair) rotation.
_LN_ARCHS = {
    # LayerNorm (optionally biased) instead of RMSNorm
    "falcon", "gptneox", "phi2", "stablelm", "starcoder2", "command-r",
    "nemotron", "gpt2", "bloom", "mpt", "starcoder", "gptj", "cohere2",
    "olmo",   # non-parametric LN: loader synthesizes unit weights
    "rwkv6", "rwkv7",   # RWKV blocks use biased LayerNorm throughout
    "dbrx",   # LayerNorm without bias
    "orion",  # biased LayerNorm + neox rope on a llama graph
    "jais",   # biased LayerNorm, ALiBi, muP scales, SwiGLU
    "phimoe",  # biased LayerNorm + neox rope + sparsemixer MoE
}
# position-independent q/k (learned pos embd, ALiBi, or none); no rotation
_NO_ROPE_ARCHS = {"gpt2", "bloom", "mpt", "jina-bert-v2", "jamba",
                  "rwkv6", "rwkv7", "jais",
                  "refact",   # smallcloudai: ALiBi positions, no rotation
                  "nemotron_h"}   # hybrid attention layers are unroped
_PARALLEL_ARCHS = {
    # x + attn(norm(x)) + ffn(norm(x)) parallel-residual blocks
    "falcon", "phi2", "command-r", "cohere2", "gptj",
}
_UNGATED_FFN_ARCHS = {
    # act(up) @ down, no gate projection
    "falcon", "gptneox", "phi2", "starcoder2", "nemotron",
    "gpt2", "bloom", "mpt", "starcoder", "gptj", "apertus",
    "nemotron_h", "arcee",
}
_NEOX_ROPE_ARCHS = {
    "qwen2", "qwen2moe", "qwen3", "qwen3moe", "falcon", "gemma", "gemma2",
    "gemma3", "phi2", "phi3", "stablelm", "gptneox", "starcoder2", "olmo2",
    "olmo3",
    "internlm2", "deepseek2", "minicpm3", "smollm3", "nemotron", "olmoe",
    "bamba", "granitehybrid", "gpt-oss", "exaone4", "dots1", "seed_oss",
    "ernie4_5", "ernie4_5-moe", "apertus", "falcon-h1", "lfm2",
    "qwen3next", "olmo", "chameleon", "gemma3n", "dbrx", "grok",
    "openelm", "orion", "hunyuan-dense", "hunyuan-moe", "glm4moe",
    "phimoe", "jetmoe",
}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: str = "llama"
    name: str = ""
    n_layers: int = 0
    n_embd: int = 0
    n_heads: int = 0
    n_kv_heads: int = 0
    head_dim: int = 0
    n_ff: int = 0
    vocab_size: int = 0
    n_ctx_train: int = 2048
    rms_eps: float = 1e-5
    rope_freq_base: float = 10000.0
    rope_freq_scale: float = 1.0
    rope_scaling_type: str = "none"
    rope_orig_ctx: int = 0
    rope_dim: int = 0
    rope_mode: str = "norm"
    mrope_sections: tuple = ()   # qwen2-vl M-RoPE half-dim sections
    yarn_ext_factor: float = -1.0
    yarn_attn_factor: float = 1.0
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    causal: bool = True
    pooling: str = "none"  # none | mean | cls | last | rank
    tie_word_embeddings: bool = False
    logit_softcap: float = 0.0
    attn_softcap: float = 0.0
    router_softcap: float = 0.0   # grok: tanh-cap router logits
    expert_count: int = 0
    expert_used_count: int = 0
    expert_weights_norm: bool = True  # renormalize top-k router probs
    expert_weights_scale: float = 1.0  # deepseek routed-output multiplier
    expert_gating_func: int = 1   # 1 softmax, 2 sigmoid, 3 sparsemixer
    router_jitter_eps: float = 0.0     # phimoe sparsemixer mask width
    # deepseek3 noaux_tc group-limited routing (with exp_probs_b bias)
    expert_group_count: int = 1
    expert_group_used_count: int = 1
    # deepseek2 multi-head latent attention
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    v_head_dim: int = 0                # 0 => head_dim
    swa_window: int = 0  # sliding-window attention width; 0 = full
    swa_pattern: int = 0   # every n-th layer is global (gemma2: 2, gemma3: 6)
    # llama4: every nope_layer_step-th layer has NO rope (and full-context
    # attention with temperature tuning); the rest use chunked attention
    nope_layer_step: int = 0
    chunked_window: int = 0          # aligned-chunk attention width
    attn_temp_scale: float = 0.0     # q *= 1+scale*log1p((pos+1)/floor)
    attn_temp_floor: float = 8192.0
    qk_l2_norm: bool = False         # weightless per-head L2 norm (llama4)
    qk_norm_post_rope: bool = False  # per-head q/k norm AFTER rope (hunyuan)
    moe_weight_before_ffn: bool = False  # llama4: scale expert INPUT
    act_fn: str = "silu"   # FFN gate activation (gemma: gelu; relu2)
    embd_scale: float = 1.0  # embedding multiplier (gemma: sqrt(n_embd))
    norm_style: str = "rms"  # rms | ln (LayerNorm, optional bias tensors)
    parallel_residual: bool = False  # x + attn(h) + ffn(h) (falcon/gptneox)
    ffn_gated: bool = True   # False: act(up) @ down (gptneox/phi2/falcon)
    residual_scale: float = 1.0   # granite residual multiplier
    logit_scale: float = 1.0      # command-r / granite logits multiplier
    attn_scale: float = 0.0       # score scale override (0 = 1/sqrt(D))
    attn_clamp: float = 0.0       # olmo clip_qkv: clamp q/k/v projections
    alibi_max_bias: float = 0.0   # ALiBi (bloom/mpt); 0 = off
    rope_freq_base_swa: float = 0.0  # local-layer rope base (gemma3)
    # recurrent (mamba) state-space hyperparameters (models/mamba.py)
    ssm_d_conv: int = 0      # depthwise conv kernel width
    ssm_d_inner: int = 0     # mixer inner width (0 = not recurrent)
    ssm_d_state: int = 0     # SSM state dimension per channel
    ssm_dt_rank: int = 0     # dt low-rank projection width (mamba2: n_heads)
    ssm_n_group: int = 0     # mamba2 B/C group count
    ssm_dt_b_c_rms: bool = False  # falcon-mamba: RMS-norm dt/B/C
    shortconv_l_cache: int = 0    # lfm2 gated short-conv width
    # rwkv6/7 (models/rwkv.py): linear-attention head size; recurrent
    wkv_head_size: int = 0
    time_mix_extra_dim: int = 0   # rwkv6 data-dependent lerp LoRA width
    time_decay_extra_dim: int = 0
    rescale_every: int = 0        # halve activations every N layers
    extra: dict = dataclasses.field(default_factory=dict, compare=False, hash=False)

    @property
    def n_gqa_groups(self) -> int:
        return self.n_heads // max(1, self.n_kv_heads)

    @property
    def recurrent(self) -> bool:
        """Constant-memory recurrent state instead of a KV cache."""
        return (self.ssm_d_inner > 0 or self.shortconv_l_cache > 0
                or self.wkv_head_size > 0)

    @classmethod
    def from_gguf(cls, g) -> "ModelConfig":
        arch = g.architecture or "llama"

        def kv(suffix: str, default: Any = None):
            return g.metadata.get(f"{arch}.{suffix}", default)

        def kv_int(suffix: str, default: int) -> int:
            """Integer hparam; hybrid archs (jamba) store per-layer
            arrays (mamba layers carry 0 heads) — take the max."""
            v = kv(suffix, default)
            if isinstance(v, (list, tuple, np.ndarray)):
                vals = [int(x) for x in v]
                return max(vals) if vals else default
            return int(v)

        n_heads = kv_int("attention.head_count", 32)
        n_embd = int(kv("embedding_length", 4096))
        head_dim = int(kv("attention.key_length", 0)) or n_embd // max(1, n_heads)
        scaling = str(kv("rope.scaling.type", "none") or "none")
        vocab_size = int(kv("vocab_size", 0))
        if not vocab_size:
            toks = g.metadata.get("tokenizer.ggml.tokens")
            vocab_size = len(toks) if toks is not None else 32000
        extra: dict = {}
        if arch == "openelm":
            # per-layer head/FFN geometry arrays — the loader pads every
            # layer to the max so the stacked/scanned engine paths work
            for suffix, key in (("attention.head_count",
                                 "head_count_arr"),
                                ("attention.head_count_kv",
                                 "head_count_kv_arr"),
                                ("feed_forward_length", "n_ff_arr")):
                v = kv(suffix)
                if isinstance(v, (list, tuple, np.ndarray)):
                    extra[key] = tuple(int(x) for x in v)
        return cls(
            extra=extra,
            arch=arch,
            name=str(g.metadata.get("general.name", "")),
            n_layers=int(kv("block_count", 0)),
            n_embd=n_embd,
            n_heads=n_heads,
            n_kv_heads=kv_int("attention.head_count_kv", n_heads),
            head_dim=head_dim,
            n_ff=kv_int("feed_forward_length", 4 * n_embd),
            vocab_size=vocab_size,
            n_ctx_train=int(kv("context_length", 2048)),
            rms_eps=float(kv("attention.layer_norm_rms_epsilon",
                             kv("attention.layer_norm_epsilon", 1e-5))),
            rope_freq_base=float(kv("rope.freq_base", 10000.0)),
            rope_freq_scale=1.0 / float(kv("rope.scaling.factor", 1.0))
            if scaling in ("linear", "yarn") else 1.0,
            rope_scaling_type=scaling,
            rope_orig_ctx=int(kv("rope.scaling.original_context_length", 0)),
            yarn_attn_factor=float(kv("rope.scaling.attn_factor", 1.0)
                                   or 1.0),
            rope_dim=int(kv("rope.dimension_count", 0)) or head_dim,
            rope_mode=("none" if arch in _NO_ROPE_ARCHS
                       else "neox" if (arch in _NEOX_ROPE_ARCHS
                                       or arch in ("qwen2vl", "qwen25vl"))
                       else "norm"),
            mrope_sections=tuple(
                int(x) for x in (kv("rope.dimension_sections")
                                 if kv("rope.dimension_sections") is not None
                                 else kv("rope.mrope_section", []) or [])),
            causal=bool(g.metadata.get(f"{arch}.attention.causal", True)),
            expert_count=int(kv("expert_count", 0) or 0),
            expert_used_count=int(kv("expert_used_count", 0) or 0),
            # qwen3moe always renormalizes top-k router probs (the
            # reference's build_qwen3moe passes norm_w=true)
            # qwen3moe/gpt-oss renormalize top-k router probs (for gpt-oss
            # softmax-over-all + renorm == HF's topk-then-softmax exactly)
            expert_weights_norm=bool(kv("expert_weights_norm",
                                        arch in ("llama", "mixtral",
                                                 "qwen3moe", "qwen3next",
                                                 "gpt-oss", "dbrx",
                                                 "granitemoe",
                                                 "granitemoeshared",
                                                 "jetmoe",
                                                 # arctic: build_moe_ffn
                                                 # norm_w=true; bailingmoe
                                                 # (Ling) norm_topk_prob
                                                 "arctic", "bailingmoe",
                                                 "hunyuan-moe"))),
            # cohere2 (command-r7b) / exaone4: every 4th layer is global,
            # full-context AND unroped (llama.cpp keys rope on is_swa)
            nope_layer_step=int(kv("attention.no_rope_layer_step",
                                   4 if arch in ("llama4", "cohere2",
                                                 "exaone4")
                                   else 0) or 0),
            chunked_window=int(kv("attention.chunk_size",
                                  8192 if arch == "llama4" else 0) or 0),
            attn_temp_scale=float(kv("attention.temperature_scale",
                                     0.1 if arch == "llama4" else 0.0)
                                  or 0.0),
            attn_temp_floor=float(kv("attention.floor_scale", 8192.0)
                                  or 8192.0),
            qk_l2_norm=bool(kv("attention.use_kq_norm",
                               arch == "llama4")),
            qk_norm_post_rope=arch in ("hunyuan-dense", "hunyuan-moe"),
            moe_weight_before_ffn=arch == "llama4",
            expert_weights_scale=float(kv("expert_weights_scale", 1.0)
                                       or 1.0),
            expert_gating_func=int(kv("expert_gating_func",
                                       2 if arch == "llama4"
                                       else 3 if arch == "phimoe" else 1)
                                   or 1),
            router_jitter_eps=float(
                kv("router_jitter", 0.01 if arch == "phimoe" else 0.0)
                or 0.0),
            expert_group_count=int(kv("expert_group_count", 1) or 1),
            expert_group_used_count=int(
                kv("expert_group_used_count", 1) or 1),
            q_lora_rank=int(kv("attention.q_lora_rank", 0) or 0),
            kv_lora_rank=int(kv("attention.kv_lora_rank", 0) or 0),
            v_head_dim=int(kv("attention.value_length", 0) or 0),
            swa_window=int(kv("attention.sliding_window", 0) or 0),
            # gpt-oss alternates sliding/full starting sliding at layer 0
            # (llama.cpp hardcodes set_swa_pattern(2) for LLM_ARCH_OPENAI_MOE)
            swa_pattern=int(kv("attention.sliding_window_pattern",
                               {"gemma2": 2, "gemma3": 6, "gemma3n": 5,
                                "gpt-oss": 2, "olmo3": 4,
                                "cohere2": 4, "exaone4": 4}.get(arch, 0))
                            or 0) if (arch.startswith("gemma")
                                      or arch in ("gpt-oss", "cohere2",
                                                  "exaone4", "olmo3"))
            else 0,
            # ungated-FFN families use GELU (falcon/gptneox/phi2/
            # starcoder2/gpt2/bloom/mpt); nemotron uses squared ReLU
            act_fn=("gelu" if (arch.startswith("gemma")
                               or arch in ("falcon", "gptneox", "phi2",
                                           "starcoder2", "gpt2", "bloom",
                                           "mpt", "starcoder", "gptj",
                                           "grok"))
                    else "relu2" if arch in ("nemotron", "nemotron_h",
                                             "bitnet", "arcee")
                    else "swiglu_oai" if arch == "gpt-oss"
                    else "xielu" if arch == "apertus" else "silu"),
            # grok-1 scales the embedding by sqrt(n_embd) like gemma
            embd_scale=float(kv("embedding_scale",
                                float(n_embd) ** 0.5
                                if arch.startswith("gemma")
                                or arch == "grok" else 1.0)
                             or 1.0),
            rope_freq_base_swa=float(
                kv("rope.local_freq_base",
                   10000.0 if arch in ("gemma3", "gemma3n") else 0.0)
                or 0.0),
            # grok-1 constants (llm_build_grok): logits * 1/sqrt(3) then
            # tanh-capped at 30; attention scores tanh-capped at 30;
            # router logits tanh-capped at 30 — newer GGUFs carry them as
            # metadata, older grok-1 conversions rely on the defaults
            logit_softcap=float(kv("final_logit_softcapping",
                                   30.0 if arch == "grok" else 0.0)
                                or 0.0),
            attn_softcap=float(kv("attn_logit_softcapping",
                                  30.0 if arch == "grok" else 0.0)
                               or 0.0),
            router_softcap=float(kv("router_logit_softcapping",
                                    30.0 if arch == "grok" else 0.0)
                                 or 0.0),
            norm_style="ln" if arch in _LN_ARCHS else "rms",
            parallel_residual=bool(
                kv("use_parallel_residual", arch in _PARALLEL_ARCHS)),
            ffn_gated=arch not in _UNGATED_FFN_ARCHS,
            residual_scale=float(kv("residual_scale", 1.0) or 1.0),
            logit_scale=float(kv("logit_scale",
                                 0.5773502691896257 if arch == "grok"
                                 else 1.0) or 1.0),
            # gemma3n attends UNSCALED (HF Gemma3nTextAttention
            # scaling=1.0); jais muP scales scores by 1/d, not 1/sqrt(d)
            # (HF JAISAttention scale_qk_dot_by_d)
            attn_scale=float(kv("attention.scale",
                                1.0 if arch == "gemma3n"
                                else 1.0 / head_dim if arch == "jais"
                                else 0.0) or 0.0),
            attn_clamp=float(kv("attention.clamp_kqv", 0.0) or 0.0),
            alibi_max_bias=float(
                kv("attention.max_alibi_bias",
                   8.0 if arch in ("bloom", "mpt", "jais", "refact")
                   else 0.0)
                or 0.0),
            ssm_d_conv=int(kv("ssm.conv_kernel", 0) or 0),
            ssm_d_inner=int(kv("ssm.inner_size", 0) or 0),
            ssm_d_state=int(kv("ssm.state_size", 0) or 0),
            ssm_dt_rank=int(kv("ssm.time_step_rank", 0) or 0),
            ssm_n_group=int(kv("ssm.group_count", 0) or 0),
            ssm_dt_b_c_rms=bool(kv("ssm.dt_b_c_rms", False)),
            shortconv_l_cache=int(kv("shortconv.l_cache", 0) or 0),
            wkv_head_size=int(kv("wkv.head_size", 0) or 0),
            time_mix_extra_dim=int(kv("time_mix_extra_dim", 0) or 0),
            time_decay_extra_dim=int(kv("time_decay_extra_dim", 0) or 0),
            rescale_every=int(kv("rescale_every_n_layers", 0) or 0),
        )
