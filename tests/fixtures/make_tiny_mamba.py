"""Build a tiny random Mamba GGUF for recurrent-model tests.

Follows the GGUF conversion conventions for the mamba architecture
(llama.cpp convert_hf_to_gguf MambaModel): ssm_a stores -exp(A_log),
conv1d weights squeeze to [d_inner, d_conv], x_proj output order dt|B|C,
in_proj output order x|z. `state` accepts an HF MambaForCausalLM state
dict (numpy) so tests can golden-check logits against transformers.

Usage: python tests/fixtures/make_tiny_mamba.py /tmp/tiny_mamba.gguf
"""

from __future__ import annotations

import sys

import numpy as np

from llama_box_tpu.gguf import GGMLType, GGUFWriter

from .make_tiny_model import build_vocab

N_LAYERS = 2
N_EMBD = 64
D_INNER = 128
D_STATE = 8
D_CONV = 4
DT_RANK = 8
N_CTX = 1024


def write_tiny_mamba(path: str, quant: GGMLType = GGMLType.F32,
                     seed: int = 0, state: dict | None = None):
    """state: optional HF-style param dict (numpy arrays) keyed
    backbone.layers.N.mixer.* — used by the transformers golden test."""
    rng = np.random.default_rng(seed)
    vocab, scores, types = build_vocab()
    n_vocab = len(vocab)

    w = GGUFWriter(path, architecture="mamba")
    w.add_kv("general.name", "tiny-mamba-test")
    w.add_kv("mamba.block_count", N_LAYERS)
    w.add_kv("mamba.context_length", N_CTX)
    w.add_kv("mamba.embedding_length", N_EMBD)
    w.add_kv("mamba.feed_forward_length", 0)
    w.add_kv("mamba.attention.head_count", 0)
    w.add_kv("mamba.attention.head_count_kv", 0)
    w.add_kv("mamba.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("mamba.ssm.conv_kernel", D_CONV)
    w.add_kv("mamba.ssm.inner_size", D_INNER)
    w.add_kv("mamba.ssm.state_size", D_STATE)
    w.add_kv("mamba.ssm.time_step_rank", DT_RANK)
    w.add_kv("mamba.vocab_size", n_vocab)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def hf(name, default):
        if state is None:
            return default
        return np.asarray(state[name], np.float32)

    w.add_tensor("token_embd.weight",
                 hf("backbone.embeddings.weight", rand(n_vocab, N_EMBD)),
                 quant)
    w.add_tensor("output_norm.weight",
                 hf("backbone.norm_f.weight",
                    1.0 + rand(N_EMBD, scale=0.02)))
    w.add_tensor("output.weight",
                 hf("lm_head.weight", rand(n_vocab, N_EMBD)), quant)
    for i in range(N_LAYERS):
        p = f"backbone.layers.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight",
                     hf(p + "norm.weight", 1.0 + rand(N_EMBD, scale=0.02)))
        w.add_tensor(f"blk.{i}.ssm_in.weight",
                     hf(p + "mixer.in_proj.weight",
                        rand(2 * D_INNER, N_EMBD)), quant)
        conv = hf(p + "mixer.conv1d.weight", rand(D_INNER, 1, D_CONV))
        w.add_tensor(f"blk.{i}.ssm_conv1d.weight",
                     conv.reshape(D_INNER, D_CONV))
        w.add_tensor(f"blk.{i}.ssm_conv1d.bias",
                     hf(p + "mixer.conv1d.bias", rand(D_INNER)))
        w.add_tensor(f"blk.{i}.ssm_x.weight",
                     hf(p + "mixer.x_proj.weight",
                        rand(DT_RANK + 2 * D_STATE, D_INNER)), quant)
        w.add_tensor(f"blk.{i}.ssm_dt.weight",
                     hf(p + "mixer.dt_proj.weight",
                        rand(D_INNER, DT_RANK)), quant)
        w.add_tensor(f"blk.{i}.ssm_dt.bias",
                     hf(p + "mixer.dt_proj.bias", rand(D_INNER) + 0.5))
        a_log = hf(p + "mixer.A_log",
                   np.log(1.0 + rng.uniform(0.0, 3.0,
                                            (D_INNER, D_STATE))
                          ).astype(np.float32))
        w.add_tensor(f"blk.{i}.ssm_a.weight", -np.exp(a_log))
        w.add_tensor(f"blk.{i}.ssm_d.weight",
                     hf(p + "mixer.D", 1.0 + rand(D_INNER, scale=0.02)))
        w.add_tensor(f"blk.{i}.ssm_out.weight",
                     hf(p + "mixer.out_proj.weight",
                        rand(N_EMBD, D_INNER)), quant)
    w.write()
    return path


M2_N_LAYERS = 2
M2_N_EMBD = 64
M2_D_STATE = 16
M2_N_HEADS = 8
M2_HEAD_DIM = 16
M2_N_GROUPS = 2
M2_D_INNER = M2_N_HEADS * M2_HEAD_DIM
M2_D_CONV = 4


def write_tiny_mamba2(path: str, seed: int = 0, state: dict | None = None):
    """Mamba2 (SSD) GGUF: ssm.time_step_rank carries n_heads, conv runs
    over x|B|C, per-head scalar A, gated ssm_norm (llama.cpp mamba2
    conversion conventions)."""
    rng = np.random.default_rng(seed)
    vocab, scores, types = build_vocab()
    n_vocab = len(vocab)
    di, ds, ng, nh = M2_D_INNER, M2_D_STATE, M2_N_GROUPS, M2_N_HEADS
    conv_dim = di + 2 * ng * ds
    d_in_proj = 2 * di + 2 * ng * ds + nh

    w = GGUFWriter(path, architecture="mamba2")
    w.add_kv("general.name", "tiny-mamba2-test")
    w.add_kv("mamba2.block_count", M2_N_LAYERS)
    w.add_kv("mamba2.context_length", N_CTX)
    w.add_kv("mamba2.embedding_length", M2_N_EMBD)
    w.add_kv("mamba2.feed_forward_length", 0)
    w.add_kv("mamba2.attention.head_count", 0)
    w.add_kv("mamba2.attention.head_count_kv", 0)
    w.add_kv("mamba2.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("mamba2.ssm.conv_kernel", M2_D_CONV)
    w.add_kv("mamba2.ssm.inner_size", di)
    w.add_kv("mamba2.ssm.state_size", ds)
    w.add_kv("mamba2.ssm.time_step_rank", nh)
    w.add_kv("mamba2.ssm.group_count", ng)
    w.add_kv("mamba2.vocab_size", n_vocab)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def hf(name, default):
        if state is None:
            return default
        return np.asarray(state[name], np.float32)

    w.add_tensor("token_embd.weight",
                 hf("backbone.embeddings.weight", rand(n_vocab, M2_N_EMBD)))
    w.add_tensor("output_norm.weight",
                 hf("backbone.norm_f.weight",
                    1.0 + rand(M2_N_EMBD, scale=0.02)))
    w.add_tensor("output.weight",
                 hf("lm_head.weight", rand(n_vocab, M2_N_EMBD)))
    for i in range(M2_N_LAYERS):
        p = f"backbone.layers.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight",
                     hf(p + "norm.weight",
                        1.0 + rand(M2_N_EMBD, scale=0.02)))
        w.add_tensor(f"blk.{i}.ssm_in.weight",
                     hf(p + "mixer.in_proj.weight",
                        rand(d_in_proj, M2_N_EMBD)))
        conv = hf(p + "mixer.conv1d.weight", rand(conv_dim, 1, M2_D_CONV))
        w.add_tensor(f"blk.{i}.ssm_conv1d.weight",
                     conv.reshape(conv_dim, M2_D_CONV))
        w.add_tensor(f"blk.{i}.ssm_conv1d.bias",
                     hf(p + "mixer.conv1d.bias", rand(conv_dim)))
        w.add_tensor(f"blk.{i}.ssm_dt.bias",
                     hf(p + "mixer.dt_bias", rand(nh) + 0.5))
        a_log = hf(p + "mixer.A_log",
                   np.log(1.0 + rng.uniform(0.0, 3.0, (nh,))
                          ).astype(np.float32))
        w.add_tensor(f"blk.{i}.ssm_a.weight", -np.exp(a_log))
        w.add_tensor(f"blk.{i}.ssm_d.weight",
                     hf(p + "mixer.D", 1.0 + rand(nh, scale=0.02)))
        w.add_tensor(f"blk.{i}.ssm_norm.weight",
                     hf(p + "mixer.norm.weight",
                        1.0 + rand(di, scale=0.02)))
        w.add_tensor(f"blk.{i}.ssm_out.weight",
                     hf(p + "mixer.out_proj.weight",
                        rand(M2_N_EMBD, di)))
    w.write()
    return path


J_N_LAYERS = 2          # layer 0 mamba, layer 1 attention
J_N_EMBD = 64
J_D_INNER = 128
J_D_STATE = 8
J_D_CONV = 4
J_DT_RANK = 8
J_N_HEADS = 4
J_N_KV_HEADS = 2
J_FF = 128


def write_tiny_jamba(path: str, seed: int = 0, state: dict | None = None,
                     n_experts: int = 0, n_experts_used: int = 0):
    """Hybrid jamba GGUF: alternating mamba/attention layers, learned
    dt/B/C norms on the mamba mixer, gated-SiLU FFN on every layer
    (MoE when n_experts > 0 — jamba routes softmax->top-k WITHOUT
    renormalizing), no rope. head_count_kv is written as a per-layer
    array (mamba layers carry 0) like llama.cpp's converter."""
    rng = np.random.default_rng(seed)
    vocab, scores, types = build_vocab()
    n_vocab = len(vocab)
    di, ds, dtr = J_D_INNER, J_D_STATE, J_DT_RANK
    E, H, HKV, D = J_N_EMBD, J_N_HEADS, J_N_KV_HEADS, J_N_EMBD // J_N_HEADS

    w = GGUFWriter(path, architecture="jamba")
    w.add_kv("general.name", "tiny-jamba-test")
    w.add_kv("jamba.block_count", J_N_LAYERS)
    w.add_kv("jamba.context_length", N_CTX)
    w.add_kv("jamba.embedding_length", E)
    w.add_kv("jamba.feed_forward_length", J_FF)
    w.add_kv("jamba.attention.head_count", H)
    w.add_kv("jamba.attention.head_count_kv", [0, HKV])
    w.add_kv("jamba.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv("jamba.ssm.conv_kernel", J_D_CONV)
    w.add_kv("jamba.ssm.inner_size", di)
    w.add_kv("jamba.ssm.state_size", ds)
    w.add_kv("jamba.ssm.time_step_rank", dtr)
    if n_experts:
        w.add_kv("jamba.expert_count", n_experts)
        w.add_kv("jamba.expert_used_count", n_experts_used)
    w.add_kv("jamba.vocab_size", n_vocab)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def hf(name, default):
        if state is None:
            return default
        return np.asarray(state[name], np.float32)

    w.add_tensor("token_embd.weight",
                 hf("model.embed_tokens.weight", rand(n_vocab, E)))
    w.add_tensor("output_norm.weight",
                 hf("model.final_layernorm.weight",
                    1.0 + rand(E, scale=0.02)))
    w.add_tensor("output.weight", hf("lm_head.weight", rand(n_vocab, E)))
    for i in range(J_N_LAYERS):
        p = f"model.layers.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_norm.weight",
                     hf(p + "input_layernorm.weight",
                        1.0 + rand(E, scale=0.02)))
        if i % 2 == 0:   # mamba layer
            w.add_tensor(o + "ssm_in.weight",
                         hf(p + "mamba.in_proj.weight", rand(2 * di, E)))
            conv = hf(p + "mamba.conv1d.weight", rand(di, 1, J_D_CONV))
            w.add_tensor(o + "ssm_conv1d.weight",
                         conv.reshape(di, J_D_CONV))
            w.add_tensor(o + "ssm_conv1d.bias",
                         hf(p + "mamba.conv1d.bias", rand(di)))
            w.add_tensor(o + "ssm_x.weight",
                         hf(p + "mamba.x_proj.weight",
                            rand(dtr + 2 * ds, di)))
            w.add_tensor(o + "ssm_dt.weight",
                         hf(p + "mamba.dt_proj.weight", rand(di, dtr)))
            w.add_tensor(o + "ssm_dt.bias",
                         hf(p + "mamba.dt_proj.bias", rand(di) + 0.5))
            a_log = hf(p + "mamba.A_log",
                       np.log(1.0 + rng.uniform(0.0, 3.0, (di, ds))
                              ).astype(np.float32))
            w.add_tensor(o + "ssm_a.weight", -np.exp(a_log))
            w.add_tensor(o + "ssm_d.weight",
                         hf(p + "mamba.D", 1.0 + rand(di, scale=0.02)))
            w.add_tensor(o + "ssm_out.weight",
                         hf(p + "mamba.out_proj.weight", rand(E, di)))
            w.add_tensor(o + "ssm_dt_norm.weight",
                         hf(p + "mamba.dt_layernorm.weight",
                            1.0 + rand(dtr, scale=0.02)))
            w.add_tensor(o + "ssm_b_norm.weight",
                         hf(p + "mamba.b_layernorm.weight",
                            1.0 + rand(ds, scale=0.02)))
            w.add_tensor(o + "ssm_c_norm.weight",
                         hf(p + "mamba.c_layernorm.weight",
                            1.0 + rand(ds, scale=0.02)))
        else:            # attention layer
            w.add_tensor(o + "attn_q.weight",
                         hf(p + "self_attn.q_proj.weight", rand(H * D, E)))
            w.add_tensor(o + "attn_k.weight",
                         hf(p + "self_attn.k_proj.weight",
                            rand(HKV * D, E)))
            w.add_tensor(o + "attn_v.weight",
                         hf(p + "self_attn.v_proj.weight",
                            rand(HKV * D, E)))
            w.add_tensor(o + "attn_output.weight",
                         hf(p + "self_attn.o_proj.weight", rand(E, H * D)))
        w.add_tensor(o + "ffn_norm.weight",
                     hf(p + "pre_ff_layernorm.weight",
                        1.0 + rand(E, scale=0.02)))
        if n_experts:
            w.add_tensor(o + "ffn_gate_inp.weight",
                         hf(p + "feed_forward.router.weight",
                            rand(n_experts, E)))
            for hfk, gg in (("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps"),
                            ("down_proj", "ffn_down_exps")):
                shp = (E, J_FF) if hfk == "down_proj" else (J_FF, E)
                stacked = np.stack([
                    hf(p + f"feed_forward.experts.{j}.{hfk}.weight",
                       rand(*shp)) for j in range(n_experts)])
                w.add_tensor(o + gg + ".weight", stacked)
        else:
            w.add_tensor(o + "ffn_gate.weight",
                         hf(p + "feed_forward.gate_proj.weight",
                            rand(J_FF, E)))
            w.add_tensor(o + "ffn_up.weight",
                         hf(p + "feed_forward.up_proj.weight",
                            rand(J_FF, E)))
            w.add_tensor(o + "ffn_down.weight",
                         hf(p + "feed_forward.down_proj.weight",
                            rand(E, J_FF)))
    w.write()
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_mamba.gguf"
    if "--mamba2" in sys.argv:
        write_tiny_mamba2(out)
    elif "--jamba" in sys.argv:
        write_tiny_jamba(out)
    else:
        write_tiny_mamba(out)
    print(f"wrote {out}")
