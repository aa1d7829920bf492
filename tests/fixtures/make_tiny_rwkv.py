"""Build tiny random RWKV6 / RWKV7 GGUFs for recurrent-model tests.

Follows llama.cpp's LLM_ARCH_RWKV6/RWKV7 tensor naming and storage
conventions (time_mix_* / channel_mix_* block tensors; lerps stored
[1, 1, E]; time_mix_w2 stored [5|6, E, edim]; token_embd_norm = ln0).
Returns the raw numpy weight dict so tests can run an independent
step-by-step reference implementation against the same numbers.

Usage: python -m tests.fixtures.make_tiny_rwkv /tmp/tiny_rwkv6.gguf
"""

from __future__ import annotations

import sys

import numpy as np

from llama_box_tpu.gguf import GGUFWriter

from .make_tiny_model import build_vocab

N_LAYERS = 2
N_EMBD = 64
HEAD_SIZE = 16          # H = 4 heads
N_FF = 128
EDIM = 8                # time_mix_extra_dim
DDIM = 16               # time_decay_extra_dim
N_CTX = 1024


def _common_header(w, arch, n_vocab, n_ff):
    w.add_kv(f"{arch}.block_count", N_LAYERS)
    w.add_kv(f"{arch}.context_length", N_CTX)
    w.add_kv(f"{arch}.embedding_length", N_EMBD)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.attention.head_count", 0)
    w.add_kv(f"{arch}.attention.head_count_kv", 0)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_kv(f"{arch}.wkv.head_size", HEAD_SIZE)
    w.add_kv(f"{arch}.vocab_size", n_vocab)
    w.add_kv(f"{arch}.rescale_every_n_layers", 0)
    w.add_kv(f"{arch}.token_shift_count", 2)
    vocab, scores, types = build_vocab()
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)


def write_tiny_rwkv6(path: str, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    vocab, _, _ = build_vocab()
    n_vocab = len(vocab)
    E, hs = N_EMBD, HEAD_SIZE
    H = E // hs

    def rand(*shape, scale=0.2):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    p = {
        "token_embd": rand(n_vocab, E),
        "tok_norm_w": 1.0 + rand(E, scale=0.02),
        "tok_norm_b": rand(E, scale=0.02),
        "output_norm_w": 1.0 + rand(E, scale=0.02),
        "output_norm_b": rand(E, scale=0.02),
        "output": rand(n_vocab, E),
        "layers": [],
    }
    for _ in range(N_LAYERS):
        lp = {
            "ln1_w": 1.0 + rand(E, scale=0.02), "ln1_b": rand(E, scale=0.02),
            "ln2_w": 1.0 + rand(E, scale=0.02), "ln2_b": rand(E, scale=0.02),
            "lerp_x": rand(E, scale=0.5) + 0.5,
            "lerp_w": rand(E, scale=0.5) + 0.5,
            "lerp_k": rand(E, scale=0.5) + 0.5,
            "lerp_v": rand(E, scale=0.5) + 0.5,
            "lerp_r": rand(E, scale=0.5) + 0.5,
            "lerp_g": rand(E, scale=0.5) + 0.5,
            "w1": rand(5 * EDIM, E),           # (out, in)
            "w2": rand(5, E, EDIM),            # (5, out, in)
            "first": rand(H, hs, scale=0.5),
            "decay": rand(E, scale=0.5) - 4.0,
            "decay_w1": rand(DDIM, E),
            "decay_w2": rand(E, DDIM, scale=0.05),
            "Wr": rand(E, E, scale=0.1), "Wk": rand(E, E, scale=0.1),
            "Wv": rand(E, E, scale=0.1), "Wg": rand(E, E, scale=0.1),
            "ln_x_w": 1.0 + rand(E, scale=0.02),
            "ln_x_b": rand(E, scale=0.02),
            "Wo": rand(E, E, scale=0.1),
            "cm_lerp_k": rand(E, scale=0.5) + 0.5,
            "cm_lerp_r": rand(E, scale=0.5) + 0.5,
            "cm_Wk": rand(N_FF, E, scale=0.1),
            "cm_Wr": rand(E, E, scale=0.1),
            "cm_Wv": rand(E, N_FF, scale=0.1),
        }
        p["layers"].append(lp)

    w = GGUFWriter(path, architecture="rwkv6")
    w.add_kv("general.name", "tiny-rwkv6-test")
    _common_header(w, "rwkv6", n_vocab, N_FF)
    w.add_kv("rwkv6.time_mix_extra_dim", EDIM)
    w.add_kv("rwkv6.time_decay_extra_dim", DDIM)
    w.add_tensor("token_embd.weight", p["token_embd"])
    w.add_tensor("token_embd_norm.weight", p["tok_norm_w"])
    w.add_tensor("token_embd_norm.bias", p["tok_norm_b"])
    w.add_tensor("output_norm.weight", p["output_norm_w"])
    w.add_tensor("output_norm.bias", p["output_norm_b"])
    w.add_tensor("output.weight", p["output"])
    for i, lp in enumerate(p["layers"]):
        t = f"blk.{i}."
        w.add_tensor(t + "attn_norm.weight", lp["ln1_w"])
        w.add_tensor(t + "attn_norm.bias", lp["ln1_b"])
        w.add_tensor(t + "attn_norm_2.weight", lp["ln2_w"])
        w.add_tensor(t + "attn_norm_2.bias", lp["ln2_b"])
        w.add_tensor(t + "time_mix_lerp_x.weight",
                     lp["lerp_x"].reshape(1, 1, E))
        for nm in ("w", "k", "v", "r", "g"):
            w.add_tensor(t + f"time_mix_lerp_{nm}.weight",
                         lp[f"lerp_{nm}"].reshape(1, 1, E))
        w.add_tensor(t + "time_mix_w1.weight", lp["w1"])
        w.add_tensor(t + "time_mix_w2.weight", lp["w2"])
        w.add_tensor(t + "time_mix_first.weight", lp["first"])
        w.add_tensor(t + "time_mix_decay.weight", lp["decay"])
        w.add_tensor(t + "time_mix_decay_w1.weight", lp["decay_w1"])
        w.add_tensor(t + "time_mix_decay_w2.weight", lp["decay_w2"])
        w.add_tensor(t + "time_mix_receptance.weight", lp["Wr"])
        w.add_tensor(t + "time_mix_key.weight", lp["Wk"])
        w.add_tensor(t + "time_mix_value.weight", lp["Wv"])
        w.add_tensor(t + "time_mix_gate.weight", lp["Wg"])
        w.add_tensor(t + "time_mix_ln.weight", lp["ln_x_w"])
        w.add_tensor(t + "time_mix_ln.bias", lp["ln_x_b"])
        w.add_tensor(t + "time_mix_output.weight", lp["Wo"])
        w.add_tensor(t + "channel_mix_lerp_k.weight",
                     lp["cm_lerp_k"].reshape(1, 1, E))
        w.add_tensor(t + "channel_mix_lerp_r.weight",
                     lp["cm_lerp_r"].reshape(1, 1, E))
        w.add_tensor(t + "channel_mix_key.weight", lp["cm_Wk"])
        w.add_tensor(t + "channel_mix_receptance.weight", lp["cm_Wr"])
        w.add_tensor(t + "channel_mix_value.weight", lp["cm_Wv"])
    w.write()
    return p


def write_tiny_rwkv7(path: str, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    vocab, _, _ = build_vocab()
    n_vocab = len(vocab)
    E, hs = N_EMBD, HEAD_SIZE
    H = E // hs
    ADIM = GDIM = VDIM = 8

    def rand(*shape, scale=0.2):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    p = {
        "token_embd": rand(n_vocab, E),
        "tok_norm_w": 1.0 + rand(E, scale=0.02),
        "tok_norm_b": rand(E, scale=0.02),
        "output_norm_w": 1.0 + rand(E, scale=0.02),
        "output_norm_b": rand(E, scale=0.02),
        "output": rand(n_vocab, E),
        "layers": [],
    }
    for i in range(N_LAYERS):
        lp = {
            "ln1_w": 1.0 + rand(E, scale=0.02), "ln1_b": rand(E, scale=0.02),
            "ln2_w": 1.0 + rand(E, scale=0.02), "ln2_b": rand(E, scale=0.02),
            "lerp_r": rand(E, scale=0.5) + 0.5,
            "lerp_w": rand(E, scale=0.5) + 0.5,
            "lerp_k": rand(E, scale=0.5) + 0.5,
            "lerp_v": rand(E, scale=0.5) + 0.5,
            "lerp_a": rand(E, scale=0.5) + 0.5,
            "lerp_g": rand(E, scale=0.5) + 0.5,
            "w0": rand(E, scale=0.5) - 4.0,
            "w1": rand(DDIM, E), "w2": rand(E, DDIM, scale=0.05),
            "a0": rand(E, scale=0.3),
            "a1": rand(ADIM, E), "a2": rand(E, ADIM, scale=0.1),
            "g1": rand(GDIM, E), "g2": rand(E, GDIM, scale=0.3),
            "k_k": rand(E, scale=0.3) + 0.8,
            "k_a": rand(E, scale=0.3) + 0.8,
            "r_k": rand(H, hs, scale=0.3),
            "Wr": rand(E, E, scale=0.1), "Wk": rand(E, E, scale=0.1),
            "Wv": rand(E, E, scale=0.1),
            "ln_x_w": 1.0 + rand(E, scale=0.02),
            "ln_x_b": rand(E, scale=0.02),
            "Wo": rand(E, E, scale=0.1),
            "cm_lerp_k": rand(E, scale=0.5) + 0.5,
            "cm_Wk": rand(N_FF, E, scale=0.1),
            "cm_Wv": rand(E, N_FF, scale=0.1),
        }
        if i > 0:  # layer 0 sets v_first; no v LoRA
            lp["v0"] = rand(E, scale=0.3)
            lp["v1"] = rand(VDIM, E)
            lp["v2"] = rand(E, VDIM, scale=0.1)
        p["layers"].append(lp)

    w = GGUFWriter(path, architecture="rwkv7")
    w.add_kv("general.name", "tiny-rwkv7-test")
    _common_header(w, "rwkv7", n_vocab, N_FF)
    w.add_kv("rwkv7.time_decay_extra_dim", DDIM)
    w.add_tensor("token_embd.weight", p["token_embd"])
    w.add_tensor("token_embd_norm.weight", p["tok_norm_w"])
    w.add_tensor("token_embd_norm.bias", p["tok_norm_b"])
    w.add_tensor("output_norm.weight", p["output_norm_w"])
    w.add_tensor("output_norm.bias", p["output_norm_b"])
    w.add_tensor("output.weight", p["output"])
    for i, lp in enumerate(p["layers"]):
        t = f"blk.{i}."
        w.add_tensor(t + "attn_norm.weight", lp["ln1_w"])
        w.add_tensor(t + "attn_norm.bias", lp["ln1_b"])
        w.add_tensor(t + "attn_norm_2.weight", lp["ln2_w"])
        w.add_tensor(t + "attn_norm_2.bias", lp["ln2_b"])
        for nm in ("r", "w", "k", "v", "a", "g"):
            w.add_tensor(t + f"time_mix_lerp_{nm}.weight",
                         lp[f"lerp_{nm}"].reshape(1, 1, E))
        w.add_tensor(t + "time_mix_w0.weight", lp["w0"])
        w.add_tensor(t + "time_mix_w1.weight", lp["w1"])
        w.add_tensor(t + "time_mix_w2.weight", lp["w2"])
        w.add_tensor(t + "time_mix_a0.weight", lp["a0"])
        w.add_tensor(t + "time_mix_a1.weight", lp["a1"])
        w.add_tensor(t + "time_mix_a2.weight", lp["a2"])
        if "v0" in lp:
            w.add_tensor(t + "time_mix_v0.weight", lp["v0"])
            w.add_tensor(t + "time_mix_v1.weight", lp["v1"])
            w.add_tensor(t + "time_mix_v2.weight", lp["v2"])
        w.add_tensor(t + "time_mix_g1.weight", lp["g1"])
        w.add_tensor(t + "time_mix_g2.weight", lp["g2"])
        w.add_tensor(t + "time_mix_k_k.weight", lp["k_k"])
        w.add_tensor(t + "time_mix_k_a.weight", lp["k_a"])
        w.add_tensor(t + "time_mix_r_k.weight", lp["r_k"])
        w.add_tensor(t + "time_mix_receptance.weight", lp["Wr"])
        w.add_tensor(t + "time_mix_key.weight", lp["Wk"])
        w.add_tensor(t + "time_mix_value.weight", lp["Wv"])
        w.add_tensor(t + "time_mix_ln.weight", lp["ln_x_w"])
        w.add_tensor(t + "time_mix_ln.bias", lp["ln_x_b"])
        w.add_tensor(t + "time_mix_output.weight", lp["Wo"])
        w.add_tensor(t + "channel_mix_lerp_k.weight",
                     lp["cm_lerp_k"].reshape(1, 1, E))
        w.add_tensor(t + "channel_mix_key.weight", lp["cm_Wk"])
        w.add_tensor(t + "channel_mix_value.weight", lp["cm_Wv"])
    w.write()
    return p


if __name__ == "__main__":
    write_tiny_rwkv6(sys.argv[1] if len(sys.argv) > 1 else "/tmp/rwkv6.gguf")
