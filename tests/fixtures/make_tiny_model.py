"""Build a tiny random Llama GGUF (with a byte-fallback SPM tokenizer) for
end-to-end tests — the fake-model strategy replacing the reference's
manual testing against real GGUFs (SURVEY.md §4).

Usage: python tests/fixtures/make_tiny_model.py /tmp/tiny.gguf [--quant Q4_K]
"""

from __future__ import annotations

import sys

import numpy as np

from llama_box_tpu.gguf import GGMLType, GGUFWriter
from llama_box_tpu.tokenizer import TokenType

N_LAYERS = 2
N_EMBD = 64
N_HEADS = 4
N_KV_HEADS = 2
HEAD_DIM = 16
N_FF = 128
N_CTX = 512


def build_vocab():
    """SPM-style vocab: specials + all byte tokens + a few word pieces."""
    vocab, scores, types = [], [], []

    def add(piece, score, ttype):
        vocab.append(piece)
        scores.append(float(score))
        types.append(int(ttype))

    add("<unk>", 0.0, TokenType.UNKNOWN)
    add("<s>", 0.0, TokenType.CONTROL)
    add("</s>", 0.0, TokenType.CONTROL)
    for b in range(256):
        add(f"<0x{b:02X}>", -1000.0, TokenType.BYTE)
    words = ["▁", "▁the", "▁a", "▁hello", "▁world", "▁test", "▁is", "▁and",
             "he", "ll", "o", "th", "e", "ing", "er", "▁h", "▁he", "▁hel",
             "▁hell", "▁w", "▁wo", "▁wor", "▁worl", "▁t", "▁te", "▁tes"]
    for i, wrd in enumerate(words):
        add(wrd, -float(i + 1), TokenType.NORMAL)
    add("<|im_start|>", 0.0, TokenType.CONTROL)
    add("<|im_end|>", 0.0, TokenType.CONTROL)
    return vocab, scores, types


def write_tiny_model(path: str, quant: GGMLType = GGMLType.F32, seed: int = 0,
                     chat_template: str | None = None):
    rng = np.random.default_rng(seed)
    vocab, scores, types = build_vocab()
    n_vocab = len(vocab)

    w = GGUFWriter(path, architecture="llama")
    w.add_kv("general.name", "tiny-llama-test")
    w.add_kv("llama.block_count", N_LAYERS)
    w.add_kv("llama.context_length", N_CTX)
    w.add_kv("llama.embedding_length", N_EMBD)
    w.add_kv("llama.feed_forward_length", N_FF)
    w.add_kv("llama.attention.head_count", N_HEADS)
    w.add_kv("llama.attention.head_count_kv", N_KV_HEADS)
    w.add_kv("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("llama.rope.freq_base", 10000.0)
    w.add_kv("llama.rope.dimension_count", HEAD_DIM)
    w.add_kv("llama.vocab_size", n_vocab)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)
    if chat_template is None:
        chat_template = (
            "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n'"
            " + message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
            "{% if add_generation_prompt %}{{'<|im_start|>assistant\n'}}{% endif %}"
        )
    w.add_kv("tokenizer.chat_template", chat_template)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    # ggml layout: 2D weights stored (out_features, in_features)
    w.add_tensor("token_embd.weight", rand(n_vocab, N_EMBD), quant)
    w.add_tensor("output_norm.weight", np.ones(N_EMBD, dtype=np.float32))
    w.add_tensor("output.weight", rand(n_vocab, N_EMBD), quant)
    for i in range(N_LAYERS):
        w.add_tensor(f"blk.{i}.attn_norm.weight", 1.0 + rand(N_EMBD))
        w.add_tensor(f"blk.{i}.attn_q.weight", rand(N_HEADS * HEAD_DIM, N_EMBD), quant)
        w.add_tensor(f"blk.{i}.attn_k.weight", rand(N_KV_HEADS * HEAD_DIM, N_EMBD), quant)
        w.add_tensor(f"blk.{i}.attn_v.weight", rand(N_KV_HEADS * HEAD_DIM, N_EMBD), quant)
        w.add_tensor(f"blk.{i}.attn_output.weight", rand(N_EMBD, N_HEADS * HEAD_DIM), quant)
        w.add_tensor(f"blk.{i}.ffn_norm.weight", 1.0 + rand(N_EMBD))
        w.add_tensor(f"blk.{i}.ffn_gate.weight", rand(N_FF, N_EMBD), quant)
        w.add_tensor(f"blk.{i}.ffn_up.weight", rand(N_FF, N_EMBD), quant)
        w.add_tensor(f"blk.{i}.ffn_down.weight", rand(N_EMBD, N_FF), quant)
    w.write()
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny.gguf"
    quant = GGMLType.F32
    if "--quant" in sys.argv:
        quant = GGMLType[sys.argv[sys.argv.index("--quant") + 1]]
    write_tiny_model(out, quant)
    print(f"wrote {out}")
