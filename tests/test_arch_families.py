"""New decoder families (falcon/gptneox/phi2/stablelm/starcoder2/
command-r/olmo2/granite): authentic GGUF tensor sets through load ->
forward -> engine greedy (reference: llama.cpp's arch table the reference
inherits)."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models import load_model
from llama_box_tpu.sampling import SamplerParams
from llama_box_tpu.server import Engine, EngineConfig
from llama_box_tpu.server.task import CompletionsTask
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_model import build_vocab

L, E, H, HKV, D, FF = 2, 64, 4, 2, 16, 128


def _base(path, arch, rng, rope_dim=None, extra_kv=()):
    vocab, scores, types = build_vocab()
    w = GGUFWriter(path, architecture=arch)
    w.add_kv(f"{arch}.block_count", L)
    w.add_kv(f"{arch}.context_length", 256)
    w.add_kv(f"{arch}.embedding_length", E)
    w.add_kv(f"{arch}.feed_forward_length", FF)
    w.add_kv(f"{arch}.attention.head_count", H)
    w.add_kv(f"{arch}.attention.head_count_kv", HKV)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", rope_dim or D)
    w.add_kv(f"{arch}.vocab_size", len(vocab))
    for k, v in extra_kv:
        w.add_kv(f"{arch}.{k}" if not k.startswith("tokenizer") else k, v)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(scores, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array(types, np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_tensor("token_embd.weight", rand(len(vocab), E))
    return w, rand, len(vocab)


def _write_family(path, arch, seed=0):
    rng = np.random.default_rng(seed)
    ln = arch in ("falcon", "gptneox", "phi2", "stablelm", "starcoder2",
                  "command-r")
    extra = []
    if arch == "gptneox":
        extra = [("use_parallel_residual", True)]
    if arch == "command-r":
        extra = [("logit_scale", 0.5)]
    if arch == "granite":
        extra = [("embedding_scale", 2.0), ("residual_scale", 0.5),
                 ("logit_scale", 0.25), ("attention.scale", 0.125)]
    w, rand, n_vocab = _base(path, arch, rng,
                             rope_dim=(D // 2 if arch in
                                       ("phi2", "stablelm") else D),
                             extra_kv=extra)
    ones = np.ones(E, np.float32)
    w.add_tensor("output_norm.weight", ones + rand(E) * 0.1)
    if ln:
        w.add_tensor("output_norm.bias", rand(E))
    w.add_tensor("output.weight", rand(n_vocab, E))
    if arch == "phi2":
        w.add_tensor("output.bias", rand(n_vocab))

    qd, kvd = H * D, HKV * D
    fused_qkv = arch in ("falcon", "gptneox", "phi2")
    gated = arch not in ("falcon", "gptneox", "phi2", "starcoder2")
    biases = arch in ("gptneox", "phi2", "starcoder2", "stablelm")
    for i in range(L):
        p = f"blk.{i}."
        if arch != "olmo2":
            w.add_tensor(p + "attn_norm.weight", ones + rand(E) * 0.1)
            if ln:
                w.add_tensor(p + "attn_norm.bias", rand(E))
        if arch not in ("falcon", "phi2", "command-r", "olmo2"):
            # parallel single-norm archs reuse attn_norm for the FFN
            pass
        if arch in ("gptneox", "stablelm", "starcoder2", "granite",
                    "olmo2"):
            w.add_tensor(p + "ffn_norm.weight", ones + rand(E) * 0.1)
            if ln:
                w.add_tensor(p + "ffn_norm.bias", rand(E))
        if arch == "olmo2":
            w.add_tensor(p + "post_attention_norm.weight",
                         ones + rand(E) * 0.1)
            w.add_tensor(p + "post_ffw_norm.weight", ones + rand(E) * 0.1)
            w.add_tensor(p + "attn_q_norm.weight",
                         np.ones(qd, np.float32) + rand(qd) * 0.1)
            w.add_tensor(p + "attn_k_norm.weight",
                         np.ones(kvd, np.float32) + rand(kvd) * 0.1)
        if fused_qkv:
            w.add_tensor(p + "attn_qkv.weight", rand(qd + 2 * kvd, E))
            if biases:
                w.add_tensor(p + "attn_qkv.bias", rand(qd + 2 * kvd))
        else:
            w.add_tensor(p + "attn_q.weight", rand(qd, E))
            w.add_tensor(p + "attn_k.weight", rand(kvd, E))
            w.add_tensor(p + "attn_v.weight", rand(kvd, E))
            if biases:
                w.add_tensor(p + "attn_q.bias", rand(qd))
                w.add_tensor(p + "attn_k.bias", rand(kvd))
                w.add_tensor(p + "attn_v.bias", rand(kvd))
        w.add_tensor(p + "attn_output.weight", rand(E, qd))
        if biases:
            w.add_tensor(p + "attn_output.bias", rand(E))
        if gated:
            w.add_tensor(p + "ffn_gate.weight", rand(FF, E))
        w.add_tensor(p + "ffn_up.weight", rand(FF, E))
        w.add_tensor(p + "ffn_down.weight", rand(E, FF))
        if biases:
            w.add_tensor(p + "ffn_up.bias", rand(FF))
            w.add_tensor(p + "ffn_down.bias", rand(E))
    w.write()


ARCHS = ["falcon", "gptneox", "phi2", "stablelm", "starcoder2",
         "command-r", "olmo2", "granite"]


@pytest.mark.parametrize("arch", ARCHS)
def test_family_serves(tmp_path, arch):
    path = str(tmp_path / f"{arch}.gguf")
    _write_family(path, arch)
    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.arch == arch

    # config rules
    if arch in ("falcon", "gptneox", "phi2", "stablelm", "starcoder2",
                "command-r"):
        assert cfg.norm_style == "ln"
    else:
        assert cfg.norm_style == "rms"
    if arch in ("falcon", "phi2", "command-r", "gptneox"):
        assert cfg.parallel_residual
    if arch in ("falcon", "gptneox", "phi2", "starcoder2"):
        assert not cfg.ffn_gated
    if arch == "granite":
        assert cfg.logit_scale == 0.25 and cfg.residual_scale == 0.5 \
            and cfg.attn_scale == 0.125 and cfg.embd_scale == 2.0
    if arch == "command-r":
        assert cfg.logit_scale == 0.5
    if arch in ("phi2", "stablelm"):
        assert cfg.rope_dim == D // 2     # partial rotary
    if arch == "olmo2":
        assert "attn_norm" not in params["layers"]
        assert "attn_post_norm" in params["layers"]

    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=64, decode_chain=4))
    eng.start()
    try:
        def run(toks, n=6):
            t = CompletionsTask(list(toks), SamplerParams(temp=0.0, seed=1),
                                tokenizer=tok, max_tokens=n, stream=False)
            eng.submit(t)
            while True:
                kind, payload = t.result_q.get(timeout=180)
                if kind == "final":
                    return payload.generated
                if kind == "error":
                    raise payload

        out = run([1, 5, 9, 12])
        assert 1 <= len(out) <= 6     # greedy may hit EOG on random weights
        assert all(0 <= t < cfg.vocab_size for t in out)
        assert run([1, 5, 9, 12]) == out    # greedy determinism
    finally:
        eng.stop()


def test_granite_scales_change_logits(tmp_path):
    """The granite multipliers must actually act on the computation."""
    from llama_box_tpu.models.llama import (forward, init_kv_cache,
                                            make_rope)
    import dataclasses

    path = str(tmp_path / "granite.gguf")
    _write_family(path, "granite")
    cfg, params = load_model(path, dtype=jnp.float32)
    toks = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    lens = jnp.full((1,), 4, jnp.int32)
    cos, sin = make_rope(cfg, 32)

    def logits(c):
        kv = init_kv_cache(c, 1, 32, jnp.float32)
        lg, _ = forward(params, c, toks, pos, kv, lens, cos, sin)
        return np.asarray(lg)

    base = logits(cfg)
    neutral = dataclasses.replace(cfg, logit_scale=1.0)
    np.testing.assert_allclose(base, 0.25 * logits(neutral), rtol=1e-5)
    nores = dataclasses.replace(cfg, residual_scale=1.0)
    assert not np.allclose(base, logits(nores))
