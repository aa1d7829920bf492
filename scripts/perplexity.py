"""Perplexity harness (BASELINE.md: match llama.cpp PPL at equal GGUF
bit-width). Mirrors llama.cpp's perplexity tool semantics: slide a
ctx-sized window over the tokenized corpus, score the second half of each
window (the first half is context), report exp(mean NLL).

Usage:
  python scripts/perplexity.py -m model.gguf -f corpus.txt \
      [--ctx 512] [--stride 256] [--quantized] [--limit-windows N]
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--limit-windows", type=int, default=0)
    args = ap.parse_args(argv)

    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.models.llama import (forward, init_kv_cache,
                                            make_rope)
    from llama_box_tpu.tokenizer import Tokenizer

    cfg, params = load_model(args.model, dtype=jnp.bfloat16,
                             quantized=args.quantized)
    with GGUFFile(args.model) as g:
        tok = Tokenizer.from_gguf(g)

    text = open(args.file, encoding="utf-8", errors="replace").read()
    ids = tok.encode(text, add_special=True)
    print(f"corpus: {len(ids)} tokens; ctx={args.ctx}", file=sys.stderr)

    C = args.ctx
    cos, sin = make_rope(cfg, C)
    n_windows = max((len(ids) - 1) // C, 1)
    if args.limit_windows:
        n_windows = min(n_windows, args.limit_windows)

    nll = 0.0
    count = 0
    for w in range(n_windows):
        chunk = ids[w * C:(w + 1) * C + 1]
        if len(chunk) < 2:
            break
        inp = np.asarray(chunk[:-1], np.int32)[None, :]
        tgt = np.asarray(chunk[1:], np.int64)
        T = inp.shape[1]
        kv = init_kv_cache(cfg, 1, C, jnp.bfloat16)
        logits, _ = forward(params, cfg, jnp.asarray(inp),
                            jnp.arange(T, dtype=jnp.int32)[None, :], kv,
                            jnp.asarray([T], jnp.int32), cos, sin)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        sel = np.asarray(jnp.take_along_axis(
            logp, jnp.asarray(tgt)[:, None], axis=1))[:, 0]
        # score the second half only (first half = context), llama.cpp style
        start = T // 2
        nll -= float(sel[start:].sum())
        count += T - start
        ppl = math.exp(nll / max(count, 1))
        print(f"[{w + 1}/{n_windows}] ppl = {ppl:.4f}", file=sys.stderr)

    print(f"{math.exp(nll / max(count, 1)):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
