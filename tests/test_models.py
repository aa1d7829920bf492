"""Model-level transforms (projection fusion, rope deinterleave)."""

import numpy as np


def test_deinterleave_rope_identity(tmp_path):
    """deinterleave_rope (adjacent-pair -> half-split column permutation
    of wq/wk + rope_mode flip) must produce numerically-equal logits:
    each permuted output column is the same contraction, and q.k sums
    the same per-dim products in a different order."""
    import jax.numpy as jnp

    from llama_box_tpu.models import load_model
    from llama_box_tpu.models.loader import deinterleave_rope
    from llama_box_tpu.models.llama import (forward, init_kv_cache,
                                            make_rope)
    from .fixtures.make_tiny_model import write_tiny_model

    rng = np.random.default_rng(1)
    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    assert cfg.rope_mode == "norm"
    p2, cfg2 = deinterleave_rope(params, cfg)
    assert cfg2.rope_mode == "neox"
    assert p2 is not params

    S, C, T = 2, 32, 8
    tokens = rng.integers(0, cfg.vocab_size, (S, T)).astype(np.int32)
    positions = np.tile(np.arange(T, dtype=np.int32), (S, 1))
    lens = np.full((S,), T, np.int32)
    cos, sin = make_rope(cfg, C)
    la, kva = forward(params, cfg, tokens, positions,
                      init_kv_cache(cfg, S, C, jnp.float32), lens,
                      cos, sin)
    lb, kvb = forward(p2, cfg2, tokens, positions,
                      init_kv_cache(cfg2, S, C, jnp.float32), lens,
                      cos, sin)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-5, atol=2e-5)

    # decode continuation through the permuted KV cache stays consistent
    tok2 = la[:, -1].argmax(-1).astype(jnp.int32)[:, None]
    pos2 = np.full((S, 1), T, np.int32)
    l2a, _ = forward(params, cfg, tok2, pos2, kva,
                     np.ones((S,), np.int32), cos, sin)
    l2b, _ = forward(p2, cfg2, tok2, pos2, kvb,
                     np.ones((S,), np.int32), cos, sin)
    np.testing.assert_allclose(np.asarray(l2a), np.asarray(l2b),
                               rtol=2e-5, atol=2e-5)

    # non-applicable configs pass through untouched
    import dataclasses
    p3, cfg3 = deinterleave_rope(params,
                                 dataclasses.replace(cfg,
                                                     rope_mode="neox"))
    assert p3 is params and cfg3.rope_mode == "neox"

def test_prefill_batch_contig_write_identity(tmp_path):
    """prefill_batch's contiguous per-slot window write must leave the
    LIVE cache region and logits identical to the gather-scatter path —
    including partial rows (n_valid < bucket) and idle slots (n_valid=0,
    whose prefix-cache contents must survive untouched)."""
    import jax.numpy as jnp

    from llama_box_tpu.models import load_model
    from llama_box_tpu.models.llama import (init_kv_cache, make_rope,
                                            prefill_batch_impl)
    from .fixtures.make_tiny_model import write_tiny_model

    rng = np.random.default_rng(2)
    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    S, C, T = 4, 64, 16
    cos, sin = make_rope(cfg, C)
    kv0 = init_kv_cache(cfg, S, C, jnp.float32)
    # slot 3 idle but holding prefix-cache rows that must survive
    marker = jnp.asarray(rng.normal(size=kv0.k[:, 3, :8].shape)
                         .astype(np.float32))
    kv0 = kv0._replace(k=kv0.k.at[:, 3, :8].set(marker))
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (S, T)),
                         jnp.int32)
    pos_base = jnp.asarray([0, 5, 0, 0], jnp.int32)
    n_valid = jnp.asarray([T, 10, 7, 0], jnp.int32)

    la, kva = prefill_batch_impl(params, cfg, tokens, pos_base, n_valid,
                                 kv0, cos, sin, contig_write=False)
    lb, kvb = prefill_batch_impl(params, cfg, tokens, pos_base, n_valid,
                                 kv0, cos, sin, contig_write=True)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # live regions per slot identical; idle slot fully identical
    ends = [int(pos_base[s]) + int(n_valid[s]) for s in range(S)]
    for s in range(S):
        np.testing.assert_array_equal(
            np.asarray(kva.k[:, s, :ends[s]]),
            np.asarray(kvb.k[:, s, :ends[s]]))
        np.testing.assert_array_equal(
            np.asarray(kva.v[:, s, :ends[s]]),
            np.asarray(kvb.v[:, s, :ends[s]]))
    np.testing.assert_array_equal(np.asarray(kvb.k[:, 3, :8]),
                                  np.asarray(marker))


def test_fused_projections_identity(tmp_path):
    """fuse_projections (wqkv / w_gateup) must be output-identical to the
    unfused forward — dense and quantized residencies."""
    import jax.numpy as jnp

    from llama_box_tpu.gguf import GGMLType
    from llama_box_tpu.models import load_model
    from llama_box_tpu.models.loader import fuse_projections
    from llama_box_tpu.models.llama import (forward, init_kv_cache,
                                            make_rope)
    from .fixtures.make_tiny_model import write_tiny_model

    rng = np.random.default_rng(0)
    for quant in (None, GGMLType.Q4_K):
        path = str(tmp_path / f"tiny_{quant}.gguf")
        write_tiny_model(path, **({"quant": quant} if quant else {}))
        cfg, params = load_model(path, dtype=jnp.float32,
                                 quantized=quant is not None)
        fused = fuse_projections(params, cfg)
        if quant is None:
            assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
        else:
            # the tiny fixture stores wk/wv unquantized (mixed set):
            # qkv fusion must SKIP gracefully, gate/up still fuses
            assert "wq" in fused["layers"]
        assert "w_gateup" in fused["layers"]

        S, C, T = 2, 32, 8
        tokens = rng.integers(0, cfg.vocab_size, (S, T)).astype(np.int32)
        positions = np.tile(np.arange(T, dtype=np.int32), (S, 1))
        lens = np.full((S,), T, np.int32)
        cos, sin = make_rope(cfg, C)
        la, _ = forward(params, cfg, tokens, positions,
                        init_kv_cache(cfg, S, C, jnp.float32), lens,
                        cos, sin)
        lb, _ = forward(fused, cfg, tokens, positions,
                        init_kv_cache(cfg, S, C, jnp.float32), lens,
                        cos, sin)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
