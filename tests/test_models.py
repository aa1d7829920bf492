"""Model-level transforms (projection fusion)."""

import numpy as np

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
