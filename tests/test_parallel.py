"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (the fake
backend strategy of SURVEY.md §4): sharded decode == unsharded decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_box_tpu.models.config import ModelConfig
from llama_box_tpu.models.llama import (
    forward, forward_impl, init_kv_cache, make_rope,
)
from llama_box_tpu.parallel import (
    MeshConfig, make_mesh, parse_mesh_spec, shard_kv, shard_params,
)


def make_random_model(rng, n_layers=2, n_heads=8, n_kv_heads=4, head_dim=16,
                      n_ff=128, vocab=96):
    E = n_heads * head_dim
    cfg = ModelConfig(arch="llama", n_layers=n_layers, n_embd=E,
                      n_heads=n_heads, n_kv_heads=n_kv_heads,
                      head_dim=head_dim, n_ff=n_ff, vocab_size=vocab,
                      rope_dim=head_dim)
    L = n_layers

    def r(*shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape, scale=scale), jnp.float32)

    params = {
        "tok_embd": r(vocab, E),
        "output_norm": jnp.ones((E,), jnp.float32),
        "output": r(E, vocab),
        "layers": {
            "attn_norm": jnp.ones((L, E), jnp.float32),
            "wq": r(L, E, n_heads * head_dim),
            "wk": r(L, E, n_kv_heads * head_dim),
            "wv": r(L, E, n_kv_heads * head_dim),
            "wo": r(L, n_heads * head_dim, E),
            "ffn_norm": jnp.ones((L, E), jnp.float32),
            "w_gate": r(L, E, n_ff),
            "w_up": r(L, E, n_ff),
            "w_down": r(L, n_ff, E),
        },
    }
    return cfg, params


@pytest.mark.parametrize("mc", [MeshConfig(dp=1, tp=4), MeshConfig(dp=2, tp=4),
                                MeshConfig(dp=2, tp=2)])
def test_sharded_forward_matches_unsharded(mc):
    assert len(jax.devices()) >= mc.dp * mc.tp
    rng = np.random.default_rng(0)
    cfg, params = make_random_model(rng)
    S, C, T = 4, 32, 8
    tokens = rng.integers(0, cfg.vocab_size, size=(S, T)).astype(np.int32)
    positions = np.tile(np.arange(T, dtype=np.int32), (S, 1))
    seq_lens = np.full((S,), T, np.int32)
    cos, sin = make_rope(cfg, C)

    kv0 = init_kv_cache(cfg, S, C, jnp.float32)
    ref_logits, ref_kv = forward(params, cfg, tokens, positions, kv0,
                                 seq_lens, cos, sin)
    ref = np.asarray(ref_logits)

    mesh = make_mesh(mc)
    p_sh = shard_params(mesh, params)
    kv_sh = shard_kv(mesh, init_kv_cache(cfg, S, C, jnp.float32))
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        fwd = jax.jit(forward_impl, static_argnames=("cfg",))
        out_logits, out_kv = fwd(p_sh, cfg, jnp.asarray(tokens),
                                 jnp.asarray(positions), kv_sh,
                                 jnp.asarray(seq_lens), cos, sin)
    np.testing.assert_allclose(np.asarray(out_logits), ref, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_kv.k), np.asarray(ref_kv.k),
                               rtol=1e-4, atol=1e-4)


def test_parse_mesh_spec():
    assert parse_mesh_spec(None, 8) == MeshConfig(dp=1, tp=8)
    assert parse_mesh_spec("tp=4", 8) == MeshConfig(dp=1, tp=4)
    assert parse_mesh_spec("dp=2,tp=4", 8) == MeshConfig(dp=2, tp=4)
    assert parse_mesh_spec("dp=2", 8) == MeshConfig(dp=2, tp=4)
    with pytest.raises(ValueError):
        parse_mesh_spec("dp=4,tp=4", 8)


def test_engine_on_mesh_matches_single(tmp_path):
    """Full engine (reconcile loop) over a tp=4 mesh produces identical
    greedy output to the single-device engine."""
    import jax.numpy as jnp
    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.parallel import make_shard_fn
    from llama_box_tpu.sampling import SamplerParams
    from llama_box_tpu.server import CompletionsTask, Engine, EngineConfig
    from llama_box_tpu.tokenizer import Tokenizer

    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)

    def run(mesh):
        shard_fn = make_shard_fn(mesh) if mesh is not None else None
        cfg, params = load_model(path, dtype=jnp.float32, shard_fn=shard_fn)
        with GGUFFile(path) as g:
            tok = Tokenizer.from_gguf(g)
        eng = Engine(cfg, params, tok,
                     EngineConfig(n_slots=2, n_ctx=128, n_ubatch=32),
                     mesh=mesh)
        eng.start()
        try:
            t = CompletionsTask(tok.encode("a b c d"),
                                SamplerParams(temp=0.0, seed=0),
                                tokenizer=tok, max_tokens=8, stream=False)
            eng.submit(t)
            while True:
                kind, payload = t.result_q.get(timeout=120)
                if kind == "final":
                    return payload.generated
                if kind == "error":
                    raise payload
        finally:
            eng.stop()

    single = run(None)
    mesh = make_mesh(MeshConfig(dp=1, tp=4))
    sharded = run(mesh)
    assert sharded == single
