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


def _engine_greedy(path, mesh, quantized=False, max_tokens=8,
                   kv_dtype="bfloat16", n_ctx=128, with_draft=False):
    """Run one greedy completion through a full Engine; returns token ids."""
    import jax.numpy as jnp
    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.parallel import make_shard_fn
    from llama_box_tpu.sampling import SamplerParams
    from llama_box_tpu.server import CompletionsTask, Engine, EngineConfig
    from llama_box_tpu.tokenizer import Tokenizer

    shard_fn = make_shard_fn(mesh) if mesh is not None else None
    cfg, params = load_model(path, dtype=jnp.float32, shard_fn=shard_fn,
                             quantized=quantized)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    ecfg = EngineConfig(n_slots=2, n_ctx=n_ctx, n_ubatch=32,
                        kv_dtype=kv_dtype,
                        **({"draft_max": 4, "draft_p_min": 0.0}
                           if with_draft else {}))
    eng = Engine(cfg, params, tok, ecfg, mesh=mesh,
                 draft=(cfg, params) if with_draft else None)
    eng.start()
    try:
        t = CompletionsTask(tok.encode("a b c d"),
                            SamplerParams(temp=0.0, seed=0),
                            tokenizer=tok, max_tokens=max_tokens,
                            stream=False)
        eng.submit(t)
        while True:
            kind, payload = t.result_q.get(timeout=120)
            if kind == "final":
                return payload.generated
            if kind == "error":
                raise payload
    finally:
        eng.stop()


def test_engine_on_mesh_matches_single(tmp_path):
    """Full engine (reconcile loop) over a tp=4 mesh produces identical
    greedy output to the single-device engine."""
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    single = _engine_greedy(path, None)
    sharded = _engine_greedy(path, make_mesh(MeshConfig(dp=1, tp=4)))
    assert sharded == single


@pytest.mark.parametrize("mode", ["w8a8", "grouped", "packed4"])
def test_engine_on_mesh_matches_single_quantized(tmp_path, monkeypatch, mode):
    """Quantized residency shards over the mesh (VERDICT r1 #1: the
    reference splits QUANTIZED tensors across devices, --tensor-split
    engine_param.hpp:286-293): greedy output of the sharded quantized
    engine is identical to the single-device quantized engine, for every
    residency mode (w8a8 default, grouped int8+scales, nibble-packed4)."""
    from llama_box_tpu.gguf import GGMLType

    from .fixtures.make_tiny_model import write_tiny_model

    if mode == "grouped":
        monkeypatch.setenv("LLAMA_BOX_TPU_Q4_F32SCALES", "1")
    elif mode == "packed4":
        monkeypatch.setenv("LLAMA_BOX_TPU_PACKED4", "1")
    path = str(tmp_path / "tiny_q.gguf")
    write_tiny_model(path, quant=GGMLType.Q4_K)
    single = _engine_greedy(path, None, quantized=True)
    sharded = _engine_greedy(path, make_mesh(MeshConfig(dp=1, tp=4)),
                             quantized=True)
    assert sharded == single


def test_quantized_shard_placement(tmp_path):
    """Quantized load with a shard_fn yields QTensor leaves carrying tp
    NamedShardings (no dense fallback), with w8a8 column scales sharded
    alongside their columns."""
    import jax.numpy as jnp
    from llama_box_tpu.gguf import GGMLType
    from llama_box_tpu.models import load_model
    from llama_box_tpu.ops.qmatmul import QTensor
    from llama_box_tpu.parallel import make_shard_fn

    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny_q.gguf")
    write_tiny_model(path, quant=GGMLType.Q4_K)
    mesh = make_mesh(MeshConfig(dp=1, tp=4))
    cfg, params = load_model(path, dtype=jnp.float32,
                             shard_fn=make_shard_fn(mesh), quantized=True)
    wq = params["layers"]["wq"]
    assert isinstance(wq, QTensor) and wq.sharded
    assert "tp" in str(wq.qs.sharding.spec)       # columns sharded
    assert "tp" in str(wq.scales.sharding.spec)   # w8a8 [L, out] scales too
    # row-parallel projection: byte rows sharded, per-column scales
    # replicated (vocab=287 keeps `output` dense — not 64-divisible)
    wd = params["layers"]["w_down"]
    assert isinstance(wd, QTensor) and wd.sharded
    assert "tp" in str(wd.qs.sharding.spec)


def test_sharded_moe_forward_matches(tmp_path):
    """MoE expert stacks shard over tp (not replicated) and the sharded
    forward matches the single-device forward."""
    import jax.numpy as jnp
    from llama_box_tpu.models import load_model
    from llama_box_tpu.parallel import make_shard_fn

    from .test_moe import write_tiny_moe

    path = str(tmp_path / "moe.gguf")
    write_tiny_moe(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    S, C, T = 2, 32, 6
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.vocab_size, size=(S, T)).astype(np.int32)
    positions = np.tile(np.arange(T, dtype=np.int32), (S, 1))
    seq_lens = np.full((S,), T, np.int32)
    cos, sin = make_rope(cfg, C)
    ref_logits, _ = forward(params, cfg, tokens, positions,
                            init_kv_cache(cfg, S, C, jnp.float32),
                            seq_lens, cos, sin)

    mesh = make_mesh(MeshConfig(dp=1, tp=4))
    cfg2, p_sh = load_model(path, dtype=jnp.float32,
                            shard_fn=make_shard_fn(mesh))
    exps = p_sh["layers"]["w_gate_exps"]
    assert "tp" in str(exps.sharding.spec), "expert stack must shard"
    kv_sh = shard_kv(mesh, init_kv_cache(cfg2, S, C, jnp.float32))
    out_logits, _ = forward(p_sh, cfg2, tokens, positions, kv_sh,
                            seq_lens, cos, sin)
    np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_engine_on_mesh_int8_kv(tmp_path):
    """Int8-quantized KV cache under tp sharding: greedy identity with the
    single-device int8 engine (VERDICT r1 weak #8 — the invariants must
    hold ON the mesh, not just single-device)."""
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    single = _engine_greedy(path, None, kv_dtype="int8")
    sharded = _engine_greedy(path, make_mesh(MeshConfig(dp=1, tp=4)),
                             kv_dtype="int8")
    assert sharded == single


def test_engine_on_mesh_spec_decode_and_shift(tmp_path):
    """Speculative decoding (self-draft) + context shift both running ON
    the tp mesh: greedy output identical to the single-device engine with
    the same config (shift + verify exercised under sharding)."""
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    # n_ctx 64 -> 32/slot; 40 tokens forces at least one shift
    kw = dict(max_tokens=40, n_ctx=64, with_draft=True)
    single = _engine_greedy(path, None, **kw)
    sharded = _engine_greedy(path, make_mesh(MeshConfig(dp=1, tp=4)), **kw)
    assert sharded == single
    assert len(single) >= 8  # generated across the shift (or hit EOG late)


def test_engine_on_mesh_decode_chain(tmp_path):
    """Chained decode under tp sharding: identical to the single-device
    chained engine AND to the unchained single-device engine."""
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)

    def run(mesh, chain):
        import jax.numpy as jnp
        from llama_box_tpu.gguf import GGUFFile
        from llama_box_tpu.models import load_model
        from llama_box_tpu.parallel import make_shard_fn
        from llama_box_tpu.sampling import SamplerParams
        from llama_box_tpu.server import (CompletionsTask, Engine,
                                          EngineConfig)
        from llama_box_tpu.tokenizer import Tokenizer
        shard_fn = make_shard_fn(mesh) if mesh is not None else None
        cfg, params = load_model(path, dtype=jnp.float32, shard_fn=shard_fn)
        with GGUFFile(path) as g:
            tok = Tokenizer.from_gguf(g)
        eng = Engine(cfg, params, tok,
                     EngineConfig(n_slots=2, n_ctx=128, n_ubatch=32,
                                  decode_chain=chain), mesh=mesh)
        eng.start()
        try:
            t = CompletionsTask(tok.encode("a b c d"),
                                SamplerParams(temp=0.0, seed=0),
                                tokenizer=tok, max_tokens=9, stream=False)
            eng.submit(t)
            while True:
                kind, payload = t.result_q.get(timeout=120)
                if kind == "final":
                    return payload.generated
                if kind == "error":
                    raise payload
        finally:
            eng.stop()

    base = run(None, 1)
    assert run(None, 4) == base
    assert run(make_mesh(MeshConfig(dp=1, tp=4)), 4) == base


def test_engine_on_mesh_spec_decode(tmp_path):
    """Speculative decoding (draft model + device verify chain) under
    tp=4: output identical to the single-device spec-decode engine AND
    to plain greedy (the spec-decode invariant)."""
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    plain = _engine_greedy(path, None)
    single = _engine_greedy(path, None, with_draft=True)
    sharded = _engine_greedy(path, make_mesh(MeshConfig(dp=1, tp=4)),
                             with_draft=True)
    assert single == plain
    assert sharded == single


def test_engine_on_mesh_context_shift(tmp_path):
    """Context shift (KV squash + re-rotation) under tp=4: generation
    past the slot boundary produces the same tokens as single-device."""
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    single = _engine_greedy(path, None, max_tokens=24, n_ctx=16)
    sharded = _engine_greedy(path, make_mesh(MeshConfig(dp=1, tp=4)),
                             max_tokens=24, n_ctx=16)
    assert len(single) == 24        # shifted, not truncated
    assert sharded == single
