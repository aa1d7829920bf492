"""Control vectors + new sampler knobs (dynatemp/top-n-sigma/DRY extras)."""

import numpy as np
import jax.numpy as jnp
import pytest

from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models.control_vector import combine_control_vectors, \
    load_control_vector


def _write_cvec(path, n_layers, n_embd, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(str(path), architecture="controlvector")
    vecs = {}
    for li in range(n_layers):
        v = rng.standard_normal(n_embd).astype(np.float32) * scale
        w.add_tensor(f"direction.{li + 1}", v)
        vecs[li] = v
    w.write()
    return vecs


def test_load_and_combine(tmp_path):
    v1 = _write_cvec(tmp_path / "a.gguf", 4, 8, seed=1)
    v2 = _write_cvec(tmp_path / "b.gguf", 4, 8, seed=2)
    cv = combine_control_vectors(
        [(str(tmp_path / "a.gguf"), 1.0), (str(tmp_path / "b.gguf"), -0.5)],
        n_layers=4, n_embd=8)
    for li in range(4):
        np.testing.assert_allclose(cv[li], v1[li] - 0.5 * v2[li], rtol=1e-6)


def test_layer_range(tmp_path):
    _write_cvec(tmp_path / "a.gguf", 6, 8)
    cv = combine_control_vectors([(str(tmp_path / "a.gguf"), 1.0)],
                                 n_layers=6, n_embd=8, layer_range=(2, 4))
    assert np.all(cv[0] == 0) and np.all(cv[4] == 0) and np.all(cv[5] == 0)
    assert np.any(cv[1] != 0) and np.any(cv[3] != 0)


def test_dim_mismatch_raises(tmp_path):
    _write_cvec(tmp_path / "a.gguf", 2, 8)
    with pytest.raises(ValueError):
        load_control_vector(str(tmp_path / "a.gguf"), 2, 16)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from llama_box_tpu.models import load_model
    from tests.fixtures.make_tiny_model import write_tiny_model
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    return cfg, params


def test_cvec_steers_forward(tiny_model):
    """forward with params['cvec'] differs from without; a zero cvec is a
    no-op (same compiled program shape, neutral steering)."""
    from llama_box_tpu.models.llama import forward_impl, init_kv_cache, \
        make_rope
    cfg, params = tiny_model
    kv = init_kv_cache(cfg, 1, 32, jnp.float32)
    cos, sin = make_rope(cfg, 32)
    toks = jnp.asarray([[3, 5, 7, 2]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)

    logits0, _ = forward_impl(params, cfg, toks, pos, kv, lens, cos, sin)
    p2 = dict(params)
    p2["cvec"] = jnp.full((cfg.n_layers, cfg.n_embd), 0.05, jnp.float32)
    logits1, _ = forward_impl(p2, cfg, toks, pos, kv, lens, cos, sin)
    assert not np.allclose(np.asarray(logits0), np.asarray(logits1))

    p3 = dict(params)
    p3["cvec"] = jnp.zeros((cfg.n_layers, cfg.n_embd), jnp.float32)
    logits2, _ = forward_impl(p3, cfg, toks, pos, kv, lens, cos, sin)
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits2),
                               atol=1e-5)


def test_top_n_sigma_filters():
    from llama_box_tpu.sampling import SamplerParams, init_sampler_state, \
        make_sampler_arrays, sample_impl
    V = 128
    logits = np.full((1, V), -10.0, np.float32)
    logits[0, :4] = [10.0, 9.8, 9.6, -5.0]
    state = init_sampler_state(1, V)
    arrs = make_sampler_arrays([SamplerParams(
        temp=1.0, top_k=0, top_p=1.0, min_p=0.0, top_n_sigma=1.0,
        penalty_repeat=1.0)])
    picks = set()
    for _ in range(20):
        tok, _, _, _, state = sample_impl(jnp.asarray(logits), state, arrs,
                                       jnp.asarray([True]))
        picks.add(int(tok[0]))
    # with n=1 sigma over the candidate set, only the tight top cluster
    # survives — token 3 (-5) and the -10 mass never get sampled
    assert picks <= {0, 1, 2}


def test_dynatemp_greedy_when_peaked():
    """dynatemp: a near-delta distribution drives temp toward t_min."""
    from llama_box_tpu.sampling import SamplerParams, init_sampler_state, \
        make_sampler_arrays, sample_impl
    V = 64
    logits = np.zeros((1, V), np.float32)
    logits[0, 7] = 50.0     # essentially all mass on one token
    state = init_sampler_state(1, V)
    arrs = make_sampler_arrays([SamplerParams(
        temp=1.0, dynatemp_range=1.0, top_k=0, top_p=1.0, min_p=0.0,
        penalty_repeat=1.0)])
    for _ in range(10):
        tok, _, _, _, state = sample_impl(jnp.asarray(logits), state, arrs,
                                       jnp.asarray([True]))
        assert int(tok[0]) == 7


def test_dry_sequence_breaker_resets_window():
    from llama_box_tpu.sampling import HostSampler, SamplerParams

    class FakeTok:
        eos_id = 0

        def is_eog(self, t):
            return t == 0

    sp_nobrk = SamplerParams(temp=0.0, dry_multiplier=2.0,
                             dry_allowed_length=2,
                             dry_sequence_breakers=())
    hs = HostSampler(sp_nobrk, None, FakeTok())
    for t in [5, 6, 7, 5, 6]:
        hs.accept(t)
    logits = np.zeros(16, np.float32)
    before = logits[7]
    hs._apply_dry(logits)
    assert logits[7] < before  # 7 would extend the repeated [5, 6]
