"""Device sampling chain vs numpy reference of the llama.cpp sampler formulas
(penalties/top-k/top-p/min-p/typical/xtc/temp; SURVEY.md §2.1 #14)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama_box_tpu.sampling import (
    SamplerParams, init_sampler_state, make_sampler_arrays, push_tokens,
    reset_slot, sample, N_CAND,
)

V = 97  # < N_CAND so the candidate set is exact


def np_chain_mask(logits, p: SamplerParams):
    """Allowed-token set after the filter chain, computed the llama.cpp way."""
    order = np.argsort(-logits, kind="stable")
    svals = logits[order]
    K = len(svals)
    keep = np.ones(K, bool)
    if p.top_k > 0:
        keep[p.top_k:] = False

    def probs(keep):
        z = np.where(keep, svals, -np.inf)
        z = z - z.max()
        e = np.exp(z) * keep
        return e / e.sum()

    pr = probs(keep)
    cum = np.cumsum(pr)
    keep &= (cum - pr) < p.top_p
    keep[0] = True
    pr = probs(np.ones(K, bool) * keep)
    keep &= (pr >= p.min_p * pr.max()) | (np.arange(K) == 0)
    if p.typ_p < 1.0:
        pr = probs(keep)
        nlp = -np.log(pr + 1e-30)
        H = np.sum(pr * nlp)
        shift = np.where(keep, np.abs(nlp - H), np.inf)
        t_order = np.argsort(shift, kind="stable")
        csum = np.cumsum(pr[t_order])
        k2 = (csum - pr[t_order]) < p.typ_p
        k2[0] = True
        keep_t = np.zeros(K, bool)
        keep_t[t_order[k2]] = True
        keep &= keep_t
    allowed = set(order[np.nonzero(keep)[0]].tolist())
    return allowed


def run_sample(logits_rows, params, prev_tokens=None, steps=1):
    B = len(params)
    state = init_sampler_state(B, V)
    for b, p in enumerate(params):
        state = reset_slot(state, jnp.int32(b), jnp.uint32(p.seed))
        if prev_tokens and prev_tokens[b]:
            toks = jnp.asarray(prev_tokens[b], jnp.int32)
            state = push_tokens(state, jnp.int32(b), toks,
                                jnp.int32(len(prev_tokens[b])),
                                jnp.int32(min(p.penalty_last_n, 256)))
    arrs = make_sampler_arrays(params)
    active = jnp.ones((B,), bool)
    outs = []
    for _ in range(steps):
        tok, ids, probs, _, state = sample(
            jnp.asarray(logits_rows, jnp.float32), state, arrs, active)
        outs.append(np.asarray(tok))
    return outs, np.asarray(ids), np.asarray(probs)


def test_greedy_is_argmax():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, V)).astype(np.float32)
    params = [SamplerParams(temp=0.0, seed=1)] * 3
    (tok,), _, _ = run_sample(logits, params)
    np.testing.assert_array_equal(tok, logits.argmax(-1))


def test_tok_prob_is_sampled_tokens_own_probability():
    """The 4th return of sample_impl carries the sampled token's reported
    probability even when the token falls outside the top-N_PROBS view
    (logprobs rendering, ADVICE r1)."""
    from llama_box_tpu.sampling import (init_sampler_state,
                                        make_sampler_arrays, sample_impl)
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, V)).astype(np.float32)
    # greedy row: tok_prob must equal top_probs[0]
    params = [SamplerParams(temp=0.0, seed=1),
              SamplerParams(temp=2.0, top_k=0, top_p=1.0, min_p=0.0, seed=9)]
    state = init_sampler_state(2, V)
    arrs = make_sampler_arrays(params)
    tok, ids, probs, tokp, _ = sample_impl(
        jnp.asarray(logits), state, arrs, jnp.ones((2,), bool))
    tok, ids, probs, tokp = (np.asarray(tok), np.asarray(ids),
                             np.asarray(probs), np.asarray(tokp))
    assert np.isclose(tokp[0], probs[0, 0])
    # sampled row: if the token is in the top view, probs must agree; either
    # way the reported prob is a real probability
    if tok[1] in ids[1]:
        assert np.isclose(tokp[1], probs[1, list(ids[1]).index(tok[1])],
                          atol=1e-6)
    assert 0.0 < tokp[1] <= 1.0


def test_same_seed_reproducible_and_diff_seed_diverges():
    rng = np.random.default_rng(1)
    logits = np.tile(rng.normal(size=(1, V)), (2, 1)).astype(np.float32)
    p = SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0)
    params = [
        SamplerParams(**{**p.__dict__, "seed": 42}),
        SamplerParams(**{**p.__dict__, "seed": 42}),
    ]
    out1, _, _ = run_sample(logits, params, steps=5)
    seq_a = [o[0] for o in out1]
    seq_b = [o[1] for o in out1]
    assert seq_a == seq_b  # identical seeds, identical rows -> identical draws
    params[1] = SamplerParams(**{**p.__dict__, "seed": 7})
    out2, _, _ = run_sample(logits, params, steps=16)
    assert any(o[0] != o[1] for o in out2)


def test_filters_restrict_support():
    """Sampled tokens always come from the numpy-reference allowed set."""
    rng = np.random.default_rng(2)
    logits = rng.normal(scale=3.0, size=(4, V)).astype(np.float32)
    params = [
        SamplerParams(temp=1.5, top_k=5, top_p=1.0, min_p=0.0, seed=3),
        SamplerParams(temp=1.0, top_k=0, top_p=0.4, min_p=0.0, seed=4),
        SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.3, seed=5),
        SamplerParams(temp=0.7, top_k=0, top_p=1.0, min_p=0.0, typ_p=0.5, seed=6),
    ]
    allowed = [np_chain_mask(logits[b], params[b]) for b in range(4)]
    for trial in range(20):
        outs, _, _ = run_sample(logits, [
            SamplerParams(**{**params[b].__dict__, "seed": 100 + trial * 4 + b})
            for b in range(4)], steps=1)
        for b in range(4):
            assert int(outs[0][b]) in allowed[b], (b, int(outs[0][b]))


def test_repeat_penalty_discourages_repeats():
    logits = np.zeros((1, V), np.float32)
    logits[0, 10] = 5.0
    logits[0, 11] = 4.9
    # token 10 heavily repeated in the window; strong penalty should flip argmax
    params = [SamplerParams(temp=0.0, penalty_repeat=1.5, penalty_last_n=64)]
    (tok,), _, _ = run_sample(logits, params, prev_tokens=[[10, 10, 10]])
    assert tok[0] == 11


def test_penalty_window_eviction():
    logits = np.zeros((1, V), np.float32)
    logits[0, 10] = 5.0
    logits[0, 11] = 4.9
    # last_n=2: the early 10s fall out of the window; only {3,4} are counted
    params = [SamplerParams(temp=0.0, penalty_repeat=1.5, penalty_last_n=2)]
    (tok,), _, _ = run_sample(logits, params, prev_tokens=[[10, 10, 3, 4]])
    assert tok[0] == 10


def test_frequency_and_presence_penalties():
    logits = np.zeros((1, V), np.float32)
    logits[0, 5] = 1.0
    logits[0, 6] = 0.9
    params = [SamplerParams(temp=0.0, penalty_freq=0.2, penalty_present=0.0,
                            penalty_last_n=64)]
    (tok,), _, _ = run_sample(logits, params, prev_tokens=[[5]])
    assert tok[0] == 6  # 1.0 - 0.2 < 0.9


def test_logit_bias_and_ignore_eos():
    logits = np.zeros((2, V), np.float32)
    logits[:, 0] = 3.0
    params = [
        SamplerParams(temp=0.0, logit_bias={0: -100.0, 7: 10.0}),
        SamplerParams(temp=0.0),
    ]
    (tok,), _, _ = run_sample(logits, params)
    assert tok[0] == 7 and tok[1] == 0


def test_xtc_drops_high_prob_tokens():
    logits = np.zeros((1, V), np.float32)
    logits[0, 1] = 6.0
    logits[0, 2] = 5.8   # both well above xtc threshold
    params = [SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0,
                            xtc_probability=1.0, xtc_threshold=0.10, seed=9)]
    for trial in range(10):
        outs, _, _ = run_sample(
            logits, [SamplerParams(**{**params[0].__dict__, "seed": trial})])
        assert int(outs[0][0]) != 1  # the higher-prob above-threshold token dies


def test_top_probs_output():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(1, V)).astype(np.float32)
    params = [SamplerParams(temp=0.0, n_probs=5)]
    _, ids, probs = run_sample(logits, params)
    order = np.argsort(-logits[0])
    np.testing.assert_array_equal(ids[0][:5], order[:5])
    assert probs[0][0] >= probs[0][1] >= probs[0][2]
    np_sm = np.exp(logits[0] - logits[0].max())
    np_sm /= np_sm.sum()
    np.testing.assert_allclose(probs[0][:5], np_sm[order[:5]], rtol=2e-3)


def test_mirostat_host_sampler():
    from llama_box_tpu.sampling import HostSampler

    class FakeTok:
        eog_ids = set()
        def is_eog(self, t): return False
        def is_control(self, t): return False
        def token_bytes(self, t, render_special=False): return b"x"

    sp = SamplerParams(temp=1.0, seed=3, mirostat=2, mirostat_tau=3.0)
    assert sp.needs_host_sampler
    hs = HostSampler(sp, None, FakeTok())
    rng = np.random.default_rng(0)
    logits = rng.normal(scale=2.0, size=V).astype(np.float32)
    mus = []
    for _ in range(10):
        t, _, _, _ = hs.sample(logits)
        hs.accept(t)
        mus.append(hs._mu)
        assert 0 <= t < V
    assert mus[-1] != 2.0 * 3.0  # mu adapted


def test_dry_penalizes_repeats():
    from llama_box_tpu.sampling import HostSampler

    class FakeTok:
        eog_ids = set()
        def is_eog(self, t): return False
        def is_control(self, t): return False
        def token_bytes(self, t, render_special=False): return b"x"

    sp = SamplerParams(temp=0.0, dry_multiplier=5.0, dry_allowed_length=2)
    hs = HostSampler(sp, None, FakeTok())
    # history: 1 2 3 1 2 -> token 3 would extend the repeat; penalize it
    for t in [1, 2, 3, 1, 2]:
        hs.accept(t)
    logits = np.zeros(V, np.float32)
    logits[3] = 1.0
    logits[4] = 0.9
    t, _, _, _ = hs.sample(logits)
    assert t == 4  # 3 was penalized below 4


def test_bucketed_candidates_odd_vocab(monkeypatch):
    """The TPU bucketed top-2 path must handle kcap == V and odd vocab
    sizes (regression: k=287 on [4,286] top_k crash found by a live
    server drive)."""
    import unittest.mock as um

    import llama_box_tpu.sampling as S
    for V in (287, 101, 3, 512):
        lg = jnp.asarray(np.random.default_rng(0).normal(size=(4, V)) * 3,
                         jnp.float32)
        kcap = min(512, V)
        with um.patch.object(S.jax, "default_backend", lambda: "tpu"):
            bv, bi = S._top_candidates(lg, kcap)
        ev, ei = jax.lax.top_k(lg, kcap)
        assert bv.shape == (4, kcap) and bi.shape == (4, kcap)
        np.testing.assert_array_equal(np.asarray(bi[:, 0]),
                                      np.asarray(ei[:, 0]))  # greedy exact


def test_samplers_selection_and_order():
    """`samplers` parity (reference httpserver.hpp:162-172): selection
    neutralizes unlisted knobs; only a non-canonical order needs the host
    path; from_chars parses the single-char spec."""
    from llama_box_tpu.sampling import (restrict_to_samplers,
                                        sampler_types_from_chars,
                                        sampler_types_from_names,
                                        samplers_order_canonical)

    assert sampler_types_from_chars("kpt") == ("top_k", "top_p",
                                               "temperature")
    assert sampler_types_from_names(["typical", "temp", "nope", "min-p"]) \
        == ("typ_p", "temperature", "min_p")

    # canonical subset: stays on the device chain
    sp = SamplerParams(samplers=("top_k", "temperature"), top_p=0.4,
                       min_p=0.3, penalty_repeat=1.5, temp=0.7)
    assert samplers_order_canonical(sp.samplers)
    assert not sp.needs_host_sampler
    r = restrict_to_samplers(sp)
    assert r.top_p == 1.0 and r.min_p == 0.0 and r.penalty_repeat == 1.0
    assert r.top_k == sp.top_k and r.temp == 0.7

    # reordered chain routes host-side
    sp2 = SamplerParams(samplers=("temperature", "top_k"), temp=0.7)
    assert not samplers_order_canonical(sp2.samplers)
    assert sp2.needs_host_sampler

    # temperature excluded -> no scaling (temp 1.0), greedy preserved
    r3 = restrict_to_samplers(SamplerParams(samplers=("top_k",), temp=0.6))
    assert r3.temp == 1.0
    r4 = restrict_to_samplers(SamplerParams(samplers=("top_k",), temp=0.0))
    assert r4.temp == 0.0


def test_host_sampler_honors_order():
    """temperature-before-top_p keeps more mass than the canonical order
    (scaled logits flatten the distribution before the cutoff)."""
    from llama_box_tpu.sampling import HostSampler

    class FakeTok:
        eog_ids = set()
        def is_eog(self, t): return False
        def is_control(self, t): return False
        def token_bytes(self, t, render_special=False): return b"x"

    logits = np.zeros(V, np.float32)
    logits[:4] = [5.0, 4.0, 3.0, 2.0]

    def kept_tokens(samplers):
        sp = SamplerParams(samplers=samplers, temp=4.0, top_p=0.9,
                           top_k=0, min_p=0.0, penalty_repeat=1.0, seed=1)
        hs = HostSampler(sp, None, FakeTok())
        picks = set()
        for _ in range(300):
            t, _, _, _ = hs.sample(logits)
            picks.add(t)
        return picks

    canonical = kept_tokens(("top_p", "temperature"))
    reordered = kept_tokens(("temperature", "top_p"))
    # temp=4 first flattens: top_p=0.9 then keeps far more tokens
    assert len(reordered) > len(canonical)


def test_plain_fast_path_bit_identical():
    """extras=False (the serving fast path for `plain` batches) must be
    bit-identical to the full chain when every slot's params are plain —
    tokens, logprob views, and the advanced state (except the untouched
    penalty ring)."""
    from llama_box_tpu.sampling import sample_impl
    rng = np.random.default_rng(11)
    params = [SamplerParams(seed=5, temp=0.9, top_k=20, top_p=0.9,
                            min_p=0.02),
              SamplerParams(seed=7, temp=0.0),          # greedy row
              SamplerParams(seed=9, temp=1.3, top_k=0, top_p=1.0,
                            min_p=0.0)]
    assert all(p.plain for p in params)
    B = len(params)
    logits = jnp.asarray(rng.standard_normal((B, V)) * 3.0, jnp.float32)
    arrs = make_sampler_arrays(params)
    active = jnp.ones((B,), bool)

    def run(extras):
        state = init_sampler_state(B, V)
        for b, p in enumerate(params):
            state = reset_slot(state, jnp.int32(b), jnp.uint32(p.seed))
        outs = []
        for _ in range(4):
            tok, ids, probs, tokp, state = jax.jit(
                sample_impl, static_argnames=("extras",),
            )(logits, state, arrs, active, extras=extras)
            outs.append((np.asarray(tok), np.asarray(ids),
                         np.asarray(probs), np.asarray(tokp)))
        return outs, state

    full, st_full = run(True)
    fast, st_fast = run(False)
    for (t1, i1, p1, q1), (t2, i2, p2, q2) in zip(full, fast):
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(q1, q2)
    np.testing.assert_array_equal(np.asarray(st_full.step),
                                  np.asarray(st_fast.step))


def test_plain_property_matrix():
    assert SamplerParams().plain
    assert not SamplerParams(penalty_repeat=1.1).plain
    assert not SamplerParams(penalty_freq=0.2).plain
    assert not SamplerParams(logit_bias={3: 1.0}).plain
    assert not SamplerParams(typ_p=0.9).plain
    assert not SamplerParams(xtc_probability=0.5).plain
    assert not SamplerParams(top_n_sigma=2.0).plain
    assert not SamplerParams(dynatemp_range=0.4).plain
