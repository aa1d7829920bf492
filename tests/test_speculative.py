"""Speculative decoding tests: device verify semantics + engine-level n-gram
lookup drafting (SURVEY.md §2.1 #10). The key invariant: greedy output with
drafting enabled is IDENTICAL to plain greedy decode."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.models import load_model
from llama_box_tpu.sampling import (
    SamplerParams, init_sampler_state, make_sampler_arrays, reset_slot,
    verify_impl,
)
from llama_box_tpu.server import CompletionsTask, Engine, EngineConfig
from llama_box_tpu.server.ngram import NgramCache
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_model import write_tiny_model

V = 64


def test_verify_accepts_matching_drafts():
    """Greedy rows accept drafts exactly while they equal the argmax chain."""
    B, T = 2, 4
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    argmax = logits.argmax(-1)  # [B, T]

    # row 0: drafts match argmax chain fully; row 1: mismatch at position 1
    draft = np.zeros((B, T), np.int32)
    draft[0, 1:] = argmax[0, :-1]
    draft[1, 1] = argmax[1, 0]
    draft[1, 2] = (argmax[1, 1] + 7) % V  # wrong
    draft[1, 3] = 1
    n_draft = np.array([3, 3], np.int32)

    state = init_sampler_state(B, V)
    for b in range(2):
        state = reset_slot(state, jnp.int32(b), jnp.uint32(b + 1))
    arrs = make_sampler_arrays([SamplerParams(temp=0.0)] * B)
    toks, n_em, ids, probs, _, state = verify_impl(
        jnp.asarray(logits), jnp.asarray(draft), jnp.asarray(n_draft),
        state, arrs, jnp.ones((B,), bool))
    toks = np.asarray(toks)
    n_em = np.asarray(n_em)
    # row 0: all 3 drafts accepted + bonus = 4 emitted, equal to argmax chain
    assert n_em[0] == 4
    np.testing.assert_array_equal(toks[0], argmax[0])
    # row 1: accepted 1 draft (position 1 matched), then emitted correction
    assert n_em[1] == 2
    assert toks[1, 0] == argmax[1, 0]
    assert toks[1, 1] == argmax[1, 1]  # the correction replaces the bad draft


def test_verify_plain_decode_t1():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 1, V)).astype(np.float32)
    state = init_sampler_state(2, V)
    for b in range(2):
        state = reset_slot(state, jnp.int32(b), jnp.uint32(5))
    arrs = make_sampler_arrays([SamplerParams(temp=0.0)] * 2)
    toks, n_em, _, _, _, state = verify_impl(
        jnp.asarray(logits), jnp.zeros((2, 1), jnp.int32),
        jnp.zeros((2,), jnp.int32), state, arrs, jnp.ones((2,), bool))
    assert np.asarray(n_em).tolist() == [1, 1]
    np.testing.assert_array_equal(np.asarray(toks)[:, 0],
                                  logits[:, 0].argmax(-1))


def test_ngram_cache():
    c = NgramCache(n_min=2, n_max=3)
    seq = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4]
    c.update(seq)
    assert c.draft(seq, 3) == [1, 2, 3]
    # unknown context drafts nothing
    assert c.draft([9, 9, 9], 3) == []


@pytest.fixture(scope="module")
def spec_setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return cfg, params, tok


def _run(engine, toks, n, seed=0):
    t = CompletionsTask(toks, SamplerParams(temp=0.0, seed=seed),
                        tokenizer=engine.tokenizer, max_tokens=n, stream=False)
    engine.submit(t)
    while True:
        kind, payload = t.result_q.get(timeout=120)
        if kind == "final":
            return payload
        if kind == "error":
            raise payload


def test_engine_ngram_speculative_matches_plain(spec_setup):
    cfg, params, tok = spec_setup
    plain = Engine(cfg, params, tok,
                   EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32))
    spec = Engine(cfg, params, tok,
                  EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32,
                               lookup_ngram_min=2, draft_max=4))
    plain.start()
    spec.start()
    try:
        # a repetitive prompt gives the n-gram cache something to hit
        toks = tok.encode("a b c d a b c d a b c d")
        f_plain = _run(plain, toks, 24)
        f_spec = _run(spec, toks, 24)
        assert f_spec.generated == f_plain.generated
        # with a repetitive context, at least some drafts must be accepted
        assert f_spec.n_drafted > 0
        t = f_spec.timings()
        assert t["draft_tokens"] == f_spec.n_drafted
    finally:
        plain.stop()
        spec.stop()


def test_ngram_acceptance_gating_unit():
    """Moving-acceptance gate: low-acceptance tasks stop drafting after
    two observed passes, re-probe after lookup_probe_every tokens, and a
    single bad probe re-holds; high acceptance never holds (VERDICT r3
    #5: n-gram must not cost 7x at acceptance ~0.19)."""

    class T:
        generated: list = []

    eng = Engine.__new__(Engine)   # only ecfg + the two methods used
    eng.ecfg = EngineConfig(lookup_ngram_min=2, lookup_min_accept=0.66,
                            lookup_probe_every=16)
    t = T()
    t.generated = []
    assert eng._ngram_gate(t)          # cold: may draft
    eng._ngram_observe(t, 4, 0)        # one bad pass: not yet held
    assert eng._ngram_gate(t)
    eng._ngram_observe(t, 4, 1)        # second bad pass: held
    assert not eng._ngram_gate(t)
    assert t.spec_resume_at == 16
    t.generated = [0] * 15
    assert not eng._ngram_gate(t)      # still held
    t.generated = [0] * 16
    assert eng._ngram_gate(t)          # probe pass allowed
    eng._ngram_observe(t, 4, 0)        # bad probe: ONE pass re-holds
    assert not eng._ngram_gate(t)
    t.generated = [0] * 40
    assert eng._ngram_gate(t)          # next probe
    eng._ngram_observe(t, 4, 4)        # good probe: keeps drafting
    assert eng._ngram_gate(t)
    for _ in range(8):
        eng._ngram_observe(t, 4, 4)    # high acceptance: never holds
        assert eng._ngram_gate(t)

    t2 = T()
    t2.generated = []
    eng.ecfg = EngineConfig(lookup_min_accept=0.0)
    assert eng._ngram_gate(t2)         # gating disabled
    eng._ngram_observe(t2, 4, 0)
    assert eng._ngram_gate(t2)


def test_engine_ngram_with_chain_matches_plain(spec_setup):
    """n-gram drafting + chained decode (passes with no drafts join a
    multi-step chain) must stay greedy-identical to plain decode."""
    cfg, params, tok = spec_setup
    plain = Engine(cfg, params, tok,
                   EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32,
                                decode_chain=4))
    # n_min=1 (unigram lookup): any repeated token drafts, so a 64-token
    # greedy run from a 64-token vocab is certain to draft at least once
    # even though chains emit 4 tokens between draft checks
    spec = Engine(cfg, params, tok,
                  EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32,
                               lookup_ngram_min=1, draft_max=4,
                               decode_chain=4, lookup_probe_every=8))
    plain.start()
    spec.start()
    try:
        toks = tok.encode("a b c d a b c d a b c d")
        f_plain = _run(plain, toks, 64)
        f_spec = _run(spec, toks, 64)
        assert f_spec.generated == f_plain.generated
        # the chain pipeline must not bypass drafting forever
        assert f_spec.n_drafted > 0
    finally:
        plain.stop()
        spec.stop()


def test_engine_draft_model_speculative_matches_plain(spec_setup):
    """Tiny model drafting for itself: greedy output identical to plain
    decode, with near-total draft acceptance (reference draft-model path)."""
    cfg, params, tok = spec_setup
    plain = Engine(cfg, params, tok,
                   EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32))
    spec = Engine(cfg, params, tok,
                  EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32,
                               draft_max=4, draft_p_min=0.0),
                  draft=(cfg, params))
    plain.start()
    spec.start()
    try:
        toks = tok.encode("the quick brown fox jumps")
        f_plain = _run(plain, toks, 20)
        f_spec = _run(spec, toks, 20)
        assert f_spec.generated == f_plain.generated
        assert f_spec.n_drafted > 0
        # the model drafts for itself greedily -> every draft accepted
        assert f_spec.n_draft_accepted == f_spec.n_drafted
    finally:
        plain.stop()
        spec.stop()


def test_draft_vocab_mismatch_rejected(spec_setup):
    cfg, params, tok = spec_setup
    import dataclasses
    bad_cfg = dataclasses.replace(cfg, vocab_size=cfg.vocab_size + 1)
    with pytest.raises(ValueError):
        Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=64),
               draft=(bad_cfg, params))


def test_draft_shift_keeps_acceptance(spec_setup):
    """Context shift must shift the draft KV (not reset it): after the
    shift the self-drafting model still agrees with the target (100%
    acceptance) and greedy output matches a plain engine that shifted
    identically (VERDICT r1 weak #5)."""
    cfg, params, tok = spec_setup
    plain = Engine(cfg, params, tok,
                   EngineConfig(n_slots=1, n_ctx=48, n_ubatch=16))
    spec = Engine(cfg, params, tok,
                  EngineConfig(n_slots=1, n_ctx=48, n_ubatch=16,
                               draft_max=4, draft_p_min=0.0),
                  draft=(cfg, params))
    plain.start()
    spec.start()
    try:
        toks = tok.encode("a b c d e f")
        n = 60  # runs well past the 48-token slot -> multiple shifts
        f_plain = _run(plain, toks, n)
        f_spec = _run(spec, toks, n)
        assert f_spec.generated == f_plain.generated
        assert f_plain.n_shifted >= 1 and f_spec.n_shifted >= 1
        assert f_spec.n_drafted > 0
        # a stale/garbage draft cache would reject nearly everything;
        # the correctly-shifted cache stays in near-total agreement (the
        # few rejections are bf16 re-rotation noise on near-tie logits)
        assert f_spec.n_draft_accepted >= 0.7 * f_spec.n_drafted, \
            (f_spec.n_draft_accepted, f_spec.n_drafted)
    finally:
        plain.stop()
        spec.stop()


def test_spec_chain_matches_plain_and_one_round(spec_setup):
    """The M-round device spec chain (_spec_chain: draft + verify +
    accept bookkeeping on device, one sync per M rounds) must be
    greedy-identical to plain decode AND byte-identical to the one-round
    fused pass, including seeded non-greedy sampling and n_probs."""
    cfg, params, tok = spec_setup
    outs = {}
    for rounds in (1, 3):
        eng = Engine(cfg, params, tok,
                     EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32,
                                  draft_max=4, draft_p_min=0.0,
                                  spec_rounds=rounds),
                     draft=(cfg, params))
        eng.start()
        try:
            toks = tok.encode("the quick brown fox jumps")
            f1 = _run(eng, toks, 20)
            t2 = CompletionsTask(toks, SamplerParams(temp=0.9, seed=5,
                                                     n_probs=2),
                                 tokenizer=tok, max_tokens=13,
                                 stream=False)
            eng.submit(t2)
            while True:
                kind, payload = t2.result_q.get(timeout=120)
                if kind == "final":
                    f2 = payload
                    break
                if kind == "error":
                    raise payload
            outs[rounds] = (f1.generated, f2.generated,
                            [tuple(p.top_ids) for p in f2.probs])
            if rounds > 1:
                # the chain path must actually have run: with rounds=3 a
                # fresh request's first decode pass covers >1 round
                assert f1.n_drafted > 0
        finally:
            eng.stop()
    assert outs[1] == outs[3], outs

    # greedy identity vs a no-draft engine
    plain = Engine(cfg, params, tok,
                   EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32))
    spec = Engine(cfg, params, tok,
                  EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32,
                               draft_max=4, draft_p_min=0.0,
                               spec_rounds=3),
                  draft=(cfg, params))
    plain.start()
    spec.start()
    try:
        toks = tok.encode("the quick brown fox jumps")
        f_plain = _run(plain, toks, 20)
        f_spec = _run(spec, toks, 20)
        assert f_spec.generated == f_plain.generated
        # the model drafts for itself greedily -> every draft accepted
        assert f_spec.n_draft_accepted == f_spec.n_drafted > 0
    finally:
        plain.stop()
        spec.stop()


def test_spec_chain_pipelined_identity(spec_setup):
    """Pipelined spec passes (pass N+1 dispatched off pass N's
    device-resident carry before N's transfer is consumed) must stay
    greedy-identical to plain decode, and the fill path must actually
    speculate (budget > in-flight rounds)."""
    from llama_box_tpu.server import engine as em
    cfg, params, tok = spec_setup
    plain = Engine(cfg, params, tok,
                   EngineConfig(n_slots=2, n_ctx=1024, n_ubatch=32))
    spec = Engine(cfg, params, tok,
                  EngineConfig(n_slots=2, n_ctx=1024, n_ubatch=32,
                               draft_max=4, draft_p_min=0.0,
                               spec_rounds=2, pipeline_depth=2),
                  draft=(cfg, params))
    speculated = []
    orig = em.Engine._fill_spec_queue

    def spy(self, dec, pend):
        n0 = len(self._spec_q)
        orig(self, dec, pend)
        if len(self._spec_q) > n0:
            speculated.append(len(self._spec_q) - n0)

    em.Engine._fill_spec_queue = spy
    plain.start()
    spec.start()
    try:
        toks = tok.encode("the quick brown fox jumps")
        f_plain = _run(plain, toks, 64)
        f_spec = _run(spec, toks, 64)
        assert f_spec.generated == f_plain.generated
        assert f_spec.n_draft_accepted == f_spec.n_drafted > 0
        assert speculated, "no spec pass was ever pipelined"
        # back-to-back requests reuse the machinery cleanly
        f2p = _run(plain, toks, 40)
        f2s = _run(spec, toks, 40)
        assert f2s.generated == f2p.generated
    finally:
        em.Engine._fill_spec_queue = orig
        plain.stop()
        spec.stop()


def test_spec_chain_shift_boundary(spec_setup):
    """Near capacity the spec chain must fall back so context shift fires
    at the unchained boundary; output matches a plain shifted engine."""
    cfg, params, tok = spec_setup
    plain = Engine(cfg, params, tok,
                   EngineConfig(n_slots=1, n_ctx=48, n_ubatch=16))
    spec = Engine(cfg, params, tok,
                  EngineConfig(n_slots=1, n_ctx=48, n_ubatch=16,
                               draft_max=4, draft_p_min=0.0,
                               spec_rounds=3),
                  draft=(cfg, params))
    plain.start()
    spec.start()
    try:
        toks = tok.encode("a b c d e f")
        n = 60
        f_plain = _run(plain, toks, n)
        f_spec = _run(spec, toks, n)
        assert f_spec.generated == f_plain.generated
        assert f_plain.n_shifted >= 1 and f_spec.n_shifted >= 1
    finally:
        plain.stop()
        spec.stop()


def test_fused_draft_pass_identity(spec_setup):
    """The single-transfer fused draft+verify pass (device-assembled
    verify inputs) must produce byte-identical output to the
    host-assembled fallback — forced by monkeypatching the fused gate
    off — including seeded non-greedy sampling and n_probs payloads."""
    from llama_box_tpu.server import engine as em
    cfg, params, tok = spec_setup
    outs = {}
    orig = em.Engine._decode_pass_fused_draft
    for mode in ("fused", "fallback"):
        calls = []

        def spy(self, dec, _calls=calls, _orig=orig):
            _calls.append(1)
            return _orig(self, dec)

        em.Engine._decode_pass_fused_draft = (
            spy if mode == "fused" else orig)
        eng = Engine(cfg, params, tok,
                     EngineConfig(n_slots=2, n_ctx=256, n_ubatch=32,
                                  draft_max=4, draft_p_min=0.0,
                                  # spec_rounds=1: exercise the one-round
                                  # fused pass, not the M-round chain
                                  spec_rounds=1,
                                  # draft_min=2 fails the fused gate ->
                                  # host-assembled two-sync path
                                  draft_min=2 if mode == "fallback" else 1),
                     draft=(cfg, params))
        eng.start()
        try:
            toks = tok.encode("a b c x y")
            f1 = _run(eng, toks, 18, seed=11)
            t2 = CompletionsTask(toks, SamplerParams(temp=0.9, seed=5,
                                                     n_probs=2),
                                 tokenizer=tok, max_tokens=12, stream=False)
            eng.submit(t2)
            while True:
                kind, payload = t2.result_q.get(timeout=120)
                if kind == "final":
                    f2 = payload
                    break
                if kind == "error":
                    raise payload
            outs[mode] = (f1.generated, f2.generated,
                          [tuple(p.top_ids) for p in f2.probs])
            if mode == "fused":
                assert calls, "fused path was not exercised"
        finally:
            eng.stop()
            em.Engine._decode_pass_fused_draft = orig
    assert outs["fused"] == outs["fallback"], outs
