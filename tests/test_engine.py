"""Scheduler/engine simulation tests (SURVEY.md §4: the test pyramid the
reference lacks): continuous batching, prefix cache, context shift, stop
words, budgets, embeddings — all on the tiny CPU model."""

import queue
import time

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf import GGUFFile
from llama_box_tpu.models import load_model
from llama_box_tpu.sampling import SamplerParams
from llama_box_tpu.server import (
    CompletionsTask, EmbeddingsTask, Engine, EngineConfig,
)
from llama_box_tpu.tokenizer import Tokenizer

from .fixtures.make_tiny_model import write_tiny_model


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=64, n_ubatch=16))
    eng.start()
    yield eng
    eng.stop()


def greedy(seed=0, **kw):
    return SamplerParams(temp=0.0, seed=seed, **kw)


def run_task(engine, task, timeout=60):
    engine.submit(task)
    deltas = []
    while True:
        kind, payload = task.result_q.get(timeout=timeout)
        if kind == "delta":
            deltas.append(payload)
        elif kind == "final":
            return payload, deltas
        elif kind == "error":
            raise payload


def test_basic_completion(engine):
    toks = engine.tokenizer.encode("a b c")
    task = CompletionsTask(toks, greedy(), tokenizer=engine.tokenizer,
                           max_tokens=8, stream=True)
    final, deltas = run_task(engine, task)
    assert len(final.generated) == 8
    assert final.finish_reason in ("stop", "length")
    assert "".join(d["text"] for d in deltas) == final.text
    t = final.timings()
    assert t["prompt_tokens"] == len(toks)
    assert t["completion_tokens"] == 8
    assert t["time_to_first_token_ms"] > 0


def test_greedy_determinism_and_prefix_cache(engine):
    toks = engine.tokenizer.encode("the quick brown fox")
    t1 = CompletionsTask(toks, greedy(), tokenizer=engine.tokenizer,
                         max_tokens=6, stream=False)
    f1, _ = run_task(engine, t1)
    t2 = CompletionsTask(toks, greedy(), tokenizer=engine.tokenizer,
                         max_tokens=6, stream=False)
    f2, _ = run_task(engine, t2)
    assert f1.generated == f2.generated
    assert f2.n_cached >= len(toks) - 1  # prefix-cache partial reuse


def test_concurrent_tasks_batch(engine):
    prompts = ["a b c d", "x y z", "hello world", "one two three"]
    tasks = [CompletionsTask(engine.tokenizer.encode(p), greedy(i),
                             tokenizer=engine.tokenizer, max_tokens=5,
                             stream=False)
             for i, p in enumerate(prompts)]
    for t in tasks:
        engine.submit(t)
    finals = []
    for t in tasks:
        while True:
            kind, payload = t.result_q.get(timeout=60)
            if kind == "final":
                finals.append(payload)
                break
            if kind == "error":
                raise payload
    assert all(len(f.generated) == 5 for f in finals)

    # batched output must equal the same prompt run alone (greedy)
    solo = CompletionsTask(engine.tokenizer.encode(prompts[0]), greedy(0),
                           tokenizer=engine.tokenizer, max_tokens=5,
                           stream=False)
    fs, _ = run_task(engine, solo)
    assert fs.generated == finals[0].generated


def test_context_shift_unbounded_generation(engine):
    """Generation beyond the slot context must keep going (KV squash), the
    reference's observable infinite-generation behavior."""
    toks = engine.tokenizer.encode("a")
    n = engine.slot_ctx + 10
    task = CompletionsTask(toks, SamplerParams(temp=1.2, seed=3,
                                               penalty_repeat=1.3),
                           tokenizer=engine.tokenizer, max_tokens=n,
                           stream=False)
    final, _ = run_task(engine, task, timeout=180)
    assert len(final.generated) == n or final.finish_reason == "stop"
    if len(final.generated) == n:
        assert final.n_shifted >= 1


def test_context_shift_reference_amounts(engine):
    """Reactive shift discards min(n_left/4, n_ubatch) after n_keep
    (httpserver.hpp:3472-3473, 3514-3515) — NOT n_left/2, which is only
    the prompt-side block size. White-box: drive _context_shift on a
    prepared slot and check the retained token count."""
    s = engine.slots[0]
    assert s.task is None
    task = CompletionsTask(engine.tokenizer.encode("a"), greedy(),
                           tokenizer=engine.tokenizer, max_tokens=1,
                           n_keep=4)
    s.task = task
    s.cache_tokens = list(range(engine.slot_ctx))
    s.pos = engine.slot_ctx
    s.drafts = []
    s.state = "decode"
    try:
        engine._context_shift(s)
        n_left = engine.slot_ctx - 4
        expect = max(1, min(n_left // 4, engine.ecfg.n_ubatch))
        assert s.pos == engine.slot_ctx - expect
        # kept: [0, n_keep) then the tail after the discard window
        assert s.cache_tokens == (
            list(range(4)) + list(range(4 + expect, engine.slot_ctx)))
    finally:
        s.task = None
        s.cache_tokens = []
        s.pos = 0
        s.state = "idle"


def test_prompt_squeeze_block_erasure(engine):
    """Over-long prompts are squeezed by whole blocks of size
    (max_len - n_keep)/2 after n_keep (httpserver.hpp:5603-5615)."""
    n_keep = 4
    max_len = engine.slot_ctx - engine.ecfg.defrag_headroom
    L = engine.slot_ctx + 20
    toks = [int(t) for t in
            np.random.default_rng(1).integers(3, 200, size=L)]
    task = CompletionsTask(toks, greedy(), tokenizer=engine.tokenizer,
                           max_tokens=2, stream=False, n_keep=n_keep)
    final, _ = run_task(engine, task, timeout=120)
    n_block = max(1, (max_len - n_keep) // 2)
    n_erased = max(1, (L - n_keep - n_block) // n_block)
    drop = max(n_erased * n_block, L - max_len)
    assert task.truncated
    assert task.prompt_tokens == toks[:n_keep] + toks[n_keep + drop:]


def test_long_prompt_squeeze(engine):
    """Prompts longer than the slot context are block-erased, not rejected."""
    toks = list(np.random.default_rng(0).integers(3, 200, size=engine.slot_ctx + 20))
    task = CompletionsTask([int(t) for t in toks], greedy(),
                           tokenizer=engine.tokenizer, max_tokens=2,
                           stream=False)
    final, _ = run_task(engine, task)
    assert final.truncated
    assert len(final.generated) == 2


def test_stop_word(engine):
    toks = engine.tokenizer.encode("a b")
    # sample freely; every decoded chunk that contains a space triggers stop
    task = CompletionsTask(toks, SamplerParams(temp=1.0, seed=5),
                           tokenizer=engine.tokenizer, max_tokens=64,
                           stream=True, stop_words=[" "])
    final, deltas = run_task(engine, task)
    assert " " not in final.text
    if final.finish_reason == "stop" and final.scanner.stop_word:
        assert final.scanner.stop_word == " "


def test_n_probs(engine):
    toks = engine.tokenizer.encode("a b c")
    task = CompletionsTask(toks, greedy(n_probs=3), tokenizer=engine.tokenizer,
                           max_tokens=3, stream=False, n_probs=3)
    final, _ = run_task(engine, task)
    assert len(final.probs) == 3
    for tp in final.probs:
        assert len(tp.top_ids) == 3
        assert tp.top_ids[0] == tp.token  # greedy picks the top candidate


def test_embeddings_task(engine):
    inputs = [engine.tokenizer.encode("hello"),
              engine.tokenizer.encode("hello world again")]
    task = EmbeddingsTask(inputs, normalize=True)
    engine.submit(task)
    kind, payload = task.result_q.get(timeout=60)
    assert kind == "final"
    embs = payload.embeddings
    assert len(embs) == 2
    for e in embs:
        assert abs(np.linalg.norm(e) - 1.0) < 1e-5
    # embeddings are input-dependent
    assert np.linalg.norm(np.array(embs[0]) - np.array(embs[1])) > 1e-3


def test_cancelled_task_releases_slot(engine):
    toks = engine.tokenizer.encode("a b c")
    task = CompletionsTask(toks, greedy(), tokenizer=engine.tokenizer,
                           max_tokens=1 << 20, stream=True)
    task.max_tokens = 50  # bounded anyway, but cancel early
    engine.submit(task)
    task.result_q.get(timeout=60)  # first delta
    task.cancelled = True
    # engine must eventually idle the slot
    import time
    for _ in range(200):
        if all(s.state == "idle" for s in engine.slots):
            break
        time.sleep(0.05)
    assert any(s.state == "idle" for s in engine.slots)


def test_prompt_cache_disabled(tmp_path):
    import jax.numpy as jnp
    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.tokenizer import Tokenizer
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=1, n_ctx=64, prompt_cache=False))
    eng.start()
    try:
        toks = tok.encode("a b c")
        f1, _ = run_task(eng, CompletionsTask(
            toks, greedy(), tokenizer=tok, max_tokens=2, stream=False))
        f2, _ = run_task(eng, CompletionsTask(
            toks, greedy(), tokenizer=tok, max_tokens=2, stream=False))
        assert f2.n_cached == 0  # no reuse when the prompt cache is off
        assert f2.generated == f1.generated
    finally:
        eng.stop()


def test_mixed_workload_interleaving(tmp_path):
    """Completions + embeddings concurrently: everything finishes and the
    completion output is unaffected (reference batch-type homogeneity).
    Prompt cache off so both runs take the identical prefill path (cached
    vs uncached prefill have different — both valid — fp reduction orders)."""
    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.tokenizer import Tokenizer
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=128, n_ubatch=16,
                              prompt_cache=False))
    eng.start()
    try:
        comp = CompletionsTask(tok.encode("a b c d e"), greedy(9),
                               tokenizer=tok, max_tokens=12, stream=False)
        embs = [EmbeddingsTask([tok.encode("hello"), tok.encode("world")])
                for _ in range(3)]
        for e in embs:
            eng.submit(e)
        f, _ = run_task(eng, comp, timeout=120)
        assert len(f.generated) == 12
        for e in embs:
            kind, payload = e.result_q.get(timeout=60)
            assert kind == "final"
            assert len(payload.embeddings) == 2

        # determinism vs a quiet engine
        solo = CompletionsTask(tok.encode("a b c d e"), greedy(9),
                               tokenizer=tok, max_tokens=12, stream=False)
        fs, _ = run_task(eng, solo)
        assert fs.generated == f.generated
    finally:
        eng.stop()


def test_decode_streams_during_large_embed_batch(tmp_path):
    """A large embeddings batch must NOT stall decoding slots: embed groups
    run one per reconcile pass (VERDICT r1 item 10). Asserts stream deltas
    for a concurrent completion arrive BEFORE the embed batch finishes."""
    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.tokenizer import Tokenizer
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=128, n_ubatch=16,
                              max_embed_batch=2))
    eng.start()
    try:
        # 12 inputs / max_embed_batch 2 = 6 groups = 6+ reconcile passes
        big = EmbeddingsTask([tok.encode(f"input number {i} padding words")
                              for i in range(12)])
        comp = CompletionsTask(tok.encode("a b c"), greedy(),
                               tokenizer=tok, max_tokens=6, stream=True)
        eng.submit(big)
        eng.submit(comp)

        deltas_before_embed_done = 0
        comp_deltas = comp_final = big_final = 0
        deadline = time.monotonic() + 120
        while (not comp_final or not big_final) \
                and time.monotonic() < deadline:
            progressed = False
            try:
                kind, payload = comp.result_q.get_nowait()
                progressed = True
                if kind == "delta":
                    comp_deltas += 1
                    if not big_final:
                        deltas_before_embed_done += 1
                elif kind == "final":
                    comp_final = 1
                elif kind == "error":
                    raise payload
            except queue.Empty:
                pass
            try:
                kind, payload = big.result_q.get_nowait()
                progressed = True
                if kind == "final":
                    big_final = 1
                    assert len(payload.embeddings) == 12
                elif kind == "error":
                    raise payload
            except queue.Empty:
                pass
            if not progressed:
                time.sleep(0.01)
        assert comp_final and big_final
        assert comp_deltas >= 6
        # decode progressed while embed groups were still queued
        assert deltas_before_embed_done >= 2, deltas_before_embed_done
    finally:
        eng.stop()


def _chain_engine(path, chain, **ecfg_kw):
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=64, n_ubatch=16,
                              decode_chain=chain, **ecfg_kw))
    eng.start()
    return eng


def test_decode_chain_identity(tmp_path):
    """Chained decode (K tokens per dispatch) must match per-token decode
    exactly: greedy AND seeded sampling, concurrent slots, stop words
    firing mid-chain, n_probs payloads, context shift."""
    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    e1 = _chain_engine(path, 1)
    e4 = _chain_engine(path, 4)
    try:
        cases = [
            dict(prompt="a b c d", sp=greedy(), n=11),
            dict(prompt="x y z", sp=SamplerParams(temp=0.9, seed=123), n=9),
            dict(prompt="a b", sp=greedy(n_probs=3), n=6, n_probs=3),
            # runs past slot capacity (32) -> context shift mid-stream
            dict(prompt="a", sp=greedy(), n=40),
        ]
        for c in cases:
            outs = []
            for eng in (e1, e4):
                t = CompletionsTask(eng.tokenizer.encode(c["prompt"]),
                                    c["sp"], tokenizer=eng.tokenizer,
                                    max_tokens=c["n"], stream=False,
                                    n_probs=c.get("n_probs", 0))
                f, _ = run_task(eng, t, timeout=120)
                outs.append(f)
            assert outs[0].generated == outs[1].generated, c
            if c.get("n_probs"):
                for p1, p4 in zip(outs[0].probs, outs[1].probs):
                    assert p1.top_ids == p4.top_ids
                    np.testing.assert_allclose(p1.top_probs, p4.top_probs,
                                               rtol=1e-6)

        # stop-word mid-chain: sampled freely, stop on space
        for eng_pair in [(e1, e4)]:
            texts = []
            for eng in eng_pair:
                t = CompletionsTask(eng.tokenizer.encode("a b"),
                                    SamplerParams(temp=1.0, seed=5),
                                    tokenizer=eng.tokenizer, max_tokens=64,
                                    stream=False, stop_words=[" "])
                f, _ = run_task(eng, t, timeout=120)
                texts.append(f.text)
            assert texts[0] == texts[1]

        # concurrent slots chained together
        tasks = []
        for i, p in enumerate(["a b c", "x y"]):
            t = CompletionsTask(e4.tokenizer.encode(p), greedy(i),
                                tokenizer=e4.tokenizer, max_tokens=7,
                                stream=False)
            e4.submit(t)
            tasks.append(t)
        outs4 = []
        for t in tasks:
            while True:
                kind, payload = t.result_q.get(timeout=120)
                if kind == "final":
                    outs4.append(payload.generated)
                    break
                if kind == "error":
                    raise payload
        for i, p in enumerate(["a b c", "x y"]):
            t = CompletionsTask(e1.tokenizer.encode(p), greedy(i),
                                tokenizer=e1.tokenizer, max_tokens=7,
                                stream=False)
            f, _ = run_task(e1, t)
            assert f.generated == outs4[i], p
    finally:
        e1.stop()
        e4.stop()


def test_decode_chain_pipeline_identity(tmp_path):
    """Pipelined chains (chain N+1 speculatively dispatched before chain N
    is synced, engine._maybe_speculate_chain) must be byte-identical to
    strictly-alternating chains and to per-token decode — including the
    hard transitions: a task finishing while a speculated chain is in
    flight, and a NEW task re-admitted to that slot (reset_slot + prefill
    must fully override the stale speculative sampler/KV state)."""
    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    # 4 staggered tasks over 2 slots: finishes + re-admissions mid-pipeline
    prompts = [("a b c", 17), ("x y", 5), ("c d a", 9), ("b", 13)]
    results = {}
    for name, kw in (("pipe", dict(chain=4)),
                     ("deep", dict(chain=4, pipeline_depth=2)),
                     ("alt", dict(chain=4, pipeline_chain=False)),
                     ("tok", dict(chain=1))):
        eng = _chain_engine(path, **kw)
        try:
            tasks = []
            for i, (p, n) in enumerate(prompts):
                t = CompletionsTask(eng.tokenizer.encode(p),
                                    SamplerParams(temp=0.8, seed=100 + i,
                                                  penalty_repeat=1.1),
                                    tokenizer=eng.tokenizer, max_tokens=n,
                                    stream=False)
                eng.submit(t)
                tasks.append(t)
            outs = []
            for t in tasks:
                while True:
                    kind, payload = t.result_q.get(timeout=120)
                    if kind == "final":
                        outs.append(payload.generated)
                        break
                    if kind == "error":
                        raise payload
            results[name] = outs
        finally:
            eng.stop()
    assert results["pipe"] == results["alt"], results
    assert results["pipe"] == results["tok"], results


def test_pipeline_no_starvation(tmp_path):
    """A slot admitted while another slot's chains are pipelined must join
    a joint chain within a bounded number of passes (r2 advisor high: the
    engine re-speculated covered-only chains every pass, so a new slot got
    zero decodes until the covered task finished or hit the capacity
    gate — the reference decodes ALL running slots each batch)."""
    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=128, n_ubatch=16,
                              decode_chain=4))
    eng.start()
    try:
        long_t = CompletionsTask(eng.tokenizer.encode("a b c"), greedy(),
                                 tokenizer=eng.tokenizer, max_tokens=40,
                                 stream=True)
        eng.submit(long_t)
        # wait until the long task is mid-stream (pipeline active)
        n_seen = 0
        while n_seen < 4:
            kind, payload = long_t.result_q.get(timeout=60)
            if kind == "delta":
                n_seen += 1
            elif kind in ("final", "error"):
                raise AssertionError(f"long task ended early: {kind}")
        short_t = CompletionsTask(eng.tokenizer.encode("x"), greedy(),
                                  tokenizer=eng.tokenizer, max_tokens=2,
                                  stream=False)
        eng.submit(short_t)
        # count long-task tokens that arrive before the short task's final
        long_during = 0
        short_final = None
        deadline = time.time() + 120
        while short_final is None and time.time() < deadline:
            try:
                kind, payload = short_t.result_q.get(timeout=0.05)
                if kind == "final":
                    short_final = payload
                elif kind == "error":
                    raise payload
            except queue.Empty:
                pass
            while True:
                try:
                    kind, payload = long_t.result_q.get_nowait()
                except queue.Empty:
                    break
                if kind == "delta":
                    long_during += 1
                elif kind == "error":
                    raise payload
        assert short_final is not None, "short task starved"
        assert len(short_final.generated) == 2
        # fixed engine: <=~3 drain/joint passes of K=4 before the short
        # slot decodes; the starvation bug yielded ~36 here (long task ran
        # to completion first)
        assert long_during <= 20, long_during
    finally:
        eng.stop()


def test_chain_ramp_short_first_chain(tmp_path):
    """Adaptive chain ramp: the first chain after prefill must be
    chain_ramp steps (so TTFT doesn't scale with decode_chain), growing
    x4 per chain to the configured K — and output must stay identical to
    per-token decode."""
    from llama_box_tpu.server import engine as engine_mod

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    ks = []
    orig = engine_mod._decode_chain

    def spy(*args, n_steps, **kw):
        ks.append(n_steps)
        return orig(*args, n_steps=n_steps, **kw)

    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=1, n_ctx=256, n_ubatch=16,
                              decode_chain=16, chain_ramp=2))
    engine_mod._decode_chain = spy
    eng.start()
    try:
        t = CompletionsTask(tok.encode("a b c"),
                            SamplerParams(temp=0.8, seed=3),
                            tokenizer=tok, max_tokens=40, stream=False)
        f, _ = run_task(eng, t, timeout=120)
        out_ramp = f.generated
    finally:
        eng.stop()
        engine_mod._decode_chain = orig
    # ramp schedule: 2, 8, then the configured 16 (direct + speculated
    # dispatches both count)
    assert ks[0] == 2 and ks[1] == 8 and 16 in ks, ks

    e1 = Engine(cfg, params, tok,
                EngineConfig(n_slots=1, n_ctx=256, n_ubatch=16,
                             decode_chain=1))
    e1.start()
    try:
        t = CompletionsTask(tok.encode("a b c"),
                            SamplerParams(temp=0.8, seed=3),
                            tokenizer=tok, max_tokens=40,
                            stream=False)
        f, _ = run_task(e1, t, timeout=120)
        assert f.generated == out_ramp
    finally:
        e1.stop()


def test_empty_prompt_degrades_to_bos(engine):
    """A prompt that tokenizes to nothing serves as [BOS] (reference
    add_special semantics) instead of crashing the reconcile pass."""
    task = CompletionsTask([], greedy(), tokenizer=engine.tokenizer,
                           max_tokens=3, stream=False)
    final, _ = run_task(engine, task)
    assert 1 <= len(final.generated) <= 3


def test_cross_slot_prefix_share(tmp_path):
    """A new request sharing a long prefix with a BUSY sibling slot reuses
    that slot's KV rows via device copy (cross-slot sharing — beyond the
    reference's per-slot prompt cache) with greedy output identical to a
    cold run."""
    import jax.numpy as jnp
    from llama_box_tpu.gguf import GGUFFile
    from llama_box_tpu.models import load_model
    from llama_box_tpu.tokenizer import Tokenizer
    from .fixtures.make_tiny_model import write_tiny_model

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    cfg, params = load_model(path, dtype=jnp.float32)
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)

    shared = tok.encode("the quick brown fox jumps over the lazy dog and")
    tail_a = tok.encode("runs far")
    tail_b = tok.encode("sleeps here")

    # cold reference: B's prompt alone on a fresh single-slot engine
    eng0 = Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=64))
    eng0.start()
    try:
        cold, _ = run_task(eng0, CompletionsTask(
            shared + tail_b, greedy(), tokenizer=tok, max_tokens=6,
            stream=False))
    finally:
        eng0.stop()

    eng = Engine(cfg, params, tok,
                 EngineConfig(n_slots=2, n_ctx=128, cache_share_min=4))
    eng.start()
    try:
        ta = CompletionsTask(shared + tail_a, greedy(), tokenizer=tok,
                             max_tokens=24, stream=True)
        eng.submit(ta)
        # wait until A is decoding (its prefix rows are written)
        kind, _ = ta.result_q.get(timeout=60)
        assert kind in ("delta", "final")

        tb = CompletionsTask(shared + tail_b, greedy(), tokenizer=tok,
                             max_tokens=6, stream=False)
        fb, _ = run_task(eng, tb)
        # B reused the shared prefix from A's busy slot
        assert fb.n_cached >= len(shared) - 1, fb.n_cached
        assert fb.generated == cold.generated
        while True:  # drain A
            kind, payload = ta.result_q.get(timeout=60)
            if kind == "final":
                break
            if kind == "error":
                raise payload
    finally:
        eng.stop()


def test_copy_kv_prefix_exactness():
    """copy_kv_prefix moves exactly rows [0, n) of src into dst."""
    import jax.numpy as jnp
    from llama_box_tpu.models.llama import KVCache, copy_kv_prefix

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(2, 3, 8, 2, 4)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 3, 8, 2, 4)), jnp.float32)
    ks = jnp.asarray(rng.normal(size=(2, 3, 8, 2)), jnp.float32)
    kv = KVCache(k=k, v=v, k_scale=ks, v_scale=ks + 1)
    k_h, v_h, ks_h = (np.asarray(x).copy() for x in (k, v, ks))
    want_k = k_h.copy()
    want_k[:, 2, :5] = k_h[:, 0, :5]
    want_ks = ks_h.copy()
    want_ks[:, 2, :5] = ks_h[:, 0, :5]
    out = copy_kv_prefix(kv, jnp.int32(0), jnp.int32(2), jnp.int32(5))
    np.testing.assert_array_equal(np.asarray(out.k), want_k)
    np.testing.assert_array_equal(np.asarray(out.k_scale), want_ks)
    np.testing.assert_array_equal(np.asarray(out.v)[:, 1], v_h[:, 1])


def test_post_prefill_speculation_and_tail_shrink(tmp_path):
    """r5 serving-window changes: (a) the first ramped chain is
    speculatively dispatched off the DEVICE-RESIDENT first tokens before
    the prefill sync (_speculate_post_prefill) and (b) chain length
    shrinks to the pow2 bucket of the remaining budget at burst tails
    (_chain_k). Greedy output must stay identical to per-token decode,
    and the speculation must actually fire."""
    from llama_box_tpu.server import engine as eng_mod

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    fired = {"n": 0}
    orig = eng_mod.Engine._speculate_post_prefill

    def spy(self, pend):
        before = len(self._chain_q)
        orig(self, pend)
        fired["n"] += len(self._chain_q) > before

    # odd budgets exercise the shrink ladder (ramp 4 -> 8 -> 4-overshoot)
    prompts = [("a b c", 13), ("x y", 7)]

    def go(chain, **kw):
        eng = _chain_engine(path, chain, chain_ramp=4, **kw)
        try:
            tasks = []
            for p, n in prompts:
                t = CompletionsTask(eng.tokenizer.encode(p),
                                    SamplerParams(temp=0.0),
                                    tokenizer=eng.tokenizer, max_tokens=n,
                                    stream=False)
                eng.submit(t)
                tasks.append(t)
            outs = []
            for t in tasks:
                while True:
                    kind, payload = t.result_q.get(timeout=120)
                    if kind == "final":
                        outs.append(payload.generated)
                        break
                    if kind == "error":
                        raise payload
            return outs
        finally:
            eng.stop()

    eng_mod.Engine._speculate_post_prefill = spy
    try:
        piped = go(16, pipeline_depth=2)
        assert fired["n"] > 0, "post-prefill speculation never engaged"
    finally:
        eng_mod.Engine._speculate_post_prefill = orig
    assert go(1, pipeline_chain=False) == piped


def test_engine_randomized_soak(tmp_path):
    """Randomized mixed-workload soak through the real reconcile loop:
    varied prompt lengths, greedy/sampled/grammar/n_probs tasks, a
    mid-flight cancel, and budgets that cross chain boundaries — every
    task must complete (or cancel) without engine errors, and greedy
    tasks must be deterministic across the soak (prefix-cache +
    pipelining must not leak state between tasks)."""
    from llama_box_tpu.grammar import Grammar

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path)
    eng = _chain_engine(path, 4, pipeline_depth=2, chain_ramp=2)
    rng = np.random.default_rng(0)
    try:
        # deterministic reference for one greedy prompt
        ref_t = CompletionsTask(eng.tokenizer.encode("a b c"),
                                SamplerParams(temp=0.0),
                                tokenizer=eng.tokenizer, max_tokens=7,
                                stream=False)
        ref, _ = run_task(eng, ref_t)

        prompts = ["a", "b c", "c d a b", "a c b", "d"]
        tasks = []
        for i in range(14):
            p = prompts[int(rng.integers(len(prompts)))]
            kind = i % 5
            if kind == 0:
                sp = SamplerParams(temp=0.0)
            elif kind == 1:
                sp = SamplerParams(temp=0.8, seed=i)
            elif kind == 2:
                sp = SamplerParams(temp=0.7, seed=i, penalty_repeat=1.2)
            elif kind == 3:
                sp = SamplerParams(temp=0.0,
                                   grammar=Grammar('root ::= [a-d ]{1,24}'))
            else:
                sp = SamplerParams(temp=0.9, seed=i, top_k=3)
            kw = dict(tokenizer=eng.tokenizer, stream=False,
                      max_tokens=int(rng.integers(3, 15)))
            if kind == 2:
                kw["n_probs"] = 3
            t = CompletionsTask(eng.tokenizer.encode(p), sp, **kw)
            eng.submit(t)
            tasks.append(t)
        tasks[5].cancelled = True   # mid-flight cancel
        done = 0
        for t in tasks:
            if t is tasks[5]:
                continue
            while True:
                kind_, payload = t.result_q.get(timeout=180)
                if kind_ == "final":
                    assert 1 <= len(payload.generated)
                    done += 1
                    break
                if kind_ == "error":
                    raise payload
        assert done == 13
        # greedy determinism after the soak
        t2 = CompletionsTask(eng.tokenizer.encode("a b c"),
                             SamplerParams(temp=0.0),
                             tokenizer=eng.tokenizer, max_tokens=7,
                             stream=False)
        again, _ = run_task(eng, t2)
        assert again.generated == ref.generated
    finally:
        eng.stop()


def test_chain_k_budget_shrink_unit():
    """_chain_k contract (r5): K caps at the pow2 bucket of the largest
    remaining budget minus in-flight steps; 1-3 token leftovers
    overshoot a 4-chain instead of paying a per-token round trip."""
    from llama_box_tpu.server.engine import Engine, EngineConfig

    class _Task:
        def __init__(self, mt, gen):
            self.max_tokens = mt
            self.generated = [0] * gen

    class _Slot:
        def __init__(self, mt, gen, ramp=0):
            self.task = _Task(mt, gen)
            self.chain_ramp = ramp

    eng = Engine.__new__(Engine)
    eng.ecfg = EngineConfig(decode_chain=16)

    k = Engine._chain_k
    assert k(eng, [_Slot(1000, 0)]) == 16          # plenty of budget
    assert k(eng, [_Slot(100, 88)]) == 8           # rem 12 -> pow2 8
    assert k(eng, [_Slot(100, 95)]) == 4           # rem 5 -> 4
    assert k(eng, [_Slot(100, 98)]) == 4           # rem 2 -> overshoot 4
    assert k(eng, [_Slot(100, 99)]) == 4           # rem 1 -> overshoot 4
    assert k(eng, [_Slot(0, 50)]) == 16            # mt<=0 = unlimited
    # max over slots governs; off subtracts in-flight steps
    assert k(eng, [_Slot(100, 95), _Slot(1000, 0)]) == 16
    assert k(eng, [_Slot(100, 80)], off=16) == 4   # rem 20-16=4
    assert k(eng, [_Slot(100, 84)], off=16) == 1   # covered -> caller skips
    # ramp still caps below the budget bucket
    assert k(eng, [_Slot(1000, 0, ramp=4)]) == 4
