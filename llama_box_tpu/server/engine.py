"""Continuous-batching inference engine — the reconcile loop.

TPU-native re-design of the reference's single scheduler thread
(httpserver.hpp:3640-5017):
- N slots = N rows of one batched KV cache; one fused decode program per
  pass covers every decoding slot (the reference's single llama_decode).
- Prefill runs per-slot as a bucketed [1, T] program (PREFILL and DECODE
  never mix in a batch, matching the reference's admission rule).
- Prefix cache: per-slot token history, slot picked by longest common
  prefix, partial KV reuse (httpserver.hpp:3760-3862).
- Context shift: on KV-full, drop n_discard after n_keep and compact the
  slot's KV on device (httpserver.hpp:3453-3537) — observable behavior is
  unbounded generation, never a context overflow error.
- Sampling runs fused with decode on device; only sampled ids (and optional
  top-probs) cross to the host each step.

All XLA programs have static shapes: prompt chunks pad to power-of-two
buckets, the decode batch is always the full slot width.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import (
    KVCache, apply_rows, copy_kv_prefix, forward_embeddings, forward_impl,
    forward_rows_impl, init_kv_cache, make_delta_rope, make_rope, prefill,
    prefill_batch, prefill_embed, shift_kv,
)
from ..sampling import (
    RING_CAP, SamplerParams, init_sampler_state, make_sampler_arrays,
    push_tokens, reset_slot, sample_impl, sample_one, verify_impl,
)
from ..utils.logging import SRV_DBG, SRV_ERR, SRV_INF, SRV_WRN
from ..utils.text import longest_common_prefix
from .metrics import Metrics
from .task import (BaseTask, CompletionsTask, EmbeddingsTask, ImagesTask,
                   RerankTask)

DEFAULT_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


# experiment knob, read ONCE at import (it is baked into the traced
# program — flipping it mid-process would silently not retrace)
import os as _os

_CHAIN_SCATTER = bool(_os.environ.get("LLAMA_BOX_TPU_CHAIN_SCATTER"))


def _issue_copies(toks, ids, probs, tokps, want_probs: bool) -> None:
    """Request device->host transfers NOW (in-order transport: a copy
    issued before the next dispatch is served before that dispatch's
    whole chain)."""
    try:
        toks.copy_to_host_async()
        if want_probs:
            for a in (ids, probs, tokps):
                a.copy_to_host_async()
    except Exception:  # noqa: BLE001 — backend without async copies
        pass


def _pow2_floor(n: int) -> int:
    """Largest power of two <= n (0 for n < 1) — chain-length buckets
    near the context boundary keep the program-variant count bounded."""
    if n < 1:
        return 0
    return 1 << (n.bit_length() - 1)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("sstate",))
def _decode_verify_rows(params, cfg: ModelConfig, tokens, positions,
                        n_draft, kv, fwd_active, samp_active, sstate, arrs,
                        cos, sin, mrope_delta=None):
    """Decode-forward + speculative verify + sampling over the full slot
    batch, WITHOUT cache writes: returns the new K/V rows for a separate
    apply_rows dispatch (whose donated cache is used only by the scatter,
    so it updates in place — the fused variant copied the whole cache).
    T=1 is plain decode; T=K+1 verifies K drafted tokens.

    fwd_active covers every decoding slot; samp_active excludes
    grammar-constrained slots, which are sampled host-side from the
    returned first-position logits (their device sampler state must not
    advance)."""
    seq_lens = jnp.where(fwd_active, n_draft + 1, 0)
    mrope_pos = None
    if cfg.mrope_sections and mrope_delta is not None:
        mrope_pos = jnp.broadcast_to(
            (positions + mrope_delta[:, None])[None],
            (3,) + positions.shape)
    logits, rows = forward_rows_impl(params, cfg, tokens, positions, kv,
                                     seq_lens, cos, sin,
                                     mrope_pos=mrope_pos)
    toks, n_emitted, ids, probs, tokps, sstate = verify_impl(
        logits, tokens, n_draft, sstate, arrs, samp_active)
    return toks, n_emitted, ids, probs, tokps, logits[:, 0], rows, sstate


@partial(jax.jit,
         static_argnames=("cfg", "n_steps", "attn_len", "samp_extras",
                          "samp_kcap"),
         donate_argnames=("kv", "sstate"))
def _decode_chain(params, cfg: ModelConfig, token0, pos0, kv, sstate,
                  arrs, active, cos, sin, n_steps: int,
                  mrope_delta=None, attn_len: int = 0,
                  samp_extras: bool = True, samp_kcap: int = 0):
    """Chained multi-step decode: n_steps sequential forward+sample steps
    in ONE dispatch. The cache stays READ-ONLY through the whole chain —
    each step's K/V rows land in a tiny per-layer accumulator (the
    `chain` operand of _attn_deferred, stored in cache dtype so results
    are bit-comparable to step-by-step decode) and ONE scatter writes all
    n_steps rows at the end. Amortizes both dispatch overhead and the
    device->host sync across n_steps tokens (through the axon tunnel one
    sync costs ~30 ms — the serving path is sync-bound without this).

    token0/pos0: [S] each slot's next token and its position. active: [S].
    Returns (tokens [S,K], ids [S,K,NP], probs [S,K,NP], tokps [S,K],
    kv, sstate). Slots that hit EOG mid-chain keep generating; the host
    discards the tail (their sampler state is reset at next dispatch and
    stale KV rows beyond the accepted position are unreachable by mask).

    attn_len (static, 0 = full capacity): attention reads only cache
    positions [0, attn_len) — RANGED attention over the occupied region,
    like the reference's ggml graphs computing over n_kv cells rather
    than the whole cache. The engine buckets max(pos)+K up to a 256
    multiple so a handful of program variants cover every fill level.
    """
    from ..models.llama import (_add_pos_embd, _build_mask, _embed_tokens,
                                _kv_quantize, _output_logits, _run_stack)
    from ..sampling import sample_impl
    S = token0.shape[0]
    L = kv.k.shape[0]
    C = kv.capacity
    Hkv, Dk = kv.k.shape[-2], kv.k.shape[-1]
    Dv = kv.v.shape[-1]
    Kc = n_steps
    quant = kv.quantized
    acc = (jnp.zeros((L, S, Kc, Hkv, Dk), kv.k.dtype),
           jnp.zeros((L, S, Kc, Hkv, Dv), kv.v.dtype))
    if quant:
        acc += (jnp.zeros((L, S, Kc, Hkv), kv.k_scale.dtype),
                jnp.zeros((L, S, Kc, Hkv), kv.v_scale.dtype))

    AL = min(attn_len or C, C)
    kv_k = kv.k if AL == C else jax.lax.slice_in_dim(kv.k, 0, AL, axis=2)
    kv_v = kv.v if AL == C else jax.lax.slice_in_dim(kv.v, 0, AL, axis=2)
    kv_ks = kv_vs = None
    if quant:
        kv_ks = kv.k_scale if AL == C else \
            jax.lax.slice_in_dim(kv.k_scale, 0, AL, axis=2)
        kv_vs = kv.v_scale if AL == C else \
            jax.lax.slice_in_dim(kv.v_scale, 0, AL, axis=2)

    def step(carry, j):
        tok, acc, sstate = carry
        positions = jnp.where(active, pos0 + j, C)[:, None]      # [S,1]
        seq_lens = jnp.where(active, 1, 0)
        x = _add_pos_embd(params, _embed_tokens(params, cfg, tok[:, None]),
                          positions)
        mask = _build_mask(cfg, positions, seq_lens, 1, AL)
        mrope_pos = None
        if cfg.mrope_sections and mrope_delta is not None:
            mrope_pos = jnp.broadcast_to(
                (positions + mrope_delta[:, None])[None],
                (3,) + positions.shape)
        chain = (acc[0], acc[1], acc[2] if quant else None,
                 acc[3] if quant else None, j)
        x, rows = _run_stack(
            params, cfg, x, positions, kv_k, kv_v, mask, cos, sin,
            kv_ks, kv_vs, mrope_pos=mrope_pos,
            deferred_kv=True, emit_rows=True, chain=chain)
        logits = _output_logits(params, cfg, x[:, -1])            # [S,V]
        tok2, ids, probs, tokp, sstate = sample_impl(
            logits, sstate, arrs, active, extras=samp_extras,
            kcap=samp_kcap)
        # store this step's rows at chain index j (leaves [L,S,1,...]);
        # a one-hot where-merge is a single fusable elementwise pass over
        # the small accumulator, vs a dynamic-update-slice that writes
        # L*S strided sub-blocks (measured 12us/step at the bench shape)
        oh = (jnp.arange(Kc, dtype=jnp.int32) == j)
        acc = tuple(
            jnp.where(oh.reshape((1, 1, Kc) + (1,) * (a.ndim - 3)),
                      r.astype(a.dtype), a)
            for a, r in zip(acc, rows))
        return (tok2, acc, sstate), (tok2, ids, probs, tokp)

    (_, acc, sstate), ys = jax.lax.scan(
        step, (token0, acc, sstate), jnp.arange(Kc, dtype=jnp.int32))
    toks, ids, probs, tokps = ys                   # [K, S, ...]

    # write the chain's rows into the cache: each slot's window is
    # CONTIGUOUS ([pos0, pos0+K), the engine gates chains to fit), so one
    # dynamic_update_slice per slot updates in place on the donated
    # buffer — a gather-scatter over (L, S, K) indices instead forced
    # XLA to stream the WHOLE cache through a read+write (~118us/dispatch
    # profiled at the bench shape). Inactive slots (pos >= C sentinel)
    # write their current contents back (clipped no-op window).
    def write_slot(leaf, acc_leaf, s):
        start = jnp.clip(pos0[s], 0, C - Kc)
        idx = (jnp.int32(0), jnp.int32(s), start) \
            + (jnp.int32(0),) * (leaf.ndim - 3)
        cur = jax.lax.dynamic_slice(
            leaf, idx, (L, 1, Kc) + leaf.shape[3:])
        upd = jax.lax.dynamic_slice_in_dim(acc_leaf, s, 1, axis=1)
        new = jnp.where(active[s], upd.astype(leaf.dtype), cur)
        return jax.lax.dynamic_update_slice(leaf, new, idx)

    k_new, v_new = kv.k, kv.v
    ks_new, vs_new = (kv.k_scale, kv.v_scale) if quant else (None, None)
    if _CHAIN_SCATTER:
        # experiment: one gather-scatter over (L, S, K) indices instead
        # of S per-slot DUS windows (position >= C sentinel drops)
        li = jnp.arange(L)[:, None, None]
        bi = jnp.arange(S)[None, :, None]
        pj = jnp.where(active[:, None],
                       pos0[:, None] + jnp.arange(Kc)[None, :], C)
        pi = jnp.broadcast_to(pj[None], (L, S, Kc))

        def wr(leaf, a):
            return leaf.at[li, bi, pi].set(a.astype(leaf.dtype),
                                           mode="drop")
        k_new = wr(k_new, acc[0])
        v_new = wr(v_new, acc[1])
        if quant:
            ks_new = wr(ks_new, acc[2])
            vs_new = wr(vs_new, acc[3])
        kv = (KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)
              if quant else KVCache(k=k_new, v=v_new))
        swap = lambda a: jnp.swapaxes(a, 0, 1)  # noqa: E731
        return (swap(toks), swap(ids), swap(probs), swap(tokps), kv,
                sstate)
    for s in range(S):
        k_new = write_slot(k_new, acc[0], s)
        v_new = write_slot(v_new, acc[1], s)
        if quant:
            ks_new = write_slot(ks_new, acc[2], s)
            vs_new = write_slot(vs_new, acc[3], s)
    kv = (KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)
          if quant else KVCache(k=k_new, v=v_new))
    swap = lambda a: jnp.swapaxes(a, 0, 1)  # noqa: E731 — [K,S]->[S,K]
    return (swap(toks), swap(ids), swap(probs), swap(tokps), kv, sstate)


def _decode_verify_sample(params, cfg, tokens, positions, n_draft, kv,
                          fwd_active, samp_active, sstate, arrs, cos, sin,
                          mrope_delta=None):
    """Two-dispatch decode step: forward/verify/sample, then the in-place
    row scatter (see _decode_verify_rows)."""
    toks, n_emitted, ids, probs, tokps, logits0, rows, sstate = \
        _decode_verify_rows(params, cfg, tokens, positions, n_draft, kv,
                            fwd_active, samp_active, sstate, arrs, cos,
                            sin, mrope_delta)
    kv = apply_rows(kv, rows, positions)
    return toks, n_emitted, ids, probs, tokps, logits0, kv, sstate


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv",))
def _draft_forward_greedy(params, cfg: ModelConfig, tokens, positions, kv,
                          seq_lens, cos, sin):
    """Draft-model step: forward + greedy argmax of the last valid position
    per row + its probability (reference draft loop httpserver.hpp:4699-4751
    drafts greedily while p >= p_min)."""
    logits, kv = forward_impl(params, cfg, tokens, positions, kv, seq_lens,
                              cos, sin)
    B, T, V = logits.shape
    last = jnp.maximum(seq_lens - 1, 0)
    row = jnp.take_along_axis(
        logits, last[:, None, None].repeat(V, 2), axis=1)[:, 0]  # [B, V]
    tok = jnp.argmax(row, axis=-1).astype(jnp.int32)
    p = jnp.take_along_axis(jax.nn.softmax(row, axis=-1), tok[:, None],
                            axis=1)[:, 0]
    return tok, p, kv


@partial(jax.jit, static_argnames=("cfg", "n_steps"),
         donate_argnames=("kv",))
def _draft_chain_greedy(params, cfg: ModelConfig, token0, pos0, kv,
                        active, cos, sin, p_min, n_steps: int):
    """Whole greedy draft run in ONE dispatch: n_steps sequential draft
    forwards, each feeding its argmax to the next. The p >= p_min gating
    runs ON DEVICE (n_ok = length of the leading all-confident run) —
    identical to drafting step-by-step (greedy continuation doesn't
    depend on the gating), but without the per-step device->host sync
    the step loop paid (~26 ms each through the axon tunnel; reference
    draft loop httpserver.hpp:4699-4751 is in-process). Everything the
    host needs returns as ONE packed [K+1, S] i32 array = one transfer.
    """
    C = kv.capacity

    def step(carry, j):
        tok, kv = carry
        positions = jnp.where(active, pos0 + j, C)[:, None]
        seq_lens = jnp.where(active, 1, 0)
        logits, kv = forward_impl(params, cfg, tok[:, None], positions,
                                  kv, seq_lens, cos, sin)
        row = logits[:, 0]
        nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
        p = jnp.take_along_axis(jax.nn.softmax(row, axis=-1),
                                nxt[:, None], axis=1)[:, 0]
        return (nxt, kv), (nxt, p)

    (_, kv), (toks, ps) = jax.lax.scan(
        step, (token0, kv), jnp.arange(n_steps, dtype=jnp.int32))
    ok = (ps >= p_min).astype(jnp.int32)               # [K, S]
    n_ok = jnp.cumprod(ok, axis=0).sum(axis=0)         # leading-run length
    packed = jnp.concatenate([toks, n_ok[None]], axis=0)
    return packed, kv


@partial(jax.jit, static_argnames=("cfg", "dcfg", "n_rounds", "draft_k"),
         donate_argnames=("kv", "dkv", "sstate"))
def _spec_chain(params, cfg: ModelConfig, dparams, dcfg: ModelConfig,
                token0, pos0, kv, dkv, sstate, arrs, active,
                cos, sin, dcos, dsin, p_min,
                pcarry,
                n_rounds: int, draft_k: int):
    """n_rounds speculative draft+verify rounds in ONE dispatch, with all
    accept/advance bookkeeping ON DEVICE — the reference's host-side draft
    loop (httpserver.hpp:4695-4767) re-shaped so a pass amortizes the
    device->host sync over ~n_rounds*(accepted+1) tokens instead of one
    round (VERDICT r3 #4: the spec pass must pipeline like plain chains).

    Each round m:
      1. draft catch-up: feed round m-1's accepted tokens a_0..a_{nem-2}
         into the draft KV (positions pos0+1..pos0+nem-1; round 0 skips —
         the host caught the draft KV up before dispatch);
      2. greedy draft chain: draft_k steps, p >= p_min run-length gating
         on device (identical to _draft_chain_greedy);
      3. target verify forward over [token0 | drafts] (T = draft_k + 1)
         + verify_impl + row scatter at absolute positions;
      4. token0' = toks[nem-1], pos0' = pos0 + nem (device-resident).

    pcarry: (ptoks [S,T], pnem [S], ppos0 [S], pvalid [S]) — a PREVIOUS
    dispatch's final round, whose accepted tail must enter the draft KV
    before round 0 drafts (pipelined dispatches can't run the host-side
    catch-up; pvalid=False rows make round 0's catch-up a masked no-op,
    which is how the first dispatch of a burst runs after its host
    catch-up).

    Greedy-identical to iterating the one-round fused pass: the math per
    round is the same; only where the bookkeeping lives changes. Stale KV
    rows from rejected drafts are overwritten by the next round's verify
    chunk and are never read (deferred attention masks the cache to
    strictly-before-chunk positions).

    Returns (packed [M, S, T+2] int32: toks | n_emitted | n_draft,
             ids [M, S, T, NP], probs, tokps, token_next [S], pos_end [S],
             carry_next = (toks, nem, pos0) of the final round,
             kv, dkv, sstate).
    """
    S = token0.shape[0]
    K = draft_k
    T = K + 1
    C = kv.capacity
    cols_t = jnp.arange(T, dtype=jnp.int32)[None, :]
    cols_k = jnp.arange(K, dtype=jnp.int32)[None, :]
    outs, ids_l, probs_l, tokps_l = [], [], [], []
    ptoks0, pnem0, ppos00, pvalid = pcarry
    prev = (ptoks0, jnp.where(pvalid, pnem0, 0), ppos00)
    tok_cur, pos_cur = token0, pos0
    for m in range(n_rounds):
        if prev is not None:
            # catch-up: previous round's accepted tokens (idempotent for
            # entries the draft KV already holds; overwrites stale rows
            # from rejected drafts)
            ptoks, pnem, ppos = prev
            lens = jnp.where(active, jnp.maximum(pnem - 1, 0), 0)
            cu_pos = jnp.where(cols_k < lens[:, None],
                               ppos[:, None] + 1 + cols_k, C)
            _, dkv = forward_impl(dparams, dcfg, ptoks[:, :K], cu_pos,
                                  dkv, lens, dcos, dsin)

        def dstep(carry, j, pos_cur=pos_cur):
            tok, dkv = carry
            positions = jnp.where(active, pos_cur + j, C)[:, None]
            seq_lens = active.astype(jnp.int32)
            logits, dkv = forward_impl(dparams, dcfg, tok[:, None],
                                       positions, dkv, seq_lens,
                                       dcos, dsin)
            row = logits[:, 0]
            nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
            p = jnp.take_along_axis(jax.nn.softmax(row, axis=-1),
                                    nxt[:, None], axis=1)[:, 0]
            return (nxt, dkv), (nxt, p)

        (_, dkv), (dtoks, dps) = jax.lax.scan(
            dstep, (tok_cur, dkv), jnp.arange(K, dtype=jnp.int32))
        ok = (dps >= p_min).astype(jnp.int32)            # [K, S]
        n_draft = jnp.where(active, jnp.cumprod(ok, 0).sum(0), 0)
        draft_toks = dtoks.T                             # [S, K]

        tokens = jnp.concatenate([tok_cur[:, None], draft_toks], axis=1)
        positions = jnp.where(
            active[:, None] & (cols_t <= n_draft[:, None]),
            pos_cur[:, None] + cols_t, C)
        seq_lens = jnp.where(active, n_draft + 1, 0)
        logits, rows = forward_rows_impl(params, cfg, tokens, positions,
                                         kv, seq_lens, cos, sin)
        toks, n_emitted, ids, probs, tokps, sstate = verify_impl(
            logits, tokens, n_draft, sstate, arrs, active)
        from ..models.llama import apply_rows_impl
        kv = apply_rows_impl(kv, rows, positions)
        outs.append(jnp.concatenate(
            [toks, n_emitted[:, None], n_draft[:, None]], axis=1))
        ids_l.append(ids)
        probs_l.append(probs)
        tokps_l.append(tokps)
        prev = (toks, n_emitted, pos_cur)
        tok_cur = jnp.take_along_axis(
            toks, jnp.maximum(n_emitted - 1, 0)[:, None], axis=1)[:, 0]
        tok_cur = jnp.where(active, tok_cur, token0)
        pos_cur = pos_cur + jnp.where(active, n_emitted, 0)
    return (jnp.stack(outs), jnp.stack(ids_l), jnp.stack(probs_l),
            jnp.stack(tokps_l), tok_cur, pos_cur, prev,
            kv, dkv, sstate)


@dataclasses.dataclass
class EngineConfig:
    n_slots: int = 4
    n_ctx: int = 4096             # total; per-slot = n_ctx // n_slots
    n_ubatch: int = 512           # max prefill chunk
    kv_dtype: str = "bfloat16"
    n_keep_default: int = 0
    prompt_cache: bool = True     # prefix cache (--no-prompt-cache disables)
    # cross-slot prefix sharing: device-copy KV rows from any slot whose
    # cache shares >= this many MORE prefix tokens than the chosen slot's
    # own cache (-1 disables; beyond reference parity — its prompt cache
    # is per-slot only)
    cache_share_min: int = 32
    defrag_headroom: int = 4      # free positions to leave after prompt squeeze
    max_embed_batch: int = 8
    # speculative decoding (reference §2.1 #10)
    draft_max: int = 8            # max drafted tokens per step (T = this + 1)
    lookup_ngram_min: int = 0     # n-gram prompt-lookup drafting; 0 = off
    draft_p_min: float = 0.75     # stop drafting below this draft prob
    draft_min: int = 1            # discard draft runs shorter than this
    # adaptive n-gram gating: when a task's moving draft-acceptance rate
    # (mean of its last <=4 drafted passes) dips below this, it stops
    # drafting and rejoins chained decode, re-probing with one drafted
    # pass every lookup_probe_every generated tokens. Low-acceptance
    # prose otherwise forces per-token verify passes whose host sync
    # costs ~7x of chained decode (VERDICT r3 #5). 0 disables gating.
    lookup_min_accept: float = 0.66
    lookup_probe_every: int = 64
    # draft-model speculative rounds per dispatch (see _spec_chain): the
    # accept/advance bookkeeping runs on device so one host sync covers
    # up to spec_rounds * (draft_max + 1) tokens. 1 = per-round syncs.
    spec_rounds: int = 4
    # chained decode: sample this many tokens per device dispatch when no
    # draft/grammar/rate-limit path needs per-token host control (1 = off)
    decode_chain: int = 1
    # pipelined chains: dispatch chain N+1 (device-resident token0) before
    # syncing chain N, overlapping the device with the host's sync +
    # detokenize/stop-scan work (False = strictly alternating)
    pipeline_chain: bool = True
    # how many speculative chains to keep in flight beyond the one being
    # synced. Each chain's device->host copy is issued immediately after
    # its dispatch (in-order transport) and drained by the transfer
    # thread, so extra in-flight chains no longer delay syncs. Measured
    # (serving bench, 2026-08-20): depth 1 = 1868.6 tok/s (spread 1610-
    # 1948), depth 2 = 1956.5 (spread <1%), depth 3 = 1773 with TTFT
    # 119ms (in-flight chains delay the next burst's prefill) -> 2.
    pipeline_depth: int = 2
    # adaptive first-chain length: a freshly prefilled slot forces the
    # joint chain down to this many steps (then x4 per chain until it
    # reaches decode_chain), so the first streamed tokens reach the host
    # after a ~chain_ramp-step dispatch instead of a full decode_chain one
    # — TTFT stops scaling with decode_chain. 0 disables.
    chain_ramp: int = 4


class Slot:
    __slots__ = ("idx", "capacity", "task", "cache_tokens", "pos", "state",
                 "cursor", "next_token", "last_used", "drafts", "draft_pos",
                 "rec_dirty", "chain_ramp")

    def __init__(self, idx: int, capacity: int):
        self.idx = idx
        self.capacity = capacity
        self.task: CompletionsTask | None = None
        self.cache_tokens: list[int] = []   # tokens whose KV is valid
        self.pos = 0                        # next KV write position
        self.state = "idle"                 # idle | prefill | decode
        self.cursor = 0                     # prefill progress into the prompt
        self.next_token = -1                # sampled, not yet in KV
        self.last_used = 0.0
        self.drafts: list[int] = []         # drafted tokens for next verify
        self.draft_pos = 0                  # draft-model KV progress
        # recurrent models only: the slot's state advanced past
        # cache_tokens (a decode chain discarded tail tokens) — the state
        # no longer corresponds to any token prefix, so it can't be reused
        self.rec_dirty = False
        # adaptive chain length: >0 caps the next joint chain's K for this
        # slot (set at prefill finish, x4 per chain; 0 = full decode_chain)
        self.chain_ramp = 0


class Engine:
    def __init__(self, cfg: ModelConfig, params, tokenizer,
                 ecfg: EngineConfig | None = None,
                 draft: tuple | None = None,
                 mesh=None,
                 images_pipeline=None, upscaler=None,
                 upscale_repeats: int = 1):
        """draft: optional (ModelConfig, params) of a draft model for
        speculative decoding (reference draft-model path, §2.1 #10).

        mesh: optional jax.sharding.Mesh for multi-chip serving — params
        should be loaded with the matching shard_fn (parallel/mesh.py); the
        KV cache and sampler state are sharded here and XLA GSPMD inserts
        the tp collectives inside the jitted step programs (the TPU-native
        replacement for --tensor-split/RPC, SURVEY.md §2.3)."""
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.ecfg = ecfg or EngineConfig()
        self.mesh = mesh
        self.images_pipeline = images_pipeline
        self.upscaler = upscaler           # ESRGAN x4 (diffusion/esrgan.py)
        self.upscale_repeats = upscale_repeats
        self.image_tasks: list[ImagesTask] = []
        self.embed_tasks: list = []   # embeddings/rerank, chunked per pass
        # speculative decode chains in flight (oldest first, up to
        # ecfg.pipeline_depth) — see _speculate_chain
        self._chain_q: list[dict] = []
        # pipelined M-round spec passes in flight (_dispatch_spec_chain /
        # _consume_spec_chain)
        self._spec_q: list[dict] = []
        # transfer thread: blocks on each speculated chain's device->host
        # copy (issued right after its dispatch, BEFORE any later
        # dispatch — the transport serves in order) so the reconcile
        # thread never sleeps inside np.asarray while it could be
        # dispatching chain N+2. Results land in the chain record; only
        # the reconcile thread mutates engine state.
        self._xfer_q: queue.Queue = queue.Queue()
        self._xfer_thread: threading.Thread | None = None
        # LLAMA_BOX_TPU_CHAIN_PROF=1: per-chain (pre-sync, sync, emit)
        # host-side seconds, dumped at stop() — serving-cycle breakdown
        import os
        self._chain_prof = ([] if os.environ.get("LLAMA_BOX_TPU_CHAIN_PROF")
                            else None)
        self._chain_prof_last = 0.0
        self._chain_prof_spec = 0.0

        S = self.ecfg.n_slots
        self.slot_ctx = max(16, self.ecfg.n_ctx // S)
        if self.ecfg.lookup_ngram_min > 0 \
                and self.ecfg.decode_chain > self.ecfg.draft_max + 1:
            SRV_WRN("engine", "n-gram lookup drafting is dominated by "
                    "chained decode (decode_chain=%d > draft_max+1=%d "
                    "tokens per host sync) and will not engage; lower "
                    "--decode-chain or raise --draft-max to use it",
                    self.ecfg.decode_chain, self.ecfg.draft_max + 1)
        self.rec = bool(cfg is not None and getattr(cfg, "recurrent", False))
        # encoder-decoder family (t5): encoder runs once per prompt, the
        # decoder owns the KV cache; no prefix reuse / shift / drafting
        self.encdec = bool(params is not None and "dec" in params)
        if self.encdec:
            if draft is not None:
                raise ValueError("speculative decoding is not supported "
                                 "for encoder-decoder (t5) models")
            if self.ecfg.lookup_ngram_min > 0:
                SRV_WRN("engine", "n-gram lookup drafting disabled for "
                        "encoder-decoder model")
                self.ecfg = dataclasses.replace(self.ecfg,
                                                lookup_ngram_min=0)
            from ..models.t5_serve import init_t5_cache
            n_dec = params["dec"]["wq"].shape[0]
            self.kv = init_t5_cache(cfg, S, self.slot_ctx,
                                    enc_capacity=self.slot_ctx,
                                    n_dec_layers=n_dec,
                                    dtype=jnp.dtype(self.ecfg.kv_dtype))
            self.rope_cos = self.rope_sin = jnp.zeros((1,), jnp.float32)
            self.delta_cos = self.delta_sin = None
            self.delta_select = None
            self.sstate = init_sampler_state(S, cfg.vocab_size)
        if self.encdec:
            pass   # cache/sampler initialized above
        elif self.rec and params is not None:
            # recurrent (mamba) family: O(1) per-slot state, no KV cache;
            # context shift and speculative decoding are structurally
            # unsupported (state is cumulative — the reference refuses
            # shifts for recurrent models too)
            if draft is not None:
                raise ValueError("speculative decoding is not supported "
                                 "for recurrent (mamba) models")
            if self.ecfg.lookup_ngram_min > 0:
                SRV_WRN("engine", "n-gram lookup drafting disabled for "
                        "recurrent model")
                self.ecfg = dataclasses.replace(self.ecfg,
                                                lookup_ngram_min=0)
            from ..models.mamba import init_rec_cache
            self.kv = init_rec_cache(cfg, S, capacity=self.slot_ctx,
                                     params=params,
                                     dtype=jnp.dtype(self.ecfg.kv_dtype))
            if cfg.n_heads > 0:   # hybrid: attention layers may use rope
                self.rope_cos, self.rope_sin = make_rope(cfg, self.slot_ctx)
            else:
                self.rope_cos = self.rope_sin = jnp.zeros((1,), jnp.float32)
            self.delta_cos = self.delta_sin = None
            self.delta_select = None
            self.sstate = init_sampler_state(S, cfg.vocab_size)
        elif params is not None:
            kv_dtype = jnp.dtype(self.ecfg.kv_dtype)
            self.kv = init_kv_cache(cfg, S, self.slot_ctx, kv_dtype)
            self.rope_cos, self.rope_sin = make_rope(cfg, self.slot_ctx)
            self.delta_cos, self.delta_sin = make_delta_rope(cfg,
                                                             self.slot_ctx)
            from ..models.llama import _layer_is_local
            self.delta_select = (_layer_is_local(cfg)
                                 if self.delta_cos.ndim == 3 else None)
            self.sstate = init_sampler_state(S, cfg.vocab_size)
        else:
            # image-only server (the reference's sd-model dispatch,
            # engine.cpp): no LM, only ImagesTask work reaches the loop
            self.kv = self.sstate = None
            self.rope_cos = self.rope_sin = None
            self.delta_cos = self.delta_sin = None
        self.eog_ids = sorted(tokenizer.eog_ids) if tokenizer else []
        self._default_sp = SamplerParams()
        self.arrs = make_sampler_arrays([self._default_sp] * S, self.eog_ids)
        self._arrs_dirty = False

        if mesh is not None:
            from ..parallel import shard_kv, shard_sampler_state
            if not self.rec and not self.encdec:
                self.kv = shard_kv(mesh, self.kv)   # rec/t5 replicated
            self.sstate = shard_sampler_state(mesh, self.sstate)

        self.draft_cfg = self.draft_params = None
        self.draft_kv = None
        if draft is not None:
            self.draft_cfg, self.draft_params = draft
            if self.draft_cfg.vocab_size != cfg.vocab_size:
                raise ValueError(
                    "draft model vocab differs from main model "
                    f"({self.draft_cfg.vocab_size} vs {cfg.vocab_size})")
            self.draft_kv = init_kv_cache(self.draft_cfg, S, self.slot_ctx,
                                          kv_dtype)
            if mesh is not None:
                from ..parallel import shard_kv
                self.draft_kv = shard_kv(mesh, self.draft_kv)
            self.draft_cos, self.draft_sin = make_rope(self.draft_cfg,
                                                       self.slot_ctx)
            self.draft_delta_cos, self.draft_delta_sin = make_delta_rope(
                self.draft_cfg, self.slot_ctx)
            from ..models.llama import _layer_is_local
            self.draft_delta_select = (
                _layer_is_local(self.draft_cfg)
                if self.draft_delta_cos.ndim == 3 else None)

        self.buckets = tuple(b for b in DEFAULT_BUCKETS
                             if b <= max(self.ecfg.n_ubatch, 16))
        self.slots = [Slot(i, self.slot_ctx) for i in range(S)]
        self.queue: queue.Queue[BaseTask] = queue.Queue()
        self.control = None  # parallel/controller.ControlPlane (multi-host)
        self.n_lora = 0                  # dynamic (per-request) adapters
        self.lora_default: list[float] = []
        self._lora_rows = None           # np [S, n_lora] slot scale rows
        self.metrics = Metrics()
        # last decode-accounting timestamp: pipelined passes' dispatch->
        # consume windows overlap, so /metrics decode time is accounted
        # over non-overlapping [max(t0, last), now) windows
        self._decode_acct_ts = 0.0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> None:
        self.fuse_params()
        self._xfer_thread = threading.Thread(target=self._xfer_loop,
                                             daemon=True, name="xfer")
        self._xfer_thread.start()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="reconcile")
        self._thread.start()

    def _xfer_loop(self) -> None:
        while True:
            rec = self._xfer_q.get()
            if rec is None:
                return
            try:
                rec["toks_h"] = np.asarray(rec["toks"])
                if rec.get("want_probs"):
                    rec["ids_h"] = np.asarray(rec["ids"])
                    rec["probs_h"] = np.asarray(rec["probs"])
                    rec["tokps_h"] = np.asarray(rec["tokps"])
            except Exception as exc:  # noqa: BLE001 — surfaced at consume
                rec["err"] = exc
            rec["ev"].set()

    def fuse_params(self) -> None:
        """Single-device decode-bandwidth optimization: fuse per-layer
        q/k/v and gate/up projections into single matmuls (bitwise
        identical outputs; see loader.fuse_projections). Runs at start()
        so static-LoRA merges and dynamic-LoRA stacking (which index the
        unfused keys) happen first. Worker mode calls this explicitly
        (cli) so replicas execute the same fused program as host 0."""
        if self.mesh is not None or self.params is None or self.rec \
                or self.encdec:
            return
        from ..models.bert import BERT_ARCHS
        if self.cfg.arch in BERT_ARCHS:
            return  # the BERT encoder forward uses the unfused keys
        from ..models.loader import deinterleave_rope, fuse_projections
        if self.n_lora == 0:
            # rope layout: adjacent-pair -> half-split (see loader);
            # rope tables are layout-independent, so those built in
            # __init__ stay valid
            self.params, self.cfg = deinterleave_rope(self.params,
                                                      self.cfg)
        self.params = fuse_projections(self.params, self.cfg)
        if self.draft_params is not None:
            self.draft_params, self.draft_cfg = deinterleave_rope(
                self.draft_params, self.draft_cfg)
            self.draft_params = fuse_projections(self.draft_params,
                                                 self.draft_cfg)

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=30)
        if self._xfer_thread:
            self._xfer_q.put(None)
            self._xfer_thread.join(timeout=30)
            self._xfer_thread = None
        if self._chain_prof:
            import sys
            n = len(self._chain_prof)
            pre = sum(p[0] for p in self._chain_prof[1:]) / max(n - 1, 1)
            spc = sum(p[1] for p in self._chain_prof) / n
            syn = sum(p[2] for p in self._chain_prof) / n
            emi = sum(p[3] for p in self._chain_prof) / n
            print(f"# chain_prof n={n} gap={pre * 1e3:.2f}ms "
                  f"spec={spc * 1e3:.2f}ms sync={syn * 1e3:.2f}ms "
                  f"emit={emi * 1e3:.2f}ms",
                  file=sys.stderr, flush=True)
            print("# chain_prof rows (gap, spec, sync, emit) ms: "
                  + "; ".join(
                      ",".join(f"{v * 1e3:.1f}" for v in p)
                      for p in self._chain_prof),
                  file=sys.stderr, flush=True)
            self._chain_prof = []

    def configure_lora(self, n_adapters: int,
                       default_scales: list[float]) -> None:
        """Enable per-request LoRA: per-slot scale rows feed the forward's
        low-rank deltas (models/lora.py:stack_dynamic)."""
        self.n_lora = n_adapters
        self.lora_default = list(default_scales)
        self._lora_rows = np.tile(np.asarray(default_scales, np.float32),
                                  (len(self.slots), 1))
        self.params["lora_scales"] = jnp.asarray(self._lora_rows)

    def _set_lora_row(self, slot: int, lora: tuple) -> None:
        if self.n_lora == 0:
            return
        row = np.asarray(self.lora_default, np.float32).copy()
        for aid, scale in lora or ():
            if 0 <= aid < self.n_lora:
                row[aid] = scale
        if not np.array_equal(self._lora_rows[slot], row):
            self._lora_rows[slot] = row
            self.params["lora_scales"] = jnp.asarray(self._lora_rows)

    def submit(self, task: BaseTask) -> None:
        self.metrics.n_requests += 1
        self.queue.put(task)

    def verify_replicas(self, timeout: float = 60.0) -> None:
        """Multi-host consistency check: broadcast host 0's device-state
        digest; every worker recomputes its own and reports err on
        divergence. Blocks until all workers ack (i.e. have fully drained
        the plan stream and match). No-op without a control plane.
        Call while the engine is quiescent (no in-flight passes): a plan
        broadcast between the digest snapshot and its broadcast would
        mismatch spuriously."""
        if self.control is None:
            return
        from ..parallel.controller import state_digest, state_leaf_digests
        seq = self.control.broadcast(
            "check_digest", {},
            {"digest": state_digest(self),
             "leaves": state_leaf_digests(self)})
        self.control.wait_acked(seq, timeout)

    # -- reconcile loop ------------------------------------------------------

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                self._reconcile()
            except Exception as exc:  # noqa: BLE001 — keep serving
                SRV_ERR("reconcile", "pass failed: %r", exc)
                self._fail_all(exc)
                # don't spin when the failure is persistent (e.g. a dead
                # worker fails every pass until it rejoins)
                self._stop.wait(0.2)

    def _fail_all(self, exc: Exception) -> None:
        for s in self.slots:
            if s.task is not None:
                s.task.fail(exc)
                self._release(s)

    def _reconcile(self) -> None:
        if self.control is not None:
            # fail tasks on a dead/diverged worker instead of hanging the
            # next collective (reference: rpcserver retry/diagnose loop)
            self.control.check_health()
        self._admit()
        images_busy = self._images_pass()
        embed_busy = self._embed_pass()
        pre = [s for s in self.slots if s.state == "prefill"]
        if pre:
            self._prefill_pass(pre)
            return
        dec = [s for s in self.slots if s.state == "decode"]
        if dec:
            self._decode_pass(dec)
            return
        if images_busy or embed_busy:
            return
        # nothing active: block briefly for work
        try:
            task = self.queue.get(timeout=0.2)
        except queue.Empty:
            return
        self._dispatch(task)

    # -- admission -----------------------------------------------------------

    def _admit(self) -> None:
        while any(s.state == "idle" for s in self.slots):
            try:
                task = self.queue.get_nowait()
            except queue.Empty:
                return
            self._dispatch(task)

    def _dispatch(self, task: BaseTask) -> None:
        if task.cancelled:
            return
        if getattr(task, "_dispatched", False):
            SRV_ERR("dispatch", "task %s submitted twice; ignoring duplicate",
                    task.rid)
            return
        task._dispatched = True
        try:
            if isinstance(task, CompletionsTask):
                self._admit_completion(task)
            elif isinstance(task, EmbeddingsTask):
                self._admit_embed(task, task.inputs,
                                  self.cfg.pooling
                                  if self.cfg.pooling not in ("none", "rank")
                                  else "mean")
            elif isinstance(task, RerankTask):
                self._admit_embed(task, task.pairs, "rank")
            elif isinstance(task, ImagesTask):
                self._admit_images(task)
            else:
                raise ValueError(f"unknown task kind {task.kind}")
        except Exception as exc:  # noqa: BLE001
            SRV_ERR("dispatch", "task %s failed: %r", task.rid, exc)
            task.fail(exc)

    def _admit_completion(self, task: CompletionsTask) -> None:
        if not task.prompt_tokens:
            # an empty tokenization degrades to [BOS] like the reference's
            # llama_tokenize(add_special=true); without a BOS it's an error
            bos = self.tokenizer.bos_id if self.tokenizer else None
            if bos is None:
                task.fail(ValueError("prompt tokenized to zero tokens"))
                return
            task.prompt_tokens = [bos]
        idle = [s for s in self.slots if s.state == "idle"]
        if not idle:
            # re-queue (and clear the duplicate guard so the retry passes)
            task._dispatched = False
            self.queue.put(task)
            return

        # resolve n_keep; squeeze over-long prompts (httpserver.hpp:5714-5738)
        n_keep = task.n_keep if task.n_keep >= 0 else len(task.prompt_tokens)
        n_keep = min(n_keep, self.slot_ctx // 2)
        max_len = self.slot_ctx - self.ecfg.defrag_headroom
        if len(task.prompt_tokens) > max_len:
            if task.chunks is not None:
                raise ValueError(
                    "multimodal prompt exceeds the per-slot context "
                    f"({len(task.prompt_tokens)} > {max_len} tokens)")
            # reference erases whole blocks of size n_left/2 after n_keep
            # (httpserver.hpp:5603-5615); computed against max_len so the
            # squeezed prompt honours defrag headroom
            n_block = max(1, (max_len - n_keep) // 2)
            n_erased = (len(task.prompt_tokens) - n_keep - n_block) \
                // n_block
            drop = max(n_erased, 1) * n_block
            drop = max(drop, len(task.prompt_tokens) - max_len)
            task.prompt_tokens = (task.prompt_tokens[:n_keep]
                                  + task.prompt_tokens[n_keep + drop:])
            task.truncated = True
        task.n_keep = n_keep

        # prefix-cache slot selection by longest common prefix
        best = max(idle, key=lambda s: (
            longest_common_prefix(s.cache_tokens, task.prompt_tokens),
            -s.last_used))
        lcp = longest_common_prefix(best.cache_tokens, task.prompt_tokens)
        reuse = min(lcp, len(task.prompt_tokens) - 1)
        if not self.ecfg.prompt_cache:
            reuse = 0
        if self.cfg.swa_window > 0 and reuse < len(task.prompt_tokens) - 1:
            reuse = 0  # partial reuse would dip below the SWA window
        if self.rec and (best.rec_dirty
                         or reuse != len(best.cache_tokens)):
            # recurrent state corresponds to ALL cached tokens — reuse is
            # exact-extension-only (no per-position state checkpoints)
            reuse = 0
        if self.encdec:
            reuse = 0   # every prompt re-encodes; no decoder-KV reuse

        # cross-slot shared-prefix reuse: another slot (typically a sibling
        # decoding the same system prompt) may share a much longer prefix —
        # device-copy its rows instead of recomputing them
        share_min = self.ecfg.cache_share_min
        if (self.ecfg.prompt_cache and share_min >= 0 and not self.rec
                and self.cfg.swa_window <= 0):
            donor, donor_l = None, reuse
            for t in self.slots:
                if t is best:
                    continue
                l = min(longest_common_prefix(t.cache_tokens,
                                              task.prompt_tokens),
                        len(task.prompt_tokens) - 1, t.pos)
                if l > donor_l and l - reuse >= share_min:
                    donor, donor_l = t, l
            if donor is not None:
                if self.control is not None:
                    self.control.broadcast(
                        "copy_kv_prefix", {},
                        {"src": donor.idx, "dst": best.idx, "n": donor_l})
                self.kv = copy_kv_prefix(self.kv, jnp.int32(donor.idx),
                                         jnp.int32(best.idx),
                                         jnp.int32(donor_l))
                reuse = donor_l
                SRV_DBG("admit", "slot %d shares %d prefix rows from "
                        "slot %d", best.idx, donor_l, donor.idx)

        s = best
        s.task = task
        s.state = "prefill"
        if self.encdec:
            # decoder positions: start token at 0, generated tokens from
            # 1; no context shift — cap the budget at the boundary
            cap = s.capacity - 1
            task.max_tokens = (cap if task.max_tokens <= 0
                               else min(task.max_tokens, cap))
        if self.rec:
            s.rec_dirty = False
            if reuse == 0:
                from ..models.mamba import reset_rec_slot
                if self.control is not None:
                    self.control.broadcast("reset_rec_slot", {},
                                           {"slot": s.idx})
                self.kv = reset_rec_slot(self.kv, jnp.int32(s.idx))
            # no context shift for recurrent state: cap generation so the
            # request finishes with "length" at the slot boundary instead
            cap = s.capacity - len(task.prompt_tokens)
            task.max_tokens = (cap if task.max_tokens <= 0
                               else min(task.max_tokens, cap))
        s.cache_tokens = task.prompt_tokens[:reuse]
        s.pos = reuse
        s.cursor = reuse
        s.next_token = -1
        s.last_used = time.monotonic()
        task.n_cached = reuse
        task.t_start_prefill = time.monotonic()

        # reset + seed the sampler slot; prompt participates in penalties
        sp = task.sparams
        if self.control is not None:
            self.control.broadcast("reset_slot", {},
                                   {"slot": s.idx,
                                    "seed": sp.seed & 0xFFFFFFFF})
        self.sstate = reset_slot(self.sstate, jnp.int32(s.idx),
                                 jnp.uint32(sp.seed & 0xFFFFFFFF))
        last_n = min(sp.penalty_last_n if sp.penalty_last_n >= 0 else RING_CAP,
                     RING_CAP)
        if last_n > 0 and task.prompt_tokens:
            # clamp image dummy ids (negative) out of the penalty window
            window = [t if t >= 0 else 0 for t in task.prompt_tokens[-last_n:]]
            buf = np.full(RING_CAP, -1, np.int32)
            buf[:len(window)] = window
            if self.control is not None:
                self.control.broadcast("push_tokens", {"tokens": buf},
                                       {"slot": s.idx, "n": len(window),
                                        "last_n": last_n})
            self.sstate = push_tokens(
                self.sstate, jnp.int32(s.idx), jnp.asarray(buf),
                jnp.int32(len(window)), jnp.int32(last_n))
        self._arrs_dirty = True

        # grammar/mirostat/DRY requests sample host-side (lazy-grammar
        # semantics of sampling.patch; SURVEY.md §7 hard part (e))
        if sp.needs_host_sampler and not hasattr(task, "host_sampler"):
            from ..sampling import HostSampler
            task.host_sampler = HostSampler(sp, sp.grammar, self.tokenizer)
            task.host_sampler.push_prompt(task.prompt_tokens)

        # n-gram prompt-lookup drafting cache (httpserver.hpp:4752-4767);
        # not built when drafting is dominated by chained decode — the
        # per-token cache updates would be pure overhead
        if self.ecfg.lookup_ngram_min > 0 and not self._ngram_dominated() \
                and not hasattr(task, "ngram"):
            from .ngram import NgramCache
            task.ngram = NgramCache(n_min=self.ecfg.lookup_ngram_min)
            task.ngram.update(task.prompt_tokens)
        s.drafts = []
        s.draft_pos = 0
        self._set_lora_row(s.idx, task.lora)
        SRV_DBG("admit", "task %s -> slot %d reuse=%d prompt=%d",
                task.rid, s.idx, reuse, len(task.prompt_tokens))

    def _refresh_arrs(self) -> None:
        if not self._arrs_dirty:
            return
        plist = [s.task.sparams if s.task is not None else self._default_sp
                 for s in self.slots]
        self.arrs = make_sampler_arrays(plist, self.eog_ids)
        if self.control is not None:
            self.control.broadcast(
                "set_arrs", {k: np.asarray(v)
                             for k, v in self.arrs._asdict().items()})
        self._arrs_dirty = False

    # -- prefill -------------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _chunk_at(self, task, cursor: int):
        """Locate the prompt chunk containing flat position `cursor`;
        returns (chunk_start, chunk_end, chunk)."""
        if task.chunks is None:
            return 0, len(task.prompt_tokens), ("tokens", task.prompt_tokens)
        start = 0
        for ch in task.chunks:
            n = len(ch[1])
            if cursor < start + n:
                return start, start + n, ch
            start += n
        raise RuntimeError("prefill cursor out of range")

    def _prefill_pass(self, pre: list) -> None:
        """Prefill all pending slots this pass. Plain-text chunks batch into
        ONE fused program (reference packs prefills into one llama_decode);
        multimodal/mrope chunks take the single-slot path."""
        if self.encdec:
            for s in pre:
                if s.task.cancelled:
                    self._release(s)
                    continue
                self._t5_prefill_slot(s)
            return
        batchable = []
        for s in pre:
            task = s.task
            if task.cancelled:
                self._release(s)
                continue
            if task.chunks is None and self.control is None \
                    and not self.cfg.mrope_sections:
                batchable.append(s)
            else:
                self._prefill_chunk(s)
        if len(batchable) == 1:
            self._prefill_chunk(batchable[0])
        elif batchable:
            self._prefill_batch(batchable)

    def _prefill_batch(self, slots: list) -> None:
        """Batched prefill with TTFT-optimized finishing: first tokens for
        every completing slot are sampled in ONE device dispatch and reach
        the host with ONE sync (the per-slot sample_one path paid a full
        tunnel round trip PER SLOT — 4 simultaneous 512-token prompts went
        166.8 -> ~73 ms TTFT p50 on-chip from this change alone)."""
        t0 = time.monotonic()
        # NOTE: group-splitting was measured WORSE through the tunnel
        # (110 vs 73 ms p50): the batched program computes all S rows
        # regardless of n_valid, so each group costs full device time.
        logits, done, total = self._prefill_batch_dispatch(slots)
        pend = self._finish_batch_dispatch(done, logits)
        self._speculate_post_prefill(pend)
        self._finish_batch_sync(pend)
        self.metrics.on_prefill(total, (time.monotonic() - t0) * 1e3)

    def _prefill_batch_dispatch(self, slots: list):
        """Dispatch one batched prefill program + host bookkeeping, NO
        device sync. Returns ([S, V] device logits, completed slots,
        n_prefilled_tokens)."""
        S = len(self.slots)
        chunks = {}
        for s in slots:
            rem = len(s.task.prompt_tokens) - s.cursor
            chunks[s.idx] = min(rem, self.ecfg.n_ubatch)
        bucket = self._bucket(max(chunks.values()))
        tokens = np.zeros((S, bucket), np.int32)
        pos_base = np.zeros((S,), np.int32)
        n_valid = np.zeros((S,), np.int32)
        for s in slots:
            n = chunks[s.idx]
            tokens[s.idx, :n] = s.task.prompt_tokens[s.cursor:s.cursor + n]
            pos_base[s.idx] = s.pos
            n_valid[s.idx] = n
        AL = min(self.slot_ctx, -(-max(int(pos_base.max()), 1) // 256) * 256)
        if self.rec:
            from ..models.mamba import rec_prefill_batch
            logits, self.kv = rec_prefill_batch(
                self.params, self.cfg, jnp.asarray(tokens),
                jnp.asarray(pos_base), jnp.asarray(n_valid), self.kv,
                self.rope_cos, self.rope_sin)
        else:
            # contiguous per-slot window writes need every slot's window
            # inside capacity (near-capacity chunks use gather-scatter)
            contig = bool(np.all(pos_base + bucket <= self.slot_ctx))
            logits, self.kv = prefill_batch(
                self.params, self.cfg, jnp.asarray(tokens),
                jnp.asarray(pos_base), jnp.asarray(n_valid), self.kv,
                self.rope_cos, self.rope_sin, attn_len=AL,
                contig_write=contig)
        done = []
        for s in slots:
            n = chunks[s.idx]
            s.cache_tokens.extend(s.task.prompt_tokens[s.cursor:s.cursor + n])
            s.cursor += n
            s.pos += n
            if s.cursor >= len(s.task.prompt_tokens):
                done.append(s)
        return logits, done, int(sum(chunks.values()))

    def _finish_batch_dispatch(self, done: list, logits) -> dict:
        """Sample first tokens for all completed slots in ONE device
        dispatch — no host sync yet."""
        dev = [s for s in done
               if getattr(s.task, "host_sampler", None) is None]
        hs = [s for s in done
              if getattr(s.task, "host_sampler", None) is not None]
        pend = {"dev": dev, "hs": hs, "logits": logits}
        if dev:
            self._refresh_arrs()
            active = np.zeros((len(self.slots),), bool)
            for s in dev:
                active[s.idx] = True
            from ..sampling import sample
            tok, ids, probs, tokp, self.sstate = sample(
                logits, self.sstate, self.arrs, jnp.asarray(active))
            pend.update(tok=tok, ids=ids, probs=probs, tokp=tokp)
            # start the first-token device->host copies NOW: the
            # transport serves requests in order, so a copy requested
            # after the post-prefill speculative chain dispatch would
            # wait out that whole chain — TTFT would eat its execution
            _issue_copies(tok, ids, probs, tokp,
                          any(s.task.n_probs > 0 for s in dev))
        return pend

    def _speculate_post_prefill(self, pend: dict) -> None:
        """Dispatch the first (ramped) decode chain off the DEVICE-
        RESIDENT first tokens BEFORE the prefill host sync: the ~26ms
        tunnel round trip that delivers the first tokens then overlaps
        the chain's execution instead of idling the device (the burst-
        START counterpart of pipelined decode chains; VERDICT r4 weak
        #2). Same consume-or-reset semantics as every speculated chain:
        _consume_pending_chain checks task identity + position."""
        dev, hs = pend["dev"], pend["hs"]
        if (not self.ecfg.pipeline_chain or self.control is not None
                or self.rec or self.encdec or hs or not dev
                or self.cfg.mrope_sections or self._chain_q
                or getattr(self, "_spec_q", None)
                or self.draft_params is not None
                or (self.ecfg.lookup_ngram_min > 0
                    and not self._ngram_dominated())
                or "layer_groups" in self.params):
            return
        # every currently-decoding slot must ride a joint chain; slots
        # still prefilling later chunks are inactive rows (their KV
        # regions are untouched by the masked chain program)
        if any(s.state == "decode" and s not in dev for s in self.slots):
            return
        if any(s.task.rate_bucket is not None
               or getattr(s.task, "host_sampler", None) is not None
               or not s.task.sparams.plain for s in dev):
            return
        K = self.ecfg.decode_chain
        if self.ecfg.chain_ramp > 0:
            K = min(K, self.ecfg.chain_ramp)
        rem = max(self._remaining(s) - 1 for s in dev)  # first tok pending
        if rem < K:
            K = min(K, max(4, _pow2_floor(max(rem, 1))))
        K = min(K, _pow2_floor(min(s.capacity - s.pos for s in dev)))
        if K < 2 or rem <= 0:
            return
        S = len(self.slots)
        pos0 = np.full((S,), self.slot_ctx, np.int32)
        active = np.zeros((S,), bool)
        for s in dev:
            pos0[s.idx] = s.pos
            active[s.idx] = True
        AL = 0
        if not self._flash_chain():
            need = max(s.pos for s in dev) + K
            AL = min(self.slot_ctx, -(-need // 256) * 256)
        kw = self._chain_fast_kw(dev)
        toks, ids2, probs2, tokps2, self.kv, self.sstate = _decode_chain(
            self.params, self.cfg, pend["tok"], jnp.asarray(pos0),
            self.kv, self.sstate, self.arrs, jnp.asarray(active),
            self.rope_cos, self.rope_sin, n_steps=K, attn_len=AL, **kw)
        tasks = [None] * S
        for s in dev:
            tasks[s.idx] = s.task
            nxt = K * 4
            s.chain_ramp = 0 if nxt >= self.ecfg.decode_chain else nxt
        rec = {
            "toks": toks, "ids": ids2, "probs": probs2, "tokps": tokps2,
            "pos0": pos0, "active": active.copy(), "tasks": tasks,
            "k": K, "mrope": None, "t0": time.monotonic(),
            "ev": threading.Event(),
            "want_probs": any(s.task.n_probs > 0 for s in dev),
        }
        _issue_copies(toks, ids2, probs2, tokps2, rec["want_probs"])
        self._chain_q.append(rec)
        self._xfer_q.put(rec)
        pend["ramp_set"] = True

    def _finish_batch_sync(self, pend: dict) -> None:
        """Sync + emit a staged batch-finish: one host transfer for the
        device-sampled group, one batched row gather for host samplers."""
        dev, hs = pend["dev"], pend["hs"]
        if dev:
            tok_h = np.asarray(pend["tok"])
            want = any(s.task.n_probs > 0 for s in dev)
            ids_h = np.asarray(pend["ids"]) if want else None
            probs_h = np.asarray(pend["probs"]) if want else None
            tokp_h = np.asarray(pend["tokp"]) if want else None
            for s in dev:
                s.task.t_prefilled = time.monotonic()
                s.state = "decode"
                if not pend.get("ramp_set"):
                    # a post-prefill speculated chain already consumed
                    # (and advanced) this slot's ramp
                    s.chain_ramp = self.ecfg.chain_ramp
                self._accept_token(
                    s, int(tok_h[s.idx]),
                    ids_h[s.idx] if ids_h is not None else None,
                    probs_h[s.idx] if probs_h is not None else None,
                    float(tokp_h[s.idx]) if tokp_h is not None else 0.0)
        if hs:
            idxs = [s.idx for s in hs]
            batch = np.asarray(
                jnp.take(pend["logits"], jnp.asarray(idxs), axis=0))
            for k, s in enumerate(hs):
                first, ids_row, probs_row, tok_prob = \
                    s.task.host_sampler.sample(batch[k])
                s.task.t_prefilled = time.monotonic()
                s.state = "decode"
                s.chain_ramp = self.ecfg.chain_ramp
                self._accept_token(s, first, ids_row, probs_row, tok_prob)

    def _t5_prefill_slot(self, s: Slot) -> None:
        """Encoder-decoder one-shot prefill: encode the WHOLE prompt (the
        encoder is non-causal — no chunking), build the static cross-K/V,
        run decoder step 0 with the start token, sample the first token.
        Prompt padded to a bucket so a few compile shapes cover all."""
        from ..models.t5_serve import t5_prefill
        task = s.task
        t0 = time.monotonic()
        p = task.prompt_tokens
        n = len(p)
        Te = self.kv.ck.shape[2]
        if n <= self.buckets[-1]:
            T = self._bucket(n)
        else:
            T = min(-(-n // 256) * 256, Te)
        buf = np.zeros(T, np.int32)
        buf[:min(n, T)] = p[:T]
        if self.control is not None:
            self.control.broadcast("prefill", {"tokens": buf},
                                   {"slot": s.idx, "pos": 0, "n": n})
        logits, self.kv = t5_prefill(
            self.params, self.cfg, jnp.asarray(buf), self.kv,
            jnp.int32(s.idx), jnp.int32(0), jnp.int32(min(n, T)))
        s.cache_tokens = list(p)
        s.cursor = n
        s.pos = 1          # decoder consumed the start token at position 0
        self.metrics.on_prefill(n, (time.monotonic() - t0) * 1e3)
        self._finish_prefill(s, logits)

    def _finish_prefill(self, s: Slot, last_logits) -> None:
        """Prompt complete: sample the first token from the prefill logits."""
        task = s.task
        hs = getattr(task, "host_sampler", None)
        if hs is not None:
            first, ids_row, probs_row, tok_prob = hs.sample(
                np.asarray(last_logits))
        else:
            self._refresh_arrs()
            if self.control is not None:
                self.control.broadcast(
                    "sample_one", {"logits": np.asarray(last_logits)},
                    {"slot": s.idx})
            tok, ids, probs, tokp, self.sstate = sample_one(
                last_logits, jnp.int32(s.idx), self.sstate, self.arrs)
            first = int(tok[s.idx])
            ids_row = np.asarray(ids)[s.idx] if task.n_probs > 0 else None
            probs_row = np.asarray(probs)[s.idx] if task.n_probs > 0 else None
            tok_prob = float(tokp[s.idx]) if task.n_probs > 0 else 0.0
        task.t_prefilled = time.monotonic()
        s.state = "decode"
        s.chain_ramp = self.ecfg.chain_ramp
        self._accept_token(s, first, ids_row, probs_row, tok_prob)

    def _prefill_chunk(self, s: Slot) -> None:
        task = s.task
        if task.cancelled:
            self._release(s)
            return
        t0 = time.monotonic()
        cstart, cend, ch = self._chunk_at(task, s.cursor)
        off = s.cursor - cstart
        chunk = min(cend - s.cursor, self.ecfg.n_ubatch)
        bucket = self._bucket(chunk)
        mrope_pos = None
        if len(ch) > 2 + (1 if ch[0] == "embed" else 0) \
                and self.cfg.mrope_sections:
            pos3 = ch[-1]
            mp_buf = np.zeros((3, bucket), np.int32)
            mp_buf[:, :chunk] = pos3[:, off:off + chunk]
            mrope_pos = jnp.asarray(mp_buf)
        if ch[0] == "tokens":
            buf = np.zeros(bucket, np.int32)
            buf[:chunk] = ch[1][off:off + chunk]
            AL = min(s.capacity, -(-max(s.pos, 1) // 256) * 256)
            if self.control is not None:
                self.control.broadcast("prefill", {"tokens": buf},
                                       {"slot": s.idx, "pos": s.pos,
                                        "n": chunk, "attn_len": AL})
            if self.rec:
                from ..models.mamba import rec_prefill
                logits, self.kv = rec_prefill(
                    self.params, self.cfg, jnp.asarray(buf), self.kv,
                    jnp.int32(s.idx), jnp.int32(s.pos), jnp.int32(chunk),
                    self.rope_cos, self.rope_sin)
            else:
                logits, self.kv = prefill(
                    self.params, self.cfg, jnp.asarray(buf), self.kv,
                    jnp.int32(s.idx), jnp.int32(s.pos), jnp.int32(chunk),
                    self.rope_cos, self.rope_sin, mrope_pos, attn_len=AL)
        else:  # embedding chunk (vision/audio); §2.1 #11
            emb = ch[1][off:off + chunk]
            buf = np.zeros((bucket, emb.shape[1]), np.float32)
            buf[:chunk] = emb
            AL = min(s.capacity, -(-max(s.pos, 1) // 256) * 256)
            if self.control is not None:
                meta = {"slot": s.idx, "pos": s.pos, "n": chunk,
                        "attn_len": AL}
                if self.cfg.arch == "gemma3":
                    meta["bidir0"] = s.pos - off
                    meta["bidir1"] = s.pos + chunk
                self.control.broadcast("prefill_embed", {"embeds": buf},
                                       meta)
            bidir = None
            if self.cfg.arch == "gemma3":
                # gemma3 image tokens attend bidirectionally within their
                # own span (llama.cpp non-causal vision window)
                bidir = (jnp.int32(s.pos - off), jnp.int32(s.pos + chunk))
            logits, self.kv = prefill_embed(
                self.params, self.cfg, jnp.asarray(buf), self.kv,
                jnp.int32(s.idx), jnp.int32(s.pos), jnp.int32(chunk),
                self.rope_cos, self.rope_sin, mrope_pos,
                bidir_span=bidir, attn_len=AL)
        s.cache_tokens.extend(
            task.prompt_tokens[s.cursor:s.cursor + chunk])
        s.cursor += chunk
        s.pos += chunk

        if s.cursor < len(task.prompt_tokens):
            self.metrics.on_prefill(chunk, (time.monotonic() - t0) * 1e3)
            return

        # prompt complete: sample the first token from the prefill logits
        self.metrics.on_prefill(chunk, (time.monotonic() - t0) * 1e3)
        self._finish_prefill(s, logits)

    # -- decode --------------------------------------------------------------

    def _make_drafts(self, s: Slot) -> list[int]:
        """Draft continuation tokens for one slot (n-gram lookup; a draft
        model plugs in here too)."""
        task = s.task
        if getattr(task, "host_sampler", None) is not None:
            return []  # grammar slots are sampled host-side, no drafting
        k = min(self.ecfg.draft_max, max(task.budget_left() - 1, 0))
        if k <= 0:
            return []
        ngram = getattr(task, "ngram", None)
        if ngram is not None:
            if not self._ngram_gate(task):
                return []
            history = task.prompt_tokens + task.generated
            return ngram.draft(history, k)
        return []

    def _ngram_dominated(self) -> bool:
        """n-gram drafting is HOST-in-the-loop (drafts need the synced
        history), so a drafted pass costs one host sync for at most
        1 + draft_max tokens and cannot pipeline. When chained decode
        moves more tokens per sync than a perfectly-accepted draft pass
        ever could, drafting is strictly dominated — skip it (and the
        probe passes) entirely. Deployments with cheap syncs run
        decode_chain=1 and keep full n-gram drafting."""
        return self.ecfg.decode_chain > self.ecfg.draft_max + 1

    def _ngram_gate(self, task) -> bool:
        """May this task n-gram-draft this pass? Moving-acceptance gating
        (VERDICT r3 #5): held tasks rejoin chained decode and re-probe
        with ONE drafted pass every lookup_probe_every tokens (the n-gram
        cache keeps learning from chain-emitted tokens meanwhile)."""
        if self._ngram_dominated():
            return False
        if self.ecfg.lookup_min_accept <= 0:
            return True
        if not hasattr(task, "spec_window"):
            task.spec_window = []       # last <=4 per-pass accept ratios
            task.spec_resume_at = -1    # generated-count to re-probe at
            task.spec_probe = False     # next drafted pass is a probe
            return True
        if task.spec_resume_at >= 0:
            if len(task.generated) < task.spec_resume_at:
                return False
            task.spec_resume_at = -1
            task.spec_window = []
            task.spec_probe = True      # one pass decides
        return True

    def _ngram_may_draft(self, task, ahead: int = 0) -> bool:
        """Non-mutating hold check: could this task draft within the next
        `ahead` emitted tokens? (Used to decide whether chain pipelining
        would bypass a drafting opportunity.)"""
        if self.ecfg.lookup_min_accept <= 0:
            return True
        ra = getattr(task, "spec_resume_at", -1)
        return ra < 0 or len(task.generated) + ahead >= ra

    def _ngram_observe(self, task, drafted: int, accepted: int) -> None:
        """Fold one drafted pass's acceptance into the task's moving
        window; hold drafting when the mean dips below the threshold."""
        th = self.ecfg.lookup_min_accept
        if th <= 0 or drafted <= 0 or not hasattr(task, "spec_window"):
            return
        win = task.spec_window
        win.append(accepted / drafted)
        if len(win) > 4:
            win.pop(0)
        need = 1 if task.spec_probe else 2
        if len(win) >= need and sum(win) / len(win) < th:
            task.spec_resume_at = (len(task.generated)
                                   + self.ecfg.lookup_probe_every)
        task.spec_probe = False

    def _draft_model_pass(self, dec: list, sync: bool = True):
        """Batched draft-model drafting for every decoding slot: catch the
        draft KV up to the main sequence, then greedy-draft up to draft_max
        tokens, stopping per-slot when the draft prob dips below p_min.

        sync=False (fused single-sync pass): returns the DEVICE packed
        [K+1, S] draft array (rows 0..K-1 tokens, row K the confident-run
        length) without transferring it — the verify dispatch consumes it
        device-side and the host reads drafts + verify results in one
        transfer (_decode_pass fused path). Returns None when nothing is
        eligible."""
        K = self.ecfg.draft_max
        S = len(self.slots)
        eligible = [s for s in dec
                    if getattr(s.task, "host_sampler", None) is None
                    and s.task.budget_left() > 1
                    and s.pos + 1 + K <= s.capacity]
        for s in dec:
            s.drafts = []
        if not eligible:
            return None
        self._draft_catch_up(eligible)
        token0 = np.zeros((S,), np.int32)
        pos0 = np.full((S,), self.slot_ctx, np.int32)
        active = np.zeros((S,), bool)
        for s in eligible:
            token0[s.idx] = s.next_token
            pos0[s.idx] = s.pos
            active[s.idx] = True
        packed, self.draft_kv = _draft_chain_greedy(
            self.draft_params, self.draft_cfg, jnp.asarray(token0),
            jnp.asarray(pos0), self.draft_kv, jnp.asarray(active),
            self.draft_cos, self.draft_sin,
            jnp.float32(self.ecfg.draft_p_min), n_steps=K)
        for s in eligible:
            s.draft_pos = s.pos + 1  # next_token now in the draft KV
        if not sync:
            return packed, eligible
        packed_h = np.asarray(packed)   # ONE transfer for the whole run
        for s in eligible:
            n_ok = int(packed_h[K, s.idx])
            d = [int(t) for t in packed_h[:n_ok, s.idx]]
            s.drafts = d if len(d) >= self.ecfg.draft_min else []
        return None

    def _draft_catch_up(self, eligible: list) -> None:
        """Feed tokens the draft KV hasn't seen, in ubatch-sized chunks
        (after a context shift this can be the whole history); the final
        chunk feeds through [next_token]'s predecessor so drafting can
        start from next_token."""
        S = len(self.slots)
        missing = {s.idx: s.cache_tokens[s.draft_pos:] for s in eligible}
        while any(missing.values()):
            T = self._bucket(min(max(len(m) for m in missing.values()),
                                 self.ecfg.n_ubatch))
            tokens = np.zeros((S, T), np.int32)
            positions = np.full((S, T), self.slot_ctx, np.int32)
            seq_lens = np.zeros((S,), np.int32)
            for s in eligible:
                m = missing[s.idx][:T]
                if not m:
                    continue
                start = s.pos - len(missing[s.idx])
                tokens[s.idx, :len(m)] = m
                positions[s.idx, :len(m)] = np.arange(start,
                                                      start + len(m))
                seq_lens[s.idx] = len(m)
                missing[s.idx] = missing[s.idx][len(m):]
            _, _, self.draft_kv = _draft_forward_greedy(
                self.draft_params, self.draft_cfg, jnp.asarray(tokens),
                jnp.asarray(positions), self.draft_kv,
                jnp.asarray(seq_lens), self.draft_cos, self.draft_sin)

    def _decode_pass_spec_chain(self, dec: list, M: int) -> None:
        """M draft+verify rounds in ONE dispatch + ONE host sync (see
        _spec_chain), pipelined like plain chains: the next spec pass is
        dispatched with the current pass's device-resident token0/pos/
        catch-up carry before the current transfer is consumed, hiding
        the per-pass dispatch latency. Tokens past a task's finish point
        are discarded host-side (_decode_pass_chain's overshoot
        semantics)."""
        S = len(self.slots)
        self._draft_catch_up(dec)
        self._refresh_arrs()
        token0 = np.zeros((S,), np.int32)
        pos0 = np.full((S,), self.slot_ctx, np.int32)
        for s in dec:
            token0[s.idx] = s.next_token
            pos0[s.idx] = s.pos
        self._dispatch_spec_chain(dec, M, jnp.asarray(token0),
                                  jnp.asarray(pos0), None, pos0_h=pos0)
        self._consume_spec_chain(dec)

    def _dispatch_spec_chain(self, dec: list, M: int, token0, pos0,
                             pcarry, pos0_h=None) -> None:
        """Dispatch one M-round spec chain + issue its transfers; append
        to the spec queue. token0/pos0 may be device-resident (pipelined
        follow-ups); pos0_h is the host's known start positions (None for
        speculative dispatches — filled in when the predecessor emits)."""
        K = self.ecfg.draft_max
        S = len(self.slots)
        active = np.zeros((S,), bool)
        for s in dec:
            active[s.idx] = True
        if pcarry is None:
            pcarry = (jnp.zeros((S, K + 1), jnp.int32),
                      jnp.zeros((S,), jnp.int32),
                      jnp.zeros((S,), jnp.int32),
                      jnp.zeros((S,), bool))
        packed, ids, probs, tokps, tok_next, pos_end, carry, self.kv, \
            self.draft_kv, self.sstate = _spec_chain(
                self.params, self.cfg, self.draft_params, self.draft_cfg,
                token0, pos0, self.kv, self.draft_kv, self.sstate,
                self.arrs, jnp.asarray(active), self.rope_cos,
                self.rope_sin, self.draft_cos, self.draft_sin,
                jnp.float32(self.ecfg.draft_p_min),
                pcarry, n_rounds=M, draft_k=K)
        tasks = [None] * S
        for s in dec:
            tasks[s.idx] = s.task
        rec = {"toks": packed, "ids": ids, "probs": probs, "tokps": tokps,
               "tok_next": tok_next, "pos_end": pos_end,
               "carry": carry + (jnp.asarray(active),),
               "tasks": tasks, "M": M,
               "pos0_h": pos0_h, "t0": time.monotonic(),
               "ev": threading.Event(),
               "want_probs": any(s.task.n_probs > 0 for s in dec)}
        _issue_copies(packed, ids, probs, tokps, rec["want_probs"])
        self._spec_q.append(rec)
        self._xfer_q.put(rec)

    def _fill_spec_queue(self, dec: list, pend: dict) -> None:
        """Speculatively dispatch follow-up spec passes off the newest
        in-flight pass's device outputs, up to pipeline_depth. pend is
        the pass being consumed (popped but not yet emitted — its rounds
        still count as in flight). Only while even FULL acceptance of
        the in-flight rounds cannot cover every slot's budget (burst
        tails stay unpipelined), and only while every covered position
        stays within capacity (no shift can be needed mid-flight)."""
        if not self.ecfg.pipeline_chain or self.control is not None:
            return
        per_round = 1 + self.ecfg.draft_max
        while len(self._spec_q) < max(1, self.ecfg.pipeline_depth):
            newest = self._spec_q[-1] if self._spec_q else pend
            inflight = pend["M"] + sum(p["M"] for p in self._spec_q)
            if max(self._remaining(s) for s in dec) \
                    <= inflight * per_round:
                return
            M = self.ecfg.spec_rounds
            if any(s.pos + (inflight + M) * per_round > s.capacity
                   for s in dec):
                return
            self._dispatch_spec_chain(dec, M, newest["tok_next"],
                                      newest["pos_end"],
                                      newest["carry"][:4])

    def _consume_spec_chain(self, dec: list) -> bool:
        """Emit the OLDEST in-flight spec pass. Covered = same task at
        the expected position (unknown-yet positions — speculative
        dispatches — are resolved when their predecessor emits). Returns
        False with the queue dropped when nothing is covered; the
        device state of dropped work is rebuilt by re-admission
        (reset_slot + prefill), exactly like dropped plain chains."""
        pend = self._spec_q.pop(0)
        K = self.ecfg.draft_max
        T = K + 1
        M = pend["M"]
        covered = [s for s in dec
                   if s.task is not None
                   and pend["tasks"][s.idx] is s.task
                   and (pend["pos0_h"] is None
                        or s.pos == int(pend["pos0_h"][s.idx]))]
        if not covered:
            self._spec_q.clear()
            return False
        t0 = pend.get("t0", time.monotonic())
        if len(covered) == len(dec):
            self._fill_spec_queue(covered, pend)
        pend["ev"].wait()
        if "err" in pend:
            raise pend["err"]
        packed_h = pend["toks_h"]
        want = pend["want_probs"]
        ids_h = pend.get("ids_h") if want else None
        probs_h = pend.get("probs_h") if want else None
        tokps_h = pend.get("tokps_h") if want else None
        tasks0 = [s.task for s in self.slots]
        gen0 = {s.idx: len(s.task.generated) for s in covered}
        last_nem = {s.idx: 0 for s in covered}
        for m in range(M):
            alive = [s for s in covered
                     if s.task is not None and s.task is tasks0[s.idx]]
            if not alive:
                break
            toks_m = packed_h[m, :, :T]
            nem_m = packed_h[m, :, T]
            ndr_m = packed_h[m, :, T + 1]
            for s in alive:
                # synthesize the draft list: values [:acc] (all that the
                # emit bookkeeping reads) equal the accepted verify tokens
                s.drafts = [int(tk) for tk in
                            toks_m[s.idx, :int(ndr_m[s.idx])]]
                last_nem[s.idx] = int(nem_m[s.idx])
            self._emit_verify(
                alive, toks_m, nem_m,
                ids_h[m] if ids_h is not None else None,
                probs_h[m] if probs_h is not None else None,
                tokps_h[m] if tokps_h is not None else None)
        for s in covered:
            # draft-KV coverage: everything before the last round's start
            # is caught up; the next pass's catch-up refeeds that round's
            # accepted tail (<= K tokens)
            if s.task is not None and s.task is tasks0[s.idx]:
                s.draft_pos = s.pos - last_nem[s.idx] + 1
            s.drafts = []
        # count only tokens the host actually accepted (tasks0 keeps the
        # released tasks' generated lists reachable)
        n_tok = sum(len(tasks0[s.idx].generated) - gen0[s.idx]
                    for s in covered)
        self._acct_decode(n_tok, t0)
        # the NEXT queued pass starts exactly where the emitted one
        # ended — record it so its covered-check can compare
        if self._spec_q and self._spec_q[0]["pos0_h"] is None:
            nxt = np.full((len(self.slots),), -1, np.int64)
            for s in covered:
                if s.task is not None:
                    nxt[s.idx] = s.pos
            self._spec_q[0]["pos0_h"] = nxt
        return True

    def _decode_pass_fused_draft(self, dec: list) -> None:
        """Draft + verify with ONE device->host transfer per pass: the
        verify dispatch consumes the draft chain's device-resident tokens
        (host-side assembly would need a ~26ms tunnel sync first), and
        drafts + verify results come back together. Host bookkeeping
        (s.drafts, metrics, ngram) happens after the combined sync —
        output-identical to the two-sync path (verification semantics
        don't depend on where the arrays live)."""
        out = self._draft_model_pass(dec, sync=False)
        K = self.ecfg.draft_max
        S = len(self.slots)
        T = 1 + K
        self._refresh_arrs()
        t0 = time.monotonic()
        elig_mask = np.zeros((S,), bool)
        if out is not None:
            packed_dev, eligible = out
            for s in eligible:
                elig_mask[s.idx] = True
        col0 = np.zeros((S, 1), np.int32)
        pos_base = np.full((S,), self.slot_ctx, np.int32)
        active = np.zeros((S,), bool)
        for s in dec:
            col0[s.idx, 0] = s.next_token
            pos_base[s.idx] = s.pos
            active[s.idx] = True
        elig_dev = jnp.asarray(elig_mask)
        if out is not None:
            draft_toks = jnp.where(elig_dev[:, None],
                                   jnp.transpose(packed_dev[:K]), 0)
            n_draft = jnp.where(elig_dev, packed_dev[K], 0)
        else:
            draft_toks = jnp.zeros((S, K), jnp.int32)
            n_draft = jnp.zeros((S,), jnp.int32)
        tokens = jnp.concatenate([jnp.asarray(col0), draft_toks], axis=1)
        cols = jnp.arange(T, dtype=jnp.int32)[None, :]
        act_dev = jnp.asarray(active)
        positions = jnp.where(
            act_dev[:, None] & (cols <= n_draft[:, None]),
            jnp.asarray(pos_base)[:, None] + cols, self.slot_ctx)
        mrope_delta = None
        if self.cfg.mrope_sections:
            mrope_delta = jnp.asarray(
                [getattr(s.task, "mrope_delta", 0) if s.task else 0
                 for s in self.slots], jnp.int32)
        toks, n_emitted, ids, probs, tokps, logits0, self.kv, \
            self.sstate = _decode_verify_sample(
                self.params, self.cfg, tokens, positions, n_draft,
                self.kv, act_dev, act_dev, self.sstate, self.arrs,
                self.rope_cos, self.rope_sin, mrope_delta=mrope_delta)
        # the ONE transfer: verify tokens + n_emitted + drafts + n_ok
        packed_h = np.asarray(jnp.concatenate(
            [toks, n_emitted[:, None], draft_toks,
             n_draft[:, None]], axis=1))
        toks_h = packed_h[:, :T]
        n_emitted_h = packed_h[:, T]
        for s in dec:
            if elig_mask[s.idx]:
                n_ok = int(packed_h[s.idx, -1])
                s.drafts = [int(t)
                            for t in packed_h[s.idx, T + 1:T + 1 + n_ok]]
        ids_h = probs_h = tokps_h = None
        if any(s.task.n_probs > 0 for s in dec):
            ids_h = np.asarray(ids)
            probs_h = np.asarray(probs)
            tokps_h = np.asarray(tokps)
        self.metrics.on_decode(int(n_emitted_h.sum()),
                               (time.monotonic() - t0) * 1e3)
        self._emit_verify(dec, toks_h, n_emitted_h, ids_h, probs_h,
                          tokps_h)

    def _decode_pass(self, dec: list) -> None:
        # a speculatively dispatched chain from the previous pass holds
        # the tokens these slots must consume next (their device sampler
        # state already advanced through it) — use it, never re-dispatch
        if self._chain_q:
            if self._consume_pending_chain(dec):
                return
        if self._spec_q:
            if self._consume_spec_chain(dec):
                return
        # chained decode: K tokens per dispatch when no per-token host
        # control is needed this pass (drafts/grammar/rate buckets).
        # Freshly prefilled slots cap K via their ramp so the first tokens
        # stream after a short dispatch (TTFT), growing back to the
        # configured chain over the next passes.
        K = self._chain_k(dec)
        # n-gram lookup: compute drafts up front — when NO slot drafts
        # this pass (no match, or acceptance-gated hold), chained decode
        # proceeds at full speed instead of a per-token verify pass
        ngram_drafts = None
        if self.draft_params is None and self.ecfg.lookup_ngram_min > 0:
            ngram_drafts = {s.idx: self._make_drafts(s) for s in dec}
        if K > 1 and self.draft_params is None \
                and (ngram_drafts is None
                     or not any(ngram_drafts.values())) \
                and "layer_groups" not in self.params \
                and all(getattr(s.task, "host_sampler", None) is None
                        and s.task.rate_bucket is None for s in dec):
            # near capacity the chain SHRINKS (power-of-two buckets) so
            # the tail stays chained right up to the boundary; the last
            # <2 tokens take a per-token pass so the context shift fires
            # at exactly the unchained boundary
            K = min(K, _pow2_floor(min(s.capacity - s.pos for s in dec)))
            if K > 1:
                self._decode_pass_chain(dec, K)
                return
        # fused draft+verify: one device->host transfer per pass (the
        # two-sync path pays ~52ms of tunnel round trips); falls back
        # whenever a slot needs host control or could context-shift
        if (self.draft_params is not None and self.control is None
                and not self.rec and not self.encdec
                and self.ecfg.draft_min <= 1
                and all(getattr(s.task, "host_sampler", None) is None
                        and s.task.rate_bucket is None
                        and s.pos + 1 + self.ecfg.draft_max <= s.capacity
                        for s in dec)):
            # M-round device chain when every slot has room for the whole
            # chain's worst-case advance. M is NOT shrunk to the token
            # budget: burst-end overshoot costs a few discarded device
            # rounds, while each distinct M (and the one-round fused
            # tail) is a separate compiled program whose first-use
            # compile dwarfs that. Near capacity M shrinks to what fits
            # (>=2), then the one-round pass + the exact-boundary shift.
            per_round = 1 + self.ecfg.draft_max
            room = min(s.capacity - s.pos for s in dec)
            M = min(self.ecfg.spec_rounds, room // per_round)
            if M > 1 and not self.cfg.mrope_sections:
                self._decode_pass_spec_chain(dec, M)
                return
            self._decode_pass_fused_draft(dec)
            return
        # room check: each slot needs space for 1 + its drafts; shift first
        if self.draft_params is not None:
            self._draft_model_pass(dec)
        elif ngram_drafts is not None:
            for s in dec:
                s.drafts = ngram_drafts[s.idx]
        else:
            for s in dec:
                s.drafts = self._make_drafts(s)
        for s in dec:
            if s.pos + 1 + len(s.drafts) > s.capacity:
                if self.rec or self.encdec:
                    # recurrent state cannot context-shift; finish at the
                    # boundary (max_tokens is clamped at admission, so
                    # this is a belt-and-braces backstop)
                    self._finish_now(s, "length")
                else:
                    self._context_shift(s)
        dec = [s for s in dec if s.state == "decode"]
        # per-request token-rate limiting: a slot whose bucket is empty sits
        # out this pass (reference skips + re-enqueues, httpserver.hpp:4044)
        dec = [s for s in dec
               if s.task.rate_bucket is None
               or s.task.rate_bucket.try_acquire(1 + len(s.drafts))]
        if not dec:
            time.sleep(0.005)
            return
        self._refresh_arrs()
        t0 = time.monotonic()
        S = len(self.slots)
        T = 1 + (self.ecfg.draft_max if any(s.drafts for s in dec) else 0)
        tokens = np.zeros((S, T), np.int32)
        positions = np.full((S, T), self.slot_ctx, np.int32)  # sentinel
        n_draft = np.zeros((S,), np.int32)
        active = np.zeros((S,), bool)
        samp_active = np.zeros((S,), bool)
        for s in dec:
            row = [s.next_token] + s.drafts[:T - 1]
            tokens[s.idx, :len(row)] = row
            positions[s.idx, :len(row)] = np.arange(s.pos, s.pos + len(row))
            n_draft[s.idx] = len(row) - 1
            active[s.idx] = True
            samp_active[s.idx] = \
                getattr(s.task, "host_sampler", None) is None

        if self.control is not None:
            self.control.broadcast(
                "decode",
                {"tokens": tokens, "positions": positions, "n_draft": n_draft,
                 "active": active, "samp_active": samp_active}, {})
        mrope_delta = None
        if self.cfg.mrope_sections:
            mrope_delta = jnp.asarray(
                [getattr(s.task, "mrope_delta", 0) if s.task else 0
                 for s in self.slots], jnp.int32)
        if self.rec:
            from ..models.mamba import rec_decode_verify_sample
            decode_fn = rec_decode_verify_sample
        elif self.encdec:
            from ..models.t5_serve import t5_decode_verify_sample
            decode_fn = t5_decode_verify_sample
        else:
            decode_fn = _decode_verify_sample
        toks, n_emitted, ids, probs, tokps, logits0, self.kv, self.sstate = \
            decode_fn(
                self.params, self.cfg, jnp.asarray(tokens),
                jnp.asarray(positions), jnp.asarray(n_draft), self.kv,
                jnp.asarray(active), jnp.asarray(samp_active), self.sstate,
                self.arrs, self.rope_cos, self.rope_sin,
                mrope_delta=mrope_delta)
        # one packed transfer (separate np.asarray calls each pay a full
        # tunnel round trip)
        packed_h = np.asarray(jnp.concatenate(
            [toks, n_emitted[:, None].astype(toks.dtype)], axis=1))
        toks_h = packed_h[:, :-1]
        n_emitted_h = packed_h[:, -1]
        ids_h = probs_h = tokps_h = None
        if any(s.task.n_probs > 0 for s in dec):
            ids_h = np.asarray(ids)
            probs_h = np.asarray(probs)
            tokps_h = np.asarray(tokps)
        n_tok = int(n_emitted_h.sum())
        self.metrics.on_decode(n_tok, (time.monotonic() - t0) * 1e3)

        # host-sampled (grammar/mirostat/DRY) slots: ONE batched gather +
        # device->host transfer for all of them — a per-slot np.asarray
        # paid a full tunnel round-trip (~250us) per slot per token
        hs_slots = [s for s in dec
                    if getattr(s.task, "host_sampler", None) is not None]
        hs_rows = {}
        if hs_slots:
            idxs = [s.idx for s in hs_slots]
            batch = np.asarray(jnp.take(logits0, jnp.asarray(idxs), axis=0))
            hs_rows = {i: batch[k] for k, i in enumerate(idxs)}
        self._emit_verify(dec, toks_h, n_emitted_h, ids_h, probs_h,
                          tokps_h, hs_rows)

    def _emit_verify(self, dec: list, toks_h, n_emitted_h, ids_h, probs_h,
                     tokps_h, hs_rows=None) -> None:
        """Emit a verify pass's accepted tokens (reference per-token
        postprocess scan, httpserver.hpp:4284-4334)."""
        for s in dec:
            task = s.task
            hs = getattr(task, "host_sampler", None)
            if hs is not None:
                s.cache_tokens.append(s.next_token)
                s.pos += 1
                token, top_ids, top_probs, tok_prob = hs.sample(
                    hs_rows[s.idx])
                self._accept_token(s, token, top_ids, top_probs, tok_prob)
                continue
            n_em = int(n_emitted_h[s.idx])
            acc = n_em - 1
            if s.drafts:
                task.n_drafted += len(s.drafts)
                task.n_draft_accepted += acc
                self.metrics.on_draft(len(s.drafts), acc)
                if getattr(task, "ngram", None) is not None:
                    self._ngram_observe(task, len(s.drafts), acc)
            # KV now holds next_token + the accepted draft prefix
            kept = [s.next_token] + s.drafts[:acc]
            s.cache_tokens.extend(kept)
            s.pos += len(kept)
            ngram = getattr(task, "ngram", None)
            for j in range(n_em):
                token = int(toks_h[s.idx, j])
                row_ids = ids_h[s.idx, j] if ids_h is not None else None
                row_probs = probs_h[s.idx, j] if probs_h is not None else None
                row_tokp = (float(tokps_h[s.idx, j])
                            if tokps_h is not None else 0.0)
                self._accept_token(s, token, row_ids, row_probs, row_tokp)
                if ngram is not None:
                    ngram.push(task.prompt_tokens + task.generated)
                if s.task is None:  # finished/cancelled mid-emission
                    break

    def _remaining(self, s: "Slot") -> int:
        """Tokens this slot's task can still emit (max_tokens budget;
        stop words/EOG can end it earlier — unknowable ahead of time)."""
        task = s.task
        if task is None:
            return 0
        mt = getattr(task, "max_tokens", 0) or 0
        if mt <= 0:
            return 1 << 30
        return max(0, mt - len(task.generated))

    def _chain_k(self, dec: list, off: int = 0) -> int:
        """Effective chain length for a joint pass: the configured
        decode_chain capped by any participating slot's ramp AND by the
        pow2 bucket of the largest remaining token budget (minus `off`
        in-flight steps). The burst tail thus SHRINKS (16 -> 8 -> 4 ...)
        instead of dispatching a full chain whose unneeded tail steps
        delay the burst's last token by their execution time
        (~1.7ms/step at the bench shape); pow2 sizes reuse
        already-compiled programs, where exact-size tails would each pay
        a first-use compile (the r4 M-shrink trap). Mid-burst syncs are
        pipelined, so the extra short chain costs ~nothing. Returns 1
        when at most one token remains — the caller falls through to
        the per-token pass."""
        K = self.ecfg.decode_chain
        ramps = [s.chain_ramp for s in dec if s.chain_ramp > 0]
        K = min([K] + ramps)
        rem = max(self._remaining(s) for s in dec) - off
        if rem <= 0:
            return 1
        if rem < K:
            # a 1-3 token leftover overshoots a 4-chain (<= 3 discarded
            # device steps, ~5ms) instead of paying a ~26ms per-token
            # round trip
            K = min(K, max(4, _pow2_floor(rem)))
        return K

    def _bump_ramps(self, dec: list) -> None:
        """One chain dispatched: quadruple each ramping slot's cap (0 =
        fully ramped to decode_chain)."""
        for s in dec:
            if s.chain_ramp > 0:
                nxt = s.chain_ramp * 4
                s.chain_ramp = 0 if nxt >= self.ecfg.decode_chain else nxt

    def _flash_chain(self) -> bool:
        """True when chained decode routes through ops/flash_decode
        (per-slot ranged traffic inside the kernel — no attn_len
        bucketing needed)."""
        if self.rec or self.encdec:
            return False
        from ..models.llama import flash_decode_active
        return flash_decode_active(self.cfg, self.slot_ctx)

    def _chain_fast_kw(self, dec: list) -> dict:
        """Static fast-path flags for _decode_chain, all host-decided:
        samp_extras=False when every slot is plain (bit-identical skip of
        the full-vocab bias/penalty passes); samp_kcap=64 when every
        slot's plain chain is exactly-covered by 64 candidates
        (0 < top_k <= 64, no logprobs rendering — the top-k filter
        truncates to a prefix, so the surviving-mask math is identical
        and only the seeded gumbel stream changes). A lockstep
        whole-batch KV write variant was measured neutral (18.3 vs 19
        us/step — the write is bandwidth-bound, not op-bound) and
        dropped to avoid program-variant churn."""
        plain = all(s.task.sparams.plain for s in dec)
        kw = {"samp_extras": not plain}
        if plain and all(0 < s.task.sparams.top_k <= 64
                         and s.task.n_probs == 0 for s in dec):
            kw["samp_kcap"] = 64
        return kw

    def _decode_pass_chain(self, dec: list, K: int) -> None:
        """K sequential decode steps in ONE device dispatch + ONE host
        sync (see _decode_chain). Tokens a slot generates past its own
        finish point are discarded host-side; its device sampler state is
        reset on next dispatch and the stale KV rows sit beyond the
        accepted position (unreachable by mask, overwritten later)."""
        self._refresh_arrs()
        t0 = time.monotonic()
        S = len(self.slots)
        token0 = np.zeros((S,), np.int32)
        pos0 = np.full((S,), self.slot_ctx, np.int32)
        active = np.zeros((S,), bool)
        for s in dec:
            token0[s.idx] = s.next_token
            pos0[s.idx] = s.pos
            active[s.idx] = True
        mrope_delta = None
        arrays = {"token0": token0, "pos0": pos0, "active": active}
        if self.cfg.mrope_sections:
            mrope_delta = np.asarray(
                [getattr(s.task, "mrope_delta", 0) if s.task else 0
                 for s in self.slots], np.int32)
            arrays["mrope_delta"] = mrope_delta
            mrope_delta = jnp.asarray(mrope_delta)
        # ranged attention: read only the occupied cache region, bucketed
        # to 256 so a few program variants cover every fill level. The
        # flash decode kernel ranges per-slot by itself (index-map
        # clamping) — pass the full capacity there (one program variant,
        # no slice copies).
        AL = 0
        if not self._flash_chain():
            need = max(s.pos for s in dec) + K
            AL = min(self.slot_ctx, -(-need // 256) * 256)
        if self.rec:
            from ..models.mamba import rec_decode_chain
            chain_fn = rec_decode_chain
        elif self.encdec:
            from ..models.t5_serve import t5_decode_chain
            chain_fn = t5_decode_chain
        else:
            chain_fn = _decode_chain
        kw = {}
        if chain_fn is _decode_chain:
            kw = self._chain_fast_kw(dec)
        if self.control is not None:
            self.control.broadcast("decode_chain", arrays,
                                   {"k": K, "attn_len": AL, **kw})
        toks, ids, probs, tokps, self.kv, self.sstate = chain_fn(
            self.params, self.cfg, jnp.asarray(token0), jnp.asarray(pos0),
            self.kv, self.sstate, self.arrs, jnp.asarray(active),
            self.rope_cos, self.rope_sin, n_steps=K,
            mrope_delta=mrope_delta, attn_len=AL, **kw)
        # issue this chain's device->host transfer BEFORE dispatching the
        # next chains: the transport serves requests in order, so a
        # transfer requested after a dispatch waits out that whole chain
        _issue_copies(toks, ids, probs, tokps,
                      any(s.task.n_probs > 0 for s in dec))
        # pipelining: enqueue the next chains (token0 = device-resident
        # last sampled tokens) BEFORE the host sync below, so the device
        # works through the sync + detokenize/stop-scan window instead of
        # idling
        self._bump_ramps(dec)
        self._fill_chain_queue(dec, K, K, toks, pos0, active,
                               arrays.get("mrope_delta"))
        toks_h = np.asarray(toks)
        want_probs = any(s.task.n_probs > 0 for s in dec)
        ids_h = np.asarray(ids) if want_probs else None
        probs_h = np.asarray(probs) if want_probs else None
        tokps_h = np.asarray(tokps) if want_probs else None
        self._emit_chain(dec, K, toks_h, ids_h, probs_h, tokps_h, t0)

    def _fill_chain_queue(self, dec: list, k_unemitted: int, base_k: int,
                          toks, pos0, active, mrope_np) -> None:
        """Top the speculative-chain queue up to pipeline_depth, each new
        chain feeding off the previous chain's device-resident last tokens
        (toks/pos0 = the NEWEST dispatched chain's outputs/starts). Safe
        because: a slot either consumes all tokens of a speculated chain
        (its pos/sampler state match exactly) or its task finishes, in
        which case the slot is released and `reset_slot`/prefill rewrite
        its sampler state and KV at re-admission. Context shift is the one
        transition that would desync a CONTINUING slot, so a chain is only
        speculated while every covered position stays within capacity
        (k_unemitted = steps of already-dispatched-but-unemitted chains).
        Workers replay host-broadcast ops and cannot see device-resident
        token0, so the control plane gates speculation off."""
        if (not self.ecfg.pipeline_chain or self.control is not None
                or self.rec or self.encdec):
            return
        if self.ecfg.lookup_ngram_min > 0 and not self._ngram_dominated():
            # a slot with a CURRENT n-gram match (on the tokens synced so
            # far — in-flight chains lag this by <= 2 chains) should
            # draft next pass: leave the queue empty so the next pass
            # re-checks (a speculated chain MUST be consumed by
            # continuing slots, so it cannot be dropped for a late-found
            # draft). No-match or acceptance-held slots keep pipelining.
            for s in dec:
                task = s.task
                ng = getattr(task, "ngram", None) if task else None
                if ng is None or not self._ngram_may_draft(task,
                                                           k_unemitted):
                    continue
                if ng.draft(task.prompt_tokens + task.generated, 1):
                    return
        pos_end = pos0
        while len(self._chain_q) < max(1, self.ecfg.pipeline_depth):
            if max(self._remaining(s) for s in dec) <= k_unemitted:
                return      # every slot's budget is already covered
            K2 = self._chain_k(dec, off=k_unemitted)
            K2 = min(K2, _pow2_floor(
                min(s.capacity - s.pos for s in dec) - k_unemitted))
            if K2 < 2:
                return
            pos1 = pos_end.copy()
            for s in dec:
                pos1[s.idx] += base_k
            AL = 0
            if not self._flash_chain():
                need = max(s.pos for s in dec) + k_unemitted + K2
                AL = min(self.slot_ctx, -(-need // 256) * 256)
            mrope_delta = (jnp.asarray(mrope_np)
                           if mrope_np is not None else None)
            kw2 = self._chain_fast_kw(dec)
            toks, ids2, probs2, tokps2, self.kv, self.sstate = \
                _decode_chain(
                    self.params, self.cfg, toks[:, -1], jnp.asarray(pos1),
                    self.kv, self.sstate, self.arrs, jnp.asarray(active),
                    self.rope_cos, self.rope_sin, n_steps=K2,
                    mrope_delta=mrope_delta, attn_len=AL, **kw2)
            tasks = [None] * len(self.slots)
            for s in dec:
                tasks[s.idx] = s.task
            rec = {
                "toks": toks, "ids": ids2, "probs": probs2,
                "tokps": tokps2, "pos0": pos1, "active": active.copy(),
                "tasks": tasks, "k": K2, "mrope": mrope_np,
                "t0": time.monotonic(), "ev": threading.Event(),
                "want_probs": any(s.task.n_probs > 0 for s in dec),
            }
            # copies issued before any later dispatch; the transfer
            # thread blocks on them
            _issue_copies(toks, ids2, probs2, tokps2, rec["want_probs"])
            self._chain_q.append(rec)
            self._xfer_q.put(rec)
            self._bump_ramps(dec)
            pos_end = pos1
            base_k = K2
            k_unemitted += K2

    def _consume_pending_chain(self, dec: list) -> bool:
        """Emit the OLDEST speculatively dispatched chain's tokens.
        Covered = same task object at the expected position (a released/
        readmitted slot fails the identity check and its state is rebuilt
        by admission). Returns False (whole queue dropped — the later
        chains assumed the continuation) when nothing is covered;
        uncovered slots in `dec` wait one pass."""
        pend = self._chain_q.pop(0)
        K = pend["k"]
        covered = [s for s in dec
                   if s.task is not None
                   and pend["tasks"][s.idx] is s.task
                   and s.pos == int(pend["pos0"][s.idx])]
        if not covered:
            self._chain_q.clear()
            return False
        t0 = pend.get("t0", time.monotonic())
        # keep the pipeline full: the next chain goes out before syncing
        # this one — but ONLY when the pending chain covers every decoding
        # slot. A slot admitted while others are pipelined must not be
        # starved (reference decodes all running slots each batch):
        # draining lets the next _decode_pass dispatch a joint chain that
        # includes it.
        ts0 = time.monotonic()
        want_probs = any(s.task.n_probs > 0 for s in covered)
        if "ev" not in pend:
            # legacy record (no transfer thread)
            _issue_copies(pend["toks"], pend["ids"], pend["probs"],
                          pend["tokps"], want_probs)
        if len(covered) == len(dec):
            act = np.zeros_like(pend["active"])
            for s in covered:
                act[s.idx] = True
            newest = self._chain_q[-1] if self._chain_q else pend
            off = K + sum(p["k"] for p in self._chain_q)
            self._fill_chain_queue(covered, off, newest["k"],
                                   newest["toks"], newest["pos0"], act,
                                   pend["mrope"])
        tp0 = time.monotonic()
        self._chain_prof_spec = tp0 - ts0
        if "ev" in pend:
            pend["ev"].wait()
            if "err" in pend:
                raise pend["err"]
            toks_h = pend["toks_h"]
            ids_h = pend.get("ids_h") if want_probs else None
            probs_h = pend.get("probs_h") if want_probs else None
            tokps_h = pend.get("tokps_h") if want_probs else None
            if want_probs and ids_h is None:  # fill-time want mismatch
                ids_h = np.asarray(pend["ids"])
                probs_h = np.asarray(pend["probs"])
                tokps_h = np.asarray(pend["tokps"])
        else:
            toks_h = np.asarray(pend["toks"])
            ids_h = np.asarray(pend["ids"]) if want_probs else None
            probs_h = np.asarray(pend["probs"]) if want_probs else None
            tokps_h = np.asarray(pend["tokps"]) if want_probs else None
        tp1 = time.monotonic()
        self._emit_chain(covered, K, toks_h, ids_h, probs_h, tokps_h, t0)
        if self._chain_prof is not None:
            self._chain_prof.append(
                (ts0 - self._chain_prof_last if self._chain_prof_last
                 else 0.0, self._chain_prof_spec, tp1 - tp0,
                 time.monotonic() - tp1))
            self._chain_prof_last = time.monotonic()
        return True

    def _emit_chain(self, dec: list, K: int, toks_h, ids_h, probs_h,
                    tokps_h, t0: float) -> None:
        n_tok = 0
        for s in dec:
            inp = s.next_token
            ngram = getattr(s.task, "ngram", None)
            consumed = 0
            for j in range(K):
                if s.task is None:   # finished/cancelled mid-chain
                    break
                s.cache_tokens.append(inp)
                s.pos += 1
                consumed += 1
                tok = int(toks_h[s.idx, j])
                row_ids = ids_h[s.idx, j] if ids_h is not None else None
                row_probs = (probs_h[s.idx, j]
                             if probs_h is not None else None)
                row_tokp = (float(tokps_h[s.idx, j])
                            if tokps_h is not None else 0.0)
                n_tok += 1
                self._accept_token(s, tok, row_ids, row_probs, row_tokp)
                if ngram is not None and s.task is not None:
                    ngram.push(s.task.prompt_tokens + s.task.generated)
                inp = tok
            if self.rec and consumed < K:
                # the device state advanced through all K chain inputs but
                # the host kept only `consumed` — the slot's state no
                # longer matches any token prefix
                s.rec_dirty = True
        self._acct_decode(n_tok, t0)

    def _acct_decode(self, n_tok: int, t0: float) -> None:
        """Account decode tokens over a non-overlapping wall window
        (pipelined passes dispatch before their predecessors consume)."""
        now = time.monotonic()
        self.metrics.on_decode(
            n_tok, (now - max(t0, self._decode_acct_ts)) * 1e3)
        self._decode_acct_ts = now

    def _accept_token(self, s: Slot, token: int, ids_row, probs_row,
                      tok_prob: float = 0.0) -> None:
        """Post-process one generated token on the host: budgets, EOG, stop
        words, stream emission (reference :4347-4684)."""
        task = s.task
        if task.cancelled:
            self._release(s)
            return
        task.generated.append(token)
        s.next_token = token
        hs = getattr(task, "host_sampler", None)
        if hs is not None:
            hs.accept(token)

        text = task.scanner.push(token)
        if task.n_probs > 0 and ids_row is not None:
            from .task import TokenProbs
            task.probs.append(TokenProbs(
                token=token,
                text=self.tokenizer.decode([token], skip_leading_space=False)
                if self.tokenizer else "",
                top_ids=ids_row[:max(task.n_probs, 1)].tolist(),
                top_probs=probs_row[:max(task.n_probs, 1)].tolist(),
                prob=float(tok_prob)))

        finish = None
        if self.tokenizer is not None and self.tokenizer.is_eog(token):
            finish = "stop"
        elif hs is not None and hs.must_stop:
            finish = "stop"
        elif task.scanner.stopped:
            finish = "stop"
        elif task.budget_left() <= 0:
            finish = "length"

        if finish == "stop" and not task.scanner.stopped:
            # EOG token: drop it from rendered text, flush holdback
            text += task.scanner.flush()
        if finish == "length":
            text += task.scanner.flush()

        text, r_delta, calls = task.postprocess(text, final=bool(finish))
        if finish == "stop" and task.tool_calls:
            finish = "tool_calls"
        if text:
            task.text += text
        if task.stream and (text or r_delta or calls or finish):
            task.emit("delta", {"text": text, "token": token,
                                "reasoning_content": r_delta,
                                "tool_calls": calls,
                                "finish_reason": finish})
        if finish:
            task.finish_reason = finish
            task.t_decoded = time.monotonic()
            task.emit("final", task)
            self._release(s, keep_cache=self.ecfg.prompt_cache)

    def _context_shift(self, s: Slot) -> None:
        task = s.task
        n_keep = min(task.n_keep, s.pos - 2) if task else 0
        n_keep = max(n_keep, 0)
        # reference reactive-shift amount: min(n_left/4, n_ubatch)
        # (httpserver.hpp:3472-3473, 3514-3515) — NOT n_left/2, which is
        # only the prompt-side block size (httpserver.hpp:5603-5604).
        # Clamped to >=1 for forward progress on tiny contexts (the
        # reference instead refuses to shift when n_discard <= 4).
        n_left = s.pos - n_keep
        n_discard = max(1, min(n_left // 4, self.ecfg.n_ubatch))
        if self.control is not None:
            self.control.broadcast("shift", {}, {"slot": s.idx,
                                                 "keep": n_keep,
                                                 "discard": n_discard})
        self.kv = shift_kv(self.kv, jnp.int32(s.idx), jnp.int32(n_keep),
                           jnp.int32(n_discard), self.delta_cos,
                           self.delta_sin, self.cfg.rope_mode,
                           layer_select=self.delta_select)
        del s.cache_tokens[n_keep:n_keep + n_discard]
        s.pos -= n_discard
        s.drafts = []
        if self.draft_kv is not None and s.draft_pos >= n_keep + n_discard:
            # shift the draft context alongside the target instead of
            # re-prefilling the whole history (reference shifts the draft
            # ctx too, httpserver.hpp:3508-3524); a draft KV that hasn't
            # reached the discard window keeps its [0, n_keep) prefix
            self.draft_kv = shift_kv(
                self.draft_kv, jnp.int32(s.idx), jnp.int32(n_keep),
                jnp.int32(n_discard), self.draft_delta_cos,
                self.draft_delta_sin, self.draft_cfg.rope_mode,
                layer_select=self.draft_delta_select)
            s.draft_pos -= n_discard
        else:
            s.draft_pos = min(s.draft_pos, n_keep)
        if task:
            task.n_shifted += 1
        SRV_DBG("shift", "slot %d keep=%d discard=%d pos=%d",
                s.idx, n_keep, n_discard, s.pos)

    def _finish_now(self, s: Slot, reason: str = "length") -> None:
        """Finish a decoding slot without accepting another token (e.g. a
        recurrent slot at its context boundary)."""
        task = s.task
        text = task.scanner.flush()
        text, r_delta, calls = task.postprocess(text, final=True)
        if text:
            task.text += text
        if task.stream:
            task.emit("delta", {"text": text, "token": -1,
                                "reasoning_content": r_delta,
                                "tool_calls": calls,
                                "finish_reason": reason})
        task.finish_reason = reason
        task.t_decoded = time.monotonic()
        task.emit("final", task)
        self._release(s, keep_cache=self.ecfg.prompt_cache)

    def _release(self, s: Slot, keep_cache: bool = False) -> None:
        """Free the slot; optionally keep its KV token history for the prefix
        cache (the reference's cache handoff, httpserver.hpp:4812-4824)."""
        s.task = None
        s.state = "idle"
        s.cursor = 0
        s.next_token = -1
        s.last_used = time.monotonic()
        if not keep_cache:
            s.cache_tokens = []
            s.pos = 0
        self._arrs_dirty = True

    # -- images (diffusion) --------------------------------------------------

    def _admit_images(self, task: ImagesTask) -> None:
        if self.images_pipeline is None:
            raise ValueError("this server has no image model loaded")
        import dataclasses as _dc
        task.t_start = time.monotonic()
        for i in range(task.n):
            gp = _dc.replace(task.gp, seed=task.gp.seed + i)
            if task.init_image is not None:
                st = self.images_pipeline.img2img_stream(
                    gp, task.init_image, task.mask,
                    control=task.control)
            else:
                st = self.images_pipeline.txt2img_stream(
                    gp, control=task.control)
            task.streams.append(st)
        self.image_tasks.append(task)

    def _images_pass(self) -> bool:
        """Advance every live stream ONE denoise step (one per reconcile
        pass so image work interleaves with LLM decode; reference
        httpserver.hpp:4942-4958)."""
        if not self.image_tasks:
            return False
        done_tasks = []
        for task in self.image_tasks:
            if task.cancelled:
                done_tasks.append(task)
                continue
            try:
                for i, st in enumerate(task.streams):
                    if st.done:
                        continue
                    st.step()
                    task.steps_done += 1
                    self.metrics.n_image_steps_forward += 1
                    if task.stream:
                        ev = {"index": i, "step": st.i,
                              "total_steps": st.total_steps,
                              "progress": round(100.0 * st.i
                                                / st.total_steps, 1)}
                        if task.preview and not st.done:
                            ev["preview"] = st.preview()
                        task.emit("progress", ev)
                if all(st.done for st in task.streams):
                    self._finish_images(task)
                    done_tasks.append(task)
            except Exception as exc:  # noqa: BLE001
                SRV_ERR("images", "task %s failed: %r", task.rid, exc)
                task.fail(exc)
                done_tasks.append(task)
        for t in done_tasks:
            self.image_tasks.remove(t)
        return bool(self.image_tasks)

    def _finish_images(self, task: ImagesTask) -> None:
        import io

        from PIL import Image
        for st in task.streams:
            img = st.result()
            if self.upscaler is not None:
                # model upscaler: x4 per round (reference
                # z_stablediffusion.hpp:339-349)
                for _ in range(max(1, self.upscale_repeats)):
                    img = self.upscaler.upscale(img)
            pil = Image.fromarray(img)
            up = getattr(task, "upscale", 1)
            if up and up > 1 and self.upscaler is None:
                # resampling fallback when no ESRGAN model is loaded
                pil = pil.resize((pil.width * up, pil.height * up),
                                 Image.LANCZOS)
            buf = io.BytesIO()
            pil.save(buf, format="PNG")
            task.images.append(buf.getvalue())
        task.t_done = time.monotonic()
        task.emit("final", task)

    # -- embeddings / rerank -------------------------------------------------

    def _embed_forward(self, toks, lens, pooling: str):
        """Arch dispatch: llama-family (non-causal path) or BERT encoder
        (incl. the 'new' jina-reranker arch, model.patch §2.4)."""
        from ..models.bert import BERT_ARCHS, bert_forward
        if self.cfg.arch in BERT_ARCHS:
            return jax.jit(bert_forward,
                           static_argnames=("cfg", "pooling"))(
                self.params, self.cfg, toks, lens, pooling=pooling)
        return forward_embeddings(self.params, self.cfg, toks, lens,
                                  self.rope_cos, self.rope_sin,
                                  pooling=pooling)

    def _admit_embed(self, task, token_lists: list[list[int]],
                     pooling: str) -> None:
        """Queue an embeddings/rerank task as bucketed groups; _embed_pass
        runs ONE group per reconcile pass so decode slots keep streaming
        while a large batch embeds (reference interleaves via reconcile
        passes, httpserver.hpp:4095-4149)."""
        if self.rec or self.encdec:
            raise ValueError("embeddings/rerank are not supported for "
                             "recurrent/encoder-decoder models here")
        order = sorted(range(len(token_lists)),
                       key=lambda i: len(token_lists[i]))
        nb = self.ecfg.max_embed_batch
        task._groups = [order[i:i + nb] for i in range(0, len(order), nb)]
        task._token_lists = token_lists
        task._pooling = pooling
        task._results = [None] * len(token_lists)
        task._t0 = time.monotonic()
        self.embed_tasks.append(task)

    def _embed_pass(self) -> bool:
        """Run ONE bucket group of the oldest queued embeddings/rerank
        task (mirrors _images_pass granularity)."""
        while self.embed_tasks and (self.embed_tasks[0].cancelled
                                    or not self.embed_tasks[0]._groups):
            t = self.embed_tasks.pop(0)
            if not t.cancelled:
                self._finish_embed(t)
        if not self.embed_tasks:
            return False
        task = self.embed_tasks[0]
        group = task._groups.pop(0)
        try:
            token_lists = task._token_lists
            T = self._bucket(max(len(token_lists[j]) for j in group))
            B = len(group)
            toks = np.zeros((B, T), np.int32)
            lens = np.zeros((B,), np.int32)
            for b, j in enumerate(group):
                seq = token_lists[j][:T]
                toks[b, :len(seq)] = seq
                lens[b] = len(seq)
            emb_h = np.asarray(self._embed_forward(
                jnp.asarray(toks), jnp.asarray(lens), task._pooling))
            for b, j in enumerate(group):
                task._results[j] = emb_h[b]
            if not task._groups:
                self.embed_tasks.pop(0)
                self._finish_embed(task)
        except Exception as exc:  # noqa: BLE001
            SRV_ERR("embed", "task %s failed: %r", task.rid, exc)
            task.fail(exc)
            if task in self.embed_tasks:
                self.embed_tasks.remove(task)
        return bool(self.embed_tasks)

    def _finish_embed(self, task) -> None:
        if isinstance(task, RerankTask):
            self._finish_rerank(task)
            return
        for e in task._results:
            v = e.astype(np.float64)
            if task.normalize:
                n = np.linalg.norm(v)
                v = v / n if n > 0 else v
            task.embeddings.append(v.tolist())
        self.metrics.on_prefill(task.n_prompt,
                                (time.monotonic() - task._t0) * 1e3)
        task.emit("final", task)

    def _finish_rerank(self, task: RerankTask) -> None:
        t0 = task._t0
        embs = task._results
        scores = [float(np.asarray(e).reshape(-1)[0]) for e in embs]
        if task.normalize and len(scores) >= task.n_documents + 2:
            doc_scores = scores[:task.n_documents]
            s_self, s_unk = scores[-2], scores[-1]
            lo, hi = min(s_unk, min(doc_scores)), max(s_self, max(doc_scores))
            rng = max(hi - lo, 1e-6)
            task.scores = [(x - lo) / rng for x in doc_scores]
        else:
            task.scores = scores[:task.n_documents]
        self.metrics.on_prefill(task.n_prompt, (time.monotonic() - t0) * 1e3)
        task.emit("final", task)

    def probe_decode_tps(self, n_tokens: int = 32) -> float:
        """Timed greedy decode to measure tokens/sec (the reference's
        --tokens-per-second -1 startup probe, httpserver.hpp:3131-3161)."""
        bos = self.tokenizer.bos_id if self.tokenizer else 1
        task = CompletionsTask([bos or 1], SamplerParams(temp=0.0, seed=0),
                               tokenizer=self.tokenizer, max_tokens=n_tokens,
                               stream=False)
        self.submit(task)
        while True:
            kind, payload = task.result_q.get(timeout=600)
            if kind == "final":
                tps = payload.timings()["tokens_per_second"]
                # probe leaves its tokens in the prefix cache; clear it
                for s in self.slots:
                    if s.state == "idle":
                        s.cache_tokens = []
                        s.pos = 0
                return tps
            if kind == "error":
                raise payload

    # -- introspection -------------------------------------------------------

    def kv_cache_usage(self) -> tuple[int, int]:
        used = sum(s.pos for s in self.slots)
        return used, self.slot_ctx * len(self.slots)
