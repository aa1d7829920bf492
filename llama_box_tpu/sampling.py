"""On-device batched sampling pipeline (TPU-first).

Reproduces the reference's per-request sampler chain semantics
(penalties -> top-k -> top-p -> min-p -> xtc -> temperature -> dist, the
default chain at engine_param.hpp:131-136, applied via common_sampler_sample2
at httpserver.hpp:4284) plus typical-p, greedy (temp<=0), logit bias and
ignore-eos (llama-box implements ignore_eos as -inf logit bias on EOG
tokens, httpserver.hpp:158-226).

Design: the whole chain runs as ONE jitted program over the decode batch
[B, V] with per-slot parameter vectors — no host round-trip of logits.
Penalty state (token counts over a sliding window) lives on device:
  counts [B, V]   int32 — occurrences inside the penalty window
  ring   [B, R]   int32 — the window itself (R static cap, clamps last_n)
The chain operates on a static top-N_CAND candidate set (lax.top_k gives a
descending sort for free); tail mass beyond N_CAND candidates is dropped,
which is the standard TPU trade (exact for any top_k <= N_CAND; error
O(1e-4) when top_k is disabled).

Differences vs reference, by design:
- RNG is JAX threefry keyed by the request seed, not Xoshiro256
  (seed.patch): same-seed reproducibility holds, exact streams differ.
- mirostat (v1/v2) and DRY run on the HostSampler path (like grammar),
  not in the fused device chain.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
import os as _os
N_CAND = int(_os.environ.get("LLAMA_BOX_TPU_NCAND", "256"))
# static candidate-set width for the filtering chain. The chain is exact
# for any top_k <= N_CAND; the reference's default chain truncates to
# top_k=40 before top-p anyway, so 256 is generous headroom (and +2.5%
# decode vs 512 — the chain ops run on [B, N_CAND]). LLAMA_BOX_TPU_NCAND
# widens it for heavy-tail sampling studies.
N_PROBS = 16     # top-probs returned for logprobs rendering
RING_CAP = 256   # static penalty-window cap (penalty_last_n clamps to this)
BIAS_CAP = 64    # static per-request logit-bias slots


@dataclasses.dataclass
class SamplerParams:
    """Per-request sampling knobs (defaults mirror engine_param.hpp:131-136)."""
    seed: int = 0xFFFFFFFF  # LLAMA_DEFAULT_SEED semantics: -1/absent -> random
    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    typ_p: float = 1.0
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.10
    penalty_last_n: int = 64
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    logit_bias: dict[int, float] = dataclasses.field(default_factory=dict)
    ignore_eos: bool = False
    n_probs: int = 0
    grammar: object = None  # host-side constraint engine (grammar.py)
    grammar_lazy: bool = False       # enforce only after a trigger string
    grammar_triggers: tuple = ()     # e.g. ("<tool_call>",)
    # host-sampled extras (mirostat / DRY run on the host path like grammar)
    mirostat: int = 0            # 0 off, 1 v1, 2 v2
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    dry_multiplier: float = 0.0
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    dry_penalty_last_n: int = -1          # -1 = whole context
    dry_sequence_breakers: tuple = ("\n", ":", "\"", "*")
    # device-side extras
    dynatemp_range: float = 0.0           # entropy-scaled temperature
    dynatemp_exponent: float = 1.0
    top_n_sigma: float = -1.0             # keep logits >= max - n*std
    # requested sampler chain (reference `samplers` field /--samplers flag,
    # httpserver.hpp:162-172): () = server default chain. Selection is
    # honored by neutralizing excluded knobs at parse time
    # (restrict_to_samplers); a non-canonical ORDER routes the request to
    # the host sampler, which applies the truncation ops in this order.
    samplers: tuple = ()

    @property
    def is_greedy(self) -> bool:
        return self.temp <= 0.0

    @property
    def needs_host_sampler(self) -> bool:
        """True when this request must take the host sampling path
        (grammar constraints, mirostat, DRY, or a reordered chain)."""
        return (self.grammar is not None or self.mirostat > 0
                or self.dry_multiplier > 0.0
                or (bool(self.samplers)
                    and not samplers_order_canonical(self.samplers)))

    @property
    def plain(self) -> bool:
        """True when sampling needs only the common chain (top-k / top-p /
        min-p / temperature): no logit bias, no repetition penalties, no
        typical-p / xtc / top-n-sigma / dynatemp. Batches where every slot
        is plain take sample_impl's extras=False fast path, which skips
        the full-vocab bias/penalty passes and the penalty-ring update
        (~40us/step of VPU fixed cost at the bench shape)."""
        return (not self.logit_bias
                and self.penalty_repeat == 1.0
                and self.penalty_freq == 0.0
                and self.penalty_present == 0.0
                and self.typ_p >= 1.0
                and self.xtc_probability <= 0.0
                and self.top_n_sigma <= 0.0
                and self.dynatemp_range <= 0.0)


# -- sampler chain selection (reference common_sampler_types_from_names /
#    _from_chars; llama-box parses both forms at httpserver.hpp:162-172) ------

# canonical application order of the fused device chain (penalties and DRY
# run on full logits before candidate selection; the rest filter/scale the
# candidate view in this order)
CHAIN_ORDER = ("penalties", "dry", "top_n_sigma", "top_k", "top_p",
               "min_p", "typ_p", "xtc", "temperature")

_SAMPLER_CHARS = {"e": "penalties", "d": "dry", "s": "top_n_sigma",
                  "k": "top_k", "p": "top_p", "m": "min_p", "y": "typ_p",
                  "x": "xtc", "t": "temperature"}
_SAMPLER_ALIASES = {"temp": "temperature", "typical_p": "typ_p",
                    "typical": "typ_p", "typ-p": "typ_p", "typ": "typ_p",
                    "top-k": "top_k", "top-p": "top_p", "min-p": "min_p",
                    "top-n-sigma": "top_n_sigma", "nsigma": "top_n_sigma"}


def sampler_types_from_names(names) -> tuple[str, ...]:
    """Normalize a list of sampler names; unknown names are skipped
    (llama.cpp common_sampler_types_from_names semantics)."""
    out = []
    for raw in names:
        if not isinstance(raw, str):
            continue
        name = raw.strip().lower()
        name = _SAMPLER_ALIASES.get(name, name)
        if name in CHAIN_ORDER and name not in out:
            out.append(name)
    return tuple(out)


def sampler_types_from_chars(chars: str) -> tuple[str, ...]:
    """Single-char chain spec ('kpt' = top_k;top_p;temperature); unknown
    chars are skipped (llama.cpp common_sampler_types_from_chars)."""
    out = []
    for c in chars.strip().lower():
        name = _SAMPLER_CHARS.get(c)
        if name and name not in out:
            out.append(name)
    return tuple(out)


def samplers_order_canonical(samplers) -> bool:
    """True when the requested order matches the fused device chain's
    relative order (then selection alone suffices; no host fallback)."""
    idx = [CHAIN_ORDER.index(s) for s in samplers if s in CHAIN_ORDER]
    return all(a <= b for a, b in zip(idx, idx[1:]))


def restrict_to_samplers(sp: "SamplerParams") -> "SamplerParams":
    """Neutralize the knobs of samplers excluded from sp.samplers — the
    reference builds the chain only from the listed samplers, so an unlisted
    sampler never runs no matter what its parameters say."""
    if not sp.samplers:
        return sp
    s = set(sp.samplers)
    kw = {}
    if "penalties" not in s:
        kw.update(penalty_repeat=1.0, penalty_freq=0.0, penalty_present=0.0)
    if "dry" not in s:
        kw["dry_multiplier"] = 0.0
    if "top_n_sigma" not in s:
        kw["top_n_sigma"] = -1.0
    if "top_k" not in s:
        kw["top_k"] = 0
    if "top_p" not in s:
        kw["top_p"] = 1.0
    if "min_p" not in s:
        kw["min_p"] = 0.0
    if "typ_p" not in s:
        kw["typ_p"] = 1.0
    if "xtc" not in s:
        kw["xtc_probability"] = 0.0
    if "temperature" not in s and sp.temp > 0.0:
        # unlisted temperature = no logit scaling (greedy temp<=0 is kept:
        # the reference swaps the final dist sampler for greedy regardless)
        kw.update(temp=1.0, dynatemp_range=0.0)
    return dataclasses.replace(sp, **kw) if kw else sp


class SamplerState(NamedTuple):
    counts: jnp.ndarray    # [B, V] int32
    ring: jnp.ndarray      # [B, RING_CAP] int32
    ring_len: jnp.ndarray  # [B] int32
    step: jnp.ndarray      # [B] int32 (samples drawn; folds into the key)
    keys: jnp.ndarray      # [B] uint32 seed per slot


def init_sampler_state(n_slots: int, n_vocab: int) -> SamplerState:
    return SamplerState(
        counts=jnp.zeros((n_slots, n_vocab), jnp.int32),
        ring=jnp.full((n_slots, RING_CAP), -1, jnp.int32),
        ring_len=jnp.zeros((n_slots,), jnp.int32),
        step=jnp.zeros((n_slots,), jnp.int32),
        keys=jnp.zeros((n_slots,), jnp.uint32),
    )


class SamplerArrays(NamedTuple):
    """Per-slot parameter vectors uploaded once per batch composition."""
    temp: jnp.ndarray        # [B] f32
    top_k: jnp.ndarray       # [B] i32 (0 => disabled => N_CAND)
    top_p: jnp.ndarray       # [B] f32
    min_p: jnp.ndarray       # [B] f32
    typ_p: jnp.ndarray       # [B] f32
    xtc_p: jnp.ndarray       # [B] f32
    xtc_t: jnp.ndarray       # [B] f32
    pen_last_n: jnp.ndarray  # [B] i32
    pen_repeat: jnp.ndarray  # [B] f32
    pen_freq: jnp.ndarray    # [B] f32
    pen_present: jnp.ndarray # [B] f32
    bias_idx: jnp.ndarray    # [B, BIAS_CAP] i32, -1 = unused
    bias_val: jnp.ndarray    # [B, BIAS_CAP] f32
    dyna_range: jnp.ndarray  # [B] f32 (0 => static temperature)
    dyna_exp: jnp.ndarray    # [B] f32
    nsigma: jnp.ndarray      # [B] f32 (<=0 => disabled)


def make_sampler_arrays(params: Sequence[SamplerParams],
                        eog_ids: Sequence[int] = ()) -> SamplerArrays:
    B = len(params)
    bias_idx = np.full((B, BIAS_CAP), -1, np.int32)
    bias_val = np.zeros((B, BIAS_CAP), np.float32)
    for b, p in enumerate(params):
        entries = list(p.logit_bias.items())
        if p.ignore_eos:
            entries += [(t, NEG_INF) for t in eog_ids]
        for j, (tid, val) in enumerate(entries[:BIAS_CAP]):
            bias_idx[b, j] = tid
            bias_val[b, j] = val

    def vec(fn, dtype):
        return jnp.asarray([fn(p) for p in params], dtype)

    return SamplerArrays(
        temp=vec(lambda p: p.temp, jnp.float32),
        top_k=vec(lambda p: p.top_k, jnp.int32),
        top_p=vec(lambda p: p.top_p, jnp.float32),
        min_p=vec(lambda p: p.min_p, jnp.float32),
        typ_p=vec(lambda p: p.typ_p, jnp.float32),
        xtc_p=vec(lambda p: p.xtc_probability, jnp.float32),
        xtc_t=vec(lambda p: p.xtc_threshold, jnp.float32),
        pen_last_n=vec(lambda p: min(p.penalty_last_n if p.penalty_last_n >= 0
                                     else RING_CAP, RING_CAP), jnp.int32),
        pen_repeat=vec(lambda p: p.penalty_repeat, jnp.float32),
        pen_freq=vec(lambda p: p.penalty_freq, jnp.float32),
        pen_present=vec(lambda p: p.penalty_present, jnp.float32),
        bias_idx=jnp.asarray(bias_idx),
        bias_val=jnp.asarray(bias_val),
        dyna_range=vec(lambda p: p.dynatemp_range, jnp.float32),
        dyna_exp=vec(lambda p: p.dynatemp_exponent, jnp.float32),
        nsigma=vec(lambda p: p.top_n_sigma, jnp.float32),
    )


# ---------------------------------------------------------------------------
# state maintenance


@partial(jax.jit, donate_argnames=("state",))
def reset_slot(state: SamplerState, slot: jnp.ndarray, seed: jnp.ndarray
               ) -> SamplerState:
    """Clear penalty window + reseed one slot (new task admitted)."""
    counts = state.counts.at[slot].set(0)
    ring = state.ring.at[slot].set(-1)
    return SamplerState(
        counts=counts,
        ring=ring,
        ring_len=state.ring_len.at[slot].set(0),
        step=state.step.at[slot].set(0),
        keys=state.keys.at[slot].set(seed.astype(jnp.uint32)),
    )


def _push_one(counts_b, ring_b, len_b, tok, last_n):
    """Push one token into slot-local window; returns updated (counts, ring, len)."""
    last_n = jnp.maximum(last_n, 1)
    pos = len_b % last_n
    old = ring_b[pos]
    full = len_b >= last_n
    evict = full & (old >= 0)
    counts_b = jax.lax.cond(
        evict, lambda c: c.at[old].add(-1), lambda c: c, counts_b)
    counts_b = counts_b.at[tok].add(1)
    ring_b = ring_b.at[pos].set(tok)
    return counts_b, ring_b, len_b + 1


@partial(jax.jit, donate_argnames=("state",))
def push_tokens(state: SamplerState, slot, tokens, n_valid, last_n
                ) -> SamplerState:
    """Bulk-push prompt tokens of one slot into its penalty window
    (prompt participates in penalties, as in common_sampler_accept)."""
    counts_b = state.counts[slot]
    ring_b = state.ring[slot]
    len_b = state.ring_len[slot]

    def body(i, carry):
        c, r, l = carry
        return jax.lax.cond(
            i < n_valid,
            lambda _: _push_one(c, r, l, tokens[i], last_n),
            lambda _: (c, r, l),
            None)

    counts_b, ring_b, len_b = jax.lax.fori_loop(
        0, tokens.shape[0], body, (counts_b, ring_b, len_b))
    return state._replace(
        counts=state.counts.at[slot].set(counts_b),
        ring=state.ring.at[slot].set(ring_b),
        ring_len=state.ring_len.at[slot].set(len_b),
    )


# ---------------------------------------------------------------------------
# the chain


def _apply_bias(logits, arrs: SamplerArrays):
    B, V = logits.shape
    idx = jnp.clip(arrs.bias_idx, 0, V - 1)
    val = jnp.where(arrs.bias_idx >= 0, arrs.bias_val, 0.0)
    return jax.vmap(lambda l, i, v: l.at[i].add(v))(logits, idx, val)


def _apply_penalties(logits, counts, arrs: SamplerArrays):
    c = counts.astype(jnp.float32)
    hit = c > 0
    rep = arrs.pen_repeat[:, None]
    scaled = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(hit & (rep != 1.0), scaled, logits)
    logits = logits - (c * arrs.pen_freq[:, None]
                       + hit.astype(jnp.float32) * arrs.pen_present[:, None])
    return logits


def _chain_mask(cvals, arrs: SamplerArrays, xtc_draw):
    """Given descending candidate logits [B, N_CAND], return the surviving
    mask after top-k/top-p/min-p/typical/xtc. Mirrors llama.cpp sampler
    formulas (each filter keeps >= 1 candidate)."""
    B, K = cvals.shape
    col = jnp.arange(K)[None, :]

    # top-n-sigma (<=0 => disabled): keep logits >= max - n * std; std is
    # taken over the candidate set (top-N_CAND approximation of the
    # full-vocab std llama.cpp uses — the tail barely moves it)
    std = jnp.std(cvals, axis=-1, keepdims=True)
    ns_on = (arrs.nsigma > 0.0)[:, None]
    keep_ns = cvals >= (cvals[:, :1] - arrs.nsigma[:, None] * std)
    mask = ~ns_on | keep_ns | (col == 0)

    # top-k (0/negative => disabled)
    k = jnp.where(arrs.top_k <= 0, K, jnp.minimum(arrs.top_k, K))[:, None]
    mask = mask & (col < k)

    # softmax over current survivors
    def probs_of(mask):
        z = jnp.where(mask, cvals, NEG_INF)
        z = z - z.max(-1, keepdims=True)
        e = jnp.exp(z) * mask
        return e / (e.sum(-1, keepdims=True) + 1e-30)

    p = probs_of(mask)

    # top-p: keep the minimal prefix with cumsum >= top_p (candidates are
    # sorted desc, so survivors form a prefix of the masked sequence)
    cum = jnp.cumsum(p, axis=-1)
    keep_top_p = (cum - p) < arrs.top_p[:, None]
    mask = mask & (keep_top_p | (col == 0))

    # min-p: p_i >= min_p * p_max
    pmax = p.max(-1, keepdims=True)
    mask = mask & ((p >= arrs.min_p[:, None] * pmax) | (col == 0))

    # typical-p: keep tokens with smallest |−log p − H| until mass >= typ_p
    p2 = probs_of(mask)
    neglogp = -jnp.log(p2 + 1e-30)
    H = jnp.sum(p2 * neglogp, axis=-1, keepdims=True)
    shift = jnp.where(mask, jnp.abs(neglogp - H), jnp.inf)
    order = jnp.argsort(shift, axis=-1)              # ascending
    p_sorted = jnp.take_along_axis(p2, order, -1)
    cum_t = jnp.cumsum(p_sorted, -1)
    keep_sorted = (cum_t - p_sorted) < arrs.typ_p[:, None]
    keep_sorted = keep_sorted | (jnp.arange(K)[None, :] == 0)
    keep_typ = jnp.zeros_like(mask).at[
        jnp.arange(B)[:, None], order].max(keep_sorted)
    typ_on = (arrs.typ_p < 1.0)[:, None]
    mask = jnp.where(typ_on, mask & keep_typ, mask)

    # xtc: with prob xtc_p drop every candidate with p > threshold except the
    # last (least probable) such candidate
    p3 = probs_of(mask)
    above = p3 > arrs.xtc_t[:, None]
    n_above = above.sum(-1, keepdims=True)
    # candidates are desc => "last above" = highest col index among above
    last_above = jnp.where(above, col, -1).max(-1, keepdims=True)
    drop = above & (col != last_above) & (n_above >= 2)
    xtc_on = (xtc_draw < arrs.xtc_p)[:, None]
    mask = jnp.where(xtc_on, mask & ~drop, mask)
    return mask


def _plain_mask(cvals, arrs: SamplerArrays):
    """Survivor mask for `plain` batches: top-k, top-p, min-p only —
    the exact same formulas as _chain_mask with the typical-p / xtc /
    top-n-sigma stages (data-gated no-ops for plain params) removed."""
    B, K = cvals.shape
    col = jnp.arange(K)[None, :]
    k = jnp.where(arrs.top_k <= 0, K, jnp.minimum(arrs.top_k, K))[:, None]
    mask = col < k
    z = jnp.where(mask, cvals, NEG_INF)
    z = z - z.max(-1, keepdims=True)
    e = jnp.exp(z) * mask
    p = e / (e.sum(-1, keepdims=True) + 1e-30)
    cum = jnp.cumsum(p, axis=-1)
    mask = mask & (((cum - p) < arrs.top_p[:, None]) | (col == 0))
    pmax = p.max(-1, keepdims=True)
    return mask & ((p >= arrs.min_p[:, None] * pmax) | (col == 0))


def _top_candidates(logits: jnp.ndarray, kcap: int):
    """Descending top-kcap candidates. On TPU the exact lax.top_k costs a
    ~0.6ms full-vocab sort per step; approx_max_k (the TPU-native
    partial-reduction top-k, ~99% recall at this shape) plus an exact
    argmax repair keeps greedy decoding bit-exact while shaving the scan.
    LLAMA_BOX_TPU_EXACT_TOPK=1 restores the exact sort."""
    import os
    if os.environ.get("LLAMA_BOX_TPU_EXACT_TOPK") or jax.default_backend() == "cpu":
        return jax.lax.top_k(logits, kcap)
    # bucketed top-2 reduction: fused passes over [B, V] take the top two
    # values of each of kcap/2 contiguous buckets (the same
    # partial-reduction idea as approx_max_k's aggregate mode, which
    # costs a ~70us sort op at this shape), then an exact descending sort
    # of just the kcap survivors. Measured recall on N(0,3) logits:
    # 0.994 @ top-40, 0.955 @ top-128. The true argmax is a bucket max by
    # construction, so greedy stays bit-exact.
    B, V = logits.shape
    nb = max((kcap + 1) // 2, 1)               # 2*nb survivors >= kcap
    bs = -(-V // nb)                           # bucket size (ceil)
    pad = bs * nb - V
    lg = jnp.pad(logits, ((0, 0), (0, pad)), constant_values=NEG_INF) \
        if pad else logits
    lg = lg.reshape(B, nb, bs)
    m1 = lg.max(axis=-1)                       # [B, nb]
    a1 = lg.argmax(axis=-1)
    lg2 = jnp.where(jnp.arange(bs)[None, None, :] == a1[..., None],
                    NEG_INF, lg)
    m2 = lg2.max(axis=-1)
    a2 = lg2.argmax(axis=-1)
    off = jnp.arange(nb, dtype=jnp.int32)[None, :] * bs
    vals = jnp.concatenate([m1, m2], axis=-1)
    idx = jnp.concatenate([a1.astype(jnp.int32) + off,
                           a2.astype(jnp.int32) + off], axis=-1)
    cvals, order = jax.lax.top_k(vals, kcap)   # small exact sort
    return cvals, jnp.take_along_axis(idx, order, -1)


def sample_impl(logits: jnp.ndarray, state: SamplerState, arrs: SamplerArrays,
                active: jnp.ndarray, extras: bool = True, kcap: int = 0
                ) -> tuple[jnp.ndarray, jnp.ndarray,
                           jnp.ndarray, SamplerState]:
    """Sample one token per slot from [B, V] logits.

    active: [B] bool — slots actually decoding (state only advances there).
    extras (STATIC): False = every slot's params are `plain`
    (SamplerParams.plain) — skip the full-vocab bias/penalty passes, the
    typical-p/xtc/top-n-sigma/dynatemp filters, and the penalty-ring
    update. Bit-identical to extras=True for plain params (those filters
    are data-gated no-ops there and the gumbel key derivation is shared).
    Returns (tokens [B] i32, top_ids [B, N_PROBS] i32, top_probs
    [B, N_PROBS] f32 — post-filter distribution for logprobs rendering,
    tok_prob [B] f32 — the sampled token's own reported probability,
    new state).

    kcap (STATIC, 0 => N_CAND): candidate-set size. The caller may
    shrink it when every slot has 0 < top_k <= kcap and n_probs == 0 —
    the top-k filter truncates to a prefix and every later filter's
    softmax runs over the survivors only, so the mask/probs math is
    identical; only the gumbel draw shape (and thus the seeded stream)
    and the greedy-row logprobs tail normalization differ.
    """
    B, V = logits.shape
    logits = logits.astype(jnp.float32)
    if extras:
        logits = _apply_bias(logits, arrs)
        logits = _apply_penalties(logits, state.counts, arrs)

    kcap = min(max(kcap, N_PROBS) if kcap else N_CAND, V)
    cvals, cidx = _top_candidates(logits, kcap)      # descending

    keys = jax.vmap(lambda s, st: jax.random.fold_in(jax.random.PRNGKey(s), st)
                    )(state.keys.astype(jnp.uint32), state.step)
    kx, kg = jax.vmap(jax.random.split, out_axes=1)(keys)

    if extras:
        xtc_draw = jax.vmap(jax.random.uniform)(kx)
        mask = _chain_mask(cvals, arrs, xtc_draw)
    else:
        mask = _plain_mask(cvals, arrs)

    # temperature + final softmax over survivors; dynatemp (range > 0)
    # rescales temp in [temp-range, temp+range] by the normalized entropy
    # of the surviving candidates (llama.cpp llama_sampler_temp_ext)
    if extras:
        p_surv = jnp.exp(jnp.where(mask, cvals - cvals[:, :1], NEG_INF))
        p_surv = p_surv / (p_surv.sum(-1, keepdims=True) + 1e-30)
        ent = -jnp.sum(p_surv * jnp.log(p_surv + 1e-30), axis=-1)
        n_kept = jnp.maximum(mask.sum(-1), 2).astype(jnp.float32)
        norm_ent = jnp.clip(ent / jnp.log(n_kept), 0.0, 1.0)
        t_min = jnp.maximum(arrs.temp - arrs.dyna_range, 0.0)
        t_max = arrs.temp + arrs.dyna_range
        t_dyn = t_min + (t_max - t_min) * norm_ent ** arrs.dyna_exp
        temp = jnp.where(arrs.dyna_range > 0.0, t_dyn, arrs.temp)
    else:
        temp = arrs.temp
    temp = jnp.maximum(temp, 1e-4)[:, None]
    z = jnp.where(mask, cvals / temp, NEG_INF)
    z = z - z.max(-1, keepdims=True)
    ez = jnp.exp(z) * mask
    probs = ez / (ez.sum(-1, keepdims=True) + 1e-30)

    gumbel = jax.vmap(lambda k: jax.random.gumbel(k, (kcap,)))(kg)
    noisy = jnp.where(mask, z + gumbel, NEG_INF)
    pick_dist = jnp.argmax(noisy, axis=-1)
    pick_greedy = jnp.zeros((B,), jnp.int32)          # col 0 = argmax
    pick = jnp.where(arrs.temp <= 0.0, pick_greedy, pick_dist)
    tokens = jnp.take_along_axis(cidx, pick[:, None], -1)[:, 0]

    # logprobs view: top N_PROBS of the post-filter distribution (greedy rows
    # report softmax of the unfiltered candidates like the reference)
    report = jnp.where((arrs.temp <= 0.0)[:, None],
                       jax.nn.softmax(cvals, axis=-1), probs)
    top_probs = report[:, :N_PROBS]
    top_ids = cidx[:, :N_PROBS]
    tok_prob = jnp.take_along_axis(report, pick[:, None], -1)[:, 0]

    # advance penalty window + step on active slots (a plain batch never
    # reads the ring/counts for the lifetime of its tasks — skip the push)
    if extras:
        def upd(c, r, l, tok, last_n, act):
            c2, r2, l2 = _push_one(c, r, l, tok, last_n)
            return (jnp.where(act, c2, c), jnp.where(act, r2, r),
                    jnp.where(act, l2, l))

        counts, ring, ring_len = jax.vmap(upd)(
            state.counts, state.ring, state.ring_len, tokens,
            arrs.pen_last_n, active)
    else:
        counts, ring, ring_len = state.counts, state.ring, state.ring_len
    new_state = SamplerState(
        counts=counts, ring=ring, ring_len=ring_len,
        step=state.step + active.astype(jnp.int32),
        keys=state.keys,
    )
    return tokens, top_ids, top_probs, tok_prob, new_state


sample = partial(jax.jit, donate_argnames=("state",))(sample_impl)


def verify_impl(logits: jnp.ndarray, draft: jnp.ndarray, n_draft: jnp.ndarray,
                state: SamplerState, arrs: SamplerArrays, active: jnp.ndarray):
    """Speculative verify+sample over T drafted positions (reference verify
    loop httpserver.hpp:4300-4334: run the MAIN sampler chain at each drafted
    position, accept while it reproduces the draft, emit one replacement/bonus
    token at the first mismatch).

    logits: [B, T, V] from the verify forward (draft row j produced logits j)
    draft:  [B, T] the input tokens (draft[:, 0] is the already-accepted
            token; draft[:, 1:] are drafted continuations)
    n_draft: [B] number of drafted tokens per row (0 => plain decode)
    Returns (tokens [B, T], n_emitted [B], top_ids [B, T, N_PROBS],
             top_probs [B, T, N_PROBS], tok_probs [B, T], new state). Row b
    emits tokens[b, :n_emitted[b]]; n_emitted = accepted + 1.
    """
    B, T, V = logits.shape

    def body(carry, j):
        state, alive = carry
        act_j = active & alive & (j <= n_draft)
        tok, ids, probs, tokp, state = sample_impl(
            logits[:, j], state, arrs, act_j)
        nxt = draft[:, jnp.minimum(j + 1, T - 1)]
        match = act_j & (j + 1 <= n_draft) & (tok == nxt)
        return (state, alive & match), (tok, ids, probs, tokp)

    (state, _), (toks, ids, probs, tokps) = jax.lax.scan(
        body, (state, jnp.ones_like(active)), jnp.arange(T))
    toks = toks.T                      # [B, T]
    ids = jnp.moveaxis(ids, 0, 1)      # [B, T, N_PROBS]
    probs = jnp.moveaxis(probs, 0, 1)
    tokps = tokps.T                    # [B, T]
    # position j emitted iff every earlier position matched its draft; the
    # cumulative product is monotone, so later accidental equalities of
    # dead-position samples cannot resurrect a row
    match = jnp.concatenate(
        [jnp.ones((B, 1), bool),
         (toks[:, :-1] == draft[:, 1:])
         & (jnp.arange(1, T)[None, :] <= n_draft[:, None])], axis=1)
    alive = jnp.cumprod(match.astype(jnp.int32), axis=1)
    n_emitted = jnp.where(active, alive.sum(axis=1), 0)
    n_emitted = jnp.minimum(n_emitted, n_draft + 1)
    return toks, n_emitted, ids, probs, tokps, state


verify = partial(jax.jit, donate_argnames=("state",))(verify_impl)


class HostSampler:
    """Host-side sampler for grammar-constrained slots.

    Mirrors the device chain (penalties -> top-k -> top-p -> min-p ->
    typical -> xtc -> temp) in numpy, with the reference's lazy-grammar
    strategy (sampling.patch / common_sampler_sample2): sample WITHOUT the
    grammar first; only if the pick violates the grammar, mask the
    candidates and re-sample. Grammar-advancing and the penalty window live
    here, so the device sampler state for this slot stays untouched.
    """

    def __init__(self, sp: SamplerParams, grammar, tokenizer):
        self.sp = sp
        self.grammar = grammar
        self.tok = tokenizer
        # lazy grammars (tool-call constraint, reference common_chat
        # grammar_lazy + trigger words): stay unconstrained until a
        # trigger string appears in the generated text, enforce the
        # grammar until it completes, then re-arm for the next call
        self._gr_template = None
        self._trigger_tail = ""
        if grammar is not None and sp.grammar_lazy and sp.grammar_triggers:
            self._gr_template = grammar.copy()
            self.grammar = None
        self.rng = np.random.default_rng(sp.seed & 0xFFFFFFFF)
        self._window: list[int] = []
        self._counts: dict[int, int] = {}
        self._last_n = min(sp.penalty_last_n if sp.penalty_last_n >= 0
                           else RING_CAP, RING_CAP)
        self._mask_cache: dict = {}
        self._history: list[int] = []   # full generation history (DRY)
        # mirostat v1/v2 state: target surprise window
        self._mu = 2.0 * sp.mirostat_tau

    # -- state ---------------------------------------------------------------

    def accept(self, token: int) -> None:
        self._history.append(token)
        if self._last_n > 0:
            self._window.append(token)
            self._counts[token] = self._counts.get(token, 0) + 1
            if len(self._window) > self._last_n:
                old = self._window.pop(0)
                self._counts[old] -= 1
                if not self._counts[old]:
                    del self._counts[old]
        if self._gr_template is not None and self.grammar is None \
                and not self.tok.is_eog(token):
            piece = self.tok.token_bytes(token, render_special=True)
            self._trigger_tail = (self._trigger_tail
                                  + piece.decode("utf-8", "replace"))[-64:]
            for trig in self.sp.grammar_triggers:
                if self._trigger_tail.endswith(trig):
                    self.grammar = self._gr_template.copy()
                    self._mask_cache.clear()
                    self._trigger_tail = ""
                    return
            return
        if self.grammar is not None and not self.tok.is_eog(token):
            self.grammar.accept_bytes(
                self.tok.token_bytes(token, render_special=True))
            self._mask_cache.clear()
            if self._gr_template is not None and self.grammar.completed:
                # call emitted in full: back to unconstrained text until
                # the next trigger (parallel tool calls)
                self.grammar = None
                self._mask_cache.clear()

    def push_prompt(self, tokens: list[int]) -> None:
        for t in tokens[-self._last_n:] if self._last_n > 0 else []:
            self._window.append(t)
            self._counts[t] = self._counts.get(t, 0) + 1
        while len(self._window) > self._last_n:
            old = self._window.pop(0)
            self._counts[old] -= 1
            if not self._counts[old]:
                del self._counts[old]

    @property
    def must_stop(self) -> bool:
        return self.grammar is not None and self.grammar.must_stop

    def _token_allowed(self, tid: int) -> bool:
        g = self.grammar
        cached = self._mask_cache.get(tid)
        if cached is not None:
            return cached
        if self.tok.is_eog(tid):
            ok = g.completed
        elif self.tok.is_control(tid):
            ok = False
        else:
            piece = self.tok.token_bytes(tid, render_special=True)
            ok = bool(piece) and g.accepts_token(piece)
        self._mask_cache[tid] = ok
        return ok

    # -- the chain -----------------------------------------------------------

    def sample(self, logits: np.ndarray
               ) -> tuple[int, np.ndarray, np.ndarray, float]:
        """Returns (token, top_ids [N_PROBS], top_probs [N_PROBS],
        tok_prob — the sampled token's own candidate-softmax probability)."""
        sp = self.sp
        logits = logits.astype(np.float64).copy()
        for tid, v in sp.logit_bias.items():
            if 0 <= tid < logits.shape[0]:
                logits[tid] += v
        if sp.ignore_eos:
            for tid in self.tok.eog_ids:
                logits[tid] = NEG_INF
        # penalties
        if self._counts and (sp.penalty_repeat != 1.0 or sp.penalty_freq
                             or sp.penalty_present):
            for tid, c in self._counts.items():
                l = logits[tid]
                if sp.penalty_repeat != 1.0:
                    l = l / sp.penalty_repeat if l > 0 else l * sp.penalty_repeat
                logits[tid] = (l - c * sp.penalty_freq
                               - (c > 0) * sp.penalty_present)

        if self.sp.dry_multiplier > 0.0:
            self._apply_dry(logits)

        kcap = min(N_CAND, logits.shape[0])
        cand = np.argpartition(-logits, kcap - 1)[:kcap]
        cand = cand[np.argsort(-logits[cand], kind="stable")]
        cvals = logits[cand]

        token = self._pick(cand, cvals, grammar_mask=None)
        if self.grammar is not None and not self._token_allowed(int(token)):
            mask = np.fromiter((self._token_allowed(int(t)) for t in cand),
                               bool, len(cand))
            if not mask.any():
                # no candidate fits: fall back to scanning the full
                # vocab in logit order, in chunks through the batched
                # native matcher (grammar.filter_pieces — one crossing
                # per 512 candidates instead of one per token; the
                # Python matcher path degrades to per-token trials)
                order = np.argsort(-logits, kind="stable")
                token = None
                for base in range(0, len(order), 512):
                    chunk = [int(t) for t in order[base:base + 512]]
                    cached = [self._mask_cache.get(t) for t in chunk]
                    todo = [t for t, c in zip(chunk, cached) if c is None]
                    if todo:
                        pieces = [b"" if (self.tok.is_eog(t)
                                          or self.tok.is_control(t))
                                  else self.tok.token_bytes(
                                      t, render_special=True)
                                  for t in todo]
                        oks = self.grammar.filter_pieces(pieces)
                        for t, pc, ok in zip(todo, pieces, oks):
                            # eog/control keep _token_allowed semantics
                            self._mask_cache[t] = (
                                self.grammar.completed
                                if self.tok.is_eog(t)
                                else bool(pc) and ok)
                    hit = next((t for t in chunk if self._mask_cache[t]),
                               None)
                    if hit is not None:
                        token = hit
                        break
                if token is None:
                    token = self.tok.eos_id or 0
            else:
                token = self._pick(cand, cvals, grammar_mask=mask)

        # logprobs view
        z = cvals - cvals.max()
        p = np.exp(z)
        p /= p.sum()
        # sampled token's own probability in the same (candidate-softmax)
        # view; grammar fallback may land outside the candidate set
        hit = np.nonzero(cand == token)[0]
        if hit.size:
            tok_prob = float(p[hit[0]])
        else:
            tok_prob = float(np.exp(logits[token] - cvals.max())
                             / np.exp(z).sum())
        return (int(token), cand[:N_PROBS].astype(np.int64), p[:N_PROBS],
                tok_prob)

    _DRY_BRK_CACHE: dict = {}   # (tokenizer id, breakers) -> frozenset

    def _dry_breaker_ids(self) -> frozenset:
        """Token ids whose text contains a DRY sequence breaker (computed
        once per tokenizer+breaker set; llama.cpp preprocesses the breaker
        strings into a token restart set the same way)."""
        brks = tuple(self.sp.dry_sequence_breakers or ())
        if not brks or self.tok is None \
                or not hasattr(self.tok, "n_vocab"):
            return frozenset()
        key = (id(self.tok), brks)
        hit = self._DRY_BRK_CACHE.get(key)
        if hit is None:
            pats = [b.encode() for b in brks]
            hit = frozenset(
                t for t in range(self.tok.n_vocab)
                if any(p in self.tok.token_bytes(t, render_special=True)
                       for p in pats))
            self._DRY_BRK_CACHE[key] = hit
        return hit

    def _apply_dry(self, logits: np.ndarray) -> None:
        """DRY sampler (llama.cpp semantics, simplified): penalize tokens
        that would extend a sequence already seen — for each candidate z, if
        history ends with S and S+z occurred before with |S| >= allowed,
        subtract multiplier * base^(|S| - allowed)."""
        sp = self.sp
        h = self._history
        if sp.dry_penalty_last_n > 0:
            h = h[-sp.dry_penalty_last_n:]
        # sequence breakers cut the match window: only history after the
        # most recent breaker token participates (llama.cpp restart set)
        brk = self._dry_breaker_ids()
        if brk:
            for i in range(len(h) - 1, -1, -1):
                if h[i] in brk:
                    h = h[i + 1:]
                    break
        n = len(h)
        if n < sp.dry_allowed_length:
            return
        max_pen: dict[int, int] = {}
        # find occurrences of the current suffix of length L (L descending
        # capped at 32) and note the token that followed each
        for L in range(min(n, 32), sp.dry_allowed_length - 1, -1):
            suffix = h[n - L:]
            for i in range(0, n - L):
                if h[i:i + L] == suffix:
                    nxt = h[i + L]
                    if nxt not in max_pen:
                        max_pen[nxt] = L
            if max_pen:
                break
        for tok, L in max_pen.items():
            if 0 <= tok < logits.shape[0]:
                logits[tok] -= (sp.dry_multiplier
                                * sp.dry_base ** (L - sp.dry_allowed_length))

    def _mirostat_pick(self, cand, cvals) -> int:
        """Mirostat v2: drop candidates with surprise > mu, sample from the
        rest, then update mu toward the target surprise tau."""
        sp = self.sp
        z = cvals - cvals.max()
        p = np.exp(z)
        p /= p.sum()
        surprise = -np.log2(p + 1e-30)
        keep = surprise <= self._mu
        if not keep.any():
            keep[p.argmax()] = True
        pk = p * keep
        pk /= pk.sum()
        idx = int(self.rng.choice(len(cand), p=pk))
        observed = float(surprise[idx])
        self._mu -= sp.mirostat_eta * (observed - sp.mirostat_tau)
        return int(cand[idx])

    def _pick(self, cand, cvals, grammar_mask) -> int:
        """Filter/scale the candidate view and draw.

        Ops run in sp.samplers order (reference: the chain is built from
        the listed samplers in order); the default is the device chain's
        canonical order. penalties/DRY always run on the full logits
        before candidate selection (their canonical slot) — only the
        candidate-view ops reorder here.
        """
        sp = self.sp
        if sp.mirostat > 0 and grammar_mask is None:
            return self._mirostat_pick(cand, cvals)
        K = len(cand)
        cvals = cvals.copy()
        keep = np.ones(K, bool)
        if grammar_mask is not None:
            keep &= grammar_mask

        def probs_of(keep):
            z = np.where(keep, cvals, NEG_INF)
            z = z - z.max()
            e = np.exp(z) * keep
            return e / max(e.sum(), 1e-30)

        for op in (sp.samplers or CHAIN_ORDER):
            if op == "top_n_sigma" and sp.top_n_sigma > 0.0:
                keep &= cvals >= cvals.max() - sp.top_n_sigma * cvals.std()
                keep[0] = True
            elif op == "top_k" and sp.top_k > 0:
                kk = np.zeros(K, bool)
                kk[np.nonzero(keep)[0][:sp.top_k]] = True
                keep &= kk
            elif op == "top_p" and sp.top_p < 1.0:
                p = probs_of(keep)
                cum = np.cumsum(p)
                keep &= (cum - p) < sp.top_p
                keep[np.nonzero(p)[0][:1]] = True
            elif op == "min_p" and sp.min_p > 0.0:
                p = probs_of(keep)
                keep &= ((p >= sp.min_p * p.max())
                         | (np.arange(K) == p.argmax()))
            elif op == "typ_p" and sp.typ_p < 1.0:
                p = probs_of(keep)
                nlp = -np.log(p + 1e-30)
                H = float((p * nlp).sum())
                shift = np.where(keep, np.abs(nlp - H), np.inf)
                order = np.argsort(shift, kind="stable")
                ps = p[order]
                cs = np.cumsum(ps)
                k2 = (cs - ps) < sp.typ_p
                k2[0] = True
                kt = np.zeros(K, bool)
                kt[order[k2]] = True
                keep &= kt
            elif op == "xtc" and sp.xtc_probability > 0.0 \
                    and self.rng.random() < sp.xtc_probability:
                p = probs_of(keep)
                above = p > sp.xtc_threshold
                if above.sum() >= 2:
                    last = np.nonzero(above)[0][-1]
                    drop = above.copy()
                    drop[last] = False
                    keep &= ~drop
            elif op == "temperature" and sp.temp > 0.0:
                temp = sp.temp
                if sp.dynatemp_range > 0.0:
                    p = probs_of(keep)
                    ent = float(-(p * np.log(p + 1e-30)).sum())
                    n_kept = max(int(keep.sum()), 2)
                    norm = min(max(ent / np.log(n_kept), 0.0), 1.0)
                    t_min = max(temp - sp.dynatemp_range, 0.0)
                    t_max = temp + sp.dynatemp_range
                    temp = t_min + (t_max - t_min) * norm ** sp.dynatemp_exponent
                # scale the surviving logits; later ops see the scaled view
                cvals = cvals / max(temp, 1e-4)

        if sp.temp <= 0.0:
            # greedy replaces the final dist draw (reference swaps in a
            # greedy sampler when temp<=0 regardless of chain position)
            return int(cand[np.nonzero(keep)[0][0]])
        p = probs_of(keep)
        return int(self.rng.choice(cand, p=p))


@partial(jax.jit, donate_argnames=("state",))
def sample_one(logits: jnp.ndarray, slot, state: SamplerState,
               arrs: SamplerArrays):
    """Sample for a single slot from [V] logits (prefill's first token).
    Other rows see the same logits but neither sample nor advance state."""
    B = state.counts.shape[0]
    lb = jnp.broadcast_to(logits[None, :], (B, logits.shape[0]))
    active = jnp.arange(B) == slot
    return sample_impl(lb, state, arrs, active)
