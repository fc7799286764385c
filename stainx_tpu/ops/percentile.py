"""Exact nearest-rank percentiles under jit — fixed shapes, no sorts.

The reference computes percentiles by fully sorting every (N, P) pixel field
and gathering one element (``src/stainx_cuda_torch/csrc/macenko.cu:52-58,
209-216``) — its dominant O(P log P) hot loop. TPUs have no fast sort: on a
v5e, ``lax.top_k`` lowers to a sort-like program costing ~23 ms for a
64×512² batch regardless of k, and XLA's TopK compile aborts above k≈4096.

Selection here is **radix-interval descent on the monotone integer key
view** — the same order-isomorphic f32→int32 mapping every Pallas descent
in :mod:`stainx_tpu.kernels.selection` and the distributed selection in
:mod:`stainx_tpu.parallel.percentile` use. Each level splits the surviving
keys into B=16 buckets of power-of-two width between per-row integer
[lo, hi] bounds, reduces the per-bucket counts (a fused compare-and-reduce —
no scatter, no sort), descends into the bucket containing the target rank,
and repeats until the bucket holds ≤ 1 element or a single key. Integer
interval arithmetic is exact, so the result is **bit-exact by
construction** (always an actual element of the data) and the descent is
bounded: ≤ 8 levels resolve the full 2^32 key space. An earlier value-space
(f32 interval) form had two silent failure regimes this design removes: a
row magnitude near FLT_MAX overflowed the interval width to +inf, and any
huge-magnitude outlier (say 1e30 next to rank elements of order 1) inflated
its relative width floor past the rank element's quantum — both returned
the row MINIMUM for every rank. Two accelerations keep full-data passes to
a minimum:

- the descent is a ``while_loop`` with a data-adaptive trip count, not a
  fixed unroll;
- for large P, a strided 1/64 **sample** localizes the rank first (cheap
  sample-levels), and one full-data pass then counts ``#below`` exactly and
  bins only the candidate interval — the exactness never depends on the
  sample (a 4σ rank margin plus a validity check that falls back to the
  global chain on the rare miss).

Measured on a v5e (key-space form): ~4.3 ms unsampled / ~2 ms sampled for a
64×512² batch vs 22.8 ms for ``top_k`` — in pure jnp, identical math on CPU
and TPU. The distributed variant of the same scheme lives in
:mod:`stainx_tpu.parallel.percentile`.

Rank formula (torchstain parity): 0-based index ``round(0.01·q·(n−1))`` with
round-half-to-even (``torch_backend.py:363-365``; ``gather_percentile``
clamps the index at 0). For integer ``q`` the index is computed in exact
integer arithmetic — the reference needs fp64 for this (``macenko.cu:52-56``),
which TPUs lack; integers sidestep it entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_B = 16  # buckets per refinement level
_MAX_LEVELS = 8  # the full 2^32 key space resolves in ≤ 8 16-ary levels
_SAMPLE_STRIDE = 64
_SAMPLE_MIN_P = 1 << 16  # sample-localize only when the last axis is large

_IMAX = (1 << 31) - 1  # int32 max (sentinel for masked mins)
_IMIN = -(1 << 31)  # int32 min (sentinel for masked maxes)
_IK_INF = 0x7F800000  # _ikey(+inf): above every finite key


def nearest_rank_index(q: int, n: jnp.ndarray) -> jnp.ndarray:
    """0-based nearest-rank index ``round(0.01·q·(n−1))`` (half-to-even),
    clamped at 0. ``q`` is a static integer percentage; ``n`` an integer
    array of element counts. Exact and overflow-free for every int32 count:
    the naive ``q·(n−1)`` wraps int32 above ~21.7M elements at q=99 (pooled
    fits and cross-chip counts exceed that), so the product is decomposed as
    ``q·(m//100)·100 + q·(m%100)`` — both terms stay far inside int32."""
    if not float(q).is_integer():
        raise ValueError(f"q must be an integer percentage, got {q}")
    q = int(q)
    m = n.astype(jnp.int32) - 1
    hi = jnp.floor_divide(m, 100)  # q·hi ≤ 99·(2^31/100): no overflow
    lo = jnp.remainder(m, 100)
    t_lo = q * lo  # ≤ 99·99
    quotient = q * hi + jnp.floor_divide(t_lo, 100)
    rem = jnp.remainder(t_lo, 100)
    round_up = (rem > 50) | ((rem == 50) & (quotient % 2 == 1))
    return jnp.maximum(quotient + round_up.astype(jnp.int32), 0)


def static_nearest_rank_index(q: int, n: int) -> int:
    """Python-int version of :func:`nearest_rank_index` for static counts."""
    quotient, rem = divmod(int(q) * (int(n) - 1), 100)
    round_up = rem > 50 or (rem == 50 and quotient % 2 == 1)
    return max(quotient + int(round_up), 0)


def _ikey(x: jnp.ndarray) -> jnp.ndarray:
    """Signed order-isomorphic int32 view of f32: the monotone key of
    ``kernels/selection.py:_monotone_key`` seen through its signed
    ``_ikey_view`` fold, composed into one XOR (``bits ^ 0x7FFFFFFF`` for
    negatives, identity for non-negatives). ik(a) < ik(b) ⇔ a < b, with
    −0.0 < +0.0 (adjacent keys — rank results are unaffected since both
    compare equal as floats).

    Deliberately NOT imported from :mod:`stainx_tpu.kernels.selection`:
    this module is the pure-jnp twin that must import (and run) when the
    pallas package itself is unavailable, so it cannot depend on the
    kernels package. ``tests/test_percentile_unit.py`` pins the three
    definitions (here, ``kernels/selection.py``,
    ``kernels/selection_stream.py``) bit-identical against drift."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    flip = jnp.where((u >> 31) != 0, jnp.uint32(0x7FFFFFFF), jnp.uint32(0))
    return jax.lax.bitcast_convert_type(u ^ flip, jnp.int32)


def _unkey(ik: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_ikey` (the XOR is an involution per sign half)."""
    bits = jnp.where(ik < 0, ik ^ jnp.int32(_IMAX), ik)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _key_bounds(ik, valid):
    """Per-row inclusive [lo, hi] key bounds of the valid elements. An empty
    row yields lo > hi; the descent then counts zero everywhere and resolves
    to the +inf sentinel on its first iteration."""
    lo = jnp.min(jnp.where(valid, ik, _IMAX), axis=-1)
    hi = jnp.max(jnp.where(valid, ik, _IMIN), axis=-1)
    return lo, hi


def _level_shift(d):
    """Smallest ``s`` with ``d >> s < 16`` (``max(bitlen(d) − 4, 0)``): a
    branch-free 28-compare bit length on the per-row width scalars. The
    resulting power-of-two bucket width makes binning a SHIFT — no integer
    division on the element pass — and strips ≥ 4 key bits per level."""
    s = jnp.zeros(d.shape, jnp.uint32)
    for k in range(4, 32):
        s = s + (d >= jnp.uint32(2**k)).astype(jnp.uint32)
    return s


def _count_bins(bi, valid):
    """(..., B) int32 bucket counts of tracked elements, reduced over the
    (minor) pixel axis."""
    bins = jnp.arange(_B, dtype=jnp.int32)
    return jnp.sum(
        (bi[..., None, :] == bins[:, None]) & valid[..., None, :],
        axis=-1,
        dtype=jnp.int32,
    )


def _descend(counts, r):
    """Pick the bucket containing rank ``r``; return (bsel, r_within, count).
    Ranks ≥ the tracked total clamp to the last member — the same
    out-of-range convention as ``kernels/selection.py`` (an empty tracked
    set leaves ``r = −1`` selecting empty bucket 0 → the +inf sentinel)."""
    c = jnp.cumsum(counts, -1)
    r = jnp.minimum(r, c[..., -1] - 1)
    bsel = jnp.minimum(jnp.sum((c <= r[..., None]).astype(jnp.int32), -1), _B - 1)
    below = jnp.where(
        bsel > 0, jnp.take_along_axis(c, jnp.maximum(bsel - 1, 0)[..., None], -1)[..., 0], 0
    )
    sel_count = jnp.take_along_axis(counts, bsel[..., None], -1)[..., 0]
    return bsel, r - below, sel_count


def _refine(ik, valid, lo, hi, r, max_levels: int):
    """While-loop radix-interval descent on the key view: split the tracked
    element set into 16 power-of-two-width buckets, keep the one containing
    rank ``r``, repeat until each row's bucket holds ≤ 1 element or a single
    key (duplicates). Returns the selected KEY per row. Degenerate rows
    follow the kernels/selection.py conventions (so a degenerate row's
    result cannot depend on backend or row-size routing): a rank past the
    tracked count clamps to the LAST tracked member (``_descend`` caps
    ``r`` at ``count − 1`` → the max element; pinned by
    test_out_of_range_rank_clamps_to_max), and only an EMPTY tracked set
    (fully-masked row) returns the +inf sentinel.

    All arithmetic is exact int32/uint32: two's-complement wraparound makes
    ``hi − lo`` and ``ik − lo`` correct through the uint32 view for any key
    range, so — unlike a float interval descent — there is no overflow,
    width-floor, or boundary-wobble regime, and ≤ 8 levels always suffice.
    Tracked membership is CARRIED between levels, never re-derived."""

    def cond(state):
        it, all_done = state[-2], state[-1]
        return jnp.logical_not(all_done) & (it < max_levels)

    def body(state):
        lo, hi, r, valid, it, _ = state
        d = jax.lax.bitcast_convert_type(hi - lo, jnp.uint32)  # exact width
        s = _level_shift(d)
        # Tracked offsets are ≤ d < 2^(s+4), so bi ≤ 15 for every tracked
        # element; untracked elements may produce arbitrary bi — they are
        # excluded from counts and membership by ``valid``.
        off = jax.lax.bitcast_convert_type(ik - lo[..., None], jnp.uint32)
        bi = (off >> s[..., None]).astype(jnp.int32)
        bsel, new_r, sel_count = _descend(_count_bins(bi, valid), r)
        new_valid = valid & (bi == bsel[..., None])
        w = jnp.uint32(1) << s
        step = jax.lax.bitcast_convert_type(bsel.astype(jnp.uint32) * w, jnp.int32)
        new_lo = lo + step  # true value ∈ [lo, hi]: no signed overflow
        # Clamp the increment BEFORE adding: the top bucket's new_lo + w − 1
        # exceeds hi (by up to w−1) and would wrap int32 when hi is near the
        # key-space top, flipping new_hi negative and ending the row early
        # (observed: a full-range row returned rank 5 for rank 6). new_lo
        # itself never exceeds hi: ``_descend`` clamps the rank into the
        # tracked set, so a nonempty row's selected bucket contains a real
        # value ∈ [lo, hi], and an empty row selects bucket 0 (step = 0,
        # new_lo = lo). hi − new_lo is therefore exact through the uint32
        # view on every row.
        rem = jax.lax.bitcast_convert_type(hi - new_lo, jnp.uint32)
        inc = jnp.minimum(w - jnp.uint32(1), rem)
        new_hi = new_lo + jax.lax.bitcast_convert_type(inc, jnp.int32)
        row_done = (sel_count <= 1) | (new_hi <= new_lo)
        return new_lo, new_hi, new_r, new_valid, it + 1, jnp.all(row_done)

    state = (lo, hi, r.astype(jnp.int32), valid, jnp.int32(0), jnp.asarray(False))
    lo, hi, r, valid, _, _ = jax.lax.while_loop(cond, body, state)
    return jnp.min(jnp.where(valid, ik, _IK_INF), axis=-1)


def _sampled_window(ik, valid, rank, cnt):
    """Candidate key window from a strided sample with a 4σ rank margin,
    plus one exact full-data pass (count-below + window membership). Inputs
    are 2D (R, P). Returns ``(k_lo, k_hi, r_local, window, ok)``: inclusive
    candidate key bounds, the rank offset within the window, the window
    membership mask, and whether the window provably contains the rank
    (``ok=False`` rows — a ≳4σ sampling miss or an all-masked sample —
    restart from the global interval)."""
    s_ik = ik[:, ::_SAMPLE_STRIDE]
    s_valid = valid[:, ::_SAMPLE_STRIDE]
    cnt_s = jnp.sum(s_valid, axis=-1, dtype=jnp.int32)

    r_frac = (rank.astype(jnp.float32) + 0.5) / jnp.maximum(cnt.astype(jnp.float32), 1.0)
    mean_s = r_frac * cnt_s.astype(jnp.float32)
    sd = jnp.sqrt(jnp.maximum(cnt_s.astype(jnp.float32) * r_frac * (1.0 - r_frac), 0.0))
    margin = 4.0 * sd + 2.0
    lo_rank = jnp.clip((mean_s - margin).astype(jnp.int32), 0, jnp.maximum(cnt_s - 1, 0))
    hi_rank = jnp.clip((mean_s + margin).astype(jnp.int32) + 1, 0, jnp.maximum(cnt_s - 1, 0))

    # Both bracketing sample quantiles in one chain (rows stacked).
    slo, shi = _key_bounds(s_ik, s_valid)
    n_rows = ik.shape[0]
    k = _refine(
        jnp.concatenate([s_ik, s_ik], axis=0),
        jnp.concatenate([s_valid, s_valid], axis=0),
        jnp.concatenate([slo, slo]),
        jnp.concatenate([shi, shi]),
        jnp.concatenate([lo_rank, hi_rank]),
        _MAX_LEVELS,
    )
    k_lo = k[:n_rows]
    k_hi = k[n_rows:]

    # Exact repair over the FULL data: membership in the candidate window
    # becomes the refine's tracked set, and the rank offset is counted
    # against exactly that set — the sample only localizes, never decides.
    below = valid & (ik < k_lo[..., None])
    window = valid & jnp.logical_not(below) & (ik <= k_hi[..., None])
    n_below = jnp.sum(below, axis=-1, dtype=jnp.int32)
    n_inside = jnp.sum(window, axis=-1, dtype=jnp.int32)
    r_local = rank.astype(jnp.int32) - n_below
    ok = (r_local >= 0) & (r_local < n_inside) & (k_lo <= k_hi) & (k_hi < _IK_INF)
    return k_lo, k_hi, r_local, window, ok


def kth_smallest(
    x: jnp.ndarray,
    rank: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    levels: int = _MAX_LEVELS,
    cnt: jnp.ndarray | None = None,
    sample: bool | None = None,
) -> jnp.ndarray:
    """Value of 0-based ascending ``rank`` along the last axis among the
    ``mask``-valid elements of ``x``. ``rank`` may be traced (any value in
    [0, cnt)). Returns an actual element of the data — bit-exact always
    (integer key-space descent; duplicates cannot blur the result).

    ``levels`` caps the descent depth (lower caps trade exactness for
    passes — ``precision="fast"`` uses 4; ≥ 8 is always exact). ``sample``
    enables the strided warm start (default: on when the last axis ≥ 2^16).
    Degenerate rows (no valid elements) resolve to +inf, the convention
    shared with every :mod:`stainx_tpu.kernels.selection` mode.
    """
    xf = x.astype(jnp.float32)
    valid = jnp.isfinite(xf) if mask is None else mask & jnp.isfinite(xf)
    # Invalid elements all collapse to the +inf sentinel key — above every
    # valid key, outside every descent interval.
    ik = _ikey(jnp.where(valid, xf, jnp.inf))
    rank = rank.astype(jnp.int32)

    if sample is None:
        sample = x.shape[-1] >= _SAMPLE_MIN_P
    if not sample:
        lo, hi = _key_bounds(ik, valid)
        return _unkey(_refine(ik, valid, lo, hi, rank, levels))

    # Sampled path: normalize to 2D (rows, P).
    lead = x.shape[:-1]
    p = x.shape[-1]
    ik2 = ik.reshape(-1, p)
    valid2 = valid.reshape(-1, p)
    rank2 = rank.reshape(-1)
    if cnt is None:
        # Count VALID elements even when mask is None: non-finite data is
        # excluded from ``valid``, and a cnt of plain P would skew the
        # sample's rank-fraction estimate, silently defeating the warm
        # start (the ok-fallback keeps exactness, not speed).
        cnt2 = jnp.sum(valid2, axis=-1, dtype=jnp.int32)
    else:
        cnt2 = cnt.reshape(-1)

    k_lo, k_hi, r_local, window, ok = _sampled_window(ik2, valid2, rank2, cnt2)

    g_lo, g_hi = _key_bounds(ik2, valid2)
    lo0 = jnp.where(ok, k_lo, g_lo)
    hi0 = jnp.where(ok, k_hi, g_hi)
    r0 = jnp.where(ok, r_local, rank2)
    valid0 = jnp.where(ok[..., None], window, valid2)

    return _unkey(_refine(ik2, valid0, lo0, hi0, r0, levels)).reshape(lead)


def masked_nearest_rank_percentile(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cnt: jnp.ndarray,
    q: int,
    levels: int = _MAX_LEVELS,
) -> jnp.ndarray:
    """Nearest-rank ``q``-th percentile of the masked elements of ``x``
    (last axis), with ``cnt`` = number of valid elements."""
    return kth_smallest(x, nearest_rank_index(q, cnt), mask, levels, cnt=cnt)


def percentile_all(x: jnp.ndarray, q: int, levels: int = _MAX_LEVELS) -> jnp.ndarray:
    """Nearest-rank ``q``-th percentile over the full last axis (static rank)."""
    idx = static_nearest_rank_index(q, x.shape[-1])
    rank = jnp.full(x.shape[:-1], idx, jnp.int32)
    return kth_smallest(x, rank, None, levels)
