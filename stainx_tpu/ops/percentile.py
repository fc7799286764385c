"""Exact nearest-rank percentiles under jit — fixed shapes, no sorts.

The reference computes percentiles by fully sorting every (N, P) pixel field
and gathering one element (``src/stainx_cuda_torch/csrc/macenko.cu:52-58,
209-216``) — its dominant O(P log P) hot loop. TPUs have no fast sort: on a
v5e, ``lax.top_k`` lowers to a sort-like program costing ~23 ms for a
64×512² batch regardless of k, and XLA's TopK compile aborts above k≈4096.

Selection here is **histogram refinement**: each level bins the surviving
values into B=16 buckets between per-row [lo, hi) bounds, reduces the
per-bucket counts (a fused compare-and-reduce — no scatter, no sort),
descends into the bucket containing the target rank, and repeats until every
row's bucket holds ≤ 1 element (then a masked min returns **the exact
element**) or the interval width is below f32 resolution (duplicates — any
element in the bucket is within one ulp of the true rank value). Two
accelerations keep full-data passes to a minimum:

- the descent is a ``while_loop`` with a data-adaptive trip count, not a
  fixed unroll;
- for large P, a strided 1/64 **sample** localizes the rank first (6 cheap
  sample-levels), and one full-data pass then counts ``#below`` exactly and
  bins only the candidate interval — the exactness never depends on the
  sample (a 4σ rank margin plus a validity check that falls back to the
  global chain on the rare miss).

Measured on a v5e: ~4.4 ms unsampled / ~2 ms sampled for a 64×512² batch
vs 22.8 ms for ``top_k`` — in pure jnp, identical math on CPU and TPU. The
distributed variant of the same scheme lives in
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
_MAX_LEVELS = 12  # backstop: 16^12 ≈ 2^48-fold reduction
_SAMPLE_STRIDE = 64
_SAMPLE_MIN_P = 1 << 16  # sample-localize only when the last axis is large


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


def _bucket_index(xs, lo, w):
    """Bucket index in [0, B): elements a float quantum outside the interval
    clip into the edge buckets — they stay tracked (membership is CARRIED,
    never re-derived, so bucket-boundary wobble cannot drop elements)."""
    bf = (xs - lo[..., None]) / w[..., None]
    return jnp.clip(bf.astype(jnp.int32), 0, _B - 1)


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
    """Pick the bucket containing rank ``r``; return (bsel, r_within, count)."""
    c = jnp.cumsum(counts, -1)
    bsel = jnp.minimum(jnp.sum((c <= r[..., None]).astype(jnp.int32), -1), _B - 1)
    below = jnp.where(
        bsel > 0, jnp.take_along_axis(c, jnp.maximum(bsel - 1, 0)[..., None], -1)[..., 0], 0
    )
    sel_count = jnp.take_along_axis(counts, bsel[..., None], -1)[..., 0]
    return bsel, r - below, sel_count


def _refine(xs, valid, lo, hi, r, max_levels: int, scale=None):
    """While-loop descent: split the tracked element set into 16 buckets,
    keep the one containing rank ``r``, repeat until each row's bucket holds
    ≤ 1 element (→ masked min returns the exact element) or is narrower
    than 1e-7 of the row's value scale (duplicates / near-identical values;
    any member is then within one f32 quantum of the rank value)."""
    if scale is None:
        scale = jnp.maximum(jnp.abs(lo), jnp.abs(hi))
    width_floor = 1e-7 * jnp.maximum(scale, 1e-30)

    def cond(state):
        it, all_done = state[-2], state[-1]
        return jnp.logical_not(all_done) & (it < max_levels)

    def body(state):
        lo, hi, r, valid, it, _ = state
        w = jnp.maximum((hi - lo) / _B, 1e-37)
        bi = _bucket_index(xs, lo, w)
        bsel, new_r, sel_count = _descend(_count_bins(bi, valid), r)
        new_valid = valid & (bi == bsel[..., None])
        new_lo = lo + bsel.astype(jnp.float32) * w
        new_hi = new_lo + w
        row_done = (sel_count <= 1) | (new_hi - new_lo <= width_floor)
        return new_lo, new_hi, new_r, new_valid, it + 1, jnp.all(row_done)

    state = (lo, hi, r.astype(jnp.int32), valid, jnp.int32(0), jnp.asarray(False))
    lo, hi, r, valid, _, _ = jax.lax.while_loop(cond, body, state)

    val = jnp.min(jnp.where(valid, xs, jnp.inf), axis=-1)
    # Degenerate fallback (empty mask / rank out of range): bucket midpoint.
    return jnp.where(jnp.isfinite(val), val, (lo + hi) * 0.5)


def _global_bounds(xs, neg_sent):
    lo = jnp.min(xs, axis=-1)
    hi = jnp.max(neg_sent, axis=-1).astype(jnp.float32)
    return lo, hi + jnp.maximum(jnp.abs(hi), 1.0) * 1e-6  # max strictly inside


def _sampled_bounds(xs, neg_sent, rank, cnt):
    """Candidate interval from a strided sample with a 4σ rank margin, plus
    one exact full-data pass (count-below + interval membership). Inputs are
    2D (R, P). Returns (lo, hi, r, ok)."""
    s = xs[:, ::_SAMPLE_STRIDE]
    s_neg = neg_sent[:, ::_SAMPLE_STRIDE]
    cnt_s = jnp.sum(jnp.isfinite(s), axis=-1)

    r_frac = (rank.astype(jnp.float32) + 0.5) / jnp.maximum(cnt.astype(jnp.float32), 1.0)
    mean_s = r_frac * cnt_s.astype(jnp.float32)
    sd = jnp.sqrt(jnp.maximum(cnt_s.astype(jnp.float32) * r_frac * (1.0 - r_frac), 0.0))
    margin = 4.0 * sd + 2.0
    lo_rank = jnp.clip((mean_s - margin).astype(jnp.int32), 0, jnp.maximum(cnt_s - 1, 0))
    hi_rank = jnp.clip((mean_s + margin).astype(jnp.int32) + 1, 0, jnp.maximum(cnt_s - 1, 0))

    # Both bracketing sample quantiles in one chain (rows stacked).
    slo, shi = _global_bounds(s, s_neg)
    n_rows = s.shape[0]
    stacked = jnp.concatenate([s, s], axis=0)
    vals = _refine(
        stacked,
        jnp.isfinite(stacked),
        jnp.concatenate([slo, slo]),
        jnp.concatenate([shi, shi]),
        jnp.concatenate([lo_rank, hi_rank]),
        _MAX_LEVELS,
    )
    v_lo = vals[:n_rows]
    v_hi = vals[n_rows:]
    v_hi = v_hi + jnp.maximum(jnp.abs(v_hi), 1.0) * 1e-6

    # Exact repair over the FULL data: membership in the candidate window
    # becomes the refine's tracked set, and the rank offset is counted
    # against exactly that set — the sample only localizes, never decides.
    # The same traversal also computes the global bounds so that a row whose
    # window misses its rank (≳4σ sampling miss) simply restarts from the
    # global interval — per-row state blending instead of a second compiled
    # refine instance.
    finite = jnp.isfinite(xs)
    below = (xs < v_lo[..., None]) & finite
    window = finite & jnp.logical_not(below) & (xs < v_hi[..., None])
    n_below = jnp.sum(below, axis=-1, dtype=jnp.int32)
    n_inside = jnp.sum(window, axis=-1, dtype=jnp.int32)
    r_local = rank.astype(jnp.int32) - n_below
    ok = (r_local >= 0) & (r_local < n_inside) & jnp.isfinite(v_lo) & (v_hi > v_lo)
    return v_lo, v_hi, r_local, window, finite, ok


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
    [0, cnt)). Returns an actual element of the data — bit-exact whenever the
    converged bucket is unique, within one f32 ulp when duplicates collide.

    ``levels`` caps the descent depth (lower caps trade exactness for
    passes — ``precision="fast"`` uses 4). ``sample`` enables the strided
    warm start (default: on when the last axis ≥ 2^16).
    """
    xs = jnp.where(mask, x, jnp.inf).astype(jnp.float32) if mask is not None else x.astype(jnp.float32)
    neg_sent = (jnp.where(mask, x, -jnp.inf) if mask is not None else x).astype(jnp.float32)
    rank = rank.astype(jnp.int32)

    if sample is None:
        sample = x.shape[-1] >= _SAMPLE_MIN_P
    if not sample:
        lo, hi = _global_bounds(xs, neg_sent)
        return _refine(xs, jnp.isfinite(xs), lo, hi, rank, levels)

    # Sampled path: normalize to 2D (rows, P).
    lead = x.shape[:-1]
    p = x.shape[-1]
    xs2 = xs.reshape(-1, p)
    neg2 = neg_sent.reshape(-1, p)
    rank2 = rank.reshape(-1)
    if cnt is None:
        cnt2 = jnp.sum(jnp.isfinite(xs2), axis=-1) if mask is not None else jnp.full((xs2.shape[0],), p)
    else:
        cnt2 = cnt.reshape(-1)

    v_lo, v_hi, r_local, window, finite, ok = _sampled_bounds(xs2, neg2, rank2, cnt2)

    g_lo, g_hi = _global_bounds(xs2, neg2)
    lo0 = jnp.where(ok, v_lo, g_lo)
    hi0 = jnp.where(ok, v_hi, g_hi)
    r0 = jnp.where(ok, r_local, rank2)
    valid0 = jnp.where(ok[..., None], window, finite)

    # Termination scale from the GLOBAL bounds — localized windows are
    # narrow and would otherwise over-deepen the descent.
    scale = jnp.maximum(jnp.abs(g_lo), jnp.abs(g_hi))
    return _refine(xs2, valid0, lo0, hi0, r0, levels, scale=scale).reshape(lead)


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
