"""Exact distributed nearest-rank percentile — multi-level global-histogram
refinement with ``psum``-reduced counts.

The single-chip path selects ranks with ``lax.top_k``
(:mod:`stainx_tpu.ops.percentile`); across chips a gathered top-k would move
~1% of all pixels over ICI. Instead each refinement level builds a 256-bin
histogram of the surviving values (one fused compare-reduce pass locally,
one 256-int ``psum`` globally), descends into the bin containing the target
rank, and repeats — after L levels the candidate interval has shrunk by
256^L. A final bounded ``all_gather`` of the few surviving candidates makes
the result exactly the global nearest-rank value (SURVEY §7 hard-part #5:
"two-pass (global histogram → refine)").

Communication: L × 256 ints + one ≤(256·n_dev) float gather — independent of
pixel count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stainx_tpu.ops.percentile import nearest_rank_index

_GATHER_CAP = 256  # per-shard candidates in the final exact step


def _level_histogram(x, valid, lo, width):
    """(256,) int32 counts of valid values by bin index clip(⌊(x−lo)/w⌋)."""
    b = jnp.clip(jnp.floor((x - lo) / width).astype(jnp.int32), 0, 255)
    bins = jnp.arange(256, dtype=jnp.int32)
    eq = (b[:, None] == bins[None, :]) & valid[:, None]
    return jnp.sum(eq, axis=0, dtype=jnp.int32), b


def distributed_masked_percentile(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    q: int,
    axis_name,
    levels: int = 3,
) -> jnp.ndarray:
    """Global nearest-rank ``q``-th percentile of the masked union of every
    shard's ``x`` (1D local views). Call inside ``shard_map``; ``axis_name``
    may be one name or a tuple. Returns a replicated scalar.

    Exact up to a 256^levels-fold-refined interval: if more than
    ``256·n_dev`` candidates remain inside that interval (i.e. the data has
    that many near-identical values), the result may differ from the true
    rank value by less than the final interval width.
    """
    x = x.reshape(-1).astype(jnp.float32)
    valid = mask.reshape(-1)

    cnt = jax.lax.psum(jnp.sum(valid, dtype=jnp.int32), axis_name)
    r = nearest_rank_index(q, cnt)  # global 0-based rank

    inf = jnp.float32(jnp.inf)
    lo = jax.lax.pmin(jnp.min(jnp.where(valid, x, inf)), axis_name)
    hi = jax.lax.pmax(jnp.max(jnp.where(valid, x, -inf)), axis_name)

    def level(state, _):
        lo, hi, r, valid = state
        width = jnp.maximum((hi - lo) / 256.0, 1e-37)
        hist_local, b = _level_histogram(x, valid, lo, width)
        hist = jax.lax.psum(hist_local, axis_name)
        c = jnp.cumsum(hist)
        bsel = jnp.sum((c <= r).astype(jnp.int32))  # first bin with c > r
        bsel = jnp.minimum(bsel, 255)
        below = jnp.where(bsel > 0, c[jnp.maximum(bsel - 1, 0)], 0)
        new_r = r - below
        new_valid = valid & (b == bsel)
        new_lo = lo + bsel.astype(jnp.float32) * width
        return (new_lo, new_lo + width, new_r, new_valid), None

    (lo, hi, r, valid), _ = jax.lax.scan(level, (lo, hi, r, valid), None, length=levels)

    # Final exact step: gather the (few) surviving candidates and take the
    # r-th smallest globally.
    neg = jnp.where(valid, -x, -inf)
    k = min(_GATHER_CAP, x.shape[0])
    local_top, _ = jax.lax.top_k(neg, k)  # ascending candidates as -values
    gathered = local_top
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    for ax in axes:
        gathered = jax.lax.all_gather(gathered, ax, tiled=True)
    g_top, _ = jax.lax.top_k(gathered.reshape(-1), k)
    r_clamped = jnp.minimum(r, k - 1)
    result = -g_top[r_clamped]

    # Degenerate global cases: no valid values → NaN (caller's contract).
    return jnp.where(cnt > 0, result, jnp.float32(jnp.nan))
