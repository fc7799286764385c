"""Exact nearest-rank percentiles under jit — fixed shapes, no full sorts.

The reference computes percentiles by fully sorting every (N, P) pixel field
and gathering one element (``src/stainx_cuda_torch/csrc/macenko.cu:52-58,
209-216``) — its dominant O(P log P) hot loop. Because the Macenko ranks sit
within 1% of either end of the distribution (α = 1, 99th percentile), we use
``lax.top_k`` with a small static k instead and gather the dynamic rank from
the top-k buffer: O(P·log k) work and a fixed shape, which is exactly what
XLA wants.

Rank formula (torchstain parity): 0-based index ``round(0.01·q·(n−1))`` with
round-half-to-even (``torch_backend.py:363-365``; ``gather_percentile``
clamps the index at 0). For integer ``q`` the index is computed in exact
integer arithmetic — the reference needs fp64 for this (``macenko.cu:52-56``),
which TPUs lack; integers sidestep it entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_rank_index(q: int, n: jnp.ndarray) -> jnp.ndarray:
    """0-based nearest-rank index ``round(0.01·q·(n−1))`` (half-to-even),
    clamped at 0. ``q`` is a static integer percentage; ``n`` an integer
    array of element counts. Exact — no floating point involved."""
    if not float(q).is_integer():
        raise ValueError(f"q must be an integer percentage, got {q}")
    q = int(q)
    t = q * (n.astype(jnp.int32) - 1)  # exact for n < ~2.1e7 at q=99
    quotient = jnp.floor_divide(t, 100)
    rem = jnp.remainder(t, 100)
    round_up = (rem > 50) | ((rem == 50) & (quotient % 2 == 1))
    return jnp.maximum(quotient + round_up.astype(jnp.int32), 0)


def static_bound_for_alpha(alpha: float, p: int) -> int:
    """Static top-k size bounding any rank within ``alpha`` percent of either
    end of a distribution of at most ``p`` elements."""
    return min(int(0.01 * alpha * (p - 1)) + 2, p)


def kth_smallest(x: jnp.ndarray, idx: jnp.ndarray, k_static: int, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Value of 0-based ascending rank ``idx`` along the last axis.

    ``idx`` may be traced but must satisfy ``idx < k_static``. Masked-out
    elements (where ``mask`` is False) are treated as +inf — they never enter
    the bottom-k as long as ``idx`` < number of valid elements (the
    +inf-sentinel scheme of the reference CUDA wrapper,
    ``macenko.cu:211-216``)."""
    neg = -x if mask is None else jnp.where(mask, -x, -jnp.inf)
    top, _ = jax.lax.top_k(neg, k_static)  # descending in -x == ascending in x
    return -jnp.take_along_axis(top, idx[..., None], axis=-1)[..., 0]


def kth_largest(x: jnp.ndarray, j: jnp.ndarray, k_static: int, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Value of 0-based descending rank ``j`` along the last axis
    (``j=0`` → maximum). Masked-out elements are treated as −inf."""
    pos = x if mask is None else jnp.where(mask, x, -jnp.inf)
    top, _ = jax.lax.top_k(pos, k_static)
    return jnp.take_along_axis(top, j[..., None], axis=-1)[..., 0]


def masked_nearest_rank_percentile(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cnt: jnp.ndarray,
    q: int,
    k_static: int,
) -> jnp.ndarray:
    """Nearest-rank ``q``-th percentile of the masked elements of ``x``
    (last axis), with ``cnt`` = number of valid elements. ``k_static`` must
    bound the distance of the rank from the nearer end (use
    :func:`static_bound_for_alpha` with ``alpha = min(q, 100−q)``)."""
    idx = nearest_rank_index(q, cnt)
    if q <= 50:
        return kth_smallest(x, idx, k_static, mask)
    j = jnp.maximum(cnt.astype(jnp.int32) - 1 - idx, 0)
    return kth_largest(x, j, k_static, mask)


def static_nearest_rank_index(q: int, n: int) -> int:
    """Python-int version of :func:`nearest_rank_index` for static counts."""
    quotient, rem = divmod(int(q) * (int(n) - 1), 100)
    round_up = rem > 50 or (rem == 50 and quotient % 2 == 1)
    return max(quotient + int(round_up), 0)


def percentile_all(x: jnp.ndarray, q: int) -> jnp.ndarray:
    """Nearest-rank ``q``-th percentile over the full last axis (static rank)."""
    p = x.shape[-1]
    idx = static_nearest_rank_index(q, p)
    if q <= 50:
        return kth_smallest(x, jnp.full(x.shape[:-1], idx, jnp.int32), idx + 1)
    j = p - 1 - idx
    return kth_largest(x, jnp.full(x.shape[:-1], j, jnp.int32), j + 1)
