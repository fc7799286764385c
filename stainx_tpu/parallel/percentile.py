"""Exact distributed nearest-rank percentile — key-space radix descent
with ``psum``-reduced byte histograms.

The single-chip path selects ranks with VMEM-resident radix/interval
descent (:mod:`stainx_tpu.kernels.selection`); across chips a gathered
top-k would move ~1% of all pixels over ICI. Instead the descent runs in
**key space**: f32 values map to the order-isomorphic uint32 key
(``selection._monotone_key``), and each of exactly **four** levels builds
a 256-bin histogram of the survivors' next key byte (one fused
compare-reduce pass locally, one (K, 256) int32 ``psum`` globally),
descends into the byte bucket containing the target rank, and extends the
carried prefix. After four levels the prefix IS the full 32-bit key of
the rank element — survivors are bit-identical by construction — and the
value is its inverse mapping. No gather, no caps, no value-space interval
arithmetic.

This replaces the round-1/round-2 VALUE-space refinement, whose fixed
``span/256^depth`` shrink could still leave more survivors than its final
gather cap on wide-dynamic-range data (e.g. a 3e38 outlier over a cloud
of 1e-30-spaced values) and silently return a clamped wrong rank.
Key-space levels consume 8 of the key's 32 bits each, so exactness after
4 levels is structural, for ANY f32 data including ±inf and denormals.

Multiple percentiles evaluate **together**: ``x`` may be (K, P_local)
with one rank per row (flat ``q``), or each row may carry M ranks
(nested ``q``) sharing one descent over the SAME un-duplicated field —
each level then costs ONE (K, M, 256) ``psum`` round instead of K·M
sequential collectives. The Macenko fit selects its φ α/100−α pair from
one φ row this way, and the pixel-sharded transform its per-image φ
pairs; the C0/C1 99th percentiles are two genuine field rows.

Communication: 1 count psum + 4 × (K×256) int32 psums — independent of
pixel count, shard count, and data distribution.

Count range: counts and ranks are int32 — exact up to 2³¹−1 pooled valid
pixels (≈ 8 000 chips × 64 × 512² tiles in ONE batch-mode fit step).
Between 2³¹ and 2³² the psum wraps negative and the result is NaN (the
``cnt > 0`` guard); this is the documented ceiling.

Counterpart of the reference's sort+gather percentile machinery
(``src/stainx_cuda_torch/csrc/macenko.cu:52-58``), which never had to
distribute; SURVEY §2.3 names this the psum-native design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stainx_tpu.kernels.selection import _monotone_key, _unkey
from stainx_tpu.ops.percentile import nearest_rank_index


def distributed_masked_percentile(
    x: jnp.ndarray,
    mask: jnp.ndarray | None,
    q,
    axis_name,
    levels: int = 0,
) -> jnp.ndarray:
    """Global nearest-rank percentile(s) of the masked union of every
    shard's ``x``. Call inside ``shard_map``; ``axis_name`` may be one name
    or a tuple. ``x``/``mask`` are local shards, either 1D (one field, one
    percentile ``q``) or (K, P) rows. ``q`` forms:

    - a scalar (1D ``x``) → scalar result;
    - a length-K flat sequence, one percentile per row → (K,) result;
    - a length-K sequence of equal-length-M sequences — M percentiles of
      EACH row sharing one descent (the per-level collective becomes one
      (K, M, 256) psum) → (K, M) result, or (M,) when ``x`` is 1D with a
      single nested row. This is how callers select several ranks of the
      same field without duplicating the field in memory (e.g. the
      Macenko φ α/100−α pair).

    ``mask=None`` means every element is valid — no mask plane is
    materialized. ``levels`` is accepted for API compatibility and
    ignored: the key-space descent always runs exactly four byte levels,
    after which the result is structurally exact (module docstring).
    """
    del levels
    single = x.ndim == 1
    x2 = (x[None] if single else x).astype(jnp.float32)
    if mask is not None:
        mask = mask[None] if single else mask
    k_rows = x2.shape[0]
    # Scalars of any integral flavor (int, numpy integer, 99.0) are a single
    # percentile; flat sequences are one-per-row; nested sequences are
    # M-per-row (all rows the same M).
    if isinstance(q, (tuple, list)) and len(q) and isinstance(q[0], (tuple, list)):
        qs2 = tuple(tuple(row) for row in q)
        m_ranks = len(qs2[0])
        if any(len(row) != m_ranks for row in qs2):
            raise ValueError("nested q rows must all have the same length")
        multi = True
    else:
        qs = tuple(q) if isinstance(q, (tuple, list)) else (q,)
        qs2 = tuple((v,) for v in qs)
        m_ranks = 1
        multi = False
    if len(qs2) != k_rows:
        raise ValueError(f"{len(qs2)} percentile rows for {k_rows} data rows")

    keys = _monotone_key(x2)  # (K, P) uint32, order-isomorphic to the f32s
    bins = jnp.arange(256, dtype=jnp.int32)
    if mask is None:
        # All-valid, derived from the VARYING keys (not jnp.ones/jnp.full):
        # a device-invariant value fed to psum, or carried against the
        # loop's device-varying carry output, fails shard_map tracing under
        # the default check_vma=True (round-3 review finding, reproduced).
        mask_full = keys == keys
    else:
        mask_full = mask
    cnt = jax.lax.psum(jnp.sum(mask_full, axis=-1, dtype=jnp.int32), axis_name)  # (K,)
    r0 = jnp.stack(
        [
            jnp.stack([nearest_rank_index(qs2[i][j], cnt[i]) for j in range(m_ranks)])
            for i in range(k_rows)
        ]
    )  # (K, M)
    def body(level, state):
        # Carry is O(K·M): the LEFT-ALIGNED key prefix (top 8·level bits
        # chosen so far, lower bits zero) and the residual rank. Survivor
        # membership is re-derived from the prefix each level — survivor ⇔
        # the element's top 8·level key bits equal the prefix (AND the
        # caller's mask) — so no (K, M, P) plane is ever carried between
        # levels; the per-level compare fuses into the histogram reduce.
        prefix, r = state  # (K, M) u32 / (K, M) i32
        hi_mask = ~jax.lax.shift_right_logical(
            jnp.uint32(0xFFFFFFFF), (8 * level).astype(jnp.uint32)
        )  # top 8·level bits (all-zero at level 0 → every element survives)
        survivor = (keys & hi_mask)[:, None, :] == prefix[..., None]  # (K, M, P)
        if mask is not None:
            survivor = survivor & mask_full[:, None, :]
        shift = (24 - 8 * level).astype(jnp.uint32)
        byte = (
            jax.lax.shift_right_logical(keys, jnp.broadcast_to(shift, keys.shape))
            & jnp.uint32(255)
        ).astype(jnp.int32)  # (K, P), shared by every rank of the row
        eq = (byte[:, None, None, :] == bins[None, None, :, None]) & survivor[:, :, None, :]
        hist = jax.lax.psum(
            jnp.sum(eq, axis=-1, dtype=jnp.int32), axis_name
        )  # ONE (K, M, 256) collective per level
        c = jnp.cumsum(hist, axis=-1)
        bsel = jnp.minimum(jnp.sum((c <= r[..., None]).astype(jnp.int32), -1), 255)
        below = jnp.where(
            bsel > 0,
            jnp.take_along_axis(c, jnp.maximum(bsel - 1, 0)[..., None], -1)[..., 0],
            0,
        )
        new_prefix = prefix | jax.lax.shift_left(bsel.astype(jnp.uint32), shift)
        return new_prefix, r - below

    prefix0 = jnp.zeros((k_rows, m_ranks), jnp.uint32)
    prefix, _r = jax.lax.fori_loop(0, 4, body, (prefix0, r0))

    # Four byte levels consumed all 32 key bits: the prefix IS the key of
    # the global nearest-rank element.
    result = _unkey(prefix)  # (K, M)
    # Degenerate global cases: no valid values → NaN (caller's contract).
    result = jnp.where((cnt > 0)[:, None], result, jnp.float32(jnp.nan))
    if multi:
        return result[0] if single else result
    return result[0, 0] if single else result[:, 0]
