"""Fully-fused Pallas Macenko hot path: the whole per-image transform in
one kernel.

The jnp pipeline materializes OD (N·P·3 f32), the projected angle field and
both concentration fields in HBM between stages. :func:`_mega_kernel`
instead loads each image's RAW uint8/float row into VMEM once and computes
everything on-chip — OD, β-mask, moments, the scalar analytic eigh, the
stain-plane projection, the rank selections, and the reconstruction — so
HBM traffic for the whole Macenko transform is one read of the input plus
one write of the output.

Angle percentiles select on a **monotone pseudo-angle** (the
piecewise-rational "diamond angle", order-isomorphic to atan2 on (−π, π])
because Mosaic has no atan2 lowering — and none is needed: the reference
only ever uses cos(φ*)/sin(φ*) of the percentile angle
(``torch_backend.py:502-510``), and the diamond angle is piecewise LINEAR
in the direction components, so (cos, sin) is recovered algebraically
from the selected angle value alone (:func:`_dir_from_pseudo`) — the φ
selects are keyed single-reduce reads. Selection rides the descent
machinery of :mod:`stainx_tpu.kernels.selection` (bit-exact, scalar-only
while carry).
(The round-1 staged ``phi_select_pallas``/``c_select_pallas`` kernels were
removed once the mega kernel covered their entire size range — dead code
with no parity coverage otherwise.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainx_tpu.kernels import interpret_mode
from stainx_tpu.kernels.selection import (
    _SEED_DELTAS,
    _monotone_key,
    exact_terminal_mode,
    radix_select_multi,
)

_LANE = 128
_IO = 240.0
_BETA = 0.15
MAX_ROW_BYTES = 6 * 1024 * 1024  # input row VMEM budget


def _cos_third_acos(r):
    """cos(acos(r)/3) without trig (Mosaic has no acos/atan2): the root of
    the triple-angle identity 4c³ − 3c = r on [0.5, 1] — monotone there, so
    12 bisections + 3 clamped Newton steps reach f32 precision. The
    conditioning at r → ±1 matches acos's own (double eigenvalue)."""

    def bis(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        g = 4.0 * mid * mid * mid - 3.0 * mid - r
        return jnp.where(g < 0, mid, lo), jnp.where(g < 0, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 12, bis, (jnp.float32(0.5), jnp.float32(1.0)))
    c = 0.5 * (lo + hi)

    def newt(_, c):
        g = 4.0 * c * c * c - 3.0 * c - r
        gp = jnp.maximum(12.0 * c * c - 3.0, 1e-6)
        return jnp.clip(c - g / gp, 0.5, 1.0)

    return jax.lax.fori_loop(0, 3, newt, c)


def _eigh3_top2_scalars(a00, a01, a02, a11, a12, a22):
    """Scalar-only analytic 3×3 symmetric eigendecomposition (the math of
    :mod:`stainx_tpu.ops.eigh3`, re-expressed without arrays — Mosaic's
    layout inference rejects rank-1 vectors, so in-kernel linear algebra
    stays scalar). Returns the middle/largest eigenvectors as 6 scalars
    (v00, v10, v20, v01, v11, v21): columns of the (3, 2) stain plane."""
    tiny = 1e-30
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, tiny))
    inv_p = 1.0 / p
    b00, b11, b22 = (a00 - q) * inv_p, (a11 - q) * inv_p, (a22 - q) * inv_p
    b01, b02, b12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    det_b = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    # cos(acos(r)/3) and cos(acos(r)/3 + 2π/3) via the triple-angle root.
    cc = _cos_third_acos(r)
    ss = jnp.sqrt(jnp.maximum(1.0 - cc * cc, 0.0))  # sin(acos(r)/3) ≥ 0
    e_max_t = q + 2.0 * p * cc
    e_min_t = q + 2.0 * p * (-0.5 * cc - 0.8660254 * ss)
    e_mid_t = 3.0 * q - e_max_t - e_min_t

    # (Effectively) diagonal: eigenvalues are the sorted diagonal entries.
    d_max = jnp.maximum(jnp.maximum(a00, a11), a22)
    d_min = jnp.minimum(jnp.minimum(a00, a11), a22)
    d_mid = a00 + a11 + a22 - d_max - d_min
    diag = p1 <= tiny
    e_mid = jnp.where(diag, d_mid, e_mid_t)
    e_max = jnp.where(diag, d_max, e_max_t)

    def nullspace(lam):
        m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
        # Cross products of the rows of (A − λI):
        # r0=(m00,a01,a02), r1=(a01,m11,a12), r2=(a02,a12,m22)
        c01 = (a01 * a12 - a02 * m11, a02 * a01 - m00 * a12, m00 * m11 - a01 * a01)
        c02 = (a01 * m22 - a02 * a12, a02 * a02 - m00 * m22, m00 * a12 - a01 * a02)
        c12 = (m11 * m22 - a12 * a12, a12 * a02 - a01 * m22, a01 * a12 - m11 * a02)
        n01 = c01[0] ** 2 + c01[1] ** 2 + c01[2] ** 2
        n02 = c02[0] ** 2 + c02[1] ** 2 + c02[2] ** 2
        n12 = c12[0] ** 2 + c12[1] ** 2 + c12[2] ** 2
        bx = jnp.where(n02 > n01, c02[0], c01[0])
        by = jnp.where(n02 > n01, c02[1], c01[1])
        bz = jnp.where(n02 > n01, c02[2], c01[2])
        bn = jnp.maximum(n01, n02)
        bx = jnp.where(n12 > bn, c12[0], bx)
        by = jnp.where(n12 > bn, c12[1], by)
        bz = jnp.where(n12 > bn, c12[2], bz)
        norm = jnp.sqrt(bx * bx + by * by + bz * bz)
        inv = jnp.where(norm > 1e-30, 1.0 / jnp.maximum(norm, 1e-38), 0.0)
        return bx * inv, by * inv, bz * inv

    v00, v10, v20 = nullspace(e_mid)
    v01, v11, v21 = nullspace(e_max)
    return v00, v10, v20, v01, v11, v21


def _cov_scalars(cnt, s0, s1_, s2_, xx, xy, xz, yy, yz, zz):
    """Masked-covariance entries from raw moment sums, scalar-only — THE
    in-kernel covariance formula, shared by the resident and streaming
    kernels like :func:`_od_from_planes` so it cannot drift between them
    (jnp twin: ``ops.macenko.cov_from_moments``). Zeros when cnt ≤ 1."""
    safe = jnp.maximum(cnt, 1.0)
    mu0, mu1, mu2 = s0 / safe, s1_ / safe, s2_ / safe
    den = jnp.maximum(cnt - 1.0, 1.0)
    ok = cnt > 1.0
    zero = jnp.float32(0.0)
    a00 = jnp.where(ok, (xx - cnt * mu0 * mu0) / den, zero)
    a01 = jnp.where(ok, (xy - cnt * mu0 * mu1) / den, zero)
    a02 = jnp.where(ok, (xz - cnt * mu0 * mu2) / den, zero)
    a11 = jnp.where(ok, (yy - cnt * mu1 * mu1) / den, zero)
    a12 = jnp.where(ok, (yz - cnt * mu1 * mu2) / den, zero)
    a22 = jnp.where(ok, (zz - cnt * mu2 * mu2) / den, zero)
    return a00, a01, a02, a11, a12, a22


def _he_scalars_from_phi(evs, cos_lo, sin_lo, cos_hi, sin_hi):
    """φ-extreme stain vectors → H/E-ordered columns ``(h0, h1)``,
    scalar-only (jnp twin: ``ops.macenko._he_from_phi_extremes``). Split
    out of :func:`_stain_scalars_from_phi` because the fit kernels output
    the HE matrix itself (``torch_backend.py:502-510``)."""
    v00, v10, v20, v01, v11, v21 = evs
    vmin = [v00 * cos_lo + v01 * sin_lo, v10 * cos_lo + v11 * sin_lo, v20 * cos_lo + v21 * sin_lo]
    vmax = [v00 * cos_hi + v01 * sin_hi, v10 * cos_hi + v11 * sin_hi, v20 * cos_hi + v21 * sin_hi]
    swap = vmin[0] > vmax[0]
    h0 = [jnp.where(swap, vmin[c], vmax[c]) for c in range(3)]
    h1 = [jnp.where(swap, vmax[c], vmin[c]) for c in range(3)]
    return h0, h1


def _normal_rows_from_he(h0, h1):
    """2×2 normal-equation rows ``(m0, m1)`` of the HE columns — the
    closed-form least-squares solve (jnp twin: ``ops.macenko.
    _concentrations_2x2``)."""
    a = h0[0] * h0[0] + h0[1] * h0[1] + h0[2] * h0[2]
    b = h0[0] * h1[0] + h0[1] * h1[1] + h0[2] * h1[2]
    c_ = h1[0] * h1[0] + h1[1] * h1[1] + h1[2] * h1[2]
    # Finite-inverse clamp — mirrors ops.macenko._concentrations_2x2:
    # bit-identical to 1/det when the stain pair is well-posed, finite
    # when a uniform tile makes the columns (anti)parallel.
    inv_det = jnp.clip(1.0 / (a * c_ - b * b), -1e12, 1e12)
    m0 = [(c_ * h0[d] - b * h1[d]) * inv_det for d in range(3)]
    m1 = [(a * h1[d] - b * h0[d]) * inv_det for d in range(3)]
    return m0, m1


def _stain_scalars_from_phi(evs, cos_lo, sin_lo, cos_hi, sin_hi):
    """φ-extreme stain vectors → H/E ordering → 2×2 normal-equation rows
    ``(m0, m1)``, scalar-only — shared by both transform kernels (the maxC
    guard below was a round-2 advisor fix that had to be applied twice;
    this is the lesson). ``evs``: the 6 eigenvector scalars of
    :func:`_eigh3_top2_scalars`. jnp twins: ``ops.macenko.
    _he_from_phi_extremes`` + ``_concentrations_2x2``."""
    h0, h1 = _he_scalars_from_phi(evs, cos_lo, sin_lo, cos_hi, sin_hi)
    return _normal_rows_from_he(h0, h1)


def _maxc_scale(tmc, maxc):
    """maxC floor — mirrors ops.macenko: keeps a uniform tile's 0/0
    finite. Sign-preserving (|maxC| test): negative 99th-percentile
    concentrations on degenerate-but-real tiles divide through unchanged,
    like the reference (round-2 advisor finding — fixed in two kernels at
    once back then; defined ONCE now)."""
    return tmc / jnp.where(jnp.abs(maxc) > 1e-30, maxc, 1e-30)


def _od_from_planes(planes, is_uint8: bool):
    """OD of three raw channel planes — THE in-kernel OD definition
    (``ops.macenko.optical_density`` is the jnp-level twin; uint8 hops
    through int32, a Mosaic cast constraint). Shared with the streaming
    kernel so the formula cannot drift between backends."""
    if is_uint8:
        ps = [p.astype(jnp.int32).astype(jnp.float32) for p in planes]
        return [-jnp.log((p + 1.0) / _IO) for p in ps]
    ps = [p.astype(jnp.float32) for p in planes]
    return [-jnp.log((p * 255.0 + 1.0) / _IO) for p in ps]


def _od_planes(x_ref, is_uint8: bool):
    return _od_from_planes([x_ref[0, c] for c in range(3)], is_uint8)


def _pseudo_angle(t0, t1):
    """Diamond angle: piecewise-rational, order-isomorphic to atan2(t1, t0)
    on (−π, π] (range (−2, 2])."""
    s = jnp.abs(t0) + jnp.abs(t1) + 1e-37
    a = t1 / s
    return jnp.where(t0 >= 0, a, jnp.where(t1 >= 0, 2.0 - a, -2.0 - a))


def _dir_from_pseudo(p):
    """(cos, sin) of the direction a diamond angle encodes — the inverse
    of :func:`_pseudo_angle` up to the (irrelevant) radius. On the L1
    circle the angle is piecewise LINEAR in the direction components:
    |p| ≤ 1 ⇒ (1−|p|, p); p > 1 ⇒ (1−p, 2−p); p < −1 ⇒ (1+p, −2−p), then
    normalize. Lets the φ selects read ONLY the keyed angle value (one
    reduce) instead of the member's (t0, t1) pair (an index round trip),
    and makes duplicate resolution value-deterministic."""
    ap = jnp.abs(p)
    u = jnp.where(ap <= 1.0, 1.0 - ap, jnp.where(p > 1.0, 1.0 - p, 1.0 + p))
    v = jnp.where(ap <= 1.0, p, jnp.where(p > 1.0, 2.0 - p, -2.0 - p))
    norm = jnp.sqrt(u * u + v * v)
    inv = jnp.where(norm > 1e-30, 1.0 / norm, 0.0)
    return u * inv, v * inv


# A terminal farther than this from the previous image's is a seed MISS —
# BY DEFINITION the widest probe bracket (a farther terminal means the
# bracket could not have contained it), so it references _SEED_DELTAS
# rather than copying the value: retuning the brackets retunes the miss
# test with them (the brackets have been retuned once already).
_MISS_DELTA = _SEED_DELTAS[0]
_MISS_LIMIT = 2  # per-pair streak ⇒ a pair stops seeding after 2 all-miss images


def _seed_missed(prev, t):
    """Whether terminal ``t`` landed outside the widest probe bracket
    around the previous terminal ``prev`` — THE miss test (one definition
    for the resident, streaming and fit kernels). The clip keeps the
    bracket arithmetic overflow-free near the int32 edges."""
    lim = jnp.int32(1 << 20)
    prev = jnp.clip(prev, jnp.int32(-0x80000000) + lim, jnp.int32(0x7FFFFFFF) - lim)
    return (t > prev + jnp.int32(_MISS_DELTA)) | (t < prev - jnp.int32(_MISS_DELTA))


def _select_seeded(selects, seed_slots, seed_ref, streak_slot, counts=None, have_prev0=None):
    """Keyed rank select with cross-image seeding: probe first around the
    PREVIOUS grid step's terminal keys for the same slots (batch images
    share a staining distribution, so percentiles drift little image to
    image), then store this image's terminals for the next step. The
    scratch persists across grid steps (sequential on the core); step 0
    marks its seeds invalid and descends normally. Seeds only place probe
    cuts — counts stay exact, so results are bit-identical to every other
    descent mode (the ablation harness asserts it). Modes without an
    exact-terminal exit ignore the seed path entirely. ``counts``
    (per-descent known member counts) additionally lets the seeded
    interval descent skip its init row pass on seeded steps.

    **Miss-streak cutout** (``streak_slot``, one PER loop-pair): a
    heterogeneous batch makes seeds miss, costing ~6% over unseeded
    (measured, alternating he_scale 0.7/1.4 tiles). Terminals are always
    compared against the previous image's regardless of whether seeding
    was active; a call whose descents are ALL farther than the widest
    probe bracket bumps its streak, any near terminal resets it, and
    seeding disables while the streak is ≥ ``_MISS_LIMIT`` — bounding the
    heterogeneous penalty to ~2 images and self-re-enabling one image
    after the stream stabilizes. The streak is per pair because the
    pairs decorrelate: the alternating-scale batch leaves the
    scale-invariant φ angles' seeds HITTING while both concentration
    seeds miss every image — a shared streak would never trip.

    NaN caveat: ``counts`` includes every pixel the caller counted, but
    the descent's loose-init skip excludes NaN-keyed elements (their key
    is the sentinel). With non-finite input pixels — which no layer
    validates, matching the reference — the seeded counts path can
    therefore select a different element than the other descent modes:
    cross-mode bit-parity is guaranteed for finite inputs only (both
    results are garbage-in anyway; round-4 advisor note).

    ``have_prev0`` (optional scalar): whether grid step 0 ALSO holds a
    valid previous state — the cross-CALL carry case, where the caller
    loaded a prior call's terminal keys into the scratch before step 0.
    Default (None) keeps the original step-0-unseeded behavior."""
    pid = pl.program_id(0)
    streak = seed_ref[streak_slot]
    if have_prev0 is None:
        have_prev = pid > 0
    else:
        have_prev = (pid > 0) | have_prev0
    valid = have_prev & (streak < _MISS_LIMIT)
    seeds = [(seed_ref[s], valid) for s in seed_slots]
    if not exact_terminal_mode(selects, seeds=seeds):
        return radix_select_multi(selects, keyed=True)  # nocon/defer ablations
    results, terminal = radix_select_multi(
        selects, keyed=True, seeds=seeds, want_terminal=True, counts=counts
    )
    all_far = None
    for s, t in zip(seed_slots, terminal):
        far = _seed_missed(seed_ref[s], t)
        all_far = far if all_far is None else (all_far & far)
        seed_ref[s] = t
    seed_ref[streak_slot] = jnp.where(
        jnp.logical_not(have_prev),
        jnp.int32(0),
        jnp.where(all_far, streak + 1, jnp.int32(0)),
    )
    return results


def _mega_kernel(
    params_ref,
    *rest,
    is_uint8: bool,
    p_true: int,
    alpha: int,
    idx_hi_conc: int,
    carry: bool = False,
):
    """The ENTIRE per-image Macenko transform in one grid step: the row is
    loaded once, every statistic/selection/reconstruction happens in VMEM,
    and the only HBM write is the output row. Per-image indexing lives in
    the BlockSpec index_maps — the kernel body itself is image-agnostic
    (all refs are block-local) except for the cross-image seed scratch
    (:func:`_select_seeded`).

    ``carry`` (static): cross-CALL seed carry — the caller supplies a
    prior call's terminal state (7 int32: 4 terminal keys, 2 per-pair
    miss streaks, 1 valid flag) as a second prefetch operand; grid step 0
    then seeds like any later image, and the final step's state is
    written to an SMEM output for the next call. Pure probe placement —
    outputs stay bit-exact for any state."""
    if carry:
        seed_in_ref, x_ref, out_ref, seed_out_ref, seed_ref = rest
        pid0 = pl.program_id(0)

        @pl.when(pid0 == 0)
        def _():
            for s_i in range(6):
                seed_ref[s_i] = seed_in_ref[0, s_i]

        have_prev0 = seed_in_ref[0, 6] > 0
    else:
        x_ref, out_ref, seed_ref = rest
        have_prev0 = None
    od = _od_planes(x_ref, is_uint8)
    s, lane = od[0].shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (s, lane), 0) * lane + jax.lax.broadcasted_iota(
        jnp.int32, (s, lane), 1
    )
    in_image = idx < p_true

    od_min = jnp.minimum(jnp.minimum(od[0], od[1]), od[2])
    bmask = (od_min >= _BETA) & in_image
    y = [o - 1.0 for o in od]  # centered (cov is center-invariant)

    def moments(weight):
        w = weight.astype(jnp.float32)
        cnt = jnp.sum(w)
        s0, s1_, s2_ = jnp.sum(w * y[0]), jnp.sum(w * y[1]), jnp.sum(w * y[2])
        xx = jnp.sum(w * y[0] * y[0])
        xy = jnp.sum(w * y[0] * y[1])
        xz = jnp.sum(w * y[0] * y[2])
        yy = jnp.sum(w * y[1] * y[1])
        yz = jnp.sum(w * y[1] * y[2])
        zz = jnp.sum(w * y[2] * y[2])
        return cnt, s0, s1_, s2_, xx, xy, xz, yy, yz, zz

    # The <3-pixel fallback stays a lax.cond: computing both masks'
    # moments unconditionally (20 fused reduces, one sync) measured 6%
    # SLOWER end-to-end — for this rarely-taken branch Mosaic does skip
    # the untaken side's 10 full-row reduces, so the general
    # "cond pays for both branches" rule does not apply here.
    m = moments(bmask)
    use_all = m[0] < 3.0
    m = jax.lax.cond(use_all, lambda: moments(in_image), lambda: m)
    cnt, s0, s1_, s2_, xx, xy, xz, yy, yz, zz = m

    evs = _eigh3_top2_scalars(*_cov_scalars(cnt, s0, s1_, s2_, xx, xy, xz, yy, yz, zz))
    v00, v10, v20, v01, v11, v21 = evs

    t0 = od[0] * v00 + od[1] * v10 + od[2] * v20
    t1 = od[0] * v01 + od[1] * v11 + od[2] * v21
    pseudo = _pseudo_angle(t0, t1)
    eff_mask = (bmask | use_all) & in_image
    key = _monotone_key(jnp.where(eff_mask, pseudo, jnp.inf))

    cnt_i = jnp.round(cnt).astype(jnp.int32)
    from stainx_tpu.ops.percentile import nearest_rank_index

    r_lo = nearest_rank_index(alpha, cnt_i)
    r_hi = nearest_rank_index(100 - alpha, cnt_i)

    # cnt_i is exactly the φ keys' member count: eff_mask = (bmask|use_all)
    # & in_image, whose population is the chosen moments count either way.
    phi_results = _select_seeded(
        [(key, r_lo, (pseudo,)), (key, r_hi, (pseudo,))],
        (0, 1),
        seed_ref,
        4,
        counts=(cnt_i, cnt_i),
        have_prev0=have_prev0,
    )
    cos_lo, sin_lo = _dir_from_pseudo(phi_results[0][0])
    cos_hi, sin_hi = _dir_from_pseudo(phi_results[1][0])
    m0, m1 = _stain_scalars_from_phi(evs, cos_lo, sin_lo, cos_hi, sin_hi)

    c0 = od[0] * m0[0] + od[1] * m0[1] + od[2] * m0[2]
    c1 = od[0] * m1[0] + od[1] * m1[1] + od[2] * m1[2]
    rank_hi = jnp.int32(idx_hi_conc)
    c_results = _select_seeded(
        [
            (_monotone_key(jnp.where(in_image, c0, jnp.inf)), rank_hi, (c0,)),
            (_monotone_key(jnp.where(in_image, c1, jnp.inf)), rank_hi, (c1,)),
        ],
        (2, 3),
        seed_ref,
        5,
        counts=(jnp.int32(p_true), jnp.int32(p_true)),
        have_prev0=have_prev0,
    )
    (maxc0,), (maxc1,) = c_results

    tmc0, tmc1 = params_ref[0, 0], params_ref[0, 1]
    stain = [[params_ref[0, 2 + 2 * c + k] for k in range(2)] for c in range(3)]
    scale0 = _maxc_scale(tmc0, maxc0)
    scale1 = _maxc_scale(tmc1, maxc1)

    cn0 = c0 * scale0
    cn1 = c1 * scale1
    for c in range(3):
        rec = jnp.clip(_IO * jnp.exp(-(stain[c][0] * cn0 + stain[c][1] * cn1)), 0.0, 255.0)
        if is_uint8:
            out_ref[0, c] = rec.astype(jnp.int32).astype(jnp.uint8)
        else:
            out_ref[0, c] = rec

    if carry:
        @pl.when(pid0 == pl.num_programs(0) - 1)
        def _():
            for s_i in range(6):
                seed_out_ref[s_i] = seed_ref[s_i]
            seed_out_ref[6] = jnp.int32(1)


SEED_STATE_LEN = 7  # 4 terminal keys + 2 per-pair miss streaks + valid flag


def seed_state_init():
    """Fresh (empty) cross-call seed state — valid flag 0, so the first
    call descends exactly as without carry."""
    return jnp.zeros((SEED_STATE_LEN,), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def macenko_transform_mega(
    images, stain_matrix, target_max_conc, seed_state=None, interpret: bool | None = None
):
    """One-kernel Macenko transform: (N, 3, H, W) uint8/float [0,1] →
    normalized batch (same dtype, [0,255] range). HBM traffic = one read of
    the input + one write of the output.

    ``seed_state`` (optional, (7,) int32 from :func:`seed_state_init`):
    cross-CALL seed carry — image 0 of this call seeds its descents from
    the previous call's terminal keys, and the return becomes
    ``(out, new_state)``. Bit-exact for any state (probe placement only);
    the per-pair miss-streak cutout bounds heterogeneous-stream cost."""
    if interpret is None:
        interpret = interpret_mode()
    x4, p_true, s = _row_layout(images)
    n = x4.shape[0]
    p = p_true

    from stainx_tpu.ops.macenko import ALPHA
    from stainx_tpu.ops.percentile import static_nearest_rank_index

    # Ranks derive from the single ALPHA constant, like every other path.
    idx_hi_conc = static_nearest_rank_index(99, p)
    params = jnp.concatenate(
        [target_max_conc.reshape(2).astype(jnp.float32), stain_matrix.reshape(6).astype(jnp.float32)]
    ).reshape(1, 8)

    carry = seed_state is not None
    n_prefetch = 2 if carry else 1
    index_map = (lambda i, p_, s_: (i, 0, 0, 0)) if carry else (lambda i, p_: (i, 0, 0, 0))
    block = pl.BlockSpec((1, 3, s, _LANE), index_map, memory_space=pltpu.VMEM)
    out_specs = [block, pl.BlockSpec(memory_space=pltpu.SMEM)] if carry else block
    out_shape = (
        [
            jax.ShapeDtypeStruct(x4.shape, images.dtype),
            jax.ShapeDtypeStruct((SEED_STATE_LEN,), jnp.int32),
        ]
        if carry
        else jax.ShapeDtypeStruct(x4.shape, images.dtype)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n,),
        in_specs=[block],
        out_specs=out_specs,
        # Cross-image seed scratch (4 terminal keys: φ lo/hi, c0/c1 maxes +
        # one miss-streak counter per loop-pair) — persists across the
        # sequential grid steps; see _select_seeded.
        scratch_shapes=[pltpu.SMEM((6,), jnp.int32)],
    )
    kernel = functools.partial(
        _mega_kernel,
        is_uint8=images.dtype == jnp.uint8,
        p_true=p_true,
        alpha=int(ALPHA),
        idx_hi_conc=idx_hi_conc,
        carry=carry,
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    if carry:
        out, new_state = call(params, seed_state.reshape(1, SEED_STATE_LEN).astype(jnp.int32), x4)
    else:
        out = call(params, x4)

    n_, c, h, w = images.shape
    out = out.reshape(n_, c, s * _LANE)
    if s * _LANE != h * w:
        out = out[:, :, : h * w]
    out = out.reshape(n_, c, h, w)
    return (out, new_state) if carry else out


def _row_layout(images: jnp.ndarray):
    n, c, h, w = images.shape
    p = h * w
    pad = (-p) % (8 * _LANE)
    flat = images.reshape(n, c, p)
    if pad:
        pad_value = 255 if images.dtype == jnp.uint8 else 1.0
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)), constant_values=pad_value)
    s = flat.shape[2] // _LANE
    return flat.reshape(n, c, s, _LANE), p, s


# Mega-kernel row ceiling. Round 1 capped this at 512² believing 16 MB was
# the physical VMEM; that number is only XLA's default *scoped* budget —
# with `vmem_limit_bytes` raised, the kernel compiles and runs at 1024²
# (41 MB working set, measured 1351 MPix/s vs 725 on the jnp path) and at
# 1280×1024. Larger rows fall to the jnp pipeline (+ radix-select kernel
# while rows fit MAX_ROW_ELEMS).
MAX_FUSED_PIXELS = 1_310_720  # 1280×1024, largest compile-verified row


def fused_row_budget_ok(images_shape, dtype) -> bool:
    # The kernels store f32 results into an out_ref of the input dtype:
    # only uint8 (explicit cast) and float32 are lowered. Other float
    # dtypes (bf16/f16/f64) stay on the XLA path, which handles the
    # normalize→compute-f32→preserve_dtype round trip.
    if dtype not in (jnp.uint8, jnp.float32):
        return False
    _, c, h, w = images_shape
    itemsize = 1 if dtype == jnp.uint8 else 4
    return h * w <= MAX_FUSED_PIXELS and c * h * w * itemsize <= MAX_ROW_BYTES


# ---------------------------------------------------------------- fit kernel
def _fit_mega_kernel(*refs, is_uint8: bool, p_true: int, alpha: int,
                     idx_hi_conc: int, carry: bool = False):
    """The ENTIRE pooled Macenko fit in one kernel: OD, β-filter, moments,
    scalar eigh, φ percentile selects, HE ordering, concentration 99th
    percentiles — one VMEM residency, HBM traffic = one read of the
    pooled input + an 8-scalar SMEM write.

    Fit semantics (``compute_reference_stain_matrix_torch``,
    ``torch_backend.py:463-519``, matching ``ops.macenko.macenko_fit``):
    pixels of the whole batch POOLED into one row, β-filter **without**
    the <3-pixel fallback, covariance and φ percentiles over filtered
    pixels only, concentrations and their 99th percentile over ALL pooled
    pixels. No reconstruction — the outputs ARE the fitted parameters.

    ``carry`` (static): cross-CALL seed carry for fit-per-forward batch
    mode — consecutive forwards fit on same-distribution batches, so the
    previous call's terminal keys place this call's probe cuts
    (:func:`_select_seeded`; bit-exact, probe placement only)."""
    if carry:
        seed_in_ref, x_ref, out_ref, seed_out_ref, seed_ref = refs
        # Grid is (1,): load the carried state unconditionally.
        for s_i in range(6):
            seed_ref[s_i] = seed_in_ref[0, s_i]
        have_prev0 = seed_in_ref[0, 6] > 0
    else:
        x_ref, out_ref = refs
        seed_ref = have_prev0 = None
    od = _od_planes(x_ref, is_uint8)
    s, lane = od[0].shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (s, lane), 0) * lane + (
        jax.lax.broadcasted_iota(jnp.int32, (s, lane), 1)
    )
    in_image = idx < p_true

    od_min = jnp.minimum(jnp.minimum(od[0], od[1]), od[2])
    bmask = (od_min >= _BETA) & in_image
    y = [o - 1.0 for o in od]  # centered (cov is center-invariant)

    w = bmask.astype(jnp.float32)
    cnt = jnp.sum(w)
    s0, s1_, s2_ = jnp.sum(w * y[0]), jnp.sum(w * y[1]), jnp.sum(w * y[2])
    xx = jnp.sum(w * y[0] * y[0])
    xy = jnp.sum(w * y[0] * y[1])
    xz = jnp.sum(w * y[0] * y[2])
    yy = jnp.sum(w * y[1] * y[1])
    yz = jnp.sum(w * y[1] * y[2])
    zz = jnp.sum(w * y[2] * y[2])

    evs = _eigh3_top2_scalars(*_cov_scalars(cnt, s0, s1_, s2_, xx, xy, xz, yy, yz, zz))
    v00, v10, v20, v01, v11, v21 = evs

    t0 = od[0] * v00 + od[1] * v10 + od[2] * v20
    t1 = od[0] * v01 + od[1] * v11 + od[2] * v21
    pseudo = _pseudo_angle(t0, t1)
    key = _monotone_key(jnp.where(bmask, pseudo, jnp.inf))

    cnt_i = jnp.round(cnt).astype(jnp.int32)
    from stainx_tpu.ops.percentile import nearest_rank_index

    r_lo = nearest_rank_index(alpha, cnt_i)
    r_hi = nearest_rank_index(100 - alpha, cnt_i)
    phi_selects = [(key, r_lo, (pseudo,)), (key, r_hi, (pseudo,))]
    if carry:
        phi_results = _select_seeded(
            phi_selects, (0, 1), seed_ref, 4, counts=(cnt_i, cnt_i),
            have_prev0=have_prev0,
        )
    else:
        phi_results = radix_select_multi(phi_selects, keyed=True)
    cos_lo, sin_lo = _dir_from_pseudo(phi_results[0][0])
    cos_hi, sin_hi = _dir_from_pseudo(phi_results[1][0])
    h0, h1 = _he_scalars_from_phi(evs, cos_lo, sin_lo, cos_hi, sin_hi)
    m0, m1 = _normal_rows_from_he(h0, h1)

    c0 = od[0] * m0[0] + od[1] * m0[1] + od[2] * m0[2]
    c1 = od[0] * m1[0] + od[1] * m1[1] + od[2] * m1[2]
    rank_hi = jnp.int32(idx_hi_conc)
    c_selects = [
        (_monotone_key(jnp.where(in_image, c0, jnp.inf)), rank_hi, (c0,)),
        (_monotone_key(jnp.where(in_image, c1, jnp.inf)), rank_hi, (c1,)),
    ]
    if carry:
        c_results = _select_seeded(
            c_selects, (2, 3), seed_ref, 5,
            counts=(jnp.int32(p_true), jnp.int32(p_true)),
            have_prev0=have_prev0,
        )
    else:
        c_results = radix_select_multi(c_selects, keyed=True)
    (maxc0,), (maxc1,) = c_results

    # (3, 2) HE row-major, then the two max concentrations.
    for c in range(3):
        out_ref[2 * c] = h0[c]
        out_ref[2 * c + 1] = h1[c]
    out_ref[6] = maxc0
    out_ref[7] = maxc1

    if carry:
        for s_i in range(6):
            seed_out_ref[s_i] = seed_ref[s_i]
        seed_out_ref[6] = jnp.int32(1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def macenko_fit_mega(images, seed_state=None, interpret: bool | None = None):
    """One-kernel Macenko fit: (N, 3, H, W) uint8/float [0,1] → fitted
    ``(stain_matrix (3, 2) f32, max_concentrations (2,) f32)``. All N
    images' pixels pool into ONE row (fit semantics pool the batch,
    ``torch_backend.py:469-474``), so HBM traffic is one read of the
    input. Counterpart of the reference's fit-side CUDA pipeline
    (``csrc/macenko.cu:29-262``) with the transform mega kernel's
    machinery; the <3-pixel fallback is intentionally absent at fit.

    ``seed_state`` (optional, (7,) int32 from :func:`seed_state_init`):
    cross-CALL seed carry — seeds this fit's descents from a previous
    fit's terminal keys (batch mode re-fits every forward on
    same-distribution batches) and returns ``(he, maxc, new_state)``."""
    if interpret is None:
        interpret = interpret_mode()
    n, c, h, w = images.shape
    # Channel-major pooling: each channel's plane is the concatenation of
    # every image's plane (a plain reshape would interleave channels).
    # For N == 1 the transpose is a no-op; for pooled batches XLA folds it
    # into the layout copy the padding pass makes anyway.
    pooled = jnp.transpose(images.reshape(n, c, h * w), (1, 0, 2))
    x4, p_true, s = _row_layout(pooled.reshape(1, c, 1, n * h * w))

    from stainx_tpu.ops.macenko import ALPHA
    from stainx_tpu.ops.percentile import static_nearest_rank_index

    idx_hi_conc = static_nearest_rank_index(99, p_true)
    carry = seed_state is not None
    kernel = functools.partial(
        _fit_mega_kernel,
        is_uint8=images.dtype == jnp.uint8,
        p_true=p_true,
        alpha=int(ALPHA),
        idx_hi_conc=idx_hi_conc,
        carry=carry,
    )
    if carry:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, 3, s, _LANE), lambda i, s_: (0, 0, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.SMEM((6,), jnp.int32)],
        )
        out, new_state = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((8,), jnp.float32),
                jax.ShapeDtypeStruct((SEED_STATE_LEN,), jnp.int32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(seed_state.reshape(1, SEED_STATE_LEN).astype(jnp.int32), x4)
        return out[:6].reshape(3, 2), out[6:8], new_state
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 3, s, _LANE), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((8,), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x4)
    return out[:6].reshape(3, 2), out[6:8]


def fused_fit_budget_ok(images_shape, dtype) -> bool:
    """Pooled-row budget for :func:`macenko_fit_mega` — the transform
    kernel's per-image VMEM bounds applied to the POOLED pixel count
    (fit's row unit is the whole batch)."""
    if dtype not in (jnp.uint8, jnp.float32):
        return False
    n, c, h, w = images_shape
    itemsize = 1 if dtype == jnp.uint8 else 4
    pooled = n * h * w
    return pooled <= MAX_FUSED_PIXELS and c * pooled * itemsize <= MAX_ROW_BYTES
