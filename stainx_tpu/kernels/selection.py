"""Pallas TPU kernel: rank selection by radix descent on VMEM-resident rows.

The jnp selection (:mod:`stainx_tpu.ops.percentile`) re-reads the pixel
field from HBM on every refinement level and materializes sentinel/validity
copies between levels. This kernel keeps an **entire row resident in VMEM**
(1 MB for 512² tiles) and runs the whole descent inside one grid step: one
HBM read of the data total, K ranks per row sharing the load (the Macenko
φ chain needs the 1st and 99th percentiles of the same field).

Algorithm: **radix select** over the monotone integer mapping of f32
(``key = bits XOR (sign ? 0xFFFFFFFF : 0x80000000)``, which orders exactly
like the floats). Each level splits the current key-prefix group by its
next 4 bits; group membership is an integer equality against the carried
prefix — recomputed exactly at every level (no float interval arithmetic,
no possibility of the quantum-wobble element loss that value-space
refinement must guard against), and the while carry is four scalars per
descent, which is all Mosaic supports. At most 8 levels; early exit once
the target bucket holds one element. Bit-exact by construction. Several
descents fuse into ONE while loop (:func:`radix_select_multi`) — the
serial per-level round trip, not the 16 bucket counts, dominates a level.

Replaces the role of the reference's full-sort percentile machinery
(``src/stainx_cuda_torch/csrc/macenko.cu:52-58,209-216``) the TPU way: no
sort, no atomics, fixed shapes. Rows larger than the VMEM budget fall back
to the jnp path (handled by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainx_tpu.kernels import interpret_mode

_B = 16  # 4 radix bits per level
_LANE = 128
# Resident-kernel row ceiling: a 2048² row (16 MB f32) peaks at a measured
# 109 MB of scoped VMEM (key/iota/member temporaries) — inside the raised
# 120 MB cap on v5e. Since round 3 this is only a guard for DIRECT callers:
# the routing ladder sends rows > STREAM_MIN_ELEMS (2M) to the O(scalars)-
# state streaming kernel (selection_stream.py), so no library path rides
# this near-full-VMEM tier and the library itself has no row-size cap.
MAX_ROW_ELEMS = 4_194_304  # 2048²


def _monotone_key(x):
    """uint32 key ordering exactly like the f32 values (+inf sorts above all
    finite values — masked-out elements are encoded as +inf by the caller)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = (u >> 31).astype(jnp.uint32)
    flip = jnp.where(sign == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return u ^ flip


def _unkey(key):
    """Inverse of :func:`_monotone_key` for a scalar uint32."""
    sign = (key >> 31).astype(jnp.uint32)
    flip = jnp.where(sign == 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return jax.lax.bitcast_convert_type(key ^ flip, jnp.float32)


_SENTINEL_KEY = 0xFF800000  # _monotone_key(+inf)


def _f32_from_ik_scalar(ik):
    """f32 value whose monotone key has signed view ``ik`` — the scalar
    inverse of ``_ikey_view ∘ _monotone_key``. Mosaic has no SCALAR
    bitcasts, so the final int32→f32 bit reinterpretation rides a tiny
    (8, 128) vector broadcast + reduce (vector bitcasts lower fine)."""
    key_i = ik ^ jnp.int32(-0x80000000)  # key bits, int32 view
    # _unkey: sign nibble of the KEY picks the flip constant.
    flip = jnp.where(key_i < 0, jnp.int32(-0x80000000), jnp.int32(-1))
    bits = key_i ^ flip
    tile = jnp.full((8, _LANE), bits, jnp.int32)
    return jnp.max(jax.lax.bitcast_convert_type(tile, jnp.float32))


def _ikey_view(key):
    """Order-preserving signed view (Mosaic has no unsigned reductions)."""
    return jax.lax.bitcast_convert_type(key ^ jnp.uint32(0x80000000), jnp.int32)


def _prefix_from_minmax(ik_min, ik_max):
    """Initial (prefix, level) from the valid keys' min/max signed views:
    start below the common prefix — real data spans a narrow float range,
    so the leading 1–3 nibbles are constant and counting them would be
    wasted levels. The leading differing-nibble position comes from seven
    scalar compares on min⊕max (no clz, no casts; XOR is invariant under
    the sign-bit flip, so the diff comes straight from the signed views —
    Mosaic has no SCALAR bitcasts either)."""
    diff_i = ik_min ^ ik_max
    nonneg = diff_i >= 0  # top nibble differs when negative
    skip = jnp.int32(0)
    for k in range(1, 8):
        skip = skip + (nonneg & (diff_i < (1 << (32 - 4 * k)))).astype(jnp.int32)
    it0 = jnp.where(diff_i == 0, jnp.int32(8), skip)
    # Common prefix = kmin's top 4·it0 bits; kmin's bits are ik_min with the
    # sign bit flipped, and a logical shift ≥ 4 keeps everything in int32.
    s0 = 32 - 4 * jnp.maximum(it0, 1)  # int32 shift for the int32 operand
    prefix0 = jax.lax.shift_right_logical(
        ik_min ^ jnp.int32(-0x80000000), s0
    ).astype(jnp.uint32)
    # it0 == 0 ⇒ empty prefix.
    prefix0 = jnp.where(it0 == 0, jnp.uint32(0), prefix0)
    return prefix0, it0


def _descent_init(key):
    valid0 = key != jnp.uint32(_SENTINEL_KEY)
    ik = _ikey_view(key)
    ik_min = jnp.min(jnp.where(valid0, ik, jnp.int32(0x7FFFFFFF)))
    ik_max = jnp.max(jnp.where(valid0, ik, jnp.int32(-0x80000000)))
    prefix0, it0 = _prefix_from_minmax(ik_min, ik_max)
    size0 = jnp.sum(valid0.astype(jnp.int32))
    # Fully-masked row: resolve to the sentinel key itself (full prefix,
    # it = 8). Without this, min > max makes _prefix_from_minmax return
    # it0 = 0, and member_mask would shift a uint32 by 32 — undefined in
    # XLA — and could match EVERY element. Matches the interval descent's
    # empty-row convention: the selected "value" is +inf.
    empty = size0 == 0
    prefix0 = jnp.where(empty, jnp.uint32(_SENTINEL_KEY), prefix0)
    it0 = jnp.where(empty, jnp.int32(8), it0)
    return prefix0, it0, size0, ik_min, ik_max


def _nibble_at(ik, it):
    """Nibble of the (signed-view) key at descent level ``it`` (0-based from
    the top); logical shifts keep the int32 operand well-defined."""
    shift = jnp.maximum(28 - 4 * it, 0)
    return jax.lax.shift_right_logical(ik ^ jnp.int32(-0x80000000), shift) & 15


_NS = 8  # scalars of while-carry per descent


# Descent-contraction strategy (module default; micro-benchable per call):
#   "dep"   — round-1 form: min/max over the decided window, a second
#             dependent vector→scalar sync per iteration.
#   "spec6" — min/max for all six candidate windows speculatively in the
#             counts' vector phase, scalar-pick after: one sync/iteration.
#   "spec4" — speculate only the four find windows (single buckets);
#             narrows advance without contraction.
#   "nocon" — no contraction at all: advance one nibble per find, early
#             exit only on a singleton bucket.
#   "defer" — deferred contraction: each iteration reduces min/max over
#             the CURRENT candidate range in the counts' vector phase
#             (2 extra reduces, same sync). A find advances one nibble;
#             the next iteration's min/max then skips every newly-common
#             nibble at once, terminates bit-identical groups, and
#             tightens the probe span — the dep contraction's three
#             benefits one iteration later, without its second sync.
#   "interval"/"interval8"/"interval16" — radix-free interpolation+
#             bisection search on the signed key view (see
#             interval_descend_multi), 4, 8 or 16 cuts per iteration.
#             interval16 (15 even quantiles + interpolant: guaranteed 16×
#             narrowing) measured a clear LOSS — 1 334–1 545 MPix/s vs
#             ~3 000 for the 4-cut form at 224²/512²; kept as an ablation
#             mode only.
#   "cum16" — full 16-bucket cumulative counts per level on the hoisted
#             key view: every level resolves in ONE iteration (no probe
#             misses, no narrows); iterations == nibble levels descended.
#             Measured LOSS at 64×512²: 2 624 vs ikdep 3 758 MPix/s —
#             16 distinct cumulative thresholds are 16 real compare+sum
#             passes (the ~17%-for-16-counts economics only covers counts
#             sharing one probe pattern). Ablation mode only.
#   "cum256" — byte-wide levels: 256 cumulative counts resolve 8 bits
#             per iteration (≤ 4 iterations total). Measured 444 MPix/s
#             at 64×512² (8.5× slower than ikdep). Ablation mode only.
#   "ikdep" — dep's exact algorithm, but every compare runs on a HOISTED
#             signed-key array against scalar key-space bucket bounds:
#             no per-iteration group shift, igroup xor, or ik recompute —
#             ~3 fewer row passes per iteration where passes dominate.
#   "auto"  — size-dependent: small rows are SYNC-bound (the interval
#             descent's single round trip per iteration wins); large rows
#             are PASS-bound (dep's lean iterations win). Crossover
#             measured on v5e (benchmarks/descent_ablation.py): 224² the
#             interval form is +14%, 512² dep is +3%.
DESCENT_MODE = "auto"

# Auto ladder thresholds, measured on v5e (benchmarks/descent_ablation):
# - interval vs dep MPix/s: 224² 2985/2608, 256² 3108/2721, 320² 3180/3423,
#   512² 3351/3459 — sync-bound small rows go to interval, crossover
#   between 256² and 320²; threshold at the largest proven-winning size.
# - ikdep vs dep at 512²: 3691/3582 (+3%, fewer row passes). ikdep hoists
#   a P·4 B signed-key copy per descent, which the 2048² staged-path rows
#   cannot afford on top of their 127.6 MB peak — huge rows stay on dep.
AUTO_INTERVAL_MAX_ELEMS = 65536
AUTO_IKDEP_MAX_ELEMS = 1_310_720  # mega-kernel row ceiling (1280×1024)


def _resolve_auto(mode: str, row_elems: int) -> str:
    if mode != "auto":
        return mode
    if row_elems <= AUTO_INTERVAL_MAX_ELEMS:
        return "interval"
    return "ikdep" if row_elems <= AUTO_IKDEP_MAX_ELEMS else "dep"


def _resolve_mode(mode: str | None, row_elems: int, has_seeds: bool) -> str:
    """THE mode resolution — shared by :func:`radix_select_multi` and
    :func:`exact_terminal_mode` so the two can never disagree about what
    actually runs. "auto" + seeds ⇒ the seeded interval descent at every
    size whose hoisted-ik footprint fits (the same bound that gates
    ikdep): measured 4 251+ vs ikdep's 3 717–3 770 MPix/s at 64×512²
    (`benchmarks/descent_ablation --modes ikdep sint`), and strictly fewer
    syncs than plain interval on the sync-bound small tiles. An
    EXPLICITLY pinned mode (ablation runs) never auto-upgrades."""
    if mode is None:
        mode = DESCENT_MODE
    if mode == "auto" and has_seeds and row_elems <= AUTO_IKDEP_MAX_ELEMS:
        return "sint"
    return _resolve_auto(mode, row_elems)


def exact_terminal_mode(selects, mode: str | None = None, seeds=None) -> bool:
    """Whether ``radix_select_multi(..., keyed=True, want_terminal=True)``
    will return terminal keys for these arguments — i.e. the resolved
    mode exits with the selected element's full key (everything except
    the member-path ``nocon``/``defer``). Lets callers branch instead of
    using the NotImplementedError as control flow."""
    if not selects:
        return False
    k0 = selects[0][0]
    m = _resolve_mode(mode, int(k0.shape[0]) * int(k0.shape[1]), seeds is not None)
    return (
        m == "sint"
        or m.startswith("interval")
        or m in ("dep", "ikdep", "cum16", "cum256", "spec6", "spec4")
    )


def radix_descend_multi(selects, mode: str | None = None):
    """The fused descent of :func:`radix_select_multi` without the field
    resolution: returns per-descent ``(prefix, it)`` — the consumed key
    prefix and its nibble length. Callers with lazily-recomputed fields
    resolve members themselves via :func:`member_mask`.

    Iteration cost on TPU is dominated by the serial
    vector-reduce → scalar-decide → vector-compare chain, NOT by the
    compare passes (measured: 16 counts per level cost only ~17% more
    than 1), so the design minimizes ITERATIONS and keeps each one lean:

    - **Rank-interpolated probes.** The group spans one key-prefix
      interval; past the first level that interval is narrow enough that
      any smooth pixel density is locally uniform across it, so the
      target bucket is almost always ``ĵ ≈ (jhi−jlo+1)·(r−c_lo)/(c_hi−c_lo)``.
      Each iteration counts four cumulative buckets around ĵ; a probed
      adjacent pair bracketing ``r`` resolves the level outright, a miss
      narrows the candidate range ``[jlo, jhi]`` by ≥3 and re-interpolates.
    - **Min/max contraction.** The same iteration reduces the min/max
      full key over the surviving window. That (a) terminates the descent
      the moment all candidates are bit-identical — real uint8-derived
      fields are duplicate-heavy and otherwise descend all 8 levels —
      (b) extends the prefix past every newly-common nibble at once, and
      (c) seeds the next level's ``[jlo, jhi]`` with the true occupied
      nibble span, so probes never start blind on concentrated data.
    - **Speculative windows — ONE sync per iteration.** The surviving
      window the contraction must scan is decided by the counts, but it
      is always one of six candidates whose bucket bounds are scalars
      already in hand when the iteration starts: bucket ``jlo``
      (find-low), buckets ``k0+1..k0+3`` (interpolated find),
      ``[jlo, k0]`` (narrow-high), ``[k0+4, jhi]`` (narrow-low). All six
      min/max pairs reduce in the same vector phase as the counts and
      scalar selects pick the real one afterwards, so an iteration pays a
      single vector-reduce→scalar round trip. The earlier dependent form
      (window mask computed from the counts) cost a second ~5 µs sync per
      iteration at 512²; the 12 extra speculative reduces cost ~1–2 µs
      (reduce passes are cheap next to the sync — see the 16-vs-1 count
      measurement above).
    - All decisions are branch-free scalar selects: a kernel-internal
      ``lax.cond`` pays for both branches on Mosaic (measured 2.3× the
      cost of inlining the expensive branch).

    Bit-exact for ANY distribution — probes are exact counts and a missed
    prediction only costs one extra iteration. Order compares run on the
    ``x ^ 0x8000_0000`` signed view, order-isomorphic to uint32 at every
    shift (Mosaic has no unsigned order compares)."""
    if mode is None:
        mode = DESCENT_MODE
    if selects:
        k0 = selects[0][0]
        mode = _resolve_auto(mode, int(k0.shape[0]) * int(k0.shape[1]))
    if mode.startswith("interval") or mode == "sint":
        # This function IS the radix implementation; standalone callers
        # (per the docstring contract) still get a working descent when
        # the auto ladder would pick the interval form — ikdep is the
        # closest radix strategy for rows that small.
        mode = "ikdep"
    n_sel = len(selects)
    state = []
    for key, rank in selects:
        prefix0, it0, size0, ik_min, ik_max = _descent_init(key)
        if mode == "cum256":
            # Byte levels live on even nibble boundaries — floor the
            # init-skip prefix (a half-byte start would misalign buckets).
            odd0 = (it0 & 1) == 1
            it0 = jnp.where(it0 >= 8, it0, it0 & ~1)
            prefix0 = jnp.where(odd0 & (it0 < 8), prefix0 >> 4, prefix0)
        # Clamp into the valid member range: keeps the interpolation
        # invariant c_lo ≤ r < c_hi (out-of-range ranks now return the
        # max/min member instead of the old clamped-descent garbage).
        r0 = jnp.clip(rank, 0, jnp.maximum(size0 - 1, 0))
        state.extend(
            [
                prefix0,
                r0,
                it0,
                (size0 == 0) | (it0 >= 8),  # empty or all-identical
                jnp.int32(0),  # c_lo: members below bucket jlo
                size0,  # c_hi: members at/below bucket jhi
                _nibble_at(ik_min, it0),  # jlo: lowest occupied bucket
                _nibble_at(ik_max, it0),  # jhi: highest occupied bucket
            ]
        )
        # NOTE: the full-key signed view used by the min/max contraction is
        # recomputed per iteration (one xor) rather than hoisted: a hoisted
        # copy is another P·4 bytes live across the loop, which pushed
        # 2048² rows past the 120 MB scoped-vmem budget.

    def cond(state):
        alive = jnp.asarray(False)
        for d in range(n_sel):
            it, done = state[_NS * d + 2], state[_NS * d + 3]
            alive = alive | (jnp.logical_not(done) & (it < 8))
        return alive

    # ikdep hoists the signed-key views out of the loop (loop-invariant;
    # +P·4 B VMEM per descent — the auto ladder keeps huge rows on dep,
    # whose in-loop recompute stays within the 2048² scoped-vmem budget).
    iks_hoisted = (
        [_ikey_view(key) for key, _ in selects]
        if mode in ("ikdep", "cum16", "cum256")
        else None
    )

    def body(state):
        new_state = []
        for d, (key, _rank) in enumerate(selects):
            prefix, r, it, done, c_lo, c_hi, jlo, jhi = state[_NS * d : _NS * d + _NS]

            if mode == "cum256":
                # Byte-wide levels (round-2 VERDICT experiment b): 256
                # cumulative counts resolve 8 key bits per iteration — at
                # most 4 iterations for a full f32 key. The 255-deep scalar
                # select chains and 256 reduces stress the fused-count
                # economics at the opposite extreme from cum16.
                ik = iks_hoisted[d]
                base = jnp.where(
                    it == 0,
                    jnp.uint32(0),
                    jax.lax.shift_left(
                        prefix, (32 - 4 * jnp.maximum(it, 1)).astype(jnp.uint32)
                    ),
                )
                bw_shift = (24 - 4 * jnp.minimum(it, jnp.int32(6))).astype(jnp.uint32)
                bw = jax.lax.shift_left(jnp.uint32(1), bw_shift)
                gmask = jax.lax.shift_left(jnp.uint32(256), bw_shift) - jnp.uint32(1)

                def sview256(u):
                    return (u ^ jnp.uint32(0x80000000)).astype(jnp.int32)

                def top256(j):
                    j1 = jnp.minimum(j + 1, 256).astype(jnp.uint32)
                    return sview256(
                        jnp.where(j >= 255, base | gmask, base + j1 * bw - jnp.uint32(1))
                    )

                member_ge = ik >= sview256(base)
                t256 = [
                    jnp.sum((member_ge & (ik <= top256(jnp.int32(m)))).astype(jnp.int32))
                    for m in range(256)
                ]
                j = sum(
                    ((r >= t256[m]).astype(jnp.int32) for m in range(255)),
                    jnp.int32(0),
                )
                below = jnp.int32(0)
                t_at = t256[0]
                for m in range(255):
                    below = jnp.where(j > m, t256[m], below)
                    t_at = jnp.where(j > m, t256[m + 1], t_at)
                wmask = (ik >= sview256(base + j.astype(jnp.uint32) * bw)) & (
                    ik <= top256(j)
                )
                wmin = jnp.min(jnp.where(wmask, ik, jnp.int32(0x7FFFFFFF)))
                wmax = jnp.max(jnp.where(wmask, ik, jnp.int32(-0x80000000)))
                cpfx, cit = _prefix_from_minmax(wmin, wmax)
                # Keep byte alignment: floor the contraction to an even
                # nibble level (cit ≥ it + 2 is guaranteed — every member
                # of bucket j shares the next full byte).
                cit_e = jnp.where(cit >= 8, cit, cit & ~1)
                cpfx_e = jnp.where(cit == cit_e, cpfx, cpfx >> 4)
                adv = jnp.logical_not(done)
                new_state.extend(
                    [
                        jnp.where(adv, cpfx_e, prefix),
                        jnp.where(adv, r - below, r),
                        jnp.where(adv, cit_e, it),
                        done | (adv & (cit_e >= 8)),
                        jnp.int32(0),
                        jnp.where(adv, t_at - below, c_hi),
                        jnp.where(adv, _nibble_at(wmin, cit_e), jlo),
                        jnp.where(adv, _nibble_at(wmax, cit_e), jhi),
                    ]
                )
                continue

            if mode in ("ikdep", "cum16"):
                ik = iks_hoisted[d]
                # Scalar key-space bucket bounds (uint32 arithmetic, then
                # the ^0x8000_0000 signed order view — no vector shifts,
                # no igroup materialization).
                it1 = jnp.maximum(it, 1)
                base = jnp.where(
                    it == 0,
                    jnp.uint32(0),
                    jax.lax.shift_left(prefix, (32 - 4 * it1).astype(jnp.uint32)),
                )
                step_shift = (28 - 4 * jnp.minimum(it, jnp.int32(7))).astype(jnp.uint32)
                step = jax.lax.shift_left(jnp.uint32(1), step_shift)
                # 16·step − 1; at it == 0 the shift wraps 16·2²⁸ to 0 and
                # 0 − 1 = 0xFFFFFFFF — exactly the whole-key-space mask.
                grp_mask = jax.lax.shift_left(jnp.uint32(16), step_shift) - jnp.uint32(1)

                def sview(u):
                    return (u ^ jnp.uint32(0x80000000)).astype(jnp.int32)

                def bot(j):  # signed view of bucket j's lowest key
                    return sview(base + j.astype(jnp.uint32) * step)

                def top(j):  # signed view of bucket j's highest key,
                    # saturated at the group top for j ≥ 15 (probe buckets
                    # can overshoot jhi; the rank resolves before any
                    # overshoot bucket is chosen, so saturation is exact)
                    j1 = jnp.minimum(j + 1, 16).astype(jnp.uint32)
                    return sview(
                        jnp.where(
                            j >= 15, base | grp_mask, base + j1 * step - jnp.uint32(1)
                        )
                    )

                member_ge = ik >= sview(base)

                if mode == "cum16":
                    # Full 16-bucket cumulative counts: the level ALWAYS
                    # resolves (no probe misses, no narrow iterations), so
                    # iterations == nibble levels actually descended. The
                    # 12 extra count reduces ride the same vector phase
                    # (measured: 16 counts ≈ +17% over 1).
                    t16 = [
                        jnp.sum((member_ge & (ik <= top(jnp.int32(m)))).astype(jnp.int32))
                        for m in range(16)
                    ]
                    j = sum(
                        ((r >= t16[m]).astype(jnp.int32) for m in range(15)),
                        jnp.int32(0),
                    )  # smallest j with t16[j] > r
                    below = jnp.int32(0)
                    t_at = t16[0]
                    for m in range(15):
                        below = jnp.where(j > m, t16[m], below)
                        t_at = jnp.where(j > m, t16[m + 1], t_at)
                    # Contraction over the single found bucket — shares the
                    # sync with the counts (bounds are scalars in hand).
                    wmask = (ik >= bot(j)) & (ik <= top(j))
                    wmin = jnp.min(jnp.where(wmask, ik, jnp.int32(0x7FFFFFFF)))
                    wmax = jnp.max(jnp.where(wmask, ik, jnp.int32(-0x80000000)))
                    cpfx, cit = _prefix_from_minmax(wmin, wmax)
                    adv = jnp.logical_not(done)  # a find every iteration
                    new_state.extend(
                        [
                            jnp.where(adv, cpfx, prefix),
                            jnp.where(adv, r - below, r),
                            jnp.where(adv, cit, it),
                            done | (adv & (cit >= 8)),
                            jnp.int32(0),
                            jnp.where(adv, t_at - below, c_hi),
                            jnp.where(adv, _nibble_at(wmin, cit), jlo),
                            jnp.where(adv, _nibble_at(wmax, cit), jhi),
                        ]
                    )
                    continue

                denom = jnp.maximum(c_hi - c_lo, 1)
                jpred = jlo + (jhi - jlo + 1) * (r - c_lo) // denom
                k0 = jnp.clip(jpred - 2, jlo, jnp.maximum(jlo, jhi - 3))

                t = [
                    jnp.sum((member_ge & (ik <= top(k0 + m))).astype(jnp.int32))
                    for m in range(4)
                ]

                find_low = (r < t[0]) & (k0 == jlo)
                narrow_hi = (r < t[0]) & (k0 > jlo)
                narrow_lo = r >= t[3]
                find = find_low | (r >= t[0]) & (r < t[3])
                off = (
                    (r >= t[0]).astype(jnp.int32)
                    + (r >= t[1]).astype(jnp.int32)
                    + (r >= t[2]).astype(jnp.int32)
                )
                bsel = jnp.where(find_low, jlo, k0 + off)
                below = jnp.where(
                    find_low,
                    c_lo,
                    jnp.where(off <= 1, t[0], jnp.where(off == 2, t[1], t[2])),
                )
                t_at = jnp.where(
                    find_low,
                    t[0],
                    jnp.where(off <= 1, t[1], jnp.where(off == 2, t[2], t[3])),
                )
                c_lo_n = jnp.where(narrow_lo, t[3], c_lo)
                c_hi_n = jnp.where(narrow_hi, t[0], c_hi)
                jlo_n = jnp.where(narrow_lo, k0 + 4, jlo)
                jhi_n = jnp.where(narrow_hi, k0, jhi)

                wlo = jnp.where(find, bsel, jlo_n)
                whi = jnp.where(find, bsel, jhi_n)
                wmask = (ik >= bot(wlo)) & (ik <= top(whi))
                wmin = jnp.min(jnp.where(wmask, ik, jnp.int32(0x7FFFFFFF)))
                wmax = jnp.max(jnp.where(wmask, ik, jnp.int32(-0x80000000)))
                cpfx, cit = _prefix_from_minmax(wmin, wmax)

                adv = jnp.logical_not(done) & (cit > it)
                below_eff = jnp.where(find, below, c_lo_n)
                cnt_eff = jnp.where(find, t_at, c_hi_n) - below_eff
                new_state.extend(
                    [
                        jnp.where(adv, cpfx, prefix),
                        jnp.where(adv, r - below_eff, r),
                        jnp.where(adv, cit, it),
                        done | (adv & (cit >= 8)),
                        jnp.where(adv, 0, jnp.where(done, c_lo, c_lo_n)),
                        jnp.where(adv, cnt_eff, jnp.where(done, c_hi, c_hi_n)),
                        jnp.where(adv, _nibble_at(wmin, cit), jnp.where(done, jlo, jlo_n)),
                        jnp.where(adv, _nibble_at(wmax, cit), jnp.where(done, jhi, jhi_n)),
                    ]
                )
                continue

            ik = _ikey_view(key)
            shift = jnp.maximum(28 - 4 * it, 0).astype(jnp.uint32)
            group = jax.lax.shift_right_logical(key, jnp.broadcast_to(shift, key.shape))
            base = jax.lax.shift_left(prefix, jnp.uint32(4))
            # Signed order-isomorphic views. base is 16-aligned and base+15
            # cannot carry into the flipped top bit, so scalar int32 adds
            # preserve the uint32 order of base|j.
            igroup = jax.lax.bitcast_convert_type(group ^ jnp.uint32(0x80000000), jnp.int32)
            ibase = (base ^ jnp.uint32(0x80000000)).astype(jnp.int32)

            # Interpolated probe start: 4 consecutive cums at K..K+3 decide
            # buckets K+1..K+3 directly, plus K itself when K == jlo.
            denom = jnp.maximum(c_hi - c_lo, 1)
            jpred = jlo + (jhi - jlo + 1) * (r - c_lo) // denom
            k0 = jnp.clip(jpred - 2, jlo, jnp.maximum(jlo, jhi - 3))

            member_ge = igroup >= ibase  # shared lower bound, one pass
            # Probe offsets clamp at 15 (the ikdep top() saturation, in
            # group-id space): k0+m can overshoot to 18, and at a full
            # prefix (e.g. NaN-group keys at it=7) base+16 would wrap
            # uint32 and flip the signed order. A clamped threshold counts
            # the whole group — exact, because the rank always lies inside
            # the group, so an overshoot bucket is never selected.
            le = [igroup <= ibase + jnp.minimum(k0 + m, 15) for m in range(4)]
            t = [jnp.sum((member_ge & le[m]).astype(jnp.int32)) for m in range(4)]

            if mode in ("spec6", "spec4"):
                # Speculative min/max over the windows this level's decision
                # can leave behind (single-sync iteration — see docstring).
                # Bounds use the candidate-range [jlo, jhi], not mere group
                # membership: after a narrow, group members OUTSIDE the
                # candidate range still exist and must not leak in.
                ge_jlo = igroup >= ibase + jlo
                not_le = [jnp.logical_not(le[m]) for m in range(4)]
                wins = [
                    ge_jlo & (igroup <= ibase + jlo),  # bucket jlo (find_low)
                    le[1] & not_le[0],  # bucket k0+1 (find, off == 1)
                    le[2] & not_le[1],  # bucket k0+2 (find, off == 2)
                    le[3] & not_le[2],  # bucket k0+3 (find, off == 3)
                ]
                if mode == "spec6":
                    le_jhi = igroup <= ibase + jhi
                    wins += [
                        ge_jlo & le[0],  # [jlo, k0]    (narrow_hi)
                        le_jhi & not_le[3],  # [k0+4, jhi]  (narrow_lo)
                    ]
                mins = [jnp.min(jnp.where(w, ik, jnp.int32(0x7FFFFFFF))) for w in wins]
                maxs = [jnp.max(jnp.where(w, ik, jnp.int32(-0x80000000))) for w in wins]

            if mode == "defer":
                # Min/max over the CURRENT candidate range, same sync as
                # the counts (see DESCENT_MODE notes).
                cand = (igroup >= ibase + jlo) & (igroup <= ibase + jhi)
                gmin = jnp.min(jnp.where(cand, ik, jnp.int32(0x7FFFFFFF)))
                gmax = jnp.max(jnp.where(cand, ik, jnp.int32(-0x80000000)))

            find_low = (r < t[0]) & (k0 == jlo)  # bucket = jlo
            narrow_hi = (r < t[0]) & (k0 > jlo)  # bucket ≤ k0
            narrow_lo = r >= t[3]  # bucket > k0+3
            find = find_low | (r >= t[0]) & (r < t[3])

            off = (
                (r >= t[0]).astype(jnp.int32)
                + (r >= t[1]).astype(jnp.int32)
                + (r >= t[2]).astype(jnp.int32)
            )  # find_mid ⇒ off ∈ {1,2,3}: bucket k0+off
            bsel = jnp.where(find_low, jlo, k0 + off)
            below = jnp.where(
                find_low,
                c_lo,
                jnp.where(off <= 1, t[0], jnp.where(off == 2, t[1], t[2])),
            )
            t_at = jnp.where(
                find_low, t[0], jnp.where(off <= 1, t[1], jnp.where(off == 2, t[2], t[3]))
            )

            # Narrowed window (identity when this iteration resolves).
            c_lo_n = jnp.where(narrow_lo, t[3], c_lo)
            c_hi_n = jnp.where(narrow_hi, t[0], c_hi)
            jlo_n = jnp.where(narrow_lo, k0 + 4, jlo)
            jhi_n = jnp.where(narrow_hi, k0, jhi)

            if mode == "defer":
                # Skip: every candidate shares ≥1 more nibble than the
                # consumed prefix — advance straight to the common prefix
                # (the counts this iteration are stale; the skip's advance
                # subsumes anything they would have decided). The new group
                # IS the candidate set: candidacy is a bucket range, and a
                # shared level-`it` nibble puts every group member of that
                # bucket inside it.
                cpfx0, cit0 = _prefix_from_minmax(gmin, gmax)
                skip = jnp.logical_not(done) & (cit0 > it)
                # No skip: the min/max still tightens the current-level
                # probe span to the truly occupied nibbles.
                tlo = _nibble_at(gmin, it)
                thi = _nibble_at(gmax, it)
                # Find: advance exactly one nibble (contraction of the new
                # group lands next iteration).
                cnt_f = t_at - below
                cpfx_f = jax.lax.shift_left(prefix, jnp.uint32(4)) | bsel.astype(
                    jnp.uint32
                )
                adv_f = jnp.logical_not(done) & jnp.logical_not(skip) & find
                keep = jnp.logical_not(skip) & jnp.logical_not(adv_f)
                new_state.extend(
                    [
                        jnp.where(skip, cpfx0, jnp.where(adv_f, cpfx_f, prefix)),
                        jnp.where(skip, r - c_lo, jnp.where(adv_f, r - below, r)),
                        jnp.where(skip, cit0, jnp.where(adv_f, it + 1, it)),
                        done
                        | (skip & (cit0 >= 8))
                        | (adv_f & ((it + 1 >= 8) | (cnt_f <= 1))),
                        jnp.where(keep, jnp.where(done, c_lo, c_lo_n), 0),
                        jnp.where(
                            skip,
                            c_hi - c_lo,
                            jnp.where(adv_f, cnt_f, jnp.where(done, c_hi, c_hi_n)),
                        ),
                        jnp.where(
                            skip,
                            _nibble_at(gmin, cit0),
                            jnp.where(
                                adv_f,
                                0,
                                jnp.where(done, jlo, jnp.maximum(jlo_n, tlo)),
                            ),
                        ),
                        jnp.where(
                            skip,
                            _nibble_at(gmax, cit0),
                            jnp.where(
                                adv_f,
                                15,
                                jnp.where(done, jhi, jnp.minimum(jhi_n, thi)),
                            ),
                        ),
                    ]
                )
                continue

            if mode == "nocon":
                # No contraction: a find advances exactly one nibble (the
                # found bucket), early exit only when it holds one member
                # (or the full key is consumed); next level's probe span
                # starts blind at [0, 15].
                cnt_f = t_at - below
                cpfx = jax.lax.shift_left(prefix, jnp.uint32(4)) | bsel.astype(jnp.uint32)
                cit = it + 1
                adv = jnp.logical_not(done) & find
                new_state.extend(
                    [
                        jnp.where(adv, cpfx, prefix),
                        jnp.where(adv, r - below, r),
                        jnp.where(adv, cit, it),
                        done | (adv & ((cit >= 8) | (cnt_f <= 1))),
                        jnp.where(adv, 0, jnp.where(done, c_lo, c_lo_n)),
                        jnp.where(adv, cnt_f, jnp.where(done, c_hi, c_hi_n)),
                        jnp.where(adv, 0, jnp.where(done, jlo, jlo_n)),
                        jnp.where(adv, 15, jnp.where(done, jhi, jhi_n)),
                    ]
                )
                continue

            if mode == "dep":
                # Dependent min/max over the decided window — a second
                # vector→scalar sync; the rank element always lies inside,
                # so the span is never empty.
                wlo = jnp.where(find, bsel, jlo_n)
                whi = jnp.where(find, bsel, jhi_n)
                wmask = (igroup >= ibase + wlo) & (igroup <= ibase + whi)
                wmin = jnp.min(jnp.where(wmask, ik, jnp.int32(0x7FFFFFFF)))
                wmax = jnp.max(jnp.where(wmask, ik, jnp.int32(-0x80000000)))
            else:
                # Pick the surviving window's (min, max) from the
                # speculative pairs — pure scalar selects.
                def pick(v):
                    v_find = jnp.where(
                        find_low,
                        v[0],
                        jnp.where(off <= 1, v[1], jnp.where(off == 2, v[2], v[3])),
                    )
                    if mode == "spec6":
                        return jnp.where(
                            find, v_find, jnp.where(narrow_hi, v[4], v[5])
                        )
                    return v_find  # spec4: only valid on a find

                wmin = pick(mins)
                wmax = pick(maxs)

            cpfx, cit = _prefix_from_minmax(wmin, wmax)

            # The prefix advances (≥1 nibble) iff the surviving candidates
            # all share the next nibble — always true on a find, and true
            # on a narrow that boxed them into one bucket. cit == 8 means
            # every candidate is bit-identical: done, full-key prefix.
            adv = jnp.logical_not(done) & (cit > it)
            if mode == "spec4":
                adv = adv & find  # narrow windows were not speculated
            below_eff = jnp.where(find, below, c_lo_n)
            cnt_eff = jnp.where(find, t_at, c_hi_n) - below_eff
            new_state.extend(
                [
                    jnp.where(adv, cpfx, prefix),
                    jnp.where(adv, r - below_eff, r),
                    jnp.where(adv, cit, it),
                    done | (adv & (cit >= 8)),
                    jnp.where(adv, 0, jnp.where(done, c_lo, c_lo_n)),
                    jnp.where(adv, cnt_eff, jnp.where(done, c_hi, c_hi_n)),
                    jnp.where(adv, _nibble_at(wmin, cit), jnp.where(done, jlo, jlo_n)),
                    jnp.where(adv, _nibble_at(wmax, cit), jnp.where(done, jhi, jhi_n)),
                ]
            )
        return tuple(new_state)

    state = jax.lax.while_loop(cond, body, tuple(state))
    return [(state[_NS * d], state[_NS * d + 2]) for d in range(n_sel)]


def _sort_scalars(vals):
    """Odd-even transposition network — pure scalar min/max, trivially
    cheap next to a row pass."""
    vals = list(vals)
    k = len(vals)
    for rnd in range(k):
        start = rnd & 1
        for i in range(start, k - 1, 2):
            a, b = vals[i], vals[i + 1]
            vals[i], vals[i + 1] = jnp.minimum(a, b), jnp.maximum(a, b)
    return vals


def _insert_sorted(sorted_vals, x):
    """Insert scalar ``x`` into the ascending list ``sorted_vals`` — 2 ops
    per slot; O(k) where the full network is O(k²) (matters for the wide
    ladders: 256 cuts would cost 65K scalar ops through the network)."""
    k = len(sorted_vals)
    out = [jnp.minimum(sorted_vals[0], x)]
    for m in range(1, k):
        out.append(jnp.minimum(jnp.maximum(sorted_vals[m - 1], x), sorted_vals[m]))
    out.append(jnp.maximum(sorted_vals[k - 1], x))
    return out


# Seeded first-iteration cut offsets, in monotone-key integer units (ULP
# counts — a fixed key offset is a fixed RELATIVE float neighborhood:
# 2^16 ulps ≈ ±0.55%, 2^13 ≈ ±0.07% around any normal f32). Matched to the
# MEASURED image-to-image drift of stain percentiles within a batch
# (median 0.02–0.14%, max 0.31% on the bench distribution — the wide cut
# always contained the next value): (2^19, 2^16) measured 4 222–4 346
# MPix/s at 64×512², tightening to (2^16, 2^13) measured 4 798; a drift
# outside the wide bracket only costs the descent its usual iterations
# (cuts are probes, never assumptions).
_SEED_DELTAS = (1 << 16, 1 << 13)


def interval_descend_multi(
    selects, n_cuts: int = 4, seeds=None, stop_span=None, counts=None
):
    """Fused rank selection by **interval descent** on the signed key view:
    interpolation search with a bisection guarantee, no radix structure.

    Each descent carries 5 scalars ``(klo, khi, r, n, done)`` — an inclusive
    value interval in ik space, the rank within its members, and the member
    count. Per iteration (ONE vector→scalar round trip):

    - scalar phase picks ``n_cuts`` cut points: a rank-interpolated cluster
      ``ĉ ± span/16`` (locally-uniform pixel densities put the rank there)
      plus the interval midpoint (guarantees ≥ halving ⇒ ≤ 32 iterations
      worst case), sorted by a scalar min/max network;
    - vector phase counts members at/below every cut (fused masked sums —
      measured ~free next to the traversal) and reduces the members'
      min/max (the contraction: exits bit-identical clusters, and snaps the
      chosen sub-interval's OUTER bounds to occupied values — for the 1st/
      99th-percentile ranks the chosen sub-interval is usually an end one,
      so an end snaps to an exact data value every iteration);
    - scalar phase descends into the sub-interval holding the rank.

    vs the radix descent: no per-iteration shift/xor/bitcast passes (ik is
    hoisted — computed once per call), narrowing is value-resolution
    rather than nibble-resolution, and iteration cost is the same single
    sync. Bit-exact: counts are exact, cuts are only probes, and the
    terminal ``klo == khi`` means every member is bit-identical.

    ``seeds`` (optional): per-descent ``(ik_seed, valid)`` scalar pairs —
    a guess at the selected element's signed key (e.g. the SAME rank's
    result on the previous image of a batch, carried in kernel scratch).
    When given, ONE extra unrolled iteration runs first with cuts
    clustered around the seed at the two ``_SEED_DELTA`` scales (plus the
    midpoint, keeping the bisection guarantee); an invalid seed falls
    back to that iteration's standard cuts. Counts stay exact, so seeding
    affects iteration count only — never the selected element.

    ``counts`` (optional, requires ``seeds``): per-descent scalar member
    counts the caller already knows (#keys ≠ sentinel). When every seed
    is valid, the init's min/max/count row pass is skipped in favor of
    loose whole-line bounds — the caller asserts the count is exact and
    that the field has no NaN-keyed elements (loose bounds exclude
    ``ik ≥ SENT`` where the computed init would include NaN keys).

    Returns per-descent ``(ik, klo)`` — resolve members with ``ik == klo``.
    """
    _I32MAX = jnp.int32(0x7FFFFFFF)
    _I32MIN = jnp.int32(-0x80000000)
    # Signed view of the +inf sentinel key: a fully-masked row resolves to
    # the sentinel value itself, matching the radix modes (whose final
    # member mask matches the sentinels) — so "auto" cannot make the
    # empty-row result depend on row size.
    _SENT_IK = jnp.int32(0x7F800000)
    n_sel = len(selects)
    iks = [_ikey_view(key) for key, _r in selects]

    def computed_init(_):
        st = []
        for (key, rank), ik in zip(selects, iks):
            valid = key != jnp.uint32(_SENTINEL_KEY)
            n0 = jnp.sum(valid.astype(jnp.int32))
            empty = n0 == 0
            klo0 = jnp.where(empty, _SENT_IK, jnp.min(jnp.where(valid, ik, _I32MAX)))
            khi0 = jnp.where(empty, _SENT_IK, jnp.max(jnp.where(valid, ik, _I32MIN)))
            r0 = jnp.clip(rank, 0, jnp.maximum(n0 - 1, 0))
            st.extend([klo0, khi0, r0, n0, empty | (klo0 == khi0)])
        return tuple(st)

    if counts is not None and seeds is not None:
        # Init-pass skip: with a valid seed AND a caller-known member count
        # (the mega kernel's φ count falls out of the moments pass; the
        # concentration fields' count is the pixel count), the init
        # row pass + sync buys nothing the seeded first iteration doesn't
        # redo — start from loose whole-line bounds instead (sentinels
        # excluded by khi < SENT). The min/max-reduce branch is taken only
        # when a seed is invalid (grid step 0), so Mosaic skips its row
        # passes otherwise (the moments-fallback cond precedent). A known
        # count of 0 resolves to the sentinel like the computed init.
        def loose_init(_):
            st = []
            for (key, rank), n0 in zip(selects, counts):
                n0 = n0.astype(jnp.int32)
                empty = n0 == 0
                klo0 = jnp.where(empty, _SENT_IK, jnp.int32(_I32MIN))
                khi0 = jnp.where(empty, _SENT_IK, _SENT_IK - 1)
                r0 = jnp.clip(rank, 0, jnp.maximum(n0 - 1, 0))
                st.extend([klo0, khi0, r0, n0, empty])
            return tuple(st)

        all_valid = seeds[0][1]
        for _s, flag in seeds[1:]:
            all_valid = all_valid & flag
        state = list(jax.lax.cond(all_valid, loose_init, computed_init, 0))
    else:
        state = list(computed_init(0))

    _S = 5

    def cond(state):
        alive = jnp.asarray(False)
        for d in range(n_sel):
            alive = alive | jnp.logical_not(state[_S * d + 4])
        return alive

    def body(state, seeded: bool = False):
        new_state = []
        for d in range(n_sel):
            klo, khi, r, n, done = state[_S * d : _S * d + _S]
            ik = iks[d]

            # --- scalar phase: cut points ---------------------------------
            fklo = klo.astype(jnp.float32)
            fkhi = khi.astype(jnp.float32)
            span = fkhi - fklo
            frac = r.astype(jnp.float32) / jnp.maximum(n.astype(jnp.float32), 1.0)
            c_hat = fklo + span * frac
            w = span * 0.0625
            # Safe signed floor-midpoint (khi - klo may overflow int32).
            mid = (klo >> 1) + (khi >> 1) + (klo & khi & jnp.int32(1))

            def toi(x):
                return jnp.clip(
                    jnp.clip(x, fklo, fkhi).astype(jnp.int32), klo, khi - 1
                )

            if seeded:
                # Unrolled first iteration: probe around the seed key at the
                # two drift scales + a coarse interpolation cluster as the
                # invalid-seed fallback + mid (bisection guarantee). Clamp
                # before offsetting so s ± Δ cannot wrap int32.
                s, valid = seeds[d]
                lim = jnp.int32(1 << 20)
                s = jnp.clip(s, jnp.int32(-0x80000000) + lim, jnp.int32(0x7FFFFFFF) - lim)
                offsets = [-o for o in _SEED_DELTAS] + [0] + list(_SEED_DELTAS)
                k = len(offsets)
                fallback = [
                    toi(c_hat + (m - (k - 1) / 2.0) * w) for m in range(k)
                ]
                seeded_cuts = [
                    jnp.clip(s + jnp.int32(off), klo, khi - 1) for off in offsets
                ]
                raw = [
                    jnp.where(valid, sc, fb) for sc, fb in zip(seeded_cuts, fallback)
                ] + [mid]
            elif n_cuts == 4:
                raw = [toi(c_hat - w), toi(c_hat), toi(c_hat + w), mid]
            elif n_cuts == 16:
                # Full 16-ary ladder (VERDICT-r2 "full-count" experiment in
                # value space): 15 even quantiles (midpoint included — the
                # bisection guarantee) + the interpolated rank estimate.
                # Guarantees 16× narrowing per iteration; count passes are
                # nearly free next to the sync (measured 16-vs-1 ≈ +17%).
                raw = [toi(fklo + span * (i / 16.0)) for i in range(1, 16)] + [toi(c_hat)]
            elif n_cuts == 256:
                # Byte-wide levels (VERDICT-r2 experiment (b)): 255 even
                # quantiles + interpolant — guaranteed 256× narrowing, ≤ 4
                # descents from the f32 key space. Even cuts are already
                # sorted; single insertion for the interpolant.
                evens = [toi(fklo + span * (i / 256.0)) for i in range(1, 256)]
                cuts = _insert_sorted(evens, toi(c_hat))
                raw = None
            else:
                # Interp cluster + a quantile ladder (midpoint included —
                # the bisection guarantee).
                raw = [
                    toi(c_hat - 3.0 * w),
                    toi(c_hat - w),
                    toi(c_hat),
                    toi(c_hat + w),
                    toi(c_hat + 3.0 * w),
                    toi(fklo + span * 0.25),
                    mid,
                    toi(fklo + span * 0.75),
                ]
            if raw is not None:
                cuts = _sort_scalars(raw)
            nc = len(cuts)

            # --- vector phase: counts + contraction, one sync -------------
            member = (ik >= klo) & (ik <= khi)
            cnt = [jnp.sum((member & (ik <= c)).astype(jnp.int32)) for c in cuts]
            gmin = jnp.min(jnp.where(member, ik, _I32MAX))
            gmax = jnp.max(jnp.where(member, ik, _I32MIN))

            # --- scalar phase: descend ------------------------------------
            j = sum(((r >= cnt[m]).astype(jnp.int32) for m in range(nc)), jnp.int32(0))
            lo_raw, hi_raw = klo, cuts[0]
            below, at = jnp.int32(0), cnt[0]
            for m in range(1, nc + 1):
                is_j = j == m
                lo_raw = jnp.where(is_j, cuts[m - 1] + 1, lo_raw)
                hi_raw = jnp.where(is_j, cuts[m] if m < nc else khi, hi_raw)
                below = jnp.where(is_j, cnt[m - 1], below)
                at = jnp.where(is_j, cnt[m] if m < nc else n, at)
            # Contraction snap: members all lie in [gmin, gmax].
            lo_n = jnp.maximum(lo_raw, gmin)
            hi_n = jnp.minimum(hi_raw, gmax)
            done_n = done | (lo_n >= hi_n)
            if stop_span is not None:
                # Estimator mode: callers that only need the rank element's
                # value to within ``stop_span`` keys (e.g. the streaming
                # kernel's subsample seed — its sweep-2 bracket absorbs the
                # residual) stop early instead of resolving the final ulps,
                # which otherwise cost as many iterations as the whole
                # coarse phase. klo stays a LOWER bound on the element.
                span_u = hi_n.astype(jnp.uint32) - lo_n.astype(jnp.uint32)
                done_n = done_n | (span_u <= jnp.uint32(stop_span))
            new_state.extend(
                [
                    jnp.where(done, klo, lo_n),
                    jnp.where(done, khi, hi_n),
                    jnp.where(done, r, r - below),
                    jnp.where(done, n, at - below),
                    done_n,
                ]
            )
        return tuple(new_state)

    if seeds is not None:
        # Guarded like the mega kernel's <3-pixel moments fallback: on
        # all-done-at-init rows (uniform/background tiles — every member
        # bit-identical) the untaken branch's row passes ARE skipped by
        # Mosaic, so such rows keep their descend-free fast exit instead
        # of paying the unrolled seeded iteration. (Gating this cond on
        # seed VALIDITY as well — to skip the fallback-cut iteration on
        # unseeded steps — measured a pathological 4.6× slowdown on
        # all-miss batches, 80.3 → 372 µs/img; the invalid-seed fallback
        # iteration stays, at ~+2.6 µs/img on such batches.)
        state = jax.lax.cond(
            cond(tuple(state)),
            lambda st: tuple(body(st, seeded=True)),
            lambda st: st,
            tuple(state),
        )
    state = jax.lax.while_loop(cond, body, tuple(state))
    return [(iks[d], state[_S * d]) for d in range(n_sel)]


def member_mask(key, prefix, it):
    """Membership of the descent's final group: keys sharing the consumed
    ``4·it``-bit prefix (it ≥ 1 always — the first level always runs)."""
    shift = (32 - 4 * it).astype(jnp.uint32)
    return jax.lax.shift_right_logical(key, jnp.broadcast_to(shift, key.shape)) == prefix


def radix_select_multi(
    selects,
    keyed: bool = False,
    mode: str | None = None,
    seeds=None,
    want_terminal: bool = False,
    counts=None,
):
    """Run several radix descents in ONE while loop.

    ``selects``: list of ``(key, rank, fields)`` — ``key`` uint32 monotone
    in the values (masked elements = sentinel), ``rank`` scalar int32,
    ``fields`` a tuple of key-shaped arrays to read at the rank element.
    Returns a list (one per descent) of lists of selected field scalars.

    ``keyed=True`` declares that every field IS the keyed value (``key ==
    _monotone_key(field)``). Key-identical members are then bit-identical
    in the field (the monotone map is a bijection), so the member-index
    round trip is skipped: one ``max`` reduce over the member mask reads
    the value — saving a vector→scalar sync per select.

    Why fused: each radix level ends in a vector→scalar→vector round trip
    (bucket counts → bucket choice → next level's compares). That serial
    latency, not the 16 bucket counts themselves, dominates a level's cost
    on TPU (measured: a 1-count-per-level binary search ran 5.8× SLOWER
    than 16-count nibble levels on identical data). Fusing K descents
    issues all K×16 independent counts inside one level, paying the round
    trip once — the Macenko mega kernel's φ-pair and C-pair selections
    each become one loop.

    Per-descent algorithm (unchanged from round 1): split the current
    key-prefix group by its next 4 bits; membership is integer equality
    against the carried prefix — recomputed exactly at every level (no
    float interval arithmetic, no quantum-wobble element loss), the carry
    is scalars only (all Mosaic supports). At most 8 levels; early exit
    once every target bucket holds ≤ 1 element.

    Tie resolution across key-identical duplicates is deterministic: the
    member with the smallest linear index supplies EVERY field, so
    multi-field reads (the φ kernels' (cos, sin) pairs) always come from
    one actual pixel (round-1 advisor finding)."""
    if selects:
        k0 = selects[0][0]
        mode = _resolve_mode(
            mode, int(k0.shape[0]) * int(k0.shape[1]), seeds is not None
        )
    elif mode is None:
        mode = DESCENT_MODE
    if mode != "sint":
        seeds = None  # seeding is the sint mode's contract; others ignore it
        counts = None
    if mode.startswith("interval") or mode == "sint":
        n_cuts = 4 if mode == "sint" else int(mode[len("interval") :] or 4)
        descended = interval_descend_multi(
            [(key, rank) for key, rank, _f in selects],
            n_cuts=n_cuts,
            seeds=seeds,
            counts=counts,
        )
        if keyed:
            # The interval descent terminates with ``klo`` == the selected
            # element's exact signed key, and keyed fields are bijective in
            # the key — so the value comes from the SCALAR klo alone; no
            # member-mask row pass at all.
            results = [
                [_f32_from_ik_scalar(klo) for _ in fields]
                for (_k, _r, fields), (_ik, klo) in zip(selects, descended)
            ]
            if want_terminal:
                return results, [klo for _ik, klo in descended]
            return results
        members = [ik == klo for ik, klo in descended]
    else:
        radix = radix_descend_multi(
            [(key, rank) for key, rank, _fields in selects], mode=mode
        )
        if keyed and mode in ("dep", "ikdep", "cum16", "cum256", "spec6", "spec4"):
            # These modes set ``done`` ONLY via ``cit >= 8`` (and the loop
            # cond also requires ``it < 8``), so every exit carries the
            # FULL 32-bit prefix — the selected element's exact key. Keyed
            # fields are bijective in the key, so the value comes from the
            # SCALAR prefix alone: no member-mask row pass, no final
            # vector→scalar sync per select. (``nocon``/``defer`` can exit
            # on a singleton bucket with a partial prefix and must keep the
            # member path.)
            terminal = [
                prefix.astype(jnp.int32) ^ jnp.int32(-0x80000000)
                for prefix, _it in radix
            ]
            results = [
                [_f32_from_ik_scalar(ik_t) for _ in fields]
                for (_k, _r, fields), ik_t in zip(selects, terminal)
            ]
            if want_terminal:
                return results, terminal
            return results
        members = [
            member_mask(key, prefix, it)
            for (key, _r, _f), (prefix, it) in zip(selects, radix)
        ]
    if want_terminal:
        raise NotImplementedError(
            "want_terminal requires a keyed exact-terminal mode "
            "(sint/interval*/dep/ikdep/cum16/cum256/spec6/spec4 with keyed=True)"
        )

    results = []
    for (key, _rank, fields), member in zip(selects, members):
        # After early exit the member set is a single element; otherwise it
        # is key-identical duplicates — either way every member holds the
        # rank value.
        if keyed:
            results.append([jnp.max(jnp.where(member, f, -jnp.inf)) for f in fields])
            continue
        s, lane = key.shape
        idx = jax.lax.broadcasted_iota(jnp.int32, (s, lane), 0) * lane + (
            jax.lax.broadcasted_iota(jnp.int32, (s, lane), 1)
        )
        sel_idx = jnp.min(jnp.where(member, idx, jnp.int32(0x7FFFFFFF)))
        chosen = idx == sel_idx
        results.append([jnp.max(jnp.where(chosen, f, -jnp.inf)) for f in fields])
    return results


def radix_select_value(key, x_fields, r0):
    """Single-descent convenience wrapper around :func:`radix_select_multi`."""
    return radix_select_multi([(key, r0, tuple(x_fields))])[0]


def _select_kernel(ranks_ref, x_ref, out_ref, *, k_ranks: int):
    i = pl.program_id(0)
    x = x_ref[0]  # (S, 128) f32; +inf = masked/padding
    key = _monotone_key(x)

    # All K ranks descend in one fused loop (one level round-trip for all).
    results = radix_select_multi(
        [(key, ranks_ref[i, k], (x,)) for k in range(k_ranks)], keyed=True
    )
    for k in range(k_ranks):
        out_ref[i, k] = results[k][0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def kth_smallest_pallas(
    x: jnp.ndarray,
    ranks: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(R, P) f32 with +inf sentinels, ranks (R, K) int32 → (R, K) values.

    Bit-exact nearest-rank selection (radix descent). P is padded to a
    (8·128) multiple with +inf (sorts above every valid rank). Rows must fit
    the VMEM budget (``P ≤ MAX_ROW_ELEMS``); callers fall back to
    :func:`stainx_tpu.ops.percentile.kth_smallest` beyond it.
    """
    if interpret is None:
        interpret = interpret_mode()
    rows, p = x.shape
    k_ranks = ranks.shape[1]
    pad = (-p) % (8 * _LANE)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=jnp.inf)
    s = x.shape[1] // _LANE
    x3 = x.reshape(rows, s, _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows,),
        in_specs=[
            pl.BlockSpec((1, s, _LANE), lambda i, ranks: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )

    kernel = functools.partial(_select_kernel, k_ranks=k_ranks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, k_ranks), jnp.float32),
        interpret=interpret,
        # Above XLA's default 16 MB scoped-vmem budget (v5e has headroom):
        # a 2048² row plus the descent temporaries peaks at a measured
        # 127.6 MB — just inside the 128 MB physical VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )(ranks.astype(jnp.int32), x3)
