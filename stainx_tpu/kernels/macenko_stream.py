"""Streaming Pallas Macenko: the whole transform for rows beyond VMEM.

The mega kernel (:mod:`stainx_tpu.kernels.macenko_fused`) keeps a row
VMEM-resident and tops out at 1280×1024; above it the staged jnp path
materializes OD (N·P·3 f32), the angle field and both concentration
fields in HBM between stages — ~700 MB of traffic per 2×2048² batch plus
kernel-launch overheads, measured 6.5 ms (1 296 MPix/s).

This kernel keeps only the RAW uint8/float input in HBM and recomputes
everything per chunk per pass: each phase streams the image through a
double-buffered pair of (3, 32, CK) chunk buffers and derives OD —and
whatever field the phase needs— on the fly, so a pass costs one read of
the *bytes* (12.6 MB per 2048² uint8 image, not the 50 MB f32 OD). The
carried state between chunks is scalars only:

- **moments pass**: β-masked + all-pixel moment accumulators (the <3-px
  fallback needs both; 20 fused reduces per chunk) → scalar analytic
  eigh (reused from the mega kernel).
- **φ sweeps**: interval descent on the monotone diamond angle
  (:func:`..macenko_fused._pseudo_angle`), both α/100−α ranks sharing
  each pass; the descent machinery is
  :mod:`stainx_tpu.kernels.selection_stream`'s, with the field
  recomputed from the bytes instead of loaded.
- **concentration sweeps**: both stains' 99th percentiles, two fields
  recomputed per chunk from the same OD planes, counted in one pass.
- **reconstruction pass**: OD → concentrations → scaled reconstruct →
  output bytes, DMA'd out chunk by chunk.

Descent sweeps use an **HBM key cache**: the first sweep of each phase
computes the field from the bytes once, counts on it, and DMAs the
signed-key chunks out; every later sweep streams the cached keys back
instead of recomputing OD + projection. Sweeps are compute-bound at
~10× the chunk-DMA cost (measured: uniform tiles — descents exit after
one sweep — run 4× faster than real tiles), so trading the ~40%-of-sweep
field recompute for key bandwidth bought +43% end-to-end at 2048²
(1 847 → 2 648 MPix/s); the cut/count/step sequence is identical either
way, so results stay bit-exact.

The
math is the mega kernel's exactly (same OD formula, diamond-angle
selection with keyed scalar reads, sign-preserving maxC guard, same
reconstruct emit). Results are NOT bit-identical to the mega kernel:
the chunk-sequential moment accumulation (Kahan-compensated, see
``moments_body``) orders its f32 additions differently from the
resident kernel's whole-row reduces, so the eigenbasis — and through
it the selected percentiles — can differ by accumulation-order ulps.
The parity contract is ≤ 1 grey level on the output
(``tests/test_kernels.py::TestMacenkoStream``), and the oracle gates
are shared. Counterpart of the
reference's per-image pipeline (``torch_backend.py:399-461``) and the
CUDA sort machinery (``stainx_cuda_torch/csrc/macenko.cu:209-251``) at
sizes neither supports in one device pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainx_tpu.kernels import interpret_mode
from stainx_tpu.kernels.macenko_fused import (
    _BETA,
    _IO,
    _MISS_LIMIT,
    SEED_STATE_LEN,
    _seed_missed,
    _cov_scalars,
    _dir_from_pseudo,
    _eigh3_top2_scalars,
    _he_scalars_from_phi,
    _maxc_scale,
    _normal_rows_from_he,
    _od_from_planes,
    _pseudo_angle,
)
from stainx_tpu.kernels.selection import (
    _SEED_DELTAS,
    _f32_from_ik_scalar,
    _ikey_view,
    _insert_sorted,
    _monotone_key,
    interval_descend_multi,
)
from stainx_tpu.kernels.selection_stream import (
    _I32MAX,
    _I32MIN,
    _NS,
    _SENT_IK,
    _cuts,
    _descend_step,
    accumulate_sweep,
    stream_max_sweeps,
    sweep_acc_init,
    sweep_acc_width,
)

_SUB = 32
_LANE_MIN = 128  # minimum VMEM tile lane width (placeholder scratch)
_CK = 2048  # chunk lanes: 64 K px per chunk, 64 KB uint8 per channel buffer
# Ladder width. The mega kernel's sweeps are COMPUTE-bound (~10× the
# chunk-DMA cost), so per-sweep count work ~ n_cuts dominates and narrow
# ladders win despite more sweeps: measured at 2×2048² uint8 on v5e,
# 16 cuts = 2 648, 8 = 2 810, 6 = 2 814–2 885 (most stable), 4 = 2 889–3 025
# (relay-noisy), 32 = 1 744 MPix/s; all bit-identical. 6 is the default —
# and also the fit-path streaming selection's (selection_stream), where
# the same race repeated on its DMA-heavier key-chunk sweeps.
_N_CUTS = 6
# +2: a seeded sweep guarantees only a 2× narrowing (its midpoint cut)
# instead of the even ladder's n_cuts× when its bracket misses. At most
# ONE seeded sweep runs per image — sweep-1 cross-image seeding requires
# a previous image (seed_valid) while the subsample-seeded sweep 2
# requires its absence — so +1 covers the deficit (log₆3 < 1); the second
# +1 is pure margin (unused backstop sweeps cost nothing).
_MAX_SWEEPS = stream_max_sweeps(_N_CUTS) + 2
# Subsample buffer geometry: sublane 0 of every ``stride``-th chunk's key
# block, capped at 256 rows × _CK lanes per field (2 MB i32; ≤ 4 MB for
# the two concentration fields) — a cluster sample of ≤ 512 K keys that a
# cheap VMEM-resident descent turns into sweep-2 seeds.
_SUB_ROWS = 256


def _stream_mega_kernel(
    params_ref,
    *rest,
    is_uint8: bool,
    p_true: int,
    n_chunks: int,
    alpha: int,
    idx_hi_conc: int,
    fit_mode: bool = False,
    carry: bool = False,
):
    """``fit_mode`` (static): run phases A–C with FIT semantics — no
    <3-pixel fallback, φ percentiles over β-filtered pixels only, the
    concentration 99th percentiles over all pooled pixels — and write the
    8 fitted scalars (HE row-major + maxC pair) to ``out_hbm`` (an SMEM
    params ref in that mode) instead of reconstructing
    (``torch_backend.py:463-519``; jnp twin ``ops.macenko.macenko_fit``).

    ``carry`` (static): cross-CALL seed carry — a second prefetch operand
    holds a previous call's terminal state (4 keys + 2 streaks + valid),
    loaded into the seed scratch before grid step 0, and the final state
    is written to an SMEM output. Every saved sweep here is a whole HBM
    pass, so sequential same-distribution single-row calls (WSI tile
    streams) are the target case. Bit-exact for any state."""
    if carry:
        (seed_in_ref, x_hbm, out_hbm, keys_hbm, seed_out_ref,
         buf, sem, obuf, osem, kbuf, ksem, seed_ref, sub_buf) = rest
    else:
        (x_hbm, out_hbm, keys_hbm,
         buf, sem, obuf, osem, kbuf, ksem, seed_ref, sub_buf) = rest
    i = pl.program_id(0)
    if carry:
        @pl.when(i == 0)
        def _():
            for s_i in range(6):
                seed_ref[s_i] = seed_in_ref[0, s_i]

        have_prev0 = seed_in_ref[0, 6] > 0
    else:
        have_prev0 = None

    def write_seed_state_out():
        if not carry:
            return

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            for s_i in range(6):
                seed_out_ref[s_i] = seed_ref[s_i]
            seed_out_ref[6] = jnp.int32(1)

    chunk_px = _SUB * _CK
    # Cross-image seeding (the resident mega kernel's round-4 trick, where
    # it bought +12%; here every saved iteration is a whole HBM sweep):
    # the previous grid step's terminal selection keys, carried in SMEM
    # scratch, place sweep 1's cuts around the expected percentile instead
    # of even-splitting the full int32 key space. Cuts remain exact counted
    # probes — results stay bit-exact for any seed; step 0 descends
    # unseeded. Per-pair miss-streak cutout (``_MISS_LIMIT``, mirrored
    # from the resident kernel's round-4 mechanism): a persistently
    # heterogeneous stream would otherwise pay the seeded sweep's weaker
    # 2×-narrowing — extra whole-HBM sweeps — on EVERY image; with the
    # cutout the penalty is bounded at ~2 images per pair, after which
    # the subsample sweep-2 seeding (which the same flag re-enables)
    # takes over per image (round-4 advisor finding).

    def in_dma(slot, t, ch):
        return pltpu.make_async_copy(x_hbm.at[i, ch, t], buf.at[slot, ch], sem.at[slot, ch])

    def start_in(slot, t):
        for ch in range(3):
            in_dma(slot, t, ch).start()

    def wait_in(slot, t):
        for ch in range(3):
            in_dma(slot, t, ch).wait()

    def chunk_planes(slot):
        return [buf[slot, ch] for ch in range(3)]

    def valid_mask(t):
        idx = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _CK), 0) * _CK + (
            jax.lax.broadcasted_iota(jnp.int32, (_SUB, _CK), 1)
        )
        return (t * chunk_px + idx) < p_true

    def streamed(body, acc0):
        """fori over chunks with double-buffered input DMA; ``body`` takes
        (t, acc, od_planes, valid) and returns the new acc."""

        def step(t, acc):
            slot = t % 2

            @pl.when(t + 1 < n_chunks)
            def _():
                start_in((t + 1) % 2, t + 1)

            wait_in(slot, t)
            od = _od_from_planes(chunk_planes(slot), is_uint8)
            return body(t, acc, od, valid_mask(t))

        start_in(0, 0)
        return jax.lax.fori_loop(0, n_chunks, step, acc0)

    # --- phase A: masked + all-pixel moments in one pass -------------------
    # (the <3-px fallback needs the all-pixel set; at 1/~16 passes the 10
    # extra reduces are noise, unlike in the resident mega kernel where the
    # rarely-taken lax.cond measured faster)
    # Accumulator layout per mask set: [count(int32), 9 sums(f32),
    # 9 Kahan compensations(f32)] — 19 scalars, two sets (β-masked, all).
    _NM = 19

    def moments_body(_t, acc, od, valid):
        od_min = jnp.minimum(jnp.minimum(od[0], od[1]), od[2])
        bmask = (od_min >= _BETA) & valid
        y = [o - 1.0 for o in od]  # centered (cov is center-invariant)
        new_acc = []
        # Fit mode: β-masked set only — no <3-pixel fallback at fit.
        for si, w_mask in enumerate((bmask,) if fit_mode else (bmask, valid)):
            base = _NM * si
            w = w_mask.astype(jnp.float32)
            part = [  # this chunk's 9 f32 moment partials
                jnp.sum(w * y[0]),
                jnp.sum(w * y[1]),
                jnp.sum(w * y[2]),
                jnp.sum(w * y[0] * y[0]),
                jnp.sum(w * y[0] * y[1]),
                jnp.sum(w * y[0] * y[2]),
                jnp.sum(w * y[1] * y[1]),
                jnp.sum(w * y[1] * y[2]),
                jnp.sum(w * y[2] * y[2]),
            ]
            # Count in int32: it feeds nearest-rank indices, and an f32
            # running sum loses integer exactness past 2^24 — exactly
            # the >16.7M-px rows this kernel exists for (4096²+).
            new_acc.append(acc[base] + jnp.sum(w_mask.astype(jnp.int32)))
            # Kahan-compensated f32 sums: a plain sequential fold's error
            # grows ~linearly with chunk count (~17 000 chunks at the 33k²
            # HBM ceiling → up to ~1e-3 relative in the centered second
            # moments, enough to move the eigenbasis), while compensation
            # bounds it at O(1) ulps for any chunk count (round-3 review
            # finding). XLA does not reassociate floats, so the
            # compensation survives compilation.
            sums, comps = [], []
            for k in range(9):
                s, comp = acc[base + 1 + k], acc[base + 10 + k]
                yk = part[k] - comp
                t_new = s + yk
                comps.append((t_new - s) - yk)
                sums.append(t_new)
            new_acc.extend(sums + comps)
        return tuple(new_acc)

    zf, zi = jnp.float32(0.0), jnp.int32(0)
    m = streamed(moments_body, ((zi,) + (zf,) * 18) * (1 if fit_mode else 2))
    if fit_mode:
        use_all = jnp.asarray(False)
        cnt_i32 = m[0]
        s0, s1_, s2_, xx, xy, xz, yy, yz, zz = (m[k] for k in range(1, 10))
    else:
        use_all = m[0] < 3
        cnt_i32 = jnp.where(use_all, m[_NM], m[0])
        s0, s1_, s2_, xx, xy, xz, yy, yz, zz = (
            jnp.where(use_all, m[_NM + k], m[k]) for k in range(1, 10)
        )
    cnt = cnt_i32.astype(jnp.float32)

    evs = _eigh3_top2_scalars(*_cov_scalars(cnt, s0, s1_, s2_, xx, xy, xz, yy, yz, zz))
    v00, v10, v20, v01, v11, v21 = evs

    # --- descent driver: K descents with an HBM KEY CACHE -------------------
    # Sweep 1 computes each field from the bytes exactly once, counts on it,
    # and DMAs the signed-key chunks out to ``keys_hbm``; every later sweep
    # reads the cached keys back instead of recomputing OD + projection per
    # chunk (measured: sweeps are compute-bound at ~10× the chunk DMA cost,
    # and the field recompute is ~40% of a sweep's per-element work). The
    # cut/count/step sequence is IDENTICAL to the recompute form — cached
    # keys are the written values — so results are bit-exact either way.
    # _NS / sweep_acc_width / accumulate_sweep (imported): the while-carry
    # and sweep-accumulator layouts are owned by selection_stream — local
    # copies of either could silently desync if it ever grows them
    # (round-3 review findings, both directions).
    _NA = sweep_acc_width(_N_CUTS)

    def run_descents(field_fns, descents, seed_slots, streak_slot, totals):
        """``field_fns``: (od, valid) → signed-key chunk view, computed
        ONCE per chunk on sweep 1 (which spans the whole key space and
        doubles as range discovery, cf. selection_stream) and cached in
        HBM for the remaining sweeps; ``descents``: (field_idx, rank)
        pairs counted on it; ``seed_slots``: per-descent seed scratch
        index (sweep-1 cuts come from that slot's previous-image terminal
        key when valid, and the terminal key is written back);
        ``streak_slot``: this pair's miss-streak counter slot — seeding
        disables while the streak is ≥ ``_MISS_LIMIT`` (all of the pair's
        terminals landed outside the widest probe bracket on consecutive
        images) and the subsample seeding takes its place;
        ``totals``: per-descent total valid count (scales ranks onto the
        subsample). Returns each terminal klo.

        Two seeding layers, both pure probe placement (bit-exact):

        - **sweep 1** brackets the previous image's terminal key
          (cross-image scratch carry; invalid on grid step 0);
        - **sweep 2** brackets a VMEM-resident descent's estimate from the
          subsample sweep 1 collected (``sub_buf``) — the only seed source
          a single-image row has. Injected branch-free into the while
          loop's first iteration (``sweeps == 1``) so uniform tiles, whose
          descents finish at sweep 1, never pay for it."""
        k_d = len(descents)
        n_fields = len(field_fns)
        ranks = [r for _fi, r in descents]
        streak = seed_ref[streak_slot]
        have_prev = (i > 0) if have_prev0 is None else ((i > 0) | have_prev0)
        seed_valid = have_prev & (streak < _MISS_LIMIT)
        stride = -(-n_chunks // _SUB_ROWS)  # ceil: sample every stride-th chunk
        rows_used = -(-n_chunks // stride)

        def count_all(iks, per_d, all_cuts, acc):
            new_acc = []
            for d, (fi, _r) in enumerate(descents):
                new_acc.extend(
                    accumulate_sweep(
                        iks[fi],
                        per_d[d][0],
                        per_d[d][1],
                        all_cuts[d],
                        acc[_NA * d : _NA * (d + 1)],
                        _N_CUTS,
                    )
                )
            return tuple(new_acc)

        acc0 = tuple(v for _ in range(k_d) for v in sweep_acc_init(_N_CUTS))

        def kwrite(slot, t, f):
            return pltpu.make_async_copy(
                kbuf.at[slot, f], keys_hbm.at[f, t], ksem.at[slot, f]
            )

        def kread(slot, t, f):
            return pltpu.make_async_copy(
                keys_hbm.at[f, t], kbuf.at[slot, f], ksem.at[slot, f]
            )

        # Sweep 1 (peeled): no-init state — the full int32 key space.
        per_d0 = [
            (
                jnp.int32(_I32MIN),
                jnp.int32(_I32MAX),
                jnp.int32(0),
                jnp.int32(0),
                jnp.asarray(False),
            )
        ] * k_d
        def seeded_cuts0(d):
            """Sweep-1 cuts: the previous image's terminal key bracketed at
            the shared ``selection._SEED_DELTAS`` drift scales (one source
            of truth with the resident kernel — measured image-to-image
            percentile drift is median 0.02–0.14%, max 0.31%, so the wide
            cut still always contains the next value) plus the int32
            midpoint (a wrong seed still
            halves the space; the min/max snap then clamps to the data's
            occupied range regardless). Falls back to the even full-space
            ladder when the seed is invalid (grid step 0). Both lists are
            sorted and the validity flag is one scalar, so the elementwise
            select preserves sort order."""
            unseeded = _cuts(
                jnp.int32(_I32MIN),
                jnp.int32(_I32MAX),
                jnp.int32(0),
                jnp.int32(0),
                ranks[d],
                _N_CUTS,
            )
            s = jnp.clip(
                seed_ref[seed_slots[d]],
                jnp.int32(_I32MIN + (1 << 20)),
                jnp.int32(_SENT_IK - (1 << 20)),
            )
            offs = sorted([-o for o in _SEED_DELTAS] + [0] + list(_SEED_DELTAS))
            bracket = [s + jnp.int32(off) for off in offs]
            seeded = _insert_sorted(bracket, jnp.int32(0))
            assert len(seeded) == len(unseeded) == _N_CUTS
            return [jnp.where(seed_valid, sc, uc) for sc, uc in zip(seeded, unseeded)]

        all_cuts0 = [seeded_cuts0(d) for d in range(k_d)]

        def write_body(t, acc, od, valid):
            iks = [fn(od, valid) for fn in field_fns]
            slot = t % 2

            @pl.when(t >= 2)
            def _():
                for f in range(n_fields):
                    kwrite(slot, t - 2, f).wait()

            for f in range(n_fields):
                kbuf[slot, f] = iks[f]
            for f in range(n_fields):
                kwrite(slot, t, f).start()

            # Collect only when the cheaper cross-image seed is absent
            # (grid step 0): for later images sweep 1's previous-image
            # bracket already leaves a tighter interval than the subsample
            # estimate, and the sub-descent's serial iterations measured a
            # net LOSS at small chunk counts (2×2048²: 3 504 → 1 470
            # MPix/s with it unconditional).
            @pl.when((t % stride == 0) & jnp.logical_not(seed_valid))
            def _():
                row = t // stride
                for f in range(n_fields):
                    sub_buf[f, pl.ds(row, 1)] = iks[f][0:1]

            return count_all(iks, per_d0, all_cuts0, acc)

        def step_states(per_d, all_cuts, acc):
            """One `_descend_step` per descent from its accumulator slice —
            the ONLY place the accumulator layout meets the step signature
            (shared by the peeled sweep and the while-loop body so they
            cannot desynchronize)."""
            out = []
            for d in range(k_d):
                a = acc[_NA * d : _NA * (d + 1)]
                out.extend(
                    _descend_step(
                        *per_d[d],
                        ranks[d],
                        all_cuts[d],
                        list(a[: _N_CUTS + 1]),
                        a[_N_CUTS + 1],
                        a[_N_CUTS + 2],
                    )
                )
            return out

        acc = streamed(write_body, acc0)
        for t_tail in range(max(n_chunks - 2, 0), n_chunks):
            for f in range(n_fields):
                kwrite(t_tail % 2, t_tail, f).wait()

        state = [jnp.int32(1)] + step_states(per_d0, all_cuts0, acc)

        def cond(state):
            alive = jnp.asarray(False)
            for d in range(k_d):
                alive = alive | jnp.logical_not(state[1 + _NS * d + 4])
            return alive & (state[0] < _MAX_SWEEPS)

        # Sweep-2 seeds from the subsample: one fused VMEM-resident interval
        # descent over the collected key rows (≤ 2 MB per field — dozens of
        # cheap on-chip iterations vs whole-HBM sweeps). The selected
        # subsample order statistic at the proportionally scaled rank
        # estimates the full-row percentile value to well under the ±2¹⁶
        # bracket; the descent early-stops once its span is inside the
        # sweep-2 bracket's tight cut (resolving the final ulps costs as
        # many iterations as the whole coarse phase and buys nothing).
        # Guarded by cond() & !seed_valid: uniform tiles (every descent
        # finished at sweep 1) and cross-image-seeded grid steps skip the
        # sub-descent's row passes entirely.
        def compute_sub_seeds(_):
            row_id = jax.lax.broadcasted_iota(jnp.int32, (_SUB_ROWS, _CK), 0)
            sub_selects = []
            for d, (fi, _r) in enumerate(descents):
                ik_sub = jnp.where(
                    row_id < rows_used, sub_buf[fi], jnp.int32(_SENT_IK)
                )
                key_sub = jax.lax.bitcast_convert_type(
                    ik_sub, jnp.uint32
                ) ^ jnp.uint32(0x80000000)
                n_sub = jnp.sum((ik_sub != jnp.int32(_SENT_IK)).astype(jnp.int32))
                r_sub = (
                    ranks[d].astype(jnp.float32)
                    * (
                        n_sub.astype(jnp.float32)
                        / jnp.maximum(totals[d].astype(jnp.float32), 1.0)
                    )
                ).astype(jnp.int32)
                sub_selects.append((key_sub, r_sub))
            return tuple(
                klo
                for _ik, klo in interval_descend_multi(
                    sub_selects, stop_span=1 << 11
                )
            )

        sub_seeds = jax.lax.cond(
            cond(tuple(state)) & jnp.logical_not(seed_valid),
            compute_sub_seeds,
            lambda _: tuple(jnp.int32(0) for _ in range(k_d)),
            0,
        )

        def body(state):
            per_d = [state[1 + _NS * d : 1 + _NS * (d + 1)] for d in range(k_d)]

            def cuts_for(d, klo, khi, below, at):
                std = _cuts(klo, khi, below, at, ranks[d], _N_CUTS)
                # Seeded variant (first while iteration only): bracket the
                # subsample estimate at two tight ULP scales + the interval
                # midpoint (the 2× guarantee), clipped into the live
                # interval. Clip and elementwise scalar select both
                # preserve sort order (one selector for the whole list).
                top = jnp.minimum(khi, jnp.int32(_SENT_IK - 1))
                hi_cut = jnp.maximum(top - 1, klo)
                s = jnp.clip(
                    sub_seeds[d],
                    jnp.int32(_I32MIN + (1 << 20)),
                    jnp.int32(_SENT_IK - (1 << 20)),
                )
                bracket = [
                    jnp.clip(s + jnp.int32(off), klo, hi_cut)
                    for off in (-(1 << 16), -(1 << 12), 0, 1 << 12, 1 << 16)
                ]
                mid = (klo >> 1) + (khi >> 1) + (klo & khi & jnp.int32(1))
                seeded = _insert_sorted(bracket, jnp.clip(mid, klo, hi_cut))
                use_seed = (state[0] == 1) & jnp.logical_not(seed_valid)
                return [jnp.where(use_seed, sc, uc) for sc, uc in zip(seeded, std)]

            all_cuts = [
                cuts_for(d, klo, khi, below, at)
                for d, (klo, khi, below, at, _dn) in enumerate(per_d)
            ]

            def sweep_body(t, acc):
                slot = t % 2

                @pl.when(t + 1 < n_chunks)
                def _():
                    for f in range(n_fields):
                        kread((t + 1) % 2, t + 1, f).start()

                for f in range(n_fields):
                    kread(slot, t, f).wait()
                iks = [kbuf[slot, f] for f in range(n_fields)]
                return count_all(iks, per_d, all_cuts, acc)

            for f in range(n_fields):
                kread(0, 0, f).start()
            acc = jax.lax.fori_loop(0, n_chunks, sweep_body, acc0)

            return tuple([state[0] + 1] + step_states(per_d, all_cuts, acc))

        state = jax.lax.while_loop(cond, body, tuple(state))
        terminals = [state[1 + _NS * d] for d in range(k_d)]
        # Miss detection BEFORE the write-back: terminals are compared
        # against the previous image's regardless of whether seeding was
        # active, so a stabilized stream re-enables itself one image after
        # the terminals settle (resident-kernel semantics, _select_seeded).
        all_far = None
        for d in range(k_d):
            far = _seed_missed(seed_ref[seed_slots[d]], terminals[d])
            all_far = far if all_far is None else (all_far & far)
            seed_ref[seed_slots[d]] = terminals[d]
        seed_ref[streak_slot] = jnp.where(
            jnp.logical_not(have_prev),
            jnp.int32(0),
            jnp.where(all_far, streak + 1, jnp.int32(0)),
        )
        return terminals

    # --- phase B: φ percentiles on the diamond angle -----------------------
    def phi_ik(od, valid):
        od_min = jnp.minimum(jnp.minimum(od[0], od[1]), od[2])
        eff = ((od_min >= _BETA) | use_all) & valid
        t0 = od[0] * v00 + od[1] * v10 + od[2] * v20
        t1 = od[0] * v01 + od[1] * v11 + od[2] * v21
        pseudo = _pseudo_angle(t0, t1)
        return _ikey_view(_monotone_key(jnp.where(eff, pseudo, jnp.inf)))

    from stainx_tpu.ops.percentile import nearest_rank_index

    r_lo = nearest_rank_index(alpha, cnt_i32)
    r_hi = nearest_rank_index(100 - alpha, cnt_i32)
    klo_lo, klo_hi = run_descents(
        [phi_ik], [(0, r_lo), (0, r_hi)], (0, 1), 4, (cnt_i32, cnt_i32)
    )
    cos_lo, sin_lo = _dir_from_pseudo(_f32_from_ik_scalar(klo_lo))
    cos_hi, sin_hi = _dir_from_pseudo(_f32_from_ik_scalar(klo_hi))
    h0, h1 = _he_scalars_from_phi(evs, cos_lo, sin_lo, cos_hi, sin_hi)
    m0, m1 = _normal_rows_from_he(h0, h1)

    # --- phase C: concentration 99th percentiles ---------------------------
    def c0_ik(od, valid):
        c0 = od[0] * m0[0] + od[1] * m0[1] + od[2] * m0[2]
        return _ikey_view(_monotone_key(jnp.where(valid, c0, jnp.inf)))

    def c1_ik(od, valid):
        c1 = od[0] * m1[0] + od[1] * m1[1] + od[2] * m1[2]
        return _ikey_view(_monotone_key(jnp.where(valid, c1, jnp.inf)))

    rank_c = jnp.int32(idx_hi_conc)
    kc0, kc1 = run_descents(
        [c0_ik, c1_ik],
        [(0, rank_c), (1, rank_c)],
        (2, 3),
        5,
        (jnp.int32(p_true), jnp.int32(p_true)),
    )
    maxc0 = _f32_from_ik_scalar(kc0)
    maxc1 = _f32_from_ik_scalar(kc1)

    if fit_mode:
        # The fitted parameters ARE the output: (3, 2) HE row-major, then
        # the two max concentrations. No reconstruction phase.
        for ch in range(3):
            out_hbm[2 * ch] = h0[ch]
            out_hbm[2 * ch + 1] = h1[ch]
        out_hbm[6] = maxc0
        out_hbm[7] = maxc1
        write_seed_state_out()
        return

    tmc0, tmc1 = params_ref[0, 0], params_ref[0, 1]
    stain = [[params_ref[0, 2 + 2 * c + k] for k in range(2)] for c in range(3)]
    scale0 = _maxc_scale(tmc0, maxc0)
    scale1 = _maxc_scale(tmc1, maxc1)

    # --- phase D: reconstruction, chunk in / chunk out ----------------------
    def out_dma(slot, t, ch):
        return pltpu.make_async_copy(obuf.at[slot, ch], out_hbm.at[i, ch, t], osem.at[slot, ch])

    def recon_body(t, _acc, od, _valid):
        slot = t % 2

        @pl.when(t >= 2)
        def _():
            for ch in range(3):
                out_dma(slot, t - 2, ch).wait()

        cn0 = (od[0] * m0[0] + od[1] * m0[1] + od[2] * m0[2]) * scale0
        cn1 = (od[0] * m1[0] + od[1] * m1[1] + od[2] * m1[2]) * scale1
        for ch in range(3):
            rec = jnp.clip(_IO * jnp.exp(-(stain[ch][0] * cn0 + stain[ch][1] * cn1)), 0.0, 255.0)
            if is_uint8:
                obuf[slot, ch] = rec.astype(jnp.int32).astype(jnp.uint8)
            else:
                obuf[slot, ch] = rec
        for ch in range(3):
            out_dma(slot, t, ch).start()
        return _acc

    streamed(recon_body, jnp.int32(0))
    for t_tail in range(max(n_chunks - 2, 0), n_chunks):
        for ch in range(3):
            out_dma(t_tail % 2, t_tail, ch).wait()
    write_seed_state_out()


@functools.partial(jax.jit, static_argnames=("interpret",))
def macenko_transform_stream(
    images, stain_matrix, target_max_conc, seed_state=None, interpret: bool | None = None
):
    """Streaming one-kernel Macenko transform, (N, 3, H, W) uint8/float32
    [0,1] → normalized batch (same dtype, [0,255] range). VMEM holds only
    chunk buffers; HBM holds the bytes. Measured to **16384² rows**
    (268 M px, 3 445–3 453 MPix/s, MAE 0.0129 vs the numpy oracle, v5e); the
    eventual row cap is HBM, not VMEM — input + output + the 8 B/px key
    cache ≈ 14 B/px uint8 (32 B/px f32) put the arithmetic ceiling near
    ~1.1 G px on a 16 GB chip, but that regime is unmeasured and each new
    row shape in the 12k–16k tier pays a ~10–15 min one-time compile.

    ``seed_state`` (optional, (7,) int32 — ``macenko_fused.
    seed_state_init``): cross-CALL seed carry; the return becomes
    ``(out, new_state)``. Targets sequential same-distribution
    single-row calls, where every saved sweep is a whole HBM pass."""
    if interpret is None:
        interpret = interpret_mode()
    if images.dtype not in (jnp.uint8, jnp.float32):
        # The kernel stores f32 results into an images.dtype output buffer;
        # only the uint8 (explicit int32 hop) and float32 stores lower.
        # ops.macenko gates routing the same way (fused_row_budget_ok +
        # STREAM_MEGA dtype check); direct callers get the same contract.
        raise TypeError(
            f"macenko_transform_stream lowers only uint8/float32 inputs, got "
            f"{images.dtype}; other dtypes take the XLA path "
            "(ops.macenko.macenko_transform)."
        )
    n, c, h, w = images.shape
    p_true = h * w
    chunk_px = _SUB * _CK
    pad = (-p_true) % chunk_px
    flat = images.reshape(n, c, p_true)
    if pad:
        pad_value = 255 if images.dtype == jnp.uint8 else 1.0
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)), constant_values=pad_value)
    n_chunks = flat.shape[2] // chunk_px
    x5 = flat.reshape(n, c, n_chunks, _SUB, _CK)

    from stainx_tpu.ops.macenko import ALPHA
    from stainx_tpu.ops.percentile import static_nearest_rank_index

    idx_hi_conc = static_nearest_rank_index(99, p_true)
    params = jnp.concatenate(
        [
            target_max_conc.reshape(2).astype(jnp.float32),
            stain_matrix.reshape(6).astype(jnp.float32),
        ]
    ).reshape(1, 8)

    carry = seed_state is not None
    scratch = [
        pltpu.VMEM((2, 3, _SUB, _CK), images.dtype),
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.VMEM((2, 3, _SUB, _CK), images.dtype),
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.VMEM((2, 2, _SUB, _CK), jnp.int32),
        pltpu.SemaphoreType.DMA((2, 2)),
        # Cross-image seed scratch (4 terminal keys: φ lo/hi, c0/c1 +
        # one miss-streak counter per loop-pair) — persists across the
        # sequential grid steps.
        pltpu.SMEM((6,), jnp.int32),
        # Subsample key rows collected by each phase's sweep 1 (per
        # field) — the sweep-2 seed source for single-image rows.
        pltpu.VMEM((2, _SUB_ROWS, _CK), jnp.int32),
    ]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [
        jax.ShapeDtypeStruct(x5.shape, images.dtype),
        jax.ShapeDtypeStruct((2, n_chunks, _SUB, _CK), jnp.int32),
    ]
    if carry:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((SEED_STATE_LEN,), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if carry else 1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _stream_mega_kernel,
        is_uint8=images.dtype == jnp.uint8,
        p_true=p_true,
        n_chunks=n_chunks,
        alpha=int(ALPHA),
        idx_hi_conc=idx_hi_conc,
        carry=carry,
    )
    # Second output = the descents' HBM key cache (one signed-key plane per
    # descent field, reused by every image — grid steps run sequentially).
    # It is scratch that outlives a grid step, which Pallas models as an
    # output; the caller discards it.
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
    )
    if carry:
        out, _keys, new_state = call(
            params, seed_state.reshape(1, SEED_STATE_LEN).astype(jnp.int32), x5
        )
    else:
        out = call(params, x5)[0]

    out = out.reshape(n, c, n_chunks * chunk_px)
    if pad:
        out = out[:, :, :p_true]
    out = out.reshape(n, c, h, w)
    return (out, new_state) if carry else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def macenko_fit_stream(images, seed_state=None, interpret: bool | None = None):
    """Streaming one-kernel Macenko fit: (N, 3, H, W) uint8/float32 [0,1]
    → fitted ``(stain_matrix (3, 2) f32, max_concentrations (2,) f32)``.

    All N images pool into ONE row (fit semantics pool the batch,
    ``torch_backend.py:469-474``) which streams chunk-by-chunk: phases
    A–C of the transform kernel with fit semantics, no reconstruction.
    The subsample sweep-2 seeding applies in full — a pooled fit is
    always a single "image 0" row, exactly the case it was built for.
    Serves every pooled size past :func:`..macenko_fused.
    fused_fit_budget_ok`'s VMEM budget; the row ceiling is HBM (input +
    the 8 B/px key cache), like the streaming transform's.

    ``seed_state`` (optional, (7,) int32): cross-CALL seed carry — the
    return becomes ``(he, maxc, new_state)``; see
    :func:`macenko_transform_stream`."""
    if interpret is None:
        interpret = interpret_mode()
    if images.dtype not in (jnp.uint8, jnp.float32):
        raise TypeError(
            f"macenko_fit_stream lowers only uint8/float32 inputs, got "
            f"{images.dtype}; other dtypes take the XLA path "
            "(ops.macenko.macenko_fit)."
        )
    n, c, h, w = images.shape
    p_true = n * h * w
    chunk_px = _SUB * _CK
    pad = (-p_true) % chunk_px
    # Channel-major pooling (a plain reshape would interleave channels).
    flat = jnp.transpose(images.reshape(n, c, h * w), (1, 0, 2)).reshape(1, c, p_true)
    if pad:
        pad_value = 255 if images.dtype == jnp.uint8 else 1.0
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)), constant_values=pad_value)
    n_chunks = flat.shape[2] // chunk_px
    x5 = flat.reshape(1, c, n_chunks, _SUB, _CK)

    from stainx_tpu.ops.macenko import ALPHA
    from stainx_tpu.ops.percentile import static_nearest_rank_index

    idx_hi_conc = static_nearest_rank_index(99, p_true)
    carry = seed_state is not None
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((8,), jnp.float32),
        jax.ShapeDtypeStruct((2, n_chunks, _SUB, _CK), jnp.int32),
    ]
    if carry:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((SEED_STATE_LEN,), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if carry else 1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, 3, _SUB, _CK), images.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            # obuf/osem exist only for the transform's phase D (untraced
            # here) — minimum-size placeholders keep the ref signature.
            pltpu.VMEM((2, 3, 8, _LANE_MIN), images.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.VMEM((2, 2, _SUB, _CK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SMEM((6,), jnp.int32),
            pltpu.VMEM((2, _SUB_ROWS, _CK), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _stream_mega_kernel,
        is_uint8=images.dtype == jnp.uint8,
        p_true=p_true,
        n_chunks=n_chunks,
        alpha=int(ALPHA),
        idx_hi_conc=idx_hi_conc,
        fit_mode=True,
        carry=carry,
    )
    params = jnp.zeros((1, 8), jnp.float32)  # unused in fit mode
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
    )
    if carry:
        out, _keys, new_state = call(
            params, seed_state.reshape(1, SEED_STATE_LEN).astype(jnp.int32), x5
        )
        return out[:6].reshape(3, 2), out[6:8], new_state
    out = call(params, x5)[0]
    return out[:6].reshape(3, 2), out[6:8]
