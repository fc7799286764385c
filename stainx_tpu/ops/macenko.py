"""Macenko stain normalization — batched, fixed-shape, fully on-device.

Semantics follow the reference's Macenko math (constants Io=240, β=0.15,
α=1; ``src/stainx/backends/torch_backend.py:358-560``) in the **fixed-shape
masked formulation** of its CUDA wrapper
(``src/stainx_cuda_torch/csrc/macenko.cu:67-266``): β-mask with an
all-pixels fallback when fewer than 3 pixels survive, ±inf sentinels for
masked percentiles, 2×2 normal-equation concentration solve, nearest-rank
percentiles with the torchstain index formula. The reference's torch
backend loops over images in Python (``torch_backend.py:556-558``) with
per-image CPU eigh/lstsq round-trips; here the whole batch is one traced
XLA program — no host syncs, no per-image loop.

TPU-first design choices (vs the CUDA structure):

- All K∈{2,3} contractions (covariance, stain-plane projection,
  normal-equation RHS, reconstruction) are written as **channel-plane
  FMAs**, not matmuls: they are bandwidth-bound, the MXU's default
  bf16-input passes would cost exact f32 parity, and elementwise form lets
  XLA fuse each stage with its neighbours into single HBM passes.
- Covariance is a **two-pass centered** f32 reduction (XLA tree-reduces),
  not the one-pass E[xxᵀ]−μμᵀ formula the reference needs fp64 for
  (``macenko.cu:9-31``) — centering removes the catastrophic cancellation,
  so f32 suffices on TPU where fp64 is emulated/absent.
- Percentiles use multi-level radix-interval descent on the monotone
  integer key view instead of full O(P log P) sorts — 5× faster than TPU
  ``top_k``/``sort``, bit-exact, and free of their compile-time k limits
  (see :mod:`stainx_tpu.ops.percentile`).
- ``precision="fast"`` evaluates the reconstruction in bf16 (the CUDA
  fast path's fp16 role, ``macenko.cu:116-191``) and caps the percentile
  refinement depth; the stain-plane projection, statistics, percentile
  ranks and the 2×2 solve stay f32 (bf16 projection measurably breaks the
  reference MAE gate — see ``macenko_transform``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stainx_tpu.ops import color
from stainx_tpu.ops.eigh3 import eigh3_top2
from stainx_tpu.ops.percentile import (
    _MAX_LEVELS,
    kth_smallest,
    nearest_rank_index,
    static_nearest_rank_index,
)

IO = 240.0
BETA = 0.15
ALPHA = 1  # integer percent — percentile ranks are computed exactly


def optical_density(images_float: jnp.ndarray) -> jnp.ndarray:
    """OD = −log((I·255 + 1) / Io) for float [0,1] images (``torch_backend.py:475``)."""
    return -jnp.log((images_float * 255.0 + 1.0) / IO)


MOMENT_CENTER = 1.0  # fixed OD centering: keeps f32 second moments stable


def masked_od_moments(
    od_c: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], weights: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Additive masked OD moments per batch entry from channel planes
    ``od_c`` (each (N, P)) and 0/1 ``weights`` (N, P): ``(count, sum(3,),
    outer-product sum (3,3))``, accumulated about :data:`MOMENT_CENTER`
    (the covariance is center-invariant; centering removes the
    E[xxᵀ]−μμᵀ cancellation the reference needed fp64 for). These are the
    additive scalars of the reference's CUDA accumulator layout
    (``csrc/macenko.cu:156-190``) and distribute losslessly under
    cross-chip ``psum`` (SURVEY §5)."""
    y = [od_c[i] - MOMENT_CENTER for i in range(3)]
    cnt = jnp.sum(weights, axis=-1)
    s1 = jnp.stack([jnp.sum(weights * y[i], axis=-1) for i in range(3)], axis=-1)
    s2 = jnp.stack(
        [
            jnp.stack([jnp.sum(weights * y[i] * y[j], axis=-1) for j in range(3)], axis=-1)
            for i in range(3)
        ],
        axis=-2,
    )
    return cnt, s1, s2


def cov_from_moments(cnt: jnp.ndarray, s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """Covariance (N, 3, 3) from additive moments — used by the distributed
    (psum-reduced) fit path where a two-pass scheme would need a second
    cross-chip round trip. Accumulation is f32 tree-reduced, adequate for
    the post-``psum`` combine."""
    mu = s1 / jnp.maximum(cnt, 1.0)[:, None]
    cov = (s2 - cnt[:, None, None] * mu[:, :, None] * mu[:, None, :]) / jnp.maximum(
        cnt - 1.0, 1.0
    )[:, None, None]
    return jnp.where((cnt > 1.0)[:, None, None], cov, 0.0)


def _masked_cov_two_pass(od_c, weights: jnp.ndarray, cnt: jnp.ndarray) -> jnp.ndarray:
    """Σ w·(x−μ)(x−μ)ᵀ / (cnt−1); zeros when cnt ≤ 1 (``torch_backend.py:384-397``).

    ``od_c``: three (N, P) channel planes; ``weights``: 0/1 (N, P).
    """
    safe_cnt = jnp.maximum(cnt, 1.0)
    mu = [jnp.sum(weights * od_c[i], axis=-1) / safe_cnt for i in range(3)]
    centered = [od_c[i] - mu[i][:, None] for i in range(3)]
    denom = jnp.maximum(cnt - 1.0, 1.0)
    rows = []
    for i in range(3):
        wc_i = weights * centered[i]
        rows.append(
            jnp.stack(
                [jnp.sum(wc_i * centered[j], axis=-1) / denom for j in range(3)], axis=-1
            )
        )
    cov = jnp.stack(rows, axis=-2)  # (N, 3, 3)
    return jnp.where((cnt > 1.0)[:, None, None], cov, 0.0)


def _project_plane(od_c, evecs: jnp.ndarray, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project OD channel planes onto the stain plane: That_k = Σ_c od_c·v_ck.

    Returns the two projection planes (N, P) as f32 (inputs evaluated in
    ``dtype`` — bf16 in fast mode, mirroring the CUDA fp16 bmm)."""
    out = []
    for k in range(2):
        acc = sum(
            od_c[i].astype(dtype) * evecs[:, i, k].astype(dtype)[:, None] for i in range(3)
        )
        out.append(acc.astype(jnp.float32))
    return out[0], out[1]


def _he_from_phi_extremes(
    evecs: jnp.ndarray, min_phi: jnp.ndarray, max_phi: jnp.ndarray
) -> jnp.ndarray:
    """Extreme stain vectors + H/E ordering (``torch_backend.py:502-510``)."""
    v_min = evecs[:, :, 0] * jnp.cos(min_phi)[:, None] + evecs[:, :, 1] * jnp.sin(min_phi)[:, None]
    v_max = evecs[:, :, 0] * jnp.cos(max_phi)[:, None] + evecs[:, :, 1] * jnp.sin(max_phi)[:, None]
    swap = (v_min[:, 0] > v_max[:, 0])[:, None, None]
    he_min_first = jnp.stack([v_min, v_max], axis=-1)  # (N, 3, 2)
    he_max_first = jnp.stack([v_max, v_min], axis=-1)
    return jnp.where(swap, he_min_first, he_max_first)


def _concentrations_2x2(he: jnp.ndarray, od_c) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares concentrations via explicit 2×2 normal equations
    (the CUDA wrapper's closed-form inverse, ``macenko.cu:156-171``).

    he: (N, 3, 2); od_c: three (N, P) channel planes → (C0, C1) f32.
    """
    h0, h1 = he[:, :, 0], he[:, :, 1]  # (N, 3)
    a = jnp.sum(h0 * h0, axis=-1)  # (N,)
    b = jnp.sum(h0 * h1, axis=-1)
    c = jnp.sum(h1 * h1, axis=-1)
    # Finite-inverse clamp: bit-identical to the raw 1/det for every
    # well-posed stain pair (unit columns ⇒ |1/det| = 1/sin²θ ≪ 1e12, and
    # the det expression keeps a single consumer so XLA's FMA fusion — and
    # batch-vs-single ulp consistency — is untouched). When a uniform
    # tile's identical φ percentiles make the columns (anti)parallel,
    # 1/det is ±inf and the clamp keeps concentrations finite; the
    # maxC-normalized reconstruction then cancels the scale, where the
    # reference's lstsq returns its defined min-norm solution.
    inv_det = jnp.clip(1.0 / (a * c - b * b), -1e12, 1e12)

    rhs0 = sum(h0[:, i, None] * od_c[i] for i in range(3))  # (N, P)
    rhs1 = sum(h1[:, i, None] * od_c[i] for i in range(3))
    c0 = ((c * inv_det)[:, None] * rhs0) - ((b * inv_det)[:, None] * rhs1)
    c1 = ((a * inv_det)[:, None] * rhs1) - ((b * inv_det)[:, None] * rhs0)
    return c0, c1


# Rows above this stream from HBM (O(chunk) VMEM, any size); at or below,
# the VMEM-resident radix kernel wins (fewer sweeps on sync-bound sizes).
# 2M elems keeps the resident kernel's peak well under half the 128 MB
# physical VMEM — the round-2 "127.6 of 128 MB knife edge" is retired:
# 2048² rows (4.19M) now stream. Measured ladder top: **16384² (268 M
# px/row, 3 445–3 453 MPix/s, MAE 0.0129)** on a v5e — claims stop there.
# The eventual row-size cap is HBM (in + out + the streaming kernel's
# 8 B/px descent key cache ≈ 14 B/px uint8 → ~1.1 G px per 16 GB chip by
# arithmetic, NOT measured), not VMEM; expect ~10–15 min one-time XLA
# compiles per new row shape in the 12k–16k tier.
STREAM_MIN_ELEMS = 2_097_152

# Gate for the streaming mega kernel (kernels/macenko_stream.py) on rows
# past the resident mega's budget. Measured on v5e (benchmarks/bench_stream_mega,
# 2×3×2048×2048 uint8): streaming mega 4.54 ms/batch (1 847 MPix/s) vs
# staged jnp+streaming-select 6.15 ms (1 363 MPix/s), both MAE 0.009 vs
# the numpy oracle and within 1 grey level of each other — the kernel
# earned the default slot (project invariant: measured faster in context).
# With the descent key cache it reaches 2 648 MPix/s at 2048² / 2 450 at
# 4096² (same MAE; bit-exact vs the uncached form).
STREAM_MEGA_ENABLED = True

# Tiny-row / large-batch escape hatch at the ladder's BOTTOM end: the mega
# kernel runs one image per grid step, so at tiny rows its per-image fixed
# cost (~7.7 µs at 64² — descent syncs + scalar eigh + pass setup)
# dominates, while the jnp path is batch-parallel across the whole XLA
# program. Measured on v5e at 64² (MPix/s, jnp vs pallas): batch 256 the
# jnp path wins EVERY measurement, both dtypes (uint8 652–1273 vs ~504;
# f32 1174 vs 500; grid harness 2 008 vs 529), as does 1024 (1098 vs
# 518). Below 256 it is data-dependent: at batch 128 repeats across data
# seeds swing 217–1146 uint8 / 311–714 f32 around pallas's stable ~550
# (the jnp refinement's depth varies with the pixel distribution), and at
# 32–64 batch pallas wins outright. At ≥72² jnp swings 297–1462 between
# processes. The route therefore triggers only on the cell that never
# lost: rows ≤ 64² AND batch ≥ 256.
TINY_JNP_MAX_ELEMS = 4096
TINY_JNP_MIN_BATCH = 256


def _select_route(p: int, use_pallas: bool) -> str:
    if not use_pallas:
        return "jnp"
    return "resident" if p <= STREAM_MIN_ELEMS else "stream"


def _stream_select(xs, ranks2d, n_valid):
    """Streaming nearest-rank selection with caller-known init: the row
    min/max/count replace the kernel's range-discovery sweep (they fuse
    into the producer's pass under XLA). ``xs`` carries +inf sentinels."""
    from stainx_tpu.kernels.selection_stream import kth_smallest_streaming

    init = (
        jnp.min(xs, axis=1),  # +inf sentinels never win a min unless empty
        jnp.max(jnp.where(xs != jnp.inf, xs, -jnp.inf), axis=1),
        n_valid.astype(jnp.int32),
    )
    return kth_smallest_streaming(xs, ranks2d, init=init)


def _stain_separate(
    od_c, mask: jnp.ndarray, cnt: jnp.ndarray, proj_dtype,
    levels: int = _MAX_LEVELS, use_pallas: bool = False,
):
    """Shared fit/transform core: masked covariance → stain plane → φ
    percentile extremes → ordered H/E matrix. Returns (HE, evecs)."""
    weights = mask.astype(jnp.float32)
    cov = _masked_cov_two_pass(od_c, weights, cnt.astype(jnp.float32))
    evecs = eigh3_top2(cov)  # (N, 3, 2)

    t0, t1 = _project_plane(od_c, evecs, proj_dtype)
    phi = jnp.arctan2(t1, t0)  # (N, P) f32

    n = phi.shape[0]
    rank_lo = nearest_rank_index(ALPHA, cnt)
    rank_hi = nearest_rank_index(100 - ALPHA, cnt)

    route = _select_route(phi.shape[-1], use_pallas)
    if route == "resident":
        # One VMEM-resident radix-select pass per row yields BOTH φ
        # percentiles (K=2) — the data is read from HBM exactly once.
        from stainx_tpu.kernels.selection import kth_smallest_pallas

        xs = jnp.where(mask, phi, jnp.inf)
        vals = kth_smallest_pallas(xs, jnp.stack([rank_lo, rank_hi], axis=1))
        min_phi, max_phi = vals[:, 0], vals[:, 1]
    elif route == "stream":
        xs = jnp.where(mask, phi, jnp.inf)
        vals = _stream_select(xs, jnp.stack([rank_lo, rank_hi], axis=1), cnt)
        min_phi, max_phi = vals[:, 0], vals[:, 1]
    else:
        # jnp path: both percentiles in ONE selection instance (ranks
        # stacked along the batch axis) to halve the compiled code.
        vals = kth_smallest(
            jnp.concatenate([phi, phi], axis=0),
            jnp.concatenate([rank_lo, rank_hi]),
            jnp.concatenate([mask, mask], axis=0),
            levels=levels,
            cnt=jnp.concatenate([cnt, cnt]),
        )
        min_phi, max_phi = vals[:n], vals[n:]

    return _he_from_phi_extremes(evecs, min_phi, max_phi), evecs


def rescale_and_reconstruct(
    c0, c1, max_c0, max_c1, target_max_conc, stain_matrix, recon_dtype=jnp.float32
):
    """maxC guard + concentration rescale + Beer–Lambert reconstruction —
    the transform tail shared by the jnp pipeline and the pixel-sharded
    transform (``parallel/distributed.py``). ``c0``/``c1`` are (N, P)
    concentration planes, ``max_c*`` their (N,) 99th percentiles; returns
    clipped RGB (N, 3, P) f32 in [0, 255].

    maxC floor: a uniform (background) tile yields all-zero concentrations
    and maxC == 0 — tmc/0 = inf then 0·inf = NaN. The guard is
    SIGN-PRESERVING (|maxC| test, not a max clamp): a degenerate-but-real
    tile (pen ink / control marker) can have a NEGATIVE 99th-percentile
    concentration, and the reference divides through it unchanged
    (``torch_backend.py:452``) — clamping it to +1e-30 produced a ~1e30
    scale and all-0/255 garbage (round-2 advisor finding). Division bits
    depend only on operand values, so well-posed outputs are untouched.
    """
    tmc = target_max_conc.reshape(-1).astype(jnp.float32)
    safe_c0 = jnp.where(jnp.abs(max_c0) > 1e-30, max_c0, 1e-30)
    safe_c1 = jnp.where(jnp.abs(max_c1) > 1e-30, max_c1, 1e-30)
    cn0 = (c0 * (tmc[0] / safe_c0)[:, None]).astype(recon_dtype)
    cn1 = (c1 * (tmc[1] / safe_c1)[:, None]).astype(recon_dtype)

    stain = stain_matrix.astype(jnp.float32)
    recon = [
        (
            cn0 * stain[i, 0].astype(recon_dtype) + cn1 * stain[i, 1].astype(recon_dtype)
        ).astype(jnp.float32)
        for i in range(3)
    ]
    od_recon = jnp.stack(recon, axis=1)  # (N, 3, P)
    return jnp.clip(IO * jnp.exp(-od_recon), 0.0, 255.0)


def _macenko_transform_fused(images, stain_matrix, target_max_conc, seed_state=None):
    """Fully-fused Pallas hot path. Default: the single mega-kernel — the
    ENTIRE per-image transform (moments, analytic eigh, φ/concentration
    radix selection, reconstruction) in one VMEM residency; HBM traffic is
    one read of the input and one write of the output
    (:func:`stainx_tpu.kernels.macenko_fused.macenko_transform_mega`).
    (A chunk-staged two-phase variant — params kernel + XLA reconstruction —
    was built and measured 10× slower at 1024²: unrolled chunk loops
    serialize the descent's bucket counts; the fix was raising XLA's
    default 16 MB scoped-VMEM cap so this kernel compiles at 1024².)"""
    from stainx_tpu.kernels.macenko_fused import macenko_transform_mega

    return macenko_transform_mega(images, stain_matrix, target_max_conc, seed_state=seed_state)


@partial(jax.jit, static_argnames=("precision", "use_pallas"))
def macenko_transform(
    images: jnp.ndarray,
    stain_matrix: jnp.ndarray,
    target_max_conc: jnp.ndarray,
    precision: str = "stable",
    use_pallas: bool = False,
    seed_state: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Normalize a batch to the fitted stain matrix / max concentrations.

    Matches ``MacenkoTorch.transform`` + ``_process_single_image_torch``
    (``torch_backend.py:399-461,521-560``) with the CUDA wrapper's batched
    masked scheme. Output range [0, 255] in the input dtype (no Io cap —
    torchstain parity, ``docs/changelog.md:61``).

    ``seed_state`` (optional, (7,) int32 — ``kernels.macenko_fused.
    seed_state_init``): cross-CALL descent seeding. When given, the return
    is ALWAYS ``(out, new_state)`` — thread the state through consecutive
    calls (the :class:`~stainx_tpu.normalizers.Macenko` normalizer does
    this automatically on the pallas backend). Bit-exact: seeds only
    place probe cuts. Routes without a kernel (jnp fallback, tiny-row
    route, unsupported dtypes) pass the state through unchanged — the
    per-pair miss-streak cutout absorbs any staleness later.
    """
    n_imgs, _, h_img, w_img = images.shape
    if n_imgs >= TINY_JNP_MIN_BATCH and h_img * w_img <= TINY_JNP_MAX_ELEMS:
        # Tiny rows at large batch: the batch-parallel jnp path beats the
        # per-image mega-kernel grid (see TINY_JNP_* above).
        use_pallas = False
    if use_pallas:
        from stainx_tpu.kernels.macenko_fused import fused_row_budget_ok

        if fused_row_budget_ok(images.shape, images.dtype):
            # Serves BOTH precision modes: the fused path is exact and
            # faster than the jnp fast path, so "fast" has nothing to trade
            # away here (precision still selects dtype policy on fallbacks).
            return _macenko_transform_fused(
                images, stain_matrix, target_max_conc, seed_state=seed_state
            )
        if STREAM_MEGA_ENABLED and images.dtype in (jnp.uint8, jnp.float32):
            # EVERY supported-dtype row past the resident mega's budget runs
            # the STREAMING mega kernel: whole transform per image, bytes
            # stay in HBM, chunked key-cached descents
            # (kernels/macenko_stream.py). The former middle "gap tier"
            # (uint8 1.31–2M px, f32 0.5–2M px) went to the staged jnp
            # path; racing both on v5e retired it — streaming wins the
            # whole gap: uint8 1280² 2 447 vs 1 975, uint8 1408² 1 852 vs
            # 1 693, f32 1024² 2 186 vs 2 067, f32 768² 1 493 vs 1 277
            # MPix/s (benchmarks/bench_stream_mega --dtype/--size).
            from stainx_tpu.kernels.macenko_stream import macenko_transform_stream

            return macenko_transform_stream(
                images, stain_matrix, target_max_conc, seed_state=seed_state
            )

    original_dtype = images.dtype
    was_uint8 = original_dtype == jnp.uint8

    images_float = color.normalize_to_float(images)
    n, c, h, w = images_float.shape
    p = h * w

    od = optical_density(images_float).reshape(n, 3, p)
    od_c = (od[:, 0], od[:, 1], od[:, 2])  # channel planes (N, P)

    # β-mask + all-pixels fallback when < 3 pixels survive (macenko.cu:105-110).
    od_min = jnp.minimum(jnp.minimum(od_c[0], od_c[1]), od_c[2])
    mask = od_min >= BETA
    cnt = jnp.sum(mask, axis=-1)  # (N,) int
    use_all = cnt < 3
    eff_mask = mask | use_all[:, None]
    cnt_eff = jnp.where(use_all, p, cnt)

    # Fast mode trades the below-ulp percentile refinement for a 16^4-bin
    # one (value error < range·6e-5 — ~0.01 grey on the output, far inside
    # the reference's own fast-mode MAE budget) and runs the reconstruction
    # in bf16 (the CUDA fast path's fp16-reconstruct role, macenko.cu:116-191).
    # The stain-plane projection stays f32: bf16 there quantizes the φ
    # angles whose percentiles pick the stain vectors — measured MAE 0.37
    # vs the reference oracle (over the 0.35 budget) for zero bandwidth win,
    # since the projection fuses into the selection's first pass anyway.
    fast = precision == "fast"
    recon_dtype = jnp.bfloat16 if fast else jnp.float32
    # _MAX_LEVELS = key-space exact bound (percentile.py); 4 caps fast's depth
    levels = 4 if fast else _MAX_LEVELS
    he, _ = _stain_separate(
        od_c, eff_mask, cnt_eff, jnp.float32, levels=levels, use_pallas=use_pallas
    )
    c0, c1 = _concentrations_2x2(he, od_c)  # (N, P) each

    # 99th percentile of each concentration over ALL pixels (static rank;
    # macenko.cu:247-251 uses cnt_all = P) — C0/C1 stacked into one
    # selection instance.
    idx99 = static_nearest_rank_index(99, p)
    c_stack = jnp.concatenate([c0, c1], axis=0)
    route = _select_route(p, use_pallas)
    if route == "resident":
        from stainx_tpu.kernels.selection import kth_smallest_pallas

        max_c = kth_smallest_pallas(c_stack, jnp.full((2 * n, 1), idx99, jnp.int32))[:, 0]
    elif route == "stream":
        max_c = _stream_select(
            c_stack,
            jnp.full((2 * n, 1), idx99, jnp.int32),
            jnp.full((2 * n,), p, jnp.int32),
        )[:, 0]
    else:
        max_c = kth_smallest(c_stack, jnp.full((2 * n,), idx99, jnp.int32), levels=levels)
    max_c0, max_c1 = max_c[:n], max_c[n:]

    rgb = rescale_and_reconstruct(
        c0, c1, max_c0, max_c1, target_max_conc, stain_matrix, recon_dtype
    ).reshape(n, c, h, w)
    out = color.preserve_dtype(rgb, original_dtype, was_uint8, result_in_0_255_range=True)
    # Non-kernel route with a carried state: pass it through unchanged so
    # callers can thread unconditionally.
    return (out, seed_state) if seed_state is not None else out


@partial(jax.jit, static_argnames=("use_pallas",))
def macenko_fit(
    images: jnp.ndarray, use_pallas: bool = False, seed_state: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fit the reference stain matrix (3, 2) and max concentrations (2,).

    Matches ``compute_reference_stain_matrix_torch``
    (``torch_backend.py:463-519``): pixels of all N images pooled, β-filter
    **without** the <3 fallback, covariance over filtered pixels only,
    percentiles of φ over filtered pixels, concentrations and their 99th
    percentile over ALL pooled pixels. Fully jittable so batch mode
    (fit-per-forward) stays on-device.

    Pallas routing mirrors the transform's size ladder: pooled rows
    within the resident VMEM budget run the one-kernel fused fit
    (:func:`...kernels.macenko_fused.macenko_fit_mega` — the batch-mode
    fit-per-forward hot path); larger pools run the streaming fit
    (:func:`...kernels.macenko_stream.macenko_fit_stream`). Unsupported
    dtypes fall through to the jnp pipeline below.

    ``seed_state`` (optional, (7,) int32): cross-CALL descent seeding —
    batch mode re-fits every forward on same-distribution batches, so
    the previous fit's terminal keys place this fit's probe cuts
    (bit-exact). When given, the return is ALWAYS
    ``(he, maxc, new_state)``; non-kernel routes pass it through.
    """
    if use_pallas:
        from stainx_tpu.kernels.macenko_fused import fused_fit_budget_ok, macenko_fit_mega

        if fused_fit_budget_ok(images.shape, images.dtype):
            return macenko_fit_mega(images, seed_state=seed_state)
        if STREAM_MEGA_ENABLED and images.dtype in (jnp.uint8, jnp.float32):
            from stainx_tpu.kernels.macenko_stream import macenko_fit_stream

            return macenko_fit_stream(images, seed_state=seed_state)

    images_float = color.normalize_to_float(images)
    n, _, h, w = images_float.shape
    ptot = n * h * w

    od = optical_density(images_float)
    od_c = tuple(od[:, i].reshape(1, ptot) for i in range(3))  # pooled planes

    od_min = jnp.minimum(jnp.minimum(od_c[0], od_c[1]), od_c[2])
    mask = od_min >= BETA  # no fallback at fit (torch_backend.py:483-485)
    cnt = jnp.sum(mask, axis=-1)

    he, _ = _stain_separate(od_c, mask, cnt, jnp.float32, use_pallas=use_pallas)
    c0, c1 = _concentrations_2x2(he, od_c)

    idx99 = static_nearest_rank_index(99, ptot)
    c_stack = jnp.concatenate([c0, c1], axis=0)
    route = _select_route(ptot, use_pallas)
    if route == "resident":
        from stainx_tpu.kernels.selection import kth_smallest_pallas

        max_conc = kth_smallest_pallas(c_stack, jnp.full((2, 1), idx99, jnp.int32))[:, 0]
    elif route == "stream":
        max_conc = _stream_select(
            c_stack,
            jnp.full((2, 1), idx99, jnp.int32),
            jnp.full((2,), ptot, jnp.int32),
        )[:, 0]
    else:
        max_conc = kth_smallest(c_stack, jnp.full((2,), idx99, jnp.int32))
    if seed_state is not None:  # pass-through on the jnp route
        return he[0], max_conc, seed_state
    return he[0], max_conc
