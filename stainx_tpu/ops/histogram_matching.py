"""Histogram matching — per-channel 256-bin CDF matching, pure jittable.

Semantics follow the reference's ``HistogramMatchingTorch``
(``src/stainx/backends/torch_backend.py:134-301``): uint8 quantization,
per-channel 256-bin histograms, vectorized ``searchsorted`` into the
reference CDF with linear interpolation, edge pinning to bins 0/255, and a
256-entry LUT gather. Histogram counts are additive, so the distributed
batch-mode fit is an exact cross-chip ``psum`` (SURVEY §2.3).

Hot ops ride the MXU via a nibble decomposition (round-2): a byte is
``16·hi + lo``, so the 256-bin histogram is the outer product of the two
16-wide nibble one-hots — one (16, P)×(P, 16) matmul — and the 256-entry
LUT lookup is the lo-one-hot × (16, 16)-reshaped-LUT matmul followed by a
16-way hi-select. Both are EXACT: one-hot rows have a single 1, so each
matmul output is a plain table entry (``Precision.HIGHEST`` keeps the LUT
values f32 through the MXU; histogram counts accumulate exactly below
2²⁴ per ≤2²²-pixel chunk, summed in int32 across chunks). Measured on
v5e at 64×512²: histogram 816 → 113 ms, LUT apply 871 → 10.5 ms vs the
fused compare-select forms (the VPU Θ(bins)/element floor round 1
accepted). A Pallas tiled-accumulator kernel
(``stainx_tpu.kernels.histogram``, counterpart of the reference's
shared-memory-atomic CUDA kernel ``csrc/histogram_matching.cu:49-95``)
remains as the tested non-MXU alternative.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stainx_tpu.ops import color


def _to_channels_first(images: jnp.ndarray, channel_axis: int) -> tuple[jnp.ndarray, bool]:
    """NHWC → NCHW when channel_axis says channels-last (``torch_backend.py:181-186``);
    shares the layout rule with :func:`stainx_tpu.ops.color._nchw`."""
    return color._nchw(images, channel_axis)


_HIST_CHUNK = 1 << 22  # per-chunk counts stay < 2²⁴ (f32-exact integers)


def _a16():
    # Trace-time constant (must be fresh per trace — caching leaks tracers).
    return jnp.arange(16, dtype=jnp.int32)


def histogram_256(values_u8: jnp.ndarray) -> jnp.ndarray:
    """Per-channel 256-bin counts. ``values_u8``: (C, P) uint8 → (C, 256) f32.

    Nibble outer product on the MXU: ``count[16·a+b] = Σ_p [hi_p=a]·[lo_p=b]``
    — one (16, P)×(P, 16) matmul per channel instead of 256 VPU
    compare-reduces (7× measured). Exact: 0/1 bf16 products are exact, each
    chunk's f32 accumulation stays below 2²⁴, and chunks sum in int32."""
    c, p = values_u8.shape
    v = values_u8.astype(jnp.int32)
    pad = (-p) % _HIST_CHUNK if p > _HIST_CHUNK else 0
    if pad:
        v = jnp.pad(v, ((0, 0), (0, pad)))  # pad value 0 → bin 0, corrected below
    nch = max(v.shape[1] // _HIST_CHUNK, 1)
    v = v.reshape(c, nch, -1)
    a16 = _a16()
    hi = ((v >> 4)[..., None] == a16).astype(jnp.bfloat16)
    lo = ((v & 15)[..., None] == a16).astype(jnp.bfloat16)
    cnt = jnp.einsum("cnpa,cnpb->cnab", hi, lo, preferred_element_type=jnp.float32)
    cnt = jnp.sum(cnt.astype(jnp.int32), axis=1).reshape(c, 256)
    # Pad correction in the INTEGER domain, before the f32 cast: subtracting
    # after the cast makes bin 0 pad-dependent past 2²⁴ pixels (f32(C+pad)−pad
    # rounds differently than f32(C)) — the same finding class
    # histogram_256_mxu was fixed for (round-3 review).
    if pad:
        cnt = cnt.at[:, 0].add(jnp.int32(-pad))
    return cnt.astype(jnp.float32)


def _histogram_nchw(images_u8: jnp.ndarray, use_pallas: bool) -> jnp.ndarray:
    """(N, C, H, W) uint8 → (C, 256) f32 counts, layout-aware dispatch.

    The pallas path reads NCHW directly (its grid walks the batch axis) —
    the XLA path's channel transpose alone costs more HBM time than the
    fused kernel's entire histogram (measured on v5e, round 3)."""
    n, c, h, w = images_u8.shape
    if use_pallas:
        from stainx_tpu.kernels.histogram import histogram_256_mxu

        return histogram_256_mxu(images_u8.reshape(n, c, h * w))
    flat = jnp.transpose(images_u8, (1, 0, 2, 3)).reshape(c, n * h * w)
    return histogram_256(flat)


@partial(jax.jit, static_argnames=("channel_axis", "use_pallas"))
def hm_fit(images: jnp.ndarray, channel_axis: int = 1, use_pallas: bool = False) -> jnp.ndarray:
    """Reference histograms, (C, 256) float32, rows normalized to sum 1.

    Matches ``compute_reference_histograms_torch`` (``torch_backend.py:143-179``):
    uint8 quantization then per-channel normalized 256-bin histogram
    (``counts / (counts.sum() + 1e-8)``, ``torch_backend.py:139-141``).
    """
    images_cf, _ = _to_channels_first(images, channel_axis)
    images_u8, _ = color.images_to_uint8(images_cf)
    counts = _histogram_nchw(images_u8, use_pallas)
    return counts / (jnp.sum(counts, axis=1, keepdims=True) + 1e-8)


def hm_build_lut(source_counts: jnp.ndarray, ref_hist: jnp.ndarray, num_pixels: float) -> jnp.ndarray:
    """Build the per-channel 256-entry lookup table.

    ``source_counts``: (C, 256) raw counts; ``ref_hist``: (C, 256) reference
    histogram (any normalization). Mirrors the vectorized searchsorted +
    interpolation + edge pinning of ``torch_backend.py:254-281``.
    """
    source_cdf = jnp.cumsum(source_counts / (num_pixels + 1e-8), axis=1)  # (C, 256)
    ref_norm = ref_hist / (jnp.sum(ref_hist, axis=1, keepdims=True) + 1e-8)
    ref_quantiles = jnp.cumsum(ref_norm, axis=1)  # (C, 256)

    indices = jax.vmap(lambda rq, sc: jnp.searchsorted(rq, sc, side="left"))(
        ref_quantiles, source_cdf
    )
    indices = jnp.clip(indices, 1, 255)

    q_left = jnp.take_along_axis(ref_quantiles, indices - 1, axis=1)
    q_right = jnp.take_along_axis(ref_quantiles, indices, axis=1)
    q_diff = q_right - q_left
    alpha = jnp.where(q_diff > 1e-10, (source_cdf - q_left) / q_diff, 0.0)

    # ref_values = arange(256), so interp = (idx-1) + alpha·((idx) - (idx-1)).
    lut = (indices - 1).astype(jnp.float32) + alpha

    # Below-min pin with an ulp-slack compare: under SELF-matching (fit ==
    # transform data) the exact values tie (source_cdf[0] == rq[0] in real
    # arithmetic), so the raw f32 `<=` is decided by fusion-dependent
    # rounding of two independently-computed quotients — two compilations
    # of this same function can disagree, the same cross-compilation
    # hazard the structural above-max pin fixed (round-3 review finding).
    # Slack width matters when the reference quantiles PLATEAU after rq0
    # (empty ref bins): there the pin-vs-interpolate flip moves outputs by
    # the full plateau width (up to 100+ greys), so over-pinning is as bad
    # as the hazard itself (round-3 review repro: a cdf 4.2 ulps above rq0
    # that the reference resolves to lut≈99 was pinned to 0 by a 1e-6
    # slack). The tie noise to absorb is the fusion-path difference of two
    # quotients of identical operands — a/b vs a·(1/b) is ≤ ~1.5 ulps per
    # side, ≤ 3 ulps apparent separation at an exact tie — so THREE ulps
    # (3·2⁻²³ relative) covers every rounding path while leaving every
    # genuinely-resolved f32 compare (≥ 4 ulps, the review repro's width)
    # to the exact relationship. Exact differences inside the slack
    # (≲ 2-pixel mass at 8M px) are pinned; the reference's own f32
    # cannot reliably resolve those either (same deviation class as the
    # structural above-max note below).
    rq0 = ref_quantiles[:, 0:1]
    below_min = source_cdf <= rq0 * (1.0 + 3.0 * 2.0**-23)
    # Above-max pinning is decided STRUCTURALLY, not by the float compare
    # the reference writes (``source_cdf >= ref_quantiles[-1]``): in exact
    # arithmetic the CDF at the last occupied source bin is cum/total = 1,
    # strictly above ref_q_max = S/(S+1e-8) < 1 — the pin always fires
    # from that bin up. In f32 the cumsum-of-quotients rounds either side
    # of 1.0 by an ulp DEPENDING ON FUSION CONTEXT, and when the matched
    # reference quantile sits far below 255 the flip is a 100+-grey output
    # change on the source-max pixels (caught by the pixel-sharded odd-H
    # parity test, where two compilations of this same function
    # disagreed). The structural form is pure OCCUPANCY — bin b pins iff
    # no occupied bin lies strictly after it — a reversed cumulative count
    # of the ≤256 occupied bins: exact at ANY pixel count (an integer
    # cumsum of pixel counts would wrap past 2³¹, and a separately
    # f32-rounded total can land an ulp above the exact cumsum and
    # suppress the pin — review findings). Exact-math deviation class
    # (round-3 review measurement): the exact compare at the last occupied
    # source bin is cdf = N/(N+1e-8) vs ref_q_max = S/(S+1e-8), so exact
    # reference math pins only when N ≥ S (cdf monotone in the count) —
    # with raw-count ref_hist (the docstring permits any normalization)
    # and N < S, exact math interpolates where this form pins (measured
    # 3–22 greys on ~10³–10⁵-px sources vs ~10⁶-count refs). The
    # reference's own f32 cannot resolve that separation (≤ 1e-8, far
    # under ulp(1.0)) — it lands on the pin side — so the structural form
    # matches the reference's realizable f32 behavior, not its exact-math
    # idealization.
    occ = (source_counts > 0).astype(jnp.int32)
    occ_at_or_after = jnp.cumsum(occ[:, ::-1], axis=1)[:, ::-1]
    # Two degenerate-channel gates keep the structural form equal to the
    # reference's compare (round-3 review finding):
    # - an ALL-EMPTY source channel has "nothing occupied after" every bin
    #   vacuously; the reference's cdf=0 row fails `cdf >= ref_q_max`
    #   everywhere, so require the channel to have an occupied bin;
    # - an ALL-EMPTY reference channel makes ref_q_max = 0, so the
    #   reference pins EVERY bin to 255 (`cdf >= 0`; above-max is applied
    #   last and wins) regardless of source occupancy.
    has_occ = occ_at_or_after[:, 0:1] > 0
    ref_empty = ref_quantiles[:, -1:] <= 0.0
    above_max = (((occ_at_or_after - occ) == 0) & has_occ) | ref_empty
    lut = jnp.where(below_min, 0.0, lut)
    lut = jnp.where(above_max, 255.0, lut)
    return jnp.clip(lut, 0.0, 255.0)


def _apply_lut(images_u8: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel 256-entry LUT application WITHOUT a gather.

    XLA's TPU gather lowers to a serialized loop (~10× slower than the
    arithmetic floor), and a 256-wide compare-select sum sits on the VPU
    floor (measured 871 ms at 64×512²). Instead the byte splits into
    nibbles: ``lut[v] = lut2d[hi, lo]`` — the lo-one-hot (P, 16) matmuls
    against the (16, 16)-reshaped LUT on the MXU (``Precision.HIGHEST``:
    f32 one-hot rows select f32 table entries EXACTLY — each output is a
    single product, no accumulation), then a 16-way hi-select finishes.
    Measured 10.5 ms — 83× the compare-select form, bit-identical output.

    images_u8: (N, C, H, W) uint8; lut: (C, 256) f32 → (N, C, H, W) f32.
    """
    n, c, h, w = images_u8.shape
    x = jnp.transpose(images_u8, (1, 0, 2, 3)).reshape(c, -1).astype(jnp.int32)
    a16 = _a16()
    hi = (x >> 4)[..., None] == a16  # (C, P, 16) bool
    lo = ((x & 15)[..., None] == a16).astype(jnp.float32)
    lut2d = lut.reshape(c, 16, 16)  # [hi, lo]
    m = jnp.einsum("cpb,cab->cpa", lo, lut2d, precision=jax.lax.Precision.HIGHEST)
    out = jnp.sum(jnp.where(hi, m, 0.0), axis=-1)  # (C, P)
    return jnp.transpose(out.reshape(c, n, h, w), (1, 0, 2, 3))


@partial(jax.jit, static_argnames=("channel_axis", "use_pallas"))
def hm_transform(
    images: jnp.ndarray,
    ref_histograms: jnp.ndarray,
    channel_axis: int = 1,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Match each channel's histogram to the fitted reference histograms.

    Mirrors ``HistogramMatchingTorch.transform`` (``torch_backend.py:194-301``);
    output layout and dtype match the input.
    """
    original_dtype = images.dtype
    images_cf, needs_permute = _to_channels_first(images, channel_axis)
    was_uint8 = images_cf.dtype == jnp.uint8

    images_u8, needs_scale_back = color.images_to_uint8(images_cf)
    n, c, h, w = images_u8.shape

    source_counts = _histogram_nchw(images_u8, use_pallas)
    lut = hm_build_lut(source_counts, ref_histograms.astype(jnp.float32), float(n * h * w))

    if use_pallas and was_uint8:
        # uint8 in / uint8 out: the fused kernel emits the final bytes
        # directly (⌊lut[v]⌋ == uint8(clip(lut[v])) for LUT values in
        # [0, 255]), skipping the XLA clip + dtype-restore passes.
        from stainx_tpu.kernels.histogram import apply_lut_u8_mxu

        result = apply_lut_u8_mxu(images_u8.reshape(n, c, h * w), lut).reshape(n, c, h, w)
        if needs_permute:
            result = jnp.transpose(result, (0, 2, 3, 1))
        return result

    matched = _apply_lut(images_u8, lut)

    if needs_scale_back:
        matched = jnp.clip(matched / 255.0, 0.0, 1.0)
    else:
        matched = jnp.clip(matched, 0.0, 255.0)

    result = color.preserve_dtype(
        matched, original_dtype, was_uint8, result_in_0_255_range=not needs_scale_back
    )
    if needs_permute:
        result = jnp.transpose(result, (0, 2, 3, 1))
    return result
