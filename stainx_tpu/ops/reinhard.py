"""Reinhard stain normalization — pure jittable pipeline.

Semantics match the reference's ``ReinhardTorch``
(``src/stainx/backends/torch_backend.py:304-355``): batch-global LAB
mean/std (Bessel-corrected), z-score vs source stats with ``+1e-8`` eps,
rescale to reference stats, LAB→RGB, clamp, dtype restore. The reference's
CUDA path (``csrc/reinhard.cu``) exists only because ATen could not fuse
this chain; here XLA fuses the RGB→LAB→affine→RGB chain into one pass (a
Pallas kernel backs it on TPU via :mod:`stainx_tpu.kernels`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stainx_tpu.ops import color


# Moments accumulate about this fixed shift (the middle of the 8-bit LAB
# encoding, where all three channels cluster): ``Σx²−(Σx)²/n`` on raw values
# cancels catastrophically in f32 for low-variance channels (a 32² tile's
# a-channel came out 0.65% wrong); centering makes the surviving term the
# variance itself. Center choice does not change mean/std algebraically.
LAB_MOMENT_CENTER = 128.0


def lab_moments(
    images: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    valid_rows: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-channel CENTERED LAB pixel count / sum / sum-of-squares — the
    additive statistics that cross-chip ``psum`` reduces losslessly for
    distributed batch-mode fitting (SURVEY §2.3). Consume with
    :func:`moments_to_mean_std`, which undoes the centering.

    ``weights`` (optional, (N,) 0/1 float) marks which batch entries are
    real — padded rows (uneven-batch sharding) contribute nothing.
    ``valid_rows`` (optional, (H,) bool) likewise excludes zero-padded
    pixel ROWS (pixel-sharded fits pad H to the mesh axis).

    Returns ``(count, sum, sumsq)`` with shapes ``(), (3,), (3,)``.
    """
    lab = color.rgb_to_lab(color.normalize_to_float(images), channel_axis=1) - LAB_MOMENT_CENTER
    if weights is None and valid_rows is None:
        n = jnp.asarray(lab.shape[0] * lab.shape[2] * lab.shape[3], jnp.float32)
        s = jnp.sum(lab, axis=(0, 2, 3))
        sq = jnp.sum(lab * lab, axis=(0, 2, 3))
        return n, s, sq
    # Elementwise weighted combine (NOT einsum: TPU f32 contractions
    # default to bf16-input MXU passes — CLAUDE.md landmine). The
    # batch-row × pixel-row weight stays FACTORED as an (N, 1, H, 1)
    # broadcast: no (N, 3, H, W) weight plane is materialized and the
    # count is an exact product of scalar factor sums (a full-slab f32
    # sum of ones rounds past 2²⁴ local pixels).
    rw = (
        weights.astype(jnp.float32)
        if weights is not None
        else jnp.ones((lab.shape[0],), jnp.float32)
    )
    rv = (
        valid_rows.astype(jnp.float32)
        if valid_rows is not None
        else jnp.ones((lab.shape[2],), jnp.float32)
    )
    wpx = rw[:, None, None, None] * rv[None, None, :, None]  # (N, 1, H, 1)
    n = jnp.sum(rw) * jnp.sum(rv) * jnp.float32(lab.shape[3])
    s = jnp.sum(lab * wpx, axis=(0, 2, 3))
    sq = jnp.sum(lab * lab * wpx, axis=(0, 2, 3))
    return n, s, sq


def moments_to_mean_std(n, s, sq) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bessel-corrected mean/std from :func:`lab_moments`-centered additive
    moments (matches ``torch.std`` which defaults to unbiased,
    ``torch_backend.py:321``)."""
    mean_c = s / n
    var = jnp.maximum(sq - n * mean_c * mean_c, 0.0) / jnp.maximum(n - 1.0, 1.0)
    return mean_c + LAB_MOMENT_CENTER, jnp.sqrt(var)


@jax.jit
def reinhard_fit(images: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference LAB mean/std over the whole batch, shapes ``(3,), (3,)``.

    Mirrors ``compute_reference_mean_std_torch`` (``torch_backend.py:308-323``).
    """
    images_float = color.normalize_to_float(images)
    lab = color.rgb_to_lab(images_float, channel_axis=1)
    mean = jnp.mean(lab, axis=(0, 2, 3))
    std = jnp.std(lab, axis=(0, 2, 3), ddof=1)
    return mean, std


def _reinhard_apply(lab, lab_mean, lab_std, reference_mean, reference_std):
    lab_norm = ((lab - lab_mean) / (lab_std + 1e-8)) * reference_std + reference_mean
    return jnp.clip(color.lab_to_rgb(lab_norm, channel_axis=1), 0.0, 1.0)


from functools import partial


@partial(jax.jit, static_argnames=("use_pallas",))
def reinhard_transform(
    images: jnp.ndarray,
    reference_mean: jnp.ndarray,
    reference_std: jnp.ndarray,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Transform a batch to the fitted reference statistics.

    Source statistics are **batch-global** (mean/std over N, H, W at once),
    exactly like the reference (``torch_backend.py:344-349``). Output dtype
    matches input (uint8 → [0,255] uint8; float → [0,1] float). With
    ``use_pallas=True`` BOTH passes run as fused VMEM kernels
    (:mod:`stainx_tpu.kernels.reinhard_fused`): the source stats come from
    a moments kernel reading the raw bytes. Measured at 64×512² uint8 on
    v5e the kernels still LOSE to XLA (3.44 vs 3.10 ms — XLA never
    materializes LAB either, and the whole chain is VPU-transcendental-
    bound; see docs/benchmarks.md "Reinhard floor"), so the product
    default stays the XLA path and the kernels remain the measured
    alternative.
    """
    original_dtype = images.dtype
    was_uint8 = original_dtype == jnp.uint8

    if use_pallas and images.dtype in (jnp.uint8, jnp.float32):
        # Other float dtypes (bf16/f16/f64) stay on the XLA path: the
        # kernel stores f32 into an out_ref of the input dtype.
        from stainx_tpu.kernels.reinhard_fused import (
            reinhard_apply_pallas,
            reinhard_moments_pallas,
        )

        s1, s2 = reinhard_moments_pallas(images)
        n_px = jnp.float32(images.shape[0] * images.shape[2] * images.shape[3])
        lab_mean, lab_std = moments_to_mean_std(n_px, s1, s2)
        return reinhard_apply_pallas(
            images,
            lab_mean.reshape(3),
            lab_std.reshape(3),
            reference_mean.reshape(3),
            reference_std.reshape(3),
        )

    images_float = color.normalize_to_float(images)
    lab = color.rgb_to_lab(images_float, channel_axis=1)
    lab_mean = jnp.mean(lab, axis=(0, 2, 3), keepdims=True)
    lab_std = jnp.std(lab, axis=(0, 2, 3), ddof=1, keepdims=True)

    rgb = _reinhard_apply(
        lab,
        lab_mean,
        lab_std,
        reference_mean.reshape(1, 3, 1, 1),
        reference_std.reshape(1, 3, 1, 1),
    )
    return color.preserve_dtype(rgb, original_dtype, was_uint8, result_in_0_255_range=False)


def reinhard_fit_sharded(
    images: jnp.ndarray,
    *,
    axis_name: str,
    weights: jnp.ndarray | None = None,
    valid_rows: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed fit: additive LAB moments reduced with ``psum`` across
    ``axis_name``. Call inside ``shard_map`` — exact (not approximate) because
    mean/std are additive in (n, Σx, Σx²). ``weights`` marks real batch rows
    when the global batch was zero-padded to the mesh axis; ``valid_rows``
    ((H_local,) bool) marks real pixel rows when H was zero-padded to the
    pixel axis. See SURVEY §2.3 / §5."""
    n, s, sq = lab_moments(images, weights, valid_rows)
    n = jax.lax.psum(n, axis_name)
    s = jax.lax.psum(s, axis_name)
    sq = jax.lax.psum(sq, axis_name)
    return moments_to_mean_std(n, s, sq)
