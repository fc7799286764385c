"""Sharded fit / transform pipelines (call inside ``shard_map``), plus
mesh-level convenience wrappers.

Every ``*_sharded`` function takes locally-sharded NCHW views and an
``axis_name`` (one name or a tuple) covering all mesh axes the data is
sharded over, and returns **replicated** fitted parameters. Statistics are
reduced with the exact additive-moment / histogram ``psum`` schemes of
SURVEY §2.3; Macenko percentiles use
:func:`stainx_tpu.parallel.percentile.distributed_masked_percentile`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from stainx_tpu.ops import color
from stainx_tpu.ops import histogram_matching as hm_ops
from stainx_tpu.ops import macenko as macenko_ops
from stainx_tpu.ops import reinhard as reinhard_ops
from stainx_tpu.ops.eigh3 import eigh3_top2
from stainx_tpu.parallel.percentile import distributed_masked_percentile

# --------------------------------------------------------------- Reinhard


def reinhard_fit_sharded(images, axis_name):
    """Exact distributed Reinhard fit: psum of (n, Σx, Σx²) LAB moments."""
    n, s, sq = reinhard_ops.lab_moments(images)
    n = jax.lax.psum(n, axis_name)
    s = jax.lax.psum(s, axis_name)
    sq = jax.lax.psum(sq, axis_name)
    return reinhard_ops.moments_to_mean_std(n, s, sq)


def reinhard_transform_sharded(images, reference_mean, reference_std, axis_name):
    """Sharded Reinhard transform with **batch-global** source statistics
    (the reference normalizes with whole-batch LAB mean/std,
    ``torch_backend.py:344-349`` — so a sharded batch needs a psum)."""
    original_dtype = images.dtype
    was_uint8 = original_dtype == jnp.uint8
    lab = color.rgb_to_lab(color.normalize_to_float(images), channel_axis=1)

    n = jnp.asarray(lab.shape[0] * lab.shape[2] * lab.shape[3], jnp.float32)
    s = jnp.sum(lab, axis=(0, 2, 3))
    sq = jnp.sum(lab * lab, axis=(0, 2, 3))
    n = jax.lax.psum(n, axis_name)
    s = jax.lax.psum(s, axis_name)
    sq = jax.lax.psum(sq, axis_name)
    mean, std = reinhard_ops.moments_to_mean_std(n, s, sq)

    lab_n = ((lab - mean.reshape(1, 3, 1, 1)) / (std.reshape(1, 3, 1, 1) + 1e-8)) * (
        reference_std.reshape(1, 3, 1, 1)
    ) + reference_mean.reshape(1, 3, 1, 1)
    rgb = jnp.clip(color.lab_to_rgb(lab_n, channel_axis=1), 0.0, 1.0)
    return color.preserve_dtype(rgb, original_dtype, was_uint8, result_in_0_255_range=False)


# ------------------------------------------------------- Histogram matching


def hm_fit_sharded(images, axis_name, channel_axis: int = 1):
    """Exact distributed HM fit: histograms are additive → one psum."""
    images_cf, _ = hm_ops._to_channels_first(images, channel_axis)
    images_u8, _ = color.images_to_uint8(images_cf)
    n, c, h, w = images_u8.shape
    flat = jnp.transpose(images_u8, (1, 0, 2, 3)).reshape(c, n * h * w)
    counts = jax.lax.psum(hm_ops.histogram_256(flat), axis_name)
    return counts / (jnp.sum(counts, axis=1, keepdims=True) + 1e-8)


# ----------------------------------------------------------------- Macenko


def macenko_fit_sharded(images, axis_name, percentile_levels: int = 3):
    """Distributed Macenko fit over a sharded pixel pool.

    The covariance comes from psum'd additive masked moments (the 10-scalar
    accumulator layout, ``csrc/macenko.cu:156-190``, which distributes
    losslessly); φ and concentration percentiles use the global-histogram
    refinement. Returns replicated ``(HE (3,2), maxC (2,))``.
    """
    images_float = color.normalize_to_float(images)
    n, _, h, w = images_float.shape
    p_local = n * h * w

    od = macenko_ops.optical_density(images_float)
    od_c = tuple(od[:, i].reshape(1, p_local) for i in range(3))

    od_min = jnp.minimum(jnp.minimum(od_c[0], od_c[1]), od_c[2])
    mask = od_min >= macenko_ops.BETA  # (1, P_local)
    weights = mask.astype(jnp.float32)

    cnt_l, s1_l, s2_l = macenko_ops.masked_od_moments(od_c, weights)
    cnt = jax.lax.psum(cnt_l, axis_name)
    s1 = jax.lax.psum(s1_l, axis_name)
    s2 = jax.lax.psum(s2_l, axis_name)
    cov = macenko_ops.cov_from_moments(cnt, s1, s2)  # (1, 3, 3) replicated
    evecs = eigh3_top2(cov)  # (1, 3, 2)

    t0, t1 = macenko_ops._project_plane(od_c, evecs, jnp.float32)
    phi = jnp.arctan2(t1, t0)[0]  # (P_local,)

    # Both φ percentiles in ONE multi-rank chain: each level is a single
    # (2, 256) psum round instead of two sequential collectives.
    phi_pair = distributed_masked_percentile(
        jnp.stack([phi, phi]),
        jnp.stack([mask[0], mask[0]]),
        (macenko_ops.ALPHA, 100 - macenko_ops.ALPHA),
        axis_name,
        levels=percentile_levels,
    )
    min_phi, max_phi = phi_pair[0], phi_pair[1]

    he = macenko_ops._he_from_phi_extremes(evecs, min_phi[None], max_phi[None])  # (1,3,2)
    c0, c1 = macenko_ops._concentrations_2x2(he, od_c)

    all_mask = jnp.ones((2, p_local), bool)
    max_conc = distributed_masked_percentile(
        jnp.stack([c0[0], c1[0]]), all_mask, (99, 99), axis_name, levels=percentile_levels
    )
    return he[0], max_conc


# ------------------------------------------------------- mesh-level wrappers

_FIT_SHARDED = {
    "reinhard": lambda imgs, ax: reinhard_fit_sharded(imgs, ax),
    "histogram_matching": lambda imgs, ax: hm_fit_sharded(imgs, ax),
    "macenko": lambda imgs, ax: macenko_fit_sharded(imgs, ax),
}


def fit_on_mesh(method: str, images, mesh: Mesh, batch_axis: str = "batch"):
    """Jit + shard_map a distributed fit over ``mesh`` with N sharded on
    ``batch_axis``. Returns replicated fitted parameters (a tuple for
    reinhard/macenko, a (C, 256) array for histogram_matching)."""
    if method not in _FIT_SHARDED:
        raise ValueError(f"Unknown method '{method}'. Choose from {sorted(_FIT_SHARDED)}")
    fit_fn = _FIT_SHARDED[method]
    axes = mesh.axis_names

    @jax.jit
    def run(imgs):
        return jax.shard_map(
            partial(fit_fn, ax=axes),
            mesh=mesh,
            in_specs=PartitionSpec(batch_axis),
            out_specs=PartitionSpec(),
                check_vma=False,
        )(imgs)

    sharded = jax.device_put(images, NamedSharding(mesh, PartitionSpec(batch_axis)))
    return run(sharded)


def transform_on_mesh(method: str, images, params, mesh: Mesh, batch_axis: str = "batch", **kwargs):
    """Batch-parallel transform: shard N over ``batch_axis``; Macenko/HM need
    zero communication (per-image ops), Reinhard psums its batch-global
    source statistics."""
    sharded = jax.device_put(images, NamedSharding(mesh, PartitionSpec(batch_axis)))

    if method == "reinhard":
        mean, std = params

        @jax.jit
        def run(imgs):
            return jax.shard_map(
                lambda im: reinhard_transform_sharded(im, mean, std, mesh.axis_names),
                mesh=mesh,
                in_specs=PartitionSpec(batch_axis),
                out_specs=PartitionSpec(batch_axis),
            )(imgs)

        return run(sharded)

    if method == "macenko":
        he, tmc = params
        precision = kwargs.get("precision", "stable")
        use_pallas = kwargs.get("use_pallas", False)

        # shard_map (not bare GSPMD propagation): Pallas kernels are not
        # auto-partitionable, so each shard runs the full local transform —
        # which needs zero communication (per-image op).
        @jax.jit
        def run(imgs):
            return jax.shard_map(
                lambda im: macenko_ops.macenko_transform(
                    im, he, tmc, precision=precision, use_pallas=use_pallas
                ),
                mesh=mesh,
                in_specs=PartitionSpec(batch_axis),
                out_specs=PartitionSpec(batch_axis),
                check_vma=False,  # selection while-loop carries defeat VMA inference
            )(imgs)

        return run(sharded)

    if method == "histogram_matching":
        # NOTE: sharded HM matches each shard against its local histogram —
        # exact global source CDFs would psum the source histogram; provided
        # via hm_transform_sharded for batch-mode parity.
        @jax.jit
        def run(imgs):
            return jax.shard_map(
                lambda im: hm_transform_sharded(im, params, mesh.axis_names),
                mesh=mesh,
                in_specs=PartitionSpec(batch_axis),
                out_specs=PartitionSpec(batch_axis),
            )(imgs)

        return run(sharded)

    raise ValueError(f"Unknown method '{method}'")


def hm_transform_sharded(images, ref_histograms, axis_name, channel_axis: int = 1):
    """Sharded HM transform with **batch-global** source CDFs (the reference
    builds one source histogram over the whole batch per channel,
    ``torch_backend.py:228-236`` — additive, so one psum)."""
    original_dtype = images.dtype
    images_cf, needs_permute = hm_ops._to_channels_first(images, channel_axis)
    was_uint8 = images_cf.dtype == jnp.uint8
    images_u8, needs_scale_back = color.images_to_uint8(images_cf)
    n, c, h, w = images_u8.shape

    flat = jnp.transpose(images_u8, (1, 0, 2, 3)).reshape(c, n * h * w)
    counts = jax.lax.psum(hm_ops.histogram_256(flat), axis_name)
    total = jax.lax.psum(jnp.float32(n * h * w), axis_name)
    lut = hm_ops.hm_build_lut(counts, jnp.asarray(ref_histograms, jnp.float32), total)

    matched = hm_ops._apply_lut(images_u8, lut)
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
