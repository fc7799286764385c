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

from functools import lru_cache

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


def reinhard_fit_sharded(images, axis_name, weights=None, valid_rows=None):
    """Exact distributed Reinhard fit: psum of (n, Σx, Σx²) LAB moments
    (delegates to the single implementation in :mod:`stainx_tpu.ops.reinhard`).
    ``weights`` ((N_local,) 0/1 float, optional) marks real rows when the
    global batch was zero-padded to divide the mesh axis; ``valid_rows``
    ((H_local,) bool, optional) marks real pixel rows when H was
    zero-padded to divide the pixel axis."""
    return reinhard_ops.reinhard_fit_sharded(
        images, axis_name=axis_name, weights=weights, valid_rows=valid_rows
    )


def reinhard_transform_sharded(
    images, reference_mean, reference_std, axis_name, weights=None, valid_rows=None
):
    """Sharded Reinhard transform with **batch-global** source statistics
    (the reference normalizes with whole-batch LAB mean/std,
    ``torch_backend.py:344-349`` — so a sharded batch needs a psum).
    ``weights`` ((N_local,) 0/1) excludes zero-padded batch rows and
    ``valid_rows`` ((H_local,) bool) zero-padded pixel rows from the
    source statistics; padded outputs are garbage and must be sliced off
    by the caller."""
    original_dtype = images.dtype
    was_uint8 = original_dtype == jnp.uint8
    lab = color.rgb_to_lab(color.normalize_to_float(images), channel_axis=1)

    # Centered additive moments (see ops.reinhard.LAB_MOMENT_CENTER —
    # raw Σx² cancels catastrophically in f32 for low-variance channels).
    lab_c = lab - reinhard_ops.LAB_MOMENT_CENTER
    if weights is None and valid_rows is None:
        n = jnp.asarray(lab.shape[0] * lab.shape[2] * lab.shape[3], jnp.float32)
        s = jnp.sum(lab_c, axis=(0, 2, 3))
        sq = jnp.sum(lab_c * lab_c, axis=(0, 2, 3))
    else:
        # Per-pixel weight = batch-row weight × pixel-row validity, kept
        # FACTORED: the (N, 1, H, 1) outer product broadcasts into the
        # sums (no (N, 1, H, W) materialization), and the count is the
        # exact product of the scalar factor sums — a full-slab f32 sum
        # of ones rounds past 2²⁴ local pixels (review finding).
        rw = (
            weights.astype(jnp.float32)
            if weights is not None
            else jnp.ones((lab.shape[0],), jnp.float32)
        )
        vr = (
            valid_rows.astype(jnp.float32)
            if valid_rows is not None
            else jnp.ones((lab.shape[2],), jnp.float32)
        )
        wpx = rw[:, None, None, None] * vr[None, None, :, None]  # (N, 1, H, 1)
        n = jnp.sum(rw) * jnp.sum(vr) * jnp.float32(lab.shape[3])
        s = jnp.sum(lab_c * wpx, axis=(0, 2, 3))
        sq = jnp.sum(lab_c * lab_c * wpx, axis=(0, 2, 3))
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


def _local_histogram(images_u8, weights, valid_rows=None):
    """Per-channel 256-bin counts over the local shard, excluding rows with
    weight 0 (batch padding) and, with ``valid_rows`` ((H,) bool), padded
    pixel rows: zeroed-out pixels land in bin 0, which is then corrected by
    an exact subtraction (the same trick ``hm_ops.histogram_256`` uses for
    its own chunk padding). Returns ``(counts (C, 256), valid_px scalar)``."""
    n, c, h, w = images_u8.shape
    n_valid = jnp.float32(n) if weights is None else jnp.sum((weights > 0).astype(jnp.float32))
    h_valid = jnp.float32(h) if valid_rows is None else jnp.sum(valid_rows.astype(jnp.float32))
    if weights is not None:
        images_u8 = images_u8 * (weights > 0).astype(images_u8.dtype)[:, None, None, None]
    if valid_rows is not None:
        images_u8 = images_u8 * valid_rows.astype(images_u8.dtype)[None, None, :, None]
    flat = jnp.transpose(images_u8, (1, 0, 2, 3)).reshape(c, n * h * w)
    counts = hm_ops.histogram_256(flat)
    valid_px = n_valid * h_valid * jnp.float32(w)
    if weights is not None or valid_rows is not None:
        counts = counts.at[:, 0].add(valid_px - jnp.float32(n * h * w))
    return counts, valid_px


def hm_fit_sharded(images, axis_name, channel_axis: int = 1, weights=None, valid_rows=None):
    """Exact distributed HM fit: histograms are additive → one psum.
    ``weights`` excludes zero-padded batch rows (uneven-batch sharding);
    ``valid_rows`` ((H_local,) bool) zero-padded pixel rows (H padded to
    the pixel axis)."""
    images_cf, _ = hm_ops._to_channels_first(images, channel_axis)
    images_u8, _ = color.images_to_uint8(images_cf)
    counts, _ = _local_histogram(images_u8, weights, valid_rows)
    counts = jax.lax.psum(counts, axis_name)
    return counts / (jnp.sum(counts, axis=1, keepdims=True) + 1e-8)


# ----------------------------------------------------------------- Macenko


def macenko_fit_sharded(
    images, axis_name, percentile_levels: int = 0, weights=None, valid_rows=None
):
    """Distributed Macenko fit over a sharded pixel pool.

    The covariance comes from psum'd additive masked moments (the 10-scalar
    accumulator layout, ``csrc/macenko.cu:156-190``, which distributes
    losslessly); φ and concentration percentiles use the global-histogram
    refinement. ``weights`` ((N_local,) 0/1) excludes zero-padded BATCH
    rows' pixels from every mask; ``valid_rows`` ((H_local,) bool)
    zero-padded pixel rows (H padded to the pixel axis). Returns
    replicated ``(HE (3,2), maxC (2,))``.
    """
    images_float = color.normalize_to_float(images)
    n, _, h, w = images_float.shape
    p_local = n * h * w

    od = macenko_ops.optical_density(images_float)
    od_c = tuple(od[:, i].reshape(1, p_local) for i in range(3))

    valid = None
    if weights is not None or valid_rows is not None:
        # Pixel ordering of the (1, P_local) planes is batch-major; the
        # batch-row × pixel-row validity stays factored until one
        # (N, H, W) broadcast.
        bv = (weights > 0) if weights is not None else jnp.ones((n,), bool)
        rv = valid_rows if valid_rows is not None else jnp.ones((h,), bool)
        valid = jnp.broadcast_to(
            bv[:, None, None] & rv[None, :, None], (n, h, w)
        ).reshape(1, p_local)

    od_min = jnp.minimum(jnp.minimum(od_c[0], od_c[1]), od_c[2])
    mask = od_min >= macenko_ops.BETA  # (1, P_local)
    if valid is not None:
        mask = mask & valid
    weights = mask.astype(jnp.float32)

    cnt_l, s1_l, s2_l = macenko_ops.masked_od_moments(od_c, weights)
    cnt = jax.lax.psum(cnt_l, axis_name)
    s1 = jax.lax.psum(s1_l, axis_name)
    s2 = jax.lax.psum(s2_l, axis_name)
    cov = macenko_ops.cov_from_moments(cnt, s1, s2)  # (1, 3, 3) replicated
    evecs = eigh3_top2(cov)  # (1, 3, 2)

    t0, t1 = macenko_ops._project_plane(od_c, evecs, jnp.float32)
    phi = jnp.arctan2(t1, t0)[0]  # (P_local,)

    # Both φ percentiles of the ONE φ field share a single multi-rank
    # descent: each level is one (1, 2, 256) psum round, and the field is
    # never duplicated in memory.
    phi_pair = distributed_masked_percentile(
        phi[None],
        mask,
        ((macenko_ops.ALPHA, 100 - macenko_ops.ALPHA),),
        axis_name,
        levels=percentile_levels,
    )[0]
    min_phi, max_phi = phi_pair[0], phi_pair[1]

    he = macenko_ops._he_from_phi_extremes(evecs, min_phi[None], max_phi[None])  # (1,3,2)
    c0, c1 = macenko_ops._concentrations_2x2(he, od_c)

    # mask=None ⇒ all pixels valid (no mask plane materialized).
    c_mask = None if valid is None else jnp.concatenate([valid, valid], axis=0)
    max_conc = distributed_masked_percentile(
        jnp.stack([c0[0], c1[0]]), c_mask, (99, 99), axis_name, levels=percentile_levels
    )
    return he[0], max_conc


def macenko_transform_sharded(
    images,
    stain_matrix,
    target_max_conc,
    axis_name,
    precision: str = "stable",
    valid=None,
):
    """Pixel-sharded Macenko transform: per-image statistics over an image
    whose PIXELS are sharded across the mesh.

    The single-chip streaming tier caps a row at one chip's HBM (~1.1 G px
    uint8 on 16 GB — ``kernels/macenko_stream.py``); this is the cross-chip
    continuation: each chip holds a horizontal slab, per-image statistics
    reduce with O(N·256)-sized collectives (10-scalar masked OD moments +
    the 4-round key-space percentile of :mod:`..parallel.percentile`), and
    the reconstruction is local. Same semantics as
    :func:`stainx_tpu.ops.macenko.macenko_transform` (β-mask with the
    <3-pixel all-pixels fallback, nearest-rank percentiles, 2×2 normal
    equations, sign-preserving maxC guard, no Io cap —
    ``torch_backend.py:399-461,521-560``).

    ``axis_name`` covers ONLY the mesh axes the pixels of each image are
    sharded over — a batch axis shards *different* images and must not be
    reduced here. ``valid`` ((N, H_local, W) or (N, P_local) bool,
    optional) marks real pixels when the pixel axis was padded.
    """
    original_dtype = images.dtype
    was_uint8 = original_dtype == jnp.uint8
    images_float = color.normalize_to_float(images)
    n, c, h, w = images_float.shape
    p_local = h * w

    od = macenko_ops.optical_density(images_float).reshape(n, 3, p_local)
    od_c = (od[:, 0], od[:, 1], od[:, 2])
    if valid is not None:
        valid = valid.reshape(n, p_local)

    od_min = jnp.minimum(jnp.minimum(od_c[0], od_c[1]), od_c[2])
    mask = od_min >= macenko_ops.BETA
    all_mask = jnp.ones_like(mask) if valid is None else valid
    mask = mask & all_mask

    # TWO-PASS covariance (mean psum round, then centered-moment psum
    # round), matching the single-chip ``_masked_cov_two_pass``: the
    # one-pass centered-moments form leaves ~1e-6 f32 residue on a
    # UNIFORM (background) tile, which the analytic eigh resolves into a
    # real eigenbasis where the single-chip path's ~1e-17 degenerates to
    # zero eigenvectors — a wildly different (wrong-parity) output on a
    # tile class WSIs hit routinely. The <3-pixel fallback is decided on
    # the GLOBAL count (a local shard may hold 0 surviving pixels of an
    # image that globally has plenty).
    w_m = mask.astype(jnp.float32)
    w_a = all_mask.astype(jnp.float32)
    # Pass 1 packed into ONE (N, 8) collective: [cnt, cnt_a, s1(3), s1_a(3)].
    pass1 = jax.lax.psum(
        jnp.stack(
            [jnp.sum(w_m, axis=-1), jnp.sum(w_a, axis=-1)]
            + [jnp.sum(w_m * od_c[i], axis=-1) for i in range(3)]
            + [jnp.sum(w_a * od_c[i], axis=-1) for i in range(3)],
            axis=-1,
        ),
        axis_name,
    )
    cnt, cnt_a = pass1[:, 0], pass1[:, 1]
    s1, s1_a = pass1[:, 2:5], pass1[:, 5:8]
    use_all = cnt < 3
    cnt_eff = jnp.where(use_all, cnt_a, cnt)
    mu = jnp.where(use_all[:, None], s1_a, s1) / jnp.maximum(cnt_eff, 1.0)[:, None]
    eff_mask = (mask | use_all[:, None]) & all_mask
    w_eff = eff_mask.astype(jnp.float32)
    centered = [od_c[i] - mu[:, i, None] for i in range(3)]
    s2c = jax.lax.psum(
        jnp.stack(
            [
                jnp.stack(
                    [jnp.sum(w_eff * centered[i] * centered[j], axis=-1) for j in range(3)],
                    -1,
                )
                for i in range(3)
            ],
            -2,
        ),
        axis_name,
    )  # (N, 3, 3)
    cov = jnp.where(
        (cnt_eff > 1.0)[:, None, None],
        s2c / jnp.maximum(cnt_eff - 1.0, 1.0)[:, None, None],
        0.0,
    )
    evecs = eigh3_top2(cov)  # (N, 3, 2), replicated across pixel shards

    t0, t1 = macenko_ops._project_plane(od_c, evecs, jnp.float32)
    phi = jnp.arctan2(t1, t0)  # (N, P_local)

    # Both φ percentiles of every image share one multi-rank descent on the
    # UN-duplicated φ field: each of the 4 levels costs a single
    # (N, 2, 256) psum round, and no (2N, P_local) copies of the field or
    # mask are materialized (this path exists because images exceed one
    # chip's HBM — transient copies cost real row size).
    qs = ((macenko_ops.ALPHA, 100 - macenko_ops.ALPHA),) * n
    phi_pair = distributed_masked_percentile(phi, eff_mask, qs, axis_name)  # (N, 2)
    min_phi, max_phi = phi_pair[:, 0], phi_pair[:, 1]

    he = macenko_ops._he_from_phi_extremes(evecs, min_phi, max_phi)  # (N, 3, 2)
    c0, c1 = macenko_ops._concentrations_2x2(he, od_c)  # (N, P_local)

    # 99th percentile of each concentration over ALL (valid) pixels
    # (``macenko.cu:247-251`` ranks over cnt_all = P). c0/c1 are distinct
    # fields so the 2N rows are genuine, but with no pixel padding the
    # mask plane is skipped entirely (mask=None).
    c_stack = jnp.concatenate([c0, c1], axis=0)
    all2 = None if valid is None else jnp.concatenate([valid, valid], axis=0)
    max_c = distributed_masked_percentile(c_stack, all2, (99,) * (2 * n), axis_name)
    max_c0, max_c1 = max_c[:n], max_c[n:]

    # Shared tail: sign-preserving maxC guard + rescale + reconstruction.
    recon_dtype = jnp.bfloat16 if precision == "fast" else jnp.float32
    rgb = macenko_ops.rescale_and_reconstruct(
        c0, c1, max_c0, max_c1, target_max_conc, stain_matrix, recon_dtype
    ).reshape(n, c, h, w)
    return color.preserve_dtype(rgb, original_dtype, was_uint8, result_in_0_255_range=True)


# ------------------------------------------------------- mesh-level wrappers
#
# The jitted shard_map callables are built ONCE per (method, mesh,
# batch_axis[, precision/backend]) via lru_cache and take the fitted
# parameters as replicated ARGUMENTS — a fresh closure per call would be a
# new function object, i.e. a jit-cache miss and a full retrace/recompile on
# every training step (round-1 review finding). Within one cached runner,
# jax.jit's own cache keys on input shapes/dtypes as usual.
#
# These wrappers psum only over ``batch_axis`` — the axis the data is
# actually sharded on. On a multi-axis mesh the shards are replicated over
# the other axes; reducing over them too would scale counts/moments by the
# replication factor (means cancel, Bessel std and nearest-rank indices
# don't). Callers sharding more axes use the ``*_sharded`` functions
# directly with the full axis tuple, as ``dryrun_multichip`` does.

_FIT_SHARDED = {
    "reinhard": reinhard_fit_sharded,
    "histogram_matching": hm_fit_sharded,
    "macenko": macenko_fit_sharded,
}


@lru_cache(maxsize=None)
def _fit_runner(
    method: str,
    mesh: Mesh,
    batch_axis: str,
    weighted: bool = False,
    pixel_axis: str | None = None,
    h_padded: bool = False,
):
    """Build (once per distinct configuration) the jitted shard_map fit
    runner. Positional call order is ``run(imgs, [valid_rows], [weights])``
    — the optional mask operands appear iff ``h_padded`` / ``weighted``, in
    that order, mirroring :func:`_transform_runner`."""
    fit_fn = _FIT_SHARDED[method]
    axis = (batch_axis, pixel_axis) if pixel_axis else batch_axis
    img_spec = PartitionSpec(batch_axis, None, pixel_axis)  # pixel_axis=None ⇒ batch-only

    mask_specs = []
    if h_padded:
        mask_specs.append(PartitionSpec(pixel_axis))
    if weighted:
        mask_specs.append(PartitionSpec(batch_axis))
    n_masks = len(mask_specs)

    def body(im, masks):
        kw = {}
        if h_padded:
            kw["valid_rows"] = masks[0]
        if weighted:
            kw["weights"] = masks[-1]
        return fit_fn(im, axis, **kw)

    @jax.jit
    def run(imgs, *rest):
        return jax.shard_map(
            lambda im, *r: body(im, list(r[:n_masks])),
            mesh=mesh,
            in_specs=(img_spec, *mask_specs),
            out_specs=PartitionSpec(),
            check_vma=False,
        )(imgs, *rest)

    return run


def _axis_size(mesh: Mesh, batch_axis: str) -> int:
    if batch_axis not in mesh.shape:
        raise ValueError(
            f"batch_axis '{batch_axis}' is not an axis of the mesh "
            f"(mesh axes: {tuple(mesh.shape)})."
        )
    return mesh.shape[batch_axis]


def _check_pixel_axis(mesh: Mesh, pixel_axis: str | None, batch_axis: str) -> None:
    if pixel_axis is None:
        return
    if pixel_axis not in mesh.shape:
        raise ValueError(
            f"pixel_axis '{pixel_axis}' is not an axis of the mesh "
            f"(mesh axes: {tuple(mesh.shape)})."
        )
    if pixel_axis == batch_axis:
        raise ValueError(
            f"pixel_axis must differ from batch_axis (both '{batch_axis}'): a batch "
            "axis shards different images; a pixel axis shards each image's rows."
        )


def _pad_h_to_axis(images, mesh: Mesh, pixel_axis: str):
    """Zero-pad H to a multiple of the pixel mesh axis; returns
    ``(padded_images, vr_args, h_padded)`` where ``vr_args`` is a 0- or
    1-tuple holding the sharded (H_padded,) row-validity vector. Both the
    fit and transform mesh wrappers accept ANY image height through this
    pad+mask (the reference's L5 accepts arbitrary shapes,
    ``src/stainx/transforms.py:218-230``); padded pixel rows are excluded
    from every statistic via ``valid_rows`` and transform outputs are
    sliced back."""
    h = images.shape[2]
    px = mesh.shape[pixel_axis]
    h_pad = ((h + px - 1) // px) * px
    if h_pad == h:
        return images, (), False
    images = jnp.concatenate(
        [images, jnp.zeros((*images.shape[:2], h_pad - h, images.shape[3]), images.dtype)],
        axis=2,
    )
    rows_valid = jnp.arange(h_pad) < h
    vr_args = (jax.device_put(rows_valid, NamedSharding(mesh, PartitionSpec(pixel_axis))),)
    return images, vr_args, True


def _pad_to_axis(images, axis_size: int):
    """Zero-pad the batch so N divides the mesh axis; returns
    ``(padded, weights-or-None, original_n)``. The weights vector (0/1,
    padded length) is sharded alongside the images so the ``*_sharded``
    statistics exclude the padded rows exactly — the reference's L5 accepts
    arbitrary N (``src/stainx/transforms.py:218-230``), so the mesh path
    must too rather than surface a raw XLA sharding error."""
    n = images.shape[0]
    if n % axis_size == 0:
        return images, None, n
    pad_to = ((n + axis_size - 1) // axis_size) * axis_size
    pad = jnp.zeros((pad_to - n, *images.shape[1:]), images.dtype)
    weights = (jnp.arange(pad_to) < n).astype(jnp.float32)
    return jnp.concatenate([images, pad], axis=0), weights, n


def _put_unless_committed(arr, sharding):
    """``device_put`` unless ``arr`` is already committed to an equivalent
    sharding — the no-copy path pre-sharded inputs take.

    A host-global ``device_put`` is valid only when every mesh device is
    addressable from this process (single-controller). Multi-controller
    callers build the global array themselves (e.g.
    ``jax.make_array_from_process_local_data``) and rely on this
    equivalence check to pass it straight through."""
    s = getattr(arr, "sharding", None)
    if (
        s is not None
        and getattr(arr, "committed", False)
        and s.is_equivalent_to(sharding, arr.ndim)
    ):
        return arr
    return jax.device_put(arr, sharding)


_MULTIHOST_NOTE = """
    Process topology: with a SINGLE controller (every mesh device
    addressable from this process — the only configuration testable
    here), host/numpy inputs are accepted and ``device_put`` onto the
    mesh. On a MULTI-CONTROLLER pod, pass a global ``jax.Array`` already
    sharded to ``NamedSharding(mesh, PartitionSpec(batch_axis, None,
    pixel_axis))`` (e.g. via ``jax.make_array_from_process_local_data``)
    with N divisible by the batch axis (and H by the pixel axis, if
    used) so the padding paths — which are host-global operations — never
    run; such inputs take the no-copy path into the jitted shard_map,
    which is topology-agnostic. See docs/training.md "Multi-host pods".
"""


def fit_on_mesh(
    method: str,
    images,
    mesh: Mesh,
    batch_axis: str = "batch",
    pixel_axis: str | None = None,
):
    """Jit + shard_map a distributed fit over ``mesh`` with N sharded on
    ``batch_axis``; any batch size is accepted (uneven N is zero-padded and
    excluded from the statistics via a sharded weights vector). With
    ``pixel_axis`` each image's rows are additionally sharded over that
    mesh axis — ANY height is accepted (a non-dividing H is zero-padded
    and the padded rows are excluded from every statistic via a sharded
    row-validity vector) — and the statistics reduce over both axes.
    Returns replicated fitted parameters (a tuple for reinhard/macenko, a
    (C, 256) array for histogram_matching)."""
    if method not in _FIT_SHARDED:
        raise ValueError(f"Unknown method '{method}'. Choose from {sorted(_FIT_SHARDED)}")
    images = jnp.asarray(images)
    _check_pixel_axis(mesh, pixel_axis, batch_axis)
    vr_args: tuple = ()
    h_padded = False
    if pixel_axis is not None:
        images, vr_args, h_padded = _pad_h_to_axis(images, mesh, pixel_axis)
    padded, weights, _ = _pad_to_axis(images, _axis_size(mesh, batch_axis))
    spec = NamedSharding(mesh, PartitionSpec(batch_axis, None, pixel_axis))
    w_spec = NamedSharding(mesh, PartitionSpec(batch_axis))
    sharded = _put_unless_committed(padded, spec)
    weighted = weights is not None
    run = _fit_runner(
        method, mesh, batch_axis, weighted=weighted, pixel_axis=pixel_axis, h_padded=h_padded
    )
    w_args = vr_args + ((jax.device_put(weights, w_spec),) if weighted else ())
    return run(sharded, *w_args)


fit_on_mesh.__doc__ += _MULTIHOST_NOTE


@lru_cache(maxsize=None)
def _transform_runner(
    method: str,
    mesh: Mesh,
    batch_axis: str,
    precision: str = "stable",
    use_pallas: bool = False,
    weighted: bool = False,
    pixel_axis: str | None = None,
    h_padded: bool = False,
):
    """Build (once per distinct configuration) the jitted shard_map runner.

    Positional call order is ``run(imgs, [valid_rows], [weights],
    *params)`` — the optional mask operands appear iff ``h_padded`` /
    ``weighted``, in that order, matching ``transform_on_mesh``'s
    ``w_args`` assembly. One builder assembles specs and keyword routing
    from the flags, so the mask plumbing cannot drift apart across
    per-method copies (round-3 review finding).

    ``precision``/``use_pallas`` only reach the macenko bodies, and the
    PIXEL-sharded statistics paths are XLA-native by design (pallas
    kernels are not auto-partitionable), so ``use_pallas`` is dead there;
    ``transform_on_mesh`` normalizes both flags out of the cache key for
    every combination where they are dead, so no duplicate programs are
    compiled.

    ``h_padded``: the runner takes a (H_padded,) bool row-validity vector
    right after the images and runs the masked-statistics bodies; an
    evenly-dividing H dispatches to the unmasked bodies instead — the
    mask multiplies and exclusions are pure waste there (review finding).
    Macenko expands the vector to the per-pixel ``valid`` mask its
    sharded transform takes.
    """
    img_spec = PartitionSpec(batch_axis, None, pixel_axis)  # pixel_axis=None => batch-only
    repl = PartitionSpec()
    # Batch-GLOBAL statistics (reinhard/HM) reduce over every axis the data
    # is sharded on; macenko's statistics are per-IMAGE, so they reduce over
    # the pixel axis only — the batch axis holds different images.
    stat_axis = (batch_axis, pixel_axis) if pixel_axis else batch_axis

    mask_specs = []
    if h_padded:
        mask_specs.append(PartitionSpec(pixel_axis))
    if weighted:
        mask_specs.append(PartitionSpec(batch_axis))
    n_masks = len(mask_specs)

    def mask_kwargs(masks):
        kw = {}
        if h_padded:
            kw["valid_rows"] = masks[0]
        if weighted:
            kw["weights"] = masks[-1]
        return kw

    if method == "reinhard":
        n_params = 2

        def body(im, masks, params):
            return reinhard_transform_sharded(
                im, params[0], params[1], stat_axis, **mask_kwargs(masks)
            )

    elif method == "histogram_matching":
        # Batch-global source CDFs: each shard psums its source histogram
        # over ``stat_axis`` (hm_transform_sharded) for exact batch parity.
        n_params = 1

        def body(im, masks, params):
            return hm_transform_sharded(im, params[0], stat_axis, **mask_kwargs(masks))

    elif method == "macenko":
        n_params = 2
        if weighted:
            raise ValueError(
                "macenko transforms are per-image; padded batch rows need no "
                "weights (transform_on_mesh never requests them)."
            )
        if pixel_axis:
            # Per-image statistics psum over the pixel shards
            # (macenko_transform_sharded); reconstruction is local. The
            # row-validity vector expands to the (N, H_local, W) mask.
            def body(im, masks, params):
                kw = {}
                if h_padded:
                    kw["valid"] = jnp.broadcast_to(
                        masks[0][None, :, None], (im.shape[0], im.shape[2], im.shape[3])
                    )
                return macenko_transform_sharded(
                    im, params[0], params[1], pixel_axis, precision=precision, **kw
                )

        else:
            # shard_map (not bare GSPMD propagation): Pallas kernels are not
            # auto-partitionable, so each shard runs the full local
            # transform — which needs zero communication (per-image op).
            # Padded rows need no weights either: per-image outputs are
            # garbage only on the padded rows, which the caller slices off.
            def body(im, masks, params):
                return macenko_ops.macenko_transform(
                    im, params[0], params[1], precision=precision, use_pallas=use_pallas
                )

    else:
        raise ValueError(f"Unknown method '{method}'")

    @jax.jit
    def run(imgs, *rest):
        return jax.shard_map(
            lambda im, *r: body(im, list(r[:n_masks]), list(r[n_masks:])),
            mesh=mesh,
            in_specs=(img_spec, *mask_specs, *(repl,) * n_params),
            out_specs=img_spec,
            check_vma=False,  # selection while-loop carries defeat VMA inference
        )(imgs, *rest)

    return run


def transform_on_mesh(
    method: str,
    images,
    params,
    mesh: Mesh,
    batch_axis: str = "batch",
    pixel_axis: str | None = None,
    **kwargs,
):
    """Batch-parallel transform: shard N over ``batch_axis``; Macenko/HM need
    zero communication (per-image ops), Reinhard psums its batch-global
    source statistics. Any batch size is accepted — uneven N (including a
    single image) is zero-padded to the mesh axis, excluded from the
    batch-global statistics, and sliced off the output.

    With ``pixel_axis`` each image's rows are additionally sharded over that
    mesh axis — for images too large for one chip. Any H is accepted: a
    non-dividing H is zero-padded, the padded pixel rows are excluded from
    every statistic via a sharded row-validity vector, and the output rows
    are sliced back off. Reinhard/HM statistics psum over both axes;
    Macenko routes to :func:`macenko_transform_sharded` (per-image
    statistics psum over the pixel shards only). The sharded statistics
    paths are XLA-native by design — ``use_pallas`` only affects the
    batch-only Macenko route, where each shard runs the full local
    (kernel-backed) transform."""
    if method not in _FIT_SHARDED:
        raise ValueError(f"Unknown method '{method}'. Choose from {sorted(_FIT_SHARDED)}")
    images = jnp.asarray(images)
    _check_pixel_axis(mesh, pixel_axis, batch_axis)
    h = images.shape[2]
    vr_args: tuple = ()
    h_padded = False
    if pixel_axis is not None:
        images, vr_args, h_padded = _pad_h_to_axis(images, mesh, pixel_axis)
    padded, weights, n = _pad_to_axis(images, _axis_size(mesh, batch_axis))
    spec = NamedSharding(mesh, PartitionSpec(batch_axis, None, pixel_axis))
    w_sharding = NamedSharding(mesh, PartitionSpec(batch_axis))
    sharded = _put_unless_committed(padded, spec)
    # Macenko is per-image: padded BATCH rows can't contaminate real outputs
    # (padded pixel rows ride the row-validity vector instead).
    weighted = weights is not None and method != "macenko"
    # Normalize dead flags out of the cached-runner key: precision/use_pallas
    # only reach the macenko bodies, and the pixel-sharded macenko
    # statistics path is XLA-native by design (pallas kernels are not
    # auto-partitionable) — without this, backend="pallas" would silently
    # compile a second, bit-identical program per flag value.
    precision = kwargs.get("precision", "stable") if method == "macenko" else "stable"
    use_pallas = (
        kwargs.get("use_pallas", False) if method == "macenko" and pixel_axis is None else False
    )
    run = _transform_runner(
        method,
        mesh,
        batch_axis,
        precision,
        use_pallas,
        weighted,
        pixel_axis,
        h_padded,
    )
    w_args = vr_args + ((jax.device_put(weights, w_sharding),) if weighted else ())
    replicated = NamedSharding(mesh, PartitionSpec())
    if method in ("reinhard", "macenko"):
        p0, p1 = (jax.device_put(jnp.asarray(p), replicated) for p in params)
        out = run(sharded, *w_args, p0, p1)
    else:
        out = run(sharded, *w_args, jax.device_put(jnp.asarray(params, jnp.float32), replicated))
    if out.shape[2] != h:
        out = out[:, :, :h, :]
    return out[:n] if padded.shape[0] != n else out


transform_on_mesh.__doc__ += _MULTIHOST_NOTE


def hm_transform_sharded(
    images, ref_histograms, axis_name, channel_axis: int = 1, weights=None, valid_rows=None
):
    """Sharded HM transform with **batch-global** source CDFs (the reference
    builds one source histogram over the whole batch per channel,
    ``torch_backend.py:228-236`` — additive, so one psum). ``weights``
    ((N_local,) 0/1) excludes zero-padded batch rows and ``valid_rows``
    ((H_local,) bool) zero-padded pixel rows from the source histogram;
    padded outputs are garbage and must be sliced off by the caller."""
    original_dtype = images.dtype
    images_cf, needs_permute = hm_ops._to_channels_first(images, channel_axis)
    was_uint8 = images_cf.dtype == jnp.uint8
    images_u8, needs_scale_back = color.images_to_uint8(images_cf)

    counts, valid_px = _local_histogram(images_u8, weights, valid_rows)
    counts = jax.lax.psum(counts, axis_name)
    total = jax.lax.psum(valid_px, axis_name)
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
