"""Pallas TPU kernels: fused Reinhard apply + batch-global LAB moments.

Two kernels covering the role of the reference's three-kernel CUDA chain
(``csrc/reinhard.cu:45-139``: rgb_to_lab_kernel → statistics_matching
→ lab_to_rgb_kernel) plus the mean/std reduction the reference leaves to
ATen between kernels (``src/stainx_cuda_torch/csrc/reinhard.cu:81-83``):

- :func:`reinhard_moments_pallas` — batch-global centered LAB sum /
  sum-of-squares straight from the raw bytes, so the f32 LAB field is
  never materialized in HBM (the XLA path's dominant cost: ~400 MB of
  LAB write+read per 64×512² batch);
- :func:`reinhard_apply_pallas` — RGB→LAB→affine→LAB→RGB in one VMEM
  pass per tile, the twelve affine scalars via scalar prefetch.

The color math is shared with the jnp path
(:func:`stainx_tpu.ops.color.rgb_planes_to_lab` /
:func:`~stainx_tpu.ops.color.lab_planes_to_rgb`) — the kernels cannot
drift from their twins (moments twin: ``ops.reinhard.lab_moments``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainx_tpu.kernels import interpret_mode
from stainx_tpu.ops.color import lab_planes_to_rgb, rgb_planes_to_lab

_LANE = 128
_SUB = 8


def _pick_tile(s: int, max_tile: int) -> int:
    """Largest sublane-aligned (×8) divisor of ``s`` up to ``max_tile``;
    falls back to the full dimension (block == array dim is always legal)."""
    for t in range(min(s, max_tile), 7, -1):
        if s % t == 0 and t % 8 == 0:
            return t
    return s


def _reinhard_kernel(params_ref, x_ref, out_ref, *, is_uint8: bool):
    if is_uint8:
        # Mosaic has no direct u8→f32 cast; hop through int32.
        planes = [x_ref[0, c].astype(jnp.int32).astype(jnp.float32) / 255.0 for c in range(3)]
    else:
        planes = [x_ref[0, c].astype(jnp.float32) for c in range(3)]

    lab = rgb_planes_to_lab(planes)
    out_lab = []
    for c in range(3):
        mean = params_ref[0, c]
        std = params_ref[1, c]
        ref_mean = params_ref[2, c]
        ref_std = params_ref[3, c]
        out_lab.append(((lab[c] - mean) / (std + 1e-8)) * ref_std + ref_mean)

    rgb = lab_planes_to_rgb(out_lab)
    for c in range(3):
        chan = jnp.clip(rgb[c], 0.0, 1.0)
        if is_uint8:
            # f32→u8 via int32 (no direct cast in Mosaic); truncation
            # matches torch's .to(uint8) semantics.
            chan = jnp.clip(chan * 255.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
        out_ref[0, c] = chan


@functools.partial(jax.jit, static_argnames=("interpret",))
def reinhard_apply_pallas(
    images: jnp.ndarray,
    lab_mean: jnp.ndarray,
    lab_std: jnp.ndarray,
    reference_mean: jnp.ndarray,
    reference_std: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Apply the Reinhard affine transfer in one fused pass.

    ``images``: (N, 3, H, W) uint8 or float [0,1]; stats: (3,) each.
    Output matches the input dtype (uint8 → [0,255], float → [0,1]).
    """
    if interpret is None:
        interpret = interpret_mode()
    is_uint8 = images.dtype == jnp.uint8
    n, c, h, w = images.shape
    p = h * w
    pad = (-p) % (_SUB * _LANE)
    flat = images.reshape(n, c, p)
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)))
    s = flat.shape[2] // _LANE
    x4 = flat.reshape(n, c, s, _LANE)

    params = jnp.stack(
        [
            lab_mean.astype(jnp.float32),
            lab_std.astype(jnp.float32),
            reference_mean.astype(jnp.float32),
            reference_std.astype(jnp.float32),
        ]
    )  # (4, 3)

    # Tile the pixel dimension; each grid step sees all 3 channels.
    tile_s = _pick_tile(s, 512)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, s // tile_s),
        in_specs=[
            pl.BlockSpec(
                (1, c, tile_s, _LANE), lambda i, t, params: (i, 0, t, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, c, tile_s, _LANE), lambda i, t, params: (i, 0, t, 0), memory_space=pltpu.VMEM
        ),
    )

    kernel = functools.partial(_reinhard_kernel, is_uint8=is_uint8)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x4.shape, images.dtype),
        interpret=interpret,
    )(params, x4)

    out = out.reshape(n, c, s * _LANE)
    if pad:
        out = out[:, :, :p]
    return out.reshape(n, c, h, w)


def _reinhard_moments_kernel(x_ref, out_ref, acc, *, is_uint8: bool, center: float):
    i = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((i == 0) & (t == 0))
    def _init():
        acc[...] = jnp.zeros_like(acc)

    if is_uint8:
        planes = [x_ref[0, c].astype(jnp.int32).astype(jnp.float32) / 255.0 for c in range(3)]
    else:
        planes = [x_ref[0, c].astype(jnp.float32) for c in range(3)]
    lab = rgb_planes_to_lab(planes)
    for c in range(3):
        y = lab[c] - center
        acc[c] += y
        acc[3 + c] += y * y

    @pl.when((i == pl.num_programs(0) - 1) & (t == pl.num_programs(1) - 1))
    def _flush():
        for j in range(6):
            out_ref[j] = jnp.sum(acc[j])


@functools.partial(jax.jit, static_argnames=("interpret",))
def reinhard_moments_pallas(
    images: jnp.ndarray, interpret: bool | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-global CENTERED LAB moments from the raw bytes.

    ``images``: (N, 3, H, W) uint8 or float [0,1] → ``(sum, sumsq)``, each
    (3,) f32, centered on ``ops.reinhard.LAB_MOMENT_CENTER`` — exactly the
    additive statistics of :func:`stainx_tpu.ops.reinhard.lab_moments`
    (the jnp twin) with the pixel count ``N·H·W`` known statically. The
    accumulator is a per-lane VMEM vector (magnitudes stay ~tile-count ×
    channel range; one tree-reduce at the flush), the same f32-stability
    scheme as the Macenko kernels' in-kernel moments. Zero padding is subtracted exactly
    via the pad pixels' constant LAB value.
    """
    if interpret is None:
        interpret = interpret_mode()
    from stainx_tpu.ops.reinhard import LAB_MOMENT_CENTER

    is_uint8 = images.dtype == jnp.uint8
    n, c, h, w = images.shape
    p = h * w
    pad = (-p) % (_SUB * _LANE)
    flat = images.reshape(n, c, p)
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)))
    s = flat.shape[2] // _LANE
    x4 = flat.reshape(n, c, s, _LANE)

    tile_s = _pick_tile(s, 512)

    out = pl.pallas_call(
        functools.partial(
            _reinhard_moments_kernel, is_uint8=is_uint8, center=float(LAB_MOMENT_CENTER)
        ),
        grid=(n, s // tile_s),
        in_specs=[
            pl.BlockSpec(
                (1, c, tile_s, _LANE), lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((6,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6, tile_s, _LANE), jnp.float32)],
        interpret=interpret,
    )(x4)

    s1, s2 = out[:3], out[3:]
    if pad:
        # Zero padding contributes LAB(black) — a constant — per pad pixel;
        # subtract its centered moments exactly (the same pad-correction
        # scheme the histogram kernel uses for its bin-0 padding).
        from stainx_tpu.ops import color

        lab_pad = (
            color.rgb_to_lab(jnp.zeros((1, 3, 1, 1), jnp.float32), channel_axis=1).reshape(3)
            - LAB_MOMENT_CENTER
        )
        pad_total = jnp.float32(n * pad)
        s1 = s1 - pad_total * lab_pad
        s2 = s2 - pad_total * lab_pad * lab_pad
    return s1, s2
