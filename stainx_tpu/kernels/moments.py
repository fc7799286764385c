"""Pallas TPU kernel: fused Macenko OD + β-mask + masked moment reduction.

One pass from raw uint8/float pixels to the 11 additive per-image scalars
(masked count / Σx / Σxxᵀ plus the unmasked count) — the role of the
reference's warp-shuffle CUDA reduction (``csrc/macenko.cu:145-262``, the
10-register accumulator layout) without its separate OD materialization.
Accumulation happens in per-scalar (8, 128) VMEM vector partials (no
cross-lane reduces in the hot loop); the collapse to scalars runs once per
image at the final tile.

Feeds :func:`stainx_tpu.ops.macenko.cov_from_moments` — covariance from
moments is the formulation that also distributes losslessly under
cross-chip ``psum`` (SURVEY §2.3/§5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainx_tpu.kernels import interpret_mode

_LANE = 128
_SUB = 8
_N_ACC = 11  # [masked: cnt, s0, s1, s2, xx, xy, xz, yy, yz, zz] + total cnt
_IO = 240.0
_BETA = 0.15


def _moments_kernel(x_ref, out_ref, acc, *, is_uint8: bool):
    i = pl.program_id(0)
    t = pl.program_id(1)
    num_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    if is_uint8:
        # Mosaic has no direct u8→f32 cast; hop through int32.
        planes = [x_ref[0, c].astype(jnp.int32).astype(jnp.float32) for c in range(3)]
        od = [-jnp.log((p + 1.0) / _IO) for p in planes]
    else:
        planes = [x_ref[0, c].astype(jnp.float32) for c in range(3)]
        od = [-jnp.log((p * 255.0 + 1.0) / _IO) for p in planes]

    od_min = jnp.minimum(jnp.minimum(od[0], od[1]), od[2])
    w = (od_min >= _BETA).astype(jnp.float32)

    acc[0] += w
    acc[1] += w * od[0]
    acc[2] += w * od[1]
    acc[3] += w * od[2]
    acc[4] += w * od[0] * od[0]
    acc[5] += w * od[0] * od[1]
    acc[6] += w * od[0] * od[2]
    acc[7] += w * od[1] * od[1]
    acc[8] += w * od[1] * od[2]
    acc[9] += w * od[2] * od[2]
    acc[10] += jnp.ones_like(w)

    @pl.when(t == num_t - 1)
    def _flush():
        for j in range(_N_ACC):
            out_ref[i, j] = jnp.sum(acc[j])


@functools.partial(jax.jit, static_argnames=("interpret",))
def od_moments_pallas(images: jnp.ndarray, interpret: bool | None = None):
    """(N, 3, H, W) uint8/float → per-image masked OD moments.

    Returns ``(cnt, s1, s2, total)``: (N,), (N, 3), (N, 3, 3), (N,) —
    the additive statistics behind the Macenko covariance.
    """
    if interpret is None:
        interpret = interpret_mode()
    n, c, h, w = images.shape
    p = h * w
    pad = (-p) % (_SUB * _LANE)
    flat = images.reshape(n, c, p)
    if pad:
        # Pad with white pixels (od ≈ min → below β) so they never enter the
        # masked sums; the unmasked total is corrected below.
        pad_value = 255 if images.dtype == jnp.uint8 else 1.0
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)), constant_values=pad_value)
    s = flat.shape[2] // _LANE
    x4 = flat.reshape(n, c, s, _LANE)

    tile_s = min(s, 512)
    while s % tile_s:
        tile_s -= 1

    out = pl.pallas_call(
        functools.partial(_moments_kernel, is_uint8=images.dtype == jnp.uint8),
        grid=(n, s // tile_s),
        in_specs=[
            pl.BlockSpec((1, c, tile_s, _LANE), lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, _N_ACC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_N_ACC, tile_s, _LANE), jnp.float32)],
        interpret=interpret,
    )(x4)

    cnt = out[:, 0]
    s1 = out[:, 1:4]
    s2 = jnp.stack(
        [
            jnp.stack([out[:, 4], out[:, 5], out[:, 6]], axis=-1),
            jnp.stack([out[:, 5], out[:, 7], out[:, 8]], axis=-1),
            jnp.stack([out[:, 6], out[:, 8], out[:, 9]], axis=-1),
        ],
        axis=-2,
    )
    total = out[:, 10] - float(pad)
    return cnt, s1, s2, total
