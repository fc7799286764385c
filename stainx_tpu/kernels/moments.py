"""Pallas TPU kernel: fused Macenko OD + β-mask + moment reduction.

One pass from raw uint8/float pixels to the additive per-image covariance
statistics — the role of the reference's warp-shuffle CUDA reduction
(``csrc/macenko.cu:145-262``) without its separate OD materialization. The
reference kernel accumulates the β-masked and all-pixel moment sets
side-by-side (``csrc/macenko.cu:160-190``); here the all-pixel set (needed
only for the rare <3-valid-pixels fallback) runs as a second kernel
instance under ``lax.cond``, so the common case pays for 10 accumulators,
not 20.

Numerics: moments accumulate about a fixed center (OD ≈ 1.0 for H&E),
which removes the E[xxᵀ]−μμᵀ cancellation that forced the reference to
fp64 — the covariance formula is center-invariant, so
:func:`stainx_tpu.ops.macenko.cov_from_moments` applies unchanged.
Accumulation uses per-scalar (tile, 128) VMEM vector partials (no
cross-lane reduces in the hot loop); the collapse to scalars runs once per
image at the final tile.
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
_N_ACC = 10  # [cnt, s0, s1, s2, xx, xy, xz, yy, yz, zz]


def _pick_tile(s: int, max_tile: int) -> int:
    """Largest sublane-aligned (×8) divisor of ``s`` up to ``max_tile``;
    falls back to the full dimension (block == array dim is always legal)."""
    for t in range(min(s, max_tile), 7, -1):
        if s % t == 0 and t % 8 == 0:
            return t
    return s
_IO = 240.0
_BETA = 0.15
CENTER = 1.0  # fixed OD centering for f32-stable second moments


def _moments_kernel(x_ref, out_ref, acc, *, is_uint8: bool, masked: bool):
    i = pl.program_id(0)
    t = pl.program_id(1)
    num_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    if is_uint8:
        planes = [x_ref[0, c].astype(jnp.int32).astype(jnp.float32) for c in range(3)]
        od = [-jnp.log((p + 1.0) / _IO) for p in planes]
    else:
        planes = [x_ref[0, c].astype(jnp.float32) for c in range(3)]
        od = [-jnp.log((p * 255.0 + 1.0) / _IO) for p in planes]

    if masked:
        od_min = jnp.minimum(jnp.minimum(od[0], od[1]), od[2])
        w = (od_min >= _BETA).astype(jnp.float32)
    else:
        w = jnp.ones_like(od[0])
    y = [o - CENTER for o in od]

    prods = [
        y[0], y[1], y[2],
        y[0] * y[0], y[0] * y[1], y[0] * y[2],
        y[1] * y[1], y[1] * y[2], y[2] * y[2],
    ]
    acc[0] += w
    if masked:
        for j, p in enumerate(prods):
            acc[1 + j] += w * p
    else:
        for j, p in enumerate(prods):
            acc[1 + j] += p

    @pl.when(t == num_t - 1)
    def _flush():
        for j in range(_N_ACC):
            out_ref[i, j] = jnp.sum(acc[j])


def _unpack(block):
    cnt = block[:, 0]
    s1 = block[:, 1:4]
    s2 = jnp.stack(
        [
            jnp.stack([block[:, 4], block[:, 5], block[:, 6]], axis=-1),
            jnp.stack([block[:, 5], block[:, 7], block[:, 8]], axis=-1),
            jnp.stack([block[:, 6], block[:, 8], block[:, 9]], axis=-1),
        ],
        axis=-2,
    )
    return cnt, s1, s2


@functools.partial(jax.jit, static_argnames=("masked", "interpret"))
def od_moments_pallas(images: jnp.ndarray, masked: bool = True, interpret: bool | None = None):
    """(N, 3, H, W) uint8/float → per-image OD moments ``(cnt, s1, s2)``:
    counts (N,), centered sums (N, 3), centered outer-product sums
    (N, 3, 3) — over the β-masked pixels (``masked=True``) or all pixels.
    Padding pixels (white) never enter the masked set; the all-pixel sums
    are pad-corrected exactly.
    """
    if interpret is None:
        interpret = interpret_mode()
    n, c, h, w = images.shape
    p = h * w
    pad = (-p) % (_SUB * _LANE)
    flat = images.reshape(n, c, p)
    if pad:
        pad_value = 255 if images.dtype == jnp.uint8 else 1.0
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)), constant_values=pad_value)
    s = flat.shape[2] // _LANE
    x4 = flat.reshape(n, c, s, _LANE)

    tile_s = _pick_tile(s, 256)

    out = pl.pallas_call(
        functools.partial(_moments_kernel, is_uint8=images.dtype == jnp.uint8, masked=masked),
        grid=(n, s // tile_s),
        in_specs=[
            pl.BlockSpec((1, c, tile_s, _LANE), lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, _N_ACC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_N_ACC, tile_s, _LANE), jnp.float32)],
        interpret=interpret,
    )(x4)

    cnt, s1, s2 = _unpack(out)
    if pad and not masked:
        # White padding: od = -log(256/240) per channel; correct the sums.
        od_pad = -jnp.log(256.0 / _IO) - CENTER
        pad_f = float(pad)
        cnt = cnt - pad_f
        s1 = s1 - pad_f * od_pad
        s2 = s2 - pad_f * od_pad * od_pad
    return cnt, s1, s2
