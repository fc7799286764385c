"""Pallas TPU kernel: per-channel 256-bin histogram of uint8 data.

TPU-native replacement for the reference's shared-memory-atomic CUDA
histogram pipeline (``csrc/histogram_matching.cu:49-95`` — 4096-px tiles,
shared-mem atomics, then a cross-block reduce). TPUs have no atomics and no
vector scatter; instead each grid step accumulates a per-bin one-hot into a
VMEM accumulator laid out as (256, 32, 128): bin ``j`` keeps a full
(32, 128) vector of partial counts so the inner loop is pure elementwise
VPU work (no reduces, no relayouts), and the (32, 128) planes collapse to
scalars once per channel at the final tile.

The jnp twin is :func:`stainx_tpu.ops.histogram_matching.histogram_256`;
parity is tested in interpret mode and the kernel is only selected on the
``pallas`` backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainx_tpu.kernels import interpret_mode

_SUB = 32  # uint8 min sublane tile
_LANE = 128
_TILE = _SUB * _LANE  # 4096 px per grid step


def _hist_kernel(x_ref, out_ref, acc):
    ci = pl.program_id(0)
    t = pl.program_id(1)
    num_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    v = x_ref[0, 0].astype(jnp.int32)  # (32, 128)
    for j in range(256):
        acc[j] += (v == j).astype(jnp.int32)

    @pl.when(t == num_t - 1)
    def _flush():
        # Stay ≥2D throughout (Mosaic's layout inference rejects rank-1
        # vectors) and write this channel's (256, 1) column once.
        s1 = jnp.sum(acc[...], axis=2)  # (256, 32)
        out_ref[ci] = jnp.sum(s1, axis=1, keepdims=True).astype(jnp.float32)  # (256, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram_256_pallas(values_u8: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """(C, P) uint8 → (C, 256) float32 counts. P is padded to a 4096 multiple
    with a sentinel that lands outside every bin."""
    if interpret is None:
        interpret = interpret_mode()
    c, p = values_u8.shape
    pad = (-p) % _TILE
    if pad:
        # 255 would pollute bin 255; pad with 0 and subtract the pad count.
        values_u8 = jnp.pad(values_u8, ((0, 0), (0, pad)), constant_values=0)
    t = values_u8.shape[1] // _TILE
    x = values_u8.reshape(c, t, _SUB, _LANE)

    counts = pl.pallas_call(
        _hist_kernel,
        grid=(c, t),
        in_specs=[
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda ci, ti: (ci, ti, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((c, 256, 1), lambda ci, ti: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 256, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((256, _SUB, _LANE), jnp.int32)],
        interpret=interpret,
    )(x).reshape(c, 256)

    if pad:
        counts = counts.at[:, 0].add(-float(pad))
    return counts
