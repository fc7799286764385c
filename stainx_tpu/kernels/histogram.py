"""Pallas TPU kernel: per-channel 256-bin histogram of uint8 data.

TPU-native replacement for the reference's shared-memory-atomic CUDA
histogram pipeline (``csrc/histogram_matching.cu:49-95``). TPUs have no
atomics and no vector scatter; counting costs Θ(bins) compares per element
on the VPU, so the kernel's job is to run exactly that and nothing else:

- a large uint8 chunk (512 K values) stays **VMEM-resident** per grid step;
- bins iterate **outer**, tiles inner, so the single (32, 128) partial-count
  plane for the current bin lives in registers — the naive bin-inner order
  drags a 4 MB accumulator through VMEM for every 16 KB tile and is ~20×
  slower;
- compares run at int32 width with int16 partial counts (Mosaic supports
  only i16/i32 vector arithmetic; per-slot counts stay ≤ TILES_PER_CHUNK ≪
  32767, so no overflow flush is needed within a chunk);
- per-bin scalars accumulate into an SMEM output revisited across chunks.

The jnp twin is :func:`stainx_tpu.ops.histogram_matching.histogram_256`;
parity is tested in interpret mode and on the compiled path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainx_tpu.kernels import interpret_mode

_SUB = 32  # uint8 native sublane tile
_LANE = 128
_TILES_PER_CHUNK = 128  # 128 × (32, 128) = 512 K values resident per step
_CHUNK = _TILES_PER_CHUNK * _SUB * _LANE


def _hist_kernel(x_ref, out_ref):
    ci = pl.program_id(0)
    t = pl.program_id(1)

    def count_bin(j, _):
        # int16 partials over the chunk for bin j (Mosaic supports only
        # i16/i32 vectors; per-slot counts ≤ TILES_PER_CHUNK ≪ 32767, so no
        # overflow flush is needed within a chunk).
        def tile_step(ti, partial):
            tile = x_ref[0, 0, pl.ds(ti * _SUB, _SUB), :].astype(jnp.int32)
            return partial + (tile == j).astype(jnp.int16)

        partial0 = jnp.zeros((_SUB, _LANE), jnp.int16)
        partial = jax.lax.fori_loop(0, _TILES_PER_CHUNK, tile_step, partial0)
        total = jnp.sum(partial.astype(jnp.int32))

        @pl.when(t == 0)
        def _first():
            out_ref[ci, j] = total.astype(jnp.float32)

        @pl.when(t != 0)
        def _rest():
            out_ref[ci, j] = out_ref[ci, j] + total.astype(jnp.float32)

        return 0

    jax.lax.fori_loop(0, 256, count_bin, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram_256_pallas(values_u8: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """(C, P) uint8 → (C, 256) float32 counts."""
    if interpret is None:
        interpret = interpret_mode()
    c, p = values_u8.shape
    pad = (-p) % _CHUNK
    if pad:
        # Pad with 0 and subtract the pad count from bin 0 afterwards.
        values_u8 = jnp.pad(values_u8, ((0, 0), (0, pad)), constant_values=0)
    chunks = values_u8.shape[1] // _CHUNK
    x = values_u8.reshape(c, chunks, _TILES_PER_CHUNK * _SUB, _LANE)

    counts = pl.pallas_call(
        _hist_kernel,
        grid=(c, chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, _TILES_PER_CHUNK * _SUB, _LANE),
                lambda ci, ti: (ci, ti, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((c, 256), jnp.float32),
        interpret=interpret,
    )(x)

    if pad:
        counts = counts.at[:, 0].add(-float(pad))
    return counts
