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
        # Accumulate across chunks in int32: an f32 running count loses
        # integer exactness once a bin passes 2²⁴ (~16.8M same-valued
        # pixels), breaking the bit-exact-twin contract with the int32-
        # summed jnp histogram (round-3 review finding). The f32 cast
        # happens once, at the caller.
        total = jnp.sum(partial.astype(jnp.int32))

        @pl.when(t == 0)
        def _first():
            out_ref[ci, j] = total

        @pl.when(t != 0)
        def _rest():
            out_ref[ci, j] = out_ref[ci, j] + total

        return 0

    jax.lax.fori_loop(0, 256, count_bin, 0)


# ---------------------------------------------------------------------------
# Fused MXU histogram: one-hot construction + contraction in one VMEM pass.
#
# The jnp MXU path (``ops.histogram_matching.histogram_256``) is EXACT and 7×
# the VPU floor, but XLA materializes both (P, 16) nibble one-hots in HBM —
# ~64 B/px of traffic for a 3 B/px problem (measured: the histogram is ~92%
# of the HM transform). This kernel builds the one-hots in VMEM registers,
# contracts them on the MXU immediately (an NT matmul, the flash-attention
# q·kᵀ pattern), and accumulates int32 — HBM traffic collapses to one uint8
# read. This is the "in-kernel fused construction+contraction" experiment the
# round-2 benchmarks named; counterpart of the reference's shared-memory-
# atomic CUDA histogram (``csrc/histogram_matching.cu:49-95``).
#
# Layout (all measured on v5e, 64×3×512² uint8):
# - data blocks are native (32, 2048) uint8 tiles — a flat (1, CHUNK) block
#   leaves 31/32 of every VMEM tile/DMA empty and ran 4× slower;
# - each chunk is processed as four 8-sublane slices, each expanded to a
#   (128, CK) one-hot (row s·16+a ⇔ data sublane s, nibble value a) and
#   contracted as a full (128, 128) MXU tile. A single 32-sublane slice
#   (512-row one-hots, (512, 512) dot) computes 32 off-diagonal blocks for
#   every real diagonal one and measured 4.4 ms; the sliced form is 1.3 ms.
# ---------------------------------------------------------------------------

_MXU_SUB = 32  # uint8 native sublane tile (input chunk height)
_MXU_CK = 2048  # lanes per chunk -> 64 K values per grid step
_GR = 8  # data sublanes per MXU slice
_NG = _MXU_SUB // _GR  # slices per chunk
_EX = _GR * 16  # one-hot rows per slice: 16 bins per data sublane = 128


def _chunked_5d(values_u8: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
    """(N, C, P) uint8 → ((N, C, T, 32, CK) view, per-(n,c) zero-pad, CK).

    Blocks are native (32, 128·k) uint8 tiles — a flat (1, CHUNK) block
    leaves 31/32 of every VMEM tile (and its DMA) empty, which measured 4×
    slower than the whole fused kernel. Small P shrinks CK so tiny tiles
    don't pad to 64 K."""
    n, c, p = values_u8.shape
    ck = min(_MXU_CK, -(-p // (_MXU_SUB * 128)) * 128)
    chunk = _MXU_SUB * ck
    pad = (-p) % chunk
    if pad:
        values_u8 = jnp.pad(values_u8, ((0, 0), (0, 0), (0, pad)), constant_values=0)
    t = values_u8.shape[-1] // chunk
    return values_u8.reshape(n, c, t, _MXU_SUB, ck), pad, ck


def _expand16(v: jnp.ndarray, ck: int) -> jnp.ndarray:
    """(8, CK) slice → (128, CK): each data sublane repeated 16×, so row
    s·16+a holds sublane s — the one-hot's 16-bin axis folds into the
    sublanes, keeping every tensor a full (8·k, 128·m) tile (Mosaic has no
    lane-merging reshape, so pixels can't move onto the lane axis instead)."""
    return jnp.broadcast_to(v[:, None, :], (_GR, 16, ck)).reshape(_EX, ck)


def _hist_mxu_kernel(x_ref, out_ref, acc, *, ck):
    m = pl.program_id(1)
    nm = pl.num_programs(1)

    @pl.when(m == 0)
    def _reset():
        acc[...] = jnp.zeros_like(acc)

    v = x_ref[0, 0, 0].astype(jnp.int32)  # (32, CK)
    a_io = jax.lax.broadcasted_iota(jnp.int32, (_EX, ck), 0) & 15
    for g in range(_NG):
        vg = v[g * _GR : (g + 1) * _GR]  # (8, CK)
        hi = (a_io == _expand16(vg >> 4, ck)).astype(jnp.bfloat16)  # (128, CK)
        lo = (a_io == _expand16(vg & 15, ck)).astype(jnp.bfloat16)
        # NT contraction over lanes: cnt[(s,a), (s',b)] = Σ_l hi[s·16+a, l]·
        # lo[s'·16+b, l] — one full (128, 128) MXU tile per slice; only the
        # s == s' diagonal blocks are real joint counts, extracted at emit.
        # One-hot products are exact, per-cell chunk counts ≤ CK are exact
        # in f32, and chunks accumulate in int32 (no 2²⁴ ceiling).
        cnt = jax.lax.dot_general(
            hi, lo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        blk = slice(g * _EX, (g + 1) * _EX)
        acc[blk, :] = acc[blk, :] + cnt.astype(jnp.int32)

    @pl.when(m == nm - 1)
    def _emit():
        # acc rows are [slice g][s∈8][a∈16]; each (128, 128) block g pairs
        # only with its own slice's columns (s'∈8, b∈16). Keep the s == s'
        # diagonal, sum rows over (g, s), then fold the 8 column groups.
        r = jax.lax.broadcasted_iota(jnp.int32, (_NG * _EX, _EX), 0)
        c_ = jax.lax.broadcasted_iota(jnp.int32, (_NG * _EX, _EX), 1)
        masked = jnp.where(((r & (_EX - 1)) >> 4) == (c_ >> 4), acc[...], 0)
        g = jnp.sum(masked.reshape(_NG * _GR, 16, _EX), axis=0)  # (16, 128)
        tot = jnp.zeros((16, 16), jnp.int32)
        for s in range(_GR):
            tot = tot + g[:, s * 16 : (s + 1) * 16]
        out_ref[0] = jnp.pad(tot, ((0, 0), (0, 112)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram_256_mxu(values_u8: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """uint8 per-channel 256-bin counts — fused one-hot+MXU kernel.

    Accepts ``(C, P)`` or channels-first ``(N, C, P)`` (no host transpose:
    the grid walks the batch axis, so NCHW batches reshape in for free).
    Returns (C, 256) float32. Bit-exact twin of
    :func:`stainx_tpu.ops.histogram_matching.histogram_256` (counts are
    exact integers under any chunking).
    """
    if interpret is None:
        interpret = interpret_mode()
    if values_u8.ndim == 2:
        values_u8 = values_u8[None]
    n, c, _p = values_u8.shape
    if _p == 0:
        # Degenerate empty field: _chunked_5d's chunk math divides by zero
        # and a 0-step grid never writes its output (round-3 review
        # finding); the XLA twin returns all-zero counts.
        return jnp.zeros((c, 256), jnp.float32)
    x, pad, ck = _chunked_5d(values_u8)
    t = x.shape[2]

    out = pl.pallas_call(
        functools.partial(_hist_mxu_kernel, ck=ck),
        grid=(c, n * t),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, _MXU_SUB, ck),
                lambda ci, m: (m // t, ci, m % t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec((1, 16, 128), lambda ci, m: (ci, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 16, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_NG * _EX, _EX), jnp.int32)],
        interpret=interpret,
    )(x)

    counts = out[:, :, :16].reshape(c, 256)  # int32, exact under any chunking
    if pad:
        # Integer-domain pad subtraction: casting first lets f32 rounding
        # past 2²⁴ make the result depend on the pad size (the jnp twin
        # pads differently — round-3 review finding).
        counts = counts.at[:, 0].add(-n * pad)
    return counts.astype(jnp.float32)


def _apply_lut_kernel(x_ref, lut_ref, out_ref, *, ck):
    v = x_ref[0, 0, 0].astype(jnp.int32)  # (32, CK)
    a_io = jax.lax.broadcasted_iota(jnp.int32, (_EX, ck), 0) & 15
    outs = []
    for g in range(_NG):
        vg = v[g * _GR : (g + 1) * _GR]  # (8, CK)
        lo = (a_io == _expand16(vg & 15, ck)).astype(jnp.bfloat16)  # (128, CK)
        # Block-diagonal LUT: m[(s,a), l] = lut[a, lo-nibble value at
        # (s, l)] — a single exact bf16 integer per cell (the off-diagonal
        # blocks of lut_ref are zero, so exactly one product survives).
        # One full (128, 128) MXU tile per slice.
        m = jax.lax.dot_general(
            lut_ref[0], lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (128, CK) f32, exact ints ≤ 255
        sel = jnp.where(a_io == _expand16(vg >> 4, ck), m, 0.0)
        outs.append(jnp.sum(sel.reshape(_GR, 16, ck), axis=1))  # (8, CK)
    out = jnp.concatenate(outs, axis=0)  # (32, CK)
    out_ref[0, 0, 0] = out.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_lut_u8_mxu(
    values_u8: jnp.ndarray, lut: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """(N, C, P) uint8, (C, 256) f32 LUT → (N, C, P) uint8 ``⌊lut[c, v]⌋``.

    Fused per-pixel 256-entry lookup: lo-nibble one-hot × block-diagonal
    LUT on the MXU + hi-nibble select, all in one VMEM pass — no host
    transpose, no HBM one-hot materialization, no gather (XLA's TPU gather
    serializes). The LUT is floored to integers host-side (exact in bf16),
    which matches the uint8 output contract exactly: for x ∈ [0, 255],
    uint8(clip(x)) == ⌊x⌋, the truncation the reference's ``.to(uint8)``
    applies (``torch_backend.py:294-300``). Bit-exact twin:
    ``ops.histogram_matching._apply_lut`` + clip + truncation."""
    if interpret is None:
        interpret = interpret_mode()
    n, c, p = values_u8.shape
    if p == 0:
        return values_u8  # empty field: nothing to look up
    x, pad, ck = _chunked_5d(values_u8)
    t = x.shape[2]
    lut3d = jnp.floor(jnp.clip(lut.astype(jnp.float32), 0.0, 255.0)).reshape(c, 16, 16)
    eye = jnp.eye(_GR, dtype=jnp.float32)
    lbd = jax.vmap(lambda l2: jnp.kron(eye, l2))(lut3d).astype(jnp.bfloat16)  # (C, 128, 128)

    out = pl.pallas_call(
        functools.partial(_apply_lut_kernel, ck=ck),
        grid=(n, c, t),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, _MXU_SUB, ck),
                lambda ni, ci, ti: (ni, ci, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, _EX, _EX), lambda ni, ci, ti: (ci, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, _MXU_SUB, ck),
            lambda ni, ci, ti: (ni, ci, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint8),
        interpret=interpret,
    )(x, lbd)

    out = out.reshape(n, c, t * _MXU_SUB * ck)
    return out[:, :, :p] if pad else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram_256_pallas(values_u8: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """(C, P) uint8 → (C, 256) float32 counts."""
    if interpret is None:
        interpret = interpret_mode()
    c, p = values_u8.shape
    if p == 0:
        return jnp.zeros((c, 256), jnp.float32)  # 0-step grid never writes
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
        out_shape=jax.ShapeDtypeStruct((c, 256), jnp.int32),
        interpret=interpret,
    )(x)

    if pad:
        # Subtract the pad in the INTEGER domain: f32(count + pad) can
        # round before an f32 subtraction past 2²⁴, making the result
        # depend on the pad size (round-3 review finding).
        counts = counts.at[:, 0].add(-pad)
    return counts.astype(jnp.float32)
