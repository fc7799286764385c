"""Fully-fused Pallas Macenko hot path: raw pixels → percentile results.

The jnp pipeline materializes OD (N·P·3 f32), the projected angle field and
both concentration fields in HBM between stages. These kernels instead load
each image's RAW uint8/float row into VMEM once and compute everything —
OD, β-mask, stain-plane projection, concentrations, radix rank selection —
on-chip, writing back only per-image scalars:

- :func:`phi_select_pallas` — OD → projection → angle percentiles.
  Selection runs on a **monotone pseudo-angle** (the piecewise-rational
  "diamond angle", order-isomorphic to atan2 on (−π, π]) because Mosaic has
  no atan2 lowering — and none is needed: the reference only ever uses
  cos(φ*)/sin(φ*) of the percentile pixel (``torch_backend.py:502-510``),
  which are recovered exactly as t0/‖t‖, t1/‖t‖ of the selected member.
- :func:`c_select_pallas` — OD → 2×2-normal-equation concentrations → 99th
  percentiles of C0 and C1.

Both reuse the radix-descent machinery of
:mod:`stainx_tpu.kernels.selection` (bit-exact, scalar-only while carry).
HBM traffic for the whole Macenko transform drops to ~3 reads of the uint8
input + 1 write of the output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainx_tpu.kernels import interpret_mode
from stainx_tpu.kernels.selection import _monotone_key

_B = 16
_LANE = 128
_IO = 240.0
_BETA = 0.15
MAX_ROW_BYTES = 6 * 1024 * 1024  # input row VMEM budget


def _radix_select_value(key, x_fields, r0):
    """In-kernel radix descent on ``key`` (uint32, any shape); returns the
    rank-``r0`` element's value for every array in ``x_fields`` (each the
    same shape as key), resolved per-field via the member mask."""

    def cond(state):
        _, _, it, done = state
        return jnp.logical_not(done) & (it < 8)

    def body(state):
        prefix, r, it, _ = state
        shift = (28 - 4 * it).astype(jnp.uint32)
        group = jax.lax.shift_right_logical(key, jnp.broadcast_to(shift, key.shape))
        base = jax.lax.shift_left(prefix, jnp.uint32(4))
        counts = [jnp.sum((group == (base | jnp.uint32(j))).astype(jnp.int32)) for j in range(_B)]
        cums = []
        cum = jnp.int32(0)
        for j in range(_B):
            cum = cum + counts[j]
            cums.append(cum)
        bsel = jnp.int32(0)
        for j in range(_B):
            bsel = bsel + (cums[j] <= r).astype(jnp.int32)
        bsel = jnp.minimum(bsel, _B - 1)
        below = jnp.int32(0)
        sel_count = counts[0]
        for j in range(1, _B):
            below = jnp.where(bsel == j, cums[j - 1], below)
            sel_count = jnp.where(bsel == j, counts[j], sel_count)
        new_prefix = base | bsel.astype(jnp.uint32)
        return new_prefix, r - below, it + 1, sel_count <= 1

    prefix, _, it, _ = jax.lax.while_loop(
        cond, body, (jnp.uint32(0), r0, jnp.int32(0), jnp.asarray(False))
    )
    shift = (32 - 4 * it).astype(jnp.uint32)
    member = jax.lax.shift_right_logical(key, jnp.broadcast_to(shift, key.shape)) == prefix
    # The members of the final prefix share their key's value bits down to
    # the consumed depth; for the value fields take the member minimizing
    # the key (= the selected rank element, up to key-identical duplicates).
    # Mosaic has no unsigned reductions: flip the sign bit for an
    # order-preserving int32 view and reduce that.
    ikey = jax.lax.bitcast_convert_type(key ^ jnp.uint32(0x80000000), jnp.int32)
    kmin = jnp.min(jnp.where(member, ikey, jnp.int32(0x7FFFFFFF)))
    chosen = member & (ikey == kmin)
    picked = []
    for f in x_fields:
        picked.append(jnp.max(jnp.where(chosen, f, -jnp.inf)))
    return picked


def _od_planes(x_ref, is_uint8: bool):
    if is_uint8:
        planes = [x_ref[0, c].astype(jnp.int32).astype(jnp.float32) for c in range(3)]
        return [-jnp.log((p + 1.0) / _IO) for p in planes]
    planes = [x_ref[0, c].astype(jnp.float32) for c in range(3)]
    return [-jnp.log((p * 255.0 + 1.0) / _IO) for p in planes]


def _pseudo_angle(t0, t1):
    """Diamond angle: piecewise-rational, order-isomorphic to atan2(t1, t0)
    on (−π, π] (range (−2, 2])."""
    s = jnp.abs(t0) + jnp.abs(t1) + 1e-37
    a = t1 / s
    return jnp.where(t0 >= 0, a, jnp.where(t1 >= 0, 2.0 - a, -2.0 - a))


def _phi_select_kernel(ranks_ref, params_ref, x_ref, out_ref, *, is_uint8: bool, p_true: int):
    i = pl.program_id(0)
    od = _od_planes(x_ref, is_uint8)

    v = [[params_ref[i, c * 2 + k] for k in range(2)] for c in range(3)]  # (3,2) evecs
    use_all = params_ref[i, 6] > 0.5

    t0 = od[0] * v[0][0] + od[1] * v[1][0] + od[2] * v[2][0]
    t1 = od[0] * v[0][1] + od[1] * v[1][1] + od[2] * v[2][1]
    pseudo = _pseudo_angle(t0, t1)

    od_min = jnp.minimum(jnp.minimum(od[0], od[1]), od[2])
    s, lane = od[0].shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (s, lane), 0) * lane + jax.lax.broadcasted_iota(
        jnp.int32, (s, lane), 1
    )
    in_image = idx < p_true
    mask = ((od_min >= _BETA) | use_all) & in_image

    key = _monotone_key(jnp.where(mask, pseudo, jnp.inf))
    for k in range(2):
        c_sel, s_sel = _radix_select_value(key, (t0, t1), ranks_ref[i, k])
        norm = jnp.sqrt(c_sel * c_sel + s_sel * s_sel)
        inv = jnp.where(norm > 1e-30, 1.0 / norm, 0.0)
        out_ref[i, 2 * k] = c_sel * inv  # cos(φ*)
        out_ref[i, 2 * k + 1] = s_sel * inv  # sin(φ*)


def _c_select_kernel(ranks_ref, params_ref, x_ref, out_ref, *, is_uint8: bool, p_true: int):
    i = pl.program_id(0)
    od = _od_planes(x_ref, is_uint8)

    m = [[params_ref[i, r * 3 + c] for c in range(3)] for r in range(2)]  # (2,3) solve matrix

    s, lane = od[0].shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (s, lane), 0) * lane + jax.lax.broadcasted_iota(
        jnp.int32, (s, lane), 1
    )
    in_image = idx < p_true

    for k in range(2):
        ck = od[0] * m[k][0] + od[1] * m[k][1] + od[2] * m[k][2]
        key = _monotone_key(jnp.where(in_image, ck, jnp.inf))
        (val,) = _radix_select_value(key, (ck,), ranks_ref[i, k])
        out_ref[i, k] = val


def _row_layout(images: jnp.ndarray):
    n, c, h, w = images.shape
    p = h * w
    pad = (-p) % (8 * _LANE)
    flat = images.reshape(n, c, p)
    if pad:
        pad_value = 255 if images.dtype == jnp.uint8 else 1.0
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)), constant_values=pad_value)
    s = flat.shape[2] // _LANE
    return flat.reshape(n, c, s, _LANE), p, s


def fused_row_budget_ok(images_shape, dtype) -> bool:
    _, c, h, w = images_shape
    itemsize = 1 if dtype == jnp.uint8 else 4
    return c * h * w * itemsize <= MAX_ROW_BYTES


@functools.partial(jax.jit, static_argnames=("interpret",))
def phi_select_pallas(images, evecs, use_all, ranks, interpret: bool | None = None):
    """images (N,3,H,W) u8/f32; evecs (N,3,2); use_all (N,) bool;
    ranks (N,2) int32 → (cos,sin) of both φ percentiles as (N,2,2)."""
    if interpret is None:
        interpret = interpret_mode()
    x4, p_true, s = _row_layout(images)
    n = x4.shape[0]
    params = jnp.concatenate(
        [evecs.reshape(n, 6).astype(jnp.float32), use_all.astype(jnp.float32)[:, None]], axis=1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, s, _LANE), lambda i, ranks, params: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    kernel = functools.partial(
        _phi_select_kernel, is_uint8=images.dtype == jnp.uint8, p_true=p_true
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        interpret=interpret,
    )(ranks.astype(jnp.int32), params, x4)
    return out.reshape(n, 2, 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def c_select_pallas(images, solve_m, ranks, interpret: bool | None = None):
    """images (N,3,H,W); solve_m (N,2,3) = inv(HEᵀHE)HEᵀ rows; ranks (N,2)
    int32 → 99th-percentile concentrations (N,2) [maxC0, maxC1]."""
    if interpret is None:
        interpret = interpret_mode()
    x4, p_true, s = _row_layout(images)
    n = x4.shape[0]
    params = solve_m.reshape(n, 6).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, s, _LANE), lambda i, ranks, params: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    kernel = functools.partial(_c_select_kernel, is_uint8=images.dtype == jnp.uint8, p_true=p_true)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 2), jnp.float32),
        interpret=interpret,
    )(ranks.astype(jnp.int32), params, x4)
