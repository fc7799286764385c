"""Color-space math and dtype/value-range gates.

Behavioral contract follows the reference's ``TorchBackendBase``
(``src/stainx/backends/torch_backend.py:9-131``):

- ``uint8`` inputs are ``[0, 255]``; float inputs are **always** assumed
  ``[0, 1]`` — never a ``max()>1`` heuristic (ColorJitter can push unit floats
  above 1; ``torch_backend.py:103-113``).
- RGB↔LAB uses the sRGB / D65 pipeline with OpenCV-style scaling:
  ``L`` scaled by 2.55 into ~[0, 255] and ``a``/``b`` offset by +128
  (``torch_backend.py:17-101``; constants also in ``csrc/reinhard.cu:19-42``).
"""

from __future__ import annotations

import jax.numpy as jnp

# sRGB → XYZ (D65) matrix.
_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)

# XYZ → sRGB (inverse of the above, standard values).
_XYZ2RGB = (
    (3.2404542, -1.5371385, -0.4985314),
    (-0.9692660, 1.8760108, 0.0415560),
    (0.0556434, -0.2040259, 1.0572252),
)

# D65 reference white.
_XYZ_REF = (0.95047, 1.0, 1.08883)


def _apply_3x3(matrix, planes):
    """3×3 color transform as elementwise FMAs over channel planes.

    A ``(3,3)·(3,P)`` contraction is bandwidth-bound; on TPU an einsum
    would route it through the MXU, which (a) defaults to bf16-input
    passes — a real precision loss on the cancellation-heavy XYZ→RGB row —
    and (b) breaks the elementwise fusion chain. Channel-plane FMAs keep
    the whole color pipeline in one VPU fusion at exact f32.
    """
    return [
        sum(matrix[i][j] * planes[j] for j in range(3))
        for i in range(3)
    ]


def normalize_to_float(images: jnp.ndarray) -> jnp.ndarray:
    """Convert images to float32 in ``[0, 1]``.

    ``uint8`` is ``[0, 255]``; floats are assumed already ``[0, 1]`` (no
    ``max()>1`` heuristic — ``torch_backend.py:103-113``).
    """
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images.astype(jnp.float32)


def images_to_uint8(images: jnp.ndarray) -> tuple[jnp.ndarray, bool]:
    """Quantize to uint8. Returns ``(uint8_images, needs_scale_back)``.

    Float inputs (assumed [0, 1]) scale by 255 and truncate toward zero,
    matching torch's ``.to(torch.uint8)`` cast (``torch_backend.py:115-120``).
    """
    if images.dtype == jnp.uint8:
        return images, False
    scaled = jnp.clip(images.astype(jnp.float32) * 255.0, 0.0, 255.0)
    return scaled.astype(jnp.uint8), True


def preserve_dtype(
    result: jnp.ndarray,
    original_dtype,
    was_uint8_or_high_range: bool = False,
    result_in_0_255_range: bool = False,
) -> jnp.ndarray:
    """Restore the caller's dtype/value-range convention.

    Mirrors ``preserve_dtype_torch`` (``torch_backend.py:122-131``): a [0, 1]
    result is scaled ×255 when the original input was uint8/high-range; a
    [0, 255] result is clamped; then cast to the original dtype (float→uint8
    truncates toward zero, like torch).
    """
    if not result_in_0_255_range and (original_dtype == jnp.uint8 or was_uint8_or_high_range):
        result = jnp.clip(result * 255.0, 0.0, 255.0)
    elif result_in_0_255_range:
        result = jnp.clip(result, 0.0, 255.0)
    return result.astype(original_dtype)


# The one channel-axis registry (also enforced by
# utils.ChannelFormatConverter): 1/-3 = channels-first, -1/3 = channels-last.
CHANNEL_AXES = (1, -3, -1, 3)


def _nchw(images: jnp.ndarray, channel_axis: int) -> tuple[jnp.ndarray, bool]:
    # Validate instead of guessing: an out-of-registry axis (e.g. 0) was
    # silently read as channels-first, and a 3D HWC image with
    # channel_axis=3 skipped the transpose and sliced the W axis as
    # channels — garbage with no error (round-3 review findings).
    if channel_axis not in CHANNEL_AXES:
        raise ValueError(
            f"channel_axis must be one of {CHANNEL_AXES} (1/-3 NCHW, -1/3 NHWC), got {channel_axis}"
        )
    if images.ndim != 4:
        raise ValueError(
            f"expected a 4D batch (NCHW or NHWC), got shape {tuple(images.shape)}; "
            "add a leading batch dimension first"
        )
    if channel_axis in (-1, 3):
        return jnp.transpose(images, (0, 3, 1, 2)), True
    return images, False


def rgb_planes_to_lab(planes):
    """Plane-level sRGB[0,1] → scaled LAB (the math of ``torch_backend.py:
    17-60``), usable both from the NCHW wrapper and inside Pallas kernels.
    ``planes``: three broadcast-compatible float arrays (R, G, B)."""
    linear = [jnp.where(p > 0.04045, ((p + 0.055) / 1.055) ** 2.4, p / 12.92) for p in planes]
    xyz = _apply_3x3(_RGB2XYZ, linear)

    def f(i):
        t = xyz[i] / _XYZ_REF[i]
        # power instead of cbrt: same math (t > 0 in the selected branch),
        # and cbrt has no Pallas TPU lowering.
        cube_root = jnp.power(jnp.maximum(t, 1e-12), 1.0 / 3.0)
        return jnp.where(t > 0.008856, cube_root, 7.787 * t + 16.0 / 116.0)

    f_x, f_y, f_z = f(0), f(1), f(2)
    L = (116.0 * f_y - 16.0) * 2.55
    a = 500.0 * (f_x - f_y) + 128.0
    b = 200.0 * (f_y - f_z) + 128.0
    return [L, a, b]


def lab_planes_to_rgb(planes):
    """Plane-level inverse of :func:`rgb_planes_to_lab`, clamped to [0, 1]."""
    L = planes[0] / 2.55
    a = planes[1] - 128.0
    b = planes[2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = a / 500.0 + fy
    fz = fy - b / 200.0

    def f_inv(t):
        return jnp.where(t > 0.2068966, t**3, (t - 16.0 / 116.0) / 7.787)

    xyz = [f_inv(fx) * _XYZ_REF[0], f_inv(fy) * _XYZ_REF[1], f_inv(fz) * _XYZ_REF[2]]
    linear = _apply_3x3(_XYZ2RGB, xyz)
    return [
        jnp.clip(
            jnp.where(
                c > 0.0031308,
                1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055,
                12.92 * c,
            ),
            0.0,
            1.0,
        )
        for c in linear
    ]


def rgb_to_lab(rgb: jnp.ndarray, channel_axis: int = 1) -> jnp.ndarray:
    """sRGB → LAB with OpenCV-style scaling (L×2.55, a/b+128).

    Pipeline identical in math to ``rgb_to_lab_torch``
    (``torch_backend.py:17-60``): gamma expand → XYZ → D65 normalize → f(t)
    → L/a/b. Input uint8 [0,255] or float [0,1]; output float32 NCHW (or
    NHWC if ``channel_axis`` says channels-last).
    """
    rgb = normalize_to_float(rgb)
    rgb, needs_permute = _nchw(rgb, channel_axis)

    lab_planes = rgb_planes_to_lab([rgb[:, 0:1], rgb[:, 1:2], rgb[:, 2:3]])
    lab = jnp.concatenate(lab_planes, axis=1)

    if needs_permute:
        lab = jnp.transpose(lab, (0, 2, 3, 1))
    return lab


def lab_to_rgb(lab: jnp.ndarray, channel_axis: int = 1) -> jnp.ndarray:
    """Inverse of :func:`rgb_to_lab`; output float32 clamped to ``[0, 1]``.

    Math identical to ``lab_to_rgb_torch`` (``torch_backend.py:62-101``).
    """
    lab, needs_permute = _nchw(lab, channel_axis)

    rgb_planes = lab_planes_to_rgb([lab[:, 0:1], lab[:, 1:2], lab[:, 2:3]])
    rgb = jnp.concatenate(rgb_planes, axis=1)

    if needs_permute:
        rgb = jnp.transpose(rgb, (0, 2, 3, 1))
    return rgb
