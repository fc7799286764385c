"""Analytic eigendecomposition of symmetric 3×3 matrices — batched pure jnp.

TPU-native replacement for the reference's per-image CUDA eigensolver
(``csrc/macenko.cu:76-129``) and its CPU-LAPACK fallback
(``src/stainx/backends/torch_backend.py:368-373``). The closed-form
trigonometric method (Smith 1961; see "Eigenvalue algorithm, 3×3 symmetric"
in standard references) needs no iteration, so it vmaps/fuses cleanly under
XLA — no host round-trip, no per-image loop.

Column convention matches ``torch.linalg.eigh(cov)[:, [1, 2]]``: eigenvalues
ascending; we return the eigenvectors of the **middle** and **largest**
eigenvalues as columns 0 and 1 of a (3, 2) matrix. Eigenvector signs are
arbitrary (as with LAPACK); the Macenko pipeline is sign-insensitive because
a flipped column only reflects the projected angle distribution, and the
H/E ordering rule (``torch_backend.py:507-510``) restores the labeling.
"""

from __future__ import annotations

import jax.numpy as jnp

_DIAG_EPS = 1e-30


def _cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over the last axis (shape (..., 3))."""
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def eigvalsh3(a: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues (ascending) of symmetric matrices ``a`` of shape (..., 3, 3)."""
    a = a.astype(jnp.float32)
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a11, a12, a22 = a[..., 1, 1], a[..., 1, 2], a[..., 2, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0

    # --- general (non-diagonal) branch: trigonometric closed form ---
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _DIAG_EPS))
    inv_p = 1.0 / p
    b00, b11, b22 = (a00 - q) * inv_p, (a11 - q) * inv_p, (a22 - q) * inv_p
    b01, b02, b12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    det_b = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_max = q + 2.0 * p * jnp.cos(phi)
    e_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_max - e_min
    trig = jnp.stack([e_min, e_mid, e_max], axis=-1)

    # --- (effectively) diagonal branch: sorted diagonal entries ---
    diag_sorted = jnp.sort(jnp.stack([a00, a11, a22], axis=-1), axis=-1)

    return jnp.where((p1 <= _DIAG_EPS)[..., None], diag_sorted, trig)


def _nullspace_direction(m: jnp.ndarray) -> jnp.ndarray:
    """Unit null-space direction of near-singular symmetric ``m`` (..., 3, 3):
    the largest-magnitude cross product of its rows, zero if degenerate
    (same robust-null-space selection strategy as the reference's CUDA
    eigensolver, ``csrc/macenko.cu:47-73``)."""
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = _cross(r0, r1)
    c02 = _cross(r0, r2)
    c12 = _cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)

    best = jnp.where(n02 > n01, c02, c01)
    best_n = jnp.maximum(n01, n02)
    best = jnp.where(n12 > best_n, c12, best)
    best_n = jnp.maximum(best_n, n12)

    norm = jnp.sqrt(jnp.sum(best * best, axis=-1, keepdims=True))
    inv = jnp.where(norm > 1e-30, 1.0 / jnp.maximum(norm, 1e-38), 0.0)
    return best * inv


def eigh3_top2(a: jnp.ndarray) -> jnp.ndarray:
    """Eigenvectors of the middle and largest eigenvalues of symmetric
    (..., 3, 3) matrices, as (..., 3, 2) — column 0 = middle, column 1 =
    largest, matching ``torch.linalg.eigh(...)[:, [1, 2]]`` up to sign."""
    a = a.astype(jnp.float32)
    evals = eigvalsh3(a)  # (..., 3) ascending
    eye = jnp.eye(3, dtype=a.dtype)
    v_mid = _nullspace_direction(a - evals[..., 1, None, None] * eye)
    v_max = _nullspace_direction(a - evals[..., 2, None, None] * eye)
    return jnp.stack([v_mid, v_max], axis=-1)
