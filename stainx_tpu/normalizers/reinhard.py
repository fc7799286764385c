"""Reinhard normalizer API class (counterpart of
``src/stainx/normalizers/reinhard.py:11-31``). Fitted state:
``_reference_mean`` / ``_reference_std``, per-LAB-channel, shape ``(3,)``."""

from __future__ import annotations

import jax.numpy as jnp

from stainx_tpu.normalizers._template import NormalizerTemplate
from stainx_tpu.ops import reinhard as reinhard_ops


class Reinhard(NormalizerTemplate):
    """Reinhard stain normalization (LAB mean/std transfer)."""

    def _init_algorithm_attributes(self):
        self._reference_mean = None
        self._reference_std = None

    def _state_attrs(self):
        return ("_reference_mean", "_reference_std")

    def _compute_reference_params(self, images: jnp.ndarray) -> None:
        self._validate_layout(images)
        self._reference_mean, self._reference_std = reinhard_ops.reinhard_fit(images)

    # NOTE: XLA already fuses the whole RGB→LAB→affine→RGB chain into single
    # HBM passes and measures faster than the hand-written kernels even
    # after the round-3 rework gave the kernel path its own raw-byte
    # moments kernel (XLA 3.10 ms vs kernels 3.44 ms at 64×512² uint8 on
    # v5e; the chain is VPU-transcendental-bound, not bandwidth-bound —
    # roofline in docs/benchmarks.md "Reinhard floor") — the backend keeps
    # the XLA path; the kernels remain via reinhard_transform(use_pallas=True).
    def _transform_impl(self, images: jnp.ndarray) -> jnp.ndarray:
        self._validate_layout(images)
        return reinhard_ops.reinhard_transform(
            images, self._reference_mean, self._reference_std
        )

    @staticmethod
    def _validate_layout(images: jnp.ndarray) -> None:
        if images.ndim != 4 or images.shape[1] != 3:
            raise ValueError(
                f"Reinhard expects NCHW images with C=3, got shape {tuple(images.shape)}"
            )
