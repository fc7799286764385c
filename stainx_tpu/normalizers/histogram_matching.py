"""Histogram-matching normalizer API class (counterpart of
``src/stainx/normalizers/histogram_matching.py:11-43``).

Fitted state: ``_ref_histograms_256`` as a (C, 256) array (the reference
stores a list of per-channel tensors plus compressed nonzero-value CDFs;
``_ref_vals`` / ``_ref_cdf`` / ``_reference_histogram`` are exposed as
derived views for API compatibility — the transform path only ever consumes
the 256-bin histograms, ``histogram_matching.py:40-43``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from stainx_tpu.normalizers._template import NormalizerTemplate
from stainx_tpu.ops import histogram_matching as hm_ops


class HistogramMatching(NormalizerTemplate):
    """Per-channel 256-bin histogram matching.

    ``channel_axis``: 1 / -3 for NCHW (default), -1 / 3 for NHWC
    (reference contract, ``histogram_matching.py:12-14``).
    """

    def __init__(self, device: Any | None = None, backend: str | None = None, channel_axis: int = 1):
        from stainx_tpu.ops.color import CHANNEL_AXES

        if channel_axis not in CHANNEL_AXES:
            # An unvalidated axis was read as channels-first by the layout
            # dispatch but channels-last by _coerce_reference — silent
            # wrong-axis histograms (round-3 review finding).
            raise ValueError(
                f"channel_axis must be one of {CHANNEL_AXES} (1/-3 NCHW, -1/3 NHWC), "
                f"got {channel_axis}"
            )
        self.channel_axis = channel_axis
        super().__init__(device=device, backend=backend)

    def _init_algorithm_attributes(self):
        self._ref_histograms_256 = None

    def _state_attrs(self):
        return ("_ref_histograms_256",)

    # Derived views of the fitted state, for reference API compatibility.
    @property
    def _reference_histogram(self):
        """First channel's full-256 CDF (reference ``torch_backend.py:177``)."""
        if self._ref_histograms_256 is None:
            return None
        return jnp.cumsum(self._ref_histograms_256[0])

    @property
    def _ref_cdf(self):
        """Per-channel CDFs over the nonzero-count bins (variable length,
        host numpy — reference ``torch_backend.py:160-175``)."""
        if self._ref_histograms_256 is None:
            return None
        out = []
        for hist in np.asarray(self._ref_histograms_256):
            nz = np.nonzero(hist)[0]
            if len(nz) > 0:
                cdf = np.cumsum(hist[nz])
                out.append(cdf / (cdf[-1] + 1e-8))
            else:
                out.append(np.zeros(256, np.float32))
        return out

    @property
    def _ref_vals(self):
        if self._ref_histograms_256 is None:
            return None
        out = []
        for hist in np.asarray(self._ref_histograms_256):
            nz = np.nonzero(hist)[0]
            out.append(nz.astype(np.float32) if len(nz) > 0 else np.arange(256, dtype=np.float32))
        return out

    # The pallas backend fuses one-hot construction + MXU contraction in
    # VMEM and reads NCHW directly (kernels/histogram.py): the XLA path's
    # channel transpose + HBM one-hot materialization dominated the round-2
    # HM time (measured v5e round 3: 11.0 → 3.1 ms at 64×512², bit-exact).
    # The earlier VPU counting kernel (histogram_256_pallas) remains the
    # non-MXU alternative.
    def _compute_reference_params(self, images: jnp.ndarray) -> None:
        self._validate_layout(images)
        self._ref_histograms_256 = hm_ops.hm_fit(
            images, channel_axis=self.channel_axis, use_pallas=self.backend == "pallas"
        )

    def _transform_impl(self, images: jnp.ndarray) -> jnp.ndarray:
        self._validate_layout(images)
        ref = self._coerce_reference(self._ref_histograms_256, images)
        return hm_ops.hm_transform(
            images, ref, channel_axis=self.channel_axis, use_pallas=self.backend == "pallas"
        )

    def _coerce_reference(self, ref: Any, images: jnp.ndarray) -> jnp.ndarray:
        """Accept (C, 256) arrays, per-channel lists (padded / truncated to C)
        or a single 1D 256-bin histogram broadcast to all channels — the
        CUDA wrapper's coercion rules (``torch_cuda_backend.py:41-84``)."""
        c = images.shape[1] if self.channel_axis in (1, -3) else images.shape[-1]
        if isinstance(ref, (list, tuple)):
            hists = [jnp.asarray(h, jnp.float32) for h in ref][:c]
            while len(hists) < c:
                hists.append(hists[-1])
            return jnp.stack(hists)
        ref = jnp.asarray(ref, jnp.float32)
        if ref.ndim == 1:
            return jnp.broadcast_to(ref, (c, 256))
        return ref[:c]

    def _validate_layout(self, images: jnp.ndarray) -> None:
        if images.ndim != 4:
            raise ValueError(
                f"HistogramMatching expects 4D batches, got shape {tuple(images.shape)}"
            )
