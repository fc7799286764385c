"""Macenko normalizer API class (counterpart of
``src/stainx/normalizers/macenko.py:11-73``).

Fitted state: ``_stain_matrix`` (3, 2) H/E columns + ``_target_max_conc``
(2,). ``normalize_to_0_1`` defaults to **False** here (output ~[0, 255]);
``StainNormalizerTransform(method="macenko")`` defaults it to True
(``transforms.py:99-102`` in the reference).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from stainx_tpu.normalizers._template import NormalizerTemplate
from stainx_tpu.ops import macenko as macenko_ops

_VALID_PRECISION = ("stable", "fast")


class Macenko(NormalizerTemplate):
    """Macenko stain normalization (OD eigen-plane + percentile stain vectors).

    Parameters
    ----------
    device, backend : see :class:`NormalizerTemplate`.
    normalize_to_0_1 : bool
        Divide output by 255 so results land in [0, 1]. Default False
        (reference contract, ``macenko.py:35-39``).
    precision : {"stable", "fast"}
        Dtype policy, validated eagerly at construction (``macenko.py:36-44``).
        ``stable`` — f32 everywhere, two-pass centered covariance.
        ``fast`` — bf16 reconstruction + capped percentile-refinement depth;
        statistics, projection and solves stay f32. Unlike the reference
        (whose "fast" needed the CUDA extension), both precisions work on
        every backend because bf16 is native to TPU and supported by XLA on
        CPU.

        On the TPU ``pallas`` backend (the auto-selected default on TPU)
        ``fast`` is a **no-op**: the fused kernels are exact and already
        faster than any reduced-precision variant, so both modes route to
        the same kernel (``ops/macenko.py``). Expect a speedup from
        ``fast`` only on the ``xla``/jnp path, where it measures ~1.46×
        (see ``docs/benchmarks.md``).
    """

    def __init__(
        self,
        device: Any | None = None,
        backend: str | None = None,
        normalize_to_0_1: bool = False,
        precision: str = "stable",
    ):
        if precision not in _VALID_PRECISION:
            raise ValueError(f"precision must be 'stable' or 'fast', got {precision!r}")
        self._precision = precision
        self.normalize_to_0_1 = normalize_to_0_1
        super().__init__(device=device, backend=backend)

    @property
    def precision(self) -> str:
        return self._precision

    def _init_algorithm_attributes(self):
        self._stain_matrix = None
        self._target_max_conc = None
        self._concentration_matrix = None  # reference API parity (macenko.py:48)
        # Cross-call descent seed state (pallas backend): consecutive
        # fit/transform calls seed their percentile descents from the
        # previous call's terminal keys — measured +15–18% on within-slide
        # streams of DISTINCT single 4096² tiles (the target workload;
        # benchmarks/bench_serving.py), parity on distribution-shifted
        # streams (miss-streak cutout), +0.1–2.5% on batched calls where
        # the in-kernel scratch already seeds images 1..N−1 (v5e, r5).
        # Bit-exact (probe placement only; the per-pair miss-streak cutout
        # bounds heterogeneous-stream cost), so it is on by default. NOT
        # part of the checkpointable fitted state.
        self._seed_state = None

    def _state_attrs(self):
        return ("_stain_matrix", "_target_max_conc")

    def _carry_state(self):
        if self._seed_state is None:
            from stainx_tpu.kernels.macenko_fused import seed_state_init

            self._seed_state = jax.device_put(seed_state_init(), self.device)
        return self._seed_state

    def _store_carry_state(self, state) -> None:
        # Under a user-jitted call the returned state is a tracer; storing
        # it would leak into later calls. Dropping it is valid — the carry
        # is a perf cache and outputs are bit-exact either way.
        if not isinstance(state, jax.core.Tracer):
            self._seed_state = state

    def to_device(self, device) -> "Macenko":
        # The seed state is a perf cache, not fitted state: drop it on a
        # device move instead of dragging a cross-device dependency into
        # the next jitted call.
        self._seed_state = None
        return super().to_device(device)

    def _compute_reference_params(self, images: jnp.ndarray) -> None:
        self._validate_layout(images, "fit")
        if self.backend == "pallas":
            self._stain_matrix, self._target_max_conc, new_state = macenko_ops.macenko_fit(
                images, use_pallas=True, seed_state=self._carry_state()
            )
            self._store_carry_state(new_state)
        else:
            self._stain_matrix, self._target_max_conc = macenko_ops.macenko_fit(
                images, use_pallas=False
            )
        self._concentration_matrix = None

    def _validate_fitted_params(self) -> None:
        """Gate load_state-restored shapes at the API boundary, not deep
        inside the jitted pipeline (a scalar indexed tmc[1] there; a (3,)
        maxC silently dropped its third entry — round-3 review finding).
        Shared by the single-device transform and the mesh path, which
        feeds the raw fitted state to ``transform_on_mesh`` and would
        otherwise re-expose the silent-drop bug this gate closed."""
        if tuple(jnp.asarray(self._stain_matrix).shape) != (3, 2):
            raise ValueError(
                f"stain_matrix must have shape (3, 2), got "
                f"{tuple(jnp.asarray(self._stain_matrix).shape)}"
            )
        tmc = jnp.asarray(self._target_max_conc)
        if tmc.size != 2:
            raise ValueError(
                f"target_max_conc must have 2 entries (one per stain), got shape {tuple(tmc.shape)}"
            )

    def _transform_impl(self, images: jnp.ndarray) -> jnp.ndarray:
        self._validate_layout(images, "transform")
        self._validate_fitted_params()
        if self.backend == "pallas":
            out, new_state = macenko_ops.macenko_transform(
                images,
                self._stain_matrix,
                self._target_max_conc,
                precision=self._precision,
                use_pallas=True,
                seed_state=self._carry_state(),
            )
            self._store_carry_state(new_state)
            return out
        return macenko_ops.macenko_transform(
            images,
            self._stain_matrix,
            self._target_max_conc,
            precision=self._precision,
            use_pallas=False,
        )

    @staticmethod
    def _validate_layout(images: jnp.ndarray, stage: str) -> None:
        if images.ndim != 4:
            raise ValueError(f"Macenko {stage} expects NCHW images, got shape {tuple(images.shape)}")
        if images.shape[1] != 3:
            raise ValueError(
                f"Macenko {stage} expects 3 channels in dim 1 (NCHW), got C={images.shape[1]} "
                f"with shape {tuple(images.shape)}"
            )
