"""Normalizer template: backend validation / auto-selection / fitted gate.

Counterpart of the reference's ``NormalizerTemplate``
(``src/stainx/normalizers/_template.py:15-142``), re-thought for JAX:

- Backends are ``"xla"`` (pure jnp pipelines, runs anywhere) and ``"pallas"``
  (same pipelines with Pallas TPU kernels backing the hot ops). There is no
  semantic difference — unlike the reference's torch/torch_cuda split, both
  compile to one fused device program; Pallas only tightens the memory
  schedule. Auto-select picks ``"pallas"`` on TPU devices, ``"xla"``
  elsewhere (mirrors ``_template.py:46-61``).
- Fit runs on the same compute path as transform (the reference forced fit
  onto the torch backend, ``_template.py:115-130``, because its CUDA
  extension had no fit kernels — a constraint that dissolves here).
- Fitted state is an explicit pytree (:meth:`state` / :meth:`load_state`),
  so users *can* serialize it — the reference deliberately kept fitted
  params out of ``state_dict`` (``transforms.py:63-68``) and we keep that
  default for :class:`~stainx_tpu.transforms.StainNormalizerTransform`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from stainx_tpu.base import StainNormalizerBase

_VALID_BACKENDS = frozenset({"xla", "pallas"})

# Former torch backend names → actionable message for migrating users.
_LEGACY_BACKENDS = {"torch": "xla", "torch_cuda": "pallas"}


class NormalizerTemplate(StainNormalizerBase):
    """Template with JAX backend selection and the fitted-state gate."""

    def __init__(self, device: str | Any | None = None, backend: str | None = None):
        super().__init__(device)
        if backend is not None:
            self._validate_backend_name(backend)
        # An explicitly requested backend is sticky across device moves
        # (reference honors the user's backend in _sync_normalizer_device and
        # raises when impossible, transforms.py:173-190); only auto-selected
        # backends re-select in to_device.
        self._requested_backend = backend
        self.backend = backend or self._select_backend()
        self._init_algorithm_attributes()

    @staticmethod
    def _validate_backend_name(backend: str) -> None:
        if backend not in _VALID_BACKENDS:
            if backend in _LEGACY_BACKENDS:
                raise ValueError(
                    f"Backend '{backend}' is a torch-era name; use "
                    f"'{_LEGACY_BACKENDS[backend]}' (auto-selected when backend=None)."
                )
            raise ValueError(
                f"Unsupported backend '{backend}'. Valid backends: {sorted(_VALID_BACKENDS)}"
            )
        if backend == "pallas":
            from stainx_tpu.kernels import PALLAS_AVAILABLE

            if not PALLAS_AVAILABLE:
                raise ImportError(
                    "Backend 'pallas' requires jax.experimental.pallas; use backend='xla'."
                )

    def set_backend(self, backend: str) -> "NormalizerTemplate":
        """Explicitly select a backend after construction — same validation
        as the constructor's ``backend=``, and equally sticky across device
        moves (the reference's ``_requested_backend`` contract). Used by
        :class:`stainx_tpu.StainNormalizerTransform` to honor an explicit
        ``backend=`` over a prebuilt normalizer."""
        self._validate_backend_name(backend)
        self._requested_backend = backend
        self.backend = backend
        return self

    def _init_algorithm_attributes(self):
        """Initialize algorithm-specific fitted-state attributes."""

    def _select_backend(self) -> str:
        """Pallas kernels on TPU, plain XLA elsewhere (cf. ``_template.py:46-61``)."""
        if self.device.platform != "tpu":
            return "xla"
        from stainx_tpu.kernels import PALLAS_AVAILABLE

        return "pallas" if PALLAS_AVAILABLE else "xla"

    # ---------------------------------------------------------------- inputs
    def _as_device_array(self, images: Any) -> jnp.ndarray:
        """Accept numpy / JAX / DLPack-compatible arrays; place on self.device."""
        if not isinstance(images, jnp.ndarray):
            images = np.asarray(images)
        return jax.device_put(images, self.device)

    # ------------------------------------------------------------- fit state
    def fit(self, images: Any) -> "NormalizerTemplate":
        """Fit on reference images; returns self (``_template.py:83-94``)."""
        self._compute_reference_params(self._as_device_array(images))
        self._is_fitted = True
        return self

    def transform(self, images: Any) -> jnp.ndarray:
        """Transform images with the fitted parameters (``_template.py:96-113``)."""
        if not self._is_fitted:
            raise ValueError("Must call fit() before transform()")
        images = self._as_device_array(images)
        return self._finalize_range(self._transform_impl(images))

    def _finalize_range(self, result: jnp.ndarray) -> jnp.ndarray:
        """The single definition of the output value-range contract
        (``normalize_to_0_1`` → /255, ``_template.py:108-111``): shared by
        :meth:`transform` and the mesh path in ``transforms.py``, which
        bypasses :meth:`transform` entirely — two copies of the /255 rule
        would silently diverge (review finding)."""
        if getattr(self, "normalize_to_0_1", False):
            result = result / 255.0
        return result

    # ----------------------------------------------------------- state tree
    @property
    def state(self) -> dict[str, Any]:
        """Fitted parameters as a serializable pytree (dict of arrays)."""
        return {name: getattr(self, name) for name in self._state_attrs()}

    def load_state(self, state: dict[str, Any]) -> "NormalizerTemplate":
        """Restore fitted parameters from :attr:`state`; marks self fitted."""
        for name in self._state_attrs():
            value = state.get(name)
            if value is not None:
                value = jax.device_put(jnp.asarray(value), self.device)
            setattr(self, name, value)
        self._is_fitted = all(getattr(self, n) is not None for n in self._required_state_attrs())
        return self

    def save_state(self, path: str) -> None:
        """Persist fitted parameters to an ``.npz`` file.

        The reference deliberately excludes fitted parameters from torch
        checkpoints (``transforms.py:63-68``); here persistence is explicit
        and opt-in — the fitted state is a tiny enumerable pytree."""
        if not self._is_fitted:
            raise ValueError("Must call fit() before save_state()")
        np.savez(path, **{k: np.asarray(v) for k, v in self.state.items() if v is not None})

    def load_state_file(self, path: str) -> "NormalizerTemplate":
        """Restore fitted parameters from :meth:`save_state` output."""
        with np.load(path) as data:
            return self.load_state({k: data[k] for k in data.files})

    def to_device(self, device: str | Any | None) -> "NormalizerTemplate":
        """Move fitted parameters to another device.

        Backend selection re-runs only when the backend was auto-selected;
        an explicit ``backend=`` request survives the move (reference
        contract, ``transforms.py:173-190`` — both backends run on every
        JAX platform here, so the reference's impossible-combination error
        collapses to the eager checks in ``__init__``)."""
        from stainx_tpu.utils import get_device

        self.device = get_device(device)
        self.backend = self._requested_backend or self._select_backend()
        for name in self._state_attrs():
            value = getattr(self, name, None)
            if isinstance(value, jnp.ndarray):
                setattr(self, name, jax.device_put(value, self.device))
        return self

    # ------------------------------------------------------- subclass hooks
    def _state_attrs(self) -> tuple[str, ...]:
        raise NotImplementedError

    def _required_state_attrs(self) -> tuple[str, ...]:
        return self._state_attrs()

    def _compute_reference_params(self, images: jnp.ndarray) -> None:
        raise NotImplementedError

    def _transform_impl(self, images: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError
