"""Training-pipeline transform (counterpart of ``src/stainx/transforms.py:26-230``).

:class:`StainNormalizerTransform` is a plain callable (framework-agnostic —
drop it into grain / tf.data host pipelines or call it on-device inside a
jitted step via the underlying ops). It preserves the reference's contracts:

- Modes: ``reference`` (fit once) and ``batch`` (re-fit on
  ``batch[batch_ref_index]`` every call — intentionally mutable,
  ``transforms.py:222-227``).
- Layout: Macenko/Reinhard require NCHW with C=3; ``channel_axis`` only
  applies to histogram matching; NHWC into Macenko/Reinhard raises
  (``transforms.py:118-126,206-212``).
- Value range: uint8 → [0, 255]; float → [0, 1] always (no ``max()>1``).
  ``normalize_to_0_1`` defaults to True for ``method="macenko"``
  (``transforms.py:99-102``).
- Device: ``device=None`` follows the input array's device and re-syncs the
  inner normalizer (including fitted state) on change
  (``transforms.py:173-198``). Pass ``device="tpu"`` to pin.
- Serialization: fitted parameters are NOT part of any checkpointable
  attribute set by default (reference contract, ``transforms.py:63-68``) —
  use ``.normalizer.state`` explicitly if you want to persist them.
"""

from __future__ import annotations

from typing import Any, Literal

import jax
import jax.numpy as jnp
import numpy as np

from stainx_tpu.normalizers import HistogramMatching, Macenko, Reinhard

MethodName = Literal["macenko", "reinhard", "histogram_matching"]
ModeName = Literal["reference", "batch"]

_METHOD_MAP = {"macenko": Macenko, "reinhard": Reinhard, "histogram_matching": HistogramMatching}
_CHANNELS_FIRST = frozenset({1, -3})
_CHANNELS_LAST = frozenset({-1, 3})


class StainNormalizerTransform:
    """Apply stain normalization inside a training input pipeline."""

    def __init__(
        self,
        method: MethodName = "macenko",
        *,
        mode: ModeName = "reference",
        reference: Any | None = None,
        device: str | jax.Device | None = None,
        backend: str | None = None,
        channel_axis: int = 1,
        batch_ref_index: int = 0,
        normalize_to_0_1: bool | None = None,
        normalizer: Any | None = None,
        mesh: Any | None = None,
        pixel_axis: str | None = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh``. When set, batches are
        sharded over the mesh's first axis, transforms run batch-parallel,
        and batch-mode fits reduce their statistics across all chips
        (exact psum'd moments/histograms — no reference-era equivalent;
        SURVEY §2.3). ``pixel_axis``: optional mesh axis name to ALSO shard
        each image's rows over (for images beyond one chip; any H — padded
        rows are masked out of the statistics and sliced back off; see
        :func:`stainx_tpu.parallel.transform_on_mesh`)."""
        from stainx_tpu.utils import get_device

        self.mode = mode
        self.channel_axis = channel_axis
        self.batch_ref_index = batch_ref_index
        self.mesh = mesh
        if pixel_axis is not None and mesh is None:
            raise ValueError("pixel_axis requires mesh= (a jax.sharding.Mesh).")
        self.pixel_axis = pixel_axis
        # None = follow input device each call (transforms.py:89-90). An
        # explicit backend= is honored across device syncs by the inner
        # normalizer itself (NormalizerTemplate.to_device).
        self.device = None if device is None else get_device(device)

        if mode not in ("reference", "batch"):
            raise ValueError(f"Unsupported mode '{mode}'. Use 'reference' or 'batch'.")

        # Training-safe default for method="macenko" (transforms.py:99-102).
        explicit_n01 = normalize_to_0_1
        if normalize_to_0_1 is None:
            normalize_to_0_1 = method == "macenko" and normalizer is None

        if normalizer is not None:
            self.normalizer = normalizer
            if backend is not None:
                # Honor an explicit backend= over a prebuilt normalizer —
                # the reference stores _requested_backend before its
                # prebuilt branch and enforces it across device syncs
                # (transforms.py:90,173-190). Silently ignoring it ran the
                # prebuilt normalizer's backend with no error (round-3
                # review finding); set_backend applies the template's own
                # validation (legacy-name / availability errors included).
                setter = getattr(self.normalizer, "set_backend", None)
                if setter is None:
                    raise ValueError(
                        f"backend={backend!r} cannot be applied to a prebuilt "
                        f"normalizer of type {type(self.normalizer).__name__} "
                        "(no set_backend method). Construct the normalizer "
                        "with the desired backend, or omit backend= here."
                    )
                setter(backend)
            if isinstance(self.normalizer, Macenko):
                if explicit_n01 is not None:
                    self.normalizer.normalize_to_0_1 = bool(explicit_n01)
            elif explicit_n01:
                raise ValueError("normalize_to_0_1 only applies to Macenko normalizers.")
            if isinstance(self.normalizer, HistogramMatching):
                # Layout follows the prebuilt normalizer (transforms.py:111-117).
                norm_axis = int(self.normalizer.channel_axis)
                if channel_axis != 1 and not self._same_channel_layout(channel_axis, norm_axis):
                    raise ValueError(
                        f"channel_axis={channel_axis} conflicts with prebuilt "
                        f"HistogramMatching(channel_axis={norm_axis})."
                    )
                self.channel_axis = norm_axis
            elif channel_axis not in _CHANNELS_FIRST:
                raise ValueError(
                    f"channel_axis={channel_axis} is only supported for histogram_matching; "
                    f"Macenko/Reinhard require NCHW (channel_axis=1)."
                )
        else:
            if method not in _METHOD_MAP:
                raise ValueError(f"Unknown method '{method}'. Choose from {sorted(_METHOD_MAP)}")
            if method != "histogram_matching" and channel_axis not in _CHANNELS_FIRST:
                raise ValueError(
                    f"channel_axis={channel_axis} is only supported for histogram_matching; "
                    f"{method} requires NCHW (channel_axis=1)."
                )
            if explicit_n01 and method != "macenko":
                raise ValueError("normalize_to_0_1 only applies to Macenko (method='macenko').")
            cls = _METHOD_MAP[method]
            norm_device = self.device  # None → normalizer default device
            if method == "histogram_matching":
                self.normalizer = cls(device=norm_device, backend=backend, channel_axis=channel_axis)
            elif method == "macenko":
                self.normalizer = cls(
                    device=norm_device, backend=backend, normalize_to_0_1=bool(normalize_to_0_1)
                )
            else:
                self.normalizer = cls(device=norm_device, backend=backend)

        # After prebuilt-normalizer reconciliation may have overridden
        # channel_axis: the mesh path's sharded ops are NCHW-only, so a
        # channels-last layout (however it was requested) cannot ride it.
        if mesh is not None and self.channel_axis not in _CHANNELS_FIRST:
            raise ValueError("mesh execution currently requires NCHW (channel_axis=1).")

        if mode == "reference":
            if reference is None and not getattr(self.normalizer, "_is_fitted", False):
                raise ValueError(
                    "mode='reference' requires a reference tensor (or a pre-fitted normalizer)."
                )
            if reference is not None:
                self.fit_reference(reference)

    # ------------------------------------------------------------ layout
    @staticmethod
    def _same_channel_layout(a: int, b: int) -> bool:
        a_first, b_first = a in _CHANNELS_FIRST, b in _CHANNELS_FIRST
        a_last, b_last = a in _CHANNELS_LAST, b in _CHANNELS_LAST
        return (a_first and b_first) or (a_last and b_last)

    def _layout_channel_axis(self) -> int:
        if isinstance(self.normalizer, HistogramMatching):
            return int(self.normalizer.channel_axis)
        return self.channel_axis

    # ------------------------------------------------------------ devices
    def _target_device(self, images: jnp.ndarray) -> jax.Device:
        if self.device is not None:
            return self.device
        devices = getattr(images, "devices", None)
        if callable(devices):
            device_set = images.devices()
            if len(device_set) == 1:
                return next(iter(device_set))
        return self.normalizer.device

    def _sync_normalizer_device(self, device: jax.Device) -> None:
        """Keep the inner normalizer + fitted state on the batch device
        (reference ``_sync_normalizer_device``, ``transforms.py:173-198``)."""
        if self.normalizer.device != device:
            self.normalizer.to_device(device)

    # ------------------------------------------------------------ forward
    def _validate_layout(self, images: Any) -> jnp.ndarray:
        """Shared shape/layout validation for the single-device and mesh
        paths (the mesh path must reject bad layouts identically — a C≠3
        NCHW batch would otherwise silently use only 3 channel planes)."""
        if not isinstance(images, jnp.ndarray):
            images = jnp.asarray(np.asarray(images))
        if images.ndim == 3:
            images = images[None]
        if images.ndim != 4:
            raise ValueError(
                f"Expected CHW/NCHW or HWC/NHWC image tensor, got shape {tuple(images.shape)}"
            )

        if isinstance(self.normalizer, HistogramMatching) and self._layout_channel_axis() in _CHANNELS_LAST:
            if images.shape[-1] != 3:
                raise ValueError(
                    f"channels-last histogram matching expects shape (N, H, W, 3), "
                    f"got {tuple(images.shape)}"
                )
        else:
            if images.shape[1] != 3:
                raise ValueError(
                    f"Expected NCHW with C=3 (got shape {tuple(images.shape)}). Macenko/Reinhard "
                    f"do not accept NHWC; use channel_axis=-1 only with histogram_matching, or "
                    f"permute to NCHW first."
                )
        return images

    def _prepare(self, images: Any) -> jnp.ndarray:
        # Device resolution BEFORE the jnp conversion in _validate_layout:
        # converting a host array first places it on jax.devices()[0], which
        # made _target_device's normalizer-device fallback unreachable and
        # silently migrated an explicitly pinned normalizer on every host-
        # array call (round-3 review finding). Host inputs have no
        # .devices(), so the fallback now actually fires for them.
        target = self._target_device(images)
        images = self._validate_layout(images)
        self._sync_normalizer_device(target)
        return jax.device_put(images, target)

    def fit_reference(self, reference: Any) -> "StainNormalizerTransform":
        """Fit the underlying normalizer on a reference image or batch.

        With ``pixel_axis`` set the fit runs PIXEL-SHARDED on the mesh:
        pixel sharding exists because one image can exceed a chip, so the
        reference image must not be device_put whole onto one device —
        the same reasoning as the batch-mode designated-reference fit
        (round-3 review finding, both call sites)."""
        if self.mesh is not None and self.pixel_axis is not None:
            from stainx_tpu import parallel

            ref = self._validate_layout(reference)
            method = self._method_name()
            params = parallel.fit_on_mesh(
                method, ref, self.mesh, pixel_axis=self.pixel_axis
            )
            self._store_mesh_params(method, params)
            return self
        ref = self._prepare(reference)
        self.normalizer.fit(ref)
        return self

    def __call__(self, img: Any) -> jnp.ndarray:
        # Convert BEFORE the single-image check: a 3D array-like without
        # .ndim (nested lists) otherwise came back batched as 4D where the
        # identical np.asarray input came back 3D (round-3 review finding).
        if not isinstance(img, jnp.ndarray) and not hasattr(img, "ndim"):
            img = np.asarray(img)
        was_single = img.ndim == 3
        if self.mesh is not None:
            result = self._forward_on_mesh(img)
            return result[0] if was_single else result
        batch = self._prepare(img)

        if self.mode == "batch":
            # Intentional: re-fits every call (transforms.py:222-227).
            # batch_ref_index=None extends the reference semantic: fit on
            # the WHOLE batch rather than one designated image.
            idx = self.batch_ref_index
            if idx is None:
                self.normalizer.fit(batch)
            else:
                if idx < 0 or idx >= batch.shape[0]:
                    raise IndexError(
                        f"batch_ref_index={idx} out of range for batch size {batch.shape[0]}"
                    )
                self.normalizer.fit(batch[idx : idx + 1])

        result = self.normalizer.transform(batch)
        return result[0] if was_single else result

    # ------------------------------------------------------------ mesh path
    def _method_name(self) -> str:
        for name, cls in _METHOD_MAP.items():
            if isinstance(self.normalizer, cls):
                return name
        raise TypeError(f"Unknown normalizer type {type(self.normalizer)}")

    def _mesh_params(self, method: str):
        n = self.normalizer
        if method == "macenko":
            # Same fitted-state shape gates as the single-device transform:
            # the mesh path feeds these straight to transform_on_mesh, which
            # would silently drop a (3,)-maxC's third entry (round-3 review
            # finding — the gate exists for exactly that bug).
            n._validate_fitted_params()
            return (n._stain_matrix, n._target_max_conc)
        if method == "reinhard":
            return (n._reference_mean, n._reference_std)
        return n._ref_histograms_256

    def _store_mesh_params(self, method: str, params) -> None:
        # fit_on_mesh outputs are replicated across EVERY mesh device;
        # stored fitted state must stay usable by the single-device path
        # (a later normalizer.transform() jitted 8-device params against a
        # 1-device input and raised 'incompatible devices' — round-3
        # review repro), so pull each param to the normalizer's device.
        n = self.normalizer
        put = lambda p: jax.device_put(p, n.device)  # noqa: E731
        if method == "macenko":
            n._stain_matrix, n._target_max_conc = put(params[0]), put(params[1])
        elif method == "reinhard":
            n._reference_mean, n._reference_std = put(params[0]), put(params[1])
        else:
            n._ref_histograms_256 = put(params)
        n._is_fitted = True

    def _forward_on_mesh(self, img: Any) -> jnp.ndarray:
        """Sharded forward: batch-parallel transform; in batch mode the fit
        statistics reduce across every chip of the mesh (batch_ref_index
        selects one replicated image, as in the reference; ``None`` extends
        the semantic to an exact whole-batch distributed fit)."""
        from stainx_tpu import parallel

        img = self._validate_layout(img)
        method = self._method_name()

        if self.mode == "batch":
            if self.batch_ref_index is None:
                params = parallel.fit_on_mesh(
                    method, img, self.mesh, pixel_axis=self.pixel_axis
                )
            else:
                idx = self.batch_ref_index
                if idx < 0 or idx >= img.shape[0]:
                    raise IndexError(
                        f"batch_ref_index={idx} out of range for batch size {img.shape[0]}"
                    )
                if self.pixel_axis is not None:
                    # Pixel sharding exists because one image can exceed a
                    # chip — the designated reference image must be fitted
                    # pixel-sharded too, not device_put whole onto one chip
                    # (round-3 review finding).
                    params = parallel.fit_on_mesh(
                        method, img[idx : idx + 1], self.mesh, pixel_axis=self.pixel_axis
                    )
                else:
                    self.normalizer.fit(img[idx : idx + 1])
                    params = self._mesh_params(method)
            self._store_mesh_params(method, params)
        else:
            params = self._mesh_params(method)

        kwargs = {}
        if method == "macenko":
            # Mesh execution honors the normalizer's precision/backend —
            # numerics must not depend on whether a mesh is attached.
            kwargs["precision"] = getattr(self.normalizer, "precision", "stable")
            kwargs["use_pallas"] = self.normalizer.backend == "pallas"
        elif method == "histogram_matching":
            # The single-device path coerces user-supplied reference forms
            # (1D 256-bin broadcast, per-channel lists) in _transform_impl;
            # the mesh path must accept the same fitted states (round-3
            # review finding). Coercion is idempotent on fit output.
            params = self.normalizer._coerce_reference(params, img)
        result = parallel.transform_on_mesh(
            method, img, params, self.mesh, pixel_axis=self.pixel_axis, **kwargs
        )
        # One definition of the value-range contract (the mesh path bypasses
        # NormalizerTemplate.transform).
        return self.normalizer._finalize_range(result)

    # torch-style alias so existing pipelines can call .forward(...)
    forward = __call__
