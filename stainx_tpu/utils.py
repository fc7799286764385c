"""Device resolution and layout utilities.

TPU-native counterpart of the reference's ``src/stainx/utils.py:12-101``:
``get_device`` resolves JAX devices instead of torch devices, and
:class:`ChannelFormatConverter` performs the same channel-axis bookkeeping on
numpy / JAX arrays.
"""

from __future__ import annotations

from typing import Any, ClassVar

import jax
import numpy as np

# Aliases accepted for smooth migration from CUDA-centric code. "cuda"/"gpu"
# map onto whatever accelerator JAX exposes (TPU here).
_ACCELERATOR_ALIASES = frozenset({"cuda", "gpu", "accelerator"})


def _default_device() -> jax.Device:
    """Default device: first accelerator if present, else CPU.

    Mirrors the preference order of the reference's ``_get_default_device``
    (``utils.py:12-18``: CUDA > MPS > CPU) in JAX terms: TPU > CPU.
    """
    return jax.devices()[0]


def get_device(device: str | jax.Device | None) -> jax.Device:
    """Resolve a JAX device from a string or device object.

    Accepts ``None`` (default device), a :class:`jax.Device`, or strings like
    ``"cpu"``, ``"tpu"``, ``"tpu:1"``. ``"cuda"`` / ``"gpu"`` are accepted as
    aliases for the default accelerator to ease migration.
    """
    if device is None:
        return _default_device()
    if isinstance(device, jax.Device):
        return device
    if not isinstance(device, str):
        # Device-like object from another framework; best effort str() parse.
        device = str(device)

    spec = device.lower()
    platform, _, index_str = spec.partition(":")
    index = int(index_str) if index_str else 0

    if platform in _ACCELERATOR_ALIASES:
        accels = [d for d in jax.devices() if d.platform != "cpu"]
        if not accels:
            raise ValueError(
                f"device='{device}' requested an accelerator but none is available; use device='cpu'."
            )
        return accels[index]

    try:
        devices = jax.devices(platform)
    except RuntimeError as e:
        raise ValueError(f"Unknown or unavailable device '{device}': {e}") from e
    if index >= len(devices):
        raise ValueError(f"device '{device}' out of range; only {len(devices)} {platform} device(s).")
    return devices[index]


class ChannelFormatConverter:
    """Channel-axis registry + layout conversion for numpy/JAX arrays.

    Counterpart of the reference ``ChannelFormatConverter``
    (``src/stainx/utils.py:37-101``); same ``channel_axis`` registry
    (1 / -3 channels-first, -1 / 3 channels-last), ``to_hwc`` for numpy
    interop, and ``prepare_for_normalizer`` for NHWC/HWC → NCHW conversion.
    """

    _CHANNEL_AXIS_FORMAT: ClassVar[dict[int, dict[str, Any]]] = {
        1: {"is_channels_first": True, "permute_to_hwc": (1, 2, 0)},
        -3: {"is_channels_first": True, "permute_to_hwc": (1, 2, 0)},
        -1: {"is_channels_first": False, "permute_to_hwc": None},
        3: {"is_channels_first": False, "permute_to_hwc": None},
    }

    def __init__(self, channel_axis: int = 1):
        if channel_axis not in self._CHANNEL_AXIS_FORMAT:
            raise ValueError(
                f"Unsupported channel_axis={channel_axis}. Valid values: "
                f"{sorted(self._CHANNEL_AXIS_FORMAT)}"
            )
        self.channel_axis = channel_axis
        info = self._CHANNEL_AXIS_FORMAT[channel_axis]
        self.is_channels_first = info["is_channels_first"]
        self.permute_to_hwc = info["permute_to_hwc"]

    @staticmethod
    def _to_numpy(x: Any) -> np.ndarray:
        return np.asarray(x)

    def to_hwc(self, images: Any, squeeze_batch: bool = False) -> np.ndarray:
        """Return a numpy HWC view of the (single) image for visualization."""
        images_np = self._to_numpy(images)
        if squeeze_batch:
            images_np = np.squeeze(images_np, axis=0)
        if self.permute_to_hwc is not None:
            return np.transpose(images_np, self.permute_to_hwc)
        return images_np

    def prepare_for_normalizer(self, images: Any) -> Any:
        """Return arrays in channels-first layout for NCHW-expecting normalizers.

        Channels-first inputs pass through unchanged. NHWC is permuted with
        ``(0, 3, 1, 2)``; HWC becomes ``(1, C, H, W)``. After conversion use
        ``channel_axis=1`` on the normalizer (reference contract,
        ``utils.py:80-100``).
        """
        if self.is_channels_first:
            return images
        ndim = images.ndim if hasattr(images, "ndim") else len(images.shape)
        if ndim == 4:
            return images.transpose(0, 3, 1, 2)
        if ndim == 3:
            return images.transpose(2, 0, 1)[None]
        raise ValueError(f"prepare_for_normalizer expects 3D or 4D images, got ndim={ndim}")
