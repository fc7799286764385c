"""Framework interop adapters.

The reference ships a torch ``nn.Module`` transform for torchvision
pipelines (``src/stainx/transforms.py:26-230``). For users migrating such a
pipeline, :class:`TorchStainNormalizerTransform` wraps the JAX transform in
an ``nn.Module``: torch tensors convert to numpy on the host, the compute
runs on the JAX device, and results come back as CPU torch tensors with
the inner transform's value-range contract — which, exactly like the
reference's module, is NOT always the input dtype: ``method="macenko"``
defaults to ``normalize_to_0_1=True``, so uint8 in → float32 [0, 1] out
(pass ``normalize_to_0_1=False`` for [0, 255]-valued output). A CUDA
input comes back on CPU; move it if needed. (New code should prefer
:class:`stainx_tpu.StainNormalizerTransform` directly.)

torch is an optional dependency — importing this module without torch
raises an actionable error.
"""

from __future__ import annotations

from typing import Any

import numpy as np

try:
    import torch
    from torch import nn

    _TORCH_AVAILABLE = True
except ImportError:  # pragma: no cover
    _TORCH_AVAILABLE = False

    class nn:  # type: ignore[no-redef]
        Module = object


from stainx_tpu.transforms import StainNormalizerTransform


class TorchStainNormalizerTransform(nn.Module):
    """torch ``nn.Module`` adapter around :class:`StainNormalizerTransform`.

    Drop-in for torchvision ``v2.Compose`` pipelines::

        t = TorchStainNormalizerTransform(method="macenko", reference=ref_chw)
        out = t(batch)          # torch tensor in → torch tensor out

    All constructor arguments are forwarded (``reference`` may be a torch
    tensor). Like the reference, fitted stain parameters are NOT part of
    ``state_dict()`` (``transforms.py:63-68``) — persist them explicitly via
    ``.inner.normalizer.save_state(path)``.
    """

    def __init__(self, *args: Any, **kwargs: Any):
        if not _TORCH_AVAILABLE:
            raise ImportError(
                "TorchStainNormalizerTransform requires torch; install torch or use "
                "stainx_tpu.StainNormalizerTransform directly."
            )
        super().__init__()
        reference = kwargs.get("reference")
        if reference is not None and isinstance(reference, torch.Tensor):
            kwargs["reference"] = reference.detach().cpu().numpy()
        self.inner = StainNormalizerTransform(*args, **kwargs)

    def forward(self, img: "torch.Tensor") -> "torch.Tensor":
        was_torch = isinstance(img, torch.Tensor)
        array = img.detach().cpu().numpy() if was_torch else np.asarray(img)
        out = np.asarray(self.inner(array))
        if not was_torch:
            return out  # type: ignore[return-value]
        # JAX arrays surface as read-only numpy views; copy so torch gets a
        # writable tensor without warnings.
        return torch.from_numpy(np.array(out))

    def fit_reference(self, reference: "torch.Tensor") -> "TorchStainNormalizerTransform":
        if isinstance(reference, torch.Tensor):
            reference = reference.detach().cpu().numpy()
        self.inner.fit_reference(reference)
        return self
