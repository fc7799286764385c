"""Abstract normalizer base — the ``fit / transform / fit_transform`` contract.

Counterpart of the reference's ``StainNormalizerBase``
(``src/stainx/base.py:12-61``): holds the resolved device and the fitted
flag; ``fit_transform`` composes ``fit`` then ``transform``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from stainx_tpu.utils import get_device


class StainNormalizerBase(ABC):
    """Base class for stain normalizers (framework-agnostic API shape)."""

    def __init__(self, device: str | Any | None = None):
        self.device = get_device(device)
        self._is_fitted = False

    @abstractmethod
    def fit(self, images: Any) -> "StainNormalizerBase":
        """Fit the normalizer to reference images. Returns self."""

    @abstractmethod
    def transform(self, images: Any) -> Any:
        """Transform images using the fitted normalizer."""

    def fit_transform(self, images: Any) -> Any:
        """Fit and transform in one step (``base.py:51-61``)."""
        self.fit(images)
        return self.transform(images)
