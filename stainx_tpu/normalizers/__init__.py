"""Normalizer API classes (counterpart of ``src/stainx/normalizers/__init__.py``)."""

from stainx_tpu.normalizers.histogram_matching import HistogramMatching
from stainx_tpu.normalizers.macenko import Macenko
from stainx_tpu.normalizers.reinhard import Reinhard

__all__ = ["HistogramMatching", "Macenko", "Reinhard"]
