"""stainx_tpu — TPU-native stain normalization for histopathology (JAX / XLA / Pallas).

A from-scratch re-design of the StainX API (reference: rendeirolab/stainx,
``src/stainx/__init__.py:1-17``) for TPU hardware:

- Three algorithms — :class:`Macenko`, :class:`Reinhard`,
  :class:`HistogramMatching` — with the scikit-learn style
  ``fit / transform / fit_transform`` API.
- A pipeline transform — :class:`StainNormalizerTransform` — for training
  input pipelines (``reference`` and ``batch`` modes).
- One jit-compiled compute path per algorithm (no CPU/accelerator backend
  dichotomy): pure XLA pipelines with optional Pallas TPU kernels for the
  hot ops (``backend="pallas"``).
- Distributed batch-mode statistics over a ``jax.sharding.Mesh`` (see
  :mod:`stainx_tpu.parallel`).
"""

from stainx_tpu.normalizers import HistogramMatching, Macenko, Reinhard
from stainx_tpu.transforms import StainNormalizerTransform


def _get_version() -> str:
    """Installed-package metadata first, source-tree fallback second — the
    reference's scheme (``src/stainx/__init__.py:9-17``), so an editable
    checkout and a wheel report consistently."""
    try:
        from importlib.metadata import version

        return version("stainx-tpu")
    except Exception:
        return "0.3.0"


__version__ = _get_version()

__all__ = [
    "HistogramMatching",
    "Macenko",
    "Reinhard",
    "StainNormalizerTransform",
    "__version__",
]
