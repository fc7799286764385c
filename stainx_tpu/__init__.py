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
    """Installed-package metadata first, source-tree pyproject second — the
    reference's scheme (``src/stainx/__init__.py:9-17``), with the fallback
    READ from pyproject.toml rather than duplicated here (the 0.2.0-vs-0.2.1
    drift this replaced came from exactly such a second copy)."""
    try:
        from importlib.metadata import version

        return version("stainx-tpu")
    except Exception:
        pass
    try:
        import re
        from pathlib import Path

        text = (Path(__file__).resolve().parent.parent / "pyproject.toml").read_text()
        return re.search(r'^version\s*=\s*"([^"]+)"', text, re.M).group(1)
    except Exception:
        return "0.0.0+unknown"


__version__ = _get_version()

__all__ = [
    "HistogramMatching",
    "Macenko",
    "Reinhard",
    "StainNormalizerTransform",
    "__version__",
]
