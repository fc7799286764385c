"""Pallas TPU kernels backing the hot ops.

TPU-native replacement for the reference's compiled CUDA extension
(``csrc/*.cu`` + ``src/stainx_cuda_torch/csrc/*``). Availability probing
mirrors the reference's extension probe
(``src/stainx/backends/torch_cuda_backend.py:8-14``): a failed import
degrades to the pure-XLA path rather than erroring.

Kernels run compiled on TPU and in interpreter mode elsewhere, so every
kernel has an exact jnp twin and an interpret-mode parity test.
"""

from __future__ import annotations

import jax

try:  # pragma: no cover - import probe
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def interpret_mode() -> bool:
    """True when kernels must run interpreted (no TPU backend)."""
    return jax.default_backend() != "tpu"
