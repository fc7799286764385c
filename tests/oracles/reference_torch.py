"""The mounted reference implementation as an *executable* oracle.

The reference repo (read-only at ``/root/reference``) ships a pure torch-CPU
backend whose semantics this framework re-implements TPU-first. Its external
oracles (torchstain 1.4.1, scikit-image) are not installable here, but the
reference's own torch backend *is* importable and is itself gated against
those oracles upstream (``tests/torch_interface/
test_correctness_against_references.py:115-160,215-225``) — so running it on
CPU gives an executable, independently-validated baseline at the reference
tolerances. This module only loads and wraps it; nothing here ships in the
library.

All wrappers take/return numpy so the parity tests stay framework-neutral.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REF_SRC = Path("/root/reference/src")

_ref_pkg = None


def load_reference():
    """Import the reference ``stainx`` package (torch CPU); None if absent."""
    global _ref_pkg
    if _ref_pkg is not None:
        return _ref_pkg
    if not (REF_SRC / "stainx").is_dir():
        return None
    try:
        import torch  # noqa: F401
    except Exception:
        return None
    if str(REF_SRC) not in sys.path:
        sys.path.insert(0, str(REF_SRC))
    try:
        import stainx as ref_stainx
    except Exception:
        return None
    _ref_pkg = ref_stainx
    return _ref_pkg


def available() -> bool:
    return load_reference() is not None


def _t(a: np.ndarray):
    import torch

    return torch.from_numpy(np.ascontiguousarray(a))


def _n(t) -> np.ndarray:
    return t.detach().cpu().numpy()


# ------------------------------------------------------------------ Reinhard
def reinhard(ref_img: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Reference Reinhard fit+transform on torch CPU."""
    import torch

    ref = load_reference()
    norm = ref.Reinhard(device=torch.device("cpu"), backend="torch")
    norm.fit(_t(ref_img))
    return _n(norm.transform(_t(src)))


def reinhard_fitted(ref_img: np.ndarray):
    """Fit once, return a transform-only closure — for benchmarks that time
    transform in isolation (this library's modes exclude fit cost; the peer
    series must too)."""
    import torch

    ref = load_reference()
    norm = ref.Reinhard(device=torch.device("cpu"), backend="torch")
    norm.fit(_t(ref_img))
    return lambda src: _n(norm.transform(_t(src)))


# ------------------------------------------------------------------- Macenko
def macenko_fit(ref_img: np.ndarray):
    """Reference Macenko fit → (stain_matrix (3,2), target_max_conc (2,))."""
    import torch

    ref = load_reference()
    norm = ref.Macenko(device=torch.device("cpu"), backend="torch")
    norm.fit(_t(ref_img))
    return _n(norm._stain_matrix), _n(norm._target_max_conc).reshape(-1)


def macenko_transform(src: np.ndarray, stain_matrix: np.ndarray, max_conc: np.ndarray) -> np.ndarray:
    """Reference Macenko transform with injected fitted state (the reference
    test's own scheme — ``test_correctness_against_references.py:144-151``)."""
    import torch

    ref = load_reference()
    norm = ref.Macenko(device=torch.device("cpu"), backend="torch")
    norm._stain_matrix = _t(np.asarray(stain_matrix, np.float32))
    norm._target_max_conc = _t(np.asarray(max_conc, np.float32))
    norm._is_fitted = True
    return _n(norm.transform(_t(src)))


# ------------------------------------------------------- Histogram matching
def histogram_matching(ref_img: np.ndarray, src: np.ndarray, channel_axis: int = 1) -> np.ndarray:
    """Reference HistogramMatching fit+transform on torch CPU."""
    import torch

    ref = load_reference()
    norm = ref.HistogramMatching(
        device=torch.device("cpu"), backend="torch", channel_axis=channel_axis
    )
    norm.fit(_t(ref_img))
    return _n(norm.transform(_t(src)))


def histogram_matching_fitted(ref_img: np.ndarray, channel_axis: int = 1):
    """Fit once, return a transform-only closure (see reinhard_fitted)."""
    import torch

    ref = load_reference()
    norm = ref.HistogramMatching(
        device=torch.device("cpu"), backend="torch", channel_axis=channel_axis
    )
    norm.fit(_t(ref_img))
    return lambda src: _n(norm.transform(_t(src)))
