"""Reinhard correctness vs the numpy oracle + API behavior.

Tolerance: at most one grey level (ATOL=1, RTOL=0) — the reference's gate
vs torchstain (``docs/correctness_report.md:18-20``).
"""

import numpy as np
import pytest

from stainx_tpu import Reinhard
from stainx_tpu.ops import reinhard as reinhard_ops

from tests.oracles import numpy_reference as oracle

ATOL = 1.0


def _noise(shape, seed, dtype=np.uint8):
    rng = np.random.default_rng(seed)
    if dtype == np.uint8:
        return rng.integers(0, 256, size=shape, dtype=np.uint8)
    return rng.random(shape, dtype=np.float32)


@pytest.mark.parametrize("hw", [(64, 64), (128, 128), (96, 160), (321, 199)])
def test_vs_oracle_uint8(hw):
    h, w = hw
    ref = _noise((1, 3, h, w), 42)
    src = _noise((2, 3, h, w), 123)

    norm = Reinhard(device="cpu")
    result = np.asarray(norm.fit(ref).transform(src))

    ref_mean, ref_std = oracle.reinhard_fit(ref)
    expected = oracle.reinhard_transform(src, ref_mean, ref_std)

    assert result.dtype == np.uint8
    np.testing.assert_allclose(result.astype(np.float32), expected.astype(np.float32), atol=ATOL, rtol=0)


def test_vs_oracle_float():
    ref = _noise((1, 3, 64, 64), 7, np.float32)
    src = _noise((3, 3, 64, 64), 8, np.float32)

    result = np.asarray(Reinhard(device="cpu").fit(ref).transform(src))
    expected = oracle.reinhard_transform(src, *oracle.reinhard_fit(ref))

    assert result.dtype == np.float32
    assert result.min() >= 0.0 and result.max() <= 1.0
    np.testing.assert_allclose(result * 255.0, expected * 255.0, atol=ATOL, rtol=0)


def test_fitted_state_shapes(uint8_image):
    norm = Reinhard(device="cpu").fit(uint8_image)
    assert norm._reference_mean.shape == (3,)
    assert norm._reference_std.shape == (3,)
    state = norm.state
    norm2 = Reinhard(device="cpu").load_state(state)
    assert norm2._is_fitted


def test_fit_moments_match_direct(uint8_batch):
    n, s, sq = reinhard_ops.lab_moments(uint8_batch)
    mean, std = reinhard_ops.moments_to_mean_std(n, s, sq)
    mean_d, std_d = reinhard_ops.reinhard_fit(uint8_batch)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_d), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(std), np.asarray(std_d), rtol=1e-3, atol=1e-3)


def test_unfitted_raises(uint8_batch):
    with pytest.raises(ValueError, match="fit"):
        Reinhard(device="cpu").transform(uint8_batch)


def test_fit_transform_preserves_shape_dtype(uint8_batch):
    out = np.asarray(Reinhard(device="cpu").fit_transform(uint8_batch))
    assert out.shape == uint8_batch.shape
    assert out.dtype == np.uint8


def test_nhwc_rejected(uint8_batch):
    nhwc = np.transpose(uint8_batch, (0, 2, 3, 1))
    with pytest.raises(ValueError, match="NCHW"):
        Reinhard(device="cpu").fit(nhwc)
