"""torch interop adapter (optional dependency — skipped without torch)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from stainx_tpu.interop import TorchStainNormalizerTransform

from tests.oracles import numpy_reference as oracle


@pytest.fixture
def he_ref_torch():
    return torch.from_numpy(oracle.synthetic_he_tile(64, 64, seed=42).copy())


def test_torch_in_torch_out(he_ref_torch):
    t = TorchStainNormalizerTransform(method="reinhard", reference=he_ref_torch, device="cpu")
    batch = torch.from_numpy(
        np.concatenate([oracle.synthetic_he_tile(64, 64, seed=s) for s in (1, 2)]).copy()
    )
    out = t(batch)
    assert isinstance(out, torch.Tensor)
    assert out.shape == batch.shape
    assert out.dtype == torch.uint8


def test_matches_plain_transform(he_ref_torch):
    from stainx_tpu import StainNormalizerTransform

    ref_np = he_ref_torch.numpy()
    batch_np = np.concatenate([oracle.synthetic_he_tile(64, 64, seed=s) for s in (3, 4)])

    t_torch = TorchStainNormalizerTransform(method="macenko", reference=he_ref_torch, device="cpu")
    t_plain = StainNormalizerTransform(method="macenko", reference=ref_np, device="cpu")

    out_t = t_torch(torch.from_numpy(batch_np.copy())).numpy()
    out_p = np.asarray(t_plain(batch_np))
    np.testing.assert_allclose(out_t, out_p, atol=1e-6)


def test_state_dict_excludes_fitted_params(he_ref_torch):
    """Reference contract (transforms.py:63-68 + its test :224-227):
    checkpoints do not carry stain parameters."""
    t = TorchStainNormalizerTransform(method="macenko", reference=he_ref_torch, device="cpu")
    assert t.state_dict() == {}


def test_float_pipeline(he_ref_torch):
    t = TorchStainNormalizerTransform(method="macenko", reference=he_ref_torch, device="cpu")
    batch = torch.rand(2, 3, 64, 64)
    out = t(batch)
    assert out.dtype == torch.float32
    assert float(out.max()) <= 1.0 + 1e-5
