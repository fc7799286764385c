"""Template / base-class unit tests (model: reference
``tests/test_normalizer_template_unit.py:13-26``)."""

import numpy as np
import pytest

from stainx_tpu import HistogramMatching, Macenko, Reinhard


@pytest.mark.parametrize("cls", [Macenko, Reinhard, HistogramMatching])
def test_unfitted_transform_raises(cls, uint8_batch):
    with pytest.raises(ValueError, match="fit"):
        cls(device="cpu").transform(uint8_batch)


@pytest.mark.parametrize("cls", [Macenko, Reinhard, HistogramMatching])
def test_fit_transform_shape_type(cls, uint8_batch):
    out = np.asarray(cls(device="cpu").fit_transform(uint8_batch))
    assert out.shape == uint8_batch.shape
    assert out.dtype == np.uint8


def test_fit_returns_self(uint8_batch):
    norm = Reinhard(device="cpu")
    assert norm.fit(uint8_batch) is norm


def test_invalid_backend_rejected():
    with pytest.raises(ValueError, match="Unsupported backend"):
        Reinhard(device="cpu", backend="bogus")


def test_legacy_backend_names_give_actionable_error():
    with pytest.raises(ValueError, match="xla"):
        Reinhard(device="cpu", backend="torch")
    with pytest.raises(ValueError, match="pallas"):
        Reinhard(device="cpu", backend="torch_cuda")


def test_backend_autoselect_cpu():
    assert Reinhard(device="cpu").backend == "xla"


def test_explicit_pallas_backend_constructs():
    # Pallas is importable wherever jax is; kernels run interpreted off-TPU.
    norm = Reinhard(device="cpu", backend="pallas")
    assert norm.backend == "pallas"


def test_state_roundtrip(uint8_batch):
    src = Macenko(device="cpu").fit(uint8_batch[:1])
    dst = Macenko(device="cpu").load_state(src.state)
    assert dst._is_fitted
    np.testing.assert_array_equal(
        np.asarray(dst._stain_matrix), np.asarray(src._stain_matrix)
    )
    out = dst.transform(uint8_batch)
    assert out.shape == uint8_batch.shape


def test_to_device_moves_state(uint8_batch):
    norm = Reinhard(device="cpu").fit(uint8_batch)
    norm.to_device("cpu")  # no-op move keeps fitted state intact
    assert norm._is_fitted
    assert norm._reference_mean.shape == (3,)


def test_numpy_inputs_accepted(uint8_batch):
    out = Reinhard(device="cpu").fit(uint8_batch).transform(uint8_batch)
    assert np.asarray(out).shape == uint8_batch.shape


def test_save_load_state_file(tmp_path, uint8_batch):
    from stainx_tpu import Macenko

    src = Macenko(device="cpu").fit(uint8_batch[:1])
    path = str(tmp_path / "fitted.npz")
    src.save_state(path)
    dst = Macenko(device="cpu").load_state_file(path)
    assert dst._is_fitted
    np.testing.assert_array_equal(np.asarray(dst._stain_matrix), np.asarray(src._stain_matrix))
    np.testing.assert_array_equal(np.asarray(dst._target_max_conc), np.asarray(src._target_max_conc))


def test_save_state_unfitted_raises(tmp_path):
    from stainx_tpu import Reinhard

    with pytest.raises(ValueError, match="fit"):
        Reinhard(device="cpu").save_state(str(tmp_path / "x.npz"))


def test_profiling_time_fn(uint8_batch):
    import jax.numpy as jnp

    from stainx_tpu import profiling

    secs = profiling.time_fn(lambda x: x + jnp.uint8(1), jnp.asarray(uint8_batch), iters=3)
    assert secs > 0
