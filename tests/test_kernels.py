"""Pallas kernels: interpret-mode parity vs their jnp twins (SURVEY §7.6:
"each kernel has an interpret-mode parity test")."""

import numpy as np
import pytest

import jax.numpy as jnp

from stainx_tpu.ops import histogram_matching as hm_ops


class TestHistogramKernel:
    @pytest.mark.parametrize("p", [4096, 8192, 5000, 100])
    def test_matches_jnp_twin(self, p):
        from stainx_tpu.kernels.histogram import histogram_256_pallas

        rng = np.random.default_rng(p)
        vals = rng.integers(0, 256, size=(3, p), dtype=np.uint8)
        got = np.asarray(histogram_256_pallas(jnp.asarray(vals), interpret=True))
        ref = np.asarray(hm_ops.histogram_256(jnp.asarray(vals)))
        np.testing.assert_array_equal(got, ref)

    def test_zero_heavy_padding_correction(self):
        """Padding uses value 0; the pad count must be subtracted exactly."""
        from stainx_tpu.kernels.histogram import histogram_256_pallas

        vals = np.zeros((1, 5000), np.uint8)  # all zeros + 3192 pad zeros
        got = np.asarray(histogram_256_pallas(jnp.asarray(vals), interpret=True))
        assert got[0, 0] == 5000.0
        assert got[0, 1:].sum() == 0.0

    def test_hm_transform_pallas_path_matches_xla(self):
        rng = np.random.default_rng(0)
        ref_img = rng.integers(0, 256, (1, 3, 32, 32), np.uint8)
        src = rng.integers(0, 256, (2, 3, 32, 32), np.uint8)
        hist = hm_ops.hm_fit(jnp.asarray(ref_img))
        out_x = np.asarray(hm_ops.hm_transform(jnp.asarray(src), hist, use_pallas=False))
        out_p = np.asarray(hm_ops.hm_transform(jnp.asarray(src), hist, use_pallas=True))
        np.testing.assert_array_equal(out_x, out_p)
