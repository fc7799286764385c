"""Color-space unit tests (model: reference ``tests/test_torch_backend_color_space.py``)."""

import numpy as np
import pytest

from stainx_tpu.ops import color

from tests.oracles import numpy_reference as oracle


class TestRgbLab:
    def test_roundtrip_float(self, float_batch):
        lab = color.rgb_to_lab(float_batch)
        rgb = color.lab_to_rgb(lab)
        np.testing.assert_allclose(np.asarray(rgb), float_batch, atol=3e-2)

    def test_uint8_accepted(self, uint8_batch):
        lab = color.rgb_to_lab(uint8_batch)
        assert np.asarray(lab).dtype == np.float32
        # L channel lands in ~[0, 255] under the 2.55 scaling.
        L = np.asarray(lab)[:, 0]
        assert L.min() >= -1e-3 and L.max() <= 255.0 + 1e-3

    def test_matches_oracle(self, uint8_batch):
        ours = np.asarray(color.rgb_to_lab(uint8_batch))
        ref = oracle.rgb_to_lab(uint8_batch)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_lab_to_rgb_matches_oracle(self, uint8_batch):
        lab = oracle.rgb_to_lab(uint8_batch)
        ours = np.asarray(color.lab_to_rgb(lab))
        ref = oracle.lab_to_rgb(lab)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_float_above_one_not_rescaled(self):
        """ColorJitter regression: floats > 1 must NOT flip a [0,255] branch
        (reference ``test_torch_backend_color_space.py:30-35``)."""
        x = np.full((1, 3, 8, 8), 1.2, dtype=np.float32)
        lab = np.asarray(color.rgb_to_lab(x))
        # Treated as (out-of-gamut) unit-range float: L well above the value
        # a /255 rescale would produce.
        assert lab[:, 0].mean() > 200.0

    def test_channels_last(self, uint8_batch):
        nhwc = np.transpose(uint8_batch, (0, 2, 3, 1))
        lab_nhwc = np.asarray(color.rgb_to_lab(nhwc, channel_axis=-1))
        lab_nchw = np.asarray(color.rgb_to_lab(uint8_batch, channel_axis=1))
        np.testing.assert_allclose(lab_nhwc, np.transpose(lab_nchw, (0, 2, 3, 1)), atol=1e-3)


class TestRangeGates:
    def test_normalize_to_float_uint8(self):
        x = np.array([[[[0, 255]]]], dtype=np.uint8)
        out = np.asarray(color.normalize_to_float(x))
        np.testing.assert_allclose(out, [[[[0.0, 1.0]]]])

    def test_normalize_to_float_float_passthrough(self):
        x = np.array([[[[0.5, 2.0]]]], dtype=np.float32)
        out = np.asarray(color.normalize_to_float(x))
        np.testing.assert_allclose(out, x)  # no max()>1 heuristic

    def test_images_to_uint8_truncates(self):
        x = np.array([[[[0.999, 0.5]]]], dtype=np.float32)
        u8, scaled = color.images_to_uint8(x)
        assert scaled
        np.testing.assert_array_equal(np.asarray(u8), [[[[254, 127]]]])

    @pytest.mark.parametrize("dtype", [np.uint8, np.float32])
    def test_preserve_dtype(self, dtype):
        res = color.preserve_dtype(
            np.full((1, 3, 2, 2), 0.5, np.float32),
            dtype,
            was_uint8_or_high_range=dtype == np.uint8,
            result_in_0_255_range=False,
        )
        assert np.asarray(res).dtype == dtype


class TestLayoutValidation:
    """_nchw validates instead of guessing (round-3 review): an
    out-of-registry axis was read as channels-first, and 3D HWC with
    channel_axis=3 sliced the W axis as channels — garbage, no error."""

    def test_invalid_channel_axis_raises(self):
        import pytest

        from stainx_tpu.ops import color

        with pytest.raises(ValueError, match="channel_axis"):
            color.rgb_to_lab(np.zeros((1, 3, 4, 4), np.float32), channel_axis=0)

    def test_3d_hwc_raises_instead_of_garbage(self):
        import pytest

        from stainx_tpu.ops import color

        with pytest.raises(ValueError, match="4D"):
            color.rgb_to_lab(np.zeros((4, 4, 3), np.float32), channel_axis=3)
