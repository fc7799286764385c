"""Parity vs the mounted reference implementation (executable oracle).

The reference's torch-CPU backends — themselves pinned upstream against
torchstain 1.4.1 / scikit-image (``/root/reference/tests/torch_interface/
test_correctness_against_references.py:115-160,215-225``) — are imported
read-only and run side-by-side with this framework at the *reference
tolerances* (``:35-38``): Reinhard/HM ``atol=1`` grey level; Macenko
``atol=2`` on ALL pixels, ``MAE<=0.35``, fitted HE ``rtol=1e-4/atol=1e-5``
and maxC ``rtol=1e-3/atol=1e-4`` (``:153-154``). Size matrix is the
reference's own 10 sizes incl. non-square 321x199 (``:99``), on uint8 AND
float [0,1] inputs, for both precision modes.

Skips (never simulates) when the reference mount or torch is unavailable.
"""

from __future__ import annotations

import numpy as np
import pytest

from stainx_tpu import HistogramMatching, Macenko, Reinhard

from tests.oracles import numpy_reference as np_oracle
from tests.oracles import reference_torch as ref_oracle

pytestmark = pytest.mark.skipif(
    not ref_oracle.available(), reason="reference mount or torch unavailable"
)

RTOL = 0.0
ATOL = 1.0
MACENKO_ATOL = 2.0
MACENKO_MAE = 0.35

# The reference's own size matrix (test_correctness_against_references.py:99).
SIZES = [
    (64, 64),
    (128, 128),
    (256, 256),
    (256, 512),
    (321, 199),
    (384, 256),
    (480, 640),
    (512, 512),
    pytest.param((1024, 1024), marks=pytest.mark.slow),
    pytest.param((2048, 2048), marks=pytest.mark.slow),
]
FLOAT_SIZES = [(64, 64), (256, 512), (321, 199)]


def _noise_pair(hw):
    h, w = hw
    ref = np.random.default_rng(42).integers(0, 256, size=(1, 3, h, w), dtype=np.uint8)
    src = np.random.default_rng(123).integers(0, 256, size=(1, 3, h, w), dtype=np.uint8)
    return ref, src


def _he_pair(hw):
    h, w = hw
    return (
        np_oracle.synthetic_he_tile(h, w, seed=42, he_scale=1.0),
        np_oracle.synthetic_he_tile(h, w, seed=123, he_scale=1.15),
    )


def _grey(x: np.ndarray, float_scale: bool) -> np.ndarray:
    """To grey-level units so tolerances read the same for uint8 and float."""
    x = np.asarray(x, np.float32)
    return x * 255.0 if float_scale else x


# ------------------------------------------------------------------ Macenko
class TestMacenkoVsReference:
    @pytest.mark.parametrize("hw", SIZES)
    def test_fit_parity(self, hw):
        """Fitted HE / maxC at the reference's own allclose tolerances
        (test_correctness_against_references.py:153-154)."""
        ref_img, _ = _he_pair(hw)
        he_r, mc_r = ref_oracle.macenko_fit(ref_img)
        norm = Macenko(device="cpu").fit(ref_img)
        np.testing.assert_allclose(
            np.asarray(norm._stain_matrix), he_r, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(norm._target_max_conc).reshape(-1), mc_r, rtol=1e-3, atol=1e-4
        )

    @pytest.mark.parametrize("precision", ["stable", "fast"])
    @pytest.mark.parametrize("hw", SIZES)
    def test_transform_parity_uint8(self, hw, precision):
        """Transform with injected reference-fitted state (the reference
        test's own isolation scheme, ``:144-151``): ALL pixels within
        atol=2, MAE<=0.35, no Io cap."""
        ref_img, src = _he_pair(hw)
        he_r, mc_r = ref_oracle.macenko_fit(ref_img)
        expected = ref_oracle.macenko_transform(src, he_r, mc_r).astype(np.float32)

        norm = Macenko(device="cpu", precision=precision)
        norm.load_state({"_stain_matrix": he_r, "_target_max_conc": mc_r})
        result = np.asarray(norm.transform(src)).astype(np.float32)

        diff = np.abs(result - expected)
        assert diff.max() <= MACENKO_ATOL, f"max {diff.max()} (hw={hw}, {precision})"
        mae = diff.mean()
        assert mae <= MACENKO_MAE, f"MAE {mae:.4f} (hw={hw}, {precision})"
        assert result.max() <= 255.0 + MACENKO_ATOL
        if expected.max() > 240.0:  # no Io output cap (reference ``:159-160``)
            assert result.max() > 240.0

    @pytest.mark.parametrize("hw", [(128, 128), (256, 512)])
    def test_end_to_end_parity(self, hw):
        """Our fit + our transform vs reference fit + reference transform —
        the full user-visible pipeline, no state injection."""
        ref_img, src = _he_pair(hw)
        he_r, mc_r = ref_oracle.macenko_fit(ref_img)
        expected = ref_oracle.macenko_transform(src, he_r, mc_r).astype(np.float32)
        result = np.asarray(
            Macenko(device="cpu").fit(ref_img).transform(src)
        ).astype(np.float32)
        diff = np.abs(result - expected)
        assert diff.max() <= MACENKO_ATOL
        assert diff.mean() <= MACENKO_MAE

    @pytest.mark.parametrize("precision", ["stable", "fast"])
    @pytest.mark.parametrize("hw", FLOAT_SIZES)
    def test_transform_parity_float(self, hw, precision):
        """Float [0,1] input: float32 output in [0,255] (reference
        ``torch_backend.py:122-131,560``), same grey-level gates."""
        ref_img, src = _he_pair(hw)
        src_f = src.astype(np.float32) / 255.0
        he_r, mc_r = ref_oracle.macenko_fit(ref_img)
        expected = ref_oracle.macenko_transform(src_f, he_r, mc_r).astype(np.float32)

        norm = Macenko(device="cpu", precision=precision)
        norm.load_state({"_stain_matrix": he_r, "_target_max_conc": mc_r})
        result = np.asarray(norm.transform(src_f))

        assert result.dtype == np.float32
        diff = np.abs(result - expected)
        assert diff.max() <= MACENKO_ATOL, f"max {diff.max()} (hw={hw}, {precision})"
        assert diff.mean() <= MACENKO_MAE


# ----------------------------------------------------------------- Reinhard
class TestReinhardVsReference:
    @pytest.mark.parametrize("hw", SIZES)
    def test_uint8(self, hw):
        ref_img, src = _noise_pair(hw)
        expected = ref_oracle.reinhard(ref_img, src).astype(np.float32)
        result = np.asarray(
            Reinhard(device="cpu").fit(ref_img).transform(src)
        ).astype(np.float32)
        np.testing.assert_allclose(result, expected, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("hw", FLOAT_SIZES)
    def test_float(self, hw):
        """Float path: both sides output [0,1] floats; gate in grey levels."""
        ref_img, src = _noise_pair(hw)
        ref_f = ref_img.astype(np.float32) / 255.0
        src_f = src.astype(np.float32) / 255.0
        expected = _grey(ref_oracle.reinhard(ref_f, src_f), True)
        result = _grey(Reinhard(device="cpu").fit(ref_f).transform(src_f), True)
        np.testing.assert_allclose(result, expected, rtol=RTOL, atol=ATOL)


# ------------------------------------------------------- Histogram matching
class TestHistogramMatchingVsReference:
    @pytest.mark.parametrize("hw", SIZES)
    def test_uint8_nchw(self, hw):
        ref_img, src = _noise_pair(hw)
        expected = ref_oracle.histogram_matching(ref_img, src).astype(np.float32)
        result = np.asarray(
            HistogramMatching(device="cpu").fit(ref_img).transform(src)
        ).astype(np.float32)
        np.testing.assert_allclose(result, expected, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("channel_axis", [-1, 3, -3])
    def test_channel_axes(self, channel_axis):
        """All channel_axis layouts at a non-square size (reference
        ``:215-225`` runs the full cross product; the NCHW sweep above plus
        this layout sweep covers the same code paths)."""
        ref_img, src = _noise_pair((256, 512))
        if channel_axis in (-1, 3):
            ref_img = np.transpose(ref_img, (0, 2, 3, 1)).copy()
            src = np.transpose(src, (0, 2, 3, 1)).copy()
        expected = ref_oracle.histogram_matching(ref_img, src, channel_axis).astype(np.float32)
        result = np.asarray(
            HistogramMatching(device="cpu", channel_axis=channel_axis)
            .fit(ref_img)
            .transform(src)
        ).astype(np.float32)
        np.testing.assert_allclose(result, expected, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("hw", FLOAT_SIZES)
    def test_float(self, hw):
        ref_img, src = _noise_pair(hw)
        ref_f = ref_img.astype(np.float32) / 255.0
        src_f = src.astype(np.float32) / 255.0
        expected = _grey(ref_oracle.histogram_matching(ref_f, src_f), True)
        result = _grey(
            HistogramMatching(device="cpu").fit(ref_f).transform(src_f), True
        )
        np.testing.assert_allclose(result, expected, rtol=RTOL, atol=ATOL)


# ----------------------------------------------- numpy-oracle cross-check
class TestNumpyOracleCrossValidation:
    """The repo's pure-numpy oracle (every other test's baseline) validated
    once against the reference implementation itself — closes the
    builder-validates-builder loop flagged in round 1."""

    def test_macenko(self):
        ref_img, src = _he_pair((256, 512))
        he_r, mc_r = ref_oracle.macenko_fit(ref_img)
        he_n, mc_n = np_oracle.macenko_fit(ref_img)
        np.testing.assert_allclose(he_n, he_r, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(mc_n, mc_r, rtol=1e-3, atol=1e-4)
        got = np_oracle.macenko_transform(src, he_r, mc_r).astype(np.float32)
        exp = ref_oracle.macenko_transform(src, he_r, mc_r).astype(np.float32)
        np.testing.assert_allclose(got, exp, rtol=0, atol=1.0)

    def test_reinhard(self):
        ref_img, src = _noise_pair((256, 512))
        got = np_oracle.reinhard_transform(src, *np_oracle.reinhard_fit(ref_img))
        exp = ref_oracle.reinhard(ref_img, src)
        np.testing.assert_allclose(
            got.astype(np.float32), exp.astype(np.float32), rtol=0, atol=1.0
        )

    def test_histogram_matching(self):
        ref_img, src = _noise_pair((256, 512))
        got = np_oracle.hm_transform(src, np_oracle.hm_fit(ref_img))
        exp = ref_oracle.histogram_matching(ref_img, src)
        np.testing.assert_allclose(
            got.astype(np.float32), exp.astype(np.float32), rtol=0, atol=1.0
        )
