"""Real-H&E parity — opt-in, reads the upstream repo's example tiles.

Synthetic Beer–Lambert fixtures never exercise saturated pixels,
background-heavy regions, or real stain statistics (round-1 review gap).
When the reference mount provides its real H&E PNGs
(``/root/reference/examples/data``), this module runs all three
normalizers on them against the reference's own torch-CPU backends at the
reference tolerances. The images are READ from the mount at test time,
never copied into this repository. Skips when the data or torch is absent.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from stainx_tpu import HistogramMatching, Macenko, Reinhard

from tests.oracles import reference_torch as ref_oracle

_DATA = "/root/reference/examples/data"

pytestmark = pytest.mark.skipif(
    not (ref_oracle.available() and os.path.isfile(os.path.join(_DATA, "target.png"))),
    reason="reference mount (oracle or real H&E tiles) unavailable",
)

RTOL = 0.0
ATOL = 1.0
MACENKO_ATOL = 2.0
MACENKO_MAE = 0.35


def _png(path: str) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)
    return np.transpose(img, (2, 0, 1))[None]


@pytest.fixture(scope="module")
def target():
    return _png(os.path.join(_DATA, "target.png"))


def _source_paths():
    if not os.path.isdir(_DATA):
        return []
    return sorted(
        p for p in glob.glob(os.path.join(_DATA, "*.png")) if os.path.basename(p) != "target.png"
    )


@pytest.fixture(scope="module", params=_source_paths() or ["missing"])
def source(request):
    if request.param == "missing":
        pytest.skip("no source tiles")
    return _png(request.param)


class TestRealTiles:
    def test_macenko(self, target, source):
        """Real tissue through the full pipeline: fitted state at reference
        tolerances AND all-pixel transform parity. Real tiles carry
        saturated/background pixels, so this exercises the β-filter on
        actual data."""
        he_r, mc_r = ref_oracle.macenko_fit(target)
        norm = Macenko(device="cpu").fit(target)
        np.testing.assert_allclose(np.asarray(norm._stain_matrix), he_r, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(norm._target_max_conc).reshape(-1), mc_r, rtol=1e-3, atol=1e-4
        )

        expected = ref_oracle.macenko_transform(source, he_r, mc_r).astype(np.float32)
        result = np.asarray(norm.transform(source)).astype(np.float32)
        diff = np.abs(result - expected)
        assert diff.max() <= MACENKO_ATOL
        assert diff.mean() <= MACENKO_MAE

    def test_reinhard(self, target, source):
        expected = ref_oracle.reinhard(target, source).astype(np.float32)
        result = np.asarray(Reinhard(device="cpu").fit(target).transform(source)).astype(np.float32)
        np.testing.assert_allclose(result, expected, rtol=RTOL, atol=ATOL)

    def test_histogram_matching(self, target, source):
        expected = ref_oracle.histogram_matching(target, source).astype(np.float32)
        result = np.asarray(
            HistogramMatching(device="cpu").fit(target).transform(source)
        ).astype(np.float32)
        np.testing.assert_allclose(result, expected, rtol=RTOL, atol=ATOL)
