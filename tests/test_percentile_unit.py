"""Unit tests for the jnp key-space rank selection (ops/percentile.py).

These pin the failure regimes that killed the earlier value-space (f32
interval) refinement — all found by adversarial review in round 3:

- a row magnitude near FLT_MAX overflowed ``hi + pad`` to +inf, after which
  no interval could narrow and EVERY rank returned the row minimum;
- any huge-magnitude outlier (1e30 next to order-1 elements) inflated the
  relative width floor past the rank element's quantum — same silent
  row-minimum result;
- fully-masked rows returned NaN while every kernels/selection.py mode
  resolves them to +inf, making a degenerate row's result depend on
  backend routing.

The key-space descent has none of these regimes by construction (exact
integer interval arithmetic, ≤ 8 levels); the tests keep it that way.
Reference rank semantics: nearest-rank on sorted values,
``src/stainx_cuda_torch/torch_backend.py:363-365``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stainx_tpu.ops.percentile import (
    kth_smallest,
    masked_nearest_rank_percentile,
    percentile_all,
)


class TestKthSmallestEdgeRegimes:
    def test_flt_max_row_every_rank(self):
        x = jnp.array([[0.0, 1.0, 3.4028235e38, 2.0]])
        srt = np.sort(np.asarray(x[0]))
        for r in range(4):
            got = np.asarray(kth_smallest(x, jnp.array([r])))[0]
            assert got == srt[r], (r, got)

    def test_full_range_row_every_rank(self):
        """lo near −FLT_MAX AND hi near +FLT_MAX: every float intermediate
        of a value-space descent (hi−lo, xs−lo, bsel·w) overflows here, and
        the int32 key view's top bucket stresses the new_hi clamp."""
        x = jnp.array([[-3.0e38, -1.0, 0.5, 2.0e38, 7.0, 3.3e38, -3.3e38]])
        srt = np.sort(np.asarray(x[0]))
        for r in range(7):
            got = np.asarray(kth_smallest(x, jnp.array([r])))[0]
            assert got == srt[r], (r, got)

    def test_huge_outlier_does_not_blur_small_ranks(self):
        x = jnp.array([[0.0, 1.0, 2.0, 1e30]])
        assert np.asarray(kth_smallest(x, jnp.array([1])))[0] == 1.0
        assert np.asarray(kth_smallest(x, jnp.array([2])))[0] == 2.0

    def test_denormal_spread(self):
        vals = np.array([0.0, 1e-45, 3e-44, 2e-39, -1e-44], np.float32)
        x = jnp.asarray(vals[None])
        srt = np.sort(vals)
        for r in range(5):
            got = np.asarray(kth_smallest(x, jnp.array([r])))[0]
            assert got == srt[r], (r, got)

    def test_empty_mask_returns_pos_inf(self):
        """Matches the kernels/selection.py empty-row convention so the
        degenerate result cannot depend on backend or row-size routing."""
        got = np.asarray(
            kth_smallest(jnp.ones((2, 8)), jnp.array([0, 0]), mask=jnp.zeros((2, 8), bool))
        )
        assert np.all(np.isinf(got)) and np.all(got > 0)

    def test_empty_mask_sampled_path(self):
        p = 1 << 16
        got = np.asarray(
            kth_smallest(jnp.ones((1, p)), jnp.array([0]), mask=jnp.zeros((1, p), bool))
        )
        assert np.isinf(got[0]) and got[0] > 0

    def test_out_of_range_rank_clamps_to_max(self):
        """Same clamping as kernels/selection.py's interpolated descent."""
        x = jnp.array([[3.0, -1.0, 7.5, 0.25]])
        got = np.asarray(kth_smallest(x, jnp.array([99])))[0]
        assert got == 7.5

    def test_stride_aligned_masked_sample(self):
        """Every 64th pixel invalid ⇒ the 1/64 strided sample is empty while
        the row is not: the warm start must fall back to the global chain,
        not trust an empty-sample window."""
        p = 1 << 17
        rng = np.random.default_rng(7)
        data = rng.normal(size=(1, p)).astype(np.float32)
        m = np.ones((1, p), bool)
        m[0, ::64] = False
        r = 70000
        got = np.asarray(
            kth_smallest(jnp.asarray(data), jnp.array([r]), mask=jnp.asarray(m))
        )[0]
        assert got == np.sort(data[0][m[0]])[r]

    def test_negative_zero_ordering(self):
        x = jnp.array([[-0.0, 0.0, -1.5, 3.25, -2.5]])
        srt = np.sort(np.asarray(x[0]))
        for r in range(5):
            got = np.asarray(kth_smallest(x, jnp.array([r])))[0]
            assert got == srt[r]

    def test_fast_levels_cap_returns_an_element(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 1000)).astype(np.float32)
        v = np.asarray(kth_smallest(jnp.asarray(x), jnp.array([10, 500, 990]), levels=4))
        for i in range(3):
            assert v[i] in x[i]

    @pytest.mark.parametrize("seed", [11, 12])
    def test_randomized_bit_exact_vs_numpy(self, seed):
        rng = np.random.default_rng(seed)
        for trial in range(25):
            rows = int(rng.integers(1, 4))
            p = int(rng.integers(1, 300))
            kind = trial % 4
            if kind == 0:
                x = rng.normal(size=(rows, p)).astype(np.float32)
            elif kind == 1:
                x = rng.integers(-3, 4, size=(rows, p)).astype(np.float32)
            elif kind == 2:
                x = (
                    rng.normal(size=(rows, p))
                    * 10.0 ** rng.integers(-40, 39, size=(rows, p))
                ).astype(np.float32)
            else:
                x = np.full((rows, p), rng.normal(), np.float32)
            m = rng.random((rows, p)) < 0.85
            cnt = m.sum(1)
            ranks = np.array(
                [rng.integers(0, c) if c else 0 for c in cnt], np.int32
            )
            got = np.asarray(
                kth_smallest(jnp.asarray(x), jnp.asarray(ranks), mask=jnp.asarray(m))
            )
            for i in range(rows):
                if cnt[i] == 0:
                    assert np.isinf(got[i]) and got[i] > 0
                else:
                    want = np.sort(x[i][m[i]])[ranks[i]]
                    assert got[i] == want or (want == 0 and got[i] == 0)

    def test_masked_percentile_wrapper(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 500)).astype(np.float32)
        m = rng.random((2, 500)) < 0.7
        cnt = m.sum(1).astype(np.int32)
        got = np.asarray(
            masked_nearest_rank_percentile(
                jnp.asarray(x), jnp.asarray(m), jnp.asarray(cnt), 99
            )
        )
        for i in range(2):
            vals = np.sort(x[i][m[i]])
            idx = int(np.round(0.01 * 99 * (cnt[i] - 1)))
            assert got[i] == vals[idx]

    def test_percentile_all_static(self):
        x = jnp.asarray(np.arange(101, dtype=np.float32)[None])
        assert np.asarray(percentile_all(x, 99))[0] == 99.0


def test_key_definitions_pinned_across_modules():
    """ops/percentile.py deliberately re-derives the monotone key bit flips
    (it must import without the kernels package); this pins its fused-XOR
    forms bit-identical to kernels/selection.py's two-step forms and
    kernels/selection_stream.py's scalar inverse, so the three definitions
    cannot drift apart."""
    kernels = pytest.importorskip("stainx_tpu.kernels.selection")
    stream = pytest.importorskip("stainx_tpu.kernels.selection_stream")
    from stainx_tpu.ops import percentile as pct

    vals = np.array(
        [0.0, -0.0, 1.0, -1.0, 3.4028235e38, -3.4028235e38, 1e-45, -1e-45,
         np.inf, -np.inf, 0.5, -2.75],
        np.float32,
    )
    x = jnp.asarray(vals)
    ik_ops = np.asarray(pct._ikey(x))
    ik_kern = np.asarray(kernels._ikey_view(kernels._monotone_key(x)))
    assert (ik_ops == ik_kern).all()
    back_ops = np.asarray(pct._unkey(jnp.asarray(ik_ops)))
    back_stream = np.asarray(stream._f32_from_ik(jnp.asarray(ik_ops)))
    assert back_ops.tobytes() == vals.tobytes()
    assert back_stream.tobytes() == vals.tobytes()
