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


class TestHistogramMXUKernel:
    """Fused one-hot + MXU contraction histogram / LUT apply
    (kernels/histogram.py). Bit-exact twins of ops.histogram_matching."""

    @pytest.mark.parametrize("shape", [(3, 4096), (3, 5000), (2, 3, 70000), (1, 1, 100)])
    def test_histogram_matches_jnp_twin(self, shape):
        from stainx_tpu.kernels.histogram import histogram_256_mxu

        rng = np.random.default_rng(sum(shape))
        vals = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = np.asarray(histogram_256_mxu(jnp.asarray(vals), interpret=True))
        v3 = vals if vals.ndim == 3 else vals[None]
        flat = jnp.asarray(np.transpose(v3, (1, 0, 2)).reshape(v3.shape[1], -1))
        ref = np.asarray(hm_ops.histogram_256(flat))
        np.testing.assert_array_equal(got, ref)

    def test_histogram_zero_heavy_padding_correction(self):
        from stainx_tpu.kernels.histogram import histogram_256_mxu

        vals = np.zeros((2, 1, 5000), np.uint8)
        got = np.asarray(histogram_256_mxu(jnp.asarray(vals), interpret=True))
        assert got[0, 0] == 10000.0
        assert got[0, 1:].sum() == 0.0

    def test_apply_lut_matches_jnp_twin(self):
        from stainx_tpu.kernels.histogram import apply_lut_u8_mxu

        rng = np.random.default_rng(7)
        vals = rng.integers(0, 256, size=(2, 3, 5000), dtype=np.uint8)
        lut = np.sort(rng.random((3, 256)).astype(np.float32) * 255.0, axis=1)
        got = np.asarray(apply_lut_u8_mxu(jnp.asarray(vals), jnp.asarray(lut), interpret=True))
        ref = np.clip(
            np.asarray(hm_ops._apply_lut(jnp.asarray(vals[:, :, None, :]), jnp.asarray(lut))),
            0,
            255,
        ).astype(np.uint8)[:, :, 0, :]
        np.testing.assert_array_equal(got, ref)

    def test_apply_lut_extreme_values(self):
        """LUT entries at the clip boundaries and exact-integer edges."""
        from stainx_tpu.kernels.histogram import apply_lut_u8_mxu

        vals = np.arange(256, dtype=np.uint8).reshape(1, 1, 256)
        lut = np.linspace(-5.0, 260.0, 256, dtype=np.float32).reshape(1, 256)
        got = np.asarray(apply_lut_u8_mxu(jnp.asarray(vals), jnp.asarray(lut), interpret=True))
        ref = np.floor(np.clip(lut[0], 0.0, 255.0)).astype(np.uint8).reshape(1, 1, 256)
        np.testing.assert_array_equal(got, ref)


class TestSelectionKernel:
    def test_matches_jnp_twin(self):
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import kth_smallest_pallas
        from stainx_tpu.ops.percentile import kth_smallest

        rng = np.random.default_rng(3)
        x = rng.standard_normal((4, 4096)).astype(np.float32)
        ranks = np.array([[40, 4000], [0, 4095], [2048, 2049], [100, 200]], np.int32)
        got = np.asarray(kth_smallest_pallas(jnp.asarray(x), jnp.asarray(ranks), interpret=True))
        for i in range(4):
            for k in range(2):
                ref = np.asarray(
                    kth_smallest(jnp.asarray(x[i : i + 1]), jnp.asarray([ranks[i, k]]))
                )[0]
                assert got[i, k] == ref == np.sort(x[i])[ranks[i, k]]

    def test_masked_sentinels(self):
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import kth_smallest_pallas

        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 3000)).astype(np.float32)
        mask = rng.random((2, 3000)) < 0.6
        xs = np.where(mask, x, np.inf).astype(np.float32)
        cnt = mask.sum(1)
        ranks = np.stack([cnt // 100, cnt * 99 // 100], 1).astype(np.int32)
        got = np.asarray(kth_smallest_pallas(jnp.asarray(xs), jnp.asarray(ranks), interpret=True))
        for i in range(2):
            vals = np.sort(x[i][mask[i]])
            assert got[i, 0] == vals[ranks[i, 0]]
            assert got[i, 1] == vals[ranks[i, 1]]

    def test_duplicate_heavy_rows(self):
        """Quantized values (uint8-derived fields): descents must stay
        bit-exact when the rank element sits inside a large bit-identical
        cluster, which the min/max contraction exits early on."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import kth_smallest_pallas

        rng = np.random.default_rng(5)
        x = np.round(rng.standard_normal((3, 8192)) * 8).astype(np.float32) / 8
        ranks = np.array([[82, 8100], [0, 8191], [4000, 4001]], np.int32)
        got = np.asarray(kth_smallest_pallas(jnp.asarray(x), jnp.asarray(ranks), interpret=True))
        srt = np.sort(x, axis=1)
        for i in range(3):
            for k in range(2):
                assert got[i, k] == srt[i, ranks[i, k]]

    def test_all_identical_and_tiny_spread(self):
        """All-identical rows resolve at init (full-prefix exit); rows whose
        values differ only in the last mantissa nibble exercise the deep
        prefix-skip path."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import kth_smallest_pallas

        base = np.float32(0.7182818)
        row0 = np.full(2048, base, np.float32)
        ulp = np.spacing(base).astype(np.float32)
        row1 = base + ulp * np.tile(np.arange(4, dtype=np.float32), 512)
        x = np.stack([row0, row1])
        ranks = np.array([[0, 2047], [512, 1536]], np.int32)
        got = np.asarray(kth_smallest_pallas(jnp.asarray(x), jnp.asarray(ranks), interpret=True))
        srt = np.sort(x, axis=1)
        for i in range(2):
            for k in range(2):
                assert got[i, k] == srt[i, ranks[i, k]]

    def test_out_of_range_rank_clamps(self):
        """Ranks ≥ #valid clamp to the max member (defined behavior since
        the interpolated descent; the old code returned sentinel garbage)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import kth_smallest_pallas

        rng = np.random.default_rng(6)
        x = rng.standard_normal((1, 1000)).astype(np.float32)
        xs = np.concatenate([x, np.full((1, 24), np.inf, np.float32)], axis=1)
        ranks = np.array([[1010, 1023]], np.int32)  # beyond the 1000 valid
        got = np.asarray(kth_smallest_pallas(jnp.asarray(xs), jnp.asarray(ranks), interpret=True))
        assert got[0, 0] == got[0, 1] == x.max()

    @pytest.mark.parametrize(
        "mode",
        [
            "dep",
            "spec6",
            "spec4",
            "nocon",
            "defer",
            "interval",
            "interval8",
            "sint",  # seeds=None ⇒ seeded machinery with no seed source
            "ikdep",
            "cum16",
            # byte-wide / 256-cut traces are ~1300 scalar wheres per
            # iteration — slow tier.
            pytest.param("cum256", marks=pytest.mark.slow),
            pytest.param("interval256", marks=pytest.mark.slow),
        ],
    )
    def test_descent_modes_bit_exact(self, mode):
        """Every contraction strategy (dep / speculative / none) is the same
        bit-exact selection — the strategies trade sync latency for vector
        work, never correctness. Covers smooth, duplicate-heavy, masked and
        out-of-range-rank rows."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import _monotone_key, radix_select_multi

        rng = np.random.default_rng(11)
        rows = [
            rng.standard_normal(4096).astype(np.float32),
            np.round(rng.standard_normal(4096) * 8).astype(np.float32) / 8,
            np.where(rng.random(4096) < 0.5, rng.standard_normal(4096), np.inf).astype(
                np.float32
            ),
            np.full(4096, np.float32(1.5)),
            np.full(4096, np.inf, np.float32),  # fully masked: +inf in EVERY mode
        ]
        ranks = [40, 4000, 0, 4095, 1000, 2048]
        for x in rows:
            valid = np.sort(x[np.isfinite(x)])
            key = _monotone_key(jnp.asarray(x.reshape(32, 128)))
            sels = [
                (key, jnp.int32(r), (jnp.asarray(x.reshape(32, 128)),)) for r in ranks
            ]
            got = radix_select_multi(sels, keyed=True, mode=mode)
            for r, (val,) in zip(ranks, got):
                expected = valid[min(r, len(valid) - 1)] if len(valid) else np.inf
                assert float(val) == expected, (mode, r)

    @pytest.mark.parametrize("seed_kind", ["exact", "near", "far", "extreme", "invalid"])
    def test_seeded_interval_bit_exact(self, seed_kind):
        """The seeded interval descent ("sint") is bit-exact for ANY seed:
        seeds only place probe cuts, counts stay exact. Covers an exact
        seed (the previous image had the same percentile), a near seed
        (small drift), a wildly wrong seed, seeds at the int32 clamp
        boundary, and an invalid flag (grid step 0)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import _monotone_key, radix_select_multi

        rng = np.random.default_rng(23)
        x = rng.standard_normal(4096).astype(np.float32)
        valid = np.sort(x)
        ranks = [40, 2048, 4055]
        key = _monotone_key(jnp.asarray(x.reshape(32, 128)))
        sels = [(key, jnp.int32(r), (jnp.asarray(x.reshape(32, 128)),)) for r in ranks]

        def ik_of(v):
            u = np.float32(v).view(np.uint32)
            k = u ^ (np.uint32(0xFFFFFFFF) if (u >> 31) else np.uint32(0x80000000))
            return jnp.int32(np.int32(k ^ np.uint32(0x80000000)))

        flag = jnp.asarray(seed_kind != "invalid")
        if seed_kind == "exact":
            seeds = [(ik_of(valid[r]), flag) for r in ranks]
        elif seed_kind == "near":
            seeds = [(ik_of(valid[r] * 1.003), flag) for r in ranks]
        elif seed_kind == "far":
            seeds = [(ik_of(-valid[r] * 37.0 + 5.0), flag) for r in ranks]
        elif seed_kind == "extreme":
            seeds = [
                (jnp.int32(-0x80000000), flag),
                (jnp.int32(0x7FFFFFFF), flag),
                (jnp.int32(0), flag),
            ]
        else:
            seeds = [(jnp.int32(123456), flag) for _ in ranks]

        got, terminal = radix_select_multi(
            sels, keyed=True, mode="sint", seeds=seeds, want_terminal=True
        )
        for r, (val,), term in zip(ranks, got, terminal):
            assert float(val) == valid[r], (seed_kind, r)
            # The terminal ik IS the selected element's signed key — the
            # seed contract the mega kernel's scratch carry relies on.
            assert int(term) == int(ik_of(valid[r])), (seed_kind, r)

    @pytest.mark.parametrize("seed_kind", ["near", "far", "invalid"])
    def test_seeded_interval_with_counts_bit_exact(self, seed_kind):
        """The known-count init skip (``counts=``, commit 'init pass on
        seeded steps'): with valid seeds the descent starts from loose
        whole-line bounds and the caller's member count — the selection
        must stay exact for near/far seeds, and invalid seeds must fall
        back to the computed init (identical results either way). Also
        pins the count-0 convention (sentinel, like the computed init)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import _monotone_key, radix_select_multi

        rng = np.random.default_rng(37)
        x = np.where(rng.random(4096) < 0.25, np.inf, rng.standard_normal(4096)).astype(
            np.float32
        )
        valid_sorted = np.sort(x[np.isfinite(x)])
        n_valid = len(valid_sorted)
        ranks = [3, n_valid // 2, n_valid - 2]
        key = _monotone_key(jnp.asarray(x.reshape(32, 128)))
        sels = [(key, jnp.int32(r), (jnp.asarray(x.reshape(32, 128)),)) for r in ranks]

        def ik_of(v):
            u = np.float32(v).view(np.uint32)
            k = u ^ (np.uint32(0xFFFFFFFF) if (u >> 31) else np.uint32(0x80000000))
            return jnp.int32(np.int32(k ^ np.uint32(0x80000000)))

        flag = jnp.asarray(seed_kind != "invalid")
        off = 1.003 if seed_kind == "near" else 42.0
        seeds = [(ik_of(valid_sorted[r] * off), flag) for r in ranks]
        counts = tuple(jnp.int32(n_valid) for _ in ranks)

        got = radix_select_multi(sels, keyed=True, mode="sint", seeds=seeds, counts=counts)
        for r, (val,) in zip(ranks, got):
            assert float(val) == valid_sorted[r], (seed_kind, r)

        # count 0 (caller-known empty field) resolves to the +inf sentinel
        empty = jnp.full((8, 128), jnp.inf, jnp.float32)
        ekey = _monotone_key(empty)
        (got0,) = radix_select_multi(
            [(ekey, jnp.int32(0), (empty,))],
            keyed=True,
            mode="sint",
            seeds=[(jnp.int32(0), jnp.asarray(True))],
            counts=(jnp.int32(0),),
        )
        assert np.isinf(float(got0[0]))

    def test_mega_kernel_miss_streak_heterogeneous_parity(self):
        """The per-pair miss-streak cutout (scratch slots 4–5) must never
        change results: an alternating-distribution batch (every conc
        seed misses; the streak trips mid-batch, disables, and the
        machinery keeps comparing terminals) with a uniform row mixed in
        stays bit-identical to the unseeded radix descent."""
        import jax

        import stainx_tpu.kernels.selection as sel
        from stainx_tpu.kernels.macenko_fused import macenko_transform_mega
        from stainx_tpu.ops.macenko import macenko_fit
        from tests.oracles import numpy_reference as oracle

        ref = oracle.synthetic_he_tile(96, 96, seed=42)
        a = np.concatenate(
            [oracle.synthetic_he_tile(96, 96, seed=100 + i, he_scale=0.7) for i in range(5)]
        )
        b = np.concatenate(
            [oracle.synthetic_he_tile(96, 96, seed=200 + i, he_scale=1.4) for i in range(5)]
        )
        batch = np.empty((10, 3, 96, 96), np.uint8)
        batch[0::2], batch[1::2] = a, b
        batch[4] = 128  # uniform row mid-stream
        he, tmc = macenko_fit(ref, use_pallas=False)

        outs = {}
        prev_mode = sel.DESCENT_MODE  # restore whatever was active, not "auto"
        for mode in ("ikdep", "sint"):
            sel.DESCENT_MODE = mode
            jax.clear_caches()
            try:
                outs[mode] = np.asarray(
                    macenko_transform_mega(batch, he, tmc, interpret=True)
                )
            finally:
                sel.DESCENT_MODE = prev_mode
        jax.clear_caches()
        diff = int(
            np.abs(outs["sint"].astype(np.int32) - outs["ikdep"].astype(np.int32)).max()
        )
        assert diff == 0

    def test_interval_stop_span_lower_bound(self):
        """``stop_span`` turns the interval descent into an estimator: the
        returned klo must be a LOWER bound on the rank element's key,
        within stop_span keys of it (the streaming kernel's subsample
        sub-descent relies on exactly this — its sweep-2 bracket absorbs
        the residual)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import (
            _monotone_key,
            interval_descend_multi,
        )

        rng = np.random.default_rng(31)
        x = rng.standard_normal(4096).astype(np.float32)
        valid = np.sort(x)
        span = 1 << 11
        for r in (40, 2048, 4055):
            key = _monotone_key(jnp.asarray(x.reshape(32, 128)))
            (ik, klo), = interval_descend_multi([(key, jnp.int32(r))], stop_span=span)

            u = np.float32(valid[r]).view(np.uint32)
            k = u ^ (np.uint32(0xFFFFFFFF) if (u >> 31) else np.uint32(0x80000000))
            true_ik = np.int32(k ^ np.uint32(0x80000000))
            got = int(klo)
            assert got <= int(true_ik) <= got + span, (r, got, int(true_ik))

    @pytest.mark.parametrize("mode", ["dep", "spec6", "spec4", "nocon", "defer"])
    def test_top_of_keyspace_group_no_probe_wrap(self, mode):
        """Keys 0xFFFFFFFD/E/F (NaN-group) with duplicates: the common-prefix
        skip lands the descent at it=7 with a full 28-bit prefix and
        jlo=13, so interpolated probes overshoot to nibble 16 — ``base+16``
        wraps uint32 there and (pre-fix) flipped the signed compare, zeroing
        t[3] and corrupting every later count. Probe offsets now clamp at
        nibble 15 (exact: the rank always lies inside the group)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import radix_select_multi

        keys = np.full(1024, 0xFFFFFFFD, np.uint32)
        keys[500] = np.uint32(0xFFFFFFFE)
        keys[700] = np.uint32(0xFFFFFFFF)
        payload = np.arange(1024, dtype=np.float32)
        key = jnp.asarray(keys.reshape(8, 128))
        fields = (jnp.asarray(payload.reshape(8, 128)),)
        sels = [(key, jnp.int32(r), fields) for r in (0, 1021, 1022, 1023)]
        got = radix_select_multi(sels, mode=mode)
        # rank 0..1021 → the FD cluster (min linear index 0 supplies the
        # field), 1022 → the FE element, 1023 → the FF element.
        assert [float(v[0]) for v in got] == [0.0, 0.0, 500.0, 700.0]

    def test_multi_field_member_read_single_pixel(self):
        """The non-keyed field-read path (no in-tree kernel uses it since
        the φ selects went keyed, but it is public API): every requested
        field must come from ONE member — the minimum-linear-index one —
        even when the rank lands in a cluster of key-identical elements
        with differing payloads (round-1 advisor contract)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.selection import _monotone_key, radix_select_multi

        key_vals = np.zeros(1024, np.float32)
        key_vals[:] = 7.25  # one big bit-identical cluster
        payload_a = np.arange(1024, dtype=np.float32)
        payload_b = 1000.0 - payload_a
        key = _monotone_key(jnp.asarray(key_vals.reshape(8, 128)))
        [res] = radix_select_multi(
            [(key, jnp.int32(500), (jnp.asarray(payload_a.reshape(8, 128)),
                                    jnp.asarray(payload_b.reshape(8, 128))))]
        )
        a_sel, b_sel = res
        # Min-index member is element 0: payloads must BOTH come from it.
        assert float(a_sel) == 0.0
        assert float(b_sel) == 1000.0

    def test_macenko_pallas_path_matches_xla(self):
        from stainx_tpu.ops import macenko as mk

        ref_img = oracle_tile(64)
        src = oracle_tile(64, seed=9, he_scale=1.2)
        import jax.numpy as jnp

        he, tmc = mk.macenko_fit(jnp.asarray(ref_img))
        out_x = np.asarray(mk.macenko_transform(jnp.asarray(src), he, tmc, use_pallas=False))
        out_p = np.asarray(mk.macenko_transform(jnp.asarray(src), he, tmc, use_pallas=True))
        np.testing.assert_allclose(
            out_x.astype(np.float32), out_p.astype(np.float32), atol=1.0
        )

    def test_macenko_fit_pallas_matches_xla(self):
        """Tolerances are the CROSS-IMPLEMENTATION gates (TestFitKernels),
        not bit-level: since round 5 use_pallas=True routes to the fused
        fit kernel, whose diamond-angle ordering can legitimately select
        a pixel one rank away from the jnp path's arctan2 ordering at f32
        near-ties — the round-5 tpu-smoke run caught exactly that (maxC
        rel 1.8e-5 at 64² on compiled TPU vs the old 1e-5 gate, while
        both stayed inside the reference-oracle budget, rel ≤ 4.1e-4 vs
        1e-3). The reference parity gates remain the real contract
        (test_reference_parity.test_fit_parity)."""
        from stainx_tpu.ops import macenko as mk

        import jax.numpy as jnp

        ref_img = oracle_tile(64)
        he_x, mc_x = mk.macenko_fit(jnp.asarray(ref_img), use_pallas=False)
        he_p, mc_p = mk.macenko_fit(jnp.asarray(ref_img), use_pallas=True)
        np.testing.assert_allclose(np.asarray(he_x), np.asarray(he_p), atol=2e-5)
        np.testing.assert_allclose(np.asarray(mc_x), np.asarray(mc_p), rtol=1e-4)


class TestStreamingMegaKernel:
    """Streaming whole-transform kernel (kernels/macenko_stream.py) — the
    >VMEM-row Macenko path: bytes stay in HBM, chunked recompute per pass.
    Same math as the mega kernel; differences are accumulation-order ulps
    (chunked vs whole-row moment sums), bounded at 1 grey level."""

    def _fit(self):
        import jax.numpy as jnp

        from stainx_tpu.ops import macenko as mk

        return mk.macenko_fit(jnp.asarray(oracle_tile(64)))

    @pytest.mark.parametrize("shape", [(200, 350), (64, 64)])
    def test_matches_mega_kernel(self, shape):
        """Multi-chunk (200×350 pads into 2 chunks) and single-chunk rows."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import macenko_transform_mega
        from stainx_tpu.kernels.macenko_stream import macenko_transform_stream

        h, w = shape
        src = np.concatenate(
            [oracle_tile_hw(h, w, seed=9, he_scale=1.2), oracle_tile_hw(h, w, seed=3)]
        )
        he, tmc = self._fit()
        out_s = np.asarray(macenko_transform_stream(jnp.asarray(src), he, tmc, interpret=True))
        out_m = np.asarray(macenko_transform_mega(jnp.asarray(src), he, tmc, interpret=True))
        np.testing.assert_allclose(
            out_s.astype(np.float32), out_m.astype(np.float32), atol=1.0
        )

    def test_float32_matches_mega(self):
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import macenko_transform_mega
        from stainx_tpu.kernels.macenko_stream import macenko_transform_stream

        src = jnp.asarray(oracle_tile_hw(96, 96, seed=5)).astype(jnp.float32) / 255.0
        he, tmc = self._fit()
        out_s = np.asarray(macenko_transform_stream(src, he, tmc, interpret=True))
        out_m = np.asarray(macenko_transform_mega(src, he, tmc, interpret=True))
        np.testing.assert_allclose(out_s, out_m, atol=1.0)

    def test_multichunk_dma_steady_state(self):
        """≥3-chunk rows reach the key-cache DMA steady state that the
        2-chunk shapes above never do: write_body's ``t >= 2`` kwrite
        wait, sweep_body's mid-stream kread prefetch, and the 2-deep
        output-DMA pipeline. 300×800 = 240 000 px pads to 4 chunks with
        a partial tail, so slot/index errors in the pipelined waits would
        corrupt cached keys here instead of only on-chip at 2048²."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import macenko_transform_mega
        from stainx_tpu.kernels.macenko_stream import macenko_transform_stream

        src = oracle_tile_hw(300, 800, seed=21, he_scale=1.15)
        he, tmc = self._fit()
        out_s = np.asarray(macenko_transform_stream(jnp.asarray(src), he, tmc, interpret=True))
        out_m = np.asarray(macenko_transform_mega(jnp.asarray(src), he, tmc, interpret=True))
        np.testing.assert_allclose(
            out_s.astype(np.float32), out_m.astype(np.float32), atol=1.0
        )

    def test_uniform_background_tile_finite_and_uniform(self):
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_stream import macenko_transform_stream

        he, tmc = self._fit()
        white = np.full((1, 3, 32, 32), 250, np.uint8)
        out = np.asarray(
            macenko_transform_stream(jnp.asarray(white), he, tmc, interpret=True)
        ).astype(np.float32)
        assert np.isfinite(out).all()
        assert (np.ptp(out.reshape(3, -1), axis=1) == 0.0).all()

    def test_routing_above_stream_threshold(self, monkeypatch, fresh_jit_cache):
        """macenko_transform routes EVERY uint8/f32 row past the resident
        mega's budget through the streaming kernel — no middle tier (the
        staged gap was raced away; see ops/macenko.py). Budget shrunk so
        the test stays small."""
        import jax.numpy as jnp

        from stainx_tpu.kernels import macenko_fused as mf
        from stainx_tpu.ops import macenko as mk

        monkeypatch.setattr(mk, "STREAM_MEGA_ENABLED", True)
        monkeypatch.setattr(mf, "MAX_FUSED_PIXELS", 1024)
        src = oracle_tile_hw(96, 96, seed=11, he_scale=1.1)
        he, tmc = self._fit()
        out_routed = np.asarray(
            mk.macenko_transform(jnp.asarray(src), he, tmc, use_pallas=True)
        )
        out_xla = np.asarray(
            mk.macenko_transform(jnp.asarray(src), he, tmc, use_pallas=False)
        )
        np.testing.assert_allclose(
            out_routed.astype(np.float32), out_xla.astype(np.float32), atol=1.0
        )


class TestFitKernels:
    """Fused fit kernels (resident ``macenko_fit_mega`` + streaming
    ``macenko_fit_stream``) vs the jnp fit pipeline — fit semantics
    (``torch_backend.py:463-519``): batch pixels pooled, β-filter without
    the <3 fallback, maxC over all pooled pixels. Differences vs jnp are
    diamond-angle cos/sin recovery ulps + accumulation-order ulps, far
    inside the reference-parity fit gates (rtol 1e-4 / 1e-3)."""

    def _assert_fit_close(self, got, want, he_atol=2e-5, mc_rtol=1e-4):
        he_k, mc_k = got
        he_j, mc_j = want
        np.testing.assert_allclose(np.asarray(he_k), np.asarray(he_j), atol=he_atol)
        np.testing.assert_allclose(
            np.asarray(mc_k).reshape(-1), np.asarray(mc_j).reshape(-1), rtol=mc_rtol
        )

    @pytest.mark.parametrize("dtype", ["uint8", "float32"])
    def test_fit_mega_matches_jnp(self, dtype):
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import macenko_fit_mega
        from stainx_tpu.ops import macenko as mk

        img = oracle_tile(96)
        if dtype == "float32":
            img = img.astype(np.float32) / 255.0
        self._assert_fit_close(
            macenko_fit_mega(jnp.asarray(img), interpret=True),
            mk.macenko_fit(jnp.asarray(img), use_pallas=False),
        )

    def test_fit_mega_pools_batch(self):
        """Pooling is channel-major: a plain reshape would interleave the
        images' channels (caught live — the first cut returned he maxdiff
        ~1.2 on a 4-image batch)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import macenko_fit_mega
        from stainx_tpu.ops import macenko as mk

        batch = np.concatenate(
            [oracle_tile(64, seed=s, he_scale=1.0 + 0.1 * s) for s in (1, 2, 3, 4)]
        )
        self._assert_fit_close(
            macenko_fit_mega(jnp.asarray(batch), interpret=True),
            mk.macenko_fit(jnp.asarray(batch), use_pallas=False),
        )

    @pytest.mark.parametrize("dtype", ["uint8", "float32"])
    def test_fit_stream_matches_jnp(self, dtype):
        """Multi-chunk pooled row (4×128² = 65 536 px pads to 2 chunks) —
        the chunked moments + subsample-seeded descents under fit
        semantics."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_stream import macenko_fit_stream
        from stainx_tpu.ops import macenko as mk

        batch = np.concatenate(
            [oracle_tile(128, seed=s, he_scale=1.0 + 0.05 * s) for s in (1, 2, 3, 4)]
        )
        if dtype == "float32":
            batch = batch.astype(np.float32) / 255.0
        self._assert_fit_close(
            macenko_fit_stream(jnp.asarray(batch), interpret=True),
            mk.macenko_fit(jnp.asarray(batch), use_pallas=False),
        )

    def test_fit_stream_multichunk_tail(self):
        """A partial tail chunk (300×800 = 240 000 px → 4 chunks) reaches
        the key-cache steady state and the valid-mask tail in fit mode."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_stream import macenko_fit_stream
        from stainx_tpu.ops import macenko as mk

        img = oracle_tile_hw(300, 800, seed=21, he_scale=1.15)
        self._assert_fit_close(
            macenko_fit_stream(jnp.asarray(img), interpret=True),
            mk.macenko_fit(jnp.asarray(img), use_pallas=False),
        )

    def test_cross_call_seed_carry_bit_exact(self):
        """Cross-CALL seed carry (round 5): outputs must be bit-identical
        to the uncarried kernels for ANY carried state — seeds only place
        probe cuts — and the state must chain (valid flag set, terminals
        updated). Covers all four carry kernels: resident/streaming ×
        transform/fit."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import (
            macenko_fit_mega,
            macenko_transform_mega,
            seed_state_init,
        )
        from stainx_tpu.kernels.macenko_stream import (
            macenko_fit_stream,
            macenko_transform_stream,
        )
        from stainx_tpu.ops import macenko as mk

        ref = oracle_tile(96)
        he, mc = mk.macenko_fit(jnp.asarray(ref), use_pallas=False)
        batch = jnp.asarray(
            np.concatenate(
                [oracle_tile(96, seed=s, he_scale=1.1) for s in (1, 2, 3)]
            )
        )
        big = jnp.asarray(
            np.concatenate(
                [oracle_tile_hw(200, 350, seed=s, he_scale=1.1) for s in (4, 5)]
            )
        )
        st = seed_state_init()

        plain = np.asarray(macenko_transform_mega(batch, he, mc, interpret=True))
        o1, st1 = macenko_transform_mega(batch, he, mc, seed_state=st, interpret=True)
        o2, st2 = macenko_transform_mega(batch, he, mc, seed_state=st1, interpret=True)
        assert (np.asarray(o1) == plain).all() and (np.asarray(o2) == plain).all()
        assert int(np.asarray(st1)[6]) == 1  # valid flag chains

        fp = macenko_fit_mega(jnp.asarray(ref), interpret=True)
        f1 = macenko_fit_mega(jnp.asarray(ref), seed_state=st, interpret=True)
        f2 = macenko_fit_mega(jnp.asarray(ref), seed_state=f1[2], interpret=True)
        for f in (f1, f2):
            assert (np.asarray(f[0]) == np.asarray(fp[0])).all()
            assert (np.asarray(f[1]) == np.asarray(fp[1])).all()

        sp = np.asarray(macenko_transform_stream(big, he, mc, interpret=True))
        s1, sst1 = macenko_transform_stream(big, he, mc, seed_state=st, interpret=True)
        s2, _ = macenko_transform_stream(big, he, mc, seed_state=sst1, interpret=True)
        assert (np.asarray(s1) == sp).all() and (np.asarray(s2) == sp).all()

        ffp = macenko_fit_stream(big, interpret=True)
        ff1 = macenko_fit_stream(big, seed_state=st, interpret=True)
        ff2 = macenko_fit_stream(big, seed_state=ff1[2], interpret=True)
        for f in (ff1, ff2):
            assert (np.asarray(f[0]) == np.asarray(ffp[0])).all()
            assert (np.asarray(f[1]) == np.asarray(ffp[1])).all()

    def test_stream_heterogeneous_miss_streak_bit_exact(self):
        """A persistently heterogeneous stream (alternating stain scales +
        a uniform row) drives the streaming kernel's per-pair miss-streak
        cutout through its whole lifecycle — seed, miss, disable,
        re-enable — and outputs must STAY bit-identical to the uncarried
        kernel at every stage (round-4 advisor port + round-5 carry)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import seed_state_init
        from stainx_tpu.kernels.macenko_stream import macenko_transform_stream
        from stainx_tpu.ops import macenko as mk

        he, mc = mk.macenko_fit(jnp.asarray(oracle_tile(96)), use_pallas=False)
        a = [oracle_tile_hw(96, 96, seed=100 + i, he_scale=0.7) for i in range(3)]
        b = [oracle_tile_hw(96, 96, seed=200 + i, he_scale=1.4) for i in range(3)]
        batch = np.empty((6, 3, 96, 96), np.uint8)
        batch[0::2] = np.concatenate(a)
        batch[1::2] = np.concatenate(b)
        batch[3] = 128  # uniform row mid-stream
        x = jnp.asarray(batch)

        plain = np.asarray(macenko_transform_stream(x, he, mc, interpret=True))
        st = seed_state_init()
        for _call in range(2):  # second call enters with a carried state
            out, st = macenko_transform_stream(x, he, mc, seed_state=st, interpret=True)
            assert (np.asarray(out) == plain).all()

    def test_streaming_kernels_default_lowering(self):
        """Streaming transform+fit WITHOUT interpret forced: on the CPU CI
        this still interprets (interpret_mode()), but on the hardware lane
        (`make tpu-smoke`) it is the ONLY place the streaming kernels hit
        the real Mosaic lowering — every other streaming test pins
        interpret=True. Keeps the lane honest about its own purpose
        (interpret accepts programs the TPU lowering rejects)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import seed_state_init
        from stainx_tpu.kernels.macenko_stream import (
            macenko_fit_stream,
            macenko_transform_stream,
        )
        from stainx_tpu.ops import macenko as mk

        he, mc = mk.macenko_fit(jnp.asarray(oracle_tile(96)), use_pallas=False)
        src = jnp.asarray(
            np.concatenate([oracle_tile_hw(200, 350, seed=s) for s in (1, 2)])
        )
        st = seed_state_init()
        out, st1 = macenko_transform_stream(src, he, mc, seed_state=st)
        ref_out = np.asarray(
            mk.macenko_transform(src, he, mc, use_pallas=False)
        ).astype(np.float32)
        assert np.abs(np.asarray(out).astype(np.float32) - ref_out).max() <= 2.0
        he_s, mc_s, _st2 = macenko_fit_stream(src, seed_state=st1)
        he_j, mc_j = mk.macenko_fit(src, use_pallas=False)
        np.testing.assert_allclose(np.asarray(he_s), np.asarray(he_j), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(mc_s), np.asarray(mc_j), rtol=1e-4
        )

    def test_seed_carry_survives_user_jit(self):
        """A user jitting normalizer.transform must not leak a tracer into
        the carried seed state (the store guard drops tracer states — the
        carry is a perf cache, outputs are bit-exact without it)."""
        import jax
        import jax.numpy as jnp

        from stainx_tpu import Macenko

        ref = oracle_tile(64)
        batch = oracle_tile(64, seed=3, he_scale=1.1)
        m = Macenko(backend="pallas").fit(ref)
        plain = np.asarray(m.transform(batch))

        jitted = jax.jit(lambda x: m.transform(x))
        out1 = np.asarray(jitted(jnp.asarray(batch)))
        out2 = np.asarray(jitted(jnp.asarray(batch)))  # state must still be concrete
        assert (out1 == plain).all() and (out2 == plain).all()
        assert not isinstance(m._seed_state, jax.core.Tracer)
        # And a later eager call still works and carries.
        out3 = np.asarray(m.transform(batch))
        assert (out3 == plain).all()

    def test_seed_carry_ops_passthrough(self):
        """Non-kernel routes (jnp path) must pass a supplied seed state
        through unchanged so callers can thread unconditionally."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import seed_state_init
        from stainx_tpu.ops import macenko as mk

        ref = jnp.asarray(oracle_tile(64))
        st = seed_state_init().at[0].set(1234)
        he, mc, st2 = mk.macenko_fit(ref, use_pallas=False, seed_state=st)
        assert (np.asarray(st2) == np.asarray(st)).all()
        out, st3 = mk.macenko_transform(ref, he, mc, use_pallas=False, seed_state=st)
        assert (np.asarray(st3) == np.asarray(st)).all()

    def test_fit_routing(self, monkeypatch, fresh_jit_cache):
        """macenko_fit(use_pallas=True) routes by the pooled-row budget:
        small pools hit the resident kernel, large pools the streaming
        one (budgets shrunk so both routes run at test sizes)."""
        import jax
        import jax.numpy as jnp

        from stainx_tpu.kernels import macenko_fused as mf
        from stainx_tpu.ops import macenko as mk

        img = jnp.asarray(oracle_tile(96))
        want = mk.macenko_fit(img, use_pallas=False)
        self._assert_fit_close(mk.macenko_fit(img, use_pallas=True), want)

        monkeypatch.setattr(mf, "MAX_FUSED_PIXELS", 1024)  # force stream route
        jax.clear_caches()
        self._assert_fit_close(mk.macenko_fit(img, use_pallas=True), want)


class TestStreamingSelectionKernel:
    """O(scalars)-state streaming selection (kernels/selection_stream.py) —
    the >VMEM-row replacement for the resident radix kernel (reference
    sort role: ``csrc/macenko.cu:52-58,209-216``)."""

    # n_cuts=16 is the fit-path ladder and 6 the streaming-mega one
    # (macenko_stream._N_CUTS); the wider twins compile ~80 s of
    # while-loops for variants nothing routes to — slow-tier coverage.
    # 2 is the minimum the API accepts (pure bisection + interpolated cut).
    @pytest.mark.parametrize(
        "n_cuts",
        [
            2,
            6,
            16,
            pytest.param(32, marks=pytest.mark.slow),
            pytest.param(64, marks=pytest.mark.slow),
        ],
    )
    def test_matches_sort_and_jnp_twin(self, n_cuts):
        from stainx_tpu.kernels.selection_stream import (
            kth_smallest_streaming,
            kth_smallest_streaming_reference,
        )

        rng = np.random.default_rng(7)
        x = (rng.standard_normal((3, 3000)) * 50).astype(np.float32)
        x[1, :40] = x[1, 50]  # duplicate cluster
        ranks = np.array([[0, 2999], [30, 45], [1500, 1501]], np.int32)
        got = np.asarray(
            kth_smallest_streaming(
                jnp.asarray(x), jnp.asarray(ranks), n_cuts=n_cuts, interpret=True
            )
        )
        twin = np.asarray(
            kth_smallest_streaming_reference(
                jnp.asarray(x), jnp.asarray(ranks), n_cuts=n_cuts
            )
        )
        srt = np.sort(x, axis=1)
        expect = np.stack([srt[i, ranks[i]] for i in range(3)])
        np.testing.assert_array_equal(got, expect)
        np.testing.assert_array_equal(twin, expect)

    @pytest.mark.parametrize("n_cuts", [6, 16])
    def test_ulp_adjacent_tail_under_large_cluster(self, n_cuts):
        """Worst case for the interval ladder: the rank element sits at the
        top of a run of ulp-adjacent single-member keys squeezed under a
        large duplicate cluster in the SAME sub-n_cuts key window. A zero
        even-cut step would degrade narrowing to one occupied key per sweep
        and outrun the stream_max_sweeps backstop (silent wrong key); the
        unit-floored cuts must resolve the window within the bound — for
        both the fit-path (16) and streaming-mega (6) ladder widths."""
        from stainx_tpu.kernels.selection_stream import (
            kth_smallest_streaming,
            kth_smallest_streaming_reference,
        )

        vals = [np.float32(1.0)]
        for _ in range(14):
            vals.append(np.nextafter(vals[-1], np.float32(np.inf), dtype=np.float32))
        # 14 single-member keys, then 3000 members on the 15th key: the
        # interpolated cut's rank fraction is ~1e-3, so it floors to klo.
        row = np.concatenate(
            [np.array(vals[:14], np.float32), np.full(3000, vals[14], np.float32)]
        )[None]
        ranks = np.array([[13, 3013]], np.int32)
        expect = np.array([[vals[13], vals[14]]], np.float32)
        got = np.asarray(
            kth_smallest_streaming(
                jnp.asarray(row), jnp.asarray(ranks), n_cuts=n_cuts, interpret=True
            )
        )
        twin = np.asarray(
            kth_smallest_streaming_reference(
                jnp.asarray(row), jnp.asarray(ranks), n_cuts=n_cuts
            )
        )
        np.testing.assert_array_equal(got, expect)
        np.testing.assert_array_equal(twin, expect)

    def test_empty_field_returns_inf_sentinel(self):
        """A (R, 0) field must resolve to the library-wide +inf empty-row
        convention — a zero-size chunk previously divided by zero at trace
        time (round-3 review repro)."""
        from stainx_tpu.kernels.selection_stream import (
            kth_smallest_streaming,
            kth_smallest_streaming_reference,
        )

        x = jnp.zeros((2, 0), jnp.float32)
        ranks = jnp.zeros((2, 2), jnp.int32)
        got = np.asarray(kth_smallest_streaming(x, ranks, interpret=True))
        twin = np.asarray(kth_smallest_streaming_reference(x, ranks))
        assert np.isposinf(got).all() and got.shape == (2, 2)
        assert np.isposinf(twin).all()

    def test_masked_sentinels_and_init(self):
        """+inf sentinels are excluded; the caller-supplied (min, max, n)
        init must select identically while skipping the discovery sweep."""
        from stainx_tpu.kernels.selection_stream import kth_smallest_streaming

        rng = np.random.default_rng(8)
        x = (rng.standard_normal((2, 2000)) * 9).astype(np.float32)
        mask = rng.random((2, 2000)) < 0.7
        xs = np.where(mask, x, np.inf).astype(np.float32)
        cnt = mask.sum(1).astype(np.int32)
        ranks = np.stack([cnt // 100, cnt * 99 // 100], 1).astype(np.int32)
        expect = np.stack(
            [np.sort(x[i][mask[i]])[ranks[i]] for i in range(2)]
        )
        got = np.asarray(
            kth_smallest_streaming(jnp.asarray(xs), jnp.asarray(ranks), interpret=True)
        )
        init = (
            jnp.asarray(np.where(mask, x, np.inf).min(1).astype(np.float32)),
            jnp.asarray(np.where(mask, x, -np.inf).max(1).astype(np.float32)),
            jnp.asarray(cnt),
        )
        got_i = np.asarray(
            kth_smallest_streaming(
                jnp.asarray(xs), jnp.asarray(ranks), init=init, interpret=True
            )
        )
        np.testing.assert_array_equal(got, expect)
        np.testing.assert_array_equal(got_i, expect)

    def test_empty_row_and_rank_overflow(self):
        from stainx_tpu.kernels.selection_stream import kth_smallest_streaming

        x = np.full((1, 512), np.inf, np.float32)
        got = np.asarray(
            kth_smallest_streaming(
                jnp.asarray(x), jnp.asarray([[0, 5]], np.int32), interpret=True
            )
        )
        assert np.isposinf(got).all()

        rng = np.random.default_rng(9)
        y = rng.standard_normal((1, 300)).astype(np.float32)
        got = np.asarray(
            kth_smallest_streaming(
                jnp.asarray(y), jnp.asarray([[299, 5000]], np.int32), interpret=True
            )
        )
        assert got[0, 0] == got[0, 1] == np.sort(y[0])[-1]

    def test_multi_chunk_accumulation(self, monkeypatch):
        """Rows spanning several DMA chunks: per-chunk count/min/max
        accumulation must be exact (int sums are associative)."""
        import stainx_tpu.kernels.selection_stream as ss

        monkeypatch.setattr(ss, "CHUNK_ELEMS", 2048)
        rng = np.random.default_rng(10)
        x = (rng.standard_normal((2, 7000)) * 100).astype(np.float32)
        ranks = np.array([[70, 6929], [0, 6999]], np.int32)
        got = np.asarray(
            ss.kth_smallest_streaming(
                jnp.asarray(x), jnp.asarray(ranks), interpret=True
            )
        )
        srt = np.sort(x, axis=1)
        expect = np.stack([srt[i, ranks[i]] for i in range(2)])
        np.testing.assert_array_equal(got, expect)


def oracle_tile(size, seed=42, he_scale=1.0):
    return oracle_tile_hw(size, size, seed=seed, he_scale=he_scale)


def oracle_tile_hw(h, w, seed=42, he_scale=1.0):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from oracles import numpy_reference as oracle

    return oracle.synthetic_he_tile(h, w, seed=seed, he_scale=he_scale)


class TestReinhardFusedKernel:
    @pytest.mark.parametrize("dtype", ["uint8", "float32"])
    def test_matches_jnp_twin(self, dtype):
        import jax.numpy as jnp

        from stainx_tpu.kernels.reinhard_fused import reinhard_apply_pallas
        from stainx_tpu.ops import reinhard as rh

        rng = np.random.default_rng(0)
        if dtype == "uint8":
            src = rng.integers(0, 256, (2, 3, 24, 24), np.uint8)
        else:
            src = rng.random((2, 3, 24, 24), dtype=np.float32)
        ref_img = rng.integers(0, 256, (1, 3, 24, 24), np.uint8)
        mean, std = rh.reinhard_fit(jnp.asarray(ref_img))
        out_x = np.asarray(rh.reinhard_transform(jnp.asarray(src), mean, std, use_pallas=False))
        out_p = np.asarray(rh.reinhard_transform(jnp.asarray(src), mean, std, use_pallas=True))
        np.testing.assert_allclose(
            out_x.astype(np.float32), out_p.astype(np.float32), atol=1.0 if dtype == "uint8" else 1 / 255
        )

    @pytest.mark.parametrize("dtype", ["uint8", "float32"])
    @pytest.mark.parametrize("hw", [(24, 24), (33, 31)])
    def test_moments_matches_lab_moments_twin(self, dtype, hw):
        """Batch-global centered LAB moments from raw bytes must match the
        jnp twin (ops.reinhard.lab_moments) — including the zero-pad
        correction (both sizes need padding to the 1024-px block; 33×31
        exercises a non-square odd remainder)."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.reinhard_fused import reinhard_moments_pallas
        from stainx_tpu.ops import reinhard as rh

        h, w = hw
        rng = np.random.default_rng(2)
        if dtype == "uint8":
            imgs = rng.integers(0, 256, (3, 3, h, w), np.uint8)
        else:
            imgs = rng.random((3, 3, h, w), dtype=np.float32)
        s1, s2 = reinhard_moments_pallas(jnp.asarray(imgs), interpret=True)
        n_r, s1_r, s2_r = rh.lab_moments(jnp.asarray(imgs))
        assert float(n_r) == 3 * h * w
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s1_r), rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_r), rtol=1e-4, atol=1e-2)
        # End to end: the two-kernel pallas transform tracks the XLA path.
        mean, std = rh.moments_to_mean_std(n_r, s1_r, s2_r)
        out_x = np.asarray(
            rh.reinhard_transform(jnp.asarray(imgs), mean, std, use_pallas=False)
        )
        out_p = np.asarray(
            rh.reinhard_transform(jnp.asarray(imgs), mean, std, use_pallas=True)
        )
        np.testing.assert_allclose(
            out_x.astype(np.float32),
            out_p.astype(np.float32),
            atol=1.0 if dtype == "uint8" else 1 / 255,
        )


class TestFusedMacenko:
    @pytest.mark.parametrize("dtype", ["uint8", "float32"])
    def test_fused_matches_standard(self, dtype):
        import jax.numpy as jnp

        from stainx_tpu.ops import macenko as mk

        ref_img = oracle_tile(64)
        src = oracle_tile(64, seed=9, he_scale=1.2)
        if dtype == "float32":
            src = (src.astype(np.float32) / 255.0)
        he, tmc = mk.macenko_fit(jnp.asarray(ref_img))
        out_std = np.asarray(
            mk.macenko_transform(jnp.asarray(src), he, tmc, use_pallas=False)
        ).astype(np.float32)
        out_fused = np.asarray(
            mk._macenko_transform_fused(jnp.asarray(src), he, tmc)
        ).astype(np.float32)
        scale = 255.0 if dtype == "float32" else 1.0
        assert np.abs(out_std * scale - out_fused * scale).mean() <= 0.35
        assert (np.abs(out_std * scale - out_fused * scale) > 2.0).mean() < 0.005

    def test_white_image_fallback(self):
        import jax.numpy as jnp

        from stainx_tpu.ops import macenko as mk

        ref_img = oracle_tile(64)
        he, tmc = mk.macenko_fit(jnp.asarray(ref_img))
        white = np.full((1, 3, 32, 32), 255, np.uint8)
        out = np.asarray(mk._macenko_transform_fused(jnp.asarray(white), he, tmc))
        assert np.isfinite(out.astype(np.float32)).all()

    @pytest.mark.parametrize("dtype", ["uint8", "float32"])
    def test_uniform_background_tile_finite_both_backends(self, dtype):
        """A constant-color (background) tile has an exactly-zero masked
        covariance: the analytic eigh must fall back to LAPACK's identity
        convention and the 2×2 solve's determinant floor must hold —
        pre-fix this produced NaN (xla float), all-black (xla uint8), and
        backend-divergent output (round-2 advisor finding)."""
        import jax.numpy as jnp

        from stainx_tpu.ops import macenko as mk

        ref_img = oracle_tile(64)
        he, tmc = mk.macenko_fit(jnp.asarray(ref_img))
        if dtype == "uint8":
            tile = np.full((1, 3, 32, 32), 250, np.uint8)
        else:
            tile = np.full((1, 3, 32, 32), 0.7, np.float32)
        out_xla = np.asarray(
            mk.macenko_transform(jnp.asarray(tile), he, tmc, use_pallas=False)
        ).astype(np.float32)
        out_fused = np.asarray(
            mk._macenko_transform_fused(jnp.asarray(tile), he, tmc)
        ).astype(np.float32)
        assert np.isfinite(out_xla).all()
        assert np.isfinite(out_fused).all()
        # A uniform input must stay uniform per channel (a per-pixel map
        # applied to equal pixels; channels may land on different values).
        assert (np.ptp(out_xla.reshape(3, -1), axis=1) == 0.0).all()
        assert (np.ptp(out_fused.reshape(3, -1), axis=1) == 0.0).all()

    def test_negative_max_concentration_tile(self):
        """A degenerate-but-real tile (pen-ink/control-marker-like: OD mass
        spanning an angular wedge > pi in the stain plane) yields a NEGATIVE
        99th-percentile concentration for one stain channel. The maxC guard
        must be sign-preserving like the reference's plain division
        (``torch_backend.py:452``) — a ``maximum(maxC, 1e-30)`` clamp turned
        the scale into ~1e30 and saturated ~100% of pixels (round-2 advisor
        finding). Exact value parity is chaotic here (discrete percentile
        picks flip between f32/f64 implementations), so the assertions are
        behavioral: negative fitted maxC, finite output, low saturation."""
        import jax.numpy as jnp

        from stainx_tpu.ops import macenko as mk

        # OD design: bulk cluster at psi~0.1, a small anchor, a satellite
        # clump at psi~-2.8 (wedge > pi so the extreme-angle stain vectors
        # both point away from the bulk), diluted uniform background.
        psi0, delta, n = 0.0, -2.8, 64
        rng = np.random.default_rng(0)
        P = n * n
        n_bg, n_sat, n_anchor = 2560, 20, 16
        n_bulk = P - n_bg - n_sat - n_anchor
        d = np.ones(3) / np.sqrt(3)
        t1 = np.array([1.0, -1.0, 0.0]) / np.sqrt(2)
        t2 = np.array([1.0, 1.0, -2.0]) / np.sqrt(6)

        def v(psi):
            return np.cos(psi) * t1 + np.sin(psi) * t2

        od = np.zeros((P, 3))
        i = 0
        psis = psi0 + rng.uniform(0.05, 0.2, n_bulk)
        rs = rng.uniform(0.06, 0.10, n_bulk)
        od[i : i + n_bulk] = 0.5 * d + rs[:, None] * np.stack([v(p) for p in psis])
        i += n_bulk
        od[i : i + n_anchor] = 0.5 * d + 0.08 * v(psi0 - 0.2)
        i += n_anchor
        ps = psi0 + delta + rng.uniform(-0.02, 0.02, n_sat)
        od[i : i + n_sat] = 0.5 * d + 0.09 * np.stack([v(p) for p in ps])
        i += n_sat
        od[i:] = 0.17 * (0.5 * d + 0.08 * v(psi0 + 0.125))
        tile = np.clip(np.round(240.0 * np.exp(-od) - 1.0), 0, 255).astype(np.uint8)
        rng.shuffle(tile, axis=0)
        tile = tile.T.reshape(1, 3, n, n)

        # The tile's own fit must exercise the negative-maxC regime.
        _, tmc_tile = mk.macenko_fit(jnp.asarray(tile))
        assert float(np.asarray(tmc_tile)[1]) < -0.005

        ref_img = oracle_tile(64, seed=3)
        he, tmc = mk.macenko_fit(jnp.asarray(ref_img))
        for out in (
            mk.macenko_transform(jnp.asarray(tile), he, tmc, use_pallas=False),
            mk._macenko_transform_fused(jnp.asarray(tile), he, tmc),
        ):
            o = np.asarray(out).astype(np.float32)
            assert np.isfinite(o).all()
            assert ((o == 0) | (o == 255)).mean() < 0.5

    def test_bf16_float_input_routes_to_xla(self):
        """Non-f32 float dtypes cannot lower through the fused kernels
        (f32 stores into a bf16 out_ref); the router must keep them on the
        XLA path and preserve dtype."""
        import jax.numpy as jnp

        from stainx_tpu.kernels.macenko_fused import fused_row_budget_ok
        from stainx_tpu.ops import macenko as mk

        assert not fused_row_budget_ok((1, 3, 64, 64), jnp.bfloat16)
        ref_img = oracle_tile(64)
        he, tmc = mk.macenko_fit(jnp.asarray(ref_img))
        src = jnp.asarray(oracle_tile(64, seed=5).astype(np.float32) / 255.0, jnp.bfloat16)
        out = mk.macenko_transform(src, he, tmc, use_pallas=True)
        assert out.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(out).astype(np.float32)).all()


def test_fused_kernels_nonpow2_sizes():
    """224² (the standard pathology tile) produces s=392 rows — tile picks
    must stay sublane-aligned (regression: 196 is a divisor but not ×8)."""
    import jax.numpy as jnp

    from stainx_tpu.ops import macenko as mk

    ref_img = oracle_tile(224)
    src = oracle_tile(224, seed=9, he_scale=1.2)
    he, tmc = mk.macenko_fit(jnp.asarray(ref_img))
    out = np.asarray(mk._macenko_transform_fused(jnp.asarray(src), he, tmc))
    exp = np.asarray(mk.macenko_transform(jnp.asarray(src), he, tmc, use_pallas=False))
    assert np.abs(out.astype(np.float32) - exp.astype(np.float32)).mean() <= 0.35


def test_fused_budget_ladder():
    """Size ladder: mega kernel through 1024²-class uint8 rows (scoped-VMEM
    cap raised past XLA's 16 MB default — compile-verified at 1280×1024 on
    v5e), float capped by input-row bytes, jnp + radix-select beyond."""
    import jax.numpy as jnp

    from stainx_tpu.kernels.macenko_fused import fused_row_budget_ok
    from stainx_tpu.kernels.selection import MAX_ROW_ELEMS

    assert fused_row_budget_ok((1, 3, 512, 512), jnp.uint8)
    assert fused_row_budget_ok((1, 3, 512, 512), jnp.float32)
    assert fused_row_budget_ok((1, 3, 1024, 1024), jnp.uint8)
    assert not fused_row_budget_ok((1, 3, 1024, 1024), jnp.float32)  # 12 MB f32 rows
    assert not fused_row_budget_ok((1, 3, 2048, 2048), jnp.uint8)
    assert 1024 * 1024 <= MAX_ROW_ELEMS  # f32 1024² uses the radix-select kernel
