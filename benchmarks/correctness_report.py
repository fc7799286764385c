"""Regenerate the correctness report numbers (docs/correctness_report.md).

Runs every algorithm against the numpy oracle across the reference's size
matrix and prints the measured deviation next to its gate — the executable
version of the reference's ``docs/correctness_report.md``.

Usage: ``python -m benchmarks.correctness_report [--sizes 64 128 256]``
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def _case_rows(oracle, Macenko, Reinhard, HistogramMatching, rng, h, w, as_float):
    """One (H, W, dtype) cell: all three algorithms vs the oracle."""
    # Reinhard / HM on seeded noise (reference protocol); Macenko on
    # synthetic Beer–Lambert H&E (stain plane must be well-posed).
    ref_n = rng.integers(0, 256, (1, 3, h, w), dtype=np.uint8)
    src_n = rng.integers(0, 256, (2, 3, h, w), dtype=np.uint8)
    ref_he = oracle.synthetic_he_tile(h, w, seed=42)
    src_he = oracle.synthetic_he_tile(h, w, seed=123, he_scale=1.15)
    if as_float:
        ref_n, src_n = ref_n.astype(np.float32) / 255.0, src_n.astype(np.float32) / 255.0
        ref_he, src_he = ref_he.astype(np.float32) / 255.0, src_he.astype(np.float32) / 255.0
    # Reinhard/HM outputs preserve the input range; "1 grey" = 1/255 in
    # float mode. Macenko output is [0,255]-valued for both dtypes.
    grey = 1.0 / 255.0 if as_float else 1.0
    label = f"{h}x{w}{'f' if as_float else 'u'}"
    rows = []

    r = np.asarray(Reinhard().fit(ref_n).transform(src_n)).astype(np.float32)
    r_o = oracle.reinhard_transform(src_n, *oracle.reinhard_fit(ref_n)).astype(np.float32)
    rows.append(("reinhard", label, "max|diff|", float(np.abs(r - r_o).max()), grey))

    hh = np.asarray(HistogramMatching().fit(ref_n).transform(src_n)).astype(np.float32)
    h_o = oracle.hm_transform(src_n, oracle.hm_fit(ref_n)).astype(np.float32)
    rows.append(("hist_match", label, "max|diff|", float(np.abs(hh - h_o).max()), grey))

    m = Macenko()
    out = np.asarray(m.fit(ref_he).transform(src_he)).astype(np.float32)
    he_o, mc_o = oracle.macenko_fit(ref_he)
    m_o = oracle.macenko_transform(src_he, he_o, mc_o).astype(np.float32)
    rows.append(("macenko", label, "MAE", float(np.abs(out - m_o).mean()), 0.35))
    rows.append(
        (
            "macenko",
            label,
            "HE max|diff|",
            float(np.abs(np.asarray(m._stain_matrix) - he_o).max()),
            5e-3,
        )
    )
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", nargs="+", type=int, default=[64, 128, 256])
    p.add_argument(
        "--dtypes", nargs="+", choices=["uint8", "float32"], default=["uint8"]
    )
    p.add_argument(
        "--non-square",
        action="store_true",
        help="add the reference's 321x199 probe (test_correctness_against_references.py:99)",
    )
    args = p.parse_args()

    from oracles import numpy_reference as oracle

    from stainx_tpu import HistogramMatching, Macenko, Reinhard

    rng = np.random.default_rng(42)
    cells = [(s, s) for s in args.sizes] + ([(321, 199)] if args.non_square else [])
    rows = []
    for h, w in cells:
        for dt in args.dtypes:
            rows += _case_rows(
                oracle, Macenko, Reinhard, HistogramMatching, rng, h, w, dt == "float32"
            )

    print(f"{'algorithm':<12} {'case':>10} {'metric':<14} {'measured':>12} {'gate':>10}")
    failures = 0
    for algo, label, metric, value, limit in rows:
        ok = value <= limit
        failures += not ok
        print(
            f"{algo:<12} {label:>10} {metric:<14} {value:>12.6f} ≤ {limit:<8g}"
            f"{'' if ok else '  FAIL'}"
        )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
