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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", nargs="+", type=int, default=[64, 128, 256])
    args = p.parse_args()

    from oracles import numpy_reference as oracle

    from stainx_tpu import HistogramMatching, Macenko, Reinhard

    rng = np.random.default_rng(42)
    rows = []
    for size in args.sizes:
        # Reinhard / HM on seeded noise (reference protocol); Macenko on
        # synthetic Beer–Lambert H&E (stain plane must be well-posed).
        ref_n = rng.integers(0, 256, (1, 3, size, size), dtype=np.uint8)
        src_n = rng.integers(0, 256, (2, 3, size, size), dtype=np.uint8)
        ref_he = oracle.synthetic_he_tile(size, size, seed=42)
        src_he = oracle.synthetic_he_tile(size, size, seed=123, he_scale=1.15)

        r = np.asarray(Reinhard().fit(ref_n).transform(src_n)).astype(np.float32)
        r_o = oracle.reinhard_transform(src_n, *oracle.reinhard_fit(ref_n)).astype(np.float32)
        rows.append(("reinhard", size, "max|diff|", float(np.abs(r - r_o).max()), "≤ 1"))

        h = np.asarray(HistogramMatching().fit(ref_n).transform(src_n)).astype(np.float32)
        h_o = oracle.hm_transform(src_n, oracle.hm_fit(ref_n)).astype(np.float32)
        rows.append(("hist_match", size, "max|diff|", float(np.abs(h - h_o).max()), "≤ 1"))

        m = Macenko()
        out = np.asarray(m.fit(ref_he).transform(src_he)).astype(np.float32)
        he_o, mc_o = oracle.macenko_fit(ref_he)
        m_o = oracle.macenko_transform(src_he, he_o, mc_o).astype(np.float32)
        rows.append(("macenko", size, "MAE", float(np.abs(out - m_o).mean()), "≤ 0.35"))
        rows.append(
            ("macenko", size, "HE max|diff|", float(np.abs(np.asarray(m._stain_matrix) - he_o).max()), "≤ 5e-3")
        )

    print(f"{'algorithm':<12} {'size':>6} {'metric':<14} {'measured':>12} {'gate':>8}")
    failures = 0
    for algo, size, metric, value, gate in rows:
        limit = float(gate.split("≤")[1])
        ok = value <= limit
        failures += not ok
        print(f"{algo:<12} {size:>6} {metric:<14} {value:>12.5f} {gate:>8} {'' if ok else '  FAIL'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
