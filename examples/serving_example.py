"""Sequential-tile serving: one tile per call, state carried across calls.

The training-side examples batch tiles; a serving endpoint usually gets
them ONE AT A TIME. Two things make that fast here:

1. The whole per-tile transform is a single fused TPU kernel (one dispatch).
2. On the pallas backend the normalizer automatically carries its
   cross-call descent-seed state between calls — the previous tile's
   percentile terminals seed the next tile's searches (bit-exact; see
   ``docs/benchmarks.md`` "Cross-CALL seed carry"). Measured on v5e
   over DISTINCT cycling tiles: +15–18% on within-slide streaming-tier
   streams (4096²-class rows, where every saved descent sweep is a
   whole HBM pass); distribution-shifted streams pay nothing (the
   miss-streak cutout disables stale seeds).

Run: ``python examples/serving_example.py [--tiles N] [--size S]``
(CPU-safe: kernels run in interpret mode off-TPU, so the default size is
small; the timing printout is only meaningful on TPU hardware.)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from stainx_tpu import Macenko


def synthetic_tile(size: int, seed: int) -> np.ndarray:
    """(3, H, W) uint8 — stand-in for a WSI tile fetch (see
    wsi_ingest_example.py for the native threaded IO pipeline)."""
    from examples.make_data import make_tile  # deterministic Beer–Lambert render

    return np.transpose(make_tile(seed, size, size), (2, 0, 1))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", type=int, default=8)
    p.add_argument("--size", type=int, default=96)
    args = p.parse_args()

    norm = Macenko()  # device/backend auto-selected; carry is automatic
    norm.fit(synthetic_tile(args.size, seed=0)[None])

    # Steady-state serving loop: one tile per transform() call.
    times = []
    for i in range(args.tiles):
        tile = synthetic_tile(args.size, seed=1 + i)[None]
        t0 = time.perf_counter()
        out = np.asarray(norm.transform(tile))  # np.asarray = host fetch, honest
        times.append(time.perf_counter() - t0)
        assert out.shape == tile.shape and out.dtype == tile.dtype

    # First call pays compile (+ an unseeded descent); steady state is the
    # serving latency. Warning: off-TPU these numbers are interpret-mode.
    steady = times[2:] or times
    print(
        f"served {args.tiles} {args.size}x{args.size} tiles: "
        f"first {times[0] * 1e3:.1f} ms (compile), "
        f"steady median {np.median(steady) * 1e3:.2f} ms/tile"
    )


if __name__ == "__main__":
    main()
