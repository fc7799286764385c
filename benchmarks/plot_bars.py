"""Bar chart from ``benchmark_grid --json`` rows — the visual counterpart of
the reference's ``benchmarks/plot_bars.py`` (which charts its backend sweep).

Usage::

    python -m benchmarks.benchmark_grid --method macenko --json > grid.jsonl
    python -m benchmarks.plot_bars grid.jsonl --metric mpix_per_s -o bars.png

Each bar is one (method, batch, size, dtype) config; the MAE-vs-oracle of
every row is printed in the bar label so speed is never shown without
fidelity (project invariant).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def load_rows(path: str | None) -> list[dict]:
    fh = sys.stdin if path in (None, "-") else open(path)
    rows = []
    for line in fh:
        line = line.strip()
        if not line:
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue  # ignore non-JSON log lines
        if "img_per_s" in row or "mpix_per_s" in row:
            rows.append(row)
    if fh is not sys.stdin:
        fh.close()
    return rows


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", nargs="?", default="-", help="JSONL file (default stdin)")
    parser.add_argument("--metric", default="mpix_per_s", choices=["mpix_per_s", "img_per_s"])
    parser.add_argument("-o", "--output", default="benchmark_bars.png")
    args = parser.parse_args()

    rows = load_rows(args.input)
    if not rows:
        sys.exit("no benchmark rows found (run benchmark_grid with --json)")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = []
    for r in rows:
        dtype = r.get("dtype", "uint8")
        tag = "" if dtype == "uint8" else f" {dtype}"
        mae = r.get("mae_vs_oracle")
        mae_s = f"\nMAE {mae:.4f}" if isinstance(mae, (int, float)) else ""
        labels.append(f"{r['method']}\n{r['batch']}×{r['size']}²{tag}{mae_s}")
    values = [r.get(args.metric, 0.0) for r in rows]

    fig, ax = plt.subplots(figsize=(1.6 * len(rows) + 2, 4.5))
    bars = ax.bar(range(len(rows)), values, color="#5B4B8A")
    ax.bar_label(bars, fmt="%.0f", padding=2, fontsize=9)
    ax.set_xticks(range(len(rows)))
    ax.set_xticklabels(labels, fontsize=8)
    ax.set_ylabel({"mpix_per_s": "MPix/s per chip", "img_per_s": "img/s"}[args.metric])
    ax.grid(True, alpha=0.3, axis="y")
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"wrote {Path(args.output).resolve()} ({len(rows)} bars)")


if __name__ == "__main__":
    main()
