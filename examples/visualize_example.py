"""Fit / transform / visualize on real H&E tiles — CLI counterpart of the
reference's ``examples/simple_example.py:139-259`` (argparse method choice,
``--data-dir`` with ``target.png`` + ``test_*.png``, timed transform,
side-by-side panel saved per method).

Data: pass ``--data-dir`` pointing at a directory with a ``target.png``
reference tile plus source tiles (any PNG/JPEG). By default the committed
hermetic tiles under ``examples/data/`` (synthetic H&E renders with
background + nuclei structure, see ``examples/make_data.py``) are used, so
the example is self-contained; when the upstream repo is mounted
(development environments) and the local tiles are absent, its
``examples/data`` H&E tiles are auto-discovered — READ at runtime, never
vendored. As a last resort the example falls back to in-memory synthetic
Beer–Lambert tiles so it always runs.

Run::

    python examples/visualize_example.py macenko --save-plots
    python examples/visualize_example.py reinhard --data-dir /path/to/tiles
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

_LOCAL_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
_REFERENCE_DATA = "/root/reference/examples/data"


def _load_png(path: str) -> np.ndarray:
    """PNG/JPEG → (1, 3, H, W) uint8 NCHW."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)
    return np.transpose(img, (2, 0, 1))[None]


def discover_data(data_dir: str | None) -> tuple[np.ndarray, list[np.ndarray], list[str], str]:
    """Return (reference, [sources...], names, origin)."""
    if data_dir is None:
        # Committed hermetic tiles first (examples/make_data.py), then the
        # upstream mount's real tiles if present (dev environments only).
        for cand in (_LOCAL_DATA, _REFERENCE_DATA):
            if os.path.isfile(os.path.join(cand, "target.png")):
                data_dir = cand
                break
    if data_dir and os.path.isfile(os.path.join(data_dir, "target.png")):
        ref = _load_png(os.path.join(data_dir, "target.png"))
        paths = sorted(
            p
            for ext in ("*.png", "*.jpg", "*.jpeg")
            for p in glob.glob(os.path.join(data_dir, ext))
            if os.path.basename(p) != "target.png"
        )
        if paths:
            return ref, [_load_png(p) for p in paths], [os.path.basename(p) for p in paths], data_dir

    # Synthetic fallback (always runnable).
    from examples.simple_example import synthetic_tile

    ref = synthetic_tile(256, 256, seed=42)
    srcs = [synthetic_tile(256, 256, seed=s, he_scale=1.2) for s in (7, 8)]
    return ref, srcs, [f"synthetic_{i}" for i in range(len(srcs))], "synthetic"


def main() -> None:
    parser = argparse.ArgumentParser(description="Fit/transform/visualize one stainx_tpu method")
    parser.add_argument("method", choices=["reinhard", "macenko", "histogram_matching"])
    parser.add_argument("--data-dir", default=None, help="directory with target.png + source tiles")
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument("--save-plots", action="store_true")
    parser.add_argument("--output-dir", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from stainx_tpu import HistogramMatching, Macenko, Reinhard

    jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")

    ref, sources, names, origin = discover_data(args.data_dir)
    # Batch same-shaped sources together; transform others individually.
    print(f"data: {origin} — reference {ref.shape}, {len(sources)} source tile(s)")

    cls = {"reinhard": Reinhard, "macenko": Macenko, "histogram_matching": HistogramMatching}[
        args.method
    ]
    normalizer = cls()
    print(f"method: {args.method}  device: {normalizer.device.platform}  backend: {normalizer.backend}")

    normalizer.fit(ref)

    # Warm: first calls compile (one program per input shape).
    results = [np.asarray(normalizer.transform(s)) for s in sources]
    total_px = sum(s.shape[2] * s.shape[3] for s in sources)

    start = time.perf_counter()
    for _ in range(args.runs):
        results = [np.asarray(normalizer.transform(s)) for s in sources]
    # transform returns device arrays; np.asarray above already synced.
    elapsed = (time.perf_counter() - start) / args.runs
    print(
        f"transform: {elapsed * 1e3:.2f} ms/run end-to-end "
        f"({total_px / elapsed / 1e6:.0f} MPix/s incl. host<->device transfers; "
        f"see benchmarks/ for device-resident throughput)"
    )

    if args.save_plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(sources)
        fig, axes = plt.subplots(2, n + 1, figsize=(3 * (n + 1), 6), squeeze=False)
        axes[0][0].imshow(np.transpose(ref[0], (1, 2, 0)))
        axes[0][0].set_title("reference (target)")
        axes[1][0].axis("off")
        for i, (src, res, name) in enumerate(zip(sources, results, names), start=1):
            axes[0][i].imshow(np.transpose(src[0], (1, 2, 0)))
            axes[0][i].set_title(f"source: {name}", fontsize=8)
            shown = res[0]
            if shown.dtype != np.uint8:
                shown = np.clip(shown, 0, 255).astype(np.uint8)
            axes[1][i].imshow(np.transpose(shown, (1, 2, 0)))
            axes[1][i].set_title(f"{args.method}", fontsize=8)
        for row in axes:
            for ax in row:
                ax.axis("off")
        out_dir = args.output_dir or os.path.join(os.path.dirname(__file__), "output")
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"normalization_results_{args.method}.png")
        fig.savefig(out_path, bbox_inches="tight", dpi=110)
        print(f"saved panel: {out_path}")


if __name__ == "__main__":
    main()
