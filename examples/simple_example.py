"""Fit / transform / visualize on synthetic H&E tiles.

TPU counterpart of the reference's ``examples/simple_example.py``: fit each
normalizer on a reference tile, transform a source tile, save a side-by-side
panel (PNG via matplotlib when available, .npy fallback otherwise).

Run: ``python examples/simple_example.py [--method macenko] [--out out.png]``
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

# Persist compiled executables — first-time TPU compiles through remote
# relays run minutes; cached reruns are instant.
jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stainx_tpu import HistogramMatching, Macenko, Reinhard

_METHODS = {"macenko": Macenko, "reinhard": Reinhard, "histogram_matching": HistogramMatching}


def synthetic_tile(h: int, w: int, seed: int, he_scale: float = 1.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    he = np.array([[0.5626, 0.2159], [0.7201, 0.8012], [0.4062, 0.5581]], np.float32) * he_scale
    gh, gw = h // 8, w // 8
    coarse = rng.random((2, gh, gw), np.float32)
    conc = np.stack(
        [
            0.3 + 1.8 * np.kron(coarse[0], np.ones((8, 8), np.float32)),
            0.2 + 1.0 * np.kron(coarse[1], np.ones((8, 8), np.float32)),
        ]
    ).reshape(2, -1)
    od = he @ conc
    return np.clip(240.0 * np.exp(-od), 0, 255).astype(np.uint8).reshape(1, 3, h, w)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="macenko", choices=sorted(_METHODS))
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--out", default="normalized.png")
    args = p.parse_args()

    reference = synthetic_tile(args.size, args.size, seed=42)
    source = synthetic_tile(args.size, args.size, seed=123, he_scale=1.3)

    normalizer = _METHODS[args.method]()
    print(f"{args.method}: device={normalizer.device} backend={normalizer.backend}")
    result = np.asarray(normalizer.fit(reference).transform(source))
    print(f"fitted state: { {k: getattr(v, 'shape', None) for k, v in normalizer.state.items()} }")

    panel = np.concatenate([source[0], reference[0], result[0]], axis=2)  # (3, H, 3W)
    hwc = np.transpose(panel, (1, 2, 0))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(9, 3.2))
        ax.imshow(hwc)
        ax.set_title(f"source | reference | {args.method}-normalized")
        ax.axis("off")
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    except ImportError:
        np.save(args.out + ".npy", hwc)
        print(f"matplotlib unavailable; wrote {args.out}.npy")


if __name__ == "__main__":
    main()
