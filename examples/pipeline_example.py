"""StainNormalizerTransform inside a training input pipeline.

TPU counterpart of the reference's ``examples/torch_transform_example.py``
(DataLoader + v2.Compose wiring, ``:43-65``): a host-side tile iterator
feeds uint8 NCHW batches; the transform normalizes them post-"collate"
(float [0,1] out, ready for a model), on whatever device the pipeline runs.

Run: ``python examples/pipeline_example.py``
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

# Persist compiled executables — first-time TPU compiles of the full
# pipeline run minutes through remote relays.
jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from examples.simple_example import synthetic_tile
from stainx_tpu import StainNormalizerTransform


def tile_loader(num_batches: int, batch_size: int, size: int):
    """Stand-in for a WSI tile DataLoader: yields float [0,1] NCHW batches."""
    for i in range(num_batches):
        tiles = [synthetic_tile(size, size, seed=100 + i * batch_size + j, he_scale=1.2)
                 for j in range(batch_size)]
        yield np.concatenate(tiles).astype(np.float32) / 255.0


def main() -> None:
    reference = synthetic_tile(128, 128, seed=42)

    # Reference mode: fit once, reproducible across steps (preferred for
    # supervised training — reference transforms.py:29-35).
    transform = StainNormalizerTransform(method="macenko", reference=reference)

    for step, batch in enumerate(tile_loader(num_batches=3, batch_size=8, size=128)):
        normalized = transform(batch)  # float [0,1] in → float [0,1] out
        print(
            f"step {step}: in {batch.shape} {batch.dtype} → "
            f"out {normalized.shape} {np.asarray(normalized).dtype} "
            f"range [{float(normalized.min()):.3f}, {float(normalized.max()):.3f}]"
        )

    # Batch mode: re-fits on batch[0] every call (exploratory use;
    # intentionally mutable — reference transforms.py:36-39).
    batch_mode = StainNormalizerTransform(method="reinhard", mode="batch")
    out = batch_mode(next(tile_loader(1, 8, 128)))
    print(f"batch mode out: {out.shape}")


if __name__ == "__main__":
    main()
