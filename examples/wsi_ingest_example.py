"""End-to-end WSI tile ingest: native double-buffered IO feeding the TPU.

Connects :class:`stainx_tpu.io.tilepipe.RawTileLoader` (reader-thread pool +
double-buffered slots, the native DataLoader-worker counterpart of the
reference's multi-worker pipelines, ``examples/torch_transform_example.py:43-65``)
to :class:`stainx_tpu.StainNormalizerTransform` on the accelerator, and
measures SUSTAINED throughput *including host IO*:

- ``ingest-only``   — the loader alone (disk → host RAM);
- ``compute-only``  — the normalizer alone on a resident batch;
- ``end-to-end``    — the overlapped pipeline (reader threads fill batch
  k+1 while the TPU transforms batch k; JAX's async dispatch provides the
  device side of the overlap).

If end-to-end ≈ min(ingest, compute), the double-buffer overlap works; the
smaller of the two names the bound. Results for the v5e + local-NVMe config
are recorded in ``docs/benchmarks.md``.

Run: ``python examples/wsi_ingest_example.py [--tiles 256] [--batch 32] [--size 512]``
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from examples.simple_example import synthetic_tile
from stainx_tpu import StainNormalizerTransform
from stainx_tpu.io.tilepipe import RawTileLoader, tilepipe_available


def write_tile_store(root: Path, n_tiles: int, size: int) -> list[str]:
    """Synthetic WSI tile store: one raw uint8 NCHW tile per file."""
    files = []
    # A handful of distinct tiles reused across files: IO cost is real
    # (every file is read from disk), synthesis cost is not.
    protos = [synthetic_tile(size, size, seed=100 + s, he_scale=1.0 + 0.05 * s) for s in range(8)]
    for i in range(n_tiles):
        p = root / f"tile_{i:05d}.raw"
        protos[i % len(protos)].tofile(p)
        files.append(str(p))
    return files


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0].platform}, native tilepipe: {tilepipe_available()}")

    with tempfile.TemporaryDirectory(prefix="stainx_wsi_") as td:
        root = Path(td)
        files = write_tile_store(root, args.tiles, args.size)
        tile_shape = (3, args.size, args.size)

        reference = synthetic_tile(256, 256, seed=42)
        transform = StainNormalizerTransform(method="macenko", reference=reference)

        def loader():
            return RawTileLoader(files, tile_shape, args.batch, drop_remainder=True)

        # Warm the compile (and the page cache — a real WSI store is far
        # larger than RAM; rerun with --tiles sized past RAM to measure
        # cold-IO numbers). Loader batches are zero-copy views into a slot
        # that is refilled as soon as the NEXT batch is requested — copy
        # anything that must outlive the iteration (RawTileLoader contract).
        for batch in loader():
            first = batch.copy()
            break
        float(jnp.asarray(transform(first)).reshape(-1)[0])  # fetch = real barrier

        n_batches = len(loader())
        n_imgs = n_batches * args.batch

        # --- ingest-only ----------------------------------------------------
        t0 = time.perf_counter()
        checksum = 0
        for batch in loader():
            checksum += int(batch[0, 0, 0, 0])  # touch the buffer
        t_ingest = time.perf_counter() - t0

        # --- compute-only (resident batch) -----------------------------------
        # Enqueue every dispatch, then fetch ONE scalar from the last output:
        # the device queue executes in order, so the fetch is a barrier over
        # the whole loop. (block_until_ready can return early through the TPU
        # relay — CLAUDE.md; the scalar fetch is the honest barrier. The loop
        # shape mirrors the end-to-end loop so per-dispatch overhead is paid
        # identically in both.)
        resident = jax.block_until_ready(jax.device_put(first))
        t0 = time.perf_counter()
        out = None
        for _ in range(n_batches):
            out = jnp.asarray(transform(resident))
        float(out.reshape(-1)[0])
        t_compute = time.perf_counter() - t0

        # --- end-to-end: IO under the TPU's async dispatch ------------------
        t0 = time.perf_counter()
        out = None
        for batch in loader():
            # device_put + dispatch return immediately; the reader threads
            # fill the other slot while the TPU works. The .copy() moves the
            # bytes out of the recycled slot buffer before the next refill
            # (device_put is async — it may still be reading the host buffer
            # when the slot is reused).
            out = jnp.asarray(transform(jax.device_put(batch.copy())))
        float(out.reshape(-1)[0])  # device queue is in-order: last done = all done
        t_e2e = time.perf_counter() - t0

        mpix = n_imgs * args.size * args.size / 1e6
        rows = [
            ("ingest-only", t_ingest),
            ("compute-only", t_compute),
            ("end-to-end", t_e2e),
        ]
        for name, t in rows:
            print(f"{name:13s}: {n_imgs / t:8.1f} img/s  {mpix / t:8.0f} MPix/s  ({t:.3f} s)")
        # Perfect overlap runs at the slower leg's speed: the floor for the
        # end-to-end time is max(ingest, compute), and efficiency is how
        # close the pipeline gets to that floor.
        bound = "ingest" if t_ingest > t_compute else "compute"
        overlap = max(t_ingest, t_compute) / t_e2e
        print(f"pipeline is {bound}-bound; overlap efficiency {overlap:.0%} "
              f"(end-to-end vs the {bound}-only floor)")


if __name__ == "__main__":
    main()
