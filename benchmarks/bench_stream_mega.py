"""Race the streaming mega kernel against the staged jnp+streaming-select
path on >2M-px rows (the only tier where both apply) and gate fidelity
vs the CPU oracle.

This is the compiled-TPU measurement that decides
``stainx_tpu.ops.macenko.STREAM_MEGA_ENABLED`` (project invariant:
kernels become defaults only when measured faster in context). The tier
it covers replaces the reference CUDA sort machinery at sizes it never
ran (``/root/reference/src/stainx_cuda_torch/csrc/macenko.cu:209-251``).

Usage::

    python -m benchmarks.bench_stream_mega --size 2048 --batch 2 --runs 10
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--height", type=int, default=None, help="row height (default --size)")
    ap.add_argument("--width", type=int, default=None, help="row width (default --size)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument(
        "--dtype",
        default="uint8",
        choices=["uint8", "float32"],
        help="input dtype: uint8 [0,255] or float32 [0,1] (the two streaming-tier dtypes)",
    )
    ap.add_argument(
        "--paths",
        nargs="*",
        default=["staged", "stream_mega"],
        choices=["staged", "stream_mega"],
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import stainx_tpu.ops.macenko as mk
    from benchmarks.utils import synthetic_he_batch, time_on_device
    from stainx_tpu.kernels.macenko_stream import macenko_transform_stream
    from stainx_tpu.ops.macenko import macenko_fit, macenko_transform

    print(f"devices: {jax.devices()}", file=sys.stderr)
    on_tpu = jax.default_backend() == "tpu"
    h = args.height or args.size
    w = args.width or args.size
    ref = jax.device_put(synthetic_he_batch(1, 512, 512, seed=42))
    batch_np = synthetic_he_batch(args.batch, h, w, seed=123)
    if args.dtype == "float32":
        batch_np = batch_np.astype(np.float32) / 255.0
    batch = jax.device_put(batch_np)
    he, tmc = macenko_fit(ref, use_pallas=on_tpu)
    he = jax.device_put(np.asarray(he))
    tmc = jax.device_put(np.asarray(tmc))

    def staged(x):
        # use_pallas routes the selections through the streaming descent at
        # this size; STREAM_MEGA_ENABLED is forced off for the staged row.
        return macenko_transform(x, he, tmc, use_pallas=on_tpu)

    def stream_mega(x):
        return macenko_transform_stream(x, he, tmc)

    fns = {"staged": staged, "stream_mega": stream_mega}

    # Fidelity gate: both paths vs the numpy oracle on one image.
    from oracles import numpy_reference as np_oracle

    small = np.asarray(batch[:1])
    oracle = np_oracle.macenko_transform(
        small, np.asarray(he), np.asarray(tmc)
    ).astype(np.float64)

    saved = mk.STREAM_MEGA_ENABLED
    mk.STREAM_MEGA_ENABLED = False
    try:
        outs = {}
        for name in args.paths:
            out = np.asarray(fns[name](batch[:1])).astype(np.float64)
            mae = float(np.abs(out - oracle).mean())
            outs[name] = out
            print(f"  {name}: MAE vs oracle {mae:.4f}", file=sys.stderr)
            if mae > 0.35:
                raise SystemExit(f"{name} MAE {mae:.4f} over the 0.35 gate")
        if len(outs) == 2:
            a, b = (outs[p] for p in args.paths)
            print(
                f"  cross-path max|Δ|={np.abs(a - b).max():.1f} "
                f"mean|Δ|={np.abs(a - b).mean():.5f}",
                file=sys.stderr,
            )

        mpix = args.batch * h * w / 1e6
        for name in args.paths:
            secs = time_on_device(fns[name], batch, runs=args.runs)
            print(
                f"{name}[{args.dtype}] {args.batch}x3x{h}x{w}: "
                f"{secs * 1e3:.2f} ms/batch, {mpix / secs:.0f} MPix/s"
            )
    finally:
        mk.STREAM_MEGA_ENABLED = saved
        # The flag is read at TRACE time: traces compiled while it was
        # pinned stay in jit's cache past the restore, so an in-process
        # caller would silently keep the ablated route (same failure mode
        # descent_ablation.py clears for — round-2 advisor finding).
        import jax

        jax.clear_caches()


if __name__ == "__main__":
    main()
