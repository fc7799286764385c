"""Ablation: rank-selection descent strategies on the real TPU.

Times the mega-kernel Macenko transform under each
``stainx_tpu.kernels.selection.DESCENT_MODE`` (dep / ikdep / spec6 /
spec4 / nocon / defer / interval / interval8) with the shared
chained-dispatch protocol (``benchmarks.utils.time_on_device``), and
ASSERTS the modes agree bit-exactly — selection is exact under all of
them, so any nonzero delta is a regression.

Run: ``python -m benchmarks.descent_ablation [--size 512] [--batch 64]
[--modes dep interval ...]``. Measured results live in
``docs/benchmarks.md`` ("Descent-strategy ablation").
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument(
        "--modes",
        nargs="*",
        default=["dep", "ikdep", "interval"],
        choices=[
            "dep", "ikdep", "cum16", "cum256", "spec6", "spec4", "nocon", "defer",
            "interval", "interval8", "interval16", "interval256", "sint", "auto",
        ],
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import stainx_tpu.kernels.selection as sel
    from benchmarks.utils import synthetic_he_batch, time_on_device
    from stainx_tpu.kernels.macenko_fused import macenko_transform_mega
    from stainx_tpu.ops.macenko import macenko_fit

    print(f"devices: {jax.devices()}", file=sys.stderr)
    ref = jax.device_put(synthetic_he_batch(1, args.size, args.size, seed=42))
    batch = jax.device_put(synthetic_he_batch(args.batch, args.size, args.size, seed=123))
    he, tmc = macenko_fit(ref, use_pallas=jax.default_backend() == "tpu")
    he = jax.device_put(np.asarray(he))
    tmc = jax.device_put(np.asarray(tmc))

    ref_out = None
    try:
        for mode in args.modes:
            sel.DESCENT_MODE = mode
            jax.clear_caches()

            out_np = np.asarray(macenko_transform_mega(batch, he, tmc))
            if ref_out is None:
                ref_out = out_np
            else:
                diff = int(
                    np.abs(out_np.astype(np.int32) - ref_out.astype(np.int32)).max()
                )
                # Explicit raise (not `assert`): the bit-exactness gate must
                # survive `python -O`.
                if diff != 0:
                    raise SystemExit(
                        f"{mode} diverges from {args.modes[0]}: max|Δ|={diff}"
                    )
                print(f"  {mode}: bit-identical to {args.modes[0]}", file=sys.stderr)

            secs = time_on_device(
                lambda x: macenko_transform_mega(x, he, tmc), batch, runs=args.runs
            )
            mpix = args.batch * args.size * args.size / 1e6
            print(f"{mode:9s}: {secs * 1e3:.2f} ms/batch, {mpix / secs:.0f} MPix/s")
    finally:
        # Never leave the process-global strategy pinned for in-process
        # callers — and drop every executable traced while a mode WAS
        # pinned: jit caches key on the function, not the module global, so
        # without clear_caches() an in-process caller would silently keep
        # executing the last ablated mode (round-2 advisor finding).
        sel.DESCENT_MODE = "auto"
        jax.clear_caches()


if __name__ == "__main__":
    main()
