"""Ablation: radix-descent contraction strategies on the real TPU.

Times the 512² mega-kernel Macenko transform under each
``stainx_tpu.kernels.selection.DESCENT_MODE`` (dep / spec6 / spec4 /
nocon) with the fresh-data chained-dispatch protocol of ``bench.py``,
and checks the modes agree bit-exactly (selection is exact under all).

Run: ``python -m benchmarks.descent_ablation [--size 512] [--batch 64]``
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--modes", nargs="*", default=["dep", "spec6", "spec4", "nocon"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import stainx_tpu.kernels.selection as sel
    from bench import _synthetic_he
    from stainx_tpu.kernels.macenko_fused import macenko_transform_mega
    from stainx_tpu.ops.macenko import macenko_fit

    print(f"devices: {jax.devices()}", file=sys.stderr)
    ref = jax.device_put(_synthetic_he(1, args.size, args.size, seed=42))
    batch = jax.device_put(_synthetic_he(args.batch, args.size, args.size, seed=123))
    he, tmc = macenko_fit(ref, use_pallas=jax.default_backend() == "tpu")
    he = jax.device_put(np.asarray(he))
    tmc = jax.device_put(np.asarray(tmc))

    ref_out = None
    for mode in args.modes:
        sel.DESCENT_MODE = mode
        jax.clear_caches()

        def _step(v, tok):
            out = macenko_transform_mega(
                jnp.bitwise_or(v, jnp.bitwise_and(tok, jnp.uint8(0))), he, tmc
            )
            return out, out[0, 0, 0, 0]

        step = jax.jit(_step)
        probe = jax.jit(lambda v: v[0, 0, 0, 0].astype(jnp.float32))
        tok0 = jnp.uint8(0)

        y, _ = step(batch, tok0)  # compile + warm (scalar fetch below)
        float(probe(y))
        out_np = np.asarray(y)
        if ref_out is None:
            ref_out = out_np
        else:
            diff = np.abs(out_np.astype(np.int32) - ref_out.astype(np.int32))
            print(f"  {mode}: max|Δ| vs {args.modes[0]} = {diff.max()}", file=sys.stderr)

        def run(iters: int) -> float:
            start = time.perf_counter()
            yy, tok = batch, tok0
            for _ in range(iters):
                yy, tok = step(batch, tok)
            assert float(probe(yy)) == float(probe(yy)), "NaN"
            return time.perf_counter() - start

        run(1)
        base = min(run(1) for _ in range(3))
        total = min(run(1 + args.runs) for _ in range(2))
        elapsed = max(total - base, 1e-9)
        mpix = args.batch * args.size * args.size / 1e6
        print(
            f"{mode:6s}: {elapsed / args.runs * 1e3:.2f} ms/batch, "
            f"{mpix * args.runs / elapsed:.0f} MPix/s"
        )


if __name__ == "__main__":
    main()
