"""Batch-mode (fit-per-forward) throughput for all three methods.

The reference's L5 batch mode re-fits on the designated reference image of
EVERY incoming batch before transforming it
(``src/stainx/transforms.py:222-227``); this harness times exactly that
composite — fit(batch[0:1]) + transform(batch) as ONE jitted step with
chained dispatches — plus, for Macenko, the ``batch_ref_index=None``
extension (fit pooled over the WHOLE batch, the streaming fit kernel's
case).

    python -m benchmarks.bench_batch_mode --batch 256 --size 224 \
        --dtype float32 --runs 20

Round-5 context: this is the configuration the Macenko fit kernels were
built for (``kernels/macenko_fused.macenko_fit_mega`` + cross-call seed
carry); the pre-kernel jnp fit measured 38.4k img/s at 256×224² float.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.utils import canonical_method, synthetic_he_batch


def _steps(method: str, use_pallas: bool, carry: bool):
    """Build (step, init_state) — step(batch, tok, state) -> (out, tok, state)."""
    if method == "macenko":
        from stainx_tpu.kernels.macenko_fused import seed_state_init
        from stainx_tpu.ops.macenko import macenko_fit, macenko_transform

        if carry:

            def step(v, tok, st):
                he, mc, st2 = macenko_fit(
                    v[0:1], use_pallas=use_pallas, seed_state=st
                )
                out, st3 = macenko_transform(
                    v, he, mc, use_pallas=use_pallas, seed_state=st2
                )
                return out, out[0, 0, 0, 0], st3

            return step, seed_state_init()

        def step(v, tok, st):
            he, mc = macenko_fit(v[0:1], use_pallas=use_pallas)
            out = macenko_transform(v, he, mc, use_pallas=use_pallas)
            return out, out[0, 0, 0, 0], st

        return step, jnp.int32(0)

    if method == "reinhard":
        from stainx_tpu.ops.reinhard import reinhard_fit, reinhard_transform

        def step(v, tok, st):
            mean, std = reinhard_fit(v[0:1])
            out = reinhard_transform(v, mean, std, use_pallas=use_pallas)
            return out, out[0, 0, 0, 0], st

        return step, jnp.int32(0)

    from stainx_tpu.ops.histogram_matching import hm_fit, hm_transform

    def step(v, tok, st):
        hist = hm_fit(v[0:1])
        out = hm_transform(v, hist, use_pallas=use_pallas)
        return out, out[0, 0, 0, 0], st

    return step, jnp.int32(0)


def _pooled_macenko_step(use_pallas: bool, carry: bool):
    """batch_ref_index=None: fit pooled over the WHOLE batch (streaming
    fit kernel territory at production sizes)."""
    from stainx_tpu.kernels.macenko_fused import seed_state_init
    from stainx_tpu.ops.macenko import macenko_fit, macenko_transform

    if carry:

        def step(v, tok, st):
            he, mc, st2 = macenko_fit(v, use_pallas=use_pallas, seed_state=st)
            out, st3 = macenko_transform(
                v, he, mc, use_pallas=use_pallas, seed_state=st2
            )
            return out, out[0, 0, 0, 0], st3

        return step, seed_state_init()

    def step(v, tok, st):
        he, mc = macenko_fit(v, use_pallas=use_pallas)
        out = macenko_transform(v, he, mc, use_pallas=use_pallas)
        return out, out[0, 0, 0, 0], st

    return step, jnp.int32(0)


def time_step(step, batch, st0, runs: int) -> float:
    """bench.py's chained-delta protocol, with the carry state threaded."""
    tok_mix = (
        (lambda v, tok: jnp.bitwise_or(v, jnp.bitwise_and(tok.astype(jnp.uint8), jnp.uint8(0))))
        if batch.dtype == jnp.uint8
        else (lambda v, tok: v + (tok * 0).astype(v.dtype))
    )

    @jax.jit
    def chained(v, tok, st):
        out, leaf, st2 = step(tok_mix(v, tok), tok, st)
        return leaf.astype(jnp.float32), st2

    def run(iters: int) -> float:
        start = time.perf_counter()
        tok, st = jnp.float32(0), st0
        for _ in range(iters):
            tok, st = chained(batch, tok, st)
        float(tok)
        return time.perf_counter() - start

    run(2)  # compile + warm
    base = min(run(1) for _ in range(3))
    total = min(run(1 + runs) for _ in range(3))
    return max(total - base, 1e-9) / runs


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--method", default=None, type=canonical_method,
                   choices=["macenko", "reinhard", "histogram_matching"],
                   help="default: all three")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--dtype", default="uint8", choices=["uint8", "float32"])
    p.add_argument("--runs", type=int, default=20)
    p.add_argument("--pooled", action="store_true",
                   help="macenko only: whole-batch pooled fit (batch_ref_index=None)")
    p.add_argument("--no-carry", action="store_true",
                   help="disable the cross-call seed carry (macenko ablation)")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")
    use_pallas = jax.default_backend() == "tpu"

    batch_u8 = synthetic_he_batch(args.batch, args.size, args.size, seed=123, he_scale=1.15)
    batch = batch_u8.astype(np.float32) / 255.0 if args.dtype == "float32" else batch_u8
    batch = jax.device_put(batch)

    methods = [args.method] if args.method else ["macenko", "reinhard", "histogram_matching"]
    for method in methods:
        carry = method == "macenko" and not args.no_carry
        if args.pooled:
            if method != "macenko":
                continue
            step, st0 = _pooled_macenko_step(use_pallas, carry)
            label = f"{method}[pooled fit]"
        else:
            step, st0 = _steps(method, use_pallas, carry)
            label = method
        secs = time_step(step, batch, jax.device_put(st0), args.runs)
        row = {
            "mode": "batch(fit-per-forward)" + (" pooled" if args.pooled else ""),
            "method": method,
            "dtype": args.dtype,
            "batch": args.batch,
            "size": args.size,
            "img_per_s": round(args.batch / secs, 1),
            "mpix_per_s": round(args.batch * args.size * args.size / 1e6 / secs, 2),
            "seed_carry": carry,
        }
        if args.json:
            print(json.dumps(row))
        else:
            print(
                f"{label}[{args.dtype}] {args.batch}x3x{args.size}x{args.size} "
                f"fit-per-forward: {row['img_per_s']:9.1f} img/s "
                f"{row['mpix_per_s']:8.1f} MPix/s"
                + ("" if carry or method != "macenko" else "  (carry off)")
            )


if __name__ == "__main__":
    main()
