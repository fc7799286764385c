"""Headline benchmark: batched 512×512 Macenko transform throughput.

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.

Protocol mirrors the reference harness
(``benchmarks/benchmark_stainx_backend.py:86-93``: warmup then timed runs,
device-synchronized) on the BASELINE.json headline config: Macenko
reference-mode transform of a uint8 batch of 512² tiles, reported as
megapixels/sec/chip.

Baseline constant: the reference publishes Macenko ``torch_cuda`` at
5177 img/s on batch 64×150² (RTX A6000, ``docs/changelog.md:73``) ≈ 116.5
MPix/s. BASELINE.md targets ≥5× the H100 number; no H100 figure is
published, so we scale the A6000 figure by a conservative 2.5× H100/A6000
factor → 291 MPix/s as the denominator. ``vs_baseline`` > 5 ⇒ target met.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MPIX_PER_S = 291.0  # est. H100 torch_cuda Macenko (see module docstring)

BATCH = 64
SIZE = 512
WARMUP = 5
RUNS = 40


def _synthetic_he(n: int, h: int, w: int, seed: int = 0) -> np.ndarray:
    # Single source of truth for the Beer–Lambert fixtures — the fresh-data
    # protocol depends on every harness timing the same distribution.
    from benchmarks.utils import synthetic_he_batch

    return synthetic_he_batch(n, h, w, seed=seed)


def main() -> None:
    import jax

    # Persist compiled executables across runs — remote/first-time TPU
    # compiles of the full pipeline are expensive.
    jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from stainx_tpu.ops.macenko import macenko_fit, macenko_transform

    print(f"devices: {jax.devices()}", file=sys.stderr)

    ref = jax.device_put(_synthetic_he(1, SIZE, SIZE, seed=42))
    batch = jax.device_put(_synthetic_he(BATCH, SIZE, SIZE, seed=123))

    use_pallas = jax.default_backend() == "tpu"  # what Macenko() auto-selects
    try:
        he, tmc = macenko_fit(ref, use_pallas=use_pallas)
    except Exception as e:  # never leave the driver without a JSON line
        print(f"pallas fit failed ({type(e).__name__}); falling back to XLA", file=sys.stderr)
        use_pallas = False
        he, tmc = macenko_fit(ref, use_pallas=False)

    # Delta timing with chained dispatches: each iteration consumes a scalar
    # token from the previous output so executions can't be elided or
    # reordered, and a scalar host fetch at the end forces full device
    # completion (remote-execution tunnels can make block_until_ready
    # return early; a value fetch cannot lie). The 1-iteration run's time
    # is subtracted to cancel dispatch/fetch overhead. (Wrapping the chain
    # in lax.scan instead sends XLA:TPU compile time pathological.)
    #
    # Every iteration transforms the SAME fresh batch: the token mixes in as
    # `v | (tok & 0)` (identity, one fused elementwise pass ≈ 0.1 ms, charged
    # against us). Feeding the transformed output back as the next input —
    # the previous protocol — is NOT representative: re-normalized images
    # are near-rank-2 reconstructions whose radix descents exit ~13× earlier
    # than on real tiles, inflating throughput ~2–3×.
    def make_step(use_pallas_flag):
        def _step(v, tok):
            out = macenko_transform(
                jnp.bitwise_or(v, jnp.bitwise_and(tok, jnp.uint8(0))),
                he,
                tmc,
                use_pallas=use_pallas_flag,
            )
            return out, out[0, 0, 0, 0]

        return jax.jit(_step)

    step = make_step(use_pallas)
    probe = jax.jit(lambda v: v[0, 0, 0, 0].astype(jnp.float32))
    tok0 = jnp.uint8(0)
    try:
        float(probe(step(batch, tok0)[0]))
    except Exception as e:
        print(f"pallas transform failed ({type(e).__name__}); falling back to XLA", file=sys.stderr)
        use_pallas = False
        step = make_step(False)

    def run(iters: int) -> float:
        start = time.perf_counter()
        y, tok = batch, tok0
        for _ in range(iters):
            y, tok = step(batch, tok)
        checksum = float(probe(y))
        assert checksum == checksum, "NaN checksum"
        return time.perf_counter() - start

    y, _ = step(batch, tok0)  # compile + warm
    float(probe(y))
    run(1)
    base = min(run(1) for _ in range(3))
    total = min(run(1 + RUNS) for _ in range(3))
    elapsed = max(total - base, 1e-9)

    mpix = BATCH * SIZE * SIZE / 1e6
    mpix_per_s = mpix * RUNS / elapsed
    img_per_s = BATCH * RUNS / elapsed
    print(
        f"macenko {BATCH}x3x{SIZE}x{SIZE}: {elapsed / RUNS * 1e3:.2f} ms/batch, "
        f"{img_per_s:.0f} img/s, {mpix_per_s:.1f} MPix/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "macenko_transform_512px_mpix_per_s_per_chip",
                "value": round(mpix_per_s, 2),
                "unit": "MPix/s/chip",
                "vs_baseline": round(mpix_per_s / BASELINE_MPIX_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
