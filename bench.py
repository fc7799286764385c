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
import os
import sys
import time

import numpy as np

BASELINE_MPIX_PER_S = 291.0  # est. H100 torch_cuda Macenko (see module docstring)

BATCH = 64
SIZE = 512
WARMUP = 5
RUNS = 40

# Repo-committed persistent compile cache (bench_cache/): /tmp is wiped on
# machine restart, which made the round-3 driver run compile from scratch and
# time out (BENCH_r03.json rc=124) before the JSON line printed.  The cache
# entries are keyed on the traced HLO + compile options, so they stay valid as
# long as the benched computation itself is unchanged; re-populate by running
# `python bench.py` on the TPU and committing the new files.
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_cache")

# If reaching the post-compile point took longer than this, we were cold —
# print a provisional JSON line from a short measurement immediately so a
# driver-side timeout kill still captures a real number, then refine.
COLD_START_S = 60.0


def _synthetic_he(n: int, h: int, w: int, seed: int = 0) -> np.ndarray:
    # Single source of truth for the Beer–Lambert fixtures — the fresh-data
    # protocol depends on every harness timing the same distribution.
    from benchmarks.utils import synthetic_he_batch

    return synthetic_he_batch(n, h, w, seed=seed)


def main() -> None:
    t_start = time.perf_counter()

    import jax

    # Persist compiled executables across runs — remote/first-time TPU
    # compiles of the full pipeline are expensive (minutes through the relay).
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
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
    # The step threads the cross-call seed state exactly as the public
    # Macenko normalizer does on repeated transform calls (round 5: the
    # previous call's terminal keys seed the next call's descents —
    # bit-exact, measured +5–10% at this config).
    from stainx_tpu.kernels.macenko_fused import seed_state_init

    def make_step(use_pallas_flag):
        def _step(v, tok, st):
            out, st2 = macenko_transform(
                jnp.bitwise_or(v, jnp.bitwise_and(tok, jnp.uint8(0))),
                he,
                tmc,
                use_pallas=use_pallas_flag,
                seed_state=st,
            )
            return out, out[0, 0, 0, 0], st2

        return jax.jit(_step)

    step = make_step(use_pallas)
    probe = jax.jit(lambda v: v[0, 0, 0, 0].astype(jnp.float32))
    tok0 = jnp.uint8(0)
    st0 = jax.device_put(seed_state_init())
    try:
        float(probe(step(batch, tok0, st0)[0]))
    except Exception as e:
        print(f"pallas transform failed ({type(e).__name__}); falling back to XLA", file=sys.stderr)
        use_pallas = False
        step = make_step(False)

    def run(iters: int) -> float:
        start = time.perf_counter()
        y, tok, st = batch, tok0, st0
        for _ in range(iters):
            y, tok, st = step(batch, tok, st)
        checksum = float(probe(y))
        assert checksum == checksum, "NaN checksum"
        return time.perf_counter() - start

    mpix = BATCH * SIZE * SIZE / 1e6

    def emit(mpix_per_s: float, provisional: bool = False) -> None:
        line = {
            "metric": "macenko_transform_512px_mpix_per_s_per_chip",
            "value": round(mpix_per_s, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": round(mpix_per_s / BASELINE_MPIX_PER_S, 3),
        }
        if provisional:
            # Distinguishes the short cold-start emission from the refined
            # 3×40-run figure below so a first-match parser cannot record
            # the 8-run number as the headline (round-4 advisor finding).
            line["provisional"] = True
        print(json.dumps(line), flush=True)

    y, _, _ = step(batch, tok0, st0)  # compile + warm
    float(probe(y))
    run(1)

    if time.perf_counter() - t_start > COLD_START_S:
        # Cold compile ate the budget: a driver timeout may kill us mid-refine,
        # so get a real (if less averaged) number onto stdout right now.
        quick_runs = 8
        quick = max(run(1 + quick_runs) - run(1), 1e-9)
        print(
            f"cold start ({time.perf_counter() - t_start:.0f}s to first measurement); "
            f"provisional from 1x{quick_runs} runs",
            file=sys.stderr,
        )
        emit(mpix * quick_runs / quick, provisional=True)

    base = min(run(1) for _ in range(3))
    total = min(run(1 + RUNS) for _ in range(3))
    elapsed = max(total - base, 1e-9)

    mpix_per_s = mpix * RUNS / elapsed
    img_per_s = BATCH * RUNS / elapsed
    print(
        f"macenko {BATCH}x3x{SIZE}x{SIZE}: {elapsed / RUNS * 1e3:.2f} ms/batch, "
        f"{img_per_s:.0f} img/s, {mpix_per_s:.1f} MPix/s",
        file=sys.stderr,
    )
    emit(mpix_per_s)


if __name__ == "__main__":
    main()
