"""Fidelity-vs-throughput Pareto: each execution mode's (MAE vs oracle,
img/s) on the reference protocol — batch 128 × 256×256 RGB uint8
(``benchmarks/pareto_time_mae.py:51-52`` in the reference; its version
sweeps ~10 external packages, which aren't installable here — ours sweeps
this library's execution modes against the numpy oracle, plus the mounted
reference's own torch-CPU backend as an external peer series).

Modes: TPU stable, TPU fast, numpy oracle (single-threaded CPU floor),
reference-torch-cpu (the reference package itself, imported from
``/root/reference/src`` and run on torch CPU — the non-self-referential
point the reference's cross-package sweep provides upstream).

Usage: ``python -m benchmarks.pareto_time_mae [--method macenko] [--json]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax
import numpy as np

from benchmarks.utils import canonical_method, mae, synthetic_he_batch, time_on_device

BATCH = 128
SIZE = 256


def _oracle(method, ref, src):
    from oracles import numpy_reference as oracle

    if method == "macenko":
        he, mc = oracle.macenko_fit(ref)
        return lambda s: oracle.macenko_transform(s, he, mc)
    if method == "reinhard":
        params = oracle.reinhard_fit(ref)
        return lambda s: oracle.reinhard_transform(s, *params)
    hists = oracle.hm_fit(ref)
    return lambda s: oracle.hm_transform(s, hists)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--method",
        default="macenko",
        type=canonical_method,
        choices=["macenko", "reinhard", "histogram_matching"],
    )
    p.add_argument("--runs", type=int, default=10)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/stainx_jax_cache")

    from stainx_tpu.ops import histogram_matching as hm_ops
    from stainx_tpu.ops import macenko as mk_ops
    from stainx_tpu.ops import reinhard as rh_ops

    ref = synthetic_he_batch(1, SIZE, SIZE, seed=42)
    src = synthetic_he_batch(BATCH, SIZE, SIZE, seed=123, he_scale=1.15)

    oracle_fn = _oracle(args.method, ref, src)
    t0 = time.perf_counter()
    expected = oracle_fn(src)
    oracle_secs = time.perf_counter() - t0

    rows = [
        {
            "mode": "numpy_oracle_cpu",
            "img_per_s": round(BATCH / oracle_secs, 2),
            "mae": 0.0,
        }
    ]

    def device_mode(name, step):
        out = np.asarray(jax.jit(step)(jax.device_put(src)))
        secs = time_on_device(step, jax.device_put(src), runs=args.runs)
        rows.append(
            {"mode": name, "img_per_s": round(BATCH / secs, 1), "mae": round(mae(out, expected), 4)}
        )

    pallas = jax.default_backend() == "tpu"
    if args.method == "macenko":
        params = mk_ops.macenko_fit(jax.device_put(ref), use_pallas=pallas)
        device_mode(
            "tpu_stable", lambda x: mk_ops.macenko_transform(x, *params, use_pallas=pallas)
        )
        device_mode(
            "tpu_fast",
            lambda x: mk_ops.macenko_transform(x, *params, precision="fast", use_pallas=pallas),
        )
    elif args.method == "reinhard":
        params = rh_ops.reinhard_fit(jax.device_put(ref))
        device_mode("tpu", lambda x: rh_ops.reinhard_transform(x, *params))
    else:
        hist = hm_ops.hm_fit(jax.device_put(ref))
        device_mode("tpu", lambda x: hm_ops.hm_transform(x, hist))
        device_mode("tpu_pallas", lambda x: hm_ops.hm_transform(x, hist, use_pallas=True))

    # External peer: the reference package itself on torch CPU (importable
    # from the mounted repo; validated upstream against torchstain /
    # scikit-image at its own tolerances).
    from oracles import reference_torch as ref_torch

    if ref_torch.available():
        # Transform-only closures: this library's modes time transform in
        # isolation, so the peer series must exclude fit cost too.
        if args.method == "macenko":
            he_r, mc_r = ref_torch.macenko_fit(ref)
            peer = lambda: ref_torch.macenko_transform(src, he_r, mc_r)
        elif args.method == "reinhard":
            peer_t = ref_torch.reinhard_fitted(ref)
            peer = lambda: peer_t(src)
        else:
            peer_t = ref_torch.histogram_matching_fitted(ref)
            peer = lambda: peer_t(src)
        peer_out = peer()  # warm caches / JIT-free but first-call effects
        t0 = time.perf_counter()
        n_peer = 3
        for _ in range(n_peer):
            peer_out = peer()
        peer_secs = (time.perf_counter() - t0) / n_peer
        rows.append(
            {
                "mode": "reference-torch-cpu",
                "img_per_s": round(BATCH / peer_secs, 2),
                "mae": round(mae(peer_out.astype(np.float32), expected), 4),
            }
        )

    for row in rows:
        row["method"] = args.method
        print(json.dumps(row) if args.json else f"{row['method']:<20} {row['mode']:<18} {row['img_per_s']:>10} img/s  MAE {row['mae']}")


if __name__ == "__main__":
    main()
