"""Benchmark utilities: device-honest timing + synthetic data + MAE.

Counterpart of the reference's ``benchmarks/utils.py`` (warmup +
``torch.cuda.synchronize()`` bracketing, ``:51-75``). On TPU,
``block_until_ready`` alone can under-report through remote-execution
tunnels, so the core timer runs R iterations inside one jitted
``lax.scan`` and fetches a scalar — wall clock then necessarily covers all
device work.
"""

from __future__ import annotations

import time
from collections.abc import Callable

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_he_batch(n: int, h: int, w: int, seed: int = 0, he_scale: float = 1.0) -> np.ndarray:
    """(n, 3, h, w) uint8 Beer–Lambert H&E tiles (well-posed stain plane)."""
    rng = np.random.default_rng(seed)
    he = np.array([[0.5626, 0.2159], [0.7201, 0.8012], [0.4062, 0.5581]], np.float32) * he_scale
    conc = np.stack(
        [0.3 + 1.8 * rng.random((n, h * w), np.float32), 0.2 + rng.random((n, h * w), np.float32)],
        axis=1,
    )
    od = np.einsum("cs,nsp->ncp", he, conc)
    return np.clip(240.0 * np.exp(-od), 0, 255).astype(np.uint8).reshape(n, 3, h, w)


def time_on_device(step: Callable, init, runs: int = 20) -> float:
    """Seconds per iteration of ``step`` (a shape-preserving array→array
    function), measured as an on-device ``lax.scan`` chain."""

    @jax.jit
    def loop(x):
        out, _ = jax.lax.scan(lambda c, _: (step(c), ()), x, None, length=runs)
        return jnp.sum(out.astype(jnp.float32))

    float(loop(init))  # compile + warm
    start = time.perf_counter()
    float(loop(init))
    return (time.perf_counter() - start) / runs


def mae(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(np.asarray(a).astype(np.float32) - np.asarray(b).astype(np.float32)).mean())
