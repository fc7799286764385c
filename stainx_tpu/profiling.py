"""Profiling / tracing hooks.

The reference has no built-in tracing (SURVEY §5); its benchmarks bracket
with ``torch.cuda.synchronize``. The TPU-native equivalents:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of every XLA/Pallas kernel in the block.
- :func:`annotate` — named sub-spans inside a trace.
- :func:`time_fn` — honest wall-clock timing of a jitted array→array step
  (chained dispatches + scalar fetch; ``block_until_ready`` alone can
  under-report through remote-execution tunnels).
"""

from __future__ import annotations

import contextlib
import time
from collections.abc import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/stainx_trace"):
    """Capture a device trace viewable with TensorBoard / xprof.

    >>> with profiling.trace("/tmp/trace"):
    ...     normalizer.transform(batch)
    """
    with jax.profiler.trace(log_dir):
        yield log_dir


def annotate(name: str):
    """Named span inside a :func:`trace` block (context manager)."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(step: Callable, init, iters: int = 10, warmup: int = 1) -> float:
    """Seconds per iteration of a shape-preserving jitted ``step``.

    Chains iterations via data dependency and fetches a scalar so the
    measurement necessarily covers all device work.
    """
    step = jax.jit(step)
    y = init
    for _ in range(max(warmup, 1)):
        y = step(y)
    jnp.asarray(y).block_until_ready()

    def run(n: int) -> float:
        start = time.perf_counter()
        v = init
        for _ in range(n):
            v = step(v)
        float(jnp.asarray(v).reshape(-1)[0].astype(jnp.float32))
        return time.perf_counter() - start

    base = min(run(1) for _ in range(3))
    total = min(run(1 + iters) for _ in range(2))
    return max(total - base, 1e-12) / iters
