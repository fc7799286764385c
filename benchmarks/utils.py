"""Benchmark utilities: device-honest timing + synthetic data + MAE.

Counterpart of the reference's ``benchmarks/utils.py`` (warmup +
``torch.cuda.synchronize()`` bracketing, ``:51-75``). On TPU,
``block_until_ready`` alone can under-report through remote-execution
tunnels, so the core timer chains R dispatches through a scalar token and
fetches a scalar at the end — wall clock then necessarily covers all
device work. (An earlier version wrapped the loop in one ``lax.scan``;
scanning a whole transform sends XLA:TPU compile times pathological —
20+ minutes — per the project's own landmine list.)
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


def time_on_device(step: Callable, init, runs: int = 20, state=None) -> float:
    """Seconds per iteration of ``step`` (an array→array function).

    Each iteration re-processes ``init`` (fresh data — feeding outputs back
    would drift the input distribution) but consumes a scalar token from
    the previous output, so dispatches chain and cannot be elided; the
    final scalar fetch forces completion (``block_until_ready`` can return
    early through remote-execution relays). The 1-iteration time is
    subtracted to cancel dispatch/fetch overhead — the bench.py protocol.

    ``state`` (optional): initial value for a STATEFUL step —
    ``step(x, state) -> (out, new_state)`` — threaded through consecutive
    iterations exactly like the production normalizer threads its
    cross-call seed state. Both arms of any comparison must use the same
    protocol (round-5 lesson: cross-helper timing deltas are artifacts).
    """

    # The FULL output stays a jit result in both forms: returning only the
    # scalar token would let XLA dead-code-eliminate most of a jnp-path
    # step (pallas kernels are opaque, jnp pipelines are not).
    if state is None:

        @jax.jit
        def chained(x, tok):
            out = step(x + (tok * 0).astype(x.dtype))  # identity, forces ordering
            leaf = jax.tree_util.tree_leaves(out)[0]
            return out, leaf.reshape(-1)[0].astype(jnp.float32), None

    else:

        @jax.jit
        def chained(x, tok, st):
            out, st2 = step(x + (tok * 0).astype(x.dtype), st)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return out, leaf.reshape(-1)[0].astype(jnp.float32), st2

    @jax.jit
    def probe(tok):
        return tok

    def run(iters: int) -> float:
        start = time.perf_counter()
        tok = jnp.float32(0)
        st = state
        for _ in range(iters):
            if state is None:
                _out, tok, _ = chained(init, tok)
            else:
                _out, tok, st = chained(init, tok, st)
        float(probe(tok))
        return time.perf_counter() - start

    run(1)  # compile + warm
    base = min(run(1) for _ in range(3))
    total = run(1 + runs)
    return max(total - base, 1e-9) / runs


def canonical_method(name: str) -> str:
    """argparse `type=` canonicalizer: applied before the choices check, so
    `--method hm` resolves to histogram_matching in every benchmark CLI."""
    return "histogram_matching" if name == "hm" else name


def mae(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(np.asarray(a).astype(np.float32) - np.asarray(b).astype(np.float32)).mean())
