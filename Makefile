# Developer entry points (counterpart of the reference Makefile's
# install/test/lint/docs targets — minus its CUDA build gymnastics).

PY ?= python

.PHONY: install install-dev test test-tpu tpu-smoke bench lint fix docs docs-api clean

install:
	$(PY) -m pip install -e .

install-dev:
	$(PY) -m pip install -e ".[dev]"

test:
	$(PY) -m pytest tests/ -q

# Run the suite on real TPU hardware instead of the virtual CPU mesh.
test-tpu:
	STAINX_TEST_TPU=1 $(PY) -m pytest tests/ -q -m "not slow"

# COMPILED-kernel smoke: the kernel parity subset on the real chip, minutes
# not tens of minutes — interpret mode accepts programs the Mosaic TPU
# lowering rejects, so run this after ANY kernel change and stamp the result
# in docs/correctness_report.md (the reference's self-hosted GPU verify
# role, upstream ci.yml:139).
tpu-smoke:
	STAINX_TEST_TPU=1 $(PY) -m pytest -q -m "not slow" \
	  tests/test_kernels.py::TestFusedMacenko \
	  tests/test_kernels.py::TestFitKernels \
	  tests/test_kernels.py::TestStreamingMegaKernel \
	  tests/test_kernels.py::TestSelectionKernel \
	  tests/test_kernels.py::TestHistogramMXUKernel \
	  tests/test_reference_parity.py

bench:
	$(PY) bench.py

grid:
	$(PY) -m benchmarks.benchmark_grid --method macenko

# Regenerate docs/api/*.md from the live docstrings (sync-gated by
# tests/test_docs_api.py).
docs-api:
	$(PY) docs/gen_api.py

docs:
	$(PY) -m mkdocs build --strict

lint:
	$(PY) -m ruff check stainx_tpu tests benchmarks examples

fix:
	$(PY) -m ruff check --fix stainx_tpu tests benchmarks examples

clean:
	rm -rf build dist *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
