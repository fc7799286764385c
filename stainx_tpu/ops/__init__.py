"""Pure, jittable compute pipelines — the TPU-native replacement for both the
reference's ATen backend (``src/stainx/backends/torch_backend.py``) and its
compiled CUDA kernels (``csrc/*.cu``): one XLA-compiled path per algorithm.
"""
