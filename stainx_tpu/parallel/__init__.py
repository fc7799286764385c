"""Distributed (multi-chip) execution over a ``jax.sharding.Mesh``.

The reference has **no** distributed layer (SURVEY §2.3 — no
``torch.distributed``, no NCCL). The TPU-native equivalent of that missing
slot: XLA collectives over ICI/DCN inside ``shard_map`` —

- batch-parallel transforms (pure data parallelism: stain normalization is
  image-independent, so transform needs zero communication),
- **pixel-sharded transforms** for images too large for one chip
  (``pixel_axis=``): each chip holds a slab of rows; per-image Macenko
  statistics reduce with O(N·256) collectives
  (:func:`~stainx_tpu.parallel.distributed.macenko_transform_sharded`),
- **exact** cross-chip batch-mode fits: LAB moments (Reinhard) and 256-bin
  histograms (HM) are additive → one ``psum``; Macenko's OD moment matrices
  are additive too, and its percentiles use a multi-level global-histogram
  refinement (:mod:`stainx_tpu.parallel.percentile`) that preserves
  nearest-rank exactness with O(bins) communication.
"""

from stainx_tpu.parallel.mesh import make_mesh, shard_batch
from stainx_tpu.parallel.distributed import (
    hm_fit_sharded,
    hm_transform_sharded,
    macenko_fit_sharded,
    macenko_transform_sharded,
    reinhard_fit_sharded,
    reinhard_transform_sharded,
    fit_on_mesh,
    transform_on_mesh,
)
from stainx_tpu.parallel.percentile import distributed_masked_percentile

__all__ = [
    "make_mesh",
    "shard_batch",
    "distributed_masked_percentile",
    "reinhard_fit_sharded",
    "reinhard_transform_sharded",
    "hm_fit_sharded",
    "hm_transform_sharded",
    "macenko_fit_sharded",
    "macenko_transform_sharded",
    "fit_on_mesh",
    "transform_on_mesh",
]
