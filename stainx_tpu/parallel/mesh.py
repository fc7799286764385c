"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    shape: tuple[int, ...] | None = None,
    axis_names: tuple[str, ...] = ("batch",),
    devices: list | None = None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all).

    With ``shape=None`` all devices go on the first axis. For WSI tile
    throughput the natural layout is a 1D ``("batch",)`` mesh (transforms are
    image-independent); a 2D ``("batch", "pixel")`` mesh additionally shards
    the image rows during statistics fits.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(images, mesh: Mesh, batch_axis: str = "batch"):
    """Place a NCHW batch with N sharded over ``batch_axis`` (replicated on
    any other mesh axes)."""
    spec = PartitionSpec(batch_axis)
    return jax.device_put(images, NamedSharding(mesh, spec))
