"""Device mesh + sharding layer.

The reference has no distribution at all (single GPU via CUDA_VISIBLE_DEVICES,
SURVEY.md §2.5). Here parallelism is a first-class subsystem built the TPU way:
one ``jax.sharding.Mesh`` with a ``data`` axis; batches are sharded on it,
parameters/optimizer state are replicated, and the jitted train step's
gradient reduction compiles to an XLA all-reduce that rides ICI. Multi-host
slices extend the same mesh over ``jax.distributed`` — no NCCL/MPI layer
exists or is needed.

The models here are 1.5-5 M parameters (BASELINE.md), so data parallelism is
the profitable axis; the design leaves room for extra axes (the Mesh helper
accepts an axis spec) without touching the engine.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(
    devices: Optional[Sequence] = None, axis_names: Sequence[str] = (DATA_AXIS,), shape: Optional[Sequence[int]] = None
) -> Mesh:
    """1-D data mesh by default; pass shape/axis_names for extra axes."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def multiple_of_devices(batch_size: int, mesh: Mesh, axis: str = DATA_AXIS) -> int:
    """Round batch size up to a multiple of the data-axis size."""
    n = mesh.shape[axis]
    return -(-batch_size // n) * n
