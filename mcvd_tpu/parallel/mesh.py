"""Device mesh and shardings.

The reference's only parallelism is single-process torch DataParallel
(SURVEY.md §2.5); the TPU-native equivalent is a jax.sharding.Mesh over ICI
with the batch sharded on a 'data' axis and params replicated — pjit inserts
the gradient all-reduce.

For the big configs (128px, ngf>=192: cityscapes/ucf) a second 'tensor'
mesh axis shards the activations' H dimension (sequence/spatial
parallelism): convs get their halo exchanges, and norms/attention their
cross-shard reductions, from the GSPMD partitioner — no hand-written
collectives. Params stay replicated (27-360M params fit per chip; it is
activations at 128px that don't). Build with
make_mesh(axis_names=("data","tensor"), shape=(d, t)).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global_batch(mesh: Mesh, x, sharding: Optional[NamedSharding] = None):
    """Device-put a batch for a possibly multi-process mesh.

    Single-process: plain device_put (or pass-through numpy for jit's
    implicit async transfer when sharding is None). Multi-process: `x` is
    this process's LOCAL shard of the batch (the per-host DataLoader slice);
    assemble the global jax.Array whose 'data'-sharded axes are the
    concatenation of every process's local data. This is the host->device
    seam of the multi-host launch path (SURVEY §2.5)."""
    sharding = sharding if sharding is not None else data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def has_tensor_axis(mesh: Optional[Mesh]) -> bool:
    return (mesh is not None and "tensor" in mesh.axis_names
            and mesh.shape["tensor"] > 1)


def batch_sharding(mesh: Mesh, ndim: int, h_axis: Optional[int] = None) -> NamedSharding:
    """Sharding for an activation batch: axis 0 over 'data' and, when the
    mesh has a non-trivial 'tensor' axis, the H axis over 'tensor'
    (spatial parallelism). h_axis defaults to ndim-3 (..., H, W, C)."""
    spec = [None] * ndim
    spec[0] = "data"
    if has_tensor_axis(mesh):
        spec[ndim - 3 if h_axis is None else h_axis] = "tensor"
    return NamedSharding(mesh, P(*spec))
