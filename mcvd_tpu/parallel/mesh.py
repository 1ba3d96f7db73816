"""Device mesh and shardings.

The reference's only parallelism is single-process torch DataParallel
(SURVEY.md §2.5); the TPU-native equivalent is a jax.sharding.Mesh over ICI
with the batch sharded on a 'data' axis and params replicated — pjit inserts
the gradient all-reduce. The mesh is built N-D-ready: extra axes ('tensor',
...) can be added for >1-chip models later without touching the train step.
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
