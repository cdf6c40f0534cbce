"""Device mesh construction helpers.

The reference is strictly single-process (SURVEY §2.3); parallelism here is
new TPU-first design: a 2-D ``(data, model)`` mesh where the frame/chip
batch axis shards over ``data`` (the workload's natural parallelism — shots
and frames are independent) and wide channel dimensions may shard over
``model``.  Collectives are XLA-inserted from sharding annotations and ride
ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, str] = ("data", "model"),
              model_parallelism: int = 1) -> Mesh:
    """Build a (data × model) mesh over the available devices.

    model_parallelism divides the device count; the remainder is data
    parallelism.  With one device this degenerates gracefully to a 1×1 mesh
    (all shardings become no-ops), so the same jitted step runs anywhere.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallelism != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallelism={model_parallelism}"
        )
    grid = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """Shard dimension `axis` of an ndim-array over the model axis."""
    spec = [None] * ndim
    spec[axis] = "model"
    return NamedSharding(mesh, P(*spec))
