"""Device mesh and sharding helpers.

The reference has no distributed layer at all (single CUDA device,
`src/utils/configurator.py:114-118`; no torch.distributed anywhere). This
module is the green-field TPU-native replacement: a ``jax.sharding.Mesh``
over ICI with a ``data`` axis (users/interactions) and an optional ``model``
axis (embedding-table rows / item catalog), with XLA collectives inserted by
``jit`` from sharding annotations.

Conventions:
- train batches and eval user-chunks are sharded over ``data``;
- parameters are replicated by default; large embedding tables may be
  sharded over ``model`` by models that opt in;
- the interaction/adjacency index arrays are replicated (they are small
  relative to HBM and random-gathered).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(config=None, devices=None) -> Mesh:
    """Build the device mesh from ``config['mesh_shape']``.

    ``mesh_shape`` is a mapping like ``{data: 4, model: 2}``; ``null`` puts
    every visible device on the data axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = config["mesh_shape"] if config is not None else None
    if shape:
        d = int(shape.get(DATA_AXIS, 1))
        m = int(shape.get(MODEL_AXIS, 1))
        if d * m != n:
            raise ValueError(f"mesh_shape {shape} does not match {n} devices")
    else:
        d, m = n, 1
    dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard leading axis over the data axis."""
    spec = P(DATA_AXIS, *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree(tree, sharding):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
