"""Device mesh construction and sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.2); parallelism is
a new first-class subsystem here. Strategy: SPMD via jax.sharding over a
("data", "model") mesh — the batch axis is sharded over "data" (pure DP rides
ICI all-reduce for gradients, inserted by XLA), and the "model" axis is
reserved for sharding wide projections (vocab softmax / embeddings) when the
model grows. Collectives are XLA's; nothing is hand-written.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data <= 0:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
