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


# ---------------------------------------------------------------------------
# Multi-slice (DCN-aware) meshes
# ---------------------------------------------------------------------------

def slice_groups(devices) -> list[list]:
    """Group devices by slice (= DCN domain), slice-id order. Returns a single
    group when slice information is absent (CPU / single slice)."""
    groups: dict = {}
    for d in devices:
        groups.setdefault(getattr(d, "slice_index", None), []).append(d)
    if None in groups or len(groups) <= 1:
        return [list(devices)]
    return [groups[k] for k in sorted(groups)]


def hybrid_device_grid(devices, n_model: int = 1) -> np.ndarray:
    """Arrange devices on a (data, model) grid, slice-major on the data axis.

    The model axis never crosses a slice boundary (its collectives stay on
    ICI); consecutive data rows sit inside a slice, so the gradient
    all-reduce over "data" crosses DCN only between slice blocks — XLA lowers
    it hierarchically (reduce-scatter on ICI, all-reduce on DCN, all-gather
    on ICI). This is the dp-across-slices recipe; the reference has no
    distributed backend at all (SURVEY §2.2).
    """
    groups = slice_groups(devices)
    per = len(groups[0])
    if any(len(g) != per for g in groups):
        raise ValueError(
            f"uneven devices per slice: {[len(g) for g in groups]}")
    if n_model < 1 or per % n_model:
        raise ValueError(f"model axis {n_model} must divide the per-slice "
                         f"device count {per}")
    blocks = [np.array(g, dtype=object).reshape(per // n_model, n_model)
              for g in groups]
    return np.concatenate(blocks, axis=0)


def make_hybrid_mesh(n_data: int | None = None, n_model: int = 1,
                     devices=None) -> Mesh:
    """DCN-aware ("data", "model") mesh (see hybrid_device_grid). n_data
    truncates the data axis (must keep whole slices to span DCN)."""
    devices = list(devices if devices is not None else jax.devices())
    grid = hybrid_device_grid(devices, n_model)
    if n_data is not None and n_data > 0:
        grid = grid[:n_data]
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded.

    Single-controller: one device_put. Multi-process (real
    jax.distributed): each process holds only ITS batch rows (the data
    pipeline shards files by process, data/speech.py:load_files), so the
    local batch becomes this process's slice of a global batch of
    local_B * process_count rows — the standard per-host-batch contract
    (validated for real by tools/multihost_smoke.py)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, x), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def _place(x, sh: NamedSharding):
    """device_put that also works when `sh` spans other processes' devices
    (the value must then be identical on every process — true for seeded
    params/optimizer state and for already-global arrays)."""
    if jax.process_count() > 1 and not sh.is_fully_addressable:
        if isinstance(x, jax.Array) and x.sharding == sh:
            return x
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])
    return jax.device_put(x, sh)


def shard_decode_batch(batch: dict, mesh) -> dict:
    """Shard a decode batch's features over the mesh's "data" axis
    (evaluators' DP decoding). Replicated-safe fallback: batches whose
    rows don't divide the axis (padded tails) return unchanged and decode
    unsharded. No-op when mesh is None."""
    if mesh is None or batch["logmel"].shape[0] % mesh.shape["data"]:
        return batch
    sh = NamedSharding(mesh, P("data"))
    out = dict(batch)
    out["logmel"] = jax.device_put(batch["logmel"], sh)
    out["logmel_len"] = jax.device_put(batch["logmel_len"], sh)
    return out


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _place(x, sh), tree)
