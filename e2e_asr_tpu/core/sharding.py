"""Sharding rules for the parameter tree over a ("data", "model") mesh.

Data parallelism shards the batch axis; the "model" axis (when > 1) shards
the vocabulary-sized projections — the decoder output softmax kernel/bias and
the embedding tables — which are the only leaves that grow with vocab size.
Everything else is replicated (the recurrent cells are latency-bound and far
too small to benefit from TP at reference scale). XLA inserts the all-gathers
/ reduce-scatters implied by these placements.

FSDP (`-fsdp`, ZeRO-3 style) additionally shards every large parameter leaf
AND its Adam moments / EMA shadow over the "data" axis: each leaf's largest
dimension that divides by the data-axis size (and isn't already claimed by
"model") carries "data". XLA's SPMD partitioner then all-gathers a leaf just
before use in the forward/backward and reduce-scatters its gradient, so peak
per-device parameter+optimizer memory drops ~n_data-fold while the math stays
data-parallel (equal up to collective float-reduction order, which Adam's
1/sqrt(v) amplifies on near-zero moments — the multi-step trajectory is
pinned in tests/test_fsdp.py).
Leaves smaller than FSDP_MIN_SIZE stay replicated —
gathering a tiny bias costs more latency than its replication costs memory.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FSDP_MIN_SIZE = 1024        # elements; below this a leaf stays replicated


def _spec_for(path_str: str, shape, n_model: int) -> P:
    """Sharding spec for one leaf. Vocab-sized dims shard over "model" only
    when divisible by the axis size (SWBD-style vocabs are arbitrary);
    otherwise the leaf stays replicated."""
    if n_model > 1 and len(shape) >= 1:
        # Vocab-sized output projections: the attention decoder's softmax
        # and the transducer joint's output layer.
        vocab_kernel = (path_str.endswith("output_proj/kernel")
                        or path_str.endswith("joint/out/kernel"))
        vocab_bias = (path_str.endswith("output_proj/bias")
                      or path_str.endswith("joint/out/bias"))
        if vocab_kernel and shape[-1] % n_model == 0:
            return P(None, "model")        # [H, V] sharded on vocab
        if vocab_bias and shape[-1] % n_model == 0:
            return P("model")              # [V]
        if path_str.endswith("embedding") and shape[0] % n_model == 0:
            return P("model", None)        # [V, emb] sharded on vocab
    return P(*([None] * len(shape)))


def _fsdp_overlay(spec: P, shape, n_data: int) -> P:
    """Overlay ZeRO-style "data"-axis sharding on a model-axis spec: shard
    the largest dimension that divides by n_data and isn't already carrying
    "model". Leaves with fewer than FSDP_MIN_SIZE elements (and leaves with
    no divisible free dimension — e.g. odd vocab rows) stay as they were."""
    size = 1
    for s in shape:
        size *= s
    if n_data <= 1 or size < FSDP_MIN_SIZE:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best = -1
    for i, (dim, e) in enumerate(zip(shape, entries)):
        if e is None and dim % n_data == 0 and (best < 0
                                                or dim > shape[best]):
            best = i
    if best < 0:
        return spec
    entries[best] = "data"
    return P(*entries)


def param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """Pytree of NamedShardings matching `params`."""
    n_model = mesh.shape.get("model", 1)
    n_data = mesh.shape.get("data", 1) if fsdp else 1
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def name_of(path):
        from e2e_asr_tpu.core.checkpoint import _key_name
        return "/".join(_key_name(k) for k in path)

    def spec(p, leaf):
        shape = getattr(leaf, "shape", ())
        return _fsdp_overlay(_spec_for(name_of(p), shape, n_model),
                             shape, n_data)

    shardings = [NamedSharding(mesh, spec(p, leaf)) for p, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def state_shardings(state, mesh: Mesh, fsdp: bool = False):
    """Shardings for a full TrainState: params + optimizer slots follow the
    same rules (Adam moments have the same shapes as their params, so the
    FSDP overlay shards them identically); scalar counters replicated."""
    n_data = mesh.shape.get("data", 1) if fsdp else 1

    def spec(path, leaf):
        from e2e_asr_tpu.core.checkpoint import _key_name
        name = "/".join(_key_name(k) for k in path)
        shape = getattr(leaf, "shape", ())
        return NamedSharding(
            mesh, _fsdp_overlay(
                _spec_for(name, shape, mesh.shape.get("model", 1)),
                shape, n_data))

    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    return jax.tree_util.tree_unflatten(
        treedef, [spec(p, l) for p, l in flat])


def place_state(state, mesh: Mesh, fsdp: bool = False):
    """Place a TrainState on the mesh (multi-process safe: seeded state is
    identical on every process, so non-addressable shardings are filled
    from the local copy — core/mesh._place)."""
    from e2e_asr_tpu.core.mesh import _place
    sh = state_shardings(state, mesh, fsdp=fsdp)
    return jax.tree_util.tree_map(_place, state, sh)
