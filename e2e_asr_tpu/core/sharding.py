"""Sharding rules for the parameter tree over a ("data", "model") mesh.

Data parallelism shards the batch axis; the "model" axis (when > 1) shards
the vocabulary-sized projections — the decoder output softmax kernel/bias and
the embedding tables — which are the only leaves that grow with vocab size.
Everything else is replicated (the recurrent cells are latency-bound and far
too small to benefit from TP at reference scale). XLA inserts the all-gathers
/ reduce-scatters implied by these placements.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params`."""
    n_model = mesh.shape.get("model", 1)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def name_of(path):
        from e2e_asr_tpu.core.checkpoint import _key_name
        return "/".join(_key_name(k) for k in path)

    shardings = [NamedSharding(mesh, _spec_for(name_of(p),
                                               getattr(leaf, "shape", ()),
                                               n_model))
                 for p, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def state_shardings(state, mesh: Mesh):
    """Shardings for a full TrainState: params + optimizer slots follow the
    same rules (Adam moments have the same shapes as their params); scalar
    counters replicated."""
    def spec(path, leaf):
        from e2e_asr_tpu.core.checkpoint import _key_name
        name = "/".join(_key_name(k) for k in path)
        return NamedSharding(
            mesh, _spec_for(name, getattr(leaf, "shape", ()),
                            mesh.shape.get("model", 1)))

    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    return jax.tree_util.tree_unflatten(
        treedef, [spec(p, l) for p, l in flat])


def place_state(state, mesh: Mesh):
    """Place a TrainState on the mesh (multi-process safe: seeded state is
    identical on every process, so non-addressable shardings are filled
    from the local copy — core/mesh._place)."""
    from e2e_asr_tpu.core.mesh import _place
    sh = state_shardings(state, mesh)
    return jax.tree_util.tree_map(_place, state, sh)
