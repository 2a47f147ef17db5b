"""LoRA parameter-efficient fine-tuning (extension — no reference
counterpart; Hu et al. 2021, arXiv:2106.09685).

Targeted 2-D weight matrices W [in, out] get a frozen base plus a trainable
low-rank delta: W_eff = W + (alpha / r) * A @ B with A [in, r] (small random
init) and B [r, out] (zeros — so step 0 is exactly the pretrained model).
Fine-tuning from `-pretrain_enc_path` / `-ssl` / full checkpoints then
trains ~1-3% of the parameters, and the checkpoint diff that matters is
just the adapters.

Design (TPU/JAX-shaped):
- The adapters live INSIDE the params tree as a top-level "lora" subtree
  that sparsely MIRRORS the base tree's structure (list positions become
  str(index) dict keys): the leaf at params["encoder"]["fw_cells"][0]
  ["kernel"] has its adapter at params["lora"]["encoder"]["fw_cells"]["0"]
  ["kernel"] = {"a", "b"}. Everything downstream — named-npz checkpoints
  ("lora/encoder/fw_cells/0/kernel/a"), partial restore, EMA shadows,
  sharding specs (adapter leaves are small → replicated), Adam — works
  unchanged because they all operate on pytree paths.
- The effective weights are computed INSIDE the loss function
  (train/step.batch_loss), so gradients flow to A/B through the merge;
  the base kernels are frozen by the existing zero-gradient freeze
  machinery (train only "lora/" paths).
- Decode surfaces never see adapters: `merge` folds the deltas into the
  kernels right after checkpoint restore and strips the subtree, so beams,
  Pallas kernels, int8 quantization, and AOT export all run the plain tree
  at full speed.

Targets default to every 2-D leaf named "kernel" — LSTM/GRU cell kernels,
attention/projection/FFN denses — and never the adapters themselves;
`-lora_targets` narrows by path substring (e.g. "decoder_char").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SCOPE = "lora"


def _path_str(path) -> str:
    out = []
    for k in path:
        out.append(str(getattr(k, "key", getattr(k, "name",
                                                 getattr(k, "idx", k)))))
    return "/".join(out)


def _is_adapter(node) -> bool:
    return isinstance(node, dict) and set(node) == {"a", "b"}


def target_paths(params: dict, targets: tuple[str, ...] = ()) -> list[str]:
    """"/"-joined paths of the 2-D kernel leaves LoRA adapts."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, leaf in flat:
        name = _path_str(path)
        if name.startswith(SCOPE + "/"):
            continue
        if not name.endswith("/kernel") or getattr(leaf, "ndim", 0) != 2:
            continue
        if targets and not any(t in name for t in targets):
            continue
        out.append(name)
    return out


def attach(key, params: dict, rank: int,
           targets: tuple[str, ...] = ()) -> dict:
    """Return params + a "lora" mirror subtree of {a, b} adapters (b zeros,
    so the attached model computes exactly what the base model did)."""
    if rank < 1:
        raise ValueError(f"lora rank must be >= 1, got {rank}")
    if SCOPE in params:
        raise ValueError("params already carry a lora subtree")
    names = target_paths(params, targets)
    if not names:
        raise ValueError(
            f"no 2-D kernel leaves match -lora_targets {targets}")
    by_name = {_path_str(p): leaf
               for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    mirror: dict = {}
    for i, name in enumerate(names):
        w = by_name[name]
        a_key = jax.random.fold_in(key, i)
        node = mirror
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {
            "a": (jax.random.normal(a_key, (w.shape[0], rank), w.dtype)
                  / jnp.sqrt(jnp.asarray(w.shape[0], w.dtype))),
            "b": jnp.zeros((rank, w.shape[1]), w.dtype),
        }
    out = dict(params)
    out[SCOPE] = mirror
    return out


def _merge_node(base, mirror, scale):
    """Walk the sparse mirror, adding deltas to the matching base leaves.
    Base lists/tuples are indexed by the mirror's str(index) keys; a
    rebuilt tree that uses str-key dicts for list positions (e.g.
    tools/quantize_ckpt.py's generic loader) works identically."""
    if _is_adapter(mirror):
        delta = scale * (mirror["a"] @ mirror["b"])
        return base + delta.astype(base.dtype)
    if isinstance(base, dict):
        out = dict(base)
        for k, v in mirror.items():
            out[k] = _merge_node(base[k], v, scale)
        return out
    out_l = list(base)
    for k, v in mirror.items():
        out_l[int(k)] = _merge_node(base[int(k)], v, scale)
    return tuple(out_l) if isinstance(base, tuple) else out_l


def apply(params: dict, alpha: float) -> dict:
    """Effective tree for the forward/backward pass: kernels += delta, the
    "lora" subtree kept (so value_and_grad over the INPUT tree yields
    adapter gradients). Differentiable through the adapters."""
    if SCOPE not in params:
        return params
    mirror = params[SCOPE]
    rank = _first_adapter(mirror)["a"].shape[1]
    out = dict(params)
    merged = _merge_node({k: v for k, v in params.items() if k != SCOPE},
                         mirror, alpha / rank)
    out.update(merged)
    return out


def merge(params: dict, alpha: float) -> dict:
    """Decode-surface tree: deltas folded in, adapters stripped."""
    out = apply(params, alpha)
    out.pop(SCOPE, None)
    return out


def _first_adapter(mirror: dict) -> dict:
    node = mirror
    while not _is_adapter(node):
        node = next(iter(node.values()))
    return node


def maybe_merge(params: dict, alpha: float = 0.0) -> dict:
    """merge() if the tree carries adapters, identity otherwise. alpha=0
    means "the attached default" (alpha == rank → unit scale)."""
    if not isinstance(params, dict) or SCOPE not in params:
        return params
    if alpha == 0.0:
        alpha = _first_adapter(params[SCOPE])["a"].shape[1]
    return merge(params, alpha)


def resolve_alpha(rank: int, alpha: float) -> float:
    """-lora_alpha 0 (the default) = rank, i.e. unit delta scale."""
    return float(alpha) if alpha > 0 else float(rank)


def count_params(params: dict) -> tuple[int, int]:
    """(adapter_params, total_params) for logging."""
    import numpy as np
    total = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(params))
    ad = (sum(int(np.prod(l.shape))
              for l in jax.tree_util.tree_leaves(params[SCOPE]))
          if SCOPE in params else 0)
    return ad, total
