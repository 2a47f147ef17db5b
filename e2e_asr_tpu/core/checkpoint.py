"""Checkpoint save / restore / partial restore.

Replaces tf.train.Saver (train.py:202-203) with named-array .npz archives:
every pytree leaf is stored under its "/"-joined tree path, which doubles as
the canonical parameter naming for transfer learning. Partial restore is a
name-intersection merge that tolerates shape mismatches by skipping
(tf_utils.py:53-63 semantics, used for pretrain_lm_path / pretrain_phone_path).

Directory layout mirrors the reference: asr.ckpt-{step}.npz files plus a
"checkpoint" pointer to the latest (train.py:205-215), best model saved to a
separate best_model_dir keeping only the last two (train.py:203).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import numpy as np

SEP = "/"


def _key_name(k) -> str:
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return k.name
    if isinstance(k, jax.tree_util.FlattenedIndexKey):
        return str(k.key)
    return str(k)


def flatten_named(tree) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {SEP.join(_key_name(k) for k in path): np.asarray(leaf)
            for path, leaf in flat}


def unflatten_named(template, named: dict[str, np.ndarray]):
    """Rebuild a pytree shaped like `template` from named leaves (strict)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        name = SEP.join(_key_name(k) for k in path)
        if name not in named:
            raise KeyError(f"checkpoint missing leaf: {name}")
        arr = named[name]
        if arr.shape != np.asarray(leaf).shape:
            raise ValueError(
                f"shape mismatch for {name}: ckpt {arr.shape} vs "
                f"template {np.asarray(leaf).shape}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save(ckpt_dir: str, prefix: str, step: int, state, meta: dict | None = None,
         max_to_keep: int | None = None) -> str:
    """Save `state` (any pytree) as {prefix}-{step}.npz and update pointer."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{prefix}-{step}.npz")
    named = flatten_named(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **named)
    os.replace(tmp, path)
    with open(os.path.join(ckpt_dir, "checkpoint"), "w") as f:
        json.dump({"latest": os.path.basename(path), "step": step,
                   "meta": meta or {}}, f)
    if max_to_keep:
        _gc(ckpt_dir, prefix, max_to_keep)
    return path


def _gc(ckpt_dir: str, prefix: str, keep: int) -> None:
    pat = re.compile(re.escape(prefix) + r"-(\d+)\.npz$")
    found = []
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m:
            found.append((int(m.group(1)), name))
    for _, name in sorted(found)[:-keep]:
        os.remove(os.path.join(ckpt_dir, name))


def latest_path(ckpt_dir: str) -> tuple[str, dict] | None:
    pointer = os.path.join(ckpt_dir, "checkpoint")
    if not os.path.isfile(pointer):
        return None
    with open(pointer) as f:
        info = json.load(f)
    path = os.path.join(ckpt_dir, info["latest"])
    return (path, info.get("meta", {})) if os.path.isfile(path) else None


def restore(path: str, template):
    with np.load(path) as z:
        named = {k: z[k] for k in z.files}
    return unflatten_named(template, named)


def restore_averaged(ckpt_dir: str, template, n: int):
    """Restore the arithmetic mean of the last `n` checkpoints in ckpt_dir
    (tools/average_ckpts semantics: float params averaged, optimizer state
    and counters from the last). Returns (state, used_paths)."""
    import glob as _glob
    import re as _re

    from e2e_asr_tpu.tools.average_ckpts import average_files

    paths = []
    for p in _glob.glob(os.path.join(ckpt_dir, "asr.ckpt-*.npz")):
        m = _re.search(r"ckpt-(\d+)\.npz$", p)
        if m:
            paths.append((int(m.group(1)), p))
    paths = [p for _, p in sorted(paths)][-n:]
    if not paths:
        return None
    named = average_files(paths)
    return unflatten_named(template, named), paths


def restore_latest(ckpt_dir: str, template) -> tuple[Any, dict] | None:
    found = latest_path(ckpt_dir)
    if found is None:
        return None
    path, meta = found
    return restore(path, template), meta


def partial_restore(tree, ckpt_path: str, *, scope: str = "",
                    verbose: bool = True):
    """Merge name-matching leaves from a checkpoint into `tree`.

    Leaves whose names intersect are copied when shapes match; mismatches are
    skipped with a warning (tf_utils.py:53-63). `scope` restricts to names
    containing the substring (tf_utils.py:66-90's substring filter).
    Optimizer-state entries (paths under opt_state) are never merged into a
    params tree because their paths don't intersect.
    """
    with np.load(ckpt_path) as z:
        named = {k: z[k] for k in z.files}
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    n_used = 0
    for path, leaf in flat:
        name = SEP.join(_key_name(k) for k in path)
        # allow checkpoints of a full TrainState to initialize a bare params tree
        candidates = [name, "params" + SEP + name]
        src = next((named[c] for c in candidates
                    if c in named and (scope in c if scope else True)), None)
        if src is not None and src.shape == np.asarray(leaf).shape:
            leaves.append(src.astype(np.asarray(leaf).dtype))
            n_used += 1
        else:
            if src is not None and verbose:
                print(f"partial_restore: shape mismatch for {name}: "
                      f"{src.shape} vs {np.asarray(leaf).shape} — skipped")
            leaves.append(leaf)
    if verbose:
        print(f"partial_restore: merged {n_used}/{len(flat)} leaves "
              f"from {ckpt_path}")
    return jax.tree_util.tree_unflatten(treedef, leaves)
