"""Int8 weight-only quantization for inference/serving.

Extension (no reference counterpart — /root/reference serves float32 TF
checkpoints only): per-output-channel symmetric int8 quantization of every
matrix-shaped parameter, applied at eval/serving load time.

Design (TPU-first):
- Quantized weights live as int8 in HBM and cross host->device at 1/4 the
  float32 checkpoint size (the dominant cost of model load / first request
  in a serving process). Dequantization happens INSIDE the jitted decode
  (`maybe_dequantize` is the first op of each evaluator closure), so XLA
  sees int8 weights as the program inputs and fuses the int8->compute-dtype
  convert+scale into the consumers it can; weights that are loop-invariant
  across decode steps are materialized once per call in compute dtype.
- Per-OUTPUT-channel scales (last axis): each column of a [in, out] kernel
  gets its own scale, so a single outlier row cannot wreck the resolution
  of the whole matrix. Biases, gains, and other 1-D/scalar leaves stay in
  float32 — they are tiny and additive (quantization there is all risk, no
  size win).
- Symmetric (zero-point-free): q = round(w / s), s = max|w| / 127 per
  column. Dequant is a single multiply — no zero-point adds on the MXU path.

The quantized artifact (tools/quantize_ckpt.py) is a plain .npz with the
same "/"-joined leaf naming as regular checkpoints (core/checkpoint.py),
under `q/` (int8 payloads + passthrough float leaves) and `qscale/`
(float32 per-channel scales), plus `__quant__` metadata. `load_artifact`
rebuilds the QuantState against a params template.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

QMAX = 127.0


class QuantState(NamedTuple):
    """Pytree of quantized params: `q` mirrors the params tree (int8 where
    quantized, original leaf where passed through); `scale` mirrors it with
    per-channel float32 scales (shape [..1s.., C]) or () for passthrough."""
    q: Any
    scale: Any


def _quantizable(leaf) -> bool:
    arr = jnp.asarray(leaf)
    return arr.ndim >= 2 and jnp.issubdtype(arr.dtype, jnp.floating)


def quantize(params) -> QuantState:
    """Per-output-channel symmetric int8 quantization of every >=2-D float
    leaf; 1-D/scalar leaves pass through untouched."""
    def quant_leaf(w):
        if not _quantizable(w):
            return np.asarray(w), np.zeros((), np.float32)
        w = np.asarray(w, np.float32)
        amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
        scale = (amax / QMAX).astype(np.float32)
        safe = np.where(scale > 0, scale, 1.0)
        q = np.clip(np.rint(w / safe), -QMAX, QMAX).astype(np.int8)
        return q, scale

    pairs = jax.tree_util.tree_map(quant_leaf, params)
    q = jax.tree_util.tree_map(lambda p: p[0], pairs,
                               is_leaf=lambda x: isinstance(x, tuple))
    scale = jax.tree_util.tree_map(lambda p: p[1], pairs,
                                   is_leaf=lambda x: isinstance(x, tuple))
    return QuantState(q=q, scale=scale)


def dequantize(qs: QuantState, dtype=jnp.float32):
    """Jit-traceable: int8 * scale -> dtype; passthrough leaves cast only."""
    def deq(q, s):
        q = jnp.asarray(q)
        if q.dtype == jnp.int8:
            return (q.astype(jnp.float32) * s).astype(dtype)
        return q
    return jax.tree_util.tree_map(deq, qs.q, qs.scale)


def maybe_dequantize(params, dtype=jnp.float32):
    """Evaluator entry hook: QuantState -> float params, anything else
    passes through. The isinstance check is a trace-time (pytree-structure)
    decision, so the same jitted closure serves both kinds of params."""
    if isinstance(params, QuantState):
        return dequantize(params, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# Serving artifact (quantized checkpoint): .npz with q/ + qscale/ namespaces.

def save_artifact(path: str, params, meta: dict | None = None) -> QuantState:
    from e2e_asr_tpu.core import checkpoint as ckpt_lib

    qs = quantize(params)
    named = {f"q/{k}": v for k, v in ckpt_lib.flatten_named(qs.q).items()}
    named.update({f"qscale/{k}": v
                  for k, v in ckpt_lib.flatten_named(qs.scale).items()})
    import json
    named["__quant__"] = np.frombuffer(
        json.dumps({"format": "int8-perchannel-v1", **(meta or {})})
        .encode(), dtype=np.uint8)
    np.savez(path, **named)
    return qs


def load_artifact(path: str, params_template) -> QuantState:
    """Rebuild a QuantState from a quantized artifact, checking it against
    the model's params template (names must match; quantized leaves check
    shape against the template, passthrough leaves restore strictly)."""
    from e2e_asr_tpu.core import checkpoint as ckpt_lib

    arch = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    qs, scales = [], []
    for p, leaf in flat:
        name = ckpt_lib.SEP.join(ckpt_lib._key_name(k) for k in p)
        try:
            q = arch[f"q/{name}"]
            s = arch[f"qscale/{name}"]
        except KeyError as e:
            raise KeyError(f"quantized artifact missing leaf: {name}") from e
        want = np.asarray(leaf).shape
        if q.shape != want:
            raise ValueError(f"shape mismatch for {name}: artifact "
                             f"{q.shape} vs model {want}")
        qs.append(jnp.asarray(q))
        scales.append(jnp.asarray(s))
    return QuantState(q=jax.tree_util.tree_unflatten(treedef, qs),
                      scale=jax.tree_util.tree_unflatten(treedef, scales))
