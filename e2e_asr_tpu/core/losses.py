"""Sequence losses.

Masked sparse-softmax cross entropy with the reference's exact normalization
(/root/reference/losses.py:30-35): per-example sum over time divided by that
example's target length, then the mean over the batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def shifted_targets(dec_inputs: Array, seq_len: Array) -> tuple[Array, Array]:
    """Targets = decoder inputs shifted by one step (tf_utils.py:4-12).

    dec_inputs: [T, B] time-major token ids starting with <go>.
    Returns (targets [T-1, B], mask [T-1, B]) where mask[t, b] = t < seq_len[b].
    """
    targets = dec_inputs[1:]
    T = targets.shape[0]
    t = jnp.arange(T)[:, None]
    mask = (t < seq_len.astype(jnp.int32)[None, :]).astype(jnp.float32)
    return targets, mask


def cross_entropy_loss(logits: Array, targets: Array, seq_len: Array,
                       label_smoothing: float = 0.0,
                       weights: Array | None = None) -> Array:
    """Length-normalized masked CE.

    logits: [T, B, V] time-major; targets: [T, B]; seq_len: [B].
    Per-example: sum_t mask*CE / seq_len; returns batch mean.

    label_smoothing e (extension; 0.0 = reference behavior): the target
    distribution becomes (1-e)*onehot + e/V uniform.

    weights: optional [B] per-example validity (padded tail-batch rows get 0);
    when given, the batch mean runs over valid rows only. weights=1 everywhere
    is exactly the unweighted mean.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        V = logits.shape[-1]
        uniform_nll = -jnp.mean(log_probs, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * uniform_nll
    T = targets.shape[0]
    t = jnp.arange(T)[:, None]
    mask = (t < seq_len.astype(jnp.int32)[None, :]).astype(logits.dtype)
    per_example = jnp.sum(nll * mask, axis=0) / jnp.maximum(
        seq_len.astype(logits.dtype), 1.0)
    if weights is not None:
        w = weights.astype(per_example.dtype)
        return jnp.sum(per_example * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(per_example)
