"""Parameter initializers and dense-layer primitives.

Initialization policy mirrors the reference:
- encoder LSTM/GRU kernels: U(-0.075, 0.075)   (reference encoder.py:74)
- encoder outer scope default: U(-0.1, 0.1)    (reference encoder.py:136)
- decoder embedding: U(-1, 1)                  (reference decoder.py:99)
- all decoder / projection / attention kernels: glorot_uniform (TF-1 default
  for variables created without an explicit initializer), biases zero.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def uniform_init(key: Array, shape, scale: float, dtype=jnp.float32) -> Array:
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def glorot_uniform(key: Array, shape, dtype=jnp.float32) -> Array:
    """TF-1 glorot_uniform_initializer: limit = sqrt(6 / (fan_in + fan_out))."""
    if len(shape) == 2:
        fan_in, fan_out = shape
    elif len(shape) == 1:
        fan_in = fan_out = shape[0]
    else:  # conv-style [..., in, out]
        receptive = math.prod(shape[:-2])
        fan_in, fan_out = shape[-2] * receptive, shape[-1] * receptive
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def dense_params(key: Array, in_dim: int, out_dim: int, *, init=glorot_uniform,
                 dtype=jnp.float32) -> dict:
    return {
        "kernel": init(key, (in_dim, out_dim), dtype=dtype),
        "bias": jnp.zeros((out_dim,), dtype=dtype),
    }


def dense(params: dict, x: Array, *, compute_dtype=None) -> Array:
    """y = x @ kernel + bias. Equivalent of the reference's contrib `_linear`
    over a single (possibly pre-concatenated) input (attn_decoder.py:13)."""
    kernel, bias = params["kernel"], params["bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    return y + bias


def dropout(key: Array, x: Array, keep_prob: float) -> Array:
    """Inverted dropout matching tf.nn.dropout semantics (scale by 1/keep)."""
    if keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0).astype(x.dtype)
