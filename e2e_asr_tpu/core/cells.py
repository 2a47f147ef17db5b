"""RNN cell primitives (LSTM / GRU) with reference-exact semantics.

LSTM matches tf BasicLSTMCell as pinned by the reference NumPy runtime
(/root/reference/basic_lstm.py:14-23): one matmul of concat([x, h]) with a
[in+h, 4h] kernel, gate split order **i, j, f, o**, and forget bias **+1.0**
added to f before the sigmoid (the bias variable itself stays zero-init).

GRU matches tf GRUCell (TF-1.x): sigmoid gates r,u from a [in+h, 2h] kernel
with bias initialized to 1.0, candidate tanh from concat([x, r*h]).

TPU design note: the kernel is stored as a single [in+h, 4h] array (checkpoint
layout identical to the reference so TF-checkpoint conversion is a plain copy)
but the hot path splits it into W_x=[in,4h] and W_h=[h,4h] so that the input
contribution x@W_x for ALL timesteps is computed as one large MXU matmul
*outside* the sequential scan; only h@W_h remains inside the scan. See rnn.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.core.layers import glorot_uniform

Array = jax.Array


class LSTMState(NamedTuple):
    c: Array
    h: Array


def lstm_init(key: Array, in_dim: int, hidden: int, *, init=glorot_uniform,
              dtype=jnp.float32) -> dict:
    return {
        "kernel": init(key, (in_dim + hidden, 4 * hidden), dtype=dtype),
        "bias": jnp.zeros((4 * hidden,), dtype=dtype),
    }


def lstm_zero_state(batch_shape, hidden: int, dtype=jnp.float32) -> LSTMState:
    shape = tuple(batch_shape) + (hidden,)
    return LSTMState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def lstm_step(params: dict, x: Array, state: LSTMState,
              *, compute_dtype=None) -> tuple[Array, LSTMState]:
    """One LSTM step: returns (output h, new state). x: [..., in_dim]."""
    hidden = state.h.shape[-1]
    w, b = params["kernel"], params["bias"]
    xh = jnp.concatenate([x, state.h], axis=-1)
    if compute_dtype is not None:
        xh, w = xh.astype(compute_dtype), w.astype(compute_dtype)
    gates = jnp.dot(xh, w, preferred_element_type=jnp.float32) + b
    return _lstm_apply_gates(gates, state.c, hidden)


def lstm_precompute_inputs(params: dict, x_seq: Array, in_dim: int,
                           *, compute_dtype=None, out_dtype=None) -> Array:
    """Input contribution x@W_x (+ bias) for all timesteps in one matmul.

    x_seq: [T, B, in_dim] -> [T, B, 4h]. The bias is folded in here so the
    recurrent step is a pure matmul-accumulate.

    out_dtype: storage dtype of the result. The ENCODER paths pass bf16
    under bf16 compute: x_proj is the largest HBM tensor of the recurrent
    stack ([T,B,4H] — 200 MB for flagship layer 0 f32) and the forward
    kernel is bandwidth-bound on it (measured 1.17x from halving it,
    VALIDATION round-4); gates still accumulate in f32 (bf16 + f32 dot
    promotes). Both the Pallas kernel and the XLA scan consume the SAME
    rounded array, so path parity is unaffected. The fused decoder-training
    kernels keep f32 (their x_proj is small and their exact-parity contract
    with the decoder scan predates this knob).
    """
    w_x = params["kernel"][:in_dim]
    b = params["bias"]
    if compute_dtype is not None:
        x_seq, w_x = x_seq.astype(compute_dtype), w_x.astype(compute_dtype)
    out = jnp.dot(x_seq, w_x, preferred_element_type=jnp.float32) + b
    return out if out_dtype is None else out.astype(out_dtype)


def lstm_recurrent_step(params: dict, x_proj: Array, state: LSTMState,
                        in_dim: int, *, compute_dtype=None) -> tuple[Array, LSTMState]:
    """One step given a precomputed input projection (x@W_x + b)."""
    hidden = state.h.shape[-1]
    w_h = params["kernel"][in_dim:]
    h = state.h
    if compute_dtype is not None:
        h, w_h = h.astype(compute_dtype), w_h.astype(compute_dtype)
    gates = x_proj + jnp.dot(h, w_h, preferred_element_type=jnp.float32)
    return _lstm_apply_gates(gates, state.c, hidden)


def _lstm_apply_gates(gates: Array, c: Array, hidden: int) -> tuple[Array, LSTMState]:
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    f_gate = jax.nn.sigmoid(f + 1.0)  # +1.0 forget bias (basic_lstm.py:19)
    new_c = c * f_gate + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_h, LSTMState(new_c, new_h)


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------

def gru_init(key: Array, in_dim: int, hidden: int, *, init=glorot_uniform,
             dtype=jnp.float32) -> dict:
    k_gate, k_cand = jax.random.split(key)
    return {
        "gates": {
            "kernel": init(k_gate, (in_dim + hidden, 2 * hidden), dtype=dtype),
            "bias": jnp.ones((2 * hidden,), dtype=dtype),  # TF GRUCell bias init 1.0
        },
        "candidate": {
            "kernel": init(k_cand, (in_dim + hidden, hidden), dtype=dtype),
            "bias": jnp.zeros((hidden,), dtype=dtype),
        },
    }


def gru_zero_state(batch_shape, hidden: int, dtype=jnp.float32) -> Array:
    return jnp.zeros(tuple(batch_shape) + (hidden,), dtype)


def gru_precompute_inputs(params: dict, x_seq: Array, in_dim: int,
                          *, compute_dtype=None,
                          out_dtype=None) -> tuple[Array, Array]:
    """GRU input contributions for all timesteps as two large MXU matmuls
    (the analogue of lstm_precompute_inputs): returns
    (gates_x [T,B,2H] = x@W_gx + b_g, cand_x [T,B,H] = x@W_cx + b_c).

    out_dtype: storage dtype of the results (bf16 under bf16 compute — the
    same bandwidth discipline as lstm_precompute_inputs out_dtype: the
    sequential kernel re-reads these arrays every step and is
    bandwidth-bound on them; gates still accumulate f32 in-kernel)."""
    gk = params["gates"]["kernel"][:in_dim]
    ck = params["candidate"]["kernel"][:in_dim]
    x = x_seq
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        gk, ck = gk.astype(compute_dtype), ck.astype(compute_dtype)
    gates_x = (jnp.dot(x, gk, preferred_element_type=jnp.float32)
               + params["gates"]["bias"])
    cand_x = (jnp.dot(x, ck, preferred_element_type=jnp.float32)
              + params["candidate"]["bias"])
    if out_dtype is not None:
        gates_x = gates_x.astype(out_dtype)
        cand_x = cand_x.astype(out_dtype)
    return gates_x, cand_x


def gru_step(params: dict, x: Array, h: Array,
             *, compute_dtype=None) -> tuple[Array, Array]:
    """One GRU step matching TF-1 GRUCell. Returns (output, new_h) (equal)."""
    xh = jnp.concatenate([x, h], axis=-1)
    gk, gb = params["gates"]["kernel"], params["gates"]["bias"]
    if compute_dtype is not None:
        xh, gk = xh.astype(compute_dtype), gk.astype(compute_dtype)
    value = jax.nn.sigmoid(jnp.dot(xh, gk, preferred_element_type=jnp.float32) + gb)
    r, u = jnp.split(value, 2, axis=-1)
    xrh = jnp.concatenate([x, r * h], axis=-1)
    ck, cb = params["candidate"]["kernel"], params["candidate"]["bias"]
    if compute_dtype is not None:
        xrh, ck = xrh.astype(compute_dtype), ck.astype(compute_dtype)
    c = jnp.tanh(jnp.dot(xrh, ck, preferred_element_type=jnp.float32) + cb)
    new_h = u * h + (1.0 - u) * c
    return new_h, new_h
