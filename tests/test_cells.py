"""LSTM/GRU cell unit tests against independent NumPy oracles.

The LSTM semantics being pinned: single [x;h] matmul, gate order i,j,f,o,
forget bias +1.0 (reference basic_lstm.py:14-23).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.core import cells

pytestmark = pytest.mark.smoke


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_lstm_oracle(w, b, x, c, h):
    """Batched NumPy LSTM oracle (independent re-derivation of the pinned
    BasicLSTMCell math)."""
    gates = np.concatenate([x, h], axis=-1) @ w + b
    hid = h.shape[-1]
    i = gates[..., 0 * hid:1 * hid]
    j = gates[..., 1 * hid:2 * hid]
    f = gates[..., 2 * hid:3 * hid]
    o = gates[..., 3 * hid:4 * hid]
    new_c = c * np_sigmoid(f + 1.0) + np_sigmoid(i) * np.tanh(j)
    new_h = np_sigmoid(o) * np.tanh(new_c)
    return new_c, new_h


def test_lstm_step_matches_oracle(rng):
    in_dim, hid, batch = 5, 7, 3
    w = rng.normal(size=(in_dim + hid, 4 * hid)).astype(np.float32)
    b = rng.normal(size=(4 * hid,)).astype(np.float32)
    x = rng.normal(size=(batch, in_dim)).astype(np.float32)
    c0 = rng.normal(size=(batch, hid)).astype(np.float32)
    h0 = rng.normal(size=(batch, hid)).astype(np.float32)

    params = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    out, state = cells.lstm_step(params, jnp.asarray(x),
                                 cells.LSTMState(jnp.asarray(c0), jnp.asarray(h0)))
    ref_c, ref_h = np_lstm_oracle(w, b, x, c0, h0)
    np.testing.assert_allclose(np.asarray(state.c), ref_c, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.h), ref_h, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), ref_h, rtol=1e-5, atol=1e-5)


def test_lstm_precompute_equals_full_step(rng):
    """Split-kernel recurrent step == monolithic step."""
    in_dim, hid, batch, T = 4, 6, 2, 5
    key = jax.random.PRNGKey(0)
    params = cells.lstm_init(key, in_dim, hid)
    x_seq = jnp.asarray(rng.normal(size=(T, batch, in_dim)).astype(np.float32))
    x_proj = cells.lstm_precompute_inputs(params, x_seq, in_dim)

    state_a = state_b = cells.lstm_zero_state((batch,), hid)
    for t in range(T):
        out_a, state_a = cells.lstm_step(params, x_seq[t], state_a)
        out_b, state_b = cells.lstm_recurrent_step(params, x_proj[t], state_b, in_dim)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   rtol=1e-5, atol=1e-5)


def test_lstm_forget_bias_effect():
    """With large negative f-gate preactivation offset by the +1 bias, the
    forget gate at zero weights must be sigmoid(1.0), not sigmoid(0)."""
    in_dim, hid = 2, 3
    params = {"kernel": jnp.zeros((in_dim + hid, 4 * hid)),
              "bias": jnp.zeros((4 * hid,))}
    c0 = jnp.ones((1, hid))
    h0 = jnp.zeros((1, hid))
    _, state = cells.lstm_step(params, jnp.zeros((1, in_dim)),
                               cells.LSTMState(c0, h0))
    expected_c = 1.0 / (1.0 + np.exp(-1.0))  # c * sigmoid(0 + 1)
    np.testing.assert_allclose(np.asarray(state.c), expected_c, rtol=1e-6)


def np_gru_oracle(gate_w, gate_b, cand_w, cand_b, x, h):
    value = np_sigmoid(np.concatenate([x, h], -1) @ gate_w + gate_b)
    hid = h.shape[-1]
    r, u = value[..., :hid], value[..., hid:]
    c = np.tanh(np.concatenate([x, r * h], -1) @ cand_w + cand_b)
    return u * h + (1 - u) * c


def test_gru_step_matches_oracle(rng):
    in_dim, hid, batch = 4, 5, 3
    gw = rng.normal(size=(in_dim + hid, 2 * hid)).astype(np.float32)
    gb = rng.normal(size=(2 * hid,)).astype(np.float32)
    cw = rng.normal(size=(in_dim + hid, hid)).astype(np.float32)
    cb = rng.normal(size=(hid,)).astype(np.float32)
    x = rng.normal(size=(batch, in_dim)).astype(np.float32)
    h = rng.normal(size=(batch, hid)).astype(np.float32)
    params = {"gates": {"kernel": jnp.asarray(gw), "bias": jnp.asarray(gb)},
              "candidate": {"kernel": jnp.asarray(cw), "bias": jnp.asarray(cb)}}
    out, new_h = cells.gru_step(params, jnp.asarray(x), jnp.asarray(h))
    ref = np_gru_oracle(gw, gb, cw, cb, x, h)
    np.testing.assert_allclose(np.asarray(new_h), ref, rtol=1e-5, atol=1e-5)


def test_gru_init_gate_bias_is_one():
    params = cells.gru_init(jax.random.PRNGKey(0), 3, 4)
    np.testing.assert_allclose(np.asarray(params["gates"]["bias"]), 1.0)
    np.testing.assert_allclose(np.asarray(params["candidate"]["bias"]), 0.0)
