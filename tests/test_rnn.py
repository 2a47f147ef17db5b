"""Tests for length-aware RNN scans: reversal, masking, bidirectionality."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.core import cells, rnn


def test_reverse_sequence():
    x = jnp.arange(5 * 2).reshape(5, 2, 1).astype(jnp.float32)  # [T=5, B=2, 1]
    lens = jnp.array([3, 5])
    out = np.asarray(rnn.reverse_sequence(x, lens))[:, :, 0]
    # Example 0 (len 3): first 3 reversed, tail kept.
    np.testing.assert_array_equal(out[:, 0], [4, 2, 0, 6, 8])
    # Example 1 (len 5): fully reversed.
    np.testing.assert_array_equal(out[:, 1], [9, 7, 5, 3, 1])


def test_reverse_sequence_is_involution(rng):
    x = jnp.asarray(rng.normal(size=(7, 3, 4)).astype(np.float32))
    lens = jnp.array([2, 7, 5])
    rt = rnn.reverse_sequence(rnn.reverse_sequence(x, lens), lens)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), rtol=1e-6)


def test_lstm_scan_masks_outputs_past_length(rng):
    T, B, F, H = 6, 2, 3, 4
    params = cells.lstm_init(jax.random.PRNGKey(1), F, H)
    x = jnp.asarray(rng.normal(size=(T, B, F)).astype(np.float32))
    lens = jnp.array([4, 6])
    out = np.asarray(rnn.lstm_scan(params, x, lens))
    assert np.all(out[4:, 0] == 0.0)
    assert np.all(out[:4, 0] != 0.0)
    assert np.all(out[:, 1] != 0.0)


def test_lstm_scan_padding_does_not_affect_prefix(rng):
    """Outputs within the true length must be identical whether or not the
    input carries trailing padding (cross-check of masking semantics)."""
    F, H = 3, 4
    params = cells.lstm_init(jax.random.PRNGKey(2), F, H)
    x_short = jnp.asarray(rng.normal(size=(4, 1, F)).astype(np.float32))
    x_padded = jnp.concatenate(
        [x_short, jnp.asarray(rng.normal(size=(3, 1, F)).astype(np.float32))], axis=0)
    out_short = rnn.lstm_scan(params, x_short, jnp.array([4]))
    out_padded = rnn.lstm_scan(params, x_padded, jnp.array([4]))
    np.testing.assert_allclose(np.asarray(out_padded[:4]), np.asarray(out_short),
                               rtol=1e-5, atol=1e-6)


def test_bidir_layer_backward_respects_lengths(rng):
    """The bw direction must see each example reversed within its own length:
    for an example of length L, bw output at t=0 equals running the fw cell on
    frames [L-1, ..., 0]."""
    T, F, H = 5, 3, 4
    key = jax.random.PRNGKey(3)
    params = rnn.rnn_layer_init(key, F, H, cell="lstm", bidirectional=True)
    x = jnp.asarray(rng.normal(size=(T, 2, F)).astype(np.float32))
    lens = jnp.array([3, 5])
    out = rnn.rnn_layer(params, x, lens, cell="lstm", bidirectional=True)
    assert out.shape == (T, 2, 2 * H)

    # Manual bw pass for example 0 (len 3): frames 2,1,0.
    state = cells.lstm_zero_state((1,), H)
    for t in [2, 1, 0]:
        bw_out, state = cells.lstm_step(params["bw"], x[t, 0:1], state)
    # bw half of output at t=0 for example 0:
    np.testing.assert_allclose(np.asarray(out[0, 0, H:]), np.asarray(bw_out[0]),
                               rtol=1e-5, atol=1e-6)
    # Padded region fully zero in both halves.
    assert np.all(np.asarray(out[3:, 0]) == 0.0)


def test_gru_layer_shapes(rng):
    T, B, F, H = 4, 2, 3, 5
    params = rnn.rnn_layer_init(jax.random.PRNGKey(4), F, H, cell="gru")
    x = jnp.asarray(rng.normal(size=(T, B, F)).astype(np.float32))
    out = rnn.rnn_layer(params, x, jnp.array([4, 2]), cell="gru")
    assert out.shape == (T, B, 2 * H)
    assert np.all(np.asarray(out[2:, 1]) == 0.0)
