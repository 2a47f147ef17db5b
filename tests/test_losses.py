"""Loss tests: shifted targets + reference-exact length normalization."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.core import losses

pytestmark = pytest.mark.smoke


def test_shifted_targets():
    dec_inputs = jnp.array([[1, 1], [5, 6], [7, 2], [2, 0]])  # [T=4, B=2]
    seq_len = jnp.array([3, 2])
    targets, mask = losses.shifted_targets(dec_inputs, seq_len)
    np.testing.assert_array_equal(np.asarray(targets),
                                  [[5, 6], [7, 2], [2, 0]])
    np.testing.assert_array_equal(np.asarray(mask),
                                  [[1, 1], [1, 1], [1, 0]])


def test_cross_entropy_matches_manual(rng):
    T, B, V = 4, 3, 6
    logits = rng.normal(size=(T, B, V)).astype(np.float32)
    targets = rng.integers(0, V, size=(T, B))
    seq_len = np.array([4, 2, 3])

    loss = losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets),
                                     jnp.asarray(seq_len))

    # Manual: per-example sum of masked NLL / len, then batch mean.
    shifted = logits - logits.max(axis=-1, keepdims=True)
    logp = shifted - np.log(np.exp(shifted).sum(axis=-1, keepdims=True))
    nll = -np.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    expected = 0.0
    for b in range(B):
        expected += nll[: seq_len[b], b].sum() / seq_len[b]
    expected /= B
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_cross_entropy_ignores_padding():
    """Changing logits in the padded region must not change the loss."""
    T, B, V = 5, 2, 4
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (T, B, V))
    targets = jnp.zeros((T, B), dtype=jnp.int32)
    seq_len = jnp.array([3, 5])
    base = losses.cross_entropy_loss(logits, targets, seq_len)
    perturbed = logits.at[3:, 0].add(100.0)
    after = losses.cross_entropy_loss(perturbed, targets, seq_len)
    np.testing.assert_allclose(float(base), float(after), rtol=1e-6)
