"""Extension features: label smoothing, checkpoint averaging."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.core import losses
from e2e_asr_tpu.tools.average_ckpts import average_files


def test_label_smoothing_zero_is_reference(rng):
    T, B, V = 4, 2, 6
    logits = jnp.asarray(rng.normal(size=(T, B, V)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, V, size=(T, B)))
    seq_len = jnp.array([4, 3])
    a = losses.cross_entropy_loss(logits, targets, seq_len)
    b = losses.cross_entropy_loss(logits, targets, seq_len,
                                  label_smoothing=0.0)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-7)


def test_label_smoothing_matches_manual(rng):
    T, B, V = 3, 2, 5
    logits = jnp.asarray(rng.normal(size=(T, B, V)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, V, size=(T, B)))
    seq_len = jnp.array([3, 3])
    e = 0.1
    got = losses.cross_entropy_loss(logits, targets, seq_len,
                                    label_smoothing=e)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    tgt = np.asarray(targets)
    total = 0.0
    for b in range(B):
        s = 0.0
        for t in range(3):
            onehot_nll = -logp[t, b, tgt[t, b]]
            unif_nll = -logp[t, b].mean()
            s += (1 - e) * onehot_nll + e * unif_nll
        total += s / 3
    np.testing.assert_allclose(float(got), total / B, rtol=1e-5)


def test_checkpoint_averaging(tmp_path):
    a = {"params/w": np.ones((2, 2), np.float32),
         "params/b": np.zeros((2,), np.float32),
         "global_step": np.asarray(100)}
    b = {"params/w": 3 * np.ones((2, 2), np.float32),
         "params/b": 2 * np.ones((2,), np.float32),
         "global_step": np.asarray(200)}
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    np.savez(pa, **a)
    np.savez(pb, **b)
    avg = average_files([pa, pb])
    np.testing.assert_allclose(avg["params/w"], 2.0)
    np.testing.assert_allclose(avg["params/b"], 1.0)
    assert int(avg["global_step"]) == 200  # counters from the last ckpt