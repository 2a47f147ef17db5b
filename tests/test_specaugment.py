"""SpecAugment tests: mask structure, length awareness, train integration."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.frontend.specaugment import spec_augment


def test_masks_zero_bands(rng):
    feats = jnp.ones((2, 50, 80))
    lens = jnp.array([50, 30])
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), feats, lens,
                                  n_freq_masks=2, max_freq_width=10,
                                  n_time_masks=1, max_time_frac=0.2))
    assert out.shape == (2, 50, 80)
    # Something was masked, and only with zeros.
    assert (out == 0).any()
    assert set(np.unique(out)) <= {0.0, 1.0}
    # Full frequency rows zeroed only inside a time band: check a freq mask
    # exists (a column of zeros across all valid time).
    assert ((out[0] == 0).all(axis=0)).any() or ((out[0] == 0).all(axis=1)).any()


def test_time_masks_respect_lengths(rng):
    """Time masks land inside each example's true length."""
    feats = jnp.ones((4, 100, 8))
    lens = jnp.array([100, 20, 50, 10])
    out = np.asarray(spec_augment(jax.random.PRNGKey(3), feats, lens,
                                  n_freq_masks=0, max_freq_width=1,
                                  n_time_masks=2, max_time_frac=0.3))
    for b, L in enumerate([100, 20, 50, 10]):
        masked_t = np.where((out[b] == 0).all(axis=1))[0]
        if len(masked_t):
            assert masked_t.max() < L


def test_deterministic_per_key(rng):
    feats = jnp.asarray(rng.normal(size=(2, 40, 80)).astype(np.float32))
    lens = jnp.array([40, 30])
    a = spec_augment(jax.random.PRNGKey(7), feats, lens)
    b = spec_augment(jax.random.PRNGKey(7), feats, lens)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Some other key produces a different mask (checked over several keys so
    # the assertion is robust to the globally-configured PRNG impl).
    diff = any(not np.array_equal(
        np.asarray(a), np.asarray(spec_augment(jax.random.PRNGKey(k),
                                               feats, lens)))
               for k in range(8, 14))
    assert diff


def test_train_step_with_spec_augment(rng):
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib
    from tests.test_seq2seq import make_batch, tiny_cfg

    cfg = tiny_cfg()
    lm_cfg = LMConfig(vocab_size=11, lm_hidden_size=8, proj_size=8, emb_size=6)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg, spec_augment=True)
    asr_step = jax.jit(asr_step)
    batch = make_batch(rng, cfg)
    state, metrics = asr_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
