"""Gradient freezing (-freeze) and speed perturbation (-speed_perturb)."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import LMConfig
from e2e_asr_tpu.frontend.specaugment import speed_perturb
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as step_lib
from tests.test_seq2seq import make_batch, tiny_cfg


def test_speed_perturb_identity_at_one(rng):
    feats = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    lens = jnp.array([10, 7])
    out, new_lens = speed_perturb(jax.random.PRNGKey(0), feats, lens,
                                  1.0, 1.0)
    np.testing.assert_array_equal(np.asarray(new_lens), np.asarray(lens))
    valid = np.arange(10)[None, :, None] < np.asarray(lens)[:, None, None]
    np.testing.assert_allclose(np.asarray(out) * valid,
                               np.asarray(feats) * valid, rtol=1e-6)
    # Beyond the (unchanged) lengths the output is zeroed.
    assert np.all(np.asarray(out)[1, 7:] == 0)


def test_speed_perturb_stretch_semantics():
    """A linear ramp stretched by exactly s=2 samples every other frame."""
    T = 12
    ramp = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32)[None, :, None],
                            (1, T, 3))
    lens = jnp.array([12])
    out, new_lens = speed_perturb(jax.random.PRNGKey(1), ramp, lens,
                                  2.0, 2.0)
    assert int(new_lens[0]) == 6
    np.testing.assert_allclose(np.asarray(out[0, :6, 0]),
                               np.arange(6) * 2.0, rtol=1e-6)
    assert np.all(np.asarray(out)[0, 6:] == 0)
    # Slowing down (s<1) dilates but the bucket width caps the length.
    out2, new_lens2 = speed_perturb(jax.random.PRNGKey(2), ramp, lens,
                                    0.5, 0.5)
    assert int(new_lens2[0]) == T          # 24 capped at the bucket width
    np.testing.assert_allclose(np.asarray(out2[0, :T, 0]),
                               np.arange(T) * 0.5, rtol=1e-6)


def _changed(a, b):
    return {"/".join(str(getattr(k, "key", k)) for k in path): bool(
        jnp.any(x != y))
        for (path, x), y in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_leaves(b))}


def test_freeze_encoder_leaves(rng):
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg)
    state = step_lib.create_state(params, cfg, LMConfig())
    asr_step, lm_step = step_lib.make_train_step(cfg, LMConfig(),
                                                 freeze=("encoder",))
    for i in range(2):
        state, _ = asr_step(state, batch, jax.random.PRNGKey(i))
    ch = _changed(params, state.params)
    assert not any(v for k, v in ch.items() if "encoder" in k)
    assert any(v for k, v in ch.items() if "decoder_char" in k)

    # The LM task respects the freeze list too.
    state2 = step_lib.create_state(params, cfg, LMConfig())
    _, lm_step2 = step_lib.make_train_step(cfg, LMConfig(),
                                           freeze=("decoder_char",))
    tok = jnp.asarray(rng.integers(3, 11, size=(2, 6)).astype(np.int32))
    tok = tok.at[:, 0].set(1)
    state2, _ = lm_step2(state2, tok.T, jnp.array([5, 4]),
                         jax.random.PRNGKey(0))
    ch2 = _changed(params, state2.params)
    assert not any(v for k, v in ch2.items() if "decoder_char" in k)


def test_speed_perturb_in_train_step(rng):
    """The augmented ASR step runs and produces finite loss/grads."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(1), cfg)
    batch = make_batch(rng, cfg)
    state = step_lib.create_state(params, cfg, LMConfig())
    asr_step, _ = step_lib.make_train_step(cfg, LMConfig(),
                                           speed_perturb=(0.9, 1.1))
    state, metrics = asr_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.global_step) == 1
