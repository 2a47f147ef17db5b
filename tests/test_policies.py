"""Training-policy tests: LR halving on dev plateau and early stopping
(train.py:334-349 parity), exercised through Trainer._checkpoint_cadence with
a scripted evaluator."""
import os

import jax
import numpy as np
import pytest

from e2e_asr_tpu.config import ExperimentConfig, LMConfig
from e2e_asr_tpu.core.summary import SummaryWriter
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as step_lib
from e2e_asr_tpu.train.loop import Trainer, check_progress

from tests.test_seq2seq import tiny_cfg


class ScriptedEvaluator:
    """Stands in for GreedyEvaluator: returns a scripted error sequence."""

    def __init__(self, errs):
        self.errs = list(errs)

    def __call__(self, params, batches, **kw):
        return self.errs.pop(0)


class _FakeDevSet:
    def epoch(self):
        return iter(())


def _trainer(tmp_path, min_steps=0):
    cfg = ExperimentConfig(model=tiny_cfg(),
                           lm=LMConfig(vocab_size=11, lm_hidden_size=8,
                                       proj_size=8, emb_size=6))
    cfg.train.train_dir = os.path.join(str(tmp_path), "run")
    cfg.train.best_model_dir = os.path.join(str(tmp_path), "best")
    cfg.train.min_steps = min_steps
    cfg.train.compute_dtype = "float32"
    os.makedirs(cfg.train.train_dir, exist_ok=True)
    os.makedirs(cfg.train.best_model_dir, exist_ok=True)
    t = Trainer(cfg, use_mesh=False)
    t._frames_acc = 0
    params = seq2seq.init(jax.random.PRNGKey(0), cfg.model)
    state = step_lib.create_state(params, cfg.model, cfg.lm)
    writer = SummaryWriter(os.path.join(cfg.train.train_dir, "summary"))
    return t, state, writer, cfg


def test_lr_halves_when_dev_error_plateaus(tmp_path):
    t, state, writer, cfg = _trainer(tmp_path, min_steps=0)
    # History of 4 checkpoints; the new error (0.50) >= max of the last 3
    # (0.45) -> decay (train.py:334-343).
    previous = [0.6, 0.45, 0.42, 0.40]
    evaluator = ScriptedEvaluator([0.50])
    import time
    state2, best, stop = t._checkpoint_cadence(
        state, writer, evaluator, _FakeDevSet(), 0.0, previous, 1.0,
        time.time())
    assert abs(step_lib.get_lr(state2) - 5e-4) < 1e-9
    assert not stop
    assert previous[-1] == 0.50  # appended to history


def test_lr_does_not_decay_before_min_steps(tmp_path):
    t, state, writer, cfg = _trainer(tmp_path, min_steps=10**9)
    previous = [0.6, 0.45, 0.42, 0.40]
    state2, _, stop = t._checkpoint_cadence(
        state, writer, ScriptedEvaluator([0.50]), _FakeDevSet(), 0.0,
        previous, 1.0, __import__("time").time())
    assert abs(step_lib.get_lr(state2) - 1e-3) < 1e-9
    assert not stop


def test_early_stop_at_floor_lr_without_improvement(tmp_path):
    t, state, writer, cfg = _trainer(tmp_path, min_steps=0)
    state = step_lib.set_lr(state, cfg.train.lr_floor)  # at the floor
    # Best (0.10) is older than the 10-checkpoint window -> stop
    # (train.py:153-158, 346-349).
    previous = [0.10] + [0.30 + i * 0.001 for i in range(10)]
    state2, _, stop = t._checkpoint_cadence(
        state, writer, ScriptedEvaluator([0.35]), _FakeDevSet(), 0.0,
        previous, 0.10, __import__("time").time())
    assert stop


def test_best_model_saved_on_improvement(tmp_path):
    t, state, writer, cfg = _trainer(tmp_path, min_steps=10**9)
    state2, best, stop = t._checkpoint_cadence(
        state, writer, ScriptedEvaluator([0.25]), _FakeDevSet(), 0.0,
        [0.9, 0.5], 0.30, __import__("time").time())
    assert best == 0.25
    assert os.path.isfile(os.path.join(cfg.train.train_dir, "best.txt"))
    import glob
    assert glob.glob(os.path.join(cfg.train.best_model_dir, "asr.ckpt-*.npz"))


def test_check_progress_window():
    assert check_progress([0.5] * 5)
    # Best inside the last-10 window -> keep going.
    assert check_progress([0.9, 0.6, 0.55, 0.5] + [0.52] * 8)
    # Best strictly older than the last 10 -> stop.
    assert not check_progress([0.10] + [0.5 + i * 0.001 for i in range(11)])


def test_training_is_deterministic_with_fixed_seed(tmp_path, rng):
    """Two runs from the same seed produce bit-identical parameters (the
    reference's seeded-run contract, train.py:167-174; `chaos` opts out)."""
    from e2e_asr_tpu.models import seq2seq as s2s
    from tests.test_seq2seq import make_batch

    cfg = tiny_cfg()
    lm_cfg = LMConfig(vocab_size=11, lm_hidden_size=8, proj_size=8, emb_size=6)

    def run():
        params = s2s.init(jax.random.PRNGKey(10), cfg)
        state = step_lib.create_state(params, cfg, lm_cfg)
        asr, _ = step_lib.make_train_step(cfg, lm_cfg)
        asr = jax.jit(asr)
        batch = make_batch(np.random.default_rng(0), cfg)
        key = jax.random.PRNGKey(10)
        for i in range(5):
            key, sub = jax.random.split(key)
            state, _ = asr(state, batch, sub)
        return state.params

    a, b = run(), run()
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_nonfinite_cadence_recovers_from_checkpoint(tmp_path):
    """-nan_recover: a non-finite cadence loss restores the latest
    checkpoint with a decayed LR instead of checkpointing/decoding the
    diverged state; the budget exhausts into a stop; with no checkpoint on
    disk the run stops immediately (train/loop.py _recover_nonfinite)."""
    from e2e_asr_tpu.core import checkpoint as ckpt_lib

    t, state, writer, cfg = _trainer(tmp_path)
    cfg.train.nan_recover = 2
    t._recoveries = 0

    # No checkpoint on disk yet -> stop (never train on NaN).
    s, best, stop = t._checkpoint_cadence(
        state, writer, ScriptedEvaluator([]), _FakeDevSet(), float("nan"),
        [], 1.0, 0.0)
    assert stop

    # Save a known-good checkpoint at step 7, then diverge.
    lr0 = step_lib.get_lr(state)
    good = state._replace(global_step=state.global_step + 7)
    ckpt_lib.save(cfg.train.train_dir, "asr.ckpt", 7, good, meta={})
    t._recoveries = 0
    t._frames_acc = 99
    s, best, stop = t._checkpoint_cadence(
        state, writer, ScriptedEvaluator([]), _FakeDevSet(), float("inf"),
        [], 1.0, 0.0)
    assert not stop
    assert int(s.global_step) == 7            # restored
    assert t._frames_acc == 0
    decay = cfg.model.learning_rate_decay_factor
    np.testing.assert_allclose(step_lib.get_lr(s), lr0 * decay, rtol=1e-6)
    # No new checkpoint was written for the diverged state.
    assert ckpt_lib.latest_path(cfg.train.train_dir)[0].endswith(
        "asr.ckpt-7.npz")

    # Second recovery halves again; third exceeds the budget -> stop.
    s, _, stop = t._checkpoint_cadence(
        s, writer, ScriptedEvaluator([]), _FakeDevSet(), float("nan"),
        [], 1.0, 0.0)
    assert not stop
    np.testing.assert_allclose(step_lib.get_lr(s), lr0 * decay * decay,
                               rtol=1e-6)
    s, _, stop = t._checkpoint_cadence(
        s, writer, ScriptedEvaluator([]), _FakeDevSet(), float("nan"),
        [], 1.0, 0.0)
    assert stop
