"""End-to-end tests: overfit a tiny synthetic corpus through the full stack
(data -> encoder -> decoder -> loss -> Adam -> greedy/beam decode -> WER) and
drive the Trainer loop against on-disk TFRecords (SURVEY.md §7 step 2)."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import (BeamConfig, DecoderConfig, EncoderConfig,
                                ExperimentConfig, LMConfig, Seq2SeqConfig,
                                TrainConfig)
from e2e_asr_tpu.data import text
from e2e_asr_tpu.data.speech import SpeechDataset
from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus
from e2e_asr_tpu.eval.beam_eval import BeamEvaluator
from e2e_asr_tpu.eval.greedy import GreedyEvaluator
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as step_lib


def small_model_cfg(char_vocab: int, feat: int = 8) -> Seq2SeqConfig:
    return Seq2SeqConfig(
        tasks=["char"],
        num_layers={"char": 2},
        max_output={"char": 16},
        encoder=EncoderConfig(hidden_size=16, out_prob=1.0),
        decoders={"char": DecoderConfig(
            hidden_size_dec=16, emb_size=12, vocab_size=char_vocab,
            attention_vec_size=8, lm_hidden_size=16, samp_prob=0.1,
            out_prob_dec=1.0, max_output=16)},
        feat_length=feat)


@pytest.fixture(scope="module")
def overfit_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("overfit")
    data_path = str(root / "train_1k.0.0001.tfrecord")
    vocab_dir = str(root / "vocab")
    sizes = make_vocab_dir(vocab_dir)
    write_speech_corpus(data_path, 10, feat_length=8, char_vocab=20,
                        min_tokens=3, max_tokens=6, frames_per_token=4,
                        noise=0.01)
    cfg = small_model_cfg(sizes["char"])
    ds = SpeechDataset([data_path], batch_size=10, feat_length=8,
                       is_training=False, tasks=("char",))
    _, rev_vocab = text.initialize_vocabulary(
        os.path.join(vocab_dir, "char.vocab"))

    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    lm_cfg = LMConfig(vocab_size=sizes["char"])
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg)
    asr_step = jax.jit(asr_step)
    batch = next(iter(ds.epoch()))
    dev_batch = {k: v for k, v in batch.items() if k != "utt_ids"}
    loss = None
    for i in range(800):
        state, metrics = asr_step(state, dev_batch, jax.random.PRNGKey(i))
        loss = float(metrics["loss"])
    return cfg, state, ds, rev_vocab, loss, str(root)


def test_overfit_loss_near_zero(overfit_setup):
    _, _, _, _, loss, _ = overfit_setup
    assert loss < 0.1, f"final loss {loss}"  # converges to ~0.02 by step 800


def test_overfit_greedy_wer_zero(overfit_setup):
    cfg, state, ds, rev_vocab, _, root = overfit_setup
    evaluator = GreedyEvaluator(cfg, rev_vocab, os.path.join(root, "out"))
    wer = evaluator(state.params, ds.epoch())
    assert wer < 0.05, wer
    # Artifact files written (eval_model.py:61-63).
    assert os.path.isfile(os.path.join(root, "out", "gold_asr.txt"))
    assert os.path.isfile(os.path.join(root, "out", "decoded_asr.txt"))


def test_overfit_beam_wer_zero(overfit_setup):
    cfg, state, ds, rev_vocab, _, root = overfit_setup
    beam_cfg = BeamConfig(beam_size=4, max_steps=16)
    evaluator = BeamEvaluator(cfg, beam_cfg, rev_vocab,
                              os.path.join(root, "out_beam"))
    wer = evaluator(state.params, ds.epoch())
    assert wer < 0.05, wer


def _experiment_cfg(root: str, sizes: dict) -> ExperimentConfig:
    model = small_model_cfg(sizes["char"])
    train = TrainConfig(
        data_dir=os.path.join(root, "data"),
        vocab_dir=os.path.join(root, "vocab"),
        train_dir=os.path.join(root, "run"),
        best_model_dir=os.path.join(root, "best"),
        buck_batch_size=[4, 4], num_buckets=2, batch_size=4,
        max_epochs=1, min_steps=10**9, steps_per_checkpoint=5,
        feat_length=8, compute_dtype="float32")
    lm = LMConfig(vocab_size=sizes["char"], lm_hidden_size=16, proj_size=16,
                  emb_size=12)
    return ExperimentConfig(model=model, train=train, lm=lm)


def test_trainer_loop_end_to_end(tmp_path):
    from e2e_asr_tpu.train.loop import Trainer

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "data"))
    sizes = make_vocab_dir(os.path.join(root, "vocab"))
    # Two buckets + dev set.
    write_speech_corpus(os.path.join(root, "data", "train_1k.0.0001"),
                        12, feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4)
    write_speech_corpus(os.path.join(root, "data", "train_1k.1.0001"),
                        8, feat_length=8, char_vocab=20, min_tokens=6,
                        max_tokens=8, frames_per_token=4, seed=1)
    write_speech_corpus(os.path.join(root, "data", "dev.0001"),
                        6, feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4, seed=2)
    cfg = _experiment_cfg(root, sizes)

    # Seed a high best score so the best-model save path triggers on the
    # first dev eval (an untrained model's WER can exceed the default 1.0).
    os.makedirs(os.path.join(root, "run"), exist_ok=True)
    with open(os.path.join(root, "run", "best.txt"), "w") as f:
        f.write("10.0")

    Trainer(cfg, use_mesh=False).train()

    # Checkpoints + metric logs exist.
    assert glob.glob(os.path.join(root, "run", "asr.ckpt-*.npz"))
    assert os.path.isfile(os.path.join(root, "run", "asr_err.txt"))
    assert os.path.isfile(os.path.join(root, "run", "best.txt"))
    assert glob.glob(os.path.join(root, "run", "summary", "events.out.tfevents.*"))
    assert glob.glob(os.path.join(root, "best", "asr.ckpt-*.npz"))

    # Resume: a second Trainer picks up from the checkpoint.
    cfg2 = _experiment_cfg(root, sizes)
    cfg2.train.max_epochs = 1
    t2 = Trainer(cfg2, use_mesh=False)
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.models import seq2seq as s2s
    params = s2s.init(jax.random.PRNGKey(10), cfg2.model)
    template = step_lib.create_state(params, cfg2.model, cfg2.lm)
    restored, _ = ckpt_lib.restore_latest(os.path.join(root, "run"), template)
    assert int(restored.global_step) > 0


def test_trainer_with_lm_interleave(tmp_path):
    from e2e_asr_tpu.data.synth import write_lm_corpus
    from e2e_asr_tpu.train.loop import Trainer

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "lm_data"))
    sizes = make_vocab_dir(os.path.join(root, "vocab"))
    write_speech_corpus(os.path.join(root, "data", "train_1k.0.0001"),
                        8, feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4)
    write_lm_corpus(os.path.join(root, "lm_data", "lm.0001"), 16,
                    char_vocab=20)
    cfg = _experiment_cfg(root, sizes)
    cfg.train.num_buckets = 1
    cfg.train.buck_batch_size = [4]
    cfg.train.lm_data_dir = os.path.join(root, "lm_data")
    cfg.train.lm_prob = 0.5
    # Only ~2 ASR batches/epoch here; checkpoint every 2 so one gets written.
    cfg.train.steps_per_checkpoint = 2
    Trainer(cfg, use_mesh=False).train()
    assert glob.glob(os.path.join(root, "run", "asr.ckpt-*.npz"))
