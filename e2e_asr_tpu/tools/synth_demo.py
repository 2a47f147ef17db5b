"""End-to-end on-chip validation demo: synthesize a corpus, train the full
driver to convergence, then sweep beam configurations on the best checkpoint.

Reproduces the round-1 validation run (TPU v5e-1: dev WER > 1.0 -> ~0.046 in
~7 minutes, 120 epochs, LM interleave active, beam grid search on the result).

Usage:
    python -m e2e_asr_tpu.tools.synth_demo [workdir] [--steps-per-ckpt N]
"""
from __future__ import annotations

import glob
import os
import sys


def build_corpus(root: str) -> int:
    from e2e_asr_tpu.data.synth import (make_vocab_dir, write_lm_corpus,
                                        write_speech_corpus)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    os.makedirs(os.path.join(root, "lm_data"), exist_ok=True)
    sizes = make_vocab_dir(os.path.join(root, "vocab"))
    for i in range(4):
        write_speech_corpus(os.path.join(root, "data", f"train_1k.0.{i:04d}"),
                            192, feat_length=80, char_vocab=30, min_tokens=4,
                            max_tokens=8, frames_per_token=8, seed=i)
    for i in range(2):
        write_speech_corpus(os.path.join(root, "data", f"train_1k.1.{i:04d}"),
                            96, feat_length=80, char_vocab=30, min_tokens=9,
                            max_tokens=14, frames_per_token=8, seed=100 + i)
    write_speech_corpus(os.path.join(root, "data", "dev.0000"), 128,
                        feat_length=80, char_vocab=30, min_tokens=4,
                        max_tokens=10, frames_per_token=8, seed=999)
    write_lm_corpus(os.path.join(root, "lm_data", "lm.0000"), 2000,
                    char_vocab=30, min_tokens=4, max_tokens=14)
    return sizes["char"]


def make_configs(root: str, vocab: int, steps_per_ckpt: int):
    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig,
                                    ExperimentConfig, LMConfig, Seq2SeqConfig,
                                    TrainConfig)
    model = Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 4}, max_output={"char": 32},
        encoder=EncoderConfig(hidden_size=256),
        decoders={"char": DecoderConfig(
            hidden_size_dec=256, emb_size=256, vocab_size=vocab,
            lm_hidden_size=256, attention_vec_size=128, max_output=32)},
        feat_length=80)
    train = TrainConfig(
        data_dir=os.path.join(root, "data"),
        lm_data_dir=os.path.join(root, "lm_data"),
        vocab_dir=os.path.join(root, "vocab"),
        train_dir=os.path.join(root, "run"),
        best_model_dir=os.path.join(root, "best"),
        buck_batch_size=[64, 32], num_buckets=2, batch_size=64,
        max_epochs=120, min_steps=10 ** 9, steps_per_checkpoint=steps_per_ckpt,
        lm_prob=0.1, feat_length=80)
    return ExperimentConfig(model=model, train=train,
                            lm=LMConfig(vocab_size=vocab))


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.data.speech import SpeechDataset
    from e2e_asr_tpu.models import rnn_lm, seq2seq
    from e2e_asr_tpu.tools.beam_grid import grid_search
    from e2e_asr_tpu.train import step as step_lib
    from e2e_asr_tpu.train.loop import Trainer

    argv = argv if argv is not None else sys.argv[1:]
    root = argv[0] if argv else "/tmp/e2e_asr_tpu_demo"
    steps_per_ckpt = 200

    vocab = build_corpus(root)
    cfg = make_configs(root, vocab, steps_per_ckpt)
    Trainer(cfg).train()

    params0 = seq2seq.init(jax.random.PRNGKey(10), cfg.model)
    template = step_lib.create_state(params0, cfg.model, cfg.lm)
    state, meta = ckpt_lib.restore_latest(cfg.train.best_model_dir, template)
    print("restored best checkpoint, meta:", meta)
    _, rev_vocab = text.initialize_vocabulary(
        os.path.join(root, "vocab", "char.vocab"))
    dev = SpeechDataset(sorted(glob.glob(os.path.join(root, "data", "dev*"))),
                        64, 80, is_training=False)
    best_cfg, best_err = grid_search(
        state.params, cfg.model, rev_vocab, lambda: dev.epoch(),
        os.path.join(root, "grid"), use_lm=True,
        lm_params=rnn_lm.shared_lm_params(state.params),
        compute_dtype=jnp.bfloat16,
        beam_sizes=(4, 8), cov_penalties=[0.05], lm_weights=[0, 0.05])
    print("grid-search best:", best_cfg, best_err)


if __name__ == "__main__":
    main()
