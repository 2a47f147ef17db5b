"""Smaller parity behaviors: encoder "state" (time-major) outputs and
training-subset file filtering."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import EncoderConfig
from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus
from e2e_asr_tpu.models import encoder


def test_encoder_state_task_collects_time_major(rng):
    """num_layers may carry a "state" entry whose depth's output is returned
    time-major (encoder.py:142-145, 160-161)."""
    cfg = EncoderConfig(hidden_size=6)
    params = encoder.init(jax.random.PRNGKey(0), cfg, 2, feat_dim=4)
    x = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    lens = jnp.array([8, 6])
    attn, time_major, _ = encoder.apply(params, cfg, x, lens,
                                        {"char": 2, "state": 1})
    assert 1 in time_major and 2 in attn
    # time-major [T, B, H] vs batch-major attention states.
    assert time_major[1].shape[0] == 8 and time_major[1].shape[1] == 2
    assert attn[2].shape[0] == 2


def test_subset_file_filters_training_files(tmp_path):
    """subset_file restricts training to listed basenames (train.py:114-115)."""
    from e2e_asr_tpu.config import (DecoderConfig, ExperimentConfig, LMConfig,
                                    Seq2SeqConfig, TrainConfig)
    from e2e_asr_tpu.train.loop import Trainer

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "data"))
    make_vocab_dir(os.path.join(root, "vocab"))
    for i in range(3):
        write_speech_corpus(os.path.join(root, "data", f"train_1k.0.{i:04d}"),
                            4, feat_length=8, char_vocab=20, seed=i)
    subset = os.path.join(root, "subset.txt")
    with open(subset, "w") as f:
        f.write("train_1k.0.0001\n")

    model = Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 1}, max_output={"char": 8},
        encoder=EncoderConfig(hidden_size=4),
        decoders={"char": DecoderConfig(hidden_size_dec=4, emb_size=4,
                                        vocab_size=37, lm_hidden_size=4,
                                        attention_vec_size=4, max_output=8)},
        feat_length=8)
    train = TrainConfig(data_dir=os.path.join(root, "data"),
                        vocab_dir=os.path.join(root, "vocab"),
                        train_dir=os.path.join(root, "run"),
                        best_model_dir=os.path.join(root, "best"),
                        buck_batch_size=[2], num_buckets=1,
                        subset_file=subset, feat_length=8)
    cfg = ExperimentConfig(model=model, train=train, lm=LMConfig(vocab_size=37))
    buckets, _ = Trainer(cfg, use_mesh=False).get_data_sets(logging=False)
    assert len(buckets) == 1
    assert len(buckets[0]) == 4  # only the single listed file's utterances
