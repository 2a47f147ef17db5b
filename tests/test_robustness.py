"""Robustness: malformed record handling, empty datasets, GRU learning."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.data import native, tfrecord
from e2e_asr_tpu.data.speech import SpeechDataset, load_files
from e2e_asr_tpu.data.synth import write_speech_corpus


def test_truncated_tfrecord_python_reader_raises(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    tfrecord.write_records(path, iter([b"hello world" * 10]))
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[:-6])  # chop the trailing CRC + payload bytes
    try:
        list(tfrecord.read_records(path))
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_truncated_tfrecord_native_returns_none(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    write_speech_corpus(path, 3, feat_length=8)
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[:-10])
    assert native.load_speech_file(path, 8) is None
    # load_files falls back to the Python reader, which raises on corruption —
    # corrupt data must never be silently half-read.
    try:
        load_files([path], 8)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_crc_detects_corruption(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    tfrecord.write_records(path, iter([b"payload-bytes" * 20]))
    data = bytearray(open(path, "rb").read())
    data[20] ^= 0xFF  # flip a payload byte
    with open(path, "wb") as f:
        f.write(bytes(data))
    try:
        list(tfrecord.read_records(path, verify=True))
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_empty_dataset_yields_no_batches(tmp_path):
    path = str(tmp_path / "empty.tfrecord")
    tfrecord.write_records(path, iter([]))
    ds = SpeechDataset([path], batch_size=4, feat_length=8, is_training=True)
    assert len(ds) == 0
    assert list(ds.epoch()) == []


def test_gru_model_learns(rng):
    """A GRU encoder+decoder must actually optimize (not just assemble)."""
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib
    from tests.test_seq2seq import make_batch, tiny_cfg

    cfg = tiny_cfg()
    cfg.encoder.use_lstm = False
    for dec in cfg.decoders.values():
        dec.use_lstm = False
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    lm_cfg = LMConfig(vocab_size=11, lm_hidden_size=8, proj_size=8, emb_size=6)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg)
    asr_step = jax.jit(asr_step)
    batch = make_batch(rng, cfg)
    losses = []
    for i in range(150):
        state, m = asr_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
