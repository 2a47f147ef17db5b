"""Streaming transcription (eval/streaming.py).

Core property: the output is identical no matter how the audio is split
into pushes, and matches the one-shot long-form path on the same signal.
"""
import dataclasses

import jax
import numpy as np

from e2e_asr_tpu.config import BeamConfig
from e2e_asr_tpu.data.synth import make_vocab_dir
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval.streaming import StreamingTranscriber
from e2e_asr_tpu.models import seq2seq, ctc as ctc_lib
from tests.test_longform import tiny_cfg


def _vocab(tmp_path):
    make_vocab_dir(str(tmp_path / "v"))
    _, rev = text.initialize_vocabulary(str(tmp_path / "v" / "char.vocab"))
    return rev


def _wave(seconds=1.5, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    return (np.sin(2 * np.pi * 330 * t)
            + 0.3 * rng.normal(size=t.shape)).astype(np.float32)


def _stream_cfg(**kw):
    cfg = tiny_cfg()
    return dataclasses.replace(
        cfg, decoders={"char": dataclasses.replace(
            cfg.decoders["char"],
            vocab_size=37)}, **kw)   # synth vocab size


def test_push_granularity_invariance_attention(tmp_path):
    rev = _vocab(tmp_path)
    cfg = _stream_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    wave = _wave()
    kw = dict(window=16, margin=4, seg_enc_frames=6,
              beam_cfg=BeamConfig(beam_size=2), n_mels=cfg.feat_length)

    st1 = StreamingTranscriber(params, cfg, rev, **kw)
    out1 = st1.push(wave) + st1.finish()

    st2 = StreamingTranscriber(params, cfg, rev, **kw)
    rng = np.random.default_rng(3)
    pos, parts = 0, []
    while pos < len(wave):
        n = int(rng.integers(800, 7000))
        parts.append(st2.push(wave[pos:pos + n]))
        pos += n
    parts.append(st2.finish())
    out2 = "".join(parts)
    assert out1 == out2
    assert st1.transcript == st2.transcript


def test_push_granularity_invariance_ctc(tmp_path):
    rev = _vocab(tmp_path)
    cfg = _stream_cfg(model_family="ctc")
    params = ctc_lib.init(jax.random.PRNGKey(1), cfg, vocab_size=37)
    wave = _wave(seed=5)
    kw = dict(window=16, margin=4, n_mels=cfg.feat_length)

    st1 = StreamingTranscriber(params, cfg, rev, **kw)
    out1 = st1.push(wave) + st1.finish()

    st2 = StreamingTranscriber(params, cfg, rev, **kw)
    for block in np.array_split(wave, 11):
        st2.push(block)
    out2 = "".join([st2.finish()])
    assert st1.transcript == st2.transcript
    assert out1 == st1.transcript


def test_push_granularity_invariance_transducer(tmp_path):
    from e2e_asr_tpu.models import transducer as rnnt_lib

    rev = _vocab(tmp_path)
    cfg = _stream_cfg(model_family="transducer")
    params = rnnt_lib.init(jax.random.PRNGKey(4), cfg, vocab_size=37)
    wave = _wave(seed=9)
    kw = dict(window=16, margin=4, n_mels=cfg.feat_length)

    st1 = StreamingTranscriber(params, cfg, rev, **kw)
    out1 = st1.push(wave) + st1.finish()

    st2 = StreamingTranscriber(params, cfg, rev, **kw)
    for block in np.array_split(wave, 13):
        st2.push(block)
    st2.finish()
    assert st1.transcript == st2.transcript
    assert out1 == st1.transcript


def test_streaming_emits_incrementally(tmp_path):
    """With enough audio, some text must be finalized BEFORE finish()."""
    rev = _vocab(tmp_path)
    cfg = _stream_cfg(model_family="ctc")
    params = ctc_lib.init(jax.random.PRNGKey(2), cfg, vocab_size=37)
    st = StreamingTranscriber(params, cfg, rev, window=16, margin=4,
                              n_mels=cfg.feat_length)
    early = st.push(_wave(seconds=2.0, seed=7))
    late = st.finish()
    assert len(early) > 0                  # emitted before the flush
    assert st.transcript == early + late