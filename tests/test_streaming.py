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

def _batched_vs_single(cfg, params, rev, waves, kw, push_plan):
    """Run N streams through one BatchedStreamingServer (interleaved pushes
    per `push_plan`) and each wave through a dedicated StreamingTranscriber;
    return (batched transcripts, single transcripts)."""
    from e2e_asr_tpu.eval.streaming import BatchedStreamingServer

    srv = BatchedStreamingServer(params, cfg, rev, max_streams=4, **kw)
    sids = [srv.open() for _ in waves]
    texts = {s: "" for s in sids}
    for round_pushes in push_plan:
        for j, chunk in round_pushes:
            srv.push(sids[j], chunk)
        for s, d in srv.step().items():
            texts[s] += d
    for j, sid in enumerate(sids):
        texts[sid] += srv.finish(sid)
    batched = [texts[sid] for sid in sids]

    single = []
    for j, wave in enumerate(waves):
        st = StreamingTranscriber(params, cfg, rev, **kw)
        out = st.push(wave) + st.finish()
        single.append(out)
    return batched, single


def _plan(waves, seed=0):
    """Interleave pushes of different sizes across streams."""
    rng = np.random.default_rng(seed)
    pos = [0] * len(waves)
    plan = []
    while any(p < len(w) for p, w in zip(pos, waves)):
        round_pushes = []
        for j, w in enumerate(waves):
            if pos[j] < len(w):
                n = int(rng.integers(1500, 9000))
                round_pushes.append((j, w[pos[j]:pos[j] + n]))
                pos[j] += n
        plan.append(round_pushes)
    return plan


def test_batched_server_matches_single_streams_attention(tmp_path):
    rev = _vocab(tmp_path)
    cfg = _stream_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    waves = [_wave(seconds=s, seed=i) for i, s in enumerate([1.2, 0.8, 1.6])]
    kw = dict(window=16, margin=4, seg_enc_frames=6,
              beam_cfg=BeamConfig(beam_size=2), n_mels=cfg.feat_length)
    batched, single = _batched_vs_single(cfg, params, rev, waves, kw,
                                         _plan(waves))
    assert batched == single


def test_batched_server_matches_single_streams_ctc(tmp_path):
    rev = _vocab(tmp_path)
    cfg = _stream_cfg(model_family="ctc")
    params = ctc_lib.init(jax.random.PRNGKey(1), cfg, vocab_size=37)
    waves = [_wave(seconds=s, seed=10 + i)
             for i, s in enumerate([1.0, 1.4])]
    kw = dict(window=16, margin=4, n_mels=cfg.feat_length)
    batched, single = _batched_vs_single(cfg, params, rev, waves, kw,
                                         _plan(waves, seed=2))
    assert batched == single


def test_batched_server_matches_single_streams_transducer(tmp_path):
    from e2e_asr_tpu.models import transducer
    from tests.test_transducer_beam import _cfg as rnnt_cfg

    rev = _vocab(tmp_path)
    cfg = rnnt_cfg(vocab=37)
    cfg = dataclasses.replace(cfg, feat_length=6)
    params = transducer.init(jax.random.PRNGKey(2), cfg, vocab_size=37)
    waves = [_wave(seconds=s, seed=20 + i)
             for i, s in enumerate([0.9, 1.3, 0.7])]
    kw = dict(window=16, margin=4, n_mels=cfg.feat_length)
    batched, single = _batched_vs_single(cfg, params, rev, waves, kw,
                                         _plan(waves, seed=3))
    assert batched == single


def test_batched_server_slot_lifecycle(tmp_path):
    from e2e_asr_tpu.eval.streaming import BatchedStreamingServer
    import pytest

    rev = _vocab(tmp_path)
    cfg = _stream_cfg(model_family="ctc")
    params = ctc_lib.init(jax.random.PRNGKey(1), cfg, vocab_size=37)
    srv = BatchedStreamingServer(params, cfg, rev, max_streams=2, window=16,
                                 margin=4, n_mels=cfg.feat_length)
    a, b = srv.open(), srv.open()
    with pytest.raises(RuntimeError):
        srv.open()
    srv.push(a, _wave(seconds=0.5))
    srv.finish(a)
    c = srv.open()               # slot recycled
    assert c == a
    with pytest.raises(KeyError):
        srv.push(a + 99, _wave(seconds=0.1))
    srv.finish(b)
    srv.finish(c)


def test_finish_preserves_other_sessions_deltas(tmp_path):
    """finish(A) decodes other sessions' ready work as a side effect; that
    text must reach them via their own next step()/finish() read (it used
    to be silently dropped)."""
    from e2e_asr_tpu.eval.streaming import BatchedStreamingServer

    rev = _vocab(tmp_path)
    cfg = _stream_cfg(model_family="ctc")
    params = ctc_lib.init(jax.random.PRNGKey(1), cfg, vocab_size=37)
    kw = dict(window=16, margin=4, n_mels=cfg.feat_length)
    wave_a = _wave(seconds=0.4, seed=30)
    wave_b = _wave(seconds=1.5, seed=31)

    srv = BatchedStreamingServer(params, cfg, rev, max_streams=2, **kw)
    a, b = srv.open(), srv.open()
    srv.push(a, wave_a)
    srv.push(b, wave_b)
    out_a = srv.finish(a)          # decodes B's ready chunks too
    out_b = srv.step()[b] + srv.finish(b)

    st = StreamingTranscriber(params, cfg, rev, **kw)
    want_b = st.push(wave_b) + st.finish()
    st2 = StreamingTranscriber(params, cfg, rev, **kw)
    want_a = st2.push(wave_a) + st2.finish()
    assert out_b == want_b
    assert out_a == want_a
