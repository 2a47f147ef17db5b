"""Long-form WAV transcription tool (tools/transcribe.py) end-to-end on CPU:
WAV -> log-mel -> chunked encoder -> beam decode -> detokenized transcript.
"""
import os

import numpy as np

from e2e_asr_tpu.data.audio import write_wav
from e2e_asr_tpu.data.synth import make_vocab_dir
from e2e_asr_tpu.tools import transcribe


def test_transcribe_wav_end_to_end(tmp_path):
    vocab_dir = str(tmp_path / "vocab")
    make_vocab_dir(vocab_dir)
    sr = 16000
    t = np.arange(int(1.6 * sr)) / sr          # 1.6 s -> ~157 frames, 2 chunks
    wave = (np.sin(2 * np.pi * 440 * t) * 8000).astype(np.int16)
    wav_path = str(tmp_path / "a.wav")
    write_wav(wav_path, wave, sr)

    out = transcribe.main([
        wav_path,
        "-vocab_dir", vocab_dir,
        "-tb_dir", str(tmp_path / "models"),
        "-window", "80", "-margin", "16",
        "-beam_size", "2",
        "-nlc", "2", "-hsize", "8", "-hsize_dec", "8",
        "-emb_size", "8", "-attn_vec_size", "8", "-lm_hsize", "8",
        "-feat_len", "20",
    ])
    # Fresh init (no checkpoint): transcript content is arbitrary, but the
    # whole path (frontend, chunking, stitching, beam, detok) must run.
    assert len(out) == 1 and isinstance(out[0], str)


def test_transcribe_rejects_misaligned_window(tmp_path):
    vocab_dir = str(tmp_path / "vocab")
    make_vocab_dir(vocab_dir)
    sr = 16000
    wave = (np.random.default_rng(0).normal(size=sr) * 3000).astype(np.int16)
    wav_path = str(tmp_path / "b.wav")
    write_wav(wav_path, wave, sr)
    import pytest
    with pytest.raises(ValueError):
        transcribe.main([
            wav_path, "-vocab_dir", vocab_dir,
            "-tb_dir", str(tmp_path / "models"),
            "-window", "81",           # not a multiple of the reduction
            "-nlc", "2", "-hsize", "8", "-hsize_dec", "8",
            "-emb_size", "8", "-attn_vec_size", "8", "-lm_hsize", "8",
            "-feat_len", "20",
        ])


def test_transcribe_featurizes_at_training_scale(tmp_path, monkeypatch):
    """Serve/train feature parity: transcribe must hand featurize_utterance
    the SAME [-1, 1] waveform scale that prepare_corpus uses at training
    time (read_wav output, which is already normalized). A second /32768
    once pushed mel powers below the log floor — a silent train/serve
    mismatch this pins against."""
    from e2e_asr_tpu.data.audio import read_wav
    from e2e_asr_tpu.frontend import logmel

    vocab_dir = str(tmp_path / "vocab")
    make_vocab_dir(vocab_dir)
    sr = 16000
    wave = (np.random.default_rng(3).normal(size=sr) * 9000).astype(np.int16)
    wav_path = str(tmp_path / "c.wav")
    write_wav(wav_path, wave, sr)

    seen = []
    real = logmel.featurize_utterance

    def spy(waveform, **kw):
        seen.append(np.asarray(waveform))
        return real(waveform, **kw)

    monkeypatch.setattr(logmel, "featurize_utterance", spy)
    transcribe.main([
        wav_path, "-vocab_dir", vocab_dir,
        "-tb_dir", str(tmp_path / "models"),
        "-window", "80", "-margin", "16", "-beam_size", "1",
        "-nlc", "2", "-hsize", "8", "-hsize_dec", "8",
        "-emb_size", "8", "-attn_vec_size", "8", "-lm_hsize", "8",
        "-feat_len", "20",
    ])
    expect, _ = read_wav(wav_path)
    assert seen, "featurize_utterance never called"
    np.testing.assert_array_equal(seen[0], expect)
