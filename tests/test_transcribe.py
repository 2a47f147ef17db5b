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
