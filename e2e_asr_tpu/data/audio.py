"""Raw-audio ingestion: WAV files -> log-mel Utterances.

The reference consumed only precomputed features (speech_dataset.py); with the
on-device log-mel frontend (frontend/logmel.py) this module closes the loop so
corpora can be built straight from audio + transcripts:

    wav (PCM16/PCM32, stdlib `wave`) -> batched jit log-mel -> Utterance
    (optionally written out in the TFRecord schema for the bucketed pipeline).
"""
from __future__ import annotations

import os
import wave

import numpy as np

from e2e_asr_tpu.data.speech import Utterance
from e2e_asr_tpu.data.synth import encode_utterance
from e2e_asr_tpu.data.text import EOS_ID, GO_ID, sentence_to_ids
from e2e_asr_tpu.data import tfrecord


def read_wav(path) -> tuple[np.ndarray, int]:
    """Read a PCM wav file -> (float32 mono waveform in [-1, 1], sample_rate).

    `path` may be a filename or a binary file-like object (e.g. an
    io.BytesIO over an HTTP request body — tools/serve_http.py)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, sr


def write_wav(path: str, waveform: np.ndarray, sample_rate: int) -> None:
    """Write a float32 [-1,1] mono waveform as PCM16 (test/tool helper)."""
    pcm = np.clip(waveform, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def utterance_from_wav(path: str, transcript: str, vocab: dict[str, int],
                       *, utt_id: str | None = None, n_mels: int = 80,
                       **frontend_kw) -> Utterance:
    """Featurize one wav + transcript into an Utterance (char ids get
    <go>/<eos> framing; phone track left empty)."""
    from e2e_asr_tpu.frontend.logmel import featurize_utterance

    wave_f32, sr = read_wav(path)
    feats = featurize_utterance(wave_f32, sample_rate=sr, n_mels=n_mels,
                                **frontend_kw)
    char = np.asarray(sentence_to_ids(transcript, vocab), dtype=np.int32)
    return Utterance(
        utt_id=utt_id or os.path.splitext(os.path.basename(path))[0],
        logmel=feats, char=char, phone=np.zeros(0, np.int32))


def build_corpus_from_wavs(entries: list[tuple[str, str]],
                           vocab: dict[str, int], out_path: str,
                           *, n_mels: int = 80, **frontend_kw) -> int:
    """entries: [(wav_path, transcript)]. Writes the reference TFRecord schema
    consumed by data/speech.py. Returns the utterance count."""
    records = []
    for wav_path, transcript in entries:
        utt = utterance_from_wav(wav_path, transcript, vocab, n_mels=n_mels,
                                 **frontend_kw)
        phone = np.asarray([GO_ID, EOS_ID], dtype=np.int64)
        records.append(encode_utterance(utt.utt_id, utt.logmel,
                                        utt.char.astype(np.int64), phone))
    return tfrecord.write_records(out_path, iter(records))
