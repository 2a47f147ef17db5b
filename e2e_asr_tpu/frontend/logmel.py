"""Log-mel filterbank frontend (waveform -> [T, n_mels] features).

The reference consumes precomputed "logmel" features from TFRecords
(speech_dataset.py:22) — the extraction itself happened offline (Kaldi-style
80-dim filterbanks, train.py:47). This module brings the frontend into the
framework so raw audio can be featurized on-device, jit-compiled and batched:

    frame (static strided slices) -> Hann window -> rFFT -> power spectrum
    -> mel filterbank (one MXU matmul) -> log

All shapes static; the mel filterbank is a precomputed [n_fft/2+1, n_mels]
matrix so the hot path is a single batched matmul. Defaults match the common
Kaldi/librosa-style setup: 25 ms windows, 10 ms hop, 80 mels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 20.0, fmax: float | None = None) -> np.ndarray:
    """Triangular mel filterbank matrix [n_fft//2 + 1, n_mels] (HTK mels)."""
    fmax = fmax or sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, n_mels), dtype=np.float32)
    for m in range(n_mels):
        lo, center, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(center - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - center, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


@functools.partial(jax.jit, static_argnames=("sample_rate", "frame_length",
                                             "hop_length", "n_fft", "n_mels"))
def log_mel_spectrogram(waveform: Array, *, sample_rate: int = 16000,
                        frame_length: int = 400, hop_length: int = 160,
                        n_fft: int = 512, n_mels: int = 80,
                        eps: float = 1e-6) -> Array:
    """waveform: [..., n_samples] -> log-mel features [..., T, n_mels].

    T = 1 + (n_samples - frame_length) // hop_length (no padding).
    """
    n_samples = waveform.shape[-1]
    if n_samples < frame_length:
        # Zero-pad sub-frame inputs to one full window (a silent jnp gather
        # clamp would otherwise produce a garbage frame).
        waveform = jnp.pad(
            waveform, [(0, 0)] * (waveform.ndim - 1)
            + [(0, frame_length - n_samples)])
        n_samples = frame_length
    T = 1 + max(0, (n_samples - frame_length)) // hop_length
    # Static framing: gather by a precomputed [T, frame_length] index grid.
    idx = (np.arange(T)[:, None] * hop_length +
           np.arange(frame_length)[None, :])
    frames = waveform[..., idx]                         # [..., T, frame_length]
    window = jnp.asarray(np.hanning(frame_length).astype(np.float32))
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2                          # [..., T, n_fft//2+1]
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    mel = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    return jnp.log(mel + eps)


def featurize_utterance(waveform: np.ndarray, **kw) -> np.ndarray:
    """Host helper: one utterance's waveform -> [T, n_mels] float32."""
    return np.asarray(log_mel_spectrogram(jnp.asarray(waveform), **kw))
