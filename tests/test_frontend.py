"""Log-mel frontend tests against an independent NumPy reference."""
import numpy as np

from e2e_asr_tpu.frontend.logmel import (featurize_utterance, hz_to_mel,
                                         log_mel_spectrogram, mel_filterbank,
                                         mel_to_hz)


def np_logmel_reference(wave, sr=16000, frame=400, hop=160, n_fft=512,
                        n_mels=80, eps=1e-6):
    T = 1 + (len(wave) - frame) // hop
    win = np.hanning(frame)
    fb = mel_filterbank(sr, n_fft, n_mels)
    out = np.zeros((T, n_mels), np.float32)
    for t in range(T):
        seg = wave[t * hop: t * hop + frame] * win
        spec = np.fft.rfft(seg, n=n_fft)
        power = np.abs(spec) ** 2
        out[t] = np.log(power @ fb + eps)
    return out


def test_mel_scale_roundtrip():
    freqs = np.array([20.0, 440.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(freqs)), freqs, rtol=1e-6)


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank(16000, 512, 80)
    assert fb.shape == (257, 80)
    assert (fb >= 0).all()
    # Interior FFT bins are covered by at least one filter.
    assert (fb[5:-5].sum(axis=1) > 0).all()


def test_logmel_matches_numpy_reference(rng):
    wave = rng.normal(size=(16000,)).astype(np.float32)  # 1 s of noise
    got = featurize_utterance(wave)
    want = np_logmel_reference(wave)
    assert got.shape == want.shape == (98, 80)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_logmel_batched(rng):
    import jax.numpy as jnp
    waves = jnp.asarray(rng.normal(size=(3, 8000)).astype(np.float32))
    feats = log_mel_spectrogram(waves)
    assert feats.shape == (3, 48, 80)
    # Batched result equals per-utterance results.
    single = featurize_utterance(np.asarray(waves[1]))
    np.testing.assert_allclose(np.asarray(feats[1]), single, rtol=1e-4,
                               atol=1e-4)


def test_tone_peaks_in_expected_mel_band():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)  # 1 kHz
    feats = featurize_utterance(tone)
    mean_energy = feats.mean(axis=0)
    peak_mel = int(np.argmax(mean_energy))
    # Which mel filter covers 1 kHz?
    fb = mel_filterbank(sr, 512, 80)
    bin_1k = int(round(1000.0 / (sr / 2) * 256))
    expected = int(np.argmax(fb[bin_1k]))
    assert abs(peak_mel - expected) <= 1


def test_subframe_waveform_padded_not_garbage(rng):
    """Inputs shorter than one window are zero-padded to a single frame."""
    short = rng.normal(size=(100,)).astype(np.float32)
    feats = featurize_utterance(short)
    assert feats.shape == (1, 80)
    # Equivalent to explicitly zero-padding to the window length.
    padded = np.zeros(400, np.float32)
    padded[:100] = short
    np.testing.assert_allclose(feats, featurize_utterance(padded),
                               rtol=1e-5, atol=1e-5)
