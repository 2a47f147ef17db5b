"""WAV ingestion -> log-mel -> TFRecord corpus round trip."""
import numpy as np

from e2e_asr_tpu.data import audio
from e2e_asr_tpu.data.speech import SpeechDataset
from e2e_asr_tpu.data.text import EOS_ID, GO_ID


def _vocab():
    toks = ["<pad>", "<go>", "<eos>", "▁"] + list("abcdefghijklmnopqrstuvwxyz")
    return {t: i for i, t in enumerate(toks)}


def test_wav_roundtrip(tmp_path, rng):
    path = str(tmp_path / "a.wav")
    wave_f32 = rng.normal(scale=0.1, size=(16000,)).astype(np.float32)
    audio.write_wav(path, wave_f32, 16000)
    back, sr = audio.read_wav(path)
    assert sr == 16000 and back.shape == (16000,)
    np.testing.assert_allclose(back, np.clip(wave_f32, -1, 1), atol=1e-4)


def test_utterance_from_wav(tmp_path, rng):
    path = str(tmp_path / "utt1.wav")
    audio.write_wav(path, rng.normal(scale=0.1, size=(8000,)).astype(np.float32),
                    16000)
    utt = audio.utterance_from_wav(path, "hello world", _vocab())
    assert utt.utt_id == "utt1"
    assert utt.logmel.shape == (48, 80)   # (8000-400)//160 + 1 frames
    assert utt.char[0] == GO_ID and utt.char[-1] == EOS_ID
    assert len(utt.char) == 2 + 2 + len("helloworld")  # go/eos + 2 seps


def test_build_corpus_feeds_pipeline(tmp_path, rng):
    entries = []
    for i in range(5):
        p = str(tmp_path / f"utt{i}.wav")
        audio.write_wav(p, rng.normal(scale=0.1,
                                      size=(8000,)).astype(np.float32), 16000)
        entries.append((p, "a b"))
    out = str(tmp_path / "corpus.tfrecord")
    n = audio.build_corpus_from_wavs(entries, _vocab(), out)
    assert n == 5
    ds = SpeechDataset([out], batch_size=2, feat_length=80, is_training=False)
    assert len(ds) == 5
    batch = next(iter(ds.epoch()))
    assert batch["logmel"].shape[2] == 80
    assert batch["valid"].all()
    assert batch["utt_ids"][0] == "utt0"
