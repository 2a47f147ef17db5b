"""Data layer tests: TFRecord framing, SequenceExample codec, datasets, text."""
import numpy as np
import pytest

from e2e_asr_tpu.data import example as pb
from e2e_asr_tpu.data import text, tfrecord
from e2e_asr_tpu.data.lm import LMDataset
from e2e_asr_tpu.data.speech import (SpeechDataset, compute_bucket_shape,
                                     load_files, prefetch)
from e2e_asr_tpu.data.synth import (encode_utterance, synth_utterance,
                                    write_lm_corpus, write_speech_corpus)


def test_crc32c_known_vectors():
    # Standard CRC32C test vectors.
    assert tfrecord.crc32c(b"") == 0x0
    assert tfrecord.crc32c(b"123456789") == 0xE3069283
    assert tfrecord.crc32c(b"a") == 0xC1D04330


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    recs = [b"hello", b"", b"x" * 1000]
    tfrecord.write_records(path, iter(recs))
    out = list(tfrecord.read_records(path, verify=True))
    assert out == recs


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        buf = bytearray()
        pb.write_varint(buf, v)
        out, pos = pb.read_varint(bytes(buf), 0)
        assert out == v and pos == len(buf)


def test_sequence_example_roundtrip(rng):
    frames = rng.normal(size=(7, 5)).astype(np.float32)
    char = np.array([1, 9, 4, 2], dtype=np.int64)
    phone = np.array([1, 6, 2], dtype=np.int64)
    rec = encode_utterance("sw1234-A_0001", frames, char, phone)
    context, seqs = pb.decode_sequence_example(rec)
    assert context["segment"] == b"sw1234-A_0001"
    assert int(context["cint_len"][0]) == 3
    got_frames = np.stack(seqs["logmel"])
    np.testing.assert_allclose(got_frames, frames, rtol=1e-6)
    got_char = np.concatenate(seqs["cint"])
    np.testing.assert_array_equal(got_char, char)


def test_negative_int64_roundtrip():
    feat = pb.encode_int64_feature([-5, 3])
    out = pb.decode_feature(feat)
    np.testing.assert_array_equal(out, [-5, 3])


def test_speech_dataset_batching(tmp_path):
    path = str(tmp_path / "train_1k.0.0001.tfrecord")
    write_speech_corpus(path, 10, feat_length=8, min_tokens=4, max_tokens=6)
    ds = SpeechDataset([path], batch_size=4, feat_length=8, is_training=True,
                       tasks=("char", "phone"))
    assert len(ds) == 10
    batches = list(ds.epoch())
    assert len(batches) == 2  # drop remainder
    b = batches[0]
    assert b["logmel"].shape[0] == 4
    assert b["logmel"].shape[1] % 32 == 0
    assert b["char"].shape[1] % 8 == 0
    assert b["valid"].all()
    # char_len counts shifted targets: n_tokens + eos.
    i = 0
    L = b["char_len"][i]
    assert b["char"][i, 0] == text.GO_ID
    assert b["char"][i, L] == text.EOS_ID


def test_speech_dataset_eval_pads_final_batch(tmp_path):
    path = str(tmp_path / "dev.tfrecord")
    write_speech_corpus(path, 5, feat_length=8)
    ds = SpeechDataset([path], batch_size=4, feat_length=8, is_training=False)
    batches = list(ds.epoch())
    assert len(batches) == 2
    assert batches[1]["valid"].sum() == 1
    # Ordering preserved for eval.
    assert batches[0]["utt_ids"][0].endswith("00000")


def test_speech_dataset_shuffles_per_epoch(tmp_path):
    path = str(tmp_path / "train_1k.0.0001.tfrecord")
    write_speech_corpus(path, 12, feat_length=8)
    ds = SpeechDataset([path], batch_size=4, feat_length=8, is_training=True)
    ids_1 = [b["utt_ids"] for b in ds.epoch()]
    ids_2 = [b["utt_ids"] for b in ds.epoch()]
    assert ids_1 != ids_2


def test_lm_dataset(tmp_path):
    path = str(tmp_path / "lm.0001.tfrecord")
    write_lm_corpus(path, 9, min_tokens=3, max_tokens=5)
    ds = LMDataset([path], batch_size=4)
    assert len(ds) == 9
    batches = list(ds.epoch())
    # 9 seqs at batch 4 -> 2 full + 1 padded tail batch (reference keeps the
    # remainder, lm_dataset.py:38; fixed shapes pad it with valid=0 rows).
    assert len(batches) == 3
    b = batches[0]
    assert b["char"].shape == (4, ds.cap)
    assert (b["char"][:, 0] == text.GO_ID).all()
    assert b["valid"].tolist() == [1, 1, 1, 1]
    tail = batches[-1]
    assert tail["valid"].tolist() == [1, 0, 0, 0]
    assert (tail["char"][1:] == 0).all()


def test_prefetch_preserves_order():
    out = list(prefetch(iter(range(50)), size=4))
    assert out == list(range(50))


def test_text_detokenize():
    rev = text.START_VOCAB + ["▁", "a", "b", "!",  "<sp>"]
    # ▁ a b ! <eos> junk
    sent = text.ids_to_sentence([3, 4, 5, 6, 2, 4, 4], rev)
    assert sent == "ab[laughter]"


def test_get_relevant_words():
    words, rel = text.get_relevant_words("hello [noise] uh worl- okay<sp>done")
    assert words == ["hello", "[noise]", "uh", "worl-", "okay", "done"]
    assert rel == ["hello", "okay", "done"]
