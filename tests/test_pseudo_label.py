"""Pseudo-labeling / self-training loop (tools/pseudo_label.py): unlabeled
WAVs -> hypothesis corpus in the prepare_corpus layout -> trainable."""
import glob
import os
import wave as wave_mod

import numpy as np
import pytest

from e2e_asr_tpu.cli.main import launch_train, parse_options
from e2e_asr_tpu.data.synth import make_vocab_dir
from e2e_asr_tpu.tools import pseudo_label


def _write_wav(path, seconds, seed, sr=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    sig = (np.sin(2 * np.pi * (200 + 40 * seed) * t)
           + 0.2 * rng.normal(size=t.shape)).astype(np.float32)
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(sig, -1, 1) * 32767).astype(np.int16)
                      .tobytes())


def test_noisy_student_loop(tmp_path):
    root = tmp_path
    make_vocab_dir(str(root / "vocab"))
    audio = root / "unlabeled"
    audio.mkdir()
    for i in range(5):
        _write_wav(audio / f"utt{i}.wav", 0.6 + 0.1 * i, seed=i)

    flags = ["-vocab_dir", str(root / "vocab"),
             "-tb_dir", str(root / "models"),
             "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
             "-attn_vec_size", "4", "-lm_hsize", "8", "-feat_len", "8",
             "-max_out_char", "8", "-compute_dtype", "float32",
             "-run_id", "77"]
    stats = pseudo_label.main([
        "-audio", str(audio / "*.wav"), "-out", str(root / "pseudo"),
        "-min_words", "0", "-pl_buckets", "128,256", "-pl_batch", "4",
        "-pl_num_buckets", "1"] + flags)
    assert stats["kept"] == 5 and stats["skipped_long"] == 0

    tf_dir = root / "pseudo" / "tfrecords"
    shards = glob.glob(str(tf_dir / "train_1k.*"))
    assert shards
    assert os.path.isfile(tf_dir / "lm" / "lm.0001")
    tsv = (root / "pseudo" / "pseudo_transcripts.tsv").read_text()
    assert len(tsv.splitlines()) == 5

    # The generated corpus round-trips through the real dataset reader.
    from e2e_asr_tpu.data.speech import SpeechDataset
    ds = SpeechDataset(sorted(shards), 4, 8, is_training=False,
                       tasks=("char",))
    batches = list(ds.epoch())
    assert sum(int(b["valid"].sum()) for b in batches) == 5

    # And trains through the standard CLI driver (dev = a copied shard).
    import shutil
    shutil.copy(shards[0], tf_dir / "dev.0001")
    cfg = parse_options(flags + [
        "-data_dir", str(tf_dir), "-buck_batch_sizes", "4",
        "-steps_per_checkpoint", "2", "-max_epochs", "1"])
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))


def test_long_audio_skipped(tmp_path):
    root = tmp_path
    make_vocab_dir(str(root / "vocab"))
    audio = root / "u"
    audio.mkdir()
    _write_wav(audio / "long.wav", 3.0, seed=1)   # ~298 frames > 64
    stats = pseudo_label.main([
        "-audio", str(audio / "*.wav"), "-out", str(root / "p"),
        "-min_words", "0", "-pl_buckets", "64",
        "-vocab_dir", str(root / "vocab"), "-tb_dir", str(root / "m"),
        "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
        "-attn_vec_size", "4", "-lm_hsize", "8", "-feat_len", "8",
        "-max_out_char", "8", "-compute_dtype", "float32"])
    assert stats["skipped_long"] == 1 and stats["kept"] == 0

    with pytest.raises(FileNotFoundError):
        pseudo_label.main([
            "-audio", str(audio / "none*.wav"), "-out", str(root / "p2"),
            "-vocab_dir", str(root / "vocab"), "-tb_dir", str(root / "m"),
            "-feat_len", "8"])
