"""End-to-end real-corpus ingestion: a LibriSpeech-layout tree of FLAC files
+ transcripts -> prepare_corpus -> bucketed TFRecords -> training + greedy
eval through the CLI entry points. This is the full raw-audio path (FLAC
decode, log-mel frontend, vocab build, bucketing) the framework uses when a
real corpus is mounted."""
import glob
import os

import numpy as np
import pytest

from e2e_asr_tpu.tools import prepare_corpus
from tests.test_flac import (BitWriter, finish_frame, frame_header,
                             streaminfo, sub_verbatim)

SR = 16000
WORDS = ["aba", "cad", "bad", "cab", "dab", "abc"]


def _tone_wave(transcript: str, *, samples_per_char=640) -> np.ndarray:
    """Synthesize 'speech': one pure tone per character (learnable mapping
    between audio and transcript)."""
    freqs = {c: 300.0 + 120.0 * (ord(c) - ord("a")) for c in "abcdefgh"}
    chunks = []
    for word in transcript.split():
        for ch in word:
            t = np.arange(samples_per_char) / SR
            chunks.append(0.4 * np.sin(2 * np.pi * freqs[ch] * t))
    return np.concatenate(chunks).astype(np.float32)


def _write_flac(path: str, wave_f32: np.ndarray) -> None:
    """PCM16 mono FLAC with verbatim frames (tests/test_flac.py encoder)."""
    pcm = np.clip(wave_f32 * 32767.0, -32768, 32767).astype(np.int64)
    pad = (-len(pcm)) % 192
    pcm = np.concatenate([pcm, np.zeros(pad, np.int64)])
    body = bytearray()
    for fno, s in enumerate(range(0, len(pcm), 192)):
        w = BitWriter()
        frame_header(w, 192, ch_code=0, frame_no=fno % 128)
        sub_verbatim(w, pcm[s:s + 192], 16)
        finish_frame(w)
        body += w.data()
    with open(path, "wb") as f:
        f.write(b"fLaC" + streaminfo(SR, 1, 16, len(pcm)) + bytes(body))


@pytest.fixture(scope="module")
def librispeech_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ls")
    rng = np.random.default_rng(0)
    split_utts = {}
    for split, n in (("train-clean", 10), ("dev-clean", 4)):
        d = root / split / "1" / "2"
        d.mkdir(parents=True)
        lines = []
        for i in range(n):
            words = " ".join(rng.choice(WORDS, size=rng.integers(2, 4)))
            utt_id = f"1-2-{split[:1]}{i:04d}"
            _write_flac(str(d / f"{utt_id}.flac"), _tone_wave(words))
            lines.append(f"{utt_id} {words.upper()}")
        (d / "1-2.trans.txt").write_text("\n".join(lines) + "\n")
        split_utts[split] = n
    return root, split_utts


def test_prepare_and_train(librispeech_tree, tmp_path):
    root, split_utts = librispeech_tree
    out = str(tmp_path / "corpus")
    stats = prepare_corpus.prepare(
        out,
        prepare_corpus.scan_librispeech(str(root / "train-clean")),
        prepare_corpus.scan_librispeech(str(root / "dev-clean")),
        num_buckets=2, shard_size=4)
    assert stats["train_1k"] == split_utts["train-clean"]
    assert stats["dev"] == split_utts["dev-clean"]
    # Layout the CLI expects.
    tfr = os.path.join(out, "tfrecords")
    assert glob.glob(os.path.join(tfr, "train_1k.0.*"))
    assert glob.glob(os.path.join(tfr, "train_1k.1.*"))
    assert glob.glob(os.path.join(tfr, "dev.*"))
    assert os.path.isfile(os.path.join(tfr, "lm", "lm.0001"))
    vocab_path = os.path.join(out, "vocab", "char.vocab")
    lines = open(vocab_path).read().splitlines()
    assert lines[:3] == ["<pad>", "<go>", "<eos>"] and "▁" in lines
    # Only a/b/c/d appear in WORDS.
    assert set(lines[4:]) == set("abcd")

    # The produced corpus loads through the bucketed pipeline with sane
    # shapes and round-trippable transcripts.
    from e2e_asr_tpu.data.speech import SpeechDataset
    from e2e_asr_tpu.data import text
    files = sorted(glob.glob(os.path.join(tfr, "dev.*")))
    ds = SpeechDataset(files, 4, 80, is_training=False, tasks=("char",))
    batch = next(iter(ds.epoch()))
    assert batch["logmel"].shape[0] == 4 and batch["logmel"].shape[2] == 80
    _, rev = text.initialize_vocabulary(vocab_path)
    sent = text.ids_to_sentence(batch["char"][0][1:], rev)
    assert sent and all(w in WORDS for w in sent.split())

    # End-to-end: train a tiny model on the prepared corpus via the CLI.
    from e2e_asr_tpu.cli.main import launch_train, parse_options
    cfg = parse_options([
        "-data_dir", tfr, "-vocab_dir", os.path.join(out, "vocab"),
        "-tb_dir", str(tmp_path / "models"),
        "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
        "-attn_vec_size", "4", "-lm_hsize", "8", "-feat_len", "80",
        "-max_out_char", "16", "-buck_batch_sizes", "4,4",
        "-steps_per_checkpoint", "2", "-max_epochs", "1",
        "-compute_dtype", "float32", "-run_id", "61", "-lm_prob", "0.2",
        "-lm_data_dir", os.path.join(tfr, "lm")])
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))


def test_manifest_mode_wav(tmp_path):
    from e2e_asr_tpu.data.audio import write_wav

    wav = str(tmp_path / "u1.wav")
    write_wav(wav, _tone_wave("aba cad"), SR)
    manifest = tmp_path / "train.tsv"
    manifest.write_text(f"u1\t{wav}\tABA CAD\n")
    entries = prepare_corpus.read_manifest(str(manifest))
    assert entries == [("u1", wav, "ABA CAD")]
    out = str(tmp_path / "corpus")
    stats = prepare_corpus.prepare(out, entries, num_buckets=1)
    assert stats["train_1k"] == 1


def test_run_pipeline_one_command(librispeech_tree, tmp_path):
    """The one-command parity pipeline (tools/run_pipeline.py): raw corpus ->
    prepare -> train -> beam grid -> final test eval -> WER report, end to
    end on the synthetic LibriSpeech tree. The same command with a real
    corpus mounted is the reference-WER-parity run."""
    from e2e_asr_tpu.tools import run_pipeline

    root, _ = librispeech_tree
    out = str(tmp_path / "work")
    report = run_pipeline.main([
        "-corpus", str(root), "-out", out, "-num_buckets", "2",
        # dev doubles as "test" so the final_eval stage runs
        "-test_dirs", str(root / "dev-clean"),
        # tiny flagship overrides (forwarded verbatim to cli.main)
        "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
        "-attn_vec_size", "4", "-lm_hsize", "8",
        "-max_out_char", "16", "-buck_batch_sizes", "4,4",
        "-steps_per_checkpoint", "2", "-max_epochs", "1",
        "-compute_dtype", "float32", "-run_id", "71", "-beam_size", "2"])
    score = os.path.join(out, "grid", "final_eval", "score.txt")
    assert os.path.isfile(score)
    line = open(score).read()
    assert "test_err" in line and "dev_err" in line
    # perf.txt makes the sweep resumable (grid_search_for_beam.py:59-75).
    assert os.path.isfile(os.path.join(out, "grid", "perf.txt"))
    # Re-run skips prepare (shards exist) and resumes training + grid.
    run_pipeline.main([
        "-corpus", str(root), "-out", out, "-skip_train",
        "-test_dirs", str(root / "dev-clean"),
        "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
        "-attn_vec_size", "4", "-lm_hsize", "8",
        "-max_out_char", "16", "-buck_batch_sizes", "4,4",
        "-steps_per_checkpoint", "2", "-max_epochs", "1",
        "-compute_dtype", "float32", "-run_id", "71", "-beam_size", "2"])


def test_run_pipeline_nonattention_family(librispeech_tree, tmp_path):
    """The one-command pipeline for a non-attention family: the attention
    beam grid is replaced by a direct dev+test family eval (the grid's
    knobs are attention-beam-specific)."""
    from e2e_asr_tpu.tools import run_pipeline

    root, _ = librispeech_tree
    out = str(tmp_path / "work_t")
    report = run_pipeline.main([
        "-corpus", str(root), "-out", out, "-num_buckets", "2",
        "-test_dirs", str(root / "dev-clean"),
        "-model_family", "transducer",
        "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
        "-attn_vec_size", "4", "-lm_hsize", "8",
        "-max_out_char", "16", "-buck_batch_sizes", "4,4",
        "-steps_per_checkpoint", "2", "-max_epochs", "1",
        "-compute_dtype", "float32", "-run_id", "72", "-beam_size", "2"])
    assert os.path.isfile(report)
    txt = open(report).read()
    assert "family transducer" in txt and "dev err" in txt
    assert "test err" in txt
    assert os.path.isfile(os.path.join(
        out, "grid", "final_eval", "decoded_test.txt"))
