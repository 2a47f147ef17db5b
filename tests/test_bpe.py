"""Subword (BPE) tokenization (data/bpe.py): training determinism, the
vocab-order == merge-order encoding property, roundtrips through the
unchanged detokenizer, and corpus preparation + CLI training on BPE targets."""
import glob
import os

import numpy as np

from e2e_asr_tpu.data import text
from e2e_asr_tpu.data.bpe import (encode_word, is_bpe_vocab,
                                  sentence_to_ids_bpe, train_bpe)

CORPUS = ["the cat sat on the mat",
          "the cats sat",
          "a cat on a mat",
          "the mat on the cat"] * 3


def test_train_bpe_learns_frequent_merges():
    rev = train_bpe(CORPUS, vocab_size=40)
    assert rev[:3] == ["<pad>", "<go>", "<eos>"]
    assert "▁" in rev
    assert len(rev) <= 40
    # "the"/"cat"/"mat" dominate the corpus: multi-char merges must appear.
    merged = [t for t in rev if len(t) > 1 and not t.startswith("<")]
    assert any("th" in t or "at" in t for t in merged), merged
    # Deterministic: same corpus -> same vocab.
    assert train_bpe(list(CORPUS), vocab_size=40) == rev


def test_vocab_order_is_merge_order():
    """Encoding reconstructs the merge priority from the FILE ORDER alone:
    writing + reloading the vocab yields identical encodings."""
    rev = train_bpe(CORPUS, vocab_size=48)
    vocab = {t: i for i, t in enumerate(rev)}
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "char.vocab")
        text.write_vocabulary(p, rev)
        vocab2, rev2 = text.initialize_vocabulary(p)
    assert rev2 == rev
    for w in ("the", "cats", "mat", "on", "zebra"):
        assert encode_word(w, vocab) == encode_word(w, vocab2)


def test_roundtrip_through_unchanged_detokenizer():
    """ids_to_sentence (untouched, reference semantics) decodes BPE ids."""
    rev = train_bpe(CORPUS, vocab_size=48)
    vocab = {t: i for i, t in enumerate(rev)}
    for sent in ("the cat sat", "a mat on the cat", "cats cats cats"):
        ids = sentence_to_ids_bpe(sent, vocab)
        assert ids[0] == text.GO_ID and ids[-1] == text.EOS_ID
        assert text.ids_to_sentence(ids[1:], rev) == sent


def test_bpe_shorter_than_chars():
    """The point of subwords: fewer target tokens than characters."""
    rev = train_bpe(CORPUS, vocab_size=60)
    vocab = {t: i for i, t in enumerate(rev)}
    sent = "the cat sat on the mat"
    n_bpe = len(sentence_to_ids_bpe(sent, vocab, add_go_eos=False))
    n_char = len(text.sentence_to_ids(sent, vocab, add_go_eos=False))
    assert n_bpe < n_char, (n_bpe, n_char)


def test_unknown_chars_dropped_not_padded():
    rev = train_bpe(CORPUS, vocab_size=40)
    vocab = {t: i for i, t in enumerate(rev)}
    ids = sentence_to_ids_bpe("the qqq cat", vocab, add_go_eos=False)
    assert text.PAD_ID not in ids
    # '▁' survives for the unknown word (a word boundary was spoken).
    assert text.ids_to_sentence(ids, rev).split() == ["the", "cat"]


def test_is_bpe_vocab():
    char_rev = text.START_VOCAB + ["▁"] + list("abcd")
    assert not is_bpe_vocab(char_rev)
    assert is_bpe_vocab(train_bpe(CORPUS, vocab_size=40))


def test_prepare_corpus_bpe_and_cli_train(tmp_path):
    """-bpe_size through prepare_corpus: subword shards + vocab, then a tiny
    CLI training run consumes them (vocab file is the only coupling)."""
    from e2e_asr_tpu.data.audio import write_wav
    from e2e_asr_tpu.tools import prepare_corpus
    from tests.test_prepare_corpus import SR, _tone_wave

    rng = np.random.default_rng(0)
    words = ["aba", "cad", "bad", "cab"]
    lines = []
    for i in range(8):
        sent = " ".join(rng.choice(words, size=int(rng.integers(2, 4))))
        wav = str(tmp_path / f"u{i}.wav")
        write_wav(wav, _tone_wave(sent), SR)
        lines.append(f"u{i}\t{wav}\t{sent.upper()}")
    manifest = tmp_path / "train.tsv"
    manifest.write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "corpus")
    entries = prepare_corpus.read_manifest(str(manifest))
    stats = prepare_corpus.prepare(out, entries, entries[:2],
                                   num_buckets=1, bpe_size=24)
    assert stats["vocab_size"] <= 24
    vocab_path = os.path.join(out, "vocab", "char.vocab")
    _, rev = text.initialize_vocabulary(vocab_path)
    assert is_bpe_vocab(rev)

    # Transcripts in the shards decode to the original words.
    from e2e_asr_tpu.data.speech import SpeechDataset
    tfr = os.path.join(out, "tfrecords")
    ds = SpeechDataset(sorted(glob.glob(os.path.join(tfr, "dev.*"))), 2, 80,
                       is_training=False, tasks=("char",))
    batch = next(iter(ds.epoch()))
    sent = text.ids_to_sentence(batch["char"][0][1:], rev)
    assert sent and all(w in words for w in sent.split())

    from e2e_asr_tpu.cli.main import launch_train, parse_options
    cfg = parse_options([
        "-data_dir", tfr, "-vocab_dir", os.path.join(out, "vocab"),
        "-tb_dir", str(tmp_path / "models"),
        "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
        "-attn_vec_size", "4", "-lm_hsize", "8", "-feat_len", "80",
        "-max_out_char", "16", "-buck_batch_sizes", "4",
        "-steps_per_checkpoint", "2", "-max_epochs", "1",
        "-compute_dtype", "float32", "-run_id", "62"])
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))