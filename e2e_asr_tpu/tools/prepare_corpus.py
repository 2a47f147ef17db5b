"""Real-corpus preparation: audio + transcripts -> the framework's on-disk
layout (bucketed TFRecord shards, vocab, LM corpus).

Closes the real-data ingestion loop (VERDICT round-1 item 1): the reference
assumed Kaldi-preprocessed TFRecords already existed
(/root/reference/speech_dataset.py, train.py:94-129); this tool produces them
from raw audio with zero external dependencies — WAV via the stdlib reader
(data/audio.py) and FLAC via the in-repo decoder (data/flac.py +
runtime/flac_decoder.cc), features via the on-device log-mel frontend
(frontend/logmel.py).

Inputs (two modes):
  LibriSpeech trees:   python -m e2e_asr_tpu.tools.prepare_corpus \
      -out data/ -train_dirs LibriSpeech/train-clean-100 \
      -dev_dirs LibriSpeech/dev-clean -test_dirs LibriSpeech/test-clean
    (walks for *.trans.txt: each line "UTTID TRANSCRIPT", UTTID.flac beside)
  Manifests:           -train_manifest train.tsv ... where each line is
      utt_id<TAB>audio_path<TAB>transcript       (.wav or .flac)

Outputs under -out:
  vocab/char.vocab                      reference-style char vocabulary
  tfrecords/train_1k.{bucket}.{shard}   length-bucketed train shards
  tfrecords/dev.0001 ...                dev shards
  tfrecords/eval2000.0001 ...           test shards (CLI -test glob)
  tfrecords/lm/lm.0001                  char LM corpus from train transcripts

Bucketing mirrors the reference recipe: num_buckets equal-count quantiles by
frame length, biggest batches for the shortest bucket (train.py:43-44).
"""
from __future__ import annotations

import argparse
import os
from os import path

import numpy as np

from e2e_asr_tpu.data import example as pb
from e2e_asr_tpu.data import tfrecord
from e2e_asr_tpu.data.synth import encode_utterance
from e2e_asr_tpu.data.text import (EOS_ID, GO_ID, START_VOCAB,
                                   sentence_to_ids, write_vocabulary)


def scan_librispeech(root: str) -> list[tuple[str, str, str]]:
    """Walk a LibriSpeech-style tree -> [(utt_id, audio_path, transcript)]."""
    entries = []
    for dirpath, _, files in os.walk(root):
        for name in sorted(files):
            if not name.endswith(".trans.txt"):
                continue
            with open(path.join(dirpath, name)) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    utt_id, _, transcript = line.partition(" ")
                    audio = path.join(dirpath, utt_id + ".flac")
                    if not path.isfile(audio):
                        audio = path.join(dirpath, utt_id + ".wav")
                    entries.append((utt_id, audio, transcript))
    return entries


def read_manifest(manifest: str) -> list[tuple[str, str, str]]:
    entries = []
    with open(manifest) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            utt_id, audio, transcript = line.split("\t", 2)
            entries.append((utt_id, audio, transcript))
    return entries


def normalize_transcript(text: str) -> str:
    return " ".join(text.lower().split())


def build_vocab(transcripts: list[str]) -> list[str]:
    """Reference-style char vocab: specials, word separator, then chars."""
    chars = set()
    for t in transcripts:
        for word in t.split():
            chars.update(word)
    return START_VOCAB + ["▁"] + sorted(chars)


def read_audio(audio_path: str) -> tuple[np.ndarray, int]:
    if audio_path.endswith(".flac"):
        from e2e_asr_tpu.data.flac import read_flac
        return read_flac(audio_path)
    from e2e_asr_tpu.data.audio import read_wav
    return read_wav(audio_path)


def featurize_entries(entries, vocab: dict[str, int], *, n_mels: int = 80,
                      verbose_every: int = 500, encode_fn=None):
    """Yield (utt_id, logmel [T,F] f32, char int64) per entry.

    encode_fn(sentence, vocab) -> ids; defaults to the char-level encoder
    (BPE corpora pass data/bpe.sentence_to_ids_bpe)."""
    from e2e_asr_tpu.frontend.logmel import featurize_utterance

    encode_fn = encode_fn or sentence_to_ids
    for i, (utt_id, audio_path, transcript) in enumerate(entries):
        wave_f32, sr = read_audio(audio_path)
        feats = featurize_utterance(wave_f32, sample_rate=sr, n_mels=n_mels)
        char = np.asarray(
            encode_fn(normalize_transcript(transcript), vocab),
            dtype=np.int64)
        if verbose_every and (i + 1) % verbose_every == 0:
            print(f"  featurized {i + 1}/{len(entries)}")
        yield utt_id, feats, char


def write_split(utts: list[tuple[str, np.ndarray, np.ndarray]],
                out_dir: str, prefix: str, *, num_buckets: int = 0,
                shard_size: int = 512) -> None:
    """Write one split. num_buckets > 0 -> length-bucketed train layout
    (train_1k.{bucket}.{shard}); otherwise flat {prefix}.{shard} files."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(group, name_fn):
        for s in range(0, max(len(group), 1), shard_size):
            shard = group[s:s + shard_size]
            if not shard:
                continue
            records = (encode_utterance(u, f, c,
                                        np.asarray([GO_ID, EOS_ID], np.int64))
                       for u, f, c in shard)
            tfrecord.write_records(
                path.join(out_dir, name_fn(s // shard_size)), records)

    if num_buckets > 0:
        lens = np.asarray([f.shape[0] for _, f, _ in utts])
        order = np.argsort(lens, kind="stable")
        splits = np.array_split(order, num_buckets)
        for b, idx in enumerate(splits):
            group = [utts[i] for i in idx]
            write_group(group, lambda s, b=b: f"{prefix}.{b}.{s:04d}")
            if group:
                print(f"  bucket {b}: {len(group)} utts, frames "
                      f"{lens[idx].min()}..{lens[idx].max()}")
    else:
        write_group(utts, lambda s: f"{prefix}.{s + 1:04d}")


def write_lm_from_transcripts(transcripts: list[str], vocab: dict[str, int],
                              out_path: str, encode_fn=None) -> None:
    encode_fn = encode_fn or sentence_to_ids
    os.makedirs(path.dirname(out_path), exist_ok=True)
    records = []
    for t in transcripts:
        ids = np.asarray(encode_fn(normalize_transcript(t), vocab),
                         dtype=np.int64)
        context = {"cint_len": pb.encode_int64_feature([len(ids) - 1])}
        feature_lists = {"cint": [pb.encode_int64_feature([c]) for c in ids]}
        records.append(pb.encode_sequence_example(context, feature_lists))
    tfrecord.write_records(out_path, iter(records))


def prepare(out_dir: str, train_entries, dev_entries=(), test_entries=(),
            *, n_mels: int = 80, num_buckets: int = 5,
            shard_size: int = 512, bpe_size: int = 0) -> dict:
    """Full preparation. Returns {"vocab_size": ..., counts...}.

    bpe_size > 0 learns a subword (BPE) vocabulary of that total size from
    the training transcripts instead of the reference char vocab
    (data/bpe.py — same one-file vocab format, merge order = file order;
    every downstream consumer is unchanged)."""
    if not train_entries:
        print("WARNING: no training utterances found — check -train_dirs/"
              "-train_manifest (LibriSpeech mode needs *.trans.txt files)")
    transcripts = [normalize_transcript(t) for _, _, t in train_entries]
    encode_fn = None
    if bpe_size > 0:
        from e2e_asr_tpu.data.bpe import sentence_to_ids_bpe, train_bpe
        rev_vocab = train_bpe(transcripts, bpe_size)
        encode_fn = sentence_to_ids_bpe
    else:
        rev_vocab = build_vocab(transcripts)
    vocab = {tok: i for i, tok in enumerate(rev_vocab)}
    write_vocabulary(path.join(out_dir, "vocab", "char.vocab"), rev_vocab)
    print(f"vocab: {len(rev_vocab)} tokens")

    tfr = path.join(out_dir, "tfrecords")
    sets = [("train_1k", train_entries, num_buckets),
            ("dev", dev_entries, 0), ("eval2000", test_entries, 0)]
    counts = {}
    for prefix, entries, buckets in sets:
        if not entries:
            continue
        print(f"{prefix}: featurizing {len(entries)} utterances")
        utts = list(featurize_entries(entries, vocab, n_mels=n_mels,
                                      encode_fn=encode_fn))
        write_split(utts, tfr, prefix, num_buckets=buckets,
                    shard_size=shard_size)
        counts[prefix] = len(utts)

    write_lm_from_transcripts(transcripts, vocab,
                              path.join(tfr, "lm", "lm.0001"),
                              encode_fn=encode_fn)
    print(f"LM corpus: {len(transcripts)} sequences")
    return {"vocab_size": len(rev_vocab), **counts}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-out", required=True)
    p.add_argument("-train_dirs", nargs="*", default=[])
    p.add_argument("-dev_dirs", nargs="*", default=[])
    p.add_argument("-test_dirs", nargs="*", default=[])
    p.add_argument("-train_manifest", default="")
    p.add_argument("-dev_manifest", default="")
    p.add_argument("-test_manifest", default="")
    p.add_argument("-n_mels", type=int, default=80)
    p.add_argument("-num_buckets", type=int, default=5)
    p.add_argument("-shard_size", type=int, default=512)
    p.add_argument("-bpe_size", type=int, default=0,
                   help="learn a subword (BPE) vocab of this total size "
                        "instead of the char vocab (0 = chars, reference)")
    args = p.parse_args(argv)

    def gather(dirs, manifest):
        entries = []
        for d in dirs:
            entries.extend(scan_librispeech(d))
        if manifest:
            entries.extend(read_manifest(manifest))
        return entries

    stats = prepare(args.out,
                    gather(args.train_dirs, args.train_manifest),
                    gather(args.dev_dirs, args.dev_manifest),
                    gather(args.test_dirs, args.test_manifest),
                    n_mels=args.n_mels, num_buckets=args.num_buckets,
                    shard_size=args.shard_size, bpe_size=args.bpe_size)
    print(stats)


if __name__ == "__main__":
    main()
