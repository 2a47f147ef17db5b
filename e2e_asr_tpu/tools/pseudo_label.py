"""Pseudo-labeling for self-training (noisy student): transcribe UNLABELED
audio with a trained model and write the hypotheses back out as training
shards.

The standard semi-supervised ASR recipe (Kahn et al. 2020, Park et al.
"Noisy Student" 2020): a seed model decodes raw audio, low-confidence /
empty outputs are filtered, and the surviving (audio, hypothesis) pairs
become additional training data — typically mixed with the labeled shards
and trained with augmentation (-spec_augment / -speed_perturb). This tool
produces exactly the layout `prepare_corpus` emits (bucketed
train_1k.{bucket}.{shard} SequenceExamples + an LM corpus + a transcripts
TSV), so the generated directory drops straight into `-data_dir`.

    python -m e2e_asr_tpu.tools.pseudo_label -audio "unlabeled/*.wav" \
        -out data_pseudo/ [model flags: -vocab_dir -tb_dir -run_id ...] \
        -beam_size 4 -min_words 1

Decoding is batched with static frame buckets (the serving engine's
family-aware decoder, eval/serving._make_family_decoder) — every model
family works. Filtering: hypotheses with fewer than -min_words surviving
filler filtering are dropped (the model "heard nothing"); audio longer
than the largest bucket is skipped with a count (long-form audio should be
segmented upstream or transcribed with tools/transcribe).

No reference counterpart (the reference trains on Kaldi-prepared labeled
data only).
"""
from __future__ import annotations

import argparse
import glob
import os
from os import path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from e2e_asr_tpu import config as config_lib

    parser = argparse.ArgumentParser(
        description="pseudo-label unlabeled audio for self-training")
    parser.add_argument("-audio", type=str, required=True,
                        help="glob of unlabeled .wav/.flac files")
    parser.add_argument("-out", type=str, required=True,
                        help="output corpus dir (prepare_corpus layout)")
    parser.add_argument("-ckpt", type=str, default="",
                        help="explicit checkpoint (else best/latest from "
                             "the run dir)")
    parser.add_argument("-min_words", type=int, default=1,
                        help="drop hypotheses with fewer filler-filtered "
                             "words than this")
    parser.add_argument("-pl_buckets", type=str, default="256,512,1024",
                        help="static frame buckets for batched decoding")
    parser.add_argument("-pl_batch", type=int, default=8,
                        help="decode batch size per bucket")
    parser.add_argument("-pl_num_buckets", type=int, default=5,
                        help="length buckets of the OUTPUT corpus")
    parser.add_argument("-shard_size", type=int, default=512)
    config_lib.add_parse_options(parser)
    return parser


def main(argv=None) -> dict:
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.eval.serving import _make_family_decoder
    from e2e_asr_tpu.frontend.logmel import featurize_utterance
    from e2e_asr_tpu.tools.prepare_corpus import (read_audio, write_split,
                                                  write_lm_from_transcripts)
    from e2e_asr_tpu.train import step as step_lib

    args = vars(build_parser().parse_args(argv))
    audio_glob = args.pop("audio")
    out_dir = args.pop("out")
    ckpt_file = args.pop("ckpt")
    min_words = args.pop("min_words")
    frame_buckets = sorted(int(x) for x in args.pop("pl_buckets").split(","))
    batch_size = args.pop("pl_batch")
    out_buckets = args.pop("pl_num_buckets")
    shard_size = args.pop("shard_size")

    vocab, rev_vocab = text.initialize_vocabulary(
        path.join(args["vocab_dir"], "char.vocab"))
    cfg = config_lib.process_args(args, {"char": len(vocab)})
    tc = cfg.train
    # Subword corpora must re-encode hypotheses the way the model was
    # trained (data/bpe.py), or the written targets would be garbage.
    from e2e_asr_tpu.data.bpe import is_bpe_vocab, sentence_to_ids_bpe
    bpe = is_bpe_vocab(rev_vocab)
    encode_fn = sentence_to_ids_bpe if bpe else text.sentence_to_ids

    params = step_lib.init_params(jax.random.PRNGKey(10), cfg.model)
    state = step_lib.create_state(params, cfg.model, cfg.lm)
    ckpt_path = ckpt_file or None
    if ckpt_path is None:
        for d in (tc.best_model_dir, tc.train_dir):
            found = ckpt_lib.latest_path(d)
            if found:
                ckpt_path = found[0]
                break
    if ckpt_path:
        state = ckpt_lib.restore(ckpt_path, state)
    print(f"Using the model from: {ckpt_path}")
    params = step_lib.lora_merged(state.params, cfg.model)
    compute_dtype = (jnp.bfloat16 if tc.compute_dtype == "bfloat16" else None)
    decode = _make_family_decoder(cfg.model, cfg.beam,
                                  compute_dtype=compute_dtype)

    files = sorted(glob.glob(audio_glob))
    if not files:
        raise FileNotFoundError(f"no audio matches {audio_glob}")
    print(f"Unlabeled files: {len(files)}")

    # Featurize and group into static frame buckets.
    by_bucket: dict[int, list] = {b: [] for b in frame_buckets}
    skipped_long = 0
    for f in files:
        wave, sr = read_audio(f)
        feats = featurize_utterance(wave, sample_rate=sr,
                                    n_mels=cfg.model.feat_length)
        b = next((b for b in frame_buckets if feats.shape[0] <= b), None)
        if b is None:
            skipped_long += 1
            continue
        uid = path.splitext(path.basename(f))[0]
        by_bucket[b].append((uid, np.asarray(feats, np.float32)))
    if skipped_long:
        print(f"Skipped {skipped_long} files longer than "
              f"{frame_buckets[-1]} frames (segment them upstream)")

    kept, dropped = [], 0
    transcripts: list[tuple[str, str]] = []
    for b, items in by_bucket.items():
        for s in range(0, len(items), batch_size):
            group = items[s:s + batch_size]
            n = len(group)
            feats = np.zeros((batch_size, b, cfg.model.feat_length),
                             np.float32)
            lens = np.zeros((batch_size,), np.int32)
            for i, (_, fm) in enumerate(group):
                feats[i, : fm.shape[0]] = fm
                lens[i] = fm.shape[0]
            tokens, out_lens, _ = decode(params, {
                "logmel": jnp.asarray(feats),
                "logmel_len": jnp.asarray(np.maximum(lens, 1))})
            tokens, out_lens = np.asarray(tokens), np.asarray(out_lens)
            for i, (uid, fm) in enumerate(group):
                sent = text.ids_to_sentence(tokens[i][: out_lens[i]],
                                            rev_vocab)
                _, words = text.get_relevant_words(sent)
                if len(words) < min_words:
                    dropped += 1
                    continue
                hyp = " ".join(words)
                ids = np.asarray(encode_fn(hyp, vocab), np.int64)
                kept.append((uid, fm, ids))
                transcripts.append((uid, hyp))

    print(f"Pseudo-labeled {len(kept)} / dropped {dropped} "
          f"(< {min_words} words)")
    tf_dir = path.join(out_dir, "tfrecords")
    write_split(kept, tf_dir, "train_1k", num_buckets=out_buckets,
                shard_size=shard_size)
    write_lm_from_transcripts([t for _, t in transcripts], vocab,
                              path.join(tf_dir, "lm", "lm.0001"),
                              encode_fn=sentence_to_ids_bpe if bpe else None)
    os.makedirs(out_dir, exist_ok=True)
    with open(path.join(out_dir, "pseudo_transcripts.tsv"), "w") as f:
        for uid, hyp in transcripts:
            f.write(f"{uid}\t{hyp}\n")
    print(f"Corpus at: {tf_dir}")
    return {"kept": len(kept), "dropped": dropped,
            "skipped_long": skipped_long}


if __name__ == "__main__":
    main()
