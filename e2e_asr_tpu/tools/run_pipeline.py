"""One-command corpus -> WER parity pipeline.

The reference workflow is prepare data -> train (`main.py`) -> beam grid
search -> final test eval (`grid_search_for_beam.py:113-124` runs the best
dev config on test through `score.sh`). This tool runs that whole chain from
a mounted corpus with one command, so the day a real speech corpus appears,
reference-WER parity is one invocation away:

    python -m e2e_asr_tpu.tools.run_pipeline \
        -corpus /mnt/LibriSpeech -out /work/ls100 [model/training flags...]

Stages (each resumable / individually skippable):
  1. prepare   raw audio + transcripts -> bucketed TFRecords + vocab + LM
               corpus (tools/prepare_corpus.py; skipped when
               {out}/tfrecords already holds shards).
  2. train     the standard CLI driver (cli/main.py) with the flagship
               defaults, resuming from checkpoints automatically; every
               unrecognized flag is forwarded verbatim (e.g. -hsize 512,
               -lm_prob 0.1, -model_axis 2).
  3. grid      restore the best checkpoint, sweep the reference beam grid
               (beam in {4,8,16} x cov x lm_weight, resumable perf.txt) on
               dev, then run the best config on the test set
               (tools/beam_grid.py) -> {out}/grid/final_eval/score.txt.

-corpus expects LibriSpeech layout: split directories whose names contain
"train" / "dev" / "test" anywhere under it; or pass explicit -train_dirs /
-dev_dirs / -test_dirs / -*_manifest (prepare_corpus modes).
"""
from __future__ import annotations

import argparse
import glob
import os
from os import path


def _find_splits(corpus: str) -> dict[str, list[str]]:
    """LibriSpeech convention: top-level split dirs named by split."""
    splits: dict[str, list[str]] = {"train": [], "dev": [], "test": []}
    for entry in sorted(os.listdir(corpus)):
        full = path.join(corpus, entry)
        if not path.isdir(full):
            continue
        for split in splits:
            if split in entry.lower():
                splits[split].append(full)
                break
    return splits


def _has_shards(tfrec_dir: str) -> bool:
    return bool(glob.glob(path.join(tfrec_dir, "train_1k.*")))


def run(args, extra_flags: list[str]) -> str:
    from e2e_asr_tpu.tools import prepare_corpus

    out = args.out
    tfrec = path.join(out, "tfrecords")
    vocab_dir = path.join(out, "vocab")

    # ---- stage 1: prepare --------------------------------------------------
    if args.skip_prepare or _has_shards(tfrec):
        print(f"[pipeline] prepare: skipped ({tfrec} already populated)")
    else:
        train_dirs, dev_dirs, test_dirs = (args.train_dirs, args.dev_dirs,
                                           args.test_dirs)
        if args.corpus:
            found = _find_splits(args.corpus)
            train_dirs = train_dirs or found["train"]
            dev_dirs = dev_dirs or found["dev"]
            test_dirs = test_dirs or found["test"]
        if not train_dirs and not args.train_manifest:
            raise SystemExit("pipeline: no training data found — pass "
                             "-corpus with train*/dev* subdirs, or "
                             "-train_dirs/-train_manifest explicitly")
        print(f"[pipeline] prepare: train={train_dirs} dev={dev_dirs} "
              f"test={test_dirs}")
        prep_argv = ["-out", out, "-n_mels", str(args.n_mels),
                     "-num_buckets", str(args.num_buckets),
                     "-bpe_size", str(args.bpe_size)]
        if train_dirs:
            prep_argv += ["-train_dirs", *train_dirs]
        if dev_dirs:
            prep_argv += ["-dev_dirs", *dev_dirs]
        if test_dirs:
            prep_argv += ["-test_dirs", *test_dirs]
        if args.train_manifest:
            prep_argv += ["-train_manifest", args.train_manifest]
        if args.dev_manifest:
            prep_argv += ["-dev_manifest", args.dev_manifest]
        if args.test_manifest:
            prep_argv += ["-test_manifest", args.test_manifest]
        prepare_corpus.main(prep_argv)

    # ---- stage 2: train (standard CLI, resumable) --------------------------
    from e2e_asr_tpu.cli import main as cli_main

    cli_argv = ["-data_dir", tfrec, "-vocab_dir", vocab_dir,
                "-tb_dir", path.join(out, "models"),
                "-feat_len", str(args.n_mels)]
    lm_dir = path.join(tfrec, "lm")
    if glob.glob(path.join(lm_dir, "*")):
        cli_argv += ["-lm_data_dir", lm_dir]
    cli_argv += extra_flags
    if args.skip_train:
        print("[pipeline] train: skipped")
    else:
        print(f"[pipeline] train: cli.main {' '.join(cli_argv)}")
        cli_main.main(list(cli_argv))

    # ---- stage 3: beam grid + final test eval ------------------------------
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.data.speech import SpeechDataset
    from e2e_asr_tpu.models import rnn_lm
    from e2e_asr_tpu.tools.beam_grid import grid_search
    from e2e_asr_tpu.train import step as step_lib

    cfg = cli_main.parse_options(list(cli_argv))
    params0 = step_lib.init_params(jax.random.PRNGKey(10), cfg.model)
    template = step_lib.create_state(params0, cfg.model, cfg.lm)
    restored = (ckpt_lib.restore_latest(cfg.train.best_model_dir, template)
                or ckpt_lib.restore_latest(cfg.train.train_dir, template))
    if restored is None:
        raise SystemExit(f"pipeline: no checkpoint under "
                         f"{cfg.train.best_model_dir} — did training run?")
    state, meta = restored
    state = state._replace(
        params=step_lib.lora_merged(state.params, cfg.model))
    print(f"[pipeline] grid: restored checkpoint meta={meta}")

    _, rev_vocab = text.initialize_vocabulary(
        path.join(vocab_dir, "char.vocab"))
    dev_files = sorted(glob.glob(path.join(tfrec, "dev*")))
    test_files = sorted(glob.glob(path.join(tfrec, "eval2000*")))
    if not dev_files:
        raise SystemExit(f"pipeline: no dev shards under {tfrec}")
    batch = cfg.train.buck_batch_size[-1]
    dev = SpeechDataset(dev_files, batch, cfg.model.feat_length,
                        is_training=False)
    test = (SpeechDataset(test_files, batch, cfg.model.feat_length,
                          is_training=False) if test_files else None)
    use_lm = cfg.train.lm_prob > 0
    compute_dtype = (jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
                     else None)
    if cfg.model.model_family != "attention":
        # The beam grid sweeps the ATTENTION beam's knobs
        # (grid_search_for_beam.py parity); the CTC/transducer families get
        # a direct dev + test eval at the configured beam size instead.
        from e2e_asr_tpu.eval.greedy import CTCEvaluator, TransducerEvaluator
        ev_cls = (CTCEvaluator if cfg.model.model_family == "ctc"
                  else TransducerEvaluator)
        final_dir = path.join(out, "grid", "final_eval")
        dev_err = ev_cls(cfg.model, rev_vocab, final_dir,
                         compute_dtype=compute_dtype,
                         beam_size=cfg.beam.beam_size)(
            state.params, dev.epoch())
        lines = [f"family {cfg.model.model_family} "
                 f"beam {cfg.beam.beam_size}",
                 f"dev err: {dev_err:.4f}"]
        if test is not None:
            test_err = ev_cls(cfg.model, rev_vocab, final_dir,
                              compute_dtype=compute_dtype,
                              beam_size=cfg.beam.beam_size,
                              file_prefix="test")(state.params, test.epoch())
            lines.append(f"test err: {test_err:.4f}")
        report = path.join(final_dir, "score.txt")
        with open(report, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"[pipeline] done ({cfg.model.model_family}): "
              f"dev err {dev_err:.4f}")
        print(f"[pipeline] WER report: {report}")
        print(open(report).read().strip())
        return report
    best_cfg, best_err = grid_search(
        state.params, cfg.model, rev_vocab, lambda: dev.epoch(),
        path.join(out, "grid"), use_lm=use_lm,
        lm_params=rnn_lm.shared_lm_params(state.params) if use_lm else None,
        compute_dtype=compute_dtype,
        test_batches_fn=(lambda: test.epoch()) if test else None)
    report = path.join(out, "grid", "final_eval", "score.txt")
    print(f"[pipeline] done: best dev err {best_err:.4f} "
          f"(beam {best_cfg.beam_size}, lm_weight {best_cfg.lm_weight})")
    if path.isfile(report):
        print(f"[pipeline] WER report: {report}")
        print(open(report).read().strip())
    return report


def main(argv=None) -> str:
    # add_help=False: forwarded model flags are single-dash (-hsize, ...) and
    # would prefix-match argparse's -h; use -help for usage.
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter, add_help=False)
    p.add_argument("-help", action="help")
    p.add_argument("-corpus", default="", help="Corpus root (LibriSpeech "
                   "layout: split dirs named *train*/*dev*/*test*)")
    p.add_argument("-out", required=True, help="Working directory")
    p.add_argument("-train_dirs", nargs="*", default=[])
    p.add_argument("-dev_dirs", nargs="*", default=[])
    p.add_argument("-test_dirs", nargs="*", default=[])
    p.add_argument("-train_manifest", default="")
    p.add_argument("-dev_manifest", default="")
    p.add_argument("-test_manifest", default="")
    p.add_argument("-n_mels", type=int, default=80)
    p.add_argument("-num_buckets", type=int, default=5)
    p.add_argument("-bpe_size", type=int, default=0,
                   help="subword (BPE) vocab size for prepare (0 = chars)")
    p.add_argument("-skip_prepare", action="store_true")
    p.add_argument("-skip_train", action="store_true")
    args, extra = p.parse_known_args(argv)
    return run(args, extra)


if __name__ == "__main__":
    main()
