"""CLI entry point: train or evaluate (dev/test).

Mirrors /root/reference/main.py: aggregates every component's flags, derives
the run-name-encoding train directory, loads vocabularies to size the
decoders, writes parameters.txt, and dispatches train vs dev/test eval
(greedy when beam_size==1 and lm_weight==0, beam search otherwise —
main.py:217-222).

Usage:
    python -m e2e_asr_tpu.cli.main [flags]          # train
    python -m e2e_asr_tpu.cli.main -dev  [flags]    # dev eval
    python -m e2e_asr_tpu.cli.main -test [flags]    # test (eval2000*) eval
"""
from __future__ import annotations

import argparse
import glob
import os
import time
from os import path

from e2e_asr_tpu import config as config_lib
from e2e_asr_tpu.config import ExperimentConfig


def parse_options(argv=None) -> ExperimentConfig:
    parser = argparse.ArgumentParser()
    config_lib.add_parse_options(parser)
    args = vars(parser.parse_args(argv))

    # Load vocabularies to size the decoders (main.py:108-113).
    tasks = config_lib.parse_tasks(args.get("tasks", ""))
    vocab_sizes = {}
    from e2e_asr_tpu.data import text
    for task in tasks:
        vocab_path = path.join(args["vocab_dir"], f"{task}.vocab")
        if path.isfile(vocab_path):
            vocab, _ = text.initialize_vocabulary(vocab_path)
            vocab_sizes[task] = len(vocab)

    cfg = config_lib.process_args(args, vocab_sizes)

    if not cfg.dev and not cfg.test:
        os.makedirs(cfg.train.train_dir, exist_ok=True)
        os.makedirs(cfg.train.best_model_dir, exist_ok=True)
        if cfg.train.dist_pid == 0:     # multi-host: one writer per run dir
            with open(path.join(cfg.train.train_dir, "parameters.txt"),
                      "w") as f:
                f.write(config_lib.config_to_text(cfg) + "\n")
    return cfg


def launch_train(cfg: ExperimentConfig) -> None:
    if cfg.train.ssl:
        from e2e_asr_tpu.train.ssl import SSLTrainer
        SSLTrainer(cfg).train()
        return
    from e2e_asr_tpu.train.loop import Trainer
    Trainer(cfg).train()


def launch_eval(cfg: ExperimentConfig) -> None:
    import jax.numpy as jnp

    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.data.speech import SpeechDataset
    from e2e_asr_tpu.eval.beam_eval import BeamEvaluator
    from e2e_asr_tpu.eval.greedy import GreedyEvaluator
    from e2e_asr_tpu.train import step as step_lib
    from e2e_asr_tpu.train.loop import Trainer

    tc = cfg.train
    trainer = Trainer(cfg, use_mesh=False)
    if cfg.dev:
        _, dev_set = trainer.get_data_sets()
    else:
        test_files = sorted(glob.glob(path.join(tc.data_dir, "eval2000*")))
        print(f"Total test files: {len(test_files)}")
        dev_set = SpeechDataset(test_files, 64, tc.feat_length,
                                is_training=False, tasks=("char",))

    # Restore: prefer best_model_dir, else train_dir, else fresh init
    # (main.py:203-215).
    import jax
    params = step_lib.init_params(jax.random.PRNGKey(10), cfg.model)
    # -ema_decay checkpoints carry EMA shadow leaves; the template must
    # match the archive (restore is strict by name).
    state = step_lib.create_state(params, cfg.model, cfg.lm,
                                  ema=tc.ema_decay > 0 or tc.eval_ema)
    ckpt_path = None
    if tc.eval_avg_ckpts > 1:
        # Checkpoint-averaged eval (extension; tools/average_ckpts math).
        found = ckpt_lib.restore_averaged(tc.train_dir, state,
                                          tc.eval_avg_ckpts)
        if found:
            state, used = found
            ckpt_path = f"avg of {[path.basename(p) for p in used]}"
    if ckpt_path is None:
        for d in (tc.best_model_dir, tc.train_dir):
            found = ckpt_lib.latest_path(d)
            if found:
                ckpt_path = found[0]
                state = ckpt_lib.restore(ckpt_path, state)
                break
    print(f"Using the model from: {ckpt_path}")
    eval_params = state.ema_params if tc.eval_ema else state.params
    # LoRA runs decode the merged view (adapters folded into the kernels,
    # core/lora.py) — downstream beams/kernels/quantization see a plain tree.
    eval_params = step_lib.lora_merged(eval_params, cfg.model)
    if tc.quantize == "int8":
        from e2e_asr_tpu.core import quant
        eval_params = quant.quantize(eval_params)
        print("Quantized params to int8 (weight-only, per-channel)")

    vocab, rev_vocab = text.initialize_vocabulary(
        path.join(tc.vocab_dir, "char.vocab"))
    compute_dtype = (jnp.bfloat16 if tc.compute_dtype == "bfloat16" else None)

    bias = None
    if cfg.beam.boost_phrases and cfg.beam.boost_weight != 0.0:
        from e2e_asr_tpu.data.bpe import is_bpe_vocab
        from e2e_asr_tpu.eval import biasing
        phrases = biasing.load_phrases(cfg.beam.boost_phrases, vocab,
                                       bpe=is_bpe_vocab(rev_vocab))
        bias = (biasing.build_bias_trie(phrases, len(rev_vocab)),
                cfg.beam.boost_weight)
        print(f"Contextual biasing: {len(phrases)} phrases, "
              f"boost {cfg.beam.boost_weight}")

    # Trigram table or (possibly differently-shaped) RNN-LM checkpoint —
    # see eval/lm_loader.py for the artifact semantics.
    from e2e_asr_tpu.eval.lm_loader import load_fusion_lm
    lm_params = load_fusion_lm(cfg.beam.lm_path, cfg.model, rev_vocab,
                               max_steps=cfg.beam.max_steps)

    # -data_axis > 1 at eval: decode batches shard over a ("data",) mesh
    # (utterances are independent, so DP decoding is exact; batches whose
    # rows don't divide fall back to unsharded).
    mesh = None
    if tc.data_axis > 1:
        from e2e_asr_tpu.core import mesh as mesh_lib
        n = min(tc.data_axis, len(jax.devices()))
        mesh = mesh_lib.make_mesh(n_data=n, n_model=1)
        print(f"Eval data parallelism: {n}-way")

    start = time.time()
    if cfg.model.model_family == "ctc":
        if cfg.beam.ilm_weight != 0.0:
            raise ValueError("-ilm_weight needs a decoder with an internal "
                             "LM (attention or transducer family); pure CTC "
                             "has none — its fusion is already density-free")
        from e2e_asr_tpu.eval.greedy import CTCEvaluator
        evaluator = CTCEvaluator(cfg.model, rev_vocab, tc.best_model_dir,
                                 compute_dtype=compute_dtype,
                                 beam_size=cfg.beam.beam_size,
                                 lm_params=lm_params,
                                 lm_weight=cfg.beam.lm_weight,
                                 lm_rescore=cfg.beam.lm_rescore, bias=bias,
                                 nbest=cfg.beam.nbest, mesh=mesh)
        evaluator.score_unit = tc.score_unit
        evaluator(eval_params, dev_set.epoch())
    elif cfg.model.model_family == "transducer":
        from e2e_asr_tpu.eval.greedy import TransducerEvaluator
        evaluator = TransducerEvaluator(cfg.model, rev_vocab,
                                        tc.best_model_dir,
                                        compute_dtype=compute_dtype,
                                        beam_size=cfg.beam.beam_size,
                                        lm_params=lm_params,
                                        lm_weight=cfg.beam.lm_weight,
                                        ilm_weight=cfg.beam.ilm_weight,
                                        lm_rescore=cfg.beam.lm_rescore,
                                        bias=bias, nbest=cfg.beam.nbest,
                                        mesh=mesh)
        evaluator.score_unit = tc.score_unit
        evaluator(eval_params, dev_set.epoch())
    elif (cfg.beam.beam_size == 1 and cfg.beam.lm_weight == 0.0
          and cfg.beam.ctc_rescore == 0.0 and cfg.beam.joint_ctc == 0.0
          and cfg.beam.ilm_weight == 0.0 and cfg.beam.lm_rescore == 0.0
          and bias is None and cfg.beam.nbest <= 1):
        evaluator = GreedyEvaluator(cfg.model, rev_vocab, tc.best_model_dir,
                                    compute_dtype=compute_dtype, mesh=mesh)
        evaluator.score_unit = tc.score_unit
        evaluator(eval_params, dev_set.epoch())
    else:
        evaluator = BeamEvaluator(cfg.model, cfg.beam, rev_vocab,
                                  tc.best_model_dir,
                                  compute_dtype=compute_dtype,
                                  lm_params=lm_params, bias=bias,
                                  nbest=cfg.beam.nbest, mesh=mesh)
        evaluator.score_unit = tc.score_unit
        evaluator(eval_params, dev_set.epoch())
    print(f"Total decoding time: {time.time() - start:.1f}s")


def maybe_init_backend(cfg: ExperimentConfig) -> None:
    """Apply -platform and join the multi-host job (-dist_coordinator)
    BEFORE any jax backend use. jax.config.update (not env JAX_PLATFORMS —
    interpreter-startup hooks can override the env var) must precede
    jax.distributed.initialize, which must precede the first computation.
    Validated for real by tools/multihost_smoke.py --driver. Safe no-op when
    neither flag is set."""
    tc = cfg.train
    import jax
    if tc.platform:
        jax.config.update("jax_platforms", tc.platform)
    if not tc.dist_coordinator:
        return
    if tc.chaos:
        # Each process would draw its own time-based seeds: the lm_prob coin
        # flips diverge and the processes stop agreeing on which collective
        # program to run — a deadlock, not a crash. Fail loudly instead.
        raise ValueError("-chaos is incompatible with -dist_coordinator: "
                         "multi-host lockstep needs deterministic seeds")
    jax.distributed.initialize(coordinator_address=tc.dist_coordinator,
                               num_processes=tc.dist_nprocs,
                               process_id=tc.dist_pid)
    if jax.process_count() != tc.dist_nprocs:
        raise RuntimeError(
            f"jax.distributed did not engage: process_count "
            f"{jax.process_count()} != -dist_nprocs {tc.dist_nprocs} (a "
            f"startup hook may have initialized the backend first — set "
            f"-platform explicitly)")
    print(f"dist: process {jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / {jax.device_count()} global "
          f"devices")


def main(argv=None) -> None:
    cfg = parse_options(argv)
    maybe_init_backend(cfg)
    if cfg.dev or cfg.test:
        if cfg.train.dist_coordinator and cfg.train.dist_pid != 0:
            # Decode runs on local devices only; one process suffices and
            # owns the artifact files.
            print("Eval runs on process 0 only; exiting.")
            return
        launch_eval(cfg)
    else:
        launch_train(cfg)


if __name__ == "__main__":
    main()
