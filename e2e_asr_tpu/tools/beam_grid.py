"""Beam hyperparameter grid search — in-process and resumable.

Replaces /root/reference/grid_search_for_beam.py, which swept beam
configurations by shelling out to main.py and parsing stdout. Here the sweep
runs in-process against already-loaded params and encoder outputs are shared
between configurations (the expensive encoder pass happens once per batch per
dataset, and only the jitted beam step recompiles per beam size).

Sweep space preserved (grid_search_for_beam.py:52-76):
    beam_size in {4, 8, 16} x cov_penalty in linspace(0.05, 0.25, 5)
    x lm_weight in {0, 0.05, 0.1} (when use_lm)
Resumable via an append-only perf.txt (grid_search_for_beam.py:59-75); the
lm_weight dimension is pruned when a configuration is >= 0.05 worse than the
best so far (grid_search_for_beam.py:99-104). cov_penalty remains a no-op in
the reference scorer and here, but stays in the sweep for parity of artifacts.

Extension: `ilm_weights` adds the internal-LM-subtraction knob (-ilm_weight,
eval/beam.py ILME) as a fourth sweep dimension — default (0,) keeps the
reference's sweep space. Old 4-field perf.txt files resume as ilm=0 rows.
"""
from __future__ import annotations

import os
from os import path

import numpy as np

from e2e_asr_tpu.config import BeamConfig, Seq2SeqConfig
from e2e_asr_tpu.eval.beam_eval import BeamEvaluator


def load_perf(perf_file: str) -> dict:
    perf = {}
    if path.isfile(perf_file):
        try:
            with open(perf_file) as f:
                for line in f:
                    fields = line.strip().split()
                    if len(fields) == 4:          # pre-ilm files: ilm = 0
                        (beam_size, cov, lmw), err = fields[:3], fields[3]
                        ilm = "0"
                    else:
                        (beam_size, cov, lmw, ilm), err = (fields[:4],
                                                           fields[4])
                    perf[(int(beam_size), round(float(cov), 4),
                          round(float(lmw), 4),
                          round(float(ilm), 4))] = float(err)
            print(f"Loaded {len(perf)} entries from grid search")
        except ValueError:
            perf = {}
    return perf


def grid_search(params, model_cfg: Seq2SeqConfig, rev_vocab, dev_batches_fn,
                out_dir: str, *, use_lm: bool = False, lm_params=None,
                compute_dtype=None,
                beam_sizes=(4, 8, 16),
                cov_penalties=None,
                lm_weights=None,
                ilm_weights=(0,),
                test_batches_fn=None) -> tuple[BeamConfig, float]:
    """dev_batches_fn: () -> iterable of dataset batches (fresh per config).

    Returns (best BeamConfig, best dev score). When `test_batches_fn` is
    given, the best dev config is then run on the test set with full scoring
    artifacts written to {out_dir}/final_eval (the reference's last step,
    grid_search_for_beam.py:113-124)."""
    if cov_penalties is None:
        cov_penalties = list(np.linspace(0.05, 0.25, num=5))
    if lm_weights is None:
        lm_weights = [0, 0.05, 0.1] if use_lm else [0]

    os.makedirs(out_dir, exist_ok=True)
    perf_file = path.join(out_dir, "perf.txt")
    perf = load_perf(perf_file)

    best_err, best_cfg = 1.0, BeamConfig(beam_size=1)
    with open(perf_file, "a") as perf_f:
        for beam_size in beam_sizes:
            print(f"\nBeam size: {beam_size}")
            for cov in cov_penalties:
                for ilm in ilm_weights:
                    for lmw in lm_weights:
                        key = (beam_size, round(float(cov), 4),
                               round(float(lmw), 4), round(float(ilm), 4))
                        if key in perf:
                            print("From previous exec: ", end="")
                            err = perf[key]
                        else:
                            beam_cfg = BeamConfig(beam_size=beam_size,
                                                  cov_penalty=float(cov),
                                                  lm_weight=float(lmw),
                                                  ilm_weight=float(ilm))
                            evaluator = BeamEvaluator(
                                model_cfg, beam_cfg, rev_vocab, out_dir,
                                compute_dtype=compute_dtype,
                                lm_params=lm_params)
                            err = evaluator(params, dev_batches_fn(),
                                            write_files=False)
                            perf_f.write(f"{beam_size} {cov:.4f} {lmw:.4f} "
                                         f"{ilm:.4f} {err:f}\n")
                            perf_f.flush()
                            perf[key] = err
                        print(f"ASR Error: {err:.4f}, Beam size: {beam_size}, "
                              f"cov penalty: {cov:.2f} lm weight: {lmw:.2f}"
                              + (f" ilm weight: {ilm:.2f}"
                                 if len(ilm_weights) > 1 else ""))
                        if err > best_err + 0.05:
                            print("Not exploring further increasing lm_weight")
                            break
                        if best_err > err:
                            print("Best config updated!!")
                            best_err = err
                            best_cfg = BeamConfig(beam_size=beam_size,
                                                  cov_penalty=float(cov),
                                                  lm_weight=float(lmw),
                                                  ilm_weight=float(ilm))

    if test_batches_fn is not None:
        final_dir = path.join(out_dir, "final_eval")
        os.makedirs(final_dir, exist_ok=True)
        evaluator = BeamEvaluator(model_cfg, best_cfg, rev_vocab, final_dir,
                                  compute_dtype=compute_dtype,
                                  lm_params=lm_params)
        test_err = evaluator(params, test_batches_fn(), write_files=True)
        print(f"Final test ASR Error: {test_err:.4f} "
              f"(beam {best_cfg.beam_size}, lm_weight {best_cfg.lm_weight})")
        with open(path.join(final_dir, "score.txt"), "w") as f:
            f.write(f"beam_size {best_cfg.beam_size} "
                    f"cov_penalty {best_cfg.cov_penalty:.4f} "
                    f"lm_weight {best_cfg.lm_weight:.4f} "
                    f"ilm_weight {best_cfg.ilm_weight:.4f} "
                    f"dev_err {best_err:f} test_err {test_err:f}\n")
    return best_cfg, best_err
