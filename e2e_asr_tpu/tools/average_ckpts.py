"""Checkpoint averaging: arithmetic mean of parameter leaves across N
checkpoints.

Standard ASR inference trick (the reference keeps only best-2 checkpoints,
train.py:203; averaging the last/best few typically buys a small WER gain).
Optimizer state and counters are taken from the LAST checkpoint.

Usage:
    python -m e2e_asr_tpu.tools.average_ckpts out.npz ckpt1.npz ckpt2.npz ...
"""
from __future__ import annotations

import sys

import numpy as np


def average_named(dicts: list[dict]) -> dict:
    """Average float parameter leaves; optimizer state (opt_state/..., which
    includes the LR hyperparam) and integer counters come from the LAST
    checkpoint. Works for both full TrainState checkpoints (params/...) and
    bare parameter trees (encoder/..., decoder_.../...)."""
    out = dict(dicts[-1])
    for name in out:
        if name.startswith(("opt_state", "lm_opt_state")):
            continue
        stack = [d[name] for d in dicts if name in d]
        if len(stack) == len(dicts) and np.issubdtype(
                np.asarray(stack[0]).dtype, np.floating):
            out[name] = np.mean(np.stack(stack), axis=0).astype(
                np.asarray(stack[0]).dtype)
    return out


def average_files(paths: list[str]) -> dict:
    dicts = []
    for p in paths:
        with np.load(p) as z:
            dicts.append({k: z[k] for k in z.files})
    return average_named(dicts)


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    out_path, in_paths = argv[0], argv[1:]
    avg = average_files(in_paths)
    with open(out_path, "wb") as f:
        np.savez(f, **avg)
    print(f"averaged {len(in_paths)} checkpoints -> {out_path}")


if __name__ == "__main__":
    main()
