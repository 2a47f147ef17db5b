"""Paired-bootstrap WER significance testing between two decode runs.

Answers "is system B actually better than system A, or is the WER delta
noise?" with the standard paired bootstrap over utterances (Bisani & Ney
2004): resample the utterance set with replacement many times, recompute
both systems' WER on each resample, and report the delta's confidence
interval plus the probability of improvement.

Inputs are the framework's own decode artifacts — `uid\\t<words>` lines as
written by every evaluator (gold_*.txt / decoded_*.txt / raw_N.txt), so
any two eval runs (different checkpoints, beam settings, LM weights,
families) compare directly:

    python -m e2e_asr_tpu.tools.compare_wer gold.txt sysA.txt sysB.txt

No reference counterpart (the reference reports a single WER number,
eval_model.py:111); this closes the "is the grid's best actually better"
loop of tools/beam_grid.py.
"""
from __future__ import annotations

import argparse

import numpy as np

from e2e_asr_tpu.eval.score import edit_distance


def read_refs(path: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            uid, _, sent = line.rstrip("\n").partition("\t")
            out[uid] = sent.split()
    return out


def per_utt_errors(gold: dict[str, list[str]], hyp: dict[str, list[str]]
                   ) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """-> (errors [N], ref_words [N], uids). Utterances missing from `hyp`
    count as fully deleted (the system produced nothing for them)."""
    uids = sorted(gold)
    errs = np.zeros(len(uids), np.float64)
    words = np.zeros(len(uids), np.float64)
    for i, uid in enumerate(uids):
        ref = gold[uid]
        h = hyp.get(uid, [])
        st = edit_distance(h, ref)
        errs[i] = st.insertions + st.deletions + st.substitutions
        words[i] = len(ref)
    return errs, words, uids


def paired_bootstrap(errs_a: np.ndarray, errs_b: np.ndarray,
                     words: np.ndarray, *, samples: int = 10000,
                     seed: int = 0) -> dict:
    """Resample utterances with replacement; returns WERs, the B-A delta's
    95% CI, and p_improve = P(WER_B < WER_A) over resamples."""
    rng = np.random.default_rng(seed)
    n = len(words)
    idx = rng.integers(0, n, size=(samples, n))
    w = words[idx].sum(axis=1)
    wer_a = errs_a[idx].sum(axis=1) / np.maximum(w, 1)
    wer_b = errs_b[idx].sum(axis=1) / np.maximum(w, 1)
    delta = wer_b - wer_a
    total_w = max(words.sum(), 1)
    return {
        "wer_a": errs_a.sum() / total_w,
        "wer_b": errs_b.sum() / total_w,
        "delta": (errs_b.sum() - errs_a.sum()) / total_w,
        "ci_low": float(np.percentile(delta, 2.5)),
        "ci_high": float(np.percentile(delta, 97.5)),
        "p_improve": float(np.mean(wer_b < wer_a)),
        "n_utts": n,
    }


def compare(gold_path: str, a_path: str, b_path: str, *,
            samples: int = 10000, seed: int = 0) -> dict:
    gold = read_refs(gold_path)
    errs_a, words, _ = per_utt_errors(gold, read_refs(a_path))
    errs_b, _, _ = per_utt_errors(gold, read_refs(b_path))
    return paired_bootstrap(errs_a, errs_b, words, samples=samples,
                            seed=seed)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("gold", help="gold_*.txt (uid\\twords)")
    p.add_argument("sys_a", help="system A decode artifact")
    p.add_argument("sys_b", help="system B decode artifact")
    p.add_argument("-samples", type=int, default=10000)
    p.add_argument("-seed", type=int, default=0)
    args = p.parse_args(argv)
    r = compare(args.gold, args.sys_a, args.sys_b, samples=args.samples,
                seed=args.seed)
    print(f"Utterances: {r['n_utts']}")
    print(f"WER A: {r['wer_a']:.4f}")
    print(f"WER B: {r['wer_b']:.4f}")
    print(f"Delta (B-A): {r['delta']:+.4f}  "
          f"95% CI [{r['ci_low']:+.4f}, {r['ci_high']:+.4f}]")
    print(f"P(B better): {r['p_improve']:.3f}")


if __name__ == "__main__":
    main()
