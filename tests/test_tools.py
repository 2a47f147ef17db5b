"""Grid search + summary writer tests."""
import os
import struct

import jax
import numpy as np

from e2e_asr_tpu.core.summary import SummaryWriter
from e2e_asr_tpu.data import example as pb
from e2e_asr_tpu.data import tfrecord


def test_summary_writer_produces_readable_events(tmp_path):
    logdir = str(tmp_path)
    w = SummaryWriter(logdir)
    w.scalar("ASR Error", 0.42, step=500)
    w.scalar("Learning rate", 1e-3, step=500)
    w.close()
    files = [f for f in os.listdir(logdir) if f.startswith("events.out")]
    assert len(files) == 1
    events = list(tfrecord.read_records(os.path.join(logdir, files[0]),
                                        verify=True))
    assert len(events) == 3  # file-version + 2 scalars
    # Decode the second event: step + summary value.
    tags, values, steps = [], [], []
    for ev in events[1:]:
        for field, wire, val, _ in pb.iter_fields(ev):
            if field == 2:
                steps.append(val)
            if field == 5:
                for f2, _, v2, _ in pb.iter_fields(val):
                    if f2 == 1:
                        for f3, w3, v3, _ in pb.iter_fields(v2):
                            if f3 == 1:
                                tags.append(v3.decode())
                            if f3 == 2:
                                values.append(struct.unpack("<f", v3)[0])
    assert tags == ["ASR Error", "Learning rate"]
    np.testing.assert_allclose(values[0], 0.42, rtol=1e-6)
    assert steps == [500, 500]


def test_grid_search_resumable(tmp_path, rng):
    """Grid search over a tiny model: runs, writes perf.txt, and resumes
    without recomputing."""
    from e2e_asr_tpu.tools.beam_grid import grid_search, load_perf
    from tests.test_seq2seq import make_batch, tiny_cfg
    from e2e_asr_tpu.models import seq2seq

    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    rev_vocab = ["<pad>", "<go>", "<eos>"] + list("abcdefgh")
    batch = make_batch(rng, cfg)
    batch["valid"] = np.array([True, True])
    batch["utt_ids"] = ["u0", "u1"]

    out_dir = str(tmp_path)
    best_cfg, best_err = grid_search(
        params, cfg, rev_vocab, lambda: [batch], out_dir,
        beam_sizes=(2,), cov_penalties=[0.05], lm_weights=[0])
    assert os.path.isfile(os.path.join(out_dir, "perf.txt"))
    perf = load_perf(os.path.join(out_dir, "perf.txt"))
    assert (2, 0.05, 0.0, 0.0) in perf
    # Untrained params give WER >= 1.0, which does not strictly beat the
    # initial best of 1.0 (same as the reference's update rule), so best_cfg
    # may remain the default; the sweep itself must have recorded the entry.
    assert 0.0 <= perf[(2, 0.05, 0.0, 0.0)]

    # Resume: same sweep loads from perf.txt (file unchanged afterwards).
    mtime = os.path.getmtime(os.path.join(out_dir, "perf.txt"))
    size = os.path.getsize(os.path.join(out_dir, "perf.txt"))
    grid_search(params, cfg, rev_vocab, lambda: [batch], out_dir,
                beam_sizes=(2,), cov_penalties=[0.05], lm_weights=[0])
    assert os.path.getsize(os.path.join(out_dir, "perf.txt")) == size


def test_grid_search_ilm_dimension_and_legacy_resume(tmp_path, rng):
    """ilm_weights adds a 4th sweep dimension; pre-ilm 4-field perf.txt
    files resume as ilm=0 rows (no recompute of the legacy entries)."""
    from e2e_asr_tpu.tools.beam_grid import grid_search, load_perf
    from tests.test_seq2seq import make_batch, tiny_cfg
    from e2e_asr_tpu.models import seq2seq

    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    rev_vocab = ["<pad>", "<go>", "<eos>"] + list("abcdefgh")
    batch = make_batch(rng, cfg)
    batch["valid"] = np.array([True, True])
    batch["utt_ids"] = ["u0", "u1"]

    # Legacy 4-field file: the (2, 0.05, 0) cell is pre-computed at a
    # sentinel error value the sweep could never produce.
    out_dir = str(tmp_path)
    with open(os.path.join(out_dir, "perf.txt"), "w") as f:
        f.write("2 0.0500 0.0000 0.123456\n")
    grid_search(params, cfg, rev_vocab, lambda: [batch], out_dir,
                beam_sizes=(2,), cov_penalties=[0.05], lm_weights=[0],
                ilm_weights=[0, 0.2])
    perf = load_perf(os.path.join(out_dir, "perf.txt"))
    assert perf[(2, 0.05, 0.0, 0.0)] == 0.123456   # resumed, not recomputed
    assert (2, 0.05, 0.0, 0.2) in perf             # new ilm row swept


def test_grid_search_final_test_eval(tmp_path, rng):
    """With test_batches_fn the best dev config runs on the test set and the
    final_eval/ scoring artifacts are written (the reference's last step,
    grid_search_for_beam.py:113-124)."""
    from e2e_asr_tpu.tools.beam_grid import grid_search
    from tests.test_seq2seq import make_batch, tiny_cfg
    from e2e_asr_tpu.models import seq2seq

    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    rev_vocab = ["<pad>", "<go>", "<eos>"] + list("abcdefgh")
    dev_batch = make_batch(rng, cfg)
    dev_batch["valid"] = np.array([True, True])
    dev_batch["utt_ids"] = ["u0", "u1"]
    test_batch = make_batch(np.random.default_rng(7), cfg)
    test_batch["valid"] = np.array([True, True])
    test_batch["utt_ids"] = ["t0", "t1"]

    out_dir = str(tmp_path)
    grid_search(params, cfg, rev_vocab, lambda: [dev_batch], out_dir,
                beam_sizes=(2,), cov_penalties=[0.05], lm_weights=[0],
                test_batches_fn=lambda: [test_batch])
    final = os.path.join(out_dir, "final_eval")
    assert os.path.isfile(os.path.join(final, "score.txt"))
    line = open(os.path.join(final, "score.txt")).read()
    assert "test_err" in line and "beam_size" in line
    # Decoded-output artifacts for the test set exist.
    assert any(f.startswith(("decoded", "raw", "gold"))
               for f in os.listdir(final))


def test_compare_wer_bootstrap(tmp_path):
    """Paired bootstrap: a clearly better system gets p_improve ~ 1 and a
    CI excluding zero; identical systems get delta 0."""
    import numpy as np

    from e2e_asr_tpu.tools import compare_wer

    rng = np.random.default_rng(0)
    gold_lines, a_lines, b_lines = [], [], []
    for i in range(60):
        words = [f"w{rng.integers(0, 50)}" for _ in range(8)]
        gold_lines.append(f"u{i}\t{' '.join(words)}")
        # System B: exact. System A: 2 substitutions per utterance.
        wrong = list(words)
        wrong[0], wrong[3] = "xx", "yy"
        a_lines.append(f"u{i}\t{' '.join(wrong)}")
        b_lines.append(f"u{i}\t{' '.join(words)}")
    gold = tmp_path / "gold.txt"
    fa = tmp_path / "a.txt"
    fb = tmp_path / "b.txt"
    gold.write_text("\n".join(gold_lines) + "\n")
    fa.write_text("\n".join(a_lines) + "\n")
    fb.write_text("\n".join(b_lines) + "\n")

    r = compare_wer.compare(str(gold), str(fa), str(fb), samples=2000)
    assert r["wer_b"] == 0.0
    assert abs(r["wer_a"] - 0.25) < 1e-9          # 2/8 per utterance
    assert r["p_improve"] == 1.0
    assert r["ci_high"] < 0.0                     # B better, CI excludes 0

    r2 = compare_wer.compare(str(gold), str(fa), str(fa), samples=500)
    assert r2["delta"] == 0.0 and r2["p_improve"] == 0.0

    # Missing utterances count as full deletions.
    fb2 = tmp_path / "b2.txt"
    fb2.write_text("\n".join(b_lines[:30]) + "\n")
    r3 = compare_wer.compare(str(gold), str(fa), str(fb2), samples=200)
    assert r3["wer_b"] > 0.4

    # CLI entry point prints the report.
    compare_wer.main([str(gold), str(fa), str(fb), "-samples", "200"])
