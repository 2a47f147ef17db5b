"""-score_unit char: CER over the same filler-filtered text."""
import numpy as np

from e2e_asr_tpu.eval.greedy import GreedyEvaluator


def _stub_evaluator(tmp_path, ids, score_unit):
    ev = GreedyEvaluator.__new__(GreedyEvaluator)
    # vocab: specials + ▁ a b c
    ev.rev_vocab = ["<pad>", "<go>", "<eos>", "▁", "a", "b", "c"]
    ev.out_dir = str(tmp_path)
    ev.file_prefix = "asr"
    ev._decode = lambda **kw: np.asarray(ids)
    ev.score_unit = score_unit
    return ev


def test_cer_vs_wer(tmp_path):
    # gold: "ab" ; hyp: "ac" -> WER 1/1 = 1.0, CER 1/2 = 0.5.
    batch = {
        "logmel": np.zeros((1, 4, 3), np.float32),
        "logmel_len": np.array([4]),
        "char": np.array([[1, 3, 4, 5, 2]]),     # <go> ▁ a b <eos>
        "valid": np.array([True]),
        "utt_ids": ["u0"],
    }
    hyp = np.array([[3, 4, 6, 2, 0]])            # ▁ a c <eos>
    wer = _stub_evaluator(tmp_path, hyp, "word")(None, [batch],
                                                 write_files=False)
    cer = _stub_evaluator(tmp_path, hyp, "char")(None, [batch],
                                                 write_files=False)
    assert wer == 1.0
    assert cer == 0.5


def test_cer_includes_word_boundaries(tmp_path):
    # gold "ab a"; hyp "aba" -> merged words: WER 2/2 = 1.0 (sub+del);
    # CER over "ab a" (4 chars) vs "aba": one deleted space = 1/4.
    batch = {
        "logmel": np.zeros((1, 4, 3), np.float32),
        "logmel_len": np.array([4]),
        "char": np.array([[1, 3, 4, 5, 3, 4, 2]]),   # ▁ a b ▁ a
        "valid": np.array([True]),
        "utt_ids": ["u0"],
    }
    hyp = np.array([[3, 4, 5, 4, 2, 0, 0]])          # ▁ a b a
    wer = _stub_evaluator(tmp_path, hyp, "word")(None, [batch],
                                                 write_files=False)
    cer = _stub_evaluator(tmp_path, hyp, "char")(None, [batch],
                                                 write_files=False)
    assert wer == 1.0
    assert cer == 0.25
