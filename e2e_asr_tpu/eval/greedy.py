"""Greedy decoding evaluator: batched on-device argmax decode + WER scoring.

Replaces Eval.greedy_decode (/root/reference/eval_model.py:56-118): runs the
jitted greedy decode per batch, detokenizes, filters fillers, accumulates the
edit distance, and writes the gold / raw / decoded artifact files.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import numpy as np

from e2e_asr_tpu.config import Seq2SeqConfig
from e2e_asr_tpu.core import mesh as mesh_lib
from e2e_asr_tpu.core import quant
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval import score as score_lib
from e2e_asr_tpu.eval.score import WerAccumulator
from e2e_asr_tpu.models import seq2seq


class GreedyEvaluator:
    # "word" = the reference's filler-filtered WER; "char" = CER over the
    # same filtered text (spaces included as symbols) — the standard metric
    # for character-based languages. Set `evaluator.score_unit = "char"`
    # (CLI: -score_unit char).
    score_unit = "word"
    # Class-level defaults so stubs built via __new__ (tests) and subclasses
    # that skip __init__ resolve every attribute __call__ touches.
    mesh = None

    def __init__(self, cfg: Seq2SeqConfig, rev_vocab: list[str],
                 out_dir: str, *, compute_dtype=None, file_prefix: str = "asr",
                 mesh=None):
        self.cfg = cfg
        self.rev_vocab = rev_vocab
        self.out_dir = out_dir
        self.file_prefix = file_prefix
        self.mesh = mesh            # optional ("data",) mesh: batches shard
                                    # over it, decode runs data-parallel
                                    # (utterances are independent — exact)
        def decode(params, feats, feat_lens):
            # Serving path: params may arrive int8-quantized (core/quant.py);
            # dequant inside the jit so the int8 tree is the program input.
            params = quant.maybe_dequantize(params)
            return seq2seq.apply_greedy(params, cfg, feats, feat_lens,
                                        task="char", go_id=text.GO_ID,
                                        compute_dtype=compute_dtype)
        self._decode = jax.jit(decode)

    def __call__(self, params, batches, *, write_files: bool = True) -> float:
        """Returns the filler-filtered WER over `batches` (an iterable of
        dataset batches with `valid` masks). Evaluators that set
        `_nbest_decode` (returning sorted [B,N,L]/[B,N]/[B,N] n-best sets)
        additionally write nbest_*.txt with per-hypothesis scores; the WER
        is always the top hypothesis's."""
        acc = WerAccumulator()
        os.makedirs(self.out_dir, exist_ok=True)
        gold_path = os.path.join(self.out_dir, f"gold_{self.file_prefix}.txt")
        raw_path = os.path.join(self.out_dir, f"raw_{self.file_prefix}.txt")
        dec_path = os.path.join(self.out_dir, f"decoded_{self.file_prefix}.txt")
        nb_decode = getattr(self, "_nbest_decode", None)
        gold_f = open(gold_path, "w") if write_files else None
        raw_f = open(raw_path, "w") if write_files else None
        dec_f = open(dec_path, "w") if write_files else None
        nb_path = os.path.join(self.out_dir, f"nbest_{self.file_prefix}.txt")
        # -lm_rescore routes through the n-best machinery even at nbest=1;
        # only write nbest_*.txt when the user asked for lists.
        nb_f = (open(nb_path, "w")
                if write_files and nb_decode is not None
                and getattr(self, "_write_nbest", True) else None)
        if self.mesh is not None:
            # Replicate params across the mesh once; per-batch features
            # shard over "data" in core/mesh.shard_decode_batch.
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            params = _jax.device_put(params, NamedSharding(self.mesh, P()))
        try:
            for batch in batches:
                batch = mesh_lib.shard_decode_batch(batch, self.mesh)
                if nb_decode is not None:
                    seqs, _, scores = nb_decode(
                        params=params, feats=batch["logmel"],
                        feat_lens=batch["logmel_len"])
                    seqs, scores = np.asarray(seqs), np.asarray(scores)
                    ids = seqs[:, 0]
                else:
                    ids = np.asarray(self._decode(
                        params=params, feats=batch["logmel"],
                        feat_lens=batch["logmel_len"]))       # [B, T_out]
                for i in range(ids.shape[0]):
                    if not batch["valid"][i]:
                        continue
                    gold_sent = text.ids_to_sentence(batch["char"][i, 1:],
                                                     self.rev_vocab)
                    hyp_sent = text.ids_to_sentence(ids[i], self.rev_vocab)
                    raw_words, hyp_words = text.get_relevant_words(hyp_sent)
                    _, gold_words = text.get_relevant_words(gold_sent)
                    score_lib.accumulate(acc, hyp_words, gold_words,
                                         self.score_unit)
                    if write_files:
                        uid = batch["utt_ids"][i]
                        gold_f.write(f"{uid}\t{' '.join(gold_words)}\n")
                        raw_f.write(f"{uid}\t{' '.join(raw_words)}\n")
                        dec_f.write(f"{uid}\t{' '.join(hyp_words)}\n")
                    if nb_f is not None:
                        score_lib.write_nbest(nb_f, batch["utt_ids"][i],
                                              seqs[i], scores[i],
                                              self.rev_vocab)
        finally:
            for f in (gold_f, raw_f, dec_f, nb_f):
                if f:
                    f.close()
        print(f"Total sentences: {acc.sentences}")
        if write_files:
            print(f"Output at: {raw_path}")
            if nb_f is not None:
                print(f"N-best at: {nb_path}")
        print(f"Score: {acc.score:f}")
        return acc.score


def _maybe_lm_rescore(seqs, lens, scores, lm_params, weight):
    """-lm_rescore over a family beam's n-best (eval/rescore.py's shared
    recipe): CTC/transducer label sequences carry no <eos>, so the
    terminal-eos convention applies and lengths compete on
    complete-sentence LM probability."""
    from e2e_asr_tpu.eval.rescore import apply_lm_rescore
    return apply_lm_rescore(seqs, lens, scores, lm_params, weight,
                            eos_in_seq=False)


class CTCEvaluator(GreedyEvaluator):
    """Same scoring/artifact loop over the pure-CTC family (models/ctc.py):
    best-path decode at beam_size 1, on-device prefix beam search otherwise.
    The decode returns left-packed token ids, which ids_to_sentence handles
    exactly like the attention decoder's output."""

    def __init__(self, cfg: Seq2SeqConfig, rev_vocab: list[str],
                 out_dir: str, *, compute_dtype=None, beam_size: int = 1,
                 file_prefix: str = "asr", lm_params: dict | None = None,
                 lm_weight: float = 0.0, lm_rescore: float = 0.0,
                 bias: tuple[dict, float] | None = None, nbest: int = 1,
                 mesh=None):
        self.cfg = cfg
        self.rev_vocab = rev_vocab
        self.out_dir = out_dir
        self.file_prefix = file_prefix
        self.mesh = mesh
        use_lm = lm_weight != 0.0
        if (use_lm or lm_rescore != 0.0) and lm_params is None:
            # Like the transducer family, pure CTC has no internal weight-tied
            # LM to fall back to — fusion/rescoring needs an external -lm_path.
            raise ValueError("CTC LM fusion/rescoring needs -lm_path "
                             "(no internal shared LM in this family)")
        if use_lm and lm_rescore != 0.0:
            raise ValueError("-lm_rescore (second pass) and -lm_weight (per-"
                             "step fusion) are two LM applications; pick one")
        self._write_nbest = nbest > 1
        if nbest > 1 or lm_rescore != 0.0:
            from e2e_asr_tpu.eval.ctc_beam import ctc_beam_decode
            from e2e_asr_tpu.models import ctc
            k = max(beam_size, nbest)
            n_out = max(nbest, 1)

            def nb(params, feats, feat_lens):
                params = quant.maybe_dequantize(params)
                lg, el = ctc.logits(params, cfg, feats, feat_lens,
                                    compute_dtype=compute_dtype)
                seqs, lens, scores = ctc_beam_decode(
                    jax.nn.log_softmax(lg, axis=-1), el, beam_size=k,
                    blank_id=ctc.BLANK_ID, lm_params=lm_params,
                    lm_weight=lm_weight, bias=bias)
                seqs, lens, scores = _maybe_lm_rescore(
                    seqs, lens, scores, lm_params, lm_rescore)
                return (seqs[:, :n_out], lens[:, :n_out], scores[:, :n_out])
            self._nbest_decode = jax.jit(nb)
            self._decode = None
        elif beam_size > 1 or use_lm or bias is not None:
            from e2e_asr_tpu.eval.ctc_beam import ctc_beam_search

            def decode(params, feats, feat_lens):
                params = quant.maybe_dequantize(params)
                tokens, _ = ctc_beam_search(params, cfg, feats, feat_lens,
                                            beam_size=max(beam_size, 1),
                                            compute_dtype=compute_dtype,
                                            lm_params=lm_params,
                                            lm_weight=lm_weight, bias=bias)
                return tokens
            self._decode = jax.jit(decode)
        else:
            from e2e_asr_tpu.models import ctc

            def decode(params, feats, feat_lens):
                params = quant.maybe_dequantize(params)
                return ctc.greedy_decode(params, cfg, feats, feat_lens,
                                         compute_dtype=compute_dtype)
            self._decode = jax.jit(decode)


class TransducerEvaluator(GreedyEvaluator):
    """Same scoring/artifact loop over the transducer family
    (models/transducer.py): batched greedy decode at beam_size 1, on-device
    prefix beam search otherwise. Both return emission-ordered left-packed
    token ids — the contract ids_to_sentence already handles."""

    def __init__(self, cfg: Seq2SeqConfig, rev_vocab: list[str],
                 out_dir: str, *, compute_dtype=None, beam_size: int = 1,
                 file_prefix: str = "asr", lm_params: dict | None = None,
                 lm_weight: float = 0.0, ilm_weight: float = 0.0,
                 lm_rescore: float = 0.0,
                 bias: tuple[dict, float] | None = None, nbest: int = 1,
                 mesh=None):
        self.cfg = cfg
        self.rev_vocab = rev_vocab
        self.out_dir = out_dir
        self.file_prefix = file_prefix
        self.mesh = mesh
        use_lm = lm_weight != 0.0
        use_ilm = ilm_weight != 0.0
        if (use_lm or lm_rescore != 0.0) and lm_params is None:
            # Unlike the attention family the transducer has no internal
            # weight-tied LM to fall back to (rnn_lm.shared_lm_params reads
            # decoder_char leaves that don't exist here).
            raise ValueError("transducer LM fusion/rescoring needs -lm_path "
                             "(no internal shared LM in this family)")
        if use_lm and lm_rescore != 0.0:
            raise ValueError("-lm_rescore (second pass) and -lm_weight (per-"
                             "step fusion) are two LM applications; pick one")
        self._write_nbest = nbest > 1
        if nbest > 1 or lm_rescore != 0.0:
            from e2e_asr_tpu.eval.transducer_beam import transducer_beam_decode
            k = max(beam_size, nbest)
            n_out = max(nbest, 1)

            def nb(params, feats, feat_lens):
                params = quant.maybe_dequantize(params)
                attn_states, _, enc_lens = seq2seq.encode(
                    params, cfg, feats, feat_lens,
                    compute_dtype=compute_dtype)
                depth = cfg.num_layers["char"]
                seqs, lens, scores = transducer_beam_decode(
                    params, cfg, attn_states[depth], enc_lens[depth],
                    beam_size=k, compute_dtype=compute_dtype,
                    lm_params=lm_params, lm_weight=lm_weight,
                    ilm_weight=ilm_weight, bias=bias)
                seqs, lens, scores = _maybe_lm_rescore(
                    seqs, lens, scores, lm_params, lm_rescore)
                return (seqs[:, :n_out], lens[:, :n_out], scores[:, :n_out])
            self._nbest_decode = jax.jit(nb)
            self._decode = None
        elif beam_size > 1 or use_lm or use_ilm or bias is not None:
            from e2e_asr_tpu.eval.transducer_beam import transducer_beam_search

            def decode(params, feats, feat_lens):
                params = quant.maybe_dequantize(params)
                tokens, _ = transducer_beam_search(
                    params, cfg, feats, feat_lens, beam_size=max(beam_size, 1),
                    compute_dtype=compute_dtype, lm_params=lm_params,
                    lm_weight=lm_weight, ilm_weight=ilm_weight, bias=bias)
                return tokens
            self._decode = jax.jit(decode)
        else:
            from e2e_asr_tpu.models import transducer

            def decode(params, feats, feat_lens):
                params = quant.maybe_dequantize(params)
                return transducer.greedy_decode(params, cfg, feats, feat_lens,
                                                compute_dtype=compute_dtype)
            self._decode = jax.jit(decode)
