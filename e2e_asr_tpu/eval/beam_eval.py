"""Beam-search evaluation driver: encoder + batched on-device beam decode +
WER with insertion/deletion/substitution breakdown.

Replaces Eval.beam_search_decode (/root/reference/eval_model.py:155-247). The
reference ran the encoder on-device, pickled hidden states to disk, then ran a
serial CPU beam per utterance; here the whole pipeline stays on-device and
batched, so the pickle cache disappears.
"""
from __future__ import annotations

import os

import jax
import numpy as np

from e2e_asr_tpu.config import BeamConfig, Seq2SeqConfig
from e2e_asr_tpu.core import quant
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval.beam import beam_decode
from e2e_asr_tpu.eval.score import WerAccumulator
from e2e_asr_tpu.models import rnn_lm, seq2seq


def make_beam_decoder(cfg: Seq2SeqConfig, beam_cfg: BeamConfig,
                      *, compute_dtype=None, lm_params=None, bias=None):
    """Build a jitted batch -> (tokens, lens, scores) closure."""
    dec_cfg = cfg.decoders["char"]
    use_joint = beam_cfg.joint_ctc > 0.0

    @jax.jit
    def run(params, feats, feat_lens, lm_p):
        params = quant.maybe_dequantize(params)
        # Shared-LM fusion reads the decoder's own leaves — derived inside
        # the jit so it sees the dequantized tree (beam_search.py:111-134
        # weight-tying semantics).
        if lm_p is None and beam_cfg.lm_weight != 0.0:
            lm_p = rnn_lm.shared_lm_params(params)
        attn_states, _, enc_lens = seq2seq.encode(
            params, cfg, feats, feat_lens, compute_dtype=compute_dtype)
        depth = cfg.num_layers["char"]
        scorer = None
        if use_joint:
            # One-pass joint CTC/attention (eval/ctc_prefix.py): the hybrid
            # checkpoint's CTC head scores the SAME encoder pass.
            from e2e_asr_tpu.core.layers import dense
            from e2e_asr_tpu.eval.ctc_prefix import CTCPrefixScorer
            ctc_logits = dense(params["ctc_head"], attn_states[depth],
                               compute_dtype=compute_dtype)
            scorer = CTCPrefixScorer(
                ctc_logits, enc_lens[depth],
                pre_beam=beam_cfg.ctc_pre_beam or None)
        return beam_decode(params["decoder_char"], dec_cfg, beam_cfg,
                           attn_states[depth], enc_lens[depth],
                           lm_params=lm_p, ctc_scorer=scorer, bias=bias)

    def decode(params, batch):
        if use_joint and "ctc_head" not in params:
            raise ValueError("-joint_ctc needs a hybrid checkpoint "
                             "(train with -ctc_weight > 0)")
        return run(params, batch["logmel"], batch["logmel_len"], lm_params)

    return decode


class BeamEvaluator:
    def __init__(self, cfg: Seq2SeqConfig, beam_cfg: BeamConfig,
                 rev_vocab: list[str], out_dir: str, *, compute_dtype=None,
                 lm_params=None, bias=None):
        self.beam_cfg = beam_cfg
        self.rev_vocab = rev_vocab
        self.out_dir = out_dir
        if beam_cfg.ctc_rescore > 0 and beam_cfg.joint_ctc > 0:
            raise ValueError("-ctc_rescore and -joint_ctc are two joint-"
                             "decoding modes; pick one")
        if beam_cfg.ctc_rescore > 0 and bias is not None:
            raise ValueError("contextual biasing steers the one-pass beams "
                             "(-joint_ctc is fine); it cannot reach "
                             "-ctc_rescore's offline n-best")
        if beam_cfg.ctc_rescore > 0:
            # Hybrid-family joint decoding: n-best rescored under the CTC
            # head (eval/rescore.py; requires a hybrid checkpoint).
            from e2e_asr_tpu.eval.rescore import ctc_rescore_decode
            lm_p = lm_params

            @jax.jit
            def run(params, feats, feat_lens):
                params = quant.maybe_dequantize(params)
                return ctc_rescore_decode(
                    params, cfg, beam_cfg, feats, feat_lens,
                    ctc_weight=beam_cfg.ctc_rescore,
                    compute_dtype=compute_dtype, lm_params=lm_p)

            self._decode = lambda params, batch: run(
                params, batch["logmel"], batch["logmel_len"])
        else:
            self._decode = make_beam_decoder(cfg, beam_cfg,
                                             compute_dtype=compute_dtype,
                                             lm_params=lm_params, bias=bias)

    def __call__(self, params, batches, *, write_files: bool = True) -> float:
        acc = WerAccumulator()
        os.makedirs(self.out_dir, exist_ok=True)
        gold_path = os.path.join(self.out_dir, "gold.txt")
        raw_path = os.path.join(self.out_dir,
                                f"raw_{self.beam_cfg.beam_size}.txt")
        gold_f = open(gold_path, "w") if write_files else None
        raw_f = open(raw_path, "w") if write_files else None
        try:
            for batch in batches:
                tokens, lens, _ = self._decode(params, batch)
                tokens = np.asarray(tokens)
                lens = np.asarray(lens)
                for i in range(tokens.shape[0]):
                    if not batch["valid"][i]:
                        continue
                    hyp_ids = tokens[i, : lens[i]]
                    hyp_sent = text.ids_to_sentence(hyp_ids, self.rev_vocab)
                    gold_sent = text.ids_to_sentence(batch["char"][i, 1:],
                                                     self.rev_vocab)
                    raw_words, hyp_words = text.get_relevant_words(hyp_sent)
                    _, gold_words = text.get_relevant_words(gold_sent)
                    acc.add(hyp_words, gold_words)
                    if write_files:
                        uid = batch["utt_ids"][i]
                        gold_f.write(f"{uid}\t{' '.join(gold_words)}\n")
                        raw_f.write(f"{uid}\t{' '.join(raw_words)}\n")
        finally:
            for f in (gold_f, raw_f):
                if f:
                    f.close()
        if write_files:
            print(f"Output at: {raw_path}")
        print(f"Score: {acc.score:f}")
        print(f"Insertion: {acc.insertions}, Deletion: {acc.deletions}, "
              f"Substitution: {acc.substitutions}")
        return acc.score
