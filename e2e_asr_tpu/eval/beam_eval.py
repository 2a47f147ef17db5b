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
from e2e_asr_tpu.core import mesh as mesh_lib
from e2e_asr_tpu.core import quant
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval.beam import beam_decode
from e2e_asr_tpu.eval import score as score_lib
from e2e_asr_tpu.eval.score import WerAccumulator
from e2e_asr_tpu.models import rnn_lm, seq2seq


def make_beam_decoder(cfg: Seq2SeqConfig, beam_cfg: BeamConfig,
                      *, compute_dtype=None, lm_params=None, bias=None,
                      nbest: int = 1):
    """Build a jitted batch -> (tokens, lens, scores) closure; with
    nbest > 1 the closure instead returns the score-sorted top-N
    (seqs [B,N,L], lens [B,N], scores [B,N])."""
    dec_cfg = cfg.decoders["char"]
    use_joint = beam_cfg.joint_ctc > 0.0
    use_lm_rescore = beam_cfg.lm_rescore != 0.0
    if use_lm_rescore and beam_cfg.lm_weight != 0.0:
        raise ValueError("-lm_rescore (second pass) and -lm_weight (per-"
                         "step fusion) are two LM applications; pick one")
    if nbest > 1 and beam_cfg.beam_size < nbest:
        import dataclasses
        beam_cfg = dataclasses.replace(beam_cfg, beam_size=nbest)

    @jax.jit
    def run(params, feats, feat_lens, lm_p):
        params = quant.maybe_dequantize(params)
        # Shared-LM fusion/rescoring reads the decoder's own leaves —
        # derived inside the jit so it sees the dequantized tree
        # (beam_search.py:111-134 weight-tying semantics).
        if lm_p is None and (beam_cfg.lm_weight != 0.0 or use_lm_rescore):
            lm_p = rnn_lm.shared_lm_params(
                params, dec_cfg=cfg.decoders["char"],
                horizon=max(512, beam_cfg.max_steps + 2))
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
        if nbest > 1 or use_lm_rescore:
            import jax.numpy as jnp
            (_, _, _), (seqs, lens, scores) = beam_decode(
                params["decoder_char"], dec_cfg, beam_cfg,
                attn_states[depth], enc_lens[depth],
                lm_params=lm_p, ctc_scorer=scorer, bias=bias,
                return_nbest=True)
            if use_lm_rescore:
                from e2e_asr_tpu.eval.rescore import apply_lm_rescore
                seqs, lens, scores = apply_lm_rescore(
                    seqs, lens, scores, lm_p, beam_cfg.lm_rescore,
                    eos_in_seq=True)
            else:
                order = jnp.argsort(-scores, axis=1, stable=True)
                seqs = jnp.take_along_axis(seqs, order[:, :, None], axis=1)
                lens = jnp.take_along_axis(lens, order, axis=1)
                scores = jnp.take_along_axis(scores, order, axis=1)
            out = (seqs[:, :nbest], lens[:, :nbest], scores[:, :nbest])
            if nbest > 1:
                return out
            return out[0][:, 0], out[1][:, 0], out[2][:, 0]
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
    score_unit = "word"      # "char" = CER (see GreedyEvaluator.score_unit)

    def __init__(self, cfg: Seq2SeqConfig, beam_cfg: BeamConfig,
                 rev_vocab: list[str], out_dir: str, *, compute_dtype=None,
                 lm_params=None, bias=None, nbest: int = 1, mesh=None):
        self.beam_cfg = beam_cfg
        self.rev_vocab = rev_vocab
        self.out_dir = out_dir
        self.nbest = nbest
        self.mesh = mesh         # optional ("data",) mesh: batches shard
                                 # over it (utterances independent — exact)
        if nbest > 1 and beam_cfg.ctc_rescore > 0:
            raise ValueError("-nbest is not available with -ctc_rescore "
                             "(the rescorer consumes the n-best itself)")
        if beam_cfg.ctc_rescore > 0 and beam_cfg.joint_ctc > 0:
            raise ValueError("-ctc_rescore and -joint_ctc are two joint-"
                             "decoding modes; pick one")
        if beam_cfg.ctc_rescore > 0 and beam_cfg.lm_rescore != 0.0:
            raise ValueError("-ctc_rescore and -lm_rescore both consume "
                             "the n-best; pick one second-pass rescorer "
                             "(per-step -lm_weight fusion combines with "
                             "-ctc_rescore fine)")
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
                                             lm_params=lm_params, bias=bias,
                                             nbest=nbest)

    def __call__(self, params, batches, *, write_files: bool = True) -> float:
        acc = WerAccumulator()
        os.makedirs(self.out_dir, exist_ok=True)
        gold_path = os.path.join(self.out_dir, "gold.txt")
        raw_path = os.path.join(self.out_dir,
                                f"raw_{self.beam_cfg.beam_size}.txt")
        gold_f = open(gold_path, "w") if write_files else None
        raw_f = open(raw_path, "w") if write_files else None
        nb_path = os.path.join(self.out_dir,
                               f"nbest_{self.beam_cfg.beam_size}.txt")
        nb_f = open(nb_path, "w") if write_files and self.nbest > 1 else None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            params = jax.device_put(params, NamedSharding(self.mesh, P()))
        try:
            for batch in batches:
                batch = mesh_lib.shard_decode_batch(batch, self.mesh)
                tokens, lens, scores = self._decode(params, batch)
                tokens = np.asarray(tokens)
                lens = np.asarray(lens)
                if self.nbest > 1:
                    all_seqs, all_scores = tokens, np.asarray(scores)
                    tokens, lens = tokens[:, 0], lens[:, 0]
                for i in range(tokens.shape[0]):
                    if not batch["valid"][i]:
                        continue
                    hyp_ids = tokens[i, : lens[i]]
                    hyp_sent = text.ids_to_sentence(hyp_ids, self.rev_vocab)
                    gold_sent = text.ids_to_sentence(batch["char"][i, 1:],
                                                     self.rev_vocab)
                    raw_words, hyp_words = text.get_relevant_words(hyp_sent)
                    _, gold_words = text.get_relevant_words(gold_sent)
                    score_lib.accumulate(acc, hyp_words, gold_words,
                                         self.score_unit)
                    if write_files:
                        uid = batch["utt_ids"][i]
                        gold_f.write(f"{uid}\t{' '.join(gold_words)}\n")
                        raw_f.write(f"{uid}\t{' '.join(raw_words)}\n")
                    if nb_f is not None:
                        score_lib.write_nbest(nb_f, batch["utt_ids"][i],
                                              all_seqs[i], all_scores[i],
                                              self.rev_vocab)
        finally:
            for f in (gold_f, raw_f, nb_f):
                if f:
                    f.close()
        if nb_f is not None:
            print(f"N-best at: {nb_path}")
        if write_files:
            print(f"Output at: {raw_path}")
        print(f"Score: {acc.score:f}")
        print(f"Insertion: {acc.insertions}, Deletion: {acc.deletions}, "
              f"Substitution: {acc.substitutions}")
        return acc.score
