"""CTC-rescored attention beam search (hybrid-family joint decoding).

The standard hybrid decoding recipe (ESPnet-style, approximated as n-best
rescoring): run the attention beam search, keep its FULL final candidate set
(finished ∪ live, exposed by eval/beam.beam_decode(return_nbest=True)), score
each candidate's label sequence under the CTC head with the exact CTC
forward algorithm (optax.ctc_loss == -log p_ctc), and pick

    argmax_j (1 - w) * attention_score_j + w * log p_ctc(seq_j)

Both terms are length-cumulative log-probabilities, so they interpolate on
the same scale. The CTC term prefers monotonically aligned hypotheses and
vetoes attention hallucinations; w=0 reduces exactly to the plain beam
selection (tested).

Requires a hybrid checkpoint (params carry `ctc_head`; models/hybrid.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from e2e_asr_tpu.config import BeamConfig, Seq2SeqConfig
from e2e_asr_tpu.core.layers import dense
from e2e_asr_tpu.models import ctc, seq2seq

Array = jax.Array


def ctc_nbest_scores(ctc_logits: Array, enc_lens: Array, seqs: Array,
                     lens: Array) -> Array:
    """log p_ctc for each beam candidate.

    ctc_logits: [B, T, V]; enc_lens: [B]; seqs: [B, N, S] token ids with the
    final <eos> at position len-1; lens: [B, N] (0 for empty slots).
    Returns [B, N] log-probs (empty/overlong candidates get -inf).
    """
    B, N, S = seqs.shape
    T, V = ctc_logits.shape[1], ctc_logits.shape[2]
    # Labels: strip the trailing <eos>, left-pack any stray specials.
    lab_lens = jnp.maximum(lens - 1, 0)                    # [B, N]
    keep = (jnp.arange(S)[None, None, :] < lab_lens[:, :, None]) & (seqs > 2)
    order = jnp.argsort(~keep, axis=-1, stable=True)
    labels = jnp.where(jnp.take_along_axis(keep, order, axis=-1),
                       jnp.take_along_axis(seqs, order, axis=-1), 0)
    lab_lens = jnp.sum(keep, axis=-1)                      # specials dropped

    flat_logits = jnp.broadcast_to(ctc_logits[:, None], (B, N, T, V)
                                   ).reshape(B * N, T, V)
    logit_pad = (jnp.arange(T)[None, :]
                 >= enc_lens.astype(jnp.int32)[:, None]).astype(jnp.float32)
    flat_logit_pad = jnp.broadcast_to(logit_pad[:, None], (B, N, T)
                                      ).reshape(B * N, T)
    flat_labels = labels.reshape(B * N, S)
    flat_label_pad = (jnp.arange(S)[None, :]
                      >= lab_lens.reshape(B * N)[:, None]).astype(jnp.float32)
    neg_logp = optax.ctc_loss(flat_logits, flat_logit_pad, flat_labels,
                              flat_label_pad, blank_id=ctc.BLANK_ID)
    logp = -neg_logp.reshape(B, N)
    # Empty candidates (len 0) and label sequences longer than the encoder
    # frames (CTC-impossible) are out.
    ok = (lab_lens > 0) & (lab_lens <= enc_lens[:, None])
    return jnp.where(ok, logp, -1e30)


def ctc_rescore_decode(params: dict, cfg: Seq2SeqConfig, beam_cfg: BeamConfig,
                       feats: Array, feat_lens: Array, *, ctc_weight: float,
                       compute_dtype=None, lm_params: dict | None = None
                       ) -> tuple[Array, Array, Array]:
    """One encoder pass -> attention beam n-best -> CTC-interpolated pick.

    Returns (tokens [B, max_steps], lens [B], combined scores [B]).
    """
    from e2e_asr_tpu.eval.beam import beam_decode

    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, feats, feat_lens, compute_dtype=compute_dtype)
    depth = cfg.num_layers["char"]
    enc, el = attn_states[depth], enc_lens[depth]

    (_, _, _), (seqs, lens, att_scores) = beam_decode(
        params["decoder_char"], cfg.decoders["char"], beam_cfg, enc, el,
        lm_params=lm_params, return_nbest=True)

    ctc_logits = dense(params["ctc_head"], enc, compute_dtype=compute_dtype)
    ctc_scores = ctc_nbest_scores(ctc_logits, el, seqs, lens)
    combined = jnp.where(att_scores <= -1e29, att_scores,
                         (1.0 - ctc_weight) * att_scores
                         + ctc_weight * ctc_scores)
    best = jnp.argmax(combined, axis=1)
    tokens = jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]
    out_lens = jnp.take_along_axis(lens, best[:, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(combined, best[:, None], axis=1)[:, 0]
    return tokens, out_lens, scores
