"""N-best rescoring over the attention beam's final candidate set.

Two second-pass scorers share the recipe "run the beam, keep its FULL final
candidate set (finished ∪ live, eval/beam.beam_decode(return_nbest=True)),
re-rank":

- **CTC rescoring** (`-ctc_rescore w`, ESPnet-style hybrid decoding): score
  each candidate's label sequence under the hybrid checkpoint's CTC head
  with the exact CTC forward algorithm (optax.ctc_loss == -log p_ctc) and
  pick  argmax_j (1 - w) * attention_score_j + w * log p_ctc(seq_j).
  The CTC term prefers monotonically aligned hypotheses and vetoes
  attention hallucinations; requires a hybrid checkpoint (`ctc_head`).

- **LM rescoring** (`-lm_rescore w`, lm_nbest_scores below): teacher-force
  each candidate through a fusion LM (the decoder's own weight-tied LM, an
  external RNN LM from -lm_path, or a trigram table) in ONE parallel pass
  and pick  argmax_j attention_score_j + w * log p_lm(seq_j).  This is the
  classic second-pass alternative to per-step shallow fusion
  (`-lm_weight`): the first pass stays LM-free (cheaper per step, one LM
  application per candidate instead of per step x vocab), at the cost of
  only seeing hypotheses the acoustic beam kept.

All terms are length-cumulative log-probabilities, so they interpolate on
the same scale; weight 0 reduces exactly to the plain beam selection
(tested).
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


def lm_nbest_scores(lm_params: dict, seqs: Array, lens: Array, *,
                    eos_in_seq: bool = True) -> Array:
    """log p_LM(sequence) for each n-best candidate, any fusion-LM kind.

    Teacher-forced in one pass: a `lax.scan` over the (static) candidate
    length drives rnn_lm.fusion_step on the flattened [B*N] batch — the
    SAME step every family's beam fuses with per-step, so fusion and
    rescoring semantics cannot drift (RNN LMs and trigram tables both work
    unchanged).

    seqs: [B, N, S] token ids; lens: [B, N]. With eos_in_seq=True
    (attention-family n-best) the final <eos> sits at position len-1 and
    is scored as part of the sequence. With eos_in_seq=False
    (CTC/transducer label sequences carry no <eos>) tokens 0..len-1 are
    scored and a terminal p(<eos> | sequence) factor is added, so lengths
    compete on complete-sentence LM probability (the same convention as
    the CTC beam's fused terminal term, eval/ctc_beam.py).

    Returns [B, N] f32 cumulative log-probs. Length-0 entries score 0 with
    eos_in_seq=True (attention sentinel slots — the caller masks them) and
    log p(eos | <go>) with eos_in_seq=False (an empty CTC/transducer
    hypothesis is a real candidate).
    """
    from e2e_asr_tpu.data.text import EOS_ID, GO_ID
    from e2e_asr_tpu.models import rnn_lm

    # Callers may close over host-side LM artifacts (the trigram table is a
    # plain npz numpy array); numpy arrays can't be indexed by tracers.
    lm_params = jax.tree_util.tree_map(jnp.asarray, lm_params)
    B, N, S = seqs.shape
    flat = seqs.reshape(B * N, S)
    flat_lens = lens.reshape(B * N).astype(jnp.int32)
    # S scan steps + the post-scan terminal <eos> step (eos_in_seq=False).
    state0, x0 = rnn_lm.fusion_init(lm_params, (B * N,), GO_ID, S + 1)

    def step(carry, inp):
        state, x, acc = carry
        t, tok = inp
        logp, state2 = rnn_lm.fusion_step(lm_params, x, state)
        lp_tok = jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]
        acc = acc + jnp.where(t < flat_lens, lp_tok, 0.0)
        if not eos_in_seq:
            # At t == len the state has consumed exactly the real tokens
            # (padding only feeds steps we mask), so this is p(eos | seq).
            # len == 0 included: an empty hypothesis (legitimate for CTC /
            # transducer) scores p(eos | <go>), not probability 1.
            acc = acc + jnp.where(t == flat_lens, logp[:, EOS_ID], 0.0)
        return (state2, rnn_lm.fusion_next_input(lm_params, tok), acc), None

    (state, x, acc), _ = jax.lax.scan(
        step, (state0, x0, jnp.zeros((B * N,), jnp.float32)),
        (jnp.arange(S, dtype=jnp.int32), jnp.swapaxes(flat, 0, 1)))
    if not eos_in_seq:
        # Full-length candidates (len == S) place their terminal <eos>
        # after the scan's last step.
        logp, _ = rnn_lm.fusion_step(lm_params, x, state)
        acc = acc + jnp.where(flat_lens == S, logp[:, EOS_ID], 0.0)
    return acc.reshape(B, N)


def apply_lm_rescore(seqs: Array, lens: Array, scores: Array,
                     lm_params: dict, weight: float, *,
                     eos_in_seq: bool) -> tuple[Array, Array, Array]:
    """Second-pass LM re-ranking of an n-best set (-lm_rescore): add
    weight * lm_nbest_scores to every non-sentinel score and stably re-sort
    descending. The ONE definition every consumer uses (eval CLI evaluators
    and the serving engine), so the sentinel threshold and sort semantics
    cannot drift. eos_in_seq follows lm_nbest_scores' convention
    (attention n-best carry <eos>; CTC/transducer label sequences get the
    terminal-eos factor). weight 0 is a no-op.
    """
    if weight == 0.0:
        return seqs, lens, scores
    lm_s = lm_nbest_scores(lm_params, seqs, lens, eos_in_seq=eos_in_seq)
    scores = jnp.where(scores <= -1e29, scores, scores + weight * lm_s)
    order = jnp.argsort(-scores, axis=1, stable=True)
    return (jnp.take_along_axis(seqs, order[:, :, None], axis=1),
            jnp.take_along_axis(lens, order, axis=1),
            jnp.take_along_axis(scores, order, axis=1))


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
