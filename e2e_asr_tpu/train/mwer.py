"""Minimum-WER (MWER) sequence training for the attention and transducer
families.

Fine-tuning objective (Prabhavalkar et al. 2018, "Minimum Word Error Rate
Training for Attention-based Sequence-to-Sequence Models"): instead of
per-token cross entropy, minimize the EXPECTED number of word errors over
the model's own n-best list,

    L_mwer = E_{y ~ p̂(y|x)} [ W(y, y*) ]  =  Σ_i p̂_i · W_i ,

where p̂ renormalizes the model's sequence probabilities over the n-best
(softmax of teacher-forced log P(y_i|x)) and W_i counts word errors. The
softmax Jacobian gives the variance-reduced REINFORCE form automatically
(each hypothesis's gradient is weighted by W_i − Σ p̂_j W_j, so hypotheses
better than the expectation are pushed up). A small cross-entropy term on
the ground truth (`ce_weight`, default 0.01) keeps the model anchored, as
in the paper.

Error counts use the framework's OWN eval metric — detokenized,
filler-filtered word errors (eval/score.py, data/text.py) — so training
optimizes exactly what `Score:` reports. That computation is host-side
string work, so an MWER step is a three-phase sandwich:

    1. jitted n-best decode (the standard batched beam, return_nbest=True),
    2. host word-error counting per candidate,
    3. jitted grad step: one encoder pass, every candidate teacher-forced
       against N-fold-tiled encoder states, expected-error loss + CE, Adam.

Only FINISHED candidates (eos-terminated) enter the n-best: their
teacher-forced log P is a complete sequence probability, so p̂ is properly
comparable across lengths. Utterances with no finished candidate fall back
to the CE term alone that step (mask: zero MWER contribution).

Transducer form (Weng et al. 2020 / Guo et al., MBR for RNN-T): the n-best
comes from the time-synchronous beam (eval/transducer_beam.py) and each
candidate's log P(y|x) is the FULL lattice marginal (core/transducer_loss)
— exact and differentiable, no single-alignment approximation. Every beam
hypothesis is complete by construction (it consumed all T frames), so the
validity mask is just the live-slot mask; duplicate label sequences (the
per-alignment beam can surface one sequence through two alignments) are
deduplicated on the host so p̂ doesn't double-count a sequence's mass. The
anchor term is the family's own CE (the transducer NLL on the reference).

No reference counterpart (/root/reference trains pure CE); the reference's
Adam/clip/dynamic-LR optimizer is reused unchanged so MWER fine-tuning
resumes a CE checkpoint's optimizer state.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import BeamConfig, Seq2SeqConfig
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval.score import edit_distance
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as step_lib

Array = jax.Array
NEG_INF = -1e30


def make_mwer_fns(model_cfg: Seq2SeqConfig, *, nbest: int = 4,
                  ce_weight: float = 0.01, compute_dtype=None,
                  freeze: tuple[str, ...] = ()):
    """Build (decode_nbest, grad_step) closures. Both are jitted; the word
    error counts flow between them through the host (count_word_errors).
    `freeze` path substrings train with zero gradient, exactly as in the
    CE step (train/step.py apply_freeze)."""
    if model_cfg.model_family == "transducer":
        return _make_transducer_mwer_fns(
            model_cfg, nbest=nbest, ce_weight=ce_weight,
            compute_dtype=compute_dtype, freeze=freeze)
    if model_cfg.model_family != "attention" or model_cfg.ctc_weight > 0:
        raise ValueError("-mwer covers the attention and transducer "
                         "families (pure CE/NLL objectives)")
    from e2e_asr_tpu.eval.beam import beam_decode

    dec_cfg = model_cfg.decoders["char"]
    # Deterministic teacher forcing for sequence scoring: no scheduled
    # sampling, no dropout (the noise sources of apply_train are off).
    score_cfg = dataclasses.replace(dec_cfg, samp_prob=0.0, out_prob_dec=1.0)
    beam_cfg = BeamConfig(beam_size=nbest, max_steps=dec_cfg.max_output)
    depth = model_cfg.num_layers["char"]

    @jax.jit
    def decode_nbest(params, feats, feat_lens):
        """-> (seqs [B, k, L] eos-terminated, lens [B, k], valid [B, k]).
        Only the finished buffer (first k n-best slots) qualifies."""
        attn_states, _, enc_lens = seq2seq.encode(
            params, model_cfg, feats, feat_lens,
            compute_dtype=compute_dtype)
        (_, _, _), (seqs, lens, scores) = beam_decode(
            params["decoder_char"], dec_cfg, beam_cfg,
            attn_states[depth], enc_lens[depth], return_nbest=True)
        k = beam_cfg.beam_size
        fin_seqs, fin_lens, fin_scores = (seqs[:, :k], lens[:, :k],
                                          scores[:, :k])
        valid = (fin_scores > NEG_INF / 2) & (fin_lens > 0)
        return fin_seqs, fin_lens, valid

    @jax.jit
    def grad_step(state: step_lib.TrainState, batch: dict, seqs: Array,
                  lens: Array, valid: Array, errors: Array, rng: Array):
        """One MWER update. errors: [B, k] float word-error counts."""
        B, k, L = seqs.shape

        def loss_fn(params):
            attn_states, _, enc_lens = seq2seq.encode(
                params, model_cfg, batch["logmel"], batch["logmel_len"],
                compute_dtype=compute_dtype)
            enc, el = attn_states[depth], enc_lens[depth]
            # Tile the one encoder pass k-fold for candidate scoring.
            H = enc.shape[-1]
            enc_t = jnp.broadcast_to(enc[:, None], (B, k) + enc.shape[1:]
                                     ).reshape(B * k, enc.shape[1], H)
            el_t = jnp.broadcast_to(el[:, None], (B, k)).reshape(B * k)
            # Teacher-forced inputs: <go> + candidate tokens (eos included).
            dec_in = jnp.concatenate(
                [jnp.full((B * k, 1), text.GO_ID, jnp.int32),
                 seqs.reshape(B * k, L)], axis=1).T          # [L+1, B*k]
            logits = seq2seq.decoder_module(score_cfg).apply_train(
                params["decoder_char"], score_cfg, dec_in, enc_t, el_t,
                rng=rng, compute_dtype=compute_dtype)        # [L, B*k, V]
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = dec_in[1:]                                 # [L, B*k]
            tok_lp = jnp.take_along_axis(lp, tgt[:, :, None],
                                         axis=-1)[:, :, 0]
            mask = (jnp.arange(L)[:, None]
                    < lens.reshape(B * k)[None, :])
            seq_lp = jnp.sum(tok_lp * mask, axis=0).reshape(B, k)

            # Renormalize over the VALID candidates; all-invalid rows
            # contribute zero MWER (CE still trains them this step).
            masked = jnp.where(valid, seq_lp, NEG_INF)
            p_hat = jax.nn.softmax(masked, axis=1)
            any_valid = jnp.any(valid, axis=1)
            expected = jnp.sum(p_hat * jax.lax.stop_gradient(errors), axis=1)
            mwer = jnp.sum(jnp.where(any_valid, expected, 0.0)) / jnp.maximum(
                jnp.sum(any_valid), 1)

            ce, per_task = seq2seq.apply_train(
                params, model_cfg, batch, rng=rng,
                compute_dtype=compute_dtype)
            return mwer + ce_weight * ce, (mwer, ce, per_task)

        (total, (mwer, ce, per_task)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_update(state, grads, model_cfg, freeze)
        metrics = {"loss": total, "mwer": mwer, "loss_char": ce,
                   **{f"ce_{t}": v for t, v in per_task.items()}}
        return new_state, metrics

    return decode_nbest, grad_step


def _apply_update(state: step_lib.TrainState, grads, model_cfg, freeze):
    """Shared MWER optimizer tail: freeze masking + the CE phase's Adam
    (same slots, so MWER resumes a CE run's optimizer state)."""
    if freeze:
        flat, treedef = jax.tree_util.tree_flatten_with_path(grads)
        grads = jax.tree_util.tree_unflatten(treedef, [
            jnp.zeros_like(g) if any(
                f in "/".join(getattr(k, "key", getattr(k, "name",
                                                        str(k)))
                              for k in path_) for f in freeze) else g
            for path_, g in flat])
    asr_opt = step_lib.make_optimizer(model_cfg.learning_rate,
                                      model_cfg.max_gradient_norm,
                                      model_cfg.lr_warmup_steps)
    import optax
    updates, new_opt = asr_opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return state._replace(params=new_params, opt_state=new_opt,
                          global_step=state.global_step + 1)


def _make_transducer_mwer_fns(model_cfg: Seq2SeqConfig, *, nbest: int,
                              ce_weight: float, compute_dtype,
                              freeze: tuple[str, ...]):
    """Transducer MWER closures: n-best from the time-synchronous beam,
    candidate log P(y|x) = the exact lattice marginal (differentiable
    through core/transducer_loss's custom-VJP kernels)."""
    from e2e_asr_tpu.core.transducer_loss import transducer_loss
    from e2e_asr_tpu.eval.transducer_beam import transducer_beam_decode
    from e2e_asr_tpu.models import transducer
    from e2e_asr_tpu.train.step import _ctc_labels

    depth = model_cfg.num_layers["char"]

    @jax.jit
    def decode_nbest(params, feats, feat_lens):
        """-> (seqs [B, k, cap], lens [B, k], valid [B, k]). Every live
        beam slot is a complete hypothesis (all T frames consumed), so
        validity is just the live mask; zero-length hypotheses are valid
        complete transcriptions for this family."""
        attn_states, _, enc_lens = seq2seq.encode(
            params, model_cfg, feats, feat_lens, compute_dtype=compute_dtype)
        seqs, lens, scores = transducer_beam_decode(
            params, model_cfg, attn_states[depth], enc_lens[depth],
            beam_size=nbest, compute_dtype=compute_dtype)
        return seqs, lens, scores > NEG_INF / 2

    @jax.jit
    def grad_step(state: step_lib.TrainState, batch: dict, seqs: Array,
                  lens: Array, valid: Array, errors: Array, rng: Array):
        B, k, L = seqs.shape

        def loss_fn(params):
            attn_states, _, enc_lens = seq2seq.encode(
                params, model_cfg, batch["logmel"], batch["logmel_len"],
                compute_dtype=compute_dtype)
            enc, el = attn_states[depth], enc_lens[depth]
            # One encoder pass, tiled k-fold for candidate scoring.
            H = enc.shape[-1]
            enc_t = jnp.broadcast_to(enc[:, None], (B, k) + enc.shape[1:]
                                     ).reshape(B * k, enc.shape[1], H)
            el_t = jnp.broadcast_to(el[:, None], (B, k)).reshape(B * k)
            labels = seqs.reshape(B * k, L)
            lab_lens = lens.reshape(B * k)
            pred = transducer.pred_states(params["pred"], model_cfg, labels,
                                          lab_lens,
                                          compute_dtype=compute_dtype)
            blank_lp, label_lp = transducer.lattice_logprobs(
                params, labels, enc_t, pred, compute_dtype=compute_dtype)
            # Exact sequence log-marginal; NOT a single-alignment score.
            seq_lp = -transducer_loss(blank_lp, label_lp, el_t,
                                      lab_lens).reshape(B, k)

            masked = jnp.where(valid, seq_lp, NEG_INF)
            p_hat = jax.nn.softmax(masked, axis=1)
            any_valid = jnp.any(valid, axis=1)
            expected = jnp.sum(p_hat * jax.lax.stop_gradient(errors), axis=1)
            mwer = jnp.sum(jnp.where(any_valid, expected, 0.0)) / jnp.maximum(
                jnp.sum(any_valid), 1)

            tb = dict(batch)
            tb["labels"], tb["label_lens"] = _ctc_labels(batch)
            ce = transducer.loss(params, model_cfg, tb, rng=rng,
                                 compute_dtype=compute_dtype)
            return mwer + ce_weight * ce, (mwer, ce)

        (total, (mwer, ce)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_update(state, grads, model_cfg, freeze)
        metrics = {"loss": total, "mwer": mwer, "loss_char": ce,
                   "ce_char": ce}
        return new_state, metrics

    return decode_nbest, grad_step


def dedup_candidates(seqs: np.ndarray, lens: np.ndarray,
                     valid: np.ndarray) -> np.ndarray:
    """Invalidate repeat label sequences within each row's n-best (keep the
    first, i.e. best-scored, occurrence). Needed for the transducer family,
    whose per-alignment beam can surface one sequence through two
    alignments — the MWER posterior would double-count its marginal."""
    valid = valid.copy()
    for b in range(valid.shape[0]):
        seen = set()
        for j in range(valid.shape[1]):
            if not valid[b, j]:
                continue
            key = tuple(seqs[b, j, : lens[b, j]])
            if key in seen:
                valid[b, j] = False
            seen.add(key)
    return valid


def count_word_errors(seqs: np.ndarray, lens: np.ndarray, valid: np.ndarray,
                      refs: np.ndarray, rev_vocab: list[str]) -> np.ndarray:
    """Host phase: filler-filtered word-error counts per candidate.

    seqs/lens/valid: [B, k] n-best arrays; refs: [B, L_ref] gold char ids
    including the leading <go> (the dataset's `char` field).
    """
    B, k = lens.shape
    errors = np.zeros((B, k), np.float32)
    for b in range(B):
        gold_sent = text.ids_to_sentence(refs[b, 1:], rev_vocab)
        _, gold_words = text.get_relevant_words(gold_sent)
        for j in range(k):
            if not valid[b, j]:
                continue
            hyp_sent = text.ids_to_sentence(seqs[b, j, : lens[b, j]],
                                            rev_vocab)
            _, hyp_words = text.get_relevant_words(hyp_sent)
            st = edit_distance(hyp_words, gold_words)
            errors[b, j] = st.insertions + st.deletions + st.substitutions
    return errors


class MWERStepper:
    """The three-phase MWER step with the Trainer's step signature:
    stepper(state, device_batch, rng) -> (new_state, metrics)."""

    def __init__(self, model_cfg: Seq2SeqConfig, rev_vocab: list[str], *,
                 nbest: int = 4, ce_weight: float = 0.01,
                 compute_dtype=None, freeze: tuple[str, ...] = ()):
        self.rev_vocab = rev_vocab
        # The transducer beam scores per-ALIGNMENT: one label sequence can
        # occupy two slots via different alignments; p̂ must not count its
        # (identical, full-marginal) mass twice.
        self._dedup = model_cfg.model_family == "transducer"
        self._decode, self._grad = make_mwer_fns(
            model_cfg, nbest=nbest, ce_weight=ce_weight,
            compute_dtype=compute_dtype, freeze=freeze)

    def __call__(self, state, batch: dict, rng: Array):
        seqs, lens, valid = self._decode(state.params, batch["logmel"],
                                         batch["logmel_len"])
        seqs_h, lens_h, valid_h = (np.asarray(seqs), np.asarray(lens),
                                   np.asarray(valid))
        # Padding rows of the fixed-shape batch train on nothing: their
        # candidates count zero errors and CE masks them via char_len.
        valid_h = valid_h & np.asarray(batch["valid"])[:, None]
        if self._dedup:
            valid_h = dedup_candidates(seqs_h, lens_h, valid_h)
        errors = count_word_errors(seqs_h, lens_h, valid_h,
                                   np.asarray(batch["char"]), self.rev_vocab)
        return self._grad(state, batch, seqs, lens,
                          jnp.asarray(valid_h), jnp.asarray(errors), rng)
