"""Knowledge distillation: train a student against a frozen teacher's
posteriors (Hinton et al. 2015), the standard recipe for shrinking a big
accurate model into a serving-size one.

    L = (1 - w) * CE(student, labels)
      + w * T^2 * KL( softmax(teacher/T) || softmax(student/T) )

computed per teacher-forced decoder step over the valid target positions,
normalized exactly like the reference CE (per-example mean over length,
then batch mean — core/losses.py semantics), so the two terms are on the
same scale. The T^2 factor keeps gradient magnitudes T-independent.

The teacher is loaded FROM ITS RUN DIR (-distill_dir): its architecture is
re-read from the run's own parameters.txt (config.config_from_text), so
teacher and student are independent models — the usual case is a wide/deep
teacher and a serving-size student. Requirements: both attention-family,
same target vocabulary (same -vocab_dir). The teacher runs in eval mode
(no dropout/sampling) under stop_gradient; the student keeps its training
noise.

Aux tasks (phone decoders) keep their plain CE — distillation targets the
char task the teacher was selected on.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import Seq2SeqConfig
from e2e_asr_tpu.core import losses
from e2e_asr_tpu.models import seq2seq

Array = jax.Array


def _char_logits(params: dict, cfg: Seq2SeqConfig, batch: dict, *,
                 rng: Array | None, compute_dtype=None) -> Array:
    """Teacher-forced char-decoder logits [T-1, B, V]. rng=None = eval mode
    (no dropout / scheduled sampling)."""
    train = rng is not None
    if not train:
        cfg = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, out_prob=1.0),
            decoders={t: dataclasses.replace(d, samp_prob=0.0,
                                             out_prob_dec=1.0)
                      for t, d in cfg.decoders.items()})
        rng = jax.random.PRNGKey(0)
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"], train=train,
        rng=rng, compute_dtype=compute_dtype)
    depth = cfg.num_layers["char"]
    dec_inputs = jnp.transpose(batch["char"], (1, 0))
    return seq2seq.decoder_module(cfg.decoders["char"]).apply_train(
        params["decoder_char"], cfg.decoders["char"], dec_inputs,
        attn_states[depth], enc_lens[depth], rng=rng,
        compute_dtype=compute_dtype)


def distill_loss(student_params: dict, cfg: Seq2SeqConfig,
                 teacher_params: dict, teacher_cfg: Seq2SeqConfig,
                 batch: dict, *, rng: Array, weight: float,
                 temperature: float, compute_dtype=None,
                 encode_fn=None):
    """(total, per_task metrics incl. 'distill' = the KL term).

    encode_fn: drop-in for seq2seq.encode applied to the STUDENT encoder
    (pipeline/sequence parallelism — core/pipeline.encode_pipeline or
    core/seq_parallel.encode_seq_parallel). The teacher deliberately stays
    on the serial seq2seq.encode: it is inference-only under stop_gradient,
    its architecture (re-read from its own parameters.txt) need not satisfy
    the student's pp/sp divisibility constraints, and a serial teacher
    composes with any student mesh."""
    # ONE student encoder pass feeds the char head and every aux task
    # (seq2seq.apply_train's structure); only the teacher encodes again.
    rng_enc, rng_dec = jax.random.split(rng)
    attn_states, _, enc_lens = (encode_fn or seq2seq.encode)(
        student_params, cfg, batch["logmel"], batch["logmel_len"],
        train=True, rng=rng_enc, compute_dtype=compute_dtype)
    depth = cfg.num_layers["char"]
    dec_inputs_char = jnp.transpose(batch["char"], (1, 0))
    s_logits = seq2seq.decoder_module(cfg.decoders["char"]).apply_train(
        student_params["decoder_char"], cfg.decoders["char"],
        dec_inputs_char, attn_states[depth], enc_lens[depth],
        rng=jax.random.fold_in(rng_dec, 0), compute_dtype=compute_dtype)
    t_logits = jax.lax.stop_gradient(_char_logits(
        teacher_params, teacher_cfg, batch, rng=None,
        compute_dtype=compute_dtype))

    targets, mask = losses.shifted_targets(dec_inputs_char,
                                           batch["char_len"])
    ce = losses.cross_entropy_loss(s_logits, targets, batch["char_len"])

    T = temperature
    t_lp = jax.nn.log_softmax(t_logits.astype(jnp.float32) / T, axis=-1)
    s_lp = jax.nn.log_softmax(s_logits.astype(jnp.float32) / T, axis=-1)
    kl_tok = jnp.sum(jnp.exp(t_lp) * (t_lp - s_lp), axis=-1)   # [T-1, B]
    per_ex = jnp.sum(kl_tok * mask, axis=0) / jnp.maximum(
        batch["char_len"].astype(jnp.float32), 1.0)
    kl = (T * T) * jnp.mean(per_ex)

    per_task = {"char": ce, "distill": kl}
    total = (1.0 - weight) * ce + weight * kl

    # Aux tasks (phone decoders): plain CE over the SAME encoder states.
    for i, task in enumerate(t for t in cfg.tasks if t != "char"):
        d = cfg.num_layers[task]
        dec_inputs = jnp.transpose(batch[task], (1, 0))
        lg = seq2seq.decoder_module(cfg.decoders[task]).apply_train(
            student_params[f"decoder_{task}"], cfg.decoders[task],
            dec_inputs, attn_states[d], enc_lens[d],
            rng=jax.random.fold_in(rng_dec, 1 + i),
            compute_dtype=compute_dtype)
        tg, _ = losses.shifted_targets(dec_inputs, batch[f"{task}_len"])
        aux_ce = losses.cross_entropy_loss(lg, tg, batch[f"{task}_len"])
        per_task[task] = aux_ce
        total = total + aux_ce
    return total, per_task


def load_teacher(distill_dir: str, *, vocab_size: int):
    """(teacher_model_cfg, teacher_params) from a run dir: architecture from
    its parameters.txt, weights from its best/latest checkpoint."""
    import os

    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.train import step as step_lib

    ptxt = os.path.join(distill_dir, "parameters.txt")
    if not os.path.isfile(ptxt):
        raise FileNotFoundError(
            f"-distill_dir needs the teacher run dir (no {ptxt})")
    tcfg = config_lib.config_from_text(open(ptxt).read())
    if tcfg.model.model_family != "attention" or tcfg.model.ctc_weight > 0:
        raise ValueError("distillation teachers are attention-family runs")
    if tcfg.model.decoders["char"].vocab_size != vocab_size:
        raise ValueError(
            f"teacher vocab {tcfg.model.decoders['char'].vocab_size} != "
            f"student vocab {vocab_size} (same -vocab_dir required)")
    params = step_lib.init_params(jax.random.PRNGKey(0), tcfg.model)
    state = step_lib.create_state(params, tcfg.model, tcfg.lm)
    ckpt_path = None
    for d in (tcfg.train.best_model_dir, tcfg.train.train_dir, distill_dir):
        found = ckpt_lib.latest_path(d)
        if found:
            ckpt_path = found[0]
            state = ckpt_lib.restore(ckpt_path, state)
            break
    if ckpt_path is None:
        raise FileNotFoundError(
            f"no teacher checkpoint under {distill_dir}")
    print(f"Distillation teacher: {ckpt_path}")
    # A LoRA-trained teacher serves its merged view (core/lora.py).
    t_params = step_lib.lora_merged(state.params, tcfg.model)
    # Checkpoint-restored leaves arrive as numpy arrays; the teacher's
    # embedding gather indexes with traced ids, which numpy rejects.
    return tcfg.model, jax.tree_util.tree_map(jnp.asarray, t_params)
