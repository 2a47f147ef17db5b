"""Hybrid CTC/attention training: one encoder, both objectives.

Extension beyond the reference: the standard hybrid recipe (Watanabe et al.)
interpolates the attention decoder's cross entropy with a CTC loss on the
encoder output — the CTC term regularizes attention toward monotonic
alignments and speeds convergence. Shares ONE encoder pass between both heads.

total = (1 - ctc_weight) * attention_CE  +  ctc_weight * CTC
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from e2e_asr_tpu.config import Seq2SeqConfig
from e2e_asr_tpu.core import losses
from e2e_asr_tpu.core.layers import dense, dense_params
from e2e_asr_tpu.models import ctc, seq2seq

Array = jax.Array


def init(key: Array, cfg: Seq2SeqConfig) -> dict:
    """Full seq2seq params plus a CTC head on the char-task encoder depth."""
    k_s2s, k_head = jax.random.split(key)
    params = seq2seq.init(k_s2s, cfg)
    attn_size = cfg.encoder.hidden_size * (2 if cfg.encoder.bi_dir else 1)
    vocab = cfg.decoders["char"].vocab_size
    params["ctc_head"] = dense_params(k_head, attn_size, vocab)
    return params


def loss(params: dict, cfg: Seq2SeqConfig, batch: dict, *, ctc_weight: float,
         rng: Array, compute_dtype=None, ep_mesh=None,
         encode_fn=None) -> tuple[Array, dict]:
    """batch: the seq2seq batch plus `labels` [B, L] / `label_lens` [B]
    (token ids without <go>/<eos>, 0-padded) for the CTC term.

    Returns (total, {"attention": ..., "ctc": ...} plus per-task CEs).
    MoE encoders surface their load-balance aux loss here exactly as in
    seq2seq.apply_train ("moe_aux" metric, moe_aux_weight-scaled term)."""
    rng_enc, rng_dec = jax.random.split(rng)
    aux_sink: list | None = [] if cfg.encoder.moe_experts > 0 else None
    attn_states, _, enc_lens = (encode_fn or seq2seq.encode)(
        params, cfg, batch["logmel"], batch["logmel_len"], train=True,
        rng=rng_enc, compute_dtype=compute_dtype, aux_sink=aux_sink,
        ep_mesh=ep_mesh)

    # Attention branch (same math as seq2seq.apply_train, reusing the encode).
    task_losses: dict = {}
    for i, task in enumerate(cfg.tasks):
        depth = cfg.num_layers[task]
        dec_inputs = jnp.transpose(batch[task], (1, 0))
        lg = seq2seq.decoder_module(cfg.decoders[task]).apply_train(
            params[f"decoder_{task}"], cfg.decoders[task], dec_inputs,
            attn_states[depth], enc_lens[depth],
            rng=jax.random.fold_in(rng_dec, i), compute_dtype=compute_dtype)
        targets, _ = losses.shifted_targets(dec_inputs, batch[f"{task}_len"])
        task_losses[task] = losses.cross_entropy_loss(
            lg, targets, batch[f"{task}_len"])
    attention_total = sum(task_losses.values())
    if cfg.avg:
        attention_total = attention_total / float(len(cfg.tasks))

    # CTC branch on the char-task depth.
    depth = cfg.num_layers["char"]
    ctc_logits = dense(params["ctc_head"], attn_states[depth],
                       compute_dtype=compute_dtype)
    T = ctc_logits.shape[1]
    logit_pad = (jnp.arange(T)[None, :]
                 >= enc_lens[depth].astype(jnp.int32)[:, None]
                 ).astype(jnp.float32)
    L = batch["labels"].shape[1]
    label_pad = (jnp.arange(L)[None, :]
                 >= batch["label_lens"].astype(jnp.int32)[:, None]
                 ).astype(jnp.float32)
    ctc_total = jnp.mean(optax.ctc_loss(ctc_logits, logit_pad,
                                        batch["labels"], label_pad,
                                        blank_id=ctc.BLANK_ID))

    total = (1.0 - ctc_weight) * attention_total + ctc_weight * ctc_total
    metrics = {"attention": attention_total, "ctc": ctc_total, **task_losses}
    if aux_sink:
        aux = sum(aux_sink)
        metrics["moe_aux"] = aux
        total = total + cfg.encoder.moe_aux_weight * aux
    return total, metrics
