"""Multitask seq2seq assembly: encoder + one attention decoder per task.

TPU re-design of /root/reference/seq2seq_model.py: a parameter pytree plus
pure apply functions (train loss / greedy decode) instead of a TF graph.
Auxiliary task decoders read the encoder output at *their* depth
(seq2seq_model.py:107-113); losses are summed or averaged across tasks
(seq2seq_model.py:140-144).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import Seq2SeqConfig
from e2e_asr_tpu.core import losses
from e2e_asr_tpu.models import attn_decoder, encoder

Array = jax.Array


def decoder_module(dec_cfg):
    """The attention family's decoder implementation for a task: the
    reference's recurrent decoder (models/attn_decoder.py) or the
    transformer decoder extension (models/transformer_decoder.py) — both
    expose the same init/apply_train/apply_infer/apply_infer_early
    contracts."""
    if getattr(dec_cfg, "decoder_type", "rnn") == "transformer":
        from e2e_asr_tpu.models import transformer_decoder
        return transformer_decoder
    return attn_decoder


def init(key: Array, cfg: Seq2SeqConfig) -> dict:
    max_depth = max(cfg.num_layers.values())
    k_enc, *k_decs = jax.random.split(key, 1 + len(cfg.tasks))
    attn_size = cfg.encoder.hidden_size * (2 if cfg.encoder.bi_dir else 1)
    params = {"encoder": encoder.init(k_enc, cfg.encoder, max_depth,
                                      cfg.feat_length)}
    for task, k in zip(cfg.tasks, k_decs):
        params[f"decoder_{task}"] = decoder_module(cfg.decoders[task]).init(
            k, cfg.decoders[task], attn_size)
    return params


def stack_frames(x: Array, stack_cons: int) -> Array:
    """Frame stacking: concat stack_cons consecutive frames on the feature
    axis with forward shifts, zero-padded at the tail
    (seq2seq_model.py:176-183)."""
    if stack_cons <= 1:
        return x
    parts = [x]
    for shift in range(1, stack_cons):
        shifted = jnp.pad(x[:, shift:, :], ((0, 0), (0, shift), (0, 0)))
        parts.append(shifted)
    return jnp.concatenate(parts, axis=2)


def encode(params: dict, cfg: Seq2SeqConfig, feats: Array, feat_lens: Array,
           *, train: bool = False, rng: Array | None = None,
           compute_dtype=None, aux_sink: list | None = None, ep_mesh=None):
    feats = stack_frames(feats, cfg.encoder.stack_cons)
    return encoder.apply(params["encoder"], cfg.encoder, feats, feat_lens,
                         cfg.num_layers, train=train, rng=rng,
                         compute_dtype=compute_dtype, aux_sink=aux_sink,
                         ep_mesh=ep_mesh)


def apply_train(params: dict, cfg: Seq2SeqConfig, batch: dict, *, rng: Array,
                compute_dtype=None, encode_fn=None, ep_mesh=None,
                ) -> tuple[Array, dict[str, Array]]:
    """Full training forward: returns (total_loss, per-task losses).

    batch: {"logmel": [B,T,F], "logmel_len": [B],
            task: [B,T_task] ids starting with <go>, f"{task}_len": [B]}.
    Target lengths count the shifted targets (incl. <eos>, excl. <go>).

    encode_fn: optional drop-in for `encode` with the same signature/return
    (e.g. core/pipeline.encode_pipeline under pipeline parallelism).
    ep_mesh: ("expert",) mesh for expert-parallel MoE FFNs.
    """
    rng_enc, rng_dec = jax.random.split(rng)
    moe = cfg.encoder.moe_experts > 0
    aux_sink: list | None = [] if moe else None
    kw = dict(train=True, rng=rng_enc, compute_dtype=compute_dtype,
              aux_sink=aux_sink, ep_mesh=ep_mesh)
    attn_states, _, enc_lens = (encode_fn or encode)(
        params, cfg, batch["logmel"], batch["logmel_len"], **kw)
    task_losses: dict[str, Array] = {}
    for i, task in enumerate(cfg.tasks):
        depth = cfg.num_layers[task]
        dec_inputs = jnp.transpose(batch[task], (1, 0))      # [T, B]
        logits = decoder_module(cfg.decoders[task]).apply_train(
            params[f"decoder_{task}"], cfg.decoders[task], dec_inputs,
            attn_states[depth], enc_lens[depth],
            rng=jax.random.fold_in(rng_dec, i), compute_dtype=compute_dtype)
        targets, _ = losses.shifted_targets(dec_inputs, batch[f"{task}_len"])
        task_losses[task] = losses.cross_entropy_loss(
            logits, targets, batch[f"{task}_len"],
            label_smoothing=cfg.label_smoothing)

    total = sum(task_losses.values())
    if cfg.avg:
        total = total / float(len(cfg.tasks))
    if aux_sink:
        # MoE load-balance aux loss (one term per MoE block).
        aux = sum(aux_sink)
        task_losses["moe_aux"] = aux
        total = total + cfg.encoder.moe_aux_weight * aux
    return total, task_losses


def apply_greedy(params: dict, cfg: Seq2SeqConfig, feats: Array,
                 feat_lens: Array, *, task: str = "char", go_id: int = 1,
                 compute_dtype=None, early_exit: bool = True) -> Array:
    """Greedy decode for a batch: returns token ids [B, max_output].

    early_exit stops decoding once every utterance emitted <eos> — sentence
    output is identical to the fixed-length reference loop (which always runs
    max_output steps, seq2seq_model.py:191-193) because the scorer truncates
    at <eos> anyway.
    """
    attn_states, _, enc_lens = encode(params, cfg, feats, feat_lens,
                                      compute_dtype=compute_dtype)
    depth = cfg.num_layers[task]
    B = feats.shape[0]
    go_ids = jnp.full((B,), go_id, dtype=jnp.int32)
    dec = decoder_module(cfg.decoders[task])
    if early_exit:
        ids = dec.apply_infer_early(
            params[f"decoder_{task}"], cfg.decoders[task], go_ids,
            attn_states[depth], enc_lens[depth],
            max_output=cfg.max_output[task], compute_dtype=compute_dtype)
    else:
        _, ids = dec.apply_infer(
            params[f"decoder_{task}"], cfg.decoders[task], go_ids,
            attn_states[depth], enc_lens[depth],
            max_output=cfg.max_output[task], compute_dtype=compute_dtype)
    return jnp.transpose(ids, (1, 0))  # [B, T]


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
