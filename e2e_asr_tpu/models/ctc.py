"""CTC model family: encoder-only recognizer with a CTC head.

An extension beyond the reference (which is attention-decoder only): the same
pyramidal BiLSTM encoder feeds a per-frame vocabulary projection trained with
CTC loss (optax.ctc_loss) and decoded greedily (argmax -> collapse repeats ->
drop blanks) — entirely on-device, fixed shapes, no alignment supervision.

Conventions: blank id = 0 (the <pad> slot, which never appears in labels);
labels are the raw token sequence without <go>/<eos> framing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from e2e_asr_tpu.config import Seq2SeqConfig
from e2e_asr_tpu.core.layers import dense, dense_params
from e2e_asr_tpu.models import encoder as encoder_lib
from e2e_asr_tpu.models import seq2seq

Array = jax.Array
BLANK_ID = 0


def init(key: Array, cfg: Seq2SeqConfig, vocab_size: int) -> dict:
    """Encoder + per-frame CTC projection. cfg.num_layers['char'] names the
    encoder depth whose output feeds the head."""
    k_enc, k_head = jax.random.split(key)
    max_depth = max(cfg.num_layers.values())
    attn_size = cfg.encoder.hidden_size * (2 if cfg.encoder.bi_dir else 1)
    return {
        "encoder": encoder_lib.init(k_enc, cfg.encoder, max_depth,
                                    cfg.feat_length),
        "ctc_head": dense_params(k_head, attn_size, vocab_size),
    }


def logits(params: dict, cfg: Seq2SeqConfig, feats: Array, feat_lens: Array,
           *, train: bool = False, rng: Array | None = None,
           compute_dtype=None, aux_sink: list | None = None,
           ep_mesh=None, encode_fn=None) -> tuple[Array, Array]:
    """Per-frame logits [B, T_enc, V] and encoder lengths [B].

    encode_fn: optional drop-in for seq2seq.encode (pipeline / sequence
    parallelism — same plumbing as seq2seq.apply_train)."""
    attn_states, _, enc_lens = (encode_fn or seq2seq.encode)(
        params, cfg, feats, feat_lens, train=train, rng=rng,
        compute_dtype=compute_dtype, aux_sink=aux_sink, ep_mesh=ep_mesh)
    depth = cfg.num_layers["char"]
    out = dense(params["ctc_head"], attn_states[depth],
                compute_dtype=compute_dtype)
    return out, enc_lens[depth]


def loss(params: dict, cfg: Seq2SeqConfig, batch: dict, *,
         rng: Array | None = None, compute_dtype=None, ep_mesh=None,
         encode_fn=None) -> Array:
    """Mean CTC loss. batch: logmel/logmel_len plus `labels` [B, L] (token
    ids, 0-padded, NO <go>/<eos>) and `label_lens` [B]. MoE encoders fold
    their moe_aux_weight-scaled load-balance aux loss into the total during
    training (rng given)."""
    train = rng is not None
    aux_sink: list | None = ([] if train and cfg.encoder.moe_experts > 0
                             else None)
    lg, enc_lens = logits(params, cfg, batch["logmel"], batch["logmel_len"],
                          train=train, rng=rng,
                          compute_dtype=compute_dtype, aux_sink=aux_sink,
                          ep_mesh=ep_mesh, encode_fn=encode_fn)
    T = lg.shape[1]
    logit_pad = (jnp.arange(T)[None, :]
                 >= enc_lens.astype(jnp.int32)[:, None]).astype(jnp.float32)
    L = batch["labels"].shape[1]
    label_pad = (jnp.arange(L)[None, :]
                 >= batch["label_lens"].astype(jnp.int32)[:, None]
                 ).astype(jnp.float32)
    per_example = optax.ctc_loss(lg, logit_pad, batch["labels"], label_pad,
                                 blank_id=BLANK_ID)
    total = jnp.mean(per_example)
    if aux_sink:
        total = total + cfg.encoder.moe_aux_weight * sum(aux_sink)
    return total


def best_path_from_logits(lg: Array, enc_lens: Array) -> Array:
    """Best-path collapse from per-frame logits [B, T, V]: argmax, collapse
    repeats, drop blanks. Returns [B, T] token ids left-packed, 0-padded."""
    B, T, _ = lg.shape
    ids = jnp.argmax(lg, axis=-1)                               # [B, T]
    valid_t = (jnp.arange(T)[None, :]
               < enc_lens.astype(jnp.int32)[:, None])
    prev = jnp.concatenate([jnp.full((B, 1), -1, ids.dtype), ids[:, :-1]],
                           axis=1)
    keep = (ids != BLANK_ID) & (ids != prev) & valid_t          # [B, T]
    # Left-pack kept tokens with a stable argsort on ~keep.
    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(ids, order, axis=1)
    packed_keep = jnp.take_along_axis(keep, order, axis=1)
    return jnp.where(packed_keep, packed, 0)


def greedy_decode(params: dict, cfg: Seq2SeqConfig, feats: Array,
                  feat_lens: Array, *, compute_dtype=None) -> Array:
    """Best-path decode: per-frame argmax, collapse repeats, drop blanks.

    Returns [B, T_enc] token ids left-packed, 0-padded.
    """
    lg, enc_lens = logits(params, cfg, feats, feat_lens,
                          compute_dtype=compute_dtype)
    return best_path_from_logits(lg, enc_lens)
