"""RNN language model with parameters shared with the ASR decoder.

The reference ties the LM's LSTM + softmax to the char decoder's internal
"LM LSTM" and OutputProjection through TF variable-scope reuse
(/root/reference/lm_model.py:102, lm_encoder.py:101-109). Here the sharing is
explicit: the LM apply function reads the SAME pytree leaves under
params["decoder_char"] — lm_cell, simple_proj (if any), output_proj, and the
embedding. Training the LM task therefore updates the decoder's weights
directly, which is what makes `lm_prob` interleaving and `pretrain_lm_path`
transfer work (train.py:268-291, beam_search.py:111-134).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import LMConfig
from e2e_asr_tpu.core import losses
from e2e_asr_tpu.core.layers import dense, dropout

Array = jax.Array


def shared_lm_params(params: dict, dec_cfg=None, horizon: int = 512) -> dict:
    """View of the char-decoder leaves the LM shares.

    Recurrent decoders: the internal LM-LSTM + softmax leaves (the
    reference tying, lm_encoder.py:101-109). Transformer decoders: the
    tied causal LM over the decoder's self-attention stack, materialized in
    the transformer-LM fusion layout (transformer_decoder.tied_lm_view) —
    requires `dec_cfg` (the char DecoderConfig) for the head count;
    `horizon` bounds the decode length the view's position table covers."""
    dec = params["decoder_char"]
    if "lm_cell" not in dec:
        if "blocks" in dec and dec_cfg is not None:
            from e2e_asr_tpu.models import transformer_decoder as td
            return td.tied_lm_view(dec, dec_cfg, horizon=horizon)
        raise ValueError(
            "this decoder carries no weight-tied internal LM view here "
            "(transformer decoders need the decoder config passed as "
            "shared_lm_params(params, dec_cfg)); or pass an external LM "
            "via -lm_path")
    out = {"lstm": dec["lm_cell"], "output_proj": dec["output_proj"],
           "embedding": dec["embedding"]}
    if "simple_proj" in dec:
        out["simple_proj"] = dec["simple_proj"]
    return out


def fusion_step(lm_params: dict, x, state):
    """One shallow-fusion LM step — the single definition every family's
    beam uses (attention, CTC prefix, transducer), so fusion semantics
    cannot drift. Three LM kinds share the (state, input) -> (log-probs,
    state') flow:

    - RNN (shared_lm_params layout): x = last-token embedding(s) [..., E],
      state = LSTMState; one cell step + softmax projection.
    - trigram table ({"ngram": [V, V, V] logp}, tools/train_ngram.py):
      x = prev-token ids [...], state = prev-prev ids [...]; the step is
      ONE gather (logp = table[state, x]) and the new state is x.
    - transformer LM ("tlm_blocks" layout, models/transformer_lm.py):
      x = prev-token ids [...], state = {per-block KV caches, per-row
      positions}; one incremental causal-attention step.

    Returns (next-token log-probs [..., V] f32, advanced state)."""
    from e2e_asr_tpu.core import cells
    from e2e_asr_tpu.core.layers import dense

    if "ngram" in lm_params:
        return lm_params["ngram"][state, x], x
    if "tlm_blocks" in lm_params:
        from e2e_asr_tpu.models import transformer_lm
        return transformer_lm.fusion_step(lm_params, x, state)
    out, new_state = cells.lstm_step(lm_params["lstm"], x, state)
    if "simple_proj" in lm_params:
        out = dense(lm_params["simple_proj"], out)
    logp = jax.nn.log_softmax(
        dense(lm_params["output_proj"], out).astype(jnp.float32), axis=-1)
    return logp, new_state


def fusion_supports_indirect(lm_params: dict) -> bool:
    """Whether this LM kind carries per-position caches worth ancestry
    indirection (only the transformer kind — RNN/trigram states are tiny
    and reorder for free)."""
    return "tlm_blocks" in lm_params


def fusion_step_indirect(lm_params: dict, x, state, t):
    """fusion_step for a [B, k] beam with in-place KV caches routed by the
    ancestry map in state["anc"] (transformer kind only; see
    transformer_lm.fusion_step_indirect). `t` is the uniform scalar step."""
    from e2e_asr_tpu.models import transformer_lm
    return transformer_lm.fusion_step_indirect(lm_params, x, state, t)


def fusion_init(lm_params: dict, batch_shape, go_id: int,
                steps: int | None = None, indirect: bool = False):
    """(state, input) seeding a fusion carry at the sentence start:
    zero LSTM state + <go> embedding for RNN LMs; (<go>, <go>) id history
    for trigram tables (the table's sentence-initial context); zeroed KV
    caches + <go> ids for transformer LMs.

    steps: the caller's maximum number of fusion_step calls on this carry
    (beam max_steps, CTC frame count + terminal, rescore scan length).
    RNN/trigram LMs are horizon-free; a transformer LM raises here — at
    trace time, with static shapes — if its trained context would be
    exceeded, instead of silently degrading mid-decode.

    indirect: seed the fusion_step_indirect carry instead (transformer kind
    on a [B, k] beam): adds the zeroed ancestry map state["anc"]."""
    from e2e_asr_tpu.core import cells

    if indirect and not fusion_supports_indirect(lm_params):
        raise ValueError("indirect fusion carries apply only to the "
                         "transformer LM kind (RNN/trigram states are tiny "
                         "and reorder for free)")
    if "ngram" in lm_params:
        ids = jnp.full(tuple(batch_shape), go_id, jnp.int32)
        return ids, ids
    if "tlm_blocks" in lm_params:
        from e2e_asr_tpu.models import transformer_lm
        horizon = lm_params["pos_emb"].shape[0]
        if steps is not None and steps > horizon:
            raise ValueError(
                f"transformer-LM context horizon {horizon} < {steps} fusion "
                f"steps this decode may take; retrain the LM with "
                f"-max_len >= {steps} (tools/train_lm.py) or fuse an "
                f"RNN/trigram LM")
        state = transformer_lm.fusion_state(lm_params, tuple(batch_shape))
        if indirect:
            if len(batch_shape) != 2:
                raise ValueError("indirect fusion needs a [B, k] beam shape")
            state["anc"] = jnp.zeros(
                tuple(batch_shape) + (horizon,), jnp.int32)
        return (state,
                jnp.full(tuple(batch_shape), go_id, jnp.int32))
    state = cells.lstm_zero_state(
        tuple(batch_shape), lm_params["lstm"]["bias"].shape[0] // 4)
    return state, lm_params["embedding"][
        jnp.full(tuple(batch_shape), go_id, jnp.int32)]


def fusion_next_input(lm_params: dict, token_ids):
    """The fusion carry's next input after emitting `token_ids`: the token
    embedding for RNN LMs, the raw ids for trigram/transformer kinds."""
    if "ngram" in lm_params or "tlm_blocks" in lm_params:
        return token_ids.astype(jnp.int32)
    return lm_params["embedding"][token_ids]


def apply(params: dict, cfg: LMConfig, token_ids: Array, seq_len: Array, *,
          train: bool = False, rng: Array | None = None,
          compute_dtype=None, dec_cfg=None) -> Array:
    """LM forward: logits over shifted positions.

    token_ids: [T, B] time-major ids (row 0 is <go>); the model consumes
    rows [0, T-1) and predicts rows [1, T) (lm_encoder.py:93).
    Returns logits [T-1, B, V].

    dec_cfg: the char DecoderConfig — required when the tied decoder is a
    transformer (-decoder_type transformer), whose LM task runs the causal
    self-attention stack with cross-attention dropped
    (transformer_decoder.apply_lm); ignored for recurrent decoders.
    """
    from e2e_asr_tpu.core import rnn

    dec = params["decoder_char"]
    if "lm_cell" not in dec and "blocks" in dec:
        if dec_cfg is None:
            raise ValueError("the transformer decoder's tied LM task needs "
                             "dec_cfg (the char DecoderConfig)")
        from e2e_asr_tpu.models import transformer_decoder as td
        return td.apply_lm(dec, dec_cfg, token_ids, seq_len, train=train,
                           rng=rng, compute_dtype=compute_dtype)
    lm = shared_lm_params(params)
    emb_in = lm["embedding"][token_ids[:-1]]          # [T-1, B, emb]
    # Length-aware LSTM scan (Pallas fused kernel on TPU); output masking past
    # seq_len matches dynamic_rnn (lm_encoder.py:93-96) — the loss masks too.
    outputs = rnn.lstm_scan(lm["lstm"], emb_in, seq_len,
                            compute_dtype=compute_dtype)

    if train and cfg.out_prob < 1.0:
        assert rng is not None
        outputs = dropout(rng, outputs, cfg.out_prob)

    if "simple_proj" in lm:
        outputs = dense(lm["simple_proj"], outputs, compute_dtype=compute_dtype)
    logits = dense(lm["output_proj"], outputs, compute_dtype=compute_dtype)
    return logits


def loss(params: dict, cfg: LMConfig, token_ids: Array, seq_len: Array, *,
         train: bool = True, rng: Array | None = None,
         valid: Array | None = None, compute_dtype=None,
         dec_cfg=None) -> Array:
    """Shifted-target CE with the reference normalization (lm_model.py:94-106).

    valid: optional [B] row validity for padded tail batches (data/lm.py)."""
    logits = apply(params, cfg, token_ids, seq_len, train=train, rng=rng,
                   compute_dtype=compute_dtype, dec_cfg=dec_cfg)
    targets, _ = losses.shifted_targets(token_ids, seq_len)
    return losses.cross_entropy_loss(logits, targets, seq_len, weights=valid)
