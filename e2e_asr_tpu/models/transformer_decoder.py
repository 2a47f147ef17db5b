"""Transformer attention decoder (extension — no reference counterpart).

Completes the all-transformer seq2seq: the reference's attention family pairs
any encoder with a recurrent Bahdanau decoder (/root/reference/attn_decoder.py);
this module is a drop-in alternative decoder (`-decoder_type transformer`)
with the SAME interfaces as models/attn_decoder.py (init / apply_train /
apply_infer / apply_infer_early, plus a beam-step protocol consumed by
eval/beam.py), so every downstream surface — greedy eval, batched beam search
with LM fusion / joint CTC / biasing, long-form, streaming, serving, MWER,
distillation — works unchanged.

TPU-first rationale: teacher-forced training is ONE parallel pass over all
output positions (three batched GEMM groups per block on the MXU) instead of
a T-step sequential scan — the decoder stops being latency-chain-bound.
Inference is incremental with per-block self-attention KV caches carried in
the beam state (leaves [B, k, S, nh, hd], gathered along the beam axis by the
standard selection machinery).

Architecture (pre-LN, GELU FFN, sinusoidal positions):
  per block: LN -> causal self-attention -> +residual
             LN -> cross-attention over encoder states (masked by enc_lens)
             -> +residual
             LN -> FFN(dec_ffn_mult * D) -> +residual
  final LN -> output projection to the vocabulary.
d_model = cfg.hidden_size_dec; blocks = cfg.num_layers_dec; heads =
cfg.dec_heads. The embedding table and output projection keep the RNN
decoder's leaf names ("embedding", "output_proj") so vocab-axis model
sharding (core/sharding.py) and int8 quantization apply unchanged.

Scheduled sampling (cfg.samp_prob > 0) uses the two-pass parallel
approximation (Mihaylova & Martins, 2019): pass 1 is teacher-forced; with one
coin per step (the reference's granularity, attn_decoder.py:132-139) the
input at position t+1 is replaced by pass 1's sampled token at t; pass 2
produces the training logits. samp_prob = 0 is a single pass.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import DecoderConfig
from e2e_asr_tpu.core.layers import dense, dense_params, uniform_init
from e2e_asr_tpu.models.transformer_encoder import _layer_norm, _sinusoidal

Array = jax.Array
NEG_INF = -1e30


class CrossCtx(NamedTuple):
    """Precomputed cross-attention quantities (the transformer analogue of
    attn_decoder.AttnContext): per-block encoder K/V projections + mask."""
    enc_states: Array        # [B, T_enc, H_enc]
    xk: tuple                # per block [B, T_enc, nh, hd]
    xv: tuple                # per block [B, T_enc, nh, hd]
    mask: Array              # [B, T_enc] float 1/0 validity


def _heads(cfg: DecoderConfig) -> tuple[int, int]:
    nh = cfg.dec_heads
    D = cfg.hidden_size_dec
    if D % nh != 0:
        raise ValueError(f"-hsize_dec {D} must be divisible by -dec_heads {nh}")
    return nh, D // nh


def init(key: Array, cfg: DecoderConfig, attn_size: int) -> dict:
    """Same signature as attn_decoder.init. attn_size: encoder output dim."""
    _heads(cfg)   # validate divisibility early
    D = cfg.hidden_size_dec
    F = cfg.dec_ffn_mult * D
    n_keys = 2 + 10 * cfg.num_layers_dec
    ks = iter(jax.random.split(key, n_keys))
    ln = lambda: {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}  # noqa: E731
    params: dict = {
        # Leaf names shared with the RNN decoder on purpose: "embedding" and
        # "output_proj/{kernel,bias}" pick up the vocab-axis sharding rules
        # (core/sharding.py:37-46) and the quantizer unchanged.
        "embedding": uniform_init(next(ks), (cfg.vocab_size, D), 1.0),
        "ln_out": ln(),
        "output_proj": dense_params(next(ks), D, cfg.vocab_size),
    }
    blocks = []
    for _ in range(cfg.num_layers_dec):
        blocks.append({
            "ln1": ln(),
            "self_q": dense_params(next(ks), D, D),
            "self_k": dense_params(next(ks), D, D),
            "self_v": dense_params(next(ks), D, D),
            "self_o": dense_params(next(ks), D, D),
            "ln2": ln(),
            "cross_q": dense_params(next(ks), D, D),
            "cross_k": dense_params(next(ks), attn_size, D),
            "cross_v": dense_params(next(ks), attn_size, D),
            "cross_o": dense_params(next(ks), D, D),
            "ln3": ln(),
            "ffn1": dense_params(next(ks), D, F),
            "ffn2": dense_params(next(ks), F, D),
        })
    params["blocks"] = blocks
    return params


def make_cross_ctx(params: dict, cfg: DecoderConfig, enc_states: Array,
                   enc_lens: Array, *, compute_dtype=None) -> CrossCtx:
    """Precompute per-block encoder K/V once per utterance (constant across
    all decode steps — the analogue of attn_decoder.make_attn_context)."""
    nh, hd = _heads(cfg)
    B, T_enc, _ = enc_states.shape
    xk, xv = [], []
    for blk in params["blocks"]:
        k = dense(blk["cross_k"], enc_states, compute_dtype=compute_dtype)
        v = dense(blk["cross_v"], enc_states, compute_dtype=compute_dtype)
        xk.append(k.reshape(B, T_enc, nh, hd))
        xv.append(v.reshape(B, T_enc, nh, hd))
    mask = (jnp.arange(T_enc)[None, :]
            < enc_lens.astype(jnp.int32)[:, None]).astype(jnp.float32)
    return CrossCtx(enc_states, tuple(xk), tuple(xv), mask)


def zero_caches(cfg: DecoderConfig, batch_shape: tuple, max_steps: int
                ) -> tuple:
    """Per-block self-attention KV caches, leaves [*batch_shape, S, nh, hd]."""
    nh, hd = _heads(cfg)
    shape = tuple(batch_shape) + (max_steps, nh, hd)
    return tuple({"k": jnp.zeros(shape), "v": jnp.zeros(shape)}
                 for _ in range(cfg.num_layers_dec))


def _split_heads(x: Array, nh: int, hd: int) -> Array:
    return x.reshape(x.shape[:-1] + (nh, hd))


def _merge_heads(x: Array) -> Array:
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


# ---------------------------------------------------------------------------
# Parallel (training) forward
# ---------------------------------------------------------------------------

def _full_forward(params: dict, cfg: DecoderConfig, x: Array,
                  enc_states: Array, enc_mask: Array, *,
                  rng: Array | None = None, compute_dtype=None,
                  zero_cross: bool = False) -> tuple[Array, Array]:
    """Teacher-forced forward over all positions at once.

    x: [B, S, D] embedded inputs (positions already added).
    Returns (logits [B, S, V], last-block cross-attention alpha [B, S, T_enc]
    averaged over heads — the coverage/anchor signal downstream consumers of
    the RNN decoder's alpha expect).

    zero_cross: the internal-LM estimate (ILME, Meng et al. 2021) — the
    cross-attention VALUE aggregate is forced to zeros (its output
    projection, bias included, still applies), so the forward never sees
    the encoder; alpha is returned as None.
    """
    nh, hd = _heads(cfg)
    B, S, D = x.shape
    cd = compute_dtype
    causal = jnp.tril(jnp.ones((S, S), bool))
    keep = cfg.out_prob_dec
    use_drop = rng is not None and keep < 1.0
    if use_drop:
        drop_keys = iter(jax.random.split(rng, 3 * len(params["blocks"])))

    def maybe_drop(h):
        if not use_drop:
            return h
        from e2e_asr_tpu.core.layers import dropout
        return dropout(next(drop_keys), h, keep)

    h = x
    alpha = None
    for blk in params["blocks"]:
        # Causal self-attention.
        y = _layer_norm(blk["ln1"], h)
        q = _split_heads(dense(blk["self_q"], y, compute_dtype=cd), nh, hd)
        k = _split_heads(dense(blk["self_k"], y, compute_dtype=cd), nh, hd)
        v = _split_heads(dense(blk["self_v"], y, compute_dtype=cd), nh, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        s = jnp.where(causal[None, None], s, NEG_INF)
        a = jax.nn.softmax(s, axis=-1)
        if cd is not None:
            a = a.astype(cd)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                       preferred_element_type=jnp.float32)
        h = h + maybe_drop(dense(blk["self_o"], _merge_heads(o),
                                 compute_dtype=cd))
        # Cross-attention over the encoder.
        y = _layer_norm(blk["ln2"], h)
        if zero_cross:
            o = jnp.zeros_like(y)
        else:
            q = _split_heads(dense(blk["cross_q"], y, compute_dtype=cd),
                             nh, hd)
            k = _split_heads(dense(blk["cross_k"], enc_states,
                                   compute_dtype=cd), nh, hd)
            v = _split_heads(dense(blk["cross_v"], enc_states,
                                   compute_dtype=cd), nh, hd)
            s = jnp.einsum("bqhd,bthd->bhqt", q, k,
                           preferred_element_type=jnp.float32) / math.sqrt(hd)
            s = jnp.where(enc_mask[:, None, None, :] > 0, s, NEG_INF)
            a = jax.nn.softmax(s, axis=-1)              # [B,nh,S,T_enc]
            alpha = jnp.mean(a, axis=1)                 # last block wins
            if cd is not None:
                a = a.astype(cd)
            o = _merge_heads(jnp.einsum("bhqt,bthd->bqhd", a, v,
                                        preferred_element_type=jnp.float32))
        h = h + maybe_drop(dense(blk["cross_o"], o, compute_dtype=cd))
        # FFN.
        y = _layer_norm(blk["ln3"], h)
        h = h + maybe_drop(dense(blk["ffn2"],
                                 jax.nn.gelu(dense(blk["ffn1"], y,
                                                   compute_dtype=cd)),
                                 compute_dtype=cd))
    logits = dense(params["output_proj"], _layer_norm(params["ln_out"], h),
                   compute_dtype=cd)
    return logits, alpha


def _enc_mask(enc_states: Array, enc_lens: Array) -> Array:
    T_enc = enc_states.shape[1]
    return (jnp.arange(T_enc)[None, :]
            < enc_lens.astype(jnp.int32)[:, None]).astype(jnp.float32)


def apply_train(params: dict, cfg: DecoderConfig, dec_inputs: Array,
                enc_states: Array, enc_lens: Array, *, rng: Array,
                compute_dtype=None) -> Array:
    """Teacher-forced training pass (same contract as attn_decoder.apply_train).

    dec_inputs: [T, B] time-major ids starting with <go>.
    Returns logits [T-1, B, V] (logits[t] predicts dec_inputs[t+1]).
    """
    T, B = dec_inputs.shape
    steps = T - 1
    emb = params["embedding"]
    pos = jnp.asarray(_sinusoidal(steps, cfg.hidden_size_dec))
    inputs_bt = jnp.transpose(dec_inputs[:-1], (1, 0))            # [B, steps]
    x = emb[inputs_bt] + pos[None]                                # [B, S, D]
    enc_mask = _enc_mask(enc_states, enc_lens)

    rng_ss, rng_d1, rng_d2 = jax.random.split(rng, 3)
    logits, _ = _full_forward(params, cfg, x, enc_states, enc_mask,
                              rng=rng_d1 if cfg.out_prob_dec < 1.0 else None,
                              compute_dtype=compute_dtype)        # [B, S, V]

    if cfg.samp_prob > 0:
        # Two-pass scheduled sampling: one coin per step for the whole batch
        # (the reference's granularity), inputs at t+1 replaced by pass 1's
        # sampled token at t, then a second forward produces the logits.
        rng_coin, rng_gum = jax.random.split(rng_ss)
        flags = (jax.random.uniform(rng_coin, (steps,))
                 >= 1.0 - cfg.samp_prob)                          # [S]
        u = jax.random.uniform(rng_gum, logits.shape,
                               minval=1e-20, maxval=1.0)
        sampled = jnp.argmax(logits + -jnp.log(-jnp.log(u)), axis=-1)
        mixed = jnp.where(flags[None, :-1], sampled[:, :-1], inputs_bt[:, 1:])
        inputs2 = jnp.concatenate([inputs_bt[:, :1], mixed], axis=1)
        x2 = emb[inputs2] + pos[None]
        logits, _ = _full_forward(
            params, cfg, x2, enc_states, enc_mask,
            rng=rng_d2 if cfg.out_prob_dec < 1.0 else None,
            compute_dtype=compute_dtype)

    return jnp.transpose(logits, (1, 0, 2))                       # [S, B, V]


def apply_lm(params: dict, cfg: DecoderConfig, token_ids: Array,
             seq_len: Array, *, train: bool = False,
             rng: Array | None = None, compute_dtype=None) -> Array:
    """The weight-tied LM task on the transformer decoder: a causal LM
    forward through the decoder's own self-attention stack + embedding +
    softmax, with cross-attention dropped (zero_cross — the ILME forward).

    This is the transformer analogue of the reference's LM/decoder
    parameter sharing (/root/reference/lm_model.py:94-106,
    lm_encoder.py:101-109): training this LM updates the decoder's leaves
    directly, so `-lm_prob` interleaving and `-pretrain_lm_path` transfer
    work for `-decoder_type transformer` exactly as they do for the
    recurrent decoder (rnn_lm.apply dispatches here).

    token_ids: [T, B] time-major (row 0 is <go>). Returns logits
    [T-1, B, V]. seq_len is unused under causal attention (the loss masks);
    kept for the rnn_lm.apply contract.
    """
    del seq_len
    T, B = token_ids.shape
    steps = T - 1
    pos = jnp.asarray(_sinusoidal(steps, cfg.hidden_size_dec))
    x = params["embedding"][jnp.transpose(token_ids[:-1], (1, 0))] + pos[None]
    # zero_cross never reads the encoder; a [B, 1, attn_size] dummy only
    # carries shapes through _full_forward's signature.
    attn_size = params["blocks"][0]["cross_k"]["kernel"].shape[0]
    dummy_enc = jnp.zeros((B, 1, attn_size), x.dtype)
    dummy_mask = jnp.ones((B, 1), jnp.float32)
    use_drop = train and rng is not None and cfg.out_prob_dec < 1.0
    logits, _ = _full_forward(params, cfg, x, dummy_enc, dummy_mask,
                              rng=rng if use_drop else None,
                              compute_dtype=compute_dtype, zero_cross=True)
    return jnp.transpose(logits, (1, 0, 2))                       # [S, B, V]


def tied_lm_view(params: dict, cfg: DecoderConfig,
                 horizon: int = 512) -> dict:
    """Materialize the decoder's tied causal LM as a transformer-LM-layout
    params dict (models/transformer_lm.py), so every fusion surface
    (beam shallow fusion, -lm_rescore, CTC/transducer beams, serving)
    consumes the tied weights through the standard hooks — the transformer
    mirror of rnn_lm.shared_lm_params for the recurrent decoder.

    Layout mapping per block: {ln1, self_q/k/v/o} verbatim; the decoder's
    ffn pre-norm is ln3 (ln2 normalizes the dropped cross-attention input
    and is unused); "cross_bias" carries the cross_o BIAS that the
    zero-crossed residual still adds (apply_lm/_full_forward zero_cross:
    dense(cross_o, zeros) == bias), so fused scores equal apply_lm exactly.
    pos_emb is the decoder's sinusoidal table, materialized to `horizon`
    steps (the decoder itself is horizon-free; rnn_lm.fusion_init checks
    this length against the decode's max steps)."""
    view = {
        "embedding": params["embedding"],
        "pos_emb": jnp.asarray(_sinusoidal(horizon, cfg.hidden_size_dec)),
        "heads_marker": jnp.zeros((cfg.dec_heads,), jnp.float32),
        "ln_out": params["ln_out"],
        "output_proj": params["output_proj"],
        "tlm_blocks": [
            {"ln1": blk["ln1"],
             "self_q": blk["self_q"], "self_k": blk["self_k"],
             "self_v": blk["self_v"], "self_o": blk["self_o"],
             "cross_bias": blk["cross_o"]["bias"],
             "ln2": blk["ln3"],
             "ffn1": blk["ffn1"], "ffn2": blk["ffn2"]}
            for blk in params["blocks"]],
    }
    return view


# ---------------------------------------------------------------------------
# Incremental (inference) step
# ---------------------------------------------------------------------------

def _step_body(params: dict, cfg: DecoderConfig, xctx: CrossCtx,
               caches: tuple, inp_emb: Array, t: Array, self_attn, *,
               compute_dtype=None, zero_cross: bool = False
               ) -> tuple[tuple, Array, Array, Array]:
    """Shared incremental-step block math for step_beam/step_beam_indirect.

    The two public variants differ ONLY in how self-attention routes the
    cached K/V along the beam axis; `self_attn(q, ck, cv, step_mask)`
    supplies that routing and returns the [B,k,nh,hd] attention output.
    Everything else — cache writes, cross-attention, FFN, LNs, logits,
    the zero_cross (ILME) contract — lives once, here.
    """
    nh, hd = _heads(cfg)
    B, k, D = inp_emb.shape
    S = caches[0]["k"].shape[2]
    cd = compute_dtype
    pos = jnp.asarray(_sinusoidal(S, D))
    h = inp_emb + jax.lax.dynamic_index_in_dim(pos, t, keepdims=True)[None]
    step_mask = (jnp.arange(S) <= t)                              # [S]
    probs = None
    new_caches = []
    for i, blk in enumerate(params["blocks"]):
        y = _layer_norm(blk["ln1"], h)
        q = _split_heads(dense(blk["self_q"], y, compute_dtype=cd), nh, hd)
        kk = _split_heads(dense(blk["self_k"], y, compute_dtype=cd), nh, hd)
        vv = _split_heads(dense(blk["self_v"], y, compute_dtype=cd), nh, hd)
        ck = jax.lax.dynamic_update_slice_in_dim(
            caches[i]["k"], kk[:, :, None].astype(caches[i]["k"].dtype),
            t, axis=2)
        cv = jax.lax.dynamic_update_slice_in_dim(
            caches[i]["v"], vv[:, :, None].astype(caches[i]["v"].dtype),
            t, axis=2)
        new_caches.append({"k": ck, "v": cv})
        o = self_attn(q, ck, cv, step_mask)
        h = h + dense(blk["self_o"], _merge_heads(o), compute_dtype=cd)

        y = _layer_norm(blk["ln2"], h)
        if zero_cross:
            o = jnp.zeros_like(y)
        else:
            q = _split_heads(dense(blk["cross_q"], y, compute_dtype=cd),
                             nh, hd)
            s = jnp.einsum("bkhd,bthd->bkht", q, xctx.xk[i],
                           preferred_element_type=jnp.float32) / math.sqrt(hd)
            s = jnp.where(xctx.mask[:, None, None, :] > 0, s, NEG_INF)
            a = jax.nn.softmax(s, axis=-1)                        # [B,k,nh,T]
            probs = a
            if cd is not None:
                a = a.astype(cd)
            o = _merge_heads(jnp.einsum("bkht,bthd->bkhd", a, xctx.xv[i],
                                        preferred_element_type=jnp.float32))
        h = h + dense(blk["cross_o"], o, compute_dtype=cd)

        y = _layer_norm(blk["ln3"], h)
        h = h + dense(blk["ffn2"],
                      jax.nn.gelu(dense(blk["ffn1"], y, compute_dtype=cd)),
                      compute_dtype=cd)
    logits = dense(params["output_proj"], _layer_norm(params["ln_out"], h),
                   compute_dtype=cd)
    if zero_cross:
        return tuple(new_caches), (), (), jax.nn.log_softmax(logits, -1)
    alpha = jnp.mean(probs.astype(jnp.float32), axis=2)           # [B,k,T]
    context = jnp.einsum("bkt,bth->bkh", alpha, xctx.enc_states)
    return tuple(new_caches), context, alpha, jax.nn.log_softmax(logits, -1)


def step_beam(params: dict, cfg: DecoderConfig, xctx: CrossCtx, caches: tuple,
              inp_emb: Array, t: Array, *, compute_dtype=None,
              zero_cross: bool = False
              ) -> tuple[tuple, Array, Array, Array]:
    """One incremental decode step over a [B, k] beam.

    inp_emb: [B, k, D] current-position token embedding (positions added
    here from `t`). caches: zero_caches(cfg, (B, k), S) pytree; `t` is the
    write position (scalar int32, 0-based).
    Returns (new_caches, context [B,k,H_enc], alpha [B,k,T_enc],
    log_probs [B,k,V]). context/alpha come from the LAST block's
    head-averaged cross-attention — the RNN decoder's coverage/anchor
    contract.

    zero_cross: the internal-LM recurrence (ILME) — cross-attention values
    forced to zeros exactly as in _full_forward; context/alpha return ().
    """
    _, hd = _heads(cfg)
    cd = compute_dtype

    def self_attn(q, ck, cv, step_mask):
        s = jnp.einsum("bkhd,bkshd->bkhs", q, ck,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        s = jnp.where(step_mask[None, None, None, :], s, NEG_INF)
        a = jax.nn.softmax(s, axis=-1)
        if cd is not None:
            a = a.astype(cd)
        return jnp.einsum("bkhs,bkshd->bkhd", a, cv,
                          preferred_element_type=jnp.float32)

    return _step_body(params, cfg, xctx, caches, inp_emb, t, self_attn,
                      compute_dtype=cd, zero_cross=zero_cross)


def ancestry_onehot(ancestry: Array, t: Array, k: int) -> Array:
    """[B,k,c,S] routing one-hot from an ancestry map: position s of
    hypothesis j selects source row ancestry[b,j,s], except position t
    (the row being written this step) which is the own row. Exactly one 1
    per (b,k,s) — selection, never mixing, so routing through it is exact
    in f32. Shared by the transformer decoder's and the fusion LM's
    indirect beam steps."""
    S = ancestry.shape[-1]
    t_mask = (jnp.arange(S) <= t) & (jnp.arange(S) != t)          # [S]
    cur = jnp.arange(k, dtype=ancestry.dtype)
    anc = jnp.where(t_mask[None, None, :],
                    ancestry, cur[None, :, None])  # position t = own row
    return (anc[:, :, None, :] == cur[None, None, :, None]).astype(
        jnp.float32)                                              # [B,k,c,S]


def ancestry_attend(q: Array, ck: Array, cv: Array, onehot: Array,
                    step_mask: Array, cast=None) -> Array:
    """Self-attention over in-place beam caches: scores against EVERY
    source row [B,c,S,nh,hd], then ancestry-selects via `onehot`
    (ancestry_onehot). q [B,k,nh,hd]; step_mask [S] bounds valid
    positions; `cast` optionally downcasts the routed probabilities
    before the value aggregation (the gathered paths' compute_dtype
    contract). Returns [B,k,nh,hd]."""
    hd = q.shape[-1]
    s_all = jnp.einsum("bkhd,bcshd->bkchs", q, ck,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
    s = jnp.einsum("bkchs,bkcs->bkhs", s_all, onehot)
    s = jnp.where(step_mask[None, None, None, :], s, NEG_INF)
    a = jax.nn.softmax(s, axis=-1)                                # [B,k,h,S]
    a_all = jnp.einsum("bkhs,bkcs->bkchs", a, onehot)
    if cast is not None:
        a_all = a_all.astype(cast)
    return jnp.einsum("bkchs,bcshd->bkhd", a_all, cv,
                      preferred_element_type=jnp.float32)


def step_beam_indirect(params: dict, cfg: DecoderConfig, xctx: CrossCtx,
                       caches: tuple, ancestry: Array, inp_emb: Array,
                       t: Array, *, compute_dtype=None,
                       zero_cross: bool = False
                       ) -> tuple[tuple, Array, Array, Array]:
    """step_beam without per-step cache reorders (the beam fast path).

    The KV caches are NEVER gathered along the beam axis: cache row j,
    position s holds the K/V computed by whatever hypothesis occupied rank
    j at step s. `ancestry` [B, k, S] int32 maps each CURRENT hypothesis's
    position s to the rank that computed it (maintained by eval/beam.py:
    gather the parent's ancestry on selection — a [B,k,S] int32 gather,
    ~1000x smaller than reordering the caches — then set position t to the
    parent's rank). Self-attention scores every source row and selects by
    ancestry (k× the score FLOPs, which are negligible; the cache is read
    ONCE and never rewritten).

    Numerically identical to step_beam on gathered caches (pinned by
    tests/test_transformer_decoder.py).
    """
    cd = compute_dtype
    k = inp_emb.shape[1]
    # probs selected by ancestry: position s of hypothesis j lives in
    # source row ancestry[b,j,s]; onehot [B,k,k_src,S] routes both the
    # score selection and the value aggregation (ancestry_onehot).
    onehot = ancestry_onehot(ancestry, t, k)

    def self_attn(q, ck, cv, step_mask):
        return ancestry_attend(q, ck, cv, onehot, step_mask, cast=cd)

    return _step_body(params, cfg, xctx, caches, inp_emb, t, self_attn,
                      compute_dtype=cd, zero_cross=zero_cross)


# ---------------------------------------------------------------------------
# Greedy decode (same contracts as attn_decoder.apply_infer / _early)
# ---------------------------------------------------------------------------

def apply_infer(params: dict, cfg: DecoderConfig, go_ids: Array,
                enc_states: Array, enc_lens: Array, *, max_output: int,
                compute_dtype=None) -> tuple[Array, Array]:
    """Greedy decode with argmax feedback. Returns (logits [T,B,V],
    ids [T,B])."""
    B = go_ids.shape[0]
    emb = params["embedding"]
    xctx = make_cross_ctx(params, cfg, enc_states, enc_lens,
                          compute_dtype=compute_dtype)
    caches0 = zero_caches(cfg, (B, 1), max_output)

    def scan_step(carry, t):
        caches, inp = carry
        caches, _, _, logp = step_beam(params, cfg, xctx, caches, inp, t,
                                       compute_dtype=compute_dtype)
        logits = logp[:, 0]                                       # [B, V]
        ids = jnp.argmax(logits, axis=-1)
        return (caches, emb[ids][:, None]), (logits, ids)

    init = (caches0, emb[go_ids][:, None])
    _, (logits, ids) = jax.lax.scan(scan_step, init,
                                    jnp.arange(max_output, dtype=jnp.int32))
    return logits, ids


def apply_infer_early(params: dict, cfg: DecoderConfig, go_ids: Array,
                      enc_states: Array, enc_lens: Array, *, max_output: int,
                      eos_id: int = 2, compute_dtype=None) -> Array:
    """Greedy decode with batch-wide early exit (same sentences as
    apply_infer after <eos> truncation). Returns ids [max_output, B]."""
    B = go_ids.shape[0]
    emb = params["embedding"]
    xctx = make_cross_ctx(params, cfg, enc_states, enc_lens,
                          compute_dtype=compute_dtype)
    caches0 = zero_caches(cfg, (B, 1), max_output)

    def cond(carry):
        _, _, t, done, _ = carry
        return jnp.logical_and(t < max_output, ~jnp.all(done))

    def body(carry):
        caches, inp, t, done, out = carry
        caches, _, _, logp = step_beam(params, cfg, xctx, caches, inp, t,
                                       compute_dtype=compute_dtype)
        ids = jnp.argmax(logp[:, 0], axis=-1).astype(jnp.int32)
        ids = jnp.where(done, 0, ids)                 # <pad> after <eos>
        out = out.at[t].set(ids)
        done = jnp.logical_or(done, ids == eos_id)
        return (caches, emb[ids][:, None], t + 1, done, out)

    init = (caches0, emb[go_ids][:, None], jnp.zeros((), jnp.int32),
            jnp.zeros((B,), bool), jnp.zeros((max_output, B), jnp.int32))
    _, _, _, _, out = jax.lax.while_loop(cond, body, init)
    return out
