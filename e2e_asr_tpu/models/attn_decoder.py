"""Bahdanau-attention LSTM/GRU decoder.

TPU re-design of the reference attention decoder
(/root/reference/attn_decoder.py:37-172): one step function shared by
training (teacher forcing + scheduled sampling), greedy inference, and beam
search, driven by `lax.scan` over a static number of steps instead of
tf.nn.raw_rnn with a dynamic loop.

Per-step structure (attn_decoder.py:147-162, order preserved):
  internal "LM LSTM" consumes the previous token embedding
  -> optional SimpleProjection (when lm_hidden_size != hidden_size_dec)
  -> InputProjection merges [lm_output, prev context] into the cell input
  -> main decoder cell (1..N layers)
  -> attention over precomputed W*h_enc with masked+renormalized softmax
     (attn_decoder.py:85-88 — mathematically identical to a stable masked
     softmax, which is what we compute)
  -> AttnProjection of [query_state, context] -> OutputProjection logits.

The attention query is the top cell's **c** state for LSTM (decoder.py:74-82,
pinned by beam_search.py:193), the h state for GRU.

Scheduled sampling matches the reference: ONE coin flip per step for the whole
batch (attn_decoder.py:132-139), sampling from the posterior via
jax.random.categorical (tf.multinomial).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import DecoderConfig
from e2e_asr_tpu.core import cells
from e2e_asr_tpu.core.layers import dense, dense_params, glorot_uniform, uniform_init

Array = jax.Array


class AttnContext(NamedTuple):
    """Precomputed encoder-side attention quantities (curried like
    beam_search.py:137-161)."""
    enc_states: Array        # [B, T_enc, H_enc]
    hidden_features: Array   # [B, T_enc, A] = enc_states @ attn_w
    mask: Array              # [B, T_enc] float 1/0 validity


class DecState(NamedTuple):
    """Per-step decoder carry (everything but the next input embedding)."""
    cell_states: tuple       # tuple of LSTMState (or Array for GRU) per layer
    lm_state: cells.LSTMState | Array
    context: Array           # [B, H_enc] previous attention context
    alpha: Array             # [B, T_enc] previous attention weights (coverage)


def init(key: Array, cfg: DecoderConfig, attn_size: int) -> dict:
    """attn_size: encoder output dim (2*hidden for bidir encoders)."""
    ks = iter(jax.random.split(key, 16))
    hid = cfg.hidden_size_dec
    cell_init = cells.lstm_init if cfg.use_lstm else cells.gru_init
    params: dict = {
        "embedding": uniform_init(next(ks), (cfg.vocab_size, cfg.emb_size), 1.0),
        "lm_cell": cell_init(next(ks), cfg.emb_size, cfg.lm_hidden_size),
        "input_proj": dense_params(next(ks), hid + attn_size, cfg.emb_size),
        "attn_w": glorot_uniform(next(ks), (attn_size, cfg.attention_vec_size)),
        "attn_v": glorot_uniform(next(ks), (cfg.attention_vec_size,)),
        "attn_query": dense_params(next(ks), hid, cfg.attention_vec_size),
        "attn_proj": dense_params(next(ks), hid + attn_size, hid),
        "output_proj": dense_params(next(ks), hid, cfg.vocab_size),
    }
    if cfg.ind_softmax:
        # Decoder keeps its own softmax, decoupled from the LM-shared one
        # (OutputProjection2, attn_decoder.py:119-122).
        params["output_proj_ind"] = dense_params(next(ks), hid, cfg.vocab_size)
    if cfg.lm_hidden_size != hid:
        params["simple_proj"] = dense_params(next(ks), cfg.lm_hidden_size, hid)
    dec_cells = []
    for layer in range(cfg.num_layers_dec):
        in_dim = cfg.emb_size if layer == 0 else hid
        dec_cells.append(cell_init(next(ks), in_dim, hid))
    params["dec_cells"] = dec_cells
    return params


def make_attn_context(params: dict, enc_states: Array, enc_lens: Array,
                      *, compute_dtype=None) -> AttnContext:
    """Precompute W*h_enc (the 1x1 conv at attn_decoder.py:70-74) and the
    validity mask."""
    w = params["attn_w"]
    x = enc_states
    if compute_dtype is not None:
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    hidden_features = jnp.dot(x, w, preferred_element_type=jnp.float32)
    T_enc = enc_states.shape[1]
    mask = (jnp.arange(T_enc)[None, :]
            < enc_lens.astype(jnp.int32)[:, None]).astype(jnp.float32)
    return AttnContext(enc_states, hidden_features, mask)


def attention(params: dict, ctx: AttnContext, query: Array) -> tuple[Array, Array]:
    """Masked Bahdanau attention (attn_decoder.py:77-93).

    query: [B, Q]. Returns (context [B, H_enc], alpha [B, T_enc]).
    softmax(s)*mask/renorm == softmax(s masked with -inf): identical math,
    numerically stable.
    """
    y = dense(params["attn_query"], query)                       # [B, A]
    s = jnp.sum(params["attn_v"] * jnp.tanh(ctx.hidden_features + y[:, None, :]),
                axis=-1)                                          # [B, T_enc]
    s = jnp.where(ctx.mask > 0, s, -1e30)
    alpha = jax.nn.softmax(s, axis=-1)
    context = jnp.einsum("bt,bth->bh", alpha, ctx.enc_states)
    return context, alpha


def zero_state(cfg: DecoderConfig, batch: int, ctx: AttnContext) -> DecState:
    if cfg.use_lstm:
        mk = lambda h: cells.lstm_zero_state((batch,), h)  # noqa: E731
    else:
        mk = lambda h: cells.gru_zero_state((batch,), h)  # noqa: E731
    return DecState(
        cell_states=tuple(mk(cfg.hidden_size_dec)
                          for _ in range(cfg.num_layers_dec)),
        lm_state=mk(cfg.lm_hidden_size),
        context=jnp.zeros((batch, ctx.enc_states.shape[-1])),
        alpha=jnp.zeros((batch, ctx.enc_states.shape[1])),
    )


def _cell_step(cfg: DecoderConfig, cell_params: dict, x: Array, state,
               compute_dtype=None):
    if cfg.use_lstm:
        return cells.lstm_step(cell_params, x, state, compute_dtype=compute_dtype)
    return cells.gru_step(cell_params, x, state, compute_dtype=compute_dtype)


def _query_of(cfg: DecoderConfig, cell_states: tuple) -> Array:
    top = cell_states[-1]
    return top.c if cfg.use_lstm else top


def step(params: dict, cfg: DecoderConfig, ctx: AttnContext, state: DecState,
         lm_input: Array, *, lm_drop_mask: Array | None = None,
         inter_drop_masks: tuple | None = None, compute_dtype=None,
         ) -> tuple[DecState, Array]:
    """One decoder step. lm_input: [B, emb] previous-token embedding.

    Returns (new_state, logits [B, V]). Dropout masks (training only) are
    pre-sampled outside the scan: lm_drop_mask for the internal LM LSTM output,
    inter_drop_masks between stacked decoder cells.
    """
    cd = compute_dtype
    lm_output, new_lm_state = _cell_step(cfg, params["lm_cell"], lm_input,
                                         state.lm_state, cd)
    if lm_drop_mask is not None:
        lm_output = lm_output * lm_drop_mask
    if "simple_proj" in params:
        lm_output = dense(params["simple_proj"], lm_output, compute_dtype=cd)

    x_dec = dense(params["input_proj"],
                  jnp.concatenate([lm_output, state.context], axis=-1),
                  compute_dtype=cd)

    new_cell_states = []
    h = x_dec
    for layer, cell_params in enumerate(params["dec_cells"]):
        h, new_s = _cell_step(cfg, cell_params, h, state.cell_states[layer], cd)
        if inter_drop_masks is not None and layer < len(params["dec_cells"]) - 1:
            h = h * inter_drop_masks[layer]
        new_cell_states.append(new_s)
    new_cell_states = tuple(new_cell_states)

    query = _query_of(cfg, new_cell_states)
    context, alpha = attention(params, ctx, query)

    proj = dense(params["attn_proj"],
                 jnp.concatenate([query, context], axis=-1), compute_dtype=cd)
    out_proj = params["output_proj_ind" if cfg.ind_softmax else "output_proj"]
    logits = dense(out_proj, proj, compute_dtype=cd)

    return DecState(new_cell_states, new_lm_state, context, alpha), logits


def train_noise(rng: Array, cfg: DecoderConfig, steps: int, B: int):
    """Pre-sampled randomness for one training pass, shared verbatim by the
    XLA scan and the fused Pallas kernel (ops/dec_train_pallas.py) so the two
    paths are exactly parity-testable.

    Returns (sample_flags [steps] f32 0/1, gumbel [steps, B, V],
             lm_masks, inter_masks). Sampling is gumbel-max:
    argmax(logits + gumbel) ~ categorical(logits) — the same distribution
    tf.multinomial draws from (reference attn_decoder.py:132-139, one coin
    per step for the whole batch)."""
    rng_coin, rng_samp, rng_drop = jax.random.split(rng, 3)
    if cfg.samp_prob > 0:
        coins = jax.random.uniform(rng_coin, (steps,))
        flags = (coins >= 1.0 - cfg.samp_prob).astype(jnp.float32)
        u = jax.random.uniform(rng_samp, (steps, B, cfg.vocab_size),
                               minval=1e-20, maxval=1.0)
        gumbel = -jnp.log(-jnp.log(u))
    else:
        flags = jnp.zeros((steps,), jnp.float32)
        gumbel = jnp.zeros((steps, B, cfg.vocab_size), jnp.float32)
    use_drop = cfg.out_prob_dec < 1.0
    if use_drop:
        keep = cfg.out_prob_dec
        lm_masks = (jax.random.bernoulli(
            jax.random.fold_in(rng_drop, 0), keep,
            (steps, B, cfg.lm_hidden_size)).astype(jnp.float32) / keep)
        inter_masks = tuple(
            jax.random.bernoulli(
                jax.random.fold_in(rng_drop, 1 + i), keep,
                (steps, B, cfg.hidden_size_dec)).astype(jnp.float32) / keep
            for i in range(cfg.num_layers_dec - 1))
    else:
        lm_masks = jnp.ones((steps, 1, 1))
        inter_masks = tuple(jnp.ones((steps, 1, 1))
                            for _ in range(cfg.num_layers_dec - 1))
    return flags, gumbel, lm_masks, inter_masks


def apply_train(params: dict, cfg: DecoderConfig, dec_inputs: Array,
                enc_states: Array, enc_lens: Array, *, rng: Array,
                compute_dtype=None) -> Array:
    """Teacher-forced training pass with scheduled sampling.

    dec_inputs: [T, B] time-major ids starting with <go>.
    Returns logits [T-1, B, V] (logits[t] predicts dec_inputs[t+1]).
    """
    T, B = dec_inputs.shape
    steps = T - 1
    emb = params["embedding"]
    emb_inputs = emb[dec_inputs]                      # [T, B, emb]

    flags, gumbel, lm_masks, inter_masks = train_noise(rng, cfg, steps, B)
    use_drop = cfg.out_prob_dec < 1.0

    from e2e_asr_tpu.core.rnn import use_pallas_lstm
    from e2e_asr_tpu.ops import dec_train_gru_pallas as dtg
    from e2e_asr_tpu.ops import dec_train_pallas as dtp
    dt = dtp if cfg.use_lstm else dtg           # cell-matched fused kernel
    if (use_pallas_lstm() and dt.supported(cfg, params)
            and dt.fits(steps, B, enc_states.shape[1], params)):
        return dt.apply_train_fused(
            params, cfg, emb_inputs, enc_states, enc_lens, flags, gumbel,
            lm_masks if use_drop else None,
            inter_masks if use_drop else (), compute_dtype=compute_dtype)

    ctx = make_attn_context(params, enc_states, enc_lens,
                            compute_dtype=compute_dtype)
    state0 = zero_state(cfg, B, ctx)

    def scan_step(carry, xs):
        state, lm_input = carry
        gt_next, flag, gum, lm_m, inter_m = xs
        new_state, logits = step(params, cfg, ctx, state, lm_input,
                                 lm_drop_mask=lm_m if use_drop else None,
                                 inter_drop_masks=inter_m if use_drop else None,
                                 compute_dtype=compute_dtype)
        if cfg.samp_prob > 0:
            sampled = jnp.argmax(logits + gum, axis=-1)
            next_input = jnp.where(flag < 0.5, gt_next, emb[sampled])
        else:
            next_input = gt_next
        return (new_state, next_input), logits

    xs = (emb_inputs[1:], flags, gumbel, lm_masks, inter_masks)
    (_, _), logits = jax.lax.scan(scan_step, (state0, emb_inputs[0]), xs)
    return logits


def _fused_infer_step(params: dict, cfg: DecoderConfig, ctx: AttnContext,
                      state: DecState, lm_input: Array, *, bf16: bool):
    """Fused-kernel inference step (any depth, LSTM or GRU, with/without
    SimpleProjection); emits log-probs (argmax-equal to logits)."""
    from e2e_asr_tpu.ops import dec_step_pallas as dsp

    new_lm, new_dec, y = dsp.cells_fused(
        params, lm_input, state.context, state.lm_state, state.cell_states,
        use_lstm=cfg.use_lstm, bf16=bf16)
    query = _query_of(cfg, new_dec)
    Bn, A = y.shape
    if dsp.attn_output_fits(Bn, 1, ctx.enc_states.shape[1], A,
                            ctx.enc_states.shape[-1]):
        logp, context, alpha = dsp.attn_output_fused(
            params, cfg, y, query, ctx.hidden_features,
            ctx.enc_states, ctx.mask, k=1, bf16=bf16)
    else:
        s = jnp.sum(params["attn_v"] *
                    jnp.tanh(ctx.hidden_features + y[:, None, :]), axis=-1)
        s = jnp.where(ctx.mask > 0, s, -1e30)
        alpha = jax.nn.softmax(s, axis=-1)
        context = jnp.einsum("bt,bth->bh", alpha, ctx.enc_states)
        logp = dsp.output_fused(params, cfg, query, context, bf16=bf16)
    return DecState(new_dec, new_lm, context, alpha), logp


def apply_infer(params: dict, cfg: DecoderConfig, go_ids: Array,
                enc_states: Array, enc_lens: Array, *, max_output: int,
                compute_dtype=None) -> tuple[Array, Array]:
    """Greedy decode: argmax feedback (decoder.py:139-153).

    go_ids: [B] start token ids (<go>). Runs a fixed max_output steps
    (seq2seq_model.py:191-193 forces this at eval).
    Returns (logits [max_output, B, V], token_ids [max_output, B]).
    """
    from e2e_asr_tpu.core.rnn import use_pallas_lstm
    from e2e_asr_tpu.ops import dec_step_pallas as dsp

    B = go_ids.shape[0]
    emb = params["embedding"]
    ctx = make_attn_context(params, enc_states, enc_lens,
                            compute_dtype=compute_dtype)
    state0 = zero_state(cfg, B, ctx)
    fused = use_pallas_lstm() and dsp.supported(cfg, params)

    def plain_step(state, lm_input):
        return step(params, cfg, ctx, state, lm_input,
                    compute_dtype=compute_dtype)

    def fused_step(state, lm_input):
        return _fused_infer_step(params, cfg, ctx, state, lm_input,
                                 bf16=compute_dtype is not None)

    def scan_step(carry, _):
        state, lm_input = carry
        new_state, logits = (fused_step if fused else plain_step)(state,
                                                                  lm_input)
        ids = jnp.argmax(logits, axis=-1)
        return (new_state, emb[ids]), (logits, ids)

    (_, _), (logits, ids) = jax.lax.scan(scan_step, (state0, emb[go_ids]),
                                         None, length=max_output)
    return logits, ids


def apply_infer_early(params: dict, cfg: DecoderConfig, go_ids: Array,
                      enc_states: Array, enc_lens: Array, *, max_output: int,
                      eos_id: int = 2, compute_dtype=None) -> Array:
    """Greedy decode with batch-wide early exit.

    Emits exactly the same sentences as apply_infer after <eos> truncation
    (the reference always runs max_output steps, seq2seq_model.py:191-193;
    tokens after each utterance's first <eos> never reach the scorer), but the
    loop stops once EVERY utterance has emitted <eos> — a large win for the
    in-training dev evals. Positions past <eos> are <pad>.
    Returns ids [max_output, B].
    """
    from e2e_asr_tpu.core.rnn import use_pallas_lstm
    from e2e_asr_tpu.ops import dec_step_pallas as dsp

    B = go_ids.shape[0]
    emb = params["embedding"]
    ctx = make_attn_context(params, enc_states, enc_lens,
                            compute_dtype=compute_dtype)
    state0 = zero_state(cfg, B, ctx)
    fused = use_pallas_lstm() and dsp.supported(cfg, params)

    def one_step(state, lm_input):
        if fused:
            return _fused_infer_step(params, cfg, ctx, state, lm_input,
                                     bf16=compute_dtype is not None)
        return step(params, cfg, ctx, state, lm_input,
                    compute_dtype=compute_dtype)

    def cond(carry):
        _, _, t, done, _ = carry
        return jnp.logical_and(t < max_output, ~jnp.all(done))

    def body(carry):
        state, lm_input, t, done, out = carry
        new_state, logits = one_step(state, lm_input)
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        ids = jnp.where(done, 0, ids)                 # <pad> after <eos>
        out = out.at[t].set(ids)
        done = jnp.logical_or(done, ids == eos_id)
        return (new_state, emb[ids], t + 1, done, out)

    init = (state0, emb[go_ids], jnp.zeros((), jnp.int32),
            jnp.zeros((B,), bool), jnp.zeros((max_output, B), jnp.int32))
    _, _, _, _, out = jax.lax.while_loop(cond, body, init)
    return out
