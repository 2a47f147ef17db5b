"""Pyramidal (Bi)LSTM/GRU encoder.

TPU re-design of the reference encoder (/root/reference/encoder.py:122-180):
a stack of bidirectional RNN layers over `lax.scan`, with time-resolution
halving between layers by concatenating `skip_step` consecutive frames
(reshape, encoder.py:94-119) until `max_scaling_down` total reduction, and
optional initial strided subsampling (`initial_res_fac`, encoder.py:149-153).

All shapes are static: the bucket's padded T is known at trace time, so the
pyramid padding to a multiple of skip_step is resolved during tracing (the
reference needed a dynamic tf.cond; here it is compile-time).

Sequence lengths follow ceil-division per reduction (encoder.py:117-118).
Dropout (keep prob `out_prob`) is applied to layer outputs during training —
elementwise on the output tensor, which is exactly equivalent to TF's
DropoutWrapper(output_keep_prob) because the wrapper never drops the recurrent
state, only the emitted outputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import EncoderConfig
from e2e_asr_tpu.core import rnn
from e2e_asr_tpu.core.layers import uniform_init

Array = jax.Array

# Reference encoder kernels are initialized U(-0.075, 0.075) (encoder.py:74).
_ENC_INIT = lambda key, shape, dtype=jnp.float32: uniform_init(  # noqa: E731
    key, shape, 0.075, dtype)


def layer_plan(cfg: EncoderConfig, max_depth: int) -> list[bool]:
    """For layer i (0-indexed), whether a pyramid reduction follows it.

    Mirrors the loop condition at encoder.py:172: reduce when skip_step > 1,
    not the last layer, and the accumulated resolution factor is still below
    max_scaling_down.
    """
    plan = []
    fac = cfg.initial_res_fac
    for i in range(max_depth):
        reduce = (cfg.skip_step > 1 and i != max_depth - 1
                  and fac < cfg.max_scaling_down)
        plan.append(reduce)
        if reduce:
            fac *= cfg.skip_step
    return plan


def layer_input_dims(cfg: EncoderConfig, max_depth: int, feat_dim: int) -> list[int]:
    """Input feature dim of each layer given the pyramid plan."""
    out_mult = 2 if cfg.bi_dir else 1
    dims = [feat_dim * cfg.stack_cons]
    plan = layer_plan(cfg, max_depth)
    for i in range(1, max_depth):
        out = cfg.hidden_size * out_mult
        dims.append(out * (cfg.skip_step if plan[i - 1] else 1))
    return dims


def init(key: Array, cfg: EncoderConfig, max_depth: int, feat_dim: int) -> dict:
    if cfg.encoder_type == "transformer":
        from e2e_asr_tpu.models import transformer_encoder
        return transformer_encoder.init(key, cfg, max_depth, feat_dim)
    params = {}
    dims = layer_input_dims(cfg, max_depth, feat_dim)
    cell = "lstm" if cfg.use_lstm else "gru"
    keys = jax.random.split(key, max_depth)
    for i in range(max_depth):
        params[f"layer_{i + 1}"] = rnn.rnn_layer_init(
            keys[i], dims[i], cfg.hidden_size, cell=cell,
            bidirectional=cfg.bi_dir, init=_ENC_INIT)
    return params


def pyramid_reduce(x: Array, lens: Array, skip_step: int) -> tuple[Array, Array]:
    """Concat skip_step consecutive frames: [B, T, F] -> [B, ceil(T/s), F*s].

    Zero-pads T to a multiple of skip_step (static), ceil-divides lengths
    (encoder.py:94-119).
    """
    B, T, F = x.shape
    rem = T % skip_step
    if rem:
        x = jnp.pad(x, ((0, 0), (0, skip_step - rem), (0, 0)))
    T_out = x.shape[1] // skip_step
    x = x.reshape(B, T_out, F * skip_step)
    lens = -(-lens.astype(jnp.int32) // skip_step)  # ceil div
    return x, lens


def total_reduction_factor(cfg: EncoderConfig, max_depth: int) -> int:
    """The chunk alignment apply_streaming requires: initial_res_fac x every
    pyramid reduction in the stack (recurrent), or subsample x attn_chunk
    (chunk-causal transformer — chunks must land on attention-chunk
    boundaries post-subsample)."""
    if cfg.encoder_type == "transformer":
        return cfg.subsample * max(cfg.attn_chunk, 1)
    r = cfg.initial_res_fac
    for red in layer_plan(cfg, max_depth):
        if red:
            r *= cfg.skip_step
    return r


def supports_exact_streaming(cfg: EncoderConfig) -> bool:
    """Whether apply_streaming can reproduce apply() exactly from chunks:
    a forward-only recurrent stack has no right context at all, so carrying
    the per-layer cell states across chunk boundaries is exact with ZERO
    lookahead; a chunk-causal transformer (attn_chunk > 0) has a bounded
    left-only receptive field, so carried K/V + conv caches are exact the
    same way. Bidirectional recurrent and full-attention transformer
    encoders need future frames (margins) instead."""
    if cfg.encoder_type == "transformer":
        from e2e_asr_tpu.models import transformer_encoder
        return transformer_encoder.supports_exact_streaming(cfg)
    return not cfg.bi_dir


def streaming_state(cfg: EncoderConfig, max_depth: int, batch: int):
    """Zero carried state for apply_streaming: one cell state per layer
    (recurrent) or per-block K/V + conv caches (chunk-causal transformer)."""
    if cfg.encoder_type == "transformer":
        from e2e_asr_tpu.models import transformer_encoder
        return transformer_encoder.streaming_state(cfg, max_depth, batch)
    from e2e_asr_tpu.core import cells
    mk = (cells.lstm_zero_state if cfg.use_lstm else cells.gru_zero_state)
    return tuple(mk((batch,), cfg.hidden_size) for _ in range(max_depth))


def apply_streaming(params: dict, cfg: EncoderConfig, x: Array,
                    seq_len: Array, num_layers: dict[str, int], state, *,
                    compute_dtype=None, final: bool = False):
    """One chunk of the exact streaming encoder (forward-only stacks).

    x: [B, T_chunk, F] stacked features — T_chunk must be a multiple of the
    total reduction factor (initial_res_fac x pyramid skips) so pyramid
    groups align with the whole-utterance run, EXCEPT the last chunk
    (final=True), whose within-chunk pyramid padding is exactly the
    whole-utterance tail padding. seq_len: [B] valid frames in this chunk
    (== T_chunk except the final flush). state: streaming_state() or the
    previous chunk's carry.

    Returns (attention_states {depth: [B, T_d, H]}, seq_lens {depth: [B]},
    new_state). Feeding a sequence chunk-by-chunk reproduces apply()'s
    outputs on the concatenation exactly (pinned by
    tests/test_streaming_exact.py).
    """
    if cfg.encoder_type == "transformer":
        from e2e_asr_tpu.models import transformer_encoder
        return transformer_encoder.apply_streaming(
            params, cfg, x, seq_len, num_layers, state,
            compute_dtype=compute_dtype, final=final)
    if not supports_exact_streaming(cfg):
        raise ValueError("exact streaming needs a forward-only recurrent "
                         "encoder (-bi_dir false) or a chunk-causal "
                         "transformer (-attn_chunk > 0); other stacks need "
                         "margins (eval/longform.py)")
    max_depth = max(num_layers.values())
    plan = layer_plan(cfg, max_depth)
    cell = "lstm" if cfg.use_lstm else "gru"
    if cfg.initial_res_fac > 1:
        if x.shape[1] % cfg.initial_res_fac and not final:
            raise ValueError("chunk length must be a multiple of "
                             f"initial_res_fac ({cfg.initial_res_fac})")
        x = x[:, ::cfg.initial_res_fac, :]
        seq_len = -(-seq_len.astype(jnp.int32) // cfg.initial_res_fac)

    attention_states: dict[int, Array] = {}
    seq_lens: dict[int, Array] = {}
    new_state = []
    layer_in = x
    for i in range(max_depth):
        depth = i + 1
        if plan[i] and layer_in.shape[1] % cfg.skip_step and not final:
            raise ValueError("chunk length must be a multiple of the total "
                             "reduction factor (pyramid misalignment at "
                             f"layer {depth})")
        out_tm, carry = rnn.rnn_layer_stateful(
            params[f"layer_{depth}"], jnp.transpose(layer_in, (1, 0, 2)),
            seq_len, state[i], cell=cell, compute_dtype=compute_dtype)
        new_state.append(carry)
        out_bm = jnp.transpose(out_tm, (1, 0, 2))
        attention_states[depth] = out_bm
        seq_lens[depth] = seq_len
        if plan[i]:
            layer_in, seq_len = pyramid_reduce(out_bm, seq_len, cfg.skip_step)
        else:
            layer_in = out_bm
    return attention_states, seq_lens, tuple(new_state)


def apply(params: dict, cfg: EncoderConfig, x: Array, seq_len: Array,
          num_layers: dict[str, int], *, train: bool = False,
          rng: Array | None = None, compute_dtype=None,
          aux_sink: list | None = None, ep_mesh=None,
          ) -> tuple[dict[int, Array], dict[int, Array], dict[int, Array]]:
    """Run the encoder.

    Args:
        x: [B, T, F] batch-major features (already frame-stacked if
           stack_cons > 1 — stacking happens in seq2seq.get_batch, matching
           seq2seq_model.py:164-183).
        seq_len: [B] true frame counts.
        num_layers: task -> encoder depth whose output that task attends to.
    Returns:
        (attention_states {depth: [B, T_d, H_out]},
         time_major_states {depth: [T_d, B, H_out]},
         seq_lens {depth: [B]})
    """
    if cfg.encoder_type == "transformer":
        from e2e_asr_tpu.models import transformer_encoder
        return transformer_encoder.apply(params, cfg, x, seq_len, num_layers,
                                         train=train, rng=rng,
                                         compute_dtype=compute_dtype,
                                         aux_sink=aux_sink, ep_mesh=ep_mesh)
    max_depth = max(num_layers.values())
    want_attn = {d for t, d in num_layers.items() if t != "state"}
    want_time_major = {d for t, d in num_layers.items() if t == "state"}
    plan = layer_plan(cfg, max_depth)
    cell = "lstm" if cfg.use_lstm else "gru"

    if cfg.initial_res_fac > 1:
        x = x[:, ::cfg.initial_res_fac, :]
        seq_len = -(-seq_len.astype(jnp.int32) // cfg.initial_res_fac)

    attention_states: dict[int, Array] = {}
    time_major_states: dict[int, Array] = {}
    seq_lens: dict[int, Array] = {}

    def run_layer(layer_params, x_tm, lens, key):
        # rnn_layer owns output dropout: on the fused-bidir Pallas path the
        # masks are PRNG'd inside the kernel (no HBM mask pass); elsewhere it
        # applies layers.dropout(key, out, keep) — identical to the old
        # post-hoc call here (same key, same shape).
        drop = ((key, cfg.out_prob)
                if train and cfg.out_prob < 1.0 else None)
        return rnn.rnn_layer(layer_params, x_tm, lens, cell=cell,
                             bidirectional=cfg.bi_dir,
                             compute_dtype=compute_dtype, out_dropout=drop)

    if train and cfg.remat:
        # Per-layer rematerialization: the backward pass recomputes each
        # layer's forward instead of storing its [T,B,*] residuals —
        # activation memory drops ~num_layers-fold at ~1 extra forward of
        # FLOPs. Composes with the Pallas kernels' custom VJPs (their
        # residuals are produced during the recompute, never stored).
        run_layer = jax.checkpoint(run_layer)

    if train and cfg.out_prob < 1.0:
        assert rng is not None
    layer_in = x  # batch-major [B, T, F]
    for i in range(max_depth):
        depth = i + 1
        key = (jax.random.fold_in(rng, depth) if rng is not None
               else jax.random.PRNGKey(0))
        out_tm = run_layer(params[f"layer_{depth}"],
                           jnp.transpose(layer_in, (1, 0, 2)), seq_len, key)

        if depth in want_time_major:
            time_major_states[depth] = out_tm
        out_bm = jnp.transpose(out_tm, (1, 0, 2))
        if depth in want_attn:
            attention_states[depth] = out_bm
        seq_lens[depth] = seq_len

        if plan[i]:
            layer_in, seq_len = pyramid_reduce(out_bm, seq_len, cfg.skip_step)
        else:
            layer_in = out_bm

    return attention_states, time_major_states, seq_lens
