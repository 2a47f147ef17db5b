"""Pallas TPU kernels: fused attention-decoder inference step.

Greedy and beam decoding run ~120 sequential steps of small matmuls
(attn_decoder.py per-step structure); on TPU the wall time is dominated by
kernel-launch latency, not FLOPs. These kernels collapse the step into two
launches around the (XLA-fused) additive-attention block:

  kernel 1 `cells_fused`:  decoder-LM LSTM -> InputProjection -> decoder LSTM
                           -> attention query projection         (5 matmuls)
  kernel 2 `output_fused`: AttnProjection -> OutputProjection -> log_softmax

A third variant, `attn_output_fused`, additionally folds the additive
attention into kernel 2. Measured on v5e it LOSES to XLA's attention for the
shapes tried even after batching the score computation (serial per-beam
loop: 51.7 ms/120-step decode; batched scores: 46.6 ms; XLA attention +
output kernel: ~42 ms — the k-major relayouts and in-kernel reshape overhead
outweigh the saved launches). Opt-in via E2E_ASR_FUSED_ATTN=1; kept as a
documented negative result and a base for future work.

Fast-path requirements (fall back to the plain XLA step otherwise):
LSTM cells, single decoder layer, no SimpleProjection
(lm_hidden_size == hidden_size_dec). Inference only — no VJP.

The vocab axis is padded to a multiple of 128 lanes; padded logits get -1e30
so downstream log-softmax/top-k ignore them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(cfg, params) -> bool:
    return (cfg.use_lstm and cfg.num_layers_dec == 1
            and "simple_proj" not in params)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lstm_gate_math(gates: Array, c: Array, H: int) -> tuple[Array, Array]:
    i, j, f, o = (gates[:, :H], gates[:, H:2 * H], gates[:, 2 * H:3 * H],
                  gates[:, 3 * H:])
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_c, new_h


def _dot(a: Array, b: Array, bf16: bool) -> Array:
    if bf16:
        a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _cells_kernel(x_emb, ctx_prev, lm_c, lm_h, dec_c, dec_h,
                  wlm, blm, winp, binp, wdec, bdec, wq, bq,
                  lm_c_o, lm_h_o, dec_c_o, dec_h_o, y_o, *, E, Hl, H,
                  bf16: bool):
    lm_gates = (_dot(x_emb[:], wlm[:E], bf16) +
                _dot(lm_h[:], wlm[E:], bf16) + blm[:])
    new_lm_c, new_lm_h = _lstm_gate_math(lm_gates, lm_c[:], Hl)

    x_dec = (_dot(new_lm_h, winp[:Hl], bf16) +
             _dot(ctx_prev[:], winp[Hl:], bf16) + binp[:])

    dec_gates = (_dot(x_dec, wdec[:E], bf16) +
                 _dot(dec_h[:], wdec[E:], bf16) + bdec[:])
    new_dec_c, new_dec_h = _lstm_gate_math(dec_gates, dec_c[:], H)

    y = _dot(new_dec_c, wq[:], bf16) + bq[:]

    lm_c_o[:] = new_lm_c
    lm_h_o[:] = new_lm_h
    dec_c_o[:] = new_dec_c
    dec_h_o[:] = new_dec_h
    y_o[:] = y


def cells_fused(params: dict, x_emb: Array, ctx_prev: Array,
                lm_state, dec_state, *, bf16: bool = True):
    """Fused decoder-LM + InputProjection + decoder cell + query projection.

    All arrays [N, .]. Returns (new_lm_state, new_dec_state, query_y [N, A]).
    """
    from e2e_asr_tpu.core.cells import LSTMState

    N, E = x_emb.shape
    Hl = lm_state.h.shape[-1]
    H = dec_state.h.shape[-1]
    H_enc = ctx_prev.shape[-1]
    A = params["attn_query"]["kernel"].shape[-1]

    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out_shape = [jax.ShapeDtypeStruct((N, Hl), jnp.float32),
                 jax.ShapeDtypeStruct((N, Hl), jnp.float32),
                 jax.ShapeDtypeStruct((N, H), jnp.float32),
                 jax.ShapeDtypeStruct((N, H), jnp.float32),
                 jax.ShapeDtypeStruct((N, A), jnp.float32)]
    kernel = functools.partial(_cells_kernel, E=E, Hl=Hl, H=H, bf16=bf16)
    outs = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in range(14)],
        out_specs=[vspec() for _ in range(5)],
        out_shape=out_shape,
        interpret=_interpret(),
    )(x_emb, ctx_prev, lm_state.c, lm_state.h, dec_state.c, dec_state.h,
      params["lm_cell"]["kernel"], params["lm_cell"]["bias"],
      params["input_proj"]["kernel"], params["input_proj"]["bias"],
      params["dec_cells"][0]["kernel"], params["dec_cells"][0]["bias"],
      params["attn_query"]["kernel"], params["attn_query"]["bias"])
    lm_c, lm_h, dec_c, dec_h, y = outs
    return LSTMState(lm_c, lm_h), LSTMState(dec_c, dec_h), y


def _attn_output_kernel(y, dec_c, hf, enc, mask, v, wap, bap, wout, bout,
                        logp_o, ctx_o, alpha_o, *, B: int, k: int, T: int,
                        H: int, V: int, Vp: int, bf16: bool):
    """Fused additive attention + AttnProjection + OutputProjection +
    log_softmax for all k beams (rows are k-major: row = j*B + b).

    The score tensor is computed as ONE batched [k*B, T, A] op (the per-beam
    serial-loop variant measurably underutilized the VPU); only the
    context-weighting falls back to a per-beam loop (batched dot_general is
    not available in-kernel)."""
    hf_all = hf[:]                                   # [B, T, A]
    enc_all = enc[:]                                 # [B, T, H_enc]
    m = mask[:]                                      # [B, T]
    vv = v[:]                                        # [A]

    # --- batched scores for all beams at once ------------------------------
    y4 = y[:].reshape(k, B, 1, y.shape[-1])          # [k, B, 1, A]
    scores4 = jnp.sum(vv * jnp.tanh(hf_all[None] + y4), axis=-1)  # [k, B, T]
    s = jnp.where(m[None] > 0, scores4, NEG_INF)
    smax = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - smax)
    alpha_kbt = e / jnp.sum(e, axis=-1, keepdims=True)            # [k, B, T]
    alpha_o[:] = alpha_kbt.reshape(k * B, T)

    for j in range(k):
        alpha = alpha_kbt[j]
        ctx_j = jnp.sum(alpha[:, :, None] * enc_all, axis=1)  # [B, H_enc]
        q_j = dec_c[j * B:(j + 1) * B]
        proj = (_dot(q_j, wap[:H], bf16) +
                _dot(ctx_j, wap[H:], bf16) + bap[:])
        logits = _dot(proj, wout[:], bf16) + bout[:]
        if Vp > V:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < V, logits, NEG_INF)
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        z = jnp.log(jnp.sum(jnp.exp(logits - lmax), axis=-1, keepdims=True))
        logp_o[j * B:(j + 1) * B] = logits - lmax - z
        ctx_o[j * B:(j + 1) * B] = ctx_j


def attn_output_fits(B: int, k: int, T_enc: int, A: int, H_enc: int) -> bool:
    """Gate for the fused attention+output kernel: VMEM estimate + opt-in.

    Measured on v5e the kernel loses to XLA's attention for the shapes tried
    (see module docstring), so it is opt-in via E2E_ASR_FUSED_ATTN=1.
    """
    import os
    if not os.environ.get("E2E_ASR_FUSED_ATTN"):
        return False
    hf = B * T_enc * A
    enc = B * T_enc * H_enc
    scratch_like = B * T_enc * A            # tanh intermediate
    rows = B * k * (A + H_enc + 256)
    return 4 * (hf + enc + scratch_like + rows) <= 12 * 1024 * 1024


def attn_output_fused(params: dict, cfg, y: Array, dec_c: Array,
                      hidden_features: Array, enc_states: Array, mask: Array,
                      *, k: int, bf16: bool = False) -> tuple[Array, Array]:
    """Fused attention + projections + log_softmax.

    y, dec_c: [k*B, .] k-major rows; hidden_features [B,T,A]; enc [B,T,H_enc];
    mask [B,T]. Returns (logp [k*B, V], context [k*B, H_enc],
    alpha [k*B, T]).
    """
    N, A = y.shape
    B = N // k
    T = hidden_features.shape[1]
    H = dec_c.shape[-1]
    H_enc = enc_states.shape[-1]
    out = params["output_proj_ind" if cfg.ind_softmax else "output_proj"]
    V = out["kernel"].shape[-1]
    Vp = _round_up(V, 128)
    w_out, b_out = out["kernel"], out["bias"]
    if Vp > V:
        w_out = jnp.pad(w_out, ((0, 0), (0, Vp - V)))
        b_out = jnp.pad(b_out, (0, Vp - V))
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    kernel = functools.partial(_attn_output_kernel, B=B, k=k, T=T, H=H, V=V,
                               Vp=Vp, bf16=bf16)
    logp, ctx, alpha = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in range(10)],
        out_specs=[vspec(), vspec(), vspec()],
        out_shape=[jax.ShapeDtypeStruct((N, Vp), jnp.float32),
                   jax.ShapeDtypeStruct((N, H_enc), jnp.float32),
                   jax.ShapeDtypeStruct((N, T), jnp.float32)],
        interpret=_interpret(),
    )(y, dec_c, hidden_features, enc_states, mask, params["attn_v"],
      params["attn_proj"]["kernel"], params["attn_proj"]["bias"],
      w_out, b_out)
    return logp[:, :V], ctx, alpha


def _output_kernel(query, context, wap, bap, wout, bout, logp_o, *, H,
                   V: int, Vp: int, bf16: bool):
    proj = (_dot(query[:], wap[:H], bf16) +
            _dot(context[:], wap[H:], bf16) + bap[:])
    logits = _dot(proj, wout[:], bf16) + bout[:]      # [N, Vp] (weights padded)
    if Vp > V:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < V, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    z = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    logp_o[:] = logits - m - z


def output_fused(params: dict, cfg, query: Array, context: Array,
                 *, bf16: bool = True) -> Array:
    """AttnProjection + OutputProjection + log_softmax. Returns [N, V]."""
    N, H = query.shape
    out = params["output_proj_ind" if cfg.ind_softmax else "output_proj"]
    V = out["kernel"].shape[-1]
    Vp = _round_up(V, 128)
    w_out = out["kernel"]
    b_out = out["bias"]
    if Vp > V:
        w_out = jnp.pad(w_out, ((0, 0), (0, Vp - V)))
        b_out = jnp.pad(b_out, (0, Vp - V))

    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    kernel = functools.partial(_output_kernel, H=H, V=V, Vp=Vp, bf16=bf16)
    logp = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in range(6)],
        out_specs=vspec(),
        out_shape=jax.ShapeDtypeStruct((N, Vp), jnp.float32),
        interpret=_interpret(),
    )(query, context, params["attn_proj"]["kernel"],
      params["attn_proj"]["bias"], w_out, b_out)
    return logp[:, :V]
