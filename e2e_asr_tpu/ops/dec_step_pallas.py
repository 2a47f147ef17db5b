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

Fast path covers BOTH cell types (LSTM and GRU), any decoder depth, and
SimpleProjection configs (round 3 — previously LSTM/1-layer/no-proj only);
the only gate left is a VMEM fit estimate for the resident weights.
Inference only — no VJP.

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


def _param_bytes(tree) -> int:
    import numpy as np
    return sum(int(np.prod(x.shape)) * 4
               for x in jax.tree_util.tree_leaves(tree))


def supported(cfg, params) -> bool:
    """Fused-step eligibility: resident weights must fit VMEM comfortably
    (LSTM/GRU, any depth, with/without SimpleProjection all lower to the
    generic kernel)."""
    if getattr(cfg, "decoder_type", "rnn") != "rnn":
        return False
    weight_keys = ("lm_cell", "simple_proj", "input_proj", "dec_cells",
                   "attn_query")
    w_bytes = _param_bytes([params[k] for k in weight_keys if k in params])
    return w_bytes <= 10 * 1024 * 1024


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


def _lstm_cell_math(x, c, h, w, b, in_dim: int, H: int, bf16: bool):
    gates = _dot(x, w[:in_dim], bf16) + _dot(h, w[in_dim:], bf16) + b[:]
    return _lstm_gate_math(gates, c, H)


def _gru_cell_math(x, h, wg, bg, wc, bc, in_dim: int, H: int, bf16: bool):
    gates = jax.nn.sigmoid(_dot(x, wg[:in_dim], bf16) +
                           _dot(h, wg[in_dim:], bf16) + bg[:])
    r, u = gates[:, :H], gates[:, H:]
    cand = jnp.tanh(_dot(x, wc[:in_dim], bf16) +
                    _dot(r * h, wc[in_dim:], bf16) + bc[:])
    return u * h + (1.0 - u) * cand


def _cell_weight_args(cell_params: dict, use_lstm: bool) -> list:
    if use_lstm:
        return [cell_params["kernel"], cell_params["bias"]]
    return [cell_params["gates"]["kernel"], cell_params["gates"]["bias"],
            cell_params["candidate"]["kernel"], cell_params["candidate"]["bias"]]


def _cells_kernel(*refs, use_lstm: bool, L: int, has_sp: bool, E: int,
                  Hl: int, H: int, bf16: bool):
    """Generic fused step: lm cell -> [SimpleProjection] -> InputProjection ->
    L stacked decoder cells -> attention query projection.

    Ref order (inputs): x_emb, ctx_prev, lm state leaves, per-layer dec state
    leaves, lm cell weights, [simple_proj w,b], input_proj w,b, per-layer cell
    weights, attn_query w,b; (outputs): lm state leaves, per-layer dec state
    leaves, y. LSTM state leaves are (c, h); GRU state is (h,).
    """
    it = iter(refs)
    x_emb = next(it)[:]
    ctx_prev = next(it)[:]
    n_state = 2 if use_lstm else 1
    lm_in = [next(it)[:] for _ in range(n_state)]
    dec_in = [[next(it)[:] for _ in range(n_state)] for _ in range(L)]
    lm_w = [next(it) for _ in range(2 if use_lstm else 4)]
    sp = [next(it) for _ in range(2)] if has_sp else None
    winp, binp = next(it), next(it)
    cell_w = [[next(it) for _ in range(2 if use_lstm else 4)]
              for _ in range(L)]
    wq, bq = next(it), next(it)
    lm_out = [next(it) for _ in range(n_state)]
    dec_out = [[next(it) for _ in range(n_state)] for _ in range(L)]
    y_o = next(it)

    if use_lstm:
        new_lm_c, new_lm_h = _lstm_cell_math(
            x_emb, lm_in[0], lm_in[1], lm_w[0], lm_w[1], E, Hl, bf16)
        lm_out[0][:] = new_lm_c
        lm_out[1][:] = new_lm_h
        lm_y = new_lm_h
    else:
        lm_y = _gru_cell_math(x_emb, lm_in[0], *lm_w, E, Hl, bf16)
        lm_out[0][:] = lm_y

    if has_sp:
        lm_y = _dot(lm_y, sp[0][:], bf16) + sp[1][:]

    x = (_dot(lm_y, winp[: lm_y.shape[-1]], bf16) +
         _dot(ctx_prev, winp[lm_y.shape[-1]:], bf16) + binp[:])

    for layer in range(L):
        in_dim = E if layer == 0 else H
        if use_lstm:
            new_c, new_h = _lstm_cell_math(
                x, dec_in[layer][0], dec_in[layer][1],
                cell_w[layer][0], cell_w[layer][1], in_dim, H, bf16)
            dec_out[layer][0][:] = new_c
            dec_out[layer][1][:] = new_h
            x, query = new_h, new_c
        else:
            new_h = _gru_cell_math(x, dec_in[layer][0], *cell_w[layer],
                                   in_dim, H, bf16)
            dec_out[layer][0][:] = new_h
            x = query = new_h

    y_o[:] = _dot(query, wq[:], bf16) + bq[:]


def cells_fused(params: dict, x_emb: Array, ctx_prev: Array,
                lm_state, dec_states, *, use_lstm: bool = True,
                bf16: bool = True):
    """Fused decoder-LM + [SimpleProjection] + InputProjection + stacked
    decoder cells + query projection — one launch for the whole cell chain.

    All arrays [N, .]. dec_states: tuple of per-layer LSTMState (or [N,H]
    arrays for GRU). Returns (new_lm_state, new_dec_states, query_y [N, A]).
    Backwards-compat: a single LSTMState is accepted for dec_states.
    """
    from e2e_asr_tpu.core.cells import LSTMState

    single = isinstance(dec_states, LSTMState) or (
        not use_lstm and not isinstance(dec_states, (tuple, list)))
    if single:
        dec_states = (dec_states,)
    L = len(dec_states)
    N, E = x_emb.shape
    Hl = (lm_state.h if use_lstm else lm_state).shape[-1]
    H = (dec_states[0].h if use_lstm else dec_states[0]).shape[-1]
    A = params["attn_query"]["kernel"].shape[-1]
    has_sp = "simple_proj" in params
    n_state = 2 if use_lstm else 1

    def state_leaves(s):
        return [s.c, s.h] if use_lstm else [s]

    inputs = [x_emb, ctx_prev]
    inputs += state_leaves(lm_state)
    for s in dec_states:
        inputs += state_leaves(s)
    inputs += _cell_weight_args(params["lm_cell"], use_lstm)
    if has_sp:
        inputs += [params["simple_proj"]["kernel"],
                   params["simple_proj"]["bias"]]
    inputs += [params["input_proj"]["kernel"], params["input_proj"]["bias"]]
    for cp in params["dec_cells"]:
        inputs += _cell_weight_args(cp, use_lstm)
    inputs += [params["attn_query"]["kernel"], params["attn_query"]["bias"]]

    out_shape = ([jax.ShapeDtypeStruct((N, Hl), jnp.float32)] * n_state +
                 [jax.ShapeDtypeStruct((N, H), jnp.float32)] * (n_state * L) +
                 [jax.ShapeDtypeStruct((N, A), jnp.float32)])
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    kernel = functools.partial(_cells_kernel, use_lstm=use_lstm, L=L,
                               has_sp=has_sp, E=E, Hl=Hl, H=H, bf16=bf16)
    outs = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in inputs],
        out_specs=[vspec() for _ in out_shape],
        out_shape=out_shape,
        interpret=_interpret(),
    )(*inputs)

    if use_lstm:
        new_lm = LSTMState(outs[0], outs[1])
        new_dec = tuple(LSTMState(outs[2 + 2 * i], outs[3 + 2 * i])
                        for i in range(L))
    else:
        new_lm = outs[0]
        new_dec = tuple(outs[1 + i] for i in range(L))
    y = outs[-1]
    if single:
        return new_lm, new_dec[0], y
    return new_lm, new_dec, y


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
