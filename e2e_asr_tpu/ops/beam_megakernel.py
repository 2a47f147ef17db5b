"""Whole-beam-decode mega-kernel: the ENTIRE 120-step beam search in ONE
Pallas launch per utterance.

The reference's per-utterance use case (/root/reference/eval_model.py:191-197:
serial CPU/NumPy beam search per utterance) maps on TPU to a latency-bound
chain of ~120 dependent tiny steps. The fused-step kernels
(ops/dec_step_pallas.py + ops/beam_select_pallas.py) cut per-step launches to
3 Pallas + a handful of XLA gather ops, but every step still pays multiple
kernel-launch round trips. This module removes the per-step launch cost
entirely: encoder outputs, decoder weights, and the whole beam state live in
VMEM for the duration of the search, and a `lax.while_loop` *inside* the
kernel runs the full select-expand-finalize loop with early exit once every
hypothesis has finished.

Exact semantic mirror of eval/beam.beam_decode (which is the oracle in
tests/test_beam_megakernel.py):
- shrinking beam as a k-slot finished buffer (beam_search.py:264,327):
  selection rank must be < (k - num_finished) to be accepted,
- candidates ranked by cumulative score + log_softmax, ties to the lowest
  flat (parent*V + token) index like lax.top_k,
- word_ins_penalty accumulated per step on stored scores
  (beam_search.py:320-322),
- final answer = max-score member of finished ∪ live (beam_search.py:334-338).

Scope (fall back to the step-fused path otherwise): no external fusion LM, no
coverage penalty, no n-best output; any decoder depth, LSTM or GRU, with or
without SimpleProjection. Batch handled by a grid over utterances (each grid
program decodes one utterance start-to-finish); intended for the small-B
per-call serving case — the batched step-fused path remains the high-
throughput bulk-eval engine.

In-kernel data-layout notes:
- sequences are carried as f32 [k, S] (token ids < vocab << 2^24 are exact in
  f32) so parent gathers are one-hot [k,k] MXU matmuls, not scatters;
- per-step top-k is an unrolled argmax-and-mask loop (k is tiny and static);
  argmax = max + first-index-of-max via an iota/min trick (no 1D iota:
  broadcasted_iota only, per Mosaic rules);
- all slot writes are masked `where`s on lane/sublane iota comparisons — no
  dynamic_update_slice inside the loop.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_asr_tpu.ops.dec_step_pallas import (_cell_weight_args, _dot,
                                             _gru_cell_math, _interpret,
                                             _lstm_cell_math, _param_bytes,
                                             _round_up)

Array = jax.Array
NEG_INF = -1e30
BIG_IDX = 1 << 30


def supported(dec_cfg, beam_cfg, params, T_enc: int, H_enc: int,
              B: int) -> bool:
    """Mega-kernel eligibility: config scope + VMEM fit + small batch."""
    if os.environ.get("E2E_ASR_NO_MEGA"):
        return False
    if getattr(dec_cfg, "decoder_type", "rnn") != "rnn":
        return False
    if beam_cfg.lm_weight != 0.0 or (beam_cfg.apply_cov_penalty
                                     and beam_cfg.cov_penalty != 0.0):
        return False
    if B > 2:          # grid programs run serially; bulk eval batches better
        return False
    k, S = beam_cfg.beam_size, beam_cfg.max_steps
    if k > 16:
        return False
    w_bytes = _param_bytes([v for v in params.values()])
    A = params["attn_query"]["kernel"].shape[-1]
    w_out = params["output_proj"]["kernel"]
    V = w_out.shape[-1]
    Vp = _round_up(V, 128)
    # w_out/b_out are shipped PADDED to Vp (launch pads them below), and
    # the per-step working set holds several [k,Vp]/[k,V] tensors (logits,
    # candidate scores, flat_i + pad_cols iotas, col_V, one-hot combine) —
    # count ~6 of them plus the padding delta, or large-vocab configs pass
    # the gate and then blow Mosaic's real allocation (CLAUDE.md: estimates
    # undercount; keep margin).
    w_bytes += 4 * (Vp - V) * (w_out.shape[0] + 1)
    act_bytes = 4 * (T_enc * (H_enc + A + 1)      # enc, hidden_features, mask
                     + k * T_enc * A              # tanh intermediate
                     + 6 * k * Vp                 # vocab-axis working set
                     + 4 * k * S)                 # seqs + fin_seqs (+slack)
    return w_bytes + act_bytes <= 11 * 1024 * 1024


def _mega_kernel(*refs, use_lstm: bool, L: int, has_sp: bool, E: int, Hl: int,
                 H: int, A: int, H_enc: int, T: int, V: int, Vp: int, k: int,
                 S: int, penalty: float, eos_id: int, go_id: int, bf16: bool):
    """One grid program = one utterance's complete beam search.

    Ref order (inputs): enc [1,T,H_enc], hf [1,T,A], mask [1,T], emb [V,E],
    attn_v [1,A], lm cell weights, [simple_proj w,b], input_proj w,b,
    per-layer cell weights, attn_query w,b, attn_proj w,b, out w,b (padded);
    (outputs): tokens [1,S] i32, length [1,1] i32, score [1,1] f32.
    """
    it = iter(refs)
    enc = next(it)[0]                    # [T, H_enc]
    hf = next(it)[0]                     # [T, A]
    msk = next(it)[:]                    # [1, T]
    emb = next(it)[:]                    # [V, E]
    attn_v = next(it)[:]                 # [1, A]
    lm_w = [next(it)[:] for _ in range(2 if use_lstm else 4)]
    sp = [next(it)[:] for _ in range(2)] if has_sp else None
    winp, binp = next(it)[:], next(it)[:]
    cell_w = [[next(it)[:] for _ in range(2 if use_lstm else 4)]
              for _ in range(L)]
    wq, bq = next(it)[:], next(it)[:]
    wap, bap = next(it)[:], next(it)[:]
    wout, bout = next(it)[:], next(it)[:]
    tokens_o = next(it)
    len_o = next(it)
    score_o = next(it)

    f32 = jnp.float32
    row_k = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)        # [k,1]
    col_k = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)        # [1,k]
    col_S = jax.lax.broadcasted_iota(jnp.int32, (k, S), 1)        # [k,S]
    col_V = jax.lax.broadcasted_iota(jnp.int32, (k, V), 1)        # [k,V]
    flat_i = (jax.lax.broadcasted_iota(jnp.int32, (k, Vp), 0) * Vp +
              jax.lax.broadcasted_iota(jnp.int32, (k, Vp), 1))    # [k,Vp]
    pad_cols = jax.lax.broadcasted_iota(jnp.int32, (k, Vp), 1) >= V

    def cell_state0(hidden):
        z = jnp.zeros((k, hidden), f32)
        return (z, z) if use_lstm else (z,)

    go_emb = jnp.broadcast_to(emb[go_id, :].reshape(1, E), (k, E))

    carry0 = dict(
        t=jnp.zeros((), jnp.int32),
        alive=(row_k == 0).astype(f32),                           # [k,1]
        scores=jnp.where(row_k == 0, 0.0, NEG_INF).astype(f32),   # [k,1]
        seqs=jnp.zeros((k, S), f32),
        lm_state=cell_state0(Hl),
        dec_states=tuple(cell_state0(H) for _ in range(L)),
        context=jnp.zeros((k, H_enc), f32),
        inputs=go_emb,
        fin_count=jnp.zeros((), jnp.int32),
        fin_scores=jnp.full((k, 1), NEG_INF, f32),
        fin_seqs=jnp.zeros((k, S), f32),
        fin_lens=jnp.zeros((k, 1), f32),
    )

    def cond(c):
        return jnp.logical_and(c["t"] < S, jnp.sum(c["alive"]) > 0)

    def body(c):
        # ---- cells chain (dec_step_pallas._cells_kernel math) -------------
        if use_lstm:
            new_lm_c, new_lm_h = _lstm_cell_math(
                c["inputs"], c["lm_state"][0], c["lm_state"][1],
                lm_w[0], lm_w[1], E, Hl, bf16)
            new_lm = (new_lm_c, new_lm_h)
            lm_y = new_lm_h
        else:
            lm_y = _gru_cell_math(c["inputs"], c["lm_state"][0], *lm_w,
                                  E, Hl, bf16)
            new_lm = (lm_y,)
        if has_sp:
            lm_y = _dot(lm_y, sp[0], bf16) + sp[1]
        x = (_dot(lm_y, winp[: lm_y.shape[-1]], bf16) +
             _dot(c["context"], winp[lm_y.shape[-1]:], bf16) + binp)
        new_dec = []
        for layer in range(L):
            in_dim = E if layer == 0 else H
            if use_lstm:
                nc, nh = _lstm_cell_math(
                    x, c["dec_states"][layer][0], c["dec_states"][layer][1],
                    cell_w[layer][0], cell_w[layer][1], in_dim, H, bf16)
                new_dec.append((nc, nh))
                x, query = nh, nc
            else:
                nh = _gru_cell_math(x, c["dec_states"][layer][0],
                                    *cell_w[layer], in_dim, H, bf16)
                new_dec.append((nh,))
                x = query = nh
        new_dec = tuple(new_dec)

        # ---- attention (masked+renormalized softmax) ----------------------
        y = _dot(query, wq, bf16) + bq                           # [k, A]
        s = jnp.sum(attn_v.reshape(1, 1, A) *
                    jnp.tanh(hf[None, :, :] + y[:, None, :]), axis=-1)
        s = jnp.where(msk > 0, s, NEG_INF)                       # [k, T]
        alpha = jax.nn.softmax(s, axis=-1)
        context = _dot(alpha, enc, bf16)                         # [k, H_enc]

        # ---- output projection + log softmax ------------------------------
        proj = (_dot(query, wap[:H], bf16) +
                _dot(context, wap[H:], bf16) + bap)
        logits = _dot(proj, wout, bf16) + bout                   # [k, Vp]
        logits = jnp.where(pad_cols, NEG_INF, logits)
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        logp = logits - lmax - jnp.log(
            jnp.sum(jnp.exp(logits - lmax), axis=-1, keepdims=True))

        # ---- candidate scores + unrolled top-k selection ------------------
        cand = jnp.where(c["alive"] > 0, c["scores"] + logp, NEG_INF)
        new_len = c["t"] + 1
        stored_base = penalty * new_len.astype(f32)

        live_gather = jnp.zeros((k, k), f32)
        sel_token = jnp.zeros((k, 1), f32)
        sel_scores = jnp.full((k, 1), NEG_INF, f32)
        slot_valid = jnp.zeros((k, 1), f32)
        fin_count = c["fin_count"]
        fin_scores, fin_seqs, fin_lens = (c["fin_scores"], c["fin_seqs"],
                                          c["fin_lens"])
        live_count = jnp.zeros((), jnp.int32)
        num_live = k - c["fin_count"]

        for i in range(k):
            val = jnp.max(cand)
            idx = jnp.min(jnp.where(cand >= val, flat_i, BIG_IDX))
            cand = jnp.where(flat_i == idx, NEG_INF, cand)
            parent = idx // Vp
            token = idx % Vp
            accept = i < num_live
            is_eos = token == eos_id
            stored = val + stored_base
            parent_oh = (col_k == parent).astype(f32)            # [1,k]
            cand_seq = _dot(parent_oh, c["seqs"], False)         # [1,S]
            cand_seq = jnp.where(col_S[:1] == c["t"],
                                 token.astype(f32), cand_seq)
            # finished buffer append
            fin_sel = jnp.logical_and(accept, is_eos)
            fin_oh = jnp.logical_and(row_k == fin_count, fin_sel)
            fin_scores = jnp.where(fin_oh, stored, fin_scores)
            fin_lens = jnp.where(fin_oh, new_len.astype(f32), fin_lens)
            fin_seqs = jnp.where(fin_oh, cand_seq, fin_seqs)
            fin_count = fin_count + fin_sel.astype(jnp.int32)
            # live slot append (in rank order)
            live_sel = jnp.logical_and(accept, jnp.logical_not(is_eos))
            live_oh = jnp.logical_and(row_k == live_count,
                                      live_sel).astype(f32)      # [k,1]
            live_gather = live_gather + live_oh * parent_oh
            sel_token = jnp.where(live_oh > 0, token.astype(f32), sel_token)
            sel_scores = jnp.where(live_oh > 0, stored, sel_scores)
            slot_valid = jnp.maximum(slot_valid, live_oh)
            live_count = live_count + live_sel.astype(jnp.int32)

        # ---- gather parent states into compacted live slots ---------------
        def gather(m):
            return _dot(live_gather, m, False)

        g_lm = tuple(gather(m) for m in new_lm)
        g_dec = tuple(tuple(gather(m) for m in layer) for layer in new_dec)
        g_context = gather(context)
        g_seqs = jnp.where(col_S == c["t"], sel_token * slot_valid,
                           gather(c["seqs"]))
        tok_oh = jnp.logical_and(col_V == sel_token.astype(jnp.int32),
                                 slot_valid > 0).astype(f32)     # [k,V]
        new_inputs = _dot(tok_oh, emb, bf16)

        return dict(
            t=new_len,
            alive=slot_valid,
            scores=jnp.where(slot_valid > 0, sel_scores, NEG_INF),
            seqs=g_seqs,
            lm_state=g_lm,
            dec_states=g_dec,
            context=g_context,
            inputs=new_inputs,
            fin_count=fin_count,
            fin_scores=fin_scores,
            fin_seqs=fin_seqs,
            fin_lens=fin_lens,
        )

    final = jax.lax.while_loop(cond, body, carry0)

    # ---- best of finished ∪ live (beam_search.py:334-338) -----------------
    live_scores = jnp.where(final["alive"] > 0, final["scores"], NEG_INF)
    all_scores = jnp.concatenate([final["fin_scores"], live_scores], axis=0)
    all_seqs = jnp.concatenate([final["fin_seqs"], final["seqs"]], axis=0)
    live_lens = jnp.broadcast_to(final["t"].astype(f32), (k, 1))
    all_lens = jnp.concatenate([final["fin_lens"], live_lens], axis=0)

    row_2k = jax.lax.broadcasted_iota(jnp.int32, (2 * k, 1), 0)
    best_score = jnp.max(all_scores)
    best_idx = jnp.min(jnp.where(all_scores >= best_score, row_2k, BIG_IDX))
    best_oh = (row_2k == best_idx).astype(f32)                   # [2k,1]
    tokens_o[:] = jnp.sum(best_oh * all_seqs, axis=0,
                          keepdims=True).astype(jnp.int32)
    # [1,1] stores (scalar stores to VMEM are not lowerable).
    len_o[:] = jnp.sum(best_oh * all_lens, axis=0,
                       keepdims=True).astype(jnp.int32)
    score_o[:] = jnp.max(all_scores, axis=0, keepdims=True)


def beam_decode_mega(dec_params: dict, dec_cfg, beam_cfg,
                     enc_states: Array, enc_lens: Array,
                     *, bf16: bool = False):
    """Whole-decode mega-kernel entry. Mirrors beam_decode's return contract:
    (tokens [B, max_steps] i32, lens [B] i32, scores [B] f32)."""
    from e2e_asr_tpu.data.text import EOS_ID, GO_ID
    from e2e_asr_tpu.models.attn_decoder import make_attn_context

    B, T, H_enc = enc_states.shape
    k = beam_cfg.beam_size
    S = beam_cfg.max_steps
    E = dec_params["embedding"].shape[-1]
    V = dec_params["embedding"].shape[0]
    Vp = _round_up(V, 128)
    Hl = dec_cfg.lm_hidden_size
    H = dec_cfg.hidden_size_dec
    A = dec_params["attn_query"]["kernel"].shape[-1]
    L = dec_cfg.num_layers_dec
    has_sp = "simple_proj" in dec_params
    use_lstm = dec_cfg.use_lstm

    ctx = make_attn_context(dec_params, enc_states, enc_lens)
    out = dec_params["output_proj_ind" if dec_cfg.ind_softmax
                     else "output_proj"]
    w_out, b_out = out["kernel"], out["bias"]
    if Vp > V:
        w_out = jnp.pad(w_out, ((0, 0), (0, Vp - V)))
        b_out = jnp.pad(b_out, (0, Vp - V), constant_values=0.0)
    b_out = b_out.reshape(1, Vp)

    per_b = [enc_states, ctx.hidden_features, ctx.mask]
    shared = [dec_params["embedding"],
              dec_params["attn_v"].reshape(1, A)]
    shared += _cell_weight_args(dec_params["lm_cell"], use_lstm)
    if has_sp:
        shared += [dec_params["simple_proj"]["kernel"],
                   dec_params["simple_proj"]["bias"].reshape(1, -1)]
    shared += [dec_params["input_proj"]["kernel"],
               dec_params["input_proj"]["bias"].reshape(1, -1)]
    for cp in dec_params["dec_cells"]:
        shared += _cell_weight_args(cp, use_lstm)
    shared += [dec_params["attn_query"]["kernel"],
               dec_params["attn_query"]["bias"].reshape(1, -1),
               dec_params["attn_proj"]["kernel"],
               dec_params["attn_proj"]["bias"].reshape(1, -1),
               w_out, b_out]
    # Cell biases come in 1D from the param tree; the kernel math broadcasts
    # them over rows, which needs 2D on TPU.
    shared = [a.reshape(1, -1) if a.ndim == 1 else a for a in shared]

    kernel = functools.partial(
        _mega_kernel, use_lstm=use_lstm, L=L, has_sp=has_sp, E=E, Hl=Hl, H=H,
        A=A, H_enc=H_enc, T=T, V=V, Vp=Vp, k=k, S=S,
        penalty=float(beam_cfg.word_ins_penalty), eos_id=EOS_ID, go_id=GO_ID,
        bf16=bf16)

    grid = (B,)
    in_specs = (
        [pl.BlockSpec((1, T, H_enc), lambda b: (b, 0, 0)),
         pl.BlockSpec((1, T, A), lambda b: (b, 0, 0)),
         pl.BlockSpec((1, T), lambda b: (b, 0))] +
        [pl.BlockSpec(a.shape, lambda b: tuple(0 for _ in a.shape))
         for a in shared])
    out_specs = [pl.BlockSpec((1, S), lambda b: (b, 0)),
                 pl.BlockSpec((1, 1), lambda b: (b, 0)),
                 pl.BlockSpec((1, 1), lambda b: (b, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, S), jnp.int32),
                 jax.ShapeDtypeStruct((B, 1), jnp.int32),
                 jax.ShapeDtypeStruct((B, 1), jnp.float32)]
    tokens, lens, scores = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(enc_states, ctx.hidden_features, ctx.mask, *shared)
    return tokens, lens[:, 0], scores[:, 0]
