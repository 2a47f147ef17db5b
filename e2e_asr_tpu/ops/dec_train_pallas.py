"""Pallas TPU kernel: fused attention-decoder TRAINING sequence.

The training decoder (models/attn_decoder.apply_train, re-designing the
reference's tf.nn.raw_rnn loop at /root/reference/attn_decoder.py:37-172)
runs `steps` sequential iterations of ~8 small matmuls + attention. As an
XLA scan that costs ~74us/step backward on v5e (dispatch + poor pipelining);
fused here, the whole sequence is ONE kernel launch per direction with all
weights, the precomputed attention features W*h_enc, and the encoder states
resident in VMEM across the sequential grid (wide-tier VMEM limit,
ops/lstm_pallas.py).

Per grid step t (order preserved from attn_decoder.step):
  1. select the LM-LSTM input projection: teacher row t, or — when step
     t-1's scheduled-sampling coin fired — onehot(argmax(logits_{t-1} +
     gumbel_{t-1})) @ (E @ W_lm_x + b_lm). Sampling noise is precomputed
     OUTSIDE (attn_decoder.train_noise) and shared verbatim with the XLA
     scan path, so the two paths are exactly parity-testable; the one-hot
     is built by comparison against the row max (gumbel ties have measure
     zero) and the embedding gather becomes a [B,V]@[V,4G] matmul.
  2. internal LM LSTM (gate order i,j,f,o, forget-bias+1) -> optional
     dropout mask (pre-sampled outside) on its output.
  3. InputProjection of [lm_out, prev context] (concat avoided by splitting
     the weight rows), main decoder LSTM cell.
  4. Bahdanau attention, query = the decoder cell's **c** state
     (decoder.py:74-82): masked+renormalized softmax over
     sum(v * tanh(HF + W_q c)), context = alpha @ enc_states.
  5. AttnProjection of [c, context] -> OutputProjection logits.

Training runs a custom VJP whose backward is the mirrored reverse-time
kernel: gates are recomputed from saved per-step (h, c, ctx) rows exactly
like ops/lstm_pallas.py, attention is re-derived from the saved alpha rows,
and all weight gradients accumulate into VMEM-resident blocks. Gradients
for the embedding / W_lm_x / attn_w flow through the d(teacher_lmx),
d(EWb) and d(HF) cotangents returned to the (autodiff-traced) precompute
matmuls outside the kernel.

Supported envelope (same spirit as ops/dec_step_pallas.supported): LSTM
cells, one decoder layer, no SimpleProjection (lm_hidden == hidden), shared
softmax. Everything else falls back to the XLA scan in
models/attn_decoder.apply_train.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_asr_tpu.ops.lstm_pallas import _interpret, _wide_params

Array = jax.Array


def supported(cfg, params: dict) -> bool:
    """LSTM cells — the whole reference decoder config space: stacked deep
    decoders, SimpleProjection (lm_hidden != hidden) and ind_softmax
    (OutputProjection2) included since round 3."""
    return bool(cfg.use_lstm) and getattr(cfg, "decoder_type", "rnn") == "rnn"


def _dims(params: dict):
    G4 = params["lm_cell"]["bias"].shape[0]          # 4 * lm_hidden
    G = G4 // 4
    D4 = params["dec_cells"][0]["bias"].shape[0]     # 4 * hidden
    D = D4 // 4
    M = params["dec_cells"][0]["kernel"].shape[0] - D   # emb (cell in_dim)
    # With SimpleProjection the InputProjection consumes the projected
    # [hidden]-dim lm output, not the raw [lm_hidden] one.
    hid_in = D if "simple_proj" in params else G
    E = params["input_proj"]["kernel"].shape[0] - hid_in   # encoder dim
    A = params["attn_w"].shape[1]
    V = params["output_proj"]["bias"].shape[0]
    NL = len(params["dec_cells"])
    return G, D, M, E, A, V, NL


def _weights_bytes(params: dict) -> int:
    G, D, M, E, A, V, NL = _dims(params)
    n = (V * 4 * G + G * 4 * G + (G + E) * M + M + M * 4 * D + 4 * D
         + D * 4 * D + D * A + A + A + (D + E) * D + D + D * V + V
         + (NL - 1) * (2 * D * 4 * D + 4 * D))
    return 4 * n


# This kernel's estimate below is itemized (unlike the generic LSTM-kernel
# heuristics), so it runs with a tighter margin under the same raised
# 112MB Mosaic limit: the flagship decoder (B=128, T_enc=48) lands at
# ~52MB estimated / fits comfortably on-chip (verified by compile).
DEC_BUDGET = 84 * 1024 * 1024


def fits(steps: int, B: int, T_enc: int, params: dict) -> bool:
    """Itemized wide-tier estimate: weights (plus transposed layout copies in
    the backward), resident hf/enc/amask, gradient accumulators, carries,
    and double-buffered per-step blocks."""
    G, D, M, E, A, V, NL = _dims(params)
    w = _weights_bytes(params)
    resident = (3 * w                      # weights + bwd layout copies
                + 4 * B * T_enc * (A + E + 1)      # hf + enc + amask
                + 4 * B * T_enc * (A + E)          # d_hf + d_enc accums
                + 4 * B * (4 * G + NL * 4 * D + 2 * E + 2 * V + 4 * D))
    blocked = 4 * B * (4 * G + V + 1 + G + NL * V     # fwd ins
                       + (2 + 6 * NL) * D + 2 * E + T_enc + V)
    return resident + 2 * blocked <= DEC_BUDGET


def _lstm_fwd(gates, c, H):
    i = jax.nn.sigmoid(gates[:, :H])
    j = jnp.tanh(gates[:, H:2 * H])
    f = jax.nn.sigmoid(gates[:, 2 * H:3 * H] + 1.0)
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    new_c = c * f + i * j
    new_h = o * jnp.tanh(new_c)
    return new_c, new_h


def _onehot_argmax(z):
    zmax = jnp.max(z, axis=-1, keepdims=True)
    oh = (z >= zmax).astype(jnp.float32)
    return oh / jnp.sum(oh, axis=-1, keepdims=True)


def _mm(a, b, bf16):
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, G: int, D: int, M: int, E: int, A: int, V: int,
                NL: int, sp: bool, bf16: bool, samp: bool, drop: bool,
                save: bool):
    it = iter(refs)
    ewb_ref, wlmh_ref, ipw_ref, ipb_ref = next(it), next(it), next(it), next(it)
    dxw_ref, decb_ref, dhw_ref = next(it), next(it), next(it)
    qw_ref, qb_ref, v_ref, apw_ref, apb_ref = (next(it), next(it), next(it),
                                               next(it), next(it))
    opw_ref, opb_ref = next(it), next(it)
    xtra = [(next(it), next(it), next(it)) for _ in range(NL - 1)]
    spw_ref, spb_ref = (next(it), next(it)) if sp else (None, None)
    HID = D if sp else G                   # InputProjection's lm-side rows
    hf_ref, enc_ref, amask_ref = next(it), next(it), next(it)
    tlmx_ref = next(it)
    gum_ref = next(it) if samp else None
    flag_ref = next(it) if samp else None
    lm_mask_ref = next(it) if drop else None
    inter_mask_refs = [next(it) for _ in range(NL - 1)] if drop else []
    # outputs
    logits_out = next(it)
    if save:
        hlm_out, clm_out = next(it), next(it)
        dec_outs = [(next(it), next(it)) for _ in range(NL)]   # (h, c)
        ctx_out, alpha_out = next(it), next(it)
    # scratch
    hlm_s, clm_s = next(it), next(it)
    dec_s = [(next(it), next(it)) for _ in range(NL)]          # (h, c)
    ctx_s, plog_s = next(it), next(it)

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        hlm_s[:] = jnp.zeros_like(hlm_s)
        clm_s[:] = jnp.zeros_like(clm_s)
        for h_s, c_s in dec_s:
            h_s[:] = jnp.zeros_like(h_s)
            c_s[:] = jnp.zeros_like(c_s)
        ctx_s[:] = jnp.zeros_like(ctx_s)
        plog_s[:] = jnp.zeros_like(plog_s)

    # 1. LM-LSTM input projection: teacher row t, or sampled from the
    #    PREVIOUS step's logits (gum/flag arrays are pre-shifted outside:
    #    row t holds step t-1's noise, row 0 forces teacher).
    lmx = tlmx_ref[0]
    if samp:
        oh = _onehot_argmax(plog_s[:] + gum_ref[0])
        lmx_samp = _mm(oh, ewb_ref[:], bf16)
        flag = flag_ref[0]
        lmx = flag * lmx_samp + (1.0 - flag) * lmx

    # 2. internal LM LSTM (+ dropout)
    gates_lm = lmx + _mm(hlm_s[:], wlmh_ref[:], bf16)
    new_clm, new_hlm = _lstm_fwd(gates_lm, clm_s[:], G)
    lm_out = new_hlm * lm_mask_ref[0] if drop else new_hlm
    if sp:                                 # SimpleProjection (step order:
        lm_out = _mm(lm_out, spw_ref[:], bf16) + spb_ref[0]   # after drop)

    # 3. InputProjection([lm_out, prev ctx]) and the decoder cell stack
    #    (inter-layer dropout masks between cells, not after the top).
    x_dec = (_mm(lm_out, ipw_ref[:HID], bf16)
             + _mm(ctx_s[:], ipw_ref[HID:], bf16) + ipb_ref[0])
    new_dec = []
    inp = x_dec
    for layer in range(NL):
        dxw_l, decb_l, dhw_l = ((dxw_ref, decb_ref, dhw_ref) if layer == 0
                                else xtra[layer - 1])
        h_s, c_s = dec_s[layer]
        gates_l = (_mm(inp, dxw_l[:], bf16)
                   + _mm(h_s[:], dhw_l[:], bf16) + decb_l[0])
        c_l, h_l = _lstm_fwd(gates_l, c_s[:], D)
        new_dec.append((h_l, c_l))
        inp = h_l
        if drop and layer < NL - 1:
            inp = inp * inter_mask_refs[layer][0]
    new_cdec = new_dec[-1][1]                     # query = TOP cell's c

    # 4. attention (query = c). All [T', B, .] TIME-major: Mosaic handles
    # broadcasts/reductions over the leading axis; batch-major [B, T', A]
    # middle-axis broadcasts fail relayout ("non-singleton logical dimension
    # is replicated", observed on v5e).
    y = _mm(new_cdec, qw_ref[:], bf16) + qb_ref[0]            # [B, A]
    th = jnp.tanh(hf_ref[:] + y[None, :, :])                  # [T', B, A]
    scores = jnp.sum(th * v_ref[0][None, None, :], axis=-1)   # [T', B]
    amask = amask_ref[:]                                      # [T', B]
    scores = jnp.where(amask > 0, scores, -1e30)
    mrow = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - mrow) * amask
    alpha = e / jnp.sum(e, axis=0, keepdims=True)             # [T', B]
    ctx = jnp.sum(alpha[:, :, None] * enc_ref[:], axis=0)     # [B, E]

    # 5. projections
    proj = (_mm(new_cdec, apw_ref[:D], bf16)
            + _mm(ctx, apw_ref[D:], bf16) + apb_ref[0])
    logits = _mm(proj, opw_ref[:], bf16) + opb_ref[0]

    logits_out[0] = logits
    if save:
        hlm_out[0] = new_hlm
        clm_out[0] = new_clm
        for (h_out, c_out), (h_l, c_l) in zip(dec_outs, new_dec):
            h_out[0] = h_l
            c_out[0] = c_l
        ctx_out[0] = ctx
        alpha_out[0] = alpha

    hlm_s[:] = new_hlm
    clm_s[:] = new_clm
    for (h_s, c_s), (h_l, c_l) in zip(dec_s, new_dec):
        h_s[:] = h_l
        c_s[:] = c_l
    ctx_s[:] = ctx
    if samp:
        plog_s[:] = logits


def _weight_args(params: dict):
    """Flatten the decoder weights into the kernel's argument order.
    Biases become [1, dim] rows; attn_v becomes [1, A]. ind_softmax swaps
    in OutputProjection2 (the decoder-private softmax,
    attn_decoder.step); SimpleProjection weights are appended last so the
    fixed head positions (_seq_dims) stay stable."""
    op_key = ("output_proj_ind" if "output_proj_ind" in params
              else "output_proj")
    ip, ap, op, q = (params["input_proj"], params["attn_proj"],
                     params[op_key], params["attn_query"])
    lm, dec = params["lm_cell"], params["dec_cells"][0]
    G4 = lm["bias"].shape[0]
    G = G4 // 4
    D4 = dec["bias"].shape[0]
    D = D4 // 4
    M = dec["kernel"].shape[0] - D
    # EWb: embedding @ W_lm_x with the LM bias folded in (the one-hot rows
    # sum to 1, so onehot @ EWb == emb @ W + b).
    ewb = (jnp.dot(params["embedding"], lm["kernel"][:params["embedding"].shape[1]])
           + lm["bias"][None, :])
    out = [
        ewb, lm["kernel"][params["embedding"].shape[1]:],
        ip["kernel"], ip["bias"][None, :],
        dec["kernel"][:M], dec["bias"][None, :], dec["kernel"][M:],
        q["kernel"], q["bias"][None, :], params["attn_v"][None, :],
        ap["kernel"], ap["bias"][None, :],
        op["kernel"], op["bias"][None, :],
    ]
    for cell in params["dec_cells"][1:]:      # stacked layers: in_dim = D
        in_dim = cell["kernel"].shape[0] - cell["bias"].shape[0] // 4
        out += [cell["kernel"][:in_dim], cell["bias"][None, :],
                cell["kernel"][in_dim:]]
    if "simple_proj" in params:
        out += [params["simple_proj"]["kernel"],
                params["simple_proj"]["bias"][None, :]]
    return out


def _fwd_call(weights, hf, enc, amask, tlmx, gum_sh, flag_sh, lm_masks,
              inter_masks, *, dims, sp, bf16, save):
    """weights: the arrays from _weight_args (already traced values).
    gum_sh/flag_sh: pre-shifted noise (row t = step t-1), or None.
    inter_masks: tuple of [steps, B, D] dropout masks between stacked
    decoder cells (empty unless dropout and NL > 1)."""
    G, D, M, E, A, V, NL = dims
    steps, B = tlmx.shape[0], tlmx.shape[1]
    T_enc = enc.shape[0]                       # enc is TIME-major [T', B, E]
    samp = gum_sh is not None
    drop = lm_masks is not None

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda t: (t, 0, 0)                          # noqa: E731
    in_specs = [const] * (len(weights) + 3)            # weights + hf/enc/mask
    args = list(weights) + [hf, enc, amask]
    in_specs.append(pl.BlockSpec((1, B, 4 * G), blk, memory_space=pltpu.VMEM))
    args.append(tlmx)
    if samp:
        in_specs += [pl.BlockSpec((1, B, V), blk, memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, B, 1), blk, memory_space=pltpu.VMEM)]
        args += [gum_sh, flag_sh]
    if drop:
        in_specs.append(pl.BlockSpec((1, B, G), blk,
                                     memory_space=pltpu.VMEM))
        args.append(lm_masks)
        for m in inter_masks:
            in_specs.append(pl.BlockSpec((1, B, D), blk,
                                         memory_space=pltpu.VMEM))
            args.append(m)

    out_dims = [V]
    if save:
        out_dims += [G, G] + [D, D] * NL + [E]
    out_specs = [pl.BlockSpec((1, B, d), blk, memory_space=pltpu.VMEM)
                 for d in out_dims]
    out_shape = [jax.ShapeDtypeStruct((steps, B, d), jnp.float32)
                 for d in out_dims]
    if save:
        # alpha is saved TIME-major [steps, T', B] (kernel layout).
        out_specs.append(pl.BlockSpec((1, T_enc, B), blk,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((steps, T_enc, B),
                                              jnp.float32))
    kernel = functools.partial(_fwd_kernel, G=G, D=D, M=M, E=E, A=A, V=V,
                               NL=NL, sp=sp, bf16=bf16, samp=samp, drop=drop,
                               save=save)
    outs = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((B, G), jnp.float32),   # h_lm
             pltpu.VMEM((B, G), jnp.float32)]   # c_lm
            + [pltpu.VMEM((B, D), jnp.float32)
               for _ in range(2 * NL)]          # (h, c) per decoder layer
            + [pltpu.VMEM((B, E), jnp.float32),  # ctx
               pltpu.VMEM((B, V), jnp.float32)]  # prev logits
        ),
        compiler_params=_wide_params(),
        interpret=_interpret(),
    )(*args)
    return outs


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, G: int, D: int, M: int, E: int, A: int, V: int,
                NL: int, steps: int, sp: bool, bf16: bool, samp: bool,
                drop: bool):
    it = iter(refs)
    ewb_ref, wlmh_ref, ipw_ref, _ipb = next(it), next(it), next(it), next(it)
    dxw_ref, _decb, dhw_ref = next(it), next(it), next(it)
    qw_ref, qb_ref, v_ref, apw_ref, apb_ref = (next(it), next(it), next(it),
                                               next(it), next(it))
    opw_ref, _opb = next(it), next(it)
    xtra = [(next(it), next(it), next(it)) for _ in range(NL - 1)]
    spw_ref, spb_ref = (next(it), next(it)) if sp else (None, None)
    HID = D if sp else G
    hf_ref, enc_ref, amask_ref = next(it), next(it), next(it)
    tlmx_ref = next(it)
    gum_ref = next(it) if samp else None
    flag_ref = next(it) if samp else None
    lm_mask_ref = next(it) if drop else None
    inter_mask_refs = [next(it) for _ in range(NL - 1)] if drop else []
    # per-step blocked saves (prev = row t-1 via padded arrays, cur = row t)
    hlm_prev_ref, clm_prev_ref, clm_cur_ref = next(it), next(it), next(it)
    hlm_cur_ref = next(it)
    dec_saves = [(next(it), next(it), next(it), next(it))   # (h_prev, c_prev,
                 for _ in range(NL)]                        #  c_cur, h_cur)
    ctx_prev_ref, ctx_cur_ref, alpha_ref = next(it), next(it), next(it)
    plog_ref = next(it) if samp else None          # logits row t-1 (padded)
    dlog_ref = next(it)
    # outputs (weight-grad accumulators mirror the weights order)
    dtlmx_ref = next(it)
    (dewb_ref, dwlmh_ref, dipw_ref, dipb_ref, ddxw_ref, ddecb_ref, ddhw_ref,
     dqw_ref, dqb_ref, dv_ref, dapw_ref, dapb_ref, dopw_ref, dopb_ref,
     ) = (next(it) for _ in range(14))
    dxtra = [(next(it), next(it), next(it)) for _ in range(NL - 1)]
    dspw_ref, dspb_ref = (next(it), next(it)) if sp else (None, None)
    dhf_ref, denc_ref = next(it), next(it)
    # scratch carries
    dhlm_s, dclm_s = next(it), next(it)
    ddec_s = [(next(it), next(it)) for _ in range(NL)]      # (dh, dc)
    dctx_s = next(it)

    r = pl.program_id(0)

    @pl.when(r == 0)
    def _init():
        dhlm_s[:] = jnp.zeros_like(dhlm_s)
        dclm_s[:] = jnp.zeros_like(dclm_s)
        for dh_s, dc_s in ddec_s:
            dh_s[:] = jnp.zeros_like(dh_s)
            dc_s[:] = jnp.zeros_like(dc_s)
        dctx_s[:] = jnp.zeros_like(dctx_s)
        for ref in ([dewb_ref, dwlmh_ref, dipw_ref, dipb_ref, ddxw_ref,
                     ddecb_ref, ddhw_ref, dqw_ref, dqb_ref, dv_ref, dapw_ref,
                     dapb_ref, dopw_ref, dopb_ref, dhf_ref, denc_ref]
                    + [x for tri in dxtra for x in tri]
                    + ([dspw_ref, dspb_ref] if sp else [])):
            ref[:] = jnp.zeros_like(ref)

    # ---- recompute forward locals for step t ----
    lmx = tlmx_ref[0]
    oh = None
    flag = None
    if samp:
        oh = _onehot_argmax(plog_ref[0] + gum_ref[0])
        flag = flag_ref[0]
        lmx = flag * _mm(oh, ewb_ref[:], bf16) + (1.0 - flag) * lmx

    hlm_prev, clm_prev = hlm_prev_ref[0], clm_prev_ref[0]
    gates_lm = lmx + _mm(hlm_prev, wlmh_ref[:], bf16)
    i_lm = jax.nn.sigmoid(gates_lm[:, :G])
    j_lm = jnp.tanh(gates_lm[:, G:2 * G])
    f_lm = jax.nn.sigmoid(gates_lm[:, 2 * G:3 * G] + 1.0)
    o_lm = jax.nn.sigmoid(gates_lm[:, 3 * G:])
    hlm_cur = hlm_cur_ref[0]
    lm_drop = hlm_cur * lm_mask_ref[0] if drop else hlm_cur
    lm_out = (_mm(lm_drop, spw_ref[:], bf16) + spb_ref[0] if sp
              else lm_drop)

    ctx_prev = ctx_prev_ref[0]
    x_dec = (_mm(lm_out, ipw_ref[:HID], bf16)
             + _mm(ctx_prev, ipw_ref[HID:], bf16) + _ipb[0])
    # Recompute every decoder layer's gates from the SAVES (no sequential
    # dependency: layer l's input is layer l-1's saved h_cur through the
    # inter-layer dropout mask).
    w_layers = [(dxw_ref, _decb, dhw_ref)] + xtra
    inps, gate_parts = [], []
    inp = x_dec
    for layer in range(NL):
        dxw_l, decb_l, dhw_l = w_layers[layer]
        h_prev_l = dec_saves[layer][0][0]
        gates_l = (_mm(inp, dxw_l[:], bf16)
                   + _mm(h_prev_l, dhw_l[:], bf16) + decb_l[0])
        i_l = jax.nn.sigmoid(gates_l[:, :D])
        j_l = jnp.tanh(gates_l[:, D:2 * D])
        f_l = jax.nn.sigmoid(gates_l[:, 2 * D:3 * D] + 1.0)
        o_l = jax.nn.sigmoid(gates_l[:, 3 * D:])
        inps.append(inp)
        gate_parts.append((i_l, j_l, f_l, o_l))
        inp = dec_saves[layer][3][0]                  # h_cur of this layer
        if drop and layer < NL - 1:
            inp = inp * inter_mask_refs[layer][0]
    cdec_cur = dec_saves[-1][2][0]                    # TOP cell's c

    y = _mm(cdec_cur, qw_ref[:], bf16) + qb_ref[0]
    th = jnp.tanh(hf_ref[:] + y[None, :, :])                  # [T', B, A]
    alpha = alpha_ref[0]                                      # [T', B]
    ctx_cur = ctx_cur_ref[0]
    proj = (_mm(cdec_cur, apw_ref[:D], bf16)
            + _mm(ctx_cur, apw_ref[D:], bf16) + apb_ref[0])

    # ---- backward chain ----
    dlog = dlog_ref[0]                                        # [B, V]
    dopw_ref[:] += _mm(proj.T, dlog, bf16)
    dopb_ref[:] += jnp.sum(dlog, axis=0, keepdims=True)
    dproj = _mm(dlog, opw_ref[:].T, bf16)

    dapw_top = _mm(cdec_cur.T, dproj, bf16)
    dapw_bot = _mm(ctx_cur.T, dproj, bf16)
    dapw_ref[:D] += dapw_top
    dapw_ref[D:] += dapw_bot
    dapb_ref[:] += jnp.sum(dproj, axis=0, keepdims=True)
    dc_direct = _mm(dproj, apw_ref[:D].T, bf16)               # into c_dec
    dctx_total = _mm(dproj, apw_ref[D:].T, bf16) + dctx_s[:]

    # attention backward (time-major, reductions over the leading axis).
    # NOTE: every product keeps one CONCRETE [T',B,*] operand — multiplying
    # two differently-implicit-broadcast operands (e.g. alpha[:,:,None] *
    # dctx[None,:,:]) fails Mosaic lowering ("unsupported output implicit
    # dimension", observed on v5e).
    dctx3 = jnp.broadcast_to(dctx_total[None, :, :], enc_ref.shape)
    denc_ref[:] += alpha[:, :, None] * dctx3
    dalpha = jnp.sum(dctx3 * enc_ref[:], axis=-1)             # [T', B]
    # softmax vjp. sum_t(dalpha*alpha) == <dctx, ctx> per batch column —
    # the direct sublane reduce over dalpha (a 3D-minor-reduce result) hits
    # an unsupported Mosaic relayout; the inner-product form does not.
    inner = jnp.sum(dctx_total * ctx_cur, axis=-1)            # [B]
    ds = alpha * (dalpha - inner[None, :])
    vrow = v_ref[0][None, None, :]
    dv_ref[:] += jnp.sum(jnp.sum(ds[:, :, None] * th, axis=0),
                         axis=0)[None, :]
    dpre = ds[:, :, None] * (vrow * (1.0 - th * th))          # [T', B, A]
    dhf_ref[:] += dpre
    dy = jnp.sum(dpre, axis=0)                                # [B, A]
    dqw_ref[:] += _mm(cdec_cur.T, dy, bf16)
    dqb_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dc_direct += _mm(dy, qw_ref[:].T, bf16)

    # decoder LSTM stack backward, top-down. A layer's h_cur feeds the next
    # step's own gates (carry) and — below the top — the layer above's
    # input at THIS step; only the top cell's c has the attention/proj
    # contributions (dc_direct).
    dacc_layers = [(ddxw_ref, ddecb_ref, ddhw_ref)] + dxtra
    dinp_above = None
    for layer in reversed(range(NL)):
        i_l, j_l, f_l, o_l = gate_parts[layer]
        h_prev_l = dec_saves[layer][0][0]
        c_prev_l = dec_saves[layer][1][0]
        c_cur_l = dec_saves[layer][2][0]
        dh_s_l, dc_s_l = ddec_s[layer]
        dxw_l, _, dhw_l = w_layers[layer]
        dxw_acc, db_acc, dhw_acc = dacc_layers[layer]

        tanh_cl_ = jnp.tanh(c_cur_l)
        dh_total = dh_s_l[:] + (dinp_above if dinp_above is not None else 0.0)
        dc_total = dh_total * o_l * (1.0 - tanh_cl_ * tanh_cl_) + dc_s_l[:]
        if layer == NL - 1:
            dc_total = dc_total + dc_direct
        do_ = dh_total * tanh_cl_ * o_l * (1.0 - o_l)
        df_ = dc_total * c_prev_l * f_l * (1.0 - f_l)
        di_ = dc_total * j_l * i_l * (1.0 - i_l)
        dj_ = dc_total * i_l * (1.0 - j_l * j_l)
        dgates_l = jnp.concatenate([di_, dj_, df_, do_], axis=-1)
        dxw_acc[:] += _mm(inps[layer].T, dgates_l, bf16)
        db_acc[:] += jnp.sum(dgates_l, axis=0, keepdims=True)
        dhw_acc[:] += _mm(h_prev_l.T, dgates_l, bf16)
        dh_s_l[:] = _mm(dgates_l, dhw_l[:].T, bf16)
        dc_s_l[:] = dc_total * f_l
        dinp = _mm(dgates_l, dxw_l[:].T, bf16)
        if layer > 0:
            dinp_above = (dinp * inter_mask_refs[layer - 1][0]
                          if drop else dinp)
        else:
            dx_dec = dinp

    # InputProjection backward
    dipw_ref[:HID] += _mm(lm_out.T, dx_dec, bf16)
    dipw_ref[HID:] += _mm(ctx_prev.T, dx_dec, bf16)
    dipb_ref[:] += jnp.sum(dx_dec, axis=0, keepdims=True)
    dlm_out = _mm(dx_dec, ipw_ref[:HID].T, bf16)
    dctx_s[:] = _mm(dx_dec, ipw_ref[HID:].T, bf16)   # -> ctx_{t-1} carry
    if sp:                                  # SimpleProjection backward
        dspw_ref[:] += _mm(lm_drop.T, dlm_out, bf16)
        dspb_ref[:] += jnp.sum(dlm_out, axis=0, keepdims=True)
        dlm_out = _mm(dlm_out, spw_ref[:].T, bf16)
    if drop:
        dlm_out = dlm_out * lm_mask_ref[0]

    # LM LSTM backward
    tanh_cl = jnp.tanh(clm_cur_ref[0])
    dh_total_l = dlm_out + dhlm_s[:]
    do_l = dh_total_l * tanh_cl * o_lm * (1.0 - o_lm)
    dc_total_l = dh_total_l * o_lm * (1.0 - tanh_cl * tanh_cl) + dclm_s[:]
    df_l = dc_total_l * clm_prev * f_lm * (1.0 - f_lm)
    di_l = dc_total_l * j_lm * i_lm * (1.0 - i_lm)
    dj_l = dc_total_l * i_lm * (1.0 - j_lm * j_lm)
    dgates_l = jnp.concatenate([di_l, dj_l, df_l, do_l], axis=-1)
    dwlmh_ref[:] += _mm(hlm_prev.T, dgates_l, bf16)
    dhlm_s[:] = _mm(dgates_l, wlmh_ref[:].T, bf16)
    dclm_s[:] = dc_total_l * f_lm

    # route the LM input-projection gradient: teacher row t vs sampled
    # (gradient stops at the argmax; only the EWb matmul sees it)
    if samp:
        dtlmx_ref[0] = (1.0 - flag) * dgates_l
        dewb_ref[:] += _mm(oh.T, flag * dgates_l, bf16)
    else:
        dtlmx_ref[0] = dgates_l


def _bwd_call(weights, hf, enc, amask, tlmx, gum_sh, flag_sh, lm_masks,
              inter_masks, saves, dlogits, *, dims, sp, bf16):
    G, D, M, E, A, V, NL = dims
    steps, B = tlmx.shape[0], tlmx.shape[1]
    T_enc = enc.shape[0]                       # enc is TIME-major [T', B, E]
    samp = gum_sh is not None
    drop = lm_masks is not None
    logits, hlm, clm = saves[0], saves[1], saves[2]
    dec_hc = [(saves[3 + 2 * l], saves[4 + 2 * l]) for l in range(NL)]
    ctxs, alphas = saves[3 + 2 * NL], saves[4 + 2 * NL]

    zG = jnp.zeros((1, B, G), jnp.float32)
    zD = jnp.zeros((1, B, D), jnp.float32)
    zE = jnp.zeros((1, B, E), jnp.float32)
    hlm_pad = jnp.concatenate([zG, hlm], axis=0)       # pad[t] = state_{t-1}
    clm_pad = jnp.concatenate([zG, clm], axis=0)
    dec_pads = [(jnp.concatenate([zD, h], axis=0),
                 jnp.concatenate([zD, c], axis=0)) for h, c in dec_hc]
    ctx_pad = jnp.concatenate([zE, ctxs], axis=0)
    if samp:
        zV = jnp.zeros((1, B, V), jnp.float32)
        plog_pad = jnp.concatenate([zV, logits], axis=0)

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    rev = lambda r: (steps - 1 - r, 0, 0)              # noqa: E731
    prev = lambda r: (steps - 1 - r, 0, 0)             # on padded arrays
    cur = lambda r: (steps - r, 0, 0)                  # noqa: E731

    in_specs = [const] * (len(weights) + 3)
    args = list(weights) + [hf, enc, amask]
    in_specs.append(pl.BlockSpec((1, B, 4 * G), rev, memory_space=pltpu.VMEM))
    args.append(tlmx)
    if samp:
        in_specs += [pl.BlockSpec((1, B, V), rev, memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, B, 1), rev, memory_space=pltpu.VMEM)]
        args += [gum_sh, flag_sh]
    if drop:
        in_specs.append(pl.BlockSpec((1, B, G), rev, memory_space=pltpu.VMEM))
        args.append(lm_masks)
        for m in inter_masks:
            in_specs.append(pl.BlockSpec((1, B, D), rev,
                                         memory_space=pltpu.VMEM))
            args.append(m)
    # saves: prev rows on padded arrays, cur rows on padded/current arrays
    rows = [(hlm_pad, G, prev), (clm_pad, G, prev),
            (clm_pad, G, cur), (hlm_pad, G, cur)]
    for h_pad, c_pad in dec_pads:
        rows += [(h_pad, D, prev), (c_pad, D, prev),
                 (c_pad, D, cur), (h_pad, D, cur)]
    rows += [(ctx_pad, E, prev), (ctx_pad, E, cur)]
    for arr, d, idx in rows:
        in_specs.append(pl.BlockSpec((1, B, d), idx, memory_space=pltpu.VMEM))
        args.append(arr)
    in_specs.append(pl.BlockSpec((1, T_enc, B), rev, memory_space=pltpu.VMEM))
    args.append(alphas)
    if samp:
        in_specs.append(pl.BlockSpec((1, B, V), prev,
                                     memory_space=pltpu.VMEM))
        args.append(plog_pad)
    in_specs.append(pl.BlockSpec((1, B, V), rev, memory_space=pltpu.VMEM))
    args.append(dlogits)

    wshapes = [w.shape for w in weights]
    out_specs = ([pl.BlockSpec((1, B, 4 * G), rev, memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(s, lambda r, _n=len(s): (0,) * _n,
                                 memory_space=pltpu.VMEM) for s in wshapes]
                 + [pl.BlockSpec(hf.shape, lambda r: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(enc.shape, lambda r: (0, 0, 0),
                                 memory_space=pltpu.VMEM)])
    out_shape = ([jax.ShapeDtypeStruct((steps, B, 4 * G), jnp.float32)]
                 + [jax.ShapeDtypeStruct(s, jnp.float32) for s in wshapes]
                 + [jax.ShapeDtypeStruct(hf.shape, jnp.float32),
                    jax.ShapeDtypeStruct(enc.shape, jnp.float32)])

    kernel = functools.partial(_bwd_kernel, G=G, D=D, M=M, E=E, A=A, V=V,
                               NL=NL, steps=steps, sp=sp, bf16=bf16,
                               samp=samp, drop=drop)
    outs = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((B, G), jnp.float32),   # dh_lm
             pltpu.VMEM((B, G), jnp.float32)]   # dc_lm
            + [pltpu.VMEM((B, D), jnp.float32)
               for _ in range(2 * NL)]           # (dh, dc) per decoder layer
            + [pltpu.VMEM((B, E), jnp.float32)]  # dctx
        ),
        compiler_params=_wide_params(),
        interpret=_interpret(),
    )(*args)
    return outs


# ---------------------------------------------------------------------------
# custom-VJP wrapper + public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _dec_train_seq(weights, hf, enc, amask, tlmx, gum_sh, flag_sh, lm_masks,
                   inter_masks, bf16, sp):
    """weights: tuple of the arrays from _weight_args (14 + 3 per extra
    decoder layer + 2 when SimpleProjection); inter_masks: tuple of
    inter-layer dropout masks."""
    dims = _seq_dims(weights, enc, sp)
    (logits,) = _fwd_call(weights, hf, enc, amask, tlmx, gum_sh, flag_sh,
                          lm_masks, inter_masks, dims=dims, sp=sp, bf16=bf16,
                          save=False)
    return logits


def _seq_dims(weights, enc, sp):
    wlmh, dxw, dhw, qw, opb = (weights[1], weights[4], weights[6],
                               weights[7], weights[13])
    G = wlmh.shape[0]
    D = dhw.shape[0]
    M = dxw.shape[0]
    E = enc.shape[-1]
    A = qw.shape[1]
    V = opb.shape[1]
    NL = 1 + (len(weights) - 14 - (2 if sp else 0)) // 3
    return G, D, M, E, A, V, NL


def _dec_train_fwd(weights, hf, enc, amask, tlmx, gum_sh, flag_sh, lm_masks,
                   inter_masks, bf16, sp):
    dims = _seq_dims(weights, enc, sp)
    outs = _fwd_call(weights, hf, enc, amask, tlmx, gum_sh, flag_sh, lm_masks,
                     inter_masks, dims=dims, sp=sp, bf16=bf16, save=True)
    logits = outs[0]
    res = (weights, hf, enc, amask, tlmx, gum_sh, flag_sh, lm_masks,
           inter_masks, tuple(outs))
    return logits, res


def _dec_train_bwd(bf16, sp, res, dlogits):
    (weights, hf, enc, amask, tlmx, gum_sh, flag_sh, lm_masks, inter_masks,
     saves) = res
    dims = _seq_dims(weights, enc, sp)
    outs = _bwd_call(weights, hf, enc, amask, tlmx, gum_sh, flag_sh, lm_masks,
                     inter_masks, saves, dlogits, dims=dims, sp=sp, bf16=bf16)
    n_w = len(weights)
    dtlmx = outs[0]
    dweights = tuple(outs[1:1 + n_w])
    dhf, denc = outs[1 + n_w], outs[2 + n_w]
    zeros = lambda x: None if x is None else jnp.zeros_like(x)  # noqa: E731
    return (dweights, dhf, denc, jnp.zeros_like(amask), dtlmx,
            zeros(gum_sh), zeros(flag_sh), zeros(lm_masks),
            tuple(jnp.zeros_like(m) for m in inter_masks))


_dec_train_seq.defvjp(_dec_train_fwd, _dec_train_bwd)


def apply_train_fused(params: dict, cfg, emb_inputs: Array, enc_states: Array,
                      enc_lens: Array, flags: Array, gumbel: Array,
                      lm_masks: Array | None,
                      inter_masks: tuple = (), *, compute_dtype=None) -> Array:
    """Fused-kernel equivalent of attn_decoder.apply_train's scan (same
    precomputed noise => exact parity up to matmul precision).

    emb_inputs: [T, B, emb]; returns logits [T-1, B, V].
    """
    from e2e_asr_tpu.core import cells

    T, B, _ = emb_inputs.shape
    steps = T - 1
    G, D, M, E, A, V, NL = _dims(params)
    bf16 = compute_dtype is not None

    # Precomputed (autodiff-traced) matmuls OUTSIDE the kernel: the VJP's
    # d(tlmx)/d(EWb)/d(hf) cotangents flow back into embedding / W_lm_x /
    # attn_w through these.
    tlmx = cells.lstm_precompute_inputs(params["lm_cell"], emb_inputs[:steps],
                                        M, compute_dtype=compute_dtype)
    weights = tuple(_weight_args(params))
    w_attn = params["attn_w"]
    x = enc_states
    if compute_dtype is not None:
        x, w_attn = x.astype(compute_dtype), w_attn.astype(compute_dtype)
    # TIME-major attention tensors for the kernel (see _fwd_kernel comment);
    # the transposes are autodiff-traced, so the returned d(hf)/d(enc)
    # cotangents map back to enc_states / attn_w automatically.
    hf = jnp.dot(x, w_attn,
                 preferred_element_type=jnp.float32).transpose(1, 0, 2)
    enc_tm = jnp.asarray(enc_states, jnp.float32).transpose(1, 0, 2)
    T_enc = enc_states.shape[1]
    amask = (jnp.arange(T_enc)[:, None]
             < enc_lens.astype(jnp.int32)[None, :]).astype(jnp.float32)

    if cfg.samp_prob > 0:
        # Shift noise by one step: the kernel selects step t's input from
        # step t-1's logits/noise; row 0 forces the teacher <go> row.
        zV = jnp.zeros((1, B, V), jnp.float32)
        gum_sh = jnp.concatenate([zV, gumbel[:-1]], axis=0)
        flag_sh = jnp.concatenate(
            [jnp.zeros((1, B, 1), jnp.float32),
             jnp.broadcast_to(flags[:-1, None, None], (steps - 1, B, 1))],
            axis=0)
    else:
        gum_sh = flag_sh = None
    if lm_masks is not None:
        lm_masks = jnp.broadcast_to(lm_masks, (steps, B, G))
        inter = tuple(jnp.broadcast_to(m, (steps, B, D)) for m in inter_masks)
    else:
        inter = ()

    return _dec_train_seq(weights, hf, enc_tm, amask, tlmx, gum_sh, flag_sh,
                          lm_masks, inter, bf16, "simple_proj" in params)
