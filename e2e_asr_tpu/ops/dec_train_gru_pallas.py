"""Pallas TPU kernel: fused attention-decoder TRAINING sequence, GRU cells.

The GRU sibling of ops/dec_train_pallas.py, covering the reference's
`use_lstm=False` decoder (/root/reference/decoder.py:49-72,
attn_decoder.py:37-172 with GRUCell): the whole teacher-forced decoder
sequence runs as ONE forward launch and ONE mirrored reverse-time backward
launch, with all weights, the precomputed attention features, and the
encoder states resident in VMEM across the sequential grid.

Structure per step t (attn_decoder.step order, GRU semantics pinned by
core/cells.gru_step — TF-1 GRUCell, gates bias init 1.0, candidate
consumes r*h):
  1. LM-GRU input rows: teacher gates_x/cand_x rows (precomputed outside by
     cells.gru_precompute_inputs, so embedding grads flow through the
     traced matmuls), or — when step t-1's scheduled-sampling coin fired —
     onehot(argmax(logits_{t-1} + gumbel_{t-1})) @ (E W_x + b), one matmul
     per GRU input block. Noise is precomputed OUTSIDE
     (attn_decoder.train_noise) and shared verbatim with the XLA scan.
  2. LM GRU:  value = sigmoid(gx + h W_gh); r,u = split(value)
              c = tanh(cx + (r*h) W_ch);   h' = u h + (1-u) c
     then optional dropout on h' (mask pre-sampled outside).
  3. InputProjection of [lm_out, prev context], then the decoder GRU stack
     (x-side projections computed in-kernel; inter-layer dropout masks).
  4. Bahdanau attention with query = the TOP cell's **h** (GRU has no c;
     attn_decoder._query_of, reference decoder.py:64-72).
  5. AttnProjection of [h_top, context] -> OutputProjection logits.

The backward kernel recomputes r/u/c per cell from the saved h rows
(the GRU carry is h only — half the save traffic of the LSTM variant) and
accumulates every weight gradient into VMEM-resident blocks; embedding /
W_x / attn_w gradients flow through the d(tgx)/d(tcx)/d(EWb)/d(hf)
cotangents returned to the traced precompute matmuls outside.

Supported envelope: GRU cells, any depth, SimpleProjection
(lm_hidden != hidden) and ind_softmax included — the exact complement of
dec_train_pallas.supported, covering the whole reference decoder config
space for use_lstm=False.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_asr_tpu.ops.dec_train_pallas import _mm, _onehot_argmax
from e2e_asr_tpu.ops.lstm_pallas import _interpret, _wide_params

Array = jax.Array

N_HEAD = 13          # fixed-position weights before the per-layer blocks


def supported(cfg, params: dict) -> bool:
    """GRU cells — the whole reference decoder config space: stacked deep
    decoders, SimpleProjection and ind_softmax included (mirrors
    dec_train_pallas.supported for use_lstm=True)."""
    return (not cfg.use_lstm
            and getattr(cfg, "decoder_type", "rnn") == "rnn")


def _dims(params: dict):
    G = params["lm_cell"]["candidate"]["bias"].shape[0]
    D = params["dec_cells"][0]["candidate"]["bias"].shape[0]
    cell0 = params["dec_cells"][0]
    M = cell0["gates"]["kernel"].shape[0] - D            # emb (cell in_dim)
    hid_in = D if "simple_proj" in params else G
    E = params["input_proj"]["kernel"].shape[0] - hid_in  # encoder dim
    A = params["attn_w"].shape[1]
    V = params["output_proj"]["bias"].shape[0]
    NL = len(params["dec_cells"])
    return G, D, M, E, A, V, NL


def _weights_bytes(params: dict) -> int:
    G, D, M, E, A, V, NL = _dims(params)
    n = (V * 3 * G + G * 2 * G + G * G + (G + E) * M + M
         + M * 3 * D + 3 * D + D * 2 * D + D * D
         + D * A + A + A + (D + E) * D + D + D * V + V
         + (NL - 1) * (D * 3 * D + 3 * D + D * 2 * D + D * D))
    return 4 * n


DEC_BUDGET = 84 * 1024 * 1024


def fits(steps: int, B: int, T_enc: int, params: dict) -> bool:
    """Itemized wide-tier estimate (same methodology as
    dec_train_pallas.fits; GRU carries/saves are h-only)."""
    G, D, M, E, A, V, NL = _dims(params)
    w = _weights_bytes(params)
    resident = (3 * w
                + 4 * B * T_enc * (A + E + 1)            # hf + enc + amask
                + 4 * B * T_enc * (A + E)                # d_hf + d_enc accums
                + 4 * B * (3 * G + NL * 2 * D + 2 * E + 2 * V))
    blocked = 4 * B * (3 * G + V + 1 + G + NL * V
                       + (1 + 4 * NL) * D + 2 * E + T_enc + V)
    return resident + 2 * blocked <= DEC_BUDGET


def _gru_fwd(gx, cx, h, w_gh, w_ch, H, bf16):
    """One in-kernel GRU step; returns (r, u, c, new_h)."""
    value = jax.nn.sigmoid(gx + _mm(h, w_gh, bf16))
    r, u = value[:, :H], value[:, H:]
    c = jnp.tanh(cx + _mm(r * h, w_ch, bf16))
    return r, u, c, u * h + (1.0 - u) * c


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, G: int, D: int, M: int, E: int, A: int, V: int,
                NL: int, sp: bool, bf16: bool, samp: bool, drop: bool,
                save: bool):
    it = iter(refs)
    ewbg_ref, ewbc_ref, wghlm_ref, wchlm_ref = (next(it), next(it), next(it),
                                                next(it))
    ipw_ref, ipb_ref = next(it), next(it)
    qw_ref, qb_ref, v_ref, apw_ref, apb_ref = (next(it), next(it), next(it),
                                               next(it), next(it))
    opw_ref, opb_ref = next(it), next(it)
    layers = [tuple(next(it) for _ in range(6)) for _ in range(NL)]
    spw_ref, spb_ref = (next(it), next(it)) if sp else (None, None)
    HID = D if sp else G
    hf_ref, enc_ref, amask_ref = next(it), next(it), next(it)
    tgx_ref, tcx_ref = next(it), next(it)
    gum_ref = next(it) if samp else None
    flag_ref = next(it) if samp else None
    lm_mask_ref = next(it) if drop else None
    inter_mask_refs = [next(it) for _ in range(NL - 1)] if drop else []
    # outputs
    logits_out = next(it)
    if save:
        hlm_out = next(it)
        h_outs = [next(it) for _ in range(NL)]
        ctx_out, alpha_out = next(it), next(it)
    # scratch
    hlm_s = next(it)
    h_s = [next(it) for _ in range(NL)]
    ctx_s, plog_s = next(it), next(it)

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        hlm_s[:] = jnp.zeros_like(hlm_s)
        for s in h_s:
            s[:] = jnp.zeros_like(s)
        ctx_s[:] = jnp.zeros_like(ctx_s)
        plog_s[:] = jnp.zeros_like(plog_s)

    # 1. LM-GRU input rows (teacher, or sampled from step t-1's logits —
    # gum/flag arrays are pre-shifted outside, row 0 forces teacher).
    gx, cx = tgx_ref[0], tcx_ref[0]
    if samp:
        oh = _onehot_argmax(plog_s[:] + gum_ref[0])
        flag = flag_ref[0]
        gx = flag * _mm(oh, ewbg_ref[:], bf16) + (1.0 - flag) * gx
        cx = flag * _mm(oh, ewbc_ref[:], bf16) + (1.0 - flag) * cx

    # 2. LM GRU (+ dropout)
    _, _, _, new_hlm = _gru_fwd(gx, cx, hlm_s[:], wghlm_ref[:], wchlm_ref[:],
                                G, bf16)
    lm_out = new_hlm * lm_mask_ref[0] if drop else new_hlm
    if sp:                                 # SimpleProjection (after drop)
        lm_out = _mm(lm_out, spw_ref[:], bf16) + spb_ref[0]

    # 3. InputProjection([lm_out, prev ctx]) and the decoder GRU stack
    x_dec = (_mm(lm_out, ipw_ref[:HID], bf16)
             + _mm(ctx_s[:], ipw_ref[HID:], bf16) + ipb_ref[0])
    new_h = []
    inp = x_dec
    for layer in range(NL):
        wgx_l, bg_l, wgh_l, wcx_l, bc_l, wch_l = layers[layer]
        gx_l = _mm(inp, wgx_l[:], bf16) + bg_l[0]
        cx_l = _mm(inp, wcx_l[:], bf16) + bc_l[0]
        _, _, _, h_l = _gru_fwd(gx_l, cx_l, h_s[layer][:], wgh_l[:],
                                wch_l[:], D, bf16)
        new_h.append(h_l)
        inp = h_l
        if drop and layer < NL - 1:
            inp = inp * inter_mask_refs[layer][0]
    query = new_h[-1]                                 # query = TOP cell's h

    # 4. attention (time-major layout — see dec_train_pallas._fwd_kernel's
    # Mosaic relayout notes; the math is attn_decoder.attention exactly)
    y = _mm(query, qw_ref[:], bf16) + qb_ref[0]               # [B, A]
    th = jnp.tanh(hf_ref[:] + y[None, :, :])                  # [T', B, A]
    scores = jnp.sum(th * v_ref[0][None, None, :], axis=-1)   # [T', B]
    amask = amask_ref[:]
    scores = jnp.where(amask > 0, scores, -1e30)
    mrow = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - mrow) * amask
    alpha = e / jnp.sum(e, axis=0, keepdims=True)             # [T', B]
    ctx = jnp.sum(alpha[:, :, None] * enc_ref[:], axis=0)     # [B, E]

    # 5. projections
    proj = (_mm(query, apw_ref[:D], bf16)
            + _mm(ctx, apw_ref[D:], bf16) + apb_ref[0])
    logits = _mm(proj, opw_ref[:], bf16) + opb_ref[0]

    logits_out[0] = logits
    if save:
        hlm_out[0] = new_hlm
        for out, h_l in zip(h_outs, new_h):
            out[0] = h_l
        ctx_out[0] = ctx
        alpha_out[0] = alpha

    hlm_s[:] = new_hlm
    for s, h_l in zip(h_s, new_h):
        s[:] = h_l
    ctx_s[:] = ctx
    if samp:
        plog_s[:] = logits


def _weight_args(params: dict):
    """Flatten the GRU decoder weights into the kernel argument order:
    N_HEAD fixed entries, then 6 per decoder layer, then SimpleProjection
    (when present) appended last so fixed positions stay stable. EWb folds
    the LM bias into the embedding matmul (one-hot rows sum to 1);
    ind_softmax swaps in OutputProjection2."""
    op_key = ("output_proj_ind" if "output_proj_ind" in params
              else "output_proj")
    ip, ap, op, q = (params["input_proj"], params["attn_proj"],
                     params[op_key], params["attn_query"])
    lm = params["lm_cell"]
    emb = params["embedding"]
    M = emb.shape[1]
    ewbg = jnp.dot(emb, lm["gates"]["kernel"][:M]) + lm["gates"]["bias"][None]
    ewbc = (jnp.dot(emb, lm["candidate"]["kernel"][:M])
            + lm["candidate"]["bias"][None])
    out = [
        ewbg, ewbc, lm["gates"]["kernel"][M:], lm["candidate"]["kernel"][M:],
        ip["kernel"], ip["bias"][None, :],
        q["kernel"], q["bias"][None, :], params["attn_v"][None, :],
        ap["kernel"], ap["bias"][None, :],
        op["kernel"], op["bias"][None, :],
    ]
    assert len(out) == N_HEAD
    for cell in params["dec_cells"]:
        in_dim = cell["candidate"]["kernel"].shape[0] - \
            cell["candidate"]["bias"].shape[0]
        out += [cell["gates"]["kernel"][:in_dim],
                cell["gates"]["bias"][None, :],
                cell["gates"]["kernel"][in_dim:],
                cell["candidate"]["kernel"][:in_dim],
                cell["candidate"]["bias"][None, :],
                cell["candidate"]["kernel"][in_dim:]]
    if "simple_proj" in params:
        out += [params["simple_proj"]["kernel"],
                params["simple_proj"]["bias"][None, :]]
    return out


def _seq_dims(weights, enc, sp):
    wchlm, qw, apw, opb = weights[3], weights[6], weights[9], weights[12]
    G = wchlm.shape[0]
    A = qw.shape[1]
    D = apw.shape[1]
    V = opb.shape[1]
    E = enc.shape[-1]
    M = weights[N_HEAD].shape[0]                 # layer-0 W_gx rows
    NL = (len(weights) - N_HEAD - (2 if sp else 0)) // 6
    return G, D, M, E, A, V, NL


def _common_specs(weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh,
                  lm_masks, inter_masks, *, dims, idx):
    """Input specs/args shared by the fwd and bwd calls; idx maps the grid
    step to the blocked row (identity fwd, reversed bwd)."""
    G, D, M, E, A, V, NL = dims
    B = tgx.shape[1]
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [const] * (len(weights) + 3)
    args = list(weights) + [hf, enc, amask]
    in_specs += [pl.BlockSpec((1, B, 2 * G), idx, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, B, G), idx, memory_space=pltpu.VMEM)]
    args += [tgx, tcx]
    if gum_sh is not None:
        in_specs += [pl.BlockSpec((1, B, V), idx, memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, B, 1), idx, memory_space=pltpu.VMEM)]
        args += [gum_sh, flag_sh]
    if lm_masks is not None:
        in_specs.append(pl.BlockSpec((1, B, G), idx, memory_space=pltpu.VMEM))
        args.append(lm_masks)
        for m in inter_masks:
            in_specs.append(pl.BlockSpec((1, B, D), idx,
                                         memory_space=pltpu.VMEM))
            args.append(m)
    return in_specs, args


def _fwd_call(weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh, lm_masks,
              inter_masks, *, dims, sp, bf16, save):
    G, D, M, E, A, V, NL = dims
    steps, B = tgx.shape[0], tgx.shape[1]
    T_enc = enc.shape[0]                       # enc is TIME-major [T', B, E]
    blk = lambda t: (t, 0, 0)                          # noqa: E731
    in_specs, args = _common_specs(weights, hf, enc, amask, tgx, tcx, gum_sh,
                                   flag_sh, lm_masks, inter_masks,
                                   dims=dims, idx=blk)
    out_dims = [V]
    if save:
        out_dims += [G] + [D] * NL + [E]
    out_specs = [pl.BlockSpec((1, B, d), blk, memory_space=pltpu.VMEM)
                 for d in out_dims]
    out_shape = [jax.ShapeDtypeStruct((steps, B, d), jnp.float32)
                 for d in out_dims]
    if save:
        out_specs.append(pl.BlockSpec((1, T_enc, B), blk,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((steps, T_enc, B),
                                              jnp.float32))
    kernel = functools.partial(_fwd_kernel, G=G, D=D, M=M, E=E, A=A, V=V,
                               NL=NL, sp=sp, bf16=bf16,
                               samp=gum_sh is not None,
                               drop=lm_masks is not None, save=save)
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((B, G), jnp.float32)]           # h_lm
            + [pltpu.VMEM((B, D), jnp.float32)
               for _ in range(NL)]                      # h per decoder layer
            + [pltpu.VMEM((B, E), jnp.float32),          # ctx
               pltpu.VMEM((B, V), jnp.float32)]          # prev logits
        ),
        compiler_params=_wide_params(),
        interpret=_interpret(),
    )(*args)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _gru_bwd(dh_total, h_prev, r, u, c, inp, w_gh, w_ch, w_gx, w_cx, bf16):
    """GRU cell backward given recomputed r/u/c. Returns
    (dgpre [B,2H], dcpre [B,H], dh_prev, dinp)."""
    du = dh_total * (h_prev - c)
    dc = dh_total * (1.0 - u)
    dh_prev = dh_total * u
    dcpre = dc * (1.0 - c * c)
    drh = _mm(dcpre, w_ch[:].T, bf16)
    dr = drh * h_prev
    dh_prev = dh_prev + drh * r
    dgpre = jnp.concatenate([dr * r * (1.0 - r), du * u * (1.0 - u)],
                            axis=-1)
    dh_prev = dh_prev + _mm(dgpre, w_gh[:].T, bf16)
    dinp = None
    if w_gx is not None:
        dinp = _mm(dgpre, w_gx[:].T, bf16) + _mm(dcpre, w_cx[:].T, bf16)
    return dgpre, dcpre, dh_prev, dinp


def _bwd_kernel(*refs, G: int, D: int, M: int, E: int, A: int, V: int,
                NL: int, sp: bool, bf16: bool, samp: bool, drop: bool):
    it = iter(refs)
    ewbg_ref, ewbc_ref, wghlm_ref, wchlm_ref = (next(it), next(it), next(it),
                                                next(it))
    ipw_ref, ipb_ref = next(it), next(it)
    qw_ref, qb_ref, v_ref, apw_ref, apb_ref = (next(it), next(it), next(it),
                                               next(it), next(it))
    opw_ref, _opb = next(it), next(it)
    layers = [tuple(next(it) for _ in range(6)) for _ in range(NL)]
    spw_ref, spb_ref = (next(it), next(it)) if sp else (None, None)
    HID = D if sp else G
    hf_ref, enc_ref, amask_ref = next(it), next(it), next(it)
    tgx_ref, tcx_ref = next(it), next(it)
    gum_ref = next(it) if samp else None
    flag_ref = next(it) if samp else None
    lm_mask_ref = next(it) if drop else None
    inter_mask_refs = [next(it) for _ in range(NL - 1)] if drop else []
    # per-step blocked saves (prev = row t-1 via padded arrays, cur = row t)
    hlm_prev_ref, hlm_cur_ref = next(it), next(it)
    h_saves = [(next(it), next(it)) for _ in range(NL)]  # (h_prev, h_cur)
    ctx_prev_ref, ctx_cur_ref, alpha_ref = next(it), next(it), next(it)
    plog_ref = next(it) if samp else None
    dlog_ref = next(it)
    # outputs: d(tgx), d(tcx), then weight-grad accumulators in weight order
    dtgx_ref, dtcx_ref = next(it), next(it)
    (dewbg_ref, dewbc_ref, dwghlm_ref, dwchlm_ref, dipw_ref, dipb_ref,
     dqw_ref, dqb_ref, dv_ref, dapw_ref, dapb_ref, dopw_ref, dopb_ref,
     ) = (next(it) for _ in range(N_HEAD))
    dlayers = [tuple(next(it) for _ in range(6)) for _ in range(NL)]
    dspw_ref, dspb_ref = (next(it), next(it)) if sp else (None, None)
    dhf_ref, denc_ref = next(it), next(it)
    # scratch carries
    dhlm_s = next(it)
    dh_s = [next(it) for _ in range(NL)]
    dctx_s = next(it)

    r_id = pl.program_id(0)

    @pl.when(r_id == 0)
    def _init():
        dhlm_s[:] = jnp.zeros_like(dhlm_s)
        for s in dh_s:
            s[:] = jnp.zeros_like(s)
        dctx_s[:] = jnp.zeros_like(dctx_s)
        for ref in ([dewbg_ref, dewbc_ref, dwghlm_ref, dwchlm_ref, dipw_ref,
                     dipb_ref, dqw_ref, dqb_ref, dv_ref, dapw_ref, dapb_ref,
                     dopw_ref, dopb_ref, dhf_ref, denc_ref]
                    + [x for six in dlayers for x in six]
                    + ([dspw_ref, dspb_ref] if sp else [])):
            ref[:] = jnp.zeros_like(ref)

    # ---- recompute forward locals for step t ----
    gx, cx = tgx_ref[0], tcx_ref[0]
    oh = None
    flag = None
    if samp:
        oh = _onehot_argmax(plog_ref[0] + gum_ref[0])
        flag = flag_ref[0]
        gx = flag * _mm(oh, ewbg_ref[:], bf16) + (1.0 - flag) * gx
        cx = flag * _mm(oh, ewbc_ref[:], bf16) + (1.0 - flag) * cx

    hlm_prev = hlm_prev_ref[0]
    r_lm, u_lm, c_lm, _ = _gru_fwd(gx, cx, hlm_prev, wghlm_ref[:],
                                   wchlm_ref[:], G, bf16)
    hlm_cur = hlm_cur_ref[0]
    lm_drop = hlm_cur * lm_mask_ref[0] if drop else hlm_cur
    lm_out = (_mm(lm_drop, spw_ref[:], bf16) + spb_ref[0] if sp
              else lm_drop)

    ctx_prev = ctx_prev_ref[0]
    x_dec = (_mm(lm_out, ipw_ref[:HID], bf16)
             + _mm(ctx_prev, ipw_ref[HID:], bf16) + ipb_ref[0])
    # Recompute every layer's r/u/c from the saves (layer l's input is
    # layer l-1's saved h_cur through the inter-layer dropout mask).
    inps, ruc = [], []
    inp = x_dec
    for layer in range(NL):
        wgx_l, bg_l, wgh_l, wcx_l, bc_l, wch_l = layers[layer]
        h_prev_l = h_saves[layer][0][0]
        gx_l = _mm(inp, wgx_l[:], bf16) + bg_l[0]
        cx_l = _mm(inp, wcx_l[:], bf16) + bc_l[0]
        r_l, u_l, c_l, _ = _gru_fwd(gx_l, cx_l, h_prev_l, wgh_l[:], wch_l[:],
                                    D, bf16)
        inps.append(inp)
        ruc.append((r_l, u_l, c_l))
        inp = h_saves[layer][1][0]                    # saved h_cur
        if drop and layer < NL - 1:
            inp = inp * inter_mask_refs[layer][0]
    query = h_saves[-1][1][0]                         # TOP cell's h

    y = _mm(query, qw_ref[:], bf16) + qb_ref[0]
    th = jnp.tanh(hf_ref[:] + y[None, :, :])                  # [T', B, A]
    alpha = alpha_ref[0]                                      # [T', B]
    ctx_cur = ctx_cur_ref[0]
    proj = (_mm(query, apw_ref[:D], bf16)
            + _mm(ctx_cur, apw_ref[D:], bf16) + apb_ref[0])

    # ---- backward chain ----
    dlog = dlog_ref[0]                                        # [B, V]
    dopw_ref[:] += _mm(proj.T, dlog, bf16)
    dopb_ref[:] += jnp.sum(dlog, axis=0, keepdims=True)
    dproj = _mm(dlog, opw_ref[:].T, bf16)

    dapw_ref[:D] += _mm(query.T, dproj, bf16)
    dapw_ref[D:] += _mm(ctx_cur.T, dproj, bf16)
    dapb_ref[:] += jnp.sum(dproj, axis=0, keepdims=True)
    dq_direct = _mm(dproj, apw_ref[:D].T, bf16)               # into h_top
    dctx_total = _mm(dproj, apw_ref[D:].T, bf16) + dctx_s[:]

    # attention backward (see dec_train_pallas._bwd_kernel Mosaic notes)
    dctx3 = jnp.broadcast_to(dctx_total[None, :, :], enc_ref.shape)
    denc_ref[:] += alpha[:, :, None] * dctx3
    dalpha = jnp.sum(dctx3 * enc_ref[:], axis=-1)             # [T', B]
    inner = jnp.sum(dctx_total * ctx_cur, axis=-1)            # [B]
    ds = alpha * (dalpha - inner[None, :])
    vrow = v_ref[0][None, None, :]
    dv_ref[:] += jnp.sum(jnp.sum(ds[:, :, None] * th, axis=0),
                         axis=0)[None, :]
    dpre = ds[:, :, None] * (vrow * (1.0 - th * th))          # [T', B, A]
    dhf_ref[:] += dpre
    dy = jnp.sum(dpre, axis=0)                                # [B, A]
    dqw_ref[:] += _mm(query.T, dy, bf16)
    dqb_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dq_direct += _mm(dy, qw_ref[:].T, bf16)

    # decoder GRU stack backward, top-down
    dinp_above = None
    dx_dec = None
    for layer in reversed(range(NL)):
        wgx_l, _, wgh_l, wcx_l, _, wch_l = layers[layer]
        dwgx_l, dbg_l, dwgh_l, dwcx_l, dbc_l, dwch_l = dlayers[layer]
        r_l, u_l, c_l = ruc[layer]
        h_prev_l = h_saves[layer][0][0]
        dh_total = dh_s[layer][:] + (dinp_above if dinp_above is not None
                                     else 0.0)
        if layer == NL - 1:
            dh_total = dh_total + dq_direct
        dgpre, dcpre, dh_prev, dinp = _gru_bwd(
            dh_total, h_prev_l, r_l, u_l, c_l, inps[layer],
            wgh_l, wch_l, wgx_l, wcx_l, bf16)
        dwgx_l[:] += _mm(inps[layer].T, dgpre, bf16)
        dbg_l[:] += jnp.sum(dgpre, axis=0, keepdims=True)
        dwgh_l[:] += _mm(h_prev_l.T, dgpre, bf16)
        dwcx_l[:] += _mm(inps[layer].T, dcpre, bf16)
        dbc_l[:] += jnp.sum(dcpre, axis=0, keepdims=True)
        dwch_l[:] += _mm((r_l * h_prev_l).T, dcpre, bf16)
        dh_s[layer][:] = dh_prev
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
    dctx_s[:] = _mm(dx_dec, ipw_ref[HID:].T, bf16)  # -> ctx_{t-1} carry
    if sp:                                  # SimpleProjection backward
        dspw_ref[:] += _mm(lm_drop.T, dlm_out, bf16)
        dspb_ref[:] += jnp.sum(dlm_out, axis=0, keepdims=True)
        dlm_out = _mm(dlm_out, spw_ref[:].T, bf16)
    if drop:
        dlm_out = dlm_out * lm_mask_ref[0]

    # LM GRU backward
    dh_total_lm = dlm_out + dhlm_s[:]
    dgpre_lm, dcpre_lm, dh_prev_lm, _ = _gru_bwd(
        dh_total_lm, hlm_prev, r_lm, u_lm, c_lm, None,
        wghlm_ref, wchlm_ref, None, None, bf16)
    dwghlm_ref[:] += _mm(hlm_prev.T, dgpre_lm, bf16)
    dwchlm_ref[:] += _mm((r_lm * hlm_prev).T, dcpre_lm, bf16)
    dhlm_s[:] = dh_prev_lm

    # route the LM input-row gradients: teacher vs sampled (gradient stops
    # at the argmax; only the EWb matmuls see the sampled share)
    if samp:
        dtgx_ref[0] = (1.0 - flag) * dgpre_lm
        dtcx_ref[0] = (1.0 - flag) * dcpre_lm
        dewbg_ref[:] += _mm(oh.T, flag * dgpre_lm, bf16)
        dewbc_ref[:] += _mm(oh.T, flag * dcpre_lm, bf16)
    else:
        dtgx_ref[0] = dgpre_lm
        dtcx_ref[0] = dcpre_lm


def _bwd_call(weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh, lm_masks,
              inter_masks, saves, dlogits, *, dims, sp, bf16):
    G, D, M, E, A, V, NL = dims
    steps, B = tgx.shape[0], tgx.shape[1]
    T_enc = enc.shape[0]
    samp = gum_sh is not None
    logits, hlm = saves[0], saves[1]
    h_layers = [saves[2 + l] for l in range(NL)]
    ctxs, alphas = saves[2 + NL], saves[3 + NL]

    zG = jnp.zeros((1, B, G), jnp.float32)
    zD = jnp.zeros((1, B, D), jnp.float32)
    zE = jnp.zeros((1, B, E), jnp.float32)
    hlm_pad = jnp.concatenate([zG, hlm], axis=0)       # pad[t] = state_{t-1}
    h_pads = [jnp.concatenate([zD, h], axis=0) for h in h_layers]
    ctx_pad = jnp.concatenate([zE, ctxs], axis=0)
    if samp:
        zV = jnp.zeros((1, B, V), jnp.float32)
        plog_pad = jnp.concatenate([zV, logits], axis=0)

    rev = lambda r: (steps - 1 - r, 0, 0)              # noqa: E731
    prev = lambda r: (steps - 1 - r, 0, 0)             # on padded arrays
    cur = lambda r: (steps - r, 0, 0)                  # noqa: E731

    in_specs, args = _common_specs(weights, hf, enc, amask, tgx, tcx, gum_sh,
                                   flag_sh, lm_masks, inter_masks,
                                   dims=dims, idx=rev)
    rows = [(hlm_pad, G, prev), (hlm_pad, G, cur)]
    for h_pad in h_pads:
        rows += [(h_pad, D, prev), (h_pad, D, cur)]
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
    out_specs = ([pl.BlockSpec((1, B, 2 * G), rev, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, B, G), rev, memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(s, lambda r, _n=len(s): (0,) * _n,
                                 memory_space=pltpu.VMEM) for s in wshapes]
                 + [pl.BlockSpec(hf.shape, lambda r: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(enc.shape, lambda r: (0, 0, 0),
                                 memory_space=pltpu.VMEM)])
    out_shape = ([jax.ShapeDtypeStruct((steps, B, 2 * G), jnp.float32),
                  jax.ShapeDtypeStruct((steps, B, G), jnp.float32)]
                 + [jax.ShapeDtypeStruct(s, jnp.float32) for s in wshapes]
                 + [jax.ShapeDtypeStruct(hf.shape, jnp.float32),
                    jax.ShapeDtypeStruct(enc.shape, jnp.float32)])

    kernel = functools.partial(_bwd_kernel, G=G, D=D, M=M, E=E, A=A, V=V,
                               NL=NL, sp=sp, bf16=bf16, samp=samp,
                               drop=lm_masks is not None)
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((B, G), jnp.float32)]            # dh_lm
            + [pltpu.VMEM((B, D), jnp.float32)
               for _ in range(NL)]                       # dh per layer
            + [pltpu.VMEM((B, E), jnp.float32)]          # dctx
        ),
        compiler_params=_wide_params(),
        interpret=_interpret(),
    )(*args)


# ---------------------------------------------------------------------------
# custom-VJP wrapper + public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _dec_train_seq(weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh,
                   lm_masks, inter_masks, bf16, sp):
    dims = _seq_dims(weights, enc, sp)
    (logits,) = _fwd_call(weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh,
                          lm_masks, inter_masks, dims=dims, sp=sp, bf16=bf16,
                          save=False)
    return logits


def _dec_train_fwd(weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh,
                   lm_masks, inter_masks, bf16, sp):
    dims = _seq_dims(weights, enc, sp)
    outs = _fwd_call(weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh,
                     lm_masks, inter_masks, dims=dims, sp=sp, bf16=bf16,
                     save=True)
    res = (weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh, lm_masks,
           inter_masks, tuple(outs))
    return outs[0], res


def _dec_train_bwd(bf16, sp, res, dlogits):
    (weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh, lm_masks,
     inter_masks, saves) = res
    dims = _seq_dims(weights, enc, sp)
    outs = _bwd_call(weights, hf, enc, amask, tgx, tcx, gum_sh, flag_sh,
                     lm_masks, inter_masks, saves, dlogits, dims=dims,
                     sp=sp, bf16=bf16)
    n_w = len(weights)
    dtgx, dtcx = outs[0], outs[1]
    dweights = tuple(outs[2:2 + n_w])
    dhf, denc = outs[2 + n_w], outs[3 + n_w]
    zeros = lambda x: None if x is None else jnp.zeros_like(x)  # noqa: E731
    return (dweights, dhf, denc, jnp.zeros_like(amask), dtgx, dtcx,
            zeros(gum_sh), zeros(flag_sh), zeros(lm_masks),
            tuple(jnp.zeros_like(m) for m in inter_masks))


_dec_train_seq.defvjp(_dec_train_fwd, _dec_train_bwd)


def apply_train_fused(params: dict, cfg, emb_inputs: Array, enc_states: Array,
                      enc_lens: Array, flags: Array, gumbel: Array,
                      lm_masks: Array | None,
                      inter_masks: tuple = (), *, compute_dtype=None) -> Array:
    """Fused-kernel equivalent of attn_decoder.apply_train's scan for GRU
    decoders (same precomputed noise => exact parity up to matmul
    precision). emb_inputs: [T, B, emb]; returns logits [T-1, B, V]."""
    from e2e_asr_tpu.core import cells

    T, B, _ = emb_inputs.shape
    steps = T - 1
    G, D, M, E, A, V, NL = _dims(params)
    bf16 = compute_dtype is not None

    tgx, tcx = cells.gru_precompute_inputs(params["lm_cell"],
                                           emb_inputs[:steps], M,
                                           compute_dtype=compute_dtype)
    weights = tuple(_weight_args(params))
    w_attn = params["attn_w"]
    x = enc_states
    if compute_dtype is not None:
        x, w_attn = x.astype(compute_dtype), w_attn.astype(compute_dtype)
    hf = jnp.dot(x, w_attn,
                 preferred_element_type=jnp.float32).transpose(1, 0, 2)
    enc_tm = jnp.asarray(enc_states, jnp.float32).transpose(1, 0, 2)
    T_enc = enc_states.shape[1]
    amask = (jnp.arange(T_enc)[:, None]
             < enc_lens.astype(jnp.int32)[None, :]).astype(jnp.float32)

    if cfg.samp_prob > 0:
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

    return _dec_train_seq(weights, hf, enc_tm, amask, tgx, tcx, gum_sh,
                          flag_sh, lm_masks, inter, bf16,
                          "simple_proj" in params)
