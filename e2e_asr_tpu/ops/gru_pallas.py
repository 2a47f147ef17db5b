"""Pallas TPU kernel: fused GRU sequence (the reference's use_lstm=False path).

Same design as ops/lstm_pallas.py: one kernel runs the whole time dimension
with the recurrent h state in VMEM scratch across sequential grid steps, the
recurrent weights pinned in VMEM, and two MXU matmuls + fused VPU gate math
per step. Input projections are hoisted outside as large MXU matmuls
(cells.gru_precompute_inputs):

    value = sigmoid(gates_x[t] + h @ W_gh)        # [B, 2H], split r|u
    c     = tanh(cand_x[t] + (r * h) @ W_ch)      # [B, H]
    h     = u * h + (1 - u) * c

Gate semantics match TF-1 GRUCell exactly as pinned by core/cells.gru_step
(gates bias init 1.0; candidate consumes r*h).

Backward is a mirrored reverse-time Pallas kernel (round 3; it was an
XLA-scan replay before — the replay re-ran the whole forward under
jax.vjp and dominated the GRU flagship train step): r/u/c are recomputed
from the saved h rows exactly like the LSTM kernel recomputes gates, the
dW_gh/dW_ch accumulators live in VMEM across the sequential grid, and the
input-side cotangents (dgates_x, dcand_x) stream out per block. Falls
back to the XLA replay when the VMEM estimate doesn't fit. The optional
carry-through mask serves the backward direction of bidirectional layers
on time-flipped inputs, exactly like the LSTM kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

VMEM_BUDGET = 14 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _steps_per_block(T: int) -> int:
    return 2 if T % 2 == 0 else 1


def _fwd_vmem_bytes(S: int, B: int, H: int) -> int:
    blocked = S * B * (2 * H + H + H)        # gates_x + cand_x + out
    resident = 3 * H * H + B * H             # W_gh + W_ch + h scratch
    return 4 * (2 * blocked + resident)


def _fwd_wide_vmem_bytes(S: int, B: int, H: int, wbytes: int) -> int:
    """Wide tier (raised VMEM limit, see ops/lstm_pallas.py): blocked
    activations double-buffered, both Ws resident but double-buffered by
    Mosaic (2 copies each), h carry in scratch."""
    blocked = S * B * (2 * H + H + H)
    return 4 * 2 * blocked + 2 * wbytes * 3 * H * H + 4 * B * H


def fwd_fits(T: int, B: int, H: int, bf16: bool = False) -> bool:
    from e2e_asr_tpu.ops.lstm_pallas import VMEM_BUDGET_WIDE
    if _fwd_vmem_bytes(1, B, H) <= VMEM_BUDGET:
        return True
    wbytes = 2 if bf16 else 4
    return _fwd_wide_vmem_bytes(1, B, H, wbytes) <= VMEM_BUDGET_WIDE


def _fwd_kernel(*refs, steps: int, bf16_matmul: bool, with_mask: bool):
    it = iter(refs)
    gx_ref, cx_ref, w_g_ref, w_c_ref = next(it), next(it), next(it), next(it)
    mask_ref = next(it) if with_mask else None
    out_ref = next(it)
    h_ref = next(it)

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)

    H = h_ref.shape[-1]
    for s in range(steps):
        h = h_ref[:]
        w_g, w_c = w_g_ref[:], w_c_ref[:]
        h_mm = h.astype(jnp.bfloat16) if bf16_matmul else h
        if bf16_matmul:
            w_g, w_c = w_g.astype(jnp.bfloat16), w_c.astype(jnp.bfloat16)
        value = jax.nn.sigmoid(
            gx_ref[s] + jnp.dot(h_mm, w_g, preferred_element_type=jnp.float32))
        r, u = value[:, :H], value[:, H:]
        rh = r * h
        rh_mm = rh.astype(jnp.bfloat16) if bf16_matmul else rh
        c = jnp.tanh(
            cx_ref[s] + jnp.dot(rh_mm, w_c,
                                preferred_element_type=jnp.float32))
        new_h = u * h + (1.0 - u) * c
        if mask_ref is not None:
            valid = mask_ref[s]
            new_h = valid * new_h + (1.0 - valid) * h
        out_ref[s] = new_h
        h_ref[:] = new_h


def _fwd_seq(gates_x: Array, cand_x: Array, w_gh: Array, w_ch: Array, *,
             bf16_matmul: bool, mask: Array | None) -> Array:
    from e2e_asr_tpu.ops.lstm_pallas import (VMEM_BUDGET_WIDE, _pick_steps,
                                             _wide_params)

    T, B, H2 = gates_x.shape
    H = H2 // 2
    wbytes = 2 if bf16_matmul else 4
    S, extended = _pick_steps(T, lambda s: (
        _fwd_vmem_bytes(s, B, H) <= VMEM_BUDGET,
        _fwd_wide_vmem_bytes(s, B, H, wbytes) <= VMEM_BUDGET_WIDE))
    if extended and bf16_matmul:
        w_gh = w_gh.astype(jnp.bfloat16)
        w_ch = w_ch.astype(jnp.bfloat16)
    in_specs = [
        pl.BlockSpec((S, B, 2 * H), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 2 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [gates_x, cand_x, w_gh, w_ch]
    if mask is not None:
        in_specs.append(pl.BlockSpec((S, B, 1), lambda t: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    kernel = functools.partial(_fwd_kernel, steps=S, bf16_matmul=bf16_matmul,
                               with_mask=mask is not None)
    extra = {"compiler_params": _wide_params()} if extended else {}
    (out,) = pl.pallas_call(
        kernel,
        grid=(T // S,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((S, B, H), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
        **extra,
    )(*args)
    return out


def _gru_cell_bwd(dh_total, h_prev, r, u, c, w_gh, w_ch, bf16):
    """GRU cell backward given recomputed r/u/c (see
    ops/dec_train_gru_pallas._gru_bwd). Returns (dgpre [B,2H],
    dcpre [B,H], dh_prev [B,H])."""
    du = dh_total * (h_prev - c)
    dc = dh_total * (1.0 - u)
    dh_prev = dh_total * u
    dcpre = dc * (1.0 - c * c)
    w_ch_t = w_ch.T
    w_ch_mm = w_ch_t.astype(jnp.bfloat16) if bf16 else w_ch_t
    dcpre_mm = dcpre.astype(jnp.bfloat16) if bf16 else dcpre
    drh = jnp.dot(dcpre_mm, w_ch_mm, preferred_element_type=jnp.float32)
    dr = drh * h_prev
    dh_prev = dh_prev + drh * r
    dgpre = jnp.concatenate([dr * r * (1.0 - r), du * u * (1.0 - u)],
                            axis=-1)
    w_gh_t = w_gh.T
    w_gh_mm = w_gh_t.astype(jnp.bfloat16) if bf16 else w_gh_t
    dgpre_mm = dgpre.astype(jnp.bfloat16) if bf16 else dgpre
    dh_prev = dh_prev + jnp.dot(dgpre_mm, w_gh_mm,
                                preferred_element_type=jnp.float32)
    return dgpre, dcpre, dh_prev


def _bwd_kernel(*refs, steps: int, bf16_matmul: bool, with_mask: bool):
    it = iter(refs)
    w_g_ref, w_c_ref = next(it), next(it)
    h_ref, gx_ref, cx_ref, g_ref = next(it), next(it), next(it), next(it)
    mask_ref = next(it) if with_mask else None
    dgx_ref, dcx_ref, dwg_ref, dwc_ref = next(it), next(it), next(it), next(it)
    dh_ref = next(it)

    r_id = pl.program_id(0)

    @pl.when(r_id == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dwc_ref[:] = jnp.zeros_like(dwc_ref)

    H = dh_ref.shape[-1]
    w_g, w_c = w_g_ref[:], w_c_ref[:]
    for s in reversed(range(steps)):
        h_prev = h_ref[s]
        h_mm = h_prev.astype(jnp.bfloat16) if bf16_matmul else h_prev
        w_g_mm = w_g.astype(jnp.bfloat16) if bf16_matmul else w_g
        w_c_mm = w_c.astype(jnp.bfloat16) if bf16_matmul else w_c
        value = jax.nn.sigmoid(
            gx_ref[s] + jnp.dot(h_mm, w_g_mm,
                                preferred_element_type=jnp.float32))
        r, u = value[:, :H], value[:, H:]
        rh = r * h_prev
        rh_mm = rh.astype(jnp.bfloat16) if bf16_matmul else rh
        c = jnp.tanh(cx_ref[s] + jnp.dot(rh_mm, w_c_mm,
                                         preferred_element_type=jnp.float32))

        dh_total = g_ref[s] + dh_ref[:]
        dgpre, dcpre, dh_prev = _gru_cell_bwd(dh_total, h_prev, r, u, c,
                                              w_g, w_c, bf16_matmul)
        if mask_ref is not None:
            valid = mask_ref[s]
            dgpre = dgpre * valid
            dcpre = dcpre * valid
            dh_prev = valid * dh_prev + (1.0 - valid) * dh_total
        dgx_ref[s] = dgpre
        dcx_ref[s] = dcpre
        dh_ref[:] = dh_prev
        hp_mm = h_prev.T.astype(jnp.bfloat16) if bf16_matmul else h_prev.T
        dg_mm = dgpre.astype(jnp.bfloat16) if bf16_matmul else dgpre
        dwg_ref[:] += jnp.dot(hp_mm, dg_mm,
                              preferred_element_type=jnp.float32)
        rh_t = rh.T.astype(jnp.bfloat16) if bf16_matmul else rh.T
        dc_mm = dcpre.astype(jnp.bfloat16) if bf16_matmul else dcpre
        dwc_ref[:] += jnp.dot(rh_t, dc_mm,
                              preferred_element_type=jnp.float32)


def _bwd_vmem_bytes(S: int, B: int, H: int) -> int:
    """Blocked (x2 double-buffered): h_prev, gx, cx, g, dgx, dcx (+mask);
    resident: W_gh, W_ch (+~2x for Mosaic's transposed layout copies),
    dW accumulators, dh carry."""
    blocked = S * B * (H + 2 * H + H + H + 2 * H + H + 1)
    resident = 2 * 3 * H * H + 3 * H * H + B * H
    return 4 * (2 * blocked + resident)


def _bwd_seq(w_gh: Array, w_ch: Array, h_seq: Array, gates_x: Array,
             cand_x: Array, g: Array, mask: Array | None,
             bf16_matmul: bool):
    """Fused reverse-time backward. Returns (dgates_x, dcand_x, dw_gh,
    dw_ch), or None when the VMEM estimate doesn't fit (caller falls back
    to the XLA replay)."""
    from e2e_asr_tpu.ops.lstm_pallas import (VMEM_BUDGET_WIDE, _pick_steps,
                                             _wide_params)

    T, B, H = h_seq.shape
    if _bwd_vmem_bytes(1, B, H) > VMEM_BUDGET_WIDE:
        return None
    S, extended = _pick_steps(T, lambda s: (
        _bwd_vmem_bytes(s, B, H) <= VMEM_BUDGET,
        _bwd_vmem_bytes(s, B, H) <= VMEM_BUDGET_WIDE))
    # pad[t] = h_{t-1}; S-1 trailing zero rows make the length S-aligned.
    zrow = jnp.zeros((1, B, H), h_seq.dtype)
    h_pad = jnp.concatenate([zrow, h_seq[:-1]], axis=0)
    if T % S:
        raise AssertionError("_pick_steps returned a non-divisor")
    n_blocks = T // S
    rev = lambda r: (n_blocks - 1 - r, 0, 0)           # noqa: E731
    in_specs = [
        pl.BlockSpec((H, 2 * H), lambda r: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H), lambda r: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, B, H), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, B, 2 * H), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, B, H), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, B, H), rev, memory_space=pltpu.VMEM),
    ]
    args = [w_gh, w_ch, h_pad, gates_x, cand_x, g]
    if mask is not None:
        in_specs.append(pl.BlockSpec((S, B, 1), rev,
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    kernel = functools.partial(_bwd_kernel, steps=S,
                               bf16_matmul=bf16_matmul,
                               with_mask=mask is not None)
    extra = {"compiler_params": _wide_params()} if extended else {}
    dgx, dcx, dwg, dwc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((S, B, 2 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * H), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
        **extra,
    )(*args)
    return dgx, dcx, dwg, dwc


def _replay_scan(gates_x: Array, cand_x: Array, w_gh: Array, w_ch: Array,
                 mask: Array | None) -> Array:
    """Differentiable XLA replay of the kernel math (backward pass)."""
    B = gates_x.shape[1]
    H = cand_x.shape[-1]

    def step(h, xs):
        if mask is None:
            gx, cx = xs
        else:
            gx, cx, m = xs
        value = jax.nn.sigmoid(
            gx + jnp.dot(h, w_gh, preferred_element_type=jnp.float32))
        r, u = value[:, :H], value[:, H:]
        c = jnp.tanh(cx + jnp.dot(r * h, w_ch,
                                  preferred_element_type=jnp.float32))
        new_h = u * h + (1.0 - u) * c
        if mask is not None:
            new_h = m * new_h + (1.0 - m) * h
        return new_h, new_h

    xs = (gates_x, cand_x) if mask is None else (gates_x, cand_x, mask)
    _, out = jax.lax.scan(step, jnp.zeros((B, H)), xs)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_seq(gates_x: Array, cand_x: Array, w_gh: Array, w_ch: Array,
            bf16_matmul: bool = False) -> Array:
    """Fused GRU over time from zero initial state (unmasked — caller masks).

    gates_x: [T,B,2H] = x@W_gx + b_g; cand_x: [T,B,H] = x@W_cx + b_c;
    w_gh: [H,2H]; w_ch: [H,H]. Returns h_seq [T,B,H].
    """
    return _fwd_seq(gates_x, cand_x, w_gh, w_ch, bf16_matmul=bf16_matmul,
                    mask=None)


def _gru_seq_fwd(gates_x, cand_x, w_gh, w_ch, bf16_matmul):
    out = _fwd_seq(gates_x, cand_x, w_gh, w_ch, bf16_matmul=bf16_matmul,
                   mask=None)
    return out, (gates_x, cand_x, w_gh, w_ch, out)


def _gru_seq_bwd(bf16_matmul, res, g):
    gates_x, cand_x, w_gh, w_ch, h_seq = res
    outs = _bwd_seq(w_gh, w_ch, h_seq, gates_x, cand_x, g, None,
                    bf16_matmul)
    if outs is not None:
        return outs
    _, vjp = jax.vjp(lambda gx, cx, wg, wc: _replay_scan(gx, cx, wg, wc, None),
                     gates_x, cand_x, w_gh, w_ch)
    return vjp(g)


gru_seq.defvjp(_gru_seq_fwd, _gru_seq_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_seq_masked(gates_x: Array, cand_x: Array, w_gh: Array, w_ch: Array,
                   mask: Array, bf16_matmul: bool = False) -> Array:
    """Fused GRU with per-step carry-through masking (mask [T,B,1], 1=valid).

    Padded steps leave h unchanged; emitted h at padded steps is the carried
    state, NOT zero — callers mask outside (rnn.rnn_layer does)."""
    return _fwd_seq(gates_x, cand_x, w_gh, w_ch, bf16_matmul=bf16_matmul,
                    mask=mask)


def _gru_seq_masked_fwd(gates_x, cand_x, w_gh, w_ch, mask, bf16_matmul):
    out = _fwd_seq(gates_x, cand_x, w_gh, w_ch, bf16_matmul=bf16_matmul,
                   mask=mask)
    return out, (gates_x, cand_x, w_gh, w_ch, mask, out)


def _gru_seq_masked_bwd(bf16_matmul, res, g):
    gates_x, cand_x, w_gh, w_ch, mask, h_seq = res
    outs = _bwd_seq(w_gh, w_ch, h_seq, gates_x, cand_x, g, mask,
                    bf16_matmul)
    if outs is not None:
        return outs + (jnp.zeros_like(mask),)
    _, vjp = jax.vjp(lambda gx, cx, wg, wc: _replay_scan(gx, cx, wg, wc, mask),
                     gates_x, cand_x, w_gh, w_ch)
    return vjp(g) + (jnp.zeros_like(mask),)


gru_seq_masked.defvjp(_gru_seq_masked_fwd, _gru_seq_masked_bwd)
