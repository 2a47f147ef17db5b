"""Pallas TPU kernel: fused LSTM sequence (the encoder/LM hot loop).

One kernel runs the whole time dimension: the TPU Pallas grid is sequential,
so the recurrent (c, h) state lives in VMEM scratch across grid steps and the
per-step work is a single [B,H]x[H,4H] MXU matmul plus fused VPU gate math —
no per-step XLA dispatch, weights pinned in VMEM for the whole sequence.

The input projection x@W_x + b for all timesteps is done OUTSIDE the kernel
as one large MXU matmul (see core/cells.lstm_precompute_inputs).

Gate semantics match the pinned reference exactly (basic_lstm.py:14-23):
split order i,j,f,o and forget bias +1.0.

Training uses a custom VJP whose backward pass is the mirrored reverse-time
Pallas kernel, recomputing gates from saved (c_prev, h_prev) checkpoints.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU tests exercise the same kernel code)."""
    return jax.default_backend() != "tpu"


def _fwd_kernel(x_proj_ref, w_h_ref, out_ref, c_ref, h_ref, *,
                save_c: bool = False, c_out_ref=None, bf16_matmul: bool = False,
                mask_ref=None):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        c_ref[:] = jnp.zeros_like(c_ref)
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    w = w_h_ref[:]
    if bf16_matmul:
        h, w = h.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    gates = x_proj_ref[0] + jnp.dot(h, w, preferred_element_type=jnp.float32)
    H = h_ref.shape[-1]
    i, j, f, o = (gates[:, :H], gates[:, H:2 * H], gates[:, 2 * H:3 * H],
                  gates[:, 3 * H:])
    c = c_ref[:]
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    if mask_ref is not None:
        # Carry-through on padded steps (valid=0): state unchanged. The
        # emitted sequence is the carried h; callers zero padded positions
        # outside (cheap elementwise), keeping the VJP a pure pass-through.
        valid = mask_ref[0]
        new_c = valid * new_c + (1.0 - valid) * c
        new_h = valid * new_h + (1.0 - valid) * h_ref[:]
    out_ref[0] = new_h
    c_ref[:] = new_c
    h_ref[:] = new_h
    if save_c:
        c_out_ref[0] = new_c


def _fwd_seq(x_proj: Array, w_h: Array, *, save_c: bool,
             bf16_matmul: bool = False, mask: Array | None = None) -> tuple:
    """x_proj: [T, B, 4H] f32 (input projection + bias); w_h: [H, 4H];
    mask: optional [T, B, 1] f32 validity (carry-through on zeros).

    Returns h_seq [T, B, H] (and c_seq when save_c)."""
    T, B, H4 = x_proj.shape
    H = H4 // 4
    out_shapes = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]
    out_specs = [pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                              memory_space=pltpu.VMEM)]
    if save_c:
        out_shapes.append(jax.ShapeDtypeStruct((T, B, H), jnp.float32))
        out_specs.append(pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                                      memory_space=pltpu.VMEM))
    kernel = functools.partial(_seq_kernel_dispatch, save_c=save_c,
                               bf16_matmul=bf16_matmul,
                               with_mask=mask is not None)
    in_specs = [
        pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x_proj, w_h]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),   # c carry
            pltpu.VMEM((B, H), jnp.float32),   # h carry
        ],
        interpret=_interpret(),
    )(*args)
    return tuple(outs)


def _seq_kernel_dispatch(x_proj_ref, w_h_ref, *refs, save_c: bool,
                         bf16_matmul: bool = False, with_mask: bool = False):
    mask_ref = None
    if with_mask:
        mask_ref, refs = refs[0], refs[1:]
    if save_c:
        out_ref, c_out_ref, c_ref, h_ref = refs
        _fwd_kernel(x_proj_ref, w_h_ref, out_ref, c_ref, h_ref,
                    save_c=True, c_out_ref=c_out_ref, bf16_matmul=bf16_matmul,
                    mask_ref=mask_ref)
    else:
        out_ref, c_ref, h_ref = refs
        _fwd_kernel(x_proj_ref, w_h_ref, out_ref, c_ref, h_ref,
                    bf16_matmul=bf16_matmul, mask_ref=mask_ref)


def _bwd_kernel(w_h_ref, h_prev_ref, c_prev_ref, c_t_ref, x_proj_ref, g_ref,
                dx_ref, dwh_acc_ref, dc_ref, dh_ref, *,
                bf16_matmul: bool = False, mask_ref=None):
    """Reverse-time step: recompute gates, backprop through the cell.

    Grid step r walks t = T-1-r. Carries dc/dh in scratch; accumulates dW_h.
    With a mask, padded steps are identity (state carry-through): gradients
    pass straight through and contribute nothing to dW_h / dx.
    """
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _init():
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dwh_acc_ref[:] = jnp.zeros_like(dwh_acc_ref)

    H = dh_ref.shape[-1]
    # Previous-step states (zeros at t=0), via index-mapped blocks of the
    # zero-padded state sequences.
    h_prev = h_prev_ref[0]
    c_prev = c_prev_ref[0]
    c_t = c_t_ref[0]

    w = w_h_ref[:]
    h_prev_mm = h_prev
    if bf16_matmul:
        w, h_prev_mm = w.astype(jnp.bfloat16), h_prev.astype(jnp.bfloat16)
    gates = x_proj_ref[0] + jnp.dot(h_prev_mm, w,
                                    preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :H])
    j = jnp.tanh(gates[:, H:2 * H])
    f = jax.nn.sigmoid(gates[:, 2 * H:3 * H] + 1.0)
    o = jax.nn.sigmoid(gates[:, 3 * H:])

    valid = mask_ref[0] if mask_ref is not None else None
    g_t = g_ref[0] if valid is None else g_ref[0] * valid

    tanh_c = jnp.tanh(c_t)
    dh_total = g_t + dh_ref[:]
    do = dh_total * tanh_c * o * (1.0 - o)
    dc_total = dh_total * o * (1.0 - tanh_c * tanh_c) + dc_ref[:]
    df = dc_total * c_prev * f * (1.0 - f)
    di = dc_total * j * i * (1.0 - i)
    dj = dc_total * i * (1.0 - j * j)

    dgates = jnp.concatenate([di, dj, df, do], axis=-1)     # [B, 4H]
    if valid is not None:
        dgates = dgates * valid
    dx_ref[0] = dgates
    dgates_mm = dgates.astype(jnp.bfloat16) if bf16_matmul else dgates
    # dh_{t-1} = dgates @ W_h^T ; dW_h += h_{t-1}^T @ dgates
    dh_new = jnp.dot(dgates_mm, w.T, preferred_element_type=jnp.float32)
    dc_new = dc_total * f
    if valid is not None:
        dh_new = valid * dh_new + (1.0 - valid) * dh_total
        dc_new = valid * dc_new + (1.0 - valid) * dc_ref[:]
    dh_ref[:] = dh_new
    dc_ref[:] = dc_new
    dwh_acc_ref[:] += jnp.dot(h_prev_mm.T, dgates_mm,
                              preferred_element_type=jnp.float32)


def _bwd_seq(w_h: Array, h_seq: Array, c_seq: Array, x_proj: Array,
             g: Array, *, bf16_matmul: bool = False,
             mask: Array | None = None) -> tuple[Array, Array]:
    """Returns (dx_proj [T,B,4H], dw_h [H,4H])."""
    T, B, H = h_seq.shape
    H4 = 4 * H
    # Shift state sequences so the kernel sees h_{t-1}/c_{t-1} and c_t:
    # padded[t] = state_{t-1}, padded[t+1] = state_t.
    h_pad = jnp.concatenate([jnp.zeros((1, B, H), h_seq.dtype), h_seq], axis=0)
    c_pad = jnp.concatenate([jnp.zeros((1, B, H), c_seq.dtype), c_seq], axis=0)

    rev = lambda r: (T - 1 - r, 0, 0)          # noqa: E731 — t = T-1-r
    rev_next = lambda r: (T - r, 0, 0)         # noqa: E731 — t+1 in padded seq
    in_specs = [
        pl.BlockSpec((H, H4), lambda r: (0, 0), memory_space=pltpu.VMEM),
        # h_{t-1} = h_pad[t]
        pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
        # c_{t-1} = c_pad[t]
        pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
        # c_t = c_pad[t+1]
        pl.BlockSpec((1, B, H), rev_next, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, H4), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
    ]
    args = [w_h, h_pad, c_pad, c_pad, x_proj, g]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, B, 1), lambda r: (T - 1 - r, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    dx, dwh = pl.pallas_call(
        functools.partial(_bwd_kernel_dispatch, bf16_matmul=bf16_matmul,
                          with_mask=mask is not None),
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),   # dc carry
            pltpu.VMEM((B, H), jnp.float32),   # dh carry
        ],
        interpret=_interpret(),
    )(*args)
    return dx, dwh


def _bwd_kernel_dispatch(w_h_ref, h_prev_ref, c_prev_ref, c_t_ref, x_proj_ref,
                         g_ref, *refs, bf16_matmul: bool, with_mask: bool):
    mask_ref = None
    if with_mask:
        mask_ref, refs = refs[0], refs[1:]
    dx_ref, dwh_acc_ref, dc_ref, dh_ref = refs
    _bwd_kernel(w_h_ref, h_prev_ref, c_prev_ref, c_t_ref, x_proj_ref, g_ref,
                dx_ref, dwh_acc_ref, dc_ref, dh_ref,
                bf16_matmul=bf16_matmul, mask_ref=mask_ref)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_seq(x_proj: Array, w_h: Array, bf16_matmul: bool = False) -> Array:
    """Fused LSTM over time. x_proj: [T,B,4H] = x@W_x + b; w_h: [H,4H].

    Returns h_seq [T,B,H] from zero initial state (unmasked — caller masks).
    bf16_matmul runs the recurrent matmul on the MXU in bfloat16 (gates and
    states stay f32); the backward pass stays f32.
    """
    (h_seq,) = _fwd_seq(x_proj, w_h, save_c=False, bf16_matmul=bf16_matmul)
    return h_seq


def _lstm_seq_fwd(x_proj, w_h, bf16_matmul):
    h_seq, c_seq = _fwd_seq(x_proj, w_h, save_c=True, bf16_matmul=bf16_matmul)
    return h_seq, (x_proj, w_h, h_seq, c_seq)


def _lstm_seq_bwd(bf16_matmul, res, g):
    x_proj, w_h, h_seq, c_seq = res
    dx, dwh = _bwd_seq(w_h, h_seq, c_seq, x_proj, g, bf16_matmul=bf16_matmul)
    return dx, dwh


lstm_seq.defvjp(_lstm_seq_fwd, _lstm_seq_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_seq_masked(x_proj: Array, w_h: Array, mask: Array,
                    bf16_matmul: bool = False) -> Array:
    """Fused LSTM with per-step carry-through masking.

    mask: [T, B, 1] f32 (1=valid frame, 0=padding): padded steps leave (c, h)
    unchanged. Used for the backward direction of bidirectional layers, where
    inputs are simply time-flipped (padding leads) instead of gathered with
    reverse_sequence — the flip is ~5x cheaper on TPU than the gather.

    The emitted h at padded steps is the carried state, NOT zero — callers
    multiply by the mask afterwards (rnn.rnn_layer does).
    """
    (h_seq,) = _fwd_seq(x_proj, w_h, save_c=False, bf16_matmul=bf16_matmul,
                        mask=mask)
    return h_seq


def _lstm_seq_masked_fwd(x_proj, w_h, mask, bf16_matmul):
    h_seq, c_seq = _fwd_seq(x_proj, w_h, save_c=True, bf16_matmul=bf16_matmul,
                            mask=mask)
    return h_seq, (x_proj, w_h, mask, h_seq, c_seq)


def _lstm_seq_masked_bwd(bf16_matmul, res, g):
    x_proj, w_h, mask, h_seq, c_seq = res
    dx, dwh = _bwd_seq(w_h, h_seq, c_seq, x_proj, g,
                       bf16_matmul=bf16_matmul, mask=mask)
    return dx, dwh, jnp.zeros_like(mask)


lstm_seq_masked.defvjp(_lstm_seq_masked_fwd, _lstm_seq_masked_bwd)
