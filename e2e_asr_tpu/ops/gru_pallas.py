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


def _fwd_kernel(*refs, steps: int, bf16_matmul: bool, with_mask: bool,
                drop_keep: float | None = None, save_clean: bool = False):
    from e2e_asr_tpu.ops.lstm_pallas import _drop_mask

    it = iter(refs)
    seed_ref = next(it) if drop_keep is not None else None
    gx_ref, cx_ref, w_g_ref, w_c_ref = next(it), next(it), next(it), next(it)
    mask_ref = next(it) if with_mask else None
    out_ref = next(it)
    clean_ref = next(it) if save_clean else None
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
        if drop_keep is not None:
            # In-kernel PRNG output dropout, seeded per ABSOLUTE time step
            # (identical scheme to ops/lstm_pallas: the backward regenerates
            # the same stream; the recurrent h stays un-dropped).
            pltpu.prng_seed(seed_ref[0], t * steps + s)
            out_ref[s] = new_h * _drop_mask(new_h.shape[0], H, drop_keep)
            if clean_ref is not None:
                clean_ref[s] = new_h.astype(clean_ref.dtype)
        else:
            out_ref[s] = new_h
        h_ref[:] = new_h


def _fwd_seq(gates_x: Array, cand_x: Array, w_gh: Array, w_ch: Array, *,
             bf16_matmul: bool, mask: Array | None,
             drop: tuple | None = None, save_clean: bool = False):
    """drop: (seed [1] int32 array, keep float) — in-kernel PRNG output
    dropout. save_clean additionally emits the un-dropped h (the VJP
    residual; bf16 under bf16 compute). Returns out or (out, clean)."""
    from e2e_asr_tpu.ops.lstm_pallas import (VMEM_BUDGET_WIDE, _interp_mode,
                                             _pick_steps, _wide_params)

    T, B, H2 = gates_x.shape
    H = H2 // 2
    wbytes = 2 if bf16_matmul else 4

    def _extra_bytes(s):
        # Double-buffered clean-h residual output (training forward only).
        if not save_clean:
            return 0
        return 2 * s * B * H * (2 if bf16_matmul else 4)

    S, extended = _pick_steps(T, lambda s: (
        _fwd_vmem_bytes(s, B, H) + _extra_bytes(s) <= VMEM_BUDGET,
        (_fwd_wide_vmem_bytes(s, B, H, wbytes) + _extra_bytes(s)
         <= VMEM_BUDGET_WIDE)))
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
    if drop is not None:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, drop[0])
    if mask is not None:
        in_specs.append(pl.BlockSpec((S, B, 1), lambda t: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    out_specs = [pl.BlockSpec((S, B, H), lambda t: (t, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]
    if save_clean:
        res_dtype = jnp.bfloat16 if bf16_matmul else jnp.float32
        out_specs.append(pl.BlockSpec((S, B, H), lambda t: (t, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, B, H), res_dtype))
    kernel = functools.partial(_fwd_kernel, steps=S, bf16_matmul=bf16_matmul,
                               with_mask=mask is not None,
                               drop_keep=None if drop is None else drop[1],
                               save_clean=save_clean)
    extra = {"compiler_params": _wide_params()} if extended else {}
    outs = pl.pallas_call(
        kernel,
        grid=(T // S,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret() if drop is None else _interp_mode(),
        **extra,
    )(*args)
    return tuple(outs) if save_clean else outs[0]


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


def _bwd_kernel(*refs, steps: int, bf16_matmul: bool, with_mask: bool,
                drop_keep: float | None = None, n_blocks: int = 0):
    from e2e_asr_tpu.ops.lstm_pallas import _drop_mask

    it = iter(refs)
    seed_ref = next(it) if drop_keep is not None else None
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
        # h may be the bf16 clean residual (dropout training forward) —
        # cast back for the VPU math; the matmuls cast to bf16 themselves.
        h_prev = h_ref[s].astype(jnp.float32)
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

        g_s = g_ref[s]
        if seed_ref is not None:
            # Regenerate the forward's per-step mask (out = h * m, so
            # dL/dh = g * m + the recurrent contribution). Absolute step of
            # local s in block r_id: blocks are visited in reverse order.
            pltpu.prng_seed(seed_ref[0], (n_blocks - 1 - r_id) * steps + s)
            g_s = g_s * _drop_mask(g_s.shape[0], H, drop_keep)
        dh_total = g_s + dh_ref[:]
        dgpre, dcpre, dh_prev = _gru_cell_bwd(dh_total, h_prev, r, u, c,
                                              w_g, w_c, bf16_matmul)
        if mask_ref is not None:
            valid = mask_ref[s]
            dgpre = dgpre * valid
            dcpre = dcpre * valid
            dh_prev = valid * dh_prev + (1.0 - valid) * dh_total
        dgx_ref[s] = dgpre.astype(dgx_ref.dtype)
        dcx_ref[s] = dcpre.astype(dcx_ref.dtype)
        dh_ref[:] = dh_prev
        hp_mm = h_prev.T.astype(jnp.bfloat16) if bf16_matmul else h_prev.T
        dg_mm = dgpre.astype(jnp.bfloat16) if bf16_matmul else dgpre
        dwg_ref[:] += jnp.dot(hp_mm, dg_mm,
                              preferred_element_type=jnp.float32)
        rh_t = rh.T.astype(jnp.bfloat16) if bf16_matmul else rh.T
        dc_mm = dcpre.astype(jnp.bfloat16) if bf16_matmul else dcpre
        dwc_ref[:] += jnp.dot(rh_t, dc_mm,
                              preferred_element_type=jnp.float32)


def _bwd_vmem_bytes(S: int, B: int, H: int, drop_B: int = 0) -> int:
    """Blocked (x2 double-buffered): h_prev, gx, cx, g, dgx, dcx (+mask);
    resident: W_gh, W_ch (+~2x for Mosaic's transposed layout copies),
    dW accumulators, dh carry (+the transient dropout mask when drop_B)."""
    blocked = S * B * (H + 2 * H + H + H + 2 * H + H + 1)
    resident = 2 * 3 * H * H + 3 * H * H + B * H + drop_B * H
    return 4 * (2 * blocked + resident)


def kernel_dropout_ok(T: int, B: int, H: int, bf16: bool = False) -> bool:
    """Whether the GRU layer can take in-kernel PRNG output dropout: real
    TPU backend only (same rationale as lstm_pallas.kernel_dropout_ok —
    off-TPU the emulation breaks the SPMD partitioner and yields all-keep
    masks) and BOTH directions' Pallas kernels must fit INCLUDING the
    training forward's extra clean-h residual output (the XLA replay
    fallback cannot regenerate the core PRNG's mask stream)."""
    from e2e_asr_tpu.ops.lstm_pallas import VMEM_BUDGET_WIDE
    if jax.default_backend() != "tpu":
        return False
    wbytes = 2 if bf16 else 4
    extra = 2 * 1 * B * H * (2 if bf16 else 4)   # clean residual, S=1
    fwd_ok = (_fwd_vmem_bytes(1, B, H) + extra <= VMEM_BUDGET
              or (_fwd_wide_vmem_bytes(1, B, H, wbytes) + extra
                  <= VMEM_BUDGET_WIDE))
    return fwd_ok and _bwd_vmem_bytes(1, B, H, drop_B=B) <= VMEM_BUDGET_WIDE


def _bwd_seq(w_gh: Array, w_ch: Array, h_seq: Array, gates_x: Array,
             cand_x: Array, g: Array, mask: Array | None,
             bf16_matmul: bool, drop: tuple | None = None):
    """Fused reverse-time backward. Returns (dgates_x, dcand_x, dw_gh,
    dw_ch), or None when the VMEM estimate doesn't fit (caller falls back
    to the XLA replay). drop: (seed [1] int32, keep) — regenerate the
    forward's dropout masks; requires the Pallas path (gate callers with
    kernel_dropout_ok)."""
    from e2e_asr_tpu.ops.lstm_pallas import (VMEM_BUDGET_WIDE, _interp_mode,
                                             _pick_steps, _wide_params)

    T, B, H = h_seq.shape
    drop_B = B if drop is not None else 0
    if _bwd_vmem_bytes(1, B, H, drop_B) > VMEM_BUDGET_WIDE:
        if drop is not None:
            raise RuntimeError(
                "in-kernel dropout requires the Pallas backward; gate "
                "callers with kernel_dropout_ok()")
        return None
    S, extended = _pick_steps(T, lambda s: (
        _bwd_vmem_bytes(s, B, H, drop_B) <= VMEM_BUDGET,
        _bwd_vmem_bytes(s, B, H, drop_B) <= VMEM_BUDGET_WIDE))
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
    if drop is not None:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, drop[0])
    if mask is not None:
        in_specs.append(pl.BlockSpec((S, B, 1), rev,
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    kernel = functools.partial(_bwd_kernel, steps=S,
                               bf16_matmul=bf16_matmul,
                               with_mask=mask is not None,
                               drop_keep=None if drop is None else drop[1],
                               n_blocks=n_blocks)
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
            # dgx/dcx are the gates_x/cand_x cotangents: emit in the
            # primal's dtype directly (bf16 under bf16 storage) — no
            # external cast pass (same as lstm_pallas dx).
            jax.ShapeDtypeStruct((T, B, 2 * H), gates_x.dtype),
            jax.ShapeDtypeStruct((T, B, H), cand_x.dtype),
            jax.ShapeDtypeStruct((H, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret() if drop is None else _interp_mode(),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gru_seq(gates_x: Array, cand_x: Array, w_gh: Array, w_ch: Array,
            drop_seed: Array | None = None, bf16_matmul: bool = False,
            drop_keep: float = 1.0) -> Array:
    """Fused GRU over time from zero initial state (unmasked — caller masks).

    gates_x: [T,B,2H] = x@W_gx + b_g; cand_x: [T,B,H] = x@W_cx + b_c;
    w_gh: [H,2H]; w_ch: [H,H]. Returns h_seq [T,B,H].

    drop_seed [1] int32 + drop_keep < 1: in-kernel PRNG output dropout,
    seeded per absolute time step and regenerated bit-identically in the
    backward (ops/lstm_pallas scheme). The recurrent h stays un-dropped.
    Gate with kernel_dropout_ok()."""
    use_drop = drop_keep < 1.0
    out = _fwd_seq(gates_x, cand_x, w_gh, w_ch, bf16_matmul=bf16_matmul,
                   mask=None,
                   drop=(drop_seed, drop_keep) if use_drop else None)
    return out


def _gru_seq_fwd(gates_x, cand_x, w_gh, w_ch, drop_seed, bf16_matmul,
                 drop_keep):
    use_drop = drop_keep < 1.0
    if use_drop:
        out, clean = _fwd_seq(gates_x, cand_x, w_gh, w_ch,
                              bf16_matmul=bf16_matmul, mask=None,
                              drop=(drop_seed, drop_keep), save_clean=True)
    else:
        out = _fwd_seq(gates_x, cand_x, w_gh, w_ch,
                       bf16_matmul=bf16_matmul, mask=None)
        clean = out
    return out, (gates_x, cand_x, w_gh, w_ch, drop_seed, clean)


def _gru_seq_bwd(bf16_matmul, drop_keep, res, g):
    gates_x, cand_x, w_gh, w_ch, drop_seed, h_seq = res
    use_drop = drop_keep < 1.0
    d_seed = None if drop_seed is None else jnp.zeros_like(drop_seed)
    outs = _bwd_seq(w_gh, w_ch, h_seq, gates_x, cand_x, g, None,
                    bf16_matmul,
                    drop=(drop_seed, drop_keep) if use_drop else None)
    if outs is not None:
        return outs + (d_seed,)
    _, vjp = jax.vjp(lambda gx, cx, wg, wc: _replay_scan(gx, cx, wg, wc, None),
                     gates_x, cand_x, w_gh, w_ch)
    return vjp(g) + (d_seed,)


gru_seq.defvjp(_gru_seq_fwd, _gru_seq_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def gru_seq_masked(gates_x: Array, cand_x: Array, w_gh: Array, w_ch: Array,
                   mask: Array, drop_seed: Array | None = None,
                   bf16_matmul: bool = False,
                   drop_keep: float = 1.0) -> Array:
    """Fused GRU with per-step carry-through masking (mask [T,B,1], 1=valid).

    Padded steps leave h unchanged; emitted h at padded steps is the carried
    state, NOT zero — callers mask outside (rnn.rnn_layer does).
    drop_seed/drop_keep: see gru_seq."""
    use_drop = drop_keep < 1.0
    return _fwd_seq(gates_x, cand_x, w_gh, w_ch, bf16_matmul=bf16_matmul,
                    mask=mask,
                    drop=(drop_seed, drop_keep) if use_drop else None)


def _gru_seq_masked_fwd(gates_x, cand_x, w_gh, w_ch, mask, drop_seed,
                        bf16_matmul, drop_keep):
    use_drop = drop_keep < 1.0
    if use_drop:
        out, clean = _fwd_seq(gates_x, cand_x, w_gh, w_ch,
                              bf16_matmul=bf16_matmul, mask=mask,
                              drop=(drop_seed, drop_keep), save_clean=True)
    else:
        out = _fwd_seq(gates_x, cand_x, w_gh, w_ch,
                       bf16_matmul=bf16_matmul, mask=mask)
        clean = out
    return out, (gates_x, cand_x, w_gh, w_ch, mask, drop_seed, clean)


def _gru_seq_masked_bwd(bf16_matmul, drop_keep, res, g):
    gates_x, cand_x, w_gh, w_ch, mask, drop_seed, h_seq = res
    use_drop = drop_keep < 1.0
    d_seed = None if drop_seed is None else jnp.zeros_like(drop_seed)
    outs = _bwd_seq(w_gh, w_ch, h_seq, gates_x, cand_x, g, mask,
                    bf16_matmul,
                    drop=(drop_seed, drop_keep) if use_drop else None)
    if outs is not None:
        return outs + (jnp.zeros_like(mask), d_seed)
    _, vjp = jax.vjp(lambda gx, cx, wg, wc: _replay_scan(gx, cx, wg, wc, mask),
                     gates_x, cand_x, w_gh, w_ch)
    return vjp(g) + (jnp.zeros_like(mask), d_seed)


gru_seq_masked.defvjp(_gru_seq_masked_fwd, _gru_seq_masked_bwd)
