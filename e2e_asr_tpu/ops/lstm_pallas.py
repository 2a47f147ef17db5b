"""Pallas TPU kernel: fused LSTM sequence (the encoder/LM hot loop).

One kernel runs the whole time dimension: the TPU Pallas grid is sequential,
so the recurrent (c, h) state lives in VMEM scratch across grid steps and the
per-step work is a single [B,H]x[H,4H] MXU matmul plus fused VPU gate math —
no per-step XLA dispatch, weights pinned in VMEM for the whole sequence.
When T is even, each grid iteration processes TWO time steps (measured ~18%
faster: fewer grid iterations, better DMA pipelining).

The input projection x@W_x + b for all timesteps is done OUTSIDE the kernel
as one large MXU matmul (see core/cells.lstm_precompute_inputs).

Gate semantics match the pinned reference exactly (basic_lstm.py:14-23):
split order i,j,f,o and forget bias +1.0.

Training uses a custom VJP whose backward pass is the mirrored reverse-time
Pallas kernel, recomputing gates from saved (c_prev, h_prev) checkpoints.

The optional carry-through mask ([T, B, 1], 1=valid) leaves (c, h) unchanged
on padded steps. It exists so the *backward direction* of a bidirectional
layer can run on time-flipped inputs (padding leading) instead of
reverse_sequence gathers — jnp.flip is ~5x cheaper on TPU. The emitted h at
padded steps is the carried state, NOT zero; callers mask outside.
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


VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the ~16MB scoped limit

# Wide layers: TPU v4/v5e cores have 128MB of physical VMEM; Mosaic's 16MB
# scoped limit is only a compiler default. When a config exceeds the default
# budget we request a raised limit (VMEM_LIMIT_WIDE) via CompilerParams and
# admit configs whose ESTIMATED usage fits VMEM_BUDGET_WIDE — the estimates
# undercount Mosaic's real allocation (layout copies, multi-buffering) by up
# to ~1.7x observed, hence the >2x margin between the budget and the limit.
VMEM_BUDGET_WIDE = 48 * 1024 * 1024
VMEM_LIMIT_WIDE = 112 * 1024 * 1024


def _wide_params() -> "pltpu.CompilerParams":
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_WIDE)


def _steps_per_block(T: int) -> int:
    return 2 if T % 2 == 0 else 1


# Candidate steps-per-grid-block, largest first. S in {4, 8} was probed on
# v5e (best-of-3x30 at the flagship bidir shape): fwd 2.49/2.48 ms vs
# 2.20 ms at S=2, grad 6.38 vs 6.11 — larger blocks LOSE (and S=4 sits on
# the 16MB boundary where Mosaic's allocator OOMs nondeterministically), so
# the list stays (2, 1). The machinery below is S-generic for future tuning.
STEP_BLOCKS = (2, 1)


def _pick_steps(T: int, fits) -> tuple[int, bool]:
    """Largest steps-per-block S dividing T whose blocks fit VMEM, allowing
    the raised wide-tier limit when the default budget fails.
    fits(S) -> (default_ok, wide_ok). Returns (S, extended)."""
    for S in STEP_BLOCKS:
        if T % S:
            continue
        default_ok, wide_ok = fits(S)
        if default_ok:
            return S, False
        if wide_ok:
            return S, True
    return 1, False


def _bwd_vmem_bytes(S: int, B: int, H: int, drop_B: int = 0) -> int:
    """Rough VMEM estimate for the backward kernel: double-buffered blocked
    refs (x_proj, g, three state rows, dx) + resident weights/accumulator/
    scratch. Used to fall back to an XLA backward when a wide model would
    blow the scoped-vmem limit (observed at H=512, B=128, S=2).

    drop_B: with in-kernel dropout the kernel materializes a transient
    FULL-batch [drop_B, H] f32 mask per step even inside batch-chunked
    grids (the PRNG stream is seeded per absolute step over the full
    batch) — pass the full B so chunked configs account for it."""
    blocked = S * B * (4 * H + H + H + H + H + 4 * H)   # 12*S*B*H floats
    resident = 8 * H * H + 2 * B * H + drop_B * H
    return 4 * (2 * blocked + resident)


def _bwd_fits(S: int, B: int, H: int) -> bool:
    return _bwd_vmem_bytes(S, B, H) <= VMEM_BUDGET


def _bwd_nodw_vmem_bytes(S: int, B: int, H: int, wbytes: int,
                         drop_B: int = 0) -> int:
    """VMEM estimate for the wide-layer backward variant: same blocked refs,
    but W held ONCE in scratch (DMA'd from HBM at the first grid step; a
    VMEM-blocked W would be double-buffered by Mosaic — 2x8.4MB at H=1024
    bf16, observed OOM) and NO in-kernel dW accumulator (the [H,4H] f32
    accumulator is what blows VMEM at H>=1024 — dW is instead one big
    external MXU matmul over the emitted dgates). drop_B: the full-batch
    dropout-mask transient, same as _bwd_vmem_bytes."""
    blocked = S * B * (4 * H + H + H + H + H + 4 * H)   # 12*S*B*H floats
    return (4 * 2 * blocked + wbytes * 4 * H * H + 4 * 2 * B * H
            + 4 * drop_B * H)


def _bwd_nodw_fits(S: int, B: int, H: int, wbytes: int,
                   drop_B: int = 0) -> bool:
    return _bwd_nodw_vmem_bytes(S, B, H, wbytes, drop_B) <= VMEM_BUDGET_WIDE


def _fwd_vmem_bytes(S: int, B: int, H: int) -> int:
    blocked = S * B * (4 * H + 2 * H)                   # x_proj + out + c_out
    resident = 4 * H * H + 2 * B * H
    return 4 * (2 * blocked + resident)


def _weights_resident_fits(S: int, B: int, H: int) -> bool:
    return _fwd_vmem_bytes(S, B, H) <= VMEM_BUDGET


def _chunk_size(H: int, B: int, bf16: bool) -> int | None:
    """Pick the hidden-chunk size C for the weight-streaming forward kernel:
    double-buffered [C, 4H] weight tiles + blocked activations must fit."""
    wbytes = 2 if bf16 else 4
    for C in (512, 256, 128, 64, 32, 16, 8):
        if H % C:
            continue
        blocked = 2 * 4 * (1 * B * 6 * H)               # x_proj/out/c_out, S=1
        w_tiles = 2 * C * 4 * H * wbytes
        scratch = 4 * 2 * B * H
        if blocked + w_tiles + scratch <= VMEM_BUDGET:
            return C
    return None


def _fwd_wide_vmem_bytes(S: int, B: int, H: int, wbytes: int) -> int:
    """Wide-tier forward estimate: blocked activations double-buffered, W
    resident but double-buffered by Mosaic (2 copies), carries in scratch."""
    blocked = S * B * 6 * H                             # x_proj + out + c_out
    return 4 * 2 * blocked + 2 * wbytes * 4 * H * H + 4 * 2 * B * H


def _train_fwd_extra_bytes(S: int, B: int, H: int, bf16: bool,
                           drop: bool, save_acts: bool) -> int:
    """Blocked-output bytes the TRAINING forward adds per direction on top
    of the (x_proj + out + c_out) base the estimators above count: the
    clean-h residual pair exists only with in-kernel dropout, the bf16
    activated-gates pair only under E2E_ASR_SAVE_GATES. Double-buffered by
    Mosaic like every blocked ref. The c residual is counted at 4 bytes in
    the base even when stored bf16 — the overcount stays as margin
    (CLAUDE.md: fit estimates undercount Mosaic's real allocation)."""
    extra = 0
    if drop:
        extra += S * B * H * (2 if bf16 else 4)         # clean h residual
    if save_acts:
        extra += S * B * 4 * H * 2                      # bf16 gates
    return 2 * extra


def fwd_fits(T: int, B: int, H: int, bf16: bool = False) -> bool:
    """Whether SOME forward kernel variant fits VMEM (weights-resident under
    the default or raised limit, or the weight-streaming chunked variant for
    very wide layers); used by core/rnn.py to fall back to the XLA scan
    otherwise."""
    wbytes = 2 if bf16 else 4
    return (_weights_resident_fits(1, B, H)
            or _fwd_wide_vmem_bytes(1, B, H, wbytes) <= VMEM_BUDGET_WIDE
            or _chunk_size(H, B, bf16) is not None)


def _drop_mask(B: int, H: int, keep: float) -> Array:
    """[B, H] inverted-dropout multiplier (1/keep or 0) from the core PRNG.

    The caller must pltpu.prng_seed(...) with the absolute time step first;
    fwd and bwd kernels then regenerate IDENTICAL masks from the same seed —
    no mask tensor ever touches HBM (the whole point: the XLA-side dropout
    was a ~1.2 ms/step extra HBM pass over [T,B,2H] per layer).

    Note: Pallas CPU interpret mode implements prng_random_bits as zeros, so
    off-TPU the mask degenerates to all-keep (x 1/keep). Replay consistency
    (fwd mask == bwd mask) still holds there; distribution is pinned by the
    TPU-only test (tests/test_lstm_dropout.py)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits((B, H)), jnp.int32)
    # Low 24 uniform bits -> [0, 1) float (Mosaic has no uint32->f32 cast).
    u = (bits & 0x00FFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.where(u < keep, 1.0 / keep, 0.0)


def _interp_mode():
    """interpret= value: the dropout kernels need TPU-interpret mode off-TPU
    (plain interpret has no prng lowering)."""
    if not _interpret():
        return False
    return pltpu.InterpretParams()


def _cell_math(gates: Array, c: Array, H: int) -> tuple[Array, Array]:
    i, j, f, o = (gates[:, :H], gates[:, H:2 * H], gates[:, 2 * H:3 * H],
                  gates[:, 3 * H:])
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_c, new_h


def _cell_math_acts(gates: Array, c: Array, H: int
                    ) -> tuple[Array, Array, Array]:
    """_cell_math variant that also returns the ACTIVATED gates [B, 4H] (i, tanh j, sigmoid(f+1), o) for the save-gates backward."""
    i = jax.nn.sigmoid(gates[:, :H])
    j = jnp.tanh(gates[:, H:2 * H])
    f = jax.nn.sigmoid(gates[:, 2 * H:3 * H] + 1.0)
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    new_c = c * f + i * j
    new_h = o * jnp.tanh(new_c)
    return new_c, new_h, jnp.concatenate([i, j, f, o], axis=-1)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, steps: int, save_c: bool, bf16_matmul: bool,
                with_mask: bool, drop_keep: float | None = None):
    it = iter(refs)
    seed_ref = next(it) if drop_keep is not None else None
    x_proj_ref, w_h_ref = next(it), next(it)
    mask_ref = next(it) if with_mask else None
    out_ref = next(it)
    # With dropout + save_c the clean (un-dropped) h is the VJP residual —
    # the dropped out feeds the next layer (see _fwd_bidir_kernel).
    clean_ref = next(it) if (save_c and drop_keep is not None) else None
    c_out_ref = next(it) if save_c else None
    c_ref, h_ref = next(it), next(it)

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        c_ref[:] = jnp.zeros_like(c_ref)
        h_ref[:] = jnp.zeros_like(h_ref)

    H = h_ref.shape[-1]
    for s in range(steps):
        h = h_ref[:]
        w = w_h_ref[:]
        if bf16_matmul:
            h, w = h.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        gates = x_proj_ref[s] + jnp.dot(h, w,
                                        preferred_element_type=jnp.float32)
        new_c, new_h = _cell_math(gates, c_ref[:], H)
        if mask_ref is not None:
            valid = mask_ref[s]
            new_c = valid * new_c + (1.0 - valid) * c_ref[:]
            new_h = valid * new_h + (1.0 - valid) * h_ref[:]
        if drop_keep is not None:
            pltpu.prng_seed(seed_ref[0], t * steps + s)
            out_ref[s] = new_h * _drop_mask(new_h.shape[0], H, drop_keep)
            if clean_ref is not None:
                clean_ref[s] = new_h.astype(clean_ref.dtype)
        else:
            out_ref[s] = new_h
        c_ref[:] = new_c
        h_ref[:] = new_h
        if save_c:
            c_out_ref[s] = new_c.astype(c_out_ref.dtype)


def _fwd_kernel_chunked(*refs, n_chunks: int, C: int, save_c: bool,
                        bf16_matmul: bool, with_mask: bool):
    """Weight-streaming forward step: W_h lives in HBM and is DMA'd in
    [C, 4H] tiles, double-buffered against the chunked gate matmuls (the
    pallas_guide double-buffering pattern). One timestep per grid step —
    the chunk loop provides the per-iteration work."""
    it = iter(refs)
    x_ref, w_ref = next(it), next(it)
    mask_ref = next(it) if with_mask else None
    out_ref = next(it)
    c_out_ref = next(it) if save_c else None
    c_ref, h_ref, w_buf, sem = next(it), next(it), next(it), next(it)

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        c_ref[:] = jnp.zeros_like(c_ref)
        h_ref[:] = jnp.zeros_like(h_ref)

    H = h_ref.shape[-1]

    def dma(k):
        return pltpu.make_async_copy(
            w_ref.at[pl.ds(k * C, C), :], w_buf.at[k % 2], sem.at[k % 2])

    dma(0).start()
    gates = x_ref[0]
    h = h_ref[:]
    h_mm = h.astype(jnp.bfloat16) if bf16_matmul else h
    for k in range(n_chunks):
        if k + 1 < n_chunks:
            dma(k + 1).start()
        dma(k).wait()
        gates = gates + jnp.dot(h_mm[:, k * C:(k + 1) * C], w_buf[k % 2],
                                preferred_element_type=jnp.float32)
    new_c, new_h = _cell_math(gates, c_ref[:], H)
    if mask_ref is not None:
        valid = mask_ref[0]
        new_c = valid * new_c + (1.0 - valid) * c_ref[:]
        new_h = valid * new_h + (1.0 - valid) * h_ref[:]
    out_ref[0] = new_h
    c_ref[:] = new_c
    h_ref[:] = new_h
    if save_c:
        c_out_ref[0] = new_c.astype(c_out_ref.dtype)


def _fwd_seq_chunked(x_proj: Array, w_h: Array, *, save_c: bool,
                     bf16_matmul: bool, mask: Array | None) -> tuple:
    """Forward for layers whose weights exceed VMEM: stream W_h from HBM in
    double-buffered tiles (bf16 tiles when bf16_matmul — halves the per-step
    HBM traffic, which bounds this regime)."""
    T, B, H4 = x_proj.shape
    H = H4 // 4
    C = _chunk_size(H, B, bf16_matmul)
    assert C is not None, (T, B, H)
    w_mm = w_h.astype(jnp.bfloat16) if bf16_matmul else w_h
    blk = lambda t: (t, 0, 0)                         # noqa: E731
    in_specs = [
        pl.BlockSpec((1, B, H4), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),          # W_h stays in HBM
    ]
    args = [x_proj, w_mm]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, B, 1), blk,
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    n_out = 2 if save_c else 1
    c_dtype = jnp.bfloat16 if bf16_matmul else jnp.float32
    out_dtypes = [jnp.float32, c_dtype][:n_out]
    kernel = functools.partial(
        _fwd_kernel_chunked, n_chunks=H // C, C=C, save_c=save_c,
        bf16_matmul=bf16_matmul, with_mask=mask is not None)
    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, B, H), blk, memory_space=pltpu.VMEM)
                   for _ in range(n_out)],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), d) for d in out_dtypes],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),           # c carry
            pltpu.VMEM((B, H), jnp.float32),           # h carry
            pltpu.VMEM((2, C, H4), w_mm.dtype),        # double-buffered tiles
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(*args)
    return tuple(outs)


def _fwd_seq(x_proj: Array, w_h: Array, *, save_c: bool,
             bf16_matmul: bool = False, mask: Array | None = None,
             drop: tuple | None = None) -> tuple:
    """x_proj: [T, B, 4H] f32 (input projection + bias); w_h: [H, 4H];
    mask: optional [T, B, 1] f32 validity (carry-through on zeros);
    drop: (seed [1] int32, keep) — in-kernel PRNG output dropout (gate
    callers with kernel_dropout_ok_uni; not supported on the
    weight-streaming chunked variant).

    Returns (h_seq [T, B, H][, clean_seq when drop+save_c][, c_seq]).
    Dispatches to the weight-streaming variant when W_h cannot stay
    resident in VMEM."""
    T, B, H4 = x_proj.shape
    H = H4 // 4
    wbytes = 2 if bf16_matmul else 4
    if not (_weights_resident_fits(1, B, H)
            or _fwd_wide_vmem_bytes(1, B, H, wbytes) <= VMEM_BUDGET_WIDE):
        if drop is not None:
            raise RuntimeError("in-kernel dropout is not supported on the "
                               "chunked forward; gate with "
                               "kernel_dropout_ok_uni()")
        # Too wide to keep W resident even under the raised limit: stream
        # W from HBM in double-buffered tiles.
        return _fwd_seq_chunked(x_proj, w_h, save_c=save_c,
                                bf16_matmul=bf16_matmul, mask=mask)
    res_dtype = jnp.bfloat16 if bf16_matmul else jnp.float32
    save_clean = save_c and drop is not None

    def _extra_bytes(s):
        return (2 * s * B * H * (2 if bf16_matmul else 4)
                if save_clean else 0)

    S, extended = _pick_steps(T, lambda s: (
        _fwd_vmem_bytes(s, B, H) + _extra_bytes(s) <= VMEM_BUDGET,
        (_fwd_wide_vmem_bytes(s, B, H, wbytes) + _extra_bytes(s)
         <= VMEM_BUDGET_WIDE)))
    # bf16 W halves its resident footprint under bf16 compute (wide tier).
    w_arg = w_h.astype(jnp.bfloat16) if (extended and bf16_matmul) else w_h
    blk3 = lambda t: (t, 0, 0)                        # noqa: E731
    out_shapes = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]
    out_specs = [pl.BlockSpec((S, B, H), blk3, memory_space=pltpu.VMEM)]
    if save_clean:
        out_shapes.append(jax.ShapeDtypeStruct((T, B, H), res_dtype))
        out_specs.append(pl.BlockSpec((S, B, H), blk3,
                                      memory_space=pltpu.VMEM))
    if save_c:
        # c is a pure VJP residual: bf16 under bf16 compute (see _fwd_bidir).
        out_shapes.append(jax.ShapeDtypeStruct((T, B, H), res_dtype))
        out_specs.append(pl.BlockSpec((S, B, H), blk3,
                                      memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((S, B, H4), blk3, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x_proj, w_arg]
    if drop is not None:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, drop[0])
    if mask is not None:
        in_specs.append(pl.BlockSpec((S, B, 1), blk3,
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    kernel = functools.partial(_fwd_kernel, steps=S, save_c=save_c,
                               bf16_matmul=bf16_matmul,
                               with_mask=mask is not None,
                               drop_keep=None if drop is None else drop[1])
    extra = {"compiler_params": _wide_params()} if extended else {}
    outs = pl.pallas_call(
        kernel,
        grid=(T // S,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),   # c carry
            pltpu.VMEM((B, H), jnp.float32),   # h carry
        ],
        interpret=_interpret() if drop is None else _interp_mode(),
        **extra,
    )(*args)
    return tuple(outs)


# ---------------------------------------------------------------------------
# Dual-direction forward (fw + bw in ONE launch)
# ---------------------------------------------------------------------------

def bidir_fits(T: int, B: int, H: int, bf16: bool = False,
               train_drop: bool = False, save_acts: bool = False) -> bool:
    """Both directions resident at once: ~2x the single-direction footprint
    (under the default limit, or the raised wide-layer limit).

    train_drop/save_acts: account for the TRAINING forward's extra blocked
    outputs (clean-h residual pair / bf16 activated-gates pair) — pass them
    when admitting a training configuration (kernel_dropout_ok does)."""
    extra = 2 * _train_fwd_extra_bytes(1, B, H, bf16, train_drop, save_acts)
    if 2 * _fwd_vmem_bytes(1, B, H) + extra <= VMEM_BUDGET:
        return True
    wbytes = 2 if bf16 else 4
    return (2 * _fwd_wide_vmem_bytes(1, B, H, wbytes) + extra
            <= VMEM_BUDGET_WIDE)


def _fwd_bidir_kernel(*refs, steps: int, save_c: bool, bf16_matmul: bool,
                      drop_keep: float | None = None,
                      save_acts: bool = False):
    it = iter(refs)
    seeds_ref = next(it) if drop_keep is not None else None
    x_fw_ref, x_bw_ref, w_fw_ref, w_bw_ref, mask_ref = (
        next(it), next(it), next(it), next(it), next(it))
    out_fw_ref, out_bw_ref = next(it), next(it)
    # Training + dropout: the dropped tensor feeds the next layer, but the
    # backward pass recomputes gates from the UN-dropped recurrent h — emit
    # both (the extra write is still far cheaper than the XLA-side dropout's
    # full read+write pass over the outputs).
    clean_fw_ref = next(it) if (save_c and drop_keep is not None) else None
    clean_bw_ref = next(it) if (save_c and drop_keep is not None) else None
    c_out_fw_ref = next(it) if save_c else None
    c_out_bw_ref = next(it) if save_c else None
    # E2E_ASR_SAVE_GATES: activated gates (i, tanh j, sig f+1, o) in bf16 -
    # the backward then skips its gates-recompute matmul + transcendentals.
    acts_fw_ref = next(it) if save_acts else None
    acts_bw_ref = next(it) if save_acts else None
    c_fw_ref, h_fw_ref, c_bw_ref, h_bw_ref = (
        next(it), next(it), next(it), next(it))

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        c_fw_ref[:] = jnp.zeros_like(c_fw_ref)
        h_fw_ref[:] = jnp.zeros_like(h_fw_ref)
        c_bw_ref[:] = jnp.zeros_like(c_bw_ref)
        h_bw_ref[:] = jnp.zeros_like(h_bw_ref)

    H = h_fw_ref.shape[-1]
    for s in range(steps):
        # Forward direction (no mask: padding trails, outputs masked outside).
        h = h_fw_ref[:]
        w = w_fw_ref[:]
        if bf16_matmul:
            h, w = h.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        gates = x_fw_ref[s] + jnp.dot(h, w,
                                      preferred_element_type=jnp.float32)
        if save_acts:
            new_c, new_h, acts = _cell_math_acts(gates, c_fw_ref[:], H)
            acts_fw_ref[s] = acts.astype(jnp.bfloat16)
        else:
            new_c, new_h = _cell_math(gates, c_fw_ref[:], H)
        if drop_keep is not None:
            # Output dropout fused into the write: the RECURRENT h stays
            # un-dropped (dropout sits between layers, not inside the
            # recurrence — encoder.py:74 DropoutWrapper output semantics).
            pltpu.prng_seed(seeds_ref[0], t * steps + s)
            out_fw_ref[s] = new_h * _drop_mask(new_h.shape[0], H, drop_keep)
            if clean_fw_ref is not None:
                clean_fw_ref[s] = new_h.astype(clean_fw_ref.dtype)
        else:
            out_fw_ref[s] = new_h
        c_fw_ref[:] = new_c
        h_fw_ref[:] = new_h
        if save_c:
            c_out_fw_ref[s] = new_c.astype(c_out_fw_ref.dtype)

        # Backward direction on time-flipped inputs (padding LEADS: carry
        # through on masked steps).
        h = h_bw_ref[:]
        w = w_bw_ref[:]
        if bf16_matmul:
            h, w = h.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        gates = x_bw_ref[s] + jnp.dot(h, w,
                                      preferred_element_type=jnp.float32)
        if save_acts:
            new_c, new_h, acts = _cell_math_acts(gates, c_bw_ref[:], H)
            acts_bw_ref[s] = acts.astype(jnp.bfloat16)
        else:
            new_c, new_h = _cell_math(gates, c_bw_ref[:], H)
        valid = mask_ref[s]
        new_c = valid * new_c + (1.0 - valid) * c_bw_ref[:]
        new_h = valid * new_h + (1.0 - valid) * h_bw_ref[:]
        if drop_keep is not None:
            pltpu.prng_seed(seeds_ref[1], t * steps + s)
            out_bw_ref[s] = new_h * _drop_mask(new_h.shape[0], H, drop_keep)
            if clean_bw_ref is not None:
                clean_bw_ref[s] = new_h.astype(clean_bw_ref.dtype)
        else:
            out_bw_ref[s] = new_h
        c_bw_ref[:] = new_c
        h_bw_ref[:] = new_h
        if save_c:
            c_out_bw_ref[s] = new_c.astype(c_out_bw_ref.dtype)


def _fwd_bidir(x_proj_fw: Array, x_proj_bw: Array, w_h_fw: Array,
               w_h_bw: Array, mask_bw: Array, *, save_c: bool,
               bf16_matmul: bool, drop: tuple | None = None,
               save_acts: bool = False) -> tuple:
    """drop: (seeds [2] int32 array — fw/bw PRNG seeds, keep float).
    save_acts appends bf16 activated-gates outputs (training only)."""
    T, B, H4 = x_proj_fw.shape
    H = H4 // 4
    wbytes = 2 if bf16_matmul else 4

    def _extra(s):
        return 2 * _train_fwd_extra_bytes(
            s, B, H, bf16_matmul, save_c and drop is not None, save_acts)

    S, extended = _pick_steps(T, lambda s: (
        2 * _fwd_vmem_bytes(s, B, H) + _extra(s) <= VMEM_BUDGET,
        (2 * _fwd_wide_vmem_bytes(s, B, H, wbytes) + _extra(s)
         <= VMEM_BUDGET_WIDE)))
    w_fw_arg, w_bw_arg = w_h_fw, w_h_bw
    if extended and bf16_matmul:
        w_fw_arg = w_h_fw.astype(jnp.bfloat16)
        w_bw_arg = w_h_bw.astype(jnp.bfloat16)
    blk = lambda t: (t, 0, 0)                         # noqa: E731
    rep = lambda t: (0, 0)                            # noqa: E731
    in_specs = [
        pl.BlockSpec((S, B, H4), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, B, H4), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H4), rep, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H4), rep, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, B, 1), blk, memory_space=pltpu.VMEM),
    ]
    args = [x_proj_fw, x_proj_bw, w_fw_arg, w_bw_arg, mask_bw]
    if drop is not None:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, drop[0])
    out_specs = [pl.BlockSpec((S, B, H), blk, memory_space=pltpu.VMEM)
                 for _ in range(2)]
    out_shapes = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)
                  for _ in range(2)]
    if save_c:
        # VJP residuals ([clean pair,] c pair): stored bf16 under bf16
        # compute. Exactly neutral for h (the backward only feeds h_prev to
        # bf16 MXU matmuls, which round identically); c rounding perturbs
        # only the VPU terms tanh(c_t)/df (~bf16-eps rel on grads). Halves
        # the residual HBM traffic the backward re-reads — the same
        # discipline as bf16 x_proj storage (VALIDATION round-4 item 2).
        n_res = 2 + (2 if drop is not None else 0)
        res_dtype = jnp.bfloat16 if bf16_matmul else jnp.float32
        out_specs += [pl.BlockSpec((S, B, H), blk, memory_space=pltpu.VMEM)
                      for _ in range(n_res)]
        out_shapes += [jax.ShapeDtypeStruct((T, B, H), res_dtype)
                       for _ in range(n_res)]
    if save_acts:
        out_specs += [pl.BlockSpec((S, B, H4), blk,
                                   memory_space=pltpu.VMEM)] * 2
        out_shapes += [jax.ShapeDtypeStruct((T, B, H4), jnp.bfloat16)] * 2
    kernel = functools.partial(_fwd_bidir_kernel, steps=S, save_c=save_c,
                               bf16_matmul=bf16_matmul,
                               drop_keep=None if drop is None else drop[1],
                               save_acts=save_acts)
    extra = {"compiler_params": _wide_params()} if extended else {}
    return tuple(pl.pallas_call(
        kernel,
        grid=(T // S,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32) for _ in range(4)],
        interpret=_interpret() if drop is None else _interp_mode(),
        **extra,
    )(*args))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def lstm_seq_bidir(x_proj_fw: Array, x_proj_bw: Array, w_h_fw: Array,
                   w_h_bw: Array, mask_bw: Array,
                   drop_seeds: Array | None = None,
                   bf16_matmul: bool = False,
                   drop_keep: float = 1.0) -> tuple[Array, Array]:
    """Both directions of a bidirectional LSTM layer in ONE kernel launch.

    x_proj_fw: [T,B,4H] input projection in natural time order;
    x_proj_bw: [T,B,4H] projection of the time-FLIPPED inputs;
    mask_bw: [T,B,1] validity for the flipped sequence (padding leads).
    Returns (h_fw [T,B,H] unmasked, h_bw_flipped [T,B,H] carry-through) —
    callers mask/flip outside exactly as for the single-direction kernels.

    One launch halves the per-layer dispatch count and interleaves the two
    directions' MXU matmuls in one pipeline (VERDICT round-1 item 9).

    drop_seeds [2] int32 + drop_keep < 1: in-kernel PRNG output dropout —
    masks are generated from the core PRNG inside the kernel (never touch
    HBM) and regenerated bit-identically in the backward (seeded by the
    absolute time step). The recurrent state stays un-dropped; only the
    emitted outputs are masked. Gate with kernel_dropout_ok().
    """
    use_drop = drop_keep < 1.0
    outs = _fwd_bidir(x_proj_fw, x_proj_bw, w_h_fw, w_h_bw, mask_bw,
                      save_c=False, bf16_matmul=bf16_matmul,
                      drop=(drop_seeds, drop_keep) if use_drop else None)
    return outs[0], outs[1]


def _save_gates() -> bool:
    import os
    return bool(os.environ.get("E2E_ASR_SAVE_GATES"))


def _lstm_seq_bidir_fwd(x_proj_fw, x_proj_bw, w_h_fw, w_h_bw, mask_bw,
                        drop_seeds, bf16_matmul, drop_keep):
    use_drop = drop_keep < 1.0
    save_acts = _save_gates()
    outs = _fwd_bidir(
        x_proj_fw, x_proj_bw, w_h_fw, w_h_bw, mask_bw, save_c=True,
        bf16_matmul=bf16_matmul,
        drop=(drop_seeds, drop_keep) if use_drop else None,
        save_acts=save_acts)
    acts_fw = acts_bw = None
    if save_acts:
        outs, (acts_fw, acts_bw) = outs[:-2], outs[-2:]
    if use_drop:
        # Residual h is the CLEAN (un-dropped) state the recurrence used.
        h_fw, h_bw, clean_fw, clean_bw, c_fw, c_bw = outs
    else:
        h_fw, h_bw, c_fw, c_bw = outs
        clean_fw, clean_bw = h_fw, h_bw
    return (h_fw, h_bw), (x_proj_fw, x_proj_bw, w_h_fw, w_h_bw, mask_bw,
                          drop_seeds, clean_fw, clean_bw, c_fw, c_bw,
                          acts_fw, acts_bw)


def _lstm_seq_bidir_bwd(bf16_matmul, drop_keep, res, g):
    (x_proj_fw, x_proj_bw, w_h_fw, w_h_bw, mask_bw,
     drop_seeds, h_fw, h_bw, c_fw, c_bw, acts_fw, acts_bw) = res
    g_fw, g_bw = g
    use_drop = drop_keep < 1.0
    d_seeds = None if drop_seeds is None else jnp.zeros_like(drop_seeds)
    # Fused dual-direction backward (one launch, chains overlap — mirrors
    # the fused forward); fall back to two launches when it doesn't fit.
    fused = _bwd_seq_bidir(
        w_h_fw, w_h_bw, h_fw, c_fw, x_proj_fw, g_fw,
        h_bw, c_bw, x_proj_bw, g_bw, mask_bw,
        bf16_matmul=bf16_matmul,
        drop=(drop_seeds, drop_keep) if use_drop else None)
    if fused is not None:
        dx_fw, dw_fw, dx_bw, dw_bw = fused
        return (dx_fw.astype(x_proj_fw.dtype), dx_bw.astype(x_proj_bw.dtype),
                dw_fw, dw_bw, jnp.zeros_like(mask_bw), d_seeds)
    d_fw = (drop_seeds[0:1], drop_keep) if use_drop else None
    d_bw = (drop_seeds[1:2], drop_keep) if use_drop else None
    dx_fw, dw_fw = _bwd_seq(w_h_fw, h_fw, c_fw, x_proj_fw, g_fw,
                            bf16_matmul=bf16_matmul, drop=d_fw,
                            acts=acts_fw)
    dx_bw, dw_bw = _bwd_seq(w_h_bw, h_bw, c_bw, x_proj_bw, g_bw,
                            bf16_matmul=bf16_matmul, mask=mask_bw,
                            drop=d_bw, acts=acts_bw)
    return (dx_fw.astype(x_proj_fw.dtype), dx_bw.astype(x_proj_bw.dtype),
            dw_fw, dw_bw, jnp.zeros_like(mask_bw), d_seeds)


lstm_seq_bidir.defvjp(_lstm_seq_bidir_fwd, _lstm_seq_bidir_bwd)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_seq_xla(w_h: Array, h_seq: Array, c_seq: Array, x_proj: Array,
                 g: Array, *, mask: Array | None = None
                 ) -> tuple[Array, Array]:
    """Reverse-time backward as an XLA scan (VMEM-safe fallback for wide
    layers where the Pallas backward kernel would exceed the scoped limit)."""
    T, B, H = h_seq.shape
    h_prev_seq = jnp.concatenate(
        [jnp.zeros((1, B, H), h_seq.dtype), h_seq[:-1]], axis=0)
    c_prev_seq = jnp.concatenate(
        [jnp.zeros((1, B, H), c_seq.dtype), c_seq[:-1]], axis=0)
    mask_seq = (mask if mask is not None
                else jnp.ones((T, B, 1), jnp.float32))

    def body(carry, xs):
        dc, dh, dwh = carry
        h_prev, c_prev, c_t, xp, g_t, valid = xs
        h_prev = h_prev.astype(jnp.float32)
        c_prev = c_prev.astype(jnp.float32)
        c_t = c_t.astype(jnp.float32)
        gates = xp + jnp.dot(h_prev, w_h, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :H])
        j = jnp.tanh(gates[:, H:2 * H])
        f = jax.nn.sigmoid(gates[:, 2 * H:3 * H] + 1.0)
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        tanh_c = jnp.tanh(c_t)
        dh_total = g_t * valid + dh
        do = dh_total * tanh_c * o * (1.0 - o)
        dc_total = dh_total * o * (1.0 - tanh_c * tanh_c) + dc
        df = dc_total * c_prev * f * (1.0 - f)
        di = dc_total * j * i * (1.0 - i)
        dj = dc_total * i * (1.0 - j * j)
        dgates = jnp.concatenate([di, dj, df, do], axis=-1) * valid
        dh_new = jnp.dot(dgates, w_h.T, preferred_element_type=jnp.float32)
        dc_new = dc_total * f
        dh_new = valid * dh_new + (1.0 - valid) * dh_total
        dc_new = valid * dc_new + (1.0 - valid) * dc
        dwh = dwh + jnp.dot(h_prev.T, dgates,
                            preferred_element_type=jnp.float32)
        return (dc_new, dh_new, dwh), dgates

    init = (jnp.zeros((B, H)), jnp.zeros((B, H)), jnp.zeros_like(w_h))
    (_, _, dwh), dx = jax.lax.scan(
        body, init, (h_prev_seq, c_prev_seq, c_seq, x_proj, g, mask_seq),
        reverse=True)
    return dx, dwh


def _bwd_choice(T: int, B: int, H: int, bf16_matmul: bool,
                drop_B: int = 0):
    """Pick the Pallas backward config: (S, BC, emit_dw, extended) or None
    (caller falls back to the XLA scan backward). Prefer 2-step blocks and
    the full batch; chunk the batch before giving up; very wide layers
    (H~2048) drop the in-kernel dW accumulator (see _bwd_nodw_vmem_bytes).
    drop_B: full batch size when in-kernel dropout will run (the mask
    transient is full-batch even in chunked grids)."""
    s_opts = tuple(S for S in STEP_BLOCKS if T % S == 0)
    for div in (1, 2, 4, 8):
        if B % div:
            continue
        for s_try in s_opts:
            for budget in (VMEM_BUDGET, VMEM_BUDGET_WIDE):
                if _bwd_vmem_bytes(s_try, B // div, H, drop_B) <= budget:
                    return (s_try, B // div, True, budget != VMEM_BUDGET)
    wbytes = 2 if bf16_matmul else 4
    for div in (1, 2, 4, 8, 16):
        if B % div:
            continue
        for s_try in s_opts:
            if _bwd_nodw_fits(s_try, B // div, H, wbytes, drop_B):
                return (s_try, B // div, False, True)
    return None


def kernel_dropout_ok(T: int, B: int, H: int, bf16: bool = False) -> bool:
    """Whether the fused bidir layer can take in-kernel PRNG dropout: both
    the forward and the BACKWARD must run as Pallas kernels (the XLA-scan
    backward fallback cannot regenerate the core PRNG's mask stream) AND the
    backend must be a real TPU. Off-TPU the dropout kernels would run under
    TPU-interpret emulation (pltpu.InterpretParams), which is pure downside:
    its lowering contains an io_callback the SPMD partitioner rejects
    ("side-effect HLO cannot have a replicated sharding" under jit on a
    multi-device mesh), and its prng_random_bits are all zeros, so keep_prob
    silently becomes 1.0. Returning False here routes callers (core/rnn.py
    rnn_layer) to the XLA jax.random dropout, which is correct everywhere.

    Fit checks use the TRAINING shape: the dropout forward's extra clean-h
    residual outputs (+ saved gates under E2E_ASR_SAVE_GATES) and the
    backward's full-batch mask transient are included."""
    return (jax.default_backend() == "tpu"
            and bidir_fits(T, B, H, bf16, train_drop=True,
                           save_acts=_save_gates())
            and _bwd_choice(T, B, H, bf16, drop_B=B) is not None)


def kernel_dropout_ok_uni(T: int, B: int, H: int, bf16: bool = False) -> bool:
    """kernel_dropout_ok for the SINGLE-direction kernels (forward-only /
    streaming-trainable encoders, rnn_layer(bidirectional=False)): real TPU
    backend, a non-chunked forward that fits with the clean-h residual
    output, and a Pallas backward (the XLA fallback cannot replay the
    PRNG stream)."""
    if jax.default_backend() != "tpu":
        return False
    wbytes = 2 if bf16 else 4
    extra = 2 * 1 * B * H * (2 if bf16 else 4)        # clean residual, S=1
    fwd_ok = (_fwd_vmem_bytes(1, B, H) + extra <= VMEM_BUDGET
              or (_fwd_wide_vmem_bytes(1, B, H, wbytes) + extra
                  <= VMEM_BUDGET_WIDE))
    return fwd_ok and _bwd_choice(T, B, H, bf16, drop_B=B) is not None


def _bwd_seq(w_h: Array, h_seq: Array, c_seq: Array, x_proj: Array,
             g: Array, *, bf16_matmul: bool = False,
             mask: Array | None = None,
             drop: tuple | None = None,
             acts: Array | None = None) -> tuple[Array, Array]:
    """Returns (dx_proj [T,B,4H], dw_h [H,4H]).

    drop: (seed [1] int32 array, keep float) — regenerate the forward's
    per-step dropout masks from the SAME seeds and scale the incoming g
    before the cell backprop (out = h * mask, so dL/dh = g * mask + the
    recurrent contribution).

    acts: saved activated gates [T,B,4H] bf16 (E2E_ASR_SAVE_GATES) — the
    blocked kernel then reads them instead of recomputing gates from
    x_proj + a matmul (engaged on the S>=2 emit_dw path only; other
    variants fall back to recompute)."""
    T, B, H = h_seq.shape
    H4 = 4 * H
    choice4 = _bwd_choice(T, B, H, bf16_matmul,
                          drop_B=B if drop is not None else 0)
    if choice4 is None:
        if drop is not None:
            raise RuntimeError(
                "in-kernel dropout requires the Pallas backward; gate "
                "callers with kernel_dropout_ok()")
        return _bwd_seq_xla(w_h, h_seq, c_seq, x_proj, g, mask=mask)
    S, BC_sel, emit_dw, extended = choice4
    w_arg = (w_h.astype(jnp.bfloat16)
             if (not emit_dw and bf16_matmul) else w_h)
    # pad[t] = state_{t-1} (pad[0] = zeros). S-1 extra trailing zero rows
    # keep the c window (which reads one block above the last S-aligned
    # block) in-bounds, and make the padded length a multiple of S.
    # h and c may differ in dtype (h = f32 layer output when no dropout,
    # c = bf16 residual under bf16 compute) — pad each in its own dtype so
    # the concat never upcasts the bf16 residual back to f32.
    h_pad = jnp.concatenate(
        [jnp.zeros((1, B, H), h_seq.dtype), h_seq], axis=0)     # [T+1]
    c_pad = jnp.concatenate(
        [jnp.zeros((1, B, H), c_seq.dtype), c_seq], axis=0)     # [T+1]
    if S > 1:
        h_pad = jnp.concatenate(
            [h_pad, jnp.zeros((S - 1, B, H), h_seq.dtype)], axis=0)  # [T+S]
        c_pad = jnp.concatenate(
            [c_pad, jnp.zeros((S - 1, B, H), c_seq.dtype)], axis=0)  # [T+S]

    n_blocks = T // S
    BC = BC_sel
    n_bc = B // BC
    # Grid (batch-chunk, time-block): the batch axis is the OUTER loop so the
    # dc/dh carries restart cleanly at each chunk; dW_h accumulates across
    # both axes into the same resident block.
    # Block r covers times [T - (r+1)*S, T - r*S); the h/c windows read the
    # padded arrays at matching aligned offsets (pad[t] = state_{t-1}).
    rev_x = lambda bc, r: (n_blocks - 1 - r, bc, 0)      # noqa: E731
    if S == 1:
        # Single-row views: h_{t-1}/c_{t-1} at pad[t], c_t at pad[t+1].
        in_specs = [
            pl.BlockSpec((H, H4), lambda bc, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BC, H), lambda bc, r: (T - 1 - r, bc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BC, H), lambda bc, r: (T - 1 - r, bc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BC, H), lambda bc, r: (T - r, bc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BC, H4), rev_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BC, H), rev_x, memory_space=pltpu.VMEM),
        ]
        args = [w_arg, h_pad, c_pad, c_pad, x_proj, g]
        kernel = functools.partial(_bwd_kernel_s1, bf16_matmul=bf16_matmul,
                                   with_mask=mask is not None,
                                   emit_dw=emit_dw,
                                   drop_keep=None if drop is None else drop[1],
                                   full_B=B, n_blocks=T)
        mask_spec = pl.BlockSpec((1, BC, 1), rev_x, memory_space=pltpu.VMEM)
    else:
        # S >= 2: padded arrays have T+S rows; block r needs window
        # [t0, t0+S] where t0 = T-(r+1)*S. We pass h_pad with an S-row block
        # at element offset t0 (block index n_blocks-1-r) and c_pad with TWO
        # S-row blocks: [t0, t0+S) and [t0+S, t0+2S); the kernel views them
        # as an (S+1)-row logical window (only the first row of the upper
        # block is consumed).
        blk = lambda bc, r: (n_blocks - 1 - r, bc, 0)    # noqa: E731
        blk1 = lambda bc, r: (n_blocks - r, bc, 0)       # noqa: E731
        in_specs = [
            pl.BlockSpec((H, H4), lambda bc, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, BC, H), blk, memory_space=pltpu.VMEM),   # h_pad
            pl.BlockSpec((S, BC, H), blk, memory_space=pltpu.VMEM),   # c lo
            pl.BlockSpec((S, BC, H), blk1, memory_space=pltpu.VMEM),  # c hi
            pl.BlockSpec((S, BC, H4), rev_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, BC, H), rev_x, memory_space=pltpu.VMEM),
        ]
        use_acts = acts is not None and emit_dw
        args = [w_arg, h_pad, c_pad, c_pad,
                acts if use_acts else x_proj, g]
        kernel = functools.partial(_bwd_kernel_blocked, steps=S,
                                   bf16_matmul=bf16_matmul,
                                   with_mask=mask is not None,
                                   emit_dw=emit_dw,
                                   drop_keep=None if drop is None else drop[1],
                                   full_B=B, n_blocks=n_blocks,
                                   with_acts=use_acts)
        mask_spec = pl.BlockSpec((S, BC, 1), rev_x, memory_space=pltpu.VMEM)

    if mask is not None:
        in_specs.append(mask_spec)
        args.append(mask)
    if drop is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(drop[0])

    # dx is the x_proj cotangent: emit it in x_proj's dtype directly (bf16
    # under bf16 compute) — the custom-VJP contract demands that dtype
    # anyway, and casting OUTSIDE the kernel costs a full extra HBM
    # read+write pass over [T,B,4H] per direction per layer.
    out_specs = [pl.BlockSpec((S, BC, H4), rev_x, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((T, B, H4), x_proj.dtype)]
    scratch_shapes = [
        pltpu.VMEM((BC, H), jnp.float32),   # dc carry
        pltpu.VMEM((BC, H), jnp.float32),   # dh carry
    ]
    if emit_dw:
        out_specs.append(pl.BlockSpec((H, H4), lambda bc, r: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((H, H4), jnp.float32))
    else:
        # W stays in HBM; the kernel DMAs it once into persistent scratch
        # (a VMEM-blocked W would be double-buffered: 2 resident copies).
        in_specs[0] = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch_shapes += [pltpu.VMEM((H, H4), w_arg.dtype),
                           pltpu.SemaphoreType.DMA]

    extra = {"compiler_params": _wide_params()} if extended else {}
    outs = pl.pallas_call(
        kernel,
        grid=(n_bc, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=_interpret() if drop is None else _interp_mode(),
        **extra,
    )(*args)
    if emit_dw:
        return outs
    # Wide-layer variant: dW = sum_t h_{t-1}^T dgates_t as ONE large MXU
    # matmul (h_prev at t=0 is zeros, so t starts at 1). Masked steps already
    # have dgates zeroed inside the kernel. bf16 operands under bf16 compute
    # match the in-kernel accumulation's precision exactly.
    dx = outs[0]
    h_prev_flat = h_seq[:-1].reshape((T - 1) * B, H)
    dg_flat = dx[1:].reshape((T - 1) * B, H4)
    if bf16_matmul:
        h_prev_flat = h_prev_flat.astype(jnp.bfloat16)
        dg_flat = dg_flat.astype(jnp.bfloat16)
    dwh = jnp.dot(h_prev_flat.T, dg_flat,
                  preferred_element_type=jnp.float32)
    return dx, dwh


def _bwd_step(w_mm, h_prev, c_prev, c_t, x_proj_s, g_s, valid,
              dc_carry, dh_carry, H, bf16_matmul, want_dw=True,
              transpose_acts=False, acts_s=None):
    """One reverse-time cell backprop. Returns (dgates, dh_new, dc_new,
    dwh_contrib) — dwh_contrib is None when want_dw=False (wide-layer
    variant: dW is accumulated outside the kernel).

    acts_s: optional saved ACTIVATED gates [B, 4H] (i, tanh j, sigmoid f+1,
    o — bf16, written by the training forward under E2E_ASR_SAVE_GATES):
    skips this step's gates-recompute matmul and its four transcendental
    batches; x_proj_s is unused then (pass None).

    h_prev/c_prev/c_t may arrive bf16 (residuals stored bf16 under bf16
    compute): h only feeds bf16 matmuls (identical rounding either way);
    the c terms are cast back to f32 for the VPU math."""
    h_prev_mm = (h_prev.astype(jnp.bfloat16) if bf16_matmul
                 else h_prev.astype(jnp.float32))
    c_prev = c_prev.astype(jnp.float32)
    c_t = c_t.astype(jnp.float32)
    if acts_s is not None:
        a = acts_s.astype(jnp.float32)
        i, j, f, o = (a[:, :H], a[:, H:2 * H], a[:, 2 * H:3 * H],
                      a[:, 3 * H:])
    else:
        gates = x_proj_s + jnp.dot(h_prev_mm, w_mm,
                                   preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :H])
        j = jnp.tanh(gates[:, H:2 * H])
        f = jax.nn.sigmoid(gates[:, 2 * H:3 * H] + 1.0)
        o = jax.nn.sigmoid(gates[:, 3 * H:])

    g_t = g_s if valid is None else g_s * valid
    tanh_c = jnp.tanh(c_t)
    dh_total = g_t + dh_carry
    do = dh_total * tanh_c * o * (1.0 - o)
    dc_total = dh_total * o * (1.0 - tanh_c * tanh_c) + dc_carry
    df = dc_total * c_prev * f * (1.0 - f)
    di = dc_total * j * i * (1.0 - i)
    dj = dc_total * i * (1.0 - j * j)

    dgates = jnp.concatenate([di, dj, df, do], axis=-1)
    if valid is not None:
        dgates = dgates * valid
    dgates_mm = dgates.astype(jnp.bfloat16) if bf16_matmul else dgates
    if transpose_acts:
        # Wide layers: dgates @ W^T would make Mosaic materialize a second,
        # transposed-layout copy of W in VMEM (+8.4MB at H=1024 — the
        # difference between fitting and OOM). Transpose the small [B,4H]
        # activations instead: dh = (W @ dgates^T)^T.
        dh_new = jnp.dot(w_mm, dgates_mm.T,
                         preferred_element_type=jnp.float32).T
    else:
        dh_new = jnp.dot(dgates_mm, w_mm.T,
                         preferred_element_type=jnp.float32)
    dc_new = dc_total * f
    if valid is not None:
        dh_new = valid * dh_new + (1.0 - valid) * dh_total
        dc_new = valid * dc_new + (1.0 - valid) * dc_carry
    dwh_contrib = (jnp.dot(h_prev_mm.T, dgates_mm,
                           preferred_element_type=jnp.float32)
                   if want_dw else None)
    return dgates, dh_new, dc_new, dwh_contrib


def _bwd_kernel_s1(w_h_ref, h_prev_ref, c_prev_ref, c_t_ref, x_proj_ref,
                   g_ref, *refs, bf16_matmul: bool, with_mask: bool,
                   emit_dw: bool = True, drop_keep: float | None = None,
                   full_B: int = 0, n_blocks: int = 0):
    mask_ref = None
    if with_mask:
        mask_ref, refs = refs[0], refs[1:]
    seed_ref = None
    if drop_keep is not None:
        seed_ref, refs = refs[0], refs[1:]
    if emit_dw:
        dx_ref, dwh_acc_ref, dc_ref, dh_ref = refs
        w_buf_ref = w_sem = None
    else:
        dx_ref, dc_ref, dh_ref, w_buf_ref, w_sem = refs
        dwh_acc_ref = None

    bc = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init_carries():
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dh_ref[:] = jnp.zeros_like(dh_ref)

    if emit_dw:
        @pl.when(jnp.logical_and(bc == 0, r == 0))
        def _init_acc():
            dwh_acc_ref[:] = jnp.zeros_like(dwh_acc_ref)
        w = w_h_ref[:]
    else:
        # W lives in HBM; copy it into persistent scratch ONCE (a VMEM
        # BlockSpec would be double-buffered by Mosaic — 2 copies of W).
        @pl.when(jnp.logical_and(bc == 0, r == 0))
        def _load_w():
            cp = pltpu.make_async_copy(w_h_ref, w_buf_ref, w_sem)
            cp.start()
            cp.wait()
        w = w_buf_ref[:]

    H = dh_ref.shape[-1]
    w_mm = w.astype(jnp.bfloat16) if bf16_matmul else w
    valid = mask_ref[0] if mask_ref is not None else None
    g_s = g_ref[0]
    if seed_ref is not None:
        # Regenerate the forward's per-step dropout mask (out = h * m, so
        # dL/dh = g * m + recurrent contribution). abs step = T-1-r here
        # (S == 1: n_blocks == T).
        pltpu.prng_seed(seed_ref[0], n_blocks - 1 - r)
        m = _drop_mask(full_B, H, drop_keep)
        BC = g_s.shape[0]
        if BC != full_B:
            m = jax.lax.dynamic_slice(m, (bc * BC, 0), (BC, H))
        g_s = g_s * m
    dgates, dh_new, dc_new, dwh = _bwd_step(
        w_mm, h_prev_ref[0], c_prev_ref[0], c_t_ref[0], x_proj_ref[0],
        g_s, valid, dc_ref[:], dh_ref[:], H, bf16_matmul,
        want_dw=emit_dw, transpose_acts=not emit_dw)
    dx_ref[0] = dgates.astype(dx_ref.dtype)
    dh_ref[:] = dh_new
    dc_ref[:] = dc_new
    if emit_dw:
        dwh_acc_ref[:] += dwh


def _bwd_kernel_blocked(w_h_ref, h_pad_ref, c_lo_ref, c_hi_ref, x_proj_ref,
                        g_ref, *refs, steps: int, bf16_matmul: bool,
                        with_mask: bool, emit_dw: bool = True,
                        drop_keep: float | None = None,
                        full_B: int = 0, n_blocks: int = 0,
                        with_acts: bool = False):
    """`steps` time steps per block, processed high-to-low.

    Windows (element offsets into the padded state arrays, pad[k] =
    state_{k-1} with one leading zero row; t0 = lowest time of the block):
    blocks are chosen in _bwd_seq so that for local step s in [0, steps):
    h_prev_s = h_pad_ref[s], c_prev_s = c_lo_ref[s], and c_t is
    c_lo_ref[s+1] for s < steps-1, else c_hi_ref[0] (the next S-aligned
    block up — only its first row is consumed).
    """
    mask_ref = None
    if with_mask:
        mask_ref, refs = refs[0], refs[1:]
    seed_ref = None
    if drop_keep is not None:
        seed_ref, refs = refs[0], refs[1:]
    if emit_dw:
        dx_ref, dwh_acc_ref, dc_ref, dh_ref = refs
        w_buf_ref = w_sem = None
    else:
        dx_ref, dc_ref, dh_ref, w_buf_ref, w_sem = refs
        dwh_acc_ref = None

    bc = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init_carries():
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dh_ref[:] = jnp.zeros_like(dh_ref)

    if emit_dw:
        @pl.when(jnp.logical_and(bc == 0, r == 0))
        def _init_acc():
            dwh_acc_ref[:] = jnp.zeros_like(dwh_acc_ref)
        w = w_h_ref[:]
    else:
        @pl.when(jnp.logical_and(bc == 0, r == 0))
        def _load_w():
            cp = pltpu.make_async_copy(w_h_ref, w_buf_ref, w_sem)
            cp.start()
            cp.wait()
        w = w_buf_ref[:]

    H = dh_ref.shape[-1]
    w_mm = w.astype(jnp.bfloat16) if bf16_matmul else w

    for s in reversed(range(steps)):
        c_t = c_hi_ref[0] if s == steps - 1 else c_lo_ref[s + 1]
        valid = mask_ref[s] if mask_ref is not None else None
        g_s = g_ref[s]
        if seed_ref is not None:
            # Same seeding as the forward: absolute time step of local s in
            # block r (blocks are visited in reverse; the seed is not).
            pltpu.prng_seed(seed_ref[0], (n_blocks - 1 - r) * steps + s)
            m = _drop_mask(full_B, H, drop_keep)
            BC = g_s.shape[0]
            if BC != full_B:
                m = jax.lax.dynamic_slice(m, (bc * BC, 0), (BC, H))
            g_s = g_s * m
        dgates, dh_new, dc_new, dwh = _bwd_step(
            w_mm, h_pad_ref[s], c_lo_ref[s], c_t,
            None if with_acts else x_proj_ref[s], g_s,
            valid, dc_ref[:], dh_ref[:], H, bf16_matmul, want_dw=emit_dw,
            transpose_acts=not emit_dw,
            acts_s=x_proj_ref[s] if with_acts else None)
        dx_ref[s] = dgates.astype(dx_ref.dtype)
        dh_ref[:] = dh_new
        dc_ref[:] = dc_new
        if emit_dw:
            dwh_acc_ref[:] += dwh


def _bwd_kernel_bidir(*refs, steps: int, bf16_matmul: bool,
                      drop_keep: float | None, full_B: int, n_blocks: int):
    """Both directions' reverse-time backprop in ONE launch.

    The forward fuses fw+bw into one kernel so their dependent chains
    overlap (lstm_seq_bidir); until round 4 the backward ran them as TWO
    serialized pallas_calls — twice the sequential chain. This kernel mirrors
    the fused forward: per grid block, one fw backward step block and one bw
    backward step block, independent chains Mosaic can interleave.
    Layout per direction = _bwd_kernel_blocked's (S >= 2 windows).
    """
    it = iter(refs)
    seed_ref = next(it) if drop_keep is not None else None
    w_fw_ref, w_bw_ref = next(it), next(it)
    h_fw_ref, c_lo_fw_ref, c_hi_fw_ref, x_fw_ref, g_fw_ref = (
        next(it), next(it), next(it), next(it), next(it))
    h_bw_ref, c_lo_bw_ref, c_hi_bw_ref, x_bw_ref, g_bw_ref = (
        next(it), next(it), next(it), next(it), next(it))
    mask_ref = next(it)                       # bw carry-through validity
    dx_fw_ref, dx_bw_ref, dwfw_ref, dwbw_ref = (
        next(it), next(it), next(it), next(it))
    dc_fw_ref, dh_fw_ref, dc_bw_ref, dh_bw_ref = (
        next(it), next(it), next(it), next(it))

    bc = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init_carries():
        dc_fw_ref[:] = jnp.zeros_like(dc_fw_ref)
        dh_fw_ref[:] = jnp.zeros_like(dh_fw_ref)
        dc_bw_ref[:] = jnp.zeros_like(dc_bw_ref)
        dh_bw_ref[:] = jnp.zeros_like(dh_bw_ref)

    @pl.when(jnp.logical_and(bc == 0, r == 0))
    def _init_acc():
        dwfw_ref[:] = jnp.zeros_like(dwfw_ref)
        dwbw_ref[:] = jnp.zeros_like(dwbw_ref)

    H = dh_fw_ref.shape[-1]
    w_fw = w_fw_ref[:]
    w_bw = w_bw_ref[:]
    if bf16_matmul:
        w_fw, w_bw = w_fw.astype(jnp.bfloat16), w_bw.astype(jnp.bfloat16)

    def dmask(dir_idx, s):
        pltpu.prng_seed(seed_ref[dir_idx], (n_blocks - 1 - r) * steps + s)
        m = _drop_mask(full_B, H, drop_keep)
        BC = dh_fw_ref.shape[0]
        if BC != full_B:
            m = jax.lax.dynamic_slice(m, (bc * BC, 0), (BC, H))
        return m

    for s in reversed(range(steps)):
        # Forward direction (no carry mask: padding trails).
        c_t = c_hi_fw_ref[0] if s == steps - 1 else c_lo_fw_ref[s + 1]
        g_s = g_fw_ref[s]
        if seed_ref is not None:
            g_s = g_s * dmask(0, s)
        dgates, dh_new, dc_new, dwh = _bwd_step(
            w_fw, h_fw_ref[s], c_lo_fw_ref[s], c_t, x_fw_ref[s], g_s,
            None, dc_fw_ref[:], dh_fw_ref[:], H, bf16_matmul)
        dx_fw_ref[s] = dgates.astype(dx_fw_ref.dtype)
        dh_fw_ref[:] = dh_new
        dc_fw_ref[:] = dc_new
        dwfw_ref[:] += dwh

        # Backward direction (time-flipped inputs; padding leads -> valid).
        c_t = c_hi_bw_ref[0] if s == steps - 1 else c_lo_bw_ref[s + 1]
        g_s = g_bw_ref[s]
        if seed_ref is not None:
            g_s = g_s * dmask(1, s)
        dgates, dh_new, dc_new, dwh = _bwd_step(
            w_bw, h_bw_ref[s], c_lo_bw_ref[s], c_t, x_bw_ref[s], g_s,
            mask_ref[s], dc_bw_ref[:], dh_bw_ref[:], H, bf16_matmul)
        dx_bw_ref[s] = dgates.astype(dx_bw_ref.dtype)
        dh_bw_ref[:] = dh_new
        dc_bw_ref[:] = dc_new
        dwbw_ref[:] += dwh


def _bwd_bidir_choice(T: int, B: int, H: int):
    """(S, BC) for the fused dual-direction backward, or None (fall back to
    two single-direction launches). Wide-tier budget: both directions'
    blocked refs + W copies + two dW accumulators resident.

    MEASURED NEGATIVE at the flagship shape (round 4): 17.95 vs 16.19 ms
    full step (0.90x) despite exact numerics — the backward is
    throughput-bound (3 MXU matmuls + heavy VPU per step leave no
    dependency bubbles for the second chain to fill), so fusing only adds
    VMEM pressure, unlike the latency-bound forward where the same fusion
    won. Kept opt-in (E2E_ASR_BIDIR_BWD_FUSED=1) for re-probing on other
    hardware; exactness is pinned either way (tests/test_lstm_pallas.py
    runs both paths in interpret mode)."""
    import os
    if not os.environ.get("E2E_ASR_BIDIR_BWD_FUSED"):
        return None
    s_opts = tuple(S for S in STEP_BLOCKS if S > 1 and T % S == 0)
    for div in (1, 2, 4, 8):
        if B % div:
            continue
        for s_try in s_opts:
            if 2 * _bwd_vmem_bytes(s_try, B // div, H) <= VMEM_BUDGET_WIDE:
                return (s_try, B // div)
    return None


def _bwd_seq_bidir(w_fw, w_bw, h_fw, c_fw, xp_fw, g_fw,
                   h_bw, c_bw, xp_bw, g_bw, mask_bw, *,
                   bf16_matmul: bool, drop: tuple | None = None):
    """Fused dual-direction backward: (dx_fw, dw_fw, dx_bw, dw_bw), or None
    when the config doesn't fit (caller runs two _bwd_seq launches).
    drop: (seeds [2] int32, keep)."""
    T, B, H = h_fw.shape
    H4 = 4 * H
    choice = _bwd_bidir_choice(T, B, H)
    if choice is None:
        return None
    S, BC = choice
    n_blocks = T // S
    n_bc = B // BC

    def pad_states(h_seq, c_seq):
        def pad(x):
            zrow = jnp.zeros((1, B, H), x.dtype)
            extra = jnp.zeros((S - 1, B, H), x.dtype)
            return jnp.concatenate([zrow, x, extra], axis=0)
        return pad(h_seq), pad(c_seq)

    h_pad_fw, c_pad_fw = pad_states(h_fw, c_fw)
    h_pad_bw, c_pad_bw = pad_states(h_bw, c_bw)

    rev_x = lambda bc, r: (n_blocks - 1 - r, bc, 0)      # noqa: E731
    blk = lambda bc, r: (n_blocks - 1 - r, bc, 0)        # noqa: E731
    blk1 = lambda bc, r: (n_blocks - r, bc, 0)           # noqa: E731
    w_spec = pl.BlockSpec((H, H4), lambda bc, r: (0, 0),
                          memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((S, BC, H), blk, memory_space=pltpu.VMEM)
    state_spec1 = pl.BlockSpec((S, BC, H), blk1, memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((S, BC, H4), rev_x, memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((S, BC, H), rev_x, memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((S, BC, 1), rev_x, memory_space=pltpu.VMEM)

    in_specs = []
    args = []
    if drop is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(drop[0])
    in_specs += [w_spec, w_spec,
                 state_spec, state_spec, state_spec1, x_spec, g_spec,
                 state_spec, state_spec, state_spec1, x_spec, g_spec,
                 mask_spec]
    args += [w_fw, w_bw,
             h_pad_fw, c_pad_fw, c_pad_fw, xp_fw, g_fw,
             h_pad_bw, c_pad_bw, c_pad_bw, xp_bw, g_bw,
             mask_bw]
    out_specs = [
        pl.BlockSpec((S, BC, H4), rev_x, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, BC, H4), rev_x, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H4), lambda bc, r: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H4), lambda bc, r: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, B, H4), xp_fw.dtype),
        jax.ShapeDtypeStruct((T, B, H4), xp_bw.dtype),
        jax.ShapeDtypeStruct((H, H4), jnp.float32),
        jax.ShapeDtypeStruct((H, H4), jnp.float32),
    ]
    kernel = functools.partial(
        _bwd_kernel_bidir, steps=S, bf16_matmul=bf16_matmul,
        drop_keep=None if drop is None else drop[1], full_B=B,
        n_blocks=n_blocks)
    dx_fw, dx_bw, dw_fw, dw_bw = pl.pallas_call(
        kernel,
        grid=(n_bc, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((BC, H), jnp.float32) for _ in range(4)],
        interpret=_interpret() if drop is None else _interp_mode(),
        compiler_params=_wide_params(),
    )(*args)
    return dx_fw, dw_fw, dx_bw, dw_bw


# ---------------------------------------------------------------------------
# Public API (custom VJP)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_seq(x_proj: Array, w_h: Array, drop_seed: Array | None = None,
             bf16_matmul: bool = False, drop_keep: float = 1.0) -> Array:
    """Fused LSTM over time. x_proj: [T,B,4H] = x@W_x + b; w_h: [H,4H].

    Returns h_seq [T,B,H] from zero initial state (unmasked — caller masks).
    bf16_matmul runs the recurrent matmuls on the MXU in bfloat16 (gates and
    states stay f32). drop_seed [1] int32 + drop_keep < 1: in-kernel PRNG
    output dropout (per-absolute-step seeding, replayed in the Pallas
    backward; the recurrent state stays un-dropped) — gate with
    kernel_dropout_ok_uni().
    """
    use_drop = drop_keep < 1.0
    (h_seq,) = _fwd_seq(x_proj, w_h, save_c=False, bf16_matmul=bf16_matmul,
                        drop=(drop_seed, drop_keep) if use_drop else None)
    return h_seq


def _lstm_seq_fwd(x_proj, w_h, drop_seed, bf16_matmul, drop_keep):
    use_drop = drop_keep < 1.0
    outs = _fwd_seq(x_proj, w_h, save_c=True, bf16_matmul=bf16_matmul,
                    drop=(drop_seed, drop_keep) if use_drop else None)
    if use_drop:
        h_seq, clean, c_seq = outs
    else:
        h_seq, c_seq = outs
        clean = h_seq
    return h_seq, (x_proj, w_h, drop_seed, clean, c_seq)


def _lstm_seq_bwd(bf16_matmul, drop_keep, res, g):
    x_proj, w_h, drop_seed, h_seq, c_seq = res
    use_drop = drop_keep < 1.0
    d_seed = None if drop_seed is None else jnp.zeros_like(drop_seed)
    dx, dwh = _bwd_seq(w_h, h_seq, c_seq, x_proj, g, bf16_matmul=bf16_matmul,
                       drop=(drop_seed, drop_keep) if use_drop else None)
    # x_proj may be stored bf16 (bandwidth; cells.lstm_precompute_inputs
    # out_dtype) — the cotangent dtype must match the primal's.
    return dx.astype(x_proj.dtype), dwh, d_seed


lstm_seq.defvjp(_lstm_seq_fwd, _lstm_seq_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_seq_masked(x_proj: Array, w_h: Array, mask: Array,
                    drop_seed: Array | None = None,
                    bf16_matmul: bool = False,
                    drop_keep: float = 1.0) -> Array:
    """Fused LSTM with per-step carry-through masking.

    mask: [T, B, 1] f32 (1=valid frame, 0=padding): padded steps leave (c, h)
    unchanged. Used for the backward direction of bidirectional layers (inputs
    time-flipped, padding leading). The emitted h at padded steps is the
    carried state, NOT zero — callers multiply by the mask afterwards
    (rnn.rnn_layer does). drop_seed/drop_keep: see lstm_seq.
    """
    use_drop = drop_keep < 1.0
    (h_seq,) = _fwd_seq(x_proj, w_h, save_c=False, bf16_matmul=bf16_matmul,
                        mask=mask,
                        drop=(drop_seed, drop_keep) if use_drop else None)
    return h_seq


def _lstm_seq_masked_fwd(x_proj, w_h, mask, drop_seed, bf16_matmul,
                         drop_keep):
    use_drop = drop_keep < 1.0
    outs = _fwd_seq(x_proj, w_h, save_c=True, bf16_matmul=bf16_matmul,
                    mask=mask,
                    drop=(drop_seed, drop_keep) if use_drop else None)
    if use_drop:
        h_seq, clean, c_seq = outs
    else:
        h_seq, c_seq = outs
        clean = h_seq
    return h_seq, (x_proj, w_h, mask, drop_seed, clean, c_seq)


def _lstm_seq_masked_bwd(bf16_matmul, drop_keep, res, g):
    x_proj, w_h, mask, drop_seed, h_seq, c_seq = res
    use_drop = drop_keep < 1.0
    d_seed = None if drop_seed is None else jnp.zeros_like(drop_seed)
    dx, dwh = _bwd_seq(w_h, h_seq, c_seq, x_proj, g,
                       bf16_matmul=bf16_matmul, mask=mask,
                       drop=(drop_seed, drop_keep) if use_drop else None)
    return dx.astype(x_proj.dtype), dwh, jnp.zeros_like(mask), d_seed


lstm_seq_masked.defvjp(_lstm_seq_masked_fwd, _lstm_seq_masked_bwd)
