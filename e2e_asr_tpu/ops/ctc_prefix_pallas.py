"""Pallas TPU kernel: the per-beam-step CTC prefix-score frame scan.

One-pass joint CTC/attention decoding (eval/ctc_prefix.py) re-runs a
T-frame forward recurrence for every candidate extension at EVERY beam
step. On XLA that is a `lax.scan` of ~7 tiny [B*k, P] elementwise ops per
frame — 120 steps x T_enc frames of launch-latency-bound work that measured
9.7x (full vocab) / 3.0x (pre-beam) the cost of the plain attention beam
(VALIDATION round-3 decode-feature table). This kernel runs the WHOLE frame
scan in one launch per beam step:

- Everything indexed by candidate is gathered/broadcast OUTSIDE (one XLA
  gather per beam step, no [B,k,T,V] materialization), so the kernel body is
  pure VPU arithmetic on [B*k, P] tiles.
- The grid walks frame blocks of S=8 with the recurrence carries
  (r^n, r^b, psi, phi) in VMEM scratch; rows stream HBM<->VMEM through the
  BlockSpec pipeline, so any T fits the default VMEM budget.
- Frames are padded to a multiple of S with log-0 rows — the recurrence is
  already closed over them (a log-0 emission row leaves psi unchanged and
  decays r^n/r^b, exactly how frames past enc_lens are handled everywhere).

The recurrence (Watanabe/Hori joint decoding, per frame t):
    rn_t  = lse(rn_{t-1}, phi_{t-1}) + x_t[c]
    rb_t  = lse(rb_{t-1}, rn_{t-1}) + x_t[blank]
    psi_t = lse(psi_{t-1}, phi_{t-1} + x_t[c])
    phi_t = lse(rb^par_t, rn^par_t + allow)   (allow = 0 / log-0 repeat mask)
semantics and numerics identical to CTCPrefixScorer's scan — parity is
pinned by tests/test_ctc_prefix_pallas.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_asr_tpu.ops.lstm_pallas import _interpret

Array = jax.Array
NEG_INF = -1e30
S = 8                    # frames per grid step (static in-kernel unroll)
VMEM_BUDGET = 12 * 1024 * 1024


def supported(BK: int, P: int) -> bool:
    """Carries + one S-frame block of every operand must fit VMEM."""
    return (4 + 2 + 3 * S) * BK * P * 4 <= VMEM_BUDGET


def _lse(a, b):
    m = jnp.maximum(jnp.maximum(a, b), NEG_INF)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def _kernel(xc_ref, xb_ref, rnp_ref, rbp_ref, alw_ref, phi0_ref,
            psi_ref, rn_ref, rb_ref, rn_sc, rb_sc, psi_sc, phi_sc,
            *, n_blocks):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        rn_sc[:] = jnp.full_like(rn_sc, NEG_INF)
        rb_sc[:] = jnp.full_like(rb_sc, NEG_INF)
        psi_sc[:] = jnp.full_like(psi_sc, NEG_INF)
        phi_sc[:] = phi0_ref[:]

    alw = alw_ref[:]
    for s in range(S):
        xc = xc_ref[s]                                 # [BK, P]
        rn_p, rb_p, phi_p = rn_sc[:], rb_sc[:], phi_sc[:]
        rn_t = _lse(rn_p, phi_p) + xc
        rb_t = _lse(rb_p, rn_p) + xb_ref[s]            # [BK, 1] broadcasts
        psi_sc[:] = _lse(psi_sc[:], phi_p + xc)
        phi_sc[:] = _lse(rbp_ref[s], rnp_ref[s] + alw)
        rn_sc[:] = rn_t
        rb_sc[:] = rb_t
        rn_ref[s] = rn_t
        rb_ref[s] = rb_t

    @pl.when(t == n_blocks - 1)
    def _():
        psi_ref[:] = psi_sc[:]


def prefix_scan(xc: Array, xb: Array, rn_par: Array, rb_par: Array,
                allow_neg: Array, phi0: Array):
    """Run the whole T-frame prefix recurrence in one launch.

    xc:        [T, BK, P] f32 — candidate emission log-probs per frame.
    xb:        [T, BK, 1] f32 — blank log-prob per frame.
    rn_par/rb_par: [T, BK, 1] f32 — the parent hypothesis's forward vars.
    allow_neg: [BK, P] f32 — 0 where candidate != last label, log-0 else.
    phi0:      [BK, P] f32 — initial phi (empty-prefix handling).
    Returns (psi_f [BK, P], rn_seq [T, BK, P], rb_seq [T, BK, P]).
    """
    T, BK, P = xc.shape
    pad = (-T) % S
    if pad:
        padw = ((0, pad), (0, 0), (0, 0))
        xc = jnp.pad(xc, padw, constant_values=NEG_INF)
        xb = jnp.pad(xb, padw, constant_values=NEG_INF)
        rn_par = jnp.pad(rn_par, padw, constant_values=NEG_INF)
        rb_par = jnp.pad(rb_par, padw, constant_values=NEG_INF)
    n_blocks = (T + pad) // S
    blk = lambda t: (t, 0, 0)                                  # noqa: E731
    row = pl.BlockSpec((S, BK, P), blk, memory_space=pltpu.VMEM)
    col = pl.BlockSpec((S, BK, 1), blk, memory_space=pltpu.VMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, n_blocks=n_blocks)
    psi_f, rn_seq, rb_seq = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[row, col, col, col, const, const],
        out_specs=[const, row, row],
        out_shape=[jax.ShapeDtypeStruct((BK, P), jnp.float32),
                   jax.ShapeDtypeStruct((T + pad, BK, P), jnp.float32),
                   jax.ShapeDtypeStruct((T + pad, BK, P), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((BK, P), jnp.float32) for _ in range(4)],
        interpret=_interpret(),
    )(xc, xb, rn_par, rb_par, allow_neg, phi0)
    return psi_f, rn_seq[:T], rb_seq[:T]
