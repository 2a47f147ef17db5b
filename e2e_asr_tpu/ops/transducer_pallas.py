"""Pallas TPU kernel: the transducer (RNN-T) lattice loss in one launch.

The XLA path (core/transducer_loss.py) runs the Graves-2012 alpha recurrence
as T sequential `lax.scan` steps, each an O(log U) `associative_scan` over the
label axis — dozens of tiny HBM-bound ops per encoder frame, latency-bound at
the bench lattice shape (B=128, T'=48, U=47: 2.7 ms fwd+bwd measured). This
kernel computes the same recurrence as ONE forward launch and ONE backward
launch:

- Lattices live TIME-major [T, U+1, B] (labels on sublanes, batch on lanes);
  the grid walks (B-blocks, T) with the per-frame rows streamed HBM->VMEM by
  the BlockSpec pipeline, so VMEM holds only a handful of [U+1, B_blk] rows —
  no whole-lattice residency, any T fits the default VMEM budget.
- The in-row first-order recurrence
      alpha[t,u] = logaddexp(alpha[t-1,u] + blank[t-1,u],
                             alpha[t,u-1] + label[t,u-1])
  is a prefix scan of affine maps x -> logaddexp(b, x + a) in the
  (logaddexp, +) semiring, evaluated in ceil(log2(U+1)) Hillis-Steele
  doubling steps built from `pltpu.roll` + iota masks — all-VPU, no
  sublane loops.
- The backward launch is the classic beta pass (same machinery, reversed in
  both t and u) producing the exact occupancy gradients
      d loss / d blank[t,u] = -exp(alpha[t,u] + blank[t,u] + beta[t+1,u] - logZ)
      d loss / d label[t,u] = -exp(alpha[t,u] + label[t,u] + beta[t,u+1] - logZ)
  via a custom VJP (no autodiff through the scan machinery at all). Variable
  encoder/label lengths are handled by injecting the virtual row
  beta[t_len, u] = (u == u_len ? 0 : -BIG) as the carry crosses each
  example's last frame, so one launch serves ragged batches exactly.

Numerics match the XLA path: float32 rows, -1e30 as effective log(0) (finite,
so NaN never appears in logaddexp/exp; magnitudes stay far inside float32
range). Parity — losses and both gradients vs the XLA path and the O(T*U)
NumPy oracle — is pinned by tests/test_transducer_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_asr_tpu.ops.lstm_pallas import _interpret

Array = jax.Array
NEG = -1e30  # effective log(0); finite so (-inf) - (-inf) never appears


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _logaddexp(x, y):
    m = jnp.maximum(x, y)
    return m + jnp.log1p(jnp.exp(jnp.minimum(x, y) - m))


def _shift_down(x, d: int, fill: float, u_iota):
    """x[u] -> x[u - d] along sublanes (u), positions u < d get `fill`."""
    return jnp.where(u_iota >= d, pltpu.roll(x, d, axis=0), fill)


def _shift_up(x, d: int, fill: float, u_iota, U1: int):
    """x[u] -> x[u + d] along sublanes (u), positions u >= U1 - d get `fill`."""
    # pltpu.roll is circular and requires a non-negative shift: -d ≡ U1 - d.
    return jnp.where(u_iota < U1 - d, pltpu.roll(x, U1 - d, axis=0), fill)


def _row_scan_down(a, b, u_iota, U1: int):
    """Inclusive prefix scan of maps x -> logaddexp(b[u], x + a[u]) over
    increasing u; returns the solved row (the maps applied to x[-1] = log 0).
    combine(prev, cur) = (a_p + a_c, logaddexp(b_p + a_c, b_c))."""
    d = 1
    while d < U1:
        a_s = _shift_down(a, d, 0.0, u_iota)
        b_s = _shift_down(b, d, NEG, u_iota)
        a, b = a_s + a, _logaddexp(b_s + a, b)
        d *= 2
    return b


def _row_scan_up(a, b, u_iota, U1: int):
    """Suffix scan of maps x -> logaddexp(b[u], x + a[u]) over decreasing u;
    returns the solved row (maps applied to x[U1] = log 0).
    combine(cur, next) = (a_c + a_n, logaddexp(b_c, b_n + a_c))."""
    d = 1
    while d < U1:
        a_s = _shift_up(a, d, 0.0, u_iota, U1)
        b_s = _shift_up(b, d, NEG, u_iota, U1)
        a, b = a + a_s, _logaddexp(b, b_s + a)
        d *= 2
    return b


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(tl_ref, ul_ref, blank_prev_ref, blank_ref, label_ref,
                loss_ref, alpha_ref, alpha_sc, loss_sc, *, U1, T, Bblk):
    t = pl.program_id(1)
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (U1, Bblk), 0)
    label_row = label_ref[0]                               # [U1, B] (col U=NEG)
    blank_row = blank_ref[0]

    @pl.when(t == 0)
    def _():
        # alpha[0, u] = sum_{j < u} label[0, j]: additive prefix sum of
        # a[u] = label[0, u-1] (a[0] = 0) — plain Hillis-Steele.
        x = _shift_down(label_row, 1, 0.0, u_iota)
        d = 1
        while d < U1:
            x = x + _shift_down(x, d, 0.0, u_iota)
            d *= 2
        alpha_sc[:] = x
        loss_sc[:] = jnp.zeros_like(loss_sc)

    @pl.when(t > 0)
    def _():
        base = alpha_sc[:] + blank_prev_ref[0]             # advance-in-time
        a = _shift_down(label_row, 1, NEG, u_iota)         # a[u]=label[t,u-1]
        alpha_sc[:] = _row_scan_down(a, base, u_iota, U1)

    alpha = alpha_sc[:]
    alpha_ref[0] = alpha
    # loss_b = alpha[t_len-1, u_len] + blank[t_len-1, u_len]: exactly one
    # (t, u) matches per example — accumulate it as a masked reduction.
    sel = (u_iota == ul_ref[:]) & (t == tl_ref[:] - 1)
    loss_sc[:] = loss_sc[:] + jnp.sum(
        jnp.where(sel, alpha + blank_row, 0.0), axis=0, keepdims=True)

    @pl.when(t == T - 1)
    def _():
        loss_ref[:] = -loss_sc[:]


def _fwd_call(tl, ul, blank_t, label_t):
    """tl/ul: [1, Bp] int32 (clamped); blank_t/label_t: [T, U1, Bp] f32
    (label col U = NEG, u >= u_len masked to NEG).
    Returns (loss [1, Bp], alpha [T, U1, Bp])."""
    T, U1, Bp = blank_t.shape
    Bblk = 128 if Bp > 128 else Bp
    n_b = Bp // Bblk
    row = pl.BlockSpec((1, U1, Bblk), lambda b, t: (t, 0, b),
                       memory_space=pltpu.VMEM)
    prev = pl.BlockSpec((1, U1, Bblk),
                        lambda b, t: (jnp.maximum(t - 1, 0), 0, b),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, Bblk), lambda b, t: (0, b),
                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, U1=U1, T=T, Bblk=Bblk)
    return pl.pallas_call(
        kernel,
        grid=(n_b, T),
        in_specs=[vec, vec, prev, row, row],
        out_specs=[vec, row],
        out_shape=[jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((T, U1, Bp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((U1, Bblk), jnp.float32),
                        pltpu.VMEM((1, Bblk), jnp.float32)],
        interpret=_interpret(),
    )(tl, ul, blank_t, blank_t, label_t)


# ---------------------------------------------------------------------------
# Backward (beta pass -> occupancy gradients)
# ---------------------------------------------------------------------------


def _bwd_kernel(tl_ref, ul_ref, scale_ref, logz_ref, blank_ref, label_ref,
                alpha_ref, gblank_ref, glabel_ref, beta_sc, *, U1, T, Bblk):
    rt = T - 1 - pl.program_id(1)                          # real frame index
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (U1, Bblk), 0)
    blank_row = blank_ref[0]
    label_row = label_ref[0]
    alpha_row = alpha_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        beta_sc[:] = jnp.full_like(beta_sc, NEG)

    # Crossing an example's last frame: beta[t_len, u] = (u == u_len ? 0 :
    # log 0) — the virtual exit row the final-blank transition lands on.
    virt = jnp.where(u_iota == ul_ref[:], 0.0, NEG)
    beta_next = jnp.where(rt == tl_ref[:] - 1, virt, beta_sc[:])

    scale = scale_ref[:]                                   # -g_b, [1, B]
    off = logz_ref[:]                                      # logZ_b, [1, B]
    gblank_ref[0] = jnp.exp(alpha_row + blank_row + beta_next - off) * scale

    # beta[t, u] = logaddexp(blank[t,u] + beta[t+1,u],
    #                        label[t,u] + beta[t,u+1])   (suffix scan over u)
    beta = _row_scan_up(label_row, blank_row + beta_next, u_iota, U1)
    glabel_ref[0] = jnp.exp(
        alpha_row + label_row + _shift_up(beta, 1, NEG, u_iota, U1) - off
    ) * scale
    beta_sc[:] = beta


def _bwd_call(tl, ul, scale, logz, blank_t, label_t, alpha):
    T, U1, Bp = blank_t.shape
    Bblk = 128 if Bp > 128 else Bp
    n_b = Bp // Bblk
    rev = pl.BlockSpec((1, U1, Bblk), lambda b, t: (T - 1 - t, 0, b),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, Bblk), lambda b, t: (0, b),
                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, U1=U1, T=T, Bblk=Bblk)
    return pl.pallas_call(
        kernel,
        grid=(n_b, T),
        in_specs=[vec, vec, vec, vec, rev, rev, rev],
        out_specs=[rev, rev],
        out_shape=[jax.ShapeDtypeStruct((T, U1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((T, U1, Bp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((U1, Bblk), jnp.float32)],
        interpret=_interpret(),
    )(tl, ul, scale, logz, blank_t, label_t, alpha)


# ---------------------------------------------------------------------------
# custom-VJP wrapper (original [B, T, U+1] layout)
# ---------------------------------------------------------------------------


def _prepare(blank_lp, label_lp, t_lens, u_lens):
    """Mask/pad/transpose into kernel layout. Returns (tl, ul, blank_t,
    label_t, Bp) — lattices [T, U1, Bp] f32, lens [1, Bp] int32."""
    B, T, U1 = blank_lp.shape
    U = U1 - 1
    Bp = _round_up(B, 128) if B > 128 else _round_up(B, 8)
    tl = jnp.clip(t_lens.astype(jnp.int32), 1, T)
    ul = jnp.clip(u_lens.astype(jnp.int32), 0, U)
    # Forbid emitting past the true label count (same mask as the XLA path),
    # and give the padded u = U column log 0.
    u_idx = jnp.arange(U)[None, None, :]
    label_lp = jnp.where(u_idx < ul[:, None, None],
                         label_lp.astype(jnp.float32), NEG)
    blank_t = jnp.moveaxis(blank_lp.astype(jnp.float32), 0, 2)   # [T, U1, B]
    label_t = jnp.pad(jnp.moveaxis(label_lp, 0, 2), ((0, 0), (0, 1), (0, 0)),
                      constant_values=NEG)                       # [T, U1, B]
    if Bp != B:
        pad = ((0, 0), (0, 0), (0, Bp - B))
        blank_t = jnp.pad(blank_t, pad, constant_values=0.0)
        label_t = jnp.pad(label_t, pad, constant_values=NEG)
        tl = jnp.pad(tl, (0, Bp - B), constant_values=1)
        ul = jnp.pad(ul, (0, Bp - B), constant_values=0)
    return tl[None, :], ul[None, :], blank_t, label_t, Bp


@jax.custom_vjp
def transducer_loss_pallas(blank_lp: Array, label_lp: Array,
                           t_lens: Array, u_lens: Array) -> Array:
    """Per-example transducer NLL [B] — semantics identical to
    core/transducer_loss.transducer_loss (Graves 2012 lattice)."""
    loss, _ = _loss_fwd(blank_lp, label_lp, t_lens, u_lens)
    return loss


def _loss_fwd(blank_lp, label_lp, t_lens, u_lens):
    B = blank_lp.shape[0]
    tl, ul, blank_t, label_t, _ = _prepare(blank_lp, label_lp, t_lens, u_lens)
    loss, alpha = _fwd_call(tl, ul, blank_t, label_t)
    res = (tl, ul, blank_t, label_t, alpha, loss)
    return loss[0, :B], res


def _loss_bwd(res, g):
    tl, ul, blank_t, label_t, alpha, loss = res
    T, U1, Bp = blank_t.shape
    B = g.shape[0]
    gp = jnp.pad(g.astype(jnp.float32), (0, Bp - B)) if Bp != B else g
    scale = -gp.astype(jnp.float32)[None, :]               # d loss = -occ * g
    logz = -loss                                           # [1, Bp]
    gblank_t, glabel_t = _bwd_call(tl, ul, scale, logz, blank_t, label_t,
                                   alpha)
    gblank = jnp.moveaxis(gblank_t[:, :, :B], 2, 0)        # [B, T, U1]
    glabel = jnp.moveaxis(glabel_t[:, :U1 - 1, :B], 2, 0)  # [B, T, U]
    return gblank, glabel, None, None


transducer_loss_pallas.defvjp(_loss_fwd, _loss_bwd)
