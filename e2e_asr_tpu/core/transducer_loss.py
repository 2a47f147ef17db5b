"""RNN-T (transducer) loss as a TPU-friendly lattice recurrence.

An extension beyond the reference (which is attention-decoder only,
/root/reference/seq2seq_model.py): the transducer objective marginalizes over
all monotonic alignments of U labels to T encoder frames on the (T, U+1)
lattice (Graves 2012, arXiv:1211.3711).

TPU-first design — no per-cell Python, no dynamic shapes:

- The alpha recurrence runs as ONE `lax.scan` over encoder time. Within each
  time row, alpha[t, u] depends on alpha[t, u-1] (a first-order linear
  recurrence in the log semiring), which is computed in O(log U) depth with
  `lax.associative_scan` over the affine maps x -> logaddexp(b, x + a):
  compose((a1,b1),(a2,b2)) = (a1+a2, logaddexp(b1+a2, b2)). The whole loss is
  therefore T sequential steps of fully-vectorized [B, U+1] work — the XLA
  analogue of the warp-per-diagonal CUDA kernels used on GPU.
- Gradients come from autodiff through the recurrence: d loss / d log_prob is
  exactly the lattice occupancy (the classic beta pass), with no hand-written
  backward to keep in sync.
- Inputs are the two per-lattice-node log-probabilities only (blank and
  emit-the-next-label), NOT the full [B, T, U+1, V] tensor — the model
  computes them frame-chunk-wise under jax.checkpoint (models/transducer.py)
  so the full joint is never resident.

Padding: -BIG (not -inf) keeps logaddexp/where gradients NaN-free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array
NEG = -1e30  # effective log(0); finite so (-inf) - (-inf) never appears


def _log_affine_combine(e1, e2):
    """Compose affine maps in the (logaddexp, +) semiring.

    Map i is x -> logaddexp(b_i, x + a_i); returns map2 ∘ map1 (apply 1 then
    2), which is what associative_scan's left-to-right prefix needs.
    """
    a1, b1 = e1
    a2, b2 = e2
    return a1 + a2, jnp.logaddexp(b1 + a2, b2)


def _row_recurrence(base: Array, label_lp_row: Array) -> Array:
    """Solve x[u] = logaddexp(base[u], x[u-1] + label_lp_row[u-1]) over u.

    base: [..., U+1] (the advance-in-time term, already includes alpha[t-1]);
    label_lp_row: [..., U] (emit log-probs along this time row).
    Returns the full row x: [..., U+1].
    """
    Up1 = base.shape[-1]
    # a[0] = log 0: x[0] = base[0] has no left neighbor.
    a = jnp.concatenate(
        [jnp.full(base.shape[:-1] + (1,), NEG, base.dtype), label_lp_row],
        axis=-1)
    _, x = jax.lax.associative_scan(_log_affine_combine, (a, base), axis=-1)
    del Up1
    return x


def transducer_loss(blank_lp: Array, label_lp: Array, t_lens: Array,
                    u_lens: Array, *, impl: str = "auto") -> Array:
    """Negative log-likelihood of the label sequences, per example.

    blank_lp: [B, T, U+1] — log P(blank | t, u) at each lattice node.
    label_lp: [B, T, U]   — log P(labels[u] | t, u) (emit the NEXT label).
    t_lens:   [B] int — true encoder lengths (frames).
    u_lens:   [B] int — true label counts.

    Returns [B] float32: -log P(labels | acoustics). Lattice semantics match
    Graves 2012: alpha[0,0]=0; alpha[t,u] = logaddexp(
    alpha[t-1,u] + blank_lp[t-1,u], alpha[t,u-1] + label_lp[t,u-1]); loss =
    -(alpha[T-1, U] + blank_lp[T-1, U]).

    impl: "auto" (fused Pallas lattice kernel unless disabled via
    E2E_ASR_NO_PALLAS), "pallas", or "xla". The Pallas path carries a custom
    VJP with the exact occupancy gradients (ops/transducer_pallas.py); the
    scan below is the always-correct fallback and test oracle.
    """
    from e2e_asr_tpu.core.rnn import use_pallas_lstm
    if impl == "pallas" or (impl == "auto" and use_pallas_lstm()):
        from e2e_asr_tpu.ops import transducer_pallas
        return transducer_pallas.transducer_loss_pallas(
            blank_lp.astype(jnp.float32), label_lp.astype(jnp.float32),
            t_lens, u_lens)
    B, T, Up1 = blank_lp.shape
    U = Up1 - 1
    blank_lp = blank_lp.astype(jnp.float32)
    label_lp = label_lp.astype(jnp.float32)
    u_lens = u_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)

    # Forbid emitting past the true label count (padded label positions).
    u_idx = jnp.arange(U)[None, None, :]
    label_lp = jnp.where(u_idx < u_lens[:, None, None], label_lp, NEG)

    # Row 0: pure emission prefix sums (no time step has happened yet).
    first = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32),
         jnp.cumsum(label_lp[:, 0, :], axis=-1)], axis=-1)        # [B, U+1]

    def step(alpha_prev, xs):
        blank_prev, label_cur = xs       # [B,U+1] at t-1, [B,U] at t
        base = alpha_prev + blank_prev
        alpha = _row_recurrence(base, label_cur)
        return alpha, alpha

    # Rows 1..T-1 consume blank_lp[t-1] and label_lp[t].
    if T > 1:
        xs = (jnp.swapaxes(blank_lp[:, :-1], 0, 1),
              jnp.swapaxes(label_lp[:, 1:], 0, 1))
        _, rest = jax.lax.scan(step, first, xs)                   # [T-1,B,U+1]
        alpha = jnp.concatenate([first[None], rest], axis=0)      # [T,B,U+1]
    else:
        alpha = first[None]

    # Gather alpha[t_len-1, b, u_len] + blank_lp[b, t_len-1, u_len].
    b_idx = jnp.arange(B)
    t_last = jnp.clip(t_lens - 1, 0, T - 1)
    final_alpha = alpha[t_last, b_idx, u_lens]
    final_blank = blank_lp[b_idx, t_last, u_lens]
    return -(final_alpha + final_blank)


def transducer_loss_reference(blank_lp, label_lp, t_lens, u_lens):
    """O(T*U) double-scan oracle (same semantics, no associative_scan) —
    kept for tests; do not use in training."""
    import numpy as np

    blank_lp = np.asarray(blank_lp, np.float64)
    label_lp = np.asarray(label_lp, np.float64)
    B, T, Up1 = blank_lp.shape
    out = np.zeros((B,), np.float64)
    for b in range(B):
        Tb, Ub = int(t_lens[b]), int(u_lens[b])
        alpha = np.full((Tb, Ub + 1), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(Tb):
            for u in range(Ub + 1):
                if t == 0 and u == 0:
                    continue
                cands = []
                if t > 0:
                    cands.append(alpha[t - 1, u] + blank_lp[b, t - 1, u])
                if u > 0:
                    cands.append(alpha[t, u - 1] + label_lp[b, t, u - 1])
                alpha[t, u] = np.logaddexp.reduce(cands)
        out[b] = -(alpha[Tb - 1, Ub] + blank_lp[b, Tb - 1, Ub])
    return out
