"""Pallas TPU kernel: fused beam-search selection step.

The beam body's selection machinery (top-k over k*V candidates, EOS
partitioning, live-beam compaction — beam_search.py:293-331 semantics as
restructured in eval/beam.py) is a pile of tiny XLA ops whose launch latency
dominates decode. This kernel computes the whole selection in ONE launch:

  inputs:  scores [B,k], combined log-probs [B,k,Vp] (padded cols = -inf),
           alive mask [B,k], num_finished [B,1]
  outputs (all [B,k] unless noted):
    sel_vals    — top-k candidate scores in rank order
    sel_parent  — parent beam slot per rank
    sel_token   — token id per rank
    accept      — rank < (k - num_finished)                  (1.0/0.0)
    fin_sel     — accepted AND token == eos                  (1.0/0.0)
    fin_dest    — destination slot in the finished buffer (k = dropped)
    order       — live-compaction permutation (live ranks first, stable)
    slot_valid  — new live-slot validity after compaction    (1.0/0.0)

Everything is computed with static k-iteration loops over [B]-vectors — no
serial per-beam matmuls (the failure mode of the fused attention kernel).
Top-k uses iterative max + one-hot masking; ties resolve to the lowest flat
index, matching lax.top_k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
NEG_INF = -1e30
BIG = 1 << 30  # plain int: jnp constants here would be captured by the kernel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _select_kernel(scores, logp, alive, num_fin,
                   vals_o, parent_o, token_o, accept_o, fin_sel_o,
                   fin_dest_o, order_o, slot_valid_o,
                   *, B: int, k: int, Vp: int, eos_id: int):
    flat = (scores[:].reshape(B, k, 1) + logp[:]).reshape(B, k * Vp)
    alive_mask = alive[:].reshape(B, k, 1)
    flat = jnp.where(jnp.broadcast_to(alive_mask, (B, k, Vp)
                                      ).reshape(B, k * Vp) > 0, flat, NEG_INF)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, k * Vp), 1)
    nf = num_fin[:][:, 0].astype(jnp.int32)          # [B]
    num_live = k - nf

    # --- iterative top-k (ties -> lowest index, like lax.top_k) -----------
    idxs = []
    vals = []
    for r in range(k):
        m = jnp.max(flat, axis=1, keepdims=True)                   # [B,1]
        at_max = flat >= m                                          # [B,kV]
        idx = jnp.min(jnp.where(at_max, col, BIG), axis=1)          # [B]
        vals.append(m[:, 0])
        idxs.append(idx)
        flat = jnp.where(col == idx[:, None], NEG_INF, flat)

    ranks_accept = []
    ranks_fin = []
    fin_rank = jnp.zeros((B,), jnp.int32)
    live_count = jnp.zeros((B,), jnp.int32)
    parent = []
    token = []
    fin_dest = []
    for r in range(k):
        p = idxs[r] // Vp
        t = idxs[r] % Vp
        acc = (r < num_live).astype(jnp.float32)
        is_eos = (t == eos_id).astype(jnp.float32)
        fsel = acc * is_eos
        lsel = acc * (1.0 - is_eos)
        dest = jnp.where(fsel > 0, nf + fin_rank, k)
        fin_rank = fin_rank + fsel.astype(jnp.int32)
        live_count = live_count + lsel.astype(jnp.int32)
        parent.append(p)
        token.append(t)
        ranks_accept.append(acc)
        ranks_fin.append(fsel)
        fin_dest.append(dest)

    # --- stable live-first permutation ------------------------------------
    # order[:, j] = the j-th rank r with live_sel; then the rest in order.
    live_sel = [ranks_accept[r] - ranks_fin[r] for r in range(k)]
    # positions: for each rank r, its destination slot if live:
    live_pos = []
    run = jnp.zeros((B,), jnp.int32)
    for r in range(k):
        live_pos.append(jnp.where(live_sel[r] > 0, run, BIG))
        run = run + live_sel[r].astype(jnp.int32)
    # non-live ranks fill the remaining slots in rank order.
    dead_run = run
    for r in range(k):
        live_pos[r] = jnp.where(live_sel[r] > 0, live_pos[r], dead_run)
        dead_run = dead_run + (live_sel[r] <= 0).astype(jnp.int32)

    # Scatter per-rank results into slot-ordered columns via one-hot sums,
    # assembling full [B,k] arrays before the single ref writes.
    order_cols, valid_cols = [], []
    for j in range(k):
        order_j = jnp.zeros((B,), jnp.int32)
        valid_j = jnp.zeros((B,), jnp.float32)
        for r in range(k):
            here = live_pos[r] == j
            order_j = jnp.where(here, r, order_j)
            valid_j = jnp.where(here, live_sel[r], valid_j)
        order_cols.append(order_j[:, None])
        valid_cols.append(valid_j[:, None])

    stack = lambda xs: jnp.concatenate([x[:, None] for x in xs], axis=1)
    order_o[:] = jnp.concatenate(order_cols, axis=1)
    slot_valid_o[:] = jnp.concatenate(valid_cols, axis=1)
    vals_o[:] = stack(vals)
    parent_o[:] = stack(parent)
    token_o[:] = stack(token)
    accept_o[:] = stack(ranks_accept)
    fin_sel_o[:] = stack(ranks_fin)
    fin_dest_o[:] = stack(fin_dest)


def beam_select(scores: Array, logp: Array, alive: Array, num_finished: Array,
                *, eos_id: int = 2):
    """Fused selection. logp: [B,k,V] (V gets lane-padded with -inf inside).

    Returns dict of [B,k] arrays: vals, parent, token, accept, fin_sel,
    fin_dest, order, slot_valid (float masks are 1.0/0.0)."""
    B, k, V = logp.shape
    Vp = -(-V // 128) * 128
    if Vp > V:
        logp = jnp.pad(logp, ((0, 0), (0, 0), (0, Vp - V)),
                       constant_values=NEG_INF)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    shapes = dict(
        vals=jnp.float32, parent=jnp.int32, token=jnp.int32,
        accept=jnp.float32, fin_sel=jnp.float32, fin_dest=jnp.int32,
        order=jnp.int32, slot_valid=jnp.float32)
    out_shape = [jax.ShapeDtypeStruct((B, k), dt) for dt in shapes.values()]
    kernel = functools.partial(_select_kernel, B=B, k=k, Vp=Vp, eos_id=eos_id)
    outs = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in range(4)],
        out_specs=[vspec() for _ in range(len(out_shape))],
        out_shape=out_shape,
        interpret=_interpret(),
    )(scores, logp, alive.astype(jnp.float32),
      num_finished.astype(jnp.float32)[:, None])
    return dict(zip(shapes.keys(), outs))
