"""CTC forced alignment (Viterbi) and decode-time token timestamps.

Production extension beyond the reference (which emits transcripts only,
eval_model.py:97-118): given audio and its transcript, recover WHERE each
token sits in time — the standard CTC forced-alignment recipe over the
blank-interleaved state graph (2U+1 states: even = blank, odd = label u).
Everything is on-device with static shapes: the Viterbi forward is a
`lax.scan` over frames carrying [B, S] scores and storing [T, B, S] int8
backpointers; the backtrace is a second reversed scan — no host round trips,
batched over utterances.

Also provides timestamps for the greedy CTC decode path "for free": in a
best-path decode every emitted token IS a run of identical argmax frames, so
its span is the run's extent (`greedy_timestamps`).

Frame indices are encoder frames; `frames_to_seconds` converts through the
pyramid reduction (eval/longform.reduction_factor) and the log-mel hop
(frontend/logmel.py: 10 ms).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from e2e_asr_tpu.models.ctc import BLANK_ID

Array = jax.Array
NEG_INF = -1e30


def ctc_viterbi_align(log_probs: Array, lens: Array, labels: Array,
                      label_lens: Array) -> tuple[Array, Array]:
    """Most-probable CTC alignment of `labels` to the frame posteriors.

    Args:
        log_probs: [B, T, V] log-softmax frame scores.
        lens: [B] valid frame counts.
        labels: [B, U] token ids (0-padded, no <go>/<eos>, no blanks).
        label_lens: [B] valid label counts.
    Returns:
        (states [B, T] int32 — the Viterbi state path through the
         blank-interleaved graph (frames >= lens hold the end state),
         score [B] — the best alignment's log-prob).
    """
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1
    ll = label_lens.astype(jnp.int32)
    s_idx = jnp.arange(S)[None, :]                              # [1, S]
    is_label = (s_idx % 2) == 1
    lab_of_s = jnp.take_along_axis(
        labels, jnp.maximum(s_idx - 1, 0) // 2, axis=1)         # [B, S]
    sym_of_s = jnp.where(is_label, lab_of_s, BLANK_ID)
    valid_s = s_idx < (2 * ll[:, None] + 1)
    # Skip transition s-2 -> s: s odd, and label[u] != label[u-1].
    prev_lab = jnp.take_along_axis(
        labels, jnp.maximum(s_idx - 3, 0) // 2, axis=1)
    can_skip = is_label & (s_idx >= 2) & (lab_of_s != prev_lab)

    def emit(t_lp):
        return jnp.take_along_axis(t_lp, sym_of_s, axis=1)      # [B, S]

    lp0 = emit(log_probs[:, 0])
    alpha0 = jnp.where((s_idx <= 1) & valid_s, lp0, NEG_INF)

    def shift(a, by):
        return jnp.pad(a, ((0, 0), (by, 0)),
                       constant_values=NEG_INF)[:, :S]

    def fwd(alpha, xs):
        t_lp, t = xs
        cand = jnp.stack([alpha, shift(alpha, 1),
                          jnp.where(can_skip, shift(alpha, 2), NEG_INF)],
                         axis=-1)                               # [B, S, 3]
        bp = jnp.argmax(cand, axis=-1).astype(jnp.int8)
        best = jnp.max(cand, axis=-1) + emit(t_lp)
        best = jnp.where(valid_s, best, NEG_INF)
        live = (t < lens)[:, None]
        alpha_new = jnp.where(live, best, alpha)
        bp = jnp.where(live, bp, 0)
        return alpha_new, bp

    alpha, bps = lax.scan(fwd, alpha0,
                          (jnp.swapaxes(log_probs[:, 1:], 0, 1),
                           jnp.arange(1, T)))
    bps = jnp.concatenate([jnp.zeros((1, B, S), jnp.int8), bps], axis=0)

    # End states: last blank (2*ll) and last label (2*ll - 1, when ll > 0).
    b_idx = jnp.arange(B)
    e_blank = 2 * ll
    e_label = jnp.maximum(2 * ll - 1, 0)
    a_blank = alpha[b_idx, e_blank]
    a_label = jnp.where(ll > 0, alpha[b_idx, e_label], NEG_INF)
    end_state = jnp.where(a_blank >= a_label, e_blank, e_label)
    score = jnp.maximum(a_blank, a_label)

    # Backtrace: state[t] = state[t+1] - bp[t+1, state[t+1]].
    bp_next = jnp.concatenate([bps[1:], jnp.zeros((1, B, S), jnp.int8)],
                              axis=0)                           # bp[t+1]

    def back(cur, xs):
        t, bp_n = xs
        stepped = cur - jnp.take_along_axis(
            bp_n, cur[:, None], axis=1)[:, 0].astype(jnp.int32)
        cur = jnp.where(t >= lens.astype(jnp.int32) - 1, end_state, stepped)
        return cur, cur

    _, states_rev = lax.scan(
        back, end_state,
        (jnp.arange(T)[::-1], jnp.flip(bp_next, axis=0)))
    states = jnp.flip(jnp.swapaxes(states_rev, 0, 1), axis=1)   # [B, T]
    return states, score


def token_spans(states: Array, lens: Array, label_lens: Array, U: int
                ) -> tuple[Array, Array]:
    """Per-token frame spans from a Viterbi state path.

    U is the labels' static width (the state graph held 2U+1 states).
    Returns (starts [B, U], ends [B, U]) inclusive encoder-frame indices;
    -1 past label_lens."""
    B, T = states.shape
    t_idx = jnp.arange(T)[None, :]
    in_range = t_idx < lens.astype(jnp.int32)[:, None]
    tok_u = jnp.where((states % 2 == 1) & in_range,
                      (states - 1) // 2, -1)                    # [B, T]
    eq = tok_u[:, :, None] == jnp.arange(U)[None, None, :]      # [B, T, U]
    t3 = t_idx[:, :, None]
    starts = jnp.min(jnp.where(eq, t3, T), axis=1)
    ends = jnp.max(jnp.where(eq, t3, -1), axis=1)
    u_valid = jnp.arange(U)[None, :] < label_lens.astype(jnp.int32)[:, None]
    return (jnp.where(u_valid, starts, -1).astype(jnp.int32),
            jnp.where(u_valid, ends, -1).astype(jnp.int32))


def ctc_forced_align(params: dict, cfg, feats: Array, feat_lens: Array,
                     labels: Array, label_lens: Array, *, compute_dtype=None
                     ) -> tuple[Array, Array, Array]:
    """Audio + transcript -> per-token encoder-frame spans.

    Returns (starts [B, U], ends [B, U], score [B]). Jittable end to end."""
    from e2e_asr_tpu.models import ctc

    lg, enc_lens = ctc.logits(params, cfg, feats, feat_lens,
                              compute_dtype=compute_dtype)
    lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
    states, score = ctc_viterbi_align(lp, enc_lens, labels, label_lens)
    starts, ends = token_spans(states, enc_lens, label_lens,
                               labels.shape[1])
    return starts, ends, score


def greedy_timestamps(lg: Array, enc_lens: Array
                      ) -> tuple[Array, Array, Array, Array]:
    """Best-path decode WITH spans: (tokens, starts, ends [B, T], n [B]).

    tokens match models/ctc.best_path_from_logits exactly (left-packed,
    0-padded); starts/ends are the emitting argmax run's extent."""
    B, T, _ = lg.shape
    ids = jnp.argmax(lg, axis=-1)
    t_idx = jnp.arange(T)[None, :]
    valid_t = t_idx < enc_lens.astype(jnp.int32)[:, None]
    prev = jnp.concatenate([jnp.full((B, 1), -1, ids.dtype), ids[:, :-1]],
                           axis=1)
    keep = (ids != BLANK_ID) & (ids != prev) & valid_t
    # Run end at t: last valid frame of its identical-argmax run.
    nxt = jnp.concatenate([ids[:, 1:], jnp.full((B, 1), -1, ids.dtype)],
                          axis=1)
    last_valid = enc_lens.astype(jnp.int32)[:, None] - 1
    boundary = (ids != nxt) | (t_idx >= last_valid)
    run_end = lax.cummin(jnp.where(boundary, t_idx, T), axis=1, reverse=True)
    run_end = jnp.minimum(run_end, jnp.maximum(last_valid, 0))
    order = jnp.argsort(~keep, axis=1, stable=True)
    pick = lambda a: jnp.take_along_axis(a, order, axis=1)
    pk = pick(keep)
    tokens = jnp.where(pk, pick(ids), 0)
    starts = jnp.where(pk, pick(jnp.broadcast_to(t_idx, (B, T))), -1)
    ends = jnp.where(pk, pick(run_end), -1)
    return (tokens.astype(jnp.int32), starts.astype(jnp.int32),
            ends.astype(jnp.int32), keep.sum(axis=1).astype(jnp.int32))


def frames_to_seconds(frames: Array, cfg, *, hop_length: int = 160,
                      sample_rate: int = 16000) -> Array:
    """Encoder-frame indices -> seconds through the pyramid reduction and
    the log-mel hop (frontend/logmel.py)."""
    from e2e_asr_tpu.eval.longform import reduction_factor

    r = reduction_factor(cfg)
    return frames * (r * hop_length / sample_rate)


def word_timestamps(ids, starts, ends, rev_vocab: list[str], cfg, *,
                    hop_length: int = 160, sample_rate: int = 16000
                    ) -> list[tuple[str, float, float]]:
    """Group per-token spans into word spans.

    A token whose vocab piece is or starts with the '▁' separator opens a
    new word (data/text.py:ids_to_sentence conventions — char vocabs carry a
    standalone '▁' token, BPE pieces may embed it as a prefix). End frames
    are inclusive encoder frames; the returned times are [start, end+1) in
    seconds. Host-side helper for serving output."""
    from e2e_asr_tpu.eval.longform import reduction_factor

    sec = reduction_factor(cfg) * hop_length / sample_rate
    words: list[tuple[str, float, float]] = []
    cur, s0, e0 = "", -1, -1
    for i, tid in enumerate(int(x) for x in ids):
        piece = rev_vocab[tid] if 0 <= tid < len(rev_vocab) else ""
        if piece.startswith("<"):               # specials never emit text
            continue
        if piece.startswith("▁") and cur:       # separator closes the word
            words.append((cur, s0 * sec, (e0 + 1) * sec))
            cur, s0 = "", -1
        visible = piece.replace("▁", "")
        if visible:
            if not cur:
                s0 = int(starts[i])
            e0 = int(ends[i])
            cur += visible
    if cur:
        words.append((cur, s0 * sec, (e0 + 1) * sec))
    return words
