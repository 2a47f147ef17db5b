"""On-device CTC prefix beam search (fixed shapes, batched).

Extends the CTC model family (models/ctc.py) beyond best-path decoding with
the standard prefix beam search (Hannun et al. 2014): each beam tracks a
prefix with separate log-masses for "ends in blank" (p_b) and "ends in
non-blank" (p_nb); per frame every prefix is (a) kept with blank / repeated
last token (collapsing) and (b) extended by every non-blank token, and the
top-k prefixes by total mass survive. All shapes are static: prefixes live in
a [B, k, T] buffer, the frame loop is a lax.scan, selection is lax.top_k —
the same shape discipline as the attention beam (eval/beam.py).

Documented approximation (common to fixed-shape implementations): identical
prefixes reached through different parents are NOT merged mid-search, so a
prefix's mass may split across beam slots; callers that need calibrated
scores can merge equal survivors afterwards (tests do, and validate the
merged masses against exact enumeration).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1e30


def _lse(a: Array, b: Array) -> Array:
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    return m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))


def ctc_beam_decode(log_probs: Array, lens: Array, *, beam_size: int = 8,
                    blank_id: int = 0
                    ) -> tuple[Array, Array, Array]:
    """Prefix beam search over per-frame log-probs.

    Args:
        log_probs: [B, T, V] log-softmaxed frame posteriors.
        lens: [B] valid frame counts.
    Returns:
        (prefixes [B, k, T] int32 0-padded, prefix_lens [B, k] int32,
         scores [B, k] total log-mass), beams sorted best-first.
    """
    B, T, V = log_probs.shape
    k = beam_size

    seqs0 = jnp.zeros((B, k, T), jnp.int32)
    lens0 = jnp.zeros((B, k), jnp.int32)
    # Beam 0 = the empty prefix with certainty; the rest dead.
    pb0 = jnp.full((B, k), NEG_INF).at[:, 0].set(0.0)
    pnb0 = jnp.full((B, k), NEG_INF)
    last0 = jnp.full((B, k), -1, jnp.int32)

    b_idx = jnp.arange(B)[:, None]

    def step(carry, xs):
        seqs, seq_lens, pb, pnb, last = carry
        lp, valid = xs                                  # [B, V], [B]

        lp_blank = lp[:, blank_id][:, None]             # [B, 1]
        safe_last = jnp.maximum(last, 0)
        lp_last = jnp.take_along_axis(lp, safe_last, axis=1)   # [B, k]
        total = _lse(pb, pnb)                           # [B, k]

        # (a) keep the prefix: blank after anything, or repeat of last.
        pb_stay = total + lp_blank
        pnb_stay = jnp.where(last >= 0, pnb + lp_last, NEG_INF)
        stay_total = _lse(pb_stay, pnb_stay)

        # (b) extend with v != blank: repeats of `last` must come FROM the
        # blank-ending mass (else they collapse into the same prefix).
        is_last = (jnp.arange(V)[None, None, :] == last[:, :, None])
        base = jnp.where(is_last, pb[:, :, None], total[:, :, None])
        ext = base + lp[:, None, :]                     # [B, k, V]
        ext = ext.at[:, :, blank_id].set(NEG_INF)

        # Select top-k among k stay + k*V extend candidates.
        cand = jnp.concatenate([stay_total, ext.reshape(B, k * V)], axis=1)
        vals, idx = jax.lax.top_k(cand, k)              # [B, k]
        is_stay = idx < k
        parent = jnp.where(is_stay, idx, (idx - k) // V)
        token = jnp.where(is_stay, 0, (idx - k) % V).astype(jnp.int32)

        g = lambda a: jnp.take_along_axis(a, parent, axis=1)  # noqa: E731
        new_seqs = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
        p_lens = g(seq_lens)
        ext_seqs = new_seqs.at[b_idx, jnp.arange(k)[None, :],
                               p_lens].set(token)
        new_pb = jnp.where(is_stay, g(pb_stay), NEG_INF)
        new_pnb = jnp.where(
            is_stay, g(pnb_stay),
            jnp.take_along_axis(ext.reshape(B, k * V),
                                jnp.maximum(idx - k, 0), axis=1))
        new_last = jnp.where(is_stay, g(last), token)
        new_lens = jnp.where(is_stay, p_lens, p_lens + 1)
        new_seqs = jnp.where(is_stay[:, :, None], new_seqs, ext_seqs)

        # Past each utterance's length the state is frozen.
        keep = valid[:, None]
        out = (jnp.where(keep[:, :, None], new_seqs, seqs),
               jnp.where(keep, new_lens, seq_lens),
               jnp.where(keep, new_pb, pb),
               jnp.where(keep, new_pnb, pnb),
               jnp.where(keep, new_last, last))
        return out, None

    t = jnp.arange(T)
    valid_seq = (t[None, :] < lens.astype(jnp.int32)[:, None])  # [B, T]
    xs = (jnp.swapaxes(log_probs, 0, 1), jnp.swapaxes(valid_seq, 0, 1))
    (seqs, seq_lens, pb, pnb, _), _ = jax.lax.scan(
        step, (seqs0, lens0, pb0, pnb0, last0), xs)

    scores = _lse(pb, pnb)
    order = jnp.argsort(-scores, axis=1, stable=True)
    return (jnp.take_along_axis(seqs, order[:, :, None], axis=1),
            jnp.take_along_axis(seq_lens, order, axis=1),
            jnp.take_along_axis(scores, order, axis=1))


def ctc_beam_search(params: dict, cfg, feats: Array, feat_lens: Array, *,
                    beam_size: int = 8, compute_dtype=None
                    ) -> tuple[Array, Array]:
    """End-to-end: encoder + CTC head + prefix beam search.

    Returns (tokens [B, T_enc] of the best prefix, lens [B])."""
    from e2e_asr_tpu.models import ctc

    lg, enc_lens = ctc.logits(params, cfg, feats, feat_lens,
                              compute_dtype=compute_dtype)
    log_probs = jax.nn.log_softmax(lg, axis=-1)
    seqs, seq_lens, _ = ctc_beam_decode(log_probs, enc_lens,
                                        beam_size=beam_size,
                                        blank_id=ctc.BLANK_ID)
    return seqs[:, 0], seq_lens[:, 0]
