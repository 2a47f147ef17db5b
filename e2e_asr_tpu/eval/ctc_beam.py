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

RNN-LM shallow fusion (`lm_params`/`lm_weight`): label EXTENSIONS add
`lm_weight * log p_LM(v | prefix)` (blank/collapse "stay" moves are never
LM-scored — the prefix is unchanged), and at the end of the utterance each
surviving prefix adds `lm_weight * log p_LM(<eos> | prefix)` so hypotheses
of different lengths compete under a properly terminated LM probability.
Since every LM term depends only on the prefix tokens, split slots of one
prefix all carry the same additive LM total and post-hoc merging stays
valid. This mirrors the fusion semantics of the attention beam
(eval/beam.py) and the transducer beam (eval/transducer_beam.py): the LM
state advances only on emissions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from e2e_asr_tpu.data import text

Array = jax.Array
NEG_INF = -1e30


def _lm_logprobs(lm_params: dict, lm_in: Array, lm_state):
    """Next-token log-probs from the carried (last-token-embedding, state)
    pair; returns (log_probs [..., V], advanced state)."""
    from e2e_asr_tpu.models.rnn_lm import fusion_step
    return fusion_step(lm_params, lm_in, lm_state)


def _lse(a: Array, b: Array) -> Array:
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    return m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))


def ctc_beam_decode(log_probs: Array, lens: Array, *, beam_size: int = 8,
                    blank_id: int = 0, lm_params: dict | None = None,
                    lm_weight: float = 0.0, lm_eos_id: int | None = None,
                    bias: tuple[dict, float] | None = None
                    ) -> tuple[Array, Array, Array]:
    """Prefix beam search over per-frame log-probs.

    Args:
        log_probs: [B, T, V] log-softmaxed frame posteriors.
        lens: [B] valid frame counts.
        lm_params: optional external fusion RNN-LM
            ({"embedding","lstm","output_proj"[,"simple_proj"]}, the
            rnn_lm.shared_lm_params layout) — engaged when lm_weight != 0.
        lm_eos_id: vocabulary id whose LM probability terminates each prefix
            (defaults to text.EOS_ID); None skips the end-of-sentence term.
        bias: (trie, boost_weight) contextual biasing (eval/biasing.py) on
            prefix extensions; unfinished partial matches give their bonus
            back at the final comparison.
    Returns:
        (prefixes [B, k, T] int32 0-padded, prefix_lens [B, k] int32,
         scores [B, k] total log-mass, LM-fused when engaged), beams sorted
        best-first.
    """
    B, T, V = log_probs.shape
    k = beam_size
    use_lm = lm_params is not None and lm_weight != 0.0
    use_bias = bias is not None and bias[1] != 0.0
    if use_bias:
        from e2e_asr_tpu.eval import biasing
    if use_lm and lm_eos_id is None:
        lm_eos_id = text.EOS_ID

    seqs0 = jnp.zeros((B, k, T), jnp.int32)
    lens0 = jnp.zeros((B, k), jnp.int32)
    # Beam 0 = the empty prefix with certainty; the rest dead.
    pb0 = jnp.full((B, k), NEG_INF).at[:, 0].set(0.0)
    pnb0 = jnp.full((B, k), NEG_INF)
    last0 = jnp.full((B, k), -1, jnp.int32)
    # `lm_sum` carries each slot's accumulated LM term so the CTC mass pair
    # (pb, pnb) stays pure: selection ranks pb/pnb + lm_sum, merging of split
    # slots stays exact, and the final scores decompose for callers.
    lm_sum0 = jnp.zeros((B, k), jnp.float32)
    carry0 = {"seqs": seqs0, "lens": lens0, "pb": pb0, "pnb": pnb0,
              "last": last0, "lm_sum": lm_sum0}
    if use_bias:
        carry0["bias_sum"] = jnp.zeros((B, k), jnp.float32)
        carry0["bias_node"] = jnp.zeros((B, k), jnp.int32)
    if use_lm:
        from e2e_asr_tpu.models.rnn_lm import fusion_init
        # Checkpoint-loaded LMs arrive as numpy arrays; embedding gathers
        # below index with traced ids, which numpy rejects.
        lm_params = jax.tree_util.tree_map(jnp.asarray, lm_params)
        # Horizon bound: one LM advance per emitting frame + the terminal
        # <eos> scoring call.
        carry0["lm_state"], carry0["lm_in"] = fusion_init(
            lm_params, (B, k), text.GO_ID, T + 1)

    b_idx = jnp.arange(B)[:, None]

    def step(carry, xs):
        seqs, seq_lens = carry["seqs"], carry["lens"]
        pb, pnb, last = carry["pb"], carry["pnb"], carry["last"]
        lm_sum = carry["lm_sum"]
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

        # Fusion: extensions are new label emissions — rank them with the
        # prefix's accumulated LM term plus the new token's LM log-prob.
        # Stays keep their LM term unchanged.
        if use_lm:
            lm_lp, lm_new = _lm_logprobs(lm_params, carry["lm_in"],
                                         carry["lm_state"])      # [B, k, V]
            ext_lm_sum = lm_sum[:, :, None] + lm_weight * lm_lp
        else:
            ext_lm_sum = jnp.broadcast_to(lm_sum[:, :, None], (B, k, V))
        stay_rank = stay_total + lm_sum
        ext_rank = ext + ext_lm_sum
        if use_bias:
            b_delta, b_targets = biasing.bias_step(bias[0],
                                                   carry["bias_node"],
                                                   bias[1])
            ext_bias = carry["bias_sum"][:, :, None] + b_delta
            stay_rank = stay_rank + carry["bias_sum"]
            ext_rank = ext_rank + ext_bias

        # Select top-k among k stay + k*V extend candidates.
        cand = jnp.concatenate([stay_rank, ext_rank.reshape(B, k * V)],
                               axis=1)
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
        new_lm_sum = jnp.where(
            is_stay, g(lm_sum),
            jnp.take_along_axis(ext_lm_sum.reshape(B, k * V),
                                jnp.maximum(idx - k, 0), axis=1))
        new_last = jnp.where(is_stay, g(last), token)
        new_lens = jnp.where(is_stay, p_lens, p_lens + 1)
        new_seqs = jnp.where(is_stay[:, :, None], new_seqs, ext_seqs)

        # Past each utterance's length the state is frozen.
        keep = valid[:, None]
        out = {"seqs": jnp.where(keep[:, :, None], new_seqs, seqs),
               "lens": jnp.where(keep, new_lens, seq_lens),
               "pb": jnp.where(keep, new_pb, pb),
               "pnb": jnp.where(keep, new_pnb, pnb),
               "last": jnp.where(keep, new_last, last),
               "lm_sum": jnp.where(keep, new_lm_sum, lm_sum)}
        if use_bias:
            new_bias_sum = jnp.where(
                is_stay, g(carry["bias_sum"]),
                jnp.take_along_axis(ext_bias.reshape(B, k * V),
                                    jnp.maximum(idx - k, 0), axis=1))
            new_bias_node = jnp.where(
                is_stay, g(carry["bias_node"]),
                biasing.bias_select(b_targets, parent, token))
            out["bias_sum"] = jnp.where(keep, new_bias_sum,
                                        carry["bias_sum"])
            out["bias_node"] = jnp.where(keep, new_bias_node,
                                         carry["bias_node"])
        if use_lm:
            def g_nd(a):
                extra = (1,) * (a.ndim - 2)
                return jnp.take_along_axis(a, parent.reshape(parent.shape
                                                             + extra), axis=1)
            sel = lambda new, old: jnp.where(  # noqa: E731
                is_stay.reshape(is_stay.shape + (1,) * (new.ndim - 2)),
                old, new)
            # The LM advances only on emissions: extended slots adopt the
            # parent's advanced state + the new token's embedding.
            from e2e_asr_tpu.models.rnn_lm import fusion_next_input
            lm_state = jax.tree_util.tree_map(
                lambda new, old: sel(g_nd(new), g_nd(old)),
                lm_new, carry["lm_state"])
            lm_in = sel(fusion_next_input(lm_params, token),
                        g_nd(carry["lm_in"]))
            frz = lambda new, old: jnp.where(  # noqa: E731
                keep.reshape(keep.shape + (1,) * (new.ndim - 2)), new, old)
            out["lm_state"] = jax.tree_util.tree_map(
                frz, lm_state, carry["lm_state"])
            out["lm_in"] = frz(lm_in, carry["lm_in"])
        return out, None

    t = jnp.arange(T)
    valid_seq = (t[None, :] < lens.astype(jnp.int32)[:, None])  # [B, T]
    xs = (jnp.swapaxes(log_probs, 0, 1), jnp.swapaxes(valid_seq, 0, 1))
    final, _ = jax.lax.scan(step, carry0, xs)

    scores = _lse(final["pb"], final["pnb"]) + final["lm_sum"]
    if use_bias:
        # Unfinished partial matches earn nothing.
        scores = scores + final["bias_sum"] - biasing.pending_bonus(
            bias[0], final["bias_node"], bias[1])
    if use_lm and lm_eos_id is not None:
        # Terminate every surviving prefix under the LM so different lengths
        # compete on complete-sentence probability (ESPnet-style).
        lm_lp, _ = _lm_logprobs(lm_params, final["lm_in"], final["lm_state"])
        scores = scores + lm_weight * lm_lp[:, :, lm_eos_id]
    order = jnp.argsort(-scores, axis=1, stable=True)
    return (jnp.take_along_axis(final["seqs"], order[:, :, None], axis=1),
            jnp.take_along_axis(final["lens"], order, axis=1),
            jnp.take_along_axis(scores, order, axis=1))


def ctc_beam_search(params: dict, cfg, feats: Array, feat_lens: Array, *,
                    beam_size: int = 8, compute_dtype=None,
                    lm_params: dict | None = None, lm_weight: float = 0.0,
                    bias: tuple[dict, float] | None = None
                    ) -> tuple[Array, Array]:
    """End-to-end: encoder + CTC head + prefix beam search (optionally
    RNN-LM-fused).

    Returns (tokens [B, T_enc] of the best prefix, lens [B])."""
    from e2e_asr_tpu.models import ctc

    lg, enc_lens = ctc.logits(params, cfg, feats, feat_lens,
                              compute_dtype=compute_dtype)
    log_probs = jax.nn.log_softmax(lg, axis=-1)
    seqs, seq_lens, _ = ctc_beam_decode(log_probs, enc_lens,
                                        beam_size=beam_size,
                                        blank_id=ctc.BLANK_ID,
                                        lm_params=lm_params,
                                        lm_weight=lm_weight, bias=bias)
    return seqs[:, 0], seq_lens[:, 0]
