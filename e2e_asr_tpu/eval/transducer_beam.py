"""On-device transducer beam search (fixed shapes, batched).

Time-synchronous decoding with a limited number of expansion rounds per frame
(the fixed-shape form of Graves 2012 TSD / Saon et al.'s alignment-length
synchronous variants): at every encoder frame each of the k hypotheses either
takes blank (finishing the frame) or emits a label and may expand again, up
to `max_expansions` rounds; after the last round surviving unfinished
hypotheses are forced through blank. All shapes are static — beams live in
[B, k, ...] buffers, the frame loop is a `lax.scan`, every selection is
`lax.top_k` over k stay-candidates + k*V extensions — the same shape
discipline as the attention beam (eval/beam.py) and the CTC prefix beam
(eval/ctc_beam.py).

Properties:
- beam_size=1 reproduces greedy decoding (models/transducer.py
  greedy_decode with max_symbols_per_frame = max_expansions) up to argmax
  tie-breaking — pinned by tests/test_transducer_beam.py.
- Documented approximation (as in eval/ctc_beam.py): hypotheses are scored
  per alignment and identical label prefixes reached through different
  alignments are NOT merged mid-search, so a prefix's mass may split across
  beam slots. Merging needs content-addressed state; fixed-shape
  implementations conventionally skip it.
- Optional RNN-LM shallow fusion (the reference wires an external LM into
  its attention beam, beam_search.py:111-134; the transducer form scores
  LABEL emissions only — blank is a lattice transition the LM has no notion
  of): score = log p_rnnt + lm_weight * log p_lm(label | emitted prefix).
  The LM state advances only on emissions, exactly like eval/beam.py's
  fusion LM. Pinned by an exhaustive-enumeration oracle in
  tests/test_transducer_beam.py.
- Optional internal-LM subtraction (`ilm_weight`, HAT-style — Variani et
  al. 2020 / Meng et al. 2021): the transducer's implicit LM is estimated
  by the joint with the encoder contribution ZEROED, log-softmaxed over
  labels only (blank is a lattice transition, not a word event); label
  emissions subtract ilm_weight * log p_ilm so an external LM replaces the
  internal one instead of stacking on it. Same enumeration oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from e2e_asr_tpu.core.cells import lstm_zero_state
from e2e_asr_tpu.core.layers import dense
from e2e_asr_tpu.data import text
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.models.transducer import BLANK_ID, _pred_step

Array = jax.Array
NEG_INF = -1e30


def transducer_beam_decode(params: dict, cfg, enc: Array, enc_lens: Array, *,
                           beam_size: int = 8, max_expansions: int = 3,
                           compute_dtype=None, max_output: int | None = None,
                           lm_params: dict | None = None,
                           lm_weight: float = 0.0,
                           ilm_weight: float = 0.0,
                           bias: tuple[dict, float] | None = None
                           ) -> tuple[Array, Array, Array]:
    """Beam search over encoder states.

    Args:
        enc: [B, T_enc, H] encoder outputs; enc_lens: [B].
        lm_params: optional external fusion LM
            ({"embedding","lstm","output_proj"[,"simple_proj"]}, the
            rnn_lm.shared_lm_params layout) — engaged when lm_weight != 0.
        ilm_weight: HAT-style internal-LM subtraction on label emissions
            (log-softmax over labels of the zero-encoder joint); pair with
            lm_weight so the external LM replaces the internal estimate.
        bias: (trie, boost_weight) contextual biasing (eval/biasing.py) on
            label emissions; unfinished partial matches give their bonus
            back at the final comparison.
    Returns:
        (tokens [B, k, cap] int32 0-padded in emission order,
         lens [B, k] int32, scores [B, k] fused alignment log-probs),
        beams sorted best-first.
    """
    dec = cfg.decoders["char"]
    k = beam_size
    cap = max_output or dec.max_output
    joint = params["joint"]
    enc_proj = dense(joint["enc_proj"], enc, compute_dtype=compute_dtype)
    B, T, J = enc_proj.shape
    V = params["joint"]["out"]["bias"].shape[0]
    b_idx = jnp.arange(B)[:, None]
    k_idx = jnp.arange(k)[None, :]

    def bcast(x, target_ndim):
        return x.reshape(x.shape + (1,) * (target_ndim - x.ndim))

    def gather_beam(tree, parent):
        """Reindex [B, k, ...] leaves by parent [B, k]."""
        return jax.tree_util.tree_map(
            lambda a: jnp.take_along_axis(
                a, bcast(parent, a.ndim), axis=1), tree)

    # Beam 0 = empty hypothesis after consuming <go>; the rest dead.
    states0 = tuple(lstm_zero_state((B, k), dec.hidden_size_dec)
                    for _ in range(dec.num_layers_dec))
    out0, states0 = _pred_step(
        params["pred"], cfg, jnp.full((B, k), text.GO_ID, jnp.int32), states0)
    pred_p0 = dense(joint["pred_proj"], out0, compute_dtype=compute_dtype)
    carry0 = {
        "score": jnp.full((B, k), NEG_INF).at[:, 0].set(0.0),
        "tokens": jnp.zeros((B, k, cap), jnp.int32),
        "n": jnp.zeros((B, k), jnp.int32),
        "states": states0,
        "pred_p": pred_p0,
    }
    use_lm = lm_params is not None and lm_weight != 0.0
    use_ilm = ilm_weight != 0.0
    use_bias = bias is not None and bias[1] != 0.0
    if use_bias:
        from e2e_asr_tpu.eval import biasing
        carry0["bias_node"] = jnp.zeros((B, k), jnp.int32)
    if use_lm:
        from e2e_asr_tpu.models.rnn_lm import fusion_init
        # Checkpoint-loaded LMs arrive as numpy arrays; the embedding gather
        # below indexes with traced ids, which numpy rejects.
        lm_params = jax.tree_util.tree_map(jnp.asarray, lm_params)
        # Horizon bound: the LM advances once per label emission (at most
        # `cap` of them) + the terminal <eos> scoring call.
        carry0["lm_state"], carry0["lm_in"] = fusion_init(
            lm_params, (B, k), text.GO_ID, cap + 1)

    def logprobs(enc_t, pred_p):
        logits = dense(joint["out"], jnp.tanh(enc_t[:, None, :] + pred_p),
                       compute_dtype=compute_dtype)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def expand_round(c, enc_t, frame_done, force_blank):
        """One selection round within a frame. frame_done marks hyps that
        already took blank this frame (their only move is to stay)."""
        lp = logprobs(enc_t, c["pred_p"])                    # [B, k, V]
        # Stay candidates: already frame-done keep their score; live hyps
        # finish the frame by taking blank.
        stay = jnp.where(frame_done, c["score"], c["score"] + lp[..., BLANK_ID])
        if force_blank:
            ext = jnp.full((B, k, V), NEG_INF)
        else:
            ext = c["score"][:, :, None] + lp                # [B, k, V]
            if use_lm:
                # Shallow fusion on LABEL emissions only; blank's slot is
                # overwritten with NEG_INF below, so adding lm_lp everywhere
                # first is safe.
                from e2e_asr_tpu.models.rnn_lm import fusion_step
                lm_lp, lm_new = fusion_step(lm_params, c["lm_in"],
                                            c["lm_state"])
                ext = ext + lm_weight * lm_lp
            if use_ilm:
                # HAT-style internal LM: the joint with zero encoder
                # contribution, normalized over labels only (blank masked).
                # Depends only on the carried pred_p — one extra V-proj.
                ilm_logits = dense(joint["out"], jnp.tanh(c["pred_p"]),
                                   compute_dtype=compute_dtype
                                   ).astype(jnp.float32)
                ilm_lp = jax.nn.log_softmax(
                    ilm_logits.at[:, :, BLANK_ID].set(NEG_INF), axis=-1)
                ext = ext - ilm_weight * ilm_lp.at[:, :, BLANK_ID].set(0.0)
            if use_bias:
                b_delta, b_targets = biasing.bias_step(bias[0],
                                                       c["bias_node"],
                                                       bias[1])
                ext = ext + b_delta
            ext = ext.at[:, :, BLANK_ID].set(NEG_INF)
            ext = jnp.where((c["n"] >= cap)[:, :, None], NEG_INF, ext)
        cand = jnp.concatenate([stay, ext.reshape(B, k * V)], axis=1)
        vals, idx = jax.lax.top_k(cand, k)                   # [B, k]
        is_stay = idx < k
        parent = jnp.where(is_stay, idx, (idx - k) // V)
        token = jnp.where(is_stay, 0, (idx - k) % V).astype(jnp.int32)

        gathered = {"tokens": c["tokens"], "n": c["n"],
                    "states": c["states"], "pred_p": c["pred_p"]}
        if use_bias:
            gathered["bias_node"] = c["bias_node"]
        if use_lm:
            gathered["lm_state"] = c["lm_state"]
            gathered["lm_in"] = c["lm_in"]
            if not force_blank:
                gathered["lm_new"] = lm_new
        new = gather_beam(gathered, parent)
        new_done = jnp.take_along_axis(frame_done, parent, axis=1) | is_stay
        # Emit `token` where extended.
        wrote = new["tokens"].at[
            b_idx, k_idx, jnp.clip(new["n"], 0, cap - 1)].set(
            jnp.where(is_stay, new["tokens"][
                b_idx, k_idx, jnp.clip(new["n"], 0, cap - 1)], token))
        n = new["n"] + (~is_stay).astype(jnp.int32)
        out, states = _pred_step(params["pred"], cfg, token, new["states"])
        pred_p_new = dense(joint["pred_proj"], out,
                           compute_dtype=compute_dtype)
        sel = lambda a, b: jnp.where(bcast(~is_stay, a.ndim), a, b)
        states = jax.tree_util.tree_map(sel, states, new["states"])
        pred_p = sel(pred_p_new, new["pred_p"])
        out_c = {"score": vals, "tokens": wrote, "n": n, "states": states,
                 "pred_p": pred_p}
        if use_bias:
            if force_blank:
                out_c["bias_node"] = new["bias_node"]
            else:
                # The trie advances only on emissions, like the fusion LM.
                out_c["bias_node"] = sel(
                    biasing.bias_select(b_targets, parent, token),
                    new["bias_node"])
        if use_lm:
            if force_blank:
                out_c["lm_state"] = new["lm_state"]
                out_c["lm_in"] = new["lm_in"]
            else:
                # The fusion LM advances only on emissions (stay hyps keep
                # their pre-step state, like eval/beam.py's lm_state).
                from e2e_asr_tpu.models.rnn_lm import fusion_next_input
                out_c["lm_state"] = jax.tree_util.tree_map(
                    sel, new["lm_new"], new["lm_state"])
                out_c["lm_in"] = sel(fusion_next_input(lm_params, token),
                                     new["lm_in"])
        return (out_c, new_done)

    def frame_step(carry, xs):
        enc_t, valid = xs                                    # [B, J], [B]
        c = carry
        frame_done = jnp.zeros((B, k), bool)
        for _ in range(max_expansions):
            c, frame_done = expand_round(c, enc_t, frame_done,
                                         force_blank=False)
        # Surviving unfinished hypotheses must take blank to move to t+1.
        c, _ = expand_round(c, enc_t, frame_done, force_blank=True)
        keep = valid[:, None]
        merged = jax.tree_util.tree_map(
            lambda new, old: jnp.where(bcast(keep, new.ndim), new, old),
            c, carry)
        return merged, None

    t = jnp.arange(T)
    valid_seq = t[None, :] < enc_lens.astype(jnp.int32)[:, None]
    xs = (jnp.swapaxes(enc_proj, 0, 1), jnp.swapaxes(valid_seq, 0, 1))
    final, _ = jax.lax.scan(frame_step, carry0, xs)

    scores = final["score"]
    if use_bias:
        # Unfinished partial matches earn nothing.
        scores = scores - biasing.pending_bonus(bias[0], final["bias_node"],
                                                bias[1])
    order = jnp.argsort(-scores, axis=1, stable=True)
    return (jnp.take_along_axis(final["tokens"], order[:, :, None], axis=1),
            jnp.take_along_axis(final["n"], order, axis=1),
            jnp.take_along_axis(scores, order, axis=1))


def transducer_beam_search(params: dict, cfg, feats: Array, feat_lens: Array,
                           *, beam_size: int = 8, max_expansions: int = 3,
                           compute_dtype=None, lm_params: dict | None = None,
                           lm_weight: float = 0.0, ilm_weight: float = 0.0,
                           bias: tuple[dict, float] | None = None
                           ) -> tuple[Array, Array]:
    """End-to-end: encoder + transducer beam. Returns the best hypothesis's
    (tokens [B, cap], lens [B])."""
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, feats, feat_lens, compute_dtype=compute_dtype)
    depth = cfg.num_layers["char"]
    seqs, lens, _ = transducer_beam_decode(
        params, cfg, attn_states[depth], enc_lens[depth],
        beam_size=beam_size, max_expansions=max_expansions,
        compute_dtype=compute_dtype, lm_params=lm_params,
        lm_weight=lm_weight, ilm_weight=ilm_weight, bias=bias)
    return seqs[:, 0], lens[:, 0]
