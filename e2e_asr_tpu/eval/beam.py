"""On-device batched beam search with optional RNN-LM shallow fusion.

Replaces the reference's CPU/NumPy batch-size-1 beam search
(/root/reference/beam_search.py, eval_model.py:120-197) with a single jitted,
fixed-shape function: a static beam axis k over every utterance in the batch,
`lax.while_loop` over at most 120 steps (beam_search.py:269), early-exiting
when every hypothesis in the batch has finished.

Semantics preserved from the reference:
- the beam *shrinks* when a hypothesis emits <eos> (beam_search.py:264,327):
  finished hypotheses move to a k-slot finished buffer and can never be
  displaced; subsequent steps select only (k - #finished) continuations.
- shallow fusion: score = log p_dec + lm_weight * log p_lm
  (beam_search.py:208), both accumulated. Extension: beam_cfg.ilm_weight
  additionally subtracts the decoder's INTERNAL LM estimate (ILME, Meng et
  al. 2021) — a parallel zero-context decoder recurrence whose log-softmax
  is scaled by -ilm_weight, so the external LM replaces rather than stacks
  on the model's implicit LM.
- word_ins_penalty applied per-step on the cumulative score
  (beam_search.py:320-322). We apply it uniformly from step 0, which differs
  from the reference by a constant `penalty * 1` on EVERY hypothesis — since
  all live hypotheses at a step share the same length, selection and the final
  argmax are unaffected.
- the final answer is the max-score member of finished ∪ live
  (beam_search.py:334-338).
- cov_penalty is accepted and ignored BY DEFAULT, as in the reference
  (beam_search.py:210 hardcodes length_loss = 0; cum_attn_probs is carried
  but never used, beam_entry.py:8). Setting apply_cov_penalty=True enables a
  working GNMT-style coverage penalty as an extension: the final comparison
  adds cov_penalty * sum_t log(min(cum_alpha_t, 1)) over valid encoder
  positions.

Documented divergence: the reference selects ties via np.argpartition
(unordered); we use ordered lax.top_k, so exact-tie cases may pick a
different (equally scored) hypothesis.
"""
from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import BeamConfig, DecoderConfig
from e2e_asr_tpu.core import cells
from e2e_asr_tpu.core.layers import dense
from e2e_asr_tpu.data.text import EOS_ID, GO_ID
from e2e_asr_tpu.models.attn_decoder import AttnContext, make_attn_context
from e2e_asr_tpu.ops import beam_select_pallas

Array = jax.Array
NEG_INF = -1e30


class BeamState(NamedTuple):
    t: Array                 # scalar int32: steps completed
    alive: Array             # [B, k] bool
    scores: Array            # [B, k] cumulative score S (NEG_INF when dead)
    seqs: Array              # [B, k, max_steps] int32
    dec_cell_states: Any     # tuple of LSTMState/[B,k,H] per decoder layer
    dec_lm_state: Any        # internal decoder LM LSTM state [B,k,H]
    context: Array           # [B, k, H_enc]
    inputs: Array            # [B, k, emb] next decoder-LM input embedding
    lm_state: Any            # external fusion LM state (or () when unused)
    lm_inputs: Any           # [B, k, emb_lm] (or ())
    num_finished: Array      # [B] int32
    fin_scores: Array        # [B, k]
    fin_seqs: Array          # [B, k, max_steps]
    fin_lens: Array          # [B, k] int32
    cum_alpha: Array         # [B, k, T_enc] accumulated attention (coverage)
    fin_cov: Array           # [B, k] coverage term frozen at finalization
    ctc_ps: Any = ()         # CTC prefix-scorer state (joint decoding) or ()
    bias_node: Any = ()      # [B, k] int32 biasing-trie node or ()
    ilm_cell_states: Any = ()   # zero-context decoder recurrence (ILME) or ()
    ilm_dec_lm_state: Any = ()  # its internal LM-LSTM state or ()


def _cell_step(use_lstm: bool, params, x, state):
    if use_lstm:
        return cells.lstm_step(params, x, state)
    return cells.gru_step(params, x, state)


def _zero_cell_state(use_lstm: bool, shape, hidden):
    if use_lstm:
        return cells.lstm_zero_state(shape, hidden)
    return cells.gru_zero_state(shape, hidden)


def _alpha_context(params: dict, ctx: AttnContext, y: Array
                   ) -> tuple[Array, Array]:
    """Attention over the beam axis from a precomputed query projection
    y [B,k,A] -> (context [B,k,H_enc], alpha [B,k,T])."""
    s = jnp.sum(params["attn_v"] *
                jnp.tanh(ctx.hidden_features[:, None, :, :] + y[:, :, None, :]),
                axis=-1)
    s = jnp.where(ctx.mask[:, None, :] > 0, s, NEG_INF)
    alpha = jax.nn.softmax(s, axis=-1)
    context = jnp.einsum("bkt,bth->bkh", alpha, ctx.enc_states)
    return context, alpha


def _beam_attention(params: dict, ctx: AttnContext, query: Array
                    ) -> tuple[Array, Array]:
    """Attention with a beam axis: query [B,k,Q] -> (context, alpha)."""
    return _alpha_context(params, ctx, dense(params["attn_query"], query))


def _dec_step_fused(params: dict, cfg: DecoderConfig, ctx: AttnContext,
                    state: BeamState):
    """Fused-kernel variant of _dec_step (inference fast path).

    Rows are flattened k-major (row = j*B + b) so the fused attention kernel
    can slice per-beam blocks contiguously.
    """
    from e2e_asr_tpu.ops import dec_step_pallas as dsp

    B, k, E = state.inputs.shape
    A = params["attn_query"]["kernel"].shape[-1]
    use_fused_attn = dsp.attn_output_fits(B, k, ctx.enc_states.shape[1], A,
                                          ctx.enc_states.shape[-1])
    if use_fused_attn:
        # k-major rows so the fused attention kernel slices beams contiguously.
        flat = lambda a: jnp.swapaxes(a, 0, 1).reshape(    # noqa: E731
            (B * k,) + a.shape[2:])
        unflat = lambda a: jnp.swapaxes(                   # noqa: E731
            a.reshape((k, B) + a.shape[1:]), 0, 1)
    else:
        flat = lambda a: a.reshape((B * k,) + a.shape[2:])    # noqa: E731
        unflat = lambda a: a.reshape((B, k) + a.shape[1:])    # noqa: E731
    lm_state = jax.tree_util.tree_map(flat, state.dec_lm_state)
    dec_states = jax.tree_util.tree_map(flat, state.dec_cell_states)
    new_lm, new_dec, y = dsp.cells_fused(
        params, flat(state.inputs), flat(state.context), lm_state, dec_states,
        use_lstm=cfg.use_lstm, bf16=False)
    top = new_dec[-1]
    query = top.c if cfg.use_lstm else top
    if use_fused_attn:
        logp_f, ctx_f, alpha_f = dsp.attn_output_fused(
            params, cfg, y, query, ctx.hidden_features, ctx.enc_states,
            ctx.mask, k=k, bf16=False)
        context, alpha, logp = unflat(ctx_f), unflat(alpha_f), unflat(logp_f)
    else:
        context, alpha = _alpha_context(params, ctx, unflat(y))
        logp = unflat(dsp.output_fused(params, cfg, query, flat(context),
                                       bf16=False))
    new_cell_states = jax.tree_util.tree_map(unflat, new_dec)
    new_dec_lm = jax.tree_util.tree_map(unflat, new_lm)
    return new_cell_states, new_dec_lm, context, alpha, logp


def _dec_step(params: dict, cfg: DecoderConfig, ctx,
              state: BeamState, xf_indirect: bool = False
              ) -> tuple[Any, Any, Array, Array]:
    """One decoder step over the whole [B,k] beam. Returns
    (new_cell_states, new_dec_lm_state, new_context, alpha,
    log_probs [B,k,V]).

    For transformer decoders (cfg.decoder_type == "transformer") `ctx` is a
    transformer_decoder.CrossCtx, the "cell states" are the per-block
    self-attention KV caches, and the dec_lm_state slot carries the
    ancestry map (indirect mode, the default: caches are never reordered —
    step_beam_indirect) or () (gathered mode, E2E_ASR_XF_GATHER=1)."""
    if cfg.decoder_type == "transformer":
        from e2e_asr_tpu.models import transformer_decoder as td
        if xf_indirect:
            new_caches, context, alpha, logp = td.step_beam_indirect(
                params, cfg, ctx, state.dec_cell_states, state.dec_lm_state,
                state.inputs, state.t)
        else:
            new_caches, context, alpha, logp = td.step_beam(
                params, cfg, ctx, state.dec_cell_states, state.inputs,
                state.t)
        return new_caches, state.dec_lm_state, context, alpha, logp

    from e2e_asr_tpu.core.rnn import use_pallas_lstm
    from e2e_asr_tpu.ops import dec_step_pallas as dsp

    if use_pallas_lstm() and dsp.supported(cfg, params):
        return _dec_step_fused(params, cfg, ctx, state)

    lm_out, new_dec_lm = _cell_step(cfg.use_lstm, params["lm_cell"],
                                    state.inputs, state.dec_lm_state)
    if "simple_proj" in params:
        lm_out = dense(params["simple_proj"], lm_out)
    x = dense(params["input_proj"],
              jnp.concatenate([lm_out, state.context], axis=-1))
    new_cell_states = []
    h = x
    for layer, cp in enumerate(params["dec_cells"]):
        h, new_s = _cell_step(cfg.use_lstm, cp, h,
                              state.dec_cell_states[layer])
        new_cell_states.append(new_s)
    new_cell_states = tuple(new_cell_states)
    top = new_cell_states[-1]
    query = top.c if cfg.use_lstm else top
    context, alpha = _beam_attention(params, ctx, query)
    proj = dense(params["attn_proj"], jnp.concatenate([query, context], -1))
    out_proj = params["output_proj_ind" if cfg.ind_softmax else "output_proj"]
    logits = dense(out_proj, proj)
    return (new_cell_states, new_dec_lm, context, alpha,
            jax.nn.log_softmax(logits, -1))


def _ilm_step(params: dict, cfg: DecoderConfig, h_enc: int,
              inputs: Array, dec_lm_state, cell_states
              ) -> tuple[Any, Any, Array]:
    """One step of the decoder's INTERNAL language model estimate (ILME,
    Meng et al. 2021): the exact `_dec_step` computation with the attention
    context vector forced to zeros throughout — a separate recurrence whose
    states never see the encoder. Returns (new_cell_states, new_dec_lm_state,
    log p_ilm [B,k,V])."""
    lm_out, new_dec_lm = _cell_step(cfg.use_lstm, params["lm_cell"],
                                    inputs, dec_lm_state)
    if "simple_proj" in params:
        lm_out = dense(params["simple_proj"], lm_out)
    zero_ctx = jnp.zeros(lm_out.shape[:-1] + (h_enc,), lm_out.dtype)
    x = dense(params["input_proj"],
              jnp.concatenate([lm_out, zero_ctx], axis=-1))
    new_cell_states = []
    h = x
    for layer, cp in enumerate(params["dec_cells"]):
        h, new_s = _cell_step(cfg.use_lstm, cp, h, cell_states[layer])
        new_cell_states.append(new_s)
    new_cell_states = tuple(new_cell_states)
    top = new_cell_states[-1]
    query = top.c if cfg.use_lstm else top
    proj = dense(params["attn_proj"], jnp.concatenate([query, zero_ctx], -1))
    out_proj = params["output_proj_ind" if cfg.ind_softmax else "output_proj"]
    logits = dense(out_proj, proj)
    return new_cell_states, new_dec_lm, jax.nn.log_softmax(logits, -1)


def _lm_step(lm_params: dict, state, x) -> tuple[Any, Array]:
    """External fusion LM step: returns (new_state, log_probs [B,k,V])."""
    from e2e_asr_tpu.models.rnn_lm import fusion_step
    logp, new_state = fusion_step(lm_params, x, state)
    return new_state, logp


def _fusion_init(lm_params: dict, batch_shape, steps: int | None = None,
                 indirect: bool = False):
    from e2e_asr_tpu.models.rnn_lm import fusion_init
    return fusion_init(lm_params, batch_shape, GO_ID, steps,
                       indirect=indirect)


def _advance_ancestry(anc: Array, sel_parent: Array, t: Array) -> Array:
    """Selection-time ancestry maintenance for in-place beam caches (the
    transformer decoder's KV caches and the indirect fusion LM's): gather
    the parent's map — a [B,k,S] int32 gather instead of the multi-MB cache
    copy — then record at position t which rank computed this step."""
    anc = jnp.take_along_axis(anc, sel_parent[:, :, None], axis=1)
    return jax.lax.dynamic_update_slice_in_dim(
        anc, sel_parent.astype(anc.dtype)[:, :, None], t, axis=2)


def _gather_beam(tree, idx: Array):
    """Gather along the beam axis (1): leaf [B,k,...] selected by idx [B,k]."""
    def g(leaf):
        expand = idx.reshape(idx.shape + (1,) * (leaf.ndim - 2))
        return jnp.take_along_axis(leaf, expand, axis=1)
    return jax.tree_util.tree_map(g, tree)


def beam_decode(dec_params: dict, dec_cfg: DecoderConfig, beam_cfg: BeamConfig,
                enc_states: Array, enc_lens: Array,
                lm_params: dict | None = None,
                return_nbest: bool = False,
                ctc_scorer=None,
                bias: tuple[dict, float] | None = None,
                ) -> tuple[Array, Array, Array]:
    """Batched beam search.

    Args:
        dec_params: char decoder params (models/attn_decoder.init layout).
        enc_states: [B, T_enc, H_enc]; enc_lens: [B].
        lm_params: fusion LM ({"embedding","lstm","output_proj"[,"simple_proj"]})
            — used when beam_cfg.lm_weight != 0.
        return_nbest: additionally return the full final candidate set
            (finished ∪ live, 2k entries; empty slots score NEG_INF) for
            downstream rescoring. Selection semantics are unchanged.
        ctc_scorer: eval/ctc_prefix.CTCPrefixScorer for one-pass joint
            CTC/attention decoding — engaged when beam_cfg.joint_ctc > 0;
            ranks (1-w)·log p_att + w·Δpsi_ctc + lm_weight·log p_lm.
        bias: (trie, boost_weight) contextual biasing (eval/biasing.py):
            candidates advancing a boost-phrase match earn boost_weight per
            token, divergence gives the partial bonus back, completions
            commit it; still-live partial matches are uncommitted at the
            final comparison.
    Returns:
        (tokens [B, max_steps] int32, lens [B] int32, scores [B] f32)
        [, (all_seqs [B, 2k, max_steps], all_lens [B, 2k],
            all_scores [B, 2k])].
    """
    B = enc_states.shape[0]
    k = beam_cfg.beam_size
    V = dec_cfg.vocab_size
    max_steps = beam_cfg.max_steps
    use_lm = lm_params is not None and beam_cfg.lm_weight != 0.0
    lm_indirect = False
    if use_lm:
        from e2e_asr_tpu.models.rnn_lm import fusion_supports_indirect
        # Transformer fusion LMs: route the per-position KV caches by an
        # ancestry map instead of gathering the multi-MB caches every step
        # (transformer_lm.fusion_step_indirect — the transformer decoder's
        # own xf_indirect trick). Measured crossover is on d_model, not
        # head count: at B=8/k=4/S=128 indirect wins 1.7-2.8x for
        # d_model >= 128 (4x256: 73.4->35.6 ms; 4x128: 72.5->25.8;
        # 2x128: 25.6->13.0) and LOSES for d_model = 64 at any head
        # split (4x64 h4: 8.6->21.6; h1: 10.9->13.6) — tiny head dims
        # lane-pad the cache so the gather is cheap while the all-rows
        # routing einsums stay underutilized (VALIDATION round-3).
        # E2E_ASR_TLM_GATHER=1 / E2E_ASR_TLM_INDIRECT=1 force a mode.
        if fusion_supports_indirect(lm_params):
            if os.environ.get("E2E_ASR_TLM_GATHER"):
                lm_indirect = False
            elif os.environ.get("E2E_ASR_TLM_INDIRECT"):
                lm_indirect = True
            else:
                # The d_model crossover above was measured at B*k=32 only;
                # at tiny beam volume the gathered cache is small in absolute
                # terms, so (mirroring the xf_indirect gate below) require
                # both a wide LM and enough rows to amortize the all-rows
                # routing einsums before picking indirect.
                lm_indirect = (lm_params["embedding"].shape[1] >= 128
                               and B * k >= 16)
    use_ilm = beam_cfg.ilm_weight != 0.0
    is_xf = dec_cfg.decoder_type == "transformer"
    xf_indirect = False
    if is_xf:
        from e2e_asr_tpu.models import transformer_decoder as td
        # Ancestry-indirect KV caches pay off once the cache-reorder
        # gathers dominate the extra all-rows score work: measured
        # crossover between B*k=64 (gathered 35.2 vs 39.6 ms) and B*k=128
        # (gathered 91.0 vs 71.9 ms) at the bench decode shape; B=64 is
        # 1.78x (VALIDATION round-3). Both modes are semantically
        # identical (CPU-f32 exact; on-TPU token choices can differ at
        # matmul-precision scale, like any einsum reassociation).
        if os.environ.get("E2E_ASR_XF_GATHER"):
            xf_indirect = False
        elif os.environ.get("E2E_ASR_XF_INDIRECT"):
            xf_indirect = True
        else:
            xf_indirect = B * k >= 128
    use_joint = ctc_scorer is not None and beam_cfg.joint_ctc > 0.0
    use_bias = bias is not None and bias[1] != 0.0
    jw = beam_cfg.joint_ctc
    penalty = beam_cfg.word_ins_penalty
    use_cov = beam_cfg.apply_cov_penalty and beam_cfg.cov_penalty != 0.0
    T_enc = enc_states.shape[1]
    from e2e_asr_tpu.core.rnn import use_pallas_lstm
    use_sel_kernel = use_pallas_lstm()

    # Small-batch serving case: run the ENTIRE search in one Pallas launch
    # per utterance (ops/beam_megakernel.py) — no per-step launch cost.
    from e2e_asr_tpu.ops import beam_megakernel as bmk
    if (use_sel_kernel and not is_xf and not use_lm and not use_cov
            and not return_nbest
            and not use_joint and not use_bias and not use_ilm
            and bmk.supported(dec_cfg, beam_cfg, dec_params, T_enc,
                              enc_states.shape[-1], B)):
        return bmk.beam_decode_mega(dec_params, dec_cfg, beam_cfg,
                                    enc_states, enc_lens)

    if is_xf:
        ctx = td.make_cross_ctx(dec_params, dec_cfg, enc_states, enc_lens)
        init_dec_states = td.zero_caches(dec_cfg, (B, k), max_steps)
        # Indirect mode: the dec_lm slot carries the ancestry map.
        init_dec_lm = (jnp.zeros((B, k, max_steps), jnp.int32)
                       if xf_indirect else ())
    else:
        ctx = make_attn_context(dec_params, enc_states, enc_lens)
        init_dec_states = tuple(
            _zero_cell_state(dec_cfg.use_lstm, (B, k), dec_cfg.hidden_size_dec)
            for _ in range(dec_cfg.num_layers_dec))
        init_dec_lm = _zero_cell_state(dec_cfg.use_lstm, (B, k),
                                       dec_cfg.lm_hidden_size)
    emb = dec_params["embedding"]
    go = jnp.full((B, k), GO_ID, dtype=jnp.int32)
    init_lm_fusion = (_fusion_init(lm_params, (B, k), max_steps, lm_indirect)
                      if use_lm else ((), ()))

    init = BeamState(
        t=jnp.zeros((), jnp.int32),
        alive=jnp.zeros((B, k), bool).at[:, 0].set(True),
        scores=jnp.full((B, k), NEG_INF).at[:, 0].set(0.0),
        seqs=jnp.zeros((B, k, max_steps), jnp.int32),
        dec_cell_states=init_dec_states,
        dec_lm_state=init_dec_lm,
        context=jnp.zeros((B, k, enc_states.shape[-1])),
        inputs=emb[go],
        lm_state=init_lm_fusion[0],
        lm_inputs=init_lm_fusion[1],
        num_finished=jnp.zeros((B,), jnp.int32),
        fin_scores=jnp.full((B, k), NEG_INF),
        fin_seqs=jnp.zeros((B, k, max_steps), jnp.int32),
        fin_lens=jnp.zeros((B, k), jnp.int32),
        cum_alpha=jnp.zeros((B, k, T_enc)),
        fin_cov=jnp.zeros((B, k)),
        ctc_ps=(ctc_scorer.init_state(k) if use_joint else ()),
        bias_node=(jnp.zeros((B, k), jnp.int32) if use_bias else ()),
        ilm_cell_states=(() if not use_ilm else
                         td.zero_caches(dec_cfg, (B, k), max_steps) if is_xf
                         else tuple(
                             _zero_cell_state(dec_cfg.use_lstm, (B, k),
                                              dec_cfg.hidden_size_dec)
                             for _ in range(dec_cfg.num_layers_dec))),
        ilm_dec_lm_state=(_zero_cell_state(
            dec_cfg.use_lstm, (B, k), dec_cfg.lm_hidden_size)
            if use_ilm and not is_xf else ()),
    )

    def cov_term(cum_alpha):
        """GNMT-style coverage: sum_t log(min(cum_alpha_t, 1)) over valid
        encoder positions (extension; off unless apply_cov_penalty)."""
        clipped = jnp.clip(cum_alpha, 1e-6, 1.0)
        return jnp.sum(jnp.log(clipped) * ctx.mask[:, None, :], axis=-1)

    b_idx = jnp.arange(B)[:, None]
    ranks = jnp.arange(k)[None, :]

    def cond(state: BeamState):
        return jnp.logical_and(state.t < max_steps, jnp.any(state.alive))

    def body(state: BeamState) -> BeamState:
        new_cell_states, new_dec_lm, new_context, alpha, logp = _dec_step(
            dec_params, dec_cfg, ctx, state, xf_indirect)
        cum_all = state.cum_alpha + alpha        # per parent hyp [B,k,T]
        if use_joint:
            # One-pass joint CTC/attention: every candidate extension also
            # pays/earns its CTC prefix-score delta (eval/ctc_prefix.py).
            ctc_delta, cand_ps = ctc_scorer.step(state.ctc_ps, logp)
            combined = (1.0 - jw) * logp + jw * ctc_delta
        else:
            cand_ps = ()
            combined = logp
        if use_lm:
            if lm_indirect:
                from e2e_asr_tpu.models.rnn_lm import fusion_step_indirect
                lm_logp, new_lm_state = fusion_step_indirect(
                    lm_params, state.lm_inputs, state.lm_state, state.t)
            else:
                new_lm_state, lm_logp = _lm_step(lm_params, state.lm_state,
                                                 state.lm_inputs)
            combined = combined + beam_cfg.lm_weight * lm_logp
        else:
            new_lm_state = state.lm_state
        if use_ilm:
            # ILME: subtract the decoder's own (zero-context) LM estimate so
            # the external LM replaces, rather than stacks on, the internal
            # one (density-ratio/ILME fusion).
            if is_xf:
                if xf_indirect:
                    new_ilm_cells, _, _, ilm_logp = td.step_beam_indirect(
                        dec_params, dec_cfg, ctx, state.ilm_cell_states,
                        state.dec_lm_state, state.inputs, state.t,
                        zero_cross=True)
                else:
                    new_ilm_cells, _, _, ilm_logp = td.step_beam(
                        dec_params, dec_cfg, ctx, state.ilm_cell_states,
                        state.inputs, state.t, zero_cross=True)
                new_ilm_dec_lm = ()
            else:
                new_ilm_cells, new_ilm_dec_lm, ilm_logp = _ilm_step(
                    dec_params, dec_cfg, enc_states.shape[-1], state.inputs,
                    state.ilm_dec_lm_state, state.ilm_cell_states)
            combined = combined - beam_cfg.ilm_weight * ilm_logp
        if use_bias:
            from e2e_asr_tpu.eval import biasing
            b_delta, b_targets = biasing.bias_step(bias[0], state.bias_node,
                                                   bias[1])
            combined = combined + b_delta

        if use_sel_kernel:
            # One-launch fused selection (ops/beam_select_pallas.py).
            sel = beam_select_pallas.beam_select(
                state.scores, combined, state.alive, state.num_finished,
                eos_id=EOS_ID)
            vals, parent, token = sel["vals"], sel["parent"], sel["token"]
            fin_sel = sel["fin_sel"] > 0
            live_sel = (sel["accept"] > 0) & ~fin_sel
            fin_dest = sel["fin_dest"]
            order = sel["order"]
            slot_valid = sel["slot_valid"] > 0
        else:
            cand = jnp.where(state.alive[:, :, None],
                             state.scores[:, :, None] + combined, NEG_INF)
            vals, flat_idx = jax.lax.top_k(cand.reshape(B, k * V), k)  # [B,k]
            parent = flat_idx // V
            token = flat_idx % V
            num_live = k - state.num_finished                      # [B]
            accept = ranks < num_live[:, None]
            is_eos = token == EOS_ID
            fin_sel = accept & is_eos
            live_sel = accept & ~is_eos
            fin_rank = jnp.cumsum(fin_sel, axis=1) - 1             # [B,k]
            fin_dest = jnp.where(fin_sel,
                                 state.num_finished[:, None] + fin_rank, k)
            order = jnp.argsort(~live_sel, axis=1, stable=True)    # live first
            slot_valid = jnp.take_along_axis(live_sel, order, axis=1)

        new_len = state.t + 1
        stored = vals + penalty * new_len.astype(vals.dtype)

        # Candidate sequences for all k ranks: parent seq + token at position t.
        cand_seqs = jnp.take_along_axis(state.seqs, parent[:, :, None], axis=1)
        cand_seqs = cand_seqs.at[b_idx, ranks, state.t].set(token)

        # --- finished buffer: append newly finished in rank order ----------
        fin_scores = state.fin_scores.at[b_idx, fin_dest].set(
            stored, mode="drop")
        fin_seqs = state.fin_seqs.at[b_idx, fin_dest].set(
            cand_seqs, mode="drop")
        fin_lens = state.fin_lens.at[b_idx, fin_dest].set(
            jnp.broadcast_to(new_len, (B, k)), mode="drop")
        num_finished = state.num_finished + jnp.sum(fin_sel, axis=1)
        if use_cov:
            cand_cov = cov_term(jnp.take_along_axis(
                cum_all, parent[:, :, None], axis=1))
            fin_cov = state.fin_cov.at[b_idx, fin_dest].set(
                cand_cov, mode="drop")
        else:
            fin_cov = state.fin_cov

        # --- live beam: compact accepted non-EOS candidates in rank order --
        # (order / slot_valid computed above, by the selection kernel or XLA)
        sel_parent = jnp.take_along_axis(parent, order, axis=1)
        sel_token = jnp.take_along_axis(token, order, axis=1)
        sel_scores = jnp.take_along_axis(stored, order, axis=1)

        if xf_indirect:
            # The caches stay in place; only the ancestry map reorders
            # (a [B,k,S] int32 gather instead of the multi-MB cache copy),
            # then position t records which rank computed this step.
            g_context, g_cum_alpha = _gather_beam(
                (new_context, cum_all), sel_parent)
            g_cell_states = new_cell_states
            g_dec_lm = _advance_ancestry(state.dec_lm_state, sel_parent,
                                         state.t)
        else:
            new_state_tree = _gather_beam(
                (new_cell_states, new_dec_lm, new_context, cum_all),
                sel_parent)
            (g_cell_states, g_dec_lm, g_context, g_cum_alpha) = new_state_tree
        if lm_indirect:
            # Same trick for the fusion LM's caches: in place, ancestry
            # reordered + position t set to the parent's rank.
            # Pass every non-ancestry field through untouched so a future
            # addition to transformer_lm.fusion_state can't be silently
            # dropped from the carry.
            g_lm_state = {**new_lm_state,
                          "anc": _advance_ancestry(new_lm_state["anc"],
                                                   sel_parent, state.t)}
        else:
            g_lm_state = _gather_beam(new_lm_state, sel_parent)
        if use_ilm:
            if xf_indirect:
                g_ilm_cells, g_ilm_dec_lm = new_ilm_cells, ()
            else:
                g_ilm_cells, g_ilm_dec_lm = _gather_beam(
                    (new_ilm_cells, new_ilm_dec_lm), sel_parent)
        else:
            g_ilm_cells, g_ilm_dec_lm = (), ()

        safe_token = jnp.where(slot_valid, sel_token, 0)
        new_inputs = emb[safe_token]
        if use_lm:
            from e2e_asr_tpu.models.rnn_lm import fusion_next_input
            new_lm_inputs = fusion_next_input(lm_params, safe_token)
        else:
            new_lm_inputs = ()
        new_ctc_ps = (ctc_scorer.select(cand_ps, sel_parent, safe_token)
                      if use_joint else ())
        if use_bias:
            from e2e_asr_tpu.eval import biasing
            new_bias_node = biasing.bias_select(b_targets, sel_parent,
                                                safe_token)
        else:
            new_bias_node = ()

        new_seqs = jnp.take_along_axis(cand_seqs, order[:, :, None], axis=1)

        return BeamState(
            t=state.t + 1,
            alive=slot_valid,
            scores=jnp.where(slot_valid, sel_scores, NEG_INF),
            seqs=new_seqs,
            dec_cell_states=g_cell_states,
            dec_lm_state=g_dec_lm,
            context=g_context,
            inputs=new_inputs,
            lm_state=g_lm_state,
            lm_inputs=new_lm_inputs,
            num_finished=num_finished,
            fin_scores=fin_scores,
            fin_seqs=fin_seqs,
            fin_lens=fin_lens,
            cum_alpha=g_cum_alpha,
            fin_cov=fin_cov,
            ctc_ps=new_ctc_ps,
            bias_node=new_bias_node,
            ilm_cell_states=g_ilm_cells,
            ilm_dec_lm_state=g_ilm_dec_lm,
        )

    final = jax.lax.while_loop(cond, body, init)

    # Final candidates: finished ∪ still-live (beam_search.py:334-338).
    live_scores = jnp.where(final.alive, final.scores, NEG_INF)
    if use_bias:
        # Unfinished hypotheses give back their partial-match bonus (the
        # finished ones already did, through the <eos> candidate's delta).
        from e2e_asr_tpu.eval import biasing
        live_scores = live_scores - jnp.where(
            final.alive, biasing.pending_bonus(bias[0], final.bias_node,
                                               bias[1]), 0.0)
    all_scores = jnp.concatenate([final.fin_scores, live_scores], axis=1)
    if use_cov:
        live_cov = cov_term(final.cum_alpha)
        all_scores = all_scores + beam_cfg.cov_penalty * jnp.concatenate(
            [final.fin_cov, live_cov], axis=1)
    all_seqs = jnp.concatenate([final.fin_seqs, final.seqs], axis=1)
    live_lens = jnp.broadcast_to(final.t, (B, k)).astype(jnp.int32)
    all_lens = jnp.concatenate([final.fin_lens, live_lens], axis=1)

    best = jnp.argmax(all_scores, axis=1)                          # [B]
    tokens = jnp.take_along_axis(all_seqs, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(all_lens, best[:, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(all_scores, best[:, None], axis=1)[:, 0]
    if return_nbest:
        return (tokens, lens, scores), (all_seqs, all_lens, all_scores)
    return tokens, lens, scores
