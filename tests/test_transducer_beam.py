"""Transducer beam search: greedy ≡ beam(k=1), score monotonicity in k,
and output-contract checks."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import DecoderConfig, EncoderConfig, Seq2SeqConfig
from e2e_asr_tpu.eval.transducer_beam import (transducer_beam_decode,
                                              transducer_beam_search)
from e2e_asr_tpu.models import seq2seq, transducer


def _cfg(vocab=12, joint=16):
    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 10},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4, model_family="transducer")
    cfg.decoders["char"] = DecoderConfig(hidden_size_dec=16, emb_size=8,
                                         vocab_size=vocab, joint_dim=joint,
                                         out_prob_dec=1.0, max_output=10)
    return cfg


def _setup(seed=0, B=3, T=20):
    rng = np.random.default_rng(seed)
    cfg = _cfg()
    params = transducer.init(jax.random.PRNGKey(seed), cfg, vocab_size=12)
    feats = jnp.asarray(rng.normal(size=(B, T, 4)).astype(np.float32))
    feat_lens = jnp.asarray([T, T - 6, T // 2][:B])
    return cfg, params, feats, feat_lens


def test_beam_k1_equals_greedy():
    """beam_size=1 with E expansions == greedy with max_symbols_per_frame=E
    (the attention family's greedy ≡ beam(k=1) property, transducer form)."""
    cfg, params, feats, feat_lens = _setup()
    for E in (1, 3):
        greedy = np.asarray(transducer.greedy_decode(
            params, cfg, feats, feat_lens, max_symbols_per_frame=E))
        beam, _ = transducer_beam_search(params, cfg, feats, feat_lens,
                                         beam_size=1, max_expansions=E)
        np.testing.assert_array_equal(np.asarray(beam), greedy, err_msg=f"E={E}")


def _alignment_score(params, cfg, enc, tokens, T):
    """Log-prob of the best-aligned path consistent with `tokens` under the
    model — computed exactly with the lattice DP (max over alignments is not
    needed: the beam reports a SINGLE alignment's score, so we check it is
    <= the total sequence mass and > NEG/2)."""
    from e2e_asr_tpu.core.transducer_loss import transducer_loss
    U = max(len(tokens), 1)
    labels = jnp.zeros((1, U), jnp.int32)
    if tokens:
        labels = labels.at[0, :len(tokens)].set(jnp.asarray(tokens))
    pred = transducer.pred_states(params["pred"], cfg, labels,
                                  jnp.asarray([len(tokens)]))
    blank_lp, label_lp = transducer.lattice_logprobs(
        params, labels, enc[None], pred)
    return -float(transducer_loss(blank_lp, label_lp, jnp.asarray([T]),
                                  jnp.asarray([len(tokens)]))[0])


def test_beam_scores_are_valid_alignment_masses():
    """Each returned beam score (one alignment's log-prob) must be <= the
    full marginal log-mass of its label sequence under the model."""
    cfg, params, feats, feat_lens = _setup(seed=2)
    attn_states, _, enc_lens = seq2seq.encode(params, cfg, feats, feat_lens)
    depth = cfg.num_layers["char"]
    enc, els = attn_states[depth], enc_lens[depth]
    seqs, lens, scores = transducer_beam_decode(params, cfg, enc, els,
                                                beam_size=4)
    seqs, lens, scores = map(np.asarray, (seqs, lens, scores))
    for b in range(seqs.shape[0]):
        for j in range(seqs.shape[1]):
            if scores[b, j] <= -1e29:
                continue
            toks = list(seqs[b, j, :lens[b, j]])
            marginal = _alignment_score(params, cfg, np.asarray(enc[b]),
                                        toks, int(els[b]))
            assert scores[b, j] <= marginal + 1e-3, (b, j, scores[b, j],
                                                     marginal)


def test_beam_best_score_monotone_in_k():
    cfg, params, feats, feat_lens = _setup(seed=3)
    attn_states, _, enc_lens = seq2seq.encode(params, cfg, feats, feat_lens)
    depth = cfg.num_layers["char"]
    prev = None
    for k in (1, 2, 4, 8):
        _, _, scores = transducer_beam_decode(
            params, cfg, attn_states[depth], enc_lens[depth], beam_size=k)
        best = np.asarray(scores)[:, 0]
        if prev is not None:
            assert (best >= prev - 1e-4).all(), (k, best, prev)
        prev = best


def test_beam_sorted_and_padded():
    cfg, params, feats, feat_lens = _setup(seed=4)
    attn_states, _, enc_lens = seq2seq.encode(params, cfg, feats, feat_lens)
    depth = cfg.num_layers["char"]
    seqs, lens, scores = transducer_beam_decode(
        params, cfg, attn_states[depth], enc_lens[depth], beam_size=4)
    seqs, lens, scores = map(np.asarray, (seqs, lens, scores))
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    for b in range(seqs.shape[0]):
        for j in range(4):
            assert (seqs[b, j, lens[b, j]:] == 0).all()


def _make_lm(vocab: int, seed: int = 7, hid: int = 16):
    """Small external fusion LM in the rnn_lm.shared_lm_params layout."""
    from e2e_asr_tpu.models import attn_decoder
    dec_cfg = DecoderConfig(hidden_size_dec=hid, lm_hidden_size=hid,
                            emb_size=8, vocab_size=vocab, out_prob_dec=1.0)
    p = attn_decoder.init(jax.random.PRNGKey(seed), dec_cfg, attn_size=hid)
    return {"lstm": p["lm_cell"], "output_proj": p["output_proj"],
            "embedding": p["embedding"]}


def test_lm_fusion_weight_zero_is_noop():
    cfg, params, feats, feat_lens = _setup(seed=6)
    lm = _make_lm(12)
    base = transducer_beam_search(params, cfg, feats, feat_lens, beam_size=4)
    fused = transducer_beam_search(params, cfg, feats, feat_lens, beam_size=4,
                                   lm_params=lm, lm_weight=0.0)
    for a, b in zip(base, fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lm_fusion_exhaustive_enumeration_oracle():
    """With k large enough to hold EVERY alignment, the fused beam must
    reproduce brute-force enumeration: for each frame choose blank or
    (emit label, then forced blank), score = transducer log-probs +
    lm_weight * LM log-prob of each emitted label given the emitted prefix
    (LM state advances on emissions only). Pins selection, state threading,
    and the fusion bookkeeping end to end."""
    import itertools

    from e2e_asr_tpu.core import cells
    from e2e_asr_tpu.core.layers import dense
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.models.transducer import BLANK_ID, _pred_step

    V, T, lm_weight = 4, 3, 0.7
    rng = np.random.default_rng(11)
    cfg = _cfg(vocab=V)
    params = transducer.init(jax.random.PRNGKey(11), cfg, vocab_size=V)
    lm = _make_lm(V, seed=12)
    enc = jnp.asarray(rng.normal(size=(1, T, 16)).astype(np.float32))
    joint = params["joint"]
    enc_p = dense(joint["enc_proj"], enc)[0]                  # [T, J]

    def joint_lp(pred_p, t):
        logits = dense(joint["out"], jnp.tanh(enc_p[t] + pred_p))
        return np.asarray(jax.nn.log_softmax(logits, axis=-1))

    def lm_lp_and_next(lm_state, tok):
        out, new_state = cells.lstm_step(
            lm["lstm"], lm["embedding"][jnp.asarray([tok])], lm_state)
        lp = np.asarray(jax.nn.log_softmax(
            dense(lm["output_proj"], out), axis=-1))[0]
        return lp, new_state

    def pred0():
        states = tuple(
            cells.lstm_zero_state((1,), cfg.decoders["char"].hidden_size_dec)
            for _ in range(cfg.decoders["char"].num_layers_dec))
        out, states = _pred_step(params["pred"], cfg,
                                 jnp.asarray([text.GO_ID]), states)
        return dense(joint["pred_proj"], out)[0], states

    best = []
    for decisions in itertools.product(range(V), repeat=T):
        pred_p, states = pred0()
        lm_state = cells.lstm_zero_state((1,), 16)
        lm_last = text.GO_ID
        score, toks = 0.0, []
        for t, d in enumerate(decisions):
            lp = joint_lp(pred_p, t)
            if d == BLANK_ID:
                score += lp[BLANK_ID]
            else:
                lm_lp, lm_next = lm_lp_and_next(lm_state, lm_last)
                score += lp[d] + lm_weight * lm_lp[d]
                lm_state, lm_last = lm_next, d
                out, states = _pred_step(params["pred"], cfg,
                                         jnp.asarray([d]), states)
                pred_p = dense(joint["pred_proj"], out)[0]
                score += joint_lp(pred_p, t)[BLANK_ID]
                toks.append(d)
        best.append((score, tuple(toks)))
    best.sort(key=lambda x: -x[0])

    k = V ** T  # holds every alignment: the beam IS exhaustive search
    seqs, lens, scores = transducer_beam_decode(
        params, cfg, enc, jnp.asarray([T]), beam_size=k, max_expansions=1,
        lm_params=lm, lm_weight=lm_weight)
    seqs, lens, scores = map(np.asarray, (seqs, lens, scores))
    for j in range(5):
        np.testing.assert_allclose(scores[0, j], best[j][0], atol=1e-4)
        assert tuple(seqs[0, j, :lens[0, j]]) == best[j][1], j


def test_lm_fusion_suppresses_lm_disfavored_tokens():
    """An LM that hates every token but 5 must purge non-5 emissions from
    the fused output (and change the unfused result). Fusion can only
    penalize emissions — LM log-probs are <= 0 and blank is never scored —
    so the honest property is suppression, not forced emission."""
    cfg, params, feats, feat_lens = _setup(seed=8)
    out = params["joint"]["out"]
    params["joint"]["out"] = {
        "kernel": out["kernel"],
        "bias": out["bias"].at[1:].add(4.0)}
    lm = _make_lm(12, seed=9)
    lm = dict(lm, output_proj={
        "kernel": lm["output_proj"]["kernel"] * 0.0,
        "bias": lm["output_proj"]["bias"].at[:].set(-50.0).at[5].set(50.0)})
    base_toks, base_lens = transducer_beam_search(params, cfg, feats,
                                                  feat_lens, beam_size=4)
    toks, lens = transducer_beam_search(params, cfg, feats, feat_lens,
                                        beam_size=4, lm_params=lm,
                                        lm_weight=1.0)
    toks, lens = np.asarray(toks), np.asarray(lens)
    base_toks, base_lens = np.asarray(base_toks), np.asarray(base_lens)
    assert base_lens[0] > 0, "model should emit without fusion"
    assert (base_toks[0, :base_lens[0]] != 5).any()
    assert (toks[0, :lens[0]] == 5).all()  # only LM-approved tokens survive
    assert (lens[0] != base_lens[0]) or (
        toks[0, :lens[0]] != base_toks[0, :base_lens[0]]).any()


def test_beam_zero_length_inputs():
    cfg, params, feats, _ = _setup(seed=5)
    tokens, lens = transducer_beam_search(params, cfg, feats,
                                          jnp.asarray([0, 0, 0]), beam_size=2)
    assert (np.asarray(tokens) == 0).all()
    assert (np.asarray(lens) == 0).all()
