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


def test_beam_zero_length_inputs():
    cfg, params, feats, _ = _setup(seed=5)
    tokens, lens = transducer_beam_search(params, cfg, feats,
                                          jnp.asarray([0, 0, 0]), beam_size=2)
    assert (np.asarray(tokens) == 0).all()
    assert (np.asarray(lens) == 0).all()
