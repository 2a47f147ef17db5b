"""Second-pass n-best LM rescoring (-lm_rescore; eval/rescore.lm_nbest_scores).

The scorer is pinned against a python loop over the SAME fusion hooks the
beams use per-step (rnn_lm.fusion_init/fusion_step/fusion_next_input), for
both fusion-LM kinds (RNN, trigram table), both eos conventions, empty and
full-length candidates; the decoder integration is pinned against a manual
rerank of beam_decode's raw n-best.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import BeamConfig
from e2e_asr_tpu.core import cells
from e2e_asr_tpu.data.text import EOS_ID, GO_ID
from e2e_asr_tpu.eval import rescore
from e2e_asr_tpu.models import rnn_lm, seq2seq
from tests.test_seq2seq import make_batch, tiny_cfg


def _tiny_rnn_lm(V=11, E=6, H=8, seed=5):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "embedding": jax.random.uniform(k1, (V, E), minval=-1, maxval=1),
        "lstm": cells.lstm_init(k2, E, H),
        "output_proj": {"kernel": jax.random.normal(k3, (H, V)) * 0.3,
                        "bias": jnp.zeros((V,))},
    }


def _tiny_ngram(rng, V=11):
    t = rng.normal(size=(V, V, V)).astype(np.float32)
    return {"ngram": jax.nn.log_softmax(jnp.asarray(t), axis=-1)}


def _py_lm_logp(lm, seq, *, eos_in_seq):
    """Oracle: one candidate through the fusion hooks, step by step."""
    state, x = rnn_lm.fusion_init(lm, (1,), GO_ID)
    total = 0.0
    for tok in seq:
        logp, state = rnn_lm.fusion_step(lm, x, state)
        total += float(logp[0, int(tok)])
        x = rnn_lm.fusion_next_input(lm, jnp.array([int(tok)]))
    if not eos_in_seq:
        logp, _ = rnn_lm.fusion_step(lm, x, state)
        total += float(logp[0, EOS_ID])
    return total


# Candidates: batch 0 has a normal + an empty slot; batch 1 a short one and
# one filling every position (len == S exercises the post-scan eos step).
SEQS = np.array([[[4, 5, 6, 2, 0], [0, 0, 0, 0, 0]],
                 [[7, 2, 0, 0, 0], [8, 9, 3, 4, 2]]], np.int32)
LENS = np.array([[4, 0], [2, 5]], np.int32)


@pytest.mark.parametrize("kind", ["rnn", "ngram"])
@pytest.mark.parametrize("eos_in_seq", [True, False])
def test_lm_nbest_scores_match_fusion_hook_oracle(rng, kind, eos_in_seq):
    lm = _tiny_rnn_lm() if kind == "rnn" else _tiny_ngram(rng)
    out = np.asarray(rescore.lm_nbest_scores(
        lm, jnp.asarray(SEQS), jnp.asarray(LENS), eos_in_seq=eos_in_seq))
    for b in range(SEQS.shape[0]):
        for n in range(SEQS.shape[1]):
            L = int(LENS[b, n])
            if L == 0 and eos_in_seq:
                # Attention sentinel slot: contributes nothing (masked by
                # the caller's score sentinel).
                assert out[b, n] == 0.0
                continue
            # L == 0 with eos_in_seq=False: a real empty hypothesis,
            # scored log p(eos | <go>) by the same oracle loop.
            want = _py_lm_logp(lm, SEQS[b, n, :L], eos_in_seq=eos_in_seq)
            np.testing.assert_allclose(out[b, n], want, rtol=1e-5, atol=1e-5)


def _setup_decode(rng, lm_rescore, *, lm_params=None, nbest=1):
    from e2e_asr_tpu.eval.beam_eval import make_beam_decoder

    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg, B=2, T=16, T_dec=5)
    bc = BeamConfig(beam_size=3, max_steps=7, lm_rescore=lm_rescore)
    decode = make_beam_decoder(cfg, bc, lm_params=lm_params, nbest=nbest)
    return cfg, params, batch, bc, decode


def _manual_rerank(cfg, params, batch, bc, lm):
    """beam_decode's raw n-best + lm_nbest_scores, combined by hand."""
    from e2e_asr_tpu.eval.beam import beam_decode

    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    d = cfg.num_layers["char"]
    (_, _, _), (seqs, lens, scores) = beam_decode(
        params["decoder_char"], cfg.decoders["char"], bc,
        attn_states[d], enc_lens[d], return_nbest=True)
    lm_s = rescore.lm_nbest_scores(lm, seqs, lens)
    combined = jnp.where(scores <= -1e29, scores,
                         scores + bc.lm_rescore * lm_s)
    return seqs, lens, combined


def test_lm_rescore_decode_equals_manual_rerank(rng):
    lm = _tiny_rnn_lm()
    cfg, params, batch, bc, decode = _setup_decode(rng, 0.7, lm_params=lm)
    tokens, lens, scores = decode(params, batch)
    seqs_all, lens_all, combined = _manual_rerank(cfg, params, batch, bc, lm)
    best = np.asarray(jnp.argmax(combined, axis=1))
    for i in range(tokens.shape[0]):
        np.testing.assert_array_equal(np.asarray(tokens[i]),
                                      np.asarray(seqs_all[i, best[i]]))
        assert int(lens[i]) == int(lens_all[i, best[i]])
        np.testing.assert_allclose(float(scores[i]),
                                   float(combined[i, best[i]]), rtol=1e-5)


def test_lm_rescore_uses_tied_lm_when_no_external(rng):
    """lm_params=None must fall back to the decoder's own weight-tied LM
    (beam_search.py:111-134 semantics, same as -lm_weight fusion)."""
    cfg, params, batch, bc, decode = _setup_decode(rng, 0.5)
    tokens, lens, scores = decode(params, batch)
    tied = rnn_lm.shared_lm_params(params)
    seqs_all, lens_all, combined = _manual_rerank(cfg, params, batch, bc,
                                                  tied)
    best = np.asarray(jnp.argmax(combined, axis=1))
    for i in range(tokens.shape[0]):
        np.testing.assert_array_equal(np.asarray(tokens[i]),
                                      np.asarray(seqs_all[i, best[i]]))


def test_lm_rescore_composes_with_nbest(rng):
    """-nbest N on top of -lm_rescore returns the rescored order."""
    lm = _tiny_rnn_lm()
    cfg, params, batch, bc, decode = _setup_decode(rng, 0.7, lm_params=lm,
                                                   nbest=2)
    seqs_n, lens_n, scores_n = decode(params, batch)
    assert seqs_n.shape[1] == 2
    _, lens_all, combined = _manual_rerank(cfg, params, batch, bc, lm)
    order = np.asarray(jnp.argsort(-combined, axis=1))[:, :2]
    srt = np.sort(np.asarray(combined), axis=1)[:, ::-1][:, :2]
    np.testing.assert_allclose(np.asarray(scores_n), srt, rtol=1e-5)
    lens_all = np.asarray(lens_all)
    for i in range(seqs_n.shape[0]):
        for r in range(2):
            assert int(lens_n[i, r]) == int(lens_all[i, order[i, r]])


def test_ctc_evaluator_lm_rescore_reranks(rng, tmp_path):
    """CTCEvaluator(lm_rescore=w) must return its own beam's n-best
    re-ranked by score + w*log p_LM (terminal-eos convention)."""
    from e2e_asr_tpu.config import EncoderConfig, Seq2SeqConfig
    from e2e_asr_tpu.eval.ctc_beam import ctc_beam_decode
    from e2e_asr_tpu.eval.greedy import CTCEvaluator
    from e2e_asr_tpu.models import ctc

    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 8},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4)
    params = ctc.init(jax.random.PRNGKey(0), cfg, vocab_size=11)
    lm = _tiny_rnn_lm()
    feats = jnp.asarray(rng.normal(size=(2, 12, 4)).astype(np.float32))
    flens = jnp.array([12, 9])
    ev = CTCEvaluator(cfg, ["x"] * 11, str(tmp_path), beam_size=3,
                      lm_params=lm, lm_rescore=0.6)
    s1, l1, sc1 = ev._nbest_decode(params=params, feats=feats,
                                   feat_lens=flens)
    assert s1.shape[1] == 1 and not ev._write_nbest
    lg, el = ctc.logits(params, cfg, feats, flens)
    seqs, lens, scores = ctc_beam_decode(jax.nn.log_softmax(lg, axis=-1),
                                         el, beam_size=3,
                                         blank_id=ctc.BLANK_ID)
    lm_s = rescore.lm_nbest_scores(lm, seqs, lens, eos_in_seq=False)
    comb = jnp.where(scores <= -1e29, scores, scores + 0.6 * lm_s)
    best = np.asarray(jnp.argmax(comb, axis=1))
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(s1[i, 0]),
                                      np.asarray(seqs[i, best[i]]))
        np.testing.assert_allclose(float(sc1[i, 0]),
                                   float(comb[i, best[i]]), rtol=1e-5)


def test_transducer_evaluator_lm_rescore_reranks(rng, tmp_path):
    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig,
                                    Seq2SeqConfig)
    from e2e_asr_tpu.eval.greedy import TransducerEvaluator
    from e2e_asr_tpu.eval.transducer_beam import transducer_beam_decode
    from e2e_asr_tpu.models import transducer

    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 10},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4, model_family="transducer")
    cfg.decoders["char"] = DecoderConfig(hidden_size_dec=16, emb_size=8,
                                         vocab_size=11, joint_dim=16,
                                         out_prob_dec=1.0, max_output=10)
    params = transducer.init(jax.random.PRNGKey(0), cfg, vocab_size=11)
    lm = _tiny_rnn_lm()
    feats = jnp.asarray(rng.normal(size=(2, 12, 4)).astype(np.float32))
    flens = jnp.array([12, 9])
    ev = TransducerEvaluator(cfg, ["x"] * 11, str(tmp_path), beam_size=3,
                             lm_params=lm, lm_rescore=0.6, nbest=2)
    s1, l1, sc1 = ev._nbest_decode(params=params, feats=feats,
                                   feat_lens=flens)
    assert s1.shape[1] == 2 and ev._write_nbest
    attn_states, _, enc_lens = seq2seq.encode(params, cfg, feats, flens)
    d = cfg.num_layers["char"]
    seqs, lens, scores = transducer_beam_decode(
        params, cfg, attn_states[d], enc_lens[d], beam_size=3)
    lm_s = rescore.lm_nbest_scores(lm, seqs, lens, eos_in_seq=False)
    comb = jnp.where(scores <= -1e29, scores, scores + 0.6 * lm_s)
    order = np.asarray(jnp.argsort(-comb, axis=1, stable=True))[:, :2]
    for i in range(2):
        for r in range(2):
            np.testing.assert_array_equal(np.asarray(s1[i, r]),
                                          np.asarray(seqs[i, order[i, r]]))


def test_numpy_trigram_artifact_inside_jit(rng):
    """lm_loader hands back plain-numpy npz tables; lm_nbest_scores must
    work when a jitted caller CLOSES OVER them (numpy arrays can't be
    indexed by tracers — caught by a real CLI drive)."""
    lm = {"ngram": np.asarray(_tiny_ngram(rng)["ngram"])}

    @jax.jit
    def run(seqs, lens):
        return rescore.lm_nbest_scores(lm, seqs, lens, eos_in_seq=False)

    out = np.asarray(run(jnp.asarray(SEQS), jnp.asarray(LENS)))
    want = np.asarray(rescore.lm_nbest_scores(
        {"ngram": jnp.asarray(lm["ngram"])}, jnp.asarray(SEQS),
        jnp.asarray(LENS), eos_in_seq=False))
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_family_guards(rng, tmp_path):
    from e2e_asr_tpu.config import EncoderConfig, Seq2SeqConfig
    from e2e_asr_tpu.eval.greedy import CTCEvaluator

    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 8},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4)
    with pytest.raises(ValueError, match="needs -lm_path"):
        CTCEvaluator(cfg, ["x"] * 11, str(tmp_path), lm_rescore=0.5)
    with pytest.raises(ValueError, match="pick one"):
        CTCEvaluator(cfg, ["x"] * 11, str(tmp_path), lm_rescore=0.5,
                     lm_weight=0.1, lm_params=_tiny_rnn_lm())


def test_guards(rng):
    from e2e_asr_tpu.eval.beam_eval import BeamEvaluator, make_beam_decoder

    cfg = tiny_cfg()
    with pytest.raises(ValueError, match="pick one"):
        make_beam_decoder(cfg, BeamConfig(beam_size=2, lm_rescore=0.5,
                                          lm_weight=0.3))
    with pytest.raises(ValueError, match="second-pass rescorer"):
        BeamEvaluator(cfg, BeamConfig(beam_size=2, lm_rescore=0.5,
                                      ctc_rescore=0.3), ["x"] * 11, "/tmp/x")


def test_serving_family_decoder_lm_rescore_ctc(rng):
    """The serving engine's CTC path applies -lm_rescore exactly like the
    eval CLI: _make_family_decoder's top-1 == manual rerank of the CTC
    beam's n-best under the shared apply_lm_rescore recipe."""
    from e2e_asr_tpu.config import EncoderConfig, Seq2SeqConfig
    from e2e_asr_tpu.eval.ctc_beam import ctc_beam_decode
    from e2e_asr_tpu.eval.serving import _make_family_decoder
    from e2e_asr_tpu.models import ctc

    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 8},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4, model_family="ctc")
    params = ctc.init(jax.random.PRNGKey(0), cfg, vocab_size=11)
    lm = _tiny_rnn_lm()
    feats = jnp.asarray(rng.normal(size=(2, 12, 4)).astype(np.float32))
    flens = jnp.array([12, 9])
    decode = _make_family_decoder(
        cfg, BeamConfig(beam_size=3, max_steps=8, lm_rescore=0.6),
        lm_params=lm)
    toks, lens1, sc1 = decode(params, {"logmel": feats,
                                       "logmel_len": flens})
    lg, el = ctc.logits(params, cfg, feats, flens)
    seqs, lens, scores = ctc_beam_decode(jax.nn.log_softmax(lg, axis=-1),
                                         el, beam_size=3,
                                         blank_id=ctc.BLANK_ID)
    lm_s = rescore.lm_nbest_scores(lm, seqs, lens, eos_in_seq=False)
    comb = jnp.where(scores <= -1e29, scores, scores + 0.6 * lm_s)
    best = np.asarray(jnp.argmax(comb, axis=1))
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(toks[i]),
                                      np.asarray(seqs[i, best[i]]))
        np.testing.assert_allclose(float(sc1[i]), float(comb[i, best[i]]),
                                   rtol=1e-5)


def test_serving_family_decoder_lm_rescore_transducer(rng):
    """Transducer serving path: top-1 == manual rerank (terminal-eos
    convention)."""
    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig,
                                    Seq2SeqConfig)
    from e2e_asr_tpu.eval.serving import _make_family_decoder
    from e2e_asr_tpu.eval.transducer_beam import transducer_beam_decode
    from e2e_asr_tpu.models import transducer

    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 10},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4, model_family="transducer")
    cfg.decoders["char"] = DecoderConfig(hidden_size_dec=16, emb_size=8,
                                         vocab_size=11, joint_dim=16,
                                         out_prob_dec=1.0, max_output=10)
    params = transducer.init(jax.random.PRNGKey(0), cfg, vocab_size=11)
    lm = _tiny_rnn_lm()
    feats = jnp.asarray(rng.normal(size=(2, 12, 4)).astype(np.float32))
    flens = jnp.array([12, 9])
    decode = _make_family_decoder(
        cfg, BeamConfig(beam_size=3, max_steps=10, lm_rescore=0.6),
        lm_params=lm)
    toks, lens1, sc1 = decode(params, {"logmel": feats,
                                       "logmel_len": flens})
    attn_states, _, enc_lens = seq2seq.encode(params, cfg, feats, flens)
    d = cfg.num_layers["char"]
    seqs, lens, scores = transducer_beam_decode(
        params, cfg, attn_states[d], enc_lens[d], beam_size=3)
    lm_s = rescore.lm_nbest_scores(lm, seqs, lens, eos_in_seq=False)
    comb = jnp.where(scores <= -1e29, scores, scores + 0.6 * lm_s)
    best = np.asarray(jnp.argmax(comb, axis=1))
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(toks[i]),
                                      np.asarray(seqs[i, best[i]]))


def test_serving_per_request_bias_decoder_lm_rescore(rng):
    """-lm_rescore composes with per-request biasing: with empty tries the
    biased decoder's top-1 must equal the unbiased manual rerank
    (attention family, eos-in-seq convention)."""
    from e2e_asr_tpu.eval import biasing as biasing_lib
    from e2e_asr_tpu.eval.serving import _make_per_request_bias_decoder

    lm = _tiny_rnn_lm()
    cfg, params, batch, bc, _ = _setup_decode(rng, 0.7, lm_params=lm)
    decode = _make_per_request_bias_decoder(cfg, bc, lm_params=lm,
                                            weight=1.0)
    V = cfg.decoders["char"].vocab_size
    empty = jax.tree_util.tree_map(
        np.asarray, biasing_lib.build_bias_trie([], V, pad_to=4))
    B = batch["logmel"].shape[0]
    batch = dict(batch)
    batch["bias_tries"] = {k: jnp.asarray(np.stack([empty[k]] * B))
                           for k in ("trans", "depth", "final")}
    toks, lens1, sc1 = decode(params, batch)
    seqs_all, lens_all, combined = _manual_rerank(cfg, params, batch, bc,
                                                  lm)
    best = np.asarray(jnp.argmax(combined, axis=1))
    for i in range(toks.shape[0]):
        np.testing.assert_array_equal(np.asarray(toks[i]),
                                      np.asarray(seqs_all[i, best[i]]))
        np.testing.assert_allclose(float(sc1[i]),
                                   float(combined[i, best[i]]), rtol=1e-5)


def test_serving_guards_lm_rescore(rng):
    """Engine-level guards: conflict with -lm_weight; CTC/transducer need
    an external LM; streaming rejects the second pass outright."""
    from e2e_asr_tpu.config import EncoderConfig, Seq2SeqConfig
    from e2e_asr_tpu.eval.serving import (_make_family_decoder,
                                          _make_per_request_bias_decoder)
    from e2e_asr_tpu.eval.streaming import StreamingTranscriber

    cfg = tiny_cfg()
    with pytest.raises(ValueError, match="pick one"):
        _make_family_decoder(cfg, BeamConfig(beam_size=2, lm_rescore=0.5,
                                             lm_weight=0.3))
    with pytest.raises(ValueError, match="pick one"):
        _make_per_request_bias_decoder(
            cfg, BeamConfig(beam_size=2, lm_rescore=0.5, lm_weight=0.3),
            weight=1.0)
    ctc_cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                            max_output={"char": 8},
                            encoder=EncoderConfig(hidden_size=8,
                                                  out_prob=1.0),
                            feat_length=4, model_family="ctc")
    with pytest.raises(ValueError, match="rescoring needs"):
        _make_family_decoder(ctc_cfg, BeamConfig(beam_size=2,
                                                 lm_rescore=0.5))
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="second pass"):
        StreamingTranscriber(params, cfg, ["x"] * 11, window=16, margin=4,
                             beam_cfg=BeamConfig(beam_size=2,
                                                 lm_rescore=0.5))


def test_transformer_decoder_shared_lm_needs_dec_cfg(rng):
    """The transformer decoder's tied LM view needs the decoder config
    (head count is not shape-borne): shared_lm_params without dec_cfg must
    raise an actionable error, not a KeyError inside the trace. Decode
    surfaces pass dec_cfg and work — pinned in test_tied_transformer_lm."""
    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig,
                                    Seq2SeqConfig)
    from e2e_asr_tpu.models import rnn_lm

    cfg = Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 10},
        encoder=EncoderConfig(hidden_size=8, out_prob=1.0, skip_step=2,
                              max_scaling_down=2),
        decoders={"char": DecoderConfig(
            decoder_type="transformer", hidden_size_dec=16,
            num_layers_dec=1, dec_heads=2, dec_ffn_mult=2, vocab_size=11,
            samp_prob=0.0, out_prob_dec=1.0, max_output=10)},
        feat_length=6)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="dec_cfg"):
        rnn_lm.shared_lm_params(params)
