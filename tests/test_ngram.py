"""Trigram LM training (tools/train_ngram.py) and fusion through the
shared rnn_lm.fusion_step hooks."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.tools import train_ngram


def test_witten_bell_values_and_normalization():
    V = 5
    seqs = [[1, 3, 4, 2], [1, 3, 3, 2]]
    tri, bi, uni = train_ngram.count_ngrams(seqs)
    assert tri[(1, 1, 3)] == 2          # <go>-padded start context
    assert bi[(3, 3)] == 1 and uni[3] == 3
    table = train_ngram.witten_bell_table(tri, bi, uni, V)
    p = np.exp(table)
    # Every context is a distribution.
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, rtol=1e-5)
    # Hand-computed Witten-Bell chain for p(3 | <go>, <go>):
    # p1[3] = (3 + 3/5) / (6 + 3); p2(3|1) = 2/3 + (1/3) p1[3];
    # p3(3|1,1) = (2 + p2(3|1)) / 3.
    p1_3 = (3 + 3 / 5) / 9
    p2_13 = 2 / 3 + p1_3 / 3
    np.testing.assert_allclose(p[1, 1, 3], (2 + p2_13) / 3, rtol=1e-6)
    # Unseen trigram context backs off to the bigram row; unseen bigram
    # context to the unigram.
    np.testing.assert_allclose(p[4, 4], p[0, 4], rtol=1e-6)   # both unseen (·,4)
    uni_row = np.exp(table[4, 0])      # context (4, 0): both unseen
    p1_full = (np.asarray([0, 0, 2, 3, 1.0]) + 3 / 5) / 9
    np.testing.assert_allclose(uni_row, p1_full, rtol=1e-6)


def _rand_ngram(rng, V):
    t = rng.normal(size=(V, V, V)).astype(np.float32)
    t = jax.nn.log_softmax(jnp.asarray(t), axis=-1)
    return {"ngram": t}


def _ngram_prefix_logprob(table, prefix, eos_id, go_id=1):
    """sum_i log p(l_i | hist) + log p(eos | hist) via direct table walks."""
    hist = (go_id, go_id)
    total = 0.0
    for tok in list(prefix) + [eos_id]:
        total += float(table[hist[0], hist[1], tok])
        hist = (hist[1], tok)
    return total


def test_ctc_beam_ngram_fusion_exact(rng):
    """The generic fused-enumeration oracle holds with a trigram fusion LM:
    merged masses == exact CTC mass x the n-gram factor."""
    from e2e_asr_tpu.eval.ctc_beam import ctc_beam_decode
    from tests.test_ctc_beam import _exact_prefix_probs, _merged_beam_masses

    T, V = 3, 3
    lm_weight, eos = 0.7, 2
    logits = rng.normal(size=(1, T, V)).astype(np.float32) * 1.5
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lm = _rand_ngram(rng, V)
    seqs, lens, scores = ctc_beam_decode(
        log_probs, jnp.array([T]), beam_size=32, lm_params=lm,
        lm_weight=lm_weight, lm_eos_id=eos)
    got = _merged_beam_masses(np.asarray(seqs[0]), np.asarray(lens[0]),
                              np.asarray(scores[0]))
    exact_ctc = _exact_prefix_probs(np.exp(np.asarray(log_probs[0])))
    table = np.asarray(lm["ngram"])
    exact_fused = {
        key: mass * np.exp(lm_weight * _ngram_prefix_logprob(table, key, eos))
        for key, mass in exact_ctc.items()}
    for key, mass in got.items():
        if mass < 1e-12:
            continue
        np.testing.assert_allclose(mass, exact_fused[key], rtol=2e-4,
                                   err_msg=str(key))
    best = max(exact_fused, key=exact_fused.get)
    assert tuple(int(x) for x in np.asarray(seqs[0, 0][: int(lens[0, 0])])) \
        == best


def test_attention_beam_ngram_suppression(rng):
    """A trigram that forbids one token removes it from the fused decode."""
    from e2e_asr_tpu.config import BeamConfig
    from e2e_asr_tpu.eval.beam import beam_decode
    from e2e_asr_tpu.models import seq2seq
    from tests.test_seq2seq import make_batch, tiny_cfg

    cfg = tiny_cfg()
    V = cfg.decoders["char"].vocab_size
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg, B=2, T=16, T_dec=5)
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    d = cfg.num_layers["char"]
    enc, el = attn_states[d], enc_lens[d]

    plain, plens, _ = beam_decode(params["decoder_char"],
                                  cfg.decoders["char"],
                                  BeamConfig(beam_size=2, max_steps=7),
                                  enc, el)
    emitted = {int(t) for b in range(2)
               for t in np.asarray(plain[b, : int(plens[b])])} - {2}
    victim = sorted(emitted)[0] if emitted else 4

    table = np.zeros((V, V, V), np.float32)
    table[:, :, victim] = -50.0
    table = jax.nn.log_softmax(jnp.asarray(table), axis=-1)
    toks, lens, _ = beam_decode(params["decoder_char"], cfg.decoders["char"],
                                BeamConfig(beam_size=2, max_steps=7,
                                           lm_weight=1.0),
                                enc, el, lm_params={"ngram": table})
    for b in range(2):
        assert victim not in set(
            int(t) for t in np.asarray(toks[b, : int(lens[b])]))


def test_transducer_beam_ngram_runs(rng):
    from e2e_asr_tpu.eval.transducer_beam import transducer_beam_decode
    from e2e_asr_tpu.models import transducer
    from tests.test_transducer_beam import _cfg

    cfg = _cfg()
    params = transducer.init(jax.random.PRNGKey(2), cfg, vocab_size=12)
    enc = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    el = jnp.array([6, 4])
    lm = _rand_ngram(rng, 12)
    t0, l0, s0 = transducer_beam_decode(params, cfg, enc, el, beam_size=3)
    t1, l1, s1 = transducer_beam_decode(params, cfg, enc, el, beam_size=3,
                                        lm_params=lm, lm_weight=0.5)
    assert np.all(np.isfinite(np.asarray(s1)[np.asarray(s1) > -1e29]))
    # weight 0 with the table present is a strict no-op
    t2, l2, s2 = transducer_beam_decode(params, cfg, enc, el, beam_size=3,
                                        lm_params=lm, lm_weight=0.0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s2))


def test_train_ngram_tool_end_to_end(tmp_path):
    from e2e_asr_tpu.data.synth import make_vocab_dir
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.tools.prepare_corpus import write_lm_from_transcripts

    make_vocab_dir(str(tmp_path / "v"))
    vocab, rev = text.initialize_vocabulary(str(tmp_path / "v" / "char.vocab"))
    write_lm_from_transcripts(["hello world", "hello there"] * 5, vocab,
                              str(tmp_path / "lm" / "lm.0001"))
    stats = train_ngram.main([
        "-lm_glob", str(tmp_path / "lm" / "lm.*"),
        "-vocab", str(tmp_path / "v" / "char.vocab"),
        "-out", str(tmp_path / "tri")])
    assert stats["sequences"] == 10
    with np.load(str(tmp_path / "tri.npz")) as z:
        table = z["ngram"]
    V = len(rev)
    assert table.shape == (V, V, V)
    np.testing.assert_allclose(np.exp(table).sum(axis=-1), 1.0, rtol=1e-4)
    # The trained table prefers the corpus continuation: after "he" the
    # next char is always 'l'.
    h, e, l = vocab["h"], vocab["e"], vocab["l"]
    assert table[h, e, l] == table[h, e].max()

    # Large (BPE-scale) vocabularies are rejected.
    big = tmp_path / "big.vocab"
    big.write_text("\n".join(f"tok{i}" for i in range(200)) + "\n")
    with pytest.raises(ValueError):
        train_ngram.main(["-lm_glob", str(tmp_path / "lm" / "lm.*"),
                          "-vocab", str(big), "-out", str(tmp_path / "x")])
