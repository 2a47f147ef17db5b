"""CTC forced alignment: exhaustive path-enumeration oracle, span
properties, greedy timestamps, end-to-end jitted entry."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import EncoderConfig, Seq2SeqConfig
from e2e_asr_tpu.eval.align import (ctc_forced_align, ctc_viterbi_align,
                                    frames_to_seconds, greedy_timestamps,
                                    token_spans)
from e2e_asr_tpu.models import ctc
from e2e_asr_tpu.models.ctc import BLANK_ID


def _collapse(path):
    out, prev = [], -1
    for s in path:
        if s != BLANK_ID and s != prev:
            out.append(s)
        prev = s
    return tuple(out)


def _spans_from_path(path, n_tokens):
    """Frame spans per collapsed-token occurrence of a symbol path."""
    starts, ends = [-1] * n_tokens, [-1] * n_tokens
    u, prev = -1, -1
    for t, s in enumerate(path):
        if s != BLANK_ID and s != prev:
            u += 1
            starts[u] = t
        if s != BLANK_ID:
            ends[u] = t
        prev = s
    return starts, ends


@pytest.mark.parametrize("labels,T", [((1, 2, 1), 5), ((1, 1), 5),
                                      ((2,), 3), ((), 4)])
def test_viterbi_matches_exhaustive_path_enumeration(labels, T):
    """Viterbi score == max over ALL symbol paths collapsing to the labels,
    and the recovered token spans match the best path's. Covers repeated
    labels (forced blank between), the skip transition, and empty labels."""
    rng = np.random.default_rng(hash((labels, T)) % 2**31)
    V = 3
    lp = np.log(rng.dirichlet(np.ones(V), size=(1, T)).astype(np.float32))
    U = max(len(labels), 1)
    lab = np.zeros((1, U), np.int32)
    lab[0, :len(labels)] = labels

    best_score, best_path = -np.inf, None
    for path in itertools.product(range(V), repeat=T):
        if _collapse(path) != tuple(labels):
            continue
        s = sum(lp[0, t, path[t]] for t in range(T))
        if s > best_score:
            best_score, best_path = s, path
    assert best_path is not None

    states, score = ctc_viterbi_align(jnp.asarray(lp), jnp.asarray([T]),
                                      jnp.asarray(lab), jnp.asarray([len(labels)]))
    np.testing.assert_allclose(float(score[0]), best_score, atol=1e-5)
    starts, ends = token_spans(states, jnp.asarray([T]),
                               jnp.asarray([len(labels)]), U)
    o_starts, o_ends = _spans_from_path(best_path, U)
    np.testing.assert_array_equal(np.asarray(starts)[0], o_starts)
    np.testing.assert_array_equal(np.asarray(ends)[0], o_ends)


def test_viterbi_batched_variable_lengths():
    """Batched call == per-example calls (padding rows/frames inert)."""
    rng = np.random.default_rng(0)
    B, T, V, U = 3, 7, 4, 3
    lp = np.log(rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32))
    labels = np.array([[1, 2, 3], [2, 2, 0], [1, 0, 0]], np.int32)
    lens = np.array([7, 5, 4])
    llens = np.array([3, 2, 1])
    states_b, score_b = ctc_viterbi_align(jnp.asarray(lp), jnp.asarray(lens),
                                          jnp.asarray(labels),
                                          jnp.asarray(llens))
    starts_b, ends_b = token_spans(states_b, jnp.asarray(lens),
                                   jnp.asarray(llens), U)
    for b in range(B):
        s1, sc1 = ctc_viterbi_align(jnp.asarray(lp[b:b + 1]),
                                    jnp.asarray(lens[b:b + 1]),
                                    jnp.asarray(labels[b:b + 1]),
                                    jnp.asarray(llens[b:b + 1]))
        np.testing.assert_allclose(float(score_b[b]), float(sc1[0]), atol=1e-5)
        st1, en1 = token_spans(s1, jnp.asarray(lens[b:b + 1]),
                               jnp.asarray(llens[b:b + 1]), U)
        np.testing.assert_array_equal(np.asarray(starts_b)[b],
                                      np.asarray(st1)[0])
        np.testing.assert_array_equal(np.asarray(ends_b)[b],
                                      np.asarray(en1)[0])


def _one_hot_logits(ids, V):
    return 10.0 * jax.nn.one_hot(jnp.asarray(ids), V)


def test_greedy_timestamps_constructed():
    ids = [[0, 3, 3, 3, 0, 5, 0, 3],
           [4, 4, 0, 0, 4, 4, 4, 4]]
    lg = _one_hot_logits(ids, 6)
    lens = jnp.asarray([8, 6])
    tokens, starts, ends, n = map(np.asarray, greedy_timestamps(lg, lens))
    # Row 0: 3@[1,3], 5@[5,5], 3@[7,7].
    assert list(tokens[0][:3]) == [3, 5, 3] and n[0] == 3
    assert list(starts[0][:3]) == [1, 5, 7]
    assert list(ends[0][:3]) == [3, 5, 7]
    # Row 1 (len 6): 4@[0,1], 4@[4,5] — the second run clipped at len.
    assert list(tokens[1][:2]) == [4, 4] and n[1] == 2
    assert list(starts[1][:2]) == [0, 4]
    assert list(ends[1][:2]) == [1, 5]
    assert (tokens[0][3:] == 0).all() and (starts[0][3:] == -1).all()


def test_greedy_timestamps_tokens_match_best_path():
    rng = np.random.default_rng(4)
    lg = jnp.asarray(rng.normal(size=(3, 12, 7)).astype(np.float32))
    lens = jnp.asarray([12, 9, 5])
    tokens, starts, ends, n = greedy_timestamps(lg, lens)
    ref = ctc.best_path_from_logits(lg, lens)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref))
    tokens, starts, ends, n = map(np.asarray, (tokens, starts, ends, n))
    for b in range(3):
        for j in range(n[b]):
            assert 0 <= starts[b, j] <= ends[b, j] < int(lens[b])
        assert (np.diff(starts[b, :n[b]]) > 0).all()


def test_ctc_forced_align_end_to_end_jitted():
    """Real CTC model: jitted audio+transcript -> ordered disjoint spans."""
    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 10},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4, model_family="ctc")
    params = ctc.init(jax.random.PRNGKey(0), cfg, vocab_size=9)
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(2, 24, 4)).astype(np.float32))
    feat_lens = jnp.asarray([24, 16])
    labels = jnp.asarray([[3, 4, 4, 5], [6, 7, 0, 0]], dtype=jnp.int32)
    llens = jnp.asarray([4, 2])
    fn = jax.jit(lambda p, f, fl, l, ll: ctc_forced_align(p, cfg, f, fl, l, ll))
    starts, ends, score = map(np.asarray,
                              fn(params, feats, feat_lens, labels, llens))
    _, enc_lens = ctc.logits(params, cfg, feats, feat_lens)
    enc_lens = np.asarray(enc_lens)
    assert np.isfinite(score).all()
    for b, U in ((0, 4), (1, 2)):
        s, e = starts[b, :U], ends[b, :U]
        assert (s >= 0).all() and (e >= s).all()
        assert (e < enc_lens[b]).all()
        assert (s[1:] > e[:-1]).all()    # ordered, disjoint
    assert (starts[1, 2:] == -1).all() and (ends[1, 2:] == -1).all()
    # Timestamp conversion: pyramid reduction x 10 ms hop.
    secs = np.asarray(frames_to_seconds(jnp.asarray(ends), cfg))
    assert secs.shape == ends.shape and (secs[0, :4] >= 0).all()


def _ctc_cfg():
    return Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                         max_output={"char": 10},
                         encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                         feat_length=4, model_family="ctc")


def test_word_timestamps_grouping():
    from e2e_asr_tpu.eval.align import word_timestamps
    from e2e_asr_tpu.eval.longform import reduction_factor

    cfg = _ctc_cfg()
    sec = reduction_factor(cfg) * 160 / 16000
    rev_vocab = ["<pad>", "<go>", "<eos>", "▁", "a", "b"]
    # "▁ a b ▁ a" -> words "ab" (frames 1..4) and "a" (frames 6..7).
    ids = [3, 4, 5, 3, 4]
    starts = [0, 1, 3, 5, 6]
    ends = [0, 2, 4, 5, 7]
    words = word_timestamps(ids, starts, ends, rev_vocab, cfg)
    assert [w for w, _, _ in words] == ["ab", "a"]
    np.testing.assert_allclose(words[0][1:], (1 * sec, 5 * sec))
    np.testing.assert_allclose(words[1][1:], (6 * sec, 8 * sec))


@pytest.mark.parametrize("beam_size", [1, 2])
def test_ctc_longform_timestamps(beam_size):
    """return_timestamps spans every decoded token, ordered and disjoint,
    without changing the transcript."""
    from e2e_asr_tpu.eval import longform

    cfg = _ctc_cfg()
    params = ctc.init(jax.random.PRNGKey(1), cfg, vocab_size=9)
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    plain = np.asarray(longform.transcribe_ctc_longform(
        params, cfg, feats, window=32, margin=8, beam_size=beam_size))
    ids, starts, ends = longform.transcribe_ctc_longform(
        params, cfg, feats, window=32, margin=8, beam_size=beam_size,
        return_timestamps=True)
    ids, starts, ends = map(np.asarray, (ids, starts, ends))
    np.testing.assert_array_equal(ids, plain)
    assert starts.shape == ends.shape == ids.shape
    if len(ids):
        assert (starts >= 0).all() and (ends >= starts).all()
        assert (starts[1:] > ends[:-1]).all()


def test_forced_align_empty_labels_all_blank_score():
    rng = np.random.default_rng(6)
    T, V = 6, 4
    lp = np.log(rng.dirichlet(np.ones(V), size=(1, T)).astype(np.float32))
    states, score = ctc_viterbi_align(jnp.asarray(lp), jnp.asarray([T]),
                                      jnp.zeros((1, 2), jnp.int32),
                                      jnp.asarray([0]))
    np.testing.assert_allclose(float(score[0]), lp[0, :, BLANK_ID].sum(),
                               atol=1e-5)
    assert (np.asarray(states)[0] == 0).all()


def test_transducer_greedy_emission_frames():
    """return_frames: tokens unchanged, frames monotonically non-decreasing,
    in-range, -1 past the emission count; longform timestamps agree."""
    import dataclasses

    from e2e_asr_tpu.config import DecoderConfig
    from e2e_asr_tpu.eval import longform
    from e2e_asr_tpu.models import seq2seq, transducer

    cfg = dataclasses.replace(_ctc_cfg(), model_family="transducer")
    cfg.decoders["char"] = DecoderConfig(hidden_size_dec=16, emb_size=8,
                                         vocab_size=12, joint_dim=16,
                                         out_prob_dec=1.0, max_output=10)
    params = transducer.init(jax.random.PRNGKey(3), cfg, vocab_size=12)
    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.normal(size=(2, 32, 4)).astype(np.float32))
    feat_lens = jnp.asarray([32, 20])
    enc, _, enc_lens = seq2seq.encode(params, cfg, feats, feat_lens)
    depth = cfg.num_layers["char"]
    enc, els = enc[depth], enc_lens[depth]
    plain = np.asarray(transducer.greedy_decode_states(params, cfg, enc, els))
    tokens, frames = transducer.greedy_decode_states(params, cfg, enc, els,
                                                     return_frames=True)
    tokens, frames = np.asarray(tokens), np.asarray(frames)
    np.testing.assert_array_equal(tokens, plain)
    for b in range(2):
        n = int((tokens[b] > 0).sum())
        f = frames[b, :n]
        assert (f >= 0).all() and (f < int(els[b])).all()
        assert (np.diff(f) >= 0).all()
        assert (frames[b, n:] == -1).all()

    # Long-form single-utterance path: ids match, starts == ends, in range.
    plain_ids = np.asarray(longform.transcribe_transducer_longform(
        params, cfg, feats[0, :28], window=16, margin=4))
    ids, starts, ends = longform.transcribe_transducer_longform(
        params, cfg, feats[0, :28], window=16, margin=4,
        return_timestamps=True)
    ids, starts, ends = map(np.asarray, (ids, starts, ends))
    np.testing.assert_array_equal(ids, plain_ids)
    np.testing.assert_array_equal(starts, ends)
    if len(starts):
        assert (np.diff(starts) >= 0).all() and (starts >= 0).all()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="greedy emission frames"):
        longform.transcribe_transducer_longform(
            params, cfg, feats[0, :28], window=16, margin=4, beam_size=2,
            return_timestamps=True)
