"""Contextual biasing (eval/biasing.py): trie construction, step semantics
(earn / give-back / commit / restart), and integration with all three
family beams."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import BeamConfig
from e2e_asr_tpu.eval import biasing
from e2e_asr_tpu.eval.beam import beam_decode
from e2e_asr_tpu.eval.ctc_beam import ctc_beam_decode
from e2e_asr_tpu.models import seq2seq
from tests.test_seq2seq import make_batch, tiny_cfg


def test_trie_construction():
    trie = biasing.build_bias_trie([[3, 4, 5], [3, 4], [7], [], [3, 99]],
                                   vocab_size=10)
    trans = np.asarray(trie["trans"])
    depth = np.asarray(trie["depth"])
    final = np.asarray(trie["final"])
    # Nodes: root, 3, 34, 345, 7 (empty + out-of-range phrases dropped).
    assert trans.shape == (5, 10)
    n3 = trans[0, 3]
    n34 = trans[n3, 4]
    n345 = trans[n34, 5]
    n7 = trans[0, 7]
    assert sorted([n3, n34, n345, n7]) == [1, 2, 3, 4]
    assert depth[n3] == 1 and depth[n34] == 2 and depth[n345] == 3
    assert final[n34] and final[n345] and final[n7] and not final[n3]
    assert trans[0, 5] == -1 and trans[n3, 3] == -1


def _step1(trie, node, boost=1.0):
    d, t = biasing.bias_step(
        trie, jnp.full((1, 1), node, jnp.int32), boost)
    return np.asarray(d[0, 0]), np.asarray(t[0, 0])


def test_step_semantics_earn_giveback_commit_restart():
    trie = biasing.build_bias_trie([[3, 4]], vocab_size=6)
    n3 = int(np.asarray(trie["trans"])[0, 3])
    # From root: starting the phrase earns 1; everything else is 0.
    d, t = _step1(trie, 0)
    assert d[3] == 1.0 and t[3] == n3
    assert d[5] == 0.0 and t[5] == 0
    # From the partial match: completing earns 1 and COMMITS (node resets,
    # nothing to give back later); diverging gives the partial +1 back;
    # re-starting the phrase keeps depth 1 (net 0).
    d, t = _step1(trie, n3)
    assert d[4] == 1.0 and t[4] == 0           # commit -> root
    assert d[5] == -1.0 and t[5] == 0          # give-back
    assert d[3] == 0.0 and t[3] == n3          # restart on the same token
    # Pending bonus is the uncommitted depth.
    pend = biasing.pending_bonus(trie, jnp.full((1, 1), n3, jnp.int32), 2.0)
    assert float(pend[0, 0]) == 2.0           # depth 1 x boost 2.0


def _attn_setup(rng, seed=0):
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(seed), cfg)
    batch = make_batch(rng, cfg, B=2, T=16, T_dec=5)
    batch["logmel_len"] = jnp.array([16, 12])
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    d = cfg.num_layers["char"]
    return cfg, params, attn_states[d], enc_lens[d]


def test_attention_beam_empty_trie_is_noop(rng):
    """The full biasing code path with no phrases changes nothing."""
    cfg, params, enc, el = _attn_setup(rng)
    V = cfg.decoders["char"].vocab_size
    bc = BeamConfig(beam_size=3, max_steps=7)
    plain = beam_decode(params["decoder_char"], cfg.decoders["char"], bc,
                        enc, el)
    empty = biasing.build_bias_trie([], V)
    biased = beam_decode(params["decoder_char"], cfg.decoders["char"], bc,
                         enc, el, bias=(empty, 2.0))
    for a, b in zip(plain, biased):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_attention_beam_strong_boost_steers(rng):
    """A strongly boosted phrase dominates a random-init decoder's output."""
    cfg, params, enc, el = _attn_setup(rng, seed=5)
    V = cfg.decoders["char"].vocab_size
    phrase = [4, 5, 6, 7]
    trie = biasing.build_bias_trie([phrase], V)
    bc = BeamConfig(beam_size=3, max_steps=6)
    toks, lens, _ = beam_decode(params["decoder_char"], cfg.decoders["char"],
                                bc, enc, el, bias=(trie, 8.0))
    for b in range(toks.shape[0]):
        got = list(np.asarray(toks[b, : int(lens[b])]))
        assert got[: len(phrase)] == phrase, got


def test_ctc_beam_bias_flips_near_tie_and_gives_back():
    """Peaked frames split 50/50 between [3,4] and [3,5]: boosting [3,4]
    must pick it; boosting the un-completable [3,9] must leave scores and
    ranking exactly at the plain run's (full give-back)."""
    V, T = 10, 4
    logits = np.full((1, T, V), -9.0, np.float32)
    logits[0, 0, 3] = 9.0
    logits[0, 1, 0] = 9.0                     # separator blank
    logits[0, 2, 4] = 0.0                     # 50/50 between 4 and 5
    logits[0, 2, 5] = 0.0
    logits[0, 3, 0] = 9.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lens = jnp.array([T])

    plain = ctc_beam_decode(lp, lens, beam_size=4)
    boost34 = ctc_beam_decode(lp, lens, beam_size=4, bias=(
        biasing.build_bias_trie([[3, 4]], V), 1.5))
    top = list(np.asarray(boost34[0][0, 0][: int(boost34[1][0, 0])]))
    assert top == [3, 4]
    s_plain = np.asarray(plain[2][0])
    s34 = np.asarray(boost34[2][0])
    assert float(s34[0]) > float(s_plain[0])  # committed bonus visible

    boost39 = ctc_beam_decode(lp, lens, beam_size=4, bias=(
        biasing.build_bias_trie([[3, 9]], V), 1.5))
    # The un-completable phrase's partial matches are fully given back: the
    # top near-tie pair keeps the PLAIN prefixes and the PLAIN scores. (Tail
    # slots may hold different survivors — mid-search ranking includes the
    # not-yet-returned bonus — but nothing outranks the true pair.)
    np.testing.assert_allclose(np.asarray(boost39[2][0, :2]), s_plain[:2],
                               rtol=1e-5)
    for j in range(2):
        np.testing.assert_array_equal(np.asarray(boost39[0][0, j]),
                                      np.asarray(plain[0][0, j]))


def test_transducer_beam_bias(rng):
    """Empty trie is a no-op; a strong boost steers the random-init
    transducer toward the phrase."""
    from e2e_asr_tpu.eval.transducer_beam import transducer_beam_decode
    from e2e_asr_tpu.models import transducer
    from tests.test_transducer_beam import _cfg

    cfg = _cfg()
    params = transducer.init(jax.random.PRNGKey(2), cfg, vocab_size=12)
    enc_dim = cfg.encoder.hidden_size * 2
    enc = jnp.asarray(rng.normal(size=(2, 6, enc_dim)).astype(np.float32))
    el = jnp.array([6, 4])

    plain = transducer_beam_decode(params, cfg, enc, el, beam_size=3)
    empty = biasing.build_bias_trie([], 12)
    noop = transducer_beam_decode(params, cfg, enc, el, beam_size=3,
                                  bias=(empty, 3.0))
    for a, b in zip(plain, noop):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    phrase = [5, 6, 7]
    trie = biasing.build_bias_trie([phrase], 12)
    toks, lens, _ = transducer_beam_decode(params, cfg, enc, el, beam_size=3,
                                           bias=(trie, 9.0))
    got = list(np.asarray(toks[0, 0][: int(lens[0, 0])]))
    assert got[: len(phrase)] == phrase, got


def test_load_phrases(tmp_path):
    from e2e_asr_tpu.data import text
    vocab = {"<pad>": 0, "<go>": 1, "<eos>": 2, "▁": 3, "a": 4, "b": 5}
    p = tmp_path / "boost.txt"
    p.write_text("ab a\n\nb\n")
    got = biasing.load_phrases(str(p), vocab)
    assert got == [[3, 4, 5, 3, 4], [3, 5]]


def test_batched_trie_step_matches_shared():
    """Per-row (stacked, padded) tries give exactly the shared-trie deltas
    when the rows hold the same phrases; rows differ independently."""
    V = 8
    t1 = biasing.build_bias_trie([[3, 4]], V, pad_to=6)
    t2 = biasing.build_bias_trie([[5]], V, pad_to=6)
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), t1, t2)
    node = jnp.zeros((2, 3), jnp.int32)
    d_b, t_b = biasing.bias_step(stacked, node, 1.5)
    d1, tt1 = biasing.bias_step(t1, node[:1], 1.5)
    d2, tt2 = biasing.bias_step(t2, node[1:], 1.5)
    np.testing.assert_allclose(np.asarray(d_b[0]), np.asarray(d1[0]))
    np.testing.assert_allclose(np.asarray(d_b[1]), np.asarray(d2[0]))
    np.testing.assert_array_equal(np.asarray(t_b[0]), np.asarray(tt1[0]))
    np.testing.assert_array_equal(np.asarray(t_b[1]), np.asarray(tt2[0]))
    # pending_bonus batched form
    n3 = int(np.asarray(t1["trans"])[0, 3])
    nodes = jnp.asarray([[n3], [0]], jnp.int32)
    pend = biasing.pending_bonus(stacked, nodes, 2.0)
    np.testing.assert_allclose(np.asarray(pend), [[2.0], [0.0]])
    # pad_to overflow is a hard error
    import pytest
    with pytest.raises(ValueError):
        biasing.build_bias_trie([[1, 2, 3, 4, 5, 6, 7]], V, pad_to=4)
