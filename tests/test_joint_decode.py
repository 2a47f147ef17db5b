"""One-pass joint CTC/attention decoding: CTC prefix scorer exactness vs
brute-force enumeration, pre-beam equivalence, beam integration semantics."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import BeamConfig
from e2e_asr_tpu.eval.beam import beam_decode
from e2e_asr_tpu.eval.ctc_prefix import CTCPrefixScorer
from e2e_asr_tpu.models import seq2seq
from tests.test_seq2seq import make_batch, tiny_cfg


def _collapse(path, blank=0):
    out = []
    prev = -1
    for p in path:
        if p != blank and p != prev:
            out.append(p)
        prev = p
    return tuple(out)


def _exact_probs(probs):
    """probs [T, V] -> (prefix_prob dict, complete_prob dict) over collapsed
    label sequences, by path enumeration."""
    T, V = probs.shape
    prefix, complete = {}, {}
    for path in itertools.product(range(V), repeat=T):
        p = 1.0
        for t, v in enumerate(path):
            p *= probs[t, v]
        lab = _collapse(path)
        complete[lab] = complete.get(lab, 0.0) + p
        for n in range(len(lab) + 1):
            g = lab[:n]
            prefix[g] = prefix.get(g, 0.0) + p
    return prefix, complete


def _walk(scorer, seq, V, att=None):
    """Drive the scorer along `seq` (k=1); returns (final state, last delta)."""
    state = scorer.init_state(1)
    delta = None
    if att is None:
        att = jnp.zeros((1, 1, V))
    for c in seq:
        delta, cand = scorer.step(state, att)
        state = scorer.select(cand, jnp.zeros((1, 1), jnp.int32),
                              jnp.full((1, 1), c, jnp.int32))
    return state, delta


def test_prefix_scorer_exact_against_enumeration(rng):
    """psi(g) == log P(collapsed output begins with g) and the <eos> delta
    realizes log P(collapsed output == g), for every walkable prefix."""
    T, V = 4, 5          # blank=0, eos=2; emit labels from {1, 3, 4}
    logits = rng.normal(size=(1, T, V)).astype(np.float32) * 1.2
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    prefix, complete = _exact_probs(np.exp(np.asarray(lp[0])))
    scorer = CTCPrefixScorer(jnp.asarray(logits), jnp.array([T]))

    for n in range(1, 4):
        for seq in itertools.product([1, 3, 4], repeat=n):
            state, _ = _walk(scorer, seq, V)
            got = float(np.exp(state["psi"][0, 0]))
            np.testing.assert_allclose(got, prefix.get(seq, 0.0), rtol=1e-4,
                                       atol=1e-12, err_msg=f"prefix {seq}")
            delta, _ = scorer.step(state, jnp.zeros((1, 1, V)))
            tot = float(np.exp(state["psi"][0, 0] + delta[0, 0, 2]))
            np.testing.assert_allclose(tot, complete.get(seq, 0.0), rtol=1e-4,
                                       atol=1e-12, err_msg=f"complete {seq}")

    # The empty prefix: eos delta == P(all-blank-ish == empty output).
    state = scorer.init_state(1)
    delta, _ = scorer.step(state, jnp.zeros((1, 1, V)))
    np.testing.assert_allclose(float(np.exp(delta[0, 0, 2])),
                               complete.get((), 0.0), rtol=1e-4)
    # Blank is never a valid extension.
    assert float(delta[0, 0, 0]) < -1e29


def test_prefix_scorer_respects_enc_lens(rng):
    """Frames past enc_len contribute nothing: scoring with padding equals
    scoring the truncated input."""
    T, V = 6, 5
    logits = rng.normal(size=(2, T, V)).astype(np.float32)
    full = CTCPrefixScorer(jnp.asarray(logits), jnp.array([6, 4]))
    trunc = CTCPrefixScorer(jnp.asarray(logits[1:, :4]), jnp.array([4]))
    for seq in [(1,), (3, 4), (1, 1)]:
        s_f, d_f = _walk(full, seq, V)
        s_t, d_t = _walk(trunc, seq, V)
        np.testing.assert_allclose(float(s_f["psi"][1, 0]),
                                   float(s_t["psi"][0, 0]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d_f[1]), np.asarray(d_t[0]),
                                   rtol=1e-5)


def test_pre_beam_covering_matches_full(rng):
    """pre_beam == V yields exactly the full-vocabulary deltas (the scatter
    restores vocabulary positions)."""
    T, V = 5, 6
    logits = rng.normal(size=(2, T, V)).astype(np.float32)
    att = jnp.asarray(rng.normal(size=(2, 3, V)).astype(np.float32))
    full = CTCPrefixScorer(jnp.asarray(logits), jnp.array([5, 3]))
    pre = CTCPrefixScorer(jnp.asarray(logits), jnp.array([5, 3]), pre_beam=V)
    s_full = full.init_state(3)
    s_pre = pre.init_state(3)
    d_full, _ = full.step(s_full, att)
    d_pre, _ = pre.step(s_pre, att)
    np.testing.assert_allclose(np.asarray(d_full), np.asarray(d_pre),
                               rtol=1e-6)


def _hybrid_setup(rng, seed=0):
    from e2e_asr_tpu.models import hybrid
    cfg = tiny_cfg()
    params = hybrid.init(jax.random.PRNGKey(seed), cfg)
    batch = make_batch(rng, cfg, B=2, T=16, T_dec=5)
    batch["logmel_len"] = jnp.array([16, 12])
    return cfg, params, batch


def test_joint_weight_zero_is_plain_beam(rng):
    """A scorer passed with joint_ctc == 0 must be a strict no-op."""
    cfg, params, batch = _hybrid_setup(rng)
    from e2e_asr_tpu.core.layers import dense
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    d = cfg.num_layers["char"]
    enc, el = attn_states[d], enc_lens[d]
    scorer = CTCPrefixScorer(dense(params["ctc_head"], enc), el)
    bc0 = BeamConfig(beam_size=3, max_steps=7)
    t0, l0, s0 = beam_decode(params["decoder_char"], cfg.decoders["char"],
                             bc0, enc, el)
    t1, l1, s1 = beam_decode(params["decoder_char"], cfg.decoders["char"],
                             bc0, enc, el, ctc_scorer=scorer)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1))


def test_joint_full_ctc_weight_follows_ctc_evidence(rng):
    """With joint_ctc == 1.0 and sharply peaked CTC posteriors, the joint
    beam must emit exactly the CTC-preferred label sequence and then stop
    (the <eos> complete-probability takeover) — regardless of what the
    random-init attention decoder prefers."""
    cfg, params, batch = _hybrid_setup(rng, seed=3)
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    d = cfg.num_layers["char"]
    enc, el = attn_states[d], enc_lens[d]
    T = enc.shape[1]
    V = cfg.decoders["char"].vocab_size

    want = [[4, 5, 6], [7, 3, 7]]
    ctc_logits = np.full((2, T, V), -8.0, np.float32)
    for b, labs in enumerate(want):
        Tb = int(el[b])
        per = max(Tb // (len(labs) + 1), 1)
        for i, c in enumerate(labs):
            ctc_logits[b, i * per: (i + 1) * per, c] = 8.0
        ctc_logits[b, len(labs) * per:, 0] = 8.0   # trailing blanks
    scorer = CTCPrefixScorer(jnp.asarray(ctc_logits), el)
    bc = BeamConfig(beam_size=3, max_steps=7, joint_ctc=1.0)
    toks, lens, _ = beam_decode(params["decoder_char"], cfg.decoders["char"],
                                bc, enc, el, ctc_scorer=scorer)
    for b, labs in enumerate(want):
        got = list(np.asarray(toks[b, : int(lens[b])]))
        assert got[: len(labs)] == labs, (b, got)
        # Ends immediately after the sequence (with the closing <eos>).
        assert int(lens[b]) in (len(labs), len(labs) + 1), (b, got)


def test_joint_pre_beam_path_same_decode(rng):
    """The pruned pre-beam path decodes the same transcript on peaked
    posteriors."""
    cfg, params, batch = _hybrid_setup(rng, seed=4)
    from e2e_asr_tpu.core.layers import dense
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    d = cfg.num_layers["char"]
    enc, el = attn_states[d], enc_lens[d]
    lg = dense(params["ctc_head"], enc)
    bc = BeamConfig(beam_size=3, max_steps=7, joint_ctc=0.4)
    full = beam_decode(params["decoder_char"], cfg.decoders["char"], bc,
                       enc, el, ctc_scorer=CTCPrefixScorer(lg, el))
    pruned = beam_decode(params["decoder_char"], cfg.decoders["char"], bc,
                         enc, el,
                         ctc_scorer=CTCPrefixScorer(lg, el, pre_beam=
                                                    cfg.decoders["char"]
                                                    .vocab_size))
    for a, b in zip(full, pruned):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
