"""CTC prefix beam search: exactness vs brute-force enumeration, greedy
consistency, batching/length behavior, RNN-LM shallow fusion."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.core import cells
from e2e_asr_tpu.core.layers import dense
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval.ctc_beam import ctc_beam_decode


def _collapse(path, blank=0):
    out = []
    prev = -1
    for p in path:
        if p != blank and p != prev:
            out.append(p)
        prev = p
    return tuple(out)


def _exact_prefix_probs(probs):
    """Brute force: sum alignment products per collapsed label sequence.
    probs: [T, V]."""
    T, V = probs.shape
    masses = {}
    for path in itertools.product(range(V), repeat=T):
        p = 1.0
        for t, v in enumerate(path):
            p *= probs[t, v]
        key = _collapse(path)
        masses[key] = masses.get(key, 0.0) + p
    return masses


def _merged_beam_masses(seqs, lens, scores):
    """Merge equal surviving prefixes (the documented post-hoc merge)."""
    masses = {}
    for j in range(seqs.shape[0]):
        key = tuple(int(x) for x in seqs[j, : int(lens[j])])
        masses[key] = masses.get(key, 0.0) + float(np.exp(scores[j]))
    return masses


def test_exact_against_enumeration(rng):
    """With k >= the reachable entry count and no pruning, the merged beam
    masses equal the exact CTC prefix probabilities."""
    T, V = 3, 3
    logits = rng.normal(size=(1, T, V)).astype(np.float32) * 1.5
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    seqs, lens, scores = ctc_beam_decode(log_probs, jnp.array([T]),
                                         beam_size=32)
    got = _merged_beam_masses(np.asarray(seqs[0]), np.asarray(lens[0]),
                              np.asarray(scores[0]))
    exact = _exact_prefix_probs(np.exp(np.asarray(log_probs[0])))
    # Every surviving prefix's merged mass matches the enumeration.
    for key, mass in got.items():
        if mass < 1e-12:
            continue
        np.testing.assert_allclose(mass, exact[key], rtol=1e-4,
                                   err_msg=str(key))
    # The top beam is the true argmax prefix.
    best = max(exact, key=exact.get)
    assert tuple(int(x) for x in np.asarray(seqs[0, 0][: int(lens[0, 0])])) \
        == best
    # Total probability over all prefixes is 1 (sanity of the enumeration).
    np.testing.assert_allclose(sum(exact.values()), 1.0, rtol=1e-6)


def test_peaked_distribution_matches_greedy_collapse(rng):
    """When frames are near-one-hot the beam's best prefix is the collapsed
    argmax path."""
    T, V = 9, 6
    ids = rng.integers(0, V, size=T)
    logits = np.full((1, T, V), -8.0, np.float32)
    for t, v in enumerate(ids):
        logits[0, t, v] = 8.0
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    seqs, lens, _ = ctc_beam_decode(log_probs, jnp.array([T]), beam_size=4)
    expect = _collapse(ids.tolist())
    got = tuple(int(x) for x in np.asarray(seqs[0, 0][: int(lens[0, 0])]))
    assert got == expect


def test_batch_independence_and_length_masking(rng):
    T, V = 6, 5
    logits = rng.normal(size=(2, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lens = jnp.array([6, 4])
    s_ab, l_ab, sc_ab = ctc_beam_decode(log_probs, lens, beam_size=4)
    # Utterance 1 alone, truncated to its true length.
    s_b, l_b, sc_b = ctc_beam_decode(log_probs[1:, :4], jnp.array([4]),
                                     beam_size=4)
    np.testing.assert_array_equal(np.asarray(l_ab[1]), np.asarray(l_b[0]))
    np.testing.assert_allclose(np.asarray(sc_ab[1]), np.asarray(sc_b[0]),
                               rtol=1e-5)
    for j in range(4):
        a = np.asarray(s_ab[1, j][: int(l_ab[1, j])])
        b = np.asarray(s_b[0, j][: int(l_b[0, j])])
        np.testing.assert_array_equal(a, b)


def _tiny_lm(rng, V, E=5, H=6):
    """Random rnn_lm.shared_lm_params-layout LM over vocab V."""
    n = lambda *s: rng.normal(size=s).astype(np.float32) * 0.7  # noqa: E731
    return {
        "embedding": jnp.asarray(n(V, E)),
        "lstm": {"kernel": jnp.asarray(n(E + H, 4 * H)),
                 "bias": jnp.asarray(n(4 * H))},
        "output_proj": {"kernel": jnp.asarray(n(H, V)),
                        "bias": jnp.asarray(n(V))},
    }


def _lm_prefix_logprob(lm, prefix, eos_id):
    """sum_i log p(l_i | GO, l_<i) + log p(eos | GO, l) via the same cell."""
    state = cells.lstm_zero_state((1,), lm["lstm"]["bias"].shape[0] // 4)
    x = lm["embedding"][jnp.array([text.GO_ID])]
    total = 0.0
    for tok in list(prefix) + [None]:
        out, state = cells.lstm_step(lm["lstm"], x, state)
        lp = jax.nn.log_softmax(dense(lm["output_proj"], out), axis=-1)
        want = eos_id if tok is None else tok
        total += float(lp[0, want])
        if tok is not None:
            x = lm["embedding"][jnp.array([tok])]
    return total


def test_lm_fusion_exact_against_enumeration(rng):
    """Fused merged beam masses == exact CTC prefix mass x the LM factor, and
    the top beam is the argmax of the FUSED score (which differs from the
    pure-CTC argmax here)."""
    T, V = 3, 3
    lm_weight = 0.7
    eos_id = 2
    logits = rng.normal(size=(1, T, V)).astype(np.float32) * 1.5
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lm = _tiny_lm(rng, V)
    seqs, lens, scores = ctc_beam_decode(
        log_probs, jnp.array([T]), beam_size=32, lm_params=lm,
        lm_weight=lm_weight, lm_eos_id=eos_id)
    got = _merged_beam_masses(np.asarray(seqs[0]), np.asarray(lens[0]),
                              np.asarray(scores[0]))
    exact_ctc = _exact_prefix_probs(np.exp(np.asarray(log_probs[0])))
    exact_fused = {
        key: mass * np.exp(lm_weight * _lm_prefix_logprob(lm, key, eos_id))
        for key, mass in exact_ctc.items()}
    for key, mass in got.items():
        if mass < 1e-12:
            continue
        np.testing.assert_allclose(mass, exact_fused[key], rtol=2e-4,
                                   err_msg=str(key))
    best = max(exact_fused, key=exact_fused.get)
    assert tuple(int(x) for x in np.asarray(seqs[0, 0][: int(lens[0, 0])])) \
        == best


def test_lm_weight_zero_matches_plain(rng):
    """lm_weight == 0 (even with lm_params supplied) is exactly the plain
    prefix beam."""
    T, V = 5, 4
    logits = rng.normal(size=(2, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lens = jnp.array([5, 3])
    lm = _tiny_lm(rng, V)
    plain = ctc_beam_decode(log_probs, lens, beam_size=4)
    fused = ctc_beam_decode(log_probs, lens, beam_size=4, lm_params=lm,
                            lm_weight=0.0)
    for a, b in zip(plain, fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lm_fusion_batch_independence_and_length_masking(rng):
    """Fusion state freezes past each utterance's length like the CTC state."""
    T, V = 6, 5
    logits = rng.normal(size=(2, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lm = _tiny_lm(rng, V)
    kw = dict(beam_size=4, lm_params=lm, lm_weight=0.4)
    s_ab, l_ab, sc_ab = ctc_beam_decode(log_probs, jnp.array([6, 4]), **kw)
    s_b, l_b, sc_b = ctc_beam_decode(log_probs[1:, :4], jnp.array([4]), **kw)
    np.testing.assert_array_equal(np.asarray(l_ab[1]), np.asarray(l_b[0]))
    np.testing.assert_allclose(np.asarray(sc_ab[1]), np.asarray(sc_b[0]),
                               rtol=1e-5)
    for j in range(4):
        a = np.asarray(s_ab[1, j][: int(l_ab[1, j])])
        b = np.asarray(s_b[0, j][: int(l_b[0, j])])
        np.testing.assert_array_equal(a, b)


def test_end_to_end_beam_on_overfit_model(rng):
    """After overfitting the tiny CTC model, prefix beam search recovers the
    labels (and agrees with greedy)."""
    import optax

    from e2e_asr_tpu.config import EncoderConfig, Seq2SeqConfig
    from e2e_asr_tpu.eval.ctc_beam import ctc_beam_search
    from e2e_asr_tpu.models import ctc

    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 8},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4)
    vocab = 12
    params = ctc.init(jax.random.PRNGKey(1), cfg, vocab_size=vocab)
    basis = rng.normal(size=(vocab, 4)).astype(np.float32)
    labels = np.array([[3, 4, 5], [6, 7, 3]], dtype=np.int32)
    frames = np.stack([np.repeat(basis[row], 4, axis=0) for row in labels])
    batch = {
        "logmel": jnp.asarray(frames),
        "logmel_len": jnp.full((2,), frames.shape[1]),
        "labels": jnp.asarray(labels),
        "label_lens": jnp.full((2,), 3),
    }
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: ctc.loss(p, cfg, batch))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(400):
        params, opt_state, loss = train_step(params, opt_state)
    assert float(loss) < 0.5

    tokens, lens = jax.jit(
        lambda p: ctc_beam_search(p, cfg, batch["logmel"],
                                  batch["logmel_len"], beam_size=4))(params)
    for b in range(2):
        got = np.asarray(tokens[b][: int(lens[b])])
        np.testing.assert_array_equal(got, labels[b])
