"""Beam search tests, including an independent Python-loop oracle that
re-implements the reference algorithm (shrinking beam, finished list, shallow
fusion) hypothesis-by-hypothesis, against which the batched on-device
implementation must agree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import BeamConfig, DecoderConfig
from e2e_asr_tpu.core import cells
from e2e_asr_tpu.core.layers import dense

pytestmark = pytest.mark.smoke
from e2e_asr_tpu.data.text import EOS_ID, GO_ID
from e2e_asr_tpu.eval import beam as beam_lib
from e2e_asr_tpu.models import attn_decoder


def _cfg(**kw):
    base = dict(hidden_size_dec=8, emb_size=6, vocab_size=9,
                attention_vec_size=5, lm_hidden_size=8, samp_prob=0.0,
                out_prob_dec=1.0)
    base.update(kw)
    return DecoderConfig(**base)


def _setup(cfg, rng, B=2, T_enc=5, H_enc=10, seed=0):
    params = attn_decoder.init(jax.random.PRNGKey(seed), cfg, attn_size=H_enc)
    enc = jnp.asarray(rng.normal(size=(B, T_enc, H_enc)).astype(np.float32))
    enc_lens = jnp.array([T_enc] * B)
    return params, enc, enc_lens


def oracle_beam(params, cfg, beam_cfg, enc_states_1, enc_lens_1,
                lm_params=None):
    """Reference-algorithm beam search for ONE utterance using python loops
    over attn_decoder.step (beam_search.py:224-338 semantics, uniform
    word-insertion penalty starting at step 0 as documented in eval/beam.py)."""
    k = beam_cfg.beam_size
    use_lm = lm_params is not None and beam_cfg.lm_weight != 0.0
    ctx = attn_decoder.make_attn_context(params, enc_states_1, enc_lens_1)
    state0 = attn_decoder.zero_state(cfg, 1, ctx)
    emb = params["embedding"]

    def lm_zero():
        if not use_lm:
            return None
        return cells.lstm_zero_state((1,), lm_params["lstm"]["bias"].shape[0] // 4)

    def expand(state, lm_state, token_id):
        new_state, logits = attn_decoder.step(params, cfg, ctx, state,
                                              emb[jnp.array([token_id])])
        logp = np.asarray(jax.nn.log_softmax(logits, -1))[0]
        if use_lm:
            out, new_lm = cells.lstm_step(lm_params["lstm"],
                                          lm_params["embedding"][jnp.array([token_id])],
                                          lm_state)
            if "simple_proj" in lm_params:
                out = dense(lm_params["simple_proj"], out)
            lm_logits = dense(lm_params["output_proj"], out)
            logp = logp + beam_cfg.lm_weight * np.asarray(
                jax.nn.log_softmax(lm_logits, -1))[0]
        else:
            new_lm = lm_state
        return new_state, new_lm, logp

    # live entries: (seq, score, state, lm_state); last token = seq[-1]
    live = [([], 0.0, state0, lm_zero())]
    # At step 0 the "last token" is <go>.
    finished = []
    for t in range(beam_cfg.max_steps):
        if k <= 0 or not live:
            break
        cands = []
        for (seq, score, st, lm_st) in live:
            last = seq[-1] if seq else GO_ID
            new_st, new_lm, logp = expand(st, lm_st, last)
            for v in range(len(logp)):
                cands.append((score + float(logp[v]), v, seq, new_st, new_lm))
        cands.sort(key=lambda c: -c[0])
        new_live = []
        for (val, v, seq, st, lm_st) in cands[:k]:
            stored = val + beam_cfg.word_ins_penalty * (t + 1)
            new_seq = seq + [v]
            if v == EOS_ID:
                finished.append((new_seq, stored))
                k -= 1
            else:
                new_live.append((new_seq, stored, st, lm_st))
        live = new_live[:k] if k > 0 else []
    all_out = finished + [(seq, score) for (seq, score, _, _) in live]
    best_seq, best_score = max(all_out, key=lambda x: x[1])
    return best_seq, best_score


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("beam_size", [1, 3])
def test_beam_matches_oracle(rng, seed, beam_size):
    cfg = _cfg()
    beam_cfg = BeamConfig(beam_size=beam_size, max_steps=12)
    params, enc, enc_lens = _setup(cfg, rng, B=2, seed=seed)
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens)
    for b in range(2):
        seq, score = oracle_beam(params, cfg, beam_cfg, enc[b:b + 1],
                                 enc_lens[b:b + 1])
        got = list(np.asarray(tokens[b][: int(lens[b])]))
        assert got == seq, (got, seq)
        np.testing.assert_allclose(float(scores[b]), score, rtol=1e-4,
                                   atol=1e-4)


def test_beam_with_lm_fusion_matches_oracle(rng):
    cfg = _cfg()
    beam_cfg = BeamConfig(beam_size=3, lm_weight=0.3, max_steps=10)
    params, enc, enc_lens = _setup(cfg, rng, B=2)
    # Build a little fusion LM with the shared-params layout.
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    lm_params = {
        "embedding": jax.random.uniform(k1, (cfg.vocab_size, cfg.emb_size),
                                        minval=-1, maxval=1),
        "lstm": cells.lstm_init(k2, cfg.emb_size, cfg.lm_hidden_size),
        "output_proj": {
            "kernel": jax.random.normal(k3, (cfg.lm_hidden_size,
                                             cfg.vocab_size)) * 0.2,
            "bias": jnp.zeros((cfg.vocab_size,))},
    }
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens, lm_params=lm_params)
    for b in range(2):
        seq, score = oracle_beam(params, cfg, beam_cfg, enc[b:b + 1],
                                 enc_lens[b:b + 1], lm_params=lm_params)
        got = list(np.asarray(tokens[b][: int(lens[b])]))
        assert got == seq
        np.testing.assert_allclose(float(scores[b]), score, rtol=1e-4,
                                   atol=1e-4)
    # And fusion must actually change something vs no-LM decoding.
    t0, l0, s0 = beam_lib.beam_decode(params, cfg,
                                      BeamConfig(beam_size=3, max_steps=10),
                                      enc, enc_lens)
    assert not np.allclose(np.asarray(s0), np.asarray(scores))


@pytest.mark.parametrize("penalty", [0.35, -0.25])
def test_beam_word_ins_penalty_matches_oracle(rng, penalty):
    """word_ins_penalty != 0: the per-step cumulative penalty (uniform-offset
    form documented in eval/beam.py:16-19) must match the oracle, and must
    actually perturb the outcome vs penalty=0."""
    cfg = _cfg()
    beam_cfg = BeamConfig(beam_size=3, max_steps=10, word_ins_penalty=penalty)
    params, enc, enc_lens = _setup(cfg, rng, B=2)
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens)
    for b in range(2):
        seq, score = oracle_beam(params, cfg, beam_cfg, enc[b:b + 1],
                                 enc_lens[b:b + 1])
        got = list(np.asarray(tokens[b][: int(lens[b])]))
        assert got == seq, (got, seq)
        np.testing.assert_allclose(float(scores[b]), score, rtol=1e-4,
                                   atol=1e-4)
    base = beam_lib.beam_decode(params, cfg,
                                BeamConfig(beam_size=3, max_steps=10), enc,
                                enc_lens)
    assert not np.allclose(np.asarray(base[2]), np.asarray(scores))


def test_beam_fusion_plus_penalty_matches_oracle(rng):
    """Mixed case: shallow fusion AND word_ins_penalty together."""
    cfg = _cfg()
    beam_cfg = BeamConfig(beam_size=3, lm_weight=0.3, word_ins_penalty=0.3,
                          max_steps=10)
    params, enc, enc_lens = _setup(cfg, rng, B=2)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    lm_params = {
        "embedding": jax.random.uniform(k1, (cfg.vocab_size, cfg.emb_size),
                                        minval=-1, maxval=1),
        "lstm": cells.lstm_init(k2, cfg.emb_size, cfg.lm_hidden_size),
        "output_proj": {
            "kernel": jax.random.normal(k3, (cfg.lm_hidden_size,
                                             cfg.vocab_size)) * 0.2,
            "bias": jnp.zeros((cfg.vocab_size,))},
    }
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens, lm_params=lm_params)
    for b in range(2):
        seq, score = oracle_beam(params, cfg, beam_cfg, enc[b:b + 1],
                                 enc_lens[b:b + 1], lm_params=lm_params)
        got = list(np.asarray(tokens[b][: int(lens[b])]))
        assert got == seq, (got, seq)
        np.testing.assert_allclose(float(scores[b]), score, rtol=1e-4,
                                   atol=1e-4)


def test_beam1_matches_greedy(rng):
    """beam(k=1, lm_weight=0) must produce the greedy argmax sequence
    (the property implied by main.py:217-222)."""
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, rng, B=3)
    beam_cfg = BeamConfig(beam_size=1, max_steps=cfg.max_output)
    tokens, lens, _ = beam_lib.beam_decode(params, cfg, beam_cfg, enc, enc_lens)
    _, greedy_ids = attn_decoder.apply_infer(
        params, cfg, jnp.full((3,), GO_ID, jnp.int32), enc, enc_lens,
        max_output=cfg.max_output)
    greedy = np.asarray(greedy_ids).T  # [B, T]
    for b in range(3):
        L = int(lens[b])
        beam_seq = list(np.asarray(tokens[b][:L]))
        g = list(greedy[b])
        g_trunc = g[: g.index(EOS_ID) + 1] if EOS_ID in g else g
        assert beam_seq == g_trunc


def test_beam_eos_shrinking():
    """With a decoder rigged to always emit <eos>, every beam slot finishes
    at step 0 … i.e. the search returns [<eos>] with one finished hyp."""
    cfg = _cfg()
    rng = np.random.default_rng(0)
    params, enc, enc_lens = _setup(cfg, rng, B=1)
    # Rig output projection to strongly prefer EOS.
    params = dict(params)
    params["output_proj"] = {
        "kernel": jnp.zeros_like(params["output_proj"]["kernel"]),
        "bias": jnp.zeros((cfg.vocab_size,)).at[EOS_ID].set(50.0)}
    beam_cfg = BeamConfig(beam_size=4, max_steps=20)
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens)
    assert int(lens[0]) == 1
    assert int(tokens[0, 0]) == EOS_ID
    assert float(scores[0]) > -1.0  # ~log(1)


def test_cov_penalty_off_by_default_and_changes_scores_when_on(rng):
    """cov_penalty alone is a no-op (reference parity); with
    apply_cov_penalty=True the coverage term perturbs final scores."""
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, rng, B=2)
    base = beam_lib.beam_decode(params, cfg,
                                BeamConfig(beam_size=3, max_steps=10), enc,
                                enc_lens)
    noop = beam_lib.beam_decode(params, cfg,
                                BeamConfig(beam_size=3, max_steps=10,
                                           cov_penalty=0.5), enc, enc_lens)
    np.testing.assert_allclose(np.asarray(base[2]), np.asarray(noop[2]),
                               rtol=1e-6)
    on = beam_lib.beam_decode(params, cfg,
                              BeamConfig(beam_size=3, max_steps=10,
                                         cov_penalty=0.5,
                                         apply_cov_penalty=True), enc,
                              enc_lens)
    assert not np.allclose(np.asarray(base[2]), np.asarray(on[2]))


def test_beam_gru_decoder_matches_oracle(rng):
    """Beam search over a GRU decoder (use_lstm=False: query is h, GRU
    states) must match the oracle too."""
    cfg = _cfg(use_lstm=False)
    beam_cfg = BeamConfig(beam_size=3, max_steps=8)
    params, enc, enc_lens = _setup(cfg, rng, B=2)
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens)
    for b in range(2):
        seq, score = oracle_beam(params, cfg, beam_cfg, enc[b:b + 1],
                                 enc_lens[b:b + 1])
        got = list(np.asarray(tokens[b][: int(lens[b])]))
        assert got == seq, (got, seq)
        np.testing.assert_allclose(float(scores[b]), score, rtol=1e-4,
                                   atol=1e-4)


def test_beam_batch_independence(rng):
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, rng, B=2)
    beam_cfg = BeamConfig(beam_size=3, max_steps=10)
    t_ab, l_ab, s_ab = beam_lib.beam_decode(params, cfg, beam_cfg, enc, enc_lens)
    t_a, l_a, s_a = beam_lib.beam_decode(params, cfg, beam_cfg, enc[:1],
                                         enc_lens[:1])
    assert list(np.asarray(t_ab[0][: int(l_ab[0])])) == \
        list(np.asarray(t_a[0][: int(l_a[0])]))
