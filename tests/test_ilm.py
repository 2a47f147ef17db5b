"""Internal-LM subtraction (-ilm_weight) tests.

- Attention family (ILME, Meng et al. 2021): eval/beam.py carries a parallel
  ZERO-CONTEXT decoder recurrence and subtracts ilm_weight * its log-softmax
  from every candidate. Pinned against an independent python-loop oracle
  (the tests/test_beam.py oracle extended with the ILM recurrence).
- Transducer family (HAT-style): eval/transducer_beam.py subtracts
  ilm_weight * log-softmax-over-labels of the zero-encoder joint on label
  emissions. Pinned against exhaustive alignment enumeration.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import (BeamConfig, DecoderConfig, EncoderConfig,
                                Seq2SeqConfig)
from e2e_asr_tpu.core import cells
from e2e_asr_tpu.core.layers import dense
from e2e_asr_tpu.data import text
from e2e_asr_tpu.data.text import EOS_ID, GO_ID
from e2e_asr_tpu.eval import beam as beam_lib
from e2e_asr_tpu.models import attn_decoder, transducer


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------- attention

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


def _make_lm(cfg, seed=5):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "embedding": jax.random.uniform(k1, (cfg.vocab_size, cfg.emb_size),
                                        minval=-1, maxval=1),
        "lstm": cells.lstm_init(k2, cfg.emb_size, cfg.lm_hidden_size),
        "output_proj": {
            "kernel": jax.random.normal(k3, (cfg.lm_hidden_size,
                                             cfg.vocab_size)) * 0.2,
            "bias": jnp.zeros((cfg.vocab_size,))},
    }


def _oracle_ilm_step(params, cfg, h_enc, token_id, lm_state, cell_states):
    """Independent zero-context decoder step at B=1 (the ILME estimate)."""
    x_emb = params["embedding"][jnp.array([token_id])]
    lm_out, new_lm = cells.lstm_step(params["lm_cell"], x_emb, lm_state)
    if "simple_proj" in params:
        lm_out = dense(params["simple_proj"], lm_out)
    zero_ctx = jnp.zeros((1, h_enc), lm_out.dtype)
    x = dense(params["input_proj"], jnp.concatenate([lm_out, zero_ctx], -1))
    new_states = []
    h = x
    for layer, cp in enumerate(params["dec_cells"]):
        h, s = cells.lstm_step(cp, h, cell_states[layer])
        new_states.append(s)
    top = new_states[-1]
    proj = dense(params["attn_proj"], jnp.concatenate([top.c, zero_ctx], -1))
    out_proj = params["output_proj_ind" if cfg.ind_softmax else "output_proj"]
    logits = dense(out_proj, proj)
    logp = np.asarray(jax.nn.log_softmax(logits, -1))[0]
    return tuple(new_states), new_lm, logp


def oracle_beam_ilm(params, cfg, beam_cfg, enc_states_1, enc_lens_1,
                    lm_params=None):
    """tests/test_beam.oracle_beam with ILME subtraction: every candidate's
    increment is log p_att + lm_weight*log p_lm - ilm_weight*log p_ilm."""
    k = beam_cfg.beam_size
    use_lm = lm_params is not None and beam_cfg.lm_weight != 0.0
    use_ilm = beam_cfg.ilm_weight != 0.0
    h_enc = enc_states_1.shape[-1]
    ctx = attn_decoder.make_attn_context(params, enc_states_1, enc_lens_1)
    state0 = attn_decoder.zero_state(cfg, 1, ctx)
    emb = params["embedding"]

    def lm_zero():
        if not use_lm:
            return None
        return cells.lstm_zero_state(
            (1,), lm_params["lstm"]["bias"].shape[0] // 4)

    def ilm_zero():
        states = tuple(cells.lstm_zero_state((1,), cfg.hidden_size_dec)
                       for _ in range(cfg.num_layers_dec))
        return (states, cells.lstm_zero_state((1,), cfg.lm_hidden_size))

    def expand(state, lm_state, ilm_state, token_id):
        new_state, logits = attn_decoder.step(params, cfg, ctx, state,
                                              emb[jnp.array([token_id])])
        logp = np.asarray(jax.nn.log_softmax(logits, -1))[0]
        if use_lm:
            out, new_lm = cells.lstm_step(
                lm_params["lstm"],
                lm_params["embedding"][jnp.array([token_id])], lm_state)
            if "simple_proj" in lm_params:
                out = dense(lm_params["simple_proj"], out)
            lm_logits = dense(lm_params["output_proj"], out)
            logp = logp + beam_cfg.lm_weight * np.asarray(
                jax.nn.log_softmax(lm_logits, -1))[0]
        else:
            new_lm = lm_state
        if use_ilm:
            ilm_cells, ilm_lm = ilm_state
            ilm_cells, ilm_lm, ilm_logp = _oracle_ilm_step(
                params, cfg, h_enc, token_id, ilm_lm, ilm_cells)
            logp = logp - beam_cfg.ilm_weight * ilm_logp
            new_ilm = (ilm_cells, ilm_lm)
        else:
            new_ilm = ilm_state
        return new_state, new_lm, new_ilm, logp

    live = [([], 0.0, state0, lm_zero(), ilm_zero())]
    finished = []
    for t in range(beam_cfg.max_steps):
        if k <= 0 or not live:
            break
        cands = []
        for (seq, score, st, lm_st, ilm_st) in live:
            last = seq[-1] if seq else GO_ID
            new_st, new_lm, new_ilm, logp = expand(st, lm_st, ilm_st, last)
            for v in range(len(logp)):
                cands.append((score + float(logp[v]), v, seq, new_st,
                              new_lm, new_ilm))
        cands.sort(key=lambda c: -c[0])
        new_live = []
        for (val, v, seq, st, lm_st, ilm_st) in cands[:k]:
            stored = val + beam_cfg.word_ins_penalty * (t + 1)
            new_seq = seq + [v]
            if v == EOS_ID:
                finished.append((new_seq, stored))
                k -= 1
            else:
                new_live.append((new_seq, stored, st, lm_st, ilm_st))
        live = new_live[:k] if k > 0 else []
    all_out = finished + [(seq, score) for (seq, score, _, _, _) in live]
    return max(all_out, key=lambda x: x[1])


@pytest.mark.parametrize("seed,ilm_w", [(0, 0.25), (1, 0.4)])
def test_attention_ilm_matches_oracle(rng, seed, ilm_w):
    """ILME-only subtraction (no external LM) against the python oracle."""
    cfg = _cfg()
    beam_cfg = BeamConfig(beam_size=3, max_steps=10, ilm_weight=ilm_w)
    params, enc, enc_lens = _setup(cfg, rng, B=2, seed=seed)
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens)
    for b in range(2):
        seq, score = oracle_beam_ilm(params, cfg, beam_cfg, enc[b:b + 1],
                                     enc_lens[b:b + 1])
        got = list(np.asarray(tokens[b][: int(lens[b])]))
        assert got == seq, (got, seq)
        np.testing.assert_allclose(float(scores[b]), score, rtol=1e-4,
                                   atol=1e-4)


def test_attention_ilm_with_external_lm_matches_oracle(rng):
    """The full density-ratio form: +lm_weight*LM - ilm_weight*ILM."""
    cfg = _cfg()
    beam_cfg = BeamConfig(beam_size=3, max_steps=10, lm_weight=0.3,
                          ilm_weight=0.2)
    params, enc, enc_lens = _setup(cfg, rng, B=2)
    lm_params = _make_lm(cfg)
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens, lm_params=lm_params)
    for b in range(2):
        seq, score = oracle_beam_ilm(params, cfg, beam_cfg, enc[b:b + 1],
                                     enc_lens[b:b + 1], lm_params=lm_params)
        got = list(np.asarray(tokens[b][: int(lens[b])]))
        assert got == seq
        np.testing.assert_allclose(float(scores[b]), score, rtol=1e-4,
                                   atol=1e-4)
    # And the subtraction must actually change scores vs plain fusion.
    _, _, s0 = beam_lib.beam_decode(
        params, cfg, BeamConfig(beam_size=3, max_steps=10, lm_weight=0.3),
        enc, enc_lens, lm_params=lm_params)
    assert not np.allclose(np.asarray(s0), np.asarray(scores))


def test_attention_ilm_deep_decoder_matches_oracle(rng):
    cfg = _cfg(num_layers_dec=2)
    beam_cfg = BeamConfig(beam_size=2, max_steps=8, ilm_weight=0.3)
    params, enc, enc_lens = _setup(cfg, rng, B=1, seed=3)
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens)
    seq, score = oracle_beam_ilm(params, cfg, beam_cfg, enc, enc_lens)
    assert list(np.asarray(tokens[0][: int(lens[0])])) == seq
    np.testing.assert_allclose(float(scores[0]), score, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------- transducer

def _trans_cfg(vocab=4):
    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 10},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4, model_family="transducer")
    cfg.decoders["char"] = DecoderConfig(hidden_size_dec=16, emb_size=8,
                                         vocab_size=vocab, joint_dim=16,
                                         out_prob_dec=1.0, max_output=10)
    return cfg


def test_transducer_ilm_exhaustive_enumeration_oracle():
    """Brute-force every alignment, scoring label emissions with
    log p_rnnt - ilm_weight * log p_ilm (zero-encoder joint, blank masked):
    the exhaustive-size beam must reproduce the ranking exactly."""
    from e2e_asr_tpu.eval.transducer_beam import transducer_beam_decode
    from e2e_asr_tpu.models.transducer import BLANK_ID, _pred_step

    V, T, ilm_weight = 4, 3, 0.6
    rng = np.random.default_rng(21)
    cfg = _trans_cfg(vocab=V)
    params = transducer.init(jax.random.PRNGKey(21), cfg, vocab_size=V)
    enc = jnp.asarray(rng.normal(size=(1, T, 16)).astype(np.float32))
    joint = params["joint"]
    enc_p = dense(joint["enc_proj"], enc)[0]                  # [T, J]

    def joint_lp(pred_p, t):
        logits = dense(joint["out"], jnp.tanh(enc_p[t] + pred_p))
        return np.asarray(jax.nn.log_softmax(logits, axis=-1))

    def ilm_lp(pred_p):
        logits = np.asarray(dense(joint["out"], jnp.tanh(pred_p)),
                            dtype=np.float64)
        logits[BLANK_ID] = -1e30
        return logits - np.log(np.sum(np.exp(logits - logits.max()))) \
            - logits.max()

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
        score, toks = 0.0, []
        for t, d in enumerate(decisions):
            lp = joint_lp(pred_p, t)
            if d == BLANK_ID:
                score += lp[BLANK_ID]
            else:
                score += lp[d] - ilm_weight * float(ilm_lp(pred_p)[d])
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
        ilm_weight=ilm_weight)
    seqs, lens, scores = map(np.asarray, (seqs, lens, scores))
    for j in range(5):
        np.testing.assert_allclose(scores[0, j], best[j][0], atol=1e-4)
        assert tuple(seqs[0, j, :lens[0, j]]) == best[j][1], j


def test_transducer_ilm_weight_zero_is_noop():
    from e2e_asr_tpu.eval.transducer_beam import transducer_beam_search
    rng = np.random.default_rng(6)
    cfg = _trans_cfg(vocab=12)
    params = transducer.init(jax.random.PRNGKey(6), cfg, vocab_size=12)
    feats = jnp.asarray(rng.normal(size=(2, 12, 4)).astype(np.float32))
    feat_lens = jnp.asarray([12, 8])
    base = transducer_beam_search(params, cfg, feats, feat_lens, beam_size=4)
    sub = transducer_beam_search(params, cfg, feats, feat_lens, beam_size=4,
                                 ilm_weight=0.0)
    for a, b in zip(base, sub):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------------------------- CLI

def test_ilm_flag_parses_and_ctc_rejects(tmp_path):
    import argparse

    from e2e_asr_tpu import config as config_lib
    parser = argparse.ArgumentParser()
    config_lib.add_parse_options(parser)
    args = vars(parser.parse_args(["-ilm_weight", "0.2", "-beam_size", "4"]))
    cfg = config_lib.process_args(args)
    assert cfg.beam.ilm_weight == 0.2
    # Pure CTC has no internal LM — the eval CLI must reject the flag.
    from e2e_asr_tpu.eval import serving as serving_lib
    ctc_cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 1},
                            max_output={"char": 8},
                            encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                            feat_length=4, model_family="ctc")
    with pytest.raises(ValueError, match="internal LM"):
        serving_lib._make_family_decoder(
            ctc_cfg, BeamConfig(beam_size=2, ilm_weight=0.3))
