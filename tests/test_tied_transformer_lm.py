"""Weight-tied LM task on the TRANSFORMER decoder.

The reference interleaves an LM task whose LSTM + softmax are shared with
the decoder (/root/reference/lm_model.py:94-106, train.py:268-291). Round 3
rebuilt that for the recurrent decoder only; these tests pin the transformer
extension (transformer_decoder.apply_lm + tied_lm_view): -lm_prob steps
train the decoder's self-attention stack + embedding/softmax through a
causal LM head with cross-attention dropped, and decode-time fusion/
rescoring consume the tied weights through the standard hooks (the mirror
of test_seq2seq::test_lm_shares_decoder_weights).
"""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from e2e_asr_tpu.config import (BeamConfig, DecoderConfig, EncoderConfig,
                                LMConfig, Seq2SeqConfig)
from e2e_asr_tpu.models import rnn_lm, seq2seq
from e2e_asr_tpu.models import transformer_decoder as td
from e2e_asr_tpu.train import step as step_lib

V = 11


def _cfg(**dec_kw):
    dec = dict(decoder_type="transformer", hidden_size_dec=16,
               num_layers_dec=2, dec_heads=2, dec_ffn_mult=2, vocab_size=V,
               samp_prob=0.0, out_prob_dec=1.0, max_output=10, emb_size=16)
    dec.update(dec_kw)
    return Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 10},
        encoder=EncoderConfig(hidden_size=8, out_prob=1.0, skip_step=2,
                              max_scaling_down=2),
        decoders={"char": DecoderConfig(**dec)},
        feat_length=6)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _lm_batch(rng, B=4, T=9):
    ids = rng.integers(3, V, size=(T, B)).astype(np.int32)
    ids[0, :] = 1                                   # <go>
    return jnp.asarray(ids), jnp.full((B,), T - 1, jnp.int32)


def test_lm_step_moves_tied_decoder_leaves(rng):
    """One LM step must update the decoder's self-attention/FFN/embedding/
    softmax leaves and the cross_o bias (the zero-crossed residual), while
    the cross-attention projections — which the LM forward never reads —
    stay EXACTLY untouched (zero grads through AdamLM)."""
    cfg = _cfg()
    lm_cfg = LMConfig(vocab_size=V, out_prob=1.0)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    _, lm_step = step_lib.make_train_step(cfg, lm_cfg)
    ids, lens = _lm_batch(rng)
    new_state, m = jax.jit(lm_step)(state, ids, lens, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["lm_loss"]))

    old, new = params["decoder_char"], new_state.params["decoder_char"]
    moved = lambda a, b: not np.allclose(np.asarray(a), np.asarray(b))
    assert moved(old["embedding"], new["embedding"])
    assert moved(old["output_proj"]["kernel"], new["output_proj"]["kernel"])
    for ob, nb in zip(old["blocks"], new["blocks"]):
        assert moved(ob["self_q"]["kernel"], nb["self_q"]["kernel"])
        assert moved(ob["ffn1"]["kernel"], nb["ffn1"]["kernel"])
        assert moved(ob["cross_o"]["bias"], nb["cross_o"]["bias"])
        # Never read by the causal-LM forward -> zero grad -> untouched.
        for leaf in ("cross_q", "cross_k", "cross_v"):
            np.testing.assert_array_equal(np.asarray(ob[leaf]["kernel"]),
                                          np.asarray(nb[leaf]["kernel"]))
        np.testing.assert_array_equal(np.asarray(ob["cross_o"]["kernel"]),
                                      np.asarray(nb["cross_o"]["kernel"]))
    # The encoder is not part of the LM task.
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params["encoder"]),
            jax.tree_util.tree_leaves_with_path(
                new_state.params["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lm_loss_decreases_on_repetitive_corpus(rng):
    """A few tied-LM steps on a deterministic pattern must reduce the loss
    (the task genuinely trains through the transformer stack)."""
    cfg = _cfg()
    # The reference LM lr (1e-4) moves too slowly for a 60-step unit test.
    lm_cfg = LMConfig(vocab_size=V, out_prob=1.0, lm_learning_rate=5e-3)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    _, lm_step = step_lib.make_train_step(cfg, lm_cfg)
    lm_step = jax.jit(lm_step)
    T, B = 9, 8
    ids = np.tile(np.array([1] + [3, 4, 5, 6] * 2), (B, 1)).T.astype(np.int32)
    ids, lens = jnp.asarray(ids), jnp.full((B,), T - 1, jnp.int32)
    first = None
    for i in range(60):
        state, m = lm_step(state, ids, lens, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["lm_loss"])
    assert float(m["lm_loss"]) < 0.5 * first


def test_tied_view_fusion_matches_apply_lm(rng):
    """Sequential fusion_step scores through tied_lm_view must equal the
    parallel apply_lm log-probs position-for-position."""
    cfg = _cfg()
    dec_cfg = cfg.decoders["char"]
    params = seq2seq.init(jax.random.PRNGKey(3), cfg)
    ids, lens = _lm_batch(rng, B=3, T=8)
    logits = td.apply_lm(params["decoder_char"], dec_cfg, ids, lens)
    want = np.asarray(jax.nn.log_softmax(
        logits.astype(jnp.float32), axis=-1))       # [T-1, B, V]

    view = rnn_lm.shared_lm_params(params, dec_cfg=dec_cfg, horizon=16)
    assert "tlm_blocks" in view
    state, x = rnn_lm.fusion_init(view, (3,), 1, steps=7)
    for t in range(ids.shape[0] - 1):
        lp, state = rnn_lm.fusion_step(view, x, state)
        np.testing.assert_allclose(np.asarray(lp), want[t],
                                   rtol=1e-5, atol=1e-5)
        x = rnn_lm.fusion_next_input(view, ids[t + 1])


def test_beam_fusion_and_rescore_from_tied_weights(rng):
    """-lm_weight / -lm_rescore with NO -lm_path on a transformer decoder:
    the beam fuses/rescoring reads the decoder's own tied weights (was a
    hard error before round 4). lm_weight=0 vs tied fusion must differ
    (the LM really contributes) and every decode must be well-formed."""
    from e2e_asr_tpu.eval.beam_eval import make_beam_decoder

    cfg = _cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(rng.normal(size=(2, 12, 6)).astype(np.float32))
    batch = {"logmel": feats, "logmel_len": jnp.array([12, 9])}
    base, _, base_scores = make_beam_decoder(
        cfg, BeamConfig(beam_size=2, max_steps=8))(params, batch)
    for bc in (BeamConfig(beam_size=2, max_steps=8, lm_weight=0.5),
               BeamConfig(beam_size=2, max_steps=8, lm_rescore=0.5)):
        toks, lens_, scores = make_beam_decoder(cfg, bc)(params, batch)
        assert toks.shape[0] == 2
        assert np.all(np.isfinite(np.asarray(scores)))
        if bc.lm_weight:
            assert not np.allclose(np.asarray(scores),
                                   np.asarray(base_scores))


def test_config_accepts_transformer_lm_prob():
    from e2e_asr_tpu.config import process_args
    opts = dict(tasks="", num_layers_char=2, num_layers_phone=2,
                max_output_char=10, max_output_phone=10, use_lstm=True,
                stack_cons=1, skip_step=2, initial_res_fac=1,
                num_layers_dec=1, lm_prob=0.2, run_id=1, avg=True,
                train_base_dir="/tmp/x", decoder_type="transformer")
    cfg = process_args(opts)
    assert cfg.train.lm_prob == 0.2
