"""Fused GRU attention-decoder TRAINING kernel vs the XLA scan oracle.

The GRU sibling of tests/test_dec_train_pallas.py: both paths consume the
identical precomputed noise (attn_decoder.train_noise), so outputs and
gradients must match to matmul precision (f32, interpret mode on CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import DecoderConfig
from e2e_asr_tpu.models import attn_decoder
from e2e_asr_tpu.ops import dec_train_gru_pallas as dtg


@pytest.fixture(autouse=True)
def _enable_pallas(monkeypatch):
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    calls = {"n": 0}
    orig = dtg._fwd_call

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(dtg, "_fwd_call", spy)
    yield calls


def _cfg(**kw):
    base = dict(hidden_size_dec=8, num_layers_dec=1, emb_size=8, vocab_size=11,
                attention_vec_size=8, lm_hidden_size=8, samp_prob=0.0,
                out_prob_dec=1.0, max_output=12, use_lstm=False)
    base.update(kw)
    return DecoderConfig(**base)


def _setup(cfg, T=6, B=4, T_enc=5, E=16, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = attn_decoder.init(k1, cfg, attn_size=E)
    dec_inputs = jax.random.randint(k2, (T, B), 0, cfg.vocab_size)
    enc_states = jax.random.normal(k3, (B, T_enc, E))
    enc_lens = jnp.array([T_enc, 2, T_enc - 1, 3][:B])
    return params, dec_inputs, enc_states, enc_lens


def _both_paths(cfg, params, dec_inputs, enc_states, enc_lens, rng,
                monkeypatch):
    def run(force_xla):
        monkeypatch.setattr(dtg, "supported",
                            (lambda c, p: False) if force_xla
                            else (lambda c, p: True))
        return attn_decoder.apply_train(params, cfg, dec_inputs, enc_states,
                                        enc_lens, rng=rng)
    out_pal = run(False)
    out_xla = run(True)
    return out_pal, out_xla


@pytest.mark.parametrize("samp_prob,drop", [(0.0, False), (0.5, False),
                                            (1.0, True)])
def test_fused_gru_train_forward_matches_scan(samp_prob, drop, monkeypatch,
                                              _enable_pallas):
    cfg = _cfg(samp_prob=samp_prob, out_prob_dec=0.8 if drop else 1.0)
    params, dec_inputs, enc_states, enc_lens = _setup(cfg)
    rng = jax.random.PRNGKey(7)
    out_pal, out_xla = _both_paths(cfg, params, dec_inputs, enc_states,
                                   enc_lens, rng, monkeypatch)
    assert _enable_pallas["n"] == 1          # kernel engaged exactly once
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("samp_prob,drop", [(0.0, False), (1.0, True)])
def test_fused_gru_train_grad_matches_scan(samp_prob, drop, monkeypatch,
                                           _enable_pallas):
    cfg = _cfg(samp_prob=samp_prob, out_prob_dec=0.8 if drop else 1.0)
    params, dec_inputs, enc_states, enc_lens = _setup(cfg, seed=3)
    rng = jax.random.PRNGKey(9)

    def loss(p, enc, use_kernel):
        monkeypatch.setattr(dtg, "supported",
                            (lambda c, pp: True) if use_kernel
                            else (lambda c, pp: False))
        logits = attn_decoder.apply_train(p, cfg, dec_inputs, enc, enc_lens,
                                          rng=rng)
        return jnp.sum(jnp.sin(logits))

    g_pal = jax.grad(loss, argnums=(0, 1))(params, enc_states, True)
    assert _enable_pallas["n"] >= 1          # kernel engaged
    g_xla = jax.grad(loss, argnums=(0, 1))(params, enc_states, False)
    flat_pal, tree_pal = jax.tree_util.tree_flatten(g_pal)
    flat_xla, tree_xla = jax.tree_util.tree_flatten(g_xla)
    assert tree_pal == tree_xla
    for a, b, path in zip(flat_pal, flat_xla,
                          jax.tree_util.tree_leaves_with_path(g_pal)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=str(jax.tree_util.keystr(path[0])))


@pytest.mark.parametrize("samp_prob,drop", [(0.0, False), (1.0, True)])
def test_deep_gru_decoder_fused_matches_scan(samp_prob, drop, monkeypatch,
                                             _enable_pallas):
    """num_layers_dec=2 GRU runs fused too, incl. inter-layer dropout."""
    cfg = _cfg(num_layers_dec=2, samp_prob=samp_prob,
               out_prob_dec=0.8 if drop else 1.0)
    params, dec_inputs, enc_states, enc_lens = _setup(cfg, seed=5)
    assert dtg.supported(cfg, params)
    rng = jax.random.PRNGKey(11)
    out_pal, out_xla = _both_paths(cfg, params, dec_inputs, enc_states,
                                   enc_lens, rng, monkeypatch)
    assert _enable_pallas["n"] == 1
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)

    def loss(p, use_kernel):
        monkeypatch.setattr(dtg, "supported",
                            (lambda c, pp: True) if use_kernel
                            else (lambda c, pp: False))
        lg = attn_decoder.apply_train(p, cfg, dec_inputs, enc_states,
                                      enc_lens, rng=rng)
        return jnp.sum(jnp.sin(lg))

    g_pal = jax.grad(loss)(params, True)
    g_xla = jax.grad(loss)(params, False)
    for a, b, path in zip(jax.tree_util.tree_leaves(g_pal),
                          jax.tree_util.tree_leaves(g_xla),
                          jax.tree_util.tree_leaves_with_path(g_pal)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=str(jax.tree_util.keystr(path[0])))


def test_gru_supported_envelope():
    """LSTM configs go to the LSTM kernel, not this one; every GRU config
    (incl. SimpleProjection / ind_softmax) is fused since round 3."""
    cfg_lstm = _cfg(use_lstm=True)
    params, *_ = _setup(cfg_lstm)
    assert not dtg.supported(cfg_lstm, params)
    cfg_sp = _cfg(lm_hidden_size=6)
    params_sp, *_ = _setup(cfg_sp)
    assert "simple_proj" in params_sp
    assert dtg.supported(cfg_sp, params_sp)
    cfg_ind = _cfg(ind_softmax=True)
    params_ind, *_ = _setup(cfg_ind)
    assert dtg.supported(cfg_ind, params_ind)


@pytest.mark.parametrize("variant", ["ind_softmax", "simple_proj",
                                     "simple_proj_deep"])
def test_gru_full_config_space_fused_matches_scan(variant, monkeypatch,
                                                  _enable_pallas):
    """ind_softmax and SimpleProjection GRU decoders run fused with exact
    forward+grad parity — no reference config escapes the fused path."""
    kw = {"samp_prob": 1.0, "out_prob_dec": 0.8}
    if variant == "ind_softmax":
        kw["ind_softmax"] = True
    else:
        kw["lm_hidden_size"] = 12
        if variant == "simple_proj_deep":
            kw["num_layers_dec"] = 2
    cfg = _cfg(**kw)
    params, dec_inputs, enc_states, enc_lens = _setup(cfg, seed=7)
    assert dtg.supported(cfg, params)
    rng = jax.random.PRNGKey(13)
    out_pal, out_xla = _both_paths(cfg, params, dec_inputs, enc_states,
                                   enc_lens, rng, monkeypatch)
    assert _enable_pallas["n"] == 1
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)

    def loss(p, use_kernel):
        monkeypatch.setattr(dtg, "supported",
                            (lambda c, pp: True) if use_kernel
                            else (lambda c, pp: False))
        lg = attn_decoder.apply_train(p, cfg, dec_inputs, enc_states,
                                      enc_lens, rng=rng)
        return jnp.sum(jnp.sin(lg))

    g_pal = jax.grad(loss)(params, True)
    g_xla = jax.grad(loss)(params, False)
    for a, b, path in zip(jax.tree_util.tree_leaves(g_pal),
                          jax.tree_util.tree_leaves(g_xla),
                          jax.tree_util.tree_leaves_with_path(g_pal)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=str(jax.tree_util.keystr(path[0])))
