"""Fused attention-decoder TRAINING kernel vs the XLA scan oracle.

Both paths consume the identical precomputed noise (attn_decoder.train_noise),
so outputs and gradients must match to matmul precision (f32 here:
interpret mode on CPU).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import DecoderConfig
from e2e_asr_tpu.models import attn_decoder
from e2e_asr_tpu.ops import dec_train_pallas as dtp


@pytest.fixture(autouse=True)
def _enable_pallas(monkeypatch):
    """conftest disables Pallas suite-wide (interpret mode is slow); these
    parity tests ARE the kernel tests, so re-enable it here and assert the
    kernel really engages (a vacuous scan-vs-scan compare must fail)."""
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    calls = {"n": 0}
    orig = dtp._fwd_call

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(dtp, "_fwd_call", spy)
    yield calls


def _cfg(**kw):
    base = dict(hidden_size_dec=8, num_layers_dec=1, emb_size=8, vocab_size=11,
                attention_vec_size=8, lm_hidden_size=8, samp_prob=0.0,
                out_prob_dec=1.0, max_output=12, use_lstm=True)
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
        if force_xla:
            monkeypatch.setattr(dtp, "supported", lambda c, p: False)
        else:
            monkeypatch.setattr(dtp, "supported",
                                lambda c, p, _o=dtp.supported: True)
        return attn_decoder.apply_train(params, cfg, dec_inputs, enc_states,
                                        enc_lens, rng=rng)
    out_pal = run(False)
    out_xla = run(True)
    return out_pal, out_xla


@pytest.mark.parametrize("samp_prob,drop", [(0.0, False), (0.5, False),
                                            (1.0, True)])
def test_fused_train_forward_matches_scan(samp_prob, drop, monkeypatch,
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
def test_fused_train_grad_matches_scan(samp_prob, drop, monkeypatch,
                                       _enable_pallas):
    cfg = _cfg(samp_prob=samp_prob, out_prob_dec=0.8 if drop else 1.0)
    params, dec_inputs, enc_states, enc_lens = _setup(cfg, seed=3)
    rng = jax.random.PRNGKey(9)

    def loss(p, enc, use_kernel):
        if use_kernel:
            monkeypatch.setattr(dtp, "supported", lambda c, pp: True)
        else:
            monkeypatch.setattr(dtp, "supported", lambda c, pp: False)
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
def test_deep_decoder_fused_matches_scan(samp_prob, drop, monkeypatch,
                                         _enable_pallas):
    """num_layers_dec=2 (the reference's deep-decoder knob) runs fused too:
    forward and grads must match the scan, incl. inter-layer dropout."""
    cfg = _cfg(num_layers_dec=2, samp_prob=samp_prob,
               out_prob_dec=0.8 if drop else 1.0)
    params, dec_inputs, enc_states, enc_lens = _setup(cfg, seed=5)
    assert dtp.supported(cfg, params)
    rng = jax.random.PRNGKey(11)
    out_pal, out_xla = _both_paths(cfg, params, dec_inputs, enc_states,
                                   enc_lens, rng, monkeypatch)
    assert _enable_pallas["n"] == 1
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)

    def loss(p, use_kernel):
        monkeypatch.setattr(dtp, "supported",
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


@pytest.mark.parametrize("variant", ["ind_softmax", "simple_proj",
                                     "simple_proj_deep"])
def test_full_config_space_fused_matches_scan(variant, monkeypatch,
                                              _enable_pallas):
    """Round 3: ind_softmax (OutputProjection2) and SimpleProjection
    (lm_hidden != hidden) run fused too — forward and grads match the
    scan, so NO reference decoder config escapes the fused path."""
    kw = {"samp_prob": 1.0, "out_prob_dec": 0.8}
    if variant == "ind_softmax":
        kw["ind_softmax"] = True
    else:
        kw["lm_hidden_size"] = 12           # != hidden_size_dec=8 -> sp
        if variant == "simple_proj_deep":
            kw["num_layers_dec"] = 2
    cfg = _cfg(**kw)
    params, dec_inputs, enc_states, enc_lens = _setup(cfg, seed=7)
    if variant != "ind_softmax":
        assert "simple_proj" in params
    assert dtp.supported(cfg, params)
    rng = jax.random.PRNGKey(13)
    out_pal, out_xla = _both_paths(cfg, params, dec_inputs, enc_states,
                                   enc_lens, rng, monkeypatch)
    assert _enable_pallas["n"] == 1
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)

    def loss(p, use_kernel):
        monkeypatch.setattr(dtp, "supported",
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
