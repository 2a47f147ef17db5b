"""Fused MHSA kernel (ops/mhsa_pallas.py) vs the XLA einsum path.

Interpret mode on CPU; the XLA formulation in transformer_encoder._mhsa
(mirrored by mhsa_pallas._replay) is the oracle (conftest's
E2E_ASR_NO_PALLAS keeps other tests on it)."""
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.ops import mhsa_pallas


def _rand_qkv(key, B, nh, T, hd):
    ks = jax.random.split(key, 4)
    q, k, v = (jax.random.normal(ks[i], (B, nh, T, hd)) for i in range(3))
    lens = jax.random.randint(ks[3], (B,), 1, T + 1)
    pad = jnp.where(jnp.arange(T)[None, :] < lens[:, None], 0.0, -1e30)
    return q, k, v, pad, lens


@pytest.mark.parametrize("with_rel", [False, True])
def test_attend_matches_replay(with_rel):
    B, nh, T, hd = 3, 2, 16, 8
    q, k, v, pad, lens = _rand_qkv(jax.random.PRNGKey(0), B, nh, T, hd)
    rel = (jax.random.normal(jax.random.PRNGKey(1), (nh, T, T)) * 0.1
           if with_rel else jnp.zeros((nh, T, T)))
    out = mhsa_pallas.attend(q, k, v, pad, rel, False)
    ref = mhsa_pallas._replay(q, k, v, pad, rel if with_rel else None, False)
    # Compare only valid query rows (padded rows are masked downstream).
    for b in range(B):
        L = int(lens[b])
        np.testing.assert_allclose(np.asarray(out[b, :, :L]),
                                   np.asarray(ref[b, :, :L]),
                                   rtol=1e-5, atol=1e-5)


def test_attend_bf16_matches_replay_bf16():
    B, nh, T, hd = 2, 2, 8, 8
    q, k, v, pad, lens = _rand_qkv(jax.random.PRNGKey(2), B, nh, T, hd)
    rel = jnp.zeros((nh, T, T))
    out = mhsa_pallas.attend(q, k, v, pad, rel, True)
    ref = mhsa_pallas._replay(q, k, v, pad, None, True)
    for b in range(B):
        L = int(lens[b])
        np.testing.assert_allclose(np.asarray(out[b, :, :L]),
                                   np.asarray(ref[b, :, :L]),
                                   rtol=2e-2, atol=2e-2)


def test_attend_grad_matches_replay_grad():
    """The saved-probs direct backward must equal the replay's autodiff
    (incl. the rel-bias matrix cotangent)."""
    B, nh, T, hd = 2, 2, 8, 8
    q, k, v, pad, lens = _rand_qkv(jax.random.PRNGKey(3), B, nh, T, hd)
    rel = jax.random.normal(jax.random.PRNGKey(4), (nh, T, T)) * 0.1
    valid = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
    w = valid[:, None, :, None]              # mask padded rows out of loss

    def loss_pal(q_, k_, v_, r_):
        return jnp.sum(jnp.sin(mhsa_pallas.attend(q_, k_, v_, pad, r_,
                                                  False)) * w)

    def loss_ref(q_, k_, v_, r_):
        return jnp.sum(jnp.sin(mhsa_pallas._replay(q_, k_, v_, pad, r_,
                                                   False)) * w)

    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(q, k, v, rel)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _tiny_xfmr_cfg(**kw):
    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig,
                                    Seq2SeqConfig)
    enc = EncoderConfig(hidden_size=8, encoder_type="transformer",
                        num_heads=2, ffn_mult=2, subsample=2, out_prob=1.0,
                        **kw)
    return Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 12},
        encoder=enc,
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=8, vocab_size=11, lm_hidden_size=8,
            attention_vec_size=8, max_output=12)},
        feat_length=6)


@pytest.mark.parametrize("rel", [False, True])
def test_transformer_encoder_kernel_vs_xla(monkeypatch, rel):
    """Full encoder inference forward: fused-kernel path == einsum path."""
    from e2e_asr_tpu.models import transformer_encoder as tx

    cfg = _tiny_xfmr_cfg(rel_pos_bias=rel)
    params = tx.init(jax.random.PRNGKey(5), cfg.encoder, 2, cfg.feat_length)
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 20, cfg.feat_length))
    lens = jnp.asarray([20, 13, 6])

    monkeypatch.setenv("E2E_ASR_NO_PALLAS", "1")
    a_xla, _, l_xla = tx.apply(params, cfg.encoder, x, lens, {"char": 2})
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    monkeypatch.setenv("E2E_ASR_MHSA_KERNEL", "1")   # opt-in engagement
    assert mhsa_pallas.supported(2, int(a_xla[2].shape[1]), 8, rel)
    a_pal, _, l_pal = tx.apply(params, cfg.encoder, x, lens, {"char": 2})
    np.testing.assert_array_equal(np.asarray(l_xla[2]), np.asarray(l_pal[2]))
    np.testing.assert_allclose(np.asarray(a_pal[2]), np.asarray(a_xla[2]),
                               rtol=1e-5, atol=1e-5)


def test_transformer_encoder_train_keeps_xla(monkeypatch):
    """train=True must NOT engage the kernel even when opted in
    (measured net loss for training — module docstring); the two paths
    still agree exactly here because out_prob=1.0 disables dropout."""
    from e2e_asr_tpu.models import transformer_encoder as tx

    cfg = _tiny_xfmr_cfg()
    params = tx.init(jax.random.PRNGKey(7), cfg.encoder, 2, cfg.feat_length)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 12, cfg.feat_length))
    lens = jnp.asarray([12, 7])

    calls = {"n": 0}
    orig = mhsa_pallas.attend

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(mhsa_pallas, "attend", spy)
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    monkeypatch.setenv("E2E_ASR_MHSA_KERNEL", "1")   # opt-in engagement
    tx.apply(params, cfg.encoder, x, lens, {"char": 2}, train=True,
             rng=jax.random.PRNGKey(0))
    assert calls["n"] == 0                   # training path stays on XLA
    tx.apply(params, cfg.encoder, x, lens, {"char": 2}, train=False)
    assert calls["n"] == 2                   # one per block at inference


def test_transformer_encoder_kernel_grad_vs_xla(monkeypatch):
    """Differentiating through the inference path (e.g. a probe) still
    yields the einsum path's gradients via the saved-probs backward."""
    from e2e_asr_tpu.models import transformer_encoder as tx

    cfg = _tiny_xfmr_cfg(rel_pos_bias=True)
    params = tx.init(jax.random.PRNGKey(7), cfg.encoder, 2, cfg.feat_length)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 12, cfg.feat_length))
    lens = jnp.asarray([12, 7])

    def loss(p):
        a, _, _ = tx.apply(p, cfg.encoder, x, lens, {"char": 2})
        return jnp.sum(jnp.sin(a[2]))

    monkeypatch.setenv("E2E_ASR_NO_PALLAS", "1")
    g_xla = jax.grad(loss)(params)
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    monkeypatch.setenv("E2E_ASR_MHSA_KERNEL", "1")   # opt-in engagement
    g_pal = jax.grad(loss)(params)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_xla)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pal)
    for (path, gx), (_, gp) in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=str(path))


def test_supported_envelope():
    assert mhsa_pallas.supported(4, 48, 128)           # bench shape
    assert mhsa_pallas.supported(4, 48, 128, True)
    assert not mhsa_pallas.supported(4, 48, 129)       # sublane alignment
    assert not mhsa_pallas.supported(8, 4096, 128)     # VMEM blowout
