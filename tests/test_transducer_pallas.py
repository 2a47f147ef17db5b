"""Fused transducer lattice-loss kernel vs the XLA scan and the NumPy oracle.

ops/transducer_pallas.py carries a custom VJP (occupancy gradients from an
in-kernel beta pass), so BOTH the losses and the gradients must match the
autodiff of the XLA path (core/transducer_loss.py) to f32 precision —
interpret mode on CPU runs the identical kernel code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.core.transducer_loss import (transducer_loss,
                                              transducer_loss_reference)
from e2e_asr_tpu.ops import transducer_pallas as tp


@pytest.fixture(autouse=True)
def _enable_pallas(monkeypatch):
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)


def _lattice(B, T, U1, seed=0):
    rng = np.random.default_rng(seed)
    blank = jnp.asarray(rng.normal(size=(B, T, U1)).astype(np.float32) - 1.0)
    label = jnp.asarray(
        rng.normal(size=(B, T, U1 - 1)).astype(np.float32) - 1.0)
    tl = jnp.asarray(rng.integers(1, T + 1, size=B).astype(np.int32))
    ul = jnp.asarray(rng.integers(0, U1, size=B).astype(np.int32))
    return blank, label, tl, ul


@pytest.mark.parametrize("B,T,U1", [(4, 7, 6), (8, 1, 3), (3, 5, 1),
                                    (16, 20, 13)])
def test_loss_matches_oracle_and_xla(B, T, U1):
    blank, label, tl, ul = _lattice(B, T, U1)
    pal = tp.transducer_loss_pallas(blank, label, tl, ul)
    xla = transducer_loss(blank, label, tl, ul, impl="xla")
    # The float64 oracle needs the same padded-label mask applied.
    u_idx = np.arange(U1 - 1)[None, None, :]
    lab_m = np.where(u_idx < np.asarray(ul)[:, None, None],
                     np.asarray(label), tp.NEG)
    ref = transducer_loss_reference(np.asarray(blank), lab_m,
                                    np.asarray(tl), np.asarray(ul))
    np.testing.assert_allclose(np.asarray(pal), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(xla),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,T,U1", [(4, 7, 6), (8, 1, 3), (16, 20, 13)])
def test_gradients_match_xla_autodiff(B, T, U1):
    blank, label, tl, ul = _lattice(B, T, U1, seed=1)
    w = jnp.asarray(np.random.default_rng(2).normal(size=B)
                    .astype(np.float32))

    def f(impl):
        return jax.grad(
            lambda b, l: jnp.sum(
                transducer_loss(b, l, tl, ul, impl=impl) * w),
            argnums=(0, 1))(blank, label)

    gb_p, gl_p = f("pallas")
    gb_x, gl_x = f("xla")
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gl_p), np.asarray(gl_x),
                               rtol=1e-5, atol=1e-6)
    # Gradients outside each example's (t_len, u_len) lattice must be zero.
    t_idx = np.arange(T)[None, :, None]
    u_idx = np.arange(U1)[None, None, :]
    outside = ((t_idx >= np.asarray(tl)[:, None, None])
               | (u_idx > np.asarray(ul)[:, None, None]))
    assert np.all(np.asarray(gb_p)[outside] == 0.0)
    outside_l = ((t_idx >= np.asarray(tl)[:, None, None])
                 | (u_idx[:, :, :-1] >= np.asarray(ul)[:, None, None]))
    assert np.all(np.asarray(gl_p)[outside_l] == 0.0)


def test_batch_padding_lanes_are_trimmed():
    # B=5 pads to 8 lanes in-kernel; results must equal the per-example runs.
    blank, label, tl, ul = _lattice(5, 9, 7, seed=3)
    full = tp.transducer_loss_pallas(blank, label, tl, ul)
    for b in range(5):
        one = tp.transducer_loss_pallas(blank[b:b + 1], label[b:b + 1],
                                        tl[b:b + 1], ul[b:b + 1])
        np.testing.assert_allclose(np.asarray(full[b]), np.asarray(one[0]),
                                   rtol=1e-6, atol=1e-6)


def test_model_loss_dispatches_to_kernel(monkeypatch):
    """transducer.loss end-to-end: kernel path == XLA path (same batch)."""
    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig,
                                    Seq2SeqConfig)
    from e2e_asr_tpu.models import transducer

    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 10},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=8, model_family="transducer")
    cfg.decoders["char"] = DecoderConfig(hidden_size_dec=16, emb_size=8,
                                         vocab_size=11, joint_dim=16,
                                         out_prob_dec=1.0, max_output=10)
    params = transducer.init(jax.random.PRNGKey(0), cfg, 11)
    rng = np.random.default_rng(4)
    B, T, U = 4, 24, 5
    batch = {
        "logmel": jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32)),
        "logmel_len": jnp.asarray([T, T - 8, T - 3, 9], jnp.int32),
        "labels": jnp.asarray(rng.integers(3, 11, size=(B, U)), jnp.int32),
        "label_lens": jnp.asarray([U, 2, 4, 0], jnp.int32),
    }
    calls = {"n": 0}
    orig = tp._fwd_call

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(tp, "_fwd_call", spy)
    l_pal = transducer.loss(params, cfg, batch)
    assert calls["n"] == 1
    monkeypatch.setenv("E2E_ASR_NO_PALLAS", "1")
    l_xla = transducer.loss(params, cfg, batch)
    np.testing.assert_allclose(float(l_pal), float(l_xla),
                               rtol=1e-5, atol=1e-6)
