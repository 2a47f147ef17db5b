"""In-kernel PRNG dropout on the fused GRU kernels (ops/gru_pallas).

Same scheme as the LSTM (tests/test_lstm_dropout.py): masks from the TPU
core PRNG seeded per absolute time step, regenerated bit-identically in the
Pallas backward. CPU (TPU-interpret mode, PRNG bits all-zero => all-keep
masks x 1/keep) pins the VJP plumbing; the backend gate routes real CPU
training to the XLA jax.random dropout fallback.
"""
import numpy as np

import jax
import jax.numpy as jnp
import pytest

from e2e_asr_tpu.core import cells
from e2e_asr_tpu.ops import gru_pallas


def _setup(rng, T=8, B=4, H=128, in_dim=16):
    params_fw = cells.gru_init(jax.random.PRNGKey(0), in_dim, H)
    x = jnp.asarray(rng.normal(size=(T, B, in_dim)).astype(np.float32))
    lens = jnp.array([T, T - 2, T - 3, 1], jnp.int32)[:B]
    gx, cx = cells.gru_precompute_inputs(params_fw, x, in_dim)
    t = jnp.arange(T)[:, None]
    valid = (t >= T - lens[None, :]).astype(jnp.float32)[:, :, None]
    wg = params_fw["gates"]["kernel"][in_dim:]
    wc = params_fw["candidate"]["kernel"][in_dim:]
    return gx, cx, wg, wc, valid


def test_interpret_mode_vjp_replay(rng):
    """Off-TPU the PRNG yields all-keep masks: dropped == clean/keep and the
    custom-VJP grads == grads of the explicit clean/keep function — any
    fwd/bwd mask-stream mismatch (wrong seeds, wrong absolute-step indexing)
    breaks this identity. Covers both the unmasked (fw) and the
    carry-through-masked (bw) kernels."""
    gx, cx, wg, wc, valid = _setup(rng)
    seed = jnp.array([7], jnp.int32)
    keep = 0.8

    for masked in (False, True):
        if masked:
            drop_fn = lambda a, b, w1, w2: gru_pallas.gru_seq_masked(  # noqa: E731
                a, b, w1, w2, valid, seed, False, keep)
            ref_fn = lambda a, b, w1, w2: gru_pallas.gru_seq_masked(   # noqa: E731
                a, b, w1, w2, valid, None, False, 1.0) / keep
        else:
            drop_fn = lambda a, b, w1, w2: gru_pallas.gru_seq(         # noqa: E731
                a, b, w1, w2, seed, False, keep)
            ref_fn = lambda a, b, w1, w2: gru_pallas.gru_seq(          # noqa: E731
                a, b, w1, w2, None, False, 1.0) / keep

        got = drop_fn(gx, cx, wg, wc)
        want = ref_fn(gx, cx, wg, wc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        def loss(fn, *args):
            out = fn(*args)
            return jnp.sum(out * jnp.cos(out))

        g_got = jax.grad(lambda *a: loss(drop_fn, *a), argnums=(0, 1, 2, 3))(
            gx, cx, wg, wc)
        g_want = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2, 3))(
            gx, cx, wg, wc)
        for a, b in zip(g_got, g_want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_keep_one_is_exact_no_op(rng):
    gx, cx, wg, wc, valid = _setup(rng)
    seed = jnp.array([3], jnp.int32)
    a0 = gru_pallas.gru_seq(gx, cx, wg, wc, None, False, 1.0)
    a1 = gru_pallas.gru_seq(gx, cx, wg, wc, seed, False, 1.0)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_backend_gate_and_rnn_layer_fallback(rng, monkeypatch):
    """Off-TPU kernel_dropout_ok must refuse (interpret emulation = SPMD
    io_callback crash + all-keep masks), and rnn_layer's GRU out_dropout
    must be byte-identical to external xla_dropout on the fused-kernel
    output — with real drops."""
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    from e2e_asr_tpu.core import rnn
    from e2e_asr_tpu.core.layers import dropout as xla_dropout

    assert jax.default_backend() == "cpu"
    assert not gru_pallas.kernel_dropout_ok(16, 8, 256, False)

    T, B, in_dim, H = 8, 4, 6, 8
    params = rnn.rnn_layer_init(jax.random.PRNGKey(0), in_dim, H, cell="gru")
    x = jnp.asarray(rng.normal(size=(T, B, in_dim)).astype(np.float32))
    lens = jnp.array([T, T - 1, 2, T], jnp.int32)
    key = jax.random.PRNGKey(42)
    plain = rnn.rnn_layer(params, x, lens, cell="gru")
    want = xla_dropout(key, plain, 0.9)
    got = rnn.rnn_layer(params, x, lens, cell="gru", out_dropout=(key, 0.9))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    p, g = np.asarray(plain), np.asarray(got)
    nz = p != 0.0
    frac = (g[nz] == 0.0).mean()
    assert 0.03 < frac < 0.25, frac
