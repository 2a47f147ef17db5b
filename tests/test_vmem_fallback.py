"""VMEM-budget fallbacks: wide layers must route around the Pallas kernels
(and the XLA backward fallback must be numerically identical)."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.core import cells, rnn
from e2e_asr_tpu.ops import lstm_pallas


def test_fit_predicates():
    # Flagship config fits both directions of the kernel.
    assert lstm_pallas.fwd_fits(384, 128, 256)
    assert lstm_pallas._bwd_fits(2, 128, 256)
    # H=512 at B=128 blows the DEFAULT backward budget (observed OOM on
    # v5e)... but fits under the raised wide-layer limit at full batch.
    assert not lstm_pallas._bwd_fits(2, 128, 512)
    assert not lstm_pallas._bwd_fits(1, 128, 512)
    assert (lstm_pallas._bwd_vmem_bytes(2, 128, 512)
            <= lstm_pallas.VMEM_BUDGET_WIDE)
    # Very wide forward: weights can't stay resident under the default
    # limit; the wide tier (raised limit, bf16 W) takes over — no fallback.
    assert not lstm_pallas._weights_resident_fits(1, 128, 1024)
    assert (lstm_pallas._fwd_wide_vmem_bytes(1, 128, 1024, 2)
            <= lstm_pallas.VMEM_BUDGET_WIDE)
    assert lstm_pallas.fwd_fits(384, 128, 1024)
    # The HBM weight-streaming chunked kernel remains available behind it.
    assert lstm_pallas._chunk_size(1024, 128, True) is not None
    # H=1024 backward: in-kernel dW at batch-chunk 64 under the wide limit.
    assert (lstm_pallas._bwd_vmem_bytes(1, 64, 1024)
            <= lstm_pallas.VMEM_BUDGET_WIDE)
    # H=2048 backward: only the no-dW variant fits (bf16 W in scratch).
    assert not (lstm_pallas._bwd_vmem_bytes(1, 16, 2048)
                <= lstm_pallas.VMEM_BUDGET_WIDE)
    assert lstm_pallas._bwd_nodw_fits(1, 32, 2048, 2)


def test_xla_backward_fallback_matches_pallas_backward():
    """Force the XLA backward path and compare against the (interpret-mode)
    Pallas backward on a small problem."""
    T, B, F, H = 6, 4, 5, 8
    params = cells.lstm_init(jax.random.PRNGKey(0), F, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
    x_proj = cells.lstm_precompute_inputs(params, x, F)
    w_h = params["kernel"][F:]
    h_seq, c_seq = lstm_pallas._fwd_seq(x_proj, w_h, save_c=True)
    g = jax.random.normal(jax.random.PRNGKey(2), (T, B, H))

    dx_p, dwh_p = lstm_pallas._bwd_seq(w_h, h_seq, c_seq, x_proj, g)
    dx_x, dwh_x = lstm_pallas._bwd_seq_xla(w_h, h_seq, c_seq, x_proj, g)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dwh_p), np.asarray(dwh_x),
                               rtol=1e-5, atol=1e-6)


def test_xla_backward_fallback_masked():
    T, B, F, H = 6, 3, 4, 8
    params = cells.lstm_init(jax.random.PRNGKey(3), F, H)
    x = jax.random.normal(jax.random.PRNGKey(4), (T, B, F))
    x_proj = cells.lstm_precompute_inputs(params, x, F)
    w_h = params["kernel"][F:]
    lens = jnp.array([6, 3, 5])
    t = jnp.arange(T)[:, None]
    valid = (t >= T - lens[None, :]).astype(jnp.float32)[:, :, None]
    h_seq, c_seq = lstm_pallas._fwd_seq(x_proj, w_h, save_c=True, mask=valid)
    g = jax.random.normal(jax.random.PRNGKey(5), (T, B, H))
    dx_p, dwh_p = lstm_pallas._bwd_seq(w_h, h_seq, c_seq, x_proj, g,
                                       mask=valid)
    dx_x, dwh_x = lstm_pallas._bwd_seq_xla(w_h, h_seq, c_seq, x_proj, g,
                                           mask=valid)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dwh_p), np.asarray(dwh_x),
                               rtol=1e-5, atol=1e-6)


def test_batch_chunked_backward_matches():
    """Force batch chunking (BC < B) in the Pallas backward and compare with
    the full-batch result."""
    T, B, F, H = 6, 8, 5, 8
    params = cells.lstm_init(jax.random.PRNGKey(7), F, H)
    x = jax.random.normal(jax.random.PRNGKey(8), (T, B, F))
    x_proj = cells.lstm_precompute_inputs(params, x, F)
    w_h = params["kernel"][F:]
    h_seq, c_seq = lstm_pallas._fwd_seq(x_proj, w_h, save_c=True)
    g = jax.random.normal(jax.random.PRNGKey(9), (T, B, H))

    dx_full, dwh_full = lstm_pallas._bwd_seq(w_h, h_seq, c_seq, x_proj, g)
    old = lstm_pallas.VMEM_BUDGET
    old_wide = lstm_pallas.VMEM_BUDGET_WIDE
    try:
        # Shrink BOTH budgets so only BC = B/2 (or smaller) fits.
        full_cost = lstm_pallas._bwd_vmem_bytes(2, B, H)
        half_cost = lstm_pallas._bwd_vmem_bytes(2, B // 2, H)
        lstm_pallas.VMEM_BUDGET = (full_cost + half_cost) // 2
        lstm_pallas.VMEM_BUDGET_WIDE = lstm_pallas.VMEM_BUDGET
        assert not lstm_pallas._bwd_fits(2, B, H)
        assert lstm_pallas._bwd_fits(2, B // 2, H)
        dx_c, dwh_c = lstm_pallas._bwd_seq(w_h, h_seq, c_seq, x_proj, g)
    finally:
        lstm_pallas.VMEM_BUDGET = old
        lstm_pallas.VMEM_BUDGET_WIDE = old_wide
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_full),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dwh_c), np.asarray(dwh_full),
                               rtol=1e-5, atol=1e-6)


def test_wide_layer_trains_via_fallback(rng, monkeypatch):
    """With Pallas enabled but every kernel 'too big' for the VMEM budget,
    the auto path must route to the XLA scan and still produce grads."""
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    old = lstm_pallas.VMEM_BUDGET
    old_wide = lstm_pallas.VMEM_BUDGET_WIDE
    try:
        # Force every kernel tier (default, wide, no-dW) to "not fit".
        lstm_pallas.VMEM_BUDGET = 1
        lstm_pallas.VMEM_BUDGET_WIDE = 1
        T, B, F, H = 5, 2, 3, 8
        params = cells.lstm_init(jax.random.PRNGKey(6), F, H)
        x = jnp.asarray(rng.normal(size=(T, B, F)).astype(np.float32))
        lens = jnp.array([5, 4])

        def loss(p):
            return jnp.sum(rnn.lstm_scan(p, x, lens, impl="auto") ** 2)

        g = jax.grad(loss)(params)
        assert np.isfinite(np.asarray(g["kernel"])).all()
    finally:
        lstm_pallas.VMEM_BUDGET = old
        lstm_pallas.VMEM_BUDGET_WIDE = old_wide
