"""Pallas fused-GRU kernel vs the XLA scan oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.core import cells, rnn
from e2e_asr_tpu.ops import gru_pallas


@pytest.mark.parametrize("T,B,F,H", [(7, 8, 5, 8), (5, 3, 9, 16),
                                     (8, 4, 5, 8)])
def test_pallas_gru_fwd_matches_scan(T, B, F, H):
    params = cells.gru_init(jax.random.PRNGKey(0), F, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
    lens = jnp.full((B,), T)
    gates_x, cand_x = cells.gru_precompute_inputs(params, x, F)
    h_pallas = gru_pallas.gru_seq(gates_x, cand_x,
                                  params["gates"]["kernel"][F:],
                                  params["candidate"]["kernel"][F:])
    h_scan = rnn.gru_scan(params, x, lens, impl="xla")
    np.testing.assert_allclose(np.asarray(h_pallas), np.asarray(h_scan),
                               rtol=1e-5, atol=1e-6)


def test_pallas_gru_grad_matches_scan_grad():
    T, B, F, H = 6, 4, 5, 8
    params = cells.gru_init(jax.random.PRNGKey(2), F, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (T, B, F))
    lens = jnp.full((B,), T)

    def loss_pallas(gx, cx, wg, wc):
        return jnp.sum(jnp.sin(gru_pallas.gru_seq(gx, cx, wg, wc)))

    def loss_scan(p):
        return jnp.sum(jnp.sin(rnn.gru_scan(p, x, lens, impl="xla")))

    gates_x, cand_x = cells.gru_precompute_inputs(params, x, F)
    dgx, dcx, dwg, dwc = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(
        gates_x, cand_x, params["gates"]["kernel"][F:],
        params["candidate"]["kernel"][F:])
    g = jax.grad(loss_scan)(params)
    np.testing.assert_allclose(np.asarray(dwg),
                               np.asarray(g["gates"]["kernel"][F:]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwc),
                               np.asarray(g["candidate"]["kernel"][F:]),
                               rtol=1e-4, atol=1e-5)
    # Map input-projection cotangents back to W_x / bias gradients.
    np.testing.assert_allclose(np.asarray(jnp.einsum("tbf,tbg->fg", x, dgx)),
                               np.asarray(g["gates"]["kernel"][:F]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dgx.sum((0, 1))),
                               np.asarray(g["gates"]["bias"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.einsum("tbf,tbg->fg", x, dcx)),
                               np.asarray(g["candidate"]["kernel"][:F]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("T", [9, 10])  # odd -> 1-step blocks, even -> 2-step
def test_bidir_gru_layer_pallas_matches_xla_ragged_lengths(T):
    """The flip+carry-through-mask backward direction must equal the
    reverse_sequence/XLA formulation for ragged lengths, fwd and grad."""
    B, F, H = 4, 5, 8
    params = rnn.rnn_layer_init(jax.random.PRNGKey(7), F, H, cell="gru")
    x = jax.random.normal(jax.random.PRNGKey(8), (T, B, F))
    lens = jnp.array([T, 4, 7, 1])
    out_pal = rnn.rnn_layer(params, x, lens, cell="gru", impl="pallas")
    out_xla = rnn.rnn_layer(params, x, lens, cell="gru", impl="xla")
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-6)

    def loss(p, impl):
        return jnp.sum(
            jnp.cos(rnn.rnn_layer(p, x, lens, cell="gru", impl=impl)))

    g_pal = jax.grad(lambda p: loss(p, "pallas"))(params)
    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gru_backward_kernel_engages_not_replay(monkeypatch):
    """The fused reverse-time backward kernel (round 3) must serve these
    shapes; the XLA replay is only the VMEM-overflow fallback."""
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.core import cells
    from e2e_asr_tpu.ops import gru_pallas

    def boom(*a, **k):
        raise AssertionError("replay fallback used")

    monkeypatch.setattr(gru_pallas, "_replay_scan", boom)
    T, B, F, H = 6, 4, 5, 8
    params = cells.gru_init(jax.random.PRNGKey(0), F, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
    gx, cx = cells.gru_precompute_inputs(params, x, F)
    w_gh = params["gates"]["kernel"][F:]
    w_ch = params["candidate"]["kernel"][F:]

    def loss(gx_, cx_, wg_, wc_):
        return jnp.sum(jnp.sin(gru_pallas.gru_seq(gx_, cx_, wg_, wc_)))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(gx, cx, w_gh, w_ch)
    assert all(g.shape == a.shape
               for g, a in zip(grads, (gx, cx, w_gh, w_ch)))
    # masked variant too
    mask = jnp.ones((T, B, 1))

    def loss_m(gx_, cx_, wg_, wc_):
        return jnp.sum(jnp.sin(
            gru_pallas.gru_seq_masked(gx_, cx_, wg_, wc_, mask)))

    jax.grad(loss_m, argnums=(0, 1, 2, 3))(gx, cx, w_gh, w_ch)
