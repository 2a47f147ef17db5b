"""Pyramidal encoder tests: plan, reductions, length math, padding invariance."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import EncoderConfig
from e2e_asr_tpu.models import encoder


def test_layer_plan_default():
    """Default: skip 2, max reduction 8, 4 layers -> reduce after layers 1-3,
    never after the last (encoder.py:172)."""
    cfg = EncoderConfig()
    assert encoder.layer_plan(cfg, 4) == [True, True, True, False]
    # With 5 layers the cap of 8 stops reduction after 3 halvings.
    assert encoder.layer_plan(cfg, 5) == [True, True, True, False, False]
    # initial_res_fac counts toward the cap (encoder.py:149-153).
    cfg2 = EncoderConfig(initial_res_fac=4)
    assert encoder.layer_plan(cfg2, 4) == [True, False, False, False]


def test_layer_input_dims():
    cfg = EncoderConfig(hidden_size=8)
    dims = encoder.layer_input_dims(cfg, 4, feat_dim=10)
    # layer1: 10 feats; layers 2-4: 2*8 bidir out * skip 2 = 32.
    assert dims == [10, 32, 32, 32]
    cfg_stack = EncoderConfig(hidden_size=8, stack_cons=3)
    assert encoder.layer_input_dims(cfg_stack, 2, 10)[0] == 30


def test_pyramid_reduce():
    x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    lens = jnp.array([5, 3])
    out, new_lens = encoder.pyramid_reduce(x, lens, 2)
    assert out.shape == (2, 3, 6)
    np.testing.assert_array_equal(np.asarray(new_lens), [3, 2])
    # First output frame = concat of frames 0 and 1.
    np.testing.assert_array_equal(np.asarray(out[0, 0]),
                                  np.asarray(jnp.concatenate([x[0, 0], x[0, 1]])))
    # Padded tail position for odd length: frame 4 concat zeros.
    np.testing.assert_array_equal(np.asarray(out[0, 2, 3:]), np.zeros(3))


def _tiny_cfg():
    return EncoderConfig(hidden_size=6)


def test_encoder_shapes_and_lengths(rng):
    cfg = _tiny_cfg()
    num_layers = {"char": 3, "phone": 2}
    params = encoder.init(jax.random.PRNGKey(0), cfg, 3, feat_dim=4)
    B, T = 2, 17
    x = jnp.asarray(rng.normal(size=(B, T, 4)).astype(np.float32))
    lens = jnp.array([17, 9])
    attn, _, out_lens = encoder.apply(params, cfg, x, lens, num_layers)
    # depth 2: one halving (ceil(17/2)=9); depth 3: two (ceil(9/2)=5).
    assert attn[2].shape[2] == 12 and attn[3].shape[2] == 12
    np.testing.assert_array_equal(np.asarray(out_lens[1]), [17, 9])
    np.testing.assert_array_equal(np.asarray(out_lens[2]), [9, 5])
    np.testing.assert_array_equal(np.asarray(out_lens[3]), [5, 3])
    # Outputs past the per-depth length must be zero.
    assert np.all(np.asarray(attn[3])[1, 3:, :] == 0.0)


def test_encoder_padding_invariance(rng):
    """Extra static padding must not change outputs on the valid prefix —
    the TPU fixed-shape analogue of dynamic_rnn's length handling."""
    cfg = _tiny_cfg()
    params = encoder.init(jax.random.PRNGKey(1), cfg, 2, feat_dim=4)
    x = rng.normal(size=(1, 16, 4)).astype(np.float32)
    lens = jnp.array([16])
    num_layers = {"char": 2}
    attn_a, _, lens_a = encoder.apply(params, cfg, jnp.asarray(x), lens, num_layers)
    x_pad = np.concatenate([x, rng.normal(size=(1, 6, 4)).astype(np.float32)], 1)
    attn_b, _, lens_b = encoder.apply(params, cfg, jnp.asarray(x_pad), lens, num_layers)
    T_valid = int(lens_a[2][0])
    np.testing.assert_allclose(np.asarray(attn_a[2])[0, :T_valid],
                               np.asarray(attn_b[2])[0, :T_valid],
                               rtol=1e-5, atol=1e-5)


def test_initial_res_fac_subsampling(rng):
    cfg = EncoderConfig(hidden_size=6, initial_res_fac=2, skip_step=1)
    params = encoder.init(jax.random.PRNGKey(2), cfg, 1, feat_dim=4)
    x = jnp.asarray(rng.normal(size=(1, 10, 4)).astype(np.float32))
    attn, _, out_lens = encoder.apply(params, cfg, x, jnp.array([10]), {"char": 1})
    assert attn[1].shape[1] == 5
    np.testing.assert_array_equal(np.asarray(out_lens[1]), [5])


def test_encoder_dropout_train_vs_eval(rng):
    cfg = EncoderConfig(hidden_size=6, out_prob=0.5)
    params = encoder.init(jax.random.PRNGKey(3), cfg, 2, feat_dim=4)
    x = jnp.asarray(rng.normal(size=(1, 8, 4)).astype(np.float32))
    lens = jnp.array([8])
    a, _, _ = encoder.apply(params, cfg, x, lens, {"char": 2}, train=True,
                            rng=jax.random.PRNGKey(10))
    b, _, _ = encoder.apply(params, cfg, x, lens, {"char": 2})
    assert not np.allclose(np.asarray(a[2]), np.asarray(b[2]))
    # Eval path is deterministic.
    c, _, _ = encoder.apply(params, cfg, x, lens, {"char": 2})
    np.testing.assert_allclose(np.asarray(b[2]), np.asarray(c[2]))


def test_unidirectional_encoder(rng):
    """bi_dir=False: outputs are H (not 2H) wide and layer inputs follow."""
    cfg = EncoderConfig(hidden_size=6, bi_dir=False, out_prob=1.0)
    assert encoder.layer_input_dims(cfg, 3, feat_dim=4) == [4, 12, 12]
    params = encoder.init(jax.random.PRNGKey(5), cfg, 2, feat_dim=4)
    assert "bw" not in params["layer_1"]
    x = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    attn, _, out_lens = encoder.apply(params, cfg, x, jnp.array([8, 5]),
                                      {"char": 2})
    assert attn[2].shape[2] == 6
    assert np.all(np.asarray(attn[2])[1, 3:] == 0.0)  # ceil(5/2)=3 valid


def test_remat_matches_no_remat_rnn(rng):
    """-remat must leave loss and gradients unchanged (it only changes WHEN
    activations are computed, never what) — including through the dropout
    key scheme and the custom-VJP rnn kernels' scan fallback."""
    import dataclasses

    cfg = _tiny_cfg()
    num_layers = {"char": 3}
    params = encoder.init(jax.random.PRNGKey(0), cfg, 3, feat_dim=4)
    x = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    lens = jnp.array([16, 9])
    key = jax.random.PRNGKey(3)

    def loss(p, c):
        attn, _, _ = encoder.apply(p, c, x, lens, num_layers, train=True,
                                   rng=key)
        return sum(jnp.sum(a ** 2) for a in attn.values())

    cfg_r = dataclasses.replace(cfg, remat=True)
    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_matches_no_remat_transformer(rng):
    import dataclasses

    cfg = EncoderConfig(encoder_type="transformer", hidden_size=8,
                        num_heads=2, ffn_mult=2, subsample=2, out_prob=0.8,
                        conv_kernel=3)
    num_layers = {"char": 2}
    params = encoder.init(jax.random.PRNGKey(0), cfg, 2, feat_dim=4)
    x = jnp.asarray(rng.normal(size=(2, 12, 4)).astype(np.float32))
    lens = jnp.array([12, 7])
    key = jax.random.PRNGKey(5)

    def loss(p, c):
        attn, _, _ = encoder.apply(p, c, x, lens, num_layers, train=True,
                                   rng=key)
        return sum(jnp.sum(a ** 2) for a in attn.values())

    cfg_r = dataclasses.replace(cfg, remat=True)
    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
