"""Sequence parallelism for the transformer family (core/seq_parallel.py):
exact forward/grad equality with the serial encoder on the virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.core import seq_parallel
from e2e_asr_tpu.models import seq2seq
from tests.test_pipeline import _cfg, _data


@pytest.mark.parametrize("shards,rel,conv", [
    (2, False, 0),
    (4, True, 0),
    (2, False, 3),    # Conformer conv: odd kernel, symmetric halo
    (4, True, 4),     # even kernel: asymmetric halo (lo=1, hi=2) at Ts=2
])
def test_sp_forward_matches_serial(rng, shards, rel, conv):
    cfg = _cfg(depth=2, rel=rel, conv=conv)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    feats, lens = _data(rng)                    # T=32, subsample 4 -> T'=8
    mesh = seq_parallel.make_seq_mesh(shards)

    attn_s, _, lens_s = seq2seq.encode(params, cfg, feats, lens)
    attn_p, tm_p, lens_p = seq_parallel.encode_seq_parallel(
        params, cfg, feats, lens, mesh=mesh)
    d = cfg.num_layers["char"]
    np.testing.assert_allclose(np.asarray(attn_p[d]), np.asarray(attn_s[d]),
                               rtol=1e-4, atol=5e-6)
    np.testing.assert_array_equal(
        np.asarray(tm_p[d]), np.asarray(attn_p[d]).transpose(1, 0, 2))
    np.testing.assert_array_equal(np.asarray(lens_p[d]),
                                  np.asarray(lens_s[d]))


@pytest.mark.parametrize("shards,conv", [(2, 0), (2, 3), (4, 3)])
def test_sp_chunk_causal_matches_serial(rng, shards, conv):
    """Chunk-causal attention under time sharding: each shard adds its row
    slice of the global chunk mask, and the conv halo turns left-only
    (k-1 frames from the left neighbor = the serial causal left padding)."""
    cfg = _cfg(depth=2, conv=conv, chunk=2)
    params = seq2seq.init(jax.random.PRNGKey(5), cfg)
    feats, lens = _data(rng)
    mesh = seq_parallel.make_seq_mesh(shards)
    attn_s, _, _ = seq2seq.encode(params, cfg, feats, lens)
    attn_p, _, _ = seq_parallel.encode_seq_parallel(
        params, cfg, feats, lens, mesh=mesh)
    d = cfg.num_layers["char"]
    np.testing.assert_allclose(np.asarray(attn_p[d]), np.asarray(attn_s[d]),
                               rtol=1e-4, atol=5e-6)


def test_sp_causal_halo_guard(rng):
    """The causal conv halo is k-1 (not the symmetric k-1-(k-1)//2): a
    kernel-4 causal conv needs 3 borrowed frames, too many for a 2-frame
    time shard."""
    cfg = _cfg(depth=2, conv=4, chunk=2)
    params = seq2seq.init(jax.random.PRNGKey(6), cfg)
    feats, lens = _data(rng)
    with pytest.raises(ValueError, match="halo"):
        seq_parallel.encode_seq_parallel(
            params, cfg, feats, lens, mesh=seq_parallel.make_seq_mesh(4))


@pytest.mark.parametrize("conv", [0, 3])
def test_sp_train_grads_match_serial(rng, conv):
    """Pipelined-in-time encoder -> decoder -> CE: loss and grads equal the
    serial path (out_prob=1); conv=3 routes halo gradients back through
    ppermute's transpose."""
    from e2e_asr_tpu.core import losses
    from e2e_asr_tpu.models import attn_decoder

    cfg = _cfg(depth=2, conv=conv)
    params = seq2seq.init(jax.random.PRNGKey(1), cfg)
    feats, lens = _data(rng)
    B = feats.shape[0]
    ids = rng.integers(3, 13, size=(6, B)).astype(np.int32)
    ids[0] = 1
    dec_in = jnp.asarray(ids)
    tgt_lens = jnp.full((B,), 5, jnp.int32)
    mesh = seq_parallel.make_seq_mesh(2)

    def loss_fn(params, use_sp):
        if use_sp:
            attn, _, enc_lens = seq_parallel.encode_seq_parallel(
                params, cfg, feats, lens, mesh=mesh, train=True,
                rng=jax.random.PRNGKey(7))
        else:
            attn, _, enc_lens = seq2seq.encode(
                params, cfg, feats, lens, train=True,
                rng=jax.random.PRNGKey(7))
        d = cfg.num_layers["char"]
        logits = attn_decoder.apply_train(
            params["decoder_char"], cfg.decoders["char"], dec_in,
            attn[d], enc_lens[d], rng=jax.random.PRNGKey(8))
        targets, _ = losses.shifted_targets(dec_in, tgt_lens)
        return losses.cross_entropy_loss(logits, targets, tgt_lens)

    l_s, g_s = jax.value_and_grad(lambda p: loss_fn(p, False))(params)
    l_p, g_p = jax.value_and_grad(lambda p: loss_fn(p, True))(params)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-5)
    for (ks, a), (kp, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_s),
            jax.tree_util.tree_leaves_with_path(g_p)):
        assert ks == kp
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg=str(ks))


def test_sp_multitask_taps_match_serial(rng):
    """Intermediate-depth decoder taps under time sharding: forward and
    gradients equal the serial encoder at every tapped depth."""
    import copy

    from tests.test_pipeline import _cfg as _mk

    cfg = _mk(depth=2)
    cfg.tasks = ["char", "phone"]
    cfg.num_layers = {"char": 2, "phone": 1}
    cfg.decoders["phone"] = copy.deepcopy(cfg.decoders["char"])
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    feats, lens = _data(rng)
    mesh = seq_parallel.make_seq_mesh(2)

    attn_s, _, _ = seq2seq.encode(params, cfg, feats, lens)
    attn_p, tm_p, lens_p = seq_parallel.encode_seq_parallel(
        params, cfg, feats, lens, mesh=mesh)
    for d in (1, 2):
        np.testing.assert_allclose(np.asarray(attn_p[d]),
                                   np.asarray(attn_s[d]),
                                   rtol=1e-4, atol=5e-6, err_msg=f"depth {d}")
        np.testing.assert_array_equal(
            np.asarray(tm_p[d]), np.asarray(attn_p[d]).transpose(1, 0, 2))

    # Real multitask training loss (char CE + phone CE at its tap): loss
    # and grads equal serial through the time-sharded tap collection.
    from functools import partial

    B = feats.shape[0]
    ids = rng.integers(3, 13, size=(B, 6)).astype(np.int32)
    ids[:, 0] = 1
    batch = {"logmel": feats, "logmel_len": lens,
             "char": jnp.asarray(ids),
             "char_len": jnp.full((B,), 5, jnp.int32),
             "phone": jnp.asarray(ids),
             "phone_len": jnp.full((B,), 5, jnp.int32)}
    encode_fn = partial(seq_parallel.encode_seq_parallel, mesh=mesh)

    def loss_fn(p, fn):
        total, _ = seq2seq.apply_train(p, cfg, batch,
                                       rng=jax.random.PRNGKey(0),
                                       encode_fn=fn)
        return total

    l_s, g_s = jax.value_and_grad(loss_fn)(params, None)
    l_p, g_p = jax.value_and_grad(loss_fn)(params, encode_fn)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-5)
    for (ks, a), (kp, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_s),
            jax.tree_util.tree_leaves_with_path(g_p)):
        assert ks == kp
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg=str(ks))


def test_sp_validation(rng):
    cfg = _cfg(depth=2)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    feats, lens = _data(rng)
    with pytest.raises(ValueError, match="not divisible"):
        seq_parallel.encode_seq_parallel(
            params, cfg, feats, lens, mesh=seq_parallel.make_seq_mesh(3))
    conv_cfg = _cfg(depth=2, conv=9)   # halo 4 > Ts=2 at 4 shards
    conv_params = seq2seq.init(jax.random.PRNGKey(0), conv_cfg)
    with pytest.raises(ValueError, match="halo"):
        seq_parallel.encode_seq_parallel(
            conv_params, conv_cfg, feats, lens,
            mesh=seq_parallel.make_seq_mesh(4))
    rnn_cfg = _cfg(depth=2)
    rnn_cfg.encoder.encoder_type = "rnn"
    with pytest.raises(ValueError, match="transformer"):
        seq_parallel.encode_seq_parallel(
            params, rnn_cfg, feats, lens,
            mesh=seq_parallel.make_seq_mesh(2))
    with pytest.raises(ValueError, match="expert parallelism"):
        seq_parallel.encode_seq_parallel(
            params, cfg, feats, lens,
            mesh=seq_parallel.make_seq_mesh(2), ep_mesh=object())
