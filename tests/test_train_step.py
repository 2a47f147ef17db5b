"""Training-step tests: optimization, LM interleave semantics, LR control,
and data-parallel execution on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import LMConfig
from e2e_asr_tpu.core import mesh as mesh_lib
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as train_step_lib

from tests.test_seq2seq import make_batch, tiny_cfg


def _lm_cfg():
    return LMConfig(lm_hidden_size=8, proj_size=8, emb_size=6, vocab_size=11,
                    out_prob=1.0)


@pytest.mark.smoke
def test_asr_step_decreases_loss(rng):
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = train_step_lib.create_state(params, cfg, _lm_cfg())
    asr_step, _ = train_step_lib.make_train_step(cfg, _lm_cfg())
    asr_step = jax.jit(asr_step)
    batch = make_batch(rng, cfg)
    losses = []
    for i in range(120):
        state, metrics = asr_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::20]
    assert int(state.global_step) == 120


def test_lm_step_updates_only_shared_leaves(rng):
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = train_step_lib.create_state(params, cfg, _lm_cfg())
    _, lm_step = train_step_lib.make_train_step(cfg, _lm_cfg())
    lm_step = jax.jit(lm_step)
    ids = rng.integers(3, 11, size=(6, 4))
    ids[0] = 1
    new_state, metrics = lm_step(state, jnp.asarray(ids), jnp.array([5, 5, 4, 5]),
                                 jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["lm_loss"]))
    assert int(new_state.lm_global_step) == 1
    assert int(new_state.global_step) == 0
    # Encoder unchanged; shared decoder leaves changed.
    for (p0, p1) in zip(jax.tree_util.tree_leaves(state.params["encoder"]),
                        jax.tree_util.tree_leaves(new_state.params["encoder"])):
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    assert not np.allclose(
        np.asarray(state.params["decoder_char"]["lm_cell"]["kernel"]),
        np.asarray(new_state.params["decoder_char"]["lm_cell"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder_char"]["attn_w"]),
        np.asarray(new_state.params["decoder_char"]["attn_w"]))


def test_lr_get_set(rng):
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = train_step_lib.create_state(params, cfg, _lm_cfg())
    assert abs(train_step_lib.get_lr(state) - 1e-3) < 1e-9
    state = train_step_lib.set_lr(state, 5e-4)
    assert abs(train_step_lib.get_lr(state) - 5e-4) < 1e-9
    # The new LR must drive subsequent updates (larger LR -> bigger param delta).
    asr_step, _ = train_step_lib.make_train_step(cfg, _lm_cfg())
    batch = make_batch(np.random.default_rng(0), cfg)
    s_small, _ = jax.jit(asr_step)(train_step_lib.set_lr(state, 1e-5), batch,
                                   jax.random.PRNGKey(0))
    s_big, _ = jax.jit(asr_step)(train_step_lib.set_lr(state, 1e-2), batch,
                                 jax.random.PRNGKey(0))
    d_small = np.abs(np.asarray(s_small.params["encoder"]["layer_1"]["fw"]["kernel"]) -
                     np.asarray(state.params["encoder"]["layer_1"]["fw"]["kernel"])).max()
    d_big = np.abs(np.asarray(s_big.params["encoder"]["layer_1"]["fw"]["kernel"]) -
                   np.asarray(state.params["encoder"]["layer_1"]["fw"]["kernel"])).max()
    assert d_big > d_small * 10


def test_data_model_sharded_step_matches_single_device(rng):
    """(data=4, model=2) mesh with vocab projections sharded on the model
    axis must match single-device numerics."""
    from e2e_asr_tpu.core import sharding as sharding_lib

    cfg = tiny_cfg()
    # Vocab 11 isn't divisible by 2; bump to a shardable vocab.
    cfg.decoders["char"].vocab_size = 12
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = train_step_lib.create_state(params, cfg, _lm_cfg())
    asr_step, _ = train_step_lib.make_train_step(cfg, _lm_cfg())

    batch = make_batch(rng, cfg, B=8, T=12, T_dec=5)
    batch["char"] = jnp.clip(batch["char"], 0, 11)
    batch["logmel_len"] = jnp.full((8,), 12)
    batch["char_len"] = jnp.full((8,), 4)

    s1, m1 = jax.jit(asr_step)(state, batch, jax.random.PRNGKey(7))

    m = mesh_lib.make_mesh(n_data=4, n_model=2)
    sharded_state = sharding_lib.place_state(state, m)
    sharded_batch = mesh_lib.shard_batch(m, batch)
    s2, m2 = jax.jit(asr_step)(sharded_state, sharded_batch,
                               jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_data_parallel_step_transformer_encoder(rng):
    """The transformer encoder family must run data-parallel on the mesh
    with single-device-identical results (same contract as the RNN)."""
    import dataclasses
    cfg = tiny_cfg()
    cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(
        cfg.encoder, encoder_type="transformer", num_heads=2, ffn_mult=2,
        subsample=4, out_prob=1.0))
    params = seq2seq.init(jax.random.PRNGKey(1), cfg)
    state = train_step_lib.create_state(params, cfg, _lm_cfg())
    asr_step, _ = train_step_lib.make_train_step(cfg, _lm_cfg())

    batch = make_batch(rng, cfg, B=8, T=12, T_dec=5)
    batch["logmel_len"] = jnp.full((8,), 12)
    for t in cfg.tasks:
        batch[f"{t}_len"] = jnp.full((8,), 4)

    s1, m1 = jax.jit(asr_step)(state, batch, jax.random.PRNGKey(7))
    m = mesh_lib.make_mesh()
    s8, m8 = jax.jit(asr_step)(mesh_lib.replicate(m, state),
                               mesh_lib.shard_batch(m, batch),
                               jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4, atol=1e-5)
    # Adam normalizes near-zero grads, so cross-device reduction-order noise
    # can flip an update's sign on dead biases (observed max 1.6e-4); the
    # loose atol still catches structural DP errors (update scale is 1e-3).
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-4)


def test_grad_accum_matches_full_batch(rng):
    """grad_accum=N must produce the same update as the full-batch step.

    The loss is a batch mean of per-example-normalized losses
    (core/losses.py), so a mean of equal-size micro-batch means is exactly
    the full-batch mean — with noise off (out_prob=1, samp_prob=0) the
    accumulated gradients match up to fp reassociation."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg, B=8, T=12, T_dec=5)
    batch["logmel_len"] = jnp.full((8,), 12)
    batch["char_len"] = jnp.full((8,), 4)

    results = []
    for accum in (1, 4):
        state = train_step_lib.create_state(params, cfg, _lm_cfg())
        asr_step, _ = train_step_lib.make_train_step(cfg, _lm_cfg(),
                                                     grad_accum=accum)
        s, m = jax.jit(asr_step)(state, batch, jax.random.PRNGKey(7))
        results.append((s, m))
    (s1, m1), (s4, m4) = results
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    assert int(s4.global_step) == 1


def test_grad_accum_rejects_indivisible_batch(rng):
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = train_step_lib.create_state(params, cfg, _lm_cfg())
    asr_step, _ = train_step_lib.make_train_step(cfg, _lm_cfg(), grad_accum=3)
    batch = make_batch(rng, cfg, B=8, T=12, T_dec=5)
    batch["logmel_len"] = jnp.full((8,), 12)
    batch["char_len"] = jnp.full((8,), 4)
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(asr_step)(state, batch, jax.random.PRNGKey(0))


@pytest.mark.smoke
def test_data_parallel_step_matches_single_device(rng):
    """The sharded step on an 8-device mesh must produce (numerically) the
    same loss and updated params as single-device execution."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = train_step_lib.create_state(params, cfg, _lm_cfg())
    asr_step, _ = train_step_lib.make_train_step(cfg, _lm_cfg())

    batch = make_batch(rng, cfg, B=8, T=12, T_dec=5)
    batch["logmel_len"] = jnp.full((8,), 12)
    for t in cfg.tasks:
        batch[f"{t}_len"] = jnp.full((8,), 4)

    # Single device.
    s1, m1 = jax.jit(asr_step)(state, batch, jax.random.PRNGKey(7))

    # 8-device data parallel.
    m = mesh_lib.make_mesh()
    assert m.shape["data"] == 8
    sharded_batch = mesh_lib.shard_batch(m, batch)
    sharded_state = mesh_lib.replicate(m, state)
    s8, m8 = jax.jit(asr_step)(sharded_state, sharded_batch, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4, atol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_ema_shadow_weights(rng):
    """state.ema_params must equal the hand-computed EMA of the params
    trajectory — across ASR steps AND interleaved LM steps (the LM updates
    shared decoder leaves, so EMA must track them too)."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    d = 0.5
    state = train_step_lib.create_state(params, cfg, _lm_cfg(), ema=True)
    asr_step, lm_step = train_step_lib.make_train_step(cfg, _lm_cfg(),
                                                       ema_decay=d)
    asr_step, lm_step = jax.jit(asr_step), jax.jit(lm_step)
    batch = make_batch(rng, cfg)
    ids = rng.integers(3, 11, size=(6, 4))
    ids[0] = 1

    ref_ema = params
    for i in range(3):
        state, _ = asr_step(state, batch, jax.random.PRNGKey(i))
        ref_ema = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * p, ref_ema, state.params)
        state, _ = lm_step(state, jnp.asarray(ids),
                           jnp.array([5, 5, 4, 5]), jax.random.PRNGKey(i))
        ref_ema = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * p, ref_ema, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(ref_ema),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # EMA must lag the raw params (it still carries the init).
    assert not np.allclose(
        np.asarray(state.ema_params["encoder"]["layer_1"]["fw"]["kernel"]),
        np.asarray(state.params["encoder"]["layer_1"]["fw"]["kernel"]))


def test_ema_checkpoint_roundtrip(rng, tmp_path):
    """EMA leaves live in the checkpoint under ema_params/... and restore
    exactly; a no-EMA state's archive is unchanged (None adds no leaves)."""
    from e2e_asr_tpu.core import checkpoint as ckpt_lib

    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = train_step_lib.create_state(params, cfg, _lm_cfg(), ema=True)
    asr_step, _ = train_step_lib.make_train_step(cfg, _lm_cfg(),
                                                 ema_decay=0.9)
    state, _ = jax.jit(asr_step)(state, make_batch(rng, cfg),
                                 jax.random.PRNGKey(0))
    p = ckpt_lib.save(str(tmp_path), "asr.ckpt", 1, state)
    names = set(np.load(p).files)
    assert any(n.startswith("ema_params/") for n in names)

    template = train_step_lib.create_state(
        seq2seq.init(jax.random.PRNGKey(9), cfg), cfg, _lm_cfg(), ema=True)
    restored = ckpt_lib.restore(p, template)
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    plain = train_step_lib.create_state(params, cfg, _lm_cfg())
    p2 = ckpt_lib.save(str(tmp_path), "plain.ckpt", 1, plain)
    assert not any(n.startswith("ema_params/")
                   for n in np.load(p2).files)


def test_lr_warmup_update_scaling():
    """Warmup scales the k-th Adam update by min(1, (k+1)/W) exactly (the
    schedule sits AFTER adam in the chain, so moments match the plain
    optimizer's step for step)."""
    opt_w = train_step_lib.make_optimizer(1e-3, 5.0, warmup_steps=4)
    opt_p = train_step_lib.make_optimizer(1e-3, 5.0)
    params = {"w": jnp.ones((3,))}
    sw, sp = opt_w.init(params), opt_p.init(params)
    g = {"w": jnp.full((3,), 0.7)}
    for k in range(6):
        uw, sw = opt_w.update(g, sw, params)
        up, sp = opt_p.update(g, sp, params)
        scale = min(1.0, (k + 1) / 4)
        np.testing.assert_allclose(np.asarray(uw["w"]),
                                   np.asarray(up["w"]) * scale, rtol=1e-6)


def test_lr_warmup_through_train_step_and_lr_policy(rng):
    """-lr_warmup composes with the dynamic-LR plateau policy: first-step
    delta is W-fold smaller, and get_lr/set_lr still address the Adam
    hyperparams (chain index unchanged)."""
    import dataclasses

    cfg = tiny_cfg()
    cfg_w = dataclasses.replace(cfg, lr_warmup_steps=4)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg)
    leaf = lambda s: np.asarray(s.params["encoder"]["layer_1"]["fw"]["kernel"])

    state_p = train_step_lib.create_state(params, cfg, _lm_cfg())
    step_p, _ = train_step_lib.make_train_step(cfg, _lm_cfg())
    s_p, _ = jax.jit(step_p)(state_p, batch, jax.random.PRNGKey(0))

    state_w = train_step_lib.create_state(params, cfg_w, _lm_cfg())
    assert abs(train_step_lib.get_lr(state_w) - 1e-3) < 1e-9
    step_w, _ = train_step_lib.make_train_step(cfg_w, _lm_cfg())
    s_w, _ = jax.jit(step_w)(state_w, batch, jax.random.PRNGKey(0))

    d_p = np.abs(leaf(s_p) - leaf(state_p))
    d_w = np.abs(leaf(s_w) - leaf(state_w))
    np.testing.assert_allclose(d_w, d_p * 0.25, rtol=1e-4, atol=1e-9)
    state_w2 = train_step_lib.set_lr(s_w, 5e-4)
    assert abs(train_step_lib.get_lr(state_w2) - 5e-4) < 1e-9


def test_skip_nonfinite_update(rng):
    """-skip_nonfinite: a poisoned batch (non-finite loss/grads) leaves the
    ENTIRE TrainState bit-identical — params, Adam moments, counters — and
    reports metrics["skipped"]=1; clean batches train normally with
    skipped=0 (train/step.py finite_guard)."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = train_step_lib.create_state(params, cfg, _lm_cfg())
    asr_step, lm_step = train_step_lib.make_train_step(
        cfg, _lm_cfg(), skip_nonfinite=True)
    asr_step = jax.jit(asr_step)
    batch = make_batch(rng, cfg)

    state, m = asr_step(state, batch, jax.random.PRNGKey(1))
    assert float(m["skipped"]) == 0.0 and np.isfinite(float(m["loss"]))

    snap = jax.tree_util.tree_map(np.asarray, state)
    poisoned = dict(batch)
    poisoned["logmel"] = batch["logmel"].at[0, 0, 0].set(jnp.inf)
    state, m = asr_step(state, poisoned, jax.random.PRNGKey(2))
    assert float(m["skipped"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(snap),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.global_step) == 1          # the skipped step didn't count

    state, m = asr_step(state, batch, jax.random.PRNGKey(3))
    assert float(m["skipped"]) == 0.0
    assert int(state.global_step) == 2

    # Same contract on the LM task.
    lm_step = jax.jit(lm_step)
    ids = np.ones((4, 4), dtype=np.int64)
    snap = jax.tree_util.tree_map(np.asarray, state)
    bad_lens = jnp.array([0, 0, 0, 0])          # empty lens -> 0/0 loss
    state, m = lm_step(state, jnp.asarray(ids), bad_lens,
                       jax.random.PRNGKey(4))
    if not np.isfinite(float(m["lm_loss"])):    # guard engaged
        assert float(m["skipped"]) == 1.0
        for a, b in zip(jax.tree_util.tree_leaves(snap),
                        jax.tree_util.tree_leaves(state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
