"""FSDP (ZeRO-3) sharding: params + Adam moments sharded over the data axis.

The reference has no distributed backend at all (SURVEY §2.2); FSDP is a
first-class subsystem of the new framework. These tests pin (a) which leaves
shard and that per-device memory actually drops, (b) bitwise-equivalent
training trajectories vs plain data parallelism, (c) checkpoint portability
between FSDP and unsharded topologies, and (d) CLI reachability (-fsdp).
"""
import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig, LMConfig,
                                Seq2SeqConfig)
from e2e_asr_tpu.core import mesh as mesh_lib
from e2e_asr_tpu.core import sharding as sharding_lib
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as step_lib


def _cfg(V=24, H=64):
    return Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 6},
        encoder=EncoderConfig(hidden_size=H, out_prob=1.0),
        decoders={"char": DecoderConfig(
            hidden_size_dec=H, emb_size=H, vocab_size=V,
            attention_vec_size=H, lm_hidden_size=H, samp_prob=0.0,
            out_prob_dec=1.0, max_output=6)},
        feat_length=8)


def _batch(rng, V=24, B=8, T=12, T_dec=6):
    ids = rng.integers(3, V, size=(B, T_dec))
    ids[:, 0] = 1
    return {
        "logmel": jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32)),
        "logmel_len": jnp.full((B,), T, jnp.int32),
        "char": jnp.asarray(ids),
        "char_len": jnp.full((B,), T_dec - 1, jnp.int32),
    }


def test_fsdp_spec_rules():
    """The overlay shards each large leaf's largest free dimension over
    "data", composes with the model axis on vocab projections, and leaves
    small / indivisible leaves replicated."""
    from jax.sharding import PartitionSpec as P

    f = sharding_lib._fsdp_overlay
    # Large 2-D leaf, dim0 divisible: shard the larger dim.
    assert f(P(None, None), (64, 128), 4) == P(None, "data")
    assert f(P(None, None), (128, 64), 4) == P("data", None)
    # "model" already claims dim1 -> "data" takes dim0.
    assert f(P(None, "model"), (64, 128), 4) == P("data", "model")
    # Too small: untouched (64*8 < FSDP_MIN_SIZE).
    assert f(P(None, None), (64, 8), 4) == P(None, None)
    # No divisible free dim: untouched.
    assert f(P(None, None), (63, 65), 4) == P(None, None)
    # n_data == 1: no-op.
    assert f(P(None, None), (64, 128), 1) == P(None, None)


def test_fsdp_places_and_shrinks_per_device():
    """place_state(fsdp=True) shards the big leaves (and their Adam
    moments) over the data axis — per-device shard shapes shrink n_data-
    fold — while scalar counters and small biases stay replicated."""
    cfg = _cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, LMConfig(vocab_size=24))
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    placed = sharding_lib.place_state(state, mesh, fsdp=True)

    kern = placed.params["decoder_char"]["output_proj"]["kernel"]   # [H,V]
    assert "data" in tuple(kern.sharding.spec), kern.sharding
    full = kern.shape
    shard = kern.addressable_shards[0].data.shape
    assert shard[0] * 4 == full[0] or shard[1] * 4 == full[1]

    # Adam moments follow the identical placement.
    mu = placed.opt_state[1].inner_state[0].mu
    mu_kern = mu["decoder_char"]["output_proj"]["kernel"]
    assert mu_kern.sharding == kern.sharding

    # Scalars replicated.
    assert placed.global_step.sharding.is_fully_replicated

    # A real fraction of parameter bytes is sharded.
    leaves = jax.tree_util.tree_leaves(placed.params)
    sh = sum(x.size for x in leaves if "data" in tuple(x.sharding.spec))
    tot = sum(x.size for x in leaves)
    assert sh / tot > 0.5, f"only {sh}/{tot} elements FSDP-sharded"


def test_fsdp_trajectory_matches_unsharded():
    """Three jitted train steps on the {data:4, model:2} mesh with FSDP
    placement reproduce the unsharded single-device trajectory: loss at
    every step (tight) and every final parameter leaf (loose — the
    reduce-scatter's float summation order differs from the single-device
    sum, and Adam's 1/sqrt(v) normalization amplifies that ~1e-6 gradient
    noise on near-zero second moments; measured max 0.4% relative after
    3 steps)."""
    cfg = _cfg()
    lm_cfg = LMConfig(lm_hidden_size=32, proj_size=32, emb_size=32,
                      vocab_size=24, out_prob=1.0)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    asr_step = jax.jit(step_lib.make_train_step(cfg, lm_cfg)[0])

    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state0 = step_lib.create_state(params, cfg, lm_cfg)

    def run(state, batch_fn):
        losses = []
        for i in range(3):
            state, m = asr_step(state, batch_fn(batch),
                                jax.random.PRNGKey(100 + i))
            losses.append(float(m["loss"]))
        return state, losses

    gold, gold_losses = run(state0, lambda b: b)

    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    placed = sharding_lib.place_state(state0, mesh, fsdp=True)
    out, losses = run(placed, lambda b: mesh_lib.shard_batch(mesh, b))

    np.testing.assert_allclose(losses, gold_losses, rtol=1e-5)
    for (kp, a), (kg, b) in zip(
            jax.tree_util.tree_leaves_with_path(out.params),
            jax.tree_util.tree_leaves_with_path(gold.params)):
        assert kp == kg
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-5, err_msg=str(kp))


def test_fsdp_checkpoint_portability(tmp_path):
    """A checkpoint saved from an FSDP-sharded state restores and resumes
    identically on one device and back onto an FSDP mesh (checkpoints stay
    the interchange format regardless of the training-time sharding)."""
    from e2e_asr_tpu.core import checkpoint as ckpt_lib

    cfg = _cfg()
    lm_cfg = LMConfig(vocab_size=24)
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    asr_step = jax.jit(step_lib.make_train_step(cfg, lm_cfg)[0])

    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    placed = sharding_lib.place_state(state, mesh, fsdp=True)
    state_a, _ = asr_step(placed, mesh_lib.shard_batch(mesh, batch),
                          jax.random.PRNGKey(7))
    path = ckpt_lib.save(str(tmp_path), "asr.ckpt", 1, state_a)

    key2 = jax.random.PRNGKey(8)
    gold, gm = asr_step(state_a, mesh_lib.shard_batch(mesh, batch), key2)
    gold_leaves = [np.asarray(x)
                   for x in jax.tree_util.tree_leaves(gold.params)]

    # Restore unsharded (single device).
    restored = ckpt_lib.restore(path, state)
    out, m = asr_step(restored, batch, key2)
    np.testing.assert_allclose(float(m["loss"]), float(gm["loss"]),
                               rtol=1e-5, atol=1e-6)
    for got, want in zip(jax.tree_util.tree_leaves(out.params), gold_leaves):
        # Params loose (like the trajectory test above): the sharded step's
        # reduce-scatter and the unsharded all-reduce sum grads in different
        # orders, and Adam's rsqrt amplifies that on near-zero moments.
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-2, atol=1e-5)

    # Restore back onto a DIFFERENT fsdp mesh split.
    mesh_b = mesh_lib.make_mesh(n_data=4, n_model=2)
    placed_b = sharding_lib.place_state(ckpt_lib.restore(path, state),
                                        mesh_b, fsdp=True)
    out_b, m_b = asr_step(placed_b, mesh_lib.shard_batch(mesh_b, batch),
                          key2)
    np.testing.assert_allclose(float(m_b["loss"]), float(gm["loss"]),
                               rtol=1e-5, atol=1e-6)


def test_fsdp_cli_reachable(tmp_path):
    """-fsdp trains through the production Trainer on the virtual mesh and
    checkpoints land; -fsdp under -pp_stages is a clear error."""
    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus
    from e2e_asr_tpu.train.loop import Trainer

    root = str(tmp_path)
    data = os.path.join(root, "data")
    os.makedirs(data)
    make_vocab_dir(os.path.join(root, "vocab"))
    write_speech_corpus(os.path.join(data, "train_1k.0.0001"), 8,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4)

    parser = argparse.ArgumentParser()
    config_lib.add_parse_options(parser)
    base = ["-data_dir", data, "-vocab_dir", os.path.join(root, "vocab"),
            "-tb_dir", os.path.join(root, "models"),
            "-hsize", "16", "-hsize_dec", "16", "-emb_size", "16",
            "-attn_vec_size", "8", "-lm_hsize", "16", "-feat_len", "8",
            "-max_out_char", "8", "-buck_batch_sizes", "4",
            "-steps_per_checkpoint", "2", "-max_epochs", "1",
            "-compute_dtype", "float32", "-fsdp", "-run_id", "77"]
    args = vars(parser.parse_args(base))
    cfg = config_lib.process_args(args, {"char": 23})
    trainer = Trainer(cfg)
    assert trainer.train_cfg.fsdp and trainer.mesh is not None
    trainer.train()
    ckpts = glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    assert ckpts

    args_bad = vars(parser.parse_args(base + [
        "-pp_stages", "2", "-pp_micro", "2", "-encoder_type", "transformer",
        "-num_heads", "2", "-ffn_mult", "2", "-enc_subsample", "4",
        "-nlc", "2"]))
    cfg_bad = config_lib.process_args(args_bad, {"char": 23})
    with pytest.raises(ValueError, match="fsdp"):
        Trainer(cfg_bad)
