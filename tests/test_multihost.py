"""Multi-slice mesh construction + multi-host data sharding + model-axis
reachability from the Trainer/CLI.

The reference has no distributed backend (SURVEY §2.2); these are first-class
subsystems of the new framework, validated here on the virtual 8-device CPU
mesh and with fake multi-slice device objects.
"""
import glob
import os
from types import SimpleNamespace

import jax
import numpy as np
import pytest

from e2e_asr_tpu.core import mesh as mesh_lib


def _fake_devices(n_slices, per_slice):
    return [SimpleNamespace(slice_index=s, id=s * per_slice + i)
            for s in range(n_slices) for i in range(per_slice)]


def test_hybrid_grid_slice_major():
    """2 slices x 4 devices, model=2: the model axis stays inside a slice and
    the data axis is slice-major (DCN crossed only between slice blocks)."""
    devs = _fake_devices(2, 4)
    grid = mesh_lib.hybrid_device_grid(devs, n_model=2)
    assert grid.shape == (4, 2)
    slice_of = np.vectorize(lambda d: d.slice_index)(grid)
    # Every model-axis row is within one slice.
    assert (slice_of[:, 0] == slice_of[:, 1]).all()
    # Data axis: first half slice 0, second half slice 1.
    assert slice_of[:, 0].tolist() == [0, 0, 1, 1]


def test_hybrid_grid_rejects_bad_shapes():
    uneven = ([SimpleNamespace(slice_index=0, id=i) for i in range(3)]
              + [SimpleNamespace(slice_index=1, id=3 + i) for i in range(4)])
    with pytest.raises(ValueError, match="uneven"):
        mesh_lib.hybrid_device_grid(uneven, n_model=1)
    with pytest.raises(ValueError, match="divide"):
        mesh_lib.hybrid_device_grid(_fake_devices(2, 4), n_model=3)


def test_hybrid_mesh_falls_back_without_slices():
    """CPU devices carry no slice_index: single-group fallback must equal the
    flat mesh layout."""
    mesh = mesh_lib.make_hybrid_mesh(n_model=2)
    flat = mesh_lib.make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    assert [d.id for d in mesh.devices.flat] == \
        [d.id for d in flat.devices.flat]


def test_speech_file_sharding_partitions_disjoint(tmp_path):
    """Host-side data sharding: each process loads every k-th file; the
    partition is disjoint and complete (data/speech.py:load_files)."""
    from e2e_asr_tpu.data.speech import SpeechDataset
    from e2e_asr_tpu.data.synth import write_speech_corpus

    files = []
    for i in range(5):
        p = str(tmp_path / f"train_1k.0.{i:04d}")
        write_speech_corpus(p, 4, feat_length=8, char_vocab=20, min_tokens=3,
                            max_tokens=4, frames_per_token=4, seed=i)
        files.append(p)

    all_ids = {u.utt_id for u in SpeechDataset(
        files, 4, 8, is_training=True).utts}
    shard_ids = []
    for pi in range(2):
        ds = SpeechDataset(files, 4, 8, is_training=True,
                           process_index=pi, process_count=2)
        shard_ids.append({u.utt_id for u in ds.utts})
        # Shards still produce full fixed-shape batches.
        batch = next(iter(ds.epoch()))
        assert batch["logmel"].shape[0] == 4
    assert shard_ids[0] & shard_ids[1] == set()
    assert shard_ids[0] | shard_ids[1] == all_ids
    # 5 files over 2 processes: 3 + 2 file split.
    assert len(shard_ids[0]) == 12 and len(shard_ids[1]) == 8


def test_trainer_model_axis_cli_reachable(tmp_path):
    """-model_axis 2 reaches the Trainer: the mesh gets a real model axis,
    the vocab projections shard over it, and training steps run (VERDICT
    round-1 item: model-axis sharding must be reachable from the CLI)."""
    import argparse

    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.core.checkpoint import flatten_named
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
    args = vars(parser.parse_args([
        "-data_dir", data, "-vocab_dir", os.path.join(root, "vocab"),
        "-tb_dir", os.path.join(root, "models"),
        "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
        "-attn_vec_size", "4", "-lm_hsize", "8", "-feat_len", "8",
        "-max_out_char", "8", "-buck_batch_sizes", "4",
        "-steps_per_checkpoint", "2", "-max_epochs", "1",
        "-compute_dtype", "float32", "-model_axis", "2", "-run_id", "31"]))
    cfg = config_lib.process_args(args, {"char": 23})

    trainer = Trainer(cfg)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    trainer.train()

    # Steps ran and a checkpoint landed.
    ckpts = glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    assert ckpts
    with np.load(sorted(ckpts)[-1]) as z:
        assert z["global_step"] >= 2

    # vocab 23 is not divisible by model_axis 2: the vocab projections must
    # have fallen back to replication (training above would fail otherwise).
    from e2e_asr_tpu.core import sharding as sharding_lib
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib
    params = seq2seq.init(jax.random.PRNGKey(0), cfg.model)
    state = step_lib.create_state(params, cfg.model, cfg.lm)
    placed = sharding_lib.place_state(state, trainer.mesh)
    kern = placed.params["decoder_char"]["output_proj"]["kernel"]
    assert tuple(kern.sharding.spec) in ((), (None, None)), kern.sharding

    # With a divisible vocab the projection DOES shard over the model axis.
    cfg.model.decoders["char"].vocab_size = 24
    params24 = seq2seq.init(jax.random.PRNGKey(0), cfg.model)
    placed24 = sharding_lib.place_state(
        step_lib.create_state(params24, cfg.model, cfg.lm), trainer.mesh)
    kern24 = placed24.params["decoder_char"]["output_proj"]["kernel"]
    assert tuple(kern24.sharding.spec) == (None, "model"), kern24.sharding
    # Adam slots follow the same placement.
    mu = placed24.opt_state[1].inner_state[0].mu
    mu_kern = mu["decoder_char"]["output_proj"]["kernel"]
    assert tuple(mu_kern.sharding.spec) == (None, "model"), mu_kern.sharding


def test_checkpoint_cross_mesh_portability(tmp_path):
    """Checkpoints are the interchange format (tf_utils.py:66-90): a state
    saved while sharded on the 8-device {data:4, model:2} mesh must restore
    and resume IDENTICALLY on 1 device, on {8,1}, and on {2,4} — including
    the model-axis-sharded vocab projections and their Adam slots."""
    import jax.numpy as jnp

    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig, LMConfig,
                                    Seq2SeqConfig)
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.core import sharding as sharding_lib
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib

    V = 24                      # divisible by model axes 2 and 4
    cfg = Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 6},
        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=8, vocab_size=V,
            attention_vec_size=8, lm_hidden_size=8, samp_prob=0.0,
            out_prob_dec=1.0, max_output=6)},
        feat_length=8)
    lm_cfg = LMConfig(lm_hidden_size=8, proj_size=8, emb_size=8,
                      vocab_size=V, out_prob=1.0)
    rng = np.random.default_rng(0)
    B, T, T_dec = 8, 12, 6
    ids = rng.integers(3, V, size=(B, T_dec))
    ids[:, 0] = 1
    batch = {
        "logmel": jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32)),
        "logmel_len": jnp.full((B,), T, jnp.int32),
        "char": jnp.asarray(ids),
        "char_len": jnp.full((B,), T_dec - 1, jnp.int32),
    }
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg)
    asr_step = jax.jit(asr_step)
    key = jax.random.PRNGKey(7)

    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)

    # Train one step on the source mesh and checkpoint the SHARDED state.
    mesh_a = mesh_lib.make_mesh(n_data=4, n_model=2)
    placed = sharding_lib.place_state(state, mesh_a)
    batch_a = mesh_lib.shard_batch(mesh_a, batch)
    state_a, _ = asr_step(placed, batch_a, key)
    kern = state_a.params["decoder_char"]["output_proj"]["kernel"]
    assert tuple(kern.sharding.spec) == (None, "model")   # genuinely sharded
    path = ckpt_lib.save(str(tmp_path), "asr.ckpt", 1, state_a)

    # Golden continuation on the source topology.
    key2 = jax.random.PRNGKey(8)
    gold, gold_metrics = asr_step(state_a, batch_a, key2)
    gold_leaves = [np.asarray(x)
                   for x in jax.tree_util.tree_leaves(gold.params)]

    for n_data, n_model in [(1, 1), (8, 1), (2, 4)]:
        mesh_b = mesh_lib.make_mesh(n_data=n_data, n_model=n_model)
        restored = ckpt_lib.restore(path, state)          # host template
        placed_b = sharding_lib.place_state(restored, mesh_b)
        out, metrics = asr_step(placed_b, mesh_lib.shard_batch(mesh_b, batch),
                                key2)
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(gold_metrics["loss"]),
                                   rtol=1e-5, atol=1e-6)
        for got, want in zip(jax.tree_util.tree_leaves(out.params),
                             gold_leaves):
            np.testing.assert_allclose(np.asarray(got), want,
                                       rtol=1e-5, atol=1e-6)
        assert int(out.global_step) == 2
