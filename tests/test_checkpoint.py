"""Checkpoint round-trip, pointer/gc, and partial-restore semantics."""
import os

import jax
import numpy as np

from e2e_asr_tpu.config import LMConfig
from e2e_asr_tpu.core import checkpoint as ckpt
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as train_step_lib

from tests.test_seq2seq import tiny_cfg


def _state():
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    lm_cfg = LMConfig(lm_hidden_size=8, proj_size=8, emb_size=6, vocab_size=11)
    return train_step_lib.create_state(params, cfg, lm_cfg), cfg, lm_cfg


def test_flatten_names_are_stable():
    state, _, _ = _state()
    named = ckpt.flatten_named(state.params)
    assert "encoder/layer_1/fw/kernel" in named
    assert "decoder_char/embedding" in named
    assert "decoder_char/dec_cells/0/kernel" in named


def test_save_restore_roundtrip(tmp_path):
    state, cfg, lm_cfg = _state()
    d = str(tmp_path)
    ckpt.save(d, "asr.ckpt", 500, state, meta={"best": 0.5})
    template = train_step_lib.create_state(
        seq2seq.init(jax.random.PRNGKey(9), cfg), cfg, lm_cfg)
    restored, meta = ckpt.restore_latest(d, template)
    assert meta == {"best": 0.5}
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_max_to_keep_gc(tmp_path):
    state, _, _ = _state()
    d = str(tmp_path)
    for step in [100, 200, 300]:
        ckpt.save(d, "asr.ckpt", step, state, max_to_keep=2)
    files = sorted(f for f in os.listdir(d) if f.endswith(".npz"))
    assert files == ["asr.ckpt-200.npz", "asr.ckpt-300.npz"]


def test_lr_decay_survives_checkpoint_roundtrip(tmp_path):
    """The decayed LR lives in the optimizer hyperparams and must persist
    through save/restore (the reference stores it as a TF variable)."""
    from e2e_asr_tpu.train.step import get_lr, set_lr

    state, cfg, lm_cfg = _state()
    state = set_lr(state, 2.5e-4)
    d = str(tmp_path)
    ckpt.save(d, "asr.ckpt", 1000, state)
    template = train_step_lib.create_state(
        seq2seq.init(jax.random.PRNGKey(5), cfg), cfg, lm_cfg)
    restored, _ = ckpt.restore_latest(d, template)
    assert abs(get_lr(restored) - 2.5e-4) < 1e-9


def test_partial_restore_merges_matching_leaves(tmp_path):
    """Pretraining transfer: leaves present in the checkpoint are merged,
    missing leaves keep their init (tf_utils.py:53-63)."""
    state, cfg, _ = _state()
    d = str(tmp_path)
    path = ckpt.save(d, "asr.ckpt", 1, state)

    fresh = seq2seq.init(jax.random.PRNGKey(42), cfg)
    merged = ckpt.partial_restore(fresh, path)
    # Merged params equal the checkpointed ones (full overlap here, via the
    # params/ prefix fallback).
    np.testing.assert_array_equal(
        np.asarray(merged["decoder_char"]["embedding"]),
        np.asarray(state.params["decoder_char"]["embedding"]))


def test_partial_restore_skips_shape_mismatch(tmp_path):
    state, cfg, _ = _state()
    d = str(tmp_path)
    path = ckpt.save(d, "asr.ckpt", 1, state.params)

    cfg2 = tiny_cfg()
    cfg2.decoders["char"].vocab_size = 17  # different vocab -> shape mismatch
    fresh = seq2seq.init(jax.random.PRNGKey(42), cfg2)
    before = np.asarray(fresh["decoder_char"]["embedding"]).copy()
    merged = ckpt.partial_restore(fresh, path)
    # Mismatched embedding kept from fresh init…
    np.testing.assert_array_equal(
        np.asarray(merged["decoder_char"]["embedding"]), before)
    # …while matching encoder leaves are merged.
    np.testing.assert_array_equal(
        np.asarray(merged["encoder"]["layer_1"]["fw"]["kernel"]),
        np.asarray(state.params["encoder"]["layer_1"]["fw"]["kernel"]))


def test_async_checkpointer_matches_sync(tmp_path):
    """AsyncCheckpointer writes byte-identical checkpoints, in order, with
    working pointer files and GC; flush() surfaces completion."""
    import jax.numpy as jnp

    from e2e_asr_tpu.core import checkpoint as ckpt_lib

    state = {"a": jnp.arange(6.0).reshape(2, 3),
             "nested": {"b": jnp.ones((4,), jnp.int32)}}
    sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
    w = ckpt_lib.AsyncCheckpointer()
    for step in (1, 2, 3, 4):
        bumped = {"a": state["a"] + step, "nested": state["nested"]}
        ckpt_lib.save(sync_dir, "ck", step, bumped, meta={"s": step},
                      max_to_keep=2)
        w.save(async_dir, "ck", step, bumped, meta={"s": step},
               max_to_keep=2)
    w.flush()

    import os
    assert sorted(os.listdir(sync_dir)) == sorted(os.listdir(async_dir))
    pth_s, meta_s = ckpt_lib.latest_path(sync_dir)
    pth_a, meta_a = ckpt_lib.latest_path(async_dir)
    assert meta_s == meta_a == {"s": 4}
    rs = ckpt_lib.restore(pth_s, state)
    ra = ckpt_lib.restore(pth_a, state)
    for a, b in zip(jax.tree_util.tree_leaves(rs),
                    jax.tree_util.tree_leaves(ra)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    w.close()


def test_async_checkpointer_snapshot_isolated_from_donation(tmp_path):
    """save() must snapshot to host BEFORE returning: mutating (or
    deleting) the device arrays afterwards cannot corrupt the write — the
    same guarantee donated train-step buffers need."""
    import jax.numpy as jnp

    from e2e_asr_tpu.core import checkpoint as ckpt_lib

    w = ckpt_lib.AsyncCheckpointer()
    arr = jnp.full((8,), 7.0)
    w.save(str(tmp_path), "ck", 1, {"a": arr})
    arr.delete()                            # simulate donation invalidation
    w.flush()
    restored = ckpt_lib.restore(str(tmp_path / "ck-1.npz"),
                                {"a": np.zeros((8,))})
    np.testing.assert_array_equal(restored["a"], np.full((8,), 7.0))
    w.close()


def test_async_checkpointer_error_surfaces(tmp_path):
    """A failed background write re-raises on flush()."""
    import pytest

    from e2e_asr_tpu.core import checkpoint as ckpt_lib

    target = tmp_path / "blocked"
    target.write_text("a file, not a dir")   # makedirs will fail
    w = ckpt_lib.AsyncCheckpointer()
    w.save(str(target), "ck", 1, {"a": np.zeros((2,))})
    with pytest.raises(RuntimeError, match="async checkpoint"):
        w.flush()
    w.close()
