"""LoRA parameter-efficient fine-tuning (core/lora.py, -lora_rank):
attach/apply/merge semantics, base-frozen training, decode-surface merging,
checkpoint round-trips, family/targets coverage, and the CLI cycle."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import LMConfig
from e2e_asr_tpu.core import lora
from e2e_asr_tpu.train import step as step_lib


def _leaf_names(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    name = lambda p: "/".join(  # noqa: E731
        str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
        for k in p)
    return {name(p): leaf for p, leaf in flat}


def _lora_cfg(rank=2, targets=""):
    from tests.test_seq2seq import tiny_cfg
    cfg = tiny_cfg()
    cfg.lora_rank = rank
    cfg.lora_targets = targets
    return cfg


def test_attach_zero_init_is_identity_and_merge_matches_apply(rng):
    cfg = _lora_cfg()
    params = step_lib.init_params(jax.random.PRNGKey(1), cfg)
    assert lora.SCOPE in params
    base = {k: v for k, v in params.items() if k != lora.SCOPE}

    # b = 0 → the attached model computes exactly the base model.
    eff = lora.apply(params, 2.0)
    for name, leaf in _leaf_names(base).items():
        np.testing.assert_array_equal(np.asarray(_leaf_names(eff)[name]),
                                      np.asarray(leaf))

    # Nonzero adapters: merge() == apply() minus the subtree; deltas land
    # only on targeted kernels at (alpha/r)*A@B.
    bumped = jax.tree_util.tree_map(
        lambda x: x + 0.1, params[lora.SCOPE])
    params2 = dict(params)
    params2[lora.SCOPE] = bumped
    alpha = 3.0
    eff2, merged = lora.apply(params2, alpha), lora.merge(params2, alpha)
    assert lora.SCOPE not in merged
    eff2_leaves, merged_leaves = _leaf_names(eff2), _leaf_names(merged)
    names = lora.target_paths(base)
    assert names                                     # something was adapted
    for name, leaf in _leaf_names(base).items():
        np.testing.assert_array_equal(np.asarray(eff2_leaves[name]),
                                      np.asarray(merged_leaves[name]))
        if name in names:
            node = params2[lora.SCOPE]
            for part in name.split("/"):
                node = node[part] if isinstance(node, dict) else node[int(part)]
            want = np.asarray(leaf) + (alpha / 2) * (
                np.asarray(node["a"]) @ np.asarray(node["b"]))
            np.testing.assert_allclose(np.asarray(merged_leaves[name]), want,
                                       atol=1e-6)
        else:
            np.testing.assert_array_equal(np.asarray(merged_leaves[name]),
                                          np.asarray(leaf))


def test_targets_filter_and_guards():
    cfg = _lora_cfg(targets="decoder_char")
    params = step_lib.init_params(jax.random.PRNGKey(1), cfg)
    flat = _leaf_names(params[lora.SCOPE])
    assert flat and all(n.startswith("decoder_char/") for n in flat)

    base = {k: v for k, v in params.items() if k != lora.SCOPE}
    with pytest.raises(ValueError, match="match"):
        lora.attach(jax.random.PRNGKey(0), base, 2, ("no_such_leaf",))
    with pytest.raises(ValueError, match="rank"):
        lora.attach(jax.random.PRNGKey(0), base, 0)
    with pytest.raises(ValueError, match="already"):
        lora.attach(jax.random.PRNGKey(0), params, 2)


@pytest.mark.parametrize("family_kw", [
    {},                                             # attention
    {"model_family": "transducer"},
    {"model_family": "ctc"},
])
def test_train_step_moves_only_adapters(rng, family_kw):
    from tests.test_seq2seq import make_batch, tiny_cfg
    cfg = tiny_cfg()
    cfg.lora_rank = 2
    for k, v in family_kw.items():
        setattr(cfg, k, v)
    lm_cfg = LMConfig(vocab_size=cfg.decoders["char"].vocab_size)
    params = step_lib.init_params(jax.random.PRNGKey(1), cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(rng, cfg, B=2, T=16, T_dec=5).items()}
    new_state, metrics = jax.jit(asr_step)(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    moved = 0
    for name, old in _leaf_names(state.params).items():
        new = _leaf_names(new_state.params)[name]
        changed = not np.array_equal(np.asarray(old), np.asarray(new))
        if name.startswith("lora/"):
            moved += changed
        else:
            assert not changed, f"base leaf moved under LoRA: {name}"
    assert moved > 0


def test_lm_task_trains_adapters_only(rng):
    from tests.test_seq2seq import tiny_cfg
    cfg = tiny_cfg()
    cfg.lora_rank = 2
    lm_cfg = LMConfig(vocab_size=cfg.decoders["char"].vocab_size)
    params = step_lib.init_params(jax.random.PRNGKey(1), cfg)
    _, lm_step = step_lib.make_train_step(cfg, lm_cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    ids = jnp.asarray(rng.integers(3, cfg.decoders["char"].vocab_size,
                                   (7, 4)), jnp.int32).at[0].set(1)
    lens = jnp.array([6, 6, 4, 3], jnp.int32)
    new_state, metrics = jax.jit(lm_step)(state, ids, lens,
                                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["lm_loss"]))
    for name, old in _leaf_names(state.params).items():
        new = _leaf_names(new_state.params)[name]
        if not name.startswith("lora/"):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new),
                                          err_msg=name)


def test_loss_decreases_and_merged_decode_matches_effective(rng):
    from tests.test_seq2seq import make_batch, tiny_cfg
    from e2e_asr_tpu.models import seq2seq
    cfg = tiny_cfg()
    cfg.lora_rank = 4
    cfg.learning_rate = 0.05
    lm_cfg = LMConfig(vocab_size=cfg.decoders["char"].vocab_size)
    params = step_lib.init_params(jax.random.PRNGKey(1), cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(rng, cfg, B=2, T=16, T_dec=5).items()}
    losses = []
    step = jax.jit(asr_step)
    for i in range(12):
        state, m = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.05, losses

    alpha = lora.resolve_alpha(cfg.lora_rank, cfg.lora_alpha)
    eff = lora.apply(state.params, alpha)
    merged = step_lib.lora_merged(state.params, cfg)
    assert lora.SCOPE not in merged
    d = cfg.num_layers["char"]
    e1, _, _ = seq2seq.encode(eff, cfg, batch["logmel"], batch["logmel_len"])
    e2, _, _ = seq2seq.encode(merged, cfg, batch["logmel"],
                              batch["logmel_len"])
    np.testing.assert_allclose(np.asarray(e1[d]), np.asarray(e2[d]),
                               atol=1e-5)


def test_checkpoint_roundtrip_with_adapters(tmp_path, rng):
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    cfg = _lora_cfg()
    lm_cfg = LMConfig(vocab_size=cfg.decoders["char"].vocab_size)
    params = step_lib.init_params(jax.random.PRNGKey(1), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    ckpt_lib.save(str(tmp_path), "asr", 3, state)
    template = step_lib.create_state(
        step_lib.init_params(jax.random.PRNGKey(99), cfg), cfg, lm_cfg)
    restored, _ = ckpt_lib.restore_latest(str(tmp_path), template)
    for name, leaf in _leaf_names(state.params).items():
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(_leaf_names(restored.params)[name]),
            err_msg=name)


def test_config_guards():
    from e2e_asr_tpu.cli.main import parse_options
    base = ["-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
            "-attn_vec_size", "4", "-lm_hsize", "8", "-feat_len", "8"]
    cfg = parse_options(base + ["-lora_rank", "2"])
    assert cfg.model.lora_rank == 2
    with pytest.raises(ValueError, match="mwer|MWER|merge"):
        parse_options(base + ["-lora_rank", "2", "-mwer"])
    with pytest.raises(ValueError, match="ssl|supervised"):
        parse_options(base + ["-lora_rank", "2", "-ssl"])


def test_cli_lora_train_eval_cycle(tmp_path):
    """Train with -lora_rank through the real driver, then eval: the
    checkpoint carries adapters, the eval CLI merges them and decodes."""
    from e2e_asr_tpu.cli.main import launch_eval, launch_train, parse_options
    from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus

    root = str(tmp_path)
    data = os.path.join(root, "data")
    os.makedirs(data)
    make_vocab_dir(os.path.join(root, "vocab"))
    write_speech_corpus(os.path.join(data, "train_1k.0.0001"), 8,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4)
    write_speech_corpus(os.path.join(data, "dev.0001"), 4, feat_length=8,
                        char_vocab=20, min_tokens=3, max_tokens=5,
                        frames_per_token=4, seed=2)
    args = ["-data_dir", data, "-vocab_dir", os.path.join(root, "vocab"),
            "-tb_dir", os.path.join(root, "models"),
            "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
            "-attn_vec_size", "4", "-lm_hsize", "8", "-feat_len", "8",
            "-max_out_char", "8", "-buck_batch_sizes", "4",
            "-steps_per_checkpoint", "2", "-max_epochs", "1",
            "-compute_dtype", "float32", "-run_id", "41",
            "-lora_rank", "2"]
    cfg = parse_options(args)
    launch_train(cfg)
    ckpts = glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    assert ckpts
    with np.load(ckpts[0]) as z:
        lora_leaves = [n for n in z.files if n.startswith("params/lora/")]
        assert lora_leaves                       # adapters checkpointed

    cfg_dev = parse_options(args + ["-dev", "-beam_size", "2"])
    launch_eval(cfg_dev)
    assert os.path.isfile(os.path.join(cfg_dev.train.best_model_dir,
                                       "decoded_asr.txt"))
