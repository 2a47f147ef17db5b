"""BEST-RQ-style SSL pretraining tests (train/ssl.py): quantizer locality,
span-mask dilation, masked-CE gating, learning, transformer alignment, and
the CLI pretrain -> -pretrain_enc_path fine-tune workflow."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import TrainConfig, process_args
from e2e_asr_tpu.train import ssl as ssl_lib
from tests.test_seq2seq import tiny_cfg


def _tc(**kw):
    defaults = dict(ssl=True, ssl_codebook_size=16, ssl_codebook_dim=4,
                    ssl_mask_prob=0.3, ssl_mask_span=2)
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_quantizer_deterministic_and_local(rng):
    cfg = tiny_cfg()
    tc = _tc()
    state = ssl_lib.init_ssl(jax.random.PRNGKey(0), cfg, tc)
    r = ssl_lib.output_reduction_factor(cfg.encoder,
                                        max(cfg.num_layers.values()))
    B, T = 2, 4 * r
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.feat_length))
                        .astype(np.float32))
    ids = ssl_lib.quantize_targets(state.quantizer, feats, r)
    ids2 = ssl_lib.quantize_targets(state.quantizer, feats, r)
    assert ids.shape == (B, T // r)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))
    assert 0 <= int(jnp.min(ids)) and int(jnp.max(ids)) < tc.ssl_codebook_size
    # Enough codes in play that the task isn't degenerate.
    big = jnp.asarray(rng.normal(size=(8, 16 * r, cfg.feat_length))
                      .astype(np.float32))
    big_ids = ssl_lib.quantize_targets(state.quantizer, big, r)
    assert len(np.unique(np.asarray(big_ids))) > 4

    # Locality: perturbing ONLY window k's raw frames changes ids at k only.
    k = 1
    perturbed = feats.at[:, k * r:(k + 1) * r, :].add(10.0)
    p_ids = np.asarray(ssl_lib.quantize_targets(state.quantizer,
                                                perturbed, r))
    base = np.asarray(ids)
    np.testing.assert_array_equal(np.delete(p_ids, k, axis=1),
                                  np.delete(base, k, axis=1))
    assert not np.array_equal(p_ids[:, k], base[:, k])


def test_span_mask_matches_dilation_oracle():
    B, T, span, prob = 4, 23, 3, 0.2
    lens = jnp.array([23, 10, 1, 0])
    key = jax.random.PRNGKey(7)
    mask = np.asarray(ssl_lib.span_mask(key, (B, T), lens, prob, span))
    # Re-derive the starts exactly as span_mask does, then dilate in numpy.
    starts = np.asarray(jax.random.bernoulli(key, prob, (B, T)))
    valid = np.arange(T)[None, :] < np.asarray(lens)[:, None]
    starts = starts & valid
    oracle = np.zeros_like(starts)
    for b in range(B):
        for t in range(T):
            if starts[b, t]:
                oracle[b, t:t + span] = True
    oracle &= valid
    np.testing.assert_array_equal(mask, oracle)
    assert not mask[3].any()          # zero-length row never masked


def test_zero_mask_prob_gates_loss_to_zero(rng):
    cfg = tiny_cfg()
    tc = _tc(ssl_mask_prob=0.0)
    state = ssl_lib.init_ssl(jax.random.PRNGKey(0), cfg, tc)
    loss_fn = ssl_lib.make_ssl_loss(cfg, tc)
    batch = {"logmel": jnp.asarray(rng.normal(size=(2, 12, cfg.feat_length))
                                   .astype(np.float32)),
             "logmel_len": jnp.array([12, 7])}
    loss, metrics = loss_fn(state.params, state.quantizer, batch,
                            jax.random.PRNGKey(1))
    assert float(loss) == 0.0
    assert float(metrics["n_masked"]) == 0.0


def test_padding_tail_invariance(rng):
    """Frames beyond a full window past each row's true length influence
    neither targets, mask, nor the corrupted input -> identical loss."""
    cfg = tiny_cfg()
    tc = _tc()
    state = ssl_lib.init_ssl(jax.random.PRNGKey(0), cfg, tc)
    loss_fn = ssl_lib.make_ssl_loss(cfg, tc)
    r = ssl_lib.output_reduction_factor(cfg.encoder,
                                        max(cfg.num_layers.values()))
    T = 6 * r
    feats = rng.normal(size=(2, T, cfg.feat_length)).astype(np.float32)
    lens = jnp.array([4 * r, 2 * r])
    batch = {"logmel": jnp.asarray(feats), "logmel_len": lens}
    loss, _ = loss_fn(state.params, state.quantizer, batch,
                      jax.random.PRNGKey(3))
    feats2 = feats.copy()
    feats2[0, 4 * r:] += 5.0
    feats2[1, 2 * r:] -= 3.0
    loss2, _ = loss_fn(state.params, state.quantizer,
                       {"logmel": jnp.asarray(feats2), "logmel_len": lens},
                       jax.random.PRNGKey(3))
    # The recurrent encoder scans padded frames into dead state (outputs are
    # length-masked), so the loss through masked positions is identical.
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_ssl_step_learns(rng):
    """Structured features: each window's content repeats in adjacent pairs,
    so a masked window's code is readable from its unmasked twin — the
    contextual-prediction task SSL is supposed to solve (not memorization)."""
    cfg = tiny_cfg()
    cfg.learning_rate = 5e-3
    cfg.encoder.hidden_size = 16
    tc = _tc(ssl_mask_prob=0.3, ssl_mask_span=1)
    state = ssl_lib.init_ssl(jax.random.PRNGKey(0), cfg, tc)
    step = jax.jit(ssl_lib.make_ssl_step(cfg, tc))
    r = ssl_lib.output_reduction_factor(cfg.encoder,
                                        max(cfg.num_layers.values()))

    def make_batch(seed):
        g = np.random.default_rng(seed)
        B, T = 4, 12 * r
        w = g.normal(size=(B, T // (2 * r), 1, cfg.feat_length))
        x = np.repeat(w, 2 * r, axis=2).reshape(B, T, cfg.feat_length)
        return {"logmel": jnp.asarray(x.astype(np.float32)),
                "logmel_len": jnp.array([T, T, 8 * r, 4 * r])}

    batches = [make_batch(s) for s in range(2)]
    first_losses, last_losses, last_accs = [], [], []
    for i in range(150):
        state, metrics = step(state, batches[i % 2], jax.random.PRNGKey(i))
        if i < 10:
            first_losses.append(float(metrics["loss"]))
        if i >= 140:
            last_losses.append(float(metrics["loss"]))
            last_accs.append(float(metrics["masked_acc"]))
    assert np.mean(last_losses) < np.mean(first_losses) * 0.6, (
        first_losses, last_losses)
    # Chance accuracy is 1/16.
    assert np.mean(last_accs) > 0.3, last_accs
    assert int(state.global_step) == 150
    # The quantizer is frozen.
    fresh = ssl_lib.init_ssl(jax.random.PRNGKey(0), cfg, tc)
    np.testing.assert_array_equal(np.asarray(state.quantizer["proj"]),
                                  np.asarray(fresh.quantizer["proj"]))


def test_transformer_encoder_alignment(rng):
    from tests.test_transformer_encoder import tiny_cfg as xfmr_cfg
    cfg = xfmr_cfg()
    tc = _tc()
    state = ssl_lib.init_ssl(jax.random.PRNGKey(0), cfg, tc)
    r = ssl_lib.output_reduction_factor(cfg.encoder,
                                        max(cfg.num_layers.values()))
    assert r == cfg.encoder.subsample
    loss_fn = ssl_lib.make_ssl_loss(cfg, tc)
    T = 37                           # ragged vs subsample on purpose
    batch = {"logmel": jnp.asarray(rng.normal(size=(3, T, cfg.feat_length))
                                   .astype(np.float32)),
             "logmel_len": jnp.array([T, 17, 5])}
    loss, metrics = loss_fn(state.params, state.quantizer, batch,
                            jax.random.PRNGKey(2))
    assert np.isfinite(float(loss)) and float(loss) > 0
    step = jax.jit(ssl_lib.make_ssl_step(cfg, tc))
    state2, _ = step(state, batch, jax.random.PRNGKey(3))
    assert int(state2.global_step) == 1


def test_ssl_config_guards():
    base = {"tasks": "", "gru": False, "use_lstm": True, "skip_step": 2,
            "stack_cons": 1, "initial_res_fac": 1, "num_layers_dec": 1,
            "lm_prob": 0.5, "run_id": 1, "avg": False, "train_base_dir": "/tmp",
            "ssl": True}
    with pytest.raises(ValueError, match="encoder-only"):
        process_args(base)


def test_cli_pretrain_then_finetune(tmp_path):
    """End-to-end: `-ssl` pretraining through the CLI writes ssl.ckpt-*.npz
    in its own ssl_-prefixed run dir; `-pretrain_enc_path` merges exactly
    the encoder subtree into a supervised run (decoder untouched), and the
    supervised CLI trains from it."""
    from e2e_asr_tpu.cli.main import launch_train, parse_options
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus
    from e2e_asr_tpu.train import step as step_lib

    root = str(tmp_path)
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir)
    make_vocab_dir(os.path.join(root, "vocab"))
    write_speech_corpus(os.path.join(data_dir, "train_1k.0.0001"), 8,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4)
    write_speech_corpus(os.path.join(data_dir, "dev.0001"), 4,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4, seed=2)

    def args(extra=()):
        return ["-data_dir", data_dir,
                "-vocab_dir", os.path.join(root, "vocab"),
                "-tb_dir", os.path.join(root, "models"),
                "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
                "-attn_vec_size", "4", "-lm_hsize", "8",
                "-feat_len", "8", "-max_out_char", "8",
                "-buck_batch_sizes", "4",
                "-steps_per_checkpoint", "2", "-max_epochs", "1",
                "-compute_dtype", "float32", "-run_id", "7"] + list(extra)

    ssl_cfg = parse_options(args(["-ssl", "-ssl_steps", "4",
                                  "-ssl_codebook_size", "8",
                                  "-ssl_codebook_dim", "4"]))
    assert os.path.basename(ssl_cfg.train.train_dir).startswith("ssl_")
    launch_train(ssl_cfg)
    ckpts = sorted(glob.glob(os.path.join(ssl_cfg.train.train_dir,
                                          "ssl.ckpt-*.npz")))
    assert ckpts

    # Unit-level merge check.
    sup_cfg = parse_options(args())
    params = step_lib.init_params(jax.random.PRNGKey(0), sup_cfg.model)
    merged = ckpt_lib.partial_restore(params, ckpts[-1], scope="encoder")
    with np.load(ckpts[-1]) as z:
        for name in z.files:
            if name.startswith("params/encoder/"):
                leaf = merged["encoder"]
                for part in name.split("/")[2:]:
                    leaf = leaf[part]
                np.testing.assert_array_equal(np.asarray(leaf), z[name])
    # Decoder untouched.
    for (a, b) in zip(jax.tree_util.tree_leaves(params["decoder_char"]),
                      jax.tree_util.tree_leaves(merged["decoder_char"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Supervised fine-tune through the CLI consumes the SSL checkpoint.
    ft_cfg = parse_options(args(["-pretrain_enc_path", ckpts[-1]]))
    launch_train(ft_cfg)
    assert glob.glob(os.path.join(ft_cfg.train.train_dir, "asr.ckpt-*.npz"))


def test_ssl_resume(tmp_path):
    """SSL checkpoints resume: a second SSLTrainer.train() picks up the
    step counter and the SAME frozen quantizer."""
    from e2e_asr_tpu.cli.main import launch_train, parse_options
    from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus
    from e2e_asr_tpu.train.ssl import SSLTrainer

    root = str(tmp_path)
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir)
    make_vocab_dir(os.path.join(root, "vocab"))
    write_speech_corpus(os.path.join(data_dir, "train_1k.0.0001"), 8,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4)

    def cfg(steps):
        return parse_options(
            ["-data_dir", data_dir, "-vocab_dir", os.path.join(root, "vocab"),
             "-tb_dir", os.path.join(root, "models"), "-hsize", "8",
             "-hsize_dec", "8", "-emb_size", "8", "-attn_vec_size", "4",
             "-lm_hsize", "8", "-feat_len", "8", "-max_out_char", "8",
             "-buck_batch_sizes", "4", "-steps_per_checkpoint", "2",
             "-max_epochs", "3", "-compute_dtype", "float32",
             "-run_id", "8", "-ssl", "-ssl_steps", str(steps),
             "-ssl_codebook_size", "8", "-ssl_codebook_dim", "4"])

    launch_train(cfg(2))
    first = sorted(glob.glob(os.path.join(cfg(2).train.train_dir,
                                          "ssl.ckpt-*.npz")))
    assert first
    with np.load(first[-1]) as z:
        q0 = z["quantizer/proj"].copy()

    launch_train(cfg(4))
    later = sorted(glob.glob(os.path.join(cfg(4).train.train_dir,
                                          "ssl.ckpt-*.npz")),
                   key=lambda p: int(p.rsplit("-", 1)[1].split(".")[0]))
    steps = [int(p.rsplit("-", 1)[1].split(".")[0]) for p in later]
    assert max(steps) >= 4
    with np.load(later[-1]) as z:
        np.testing.assert_array_equal(z["quantizer/proj"], q0)
