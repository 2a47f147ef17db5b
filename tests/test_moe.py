"""Switch-style MoE FFN + expert parallelism (transformer family):
routing math, dense-FFN equivalence at E=1, EP == single-device, aux loss
threading, CLI reachability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.models import seq2seq, transformer_encoder as te
from tests.test_pipeline import _cfg, _data


def _moe_cfg(E=2, depth=2):
    cfg = _cfg(depth=depth)
    cfg.encoder.moe_experts = E
    return cfg


def test_moe_init_and_forward(rng):
    cfg = _moe_cfg(E=4)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    blk = params["encoder"]["block_1"]
    assert "moe" in blk and "ffn1" not in blk
    assert blk["moe"]["w1"].shape[0] == 4
    feats, lens = _data(rng)
    attn, _, _ = seq2seq.encode(params, cfg, feats, lens)
    out = np.asarray(attn[cfg.num_layers["char"]])
    assert np.isfinite(out).all() and out.std() > 0


def test_moe_single_expert_equals_dense_ffn(rng):
    """E=1 with ample capacity routes every token to the one expert with
    gate=1, so the MoE layer must equal the plain FFN with those weights."""
    D, F = 16, 32
    k = jax.random.PRNGKey(1)
    from e2e_asr_tpu.core.layers import glorot_uniform
    w1 = glorot_uniform(jax.random.fold_in(k, 0), (1, D, F))
    w2 = glorot_uniform(jax.random.fold_in(k, 1), (1, F, D))
    p = {"router": {"kernel": jnp.zeros((D, 1)), "bias": jnp.zeros((1,))},
         "w1": w1, "b1": jnp.zeros((1, F)),
         "w2": w2, "b2": jnp.zeros((1, D))}
    x = jnp.asarray(rng.normal(size=(2, 8, D)).astype(np.float32))
    got = te._moe_ffn(p, x, capacity_factor=1.0, aux_sink=None)
    want = jax.nn.gelu(x @ w1[0]) @ w2[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_moe_capacity_drops_to_residual(rng):
    """Tokens over capacity get ZERO ffn output (they ride the residual):
    with capacity C=1 and E=1, exactly one token's output is nonzero."""
    D, F = 8, 8
    from e2e_asr_tpu.core.layers import glorot_uniform
    k = jax.random.PRNGKey(2)
    p = {"router": {"kernel": jnp.zeros((D, 1)), "bias": jnp.zeros((1,))},
         "w1": glorot_uniform(k, (1, D, F)), "b1": jnp.ones((1, F)),
         "w2": glorot_uniform(jax.random.fold_in(k, 1), (1, F, D)),
         "b2": jnp.ones((1, D))}
    x = jnp.asarray(rng.normal(size=(1, 6, D)).astype(np.float32))
    out = np.asarray(te._moe_ffn(p, x, capacity_factor=1.0 / 6.0,
                                 aux_sink=None))       # C = ceil(6/6)=1
    nonzero_rows = np.abs(out[0]).sum(axis=-1) > 0
    assert nonzero_rows.sum() == 1 and nonzero_rows[0]


def test_moe_expert_parallel_matches_single_device(rng):
    cfg = _moe_cfg(E=4)
    params = seq2seq.init(jax.random.PRNGKey(3), cfg)
    blk = params["encoder"]["block_1"]["moe"]
    x = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:2]), ("expert",))
    a = te._moe_ffn(blk, x, 1.25, None)
    b = te._moe_ffn(blk, x, 1.25, None, ep_mesh=mesh)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-6)


def test_moe_aux_loss_and_router_grads(rng):
    """apply_train surfaces the load-balance aux loss and the router gets
    gradients (through the gate and the aux term)."""
    cfg = _moe_cfg(E=2)
    params = seq2seq.init(jax.random.PRNGKey(4), cfg)
    feats, lens = _data(rng)
    B = feats.shape[0]
    ids = rng.integers(3, 13, size=(B, 6)).astype(np.int32)
    ids[:, 0] = 1
    batch = {"logmel": feats, "logmel_len": lens,
             "char": jnp.asarray(ids),
             "char_len": jnp.full((B,), 5, jnp.int32)}

    def loss_fn(p):
        total, per_task = seq2seq.apply_train(p, cfg, batch,
                                              rng=jax.random.PRNGKey(0))
        return total, per_task

    (total, per_task), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
    assert "moe_aux" in per_task
    aux = float(per_task["moe_aux"])
    assert np.isfinite(aux) and aux > 0
    g_router = np.asarray(
        grads["encoder"]["block_1"]["moe"]["router"]["kernel"])
    assert np.abs(g_router).max() > 0
    g_w1 = np.asarray(grads["encoder"]["block_1"]["moe"]["w1"])
    assert np.abs(g_w1).max() > 0


def test_moe_composes_with_remat(rng):
    """-remat with MoE blocks: the aux loss crosses the checkpoint boundary
    as a returned value, so total loss, the surfaced aux, and every
    gradient (router included) match the non-remat run exactly."""
    import copy

    cfg = _moe_cfg(E=2)
    params = seq2seq.init(jax.random.PRNGKey(4), cfg)
    feats, lens = _data(rng)
    B = feats.shape[0]
    ids = rng.integers(3, 13, size=(B, 6)).astype(np.int32)
    ids[:, 0] = 1
    batch = {"logmel": feats, "logmel_len": lens,
             "char": jnp.asarray(ids),
             "char_len": jnp.full((B,), 5, jnp.int32)}

    def loss_fn(p, c):
        return seq2seq.apply_train(p, c, batch, rng=jax.random.PRNGKey(0))

    cfg_r = copy.deepcopy(cfg)
    cfg_r.encoder.remat = True
    (t0, per0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, cfg)
    (t1, per1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params, cfg_r)
    np.testing.assert_allclose(float(t0), float(t1), rtol=1e-6)
    np.testing.assert_allclose(float(per0["moe_aux"]),
                               float(per1["moe_aux"]), rtol=1e-6)
    assert float(per1["moe_aux"]) > 0
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("family,ctc_w", [("attention", 0.3), ("ctc", 0.0)])
def test_moe_aux_reaches_hybrid_and_ctc_families(rng, family, ctc_w):
    """The load-balance aux term flows through the hybrid and pure-CTC
    training objectives too: the router gets gradients via make_train_step,
    and for hybrid the metric surfaces as loss_moe_aux."""
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.train import step as step_lib

    cfg = _moe_cfg(E=2)
    cfg.model_family = family
    cfg.ctc_weight = ctc_w
    lm_cfg = LMConfig(vocab_size=13, lm_hidden_size=8, proj_size=8,
                      emb_size=8)
    params = step_lib.init_params(jax.random.PRNGKey(5), cfg)
    feats, lens = _data(rng)
    B = feats.shape[0]
    ids = rng.integers(3, 13, size=(B, 6)).astype(np.int32)
    ids[:, 0] = 1
    batch = {"logmel": feats, "logmel_len": lens,
             "char": jnp.asarray(ids),
             "char_len": jnp.full((B,), 5, jnp.int32)}
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    new_state, metrics = asr_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    if family == "attention":                  # hybrid surfaces the metric
        assert float(metrics["loss_moe_aux"]) > 0
    g = jax.tree_util.tree_map(jnp.subtract, new_state.params, params)
    moved = np.abs(np.asarray(
        g["encoder"]["block_1"]["moe"]["router"]["kernel"])).max()
    assert moved > 0


@pytest.mark.parametrize("mode", ["pp", "sp", "pp_ep", "sp_ep",
                                  "pp_3d", "sp_3d"])
def test_moe_composes_with_pp_and_sp(rng, mode):
    """MoE blocks under pipeline / sequence parallelism: with ample
    capacity (no drops — capacity binds per microbatch/time-shard, the
    only semantic difference) the full training loss, the pooled aux, and
    every gradient equal the serial run exactly; the aux arrives via the
    psum'd routing statistics, not a side channel. The *_ep modes compose
    EXPERT parallelism on top via the 2-D (stage|seq, expert) mesh: the
    MoE weights shard over the expert axis (local dispatch slice + one
    psum per FFN) with the same serial-exact semantics. The *_3d modes
    add DATA parallelism too — the full 3-D (data, stage|seq, expert)
    mesh on all 8 virtual devices, batch rows sharded over "data" and
    routing stats pooled across every axis."""
    from functools import partial

    from e2e_asr_tpu.core import pipeline, seq_parallel

    cfg = _moe_cfg(E=2)
    cfg.encoder.moe_capacity = 2.0        # C = N: routing never drops
    params = seq2seq.init(jax.random.PRNGKey(4), cfg)
    feats, lens = _data(rng)
    B = feats.shape[0]
    ids = rng.integers(3, 13, size=(B, 6)).astype(np.int32)
    ids[:, 0] = 1
    batch = {"logmel": feats, "logmel_len": lens,
             "char": jnp.asarray(ids),
             "char_len": jnp.full((B,), 5, jnp.int32)}
    n_ep = 2 if mode.endswith(("_ep", "_3d")) else 1
    n_dp = 2 if mode.endswith("_3d") else 1
    if mode.startswith("pp"):
        encode_fn = partial(pipeline.encode_pipeline,
                            mesh=pipeline.make_stage_mesh(
                                2, n_expert=n_ep, n_data=n_dp),
                            n_micro=2)
    else:
        encode_fn = partial(seq_parallel.encode_seq_parallel,
                            mesh=seq_parallel.make_seq_mesh(
                                2, n_expert=n_ep, n_data=n_dp))

    def loss_fn(p, fn):
        return seq2seq.apply_train(p, cfg, batch, rng=jax.random.PRNGKey(0),
                                   encode_fn=fn)

    (t0, per0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, None)
    (t1, per1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params,
                                                               encode_fn)
    np.testing.assert_allclose(float(t1), float(t0), rtol=1e-5)
    np.testing.assert_allclose(float(per1["moe_aux"]),
                               float(per0["moe_aux"]), rtol=1e-5)
    assert float(per1["moe_aux"]) > 0
    for (ks, a), (kp, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert ks == kp
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg=str(ks))

    # Eval forward (no aux machinery engaged) also tracks serial.
    attn_s, _, _ = seq2seq.encode(params, cfg, feats, lens)
    attn_p, _, _ = encode_fn(params, cfg, feats, lens)
    d = cfg.num_layers["char"]
    np.testing.assert_allclose(np.asarray(attn_p[d]), np.asarray(attn_s[d]),
                               rtol=1e-4, atol=5e-6)


def test_moe_cli_train_and_eval(tmp_path):
    """-moe_experts 2 -ep_shards 2 trains and greedy-evals through the CLI
    driver."""
    import glob
    import os

    from e2e_asr_tpu.cli.main import launch_eval, launch_train, parse_options
    from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus

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
    args = ["-data_dir", data_dir, "-vocab_dir", os.path.join(root, "vocab"),
            "-tb_dir", os.path.join(root, "models"),
            "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
            "-attn_vec_size", "4", "-lm_hsize", "8",
            "-feat_len", "8", "-max_out_char", "8",
            "-buck_batch_sizes", "4", "-steps_per_checkpoint", "3",
            "-max_epochs", "1", "-compute_dtype", "float32",
            "-encoder_type", "transformer", "-num_heads", "2",
            "-ffn_mult", "2", "-enc_subsample", "4", "-nlc", "2",
            "-moe_experts", "2", "-ep_shards", "2", "-run_id", "41"]
    cfg = parse_options(args)
    assert cfg.model.encoder.moe_experts == 2
    assert cfg.train.ep_shards == 2
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    launch_eval(parse_options(args + ["-dev"]))
    assert os.path.isfile(os.path.join(cfg.train.best_model_dir,
                                       "decoded_asr.txt"))


def test_moe_cli_ep_composes_with_pp(tmp_path):
    """-data_axis 2 -pp_stages 2 -ep_shards 2 -moe_experts 2 trains
    through the CLI on the full 3-D (data, stage, expert) mesh (all 8
    virtual devices) and the checkpoint greedy-evals serially."""
    import glob
    import os

    from e2e_asr_tpu.cli.main import launch_eval, launch_train, parse_options
    from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus

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
    args = ["-data_dir", data_dir, "-vocab_dir", os.path.join(root, "vocab"),
            "-tb_dir", os.path.join(root, "models"),
            "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
            "-attn_vec_size", "4", "-lm_hsize", "8",
            "-feat_len", "8", "-max_out_char", "8",
            "-buck_batch_sizes", "4", "-steps_per_checkpoint", "3",
            "-max_epochs", "1", "-compute_dtype", "float32",
            "-encoder_type", "transformer", "-num_heads", "2",
            "-ffn_mult", "2", "-enc_subsample", "4", "-nlc", "2",
            "-moe_experts", "2", "-ep_shards", "2", "-data_axis", "2",
            "-pp_stages", "2", "-pp_micro", "2", "-run_id", "42"]
    cfg = parse_options(args)
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    launch_eval(parse_options(args + ["-dev"]))
    assert os.path.isfile(os.path.join(cfg.train.best_model_dir,
                                       "decoded_asr.txt"))
