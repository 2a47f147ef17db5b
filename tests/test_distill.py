"""Knowledge distillation (train/distill.py) + parameters.txt roundtrip."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu import config as config_lib
from e2e_asr_tpu.config import LMConfig
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import distill as distill_lib
from e2e_asr_tpu.train import step as step_lib
from tests.test_seq2seq import make_batch, tiny_cfg


def test_config_text_roundtrip():
    """config_to_text -> config_from_text is the identity on a full config
    built the CLI way."""
    from e2e_asr_tpu.cli.main import parse_options
    cfg = parse_options(["-dev", "-hsize", "12", "-nlc", "3",
                         "-tasks", "p", "-lm_prob", "0.1",
                         "-buck_batch_sizes", "8,4"])
    txt = config_lib.config_to_text(cfg)
    back = config_lib.config_from_text(txt)
    assert config_lib.config_to_text(back) == txt
    assert back.model.encoder.hidden_size == 12
    assert back.model.num_layers == cfg.model.num_layers
    assert back.train.buck_batch_size == [8, 4]


def test_distill_kl_zero_for_identical_models(rng):
    cfg = tiny_cfg()          # no dropout/sampling by default
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg)
    total, per_task = distill_lib.distill_loss(
        params, cfg, params, cfg, batch, rng=jax.random.PRNGKey(1),
        weight=0.7, temperature=2.0)
    assert float(per_task["distill"]) < 1e-9
    np.testing.assert_allclose(float(total),
                               0.3 * float(per_task["char"]), rtol=1e-5)


def test_distillation_training_approaches_teacher(rng):
    """Pure-KL training (w=1) against a fixed different-architecture teacher
    drives the KL down."""
    s_cfg = tiny_cfg()
    t_cfg = dataclasses.replace(
        tiny_cfg(), encoder=dataclasses.replace(tiny_cfg().encoder,
                                                hidden_size=10))
    student = seq2seq.init(jax.random.PRNGKey(0), s_cfg)
    teacher = seq2seq.init(jax.random.PRNGKey(7), t_cfg)
    batch = make_batch(rng, s_cfg)
    state = step_lib.create_state(student, s_cfg, LMConfig())
    asr_step, _ = step_lib.make_train_step(
        s_cfg, LMConfig(), distill=(t_cfg, teacher, 1.0, 1.0))
    first = None
    for i in range(12):
        state, metrics = asr_step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["loss_distill"])
    assert float(metrics["loss_distill"]) < 0.5 * first


def test_load_teacher_guards(tmp_path):
    with pytest.raises(FileNotFoundError):
        distill_lib.load_teacher(str(tmp_path), vocab_size=11)
    # parameters.txt present but wrong vocab.
    from e2e_asr_tpu.cli.main import parse_options
    cfg = parse_options(["-dev", "-tb_dir", str(tmp_path)])
    run = tmp_path / "run"
    run.mkdir()
    (run / "parameters.txt").write_text(config_lib.config_to_text(cfg) + "\n")
    with pytest.raises(ValueError):
        distill_lib.load_teacher(str(run),
                                 vocab_size=cfg.model.decoders["char"]
                                 .vocab_size + 5)


def _xf_cfg(depth=4):
    """Transformer-encoder student (pp/sp need the homogeneous block
    stack) — mirrors tests/test_pipeline._cfg."""
    from e2e_asr_tpu.config import DecoderConfig, EncoderConfig, Seq2SeqConfig
    return Seq2SeqConfig(
        tasks=["char"],
        num_layers={"char": depth},
        max_output={"char": 12},
        encoder=EncoderConfig(hidden_size=8, encoder_type="transformer",
                              num_heads=2, subsample=4, out_prob=1.0),
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=8, vocab_size=13,
            attention_vec_size=8, lm_hidden_size=8, out_prob_dec=1.0,
            samp_prob=0.0, max_output=12)},
        feat_length=8)


def _xf_batch(rng, B=8, T=32):
    feats = jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32))
    lens = jnp.asarray(rng.integers(T // 2, T + 1,
                                    size=(B,)).astype(np.int32))
    ids = rng.integers(3, 13, size=(B, 6)).astype(np.int32)
    ids[:, 0] = 1
    return {"logmel": feats, "logmel_len": lens, "char": jnp.asarray(ids),
            "char_len": jnp.full((B,), 5, jnp.int32)}


def _teacher_cfg():
    """Recurrent teacher sharing the student's feature dim and vocab (the
    only two things teacher and student must agree on)."""
    from e2e_asr_tpu.config import DecoderConfig, EncoderConfig, Seq2SeqConfig
    return Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 12},
        encoder=EncoderConfig(hidden_size=6, out_prob=1.0),
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=6, vocab_size=13,
            attention_vec_size=5, lm_hidden_size=8, samp_prob=0.0,
            out_prob_dec=1.0, max_output=12)},
        feat_length=8)


@pytest.mark.parametrize("mode", ["pp", "sp"])
def test_distill_under_pp_sp_matches_serial(rng, mode):
    """Round-4: the distill x pp/sp guard is lifted — the student encoder
    pipelines/seq-shards while the teacher stays serial; distill loss AND
    every gradient equal the serial run exactly."""
    from e2e_asr_tpu.core import pipeline, seq_parallel
    from e2e_asr_tpu.train.distill import distill_loss

    s_cfg = _xf_cfg()
    t_cfg = _teacher_cfg()                  # recurrent teacher, why not
    student = seq2seq.init(jax.random.PRNGKey(0), s_cfg)
    teacher = seq2seq.init(jax.random.PRNGKey(7), t_cfg)
    batch = _xf_batch(rng)

    if mode == "pp":
        from functools import partial
        mesh = pipeline.make_stage_mesh(2)
        encode_fn = partial(pipeline.encode_pipeline, mesh=mesh, n_micro=2)
    else:
        from functools import partial
        mesh = seq_parallel.make_seq_mesh(2)
        encode_fn = partial(seq_parallel.encode_seq_parallel, mesh=mesh)

    def loss(params, fn):
        total, _ = distill_loss(params, s_cfg, teacher, t_cfg, batch,
                                rng=jax.random.PRNGKey(1), weight=0.6,
                                temperature=2.0, encode_fn=fn)
        return total

    l_serial, g_serial = jax.value_and_grad(loss)(student, None)
    l_par, g_par = jax.value_and_grad(loss)(student, encode_fn)
    np.testing.assert_allclose(float(l_par), float(l_serial),
                               rtol=1e-6, atol=1e-7)
    flat_s = jax.tree_util.tree_leaves_with_path(g_serial)
    flat_p = jax.tree_util.tree_leaves_with_path(g_par)
    for (ks, a), (_, b) in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=1e-6, err_msg=str(ks))


def test_distill_step_builds_under_pp():
    """make_train_step no longer rejects distill + pp (the old
    NotImplementedError guard); one jitted step runs and is finite."""
    from e2e_asr_tpu.core import pipeline

    s_cfg = _xf_cfg()
    t_cfg = _teacher_cfg()
    student = seq2seq.init(jax.random.PRNGKey(0), s_cfg)
    teacher = seq2seq.init(jax.random.PRNGKey(7), t_cfg)
    rng_np = np.random.default_rng(0)
    batch = _xf_batch(rng_np)
    mesh = pipeline.make_stage_mesh(2)
    state = step_lib.create_state(student, s_cfg, LMConfig())
    asr_step, _ = step_lib.make_train_step(
        s_cfg, LMConfig(), distill=(t_cfg, teacher, 0.5, 2.0),
        pp_mesh=mesh, pp_micro=2)
    state, m = jax.jit(asr_step)(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    assert "distill" in {k.replace("loss_", "") for k in m}
