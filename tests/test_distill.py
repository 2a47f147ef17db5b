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
