"""CLI / config tests: flag parsing, run-dir naming, parameters.txt, eval
dispatch plumbing."""
import os

import pytest

from e2e_asr_tpu import config as config_lib
from e2e_asr_tpu.data.synth import make_vocab_dir


def test_run_dir_naming_matches_reference_scheme():
    """main.py:62-87: directory name encodes the config."""
    opts = {"tasks": ["char"], "skip_step": 2, "use_lstm": True,
            "stack_cons": 1, "initial_res_fac": 1, "num_layers_dec": 1,
            "lm_prob": 0.0, "run_id": 5, "avg": False}
    assert config_lib.get_run_dir_name(opts) == "skip_2_lstm_lm_prob_0.0_run_id_5"

    opts_multi = dict(opts, tasks=["char", "phone"], num_layers_phone=3,
                      avg=True, num_layers_dec=2, stack_cons=3)
    name = config_lib.get_run_dir_name(opts_multi)
    assert name == ("skip_2_phone_3_lstm_stack_3_char_dec_dep_2_"
                    "lm_prob_0.0_run_id_5_avg_")


def test_parse_tasks():
    assert config_lib.parse_tasks("") == ["char"]
    assert config_lib.parse_tasks("p") == ["char", "phone"]


def test_process_args_full(tmp_path):
    import argparse
    parser = argparse.ArgumentParser()
    config_lib.add_parse_options(parser)
    args = vars(parser.parse_args([
        "-tasks", "p", "-hsize", "128", "-run_id", "3",
        "-tb_dir", str(tmp_path), "-lm_prob", "0.2", "-avg",
        "-num_layers_dec", "2"]))
    args["tasks"] = args.get("tasks", "")
    cfg = config_lib.process_args(args, {"char": 37, "phone": 45})
    assert cfg.model.tasks == ["char", "phone"]
    assert cfg.model.encoder.hidden_size == 128
    assert cfg.model.num_layers == {"char": 4, "phone": 3}
    assert cfg.model.decoders["char"].vocab_size == 37
    assert cfg.model.decoders["char"].num_layers_dec == 2
    # Aux decoders forced shallow (main.py:127-131).
    assert cfg.model.decoders["phone"].num_layers_dec == 1
    assert cfg.model.decoders["phone"].vocab_size == 45
    assert cfg.model.decoders["phone"].max_output == 250
    assert cfg.train.lm_prob == 0.2
    assert cfg.model.avg is True
    assert "run_id_3" in cfg.train.train_dir
    assert "best_models" in cfg.train.best_model_dir


def test_cli_parse_writes_parameters_txt(tmp_path):
    from e2e_asr_tpu.cli.main import parse_options
    vocab_dir = str(tmp_path / "vocab")
    make_vocab_dir(vocab_dir)
    cfg = parse_options(["-tb_dir", str(tmp_path / "models"),
                         "-vocab_dir", vocab_dir, "-run_id", "7"])
    assert os.path.isfile(os.path.join(cfg.train.train_dir, "parameters.txt"))
    content = open(os.path.join(cfg.train.train_dir, "parameters.txt")).read()
    assert "hidden_size" in content
    # Vocab sizes picked up from files.
    assert cfg.model.decoders["char"].vocab_size == 3 + 34


def test_type_guard_override():
    """base_params.py:22-28: only same-type options override defaults."""
    from e2e_asr_tpu.config import EncoderConfig
    cfg = config_lib._from_options(EncoderConfig,
                                   {"hidden_size": "not-an-int",
                                    "skip_step": 3})
    assert cfg.hidden_size == 256  # guarded
    assert cfg.skip_step == 3


def test_gru_flag_reaches_configs():
    """-gru (extension) selects GRU everywhere; the reference's -use_lstm is
    store_true and can never turn LSTM off from its CLI."""
    import argparse

    from e2e_asr_tpu import config as config_lib

    parser = argparse.ArgumentParser()
    config_lib.add_parse_options(parser)
    cfg = config_lib.process_args(vars(parser.parse_args(["-gru"])))
    assert not cfg.model.encoder.use_lstm
    assert all(not d.use_lstm for d in cfg.model.decoders.values())
    # run-dir name drops the "lstm_" segment, like use_lstm=False would.
    assert "lstm_" not in cfg.train.train_dir
    cfg2 = config_lib.process_args(vars(parser.parse_args([])))
    assert cfg2.model.encoder.use_lstm and "lstm_" in cfg2.train.train_dir
