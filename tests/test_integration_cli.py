"""Full CLI integration: train -> resume/eval dev (greedy) -> beam eval, all
through `python -m e2e_asr_tpu.cli.main`-equivalent entry points on a
synthetic on-disk corpus. Mirrors the reference workflows of main.py."""
import glob
import os

import pytest

from e2e_asr_tpu.cli.main import launch_eval, launch_train, parse_options
from e2e_asr_tpu.data.synth import (make_vocab_dir, write_lm_corpus,
                                    write_speech_corpus)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir)
    make_vocab_dir(os.path.join(root, "vocab"))
    write_speech_corpus(os.path.join(data_dir, "train_1k.0.0001"), 12,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4)
    write_speech_corpus(os.path.join(data_dir, "dev.0001"), 6,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4, seed=2)
    write_speech_corpus(os.path.join(data_dir, "eval2000.0001"), 6,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4, seed=3)
    return root


def _args(root, extra=()):
    return ["-data_dir", os.path.join(root, "data"),
            "-vocab_dir", os.path.join(root, "vocab"),
            "-tb_dir", os.path.join(root, "models"),
            "-hsize", "8", "-hsize_dec", "8", "-emb_size", "8",
            "-attn_vec_size", "4", "-lm_hsize", "8",
            "-feat_len", "8", "-max_out_char", "8",
            "-buck_batch_sizes", "4",
            "-steps_per_checkpoint", "3", "-max_epochs", "1",
            "-compute_dtype", "float32", "-run_id", "9"] + list(extra)


@pytest.mark.smoke
def test_cli_train_then_eval(workspace):
    root = workspace
    cfg = parse_options(_args(root))
    assert cfg.train.buck_batch_size == [4]
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    assert os.path.isfile(os.path.join(cfg.train.train_dir, "parameters.txt"))

    # Greedy dev eval (beam_size 1, lm_weight 0 -> greedy path).
    cfg_dev = parse_options(_args(root, ["-dev"]))
    launch_eval(cfg_dev)
    assert os.path.isfile(os.path.join(cfg_dev.train.best_model_dir,
                                       "decoded_asr.txt"))

    # Beam dev eval.
    cfg_beam = parse_options(_args(root, ["-dev", "-beam_size", "2"]))
    launch_eval(cfg_beam)
    assert os.path.isfile(os.path.join(cfg_beam.train.best_model_dir,
                                       "raw_2.txt"))

    # Test-set (eval2000 glob) eval.
    cfg_test = parse_options(_args(root, ["-test", "-beam_size", "2"]))
    launch_eval(cfg_test)


def test_cli_beam_with_external_lm(workspace):
    """-lm_path pointing at a checkpoint from a DIFFERENTLY-SHAPED run must
    load via name-matching partial restore (beam_search.py:111-134 semantics;
    a strict full-state restore would raise on the encoder shape mismatch)."""
    root = workspace
    cfg = parse_options(_args(root))
    if not glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg)

    # Second run: wider encoder, same decoder (= same shared-LM shapes).
    cfg2 = parse_options(_args(root, ["-hsize", "12", "-run_id", "11"]))
    launch_train(cfg2)
    lm_ckpt = sorted(glob.glob(os.path.join(cfg2.train.train_dir,
                                            "asr.ckpt-*.npz")))[-1]

    cfg_beam = parse_options(_args(root, [
        "-dev", "-beam_size", "2", "-lm_weight", "0.05",
        "-lm_path", lm_ckpt]))
    launch_eval(cfg_beam)
    assert os.path.isfile(os.path.join(cfg_beam.train.best_model_dir,
                                       "raw_2.txt"))


def test_cli_multitask_gru(workspace, tmp_path):
    """Multitask (char+phone) with a GRU encoder through the CLI train path —
    exercises the non-default cell and aux-decoder wiring end to end."""
    root = workspace
    import e2e_asr_tpu.config as config_lib
    import argparse
    parser = argparse.ArgumentParser()
    config_lib.add_parse_options(parser)
    args = vars(parser.parse_args(_args(root, ["-tasks", "p", "-run_id", "10"])))
    cfg = config_lib.process_args(args, {"char": 37, "phone": 45})
    cfg.model.encoder.use_lstm = False  # GRU encoder
    cfg.train.max_epochs = 0
    from e2e_asr_tpu.train.loop import Trainer
    Trainer(cfg, use_mesh=False).train()  # epoch 0 only
    # (no assertion beyond "runs without error" — the per-layer math is
    # covered by unit tests; this guards the assembly.)


def test_cli_hybrid_ctc_attention(workspace):
    """-ctc_weight > 0 trains the hybrid family through the CLI (params are
    the seq2seq tree + ctc_head; eval decodes with the attention head as
    usual) and resumes/evaluates from its own run dir."""
    root = workspace
    extra = ["-ctc_weight", "0.3", "-run_id", "11", "-nlc", "2"]
    cfg = parse_options(_args(root, extra))
    assert cfg.model.ctc_weight == 0.3
    assert "ctc_w0.3_" in cfg.train.train_dir
    launch_train(cfg)
    ckpts = glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    assert ckpts
    import numpy as np
    with np.load(ckpts[0]) as z:
        assert any(k.startswith("params/ctc_head/") for k in z.files)

    cfg_dev = parse_options(_args(root, extra + ["-dev"]))
    launch_eval(cfg_dev)

    # Joint decoding: CTC-rescored attention beam (eval/rescore.py).
    launch_eval(parse_options(_args(root, extra + [
        "-dev", "-beam_size", "2", "-ctc_rescore", "0.3"])))

    # One-pass joint CTC/attention decoding (eval/ctc_prefix.py), full-vocab
    # and pre-beam-pruned.
    launch_eval(parse_options(_args(root, extra + [
        "-dev", "-beam_size", "2", "-joint_ctc", "0.3"])))
    launch_eval(parse_options(_args(root, extra + [
        "-dev", "-beam_size", "2", "-joint_ctc", "0.3",
        "-ctc_pre_beam", "6"])))

    # The two joint-decoding modes are mutually exclusive.
    with pytest.raises(ValueError):
        launch_eval(parse_options(_args(root, extra + [
            "-dev", "-beam_size", "2", "-ctc_rescore", "0.3",
            "-joint_ctc", "0.3"])))


def test_cli_pure_ctc_family(workspace):
    """-model_family ctc trains the encoder-only CTC recognizer through the
    CLI and evaluates with best-path (greedy) and prefix beam search."""
    root = workspace
    extra = ["-model_family", "ctc", "-run_id", "12", "-nlc", "2"]
    cfg = parse_options(_args(root, extra))
    assert cfg.model.model_family == "ctc"
    assert "ctcfam_" in cfg.train.train_dir
    launch_train(cfg)
    ckpts = glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    assert ckpts
    import numpy as np
    with np.load(ckpts[0]) as z:
        assert any(k.startswith("params/ctc_head/") for k in z.files)
        assert not any("decoder_char" in k for k in z.files)

    launch_eval(parse_options(_args(root, extra + ["-dev"])))
    launch_eval(parse_options(_args(root, extra + ["-dev", "-beam_size", "2"])))


def test_cli_ctc_beam_with_external_lm(workspace):
    """Pure-CTC eval with -lm_path/-lm_weight: the prefix beam fuses an
    external RNN-LM loaded from an attention-family checkpoint (whose
    decoder_char leaves ARE the shared LM, rnn_lm.shared_lm_params)."""
    root = workspace
    extra = ["-model_family", "ctc", "-run_id", "12", "-nlc", "2"]
    cfg = parse_options(_args(root, extra))
    if not glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg)
    cfg_lm_src = parse_options(_args(root))
    if not glob.glob(os.path.join(cfg_lm_src.train.train_dir,
                                  "asr.ckpt-*.npz")):
        launch_train(cfg_lm_src)
    lm_ckpt = sorted(glob.glob(os.path.join(cfg_lm_src.train.train_dir,
                                            "asr.ckpt-*.npz")))[-1]
    launch_eval(parse_options(_args(root, extra + [
        "-dev", "-beam_size", "2", "-lm_weight", "0.05",
        "-lm_path", lm_ckpt])))

    # Guard: fusion without a source LM is a hard error for this family.
    with pytest.raises(ValueError):
        launch_eval(parse_options(_args(root, extra + [
            "-dev", "-beam_size", "2", "-lm_weight", "0.05"])))


def test_cli_mwer_finetune(workspace):
    """-mwer resumes the CE run's own dir/optimizer state and runs the
    three-phase expected-WER step through the standard driver."""
    root = workspace
    cfg = parse_options(_args(root))
    if not glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg)
    cfg_mwer = parse_options(_args(root, ["-mwer", "-mwer_nbest", "2",
                                          "-max_epochs", "2"]))
    # Same run dir: MWER fine-tuning continues the CE checkpoint.
    assert cfg_mwer.train.train_dir == cfg.train.train_dir
    launch_train(cfg_mwer)

    with pytest.raises(ValueError):
        parse_options(_args(root, ["-mwer", "-model_family", "ctc"]))
    with pytest.raises(ValueError):
        parse_options(_args(root, ["-mwer", "-grad_accum", "2"]))


def test_cli_distillation(workspace):
    """-distill_dir: a smaller student trains against the teacher run's
    checkpointed posteriors (architecture re-read from the teacher's own
    parameters.txt)."""
    root = workspace
    teacher = parse_options(_args(root))
    if not glob.glob(os.path.join(teacher.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(teacher)
    student = parse_options(_args(root, [
        "-run_id", "13", "-hsize", "6",
        "-distill_dir", teacher.train.train_dir]))
    launch_train(student)
    assert glob.glob(os.path.join(student.train.train_dir, "asr.ckpt-*.npz"))

    with pytest.raises(ValueError):
        parse_options(_args(root, ["-distill_dir", "x", "-mwer"]))
    with pytest.raises(ValueError):
        parse_options(_args(root, ["-distill_dir", "x",
                                   "-model_family", "ctc"]))


def test_cli_contextual_biasing(workspace, tmp_path):
    """-boost_phrases/-boost_weight engage the biasing trie in the attention
    beam and in the CTC prefix beam (greedy dispatch must not swallow it)."""
    root = workspace
    cfg = parse_options(_args(root))
    if not glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg)
    boost = tmp_path / "boost.txt"
    boost.write_text("a b\nc\n")
    launch_eval(parse_options(_args(root, [
        "-dev", "-beam_size", "2", "-boost_phrases", str(boost),
        "-boost_weight", "0.5"])))
    # beam_size 1 + biasing still routes through the beam evaluator.
    launch_eval(parse_options(_args(root, [
        "-dev", "-boost_phrases", str(boost), "-boost_weight", "0.5"])))

    extra = ["-model_family", "ctc", "-run_id", "12", "-nlc", "2"]
    cfg_ctc = parse_options(_args(root, extra))
    if not glob.glob(os.path.join(cfg_ctc.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg_ctc)
    launch_eval(parse_options(_args(root, extra + [
        "-dev", "-beam_size", "2", "-boost_phrases", str(boost),
        "-boost_weight", "0.5"])))


def test_cli_nbest_output(workspace):
    """-nbest N writes rank/score/hypothesis lists for the attention beam
    and the family beams."""
    root = workspace
    cfg = parse_options(_args(root))
    if not glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg)
    cfg_nb = parse_options(_args(root, ["-dev", "-beam_size", "3",
                                        "-nbest", "3"]))
    launch_eval(cfg_nb)
    nb_path = os.path.join(cfg_nb.train.best_model_dir, "nbest_3.txt")
    assert os.path.isfile(nb_path)
    lines = [ln.split("\t") for ln in open(nb_path).read().splitlines()]
    assert lines and all(len(ln) == 4 for ln in lines)
    by_uid = {}
    for uid, rank, score, _ in lines:
        by_uid.setdefault(uid, []).append(float(score))
    for scores in by_uid.values():
        assert scores == sorted(scores, reverse=True)   # rank order = score order
        assert 1 <= len(scores) <= 3

    extra = ["-model_family", "ctc", "-run_id", "12", "-nlc", "2"]
    cfg_ctc = parse_options(_args(root, extra))
    if not glob.glob(os.path.join(cfg_ctc.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg_ctc)
    cfg_cnb = parse_options(_args(root, extra + ["-dev", "-nbest", "2"]))
    launch_eval(cfg_cnb)
    assert os.path.isfile(os.path.join(cfg_cnb.train.best_model_dir,
                                       "nbest_asr.txt"))


def test_cli_lm_rescore(workspace):
    """-lm_rescore w: second-pass LM rescoring of the beam n-best (tied LM
    when -lm_path is empty), composes with -nbest; guarded against
    combining with per-step fusion and against non-attention families."""
    root = workspace
    cfg = parse_options(_args(root))
    if not glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg)
    cfg_rs = parse_options(_args(root, ["-dev", "-beam_size", "2",
                                        "-lm_rescore", "0.3",
                                        "-nbest", "2"]))
    launch_eval(cfg_rs)
    nb_path = os.path.join(cfg_rs.train.best_model_dir, "nbest_2.txt")
    assert os.path.isfile(nb_path)
    by_uid = {}
    for ln in open(nb_path).read().splitlines():
        uid, rank, score, _ = ln.split("\t")
        by_uid.setdefault(uid, []).append(float(score))
    for scores in by_uid.values():
        assert scores == sorted(scores, reverse=True)

    with pytest.raises(ValueError, match="pick one"):
        launch_eval(parse_options(_args(root, [
            "-dev", "-beam_size", "2", "-lm_rescore", "0.3",
            "-lm_weight", "0.1"])))
    # The CTC/transducer families have no tied LM: rescoring needs -lm_path.
    with pytest.raises(ValueError, match="needs -lm_path"):
        launch_eval(parse_options(_args(root, [
            "-model_family", "ctc", "-nlc", "2", "-run_id", "12",
            "-dev", "-lm_rescore", "0.3"])))


def test_cli_ngram_fusion(workspace, tmp_path):
    """-lm_path pointing at a tools/train_ngram artifact fuses the trigram
    through the attention beam (and the CTC prefix beam) via the shared
    fusion hooks."""
    from e2e_asr_tpu.data import text as text_lib
    from e2e_asr_tpu.tools import train_ngram
    from e2e_asr_tpu.tools.prepare_corpus import write_lm_from_transcripts

    root = workspace
    cfg = parse_options(_args(root))
    if not glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg)
    vocab, _ = text_lib.initialize_vocabulary(
        os.path.join(root, "vocab", "char.vocab"))
    write_lm_from_transcripts(["abc ab", "abc de"] * 4, vocab,
                              str(tmp_path / "lm" / "lm.0001"))
    train_ngram.main(["-lm_glob", str(tmp_path / "lm" / "lm.*"),
                      "-vocab", os.path.join(root, "vocab", "char.vocab"),
                      "-out", str(tmp_path / "tri")])
    launch_eval(parse_options(_args(root, [
        "-dev", "-beam_size", "2", "-lm_weight", "0.1",
        "-lm_path", str(tmp_path / "tri.npz")])))

    extra = ["-model_family", "ctc", "-run_id", "12", "-nlc", "2"]
    cfg_ctc = parse_options(_args(root, extra))
    if not glob.glob(os.path.join(cfg_ctc.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg_ctc)
    launch_eval(parse_options(_args(root, extra + [
        "-dev", "-beam_size", "2", "-lm_weight", "0.1",
        "-lm_path", str(tmp_path / "tri.npz")])))


def test_cli_ctc_family_flag_guards(workspace):
    root = workspace
    with pytest.raises(ValueError):
        parse_options(_args(root, ["-model_family", "ctc", "-lm_prob", "0.1"]))
    with pytest.raises(ValueError):
        parse_options(_args(root, ["-model_family", "ctc",
                                   "-ctc_weight", "0.5"]))


def test_cli_transducer_family(workspace):
    """-model_family transducer trains the RNN-T recognizer through the CLI
    and evaluates with batched greedy and with the time-synchronous beam."""
    root = workspace
    extra = ["-model_family", "transducer", "-run_id", "14", "-nlc", "2",
             "-joint_dim", "8"]
    cfg = parse_options(_args(root, extra))
    assert cfg.model.model_family == "transducer"
    assert "rnnt_" in cfg.train.train_dir
    assert cfg.model.decoders["char"].joint_dim == 8
    launch_train(cfg)
    ckpts = glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    assert ckpts
    import numpy as np
    with np.load(ckpts[0]) as z:
        assert any(k.startswith("params/pred/") for k in z.files)
        assert any(k.startswith("params/joint/") for k in z.files)
        assert not any("decoder_char" in k for k in z.files)

    launch_eval(parse_options(_args(root, extra + ["-dev"])))
    launch_eval(parse_options(_args(root, extra + ["-dev", "-beam_size", "2"])))


def test_cli_transducer_family_flag_guards(workspace):
    root = workspace
    with pytest.raises(ValueError):
        parse_options(_args(root, ["-model_family", "transducer",
                                   "-lm_prob", "0.1"]))
    with pytest.raises(ValueError):
        parse_options(_args(root, ["-model_family", "transducer",
                                   "-ctc_weight", "0.5"]))


def test_cli_transformer_encoder_family(workspace):
    """-encoder_type transformer (+ conformer options) trains and evals
    through the CLI; run dir carries the xfmr tag."""
    root = workspace
    extra = ["-encoder_type", "transformer", "-num_heads", "2",
             "-ffn_mult", "2", "-enc_subsample", "4", "-rel_pos_bias",
             "-conv_kernel", "3", "-run_id", "13", "-nlc", "2"]
    cfg = parse_options(_args(root, extra))
    assert cfg.model.encoder.encoder_type == "transformer"
    assert "xfmr_2h_" in cfg.train.train_dir
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    launch_eval(parse_options(_args(root, extra + ["-dev"])))


def test_cli_pipeline_parallel_training(workspace):
    """-pp_stages 2 trains the transformer family with the block stack
    pipelined over a 2-device stage mesh; checkpoints land and a normal
    (serial) eval decodes them."""
    root = workspace
    extra = ["-encoder_type", "transformer", "-num_heads", "2",
             "-ffn_mult", "2", "-enc_subsample", "4", "-nlc", "2",
             "-pp_stages", "2", "-pp_micro", "2", "-run_id", "29"]
    cfg = parse_options(_args(root, extra))
    assert cfg.train.pp_stages == 2
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    launch_eval(parse_options(_args(root, extra + ["-dev"])))


def test_cli_sequence_parallel_training(workspace):
    """-sp_shards 2 trains the transformer family with activations sharded
    over time; a serial eval decodes the checkpoint."""
    root = workspace
    extra = ["-encoder_type", "transformer", "-num_heads", "2",
             "-ffn_mult", "2", "-enc_subsample", "4", "-nlc", "2",
             "-sp_shards", "2", "-run_id", "31"]
    cfg = parse_options(_args(root, extra))
    assert cfg.train.sp_shards == 2
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    launch_eval(parse_options(_args(root, extra + ["-dev"])))


def test_cli_eval_with_checkpoint_averaging(workspace):
    """-eval_avg_ckpts N evaluates the mean of the last N checkpoints."""
    root = workspace
    cfg = parse_options(_args(root))
    if not glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz")):
        launch_train(cfg)
    launch_eval(parse_options(_args(root, ["-dev", "-eval_avg_ckpts", "2"])))


def test_cli_train_async_ckpt(workspace):
    """-async_ckpt trains end-to-end: checkpoints appear (written by the
    background writer, drained at train end), pointer names a complete
    file, and a resume restores from it."""
    root = workspace
    cfg = parse_options(_args(root, ["-async_ckpt", "-run_id", "21"]))
    assert cfg.train.async_ckpt
    launch_train(cfg)
    ckpts = glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))
    assert ckpts
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    found = ckpt_lib.latest_path(cfg.train.train_dir)
    assert found is not None and os.path.isfile(found[0])
    # resume path: max_epochs already reached -> restores and exits cleanly
    launch_train(parse_options(_args(root, ["-async_ckpt", "-run_id", "21"])))


def test_cli_quantized_eval_and_transcribe(workspace):
    """-quantize int8 decodes through the standard eval CLI; the exported
    serving artifact (tools/quantize_ckpt.py) drives transcribe -int8_ckpt."""
    import numpy as np

    from e2e_asr_tpu.data.audio import write_wav
    from e2e_asr_tpu.tools import transcribe
    from e2e_asr_tpu.tools.quantize_ckpt import quantize_checkpoint

    root = workspace
    cfg = parse_options(_args(root))
    ckpts = sorted(glob.glob(os.path.join(cfg.train.train_dir,
                                          "asr.ckpt-*.npz")))
    if not ckpts:
        launch_train(cfg)
        ckpts = sorted(glob.glob(os.path.join(cfg.train.train_dir,
                                              "asr.ckpt-*.npz")))

    launch_eval(parse_options(_args(root, ["-dev", "-quantize", "int8"])))
    assert os.path.isfile(os.path.join(cfg.train.best_model_dir,
                                       "decoded_asr.txt"))

    art = os.path.join(root, "model.int8.npz")
    stats = quantize_checkpoint(ckpts[-1], art)
    assert stats["ratio"] < 0.2

    sr = 16000
    t = np.arange(int(1.6 * sr)) / sr
    wave = (np.sin(2 * np.pi * 440 * t) * 8000).astype(np.int16)
    wav_path = os.path.join(root, "q.wav")
    write_wav(wav_path, wave, sr)
    out = transcribe.main([
        wav_path, "-vocab_dir", os.path.join(root, "vocab"),
        "-tb_dir", os.path.join(root, "models"),
        "-int8_ckpt", art, "-window", "80", "-margin", "16",
        "-beam_size", "2", "-hsize", "8", "-hsize_dec", "8",
        "-emb_size", "8", "-attn_vec_size", "4", "-lm_hsize", "8",
        "-feat_len", "8", "-max_out_char", "8"])
    assert len(out) == 1 and isinstance(out[0], str)


def test_cli_ema_train_and_eval(workspace):
    """-ema_decay trains with EMA shadow weights in the checkpoint;
    -eval_ema decodes them (and differs from the raw-weights eval only in
    which params feed the same evaluator)."""
    import numpy as np

    root = workspace
    extra = ["-ema_decay", "0.9", "-run_id", "23"]
    cfg = parse_options(_args(root, extra))
    assert cfg.train.ema_decay == 0.9
    launch_train(cfg)
    ckpts = sorted(glob.glob(os.path.join(cfg.train.train_dir,
                                          "asr.ckpt-*.npz")))
    assert ckpts
    names = np.load(ckpts[-1]).files
    assert any(n.startswith("ema_params/") for n in names)
    # EMA leaves must lag their raw counterparts after training.
    arch = np.load(ckpts[-1])
    raw = arch["params/encoder/layer_1/fw/kernel"]
    ema = arch["ema_params/encoder/layer_1/fw/kernel"]
    assert not np.allclose(raw, ema)

    launch_eval(parse_options(_args(root, extra + ["-dev", "-eval_ema"])))
    out = os.path.join(cfg.train.best_model_dir, "decoded_asr.txt")
    assert os.path.isfile(out)
