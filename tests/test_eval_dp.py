"""Data-parallel evaluation (-data_axis at eval): decode batches shard over
a ("data",) mesh. Utterances are independent, so DP decoding must be EXACT —
same WER, same decoded text — not approximately equal."""
import os

import jax
import numpy as np
import pytest

from e2e_asr_tpu.config import (BeamConfig, DecoderConfig, EncoderConfig,
                                Seq2SeqConfig)
from e2e_asr_tpu.core import mesh as mesh_lib
from e2e_asr_tpu.eval.beam_eval import BeamEvaluator
from e2e_asr_tpu.eval.greedy import GreedyEvaluator
from e2e_asr_tpu.models import seq2seq


def _cfg(V=16):
    return Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 8},
        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=8, vocab_size=V,
            attention_vec_size=8, lm_hidden_size=8, samp_prob=0.0,
            out_prob_dec=1.0, max_output=8)},
        feat_length=8)


def _batches(rng, V=16, B=8, T=12, n=2):
    out = []
    for j in range(n):
        ids = rng.integers(3, V, size=(B, 6)).astype(np.int32)
        ids[:, 0] = 1
        out.append({
            "logmel": rng.normal(size=(B, T, 8)).astype(np.float32),
            "logmel_len": np.full((B,), T, np.int32),
            "char": ids,
            "char_len": np.full((B,), 5, np.int32),
            "valid": np.ones((B,), bool),
            "utt_ids": [f"utt{j}_{i}" for i in range(B)],
        })
    return out


def _read(path):
    with open(path) as f:
        return f.read()


@pytest.mark.parametrize("kind", ["greedy", "beam"])
def test_eval_dp_matches_serial(rng, kind, tmp_path):
    """GreedyEvaluator / BeamEvaluator with a {data:4} mesh produce the
    identical WER and byte-identical decoded artifacts as unsharded."""
    cfg = _cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    rev_vocab = ["<pad>", "<go>", "<eos>"] + [chr(97 + i) for i in range(13)]
    batches = _batches(rng)
    mesh = mesh_lib.make_mesh(n_data=4, n_model=1)

    def run(out_dir, mesh):
        if kind == "greedy":
            ev = GreedyEvaluator(cfg, rev_vocab, str(out_dir), mesh=mesh)
        else:
            ev = BeamEvaluator(cfg, BeamConfig(beam_size=3), rev_vocab,
                               str(out_dir), mesh=mesh)
        return ev(params, iter(batches))

    w_s = run(tmp_path / "serial", None)
    w_p = run(tmp_path / "dp", mesh)
    assert w_s == w_p
    name = "decoded_asr.txt" if kind == "greedy" else "raw_3.txt"
    assert _read(os.path.join(tmp_path, "serial", name)) == \
        _read(os.path.join(tmp_path, "dp", name))


def test_eval_dp_indivisible_batch_falls_back(rng, tmp_path):
    """A batch whose rows don't divide the data axis decodes unsharded
    (no crash, same outputs)."""
    cfg = _cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    rev_vocab = ["<pad>", "<go>", "<eos>"] + [chr(97 + i) for i in range(13)]
    batches = _batches(rng, B=6, n=1)        # 6 % 4 != 0
    mesh = mesh_lib.make_mesh(n_data=4, n_model=1)
    w_s = GreedyEvaluator(cfg, rev_vocab, str(tmp_path / "s"))(
        params, iter(batches))
    w_p = GreedyEvaluator(cfg, rev_vocab, str(tmp_path / "p"), mesh=mesh)(
        params, iter(batches))
    assert w_s == w_p


def test_eval_trainer_skips_training_parallelism_flags(tmp_path):
    """Eval (Trainer use_mesh=False) must not validate or build training
    parallelism meshes: an EP-trained model evals with -data_axis (the
    review-found crash), and a pp x dp x ep config evals on a host with
    fewer devices than training used."""
    import argparse

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
            "-tb_dir", os.path.join(root, "models"), "-hsize", "8",
            "-hsize_dec", "8", "-emb_size", "8", "-attn_vec_size", "4",
            "-lm_hsize", "8", "-feat_len", "8", "-max_out_char", "8",
            "-buck_batch_sizes", "4", "-compute_dtype", "float32",
            "-encoder_type", "transformer", "-num_heads", "2",
            "-ffn_mult", "2", "-enc_subsample", "4", "-nlc", "2",
            "-run_id", "55"]
    # EP model + eval data parallelism: previously raised "-ep_shards is
    # mutually exclusive with -data_axis".
    cfg = config_lib.process_args(vars(parser.parse_args(
        base + ["-moe_experts", "2", "-ep_shards", "2",
                "-data_axis", "4"])), {"char": 23})
    t = Trainer(cfg, use_mesh=False)
    assert t.mesh is None
    # 3-D training config on a "smaller host": needs 16 devices to train,
    # but eval must not build that mesh at all.
    cfg = config_lib.process_args(vars(parser.parse_args(
        base + ["-moe_experts", "2", "-ep_shards", "2", "-data_axis", "4",
                "-pp_stages", "2", "-pp_micro", "2"])), {"char": 23})
    t = Trainer(cfg, use_mesh=False)
    assert t.mesh is None
