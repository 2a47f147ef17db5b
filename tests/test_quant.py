"""Int8 weight-only quantization (core/quant.py): numeric bounds, decode
parity on a trained model, serving-artifact roundtrip. Extension — the
reference serves float32 TF checkpoints only."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import BeamConfig, LMConfig
from e2e_asr_tpu.core import checkpoint as ckpt_lib
from e2e_asr_tpu.core import quant
from e2e_asr_tpu.data import text
from e2e_asr_tpu.data.speech import SpeechDataset
from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus
from e2e_asr_tpu.eval.beam_eval import BeamEvaluator
from e2e_asr_tpu.eval.greedy import GreedyEvaluator
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as step_lib
from tests.test_e2e import small_model_cfg


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    """Tiny model trained far enough that transcripts are meaningful."""
    root = tmp_path_factory.mktemp("quant")
    data_path = str(root / "train_1k.0.0001.tfrecord")
    sizes = make_vocab_dir(str(root / "vocab"))
    write_speech_corpus(data_path, 10, feat_length=8, char_vocab=20,
                        min_tokens=3, max_tokens=6, frames_per_token=4,
                        noise=0.01)
    cfg = small_model_cfg(sizes["char"])
    ds = SpeechDataset([data_path], batch_size=10, feat_length=8,
                       is_training=False, tasks=("char",))
    _, rev_vocab = text.initialize_vocabulary(
        str(root / "vocab" / "char.vocab"))
    lm_cfg = LMConfig(vocab_size=sizes["char"], lm_hidden_size=16,
                      proj_size=16, emb_size=12)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step = jax.jit(step_lib.make_train_step(cfg, lm_cfg)[0])
    batch = next(iter(ds.epoch()))
    train_batch = {k: v for k, v in batch.items() if k != "utt_ids"}
    for i in range(500):
        state, _ = asr_step(state, train_batch, jax.random.PRNGKey(i))
    return cfg, lm_cfg, state, ds, rev_vocab, str(root)


def test_quantize_bounds_and_dtypes(rng):
    cfg = small_model_cfg(20)
    params = seq2seq.init(jax.random.PRNGKey(3), cfg)
    qs = quant.quantize(params)
    deq = quant.dequantize(qs)
    n_q = n_pass = 0
    for p, q, s, d in zip(jax.tree_util.tree_leaves(params),
                          jax.tree_util.tree_leaves(qs.q),
                          jax.tree_util.tree_leaves(qs.scale),
                          jax.tree_util.tree_leaves(deq)):
        p, q, s, d = map(np.asarray, (p, q, s, d))
        if p.ndim >= 2:
            n_q += 1
            assert q.dtype == np.int8
            # Symmetric rounding: |w - deq| <= scale/2 per output channel.
            assert np.all(np.abs(p - d) <= s / 2 + 1e-8), "quant error bound"
            # Scales are per-LAST-axis channel.
            assert s.shape[-1] == p.shape[-1] and s.size == p.shape[-1]
        else:
            n_pass += 1
            np.testing.assert_array_equal(p, d)  # passthrough untouched
    assert n_q > 0 and n_pass > 0


def test_maybe_dequantize_passthrough():
    cfg = small_model_cfg(20)
    params = seq2seq.init(jax.random.PRNGKey(3), cfg)
    out = quant.maybe_dequantize(params)
    assert out is params


def test_greedy_decode_parity(trained_setup):
    """Int8 transcripts on the trained tiny model == float transcripts
    (the QuantState flows through the SAME evaluator/jitted closure)."""
    cfg, _, state, ds, rev_vocab, root = trained_setup
    ev_f = GreedyEvaluator(cfg, rev_vocab, os.path.join(root, "out_f"))
    ev_q = GreedyEvaluator(cfg, rev_vocab, os.path.join(root, "out_q"))
    wer_f = ev_f(state.params, ds.epoch())
    wer_q = ev_q(quant.quantize(state.params), ds.epoch())
    assert wer_q == wer_f
    with open(os.path.join(root, "out_f", "decoded_asr.txt")) as f:
        ref = f.read()
    with open(os.path.join(root, "out_q", "decoded_asr.txt")) as f:
        hyp = f.read()
    assert hyp == ref


def test_beam_decode_parity(trained_setup):
    cfg, _, state, ds, rev_vocab, root = trained_setup
    beam_cfg = BeamConfig(beam_size=4, max_steps=16)
    ev_f = BeamEvaluator(cfg, beam_cfg, rev_vocab,
                         os.path.join(root, "beam_f"))
    ev_q = BeamEvaluator(cfg, beam_cfg, rev_vocab,
                         os.path.join(root, "beam_q"))
    wer_f = ev_f(state.params, ds.epoch())
    wer_q = ev_q(quant.quantize(state.params), ds.epoch())
    assert wer_q == wer_f


def test_beam_lm_fusion_over_quantized(trained_setup):
    """Shared-LM fusion (lm_weight > 0, no external LM) must derive the LM
    view from the DEQUANTIZED tree inside the jit — and match the float
    run's WER on the trained model."""
    cfg, _, state, ds, rev_vocab, root = trained_setup
    beam_cfg = BeamConfig(beam_size=4, max_steps=16, lm_weight=0.1)
    ev_f = BeamEvaluator(cfg, beam_cfg, rev_vocab,
                         os.path.join(root, "lm_f"))
    ev_q = BeamEvaluator(cfg, beam_cfg, rev_vocab,
                         os.path.join(root, "lm_q"))
    assert ev_q(quant.quantize(state.params), ds.epoch()) == \
        ev_f(state.params, ds.epoch())


def test_artifact_roundtrip(trained_setup, tmp_path):
    """quantize_ckpt exports from a real checkpoint; load_artifact rebuilds
    the exact QuantState against the model template; artifact is a fraction
    of the checkpoint (params-only + int8)."""
    from e2e_asr_tpu.tools.quantize_ckpt import quantize_checkpoint

    cfg, lm_cfg, state, ds, rev_vocab, root = trained_setup
    ckpt = ckpt_lib.save(str(tmp_path), "asr.ckpt", 1, state)
    art = str(tmp_path / "model.int8.npz")
    stats = quantize_checkpoint(ckpt, art)
    assert stats["ratio"] < 0.2  # no optimizer slots + int8 payloads

    qs = quant.load_artifact(art, state.params)
    ref = quant.quantize(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(qs.q),
                    jax.tree_util.tree_leaves(ref.q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(qs.scale),
                    jax.tree_util.tree_leaves(ref.scale)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Wrong-model template -> load fails loudly.
    bad = seq2seq.init(jax.random.PRNGKey(0), small_model_cfg(20, feat=12))
    with pytest.raises((KeyError, ValueError)):
        quant.load_artifact(art, bad)


def test_artifact_decodes(trained_setup, tmp_path):
    """The loaded artifact (not just in-memory quantization) decodes to the
    float transcripts end to end."""
    from e2e_asr_tpu.tools.quantize_ckpt import quantize_checkpoint

    cfg, _, state, ds, rev_vocab, root = trained_setup
    ckpt = ckpt_lib.save(str(tmp_path), "asr.ckpt", 1, state)
    art = str(tmp_path / "model.int8.npz")
    quantize_checkpoint(ckpt, art)
    qs = quant.load_artifact(art, state.params)
    ev = GreedyEvaluator(cfg, rev_vocab, os.path.join(root, "out_art"))
    ev_f = GreedyEvaluator(cfg, rev_vocab, os.path.join(root, "out_f2"))
    assert ev(qs, ds.epoch()) == ev_f(state.params, ds.epoch())
