"""Fused decoder-step kernels vs the plain XLA step (interpret mode)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import BeamConfig, DecoderConfig
from e2e_asr_tpu.data.text import GO_ID
from e2e_asr_tpu.eval import beam as beam_lib
from e2e_asr_tpu.models import attn_decoder
from e2e_asr_tpu.ops import dec_step_pallas as dsp


def _cfg(**kw):
    base = dict(hidden_size_dec=8, emb_size=8, vocab_size=9,
                attention_vec_size=8, lm_hidden_size=8, samp_prob=0.0,
                out_prob_dec=1.0, max_output=6)
    base.update(kw)
    return DecoderConfig(**base)


def _setup(rng, B=3, T_enc=5, H_enc=8, **cfg_kw):
    cfg = _cfg(**cfg_kw)
    params = attn_decoder.init(jax.random.PRNGKey(0), cfg, attn_size=H_enc)
    enc = jnp.asarray(rng.normal(size=(B, T_enc, H_enc)).astype(np.float32))
    enc_lens = jnp.array([T_enc] * (B - 1) + [T_enc - 2])
    return cfg, params, enc, enc_lens


# Previously-unsupported configs, now fused (round 3): deep decoders,
# SimpleProjection (lm_hidden != hidden), GRU, and combinations.
VARIANTS = {
    "base": {},
    "deep": {"num_layers_dec": 3},
    "simple_proj": {"lm_hidden_size": 12},
    "gru": {"use_lstm": False},
    "gru_deep_proj": {"use_lstm": False, "num_layers_dec": 2,
                      "lm_hidden_size": 12},
}


def test_supported_gate():
    # Every reference-flag config is fused now; the remaining gate is VMEM.
    for kw in VARIANTS.values():
        cfg = _cfg(**kw)
        p = attn_decoder.init(jax.random.PRNGKey(0), cfg, attn_size=8)
        assert dsp.supported(cfg, p), kw
    # A model whose resident weights exceed the VMEM budget is rejected.
    big = _cfg(hidden_size_dec=1024, emb_size=1024, lm_hidden_size=1024,
               num_layers_dec=4)
    p = attn_decoder.init(jax.random.PRNGKey(0), big, attn_size=1024)
    assert not dsp.supported(big, p)


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_cells_fused_matches_plain_step(rng, variant):
    cfg, params, enc, enc_lens = _setup(rng, **VARIANTS[variant])
    ctx = attn_decoder.make_attn_context(params, enc, enc_lens)
    state = attn_decoder.zero_state(cfg, 3, ctx)
    lm_input = params["embedding"][jnp.array([GO_ID] * 3)]

    # Plain step.
    new_state, logits = attn_decoder.step(params, cfg, ctx, state, lm_input)

    # Fused kernels (f32 for exact comparison).
    new_lm, new_dec, y = dsp.cells_fused(params, lm_input, state.context,
                                         state.lm_state, state.cell_states,
                                         use_lstm=cfg.use_lstm, bf16=False)
    if cfg.use_lstm:
        np.testing.assert_allclose(np.asarray(new_lm.c),
                                   np.asarray(new_state.lm_state.c),
                                   rtol=1e-5, atol=1e-6)
        for layer in range(cfg.num_layers_dec):
            np.testing.assert_allclose(
                np.asarray(new_dec[layer].c),
                np.asarray(new_state.cell_states[layer].c),
                rtol=1e-5, atol=1e-6)
        query = new_dec[-1].c
    else:
        np.testing.assert_allclose(np.asarray(new_lm),
                                   np.asarray(new_state.lm_state),
                                   rtol=1e-5, atol=1e-6)
        for layer in range(cfg.num_layers_dec):
            np.testing.assert_allclose(
                np.asarray(new_dec[layer]),
                np.asarray(new_state.cell_states[layer]),
                rtol=1e-5, atol=1e-6)
        query = new_dec[-1]
    logp = dsp.output_fused(params, cfg, query,
                            new_state.context, bf16=False)
    want = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_greedy_fused_matches_plain(rng, monkeypatch, variant):
    """apply_infer with the fused path must emit the same token sequence as
    the XLA path."""
    cfg, params, enc, enc_lens = _setup(rng, **VARIANTS[variant])
    go = jnp.array([GO_ID] * 3, dtype=jnp.int32)
    _, ids_plain = attn_decoder.apply_infer(params, cfg, go, enc, enc_lens,
                                            max_output=6)
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    _, ids_fused = attn_decoder.apply_infer(params, cfg, go, enc, enc_lens,
                                            max_output=6)
    np.testing.assert_array_equal(np.asarray(ids_plain), np.asarray(ids_fused))


@pytest.mark.parametrize("variant", ["deep", "gru_deep_proj"])
def test_beam_fused_deep_matches_plain(rng, monkeypatch, variant):
    """Beam search through the fused path for the newly covered configs."""
    cfg, params, enc, enc_lens = _setup(rng, **VARIANTS[variant])
    beam_cfg = BeamConfig(beam_size=3, max_steps=6)
    t0, l0, s0 = beam_lib.beam_decode(params, cfg, beam_cfg, enc, enc_lens)
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    t1, l1, s1 = beam_lib.beam_decode(params, cfg, beam_cfg, enc, enc_lens)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for b in range(3):
        np.testing.assert_array_equal(np.asarray(t0[b][: int(l0[b])]),
                                      np.asarray(t1[b][: int(l1[b])]))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4,
                               atol=1e-4)


def test_beam_fused_attn_kernel_matches_plain(rng, monkeypatch):
    """The opt-in fused attention+output kernel (E2E_ASR_FUSED_ATTN) must
    produce the same beam results as the XLA-attention fused path."""
    cfg, params, enc, enc_lens = _setup(rng)
    beam_cfg = BeamConfig(beam_size=3, max_steps=6)
    t0, l0, s0 = beam_lib.beam_decode(params, cfg, beam_cfg, enc, enc_lens)
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    monkeypatch.setenv("E2E_ASR_FUSED_ATTN", "1")
    t1, l1, s1 = beam_lib.beam_decode(params, cfg, beam_cfg, enc, enc_lens)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for b in range(3):
        np.testing.assert_array_equal(np.asarray(t0[b][: int(l0[b])]),
                                      np.asarray(t1[b][: int(l1[b])]))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4,
                               atol=1e-4)


def test_beam_fused_matches_plain(rng, monkeypatch):
    cfg, params, enc, enc_lens = _setup(rng)
    beam_cfg = BeamConfig(beam_size=3, max_steps=6)
    t0, l0, s0 = beam_lib.beam_decode(params, cfg, beam_cfg, enc, enc_lens)
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    t1, l1, s1 = beam_lib.beam_decode(params, cfg, beam_cfg, enc, enc_lens)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for b in range(3):
        np.testing.assert_array_equal(np.asarray(t0[b][: int(l0[b])]),
                                      np.asarray(t1[b][: int(l1[b])]))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4,
                               atol=1e-4)
