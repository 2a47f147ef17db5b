"""Whole-decode mega-kernel (ops/beam_megakernel.py) vs the beam oracle.

eval/beam.beam_decode is itself oracle-tested against a NumPy reference
implementation (tests/test_beam.py); these tests pin the mega-kernel to it
token-for-token across configs, penalties, and rigged-EOS edge cases.
Interpret mode on CPU (conftest forces E2E_ASR_NO_PALLAS for beam_decode's
own step path, so it runs pure XLA — a genuinely independent oracle).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import BeamConfig, DecoderConfig
from e2e_asr_tpu.eval import beam as beam_lib
from e2e_asr_tpu.models import attn_decoder
from e2e_asr_tpu.ops import beam_megakernel as bmk


def _cfg(**kw):
    base = dict(hidden_size_dec=8, emb_size=8, vocab_size=9,
                attention_vec_size=8, lm_hidden_size=8, samp_prob=0.0,
                out_prob_dec=1.0, max_output=8)
    base.update(kw)
    return DecoderConfig(**base)


def _setup(cfg, rng, B=2, T_enc=5, H_enc=8, key=3):
    params = attn_decoder.init(jax.random.PRNGKey(key), cfg, attn_size=H_enc)
    enc = jnp.asarray(rng.normal(size=(B, T_enc, H_enc)).astype(np.float32))
    lens = [T_enc] * B
    if B > 1:
        lens[-1] = T_enc - 2
    return params, enc, jnp.array(lens)


def _assert_same(B, a, b):
    (t0, l0, s0), (t1, l1, s1) = a, b
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for i in range(B):
        np.testing.assert_array_equal(np.asarray(t0[i][: int(l0[i])]),
                                      np.asarray(t1[i][: int(l1[i])]))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=1e-4, atol=1e-4)


VARIANTS = {
    "base": {},
    "deep": {"num_layers_dec": 2},
    "gru": {"use_lstm": False},
    "simple_proj": {"lm_hidden_size": 12},
    "gru_deep_proj": {"use_lstm": False, "num_layers_dec": 2,
                      "lm_hidden_size": 12},
}


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_mega_matches_beam_oracle(rng, variant):
    cfg = _cfg(**VARIANTS[variant])
    params, enc, enc_lens = _setup(cfg, rng)
    bc = BeamConfig(beam_size=3, max_steps=8)
    ref = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    got = bmk.beam_decode_mega(params, cfg, bc, enc, enc_lens)
    _assert_same(2, ref, got)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mega_many_seeds_b1(rng, seed):
    """B=1 (the serving case) across several random decoders."""
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, np.random.default_rng(seed), B=1,
                                   key=seed)
    bc = BeamConfig(beam_size=4, max_steps=8)
    ref = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    got = bmk.beam_decode_mega(params, cfg, bc, enc, enc_lens)
    _assert_same(1, ref, got)


def test_mega_word_ins_penalty(rng):
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, rng)
    bc = BeamConfig(beam_size=3, max_steps=8, word_ins_penalty=0.4)
    ref = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    got = bmk.beam_decode_mega(params, cfg, bc, enc, enc_lens)
    _assert_same(2, ref, got)


def test_mega_beam1(rng):
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, rng)
    bc = BeamConfig(beam_size=1, max_steps=8)
    ref = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    got = bmk.beam_decode_mega(params, cfg, bc, enc, enc_lens)
    _assert_same(2, ref, got)


def test_mega_eos_rigged(rng):
    """Decoder rigged to always emit <eos>: every slot finishes at step 1."""
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, rng, B=1)
    params = dict(params)
    params["output_proj"] = {
        "kernel": jnp.zeros_like(params["output_proj"]["kernel"]),
        "bias": jnp.zeros((cfg.vocab_size,)).at[2].set(50.0)}
    bc = BeamConfig(beam_size=4, max_steps=8)
    ref = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    got = bmk.beam_decode_mega(params, cfg, bc, enc, enc_lens)
    _assert_same(1, ref, got)
    assert int(got[1][0]) == 1          # [<eos>] only


def test_supported_gate():
    cfg = _cfg()
    params = attn_decoder.init(jax.random.PRNGKey(0), cfg, attn_size=8)
    bc = BeamConfig(beam_size=3, max_steps=8)
    assert bmk.supported(cfg, bc, params, T_enc=64, H_enc=8, B=1)
    # LM fusion and big batches fall back to the step-fused path.
    assert not bmk.supported(cfg, BeamConfig(beam_size=3, lm_weight=0.1),
                             params, T_enc=64, H_enc=8, B=1)
    assert not bmk.supported(cfg, bc, params, T_enc=64, H_enc=8, B=64)


def test_beam_decode_dispatches_to_mega(rng, monkeypatch):
    """beam_decode itself must route B<=2 no-LM decodes through the
    mega-kernel when Pallas is on (and produce identical results)."""
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, rng, B=1)
    bc = BeamConfig(beam_size=3, max_steps=8)
    ref = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    called = {}
    orig = bmk.beam_decode_mega

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(bmk, "beam_decode_mega", spy)
    got = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    assert called.get("yes")
    _assert_same(1, ref, got)
