"""Fused CTC prefix-scan kernel (ops/ctc_prefix_pallas.py) vs the XLA scan.

The kernel replaces CTCPrefixScorer.step's per-frame `lax.scan`; semantics
must be bit-compatible (same _lse formula, same NEG_INF conventions), so the
scorer's step outputs, selected states, and whole joint beam decodes are
compared between the two dispatch paths — interpret mode on CPU runs the
identical kernel code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.eval.ctc_prefix import CTCPrefixScorer
from e2e_asr_tpu.ops import ctc_prefix_pallas as cpp


@pytest.fixture(autouse=True)
def _enable_pallas(monkeypatch):
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)


def _force(monkeypatch, on: bool):
    if on:
        monkeypatch.setattr(cpp, "supported", lambda *a: True)
    else:
        monkeypatch.setattr(cpp, "supported", lambda *a: False)


def _rand_state(rng, B, k, T):
    """A plausible mid-decode scorer state (finite, some NEG_INF slots)."""
    rn = rng.normal(size=(B, k, T)).astype(np.float32) - 2.0
    rn[:, -1, :] = cpp.NEG_INF
    rb = rng.normal(size=(B, k, T)).astype(np.float32) - 2.0
    return {"rn": jnp.asarray(rn), "rb": jnp.asarray(rb),
            "psi": jnp.asarray(rng.normal(size=(B, k)).astype(np.float32)),
            "last": jnp.asarray(rng.integers(-1, 5, size=(B, k))
                                .astype(np.int32))}


@pytest.mark.parametrize("B,k,T,V,pre", [
    (2, 3, 9, 12, None),     # full vocab, T not a multiple of the S=8 block
    (2, 2, 16, 20, 5),       # pre-beam path (scatter back to V)
    (1, 4, 8, 7, None),      # exact block multiple
])
def test_step_outputs_match_scan(monkeypatch, B, k, T, V, pre):
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32))
    lens = jnp.asarray(rng.integers(2, T + 1, size=B).astype(np.int32))
    att = jnp.asarray(rng.normal(size=(B, k, V)).astype(np.float32))
    scorer = CTCPrefixScorer(logits, lens, pre_beam=pre)

    for state in (scorer.init_state(k), _rand_state(rng, B, k, T)):
        _force(monkeypatch, True)
        d_pal, c_pal = scorer.step(state, att)
        _force(monkeypatch, False)
        d_xla, c_xla = scorer.step(state, att)
        np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_xla),
                                   rtol=1e-5, atol=1e-4)
        for key in ("rn", "rb", "psi"):
            np.testing.assert_allclose(np.asarray(c_pal[key]),
                                       np.asarray(c_xla[key]),
                                       rtol=1e-5, atol=1e-4)
        # Selected states agree too (the values the next step consumes).
        parent = jnp.asarray(rng.integers(0, k, size=(B, k)), jnp.int32)
        P = c_pal["cand"].shape[-1]
        pos = rng.integers(0, P, size=(B, k, 1))
        token = jnp.asarray(np.take_along_axis(
            np.take_along_axis(np.asarray(c_pal["cand"]),
                               np.asarray(parent)[..., None], 1),
            pos, -1)[..., 0].astype(np.int32))
        s_pal = scorer.select(c_pal, parent, token)
        s_xla = scorer.select(c_xla, parent, token)
        for key in ("rn", "rb", "psi"):
            np.testing.assert_allclose(np.asarray(s_pal[key]),
                                       np.asarray(s_xla[key]),
                                       rtol=1e-5, atol=1e-4)


def test_joint_beam_decode_matches_scan(monkeypatch):
    """End-to-end: the full joint beam search decodes identically through
    the kernel and the scan (same tokens, lens, and scores)."""
    from e2e_asr_tpu.config import BeamConfig
    from e2e_asr_tpu.eval.beam import beam_decode
    from e2e_asr_tpu.models import hybrid, seq2seq
    from tests.test_seq2seq import make_batch, tiny_cfg

    cfg = tiny_cfg()
    params = hybrid.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(np.random.default_rng(1), cfg, B=2, T=16, T_dec=5)
    batch["logmel_len"] = jnp.array([16, 12])
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    depth = cfg.num_layers["char"]
    from e2e_asr_tpu.core.layers import dense
    ctc_logits = dense(params["ctc_head"], attn_states[depth])
    bc = BeamConfig(beam_size=3, max_steps=8, joint_ctc=0.4)

    def run():
        scorer = CTCPrefixScorer(ctc_logits, enc_lens[depth])
        return beam_decode(params["decoder_char"], cfg.decoders["char"], bc,
                           attn_states[depth], enc_lens[depth],
                           ctc_scorer=scorer)

    _force(monkeypatch, True)
    tok_p, len_p, sc_p = run()
    _force(monkeypatch, False)
    tok_x, len_x, sc_x = run()
    np.testing.assert_array_equal(np.asarray(tok_p), np.asarray(tok_x))
    np.testing.assert_array_equal(np.asarray(len_p), np.asarray(len_x))
    np.testing.assert_allclose(np.asarray(sc_p), np.asarray(sc_x),
                               rtol=1e-5, atol=1e-4)
