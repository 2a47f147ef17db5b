"""CTC-rescored attention beam search (eval/rescore.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from e2e_asr_tpu.config import BeamConfig
from e2e_asr_tpu.eval import rescore
from e2e_asr_tpu.models import hybrid
from tests.test_seq2seq import make_batch, tiny_cfg


def _setup(rng, seed=0):
    cfg = tiny_cfg()
    params = hybrid.init(jax.random.PRNGKey(seed), cfg)
    batch = make_batch(rng, cfg, B=3, T=16, T_dec=5)
    batch["logmel_len"] = jnp.array([16, 13, 10])
    return cfg, params, batch


def test_weight_zero_equals_plain_beam(rng):
    """ctc_weight=0 must reproduce the plain beam selection exactly."""
    cfg, params, batch = _setup(rng)
    bc = BeamConfig(beam_size=3, max_steps=7)
    from e2e_asr_tpu.eval.beam import beam_decode
    from e2e_asr_tpu.models import seq2seq

    t0, l0, _ = rescore.ctc_rescore_decode(
        params, cfg, bc, batch["logmel"], batch["logmel_len"], ctc_weight=0.0)
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    d = cfg.num_layers["char"]
    t1, l1, _ = beam_decode(params["decoder_char"], cfg.decoders["char"], bc,
                            attn_states[d], enc_lens[d])
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for i in range(t0.shape[0]):
        np.testing.assert_array_equal(np.asarray(t0[i, :int(l0[i])]),
                                      np.asarray(t1[i, :int(l1[i])]))


def test_ctc_nbest_scores_match_direct_ctc_loss(rng):
    """Per-candidate scores must equal -optax.ctc_loss of the stripped
    label sequence."""
    cfg, params, batch = _setup(rng, seed=1)
    B, T, V = 2, 9, cfg.decoders["char"].vocab_size
    logits = jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32))
    enc_lens = jnp.array([9, 6])
    # Candidates: [tokens..., eos] padded; slot 1 of batch 0 is empty.
    seqs = jnp.array([[[4, 5, 6, 2, 0], [0, 0, 0, 0, 0]],
                      [[7, 2, 0, 0, 0], [8, 9, 2, 0, 0]]], jnp.int32)
    lens = jnp.array([[4, 0], [2, 3]], jnp.int32)
    out = rescore.ctc_nbest_scores(logits, enc_lens, seqs, lens)
    # Direct references.
    def direct(b, labels):
        L = len(labels)
        lab = jnp.zeros((1, 5), jnp.int32).at[0, :L].set(jnp.asarray(labels))
        lab_pad = (jnp.arange(5)[None, :] >= L).astype(jnp.float32)
        lp = (jnp.arange(T)[None, :]
              >= int(enc_lens[b])).astype(jnp.float32)
        return -float(optax.ctc_loss(logits[b:b + 1], lp, lab, lab_pad,
                                     blank_id=0)[0])
    np.testing.assert_allclose(float(out[0, 0]), direct(0, [4, 5, 6]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(out[1, 0]), direct(1, [7]), rtol=1e-5)
    np.testing.assert_allclose(float(out[1, 1]), direct(1, [8, 9]), rtol=1e-5)
    assert float(out[0, 1]) < -1e29      # empty slot is out


def test_rescoring_can_flip_the_choice(rng):
    """With ctc_weight=1 the pick must maximize the CTC score among
    candidates (verified against recomputed scores)."""
    cfg, params, batch = _setup(rng, seed=2)
    bc = BeamConfig(beam_size=3, max_steps=7)
    from e2e_asr_tpu.eval.beam import beam_decode
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.core.layers import dense

    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    d = cfg.num_layers["char"]
    (_, _, _), (seqs, lens, att) = beam_decode(
        params["decoder_char"], cfg.decoders["char"], bc,
        attn_states[d], enc_lens[d], return_nbest=True)
    logits = dense(params["ctc_head"], attn_states[d])
    cs = rescore.ctc_nbest_scores(logits, enc_lens[d], seqs, lens)
    expect = jnp.where(att <= -1e29, att, cs)
    t1, l1, s1 = rescore.ctc_rescore_decode(
        params, cfg, bc, batch["logmel"], batch["logmel_len"], ctc_weight=1.0)
    best = np.asarray(jnp.argmax(expect, axis=1))
    for i in range(seqs.shape[0]):
        np.testing.assert_array_equal(
            np.asarray(t1[i]), np.asarray(seqs[i, best[i]]))
