"""Minimum-WER sequence training (train/mwer.py): error counting, the
expected-error gradient's preference for lower-error candidates, n-best
decode contract, and the full three-phase stepper."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.data import text
from e2e_asr_tpu.models import attn_decoder, seq2seq
from e2e_asr_tpu.train import mwer as mwer_lib
from e2e_asr_tpu.config import LMConfig
from e2e_asr_tpu.train import step as step_lib
from tests.test_seq2seq import make_batch, tiny_cfg


def _seq_logprob(params, cfg, batch, seqs, lens):
    """Teacher-forced log P(candidate | x), the quantity MWER renormalizes."""
    dec_cfg = dataclasses.replace(cfg.decoders["char"], samp_prob=0.0,
                                  out_prob_dec=1.0)
    depth = cfg.num_layers["char"]
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    enc, el = attn_states[depth], enc_lens[depth]
    B, k, L = seqs.shape
    H = enc.shape[-1]
    enc_t = jnp.broadcast_to(enc[:, None], (B, k) + enc.shape[1:]).reshape(
        B * k, enc.shape[1], H)
    el_t = jnp.broadcast_to(el[:, None], (B, k)).reshape(B * k)
    dec_in = jnp.concatenate(
        [jnp.full((B * k, 1), text.GO_ID, jnp.int32),
         seqs.reshape(B * k, L)], axis=1).T
    logits = attn_decoder.apply_train(params["decoder_char"], dec_cfg,
                                      dec_in, enc_t, el_t,
                                      rng=jax.random.PRNGKey(0))
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(lp, dec_in[1:][:, :, None], axis=-1)[:, :, 0]
    mask = jnp.arange(L)[:, None] < lens.reshape(B * k)[None, :]
    return jnp.sum(tok * mask, axis=0).reshape(B, k)


def test_count_word_errors():
    # vocab: specials + ▁ a b
    rev = ["<pad>", "<go>", "<eos>", "▁", "a", "b"]
    # ref: "ab a"  (go, ▁ a b ▁ a, eos)
    refs = np.array([[1, 3, 4, 5, 3, 4, 2]], np.int32)
    seqs = np.zeros((1, 3, 8), np.int32)
    lens = np.zeros((1, 3), np.int32)
    valid = np.array([[True, True, False]])
    seqs[0, 0, :7] = [3, 4, 5, 3, 4, 2, 0]   # exact -> 0 errors
    lens[0, 0] = 6
    seqs[0, 1, :5] = [3, 4, 5, 3, 5]         # "ab b" -> 1 substitution
    lens[0, 1] = 5
    seqs[0, 2, :3] = [3, 5, 2]               # invalid slot -> ignored
    lens[0, 2] = 3
    errs = mwer_lib.count_word_errors(seqs, lens, valid, refs, rev)
    np.testing.assert_array_equal(errs[0], [0.0, 1.0, 0.0])


def test_mwer_gradient_prefers_lower_error_candidate(rng):
    """With two fixed candidates (errors 0 vs 3) and no CE anchor, MWER
    steps must grow the log-probability margin of the better candidate and
    shrink the expected error."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg, B=2, T=12, T_dec=5)
    state = step_lib.create_state(params, cfg, LMConfig())

    _, grad_step = mwer_lib.make_mwer_fns(cfg, nbest=2, ce_weight=0.0)
    L = 4
    seqs = jnp.asarray(np.array(
        [[[4, 5, 2, 0], [6, 7, 2, 0]],
         [[8, 3, 2, 0], [5, 5, 2, 0]]], np.int32))
    lens = jnp.full((2, 2), 3, jnp.int32)
    valid = jnp.ones((2, 2), bool)
    errors = jnp.asarray(np.array([[0.0, 3.0], [0.0, 3.0]], np.float32))

    lp0 = np.asarray(_seq_logprob(state.params, cfg, batch, seqs, lens))
    margin0 = lp0[:, 0] - lp0[:, 1]
    first_expected = None
    for i in range(8):
        state, metrics = grad_step(state, batch, seqs, lens, valid, errors,
                                   jax.random.PRNGKey(i))
        if first_expected is None:
            first_expected = float(metrics["mwer"])
    lp1 = np.asarray(_seq_logprob(state.params, cfg, batch, seqs, lens))
    margin1 = lp1[:, 0] - lp1[:, 1]
    assert np.all(margin1 > margin0), (margin0, margin1)
    assert float(metrics["mwer"]) < first_expected
    assert int(state.global_step) == 8


def test_mwer_all_invalid_rows_fall_back_to_ce(rng):
    """No finished candidates -> zero MWER term; the step is still finite
    and updates via CE."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(1), cfg)
    batch = make_batch(rng, cfg, B=2, T=12, T_dec=5)
    state = step_lib.create_state(params, cfg, LMConfig())
    _, grad_step = mwer_lib.make_mwer_fns(cfg, nbest=2, ce_weight=1.0)
    seqs = jnp.zeros((2, 2, 4), jnp.int32)
    lens = jnp.zeros((2, 2), jnp.int32)
    valid = jnp.zeros((2, 2), bool)
    errors = jnp.zeros((2, 2), jnp.float32)
    state2, metrics = grad_step(state, batch, seqs, lens, valid, errors,
                                jax.random.PRNGKey(0))
    assert float(metrics["mwer"]) == 0.0
    assert np.isfinite(float(metrics["loss"]))
    # CE gradient actually moved the params.
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        state2.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_decode_nbest_contract(rng):
    """Valid n-best slots are eos-terminated finished hypotheses."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(2), cfg)
    batch = make_batch(rng, cfg, B=2, T=12, T_dec=5)
    decode_nbest, _ = mwer_lib.make_mwer_fns(cfg, nbest=3)
    seqs, lens, valid = decode_nbest(params, batch["logmel"],
                                     batch["logmel_len"])
    assert seqs.shape[:2] == (2, 3) and lens.shape == (2, 3)
    s, l, v = np.asarray(seqs), np.asarray(lens), np.asarray(valid)
    for b in range(2):
        for j in range(3):
            if v[b, j]:
                assert s[b, j, l[b, j] - 1] == text.EOS_ID


def test_full_stepper_runs(rng):
    """The three-phase MWERStepper end to end on a synthetic batch."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(3), cfg)
    batch = make_batch(rng, cfg, B=2, T=12, T_dec=5)
    batch["valid"] = np.array([True, True])
    state = step_lib.create_state(params, cfg, LMConfig())
    rev = ["<pad>", "<go>", "<eos>"] + list("▁abcdefgh")
    stepper = mwer_lib.MWERStepper(cfg, rev, nbest=2, ce_weight=0.01)
    state2, metrics = stepper(state, batch, jax.random.PRNGKey(0))
    assert int(state2.global_step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert "mwer" in metrics


def test_mwer_respects_freeze(rng):
    """-freeze applies to the MWER grad step exactly as to the CE step."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(4), cfg)
    batch = make_batch(rng, cfg, B=2, T=12, T_dec=5)
    state = step_lib.create_state(params, cfg, LMConfig())
    _, grad_step = mwer_lib.make_mwer_fns(cfg, nbest=2, ce_weight=0.5,
                                          freeze=("encoder",))
    seqs = jnp.asarray(np.array(
        [[[4, 5, 2, 0], [6, 7, 2, 0]],
         [[8, 3, 2, 0], [5, 5, 2, 0]]], np.int32))
    lens = jnp.full((2, 2), 3, jnp.int32)
    valid = jnp.ones((2, 2), bool)
    errors = jnp.asarray(np.array([[0.0, 3.0], [0.0, 3.0]], np.float32))
    state2, _ = grad_step(state, batch, seqs, lens, valid, errors,
                          jax.random.PRNGKey(0))
    enc_moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["encoder"], state2.params["encoder"])
    dec_moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["decoder_char"], state2.params["decoder_char"])
    assert max(jax.tree_util.tree_leaves(enc_moved)) == 0.0
    assert max(jax.tree_util.tree_leaves(dec_moved)) > 0.0


# ------------------------------------------------------- transducer family

def _trans_cfg(vocab=11):
    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig,
                                    Seq2SeqConfig)
    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 6},
                        encoder=EncoderConfig(hidden_size=6, out_prob=1.0),
                        feat_length=4, model_family="transducer")
    cfg.decoders["char"] = DecoderConfig(hidden_size_dec=8, emb_size=6,
                                         vocab_size=vocab, joint_dim=8,
                                         out_prob_dec=1.0, max_output=6)
    return cfg


def _trans_seq_logprob(params, cfg, batch, seqs, lens):
    """Exact lattice-marginal log P(candidate | x), the quantity the
    transducer MWER posterior renormalizes."""
    from e2e_asr_tpu.core.transducer_loss import transducer_loss
    from e2e_asr_tpu.models import transducer
    depth = cfg.num_layers["char"]
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, batch["logmel"], batch["logmel_len"])
    enc, el = attn_states[depth], enc_lens[depth]
    B, k, L = seqs.shape
    H = enc.shape[-1]
    enc_t = jnp.broadcast_to(enc[:, None], (B, k) + enc.shape[1:]).reshape(
        B * k, enc.shape[1], H)
    el_t = jnp.broadcast_to(el[:, None], (B, k)).reshape(B * k)
    labels, lab_lens = seqs.reshape(B * k, L), lens.reshape(B * k)
    pred = transducer.pred_states(params["pred"], cfg, labels, lab_lens)
    blank_lp, label_lp = transducer.lattice_logprobs(params, labels, enc_t,
                                                     pred)
    return -transducer_loss(blank_lp, label_lp, el_t, lab_lens).reshape(B, k)


def test_transducer_mwer_gradient_prefers_lower_error_candidate(rng):
    """Transducer MWER (exact lattice-marginal scoring): steps must grow
    the log-marginal margin of the 0-error candidate over the 3-error one
    and shrink the expected error."""
    from e2e_asr_tpu.models import transducer
    cfg = _trans_cfg()
    params = transducer.init(jax.random.PRNGKey(0), cfg, vocab_size=11)
    batch = make_batch(rng, cfg, B=2, T=12, T_dec=5)
    state = step_lib.create_state(params, cfg, LMConfig())

    _, grad_step = mwer_lib.make_mwer_fns(cfg, nbest=2, ce_weight=0.0)
    seqs = jnp.asarray(np.array(
        [[[4, 5, 3, 0], [6, 7, 9, 0]],
         [[8, 3, 4, 0], [5, 5, 10, 0]]], np.int32))
    lens = jnp.full((2, 2), 3, jnp.int32)
    valid = jnp.ones((2, 2), bool)
    errors = jnp.asarray(np.array([[0.0, 3.0], [0.0, 3.0]], np.float32))

    lp0 = np.asarray(_trans_seq_logprob(state.params, cfg, batch, seqs, lens))
    margin0 = lp0[:, 0] - lp0[:, 1]
    first_expected = None
    for i in range(8):
        state, metrics = grad_step(state, batch, seqs, lens, valid, errors,
                                   jax.random.PRNGKey(i))
        if first_expected is None:
            first_expected = float(metrics["mwer"])
    lp1 = np.asarray(_trans_seq_logprob(state.params, cfg, batch, seqs, lens))
    margin1 = lp1[:, 0] - lp1[:, 1]
    assert np.all(margin1 > margin0), (margin0, margin1)
    assert float(metrics["mwer"]) < first_expected
    assert int(state.global_step) == 8


def test_transducer_full_stepper_runs(rng):
    """Three-phase transducer MWER stepper end to end (decode n-best ->
    host errors+dedup -> lattice-marginal grad step)."""
    from e2e_asr_tpu.models import transducer
    cfg = _trans_cfg()
    params = transducer.init(jax.random.PRNGKey(3), cfg, vocab_size=11)
    batch = make_batch(rng, cfg, B=2, T=12, T_dec=5)
    batch["valid"] = np.array([True, True])
    state = step_lib.create_state(params, cfg, LMConfig())
    rev = ["<pad>", "<go>", "<eos>"] + list("▁abcdefgh")
    stepper = mwer_lib.MWERStepper(cfg, rev, nbest=2, ce_weight=0.01)
    state2, metrics = stepper(state, batch, jax.random.PRNGKey(0))
    assert int(state2.global_step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert "mwer" in metrics


def test_dedup_candidates():
    """Duplicate label sequences keep only their first (best) slot; equal
    PREFIXES with different lengths are distinct."""
    seqs = np.zeros((1, 4, 5), np.int32)
    lens = np.array([[3, 3, 2, 3]], np.int32)
    valid = np.array([[True, True, True, True]])
    seqs[0, 0, :3] = [4, 5, 6]
    seqs[0, 1, :3] = [4, 5, 6]       # duplicate of slot 0
    seqs[0, 2, :2] = [4, 5]          # same prefix, shorter -> distinct
    seqs[0, 3, :3] = [4, 5, 7]
    out = mwer_lib.dedup_candidates(seqs, lens, valid)
    np.testing.assert_array_equal(out[0], [True, False, True, True])
    # Invalid slots never resurrect.
    valid2 = np.array([[False, True, True, True]])
    out2 = mwer_lib.dedup_candidates(seqs, lens, valid2)
    np.testing.assert_array_equal(out2[0], [False, True, True, True])
