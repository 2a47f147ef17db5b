"""Transformer attention decoder (models/transformer_decoder.py):
incremental-vs-parallel parity, beam-search oracle equality, greedy/beam
equivalence, family integration (seq2seq / hybrid / longform anchors), and
config guards."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import (BeamConfig, DecoderConfig, EncoderConfig,
                                Seq2SeqConfig, process_args)
from e2e_asr_tpu.data.text import EOS_ID, GO_ID
from e2e_asr_tpu.eval import beam as beam_lib
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.models import transformer_decoder as td

V = 11


def _cfg(**kw):
    base = dict(decoder_type="transformer", hidden_size_dec=16,
                num_layers_dec=2, dec_heads=2, dec_ffn_mult=2, vocab_size=V,
                samp_prob=0.0, out_prob_dec=1.0, max_output=12)
    base.update(kw)
    return DecoderConfig(**base)


def _setup(cfg, B=2, T_enc=7, H_enc=12, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = td.init(ks[0], cfg, attn_size=H_enc)
    enc = jax.random.normal(ks[1], (B, T_enc, H_enc))
    enc_lens = jnp.array(([T_enc, T_enc - 3] * B)[:B])
    return params, enc, enc_lens


def _prefix_logp(params, cfg, enc_b, enc_len_b, prefix):
    """log p(v | prefix) for every v, via one teacher-forced parallel pass
    over <go> + prefix — the training-path forward, so beam steps are checked
    against an INDEPENDENT computation."""
    ids = jnp.asarray([[GO_ID] + list(prefix)], jnp.int32)   # [1, L+1]
    pos = jnp.asarray(td._sinusoidal(ids.shape[1], cfg.hidden_size_dec))
    x = params["embedding"][ids] + pos[None]
    mask = (jnp.arange(enc_b.shape[1])[None, :]
            < jnp.asarray([[enc_len_b]])).astype(jnp.float32)
    logits, _ = td._full_forward(params, cfg, x, enc_b, mask)
    return np.asarray(jax.nn.log_softmax(logits[0, -1], -1))


def oracle_beam(params, cfg, beam_cfg, enc_b, enc_len_b):
    """Python-loop shrinking beam scored by teacher-forced replays."""
    k = beam_cfg.beam_size
    live = [([], 0.0)]
    finished = []
    for t in range(beam_cfg.max_steps):
        if k <= 0 or not live:
            break
        cands = []
        for seq, score in live:
            lp = _prefix_logp(params, cfg, enc_b, enc_len_b, seq)
            for v in range(V):
                cands.append((score + lp[v], v, seq))
        cands.sort(key=lambda c: -c[0])
        new_live = []
        for val, v, seq in cands[:k]:
            stored = val + beam_cfg.word_ins_penalty * (t + 1)
            if v == EOS_ID:
                finished.append((seq + [v], stored))
                k -= 1
            else:
                new_live.append((seq + [v], stored))
        live = new_live[:k] if k > 0 else []
    all_out = finished + live
    return max(all_out, key=lambda x: x[1])


def test_incremental_equals_parallel():
    """KV-cache step-by-step decode == the teacher-forced parallel forward."""
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, B=3, T_enc=9, H_enc=10)
    T = 7
    ids = jax.random.randint(jax.random.PRNGKey(7), (T, 3), 0, V)
    logits = td.apply_train(params, cfg, ids, enc, enc_lens,
                            rng=jax.random.PRNGKey(0))       # [T-1, B, V]
    full_lp = jax.nn.log_softmax(logits, -1)

    xctx = td.make_cross_ctx(params, cfg, enc, enc_lens)
    caches = td.zero_caches(cfg, (3, 1), T - 1)
    emb = params["embedding"]
    for t in range(T - 1):
        caches, ctxv, alpha, logp = td.step_beam(
            params, cfg, xctx, caches, emb[ids[t]][:, None], jnp.int32(t))
        np.testing.assert_allclose(np.asarray(logp[:, 0]),
                                   np.asarray(full_lp[t]), atol=1e-5)
        # alpha rows are normalized over valid encoder frames only
        a = np.asarray(alpha[:, 0])
        np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
        assert np.all(a[1, int(enc_lens[1]):] < 1e-8)


@pytest.mark.parametrize("beam_size", [1, 3])
def test_beam_matches_teacher_forced_oracle(beam_size):
    cfg = _cfg()
    beam_cfg = BeamConfig(beam_size=beam_size, max_steps=8)
    params, enc, enc_lens = _setup(cfg)
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, beam_cfg, enc,
                                                enc_lens)
    for b in range(2):
        seq, score = oracle_beam(params, cfg, beam_cfg, enc[b:b + 1],
                                 int(enc_lens[b]))
        got = list(np.asarray(tokens[b][: int(lens[b])]))
        assert got == seq, (got, seq)
        np.testing.assert_allclose(float(scores[b]), score, rtol=1e-4,
                                   atol=1e-4)


def test_greedy_equals_beam_k1():
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, B=2, T_enc=8)
    ids = td.apply_infer_early(params, cfg,
                               jnp.full((2,), GO_ID, jnp.int32), enc,
                               enc_lens, max_output=10)       # [T, B]
    tokens, lens, _ = beam_lib.beam_decode(
        params, cfg, BeamConfig(beam_size=1, max_steps=10), enc, enc_lens)
    for b in range(2):
        g = list(np.asarray(ids[:, b]))
        g = g[: g.index(EOS_ID) + 1] if EOS_ID in g else g
        assert g == list(np.asarray(tokens[b][: int(lens[b])]))


def test_apply_infer_early_matches_apply_infer():
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, B=3, T_enc=8, seed=4)
    _, ids_full = td.apply_infer(params, cfg,
                                 jnp.full((3,), GO_ID, jnp.int32), enc,
                                 enc_lens, max_output=9)
    ids_early = td.apply_infer_early(params, cfg,
                                     jnp.full((3,), GO_ID, jnp.int32), enc,
                                     enc_lens, max_output=9)
    for b in range(3):
        f = list(np.asarray(ids_full[:, b]))
        e = list(np.asarray(ids_early[:, b]))
        f = f[: f.index(EOS_ID) + 1] if EOS_ID in f else f
        e = e[: e.index(EOS_ID) + 1] if EOS_ID in e else e
        assert f == e


def test_encoder_padding_invariance():
    """Extra encoder padding frames must not change decodes (cross-attention
    is masked by enc_lens)."""
    cfg = _cfg()
    params, enc, _ = _setup(cfg, B=1, T_enc=6)
    enc_lens = jnp.array([6])
    padded = jnp.concatenate([enc, jnp.ones((1, 4, enc.shape[-1]))], axis=1)
    bc = BeamConfig(beam_size=2, max_steps=8)
    t1, l1, s1 = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    t2, l2, s2 = beam_lib.beam_decode(params, cfg, bc, padded, enc_lens)
    assert list(np.asarray(t1[0][:int(l1[0])])) == \
        list(np.asarray(t2[0][:int(l2[0])]))
    np.testing.assert_allclose(float(s1[0]), float(s2[0]), atol=1e-5)


def test_lm_fusion_and_cov_penalty_engage():
    from e2e_asr_tpu.core import cells
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    lm_params = {
        "embedding": jax.random.uniform(k1, (V, 8), minval=-1, maxval=1),
        "lstm": cells.lstm_init(k2, 8, 8),
        "output_proj": {"kernel": jax.random.normal(k3, (8, V)) * 0.2,
                        "bias": jnp.zeros((V,))},
    }
    base = BeamConfig(beam_size=3, max_steps=8)
    _, _, s0 = beam_lib.beam_decode(params, cfg, base, enc, enc_lens)
    _, _, s_lm = beam_lib.beam_decode(
        params, cfg, dataclasses.replace(base, lm_weight=0.4), enc, enc_lens,
        lm_params=lm_params)
    assert not np.allclose(np.asarray(s0), np.asarray(s_lm))
    _, _, s_cov = beam_lib.beam_decode(
        params, cfg, dataclasses.replace(base, apply_cov_penalty=True,
                                         cov_penalty=0.5), enc, enc_lens)
    assert not np.allclose(np.asarray(s0), np.asarray(s_cov))


def test_scheduled_sampling_two_pass():
    """samp_prob=1 must change the training logits vs teacher forcing (the
    two-pass path engages); samp_prob=0 is the plain single pass."""
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, B=2)
    ids = jax.random.randint(jax.random.PRNGKey(3), (6, 2), 3, V)
    rng = jax.random.PRNGKey(11)
    l0 = td.apply_train(params, cfg, ids, enc, enc_lens, rng=rng)
    l1 = td.apply_train(params, dataclasses.replace(cfg, samp_prob=1.0),
                        ids, enc, enc_lens, rng=rng)
    assert l0.shape == l1.shape == (5, 2, V)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
    # Position 0's input is always <go>+gt, so its logits agree.
    np.testing.assert_allclose(np.asarray(l0[0]), np.asarray(l1[0]),
                               atol=1e-5)


def _tiny_model_cfg():
    enc = EncoderConfig(hidden_size=8, out_prob=1.0, skip_step=2,
                        max_scaling_down=2)
    dec = _cfg(hidden_size_dec=16, num_layers_dec=1)
    return Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                         max_output={"char": 10}, encoder=enc,
                         decoders={"char": dec}, feat_length=6)


def test_seq2seq_family_trains_and_decodes():
    """Full family integration: init -> CE drops under Adam -> greedy decode
    emits the overfit target."""
    import optax
    cfg = _tiny_model_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    B, T = 4, 16
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, T, 6))
    tgt = jnp.tile(jnp.asarray([[GO_ID, 5, 7, 5, EOS_ID]], jnp.int32),
                   (B, 1))
    batch = {"logmel": feats, "logmel_len": jnp.full((B,), T),
             "char": tgt, "char_len": jnp.full((B,), 4)}

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            total, _ = seq2seq.apply_train(p, cfg, batch, rng=rng)
            return total
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    rng = jax.random.PRNGKey(2)
    for i in range(60):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses[::10]

    ids = seq2seq.apply_greedy(params, cfg, feats, batch["logmel_len"])
    out = list(np.asarray(ids[0]))
    out = out[: out.index(EOS_ID) + 1] if EOS_ID in out else out
    assert out == [5, 7, 5, EOS_ID], out


def test_hybrid_ctc_attention_with_transformer_decoder():
    from e2e_asr_tpu.models import hybrid
    cfg = dataclasses.replace(_tiny_model_cfg(), ctc_weight=0.3)
    params = hybrid.init(jax.random.PRNGKey(0), cfg)
    B, T = 2, 12
    batch = {
        "logmel": jax.random.normal(jax.random.PRNGKey(1), (B, T, 6)),
        "logmel_len": jnp.full((B,), T),
        "char": jnp.tile(jnp.asarray([[GO_ID, 5, 7, EOS_ID]], jnp.int32),
                         (B, 1)),
        "char_len": jnp.full((B,), 3),
        "labels": jnp.tile(jnp.asarray([[5, 7]], jnp.int32), (B, 1)),
        "label_lens": jnp.full((B,), 2),
    }
    total, metrics = hybrid.loss(params, cfg, batch, ctc_weight=0.3,
                                 rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(total))
    assert {"attention", "ctc", "char"} <= set(metrics)


def test_cross_decoder_distillation(rng=None):
    """Distillation across decoder types: an RNN-decoder teacher's char
    logits train a transformer-decoder student (and vice versa) — the
    decoder_type field round-trips parameters.txt, and distill_loss
    dispatches per model."""
    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.train import distill as distill_lib
    from e2e_asr_tpu.train import step as step_lib
    from tests.test_seq2seq import make_batch, tiny_cfg

    t_cfg = tiny_cfg()                           # RNN decoder teacher
    s_cfg = _xf_decoders(tiny_cfg(), num_layers_dec=1)
    # decoder_type survives the parameters.txt roundtrip (how the CLI
    # reloads a teacher's architecture).
    back = config_lib.config_from_text(config_lib.config_to_text(
        config_lib.ExperimentConfig(model=s_cfg)))
    assert back.model.decoders["char"].decoder_type == "transformer"

    teacher = seq2seq.init(jax.random.PRNGKey(7), t_cfg)
    student = seq2seq.init(jax.random.PRNGKey(0), s_cfg)
    batch = make_batch(np.random.default_rng(0), s_cfg)
    state = step_lib.create_state(student, s_cfg, LMConfig())
    asr_step, _ = step_lib.make_train_step(
        s_cfg, LMConfig(), distill=(t_cfg, teacher, 1.0, 1.0))
    first = last = None
    for i in range(12):
        state, metrics = asr_step(state, batch, jax.random.PRNGKey(i))
        kl = float(metrics["loss_distill"])
        first = kl if first is None else first
        last = kl
    assert np.isfinite(last) and last < first, (first, last)
    # and the reverse direction type-checks through distill_loss directly
    total, per_task = distill_lib.distill_loss(
        teacher, t_cfg, student, s_cfg, batch, rng=jax.random.PRNGKey(1),
        weight=0.5, temperature=2.0)
    assert np.isfinite(float(total)) and "distill" in per_task


@pytest.mark.parametrize("mode", ["pp", "sp"])
def test_pipeline_and_seq_parallel_compose(mode):
    """Pipeline / sequence parallelism of the transformer ENCODER composes
    with the transformer DECODER: the full attention CE loss and every
    parameter gradient equal the serial path exactly."""
    from functools import partial

    from e2e_asr_tpu.core import pipeline, seq_parallel

    enc = EncoderConfig(hidden_size=8, encoder_type="transformer",
                        num_heads=2, subsample=4, out_prob=1.0)
    cfg = Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 12},
        encoder=enc,
        decoders={"char": _cfg(hidden_size_dec=16, num_layers_dec=2,
                               vocab_size=13, max_output=12)},
        feat_length=8)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 8, 32
    feats = jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32))
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,))
                       .astype(np.int32))
    ids = rng.integers(3, 13, size=(B, 6)).astype(np.int32)
    ids[:, 0] = GO_ID
    batch = {"logmel": feats, "logmel_len": lens,
             "char": jnp.asarray(ids),
             "char_len": jnp.full((B,), 5, jnp.int32)}
    if mode == "pp":
        mesh = pipeline.make_stage_mesh(2)
        encode_fn = partial(pipeline.encode_pipeline, mesh=mesh, n_micro=2)
    else:
        mesh = seq_parallel.make_seq_mesh(2)
        encode_fn = partial(seq_parallel.encode_seq_parallel, mesh=mesh)
    key = jax.random.PRNGKey(3)

    def loss_fn(p, fn):
        return seq2seq.apply_train(p, cfg, batch, rng=key, encode_fn=fn)[0]

    l_s, g_s = jax.value_and_grad(loss_fn)(params, None)
    l_p, g_p = jax.value_and_grad(loss_fn)(params, encode_fn)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-5)
    for (kp, a), (ks, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_p),
            jax.tree_util.tree_leaves_with_path(g_s)):
        assert kp == ks
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6, err_msg=str(kp))


def test_longform_attention_anchors():
    """token_attention_frames dispatches to the parallel transformer replay
    and returns in-range frame anchors."""
    from e2e_asr_tpu.eval.longform import token_attention_frames
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, B=2, T_enc=9)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 3, V)
    frames = token_attention_frames(params, cfg, enc, enc_lens, tokens)
    assert frames.shape == (2, 5)
    assert np.all(np.asarray(frames) >= 0)
    assert np.all(np.asarray(frames[0]) < 9)
    assert np.all(np.asarray(frames[1]) < int(enc_lens[1]))


def _base_options(**kw):
    opts = dict(tasks="", num_layers_char=2, num_layers_phone=2,
                max_output_char=10, max_output_phone=10, use_lstm=True,
                stack_cons=1, skip_step=2, initial_res_fac=1,
                num_layers_dec=1, lm_prob=0.0, run_id=1, avg=True,
                train_base_dir="/tmp/x", decoder_type="transformer")
    opts.update(kw)
    return opts


def test_config_guards():
    # -lm_prob with the transformer decoder is a supported capability now
    # (the tied causal-LM task, transformer_decoder.apply_lm).
    cfg_lm = process_args(_base_options(lm_prob=0.1))
    assert cfg_lm.train.lm_prob == 0.1
    with pytest.raises(ValueError, match="ATTENTION"):
        process_args(_base_options(model_family="ctc"))
    cfg = process_args(_base_options())
    assert cfg.model.decoders["char"].decoder_type == "transformer"
    assert "xdec_" in cfg.train.train_dir


def test_ilme_matches_zero_cross_replay_oracle():
    """-ilm_weight with the transformer decoder: the beam's parallel
    zero-cross recurrence must subtract exactly the teacher-forced
    zero-cross log-probs (independent parallel-forward computation)."""
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg)
    w = 0.45
    bc = BeamConfig(beam_size=3, max_steps=8, ilm_weight=w)
    tokens, lens, scores = beam_lib.beam_decode(params, cfg, bc, enc,
                                                enc_lens)

    def ilm_prefix_logp(prefix):
        ids = jnp.asarray([[GO_ID] + list(prefix)], jnp.int32)
        pos = jnp.asarray(td._sinusoidal(ids.shape[1], cfg.hidden_size_dec))
        x = params["embedding"][ids] + pos[None]
        logits, _ = td._full_forward(params, cfg, x, enc[:1],
                                     jnp.ones((1, enc.shape[1])),
                                     zero_cross=True)
        return np.asarray(jax.nn.log_softmax(logits[0, -1], -1))

    # Oracle: the plain beam oracle with the ILM subtraction folded in.
    def oracle(enc_b, enc_len_b):
        k = bc.beam_size
        live = [([], 0.0)]
        finished = []
        for t in range(bc.max_steps):
            if k <= 0 or not live:
                break
            cands = []
            for seq, score in live:
                lp = _prefix_logp(params, cfg, enc_b, enc_len_b, seq)
                ilm = ilm_prefix_logp(seq)
                for v in range(V):
                    cands.append((score + lp[v] - w * ilm[v], v, seq))
            cands.sort(key=lambda c: -c[0])
            new_live = []
            for val, v, seq in cands[:k]:
                if v == EOS_ID:
                    finished.append((seq + [v], val))
                    k -= 1
                else:
                    new_live.append((seq + [v], val))
            live = new_live[:k] if k > 0 else []
        return max(finished + live, key=lambda x: x[1])

    seq, score = oracle(enc[:1], int(enc_lens[0]))
    got = list(np.asarray(tokens[0][: int(lens[0])]))
    assert got == seq, (got, seq)
    np.testing.assert_allclose(float(scores[0]), score, rtol=1e-4, atol=1e-4)
    # and the subtraction actually changes scores vs plain decoding
    _, _, s0 = beam_lib.beam_decode(
        params, cfg, dataclasses.replace(bc, ilm_weight=0.0), enc, enc_lens)
    assert not np.allclose(np.asarray(s0), np.asarray(scores))


@pytest.mark.parametrize("ilm", [0.0, 0.3])
def test_indirect_cache_mode_equals_gathered(monkeypatch, ilm):
    """The ancestry-indirect KV-cache beam (caches never reordered; a
    [B,k,S] int32 ancestry map routes self-attention) must decode exactly
    like the gathered-cache mode — tokens, lens, and scores (CPU f32)."""
    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg, B=3, T_enc=8)
    bc = BeamConfig(beam_size=3, max_steps=9, ilm_weight=ilm)
    monkeypatch.setenv("E2E_ASR_XF_INDIRECT", "1")
    t1, l1, s1 = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    monkeypatch.delenv("E2E_ASR_XF_INDIRECT")
    monkeypatch.setenv("E2E_ASR_XF_GATHER", "1")
    t2, l2, s2 = beam_lib.beam_decode(params, cfg, bc, enc, enc_lens)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_heads_divisibility_guard():
    with pytest.raises(ValueError, match="divisible"):
        td.init(jax.random.PRNGKey(0), _cfg(hidden_size_dec=10, dec_heads=4),
                attn_size=8)


def _xf_decoders(cfg, **kw):
    base = dict(decoder_type="transformer", num_layers_dec=2, dec_heads=2,
                dec_ffn_mult=2)
    base.update(kw)
    return dataclasses.replace(cfg, decoders={
        k: dataclasses.replace(d, **base) for k, d in cfg.decoders.items()})


def test_serving_engine_batched_equals_one_by_one(tmp_path):
    """The dynamic-batching serving engine serves transformer-decoder
    checkpoints: mixed-length batched == one-by-one transcripts."""
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.data.synth import make_vocab_dir
    from e2e_asr_tpu.eval.serving import BatchingTranscriber
    from tests.test_e2e import small_model_cfg

    sizes = make_vocab_dir(str(tmp_path / "vocab"))
    cfg = _xf_decoders(small_model_cfg(sizes["char"]))
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    _, rev_vocab = text.initialize_vocabulary(
        str(tmp_path / "vocab" / "char.vocab"))
    rng = np.random.default_rng(0)
    feats = [rng.normal(size=(T, 8)).astype(np.float32)
             for T in (16, 40, 33, 60)]
    kw = dict(beam_cfg=BeamConfig(beam_size=2, max_steps=16),
              bucket_frames=(32, 64))
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=4,
                             max_wait_ms=50, **kw) as batched:
        got = [f.result(timeout=300) for f in
               [batched.submit(x) for x in feats]]
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=1,
                             max_wait_ms=1, **kw) as single:
        want = [single.transcribe(x) for x in feats]
    assert got == want


def test_streaming_push_granularity_invariance(tmp_path):
    """Attention-family streaming over a transformer-decoder model: the
    transcript is invariant to how the waveform is split into pushes."""
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.data.synth import make_vocab_dir
    from e2e_asr_tpu.eval.streaming import StreamingTranscriber
    from tests.test_longform import tiny_cfg

    make_vocab_dir(str(tmp_path / "v"))
    _, rev = text.initialize_vocabulary(str(tmp_path / "v" / "char.vocab"))
    cfg = tiny_cfg()
    cfg = _xf_decoders(dataclasses.replace(cfg, decoders={
        "char": dataclasses.replace(cfg.decoders["char"], vocab_size=37)}))
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    wave = (np.sin(2 * np.pi * 330 * t)
            + 0.3 * rng.normal(size=t.shape)).astype(np.float32)
    kw = dict(window=16, margin=4, seg_enc_frames=6,
              beam_cfg=BeamConfig(beam_size=2), n_mels=cfg.feat_length)

    st1 = StreamingTranscriber(params, cfg, rev, **kw)
    out1 = st1.push(wave) + st1.finish()
    st2 = StreamingTranscriber(params, cfg, rev, **kw)
    for block in np.array_split(wave, 7):
        st2.push(block)
    st2.finish()
    assert out1 == st2.transcript
    assert st1.transcript == st2.transcript


def test_int8_quantization_mechanism():
    """core/quant covers the transformer decoder's nested block tree: every
    2-D kernel quantizes, dequantization stays within per-channel int8
    error, and the beam decodes the dequantized tree."""
    from e2e_asr_tpu.core import quant

    cfg = _cfg()
    params, enc, enc_lens = _setup(cfg)
    qs = quant.quantize(params)
    deq = quant.dequantize(qs)
    kernels = [p for p in jax.tree_util.tree_leaves(params) if p.ndim == 2]
    assert len(kernels) > 10
    for w, d in zip(
            [p for p in jax.tree_util.tree_leaves(params) if p.ndim == 2],
            [p for p in jax.tree_util.tree_leaves(deq) if p.ndim == 2]):
        scale = np.abs(np.asarray(w)).max(axis=0) / 127.0
        assert np.all(np.abs(np.asarray(w - d)) <= scale + 1e-7)
    tokens, lens, scores = beam_lib.beam_decode(
        deq, cfg, BeamConfig(beam_size=2, max_steps=6), enc, enc_lens)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_cli_train_and_eval(tmp_path):
    """Full CLI cycle with -decoder_type transformer: train -> greedy dev
    eval -> beam dev eval, checkpoints and artifacts in the xdec_ run dir."""
    import glob
    import os

    from e2e_asr_tpu.cli.main import launch_eval, launch_train, parse_options
    from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus

    root = str(tmp_path)
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir)
    make_vocab_dir(os.path.join(root, "vocab"))
    write_speech_corpus(os.path.join(data_dir, "train_1k.0.0001"), 8,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4)
    write_speech_corpus(os.path.join(data_dir, "dev.0001"), 4,
                        feat_length=8, char_vocab=20, min_tokens=3,
                        max_tokens=5, frames_per_token=4, seed=2)

    def args(extra=()):
        return ["-data_dir", data_dir,
                "-vocab_dir", os.path.join(root, "vocab"),
                "-tb_dir", os.path.join(root, "models"),
                "-decoder_type", "transformer",
                "-num_layers_dec", "2", "-dec_heads", "2",
                "-dec_ffn_mult", "2",
                "-hsize", "8", "-hsize_dec", "16",
                "-feat_len", "8", "-max_out_char", "8",
                "-buck_batch_sizes", "4",
                "-steps_per_checkpoint", "3", "-max_epochs", "1",
                "-compute_dtype", "float32", "-run_id", "7"] + list(extra)

    cfg = parse_options(args())
    assert "xdec_2x2h_" in cfg.train.train_dir
    launch_train(cfg)
    assert glob.glob(os.path.join(cfg.train.train_dir, "asr.ckpt-*.npz"))

    launch_eval(parse_options(args(["-dev"])))                  # greedy
    launch_eval(parse_options(args(["-dev", "-beam_size", "2"])))
    assert os.path.isfile(os.path.join(cfg.train.best_model_dir,
                                       "decoded_asr.txt"))
