"""Transducer (RNN-T) family: lattice loss vs oracles, greedy decode
semantics, overfit, and the evaluator output contract."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig, Seq2SeqConfig)
from e2e_asr_tpu.core.transducer_loss import (transducer_loss,
                                              transducer_loss_reference)
from e2e_asr_tpu.models import transducer


def _cfg(vocab=12, joint=16):
    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 2},
                        max_output={"char": 10},
                        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
                        feat_length=4, model_family="transducer")
    cfg.decoders["char"] = DecoderConfig(hidden_size_dec=16, emb_size=8,
                                         vocab_size=vocab, joint_dim=joint,
                                         out_prob_dec=1.0, max_output=10)
    return cfg


def _random_lattice(rng, B, T, U):
    """Well-formed (blank_lp, label_lp): blank is a real log-prob and the
    label term an arbitrary log-score (the loss never requires the two to
    normalize together)."""
    blank = np.log(rng.dirichlet(np.ones(2), size=(B, T, U + 1))[..., 0])
    label = rng.normal(size=(B, T, U)).astype(np.float64) - 1.5
    return blank.astype(np.float32), label.astype(np.float32)


def test_loss_matches_dp_oracle(rng):
    B, T, U = 4, 6, 5
    blank, label = _random_lattice(rng, B, T, U)
    t_lens = np.array([6, 4, 2, 1])
    u_lens = np.array([5, 3, 1, 0])
    got = np.asarray(transducer_loss(jnp.asarray(blank), jnp.asarray(label),
                                     jnp.asarray(t_lens), jnp.asarray(u_lens)))
    want = transducer_loss_reference(blank, label, t_lens, u_lens)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_loss_matches_full_path_enumeration(rng):
    """Exact check against brute-force enumeration of every monotonic
    alignment (T-1 blanks interleaved with U emits, final blank appended)."""
    T, U = 4, 3
    blank, label = _random_lattice(rng, 1, T, U)
    total = -np.inf
    for path in set(itertools.permutations(["B"] * (T - 1) + ["E"] * U)):
        t, u, s, ok = 0, 0, 0.0, True
        for mv in path:
            if mv == "B":
                s += blank[0, t, u]
                t += 1
            else:
                s += label[0, t, u]
                u += 1
            if t >= T or u > U:
                ok = False
                break
        if ok and t == T - 1 and u == U:
            total = np.logaddexp(total, s + blank[0, T - 1, U])
    got = float(transducer_loss(jnp.asarray(blank), jnp.asarray(label),
                                jnp.asarray([T]), jnp.asarray([U]))[0])
    np.testing.assert_allclose(got, -total, rtol=1e-5, atol=1e-5)


def test_loss_padding_invariance(rng):
    """Extra padded frames/labels beyond the true lengths change nothing."""
    blank, label = _random_lattice(rng, 2, 5, 4)
    t_lens, u_lens = np.array([5, 3]), np.array([4, 2])
    base = np.asarray(transducer_loss(jnp.asarray(blank), jnp.asarray(label),
                                      jnp.asarray(t_lens),
                                      jnp.asarray(u_lens)))
    blank_p = np.concatenate(
        [blank, rng.normal(size=(2, 3, 5)).astype(np.float32)], axis=1)
    label_p = np.concatenate(
        [label, rng.normal(size=(2, 3, 4)).astype(np.float32)], axis=1)
    blank_p = np.concatenate(
        [blank_p, rng.normal(size=(2, 8, 2)).astype(np.float32)], axis=2)
    label_p = np.concatenate(
        [label_p, rng.normal(size=(2, 8, 2)).astype(np.float32)], axis=2)
    padded = np.asarray(transducer_loss(
        jnp.asarray(blank_p), jnp.asarray(label_p), jnp.asarray(t_lens),
        jnp.asarray(u_lens)))
    np.testing.assert_allclose(padded, base, rtol=1e-5, atol=1e-5)


def _naive_jnp_loss(blank_lp, label_lp, t_len, u_len):
    """Differentiable O(T*U) Python-loop oracle (tiny shapes only)."""
    T, Up1 = blank_lp.shape
    NEG = -1e30
    alpha = [[NEG] * Up1 for _ in range(T)]
    alpha[0][0] = jnp.zeros(())
    for t in range(T):
        for u in range(Up1):
            if t == 0 and u == 0:
                continue
            c = jnp.asarray(NEG)
            if t > 0:
                c = jnp.logaddexp(c, alpha[t - 1][u] + blank_lp[t - 1, u])
            if u > 0:
                c = jnp.logaddexp(c, alpha[t][u - 1] + label_lp[t, u - 1])
            alpha[t][u] = c
    return -(alpha[t_len - 1][u_len] + blank_lp[t_len - 1, u_len])


def test_loss_gradients_match_naive_autodiff(rng):
    T, U = 4, 3
    blank, label = _random_lattice(rng, 1, T, U)
    blank, label = jnp.asarray(blank), jnp.asarray(label)

    def fast(b, l):
        return transducer_loss(b, l, jnp.asarray([T]), jnp.asarray([U]))[0]

    def naive(b, l):
        return _naive_jnp_loss(b[0], l[0], T, U)

    gb_f, gl_f = jax.grad(fast, argnums=(0, 1))(blank, label)
    gb_n, gl_n = jax.grad(naive, argnums=(0, 1))(blank, label)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_n),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl_f), np.asarray(gl_n),
                               rtol=1e-4, atol=1e-5)


def test_lattice_logprobs_chunking_invariant(rng):
    """t_chunk is a pure tiling choice: all chunk sizes agree."""
    cfg = _cfg()
    params = transducer.init(jax.random.PRNGKey(0), cfg, vocab_size=12)
    B, T, U = 2, 7, 4
    enc = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    labels = jnp.asarray([[3, 4, 5, 0], [6, 7, 0, 0]], dtype=jnp.int32)
    pred = jnp.asarray(rng.normal(size=(B, U + 1, 16)).astype(np.float32))
    outs = [transducer.lattice_logprobs(params, labels, enc, pred, t_chunk=c)
            for c in (1, 3, 8)]
    for b2, l2 in outs[1:]:
        np.testing.assert_allclose(np.asarray(outs[0][0]), np.asarray(b2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(outs[0][1]), np.asarray(l2),
                                   rtol=1e-5, atol=1e-6)


def test_model_loss_finite_grads_flow(rng):
    cfg = _cfg()
    params = transducer.init(jax.random.PRNGKey(0), cfg, vocab_size=12)
    batch = {
        "logmel": jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32)),
        "logmel_len": jnp.array([16, 12]),
        "labels": jnp.asarray([[3, 4, 5, 0], [6, 7, 0, 0]], dtype=jnp.int32),
        "label_lens": jnp.array([3, 2]),
    }
    l, grads = jax.value_and_grad(
        lambda p: transducer.loss(p, cfg, batch,
                                  rng=jax.random.PRNGKey(1)))(params)
    assert np.isfinite(float(l))
    for gpath, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(g)).all(), gpath
    for part in ("pred", "joint", "encoder"):
        tot = sum(np.abs(np.asarray(g)).sum()
                  for g in jax.tree_util.tree_leaves(grads[part]))
        assert tot > 0, part


def _greedy_oracle(params, cfg, enc, t_len, max_sym=4, cap=10):
    """Per-example NumPy re-implementation of the greedy loop."""
    from e2e_asr_tpu.core.cells import lstm_zero_state
    dec = cfg.decoders["char"]
    joint = params["joint"]

    def dense_np(p, x):
        return np.asarray(x) @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    def pred_step(token, states):
        x = np.asarray(params["pred"]["embedding"])[token]
        new = []
        for i in range(dec.num_layers_dec):
            from e2e_asr_tpu.core.cells import lstm_step
            xo, st = lstm_step(params["pred"][f"layer_{i}"],
                               jnp.asarray(x)[None], states[i])
            x = np.asarray(xo)[0]
            new.append(st)
        return x, new

    states = [lstm_zero_state((1,), dec.hidden_size_dec)
              for _ in range(dec.num_layers_dec)]
    out, states = pred_step(1, states)  # <go>
    pred_p = dense_np(joint["pred_proj"], out)
    enc_proj = dense_np(joint["enc_proj"], enc)
    t, emitted, per_frame = 0, [], 0
    while t < t_len and len(emitted) < cap:
        logits = dense_np(joint["out"], np.tanh(enc_proj[t] + pred_p))
        pick = int(np.argmax(logits))
        if pick == 0 or per_frame >= max_sym:
            t += 1
            per_frame = 0
        else:
            emitted.append(pick)
            out, states = pred_step(pick, states)
            pred_p = dense_np(joint["pred_proj"], out)
            per_frame += 1
    return emitted


def test_greedy_decode_matches_per_example_oracle(rng):
    cfg = _cfg()
    params = transducer.init(jax.random.PRNGKey(3), cfg, vocab_size=12)
    B, T = 3, 20
    feats = jnp.asarray(rng.normal(size=(B, T, 4)).astype(np.float32))
    feat_lens = jnp.asarray([20, 14, 8])
    got = np.asarray(transducer.greedy_decode(params, cfg, feats, feat_lens))
    from e2e_asr_tpu.models import seq2seq
    attn_states, _, enc_lens = seq2seq.encode(params, cfg, feats, feat_lens)
    depth = cfg.num_layers["char"]
    enc = np.asarray(attn_states[depth])
    els = np.asarray(enc_lens[depth])
    for b in range(B):
        want = _greedy_oracle(params, cfg, enc[b], int(els[b]))
        got_b = [t for t in got[b] if t != 0]
        assert got_b == want, (b, got_b, want)


def test_greedy_decode_zero_length_is_empty():
    cfg = _cfg()
    params = transducer.init(jax.random.PRNGKey(4), cfg, vocab_size=12)
    feats = jnp.zeros((2, 8, 4), jnp.float32)
    out = np.asarray(transducer.greedy_decode(
        params, cfg, feats, jnp.asarray([0, 8])))
    assert (out[0] == 0).all()


def test_transducer_over_transformer_encoder(rng):
    """The family composes with the transformer encoder (any-encoder API):
    loss finite, grads flow to blocks/pred/joint, greedy decode shapes."""
    import dataclasses

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(
        cfg.encoder, encoder_type="transformer", num_heads=2, ffn_mult=2,
        subsample=4, hidden_size=8))
    params = transducer.init(jax.random.PRNGKey(9), cfg, vocab_size=12)
    batch = {
        "logmel": jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32)),
        "logmel_len": jnp.array([16, 12]),
        "labels": jnp.asarray([[3, 4, 5, 0], [6, 7, 0, 0]], dtype=jnp.int32),
        "label_lens": jnp.array([3, 2]),
    }
    l, grads = jax.value_and_grad(
        lambda p: transducer.loss(p, cfg, batch,
                                  rng=jax.random.PRNGKey(2)))(params)
    assert np.isfinite(float(l))
    for part in ("encoder", "pred", "joint"):
        tot = sum(np.abs(np.asarray(g)).sum()
                  for g in jax.tree_util.tree_leaves(grads[part]))
        assert tot > 0, part
    out = transducer.greedy_decode(params, cfg, batch["logmel"],
                                   batch["logmel_len"])
    assert out.shape == (2, cfg.decoders["char"].max_output)


def test_greedy_chunked_state_carry_exact(rng):
    """Streaming property: decoding encoder states chunk-by-chunk with the
    carried prediction-net state equals one pass over the whole sequence —
    the monotonic-decoder guarantee eval/streaming.py relies on."""
    cfg = _cfg()
    params = transducer.init(jax.random.PRNGKey(7), cfg, vocab_size=12)
    T = 18
    enc = jnp.asarray(rng.normal(size=(1, T, 16)).astype(np.float32))
    # Cap at the natural max (4 symbols/frame) so no cap binds anywhere —
    # the per-chunk caps (4*n) then can't bind either, and the carried-state
    # equality is exact.
    full = np.asarray(transducer.greedy_decode_states(
        params, cfg, enc, jnp.asarray([T]), max_output=4 * T))
    full = [t for t in full[0] if t != 0]

    for splits in ([5, 13], [1, 2, 15], [9, 9]):
        state = transducer.init_decode_state(params, cfg, 1)
        got = []
        pos = 0
        for n in splits:
            chunk = enc[:, pos:pos + n]
            toks, state = transducer.greedy_decode_states(
                params, cfg, chunk, jnp.asarray([n]), max_output=4 * n,
                init_state=state, return_state=True)
            got.extend(int(t) for t in np.asarray(toks[0]) if t != 0)
            pos += n
        assert got == full, (splits, got, full)


def test_transducer_overfit_and_decode(rng):
    """Overfit 4 utterances; greedy transducer decode recovers the labels."""
    cfg = _cfg()
    vocab = 12
    params = transducer.init(jax.random.PRNGKey(1), cfg, vocab_size=vocab)

    basis = rng.normal(size=(vocab, 4)).astype(np.float32)
    labels = np.array([[3, 4, 5], [6, 7, 8], [9, 3, 7], [5, 9, 4]])
    feats = np.stack([np.repeat(basis[l], 4, axis=0) for l in labels])
    batch = {
        "logmel": jnp.asarray(feats),                      # [4, 12, 4]
        "logmel_len": jnp.full((4,), 12),
        "labels": jnp.asarray(labels, dtype=jnp.int32),
        "label_lens": jnp.full((4,), 3),
    }

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        l, g = jax.value_and_grad(
            lambda p: transducer.loss(p, cfg, batch))(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    for _ in range(400):
        params, opt_state, l = step(params, opt_state)
    assert float(l) < 0.5, float(l)

    decoded = np.asarray(transducer.greedy_decode(
        params, cfg, batch["logmel"], batch["logmel_len"]))
    for b in range(4):
        got = [t for t in decoded[b] if t != 0]
        assert got == list(labels[b]), (b, got, labels[b])

    # Int8 weight-only quantization (core/quant.py) preserves the decode
    # on the trained model — the serving parity contract for this family.
    from e2e_asr_tpu.core import quant

    q_decoded = np.asarray(jax.jit(
        lambda p, f, l: transducer.greedy_decode(
            quant.maybe_dequantize(p), cfg, f, l))(
        quant.quantize(params), batch["logmel"], batch["logmel_len"]))
    np.testing.assert_array_equal(q_decoded, decoded)
