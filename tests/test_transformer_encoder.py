"""Transformer encoder family (models/transformer_encoder.py):
API parity with the RNN encoder, masking, learning, and family integration.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig, Seq2SeqConfig)
from e2e_asr_tpu.models import encoder as encoder_lib
from e2e_asr_tpu.models import seq2seq


def tiny_cfg(**enc_kw):
    enc = EncoderConfig(hidden_size=8, encoder_type="transformer",
                        num_heads=2, ffn_mult=2, subsample=4, out_prob=1.0,
                        **enc_kw)
    return Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 3}, max_output={"char": 12},
        encoder=enc,
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=8, vocab_size=11, lm_hidden_size=8,
            attention_vec_size=8, max_output=12, samp_prob=0.0,
            out_prob_dec=1.0)},
        feat_length=6)


def test_shapes_depths_and_masking():
    cfg = tiny_cfg()
    num_layers = {"char": 3, "phone": 2}
    params = encoder_lib.init(jax.random.PRNGKey(0), cfg.encoder, 3,
                              cfg.feat_length)
    B, T = 3, 37
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.feat_length))
    lens = jnp.array([T, 17, 5])
    attn, tm, sl = encoder_lib.apply(params, cfg.encoder, x, lens, num_layers)
    D = cfg.encoder.hidden_size * 2
    T_out = -(-T // cfg.encoder.subsample)
    assert set(attn) == {2, 3}
    assert attn[3].shape == (B, T_out, D)
    out_lens = np.asarray(sl[3])
    np.testing.assert_array_equal(out_lens, [-(-int(l) // 4) for l in (T, 17, 5)])
    # Outputs past each length are masked to zero.
    for b in range(B):
        assert np.allclose(np.asarray(attn[3])[b, out_lens[b]:], 0.0)


def test_padding_invariance():
    """Extra padding frames must not change the valid outputs (attention is
    masked; padded positions contribute nothing)."""
    cfg = tiny_cfg()
    params = encoder_lib.init(jax.random.PRNGKey(2), cfg.encoder, 2,
                              cfg.feat_length)
    B, T = 2, 24
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, cfg.feat_length))
    lens = jnp.array([T, 20])
    attn1, _, sl1 = encoder_lib.apply(params, cfg.encoder, x, lens,
                                      {"char": 2})
    x_pad = jnp.pad(x, ((0, 0), (0, 16), (0, 0)))
    attn2, _, _ = encoder_lib.apply(params, cfg.encoder, x_pad, lens,
                                    {"char": 2})
    n = int(sl1[2][1])
    np.testing.assert_allclose(np.asarray(attn1[2][1, :n]),
                               np.asarray(attn2[2][1, :n]),
                               rtol=1e-5, atol=1e-5)


def test_seq2seq_trains_and_decodes_with_transformer():
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(4), cfg)
    B, T, L = 4, 32, 6
    batch = {
        "logmel": jax.random.normal(jax.random.PRNGKey(5),
                                    (B, T, cfg.feat_length)),
        "logmel_len": jnp.full((B,), T, jnp.int32),
        "char": jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32),
             jax.random.randint(jax.random.PRNGKey(6), (B, L - 1), 3, 11)],
            axis=1),
        "char_len": jnp.full((B,), L - 1, jnp.int32),
    }

    def loss_fn(p):
        loss, _ = seq2seq.apply_train(p, cfg, batch,
                                      rng=jax.random.PRNGKey(7))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
    # SGD steps must substantially reduce the loss (the encoder learns).
    p = params
    gf = jax.jit(jax.grad(loss_fn))
    for _ in range(60):
        p = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p, gf(p))
    assert float(loss_fn(p)) < 0.7 * float(loss)

    ids = seq2seq.apply_greedy(params, cfg, batch["logmel"],
                               batch["logmel_len"])
    assert ids.shape == (B, cfg.max_output["char"])


def test_ctc_family_with_transformer_encoder():
    from e2e_asr_tpu.models import ctc
    cfg = tiny_cfg()
    params = ctc.init(jax.random.PRNGKey(8), cfg, vocab_size=11)
    B, T = 3, 32
    batch = {
        "logmel": jax.random.normal(jax.random.PRNGKey(9),
                                    (B, T, cfg.feat_length)),
        "logmel_len": jnp.full((B,), T, jnp.int32),
        "labels": jax.random.randint(jax.random.PRNGKey(10), (B, 3), 3, 11),
        "label_lens": jnp.full((B,), 3, jnp.int32),
    }
    loss = ctc.loss(params, cfg, batch)
    assert np.isfinite(float(loss))


def test_rel_pos_bias_zero_init_is_baseline_and_learns():
    """With rel_pos_bias on: zero-init output equals the baseline exactly;
    the bias table gets nonzero gradients (it is learnable)."""
    cfg0 = tiny_cfg()
    cfg1 = dataclasses.replace(cfg0, encoder=dataclasses.replace(
        cfg0.encoder, rel_pos_bias=True))
    p0 = encoder_lib.init(jax.random.PRNGKey(5), cfg0.encoder, 2,
                          cfg0.feat_length)
    p1 = encoder_lib.init(jax.random.PRNGKey(5), cfg1.encoder, 2,
                          cfg1.feat_length)
    B, T = 2, 24
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, cfg0.feat_length))
    lens = jnp.array([T, 15])
    a0, _, _ = encoder_lib.apply(p0, cfg0.encoder, x, lens, {"char": 2})
    a1, _, _ = encoder_lib.apply(p1, cfg1.encoder, x, lens, {"char": 2})
    np.testing.assert_allclose(np.asarray(a0[2]), np.asarray(a1[2]),
                               rtol=1e-6, atol=1e-6)

    def loss(p):
        attn, _, _ = encoder_lib.apply(p, cfg1.encoder, x, lens, {"char": 2})
        return jnp.sum(jnp.sin(attn[2]))

    g = jax.grad(loss)(p1)
    assert float(jnp.sum(jnp.abs(g["block_1"]["rel_bias"]))) > 0


def test_conv_module_padding_invariance_and_learning():
    """Conformer-style conv module on: padded frames must not leak into
    valid outputs, and the depthwise kernel must receive gradients."""
    cfg = tiny_cfg()
    cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(
        cfg.encoder, conv_kernel=5))
    params = encoder_lib.init(jax.random.PRNGKey(7), cfg.encoder, 2,
                              cfg.feat_length)
    assert "conv" in params["block_1"]
    B, T = 2, 24
    x = jax.random.normal(jax.random.PRNGKey(8), (B, T, cfg.feat_length))
    lens = jnp.array([T, 16])
    a1, _, sl = encoder_lib.apply(params, cfg.encoder, x, lens, {"char": 2})
    x_pad = jnp.pad(x, ((0, 0), (0, 20), (0, 0)))
    a2, _, _ = encoder_lib.apply(params, cfg.encoder, x_pad, lens, {"char": 2})
    n = int(sl[2][1])
    np.testing.assert_allclose(np.asarray(a1[2][1, :n]),
                               np.asarray(a2[2][1, :n]),
                               rtol=1e-5, atol=1e-5)

    def loss(p):
        attn, _, _ = encoder_lib.apply(p, cfg.encoder, x, lens, {"char": 2})
        return jnp.sum(jnp.sin(attn[2]))

    g = jax.grad(loss)(params)
    assert float(jnp.sum(jnp.abs(g["block_1"]["conv"]["dw"]))) > 0


def test_run_dir_naming_tag():
    from e2e_asr_tpu.config import get_run_dir_name
    base = dict(tasks=["char"], skip_step=2, use_lstm=True, stack_cons=1,
                initial_res_fac=1, num_layers_dec=1, lm_prob=0.0, run_id=3,
                avg=False)
    rnn_name = get_run_dir_name(dict(base, encoder_type="rnn"))
    xf_name = get_run_dir_name(dict(base, encoder_type="transformer",
                                    num_heads=4))
    assert xf_name == "xfmr_4h_" + rnn_name
