"""Seq2seq assembly + LM weight-tying tests."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import DecoderConfig, EncoderConfig, LMConfig, Seq2SeqConfig
from e2e_asr_tpu.models import rnn_lm, seq2seq


def tiny_cfg(tasks=("char",), samp_prob=0.0, out_prob=1.0):
    tasks = list(tasks)
    num_layers = {"char": 2, "phone": 1}
    decs = {t: DecoderConfig(hidden_size_dec=8, emb_size=6, vocab_size=11,
                             attention_vec_size=5, lm_hidden_size=8,
                             samp_prob=samp_prob, out_prob_dec=out_prob,
                             max_output=6)
            for t in tasks}
    return Seq2SeqConfig(
        tasks=tasks,
        num_layers={t: num_layers[t] for t in tasks},
        max_output={t: 6 for t in tasks},
        encoder=EncoderConfig(hidden_size=6, out_prob=out_prob),
        decoders=decs, feat_length=4)


def make_batch(rng, cfg, B=2, T=12, T_dec=5):
    batch = {
        "logmel": jnp.asarray(rng.normal(size=(B, T, cfg.feat_length))
                              .astype(np.float32)),
        "logmel_len": jnp.array([T, T - 3]),
    }
    for t in cfg.tasks:
        ids = rng.integers(3, cfg.decoders[t].vocab_size, size=(B, T_dec))
        ids[:, 0] = 1  # <go>
        batch[t] = jnp.asarray(ids)
        batch[f"{t}_len"] = jnp.array([T_dec - 1, T_dec - 2])
    return batch


def test_train_loss_single_task(rng):
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg)
    total, per_task = seq2seq.apply_train(params, cfg, batch,
                                          rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    assert set(per_task) == {"char"}
    # Untrained loss should be near log(V).
    assert abs(float(total) - np.log(11)) < 1.0


def test_train_loss_multitask_averaging(rng):
    cfg = tiny_cfg(tasks=("char", "phone"))
    cfg.avg = True
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg)
    total_avg, per_task = seq2seq.apply_train(params, cfg, batch,
                                              rng=jax.random.PRNGKey(1))
    cfg.avg = False
    total_sum, _ = seq2seq.apply_train(params, cfg, batch,
                                       rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(total_sum), 2 * float(total_avg), rtol=1e-5)
    assert set(per_task) == {"char", "phone"}


def test_gradients_flow_everywhere(rng):
    cfg = tiny_cfg(tasks=("char", "phone"))
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg)

    def loss_fn(p):
        total, _ = seq2seq.apply_train(p, cfg, batch, rng=jax.random.PRNGKey(1))
        return total

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    for path, g in flat:
        assert np.isfinite(np.asarray(g)).all(), path
        assert np.abs(np.asarray(g)).sum() > 0, f"zero grad at {path}"


def test_greedy_decode_shape(rng):
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, cfg)
    ids = seq2seq.apply_greedy(params, cfg, batch["logmel"], batch["logmel_len"])
    assert ids.shape == (2, 6)


def test_frame_stacking():
    x = jnp.arange(1 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 2)
    out = seq2seq.stack_frames(x, 2)
    assert out.shape == (1, 4, 4)
    # Position t holds [x_t, x_{t+1}]; last position zero-padded.
    np.testing.assert_array_equal(np.asarray(out[0, 0]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(out[0, 3]), [6, 7, 0, 0])


def test_lm_shares_decoder_weights(rng):
    """LM gradients must land on the char decoder's lm_cell / output_proj /
    embedding — the explicit analogue of the reference's variable-scope tying
    (lm_model.py:102)."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    lm_cfg = LMConfig(lm_hidden_size=8, proj_size=8, emb_size=6, vocab_size=11,
                      out_prob=1.0)
    ids = rng.integers(3, 11, size=(5, 2))
    ids[0, :] = 1
    token_ids = jnp.asarray(ids)
    seq_len = jnp.array([4, 3])

    def lm_loss(p):
        return rnn_lm.loss(p, lm_cfg, token_ids, seq_len, train=False)

    grads = jax.grad(lm_loss)(params)
    dec = grads["decoder_char"]
    assert np.abs(np.asarray(dec["lm_cell"]["kernel"])).sum() > 0
    assert np.abs(np.asarray(dec["output_proj"]["kernel"])).sum() > 0
    assert np.abs(np.asarray(dec["embedding"])).sum() > 0
    # Non-shared decoder leaves get zero gradient from the LM task.
    assert np.abs(np.asarray(dec["attn_w"])).sum() == 0
    assert np.abs(np.asarray(dec["dec_cells"][0]["kernel"])).sum() == 0
    # Encoder untouched.
    enc_leaves = jax.tree_util.tree_leaves(grads["encoder"])
    assert all(np.abs(np.asarray(g)).sum() == 0 for g in enc_leaves)


def test_lm_perplexity_sane(rng):
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    lm_cfg = LMConfig(lm_hidden_size=8, proj_size=8, emb_size=6, vocab_size=11)
    ids = rng.integers(3, 11, size=(6, 3))
    ids[0, :] = 1
    loss = rnn_lm.loss(params, lm_cfg, jnp.asarray(ids), jnp.array([5, 5, 4]),
                       train=False)
    assert abs(float(loss) - np.log(11)) < 1.0
