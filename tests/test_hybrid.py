"""Hybrid CTC/attention: both objectives flow gradients; joint training
converges with both decode modes working."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from e2e_asr_tpu.models import ctc, hybrid, seq2seq

from tests.test_seq2seq import make_batch, tiny_cfg


def _with_ctc_labels(batch):
    """Derive CTC labels (strip <go>, stop before <eos>) from the char track."""
    char = np.asarray(batch["char"])
    lens = np.asarray(batch["char_len"])
    labels = np.zeros_like(char[:, 1:])
    label_lens = np.zeros_like(lens)
    for b in range(char.shape[0]):
        toks = char[b, 1:1 + lens[b] - 1]   # exclude <go> and <eos>
        labels[b, : len(toks)] = toks
        label_lens[b] = len(toks)
    batch = dict(batch)
    batch["labels"] = jnp.asarray(labels)
    batch["label_lens"] = jnp.asarray(label_lens)
    return batch


def test_hybrid_loss_components_and_grads(rng):
    cfg = tiny_cfg()
    params = hybrid.init(jax.random.PRNGKey(0), cfg)
    batch = _with_ctc_labels(make_batch(rng, cfg, B=2, T=16, T_dec=5))

    def f(p):
        total, metrics = hybrid.loss(p, cfg, batch, ctc_weight=0.3,
                                     rng=jax.random.PRNGKey(1))
        return total, metrics

    (total, metrics), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert {"attention", "ctc", "char"} <= set(metrics)
    expected = 0.7 * float(metrics["attention"]) + 0.3 * float(metrics["ctc"])
    np.testing.assert_allclose(float(total), expected, rtol=1e-5)
    # Both heads and the shared encoder get gradients.
    assert np.abs(np.asarray(grads["ctc_head"]["kernel"])).sum() > 0
    assert np.abs(np.asarray(
        grads["decoder_char"]["output_proj"]["kernel"])).sum() > 0
    assert np.abs(np.asarray(
        grads["encoder"]["layer_1"]["fw"]["kernel"])).sum() > 0


def test_hybrid_ctc_weight_zero_matches_attention_only(rng):
    cfg = tiny_cfg()
    params = hybrid.init(jax.random.PRNGKey(0), cfg)
    batch = _with_ctc_labels(make_batch(rng, cfg, B=2, T=16, T_dec=5))
    total, metrics = hybrid.loss(params, cfg, batch, ctc_weight=0.0,
                                 rng=jax.random.PRNGKey(1))
    ref_total, _ = seq2seq.apply_train(params, cfg, batch,
                                       rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)


def test_hybrid_training_improves_both_losses(rng):
    cfg = tiny_cfg(samp_prob=0.0)
    params = hybrid.init(jax.random.PRNGKey(2), cfg)
    batch = _with_ctc_labels(make_batch(rng, cfg, B=2, T=16, T_dec=5))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        (total, metrics), g = jax.value_and_grad(
            lambda p: hybrid.loss(p, cfg, batch, ctc_weight=0.3, rng=key),
            has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, metrics

    first = None
    for i in range(150):
        params, opt_state, metrics = step(params, opt_state,
                                          jax.random.PRNGKey(i))
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    assert float(metrics["attention"]) < first["attention"] * 0.8
    assert float(metrics["ctc"]) < first["ctc"] * 0.8
