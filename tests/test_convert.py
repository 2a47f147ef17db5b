"""TF-checkpoint converter tests: a fabricated TF-named dump (using the
reference's canonical variable names, beam_search.py:53-134) must round-trip
into an equivalent parameter tree. Plus ind_softmax decoupling."""
import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import DecoderConfig
from e2e_asr_tpu.models import attn_decoder, seq2seq
from e2e_asr_tpu.tools.convert_tf_ckpt import convert

from tests.test_seq2seq import tiny_cfg


def _tf_dump_from_params(params, task="char"):
    """Fabricate the TF-name dump the converter expects."""
    dec = params[f"decoder_{task}"]
    pre = f"model/rnn_decoder_{task}"
    dump = {
        f"{pre}/rnn/basic_lstm_cell/kernel": dec["lm_cell"]["kernel"],
        f"{pre}/rnn/basic_lstm_cell/bias": dec["lm_cell"]["bias"],
        f"{pre}/rnn/basic_lstm_cell_1/kernel": dec["dec_cells"][0]["kernel"],
        f"{pre}/rnn/basic_lstm_cell_1/bias": dec["dec_cells"][0]["bias"],
        f"{pre}/rnn/Attention/kernel": dec["attn_query"]["kernel"],
        f"{pre}/rnn/Attention/bias": dec["attn_query"]["bias"],
        f"{pre}/rnn/InputProjection/kernel": dec["input_proj"]["kernel"],
        f"{pre}/rnn/InputProjection/bias": dec["input_proj"]["bias"],
        f"{pre}/rnn/AttnProjection/kernel": dec["attn_proj"]["kernel"],
        f"{pre}/rnn/AttnProjection/bias": dec["attn_proj"]["bias"],
        f"{pre}/rnn/OutputProjection/kernel": dec["output_proj"]["kernel"],
        f"{pre}/rnn/OutputProjection/bias": dec["output_proj"]["bias"],
        # TF stores AttnW as a 1x1 conv kernel.
        f"{pre}/AttnW": np.asarray(dec["attn_w"])[None, None],
        f"{pre}/AttnV": dec["attn_v"],
        f"{pre}/decoder/embedding": dec["embedding"],
    }
    enc = params["encoder"]
    for layer_name, layer in enc.items():
        idx = layer_name.split("_")[1]
        for d in ("fw", "bw"):
            base = (f"model/encoder/RNNLayer{idx}/bidirectional_rnn/{d}/"
                    f"basic_lstm_cell")
            dump[f"{base}/kernel"] = layer[d]["kernel"]
            dump[f"{base}/bias"] = layer[d]["bias"]
    return {k: np.asarray(v) for k, v in dump.items()}


def test_convert_roundtrip(rng):
    cfg = tiny_cfg()
    src = seq2seq.init(jax.random.PRNGKey(0), cfg)
    dump = _tf_dump_from_params(src)

    dst = seq2seq.init(jax.random.PRNGKey(99), cfg)  # different init
    converted = convert(dump, dst, tasks=("char",))

    for name in ("lm_cell", "dec_cells", "attn_query", "input_proj",
                 "attn_proj", "output_proj", "attn_w", "attn_v", "embedding"):
        a = jax.tree_util.tree_leaves(src["decoder_char"][name])
        b = jax.tree_util.tree_leaves(converted["decoder_char"][name])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(src["encoder"]["layer_1"]["fw"]["kernel"]),
        np.asarray(converted["encoder"]["layer_1"]["fw"]["kernel"]), rtol=1e-6)

    # Converted params must produce identical greedy decodes.
    feats = jnp.asarray(rng.normal(size=(2, 12, cfg.feat_length))
                        .astype(np.float32))
    lens = jnp.array([12, 9])
    ids_src = seq2seq.apply_greedy(src, cfg, feats, lens)
    conv_jax = jax.tree_util.tree_map(jnp.asarray, converted)
    ids_conv = seq2seq.apply_greedy(conv_jax, cfg, feats, lens)
    np.testing.assert_array_equal(np.asarray(ids_src), np.asarray(ids_conv))


def test_convert_skips_shape_mismatch(rng):
    cfg = tiny_cfg()
    src = seq2seq.init(jax.random.PRNGKey(0), cfg)
    dump = _tf_dump_from_params(src)
    dump["model/rnn_decoder_char/decoder/embedding"] = np.zeros((99, 7))
    dst = seq2seq.init(jax.random.PRNGKey(99), cfg)
    before = np.asarray(dst["decoder_char"]["embedding"]).copy()
    converted = convert(dump, dst, tasks=("char",), verbose=False)
    np.testing.assert_array_equal(converted["decoder_char"]["embedding"],
                                  before)


def test_ind_softmax_decouples_decoder_from_lm(rng):
    cfg = DecoderConfig(hidden_size_dec=8, emb_size=6, vocab_size=11,
                        attention_vec_size=5, lm_hidden_size=8,
                        samp_prob=0.0, out_prob_dec=1.0, ind_softmax=True)
    params = attn_decoder.init(jax.random.PRNGKey(0), cfg, attn_size=10)
    assert "output_proj_ind" in params
    enc = jnp.asarray(rng.normal(size=(1, 5, 10)).astype(np.float32))
    dec_inputs = jnp.asarray(rng.integers(0, 11, size=(4, 1)))

    def loss(p):
        logits = attn_decoder.apply_train(p, cfg, dec_inputs, enc,
                                          jnp.array([5]),
                                          rng=jax.random.PRNGKey(1))
        return jnp.sum(logits ** 2)

    grads = jax.grad(loss)(params)
    # ASR gradients hit the independent softmax, not the LM-shared one.
    assert np.abs(np.asarray(grads["output_proj_ind"]["kernel"])).sum() > 0
    assert np.abs(np.asarray(grads["output_proj"]["kernel"])).sum() == 0
