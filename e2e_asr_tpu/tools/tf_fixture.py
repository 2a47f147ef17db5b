"""Ground-truth TF checkpoint fixture builder for the TF->JAX converter.

Builds the reference's graph structure with REAL TensorFlow cells under the
reference's exact variable scopes (/root/reference/encoder.py:73-89,
attn_decoder.py:37-172, decoder.py:49-115, train.py:184), saves a genuine
TF checkpoint bundle, dumps it to the converter's npz interchange format, and
runs the graph forward to produce golden outputs for numeric parity tests.

Verified ground-truth names this fixture produces (and that
tools/convert_tf_ckpt.py must consume):

    model/encoder/RNNLayer{d}/bidirectional_rnn/{fw,bw}/basic_lstm_cell/kernel
    model/rnn_decoder_{task}/decoder/embedding
    model/rnn_decoder_{task}/AttnW | AttnV
    model/rnn_decoder_{task}/rnn/basic_lstm_cell/{kernel,bias}          (lm cell)
    model/rnn_decoder_{task}/rnn/basic_lstm_cell_1/{kernel,bias}        (1-layer dec)
    model/rnn_decoder_{task}/rnn/multi_rnn_cell/cell_{i}/basic_lstm_cell/...
                                                                  (deep dec, i>=0)
    model/rnn_decoder_{task}/rnn/{Attention,InputProjection,AttnProjection,
                                  OutputProjection[,SimpleProjection]}/{kernel,bias}

GRU variants swap `basic_lstm_cell` for `gru_cell` with `gates/` and
`candidate/` sub-scopes.

Requires tensorflow with the legacy tf_keras cells (TF_USE_LEGACY_KERAS=1 must
take effect before TensorFlow resolves its Keras backend; `_tf()` sets it).
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

GO_ID = 1


def _tf():
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow.compat.v1 as tf1
    tf1.disable_eager_execution()
    tf1.disable_v2_behavior()
    # Raises AttributeError if only Keras 3 is available.
    tf1.nn.rnn_cell.BasicLSTMCell
    return tf1


@dataclass
class FixtureSpec:
    feat: int = 6
    hidden: int = 8           # encoder AND main decoder cell hidden size
    emb_size: int = 5
    attn_vec: int = 7
    vocab: int = 9
    enc_layers: int = 2
    dec_layers: int = 1
    lm_hidden: int = 8        # != hidden => SimpleProjection exists
    use_lstm: bool = True
    B: int = 3
    T: int = 12               # padded/true max input frames
    T_dec: int = 7            # decoder input ids incl. <go>
    seed: int = 0


def _linear(tf1, xs, out_dim: int, scope: str):
    """contrib _linear semantics: concat inputs, one kernel+bias in `scope`."""
    xs = xs if isinstance(xs, (list, tuple)) else [xs]
    x = tf1.concat(xs, 1) if len(xs) > 1 else xs[0]
    with tf1.variable_scope(scope, reuse=tf1.AUTO_REUSE):
        k = tf1.get_variable("kernel", [int(x.shape[-1]), out_dim])
        b = tf1.get_variable("bias", [out_dim],
                             initializer=tf1.zeros_initializer())
    return tf1.matmul(x, k) + b


def _make_cell(tf1, spec: FixtureSpec, hidden: int):
    rc = tf1.nn.rnn_cell
    return rc.BasicLSTMCell(hidden) if spec.use_lstm else rc.GRUCell(hidden)


def _encoder(tf1, spec: FixtureSpec, feats_tm, seq_len):
    """Pyramidal bidirectional stack (encoder.py:122-180): reduce time 2x
    between layers (not after the last)."""
    x, lens = feats_tm, seq_len
    B = spec.B
    for depth in range(1, spec.enc_layers + 1):
        with tf1.variable_scope("RNNLayer%d" % depth):
            (fw, bw), _ = tf1.nn.bidirectional_dynamic_rnn(
                _make_cell(tf1, spec, spec.hidden),
                _make_cell(tf1, spec, spec.hidden),
                x, sequence_length=lens, dtype=tf1.float32, time_major=True)
            out = tf1.concat([fw, bw], 2)
        if depth != spec.enc_layers:
            bm = tf1.transpose(out, [1, 0, 2])
            T_cur, F_cur = int(bm.shape[1]), int(bm.shape[2])
            pad = (-T_cur) % 2
            if pad:
                bm = tf1.pad(bm, [[0, 0], [0, pad], [0, 0]])
            bm = tf1.reshape(bm, [B, (T_cur + pad) // 2, F_cur * 2])
            x = tf1.transpose(bm, [1, 0, 2])
            lens = (lens + 1) // 2
        else:
            x = out
    return x, lens   # time-major [T_red, B, 2h], [B]


def _decoder(tf1, spec: FixtureSpec, enc_bm, enc_lens, dec_ids_tm):
    """Teacher-forced attention decoder via tf.nn.raw_rnn, replicating the
    reference step order (attn_decoder.py:76-162). Returns [T_dec-1, B, V]
    logits where logits[t] predicts dec_ids[t+1]."""
    rc = tf1.nn.rnn_cell
    B, V, A = spec.B, spec.vocab, spec.attn_vec
    attn_size = int(enc_bm.shape[2])
    steps = spec.T_dec - 1

    with tf1.variable_scope("decoder"):
        embedding = tf1.get_variable(
            "embedding", [V, spec.emb_size],
            initializer=tf1.random_uniform_initializer(-1.0, 1.0))
    emb_inputs = tf1.nn.embedding_lookup(embedding, dec_ids_tm)  # [T_dec,B,E]
    inputs_ta = tf1.TensorArray(size=spec.T_dec, dtype=tf1.float32)
    inputs_ta = inputs_ta.unstack(emb_inputs)

    lm_cell = _make_cell(tf1, spec, spec.lm_hidden)
    if spec.dec_layers > 1:
        main_cell = rc.MultiRNNCell(
            [_make_cell(tf1, spec, spec.hidden) for _ in range(spec.dec_layers)])
    else:
        main_cell = _make_cell(tf1, spec, spec.hidden)

    def get_state(state):
        if spec.dec_layers > 1:
            state = state[-1]
        return state.c if spec.use_lstm else state

    hidden4 = tf1.expand_dims(enc_bm, 2)                       # [B,T,1,2h]
    AttnW = tf1.get_variable("AttnW", [1, 1, attn_size, A])
    hidden_features = tf1.nn.conv2d(hidden4, AttnW, [1, 1, 1, 1], "SAME")
    v = tf1.get_variable("AttnV", [A])
    attn_mask = tf1.sequence_mask(enc_lens, maxlen=int(enc_bm.shape[1]),
                                  dtype=tf1.float32)

    def attention(query):
        # softmax*mask/renorm exactly as attn_decoder.py:85-88
        y = _linear(tf1, [query], A, "Attention")
        y = tf1.reshape(y, [-1, 1, 1, A])
        s = tf1.reduce_sum(v * tf1.tanh(hidden_features + y), [2, 3])
        alpha = tf1.nn.softmax(s) * attn_mask
        alpha = alpha / tf1.reduce_sum(alpha, axis=1, keepdims=True)
        a4 = tf1.expand_dims(tf1.expand_dims(alpha, 2), 3)
        context = tf1.reduce_sum(a4 * hidden4, [1, 2])
        return context

    def loop_fn(time, cell_output, state, loop_state):
        finished = time >= steps
        if cell_output is None:
            next_state = main_cell.zero_state(B, tf1.float32)
            output = tf1.zeros((V,))
            lm_input = inputs_ta.read(time)
            lm_state = lm_cell.zero_state(B, tf1.float32)
            ctx = tf1.zeros([B, attn_size])
        else:
            next_state = state
            lm_state, prev_ctx = loop_state
            query = get_state(state)
            ctx = attention(query)
            proj = _linear(tf1, [query, ctx], spec.hidden, "AttnProjection")
            output = _linear(tf1, [proj], V, "OutputProjection")
            lm_input = tf1.cond(
                finished,
                lambda: tf1.zeros([B, spec.emb_size]),
                lambda: inputs_ta.read(tf1.minimum(time, spec.T_dec - 1)))
        lm_output, next_lm_state = lm_cell(lm_input, lm_state)
        if spec.lm_hidden != spec.hidden:
            lm_output = _linear(tf1, [lm_output], spec.hidden,
                                "SimpleProjection")
        next_input = _linear(tf1, [lm_output, ctx], spec.emb_size,
                             "InputProjection")
        elements_finished = tf1.fill([B], finished)
        return (elements_finished, next_input, next_state, output,
                (next_lm_state, ctx))

    outputs_ta, _, _ = tf1.nn.raw_rnn(main_cell, loop_fn)
    return outputs_ta.stack()   # [steps, B, V]


def build_fixture(out_dir: str, spec: FixtureSpec | None = None) -> dict:
    """Build, run, and save the fixture. Returns paths + golden arrays.

    Writes:
        {out_dir}/tf_ckpt*          genuine TF checkpoint bundle
        {out_dir}/dump.npz          non-Adam tensors by TF name (converter input)
        {out_dir}/golden.npz        inputs + TF forward outputs
    """
    spec = spec or FixtureSpec()
    tf1 = _tf()
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(spec.seed)

    feats = rng.normal(size=(spec.B, spec.T, spec.feat)).astype(np.float32)
    lens = np.linspace(spec.T, max(2, spec.T // 2), spec.B).astype(np.int32)
    lens[0] = spec.T
    dec_ids = rng.integers(3, spec.vocab, size=(spec.T_dec, spec.B))
    dec_ids[0, :] = GO_ID
    dec_ids = dec_ids.astype(np.int32)

    g = tf1.Graph()
    with g.as_default():
        tf1.set_random_seed(spec.seed)
        feats_ph = tf1.placeholder(tf1.float32, [spec.B, spec.T, spec.feat])
        lens_ph = tf1.placeholder(tf1.int32, [spec.B])
        dec_ph = tf1.placeholder(tf1.int32, [spec.T_dec, spec.B])
        with tf1.variable_scope("model"):
            # Non-model variables a real checkpoint carries
            # (seq2seq_model.py:74-82): unnamed -> model/Variable{,_1,_2}.
            tf1.Variable(1e-3, trainable=False)
            tf1.Variable(0, trainable=False)
            tf1.Variable(0, trainable=False)
            with tf1.variable_scope("encoder"):
                enc_tm, enc_lens = _encoder(
                    tf1, spec, tf1.transpose(feats_ph, [1, 0, 2]), lens_ph)
            enc_bm = tf1.transpose(enc_tm, [1, 0, 2])
            with tf1.variable_scope("rnn_decoder_char"):
                logits = _decoder(tf1, spec, enc_bm, enc_lens, dec_ph)
            # Adam slots, as training would create them
            # (seq2seq_model.py:137-155).
            loss = tf1.reduce_mean(logits ** 2)
            opt = tf1.train.AdamOptimizer(1e-3)
            train_op = opt.minimize(loss)

        saver = tf1.train.Saver(write_version=tf1.train.SaverDef.V2)
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            feed = {feats_ph: feats, lens_ph: lens, dec_ph: dec_ids}
            enc_out, enc_out_lens, logits_out = sess.run(
                [enc_bm, enc_lens, logits], feed)
            ckpt_path = saver.save(sess, os.path.join(out_dir, "tf_ckpt"),
                                   write_meta_graph=False)

    # npz dump per the converter's documented recipe (convert_tf_ckpt.py:9-17).
    reader = tf1.train.NewCheckpointReader(ckpt_path)
    dump = {n: reader.get_tensor(n)
            for n in reader.get_variable_to_shape_map()
            if "Adam" not in n}
    npz_path = os.path.join(out_dir, "dump.npz")
    np.savez(npz_path, **dump)

    golden_path = os.path.join(out_dir, "golden.npz")
    np.savez(golden_path, feats=feats, lens=lens, dec_ids=dec_ids,
             enc_out=enc_out, enc_out_lens=enc_out_lens, logits=logits_out)
    return {"ckpt": ckpt_path, "npz": npz_path, "golden": golden_path,
            "names": sorted(dump)}


def main(argv=None) -> None:
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_dir")
    p.add_argument("-dec_layers", type=int, default=1)
    p.add_argument("-enc_layers", type=int, default=2)
    p.add_argument("-gru", action="store_true")
    args = p.parse_args(argv)
    info = build_fixture(args.out_dir, FixtureSpec(
        dec_layers=args.dec_layers, enc_layers=args.enc_layers,
        use_lstm=not args.gru))
    print("\n".join(info["names"]))
    print(f"wrote {info['npz']}")


if __name__ == "__main__":
    main()
