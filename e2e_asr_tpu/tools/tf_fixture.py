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


def _decoder(tf1, spec: FixtureSpec, enc_bm, enc_lens, dec_ids_tm,
             greedy_steps: int = 0):
    """Teacher-forced attention decoder via tf.nn.raw_rnn, replicating the
    reference step order (attn_decoder.py:76-162). Returns [T_dec-1, B, V]
    logits where logits[t] predicts dec_ids[t+1].

    When greedy_steps > 0, additionally builds an inference decoder over the
    SAME variables (second raw_rnn re-entering variable scope "rnn"; the cell
    objects are already built so their variables are shared) that feeds back
    the argmax embedding each step, exactly the reference inference
    loop_function (decoder.py:139-153, attn_decoder.py:128-129). Returns
    (logits, greedy_logits [greedy_steps, B, V])."""
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

    go_emb = tf1.nn.embedding_lookup(embedding, tf1.fill([B], GO_ID))

    def make_loop_fn(n_steps: int, next_token_emb, init_emb):
        """next_token_emb(time, output) -> [B, emb] feedback embedding."""
        def loop_fn(time, cell_output, state, loop_state):
            finished = time >= n_steps
            if cell_output is None:
                next_state = main_cell.zero_state(B, tf1.float32)
                output = tf1.zeros((V,))
                lm_input = init_emb
                lm_state = lm_cell.zero_state(B, tf1.float32)
                ctx = tf1.zeros([B, attn_size])
            else:
                next_state = state
                lm_state, prev_ctx = loop_state
                query = get_state(state)
                ctx = attention(query)
                proj = _linear(tf1, [query, ctx], spec.hidden,
                               "AttnProjection")
                output = _linear(tf1, [proj], V, "OutputProjection")
                lm_input = tf1.cond(
                    finished,
                    lambda: tf1.zeros([B, spec.emb_size]),
                    lambda: next_token_emb(time, output))
            lm_output, next_lm_state = lm_cell(lm_input, lm_state)
            if spec.lm_hidden != spec.hidden:
                lm_output = _linear(tf1, [lm_output], spec.hidden,
                                    "SimpleProjection")
            next_input = _linear(tf1, [lm_output, ctx], spec.emb_size,
                                 "InputProjection")
            elements_finished = tf1.fill([B], finished)
            return (elements_finished, next_input, next_state, output,
                    (next_lm_state, ctx))
        return loop_fn

    def teacher_emb(time, output):
        return inputs_ta.read(tf1.minimum(time, spec.T_dec - 1))

    outputs_ta, _, _ = tf1.nn.raw_rnn(
        main_cell, make_loop_fn(steps, teacher_emb, inputs_ta.read(0)))
    logits = outputs_ta.stack()   # [steps, B, V]
    if not greedy_steps:
        return logits

    def argmax_emb(time, output):
        ids = tf1.argmax(output, axis=-1)
        return tf1.nn.embedding_lookup(embedding, ids)

    # Second raw_rnn re-enters variable scope "rnn": the cells are built Layer
    # objects (variables shared by object identity) and every _linear uses
    # AUTO_REUSE, so no new model variables are created.
    greedy_ta, _, _ = tf1.nn.raw_rnn(
        main_cell, make_loop_fn(greedy_steps, argmax_emb, go_emb))
    return logits, greedy_ta.stack()   # [greedy_steps, B, V]


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


def _learnable_batch(spec: FixtureSpec, rng, basis, frames_per_token: int):
    """One batch of the learnable synthetic task (data/synth.py's recipe:
    features are per-token basis patterns repeated over frames + noise), in
    the fixture's fixed placeholder shapes."""
    max_tok = spec.T_dec - 2
    feats = np.zeros((spec.B, spec.T, spec.feat), np.float32)
    lens = np.zeros((spec.B,), np.int32)
    dec_ids = np.zeros((spec.T_dec, spec.B), np.int32)   # <pad>=0 tail
    tgt_lens = np.zeros((spec.B,), np.int32)
    for b in range(spec.B):
        n_tok = int(rng.integers(2, max_tok + 1))
        tokens = rng.integers(3, spec.vocab, size=n_tok)
        frames = np.repeat(basis[tokens], frames_per_token, axis=0)
        frames = frames + rng.normal(scale=0.05, size=frames.shape)
        L = frames.shape[0]
        feats[b, :L] = frames
        lens[b] = L
        dec_ids[0, b] = GO_ID
        dec_ids[1:1 + n_tok, b] = tokens
        dec_ids[1 + n_tok, b] = 2                        # <eos>
        tgt_lens[b] = n_tok + 1       # predictions: tokens + <eos>
    return feats, lens, dec_ids, tgt_lens


def build_trained_fixture(out_dir: str, spec: FixtureSpec | None = None, *,
                          train_steps: int = 300, lr: float = 5e-3,
                          greedy_steps: int = 12,
                          frames_per_token: int = 2) -> dict:
    """Train the REAL TF reference graph and save the trained artifact chain.

    This reproduces the reference's actual workflow (train.py:297-299 ->
    checkpoint -> eval_model.py:56-118 greedy decode): the graph is trained
    with the reference's loss semantics (length-normalized masked CE,
    losses.py:30-35) under Adam + global-norm clip 5.0
    (seq2seq_model.py:137-155), checkpointed with genuine Adam slots, and the
    TF-side greedy decode (argmax feedback, decoder.py:139-153) is recorded on
    a held-out batch — golden data for proving the converted JAX model decodes
    a TRAINED checkpoint identically.

    Writes the same artifact set as build_fixture plus golden entries:
        greedy_logits [greedy_steps, B, V], greedy_ids [greedy_steps, B],
        tgt_lens, loss_first, loss_last.
    """
    spec = spec or FixtureSpec(B=8, T=12, T_dec=8, seed=11)
    assert (spec.T_dec - 2) * frames_per_token <= spec.T
    tf1 = _tf()
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(spec.seed)
    basis = np.random.default_rng(1234).normal(
        size=(spec.vocab, spec.feat)).astype(np.float32)

    g = tf1.Graph()
    with g.as_default():
        tf1.set_random_seed(spec.seed)
        feats_ph = tf1.placeholder(tf1.float32, [spec.B, spec.T, spec.feat])
        lens_ph = tf1.placeholder(tf1.int32, [spec.B])
        dec_ph = tf1.placeholder(tf1.int32, [spec.T_dec, spec.B])
        tgt_lens_ph = tf1.placeholder(tf1.int32, [spec.B])
        with tf1.variable_scope("model"):
            tf1.Variable(lr, trainable=False)
            tf1.Variable(0, trainable=False)
            tf1.Variable(0, trainable=False)
            with tf1.variable_scope("encoder"):
                enc_tm, enc_lens = _encoder(
                    tf1, spec, tf1.transpose(feats_ph, [1, 0, 2]), lens_ph)
            enc_bm = tf1.transpose(enc_tm, [1, 0, 2])
            with tf1.variable_scope("rnn_decoder_char"):
                logits, greedy_logits = _decoder(
                    tf1, spec, enc_bm, enc_lens, dec_ph,
                    greedy_steps=greedy_steps)
            # Reference loss: per-step masked CE, per-example sum/target_len,
            # batch mean (losses.py:30-35; targets shifted by one,
            # tf_utils.py:4-12).
            targets = dec_ph[1:]                          # [T_dec-1, B]
            mask = tf1.transpose(tf1.sequence_mask(
                tgt_lens_ph, maxlen=spec.T_dec - 1, dtype=tf1.float32))
            ce = tf1.nn.sparse_softmax_cross_entropy_with_logits(
                labels=targets, logits=logits) * mask
            loss = tf1.reduce_mean(
                tf1.reduce_sum(ce, 0) / tf1.cast(tgt_lens_ph, tf1.float32))
            # Adam + global-norm clip 5.0 (seq2seq_model.py:137-155).
            opt = tf1.train.AdamOptimizer(lr)
            grads_vars = opt.compute_gradients(loss)
            grads, _ = tf1.clip_by_global_norm(
                [gv[0] for gv in grads_vars], 5.0)
            train_op = opt.apply_gradients(
                zip(grads, [gv[1] for gv in grads_vars]))

        saver = tf1.train.Saver(write_version=tf1.train.SaverDef.V2)
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            loss_first = loss_last = None
            for step in range(train_steps):
                f, le, d, tl = _learnable_batch(spec, rng, basis,
                                                frames_per_token)
                _, lval = sess.run([train_op, loss], {
                    feats_ph: f, lens_ph: le, dec_ph: d, tgt_lens_ph: tl})
                if step == 0:
                    loss_first = float(lval)
                loss_last = float(lval)
            # Held-out golden batch (fresh draws from the same distribution).
            ev = np.random.default_rng(spec.seed + 999)
            f, le, d, tl = _learnable_batch(spec, ev, basis, frames_per_token)
            feed = {feats_ph: f, lens_ph: le, dec_ph: d, tgt_lens_ph: tl}
            enc_out, enc_out_lens, logits_out, greedy_out = sess.run(
                [enc_bm, enc_lens, logits, greedy_logits], feed)
            ckpt_path = saver.save(sess, os.path.join(out_dir, "tf_ckpt"),
                                   write_meta_graph=False)

    reader = tf1.train.NewCheckpointReader(ckpt_path)
    dump = {n: reader.get_tensor(n)
            for n in reader.get_variable_to_shape_map()
            if "Adam" not in n}
    npz_path = os.path.join(out_dir, "dump.npz")
    np.savez(npz_path, **dump)

    golden_path = os.path.join(out_dir, "golden.npz")
    np.savez(golden_path, feats=f, lens=le, dec_ids=d, tgt_lens=tl,
             enc_out=enc_out, enc_out_lens=enc_out_lens, logits=logits_out,
             greedy_logits=greedy_out,
             greedy_ids=np.argmax(greedy_out, axis=-1).astype(np.int32),
             loss_first=loss_first, loss_last=loss_last)
    return {"ckpt": ckpt_path, "npz": npz_path, "golden": golden_path,
            "names": sorted(dump), "loss_first": loss_first,
            "loss_last": loss_last}


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
