"""Measure the reference TensorFlow train-step throughput for real.

The headline `vs_baseline` ratio previously divided by an ESTIMATE of the
reference's GPU-era throughput (BENCH_DETAILS.json
`tf_baseline_frames_per_sec_estimate`). TensorFlow is installed in this
environment, so the reference train step itself is measurable: this tool
builds the reference's graph (tools/tf_fixture.py — genuine TF cells under
the reference scopes, the reference's length-normalized masked CE
(/root/reference/losses.py:30-35), Adam + global-norm clip 5.0
(/root/reference/seq2seq_model.py:137-155)) at the bench flagship shape
(B=128, T=384, feat=80 — /root/reference/train.py:43-44 bucket 0) and times
`sess.run([train_op, loss])` exactly as the reference hot loop does
(/root/reference/train.py:297-299).

The number is an honest HOST-CPU measurement: no GPU exists here and TF has
no path to the TPU, so it is a lower bound on (and hardware-incomparable
with) the reference's original single-GPU throughput. It replaces an assumed
constant with a measured one; BENCH_DETAILS records both, and the headline
ratio keeps using the (higher, more conservative) GPU-era estimate.

Usage:  python -m e2e_asr_tpu.tools.tf_baseline [-steps N] [-B N] [-T N]
Prints one JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np

from e2e_asr_tpu.tools.tf_fixture import FixtureSpec, _decoder, _encoder, _tf


def build_train_graph(tf1, spec: FixtureSpec, lr: float = 1e-3):
    """Reference train graph at an arbitrary shape: placeholders -> encoder ->
    attention decoder -> masked CE -> Adam+clip train_op."""
    feats_ph = tf1.placeholder(tf1.float32, [spec.B, spec.T, spec.feat])
    lens_ph = tf1.placeholder(tf1.int32, [spec.B])
    dec_ph = tf1.placeholder(tf1.int32, [spec.T_dec, spec.B])
    tgt_lens_ph = tf1.placeholder(tf1.int32, [spec.B])
    with tf1.variable_scope("model"):
        with tf1.variable_scope("encoder"):
            enc_tm, enc_lens = _encoder(
                tf1, spec, tf1.transpose(feats_ph, [1, 0, 2]), lens_ph)
        enc_bm = tf1.transpose(enc_tm, [1, 0, 2])
        with tf1.variable_scope("rnn_decoder_char"):
            logits = _decoder(tf1, spec, enc_bm, enc_lens, dec_ph)
        targets = dec_ph[1:]
        mask = tf1.transpose(tf1.sequence_mask(
            tgt_lens_ph, maxlen=spec.T_dec - 1, dtype=tf1.float32))
        ce = tf1.nn.sparse_softmax_cross_entropy_with_logits(
            labels=targets, logits=logits) * mask
        loss = tf1.reduce_mean(
            tf1.reduce_sum(ce, 0) / tf1.cast(tgt_lens_ph, tf1.float32))
        opt = tf1.train.AdamOptimizer(lr)
        grads_vars = opt.compute_gradients(loss)
        grads, _ = tf1.clip_by_global_norm([gv[0] for gv in grads_vars], 5.0)
        train_op = opt.apply_gradients(
            zip(grads, [gv[1] for gv in grads_vars]))
    phs = (feats_ph, lens_ph, dec_ph, tgt_lens_ph)
    return phs, train_op, loss


def measure(spec: FixtureSpec, *, steps: int = 5, warmup: int = 2,
            intra_threads: int = 0) -> dict:
    """Time the reference train step; returns timings + frames/sec.

    intra_threads=0 lets TF use all host cores (favourable to the baseline);
    the reference itself pinned intra_op_parallelism_threads=1
    (/root/reference/train.py:178) — that configuration is strictly slower.
    """
    tf1 = _tf()
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(spec.B, spec.T, spec.feat)).astype(np.float32)
    lens = np.full((spec.B,), spec.T, np.int32)
    dec_ids = rng.integers(3, spec.vocab, size=(spec.T_dec, spec.B))
    dec_ids[0, :] = 1
    dec_ids = dec_ids.astype(np.int32)
    tgt_lens = np.full((spec.B,), spec.T_dec - 1, np.int32)

    g = tf1.Graph()
    with g.as_default():
        tf1.set_random_seed(0)
        phs, train_op, loss = build_train_graph(tf1, spec)
        config = tf1.ConfigProto(
            intra_op_parallelism_threads=intra_threads,
            inter_op_parallelism_threads=intra_threads)
        with tf1.Session(config=config) as sess:
            sess.run(tf1.global_variables_initializer())
            feed = dict(zip(phs, (feats, lens, dec_ids, tgt_lens)))
            for _ in range(warmup):
                sess.run([train_op, loss], feed)
            times = []
            for _ in range(steps):
                t0 = time.perf_counter()
                sess.run([train_op, loss], feed)
                times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "metric": "tf_reference_train_frames_per_sec",
        "value": spec.B * spec.T / best,
        "unit": "frames/sec",
        "step_ms_best": best * 1e3,
        "step_ms_mean": float(np.mean(times)) * 1e3,
        "steps_timed": steps,
        "shape": {"B": spec.B, "T": spec.T, "feat": spec.feat,
                  "T_dec": spec.T_dec, "hidden": spec.hidden,
                  "enc_layers": spec.enc_layers, "vocab": spec.vocab},
        "hardware": "host CPU (no GPU/TPU path exists for TF here)",
    }


def flagship_spec(B: int = 128, T: int = 384, T_dec: int = 48) -> FixtureSpec:
    """The bench.py flagship shape with the reference default model size
    (encoder.py:23 hidden 256, decoder.py:26-29, attn_decoder.py:25-26,
    seq2seq_model.py:34: 4 enc layers)."""
    return FixtureSpec(feat=80, hidden=256, emb_size=256, attn_vec=128,
                       vocab=40, enc_layers=4, dec_layers=1, lm_hidden=256,
                       B=B, T=T, T_dec=T_dec)


def main(argv=None) -> None:
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-steps", type=int, default=5)
    p.add_argument("-warmup", type=int, default=2)
    p.add_argument("-B", type=int, default=128)
    p.add_argument("-T", type=int, default=384)
    p.add_argument("-T_dec", type=int, default=48)
    args = p.parse_args(argv)
    result = measure(flagship_spec(args.B, args.T, args.T_dec),
                     steps=args.steps, warmup=args.warmup)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
