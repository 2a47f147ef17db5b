"""Train a token-level trigram LM from the corpus's LM shards — shallow
fusion without any neural-LM training.

Witten-Bell interpolated smoothing (parameter-free):

    p(w | u, v) = (c(u,v,w) + T(u,v) * p(w | v)) / (c(u,v) + T(u,v))

recursing through the bigram to the unigram, whose base is uniform over
the vocabulary; T(h) counts distinct continuations of context h. The
result is a DENSE [V, V, V] log-probability table (char-level vocabularies
are small — 40 tokens = 256 KB at f32... 64e3 contexts — so the fused
beams get next-token log-probs with ONE gather, no backoff control flow on
device). Guarded for large (BPE) vocabularies where the dense table would
not fit; use the RNN-LM there.

Sentence framing matches the LM task (data/lm.py): sequences are
[<go>, tokens..., <eos>]; contexts before the start are <go>-padded, so
the table's (<go>, <go>) row is the sentence-initial distribution and
p(<eos> | u, v) terminates — exactly the quantities the fused beams ask
for (eval/ctc_beam.py's terminal term, the attention beam's <eos> step).

Artifact: `<out>.npz` with {"ngram": [V,V,V] f32 logp} — `-lm_path` on the
eval CLI detects the key and fuses it through the same hooks as an RNN-LM
(models/rnn_lm.py fusion_step).

No reference counterpart (the reference's only LM is the weight-tied RNN,
lm_model.py).
"""
from __future__ import annotations

import argparse
import glob
from collections import Counter, defaultdict

import numpy as np

MAX_DENSE_VOCAB = 128


def count_ngrams(seqs) -> tuple[Counter, Counter, Counter]:
    """seqs: iterables of token ids INCLUDING <go>... <eos>.
    Returns (trigram, bigram, unigram) counters; contexts <go>-padded."""
    tri, bi, uni = Counter(), Counter(), Counter()
    for seq in seqs:
        seq = list(seq)
        if not seq:
            continue
        go = seq[0]
        hist = [go, go]
        for w in seq[1:]:
            uni[w] += 1
            bi[(hist[1], w)] += 1
            tri[(hist[0], hist[1], w)] += 1
            hist = [hist[1], w]
    return tri, bi, uni


def witten_bell_table(tri: Counter, bi: Counter, uni: Counter,
                      vocab_size: int) -> np.ndarray:
    """Dense [V, V, V] log p(w | u, v) with Witten-Bell interpolation."""
    V = vocab_size
    n_uni = sum(uni.values())
    t_uni = len(uni)
    p1 = np.full((V,), 0.0, np.float64)
    for w, c in uni.items():
        p1[w] = c
    # unigram interpolates with uniform (handles unseen tokens).
    p1 = (p1 + t_uni / V) / (n_uni + t_uni)

    c_bi_ctx = Counter()
    t_bi = defaultdict(set)
    for (v, w), c in bi.items():
        c_bi_ctx[v] += c
        t_bi[v].add(w)
    p2 = np.broadcast_to(p1, (V, V)).copy()
    for v in c_bi_ctx:
        T = len(t_bi[v])
        denom = c_bi_ctx[v] + T
        p2[v] = T * p1 / denom
    for (v, w), c in bi.items():
        T = len(t_bi[v])
        p2[v, w] += c / (c_bi_ctx[v] + T)

    c_tri_ctx = Counter()
    t_tri = defaultdict(set)
    for (u, v, w), c in tri.items():
        c_tri_ctx[(u, v)] += c
        t_tri[(u, v)].add(w)
    p3 = np.broadcast_to(p2, (V, V, V)).copy()
    for (u, v) in c_tri_ctx:
        T = len(t_tri[(u, v)])
        denom = c_tri_ctx[(u, v)] + T
        p3[u, v] = T * p2[v] / denom
    for (u, v, w), c in tri.items():
        T = len(t_tri[(u, v)])
        p3[u, v, w] += c / (c_tri_ctx[(u, v)] + T)

    return np.log(np.maximum(p3, 1e-30)).astype(np.float32)


def read_lm_corpus(lm_glob: str):
    """Token sequences (with <go>/<eos>) from LM TFRecord shards."""
    from e2e_asr_tpu.data import example as pb
    from e2e_asr_tpu.data import tfrecord

    files = sorted(glob.glob(lm_glob))
    if not files:
        raise FileNotFoundError(f"no LM shards match {lm_glob}")
    for f in files:
        for rec in tfrecord.read_records(f):
            context, feature_lists = pb.decode_sequence_example(rec)
            yield [int(x[0]) for x in feature_lists["cint"]]


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(
        description="train a Witten-Bell trigram LM from LM shards")
    p.add_argument("-lm_glob", required=True,
                   help="LM TFRecord shards, e.g. data/tfrecords/lm/lm.*")
    p.add_argument("-vocab", required=True, help="char.vocab path")
    p.add_argument("-out", required=True, help="output .npz artifact")
    args = p.parse_args(argv)

    from e2e_asr_tpu.data import text
    _, rev_vocab = text.initialize_vocabulary(args.vocab)
    V = len(rev_vocab)
    if V > MAX_DENSE_VOCAB:
        raise ValueError(
            f"vocab {V} > {MAX_DENSE_VOCAB}: the dense [V,V,V] table is a "
            f"small-vocabulary (char-level) design; use the RNN-LM for BPE")

    n = 0
    def seqs():
        nonlocal n
        for s in read_lm_corpus(args.lm_glob):
            n += 1
            yield s
    tri, bi, uni = count_ngrams(seqs())
    table = witten_bell_table(tri, bi, uni, V)
    np.savez(args.out if args.out.endswith(".npz") else args.out + ".npz",
             ngram=table)
    out = args.out if args.out.endswith(".npz") else args.out + ".npz"
    print(f"Trained trigram on {n} sequences -> {out} "
          f"({table.nbytes / 1e6:.1f} MB)")
    return {"sequences": n, "vocab": V, "path": out}


if __name__ == "__main__":
    main()
