"""Dynamic-batching serving engine: many concurrent transcription requests,
batched onto the chip.

Extension (no reference counterpart — /root/reference decodes offline
files). TPU-first design:

- **Static shapes only**: requests are grouped into fixed frame-length
  buckets and padded to a fixed batch size, so each (bucket, B) pair
  compiles exactly once and every subsequent batch reuses the executable.
  This is the serving analogue of training's bucketed batches
  (data/speech.py).
- **Batch to fill the MXU**: a background worker drains the queue, packing
  up to `max_batch` same-bucket requests per launch; under light load it
  waits at most `max_wait_ms` before launching a partial (padded) batch,
  trading a bounded latency for occupancy.
- **Row independence**: the batched beam decode treats rows independently
  and the encoder masks by `logmel_len`, so padding rows and shorter
  utterances sharing a bucket cannot perturb a request's transcript —
  batched output == one-by-one output (tests/test_serving.py pins this).

Feed float32 log-mel features (frontend.logmel.featurize_utterance for raw
audio); results come back as futures resolving to transcript strings —
or (text, confidence) pairs with `with_confidence=True`. Production
extras: an engine-level biasing glossary (`bias=`), PER-REQUEST hotword
lists (`per_request_bias=` + `submit(feats, boost_phrases=[...])`),
RNN-LM or trigram fusion (`lm_params=`), int8 QuantState params, and a
data-parallel device mesh.
"""
from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import BeamConfig, Seq2SeqConfig
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval.beam_eval import make_beam_decoder


def _make_family_decoder(cfg: Seq2SeqConfig, beam_cfg: BeamConfig, *,
                         compute_dtype=None, lm_params=None, bias=None,
                         nbest_scores: bool = False):
    """decode(params, batch) -> (tokens [B, L], lens [B], scores) for any
    model family: attention beam (the reference-parity path), CTC
    best-path/prefix beam, or transducer greedy/time-synchronous beam.
    Every variant dequantizes int8 trees inside the jit. lm_params +
    beam_cfg.lm_weight engage RNN-LM shallow fusion on every family's
    beam; beam_cfg.lm_rescore engages second-pass n-best LM re-ranking
    (eval/rescore.apply_lm_rescore, same semantics as the eval CLI);
    bias = (trie, boost_weight) engages contextual biasing
    (eval/biasing.py) — the engine-level glossary applies to every
    request.

    nbest_scores=True: scores is the FULL sorted candidate set [B, k]
    (k = max(beam_size, 2); forces the beam path) so callers can derive an
    n-best posterior confidence; otherwise scores is a per-row scalar."""
    import jax

    from e2e_asr_tpu.core import quant

    use_lm = beam_cfg.lm_weight != 0.0
    use_ilm = beam_cfg.ilm_weight != 0.0
    use_rescore = beam_cfg.lm_rescore != 0.0
    use_bias = bias is not None and bias[1] != 0.0
    if use_lm and use_rescore:
        raise ValueError("-lm_rescore (second pass) and -lm_weight (per-"
                         "step fusion) are two LM applications; pick one")
    k = max(beam_cfg.beam_size, 2) if nbest_scores else beam_cfg.beam_size
    if cfg.model_family == "transducer":
        if (use_lm or use_rescore) and lm_params is None:
            raise ValueError("transducer LM fusion/rescoring needs "
                             "lm_params (no internal shared LM in this "
                             "family)")

        @jax.jit
        def run(params, feats, feat_lens):
            params = quant.maybe_dequantize(params)
            if k > 1 or use_lm or use_ilm or use_bias or use_rescore:
                from e2e_asr_tpu.eval import transducer_beam as tb
                from e2e_asr_tpu.eval.rescore import apply_lm_rescore
                from e2e_asr_tpu.models import seq2seq as s2s
                attn_states, _, enc_lens = s2s.encode(
                    params, cfg, feats, feat_lens,
                    compute_dtype=compute_dtype)
                depth = cfg.num_layers["char"]
                seqs, lens_k, scores = tb.transducer_beam_decode(
                    params, cfg, attn_states[depth], enc_lens[depth],
                    beam_size=max(k, 1), compute_dtype=compute_dtype,
                    lm_params=lm_params, lm_weight=beam_cfg.lm_weight,
                    ilm_weight=beam_cfg.ilm_weight, bias=bias)
                if use_rescore:
                    seqs, lens_k, scores = apply_lm_rescore(
                        seqs, lens_k, scores, lm_params,
                        beam_cfg.lm_rescore, eos_in_seq=False)
                if nbest_scores:
                    return seqs[:, 0], lens_k[:, 0], scores
                return seqs[:, 0], lens_k[:, 0], scores[:, 0]
            from e2e_asr_tpu.models import transducer
            tokens = transducer.greedy_decode(
                params, cfg, feats, feat_lens, compute_dtype=compute_dtype)
            lens = (tokens != 0).sum(axis=-1)
            return tokens, lens, jnp.zeros(tokens.shape[0], jnp.float32)
    elif cfg.model_family == "ctc":
        if (use_lm or use_rescore) and lm_params is None:
            raise ValueError("CTC LM fusion/rescoring needs lm_params "
                             "(no internal shared LM in this family)")
        if use_ilm:
            raise ValueError("ilm_weight needs a decoder-bearing family "
                             "(attention/transducer); pure CTC has no "
                             "internal LM to subtract")

        @jax.jit
        def run(params, feats, feat_lens):
            params = quant.maybe_dequantize(params)
            if k > 1 or use_lm or use_bias or use_rescore:
                from e2e_asr_tpu.eval.ctc_beam import ctc_beam_decode
                from e2e_asr_tpu.eval.rescore import apply_lm_rescore
                from e2e_asr_tpu.models import ctc
                lg, enc_lens = ctc.logits(params, cfg, feats, feat_lens,
                                          compute_dtype=compute_dtype)
                seqs, lens_k, scores = ctc_beam_decode(
                    jax.nn.log_softmax(lg, axis=-1), enc_lens,
                    beam_size=max(k, 1), blank_id=ctc.BLANK_ID,
                    lm_params=lm_params, lm_weight=beam_cfg.lm_weight,
                    bias=bias)
                if use_rescore:
                    seqs, lens_k, scores = apply_lm_rescore(
                        seqs, lens_k, scores, lm_params,
                        beam_cfg.lm_rescore, eos_in_seq=False)
                if nbest_scores:
                    return seqs[:, 0], lens_k[:, 0], scores
                return seqs[:, 0], lens_k[:, 0], scores[:, 0]
            from e2e_asr_tpu.models import ctc
            tokens = ctc.greedy_decode(params, cfg, feats, feat_lens,
                                       compute_dtype=compute_dtype)
            lens = (tokens != 0).sum(axis=-1)
            return tokens, lens, jnp.zeros(tokens.shape[0], jnp.float32)
    else:
        if nbest_scores:
            nb = make_beam_decoder(cfg, beam_cfg,
                                   compute_dtype=compute_dtype,
                                   lm_params=lm_params, bias=bias, nbest=k)

            def decode(params, batch):
                seqs, lens_k, scores = nb(params, batch)
                return seqs[:, 0], lens_k[:, 0], scores
            return decode
        return make_beam_decoder(cfg, beam_cfg, compute_dtype=compute_dtype,
                                 lm_params=lm_params, bias=bias)

    def decode(params, batch):
        return run(params, batch["logmel"], batch["logmel_len"])

    return decode


def _make_per_request_bias_decoder(cfg: Seq2SeqConfig, beam_cfg: BeamConfig,
                                   *, compute_dtype=None, lm_params=None,
                                   weight: float, nbest_scores: bool = False):
    """decode(params, batch) where batch carries `bias_tries` — per-row
    padded biasing tries stacked on the batch axis ([B,N,V]/[B,N] leaves,
    eval/biasing.py's batched shapes). The tries are PROGRAM INPUTS, so
    every request's hotword list shares one compiled executable.

    nbest_scores=True: scores is the sorted candidate set [B, k] (k >= 2)
    for n-best posterior confidence, like _make_family_decoder's."""
    from e2e_asr_tpu.core import quant

    k = max(beam_cfg.beam_size, 2) if nbest_scores else max(
        beam_cfg.beam_size, 1)
    use_lm = beam_cfg.lm_weight != 0.0
    use_rescore = beam_cfg.lm_rescore != 0.0
    if use_lm and use_rescore:
        raise ValueError("-lm_rescore (second pass) and -lm_weight (per-"
                         "step fusion) are two LM applications; pick one")
    if cfg.model_family == "transducer":
        if (use_lm or use_rescore) and lm_params is None:
            raise ValueError("transducer LM fusion/rescoring needs "
                             "lm_params (no internal shared LM in this "
                             "family)")

        @jax.jit
        def run(params, feats, feat_lens, tries):
            params = quant.maybe_dequantize(params)
            from e2e_asr_tpu.eval import transducer_beam as tb
            from e2e_asr_tpu.eval.rescore import apply_lm_rescore
            from e2e_asr_tpu.models import seq2seq as s2s
            attn_states, _, enc_lens = s2s.encode(
                params, cfg, feats, feat_lens, compute_dtype=compute_dtype)
            depth = cfg.num_layers["char"]
            seqs, lens_k, scores = tb.transducer_beam_decode(
                params, cfg, attn_states[depth], enc_lens[depth],
                beam_size=k, compute_dtype=compute_dtype,
                lm_params=lm_params, lm_weight=beam_cfg.lm_weight,
                ilm_weight=beam_cfg.ilm_weight, bias=(tries, weight))
            if use_rescore:
                seqs, lens_k, scores = apply_lm_rescore(
                    seqs, lens_k, scores, lm_params, beam_cfg.lm_rescore,
                    eos_in_seq=False)
            return (seqs[:, 0], lens_k[:, 0],
                    scores if nbest_scores else scores[:, 0])
    elif cfg.model_family == "ctc":
        if (use_lm or use_rescore) and lm_params is None:
            raise ValueError("CTC LM fusion/rescoring needs lm_params "
                             "(no internal shared LM in this family)")
        if beam_cfg.ilm_weight != 0.0:
            raise ValueError("ilm_weight needs a decoder-bearing family "
                             "(attention/transducer); pure CTC has no "
                             "internal LM to subtract")

        @jax.jit
        def run(params, feats, feat_lens, tries):
            params = quant.maybe_dequantize(params)
            from e2e_asr_tpu.eval.ctc_beam import ctc_beam_decode
            from e2e_asr_tpu.eval.rescore import apply_lm_rescore
            from e2e_asr_tpu.models import ctc
            lg, enc_lens = ctc.logits(params, cfg, feats, feat_lens,
                                      compute_dtype=compute_dtype)
            seqs, lens_k, scores = ctc_beam_decode(
                jax.nn.log_softmax(lg, axis=-1), enc_lens, beam_size=k,
                blank_id=ctc.BLANK_ID, lm_params=lm_params,
                lm_weight=beam_cfg.lm_weight, bias=(tries, weight))
            if use_rescore:
                seqs, lens_k, scores = apply_lm_rescore(
                    seqs, lens_k, scores, lm_params, beam_cfg.lm_rescore,
                    eos_in_seq=False)
            return (seqs[:, 0], lens_k[:, 0],
                    scores if nbest_scores else scores[:, 0])
    else:
        if (nbest_scores or use_rescore) and beam_cfg.beam_size < k:
            import dataclasses
            beam_cfg = dataclasses.replace(beam_cfg, beam_size=k)

        @jax.jit
        def run(params, feats, feat_lens, tries):
            params = quant.maybe_dequantize(params)
            from e2e_asr_tpu.eval.beam import beam_decode
            from e2e_asr_tpu.eval.rescore import apply_lm_rescore
            from e2e_asr_tpu.models import rnn_lm, seq2seq
            lm_p = lm_params
            if lm_p is None and (use_lm or use_rescore):
                lm_p = rnn_lm.shared_lm_params(
                    params, dec_cfg=cfg.decoders["char"],
                    horizon=max(512, beam_cfg.max_steps + 2))
            attn_states, _, enc_lens = seq2seq.encode(
                params, cfg, feats, feat_lens, compute_dtype=compute_dtype)
            depth = cfg.num_layers["char"]
            if nbest_scores or use_rescore:
                (_, _, _), (seqs, lens_k, scores) = beam_decode(
                    params["decoder_char"], cfg.decoders["char"], beam_cfg,
                    attn_states[depth], enc_lens[depth], lm_params=lm_p,
                    bias=(tries, weight), return_nbest=True)
                if use_rescore:
                    seqs, lens_k, scores = apply_lm_rescore(
                        seqs, lens_k, scores, lm_p, beam_cfg.lm_rescore,
                        eos_in_seq=True)
                else:
                    order = jnp.argsort(-scores, axis=1, stable=True)
                    seqs = jnp.take_along_axis(seqs, order[:, :, None],
                                               axis=1)
                    lens_k = jnp.take_along_axis(lens_k, order, axis=1)
                    scores = jnp.take_along_axis(scores, order, axis=1)
                return (seqs[:, 0], lens_k[:, 0],
                        scores[:, :k] if nbest_scores else scores[:, 0])
            return beam_decode(params["decoder_char"], cfg.decoders["char"],
                               beam_cfg, attn_states[depth],
                               enc_lens[depth], lm_params=lm_p,
                               bias=(tries, weight))

    def decode(params, batch):
        return run(params, batch["logmel"], batch["logmel_len"],
                   batch["bias_tries"])

    return decode


def nbest_posterior_confidence(scores: np.ndarray) -> np.ndarray:
    """Top-hypothesis posterior within the n-best candidate set: softmax
    over valid (non-sentinel) scores, [B, k] -> [B]. The standard
    calibration-free confidence proxy — 1.0 when nothing else survived."""
    s = np.where(scores <= -1e29, -np.inf, scores.astype(np.float64))
    m = np.max(s, axis=1, keepdims=True)
    e = np.exp(s - m)
    return (e[:, 0] / np.maximum(e.sum(axis=1), 1e-30)).astype(np.float32)


@dataclass
class ServingStats:
    requests: int = 0
    batches: int = 0
    rows_decoded: int = 0          # includes padding rows
    occupancy_sum: float = 0.0     # real rows / batch rows, summed

    @property
    def mean_occupancy(self) -> float:
        return self.occupancy_sum / self.batches if self.batches else 0.0


@dataclass
class _Request:
    feats: np.ndarray              # [T, feat] float32
    t: float = field(default_factory=time.monotonic)   # enqueue time
    future: Future = field(default_factory=Future)
    trie: dict | None = None       # per-request padded biasing trie


class BatchingTranscriber:
    """Queue -> bucket -> pad -> batched beam decode -> transcripts."""

    def __init__(self, params, cfg: Seq2SeqConfig, rev_vocab: list[str], *,
                 beam_cfg: BeamConfig | None = None,
                 bucket_frames: tuple[int, ...] = (128, 256, 512),
                 max_batch: int = 8, max_wait_ms: float = 20.0,
                 compute_dtype=None, mesh=None, lm_params=None, bias=None,
                 with_confidence: bool = False,
                 per_request_bias: float = 0.0, max_trie_nodes: int = 64):
        """mesh: optional jax.sharding.Mesh for data-parallel serving —
        params are replicated, each launch's batch rows are sharded over
        the "data" axis (one jitted SPMD program; XLA handles the rest).
        max_batch must be divisible by the data-axis size.

        bias: (trie, boost_weight) engine-level contextual-biasing glossary
        (eval/biasing.py) applied to every request's beam.

        with_confidence: futures resolve to (text, confidence) where
        confidence is the hypothesis's posterior within the beam's n-best
        (nbest_posterior_confidence); forces the beam path (k >= 2).

        per_request_bias > 0: submit(feats, boost_phrases=[...]) boosts
        EACH request's own hotword list at this weight — tries are padded
        to max_trie_nodes and stacked on the batch axis as a program
        INPUT, so mixed phrase lists share one compiled executable
        (requests without phrases ride an empty trie). Composes with
        `with_confidence` and a DP mesh; mutually exclusive with the
        engine-level `bias` glossary (one trie per row)."""
        self.mesh = mesh
        if mesh is not None and max_batch % mesh.shape["data"]:
            raise ValueError(
                f"max_batch {max_batch} not divisible by the mesh's "
                f"data axis ({mesh.shape['data']})")
        self.params = params       # float tree or core.quant.QuantState
        if mesh is not None:
            from e2e_asr_tpu.core import mesh as mesh_lib
            self.params = mesh_lib.replicate(mesh, params)
        self.cfg = cfg
        self.rev_vocab = rev_vocab
        self.bucket_frames = tuple(sorted(bucket_frames))
        self.max_batch = int(max_batch)
        self.max_wait_s = max_wait_ms / 1e3
        self.stats = ServingStats()
        bc = beam_cfg or BeamConfig(beam_size=4,
                                    max_steps=cfg.max_output["char"])
        self.per_request_bias = float(per_request_bias)
        self.max_trie_nodes = int(max_trie_nodes)
        if self.per_request_bias > 0:
            if bias is not None:
                raise ValueError("per_request_bias and the engine-level "
                                 "bias glossary are mutually exclusive")
            # with_confidence and a DP mesh both compose: the tries ride the
            # batch dict (shard_batch sharding dim 0 of every leaf), and the
            # nbest_scores variant returns the sorted [B, k] candidate set.
            self._decode = _make_per_request_bias_decoder(
                cfg, bc, compute_dtype=compute_dtype, lm_params=lm_params,
                weight=self.per_request_bias, nbest_scores=with_confidence)
            self._vocab = {tok: i for i, tok in enumerate(rev_vocab)}
            from e2e_asr_tpu.eval import biasing as biasing_lib
            self._empty_trie = jax.tree_util.tree_map(
                np.asarray, biasing_lib.build_bias_trie(
                    [], len(rev_vocab), pad_to=self.max_trie_nodes))
        else:
            self._decode = _make_family_decoder(
                cfg, bc, compute_dtype=compute_dtype, lm_params=lm_params,
                bias=bias, nbest_scores=with_confidence)
        self.with_confidence = with_confidence
        self._queues: dict[int, list[_Request]] = {
            b: [] for b in self.bucket_frames}
        self._cv = threading.Condition()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client API --------------------------------------------------------

    def submit(self, feats: np.ndarray,
               boost_phrases: list[str] | None = None) -> Future:
        """Non-blocking: returns a Future resolving to the transcript.

        boost_phrases (per_request_bias mode): THIS request's hotword list
        — tokenized like training targets and compiled into its padded
        biasing trie."""
        feats = np.asarray(feats, np.float32)
        if feats.ndim != 2 or feats.shape[1] != self.cfg.feat_length:
            raise ValueError(f"feats must be [T, {self.cfg.feat_length}], "
                             f"got {feats.shape}")
        if feats.shape[0] > self.bucket_frames[-1]:
            raise ValueError(
                f"utterance of {feats.shape[0]} frames exceeds the largest "
                f"bucket ({self.bucket_frames[-1]}); use eval/longform for "
                "long-form audio")
        trie = None
        if boost_phrases:
            if self.per_request_bias <= 0:
                raise ValueError("construct the engine with "
                                 "per_request_bias > 0 to boost per-request "
                                 "phrases")
            from e2e_asr_tpu.data.bpe import is_bpe_vocab, sentence_to_ids_bpe
            from e2e_asr_tpu.eval import biasing as biasing_lib
            enc = (sentence_to_ids_bpe if is_bpe_vocab(self.rev_vocab)
                   else text.sentence_to_ids)
            ids = [list(enc(p, self._vocab, add_go_eos=False))
                   for p in boost_phrases]
            trie = jax.tree_util.tree_map(np.asarray, biasing_lib.
                                          build_bias_trie(
                ids, len(self.rev_vocab), pad_to=self.max_trie_nodes))
        req = _Request(feats=feats, trie=trie)
        bucket = next(b for b in self.bucket_frames if feats.shape[0] <= b)
        with self._cv:
            if self._closed:
                raise RuntimeError("transcriber is closed")
            self._queues[bucket].append(req)
            self.stats.requests += 1
            self._cv.notify()
        return req.future

    def transcribe(self, feats: np.ndarray,
                   boost_phrases: list[str] | None = None) -> str:
        """Blocking convenience wrapper."""
        return self.submit(feats, boost_phrases).result()

    def close(self) -> None:
        """Drain remaining requests, then stop the worker."""
        with self._cv:
            if self._closed:
                return
            self._closed = True
            self._cv.notify()
        self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker ------------------------------------------------------------

    def _take_batch(self) -> tuple[int, list[_Request]] | None:
        """Called under the lock: pick the next batch, or None when done.

        A full bucket launches immediately (fullest first). Otherwise the
        wait deadline tracks the OLDEST request across ALL buckets — each
        request's timestamp, not a per-pick timer — so no bucket can be
        starved by traffic in another: every request launches within
        max_wait_ms of enqueue (plus the decode time of batches ahead of
        it). Closing drains everything immediately.
        """
        while True:
            nonempty = [(b, q) for b, q in self._queues.items() if q]
            if not nonempty:
                if self._closed:
                    return None
                self._cv.wait()
                continue
            full = [bq for bq in nonempty if len(bq[1]) >= self.max_batch]
            pick = max(full, key=lambda bq: len(bq[1]), default=None)
            if pick is None:
                if self._closed:
                    pick = max(nonempty, key=lambda bq: len(bq[1]))
                else:
                    b, q = min(nonempty, key=lambda bq: bq[1][0].t)
                    now = time.monotonic()
                    if now < q[0].t + self.max_wait_s:
                        self._cv.wait(
                            timeout=q[0].t + self.max_wait_s - now)
                        continue
                    pick = (b, q)
            b, q = pick
            take, self._queues[b] = q[:self.max_batch], q[self.max_batch:]
            return b, take

    def _run(self) -> None:
        while True:
            with self._cv:
                picked = self._take_batch()
            if picked is None:
                return
            bucket, reqs = picked
            try:
                self._decode_batch(bucket, reqs)
            except Exception as e:  # pragma: no cover - propagate to callers
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _decode_batch(self, bucket: int, reqs: list[_Request]) -> None:
        B = self.max_batch                      # static batch: one compile
        feats = np.zeros((B, bucket, self.cfg.feat_length), np.float32)
        lens = np.ones((B,), np.int32)          # padding rows: 1 frame
        for i, r in enumerate(reqs):
            feats[i, :r.feats.shape[0]] = r.feats
            lens[i] = r.feats.shape[0]
        batch = {"logmel": jnp.asarray(feats),
                 "logmel_len": jnp.asarray(lens)}
        if self.per_request_bias > 0:
            rows = [(r.trie if r.trie is not None else self._empty_trie)
                    for r in reqs]
            rows += [self._empty_trie] * (B - len(reqs))
            batch["bias_tries"] = {
                key: jnp.asarray(np.stack([t[key] for t in rows]))
                for key in ("trans", "depth", "final")}
        if self.mesh is not None:
            from e2e_asr_tpu.core import mesh as mesh_lib
            batch = mesh_lib.shard_batch(self.mesh, batch)
        tokens, tok_lens, scores = self._decode(self.params, batch)
        tokens = np.asarray(tokens)
        conf = (nbest_posterior_confidence(np.asarray(scores))
                if self.with_confidence else None)
        self.stats.batches += 1
        self.stats.rows_decoded += B
        self.stats.occupancy_sum += len(reqs) / B
        for i, r in enumerate(reqs):
            sent = text.ids_to_sentence(tokens[i], self.rev_vocab)
            _, words = text.get_relevant_words(sent)
            out = " ".join(words)
            r.future.set_result((out, float(conf[i])) if conf is not None
                                else out)
