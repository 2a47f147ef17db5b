"""HTTP transcription server: WAV in, JSON transcript out.

Extension (the reference has no serving path at all — its eval harness
requires TFRecord datasets on disk, /root/reference/eval_model.py:56-197).
This wraps the dynamic-batching engine (eval/serving.py) behind a plain
stdlib HTTP front so any client can POST audio:

    POST /transcribe            body = a PCM WAV file
        -> {"text": ..., "duration_s": ..., "frames": N, "path": "batched"}
        optional query params:
          boost=phrase1|phrase2   per-request hotwords (needs -boost_weight)
          timestamps=1            word timestamps: adds "words":
                                  [{"word", "start_s", "end_s"}, ...] —
                                  CTC Viterbi spans / transducer exact
                                  emission frames (greedy) / attention
                                  segment-replay anchors (eval/align.py);
                                  the request takes the aligned long-form
                                  path at any length
    POST /stream/open           -> {"sid": N, "pcm": "s16le mono", ...}
    POST /stream/<sid>/push     body = raw little-endian PCM16 mono audio
    GET  /stream/<sid>/read     -> {"delta": newly finalized text}
    POST /stream/<sid>/finish   -> {"delta": remaining text}; frees the slot
    GET  /healthz               -> {"ok": true}
    GET  /stats                 -> serving-engine stats (occupancy, batches)

Streaming sessions ride eval/streaming.BatchedStreamingServer: every open
stream shares ONE set of fixed-shape batched programs (encoder chunks,
decode segments), stepped by a pump thread — concurrent live streams batch
onto the chip exactly like offline requests do.

TPU-first shape discipline is inherited from the engine: requests are
bucketed/padded onto fixed-shape executables, so concurrent callers share
batched beam launches (row independence pinned by tests/test_serving.py).
Requests longer than the largest bucket fall back to the long-form decoder
(eval/longform.py) — serialized, since long-form is a whole-chip batch of
chunks already.

Usage:
    python -m e2e_asr_tpu.tools.serve_http -vocab_dir VOCAB -tb_dir MODELS \
        [-port 8000] [-buckets 128,256,512] [-max_batch 8] [-confidence] \
        [-int8_ckpt art.npz] [...model/beam flags...]
"""
from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import wave as wave_mod
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from os import path
from urllib.parse import parse_qs, urlparse

import numpy as np


class TranscriptionService:
    """Model-side state shared by all HTTP workers: the batching engine for
    bucket-sized requests plus a serialized long-form fallback."""

    def __init__(self, params, cfg, rev_vocab, *, beam_cfg=None,
                 bucket_frames=(128, 256, 512), max_batch=8,
                 max_wait_ms=20.0, compute_dtype=None, lm_params=None,
                 with_confidence=False, per_request_bias=0.0, bias=None,
                 window=512, margin=64, segment=64):
        from e2e_asr_tpu.eval.serving import BatchingTranscriber

        self.cfg = cfg
        self.rev_vocab = rev_vocab
        self.compute_dtype = compute_dtype
        self.with_confidence = with_confidence
        self.beam_cfg = beam_cfg
        self.engine = BatchingTranscriber(
            params, cfg, rev_vocab, beam_cfg=beam_cfg,
            bucket_frames=bucket_frames, max_batch=max_batch,
            max_wait_ms=max_wait_ms, compute_dtype=compute_dtype,
            lm_params=lm_params, with_confidence=with_confidence,
            per_request_bias=per_request_bias, bias=bias)
        self.params = self.engine.params
        self.max_frames = max(bucket_frames)
        # Long-form chunking needs window/margin on pyramid-reduction
        # boundaries (eval/longform.py invariant) — snap the defaults.
        from e2e_asr_tpu.eval import longform
        r = longform.reduction_factor(cfg)
        self.window = max(r, window - window % r)
        self.margin = max(r, margin - margin % r)
        self.segment = segment
        self._longform_lock = threading.Lock()

    def transcribe_wav(self, body: bytes,
                       boost_phrases: list[str] | None = None,
                       timestamps: bool = False) -> dict:
        """Decode one WAV request body -> response dict (raises ValueError /
        wave.Error on malformed input)."""
        from e2e_asr_tpu.data.audio import read_wav
        from e2e_asr_tpu.frontend.logmel import featurize_utterance

        wave_f32, sr = read_wav(io.BytesIO(body))
        if not len(wave_f32):
            raise ValueError("empty waveform")
        feats = featurize_utterance(wave_f32, sample_rate=sr,
                                    n_mels=self.cfg.feat_length)
        out = {"duration_s": round(len(wave_f32) / sr, 3),
               "frames": int(feats.shape[0])}
        if timestamps:
            if boost_phrases:
                raise ValueError("timestamps and per-request boosting do "
                                 "not combine (timestamped decodes take "
                                 "the aligned long-form path)")
            out["text"], out["words"] = self._timestamped(feats, sr)
            out["path"] = "timestamps"
            return out
        if feats.shape[0] <= self.max_frames:
            res = self.engine.submit(feats, boost_phrases).result()
            if self.with_confidence:
                out["text"], conf = res
                out["confidence"] = round(float(conf), 4)
            else:
                out["text"] = res
            out["path"] = "batched"
            return out
        if boost_phrases:
            raise ValueError("per-request boosting is only available for "
                             f"bucket-sized requests (<= {self.max_frames} "
                             "frames); this one takes the long-form path")
        out["text"] = self._longform(feats)
        out["path"] = "longform"
        return out

    def _longform(self, feats: np.ndarray) -> str:
        import jax.numpy as jnp

        from e2e_asr_tpu.data import text
        from e2e_asr_tpu.eval import longform

        kw = dict(window=self.window, margin=self.margin,
                  compute_dtype=self.compute_dtype)
        with self._longform_lock:
            if self.cfg.model_family == "ctc":
                ids = longform.transcribe_ctc_longform(
                    self.params, self.cfg, jnp.asarray(feats),
                    beam_size=self.beam_cfg.beam_size if self.beam_cfg
                    else 1, **kw)
            elif self.cfg.model_family == "transducer":
                ids = longform.transcribe_transducer_longform(
                    self.params, self.cfg, jnp.asarray(feats),
                    beam_size=self.beam_cfg.beam_size if self.beam_cfg
                    else 1, **kw)
            elif self.segment > 0:
                ids = longform.transcribe_segmented(
                    self.params, self.cfg, jnp.asarray(feats),
                    seg_enc_frames=self.segment, beam_cfg=self.beam_cfg,
                    **kw)
            else:
                ids = longform.transcribe_longform(
                    self.params, self.cfg, jnp.asarray(feats),
                    beam_cfg=self.beam_cfg, **kw)
        sent = text.ids_to_sentence(np.asarray(ids), self.rev_vocab)
        _, words = text.get_relevant_words(sent)
        return " ".join(words)

    def _timestamped(self, feats: np.ndarray, sr: int
                     ) -> tuple[str, list[dict]]:
        """Word-timestamped decode (the transcribe -timestamps semantics):
        CTC Viterbi spans, transducer exact emission frames (greedy-only),
        attention segment-replay anchors. Serialized like long-form —
        alignment decodes are whole-chip batches of chunks already."""
        import jax.numpy as jnp

        from e2e_asr_tpu.data import text
        from e2e_asr_tpu.eval import longform
        from e2e_asr_tpu.eval.align import word_timestamps

        kw = dict(window=self.window, margin=self.margin,
                  compute_dtype=self.compute_dtype)
        with self._longform_lock:
            if self.cfg.model_family == "ctc":
                ids, t0, t1 = longform.transcribe_ctc_longform(
                    self.params, self.cfg, jnp.asarray(feats),
                    beam_size=(self.beam_cfg.beam_size if self.beam_cfg
                               else 1),
                    return_timestamps=True, **kw)
            elif self.cfg.model_family == "transducer":
                if self.beam_cfg and self.beam_cfg.beam_size > 1:
                    raise ValueError(
                        "transducer timestamps are greedy-only (exact "
                        "emission frames); serve with beam_size 1")
                ids, t0, t1 = longform.transcribe_transducer_longform(
                    self.params, self.cfg, jnp.asarray(feats),
                    beam_size=1, return_timestamps=True, **kw)
            else:
                if self.segment <= 0:
                    raise ValueError("attention-family timestamps need "
                                     "-segment > 0 (frames come from the "
                                     "segmented decode's attention replay)")
                ids, t0, t1 = longform.transcribe_segmented(
                    self.params, self.cfg, jnp.asarray(feats),
                    seg_enc_frames=self.segment, beam_cfg=self.beam_cfg,
                    return_timestamps=True, **kw)
        sent = text.ids_to_sentence(np.asarray(ids), self.rev_vocab)
        _, kept = text.get_relevant_words(sent)
        words = [{"word": w, "start_s": round(a, 3), "end_s": round(b, 3)}
                 for w, a, b in word_timestamps(
                     np.asarray(ids), np.asarray(t0), np.asarray(t1),
                     self.rev_vocab, self.cfg, sample_rate=sr)]
        return " ".join(kept), words

    def close(self) -> None:
        self.engine.close()


class StreamingService:
    """HTTP adapter over eval/streaming.BatchedStreamingServer: concurrent
    low-latency sessions share the server's fixed-shape batched programs.

    The batched server is synchronous and single-threaded by design
    (deterministic scheduling); this adapter serializes every call through
    one lock and drives `step()` from a pump thread, accumulating each
    session's finalized deltas in an unread buffer that `GET .../read`
    drains. Audio arrives as raw little-endian PCM16 mono at the server's
    sample rate (a stream has no WAV header — it has no length yet)."""

    def __init__(self, params, cfg, rev_vocab, *, max_streams=8,
                 beam_cfg=None, compute_dtype=None, window=512, margin=64,
                 segment=64, sample_rate=16000, tick_s=0.02):
        from e2e_asr_tpu.eval import longform
        from e2e_asr_tpu.eval.streaming import BatchedStreamingServer

        r = longform.reduction_factor(cfg)
        self.server = BatchedStreamingServer(
            params, cfg, rev_vocab, max_streams=max_streams,
            window=max(r, window - window % r),
            margin=max(r, margin - margin % r),
            seg_enc_frames=max(segment, 1), beam_cfg=beam_cfg,
            compute_dtype=compute_dtype, sample_rate=sample_rate,
            n_mels=cfg.feat_length)
        self.sample_rate = sample_rate
        self.tick_s = tick_s
        self._lock = threading.Lock()
        self._unread: dict[int, str] = {}
        self._stop = False
        self._pump = threading.Thread(target=self._run, daemon=True)
        self._pump.start()

    def open(self) -> int:
        with self._lock:
            sid = self.server.open()         # RuntimeError when slots busy
            self._unread[sid] = ""
            return sid

    def push(self, sid: int, body: bytes) -> dict:
        if not body or len(body) % 2:
            raise ValueError("push body must be little-endian PCM16 mono "
                             f"(got {len(body)} bytes)")
        wave = np.frombuffer(body, dtype="<i2").astype(np.float32) / 32768.0
        with self._lock:
            if sid not in self._unread:
                raise KeyError(f"stream {sid} is not open")
            self.server.push(sid, wave)
        return {"sid": sid, "pushed_s": round(len(wave) / self.sample_rate,
                                              3)}

    def read(self, sid: int) -> dict:
        with self._lock:
            if sid not in self._unread:
                raise KeyError(f"stream {sid} is not open")
            delta, self._unread[sid] = self._unread[sid], ""
        return {"sid": sid, "delta": delta}

    def finish(self, sid: int) -> dict:
        with self._lock:
            if sid not in self._unread:
                raise KeyError(f"stream {sid} is not open")
            tail = self.server.finish(sid)
            delta = self._unread.pop(sid) + tail
        return {"sid": sid, "delta": delta}

    def _run(self) -> None:
        while not self._stop:
            with self._lock:
                if any(s is not None for s in self.server._sessions):
                    for sid, d in self.server.step().items():
                        if d and sid in self._unread:
                            self._unread[sid] += d
            time.sleep(self.tick_s)

    def close(self) -> None:
        self._stop = True
        self._pump.join()


class _Handler(BaseHTTPRequestHandler):
    # Set per-server in make_server().
    service: TranscriptionService = None
    streaming: StreamingService | None = None
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default (tests/daemons)
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _stream_route(self, route: str) -> tuple[int, str] | None:
        """'/stream/<sid>/<verb>' -> (sid, verb), or None."""
        parts = route.strip("/").split("/")
        if len(parts) == 3 and parts[0] == "stream" and parts[1].isdigit():
            return int(parts[1]), parts[2]
        return None

    def do_GET(self):
        route = urlparse(self.path).path
        if route == "/healthz":
            self._json(200, {"ok": True})
            return
        if route == "/stats":
            st = self.service.engine.stats
            self._json(200, {
                "requests": st.requests, "batches": st.batches,
                "rows_decoded": st.rows_decoded,
                "mean_occupancy": round(st.mean_occupancy, 4)})
            return
        sr = self._stream_route(route)
        if sr and sr[1] == "read" and self.streaming is not None:
            try:
                self._json(200, self.streaming.read(sr[0]))
            except KeyError as e:
                self._json(404, {"error": str(e).strip("'")})
            return
        self._json(404, {"error": f"no route {route}"})

    def do_POST(self):
        url = urlparse(self.path)
        try:
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length) if length > 0 else b""
            if url.path == "/transcribe":
                if not body:
                    raise ValueError("empty request body (expected a WAV "
                                     "file)")
                q = parse_qs(url.query)
                boost = None
                if q.get("boost"):
                    boost = [p for p in q["boost"][0].split("|") if p]
                ts = bool(q.get("timestamps")
                          and q["timestamps"][0] not in ("0", "false"))
                self._json(200, self.service.transcribe_wav(
                    body, boost, timestamps=ts))
                return
            if url.path == "/stream/open" and self.streaming is not None:
                try:
                    self._json(200, {
                        "sid": self.streaming.open(),
                        "pcm": "s16le mono",
                        "sample_rate": self.streaming.sample_rate})
                except RuntimeError as e:   # all slots busy
                    self._json(503, {"error": str(e)})
                return
            sr = self._stream_route(url.path)
            if sr and self.streaming is not None and sr[1] in ("push",
                                                               "finish"):
                sid, verb = sr
                try:
                    self._json(200, self.streaming.push(sid, body)
                               if verb == "push"
                               else self.streaming.finish(sid))
                except KeyError as e:
                    self._json(404, {"error": str(e).strip("'")})
                return
            self._json(404, {"error": f"no route {url.path}"})
        except (ValueError, wave_mod.Error, EOFError) as e:
            self._json(400, {"error": str(e) or
                             f"{type(e).__name__}: not a readable WAV file"})
        except Exception as e:  # pragma: no cover - defensive
            self._json(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(service: TranscriptionService, host: str = "127.0.0.1",
                port: int = 0, *, streaming: StreamingService | None = None,
                verbose: bool = False) -> ThreadingHTTPServer:
    """Bind (port=0 picks a free one; see server.server_address). The caller
    runs serve_forever(), then shutdown() + service.close()."""
    handler = type("Handler", (_Handler,),
                   {"service": service, "streaming": streaming})
    server = ThreadingHTTPServer((host, port), handler)
    server.verbose = verbose
    return server


def build_parser() -> argparse.ArgumentParser:
    from e2e_asr_tpu import config as config_lib

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-host", type=str, default="127.0.0.1")
    parser.add_argument("-port", type=int, default=8000)
    parser.add_argument("-buckets", type=str, default="128,256,512",
                        help="frame-bucket sizes (comma-separated); longer "
                             "requests take the long-form path")
    parser.add_argument("-max_batch", type=int, default=8)
    parser.add_argument("-max_wait_ms", type=float, default=20.0)
    parser.add_argument("-confidence", action="store_true",
                        help="include an n-best posterior confidence per "
                             "transcript")
    parser.add_argument("-window", type=int, default=512,
                        help="long-form chunk window (frames)")
    parser.add_argument("-margin", type=int, default=64,
                        help="long-form context margin (frames)")
    parser.add_argument("-segment", type=int, default=64,
                        help="long-form attention decode segment (encoder "
                             "frames); 0 = whole-utterance")
    parser.add_argument("-max_streams", type=int, default=8,
                        help="streaming session slots (POST /stream/open, "
                             ".../push s16le PCM, GET .../read deltas, "
                             ".../finish); 0 disables the endpoints")
    parser.add_argument("-stream_sr", type=int, default=16000,
                        help="PCM sample rate for streaming pushes")
    parser.add_argument("-int8_ckpt", type=str, default="",
                        help="int8 serving artifact (tools/quantize_ckpt.py)")
    parser.add_argument("-ckpt", type=str, default="",
                        help="explicit checkpoint (else best/latest from "
                             "the run dir)")
    config_lib.add_parse_options(parser)
    return parser


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.eval.lm_loader import load_fusion_lm
    from e2e_asr_tpu.train import step as step_lib

    args = vars(build_parser().parse_args(argv))
    host, port = args.pop("host"), args.pop("port")
    buckets = tuple(int(b) for b in args.pop("buckets").split(","))
    max_batch, max_wait_ms = args.pop("max_batch"), args.pop("max_wait_ms")
    confidence = args.pop("confidence")
    window, margin = args.pop("window"), args.pop("margin")
    segment = args.pop("segment")
    max_streams, stream_sr = args.pop("max_streams"), args.pop("stream_sr")
    int8_ckpt, ckpt_file = args.pop("int8_ckpt"), args.pop("ckpt")

    _, rev_vocab = text.initialize_vocabulary(
        path.join(args["vocab_dir"], "char.vocab"))
    cfg = config_lib.process_args(args, {"char": len(rev_vocab)})
    tc = cfg.train

    params = step_lib.init_params(jax.random.PRNGKey(10), cfg.model)
    if int8_ckpt:
        from e2e_asr_tpu.core import quant
        # QuantState serves directly: the engine dequantizes inside the jit.
        params, ckpt_path = quant.load_artifact(int8_ckpt, params), int8_ckpt
    else:
        state = step_lib.create_state(params, cfg.model, cfg.lm)
        if ckpt_file:
            ckpt_path = ckpt_file
        else:
            ckpt_path = None
            for d in (tc.best_model_dir, tc.train_dir):
                found = ckpt_lib.latest_path(d)
                if found:
                    ckpt_path = found[0]
                    break
        if ckpt_path:
            state = ckpt_lib.restore(ckpt_path, state)
        params = step_lib.lora_merged(state.params, cfg.model)
    print(f"Serving the model from: {ckpt_path}")

    lm_params = load_fusion_lm(cfg.beam.lm_path, cfg.model, rev_vocab,
                               max_steps=cfg.beam.max_steps)
    # -boost_phrases FILE + -boost_weight W: engine-level glossary on every
    # request (the eval CLI semantic). -boost_weight alone: per-request
    # hotwords via the ?boost= query parameter.
    bias, per_request = None, 0.0
    if cfg.beam.boost_weight != 0.0:
        if cfg.beam.boost_phrases:
            from e2e_asr_tpu.data.bpe import is_bpe_vocab
            from e2e_asr_tpu.eval import biasing
            vocab = {tok: i for i, tok in enumerate(rev_vocab)}
            phrases = biasing.load_phrases(cfg.beam.boost_phrases, vocab,
                                           bpe=is_bpe_vocab(rev_vocab))
            bias = (biasing.build_bias_trie(phrases, len(rev_vocab)),
                    cfg.beam.boost_weight)
            print(f"Glossary biasing: {len(phrases)} phrases")
        else:
            per_request = cfg.beam.boost_weight
            print(f"Per-request ?boost= enabled at weight {per_request}")
    service = TranscriptionService(
        params, cfg.model, rev_vocab, beam_cfg=cfg.beam,
        bucket_frames=buckets, max_batch=max_batch, max_wait_ms=max_wait_ms,
        compute_dtype=(jnp.bfloat16 if tc.compute_dtype == "bfloat16"
                       else None),
        lm_params=lm_params, with_confidence=confidence,
        per_request_bias=per_request, bias=bias,
        window=window, margin=margin, segment=segment)
    streaming = None
    if max_streams > 0:
        from e2e_asr_tpu.core import quant
        streaming = StreamingService(
            quant.maybe_dequantize(params), cfg.model, rev_vocab,
            max_streams=max_streams, beam_cfg=cfg.beam,
            compute_dtype=service.compute_dtype, window=window,
            margin=margin, segment=segment, sample_rate=stream_sr)
    server = make_server(service, host, port, streaming=streaming,
                         verbose=True)
    print(f"Listening on http://{server.server_address[0]}:"
          f"{server.server_address[1]} (buckets {buckets}, "
          f"max_batch {max_batch}, stream slots {max_streams})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()
        if streaming is not None:
            streaming.close()


if __name__ == "__main__":
    main(sys.argv[1:])
