"""Incremental (streaming) transcription on top of the chunked long-form
encoder — push waveform blocks, read transcript deltas.

Everything is deterministic in the ABSOLUTE stream position, so the output
is identical no matter how the audio is split into pushes (property-tested):

- frames: log-mel frame k covers samples [k*hop, k*hop + frame_length);
  each push featurizes exactly the newly completed frame indices from the
  retained sample buffer (the frontend is stateless per frame).
- encoder: chunk i covers frames [i*W, (i+1)*W) with `margin` context on
  both sides (zeros before the stream start); it is encoded as soon as the
  right-margin frames exist, then its margin-trimmed states are appended to
  the stitched sequence — byte-identical to eval/longform.encode_longform
  on the whole signal.
- decode: the attention family decodes a new training-length segment of
  stitched states whenever one completes (eval/longform rationale: LAS
  length generalization); the CTC family extends a running best-path
  collapse (frame-local, carrying the previous last id across the
  boundary for repeat-collapse).

`finish()` flushes the tail (a final partial chunk and segment).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import BeamConfig, Seq2SeqConfig
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval import longform
from e2e_asr_tpu.models import seq2seq

Array = jax.Array


def featurize_delta(samples: np.ndarray, n_framed: int, *, sample_rate: int,
                    frame_length: int, hop_length: int, n_mels: int):
    """Featurize exactly the newly completed frames of a retained sample
    buffer. Returns (new_frames [n, n_mels], n_total) — deterministic in
    the absolute stream position (frame k covers samples
    [k*hop, k*hop+frame_length))."""
    from e2e_asr_tpu.frontend.logmel import featurize_utterance

    n_total = max(0, 1 + (len(samples) - frame_length) // hop_length)
    if n_total <= n_framed:
        return np.zeros((0, n_mels), np.float32), n_framed
    sl = samples[n_framed * hop_length:
                 (n_total - 1) * hop_length + frame_length]
    new = featurize_utterance(sl, sample_rate=sample_rate,
                              frame_length=frame_length,
                              hop_length=hop_length, n_mels=n_mels)
    return new, n_total


def assemble_chunk(frames: np.ndarray, i: int, W: int, M: int,
                   n_mels: int, *, flush: bool):
    """Build encoder chunk i from the frame buffer.

    Returns (chunk [W+2M, n_mels], valid_length, main_frames) when chunk i
    is ready (all W main frames plus the right margin exist — or, on
    flush, any main frames at all), else None. Deterministic in the
    absolute stream position; shared by the single-stream transcriber and
    the batched streaming server."""
    have = frames.shape[0]
    if flush:
        main = min(W, have - i * W)
        if main <= 0:
            return None
    else:
        if have < (i + 1) * W + M:
            return None
        main = W
    lo = i * W - M
    pad_left = max(0, -lo)
    piece = frames[max(0, lo): i * W + main + M]
    chunk = np.zeros((W + 2 * M, n_mels), np.float32)
    chunk[pad_left:pad_left + piece.shape[0]] = piece
    trail = min(M, have - (i * W + main))
    length = M - pad_left + main + max(0, trail) + pad_left
    return chunk, length, main


class StreamingTranscriber:
    def __init__(self, params: dict, cfg: Seq2SeqConfig,
                 rev_vocab: list[str], *, window: int = 512, margin: int = 64,
                 seg_enc_frames: int = 64, beam_cfg: BeamConfig | None = None,
                 compute_dtype=None, sample_rate: int = 16000,
                 frame_length: int = 400, hop_length: int = 160,
                 n_mels: int | None = None):
        from e2e_asr_tpu.models import encoder as encoder_lib
        r = longform.reduction_factor(cfg)
        # Forward-only recurrent encoders stream EXACTLY: per-layer cell
        # states carry across chunks, margins/lookahead drop to zero, and
        # each chunk costs one pass over its own frames instead of
        # W + 2*margin (models/encoder.apply_streaming). Chunk-causal
        # transformers (-attn_chunk) stream exactly too, via carried
        # per-block K/V + conv caches (transformer_encoder.apply_streaming).
        self.exact = encoder_lib.supports_exact_streaming(cfg.encoder)
        r_align = r
        if self.exact:
            # Chunks must align with EVERY pyramid boundary (not just the
            # char depth's) so the carried states line up — or, for the
            # transformer, with subsample x attn_chunk; no margins.
            r_align = encoder_lib.total_reduction_factor(
                cfg.encoder, max(cfg.num_layers.values()))
            margin = 0
        if window % r_align or margin % r_align:
            raise ValueError(f"window/margin must be multiples of the "
                             f"encoder reduction factor {r_align}")
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.cfg = cfg
        self.rev_vocab = rev_vocab
        self.window, self.margin, self.r = window, margin, r
        self._enc_state = None          # exact mode: carried cell states
        self.seg = seg_enc_frames
        self.beam_cfg = beam_cfg or BeamConfig()
        if self.beam_cfg.lm_rescore != 0.0:
            raise ValueError(
                "-lm_rescore is a second pass over a FINAL n-best; "
                "incremental streaming emits deltas as segments close — "
                "use per-step fusion (-lm_weight) when streaming")
        self.compute_dtype = compute_dtype
        self.sr, self.frame_length, self.hop = (sample_rate, frame_length,
                                                hop_length)
        self.n_mels = n_mels or cfg.feat_length
        self.is_ctc = cfg.model_family == "ctc"
        self.is_transducer = cfg.model_family == "transducer"
        self._rnnt_state = None         # carried prediction-net state

        self._samples = np.zeros((0,), np.float32)
        self._frames = np.zeros((0, self.n_mels), np.float32)
        self._n_framed = 0              # frames emitted so far
        self._n_chunks = 0              # chunks encoded so far
        self._states: list[np.ndarray] = []   # trimmed enc states per chunk
        self._n_decoded = 0             # stitched enc frames decoded so far
        self._ctc_prev_id = -1          # boundary carry for repeat collapse
        self._ids: list[int] = []
        self._text_len = 0

    # -- frontend ----------------------------------------------------------
    def _featurize_new(self):
        new, n_total = featurize_delta(
            self._samples, self._n_framed, sample_rate=self.sr,
            frame_length=self.frame_length, hop_length=self.hop,
            n_mels=self.n_mels)
        if n_total > self._n_framed:
            self._frames = np.concatenate([self._frames, new], axis=0)
            self._n_framed = n_total

    # -- encoder -----------------------------------------------------------
    def _encode_ready_chunks(self, *, flush: bool = False):
        if self.exact:
            return self._encode_ready_chunks_exact(flush=flush)
        W, M = self.window, self.margin
        while True:
            ready = assemble_chunk(self._frames, self._n_chunks, W, M,
                                   self.n_mels, flush=flush)
            if ready is None:
                break
            chunk, length, main = ready
            attn, _, lens = seq2seq.encode(
                self.params, self.cfg, jnp.asarray(chunk)[None],
                jnp.asarray([length]), train=False,
                compute_dtype=self.compute_dtype)
            depth = self.cfg.num_layers["char"]
            m_out = M // self.r
            n_out = math.ceil(main / self.r)
            self._states.append(
                np.asarray(attn[depth][0, m_out:m_out + n_out]))
            self._n_chunks += 1

    def _encode_ready_chunks_exact(self, *, flush: bool = False):
        """Exact streaming encode (forward-only encoders): carry the
        per-layer cell states across W-frame chunks — zero lookahead, zero
        margin recompute, outputs byte-equal to one whole-utterance pass
        (models/encoder.apply_streaming; pinned by
        tests/test_streaming_exact.py). Frame stacking's (stack_cons - 1)
        future frames are the only readiness lookahead."""
        from e2e_asr_tpu.models import encoder as encoder_lib
        from e2e_asr_tpu.models.seq2seq import stack_frames

        W = self.window
        s = self.cfg.encoder.stack_cons
        depth = self.cfg.num_layers["char"]
        while True:
            have = self._frames.shape[0]
            i = self._n_chunks
            if flush:
                main = min(W, have - i * W)
                if main <= 0:
                    break
            else:
                if have < (i + 1) * W + (s - 1):
                    break
                main = W
            raw = self._frames[i * W: i * W + main + (s - 1)]
            if self._enc_state is None:
                self._enc_state = encoder_lib.streaming_state(
                    self.cfg.encoder, max(self.cfg.num_layers.values()), 1)
            stacked = stack_frames(jnp.asarray(raw)[None], s)[:, :main]
            attn, lens, self._enc_state = encoder_lib.apply_streaming(
                self.params["encoder"], self.cfg.encoder, stacked,
                jnp.asarray([main]), self.cfg.num_layers, self._enc_state,
                compute_dtype=self.compute_dtype,
                final=flush and main < W)
            self._states.append(
                np.asarray(attn[depth][0, : int(lens[depth][0])]))
            self._n_chunks += 1

    # -- decode ------------------------------------------------------------
    def _stitched(self) -> np.ndarray:
        return (np.concatenate(self._states, axis=0) if self._states
                else np.zeros((0, 1), np.float32))

    def _decode_ready(self, *, flush: bool = False) -> list[int]:
        from e2e_asr_tpu.core.layers import dense
        from e2e_asr_tpu.eval.beam import beam_decode
        from e2e_asr_tpu.models import ctc

        enc = self._stitched()
        total = enc.shape[0]
        new_ids: list[int] = []
        if self.is_ctc:
            if total > self._n_decoded:
                lg = dense(self.params["ctc_head"],
                           jnp.asarray(enc[self._n_decoded:])[None],
                           compute_dtype=self.compute_dtype)
                ids = np.asarray(jnp.argmax(lg[0], axis=-1))
                for t in ids:
                    t = int(t)
                    if t != ctc.BLANK_ID and t != self._ctc_prev_id:
                        new_ids.append(t)
                    self._ctc_prev_id = t
                self._n_decoded = total
        elif self.is_transducer:
            # The transducer decoder is monotonic and stateful: decode each
            # new stitched span immediately, carrying the prediction-net
            # state across chunk boundaries — exactly equal to one greedy
            # pass over the concatenated states (models/transducer.py).
            from e2e_asr_tpu.models import transducer

            if total > self._n_decoded:
                delta = enc[self._n_decoded:]
                if self._rnnt_state is None:
                    self._rnnt_state = transducer.init_decode_state(
                        self.params, self.cfg, 1,
                        compute_dtype=self.compute_dtype)
                tokens, self._rnnt_state = transducer.greedy_decode_states(
                    self.params, self.cfg, jnp.asarray(delta)[None],
                    jnp.asarray([delta.shape[0]]),
                    compute_dtype=self.compute_dtype,
                    max_output=4 * delta.shape[0],
                    init_state=self._rnnt_state, return_state=True)
                new_ids.extend(int(i) for i in np.asarray(tokens[0])
                               if i != 0)
                self._n_decoded = total
        else:
            while (total - self._n_decoded >= self.seg
                   or (flush and total > self._n_decoded)):
                n = min(self.seg, total - self._n_decoded)
                seg = np.zeros((self.seg, enc.shape[1]), np.float32)
                seg[:n] = enc[self._n_decoded:self._n_decoded + n]
                bc = dataclasses.replace(self.beam_cfg,
                                         max_steps=int(self.seg * 1.3) + 16)
                tokens, lens, _ = beam_decode(
                    self.params["decoder_char"], self.cfg.decoders["char"],
                    bc, jnp.asarray(seg)[None], jnp.asarray([n]))
                ids = np.asarray(tokens[0][:int(lens[0])])
                new_ids.extend(int(i) for i in ids if i > 2)
                self._n_decoded += n
        return new_ids

    def _emit(self, new_ids: list[int]) -> str:
        self._ids.extend(new_ids)
        full = text.ids_to_sentence(self._ids, self.rev_vocab)
        delta = full[self._text_len:]
        self._text_len = len(full)
        return delta

    # -- public ------------------------------------------------------------
    def push(self, waveform: np.ndarray) -> str:
        """Append audio samples (float32 [-1, 1]); returns newly finalized
        transcript text (possibly empty)."""
        self._samples = np.concatenate(
            [self._samples, np.asarray(waveform, np.float32)])
        self._featurize_new()
        self._encode_ready_chunks()
        return self._emit(self._decode_ready())

    def finish(self) -> str:
        """Flush remaining audio (tail chunk + final segment); returns the
        last transcript delta."""
        self._featurize_new()
        self._encode_ready_chunks(flush=True)
        return self._emit(self._decode_ready(flush=True))

    @property
    def transcript(self) -> str:
        return text.ids_to_sentence(self._ids, self.rev_vocab)


class _Session:
    """Host-side per-stream state (the StreamingTranscriber fields)."""

    def __init__(self, n_mels: int):
        self.samples = np.zeros((0,), np.float32)
        self.frames = np.zeros((0, n_mels), np.float32)
        self.n_framed = 0
        self.n_chunks = 0
        self.states: list[np.ndarray] = []
        self.n_decoded = 0
        self.ctc_prev_id = -1
        self.ids: list[int] = []
        self.text_len = 0
        self.outbox = ""          # finalized text not yet read by the client
        self._stitched: np.ndarray | None = None

    def add_states(self, arr: np.ndarray) -> None:
        self.states.append(arr)
        self._stitched = None     # invalidate the concatenation cache

    def stitched(self) -> np.ndarray:
        # Cached: step() reads this several times per tick, every tick, and
        # a fresh concat each time would be O(stream-length^2) host copies.
        if self._stitched is None:
            self._stitched = (np.concatenate(self.states, axis=0)
                              if self.states else np.zeros((0, 1),
                                                           np.float32))
        return self._stitched


class BatchedStreamingServer:
    """Many concurrent audio streams, ONE set of jitted batched programs.

    The per-stream math is StreamingTranscriber's, unchanged — deterministic
    in each stream's absolute position, so every session's transcript is
    token-for-token identical to a dedicated single-stream transcriber
    (test-pinned). What changes is the launch schedule: each `step()` tick
    gathers every session's ready work and runs it as ONE fixed-shape
    batched call per stage —

    - encoder: all sessions' ready chunks, batched rows [S, W+2M, F]
      (identical chunk geometry across streams = a static shape);
    - CTC: one batched head+argmax over the new stitched spans (frame-local
      best-path collapse, per-session boundary carry on the host);
    - transducer: one batched stateful greedy step over ALL slots — the
      prediction-net state lives as [S, ...] arrays; idle slots pass
      length-0 spans and their state rows ride through unchanged;
    - attention: all completed training-length segments in one batched
      beam_decode.

    Sessions are slots in a fixed-capacity table (max_streams) so every
    program compiles once; open/finish recycle slots. The synchronous
    `step()` keeps scheduling deterministic (serving loops call it from
    their own thread; there is no internal concurrency to reason about).
    """

    def __init__(self, params: dict, cfg: Seq2SeqConfig,
                 rev_vocab: list[str], *, max_streams: int = 8,
                 window: int = 512, margin: int = 64,
                 seg_enc_frames: int = 64, beam_cfg: BeamConfig | None = None,
                 compute_dtype=None, sample_rate: int = 16000,
                 frame_length: int = 400, hop_length: int = 160,
                 n_mels: int | None = None):
        from e2e_asr_tpu.models import encoder as encoder_lib
        r = longform.reduction_factor(cfg)
        # Forward-only recurrent encoders and chunk-causal transformers
        # stream EXACTLY (see StreamingTranscriber): carried [S, ...]
        # state rows, margin 0.
        self.exact = encoder_lib.supports_exact_streaming(cfg.encoder)
        r_align = r
        if self.exact:
            r_align = encoder_lib.total_reduction_factor(
                cfg.encoder, max(cfg.num_layers.values()))
            margin = 0
        if window % r_align or margin % r_align:
            raise ValueError(f"window/margin must be multiples of the "
                             f"encoder reduction factor {r_align}")
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.cfg = cfg
        self.rev_vocab = rev_vocab
        self.S = int(max_streams)
        self.window, self.margin, self.r = window, margin, r
        self._enc_state = None           # exact mode: [S, ...] cell states
        self.seg = seg_enc_frames
        self.beam_cfg = beam_cfg or BeamConfig()
        if self.beam_cfg.lm_rescore != 0.0:
            raise ValueError(
                "-lm_rescore is a second pass over a FINAL n-best; "
                "incremental streaming emits deltas as segments close — "
                "use per-step fusion (-lm_weight) when streaming")
        self.compute_dtype = compute_dtype
        self.sr, self.frame_length, self.hop = (sample_rate, frame_length,
                                                hop_length)
        self.n_mels = n_mels or cfg.feat_length
        self.is_ctc = cfg.model_family == "ctc"
        self.is_transducer = cfg.model_family == "transducer"
        self._sessions: list[_Session | None] = [None] * self.S
        self._rnnt_state = None          # batched [S, ...] pred-net state

    # -- session management ------------------------------------------------
    def open(self) -> int:
        for sid in range(self.S):
            if self._sessions[sid] is None:
                self._sessions[sid] = _Session(self.n_mels)
                if self.exact and self._enc_state is not None:
                    # Recycled slot: fresh zero encoder state rows (dtype
                    # kept — the transformer state carries an int32 `pos`).
                    self._enc_state = jax.tree_util.tree_map(
                        lambda a: a.at[sid].set(jnp.zeros((), a.dtype)),
                        self._enc_state)
                if self.is_transducer:
                    from e2e_asr_tpu.models import transducer
                    fresh = transducer.init_decode_state(
                        self.params, self.cfg, 1,
                        compute_dtype=self.compute_dtype)
                    if self._rnnt_state is None:
                        self._rnnt_state = transducer.init_decode_state(
                            self.params, self.cfg, self.S,
                            compute_dtype=self.compute_dtype)
                    else:
                        self._rnnt_state = jax.tree_util.tree_map(
                            lambda full, one: full.at[sid].set(one[0]),
                            self._rnnt_state, fresh)
                return sid
        raise RuntimeError(f"all {self.S} stream slots busy")

    def push(self, sid: int, waveform: np.ndarray) -> None:
        s = self._session(sid)
        s.samples = np.concatenate(
            [s.samples, np.asarray(waveform, np.float32)])

    def _session(self, sid: int) -> _Session:
        s = (self._sessions[sid] if 0 <= sid < self.S else None)
        if s is None:
            raise KeyError(f"stream {sid} is not open")
        return s

    # -- the batched tick --------------------------------------------------
    def step(self) -> dict[int, str]:
        """One batched scheduling tick over every open session. Returns the
        newly finalized transcript delta per session (possibly empty) —
        including text finalized as a side effect of another session's
        finish() (per-session outboxes, nothing is dropped)."""
        self._tick(frozenset())
        out = {}
        for i, s in enumerate(self._sessions):
            if s is not None:
                out[i] = s.outbox
                s.outbox = ""
        return out

    def _encode_rounds_exact(self, active, flush_sids, depth) -> None:
        """Exact streaming encode rounds (forward-only encoders): one
        static-shape [S, W(+stacking lookahead), F] apply_streaming call per
        round, per-layer cell states carried as [S, ...] slot rows. Slots
        with no ready chunk pass length 0 — the scans freeze their states
        (rnn.*_scan_stateful), so idle rows ride through unchanged. A flush
        slot's partial tail rides the same static chunk with its true
        length; the per-row masking reproduces the whole-utterance tail
        padding because chunk starts are aligned to every pyramid
        boundary."""
        from e2e_asr_tpu.models import encoder as encoder_lib
        from e2e_asr_tpu.models.seq2seq import stack_frames

        W = self.window
        s_cons = self.cfg.encoder.stack_cons
        while True:
            ready = []
            for i, s in active:
                have = s.frames.shape[0]
                idx = s.n_chunks
                if i in flush_sids:
                    main = min(W, have - idx * W)
                    if main <= 0:
                        continue
                else:
                    if have < (idx + 1) * W + (s_cons - 1):
                        continue
                    main = W
                ready.append((i, s, main))
            if not ready:
                break
            chunks = np.zeros((self.S, W + s_cons - 1, self.n_mels),
                              np.float32)
            lens = np.zeros((self.S,), np.int32)
            for i, s, main in ready:
                raw = s.frames[s.n_chunks * W:
                               s.n_chunks * W + main + (s_cons - 1)]
                chunks[i, :raw.shape[0]] = raw
                lens[i] = main
            if self._enc_state is None:
                self._enc_state = encoder_lib.streaming_state(
                    self.cfg.encoder, max(self.cfg.num_layers.values()),
                    self.S)
            stacked = stack_frames(jnp.asarray(chunks), s_cons)[:, :W]
            attn, out_lens, self._enc_state = encoder_lib.apply_streaming(
                self.params["encoder"], self.cfg.encoder, stacked,
                jnp.asarray(lens), self.cfg.num_layers, self._enc_state,
                compute_dtype=self.compute_dtype)
            enc = np.asarray(attn[depth])
            ol = np.asarray(out_lens[depth])
            for i, s, main in ready:
                s.add_states(enc[i, : int(ol[i])])
                s.n_chunks += 1

    def _tick(self, flush_sids: frozenset[int] | set[int]) -> None:
        """Featurize/encode/decode every session's ready work (batched) and
        append the finalized text to each session's outbox."""
        active = [(i, s) for i, s in enumerate(self._sessions)
                  if s is not None]
        for _, s in active:
            new, n_total = featurize_delta(
                s.samples, s.n_framed, sample_rate=self.sr,
                frame_length=self.frame_length, hop_length=self.hop,
                n_mels=self.n_mels)
            if n_total > s.n_framed:
                s.frames = np.concatenate([s.frames, new], axis=0)
                s.n_framed = n_total

        # Encode: rounds of one-ready-chunk-per-session, batched.
        W, M = self.window, self.margin
        depth = self.cfg.num_layers["char"]
        m_out = M // self.r
        if self.exact:
            self._encode_rounds_exact(active, flush_sids, depth)
        while self.exact is False:
            ready = []
            for i, s in active:
                got = assemble_chunk(s.frames, s.n_chunks, W, M, self.n_mels,
                                     flush=i in flush_sids)
                if got is not None:
                    ready.append((i, s, got))
            if not ready:
                break
            chunks = np.zeros((self.S, W + 2 * M, self.n_mels), np.float32)
            lens = np.zeros((self.S,), np.int32)
            for i, _, (chunk, length, _) in ready:
                chunks[i], lens[i] = chunk, length
            attn, _, _ = seq2seq.encode(
                self.params, self.cfg, jnp.asarray(chunks),
                jnp.asarray(lens), train=False,
                compute_dtype=self.compute_dtype)
            enc = np.asarray(attn[depth])
            for i, s, (_, _, main) in ready:
                n_out = math.ceil(main / self.r)
                s.add_states(enc[i, m_out:m_out + n_out])
                s.n_chunks += 1

        # Decode, one batched launch per family stage.
        deltas = {i: [] for i, _ in active}
        if self.is_ctc:
            self._decode_ctc(active, deltas)
        elif self.is_transducer:
            self._decode_transducer(active, deltas)
        else:
            self._decode_attention(active, deltas, flush_sids)
        for i, s in active:
            s.ids.extend(deltas[i])
            full = text.ids_to_sentence(s.ids, self.rev_vocab)
            s.outbox += full[s.text_len:]
            s.text_len = len(full)

    def _decode_ctc(self, active, deltas):
        from e2e_asr_tpu.core.layers import dense
        from e2e_asr_tpu.models import ctc

        todo = [(i, s) for i, s in active
                if s.stitched().shape[0] > s.n_decoded]
        if not todo:
            return
        H = todo[0][1].stitched().shape[1]
        span = max(s.stitched().shape[0] - s.n_decoded for _, s in todo)
        spans = np.zeros((self.S, span, H), np.float32)
        lens = np.zeros((self.S,), np.int32)
        for i, s in todo:
            enc = s.stitched()
            n = enc.shape[0] - s.n_decoded
            spans[i, :n] = enc[s.n_decoded:]
            lens[i] = n
        lg = dense(self.params["ctc_head"], jnp.asarray(spans),
                   compute_dtype=self.compute_dtype)
        ids = np.asarray(jnp.argmax(lg, axis=-1))
        for i, s in todo:
            for t in ids[i, : lens[i]]:
                t = int(t)
                if t != ctc.BLANK_ID and t != s.ctc_prev_id:
                    deltas[i].append(t)
                s.ctc_prev_id = t
            s.n_decoded = s.stitched().shape[0]

    def _decode_transducer(self, active, deltas):
        from e2e_asr_tpu.models import transducer

        todo = [(i, s) for i, s in active
                if s.stitched().shape[0] > s.n_decoded]
        if not todo:
            return
        H = todo[0][1].stitched().shape[1]
        span = max(s.stitched().shape[0] - s.n_decoded for _, s in todo)
        spans = np.zeros((self.S, span, H), np.float32)
        lens = np.zeros((self.S,), np.int32)
        for i, s in todo:
            enc = s.stitched()
            n = enc.shape[0] - s.n_decoded
            spans[i, :n] = enc[s.n_decoded:]
            lens[i] = n
        tokens, self._rnnt_state = transducer.greedy_decode_states(
            self.params, self.cfg, jnp.asarray(spans), jnp.asarray(lens),
            compute_dtype=self.compute_dtype, max_output=4 * span,
            init_state=self._rnnt_state, return_state=True)
        tokens = np.asarray(tokens)
        for i, s in todo:
            deltas[i].extend(int(t) for t in tokens[i] if t != 0)
            s.n_decoded = s.stitched().shape[0]

    def _decode_attention(self, active, deltas, flush_sids):
        import dataclasses

        from e2e_asr_tpu.eval.beam import beam_decode

        while True:
            todo = []
            for i, s in active:
                total = s.stitched().shape[0]
                if (total - s.n_decoded >= self.seg
                        or (i in flush_sids and total > s.n_decoded)):
                    todo.append((i, s))
            if not todo:
                return
            H = todo[0][1].stitched().shape[1]
            segs = np.zeros((self.S, self.seg, H), np.float32)
            lens = np.zeros((self.S,), np.int32)
            for i, s in todo:
                enc = s.stitched()
                n = min(self.seg, enc.shape[0] - s.n_decoded)
                segs[i, :n] = enc[s.n_decoded:s.n_decoded + n]
                lens[i] = n
            bc = dataclasses.replace(self.beam_cfg,
                                     max_steps=int(self.seg * 1.3) + 16)
            tokens, out_lens, _ = beam_decode(
                self.params["decoder_char"], self.cfg.decoders["char"], bc,
                jnp.asarray(segs), jnp.asarray(np.maximum(lens, 1)))
            tokens, out_lens = np.asarray(tokens), np.asarray(out_lens)
            for i, s in todo:
                ids = tokens[i][: out_lens[i]]
                deltas[i].extend(int(t) for t in ids if t > 2)
                s.n_decoded += int(lens[i])

    # -- teardown ----------------------------------------------------------
    def finish(self, sid: int) -> str:
        """Flush the session's tail, close its slot, return its remaining
        transcript text. Text the tick finalizes for OTHER sessions stays
        in their outboxes for their next step()/finish() read."""
        s = self._session(sid)
        self._tick(frozenset({sid}))
        out = s.outbox
        self._sessions[sid] = None
        return out

    def transcript(self, sid: int) -> str:
        return text.ids_to_sentence(self._session(sid).ids, self.rev_vocab)
