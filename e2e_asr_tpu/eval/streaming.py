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


class StreamingTranscriber:
    def __init__(self, params: dict, cfg: Seq2SeqConfig,
                 rev_vocab: list[str], *, window: int = 512, margin: int = 64,
                 seg_enc_frames: int = 64, beam_cfg: BeamConfig | None = None,
                 compute_dtype=None, sample_rate: int = 16000,
                 frame_length: int = 400, hop_length: int = 160,
                 n_mels: int | None = None):
        r = longform.reduction_factor(cfg)
        if window % r or margin % r:
            raise ValueError(f"window/margin must be multiples of the "
                             f"encoder reduction factor {r}")
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.cfg = cfg
        self.rev_vocab = rev_vocab
        self.window, self.margin, self.r = window, margin, r
        self.seg = seg_enc_frames
        self.beam_cfg = beam_cfg or BeamConfig()
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
        from e2e_asr_tpu.frontend.logmel import featurize_utterance

        n_total = max(0, 1 + (len(self._samples) - self.frame_length)
                      // self.hop)
        if n_total <= self._n_framed:
            return
        k0 = self._n_framed
        sl = self._samples[k0 * self.hop:
                           (n_total - 1) * self.hop + self.frame_length]
        new = featurize_utterance(sl, sample_rate=self.sr,
                                  frame_length=self.frame_length,
                                  hop_length=self.hop, n_mels=self.n_mels)
        self._frames = np.concatenate([self._frames, new], axis=0)
        self._n_framed = n_total

    # -- encoder -----------------------------------------------------------
    def _encode_ready_chunks(self, *, flush: bool = False):
        W, M = self.window, self.margin
        while True:
            i = self._n_chunks
            have = self._frames.shape[0]
            if flush:
                main = min(W, have - i * W)
                if main <= 0:
                    break
            else:
                if have < (i + 1) * W + M:
                    break
                main = W
            lo = i * W - M
            pad_left = max(0, -lo)
            piece = self._frames[max(0, lo): i * W + main + M]
            chunk = np.zeros((W + 2 * M, self.n_mels), np.float32)
            chunk[pad_left:pad_left + piece.shape[0]] = piece
            trail = min(M, have - (i * W + main))
            length = M - pad_left + main + max(0, trail) + pad_left
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
