"""Long-form (chunked) inference — a TPU-native extension beyond the
reference's scope.

The reference caps utterances at the bucketed SWBD lengths (train.py:44)
and decodes at most 120 characters (beam_search.py:269); long-form audio
(minutes) has no path. Here the feature sequence is chunked into fixed
windows with symmetric context margins, the encoder runs ONCE batched over
the chunks (static shapes; the chunk axis is an ordinary batch axis, so it
also shards across a device mesh like any batch), the margins are trimmed
from each chunk's top-layer attention states, the trimmed pieces are
stitched along time, and the attention decoder runs over the stitched
states with a proportionally raised step cap.

The BiLSTM recurrence is local to each chunk (the margin frames provide
cross-chunk acoustic context) — the standard chunked-streaming
approximation for recurrent encoders; SURVEY.md section 5 names this the
natural long-context extension. Accuracy vs the monolithic pass is pinned
by tests/test_longform.py on synthetic speech.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import BeamConfig, Seq2SeqConfig
from e2e_asr_tpu.models import encoder as encoder_lib
from e2e_asr_tpu.models import seq2seq

Array = jax.Array


def reduction_factor(cfg: Seq2SeqConfig, task: str = "char") -> int:
    """Total time reduction of the attention states the task reads:
    initial_res_fac x skip_step per pyramid reduction before that depth
    (encoder.layer_plan mirrors encoder.py:172)."""
    if cfg.encoder.encoder_type == "transformer":
        return cfg.encoder.subsample      # constant rate across blocks
    depth = cfg.num_layers[task]
    max_depth = max(cfg.num_layers.values())
    plan = encoder_lib.layer_plan(cfg.encoder, max_depth)
    r = cfg.encoder.initial_res_fac
    for i in range(depth - 1):
        if plan[i]:
            r *= cfg.encoder.skip_step
    return r


def chunk_features(feats: Array, window: int, margin: int
                   ) -> tuple[Array, Array, int]:
    """[T, F] -> ([N, margin+window+margin, F], [N] true lengths, N).

    Chunks hop by `window`; each carries `margin` context frames on both
    sides (zeros beyond the signal). Lengths count margin + valid main
    frames + trailing context, so the encoder's masking sees real audio
    as valid and the synthetic zero padding as padding.
    """
    T, F = feats.shape
    n = max(1, math.ceil(T / window))
    padded = jnp.pad(feats, ((margin, n * window + margin - T), (0, 0)))
    chunks = jnp.stack([
        jax.lax.dynamic_slice_in_dim(padded, i * window,
                                     window + 2 * margin, axis=0)
        for i in range(n)])
    main = [min(window, T - i * window) for i in range(n)]
    trail = [min(margin, T - (i * window + main[i])) for i in range(n)]
    lens = jnp.asarray([margin + main[i] + trail[i] for i in range(n)],
                       jnp.int32)
    return chunks, lens, n


def encode_longform(params: dict, cfg: Seq2SeqConfig, feats: Array, *,
                    window: int = 512, margin: int = 64,
                    compute_dtype=None) -> tuple[Array, Array]:
    """Chunked encoder pass over one long utterance.

    feats: [T, F] log-mel frames. window/margin must be multiples of the
    pyramid reduction factor so margins trim to whole encoder frames.
    Returns (enc_states [1, T_out, H_enc], enc_len [1]).
    """
    r = reduction_factor(cfg)
    if window % r or margin % r:
        raise ValueError(f"window/margin must be multiples of the pyramid "
                         f"reduction factor {r}: got {window}/{margin}")
    T = feats.shape[0]
    chunks, lens, n = chunk_features(feats, window, margin)
    attn_states, _, enc_lens = seq2seq.encode(
        params, cfg, chunks, lens, train=False, compute_dtype=compute_dtype)
    depth = cfg.num_layers["char"]
    states = attn_states[depth]                       # [N, W', H_enc]
    m_out = margin // r
    pieces = []
    for i in range(n):
        main = min(window, T - i * window)
        n_out = math.ceil(main / r)
        pieces.append(states[i, m_out:m_out + n_out])
    stitched = jnp.concatenate(pieces, axis=0)[None]  # [1, T_out, H_enc]
    return stitched, jnp.asarray([stitched.shape[1]], jnp.int32)


def transcribe_longform(params: dict, cfg: Seq2SeqConfig, feats: Array, *,
                        beam_cfg: BeamConfig | None = None,
                        window: int = 512, margin: int = 64,
                        max_steps: int | None = None, compute_dtype=None,
                        lm_params: dict | None = None) -> Array:
    """Long-form decode: chunked encoder + beam search over the stitched
    states. Returns token ids [steps] (int32, <pad> after <eos>)."""
    from e2e_asr_tpu.eval.beam import beam_decode

    # Checkpoint-restored trees carry NumPy leaves; beam_decode's traced
    # while-body indexes the embedding with a tracer, which NumPy rejects.
    params = jax.tree_util.tree_map(jnp.asarray, params)
    enc, enc_len = encode_longform(params, cfg, feats, window=window,
                                   margin=margin, compute_dtype=compute_dtype)
    if max_steps is None:
        # ~8 input frames per character (encoder.py:171) and the default
        # pyramid reduces 8x, so ~1 char per encoder frame; leave slack.
        max_steps = int(enc.shape[1] * 1.3) + 16
    import dataclasses
    bc = dataclasses.replace(beam_cfg or BeamConfig(), max_steps=max_steps)
    tokens, lens, _ = beam_decode(params["decoder_char"],
                                  cfg.decoders["char"], bc, enc, enc_len,
                                  lm_params=lm_params)
    return tokens[0][:int(lens[0])]


def transcribe_ctc_longform(params: dict, cfg: Seq2SeqConfig, feats: Array, *,
                            window: int = 512, margin: int = 64,
                            beam_size: int = 1, compute_dtype=None,
                            return_timestamps: bool = False):
    """Long-form decode for the pure-CTC family (models/ctc.py): chunked
    encoder -> CTC head over the stitched states -> best-path collapse (or
    prefix beam search when beam_size > 1).

    CTC is frame-local, so unlike the attention decoder it has NO
    length-generalization limit — the stitched sequence decodes in one pass
    at any audio length, no segmentation needed.

    Returns token ids [n] (specials-free, unpadded); with
    return_timestamps=True, (ids, starts [n], ends [n]) where the spans are
    inclusive encoder-frame indices from Viterbi-realigning the hypothesis
    to the frame posteriors (eval/align.py — works for beam output too,
    where the decode itself carries no per-token frames).
    """
    from e2e_asr_tpu.core.layers import dense
    from e2e_asr_tpu.models import ctc

    params = jax.tree_util.tree_map(jnp.asarray, params)
    enc, enc_len = encode_longform(params, cfg, feats, window=window,
                                   margin=margin, compute_dtype=compute_dtype)
    lg = dense(params["ctc_head"], enc, compute_dtype=compute_dtype)
    if beam_size > 1:
        from e2e_asr_tpu.eval.ctc_beam import ctc_beam_decode
        log_probs = jax.nn.log_softmax(lg, axis=-1)
        seqs, seq_lens, _ = ctc_beam_decode(log_probs, enc_len,
                                            beam_size=beam_size,
                                            blank_id=ctc.BLANK_ID)
        ids = seqs[0, 0][:int(seq_lens[0, 0])]
    else:
        packed = ctc.best_path_from_logits(lg, enc_len)[0]
        ids = packed[packed > 0]
    if not return_timestamps:
        return ids
    from e2e_asr_tpu.eval import align
    n = int(ids.shape[0])
    if n == 0:
        empty = jnp.zeros((0,), jnp.int32)
        return ids, empty, empty
    lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
    states, _ = align.ctc_viterbi_align(lp, enc_len, ids[None, :],
                                        jnp.asarray([n]))
    starts, ends = align.token_spans(states, enc_len, jnp.asarray([n]), n)
    return ids, starts[0], ends[0]


def transcribe_transducer_longform(params: dict, cfg: Seq2SeqConfig,
                                   feats: Array, *, window: int = 512,
                                   margin: int = 64, beam_size: int = 1,
                                   compute_dtype=None,
                                   return_timestamps: bool = False):
    """Long-form decode for the transducer family (models/transducer.py):
    chunked encoder -> one monotonic greedy/beam pass over the stitched
    states. Like CTC (and unlike the attention decoder), the transducer
    consumes frames strictly left to right, so arbitrary audio lengths
    decode in one pass with no segmentation; the output cap scales with the
    stitched length instead of the training-time max_output.

    Returns token ids [n] (specials-free, unpadded); with
    return_timestamps=True (greedy only — the monotonic decoder's emission
    frames ARE the alignment, no realignment pass needed), (ids, starts,
    ends) where starts == ends == the emission's encoder frame.
    """
    from e2e_asr_tpu.models import transducer

    if return_timestamps and beam_size > 1:
        raise ValueError("transducer timestamps come from greedy emission "
                         "frames; use -beam_size 1")
    params = jax.tree_util.tree_map(jnp.asarray, params)
    enc, enc_len = encode_longform(params, cfg, feats, window=window,
                                   margin=margin, compute_dtype=compute_dtype)
    cap = 4 * int(enc.shape[1])
    if beam_size > 1:
        from e2e_asr_tpu.eval.transducer_beam import transducer_beam_decode
        seqs, seq_lens, _ = transducer_beam_decode(
            params, cfg, enc, enc_len, beam_size=beam_size,
            compute_dtype=compute_dtype, max_output=cap)
        ids = seqs[0, 0][:int(seq_lens[0, 0])]
    else:
        packed, frames = transducer.greedy_decode_states(
            params, cfg, enc, enc_len, compute_dtype=compute_dtype,
            max_output=cap, return_frames=True)
        keep = packed[0] > 0
        ids = packed[0][keep]
        if return_timestamps:
            emit_f = frames[0][keep]
            return ids, emit_f, emit_f
    return ids


def token_attention_frames(params: dict, cfg, enc: Array, enc_lens: Array,
                           tokens: Array, *, compute_dtype=None) -> Array:
    """Teacher-forced replay of the attention decoder over its OWN
    hypothesis, returning each token's attention-argmax encoder frame.

    tokens: [B, L] decoded ids (as beam_decode returns them). Decoding is
    deterministic given the fed tokens, so the replay reproduces exactly
    the attention the beam followed — one batched scan, no beam-state
    surgery. Returns frames [B, L] (int32).
    """
    from e2e_asr_tpu.models import attn_decoder

    B, L = tokens.shape
    go = jnp.ones((B, 1), tokens.dtype)                # <go> = 1
    if getattr(cfg, "decoder_type", "rnn") == "transformer":
        # One parallel teacher-forced pass; alpha is the last block's
        # head-averaged cross-attention (the module's anchor contract).
        from e2e_asr_tpu.models import transformer_decoder as td
        inputs = jnp.concatenate([go, tokens[:, :-1]], axis=1)
        pos = jnp.asarray(td._sinusoidal(L, cfg.hidden_size_dec))
        x = params["embedding"][inputs] + pos[None]
        mask = (jnp.arange(enc.shape[1])[None, :]
                < enc_lens.astype(jnp.int32)[:, None]).astype(jnp.float32)
        _, alpha = td._full_forward(params, cfg, x, enc, mask,
                                    compute_dtype=compute_dtype)
        return jnp.argmax(alpha, axis=-1).astype(jnp.int32)   # [B, L]
    ctx = attn_decoder.make_attn_context(params, enc, enc_lens,
                                         compute_dtype=compute_dtype)
    state0 = attn_decoder.zero_state(cfg, B, ctx)
    emb = params["embedding"]
    go = jnp.ones((B, 1), tokens.dtype)                # <go> = 1
    inputs = jnp.concatenate([go, tokens[:, :-1]], axis=1)

    def scan_step(state, tok):
        new_state, _ = attn_decoder.step(params, cfg, ctx, state, emb[tok],
                                         compute_dtype=compute_dtype)
        return new_state, jnp.argmax(new_state.alpha, axis=-1)

    _, frames = jax.lax.scan(scan_step, state0, inputs.T)
    return frames.T.astype(jnp.int32)                  # [B, L]


def frame_energy(feats, r: int) -> np.ndarray:
    """Per-ENCODER-frame energy proxy: the log-mel features averaged over
    mel bins, mean-pooled over each encoder frame's r input frames."""
    e = np.asarray(feats, np.float32).mean(axis=-1)            # [T]
    T = e.shape[0]
    n = math.ceil(T / r)
    e = np.pad(e, (0, n * r - T), constant_values=e.min())
    return e.reshape(n, r).mean(axis=1)                        # [T_enc-ish]


def vad_boundaries(energy: np.ndarray, total: int, seg_T: int,
                   slack: int) -> list[int]:
    """Silence-aligned segment starts: each boundary lands on the
    minimum-energy encoder frame within `slack` frames BEFORE the nominal
    cut (prev + seg_T), so segments end at pauses instead of mid-word and
    never exceed seg_T frames."""
    starts = [0]
    while starts[-1] + seg_T < total:
        target = starts[-1] + seg_T
        lo = max(starts[-1] + 1, target - slack)
        window = energy[lo: min(target, total - 1) + 1]
        starts.append(lo + int(np.argmin(window)))
    return starts


def transcribe_segmented(params: dict, cfg: Seq2SeqConfig, feats: Array, *,
                         seg_enc_frames: int = 64,
                         overlap: int = 0,
                         trim_loops: bool = True,
                         vad: bool = False, vad_slack: int = 16,
                         beam_cfg: BeamConfig | None = None,
                         window: int = 512, margin: int = 64,
                         compute_dtype=None,
                         lm_params: dict | None = None,
                         return_timestamps: bool = False):
    """Segmented long-form decode: chunked encoder, then beam-decode the
    stitched states in SEGMENTS of seg_enc_frames encoder frames, all
    segments batched into one beam_decode call, transcripts concatenated.

    return_timestamps=True also returns each kept token's GLOBAL
    attention-argmax encoder frame (segment offset + the replayed local
    frame) as (ids, starts, ends) with starts == ends — the attention
    centroid is an anchor point, not a span. This is the approximate
    attention-family analogue of the CTC family's Viterbi spans
    (eval/align.py) and the transducer's exact emission frames.

    Whole-utterance attention decoding degrades far beyond the training
    length distribution (measured on-chip: a model trained on <=14-token
    utterances emits ~8 tokens then <eos> on 26+-token audio — the standard
    LAS length-generalization failure). Segmenting keeps each decode within
    the distribution; this is the production long-form recipe.

    trim_loops (default on) removes end-of-window HALLUCINATION LOOPS —
    the dominant residual of plain segment concatenation: near a window's
    end the decoder sometimes re-attends backward and re-emits a token run
    before finding <eos>. The loop start is detectable as a backward jump
    in the attention centroid, so each hypothesis is truncated at the first
    centroid regression >1 frame (token_attention_frames replay; measured
    on-chip, it halves the concatenation-suite token error —
    VALIDATION.md round-3).

    overlap > 0 (encoder frames) keeps the decoded window at
    seg_enc_frames — the length the model is reliable at — and shrinks the
    HOP to seg_enc_frames - 2*overlap instead, so adjacent segments share
    2*overlap frames and each owns an exclusive CORE region
    [overlap, seg_T - overlap) tiling the timeline exactly; a token is
    kept iff its attention centroid lies in its segment's core. CAVEAT,
    measured: on the synth checkpoint this is WORSE than trim_loops alone,
    because hopped windows start mid-utterance and the decoder skips or
    re-orders leading window content (two more designs measured and
    rejected: extending the window pushes decodes out of the training
    length distribution; text-alignment merging mis-splices on
    hallucinated repeats — VALIDATION.md round-3).

    vad=True aligns segment boundaries with PAUSES: each cut moves up to
    vad_slack encoder frames earlier, onto the minimum-energy frame
    (frame_energy/vad_boundaries), so decode windows start and end at
    silences instead of mid-word — segments become variable-length
    (<= seg_enc_frames, attention-masked to their true span). Not combined
    with overlap (whose fixed core-tiling geometry assumes uniform hops).

    Returns concatenated token ids [total] (no <eos>/<pad> between segments).
    """
    import dataclasses

    from e2e_asr_tpu.eval.beam import beam_decode

    if overlap and 2 * overlap >= seg_enc_frames:
        raise ValueError(f"need 2*overlap < seg_enc_frames, got "
                         f"{overlap}/{seg_enc_frames}")
    if vad and overlap:
        raise ValueError("vad segmentation and overlap mode are separate "
                         "boundary strategies; pick one")
    params = jax.tree_util.tree_map(jnp.asarray, params)
    enc, enc_len = encode_longform(params, cfg, feats, window=window,
                                   margin=margin, compute_dtype=compute_dtype)
    total = int(enc_len[0])
    seg_T = seg_enc_frames
    hop = seg_T - 2 * overlap
    if vad:
        seg_starts = vad_boundaries(
            frame_energy(feats, reduction_factor(cfg)), total, seg_T,
            vad_slack)
        n_seg = len(seg_starts)
    else:
        n_seg = 1 + max(0, math.ceil((total - seg_T) / hop))
        seg_starts = [i * hop for i in range(n_seg)]
    enc_p = jnp.pad(enc[0], ((0, max(0, seg_starts[-1] + seg_T
                                     - enc.shape[1])), (0, 0)))
    segs = jnp.stack([
        jax.lax.dynamic_slice_in_dim(enc_p, s, seg_T, axis=0)
        for s in seg_starts])
    starts = jnp.asarray(seg_starts, jnp.int32)
    if vad:
        # Non-overlapping variable spans tiling [0, total).
        ends = jnp.asarray(seg_starts[1:] + [total], jnp.int32)
        seg_lens = jnp.clip(ends - starts, 1, seg_T).astype(jnp.int32)
    else:
        seg_lens = jnp.clip(total - starts, 1, seg_T).astype(jnp.int32)
    max_steps = int(seg_T * 1.3) + 16
    bc = dataclasses.replace(beam_cfg or BeamConfig(), max_steps=max_steps)
    tokens, lens, _ = beam_decode(params["decoder_char"],
                                  cfg.decoders["char"], bc, segs, seg_lens,
                                  lm_params=lm_params)
    if overlap == 0 and not trim_loops and not return_timestamps:
        flat = []
        for i in range(n_seg):
            ids = tokens[i][:int(lens[i])]
            flat.extend(int(t) for t in ids[(ids > 2)])   # strip specials
        return jnp.asarray(flat, jnp.int32)
    frames = np.asarray(token_attention_frames(
        params["decoder_char"], cfg.decoders["char"], segs, seg_lens, tokens,
        compute_dtype=compute_dtype))
    tokens_np, lens_np = np.asarray(tokens), np.asarray(lens)
    merged: list = []
    for i in range(n_seg):
        if overlap:
            # core assignment: first/last segments extend to their edge
            lo = overlap if i > 0 else 0
            hi = seg_T - overlap if i < n_seg - 1 else seg_T
        else:
            lo, hi = 0, seg_T
        kept = trimmed_segment_tokens(
            tokens_np[i], frames[i], int(lens_np[i]), lo, hi,
            trim_loops=trim_loops, with_frames=return_timestamps)
        if return_timestamps:
            off = seg_starts[i]
            merged.extend((tok, min(off + f, total - 1)) for tok, f in kept)
        else:
            merged.extend(kept)
    if return_timestamps:
        ids = jnp.asarray([t for t, _ in merged], jnp.int32)
        fr = jnp.asarray([f for _, f in merged], jnp.int32)
        return ids, fr, fr
    return jnp.asarray(merged, jnp.int32)


def trimmed_segment_tokens(tokens_row, frames_row, n: int, lo: int, hi: int,
                           *, trim_loops: bool = True,
                           tol: int = 1, with_frames: bool = False):
    """One segment's kept tokens: specials stripped, attention centroid in
    [lo, hi), truncated at the first backward centroid jump > tol frames
    (the hallucination-loop start) when trim_loops. with_frames=True
    returns (token, local_frame) pairs instead of bare tokens."""
    out = []
    prev = -10 ** 9
    for t in range(n):
        tok = int(tokens_row[t])
        if tok <= 2:
            continue
        f = int(frames_row[t])
        if trim_loops and f < prev - tol:
            break
        prev = max(prev, f)
        if lo <= f < hi:
            out.append((tok, f) if with_frames else tok)
    return out
