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
                            beam_size: int = 1,
                            compute_dtype=None) -> Array:
    """Long-form decode for the pure-CTC family (models/ctc.py): chunked
    encoder -> CTC head over the stitched states -> best-path collapse (or
    prefix beam search when beam_size > 1).

    CTC is frame-local, so unlike the attention decoder it has NO
    length-generalization limit — the stitched sequence decodes in one pass
    at any audio length, no segmentation needed.

    Returns token ids [n] (specials-free, unpadded).
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
    return ids


def transcribe_segmented(params: dict, cfg: Seq2SeqConfig, feats: Array, *,
                         seg_enc_frames: int = 64,
                         beam_cfg: BeamConfig | None = None,
                         window: int = 512, margin: int = 64,
                         compute_dtype=None,
                         lm_params: dict | None = None) -> Array:
    """Segmented long-form decode: chunked encoder, then beam-decode the
    stitched states in SEGMENTS of seg_enc_frames encoder frames, all
    segments batched into one beam_decode call, transcripts concatenated.

    Whole-utterance attention decoding degrades far beyond the training
    length distribution (measured on-chip: a model trained on <=14-token
    utterances emits ~8 tokens then <eos> on 26+-token audio — the standard
    LAS length-generalization failure). Segmenting keeps each decode within
    the distribution; this is the production long-form recipe. A token
    straddling a segment boundary may be split — align seg_enc_frames with
    natural pauses where possible.

    Returns concatenated token ids [total] (no <eos>/<pad> between segments).
    """
    import dataclasses

    from e2e_asr_tpu.eval.beam import beam_decode

    params = jax.tree_util.tree_map(jnp.asarray, params)
    enc, enc_len = encode_longform(params, cfg, feats, window=window,
                                   margin=margin, compute_dtype=compute_dtype)
    total = int(enc_len[0])
    n_seg = max(1, math.ceil(total / seg_enc_frames))
    padded_T = n_seg * seg_enc_frames
    enc_p = jnp.pad(enc[0], ((0, padded_T - enc.shape[1]), (0, 0)))
    segs = enc_p[:padded_T].reshape(n_seg, seg_enc_frames, -1)
    seg_lens = jnp.minimum(
        jnp.maximum(total - jnp.arange(n_seg) * seg_enc_frames, 0),
        seg_enc_frames).astype(jnp.int32)
    max_steps = int(seg_enc_frames * 1.3) + 16
    bc = dataclasses.replace(beam_cfg or BeamConfig(), max_steps=max_steps)
    tokens, lens, _ = beam_decode(params["decoder_char"],
                                  cfg.decoders["char"], bc, segs, seg_lens,
                                  lm_params=lm_params)
    out = []
    for i in range(n_seg):
        ids = tokens[i][:int(lens[i])]
        out.append(ids[(ids > 2)])        # strip <pad>/<go>/<eos>
    return jnp.concatenate(out) if out else jnp.zeros((0,), jnp.int32)
