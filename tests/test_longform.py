"""Long-form chunked inference (eval/longform.py).

Exactness contracts:
- a single chunk covering the whole signal reproduces the monolithic
  encoder pass bit-for-bit (same computation modulo masked padding);
- with the recurrent weights zeroed the encoder is a local function of
  aligned frame groups, so ANY chunking must match the monolithic pass
  exactly — this pins the margin-trim/stitch indexing.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import (BeamConfig, DecoderConfig, EncoderConfig,
                                Seq2SeqConfig)
from e2e_asr_tpu.eval import longform
from e2e_asr_tpu.models import seq2seq


def tiny_cfg(layers=3):
    return Seq2SeqConfig(
        tasks=["char"],
        num_layers={"char": layers},
        max_output={"char": 30},
        encoder=EncoderConfig(hidden_size=8),
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=8, vocab_size=11, lm_hidden_size=8,
            attention_vec_size=8, max_output=30, samp_prob=0.0,
            out_prob_dec=1.0)},
        feat_length=6)


def test_reduction_factor_default_flagship():
    cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 4},
                        max_output={"char": 120},
                        encoder=EncoderConfig(hidden_size=8),
                        decoders={"char": DecoderConfig(vocab_size=11)},
                        feat_length=6)
    assert longform.reduction_factor(cfg) == 8   # encoder.py:171 rationale
    cfg3 = dataclasses.replace(cfg, num_layers={"char": 3})
    assert longform.reduction_factor(cfg3) == 4


def test_single_chunk_matches_monolithic():
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    T = 40
    feats = jax.random.normal(jax.random.PRNGKey(1), (T, cfg.feat_length))
    r = longform.reduction_factor(cfg)

    enc, enc_len = longform.encode_longform(params, cfg, feats,
                                            window=48, margin=0)
    full_states, _, full_lens = seq2seq.encode(
        params, cfg, feats[None], jnp.asarray([T]), train=False)
    depth = cfg.num_layers["char"]
    n_out = int(full_lens[depth][0])
    assert int(enc_len[0]) == -(-T // r) == n_out
    np.testing.assert_allclose(np.asarray(enc[0, :n_out]),
                               np.asarray(full_states[depth][0, :n_out]),
                               rtol=1e-5, atol=1e-6)


def _zero_recurrence(params):
    """Make every encoder cell memoryless: zero the recurrent weight block
    AND drive the forget gate to 0 (c would otherwise still carry across
    time through c_{t-1}*sigmoid(f+1)). The encoder then is a local function
    of aligned frame groups."""
    import copy
    p = copy.deepcopy(params)
    for name, layer in p["encoder"].items():
        for d in layer.values():                      # fw / bw
            H = d["bias"].shape[0] // 4
            in_dim = d["kernel"].shape[0] - H
            d["kernel"] = d["kernel"].at[in_dim:].set(0.0)
            d["bias"] = d["bias"].at[2 * H:3 * H].set(-1e4)
    return p


def test_multi_chunk_stitching_exact_with_local_encoder():
    cfg = tiny_cfg()
    params = _zero_recurrence(seq2seq.init(jax.random.PRNGKey(2), cfg))
    r = longform.reduction_factor(cfg)
    T = 100                                           # spans 3+ chunks
    feats = jax.random.normal(jax.random.PRNGKey(3), (T, cfg.feat_length))

    enc, enc_len = longform.encode_longform(params, cfg, feats,
                                            window=8 * r, margin=2 * r)
    full_states, _, full_lens = seq2seq.encode(
        params, cfg, feats[None], jnp.asarray([T]), train=False)
    depth = cfg.num_layers["char"]
    n_out = int(enc_len[0])
    assert n_out == int(full_lens[depth][0])
    np.testing.assert_allclose(np.asarray(enc[0, :n_out]),
                               np.asarray(full_states[depth][0, :n_out]),
                               rtol=1e-5, atol=1e-6)


def test_transcribe_longform_shapes_and_cap():
    cfg = tiny_cfg()
    # NumPy leaves, as a checkpoint restore produces them (regression: the
    # beam while-body must not index a NumPy embedding with a tracer).
    params = jax.tree_util.tree_map(np.asarray,
                                    seq2seq.init(jax.random.PRNGKey(4), cfg))
    feats = jax.random.normal(jax.random.PRNGKey(5), (90, cfg.feat_length))
    ids = longform.transcribe_longform(
        params, cfg, feats, window=8 * longform.reduction_factor(cfg),
        margin=0, beam_cfg=BeamConfig(beam_size=2), max_steps=17)
    assert ids.ndim == 1 and ids.shape[0] <= 17

    # window/margin must be multiples of the reduction factor
    import pytest
    with pytest.raises(ValueError):
        longform.encode_longform(params, cfg, feats, window=7, margin=0)


def test_single_chunk_matches_monolithic_transformer():
    """The chunked encoder must also be exact for the transformer family
    when one chunk covers the signal (full-chunk self-attention)."""
    import dataclasses as dc
    cfg = tiny_cfg()
    cfg = dc.replace(cfg, encoder=dc.replace(
        cfg.encoder, encoder_type="transformer", num_heads=2, ffn_mult=2,
        subsample=4, out_prob=1.0))
    params = seq2seq.init(jax.random.PRNGKey(10), cfg)
    T = 40
    feats = jax.random.normal(jax.random.PRNGKey(11), (T, cfg.feat_length))
    r = longform.reduction_factor(cfg)
    assert r == 4                                  # = subsample

    enc, enc_len = longform.encode_longform(params, cfg, feats,
                                            window=48, margin=0)
    full_states, _, full_lens = seq2seq.encode(
        params, cfg, feats[None], jnp.asarray([T]), train=False)
    depth = cfg.num_layers["char"]
    n_out = int(full_lens[depth][0])
    assert int(enc_len[0]) == n_out
    np.testing.assert_allclose(np.asarray(enc[0, :n_out]),
                               np.asarray(full_states[depth][0, :n_out]),
                               rtol=1e-5, atol=1e-5)


def test_transcribe_ctc_longform_paths():
    """CTC long-form decode (best-path and prefix beam) over stitched
    chunked-encoder states for the pure-CTC family."""
    import dataclasses as dc

    from e2e_asr_tpu.models import ctc as ctc_lib
    cfg = dc.replace(tiny_cfg(), model_family="ctc")
    params = ctc_lib.init(jax.random.PRNGKey(8), cfg,
                          vocab_size=cfg.decoders["char"].vocab_size)
    r = longform.reduction_factor(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(9), (70, cfg.feat_length))
    for beam in (1, 3):
        ids = longform.transcribe_ctc_longform(
            params, cfg, feats, window=8 * r, margin=2 * r, beam_size=beam)
        assert ids.ndim == 1
        assert np.all(np.asarray(ids) > 0)      # blanks/pads stripped


def test_transcribe_transducer_longform_paths():
    """Transducer long-form decode (greedy and beam) over stitched
    chunked-encoder states; one monotonic pass, no segmentation."""
    import dataclasses as dc

    from e2e_asr_tpu.models import transducer as rnnt_lib
    cfg = dc.replace(tiny_cfg(), model_family="transducer")
    params = rnnt_lib.init(jax.random.PRNGKey(11), cfg,
                           vocab_size=cfg.decoders["char"].vocab_size)
    r = longform.reduction_factor(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(12), (70, cfg.feat_length))
    for beam in (1, 3):
        ids = longform.transcribe_transducer_longform(
            params, cfg, feats, window=8 * r, margin=2 * r, beam_size=beam)
        assert ids.ndim == 1
        assert np.all(np.asarray(ids) > 0)      # blank never emitted


def test_transcribe_segmented_batches_and_concatenates():
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(6), cfg)
    r = longform.reduction_factor(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(7), (90, cfg.feat_length))
    ids = longform.transcribe_segmented(
        params, cfg, feats, seg_enc_frames=6, window=8 * r, margin=0,
        beam_cfg=BeamConfig(beam_size=2))
    assert ids.ndim == 1
    # Segment caps bound the output: ceil(23/6)=4 segments, each <= 23 steps.
    assert ids.shape[0] <= 4 * (int(6 * 1.3) + 16)
    assert np.all(np.asarray(ids) > 2)    # specials stripped


def test_trimmed_segment_tokens_removes_hallucination_loop():
    """A backward attention-centroid jump > tol marks the start of an
    end-of-window hallucination loop; the hypothesis truncates there."""
    toks = np.array([19, 21, 27, 18, 23, 10, 18, 23, 10, 2])
    frs = np.array([0, 1, 2, 5, 6, 2, 3, 5, 2, 6])   # loop re-attends 2..
    kept = longform.trimmed_segment_tokens(toks, frs, len(toks), 0, 8)
    assert kept == [19, 21, 27, 18, 23]
    # small regressions (tol=1) and equal frames are genuine, not loops
    toks2 = np.array([5, 6, 7, 8])
    frs2 = np.array([2, 3, 2, 4])
    assert longform.trimmed_segment_tokens(toks2, frs2, 4, 0, 8) == \
        [5, 6, 7, 8]
    # specials stripped; core window filters by centroid
    assert longform.trimmed_segment_tokens(toks, frs, len(toks), 2, 6,
                                           trim_loops=False) == \
        [27, 18, 10, 18, 23, 10]
    # trim_loops off keeps everything in-window
    assert longform.trimmed_segment_tokens(toks2, frs2, 4, 0, 8,
                                           trim_loops=False) == [5, 6, 7, 8]


def test_transcribe_segmented_overlap_mode():
    """overlap > 0 runs end to end: constant window, shrunken hop,
    attention-core token assignment; output is 1-D, specials-free, bounded
    by the per-segment step caps."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(6), cfg)
    r = longform.reduction_factor(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(7), (90, cfg.feat_length))
    ids = longform.transcribe_segmented(
        params, cfg, feats, seg_enc_frames=6, overlap=2, window=8 * r,
        margin=0, beam_cfg=BeamConfig(beam_size=2))
    assert ids.ndim == 1
    # total=23 enc frames, seg_T=6, hop=2 -> 10 segments
    n_seg, seg_T = 10, 6
    assert ids.shape[0] <= n_seg * (int(seg_T * 1.3) + 16)
    if ids.shape[0]:
        assert np.all(np.asarray(ids) > 2)

    import pytest
    with pytest.raises(ValueError):        # 2*overlap must stay < window
        longform.transcribe_segmented(params, cfg, feats, seg_enc_frames=6,
                                      overlap=3, window=8 * r, margin=0)


def test_transcribe_segmented_overlap_geometry():
    """Constant-window / shrunken-hop geometry: every segment is exactly
    seg_enc_frames long (the in-distribution decode length), adjacent
    segments share 2*overlap frames, and the segment set covers every
    encoder frame."""
    import math as m
    for total, W, ov in [(23, 6, 2), (24, 6, 2), (5, 6, 2), (40, 8, 3),
                         (17, 5, 1)]:
        seg_T = W
        hop = W - 2 * ov
        n_seg = 1 + max(0, m.ceil((total - seg_T) / hop))
        starts = np.arange(n_seg) * hop
        seg_lens = np.clip(total - starts, 1, seg_T)
        cover = np.zeros(total, np.int32)
        for i in range(n_seg):
            cover[starts[i]:starts[i] + seg_lens[i]] += 1
        assert (cover >= 1).all()          # every frame decoded
        if n_seg > 1:                      # true overlap between neighbours
            shared = starts[:-1] + seg_T - starts[1:]
            assert (shared >= 2 * ov).all()


def test_transcribe_segmented_timestamps():
    """return_timestamps: same kept tokens as the plain call, global
    attention-anchor frames in range and consistent with the segment
    geometry (frame // hop covers the owning or an adjacent segment)."""
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(6), cfg)
    r = longform.reduction_factor(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(7), (90, cfg.feat_length))
    kw = dict(seg_enc_frames=6, window=8 * r, margin=0,
              beam_cfg=BeamConfig(beam_size=2))
    plain = np.asarray(longform.transcribe_segmented(params, cfg, feats, **kw))
    ids, starts, ends = longform.transcribe_segmented(
        params, cfg, feats, return_timestamps=True, **kw)
    ids, starts, ends = map(np.asarray, (ids, starts, ends))
    np.testing.assert_array_equal(ids, plain)
    np.testing.assert_array_equal(starts, ends)
    assert starts.shape == ids.shape
    if len(starts):
        assert (starts >= 0).all()
        enc_total = -(-90 // r)
        assert (starts < enc_total).all()


def test_trimmed_segment_tokens_with_frames():
    toks = np.array([19, 21, 27, 2])
    frs = np.array([0, 3, 5, 6])
    assert longform.trimmed_segment_tokens(
        toks, frs, 4, 0, 8, with_frames=True) == [(19, 0), (21, 3), (27, 5)]


def test_vad_boundaries_land_on_silence():
    energy = np.full(20, 5.0, np.float32)
    energy[7] = -3.0       # pause inside the first cut's slack window
    energy[16] = -4.0      # pause inside the second's
    starts = longform.vad_boundaries(energy, total=20, seg_T=10, slack=4)
    assert starts == [0, 7, 16]
    spans = np.diff(starts + [20])
    assert np.all(spans <= 10) and np.all(spans > 0)
    # Without any dip the cut stays at the minimum of the slack window
    # (ties resolve to its first frame) and never exceeds seg_T.
    flat = np.zeros(25, np.float32)
    starts2 = longform.vad_boundaries(flat, total=25, seg_T=10, slack=3)
    assert starts2[0] == 0 and all(
        0 < b - a <= 10 for a, b in zip(starts2, starts2[1:] + [25]))


def test_frame_energy_pooling():
    feats = np.zeros((10, 4), np.float32)
    feats[4:8] = 7.0                       # loud frames
    e = longform.frame_energy(feats, r=4)  # ceil(10/4)=3 encoder frames
    assert e.shape == (3,)
    assert e[1] == 7.0 and e[0] == 0.0


def test_transcribe_segmented_vad_mode():
    cfg = tiny_cfg()
    params = seq2seq.init(jax.random.PRNGKey(6), cfg)
    r = longform.reduction_factor(cfg)
    feats = np.array(jax.random.normal(jax.random.PRNGKey(7),
                                       (90, cfg.feat_length)))
    feats[30:34] = -12.0                   # a clear pause
    ids = longform.transcribe_segmented(
        params, cfg, jnp.asarray(feats), seg_enc_frames=6, vad=True,
        vad_slack=3, window=8 * r, margin=0,
        beam_cfg=BeamConfig(beam_size=2))
    assert ids.ndim == 1
    assert np.all(np.asarray(ids) > 2)
    # Timestamps ride the VAD offsets.
    out = longform.transcribe_segmented(
        params, cfg, jnp.asarray(feats), seg_enc_frames=6, vad=True,
        vad_slack=3, window=8 * r, margin=0,
        beam_cfg=BeamConfig(beam_size=2), return_timestamps=True)
    ids_t, starts_t, _ = out
    assert len(ids_t) == len(starts_t)
    import pytest
    with pytest.raises(ValueError):
        longform.transcribe_segmented(
            params, cfg, jnp.asarray(feats), seg_enc_frames=6, vad=True,
            overlap=1, window=8 * r, margin=0)
