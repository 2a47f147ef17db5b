"""Exact streaming encode for forward-only recurrent encoders.

A unidirectional (bi_dir=False) LSTM/GRU pyramid has no right context, so
carrying each layer's cell state across chunk boundaries reproduces the
whole-utterance encoder EXACTLY with zero lookahead and zero margin
recompute (models/encoder.apply_streaming, core/rnn.*_scan_stateful).
These tests pin:
- chunked stateful layer scans == one full scan (LSTM + GRU),
- apply_streaming chunk-by-chunk == encoder.apply on the concatenation
  (pyramid + initial_res_fac + ragged final chunk + per-row length freeze),
- StreamingTranscriber engages the exact path for uni-dir encoders (margin
  forced to 0) and its stitched states equal the offline encode.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import DecoderConfig, EncoderConfig, Seq2SeqConfig
from e2e_asr_tpu.core import rnn
from e2e_asr_tpu.models import encoder as encoder_lib
from e2e_asr_tpu.models import seq2seq


def _uni_cfg(layers=3, cell_lstm=True, initial_res_fac=1, feat=6):
    return Seq2SeqConfig(
        tasks=["char"],
        num_layers={"char": layers},
        max_output={"char": 30},
        encoder=EncoderConfig(hidden_size=8, bi_dir=False, out_prob=1.0,
                              use_lstm=cell_lstm,
                              initial_res_fac=initial_res_fac),
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=8, vocab_size=11, lm_hidden_size=8,
            attention_vec_size=8, max_output=30, samp_prob=0.0,
            out_prob_dec=1.0)},
        feat_length=feat)


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_stateful_layer_chunk_equality(cell):
    """Chunked rnn_layer_stateful with carried state == one full
    forward-only rnn_layer pass."""
    rng = np.random.default_rng(0)
    T, B, F, H = 20, 3, 5, 7
    params = rnn.rnn_layer_init(jax.random.PRNGKey(1), F, H, cell=cell,
                                bidirectional=False)
    x = jnp.asarray(rng.normal(size=(T, B, F)).astype(np.float32))
    lens = jnp.asarray([T, T, T])
    full = rnn.rnn_layer(params, x, lens, cell=cell, bidirectional=False,
                         impl="xla")

    from e2e_asr_tpu.core import cells
    state = (cells.lstm_zero_state((B,), H) if cell == "lstm"
             else cells.gru_zero_state((B,), H))
    outs = []
    for lo, hi in [(0, 4), (4, 9), (9, 20)]:
        o, state = rnn.rnn_layer_stateful(params, x[lo:hi],
                                          jnp.asarray([hi - lo] * B), state,
                                          cell=cell)
        outs.append(o)
    np.testing.assert_allclose(np.concatenate(outs, axis=0),
                               np.asarray(full), atol=1e-6)


def test_stateful_scan_freezes_state_at_length():
    """Rows whose length ends inside a chunk keep their state frozen, so a
    later chunk with zero valid frames passes their state through."""
    rng = np.random.default_rng(1)
    T, B, F, H = 6, 2, 4, 5
    params = rnn.rnn_layer_init(jax.random.PRNGKey(2), F, H,
                                bidirectional=False)
    x = jnp.asarray(rng.normal(size=(T, B, F)).astype(np.float32))

    from e2e_asr_tpu.core import cells
    s0 = cells.lstm_zero_state((B,), H)
    # Row 1 valid for only 2 frames of the first chunk.
    _, s1 = rnn.rnn_layer_stateful(params, x[:4], jnp.asarray([4, 2]), s0)
    _, s2 = rnn.rnn_layer_stateful(params, x[4:], jnp.asarray([2, 0]), s1)
    np.testing.assert_array_equal(np.asarray(s2.h[1]), np.asarray(s1.h[1]))
    assert not np.allclose(np.asarray(s2.h[0]), np.asarray(s1.h[0]))
    # Frozen state == running row 1 alone for its true 2 frames.
    _, ref = rnn.rnn_layer_stateful(params, x[:2, 1:2], jnp.asarray([2]),
                                    cells.lstm_zero_state((1,), H))
    np.testing.assert_allclose(np.asarray(s2.c[1]), np.asarray(ref.c[1 - 1]),
                               atol=1e-6)


@pytest.mark.parametrize("cell_lstm,res_fac", [(True, 1), (False, 1),
                                               (True, 2)])
def test_apply_streaming_matches_apply(cell_lstm, res_fac):
    """Chunk-by-chunk apply_streaming == encoder.apply on the whole
    sequence, at every depth, including a ragged final chunk and a row
    whose length ends mid-stream."""
    cfg = _uni_cfg(cell_lstm=cell_lstm, initial_res_fac=res_fac)
    ecfg = cfg.encoder
    max_depth = cfg.num_layers["char"]
    r = encoder_lib.total_reduction_factor(ecfg, max_depth)
    rng = np.random.default_rng(3)
    B, T = 2, 7 * r + 3                    # ragged tail
    params = encoder_lib.init(jax.random.PRNGKey(4), ecfg, max_depth,
                              cfg.feat_length)
    x = jnp.asarray(rng.normal(size=(B, T, cfg.feat_length))
                    .astype(np.float32))
    lens = jnp.asarray([T, 3 * r + 1])     # row 1 ends mid-stream

    import os
    os.environ["E2E_ASR_NO_PALLAS"] = "1"
    attn, _, out_lens = encoder_lib.apply(params, ecfg, x, lens,
                                          cfg.num_layers)

    state = encoder_lib.streaming_state(ecfg, max_depth, B)
    got = {d: [] for d in attn}
    pos = 0
    for w in (2 * r, 4 * r, r, T - 7 * r):  # last chunk is the ragged tail
        chunk = x[:, pos:pos + w]
        cl = jnp.clip(lens - pos, 0, chunk.shape[1])
        s_attn, s_lens, state = encoder_lib.apply_streaming(
            params, ecfg, chunk, cl, cfg.num_layers, state,
            final=(pos + w >= T))
        for d in got:
            got[d].append(np.asarray(s_attn[d]))
        pos += w

    for d in attn:
        stitched = np.concatenate(got[d], axis=1)
        want = np.asarray(attn[d])
        assert stitched.shape == want.shape, d
        for b in range(B):
            n = int(out_lens[d][b])
            np.testing.assert_allclose(stitched[b, :n], want[b, :n],
                                       atol=1e-5, err_msg=f"depth {d} row {b}")
            # Past-length outputs are zero in both runs.
            np.testing.assert_array_equal(stitched[b, n:] * 0,
                                          stitched[b, n:])


def test_apply_streaming_rejects_misaligned_nonfinal_chunk():
    cfg = _uni_cfg()
    ecfg = cfg.encoder
    max_depth = cfg.num_layers["char"]
    params = encoder_lib.init(jax.random.PRNGKey(5), ecfg, max_depth,
                              cfg.feat_length)
    state = encoder_lib.streaming_state(ecfg, max_depth, 1)
    x = jnp.zeros((1, 3, cfg.feat_length))   # r = 4: misaligned
    with pytest.raises(ValueError, match="multiple"):
        encoder_lib.apply_streaming(params, ecfg, x, jnp.asarray([3]),
                                    cfg.num_layers, state)
    # final=True pads instead (the true stream end).
    encoder_lib.apply_streaming(params, ecfg, x, jnp.asarray([3]),
                                cfg.num_layers, state, final=True)


def test_bidirectional_rejected():
    cfg = _uni_cfg()
    ecfg = dataclasses.replace(cfg.encoder, bi_dir=True)
    assert not encoder_lib.supports_exact_streaming(ecfg)
    with pytest.raises(ValueError, match="forward-only"):
        encoder_lib.apply_streaming({}, ecfg, jnp.zeros((1, 4, 6)),
                                    jnp.asarray([4]), {"char": 3}, ())


# ------------------------------------------------------- transcriber level

def _wave(seconds=1.2, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    return (np.sin(2 * np.pi * 330 * t)
            + 0.3 * rng.normal(size=t.shape)).astype(np.float32)


def _vocab(tmp_path):
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.data.synth import make_vocab_dir
    make_vocab_dir(str(tmp_path / "v"))
    _, rev = text.initialize_vocabulary(str(tmp_path / "v" / "char.vocab"))
    return rev


def test_transcriber_exact_mode_stitched_equals_offline(tmp_path):
    """Uni-dir transducer: the transcriber engages the exact path (margin
    0), its stitched states equal one offline encode, and the transcript is
    push-granularity invariant."""
    from e2e_asr_tpu.eval.streaming import StreamingTranscriber
    from e2e_asr_tpu.frontend.logmel import featurize_utterance
    from e2e_asr_tpu.models import transducer as rnnt_lib

    rev = _vocab(tmp_path)
    cfg = dataclasses.replace(
        _uni_cfg(feat=6), model_family="transducer",
        decoders={"char": dataclasses.replace(
            _uni_cfg().decoders["char"], vocab_size=37)})
    params = rnnt_lib.init(jax.random.PRNGKey(7), cfg, vocab_size=37)
    wave = _wave(seed=11)
    kw = dict(window=16, margin=64, n_mels=cfg.feat_length)  # margin ignored

    st = StreamingTranscriber(params, cfg, rev, **kw)
    assert st.exact and st.margin == 0
    out1 = st.push(wave) + st.finish()

    # Stitched streaming states == one offline encode of the same frames.
    frames = featurize_utterance(wave, sample_rate=16000, frame_length=400,
                                 hop_length=160, n_mels=cfg.feat_length)
    attn, _, lens = seq2seq.encode(params, cfg, jnp.asarray(frames)[None],
                                   jnp.asarray([frames.shape[0]]))
    depth = cfg.num_layers["char"]
    want = np.asarray(attn[depth][0, : int(lens[depth][0])])
    np.testing.assert_allclose(st._stitched(), want, atol=1e-5)

    # Push-granularity invariance.
    st2 = StreamingTranscriber(params, cfg, rev, **kw)
    parts = []
    for block in np.array_split(wave, 9):
        parts.append(st2.push(block))
    parts.append(st2.finish())
    assert st.transcript == st2.transcript
    assert out1 == "".join(parts)


def test_transcriber_bidir_keeps_margin_path(tmp_path):
    from e2e_asr_tpu.eval.streaming import StreamingTranscriber
    from tests.test_longform import tiny_cfg

    rev = _vocab(tmp_path)
    cfg = dataclasses.replace(
        tiny_cfg(), decoders={"char": dataclasses.replace(
            tiny_cfg().decoders["char"], vocab_size=37)})
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    st = StreamingTranscriber(params, cfg, rev, window=16, margin=4,
                              n_mels=cfg.feat_length)
    assert not st.exact and st.margin == 4


def test_batched_server_exact_matches_single(tmp_path):
    """Uni-dir transducer through the BatchedStreamingServer: exact path
    engaged (margin 0), every stream token-for-token equal to a dedicated
    StreamingTranscriber."""
    from e2e_asr_tpu.eval.streaming import BatchedStreamingServer
    from e2e_asr_tpu.models import transducer as rnnt_lib
    from tests.test_streaming import _batched_vs_single, _plan

    rev = _vocab(tmp_path)
    cfg = dataclasses.replace(
        _uni_cfg(feat=6), model_family="transducer",
        decoders={"char": dataclasses.replace(
            _uni_cfg().decoders["char"], vocab_size=37)})
    params = rnnt_lib.init(jax.random.PRNGKey(8), cfg, vocab_size=37)
    waves = [_wave(seconds=s, seed=30 + i)
             for i, s in enumerate([0.9, 1.3, 0.7])]
    kw = dict(window=16, margin=64, n_mels=cfg.feat_length)  # margin ignored
    srv_probe = BatchedStreamingServer(params, cfg, rev, max_streams=2, **kw)
    assert srv_probe.exact and srv_probe.margin == 0
    batched, single = _batched_vs_single(cfg, params, rev, waves, kw,
                                         _plan(waves, seed=5))
    assert batched == single


def test_batched_server_exact_slot_recycle_resets_state(tmp_path):
    """Finishing a stream and reopening its slot must reset the carried
    encoder state: the same wave transcribes identically both times."""
    from e2e_asr_tpu.eval.streaming import BatchedStreamingServer
    from e2e_asr_tpu.models import transducer as rnnt_lib

    rev = _vocab(tmp_path)
    cfg = dataclasses.replace(
        _uni_cfg(feat=6), model_family="transducer",
        decoders={"char": dataclasses.replace(
            _uni_cfg().decoders["char"], vocab_size=37)})
    params = rnnt_lib.init(jax.random.PRNGKey(9), cfg, vocab_size=37)
    wave = _wave(seconds=1.0, seed=40)
    srv = BatchedStreamingServer(params, cfg, rev, max_streams=1, window=16,
                                 n_mels=cfg.feat_length)

    def run():
        sid = srv.open()
        srv.push(sid, wave)
        out = ""
        for s, d in srv.step().items():
            out += d
        return out + srv.finish(sid)

    assert run() == run()
