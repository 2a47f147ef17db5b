"""Exact streaming for chunk-causal transformer encoders (-attn_chunk).

With attn_chunk > 0 the encoder is trained block-causal: query frame q sees
key k iff 0 <= chunk(q) - chunk(k) <= attn_left, and the Conformer conv
module is left-padded (transformer_encoder.chunk_bias / _conv_module). Every
block then has a BOUNDED left-only receptive field, so carrying per block
the last attn_left*attn_chunk frames of K/V plus conv_kernel-1 conv-input
frames reproduces the offline pass EXACTLY, chunk by chunk
(transformer_encoder.apply_streaming) — the transformer analogue of the
forward-only recurrent streaming in tests/test_streaming_exact.py.

These tests pin:
- offline chunk-causal masking semantics (future chunks masked, left window
  bounded, padding invariance),
- apply_streaming chunk-by-chunk == apply on the concatenation at every
  depth (conv module, rel-pos bias, bf16, ragged final chunk, a row ending
  mid-stream, frozen zero-length rows),
- StreamingTranscriber / BatchedStreamingServer engage the exact path for
  chunk-causal transformers (margin 0) with transcripts equal to offline /
  dedicated runs.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_asr_tpu.config import DecoderConfig, EncoderConfig, Seq2SeqConfig
from e2e_asr_tpu.models import encoder as encoder_lib
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.models import transformer_encoder as xfmr


def _cfg(layers=3, **enc_kw):
    kw = dict(hidden_size=8, encoder_type="transformer", num_heads=2,
              ffn_mult=2, subsample=2, out_prob=1.0, attn_chunk=2,
              attn_left=2)
    kw.update(enc_kw)
    return Seq2SeqConfig(
        tasks=["char"], num_layers={"char": layers},
        max_output={"char": 12},
        encoder=EncoderConfig(**kw),
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=8, vocab_size=11, lm_hidden_size=8,
            attention_vec_size=8, max_output=12, samp_prob=0.0,
            out_prob_dec=1.0)},
        feat_length=6)


# ------------------------------------------------------------ offline mask

def test_chunk_bias_semantics():
    """chunk(q)-chunk(k) in [0, left]: full attention within a chunk, `left`
    whole chunks of history, zero future."""
    b = xfmr.chunk_bias(8, chunk=2, left=1)[0, 0]    # chunks: 01|23|45|67
    assert b[0, 1] == 0.0          # same chunk, future frame: visible
    assert b[2, 0] == 0.0          # previous chunk
    assert b[4, 1] == -1e30        # two chunks back: beyond left=1
    assert b[2, 4] == -1e30        # future chunk
    assert b[7, 4] == 0.0


def test_offline_chunk_causal_future_invariance():
    """Changing input frames in a FUTURE chunk must not change earlier
    chunks' outputs (the causality the streaming path relies on)."""
    cfg = _cfg(conv_kernel=3)
    params = encoder_lib.init(jax.random.PRNGKey(0), cfg.encoder, 3,
                              cfg.feat_length)
    B, T = 2, 24                    # post-subsample 12 frames, chunks of 2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.feat_length))
    lens = jnp.array([T, T])
    a1, _, _ = encoder_lib.apply(params, cfg.encoder, x, lens, {"char": 3})
    x2 = x.at[:, 16:].set(0.0)      # mutate post-sub frames 8+ (chunks 4+)
    a2, _, _ = encoder_lib.apply(params, cfg.encoder, x2, lens, {"char": 3})
    np.testing.assert_allclose(np.asarray(a1[3])[:, :8],
                               np.asarray(a2[3])[:, :8], atol=1e-6)
    assert not np.allclose(np.asarray(a1[3])[:, 8:], np.asarray(a2[3])[:, 8:])


# ------------------------------------------------------- encoder streaming

@pytest.mark.parametrize("conv_kernel,rel_pos_bias",
                         [(0, False), (3, False), (0, True), (4, True)])
def test_apply_streaming_matches_apply(conv_kernel, rel_pos_bias):
    """Chunk-by-chunk apply_streaming == apply on the whole sequence, at
    every depth, including a ragged final chunk and a row whose length ends
    mid-stream (then rides zero-length chunks with frozen state)."""
    cfg = _cfg(conv_kernel=conv_kernel, rel_pos_bias=rel_pos_bias)
    ecfg = cfg.encoder
    max_depth = cfg.num_layers["char"]
    r = encoder_lib.total_reduction_factor(ecfg, max_depth)
    assert r == ecfg.subsample * ecfg.attn_chunk == 4
    rng = np.random.default_rng(3)
    B, T = 2, 29                         # chunks 8+4+12 + ragged 5
    if rel_pos_bias:
        params = encoder_lib.init(jax.random.PRNGKey(4), ecfg, max_depth,
                                  cfg.feat_length)
        # Zero-init bias would make rel-pos a no-op; randomize it.
        for i in range(1, max_depth + 1):
            params[f"block_{i}"]["rel_bias"] = 0.1 * jax.random.normal(
                jax.random.PRNGKey(10 + i),
                params[f"block_{i}"]["rel_bias"].shape)
    else:
        params = encoder_lib.init(jax.random.PRNGKey(4), ecfg, max_depth,
                                  cfg.feat_length)
    x = jnp.asarray(rng.normal(size=(B, T, cfg.feat_length))
                    .astype(np.float32))
    lens = jnp.asarray([T, 14])          # row 1 ends mid-stream

    attn, _, out_lens = encoder_lib.apply(params, ecfg, x, lens,
                                          cfg.num_layers)

    state = encoder_lib.streaming_state(ecfg, max_depth, B)
    got = {d: [] for d in attn}
    pos = 0
    for w in (8, 4, 12, T - 24):         # last chunk is the ragged tail
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
            np.testing.assert_allclose(
                stitched[b, :n], want[b, :n], atol=2e-5,
                err_msg=f"depth {d} row {b}")
            np.testing.assert_array_equal(stitched[b, n:] * 0,
                                          stitched[b, n:])


def test_apply_streaming_bf16_matches_offline():
    cfg = _cfg(conv_kernel=3)
    ecfg = cfg.encoder
    params = encoder_lib.init(jax.random.PRNGKey(6), ecfg, 2,
                              cfg.feat_length)
    B, T = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, cfg.feat_length))
    lens = jnp.asarray([T])
    attn, _, _ = encoder_lib.apply(params, ecfg, x, lens, {"char": 2},
                                   compute_dtype=jnp.bfloat16)
    state = encoder_lib.streaming_state(ecfg, 2, B)
    outs = []
    for lo, hi in [(0, 4), (4, 12), (12, 16)]:
        s_attn, _, state = encoder_lib.apply_streaming(
            params, ecfg, x[:, lo:hi], jnp.asarray([hi - lo]), {"char": 2},
            state, compute_dtype=jnp.bfloat16)
        outs.append(np.asarray(s_attn[2]))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(attn[2]), atol=2e-2)


def test_zero_length_chunk_freezes_state():
    """A chunk with seq_len 0 (idle batched-server slot) must leave the
    carried state bit-identical and advance nothing."""
    cfg = _cfg(conv_kernel=3)
    ecfg = cfg.encoder
    params = encoder_lib.init(jax.random.PRNGKey(8), ecfg, 2,
                              cfg.feat_length)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 8, cfg.feat_length))
    state = encoder_lib.streaming_state(ecfg, 2, 1)
    _, _, s1 = encoder_lib.apply_streaming(params, ecfg, x, jnp.asarray([8]),
                                           {"char": 2}, state)
    _, _, s2 = encoder_lib.apply_streaming(
        params, ecfg, jnp.zeros_like(x), jnp.asarray([0]), {"char": 2}, s1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), s1, s2)


def test_streaming_support_and_rejections():
    # Full attention: not exactly streamable.
    assert not encoder_lib.supports_exact_streaming(
        _cfg(attn_chunk=0).encoder)
    # MoE: routing capacity is batch-global.
    assert not encoder_lib.supports_exact_streaming(
        _cfg(moe_experts=2).encoder)
    assert encoder_lib.supports_exact_streaming(_cfg().encoder)
    with pytest.raises(ValueError, match="attn_chunk"):
        encoder_lib.apply_streaming({}, _cfg(attn_chunk=0).encoder,
                                    jnp.zeros((1, 4, 6)), jnp.asarray([4]),
                                    {"char": 2}, ())
    # Misaligned non-final chunk.
    cfg = _cfg()
    params = encoder_lib.init(jax.random.PRNGKey(0), cfg.encoder, 2,
                              cfg.feat_length)
    state = encoder_lib.streaming_state(cfg.encoder, 2, 1)
    with pytest.raises(ValueError, match="multiple"):
        encoder_lib.apply_streaming(params, cfg.encoder,
                                    jnp.zeros((1, 6, 6)), jnp.asarray([6]),
                                    {"char": 2}, state)
    # final=True pads instead (the true stream end).
    encoder_lib.apply_streaming(params, cfg.encoder, jnp.zeros((1, 6, 6)),
                                jnp.asarray([6]), {"char": 2}, state,
                                final=True)


def test_config_rejects_attn_chunk_on_rnn_encoder():
    from e2e_asr_tpu.config import process_args
    with pytest.raises(ValueError, match="attn_chunk"):
        process_args({"attn_chunk": 4, "encoder_type": "rnn",
                      "num_layers": {"char": 2}}, vocab_sizes={"char": 11})


# ------------------------------------------------------- banded attention

@pytest.mark.parametrize("conv,rel,T", [(0, False, 32), (3, True, 32),
                                        (3, False, 29)])   # 29: pad path
def test_banded_matches_dense_forward(monkeypatch, conv, rel, T):
    """Banded O(T*W) chunk-causal attention == the dense masked form (the
    out-of-window keys hold exactly zero softmax weight in the dense form),
    including rel-pos bias, varied row lengths, and a non-chunk-multiple T
    (internal padding)."""
    cfg = _cfg(conv_kernel=conv, rel_pos_bias=rel, subsample=1,
               attn_chunk=2, attn_left=1)
    ecfg = cfg.encoder
    params = encoder_lib.init(jax.random.PRNGKey(20), ecfg, 2,
                              cfg.feat_length)
    if rel:
        for i in (1, 2):
            params[f"block_{i}"]["rel_bias"] = 0.1 * jax.random.normal(
                jax.random.PRNGKey(30 + i),
                params[f"block_{i}"]["rel_bias"].shape)
    x = jax.random.normal(jax.random.PRNGKey(21), (3, T, cfg.feat_length))
    lens = jnp.asarray([T, T - 7, 5])

    monkeypatch.setattr(xfmr, "_FORCE_BANDED", False)
    dense_attn, _, _ = encoder_lib.apply(params, ecfg, x, lens, {"char": 2})
    monkeypatch.setattr(xfmr, "_FORCE_BANDED", True)
    band_attn, _, _ = encoder_lib.apply(params, ecfg, x, lens, {"char": 2})
    assert band_attn[2].shape == dense_attn[2].shape
    np.testing.assert_allclose(np.asarray(band_attn[2]),
                               np.asarray(dense_attn[2]), atol=2e-5)


def test_banded_matches_dense_grads(monkeypatch):
    cfg = _cfg(conv_kernel=3, subsample=1, attn_chunk=2, attn_left=1)
    ecfg = cfg.encoder
    params = encoder_lib.init(jax.random.PRNGKey(22), ecfg, 2,
                              cfg.feat_length)
    x = jax.random.normal(jax.random.PRNGKey(23), (2, 24, cfg.feat_length))
    lens = jnp.asarray([24, 17])

    def loss(p):
        attn, _, _ = encoder_lib.apply(p, ecfg, x, lens, {"char": 2},
                                       train=True, rng=jax.random.PRNGKey(1))
        return jnp.sum(attn[2] ** 2)

    monkeypatch.setattr(xfmr, "_FORCE_BANDED", False)
    l_d, g_d = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(xfmr, "_FORCE_BANDED", True)
    l_b, g_b = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l_b), float(l_d), rtol=1e-5)
    for (kd, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(g_d),
                                jax.tree_util.tree_leaves_with_path(g_b)):
        assert kd == kb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg=str(kd))


def test_banded_auto_engages_at_long_t():
    # Memory-guard threshold: BANDED_MIN_FACTOR windows (on-chip probes
    # showed dense wins on speed below that — see transformer_encoder.py).
    cfg = _cfg(attn_chunk=4, attn_left=3).encoder   # window 16
    thresh = xfmr.BANDED_MIN_FACTOR * 16
    assert not xfmr.use_banded(thresh - 8, cfg)
    assert xfmr.use_banded(thresh, cfg)
    assert not xfmr.use_banded(10 * thresh, _cfg(attn_chunk=0).encoder)


def test_streaming_matches_banded_offline(monkeypatch):
    """When the offline encoder selects the banded form, chunked
    apply_streaming still reproduces it."""
    cfg = _cfg(conv_kernel=3, subsample=1, attn_chunk=2, attn_left=1)
    ecfg = cfg.encoder
    monkeypatch.setattr(xfmr, "_FORCE_BANDED", True)
    params = encoder_lib.init(jax.random.PRNGKey(24), ecfg, 2,
                              cfg.feat_length)
    x = jax.random.normal(jax.random.PRNGKey(25), (1, 40, cfg.feat_length))
    lens = jnp.asarray([40])
    attn, _, _ = encoder_lib.apply(params, ecfg, x, lens, {"char": 2})
    state = encoder_lib.streaming_state(ecfg, 2, 1)
    outs = []
    for lo, hi in [(0, 8), (8, 24), (24, 40)]:
        s_attn, _, state = encoder_lib.apply_streaming(
            params, ecfg, x[:, lo:hi], jnp.asarray([hi - lo]), {"char": 2},
            state)
        outs.append(np.asarray(s_attn[2]))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(attn[2]), atol=2e-5)


# --------------------------------------------------------- transcriber level

def _vocab(tmp_path):
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.data.synth import make_vocab_dir
    make_vocab_dir(str(tmp_path / "v"))
    _, rev = text.initialize_vocabulary(str(tmp_path / "v" / "char.vocab"))
    return rev


def _wave(seconds=1.2, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    return (np.sin(2 * np.pi * 330 * t)
            + 0.3 * rng.normal(size=t.shape)).astype(np.float32)


def _ctc_cfg():
    cfg = _cfg(subsample=4, attn_chunk=2, attn_left=2, conv_kernel=3)
    return dataclasses.replace(
        cfg, model_family="ctc",
        decoders={"char": dataclasses.replace(cfg.decoders["char"],
                                              vocab_size=37)})


def test_transcriber_exact_transformer_matches_offline(tmp_path):
    """Chunk-causal transformer + CTC: the transcriber engages the exact
    path (margin 0), its stitched states equal one offline encode, and the
    transcript is push-granularity invariant."""
    from e2e_asr_tpu.eval.streaming import StreamingTranscriber
    from e2e_asr_tpu.frontend.logmel import featurize_utterance
    from e2e_asr_tpu.models import ctc as ctc_lib

    rev = _vocab(tmp_path)
    cfg = _ctc_cfg()
    params = ctc_lib.init(jax.random.PRNGKey(7), cfg, vocab_size=37)
    wave = _wave(seed=11)
    kw = dict(window=16, margin=64, n_mels=cfg.feat_length)  # margin ignored

    st = StreamingTranscriber(params, cfg, rev, **kw)
    assert st.exact and st.margin == 0
    out1 = st.push(wave) + st.finish()

    frames = featurize_utterance(wave, sample_rate=16000, frame_length=400,
                                 hop_length=160, n_mels=cfg.feat_length)
    attn, _, lens = seq2seq.encode(params, cfg, jnp.asarray(frames)[None],
                                   jnp.asarray([frames.shape[0]]))
    depth = cfg.num_layers["char"]
    want = np.asarray(attn[depth][0, : int(lens[depth][0])])
    np.testing.assert_allclose(st._stitched(), want, atol=2e-5)

    st2 = StreamingTranscriber(params, cfg, rev, **kw)
    parts = []
    for block in np.array_split(wave, 9):
        parts.append(st2.push(block))
    parts.append(st2.finish())
    assert st.transcript == st2.transcript
    assert out1 == "".join(parts)


def test_transducer_stream_equals_offline_decode(tmp_path):
    """FULL-pipeline exact streaming: chunk-causal transformer encoder
    (exact stitched states) + stateful transducer greedy (exact carried
    pred-net state) => the streamed transcript equals one offline
    whole-utterance greedy decode token-for-token."""
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.eval.streaming import StreamingTranscriber
    from e2e_asr_tpu.frontend.logmel import featurize_utterance
    from e2e_asr_tpu.models import transducer as rnnt_lib

    rev = _vocab(tmp_path)
    base = _cfg(subsample=4, attn_chunk=2, attn_left=2, conv_kernel=3)
    cfg = dataclasses.replace(
        base, model_family="transducer",
        decoders={"char": dataclasses.replace(base.decoders["char"],
                                              vocab_size=37)})
    params = rnnt_lib.init(jax.random.PRNGKey(12), cfg, vocab_size=37)
    wave = _wave(seconds=1.1, seed=21)

    st = StreamingTranscriber(params, cfg, rev, window=16, margin=64,
                              n_mels=cfg.feat_length)
    assert st.exact
    streamed = st.push(wave) + st.finish()

    frames = featurize_utterance(wave, sample_rate=16000, frame_length=400,
                                 hop_length=160, n_mels=cfg.feat_length)
    attn, _, enc_lens = seq2seq.encode(params, cfg, jnp.asarray(frames)[None],
                                       jnp.asarray([frames.shape[0]]))
    d = cfg.num_layers["char"]
    # Same per-frame emission budget as the streaming spans (the tiny
    # random-init model emits freely; cfg.max_output would truncate).
    tokens = rnnt_lib.greedy_decode_states(
        params, cfg, attn[d], enc_lens[d],
        max_output=4 * attn[d].shape[1])
    offline = text.ids_to_sentence(
        [int(t) for t in np.asarray(tokens[0]) if t != 0], rev)
    assert streamed == st.transcript == offline


def test_batched_server_exact_transformer_matches_single(tmp_path):
    """Chunk-causal transformer through the BatchedStreamingServer: exact
    path engaged, every stream token-for-token equal to a dedicated
    StreamingTranscriber (idle slots ride frozen state rows)."""
    from e2e_asr_tpu.eval.streaming import BatchedStreamingServer
    from e2e_asr_tpu.models import ctc as ctc_lib
    from tests.test_streaming import _batched_vs_single, _plan

    rev = _vocab(tmp_path)
    cfg = _ctc_cfg()
    params = ctc_lib.init(jax.random.PRNGKey(8), cfg, vocab_size=37)
    waves = [_wave(seconds=s, seed=30 + i)
             for i, s in enumerate([0.9, 1.3, 0.7])]
    kw = dict(window=16, margin=64, n_mels=cfg.feat_length)  # margin ignored
    srv_probe = BatchedStreamingServer(params, cfg, rev, max_streams=2, **kw)
    assert srv_probe.exact and srv_probe.margin == 0
    batched, single = _batched_vs_single(cfg, params, rev, waves, kw,
                                         _plan(waves, seed=5))
    assert batched == single


def test_batched_server_transformer_slot_recycle(tmp_path):
    """Recycling a slot resets the K/V caches and the position counter: the
    same wave transcribes identically both times."""
    from e2e_asr_tpu.eval.streaming import BatchedStreamingServer
    from e2e_asr_tpu.models import ctc as ctc_lib

    rev = _vocab(tmp_path)
    cfg = _ctc_cfg()
    params = ctc_lib.init(jax.random.PRNGKey(9), cfg, vocab_size=37)
    wave = _wave(seconds=1.0, seed=40)
    srv = BatchedStreamingServer(params, cfg, rev, max_streams=1, window=16,
                                 n_mels=cfg.feat_length)

    def run():
        sid = srv.open()
        srv.push(sid, wave)
        out = ""
        for _, d in srv.step().items():
            out += d
        return out + srv.finish(sid)

    assert run() == run()
