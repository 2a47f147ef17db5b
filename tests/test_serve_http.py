"""HTTP transcription server (tools/serve_http.py): the HTTP surface must
return exactly what the serving engine produces, route long audio through
long-form, and fail malformed requests with 400s."""
import io
import json
import urllib.error
import urllib.request
import wave as wave_mod

import jax
import numpy as np
import pytest

from e2e_asr_tpu.config import BeamConfig
from e2e_asr_tpu.data import text
from e2e_asr_tpu.data.synth import make_vocab_dir
from e2e_asr_tpu.eval.serving import BatchingTranscriber
from e2e_asr_tpu.frontend.logmel import featurize_utterance
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.tools.serve_http import TranscriptionService, make_server
from tests.test_e2e import small_model_cfg

SR = 16000


def _wav_bytes(wave_f32: np.ndarray, sr: int = SR) -> bytes:
    buf = io.BytesIO()
    pcm = (np.clip(wave_f32, -1, 1) * 32767.0).astype("<i2")
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _samples_for_frames(T: int) -> int:
    return 400 + (T - 1) * 160            # frontend frame/hop defaults


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_http")
    sizes = make_vocab_dir(str(root / "vocab"))
    cfg = small_model_cfg(sizes["char"])
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    _, rev_vocab = text.initialize_vocabulary(
        str(root / "vocab" / "char.vocab"))
    service = TranscriptionService(
        params, cfg, rev_vocab,
        beam_cfg=BeamConfig(beam_size=2, max_steps=16),
        bucket_frames=(32, 64), max_batch=2, max_wait_ms=10,
        window=32, margin=8, segment=16)
    srv = make_server(service)
    import threading
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    yield base, service, (params, cfg, rev_vocab)
    srv.shutdown()
    service.close()


def test_transcribe_matches_engine(server):
    """POSTed WAV -> same transcript as feeding the identical features to a
    standalone engine (the HTTP layer adds no feature-path divergence)."""
    base, _, (params, cfg, rev_vocab) = server
    rng = np.random.default_rng(1)
    wav = rng.normal(size=_samples_for_frames(30)).astype(np.float32) * 0.3
    status, got = _post(base + "/transcribe", _wav_bytes(wav))
    assert status == 200
    assert got["path"] == "batched"
    assert got["frames"] == 30
    feats = featurize_utterance(wav, sample_rate=SR, n_mels=cfg.feat_length)
    with BatchingTranscriber(
            params, cfg, rev_vocab,
            beam_cfg=BeamConfig(beam_size=2, max_steps=16),
            bucket_frames=(32, 64), max_batch=1, max_wait_ms=1) as eng:
        want = eng.transcribe(feats)
    assert got["text"] == want
    assert "confidence" not in got


def test_concurrent_posts_batch_together(server):
    """Parallel HTTP clients share batched launches (occupancy > single-row)
    and each gets its own transcript."""
    import threading
    base, service, _ = server
    rng = np.random.default_rng(2)
    wavs = [rng.normal(size=_samples_for_frames(24 + 2 * i)).astype(
        np.float32) * 0.3 for i in range(4)]
    results = [None] * 4

    def client(i):
        results[i] = _post(base + "/transcribe", _wav_bytes(wavs[i]))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(st == 200 and "text" in body for st, body in results)
    assert service.engine.stats.requests >= 4


def test_longform_fallback(server):
    """Audio beyond the largest bucket takes the long-form path and still
    returns a transcript."""
    base, _, _ = server
    rng = np.random.default_rng(3)
    wav = rng.normal(size=_samples_for_frames(101)).astype(np.float32) * 0.3
    status, got = _post(base + "/transcribe", _wav_bytes(wav))
    assert status == 200
    assert got["path"] == "longform"
    assert got["frames"] == 101
    assert isinstance(got["text"], str)


def test_health_stats_and_errors(server):
    base, _, _ = server
    assert _get(base + "/healthz") == (200, {"ok": True})
    status, stats = _get(base + "/stats")
    assert status == 200 and stats["requests"] >= 1
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/transcribe", b"this is not a wav file")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/transcribe", b"")
    assert e.value.code == 400


def test_http_streaming_session_matches_dedicated(server):
    """A full HTTP streaming session (open -> PCM pushes -> read deltas ->
    finish) must produce the same transcript as a dedicated
    StreamingTranscriber over the identical waveform."""
    from e2e_asr_tpu.eval.streaming import StreamingTranscriber
    from e2e_asr_tpu.tools.serve_http import StreamingService

    base, _, (params, cfg, rev_vocab) = server
    kw = dict(window=16, margin=4, segment=6,
              beam_cfg=BeamConfig(beam_size=2, max_steps=16))
    streaming = StreamingService(params, cfg, rev_vocab, max_streams=2,
                                 tick_s=0.005, **kw)
    svc = TranscriptionService(params, cfg, rev_vocab, bucket_frames=(32,),
                               max_batch=1, beam_cfg=kw["beam_cfg"])
    srv = make_server(svc, streaming=streaming)
    import threading
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    sb = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(5)
        pcm = (rng.normal(size=2 * SR) * 8000).astype("<i2")
        wave_f32 = pcm.astype(np.float32) / 32768.0

        st, opened = _post(sb + "/stream/open", b"")
        assert st == 200 and opened["sample_rate"] == SR
        sid = opened["sid"]
        got = ""
        block = SR // 4
        for off in range(0, len(pcm), block):
            st, r = _post(f"{sb}/stream/{sid}/push",
                          pcm[off:off + block].tobytes())
            assert st == 200
            got += _get(f"{sb}/stream/{sid}/read")[1]["delta"]
        import time
        time.sleep(0.1)                      # let the pump drain ready work
        got += _get(f"{sb}/stream/{sid}/read")[1]["delta"]
        got += _post(f"{sb}/stream/{sid}/finish", b"")[1]["delta"]

        ded = StreamingTranscriber(params, cfg, rev_vocab, window=16,
                                   margin=4, seg_enc_frames=6,
                                   beam_cfg=kw["beam_cfg"],
                                   n_mels=cfg.feat_length)
        want = ded.push(wave_f32) + ded.finish()
        assert want            # non-vacuous: random-init model emits tokens
        assert got == want

        # Slot lifecycle: the finished sid is gone (404), slots recycle,
        # exhausting them answers 503, odd-length PCM answers 400.
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{sb}/stream/{sid}/read")
        assert e.value.code == 404
        s1 = _post(sb + "/stream/open", b"")[1]["sid"]
        s2 = _post(sb + "/stream/open", b"")[1]["sid"]
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(sb + "/stream/open", b"")
        assert e.value.code == 503
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{sb}/stream/{s1}/push", b"\x00")
        assert e.value.code == 400
        for s in (s1, s2):
            _post(f"{sb}/stream/{s}/finish", b"")
    finally:
        srv.shutdown()
        streaming.close()
        svc.close()


def test_per_request_boost_query(tmp_path):
    """?boost=word|word engages per-request biasing: the boosted transcript
    comes back 200 and can differ from the unboosted one."""
    sizes = make_vocab_dir(str(tmp_path / "vocab"))
    cfg = small_model_cfg(sizes["char"])
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    _, rev_vocab = text.initialize_vocabulary(
        str(tmp_path / "vocab" / "char.vocab"))
    service = TranscriptionService(
        params, cfg, rev_vocab,
        beam_cfg=BeamConfig(beam_size=2, max_steps=12),
        bucket_frames=(32,), max_batch=1, max_wait_ms=1,
        per_request_bias=2.0)
    srv = make_server(service)
    import threading
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(4)
        wav = rng.normal(size=_samples_for_frames(20)).astype(
            np.float32) * 0.3
        word = next(w for w in rev_vocab if w.isalpha())
        st1, plain = _post(base + "/transcribe", _wav_bytes(wav))
        st2, boosted = _post(base + f"/transcribe?boost={word}",
                             _wav_bytes(wav))
        assert st1 == st2 == 200
        assert "text" in plain and "text" in boosted
    finally:
        srv.shutdown()
        service.close()


def test_timestamps_query(server):
    """?timestamps=1: the response carries word spans (attention family =
    segment-replay anchors); combining with ?boost= is a 400."""
    base, _, _ = server
    rng = np.random.default_rng(6)
    wav = rng.normal(size=_samples_for_frames(30)).astype(np.float32) * 0.3
    status, got = _post(base + "/transcribe?timestamps=1", _wav_bytes(wav))
    assert status == 200 and got["path"] == "timestamps"
    assert isinstance(got["words"], list) and isinstance(got["text"], str)
    for w in got["words"]:
        assert set(w) == {"word", "start_s", "end_s"}
        assert 0.0 <= w["start_s"] < w["end_s"]
    # Spans are ordered by start time.
    starts = [w["start_s"] for w in got["words"]]
    assert starts == sorted(starts)
    # timestamps=0 keeps the normal path.
    status, plain = _post(base + "/transcribe?timestamps=0", _wav_bytes(wav))
    assert status == 200 and plain["path"] == "batched"

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/transcribe?timestamps=1&boost=hello",
              _wav_bytes(wav))
    assert e.value.code == 400


def test_timestamps_ctc_family(tmp_path):
    """CTC-family service: ?timestamps=1 returns Viterbi word spans inside
    the utterance duration."""
    import dataclasses

    from e2e_asr_tpu.models import ctc as ctc_lib

    sizes = make_vocab_dir(str(tmp_path / "vocab"))
    cfg = dataclasses.replace(small_model_cfg(sizes["char"]),
                              model_family="ctc")
    params = ctc_lib.init(jax.random.PRNGKey(2), cfg,
                          vocab_size=sizes["char"])
    _, rev_vocab = text.initialize_vocabulary(
        str(tmp_path / "vocab" / "char.vocab"))
    service = TranscriptionService(
        params, cfg, rev_vocab, bucket_frames=(32,), max_batch=1,
        max_wait_ms=1, window=32, margin=8)
    srv = make_server(service)
    import threading
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(7)
        wav = rng.normal(size=_samples_for_frames(24)).astype(
            np.float32) * 0.3
        status, got = _post(base + "/transcribe?timestamps=1",
                            _wav_bytes(wav))
        assert status == 200 and got["path"] == "timestamps"
        for w in got["words"]:
            assert 0.0 <= w["start_s"] < w["end_s"]
            assert w["end_s"] <= got["duration_s"] + 0.25
    finally:
        srv.shutdown()
        service.close()
