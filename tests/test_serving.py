"""Dynamic-batching serving engine (eval/serving.py): batched == one-by-one
transcripts, batching actually batches, quantized params serve, lifecycle."""
import threading

import jax
import numpy as np
import pytest

from e2e_asr_tpu.config import BeamConfig
from e2e_asr_tpu.core import quant
from e2e_asr_tpu.data.synth import make_vocab_dir
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval.serving import BatchingTranscriber
from e2e_asr_tpu.models import seq2seq
from tests.test_e2e import small_model_cfg


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving")
    sizes = make_vocab_dir(str(root / "vocab"))
    cfg = small_model_cfg(sizes["char"])
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    _, rev_vocab = text.initialize_vocabulary(
        str(root / "vocab" / "char.vocab"))
    return cfg, params, rev_vocab


def _feats(rng, T, feat=8):
    return rng.normal(size=(T, feat)).astype(np.float32)


def test_batched_equals_one_by_one(setup):
    """Mixed-length requests batched (padded rows, shared buckets) must
    transcribe identically to a max_batch=1 engine (row independence +
    length masking)."""
    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(0)
    lengths = [16, 40, 33, 60, 12, 64, 25, 57]
    feats = [_feats(rng, T) for T in lengths]
    kw = dict(beam_cfg=BeamConfig(beam_size=2, max_steps=16),
              bucket_frames=(32, 64))
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=4,
                             max_wait_ms=50, **kw) as batched:
        got = [f.result(timeout=120) for f in
               [batched.submit(x) for x in feats]]
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=1,
                             max_wait_ms=1, **kw) as single:
        want = [single.transcribe(x) for x in feats]
    assert got == want


@pytest.mark.parametrize("beam", [1, 2])
def test_transducer_family_serving(setup, beam):
    """The engine serves the transducer family (greedy and beam): batched
    == one-by-one, same row-independence contract."""
    import dataclasses

    from e2e_asr_tpu.models import transducer

    cfg0, _, rev_vocab = setup
    cfg = dataclasses.replace(cfg0, model_family="transducer")
    params = transducer.init(jax.random.PRNGKey(5), cfg,
                             vocab_size=cfg.decoders["char"].vocab_size)
    rng = np.random.default_rng(2)
    lengths = [16, 40, 33, 60]
    feats = [_feats(rng, T) for T in lengths]
    kw = dict(beam_cfg=BeamConfig(beam_size=beam, max_steps=16),
              bucket_frames=(32, 64))
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=4,
                             max_wait_ms=50, **kw) as batched:
        got = [f.result(timeout=120) for f in
               [batched.submit(x) for x in feats]]
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=1,
                             max_wait_ms=1, **kw) as single:
        want = [single.transcribe(x) for x in feats]
    assert got == want


def test_ctc_family_serving(setup):
    """The engine serves the pure-CTC family (best-path)."""
    import dataclasses

    from e2e_asr_tpu.models import ctc as ctc_lib

    cfg0, _, rev_vocab = setup
    cfg = dataclasses.replace(cfg0, model_family="ctc")
    params = ctc_lib.init(jax.random.PRNGKey(6), cfg,
                          vocab_size=cfg.decoders["char"].vocab_size)
    rng = np.random.default_rng(3)
    feats = [_feats(rng, T) for T in (16, 40, 33, 60)]
    kw = dict(beam_cfg=BeamConfig(beam_size=1, max_steps=16),
              bucket_frames=(32, 64))
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=4,
                             max_wait_ms=50, **kw) as batched:
        got = [f.result(timeout=120) for f in
               [batched.submit(x) for x in feats]]
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=1,
                             max_wait_ms=1, **kw) as single:
        want = [single.transcribe(x) for x in feats]
    assert got == want


def test_batching_occupancy(setup):
    """Same-bucket requests submitted together pack into few batches."""
    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(1)
    feats = [_feats(rng, 30) for _ in range(8)]
    tr = BatchingTranscriber(params, cfg, rev_vocab, max_batch=4,
                             max_wait_ms=300,
                             beam_cfg=BeamConfig(beam_size=2, max_steps=16),
                             bucket_frames=(32,))
    with tr:
        futs = [tr.submit(x) for x in feats]
        for f in futs:
            f.result(timeout=120)
    assert tr.stats.requests == 8
    assert tr.stats.batches <= 4            # not one launch per request
    assert tr.stats.mean_occupancy >= 0.5


def test_concurrent_submitters(setup):
    """Thread-per-client submission: all futures resolve, results match the
    serial run."""
    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(2)
    feats = [_feats(rng, 20 + 3 * i) for i in range(6)]
    kw = dict(beam_cfg=BeamConfig(beam_size=2, max_steps=16),
              bucket_frames=(64,), max_batch=3, max_wait_ms=50)
    results = [None] * len(feats)
    with BatchingTranscriber(params, cfg, rev_vocab, **kw) as tr:
        def client(i):
            results[i] = tr.transcribe(feats[i])
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(feats))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    with BatchingTranscriber(params, cfg, rev_vocab, **kw) as tr2:
        want = [tr2.transcribe(x) for x in feats]
    assert results == want


def test_quantized_params_serve(setup):
    """A QuantState (int8 serving artifact) drives the engine directly and
    matches float transcripts."""
    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(3)
    feats = [_feats(rng, 24) for _ in range(3)]
    kw = dict(beam_cfg=BeamConfig(beam_size=2, max_steps=16),
              bucket_frames=(32,), max_batch=3, max_wait_ms=50)
    with BatchingTranscriber(quant.quantize(params), cfg, rev_vocab,
                             **kw) as tq:
        got = [tq.transcribe(x) for x in feats]
    with BatchingTranscriber(params, cfg, rev_vocab, **kw) as tf_:
        want = [tf_.transcribe(x) for x in feats]
    assert got == want


def test_mesh_data_parallel_serving(setup):
    """DP serving over a 4-device mesh: params replicated, batch rows
    sharded — transcripts identical to single-device serving."""
    from e2e_asr_tpu.core import mesh as mesh_lib

    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(5)
    feats = [_feats(rng, 18 + 2 * i) for i in range(8)]
    kw = dict(beam_cfg=BeamConfig(beam_size=2, max_steps=16),
              bucket_frames=(32,), max_batch=4, max_wait_ms=50)
    mesh = mesh_lib.make_mesh(n_data=4, n_model=1,
                              devices=jax.devices()[:4])
    with BatchingTranscriber(params, cfg, rev_vocab, mesh=mesh,
                             **kw) as tm:
        got = [f.result(timeout=120) for f in
               [tm.submit(x) for x in feats]]
    with BatchingTranscriber(params, cfg, rev_vocab, **kw) as ts:
        want = [f.result(timeout=120) for f in
                [ts.submit(x) for x in feats]]
    assert got == want
    with pytest.raises(ValueError):
        BatchingTranscriber(params, cfg, rev_vocab, mesh=mesh,
                            max_batch=3)  # 3 % 4 != 0


def test_no_bucket_starvation_under_sustained_load(setup):
    """A lone request in a quiet bucket must launch within ~max_wait_ms
    even while another bucket sustains full-batch traffic (the deadline
    tracks each request's enqueue time, not the fullest bucket)."""
    import time

    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(6)
    tr = BatchingTranscriber(params, cfg, rev_vocab,
                             beam_cfg=BeamConfig(beam_size=2, max_steps=8),
                             bucket_frames=(32, 64), max_batch=2,
                             max_wait_ms=100)
    try:
        # Warm both buckets' compiles outside the timed window.
        tr.transcribe(_feats(rng, 16))
        tr.transcribe(_feats(rng, 48))

        stop = threading.Event()
        pumped = []

        def pump():   # keep the 64-bucket saturated with full batches
            while not stop.is_set() and len(pumped) < 400:
                with tr._cv:
                    backlog = len(tr._queues[64])
                if backlog < 4:
                    pumped.append(tr.submit(_feats(rng, 48)))
                else:
                    time.sleep(0.002)

        t = threading.Thread(target=pump)
        t.start()
        time.sleep(0.2)                      # pump is saturating
        t0 = time.monotonic()
        lone = tr.submit(_feats(rng, 16))    # quiet bucket
        lone.result(timeout=30)
        waited = time.monotonic() - t0
        stop.set()
        t.join()
        # Generous CPU slack over the 100 ms deadline; the broken scheduler
        # waits until the pump stops (~10+ s) or times out.
        assert waited < 5.0, waited
        for f in pumped:
            f.result(timeout=120)
    finally:
        stop.set()
        tr.close()


def test_lifecycle_and_validation(setup):
    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(4)
    tr = BatchingTranscriber(params, cfg, rev_vocab,
                             beam_cfg=BeamConfig(beam_size=2, max_steps=16),
                             bucket_frames=(32,), max_batch=2,
                             max_wait_ms=10)
    with pytest.raises(ValueError):
        tr.submit(_feats(rng, 40))          # exceeds largest bucket
    with pytest.raises(ValueError):
        tr.submit(rng.normal(size=(16, 5)).astype(np.float32))  # wrong feat
    f = tr.submit(_feats(rng, 16))
    tr.close()
    assert isinstance(f.result(timeout=120), str)  # drained before stop
    tr.close()                               # idempotent
    with pytest.raises(RuntimeError):
        tr.submit(_feats(rng, 16))           # closed


def test_lm_fused_serving_transducer_and_attention(setup):
    """lm_params + lm_weight engage shallow fusion in the engine: fused
    batched == fused one-by-one for both beam families; CTC rejects with a
    clear error; transducer without lm_params rejects."""
    import dataclasses

    from e2e_asr_tpu.config import DecoderConfig
    from e2e_asr_tpu.models import attn_decoder, transducer

    cfg, params, rev_vocab = setup
    dec = cfg.decoders["char"]
    lm_src = attn_decoder.init(jax.random.PRNGKey(5),
                               dataclasses.replace(dec, lm_hidden_size=dec.hidden_size_dec),
                               attn_size=dec.hidden_size_dec)
    lm = {"lstm": lm_src["lm_cell"], "output_proj": lm_src["output_proj"],
          "embedding": lm_src["embedding"]}
    rng = np.random.default_rng(3)
    feats = [_feats(rng, T) for T in (16, 40, 33, 25)]
    bc = BeamConfig(beam_size=2, max_steps=16, lm_weight=0.4)

    t_cfg = dataclasses.replace(cfg, model_family="transducer")
    t_cfg.decoders["char"] = dataclasses.replace(dec, joint_dim=16)
    t_params = transducer.init(jax.random.PRNGKey(1), t_cfg,
                               vocab_size=dec.vocab_size)
    for fam_cfg, fam_params in ((cfg, params), (t_cfg, t_params)):
        kw = dict(beam_cfg=bc, bucket_frames=(32, 64), lm_params=lm)
        with BatchingTranscriber(fam_params, fam_cfg, rev_vocab,
                                 max_batch=4, max_wait_ms=50, **kw) as b:
            got = [f.result(timeout=120) for f in
                   [b.submit(x) for x in feats]]
        with BatchingTranscriber(fam_params, fam_cfg, rev_vocab,
                                 max_batch=1, max_wait_ms=1, **kw) as s:
            want = [s.transcribe(x) for x in feats]
        assert got == want, fam_cfg.model_family

    with pytest.raises(ValueError, match="no internal shared LM"):
        BatchingTranscriber(t_params, t_cfg, rev_vocab, beam_cfg=bc,
                            bucket_frames=(32,))
    # The CTC prefix beam fuses an external LM too (test_ctc_lm_fused_
    # serving); requesting fusion WITHOUT providing one stays a hard error.
    c_cfg = dataclasses.replace(cfg, model_family="ctc")
    from e2e_asr_tpu.models import ctc as ctc_lib
    c_params = ctc_lib.init(jax.random.PRNGKey(2), c_cfg,
                            vocab_size=dec.vocab_size)
    with pytest.raises(ValueError, match="CTC LM fusion/rescoring needs "
                                         "lm_params"):
        BatchingTranscriber(c_params, c_cfg, rev_vocab, beam_cfg=bc,
                            bucket_frames=(32,))


def test_biased_serving_batched_equals_one_by_one(setup):
    """An engine-level biasing glossary applies to every request; batched ==
    one-by-one under biasing (attention family)."""
    from e2e_asr_tpu.eval import biasing

    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(7)
    V = cfg.decoders["char"].vocab_size
    trie = biasing.build_bias_trie([[4, 5], [7]], V)
    feats = [_feats(rng, T) for T in [16, 40, 33, 60]]
    kw = dict(beam_cfg=BeamConfig(beam_size=2, max_steps=16),
              bucket_frames=(32, 64), bias=(trie, 1.5))
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=4,
                             max_wait_ms=50, **kw) as batched:
        got = [f.result(timeout=120) for f in
               [batched.submit(x) for x in feats]]
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=1,
                             max_wait_ms=1, **kw) as single:
        want = [single.transcribe(x) for x in feats]
    assert got == want


def test_ctc_lm_fused_serving(setup):
    """The engine's CTC path now fuses an external RNN-LM (and takes the
    biasing glossary): batched == one-by-one."""
    import dataclasses

    from e2e_asr_tpu.eval import biasing
    from e2e_asr_tpu.models import ctc, rnn_lm

    cfg_base, params_attn, rev_vocab = setup
    cfg = dataclasses.replace(cfg_base, model_family="ctc")
    V = cfg.decoders["char"].vocab_size
    params = ctc.init(jax.random.PRNGKey(3), cfg, vocab_size=V)
    lm_params = rnn_lm.shared_lm_params(params_attn)
    trie = biasing.build_bias_trie([[4, 6, 8]], V)
    rng = np.random.default_rng(8)
    feats = [_feats(rng, T) for T in [16, 40, 33]]
    kw = dict(beam_cfg=BeamConfig(beam_size=2, max_steps=16,
                                  lm_weight=0.1),
              bucket_frames=(32, 64), lm_params=lm_params,
              bias=(trie, 0.7))
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=4,
                             max_wait_ms=50, **kw) as batched:
        got = [f.result(timeout=120) for f in
               [batched.submit(x) for x in feats]]
    with BatchingTranscriber(params, cfg, rev_vocab, max_batch=1,
                             max_wait_ms=1, **kw) as single:
        want = [single.transcribe(x) for x in feats]
    assert got == want

    # Fusion without a source LM is a hard error for this family.
    with pytest.raises(ValueError):
        BatchingTranscriber(params, cfg, rev_vocab,
                            beam_cfg=BeamConfig(beam_size=2, max_steps=16,
                                                lm_weight=0.1),
                            bucket_frames=(32,))


def test_confidence_serving_all_families(setup):
    """with_confidence: futures resolve to (text, conf in (0, 1]); the
    transcript matches the plain engine's; conf = softmax of the beam's
    sorted score set (pinned against a direct decode)."""
    import dataclasses

    from e2e_asr_tpu.eval.serving import (_make_family_decoder,
                                          nbest_posterior_confidence)
    from e2e_asr_tpu.models import ctc as ctc_lib2
    from e2e_asr_tpu.models import transducer as rnnt_lib
    from tests.test_transducer_beam import _cfg as rnnt_cfg

    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(11)
    feats = [_feats(rng, T) for T in [16, 40]]
    bc = BeamConfig(beam_size=2, max_steps=16)
    V = cfg.decoders["char"].vocab_size

    fams = [(cfg, params)]
    c_cfg = dataclasses.replace(cfg, model_family="ctc")
    fams.append((c_cfg, ctc_lib2.init(jax.random.PRNGKey(5), c_cfg,
                                      vocab_size=V)))
    t_cfg = rnnt_cfg(vocab=V)
    t_cfg = dataclasses.replace(t_cfg, feat_length=8,
                                max_output={"char": 16})
    fams.append((t_cfg, rnnt_lib.init(jax.random.PRNGKey(6), t_cfg,
                                      vocab_size=V)))

    for fam_cfg, fam_params in fams:
        kw = dict(beam_cfg=bc, bucket_frames=(32, 64))
        with BatchingTranscriber(fam_params, fam_cfg, rev_vocab,
                                 max_batch=2, max_wait_ms=20,
                                 with_confidence=True, **kw) as eng:
            got = [eng.transcribe(x) for x in feats]
        with BatchingTranscriber(fam_params, fam_cfg, rev_vocab,
                                 max_batch=2, max_wait_ms=20, **kw) as plain:
            want_text = [plain.transcribe(x) for x in feats]
        for (txt, conf), want in zip(got, want_text):
            assert txt == want, fam_cfg.model_family
            assert 0.0 < conf <= 1.0, (fam_cfg.model_family, conf)

    # The helper itself: sentinel slots are excluded from the posterior.
    s = np.array([[0.0, -1e30], [0.0, 0.0]], np.float32)
    c = nbest_posterior_confidence(s)
    np.testing.assert_allclose(c, [1.0, 0.5], rtol=1e-6)


def test_per_request_biasing(setup):
    """Each request's own hotword list steers only that request; rows
    without phrases match the plain engine; different phrase lists share
    one compiled program (no per-request recompiles)."""
    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(13)
    feats = [_feats(rng, 30) for _ in range(3)]
    kw = dict(beam_cfg=BeamConfig(beam_size=2, max_steps=16),
              bucket_frames=(32,), max_batch=4, max_wait_ms=60)

    with BatchingTranscriber(params, cfg, rev_vocab,
                             per_request_bias=8.0, **kw) as eng:
        futs = [eng.submit(feats[0], ["abc"]),
                eng.submit(feats[1], ["de"]),
                eng.submit(feats[2])]
        got = [f.result(timeout=120) for f in futs]
    assert got[0].startswith("abc"), got[0]
    assert got[1].startswith("de"), got[1]
    with BatchingTranscriber(params, cfg, rev_vocab, **kw) as plain:
        assert got[2] == plain.transcribe(feats[2])

    # Guards: phrases need the mode; mode excludes the engine glossary.
    with BatchingTranscriber(params, cfg, rev_vocab, **kw) as off:
        with pytest.raises(ValueError, match="per_request_bias"):
            off.submit(feats[0], ["abc"])
    from e2e_asr_tpu.eval import biasing as biasing_lib
    trie = biasing_lib.build_bias_trie([[4]], cfg.decoders["char"].vocab_size)
    with pytest.raises(ValueError):
        BatchingTranscriber(params, cfg, rev_vocab, per_request_bias=1.0,
                            bias=(trie, 1.0), **kw)


def test_per_request_bias_composes_with_confidence_and_mesh(setup):
    """per_request_bias + with_confidence: (text, conf) futures whose text
    matches the confidence-off boosted engine. per_request_bias + DP mesh:
    the [B, ...] trie leaves shard on the batch axis like every other batch
    leaf — transcripts identical to the single-device boosted engine."""
    from e2e_asr_tpu.core import mesh as mesh_lib

    cfg, params, rev_vocab = setup
    rng = np.random.default_rng(21)
    feats = [_feats(rng, 28 + i) for i in range(2)]
    kw = dict(beam_cfg=BeamConfig(beam_size=2, max_steps=16),
              bucket_frames=(32,), max_wait_ms=60)
    phrases = [["abc"], None]

    def run(**extra):
        with BatchingTranscriber(params, cfg, rev_vocab,
                                 per_request_bias=8.0, **kw, **extra) as e:
            futs = [e.submit(f, p) for f, p in zip(feats, phrases)]
            return [f.result(timeout=120) for f in futs]

    want = run(max_batch=2)
    assert want[0].startswith("abc"), want[0]

    got_conf = run(max_batch=2, with_confidence=True)
    for (txt, conf), plain in zip(got_conf, want):
        assert txt == plain
        assert 0.0 < conf <= 1.0

    mesh = mesh_lib.make_mesh(n_data=2, n_model=1,
                              devices=jax.devices()[:2])
    got_mesh = run(max_batch=2, mesh=mesh)
    assert got_mesh == want
