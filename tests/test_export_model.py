"""AOT-exported serving artifacts (tools/export_model.py, jax.export):
round-trip decode parity with the live family decoders, self-contained
loading (config/vocab/params all from the artifact dir), int8 QuantState
programs, and the CLI entry point."""
import json
import os

import jax
import numpy as np
import pytest

from e2e_asr_tpu.config import BeamConfig
from e2e_asr_tpu.data import text
from e2e_asr_tpu.data.synth import make_vocab_dir
from e2e_asr_tpu.eval.serving import _make_family_decoder
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.tools.export_model import (ExportedDecoder,
                                            export_artifact, load_artifact)
from tests.test_e2e import small_model_cfg


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("export")
    sizes = make_vocab_dir(str(root / "vocab"))
    cfg = small_model_cfg(sizes["char"])
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    _, rev_vocab = text.initialize_vocabulary(
        str(root / "vocab" / "char.vocab"))
    return root, cfg, params, rev_vocab


def _feats(rng, T, feat=8):
    return rng.normal(size=(T, feat)).astype(np.float32)


def _live_transcripts(cfg, params, beam_cfg, feats_list, bucket, B):
    """The serving engine's per-batch recipe on the LIVE decoder."""
    decode = _make_family_decoder(cfg, beam_cfg)
    feats = np.zeros((B, bucket, cfg.feat_length), np.float32)
    lens = np.ones((B,), np.int32)
    for i, f in enumerate(feats_list):
        feats[i, : f.shape[0]] = f
        lens[i] = f.shape[0]
    tokens, _, _ = decode(params, {"logmel": feats, "logmel_len": lens})
    return np.asarray(tokens)[: len(feats_list)]


def test_export_round_trip_matches_live_decoder(setup, tmp_path):
    """Exported program + loader == live _make_family_decoder, token for
    token, loading from NOTHING but the artifact dir."""
    root, cfg, params, rev_vocab = setup
    rng = np.random.default_rng(0)
    bc = BeamConfig(beam_size=2, max_steps=12)
    art = str(tmp_path / "art")
    manifest = export_artifact(art, params, cfg, rev_vocab, beam_cfg=bc,
                               bucket_frames=(24, 48), batch_size=3)
    assert set(manifest["program_bytes"]) == {"program_b24_n3.bin",
                                              "program_b48_n3.bin"}
    dec = load_artifact(art)
    assert dec.buckets == (24, 48) and dec.batch_size == 3
    # Batch of 3 in the large bucket; single utterance in the small one.
    batch = [_feats(rng, T) for T in (40, 30, 17)]
    got = dec.decode_batch(batch)
    want_tokens = _live_transcripts(cfg, params, bc, batch, 48, 3)
    for i, g in enumerate(got):
        sent = text.ids_to_sentence(want_tokens[i], rev_vocab)
        _, words = text.get_relevant_words(sent)
        assert g == " ".join(words)
    one = _feats(rng, 20)
    t1 = dec.transcribe(one)
    want1 = _live_transcripts(cfg, params, bc, [one], 24, 3)
    sent = text.ids_to_sentence(want1[0], rev_vocab)
    _, words = text.get_relevant_words(sent)
    assert t1 == " ".join(words)


def test_export_int8_quantized_program(setup, tmp_path):
    """QuantState params export (dequantize traced into the program) and
    the loader rebuilds the QuantState skeleton from the config alone;
    decode == the live decoder on the same QuantState."""
    from e2e_asr_tpu.core import quant

    root, cfg, params, rev_vocab = setup
    rng = np.random.default_rng(1)
    qs = quant.quantize(params)
    bc = BeamConfig(beam_size=2, max_steps=12)
    art = str(tmp_path / "art8")
    manifest = export_artifact(art, qs, cfg, rev_vocab, beam_cfg=bc,
                               bucket_frames=(32,), batch_size=2)
    assert manifest["quantized"]
    dec = load_artifact(art)
    batch = [_feats(rng, 28), _feats(rng, 15)]
    got = dec.decode_batch(batch)
    want_tokens = _live_transcripts(cfg, qs, bc, batch, 32, 2)
    for i, g in enumerate(got):
        sent = text.ids_to_sentence(want_tokens[i], rev_vocab)
        _, words = text.get_relevant_words(sent)
        assert g == " ".join(words)


def test_export_ctc_family_and_guards(setup, tmp_path):
    """A CTC-family artifact decodes like the live CTC path; oversize
    utterances and oversize batches fail with clear errors."""
    import dataclasses

    from e2e_asr_tpu.models import ctc

    root, cfg, params, rev_vocab = setup
    c_cfg = dataclasses.replace(cfg, model_family="ctc")
    c_params = ctc.init(jax.random.PRNGKey(2), c_cfg,
                        vocab_size=len(rev_vocab))
    rng = np.random.default_rng(2)
    bc = BeamConfig(beam_size=2, max_steps=12)
    art = str(tmp_path / "artc")
    export_artifact(art, c_params, c_cfg, rev_vocab, beam_cfg=bc,
                    bucket_frames=(32,), batch_size=2)
    dec = load_artifact(art)
    assert dec.cfg.model_family == "ctc"
    batch = [_feats(rng, 30), _feats(rng, 22)]
    got = dec.decode_batch(batch)
    want_tokens = _live_transcripts(c_cfg, c_params, bc, batch, 32, 2)
    for i, g in enumerate(got):
        sent = text.ids_to_sentence(want_tokens[i], rev_vocab)
        _, words = text.get_relevant_words(sent)
        assert g == " ".join(words)
    with pytest.raises(ValueError, match="exceeds the largest"):
        dec.transcribe(_feats(rng, 50))
    with pytest.raises(ValueError, match="> artifact"):
        dec.decode_batch([_feats(rng, 10)] * 3)


def _cli_flags(root, tmp_path, art):
    return ["-out", art, "-buckets", "24", "-batch", "2",
            "-vocab_dir", str(root / "vocab"),
            "-tb_dir", str(tmp_path / "models"),
            "-hsize", "16", "-hsize_dec", "16", "-emb_size", "12",
            "-attn_vec_size", "8", "-lm_hsize", "16",
            "-feat_len", "8", "-max_out_char", "16",
            "-compute_dtype", "float32", "-beam_size", "2"]


def test_export_cli_end_to_end(setup, tmp_path):
    """The CLI refuses to export without a checkpoint (deploy artifacts of
    random weights are a typo, not a fallback), exports with
    -allow_fresh_init, and the artifact transcribes. On this CPU host the
    programs must pin the XLA compute paths (kernels != tpu-pallas)."""
    from e2e_asr_tpu.tools import export_model

    root, cfg, params, rev_vocab = setup
    art = str(tmp_path / "artcli")
    with pytest.raises(SystemExit, match="refusing to export"):
        export_model.main(_cli_flags(root, tmp_path, art))
    manifest = export_model.main(
        _cli_flags(root, tmp_path, art) + ["-allow_fresh_init"])
    assert manifest["family"] == "attention"
    assert manifest["kernels"] == "xla"
    with open(os.path.join(art, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk["bucket_frames"] == [24]
    dec = ExportedDecoder(art)
    rng = np.random.default_rng(3)
    out = dec.transcribe(_feats(rng, 20))
    assert isinstance(out, str)
    assert dec.decode_batch([]) == []


def test_export_cli_honors_eval_ema(setup, tmp_path):
    """-eval_ema exports the EMA shadow weights (the ones the eval CLI
    validated), not the raw params — pinned by comparing the artifact's
    npz leaves to the checkpoint's ema_params."""
    from e2e_asr_tpu.cli.main import parse_options
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.tools import export_model
    from e2e_asr_tpu.train import step as step_lib

    root, cfg, params, rev_vocab = setup
    art = str(tmp_path / "artema")
    flags = _cli_flags(root, tmp_path, art) + ["-eval_ema"]
    exp_cfg = parse_options(flags[6:])  # model/run flags only
    p0 = step_lib.init_params(jax.random.PRNGKey(4), exp_cfg.model)
    state = step_lib.create_state(p0, exp_cfg.model, exp_cfg.lm, ema=True)
    ema = jax.tree_util.tree_map(lambda x: x + 1.0, p0)
    state = state._replace(ema_params=ema)
    os.makedirs(exp_cfg.train.train_dir, exist_ok=True)
    ckpt_lib.save(exp_cfg.train.train_dir, "asr.ckpt", 3, state)

    export_model.main(flags)
    with np.load(os.path.join(art, "params.npz")) as z:
        named = {k: z[k] for k in z.files}
    want = ckpt_lib.flatten_named(ema)
    for k, v in want.items():
        np.testing.assert_array_equal(named["model/" + k], v)


def test_export_lm_fusion_stored_once_not_baked(setup, tmp_path):
    """A fusion LM rides as a PROGRAM INPUT: the trigram table lands once
    in params.npz (lm/ngram), the per-bucket programs do NOT grow by the
    table size, and decode == the live fused decoder."""
    root, cfg, params, rev_vocab = setup
    rng = np.random.default_rng(5)
    V = len(rev_vocab)
    logits = rng.normal(size=(V, V, V)).astype(np.float32)
    table = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lm = {"ngram": table}
    bc = BeamConfig(beam_size=2, max_steps=12, lm_weight=0.4)

    art0 = str(tmp_path / "art_nolm")
    m0 = export_artifact(art0, params, cfg, rev_vocab,
                         beam_cfg=BeamConfig(beam_size=2, max_steps=12),
                         bucket_frames=(24,), batch_size=2)
    art1 = str(tmp_path / "art_lm")
    m1 = export_artifact(art1, params, cfg, rev_vocab, beam_cfg=bc,
                         bucket_frames=(24,), batch_size=2, lm_params=lm)
    assert m1["has_lm"]
    with np.load(os.path.join(art1, "params.npz")) as z:
        np.testing.assert_array_equal(z["lm/ngram"], table)
    # The table (V^3 floats) must NOT be duplicated into the program blob.
    grow = (m1["program_bytes"]["program_b24_n2.bin"]
            - m0["program_bytes"]["program_b24_n2.bin"])
    assert grow < table.nbytes // 2, (grow, table.nbytes)

    dec = load_artifact(art1)
    batch = [_feats(rng, 20), _feats(rng, 14)]
    got = dec.decode_batch(batch)
    live = _make_family_decoder(cfg, bc, lm_params=lm)
    feats = np.zeros((2, 24, cfg.feat_length), np.float32)
    lens = np.ones((2,), np.int32)
    for i, f in enumerate(batch):
        feats[i, : f.shape[0]] = f
        lens[i] = f.shape[0]
    want_tokens, _, _ = live(params, {"logmel": feats, "logmel_len": lens})
    for i, g in enumerate(got):
        sent = text.ids_to_sentence(np.asarray(want_tokens)[i], rev_vocab)
        _, words = text.get_relevant_words(sent)
        assert g == " ".join(words)


def test_export_transducer_and_transformer_decoder_families(setup, tmp_path):
    """The remaining decode families export and round-trip: the transducer
    time-synchronous beam (while_loop decode) and the transformer decoder
    (KV caches riding the beam state) both serialize through jax.export
    and match the live decoder token-for-token."""
    import dataclasses

    from e2e_asr_tpu.config import DecoderConfig
    from e2e_asr_tpu.train import step as step_lib

    root, cfg, params, rev_vocab = setup
    rng = np.random.default_rng(7)

    def roundtrip(c, tag, bc):
        p = step_lib.init_params(jax.random.PRNGKey(0), c)
        art = str(tmp_path / f"art_{tag}")
        export_artifact(art, p, c, rev_vocab, beam_cfg=bc,
                        bucket_frames=(24,), batch_size=2)
        dec = load_artifact(art)
        batch = [_feats(rng, 20), _feats(rng, 14)]
        got = dec.decode_batch(batch)
        want = _live_transcripts(c, p, bc, batch, 24, 2)
        for i, g in enumerate(got):
            sent = text.ids_to_sentence(want[i], rev_vocab)
            _, words = text.get_relevant_words(sent)
            assert g == " ".join(words), (tag, i)

    # replace() shallow-copies: build fresh decoders dicts, never mutate
    # the module-scoped fixture's.
    c_t = dataclasses.replace(cfg, model_family="transducer", decoders={
        "char": DecoderConfig(
            hidden_size_dec=16, emb_size=8, vocab_size=len(rev_vocab),
            joint_dim=16, out_prob_dec=1.0, max_output=16)})
    roundtrip(c_t, "transducer", BeamConfig(beam_size=2, max_steps=16))

    c_x = dataclasses.replace(cfg, decoders={
        "char": DecoderConfig(
            decoder_type="transformer", hidden_size_dec=16,
            num_layers_dec=2, dec_heads=2, dec_ffn_mult=2,
            vocab_size=len(rev_vocab), samp_prob=0.0, out_prob_dec=1.0,
            max_output=16)})
    roundtrip(c_x, "xfdec", BeamConfig(beam_size=2, max_steps=12))


def test_export_contextual_biasing_rides_along(setup, tmp_path):
    """An engine-level bias glossary is traced into the programs: biased
    artifact == biased live decoder, != the unbiased artifact."""
    from e2e_asr_tpu.eval import biasing

    root, cfg, params, rev_vocab = setup
    rng = np.random.default_rng(6)
    vocab = {tok: i for i, tok in enumerate(rev_vocab)}

    def ids(word):
        return [vocab[c] for c in word if c in vocab]

    phrases = [p for p in (ids("abe"), ids("bad")) if p]
    assert phrases, "synthetic vocab must cover some letters"
    trie = biasing.build_bias_trie(phrases, len(rev_vocab))
    bias = (trie, 3.0)
    bc = BeamConfig(beam_size=2, max_steps=12)

    art = str(tmp_path / "artbias")
    m = export_artifact(art, params, cfg, rev_vocab, beam_cfg=bc,
                        bucket_frames=(24,), batch_size=2, bias=bias)
    assert m["has_bias"] and m["boost_weight"] == 3.0
    dec = load_artifact(art)
    batch = [_feats(rng, 20), _feats(rng, 14)]
    got = dec.decode_batch(batch)

    live = _make_family_decoder(cfg, bc, bias=bias)
    feats = np.zeros((2, 24, cfg.feat_length), np.float32)
    lens = np.ones((2,), np.int32)
    for i, f in enumerate(batch):
        feats[i, : f.shape[0]] = f
        lens[i] = f.shape[0]
    want_tokens, _, _ = live(params, {"logmel": feats, "logmel_len": lens})
    for i, g in enumerate(got):
        sent = text.ids_to_sentence(np.asarray(want_tokens)[i], rev_vocab)
        _, words = text.get_relevant_words(sent)
        assert g == " ".join(words)


def test_compile_cache_flag(setup, tmp_path):
    """-compile_cache reaches TrainConfig and points XLA's persistent
    compilation cache at the directory: a fresh jit compile writes a cache
    entry (the disk hit that removes recompiles across restarts)."""
    import jax.numpy as jnp

    from e2e_asr_tpu.cli.main import parse_options

    root, cfg, params, rev_vocab = setup
    cache = str(tmp_path / "xla_cache")
    parsed = parse_options(["-compile_cache", cache,
                            "-vocab_dir", str(root / "vocab"),
                            "-tb_dir", str(tmp_path / "models")])
    assert parsed.train.compile_cache == cache
    try:
        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        x = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
        float(f(x))
        assert os.path.isdir(cache) and os.listdir(cache)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
