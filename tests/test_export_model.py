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


def test_export_cli_end_to_end(setup, tmp_path):
    """The CLI exports from a run dir's checkpoint (falling back to fresh
    init when none exists) and the artifact transcribes."""
    from e2e_asr_tpu.tools import export_model

    root, cfg, params, rev_vocab = setup
    art = str(tmp_path / "artcli")
    manifest = export_model.main([
        "-out", art, "-buckets", "24", "-batch", "2",
        "-vocab_dir", str(root / "vocab"),
        "-tb_dir", str(tmp_path / "models"),
        "-hsize", "16", "-hsize_dec", "16", "-emb_size", "12",
        "-attn_vec_size", "8", "-lm_hsize", "16",
        "-feat_len", "8", "-max_out_char", "16",
        "-compute_dtype", "float32", "-beam_size", "2"])
    assert manifest["family"] == "attention"
    with open(os.path.join(art, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk["bucket_frames"] == [24]
    dec = ExportedDecoder(art)
    rng = np.random.default_rng(3)
    out = dec.transcribe(_feats(rng, 20))
    assert isinstance(out, str)


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
