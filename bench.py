"""Benchmark: training throughput (frames/sec/chip), driver-level throughput,
and beam-decode RTFx across batch sizes.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Secondary metrics go to BENCH_DETAILS.json:
    - driver_frames_per_sec: the REAL data path (host batch assembly, bf16
      feature shipping, prefetch + overlapped device puts, jitted step) on a
      synthetic SWBD-bucket-0-shaped corpus — the honest end-to-end number
      next to the isolated-step metric.
    - decode rows for B in {1, 8, 64, 256}, both pipelined (back-to-back
      dispatch, one final sync: the serving model, and the honest on-device
      latency under this environment's RPC tunnel) and per-call-synced.

Baseline note: vs_baseline divides by a DOCUMENTED ESTIMATE of the TF-1
single-GPU baseline for this model: 50,000 frames/sec (bucket-0 shape,
dynamic_rnn-era GPU training). The reference train step has ALSO been
measured for real in this environment (tools/tf_baseline: genuine TF graph,
reference loss + Adam + clip, B=128/T=384) — 30.0 s/step = 1,636 frames/s on
this host's CPU, the only hardware TF can use here. That measured number is
recorded in BENCH_DETAILS as context; the headline keeps dividing by the
HIGHER GPU-era estimate, which is the conservative choice. The driver
north-star (>=10x TF baseline) therefore corresponds to vs_baseline >= 10.
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

TF_BASELINE_FRAMES_PER_SEC = 50_000.0  # documented estimate, see module docstring


def _mfu(cfg, dt: float, *, B: int, T: int, L: int, lm_blend=None):
    """Analytic-model-FLOPs MFU for one train step (core/flops.py: matmul
    FLOPs, train = 3x fwd; v5e bf16 peak 197 TFLOP/s). Returns (mfu|None,
    tflops_per_step). lm_blend = (lm_prob, t_mt, t_lm) blends the interleaved
    LM task's FLOPs/time the same way the throughput row does."""
    import jax

    from e2e_asr_tpu.core import flops as fl
    f = fl.train_flops(fl.seq2seq_fwd_flops(cfg, B, T, L))
    if lm_blend is not None:
        p, t_mt, t_lm = lm_blend
        f_lm = fl.train_flops(fl.rnn_lm_fwd_flops(cfg, B, L))
        f = (1 - p) * f + p * f_lm
        dt = (1 - p) * t_mt + p * t_lm
    kind = jax.devices()[0].device_kind
    return fl.mfu(f, dt, kind), f / 1e12

# Measured by `python -m e2e_asr_tpu.tools.tf_baseline` (2026-08-17); static
# because it takes ~2 min of pure-CPU TF time and the graph/host don't change.
TF_BASELINE_MEASURED = {
    "frames_per_sec": 1635.8,
    "step_ms_best": 30047.3,
    "hardware": "host CPU (no GPU/TPU path exists for TF here)",
    "tool": "python -m e2e_asr_tpu.tools.tf_baseline",
    "note": ("MEASURED reference train step (genuine TF graph via "
             "tools/tf_fixture.py, reference loss + Adam + clip, "
             "train.py:297-299 semantics) at B=128/T=384 on this host's "
             "CPU — a hardware-incomparable lower bound on the reference's "
             "GPU-era throughput; the headline ratio conservatively divides "
             "by the higher 50k GPU-era estimate instead."),
}

# Flagship SWBD-like shapes: bucket-0 training batch.
TRAIN_B, TRAIN_T, FEAT, TRAIN_L, VOCAB = 128, 384, 80, 48, 40
DECODE_T, BEAM = 512, 4
DECODE_BATCHES = (1, 8, 64, 256)
FRAME_HOP_S = 0.01  # 10 ms log-mel hop


def _measure_train(jax, jnp, cfg, lm_cfg, rng):
    from __graft_entry__ import _batch
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib

    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg,
                                           compute_dtype=jnp.bfloat16)
    asr_step = jax.jit(asr_step, donate_argnums=0)
    batch = _batch(rng, B=TRAIN_B, T=TRAIN_T, feat=FEAT, L=TRAIN_L,
                   vocab=VOCAB)
    step_rng = jax.random.PRNGKey(1)
    # NOTE: under the remote-tunnel platform block_until_ready can return
    # before execution finishes; a host value fetch is the reliable sync.
    state, m = asr_step(state, batch, step_rng)  # compile
    float(m["loss"])
    # Best-of-5: the development tunnel's run-to-run variance is large
    # (VALIDATION.md); the recorded headline should not depend on catching
    # a bad RPC window.
    n_iter, dt = 15, float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, m = asr_step(state, batch, step_rng)
        float(m["loss"])  # chain-dependent: forces all iters to finish
        dt = min(dt, (time.perf_counter() - t0) / n_iter)
    return TRAIN_B * TRAIN_T / dt, dt


def _measure_full_recipe(jax, jnp, rng):
    """The full Interspeech-2017 recipe step costs: multitask ASR step
    (char + phone aux decoder on encoder depth 3) and the interleaved LM
    step, blended at the reference's lm_prob=0.1 coin
    (/root/reference/train.py:269, main.py:89-93). Closes the round-1
    review note that the headline step omitted these tasks."""
    from __graft_entry__ import _batch
    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig, LMConfig,
                                    Seq2SeqConfig)
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib

    PHONE_VOCAB, LM_PROB = 44, 0.1
    dec = dict(hidden_size_dec=256, emb_size=256, lm_hidden_size=256,
               attention_vec_size=128, max_output=120)
    cfg = Seq2SeqConfig(
        tasks=["char", "phone"],
        num_layers={"char": 4, "phone": 3},
        max_output={"char": 120, "phone": 120},
        encoder=EncoderConfig(hidden_size=256),
        decoders={"char": DecoderConfig(vocab_size=VOCAB, **dec),
                  # aux tasks are forced to 1 decoder layer (main.py:127-131)
                  "phone": DecoderConfig(vocab_size=PHONE_VOCAB, **dec)},
        feat_length=FEAT)
    lm_cfg = LMConfig(vocab_size=VOCAB)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, lm_step = step_lib.make_train_step(cfg, lm_cfg,
                                                 compute_dtype=jnp.bfloat16)
    asr_step = jax.jit(asr_step, donate_argnums=0)
    lm_step = jax.jit(lm_step, donate_argnums=0)
    batch = _batch(rng, B=TRAIN_B, T=TRAIN_T, feat=FEAT, L=TRAIN_L,
                   vocab=VOCAB)
    ids = rng.integers(3, PHONE_VOCAB, size=(TRAIN_B, TRAIN_L)).astype(np.int32)
    ids[:, 0] = 1
    batch["phone"] = jnp.asarray(ids)
    batch["phone_len"] = jnp.full((TRAIN_B,), TRAIN_L - 1, jnp.int32)
    # LM ids are time-major [T, B] (rnn_lm.apply; train/loop.py ships .T).
    lm_ids = rng.integers(3, VOCAB, size=(TRAIN_L, TRAIN_B)).astype(np.int32)
    lm_ids[0, :] = 1
    lm_ids = jnp.asarray(lm_ids)
    lm_len = jnp.full((TRAIN_B,), TRAIN_L - 1, jnp.int32)
    key = jax.random.PRNGKey(1)

    state, m = asr_step(state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = asr_step(state, batch, key)
    float(m["loss"])
    t_mt = (time.perf_counter() - t0) / 10

    state, m = lm_step(state, lm_ids, lm_len, key)
    float(m["lm_loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = lm_step(state, lm_ids, lm_len, key)
    float(m["lm_loss"])
    t_lm = (time.perf_counter() - t0) / 10

    blended = ((1 - LM_PROB) * TRAIN_B * TRAIN_T
               / ((1 - LM_PROB) * t_mt + LM_PROB * t_lm))
    mfu, tflops = _mfu(cfg, t_mt, B=TRAIN_B, T=TRAIN_T, L=TRAIN_L - 1,
                       lm_blend=(LM_PROB, t_mt, t_lm))
    return {
        "multitask_step_ms": t_mt * 1e3,
        "lm_step_ms": t_lm * 1e3,
        "lm_prob": LM_PROB,
        "phone_vocab": PHONE_VOCAB,
        "frames_per_sec_blended": blended,
        "mfu": mfu,
        "tflops_per_step_blended": tflops,
    }


def _measure_transformer(jax, jnp, rng):
    """Train-step throughput for the Transformer encoder family (4 blocks,
    d_model=512 — the drop-in alternative measured next to the RNN
    flagship; VALIDATION.md)."""
    import dataclasses

    from __graft_entry__ import _batch, _model_cfg
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib

    cfg = _model_cfg(vocab_size=VOCAB, feat=FEAT)
    cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(
        cfg.encoder, encoder_type="transformer", num_heads=4, ffn_mult=4,
        subsample=8))
    lm_cfg = LMConfig(vocab_size=VOCAB)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg,
                                           compute_dtype=jnp.bfloat16)
    asr_step = jax.jit(asr_step, donate_argnums=0)
    batch = _batch(rng, B=TRAIN_B, T=TRAIN_T, feat=FEAT, L=TRAIN_L,
                   vocab=VOCAB)
    key = jax.random.PRNGKey(1)
    state, m = asr_step(state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = asr_step(state, batch, key)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    mfu, tflops = _mfu(cfg, dt, B=TRAIN_B, T=TRAIN_T, L=TRAIN_L - 1)
    return {"step_ms": dt * 1e3, "frames_per_sec": TRAIN_B * TRAIN_T / dt,
            "params": n_params, "blocks": 4, "d_model": 512,
            "mfu": mfu, "tflops_per_step": tflops}


def _measure_transformer_decoder(jax, jnp, rng):
    """The ALL-transformer seq2seq (transformer encoder + transformer
    decoder, -decoder_type transformer): train-step throughput and the B=8
    worst-case beam decode. The decoder's teacher-forced pass is parallel
    over output positions; decode carries per-block KV caches in the beam
    state (VALIDATION round-3: decode is gather-bound, ~2.3x the fused RNN
    decoder per 120-step search, still ~10x the 200x RTFx target)."""
    import dataclasses

    from __graft_entry__ import _batch, _model_cfg
    from e2e_asr_tpu.config import BeamConfig, LMConfig
    from e2e_asr_tpu.eval.beam import beam_decode
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib

    cfg = _model_cfg(vocab_size=VOCAB, feat=FEAT)
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, encoder_type="transformer",
                                    num_heads=4, ffn_mult=4, subsample=8),
        decoders={k: dataclasses.replace(d, decoder_type="transformer",
                                         num_layers_dec=2, dec_heads=4,
                                         dec_ffn_mult=4)
                  for k, d in cfg.decoders.items()})
    lm_cfg = LMConfig(vocab_size=VOCAB)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg,
                                           compute_dtype=jnp.bfloat16)
    asr_step = jax.jit(asr_step, donate_argnums=0)
    batch = _batch(rng, B=TRAIN_B, T=TRAIN_T, feat=FEAT, L=TRAIN_L,
                   vocab=VOCAB)
    key = jax.random.PRNGKey(1)
    state, m = asr_step(state, batch, key)
    float(m["loss"])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = asr_step(state, batch, key)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 10)

    # Worst-case (no-<eos>) beam decode on random states: B=8 (gathered
    # caches) and B=64 (ancestry-indirect caches engage at B*k >= 128 —
    # eval/beam.py mode selection; VALIDATION round-3 measured 1.78x there).
    dec_cfg = cfg.decoders["char"]
    H_enc = cfg.encoder.hidden_size * 2
    bc = BeamConfig(beam_size=BEAM, max_steps=120)
    # params was donated into the train step; read the live copy from state.
    dec_params = state.params["decoder_char"]
    mfu, tflops = _mfu(cfg, best, B=TRAIN_B, T=TRAIN_T, L=TRAIN_L - 1)
    out = {"step_ms": best * 1e3,
           "frames_per_sec": TRAIN_B * TRAIN_T / best,
           "dec_blocks": 2, "mfu": mfu, "tflops_per_step": tflops}
    for Bd in (8, 64):
        enc = jnp.asarray(rng.normal(size=(Bd, DECODE_T, H_enc))
                          .astype(np.float32))
        enc_lens = jnp.full((Bd,), DECODE_T, jnp.int32)
        fn = jax.jit(lambda p, e, el: beam_decode(p, dec_cfg, bc, e, el))
        _, _, scores = fn(dec_params, enc, enc_lens)
        float(scores[0])
        dbest = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                _, _, scores = fn(dec_params, enc, enc_lens)
            float(scores[0])
            dbest = min(dbest, (time.perf_counter() - t0) / 5)
        out[f"decode_B{Bd}_ms"] = dbest * 1e3
        out[f"decode_B{Bd}_rtfx"] = Bd * DECODE_T * FRAME_HOP_S / dbest
    return out


def _measure_forward_only(jax, jnp, rng):
    """Train-step throughput for the forward-only (-bi_dir false) flagship —
    the exact-zero-lookahead streaming configuration (eval/streaming.py):
    single-direction fused kernels with round-5 in-kernel dropout."""
    import dataclasses

    from __graft_entry__ import _batch, _model_cfg
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib

    cfg = _model_cfg(vocab_size=VOCAB, feat=FEAT)
    cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(
        cfg.encoder, bi_dir=False))
    lm_cfg = LMConfig(vocab_size=VOCAB)
    state = step_lib.create_state(
        seq2seq.init(jax.random.PRNGKey(0), cfg), cfg, lm_cfg)
    asr_step = jax.jit(step_lib.make_train_step(
        cfg, lm_cfg, compute_dtype=jnp.bfloat16)[0], donate_argnums=0)
    batch = _batch(rng, B=TRAIN_B, T=TRAIN_T, feat=FEAT, L=TRAIN_L,
                   vocab=VOCAB)
    key = jax.random.PRNGKey(1)
    state, m = asr_step(state, batch, key)
    float(m["loss"])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = asr_step(state, batch, key)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 10)
    mfu, tflops = _mfu(cfg, best, B=TRAIN_B, T=TRAIN_T, L=TRAIN_L - 1)
    return {"step_ms": best * 1e3,
            "frames_per_sec": TRAIN_B * TRAIN_T / best,
            "mfu": mfu, "tflops_per_step": tflops}


def _measure_gru(jax, jnp, rng):
    """Train-step throughput for the GRU family (reference use_lstm=False):
    fused encoder fwd+bwd and fused training-decoder kernels
    (ops/gru_pallas.py, ops/dec_train_gru_pallas.py; VALIDATION round-3)."""
    import dataclasses

    from __graft_entry__ import _batch, _model_cfg
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib

    cfg = _model_cfg(vocab_size=VOCAB, feat=FEAT)
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, use_lstm=False),
        decoders={k: dataclasses.replace(d, use_lstm=False)
                  for k, d in cfg.decoders.items()})
    lm_cfg = LMConfig(vocab_size=VOCAB)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg,
                                           compute_dtype=jnp.bfloat16)
    asr_step = jax.jit(asr_step, donate_argnums=0)
    batch = _batch(rng, B=TRAIN_B, T=TRAIN_T, feat=FEAT, L=TRAIN_L,
                   vocab=VOCAB)
    key = jax.random.PRNGKey(1)
    state, m = asr_step(state, batch, key)
    float(m["loss"])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = asr_step(state, batch, key)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 10)
    mfu, tflops = _mfu(cfg, best, B=TRAIN_B, T=TRAIN_T, L=TRAIN_L - 1)
    return {"step_ms": best * 1e3,
            "frames_per_sec": TRAIN_B * TRAIN_T / best,
            "mfu": mfu, "tflops_per_step": tflops}


def _measure_transducer(jax, jnp, rng):
    """Train-step throughput + batched greedy-decode RTFx for the
    transducer (RNN-T) family (models/transducer.py): lattice loss as a
    frame scan with a log-semiring associative_scan over labels, joint in
    rematerialized chunks; decode is one lax.while_loop."""
    import dataclasses

    from __graft_entry__ import _batch, _model_cfg
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.models import transducer
    from e2e_asr_tpu.train import step as step_lib

    cfg = _model_cfg(vocab_size=VOCAB, feat=FEAT)
    cfg = dataclasses.replace(cfg, model_family="transducer")
    lm_cfg = LMConfig(vocab_size=VOCAB)
    params = step_lib.init_params(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg,
                                           compute_dtype=jnp.bfloat16)
    asr_step = jax.jit(asr_step, donate_argnums=0)
    batch = _batch(rng, B=TRAIN_B, T=TRAIN_T, feat=FEAT, L=TRAIN_L,
                   vocab=VOCAB)
    key = jax.random.PRNGKey(1)
    state, m = asr_step(state, batch, key)
    float(m["loss"])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = asr_step(state, batch, key)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 10)

    # Batched greedy decode (streaming-native path), pipelined dispatch.
    B_dec = 8
    feats = jnp.asarray(rng.normal(size=(B_dec, DECODE_T, FEAT))
                        .astype(np.float32))
    feat_lens = jnp.full((B_dec,), DECODE_T, jnp.int32)
    decode = jax.jit(lambda p, f, l: transducer.greedy_decode(
        p, cfg, f, l, compute_dtype=jnp.bfloat16))
    toks = decode(state.params, feats, feat_lens)
    float(toks.sum())
    dec_best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            toks = decode(state.params, feats, feat_lens)
        float(toks.sum())
        dec_best = min(dec_best, (time.perf_counter() - t0) / 5)
    audio_s = B_dec * DECODE_T * FRAME_HOP_S
    mfu, tflops = _mfu(cfg, best, B=TRAIN_B, T=TRAIN_T, L=TRAIN_L - 1)
    return {"step_ms": best * 1e3,
            "frames_per_sec": TRAIN_B * TRAIN_T / best,
            "greedy_decode_ms": dec_best * 1e3,
            "greedy_decode_rtfx": audio_s / dec_best,
            "greedy_decode_B": B_dec,
            "mfu": mfu, "tflops_per_step": tflops}


def _measure_driver(jax, jnp):
    """Driver-level frames/sec on a synthetic bucket-0 corpus through the
    real Trainer data path."""
    import argparse

    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.data.synth import make_vocab_dir, write_speech_corpus
    from e2e_asr_tpu.train.loop import Trainer

    root = tempfile.mkdtemp(prefix="bench_driver_")
    data = os.path.join(root, "data")
    os.makedirs(data)
    make_vocab_dir(os.path.join(root, "vocab"))
    # ~TRAIN_T-frame utterances: bucket-0 shape at the reference batch size.
    write_speech_corpus(os.path.join(data, "train_1k.0.0001"), 256,
                        feat_length=FEAT, char_vocab=VOCAB - 4,
                        min_tokens=44, max_tokens=TRAIN_L,
                        frames_per_token=8)
    parser = argparse.ArgumentParser()
    config_lib.add_parse_options(parser)
    args = vars(parser.parse_args([
        "-data_dir", data, "-vocab_dir", os.path.join(root, "vocab"),
        "-tb_dir", os.path.join(root, "models"),
        "-feat_len", str(FEAT), "-buck_batch_sizes", str(TRAIN_B),
        "-max_out_char", str(TRAIN_L)]))
    cfg = config_lib.process_args(args, {"char": VOCAB})
    trainer = Trainer(cfg)
    # Best-of-3 on both modes: the development tunnel's run-to-run variance
    # (VALIDATION round-2/3 — one noisy window recorded the resident mode at
    # 0.70x of the step metric where a quiet one measures 0.99x).
    streaming = max(trainer.bench_throughput(n_steps=30, warmup=4)
                    for _ in range(3))
    resident = max(trainer.bench_throughput(n_steps=30, warmup=4,
                                            device_resident=True)
                   for _ in range(3))
    return streaming, resident


def _measure_decode(jax, jnp, cfg, rng):
    from e2e_asr_tpu.config import BeamConfig
    from e2e_asr_tpu.eval.beam_eval import make_beam_decoder

    from e2e_asr_tpu.models import seq2seq
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    # Worst case: never emit <eos> -> the full 120-step cap always runs.
    b = params["decoder_char"]["output_proj"]["bias"]
    params["decoder_char"]["output_proj"]["bias"] = b.at[2].set(-1e9)

    beam_cfg = BeamConfig(beam_size=BEAM, max_steps=120)
    decode = make_beam_decoder(cfg, beam_cfg, compute_dtype=jnp.bfloat16)
    rows = {}
    for B in DECODE_BATCHES:
        batch = {
            "logmel": jnp.asarray(
                rng.normal(size=(B, DECODE_T, FEAT)).astype(np.float32)),
            "logmel_len": jnp.full((B,), DECODE_T, jnp.int32),
        }
        tokens, _, _ = decode(params, batch)   # compile
        np.asarray(tokens)
        audio_s = B * DECODE_T * FRAME_HOP_S
        path = "megakernel" if B <= 2 else "step-fused"
        # Pipelined: back-to-back dispatch, one final sync (the serving
        # model; also the on-device latency with this env's RPC amortized).
        # Best-of-3 on both rows: tunnel variance protection (the same
        # payload measures 2.4-5.4 ms across reps here).
        dt_pipe = 1e9
        for _ in range(3):
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                tokens, _, _ = decode(params, batch)
            np.asarray(tokens)
            dt_pipe = min(dt_pipe, (time.perf_counter() - t0) / n)
        # Per-call: host sync (and tunnel RPC) on every call.
        dt_sync = 1e9
        for _ in range(3):
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                tokens, _, _ = decode(params, batch)
                np.asarray(tokens)
            dt_sync = min(dt_sync, (time.perf_counter() - t0) / n)
        rows[str(B)] = {
            "pipelined_ms": dt_pipe * 1e3,
            "pipelined_rtfx": audio_s / dt_pipe,
            "per_call_ms": dt_sync * 1e3,
            "per_call_rtfx": audio_s / dt_sync,
            "path": path,
        }
    # The B=1 serving case through the round-2 step-fused path, for the
    # before/after record next to the mega-kernel row above. The env var is
    # read at TRACE time, so a FRESH decoder closure is mandatory — the
    # existing `decode` already holds a B=1 mega-kernel executable in its
    # jit cache and would silently re-serve it.
    os.environ["E2E_ASR_NO_MEGA"] = "1"
    try:
        decode_nm = make_beam_decoder(cfg, beam_cfg,
                                      compute_dtype=jnp.bfloat16)
        B = 1
        batch = {
            "logmel": jnp.asarray(
                rng.normal(size=(B, DECODE_T, FEAT)).astype(np.float32)),
            "logmel_len": jnp.full((B,), DECODE_T, jnp.int32),
        }
        tokens, _, _ = decode_nm(params, batch)
        np.asarray(tokens)
        audio_s = B * DECODE_T * FRAME_HOP_S
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            tokens, _, _ = decode_nm(params, batch)
        np.asarray(tokens)
        dt_pipe = (time.perf_counter() - t0) / n
        rows["1_step_fused"] = {
            "pipelined_ms": dt_pipe * 1e3,
            "pipelined_rtfx": audio_s / dt_pipe,
            "path": "step-fused (E2E_ASR_NO_MEGA=1)",
        }
    finally:
        del os.environ["E2E_ASR_NO_MEGA"]
    return rows


def _measure_serving(jax, jnp, cfg, rng):
    """Dynamic-batching serving engine (eval/serving.py): aggregate
    throughput of 64 concurrent worst-case requests, batched vs one-by-one
    through the same engine."""
    from e2e_asr_tpu.config import BeamConfig
    from e2e_asr_tpu.eval.serving import BatchingTranscriber
    from e2e_asr_tpu.models import seq2seq

    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    # Worst case: <eos> never wins, every decode runs max_steps.
    b = params["decoder_char"]["output_proj"]["bias"]
    params["decoder_char"]["output_proj"]["bias"] = b.at[2].set(-1e9)
    rev_vocab = (["<pad>", "<go>", "<eos>"]
                 + [chr(97 + i % 26) for i in range(VOCAB - 3)])
    N = 64
    feats = [rng.normal(size=(DECODE_T, FEAT)).astype(np.float32)
             for _ in range(N)]
    audio_s = N * DECODE_T * FRAME_HOP_S
    out = {}
    for label, mb in (("batched_8", 8), ("one_by_one", 1)):
        tr = BatchingTranscriber(
            params, cfg, rev_vocab,
            beam_cfg=BeamConfig(beam_size=BEAM, max_steps=120),
            bucket_frames=(DECODE_T,), max_batch=mb, max_wait_ms=5.0)
        with tr:
            tr.transcribe(feats[0])           # compile outside the window
            t0 = time.perf_counter()
            futs = [tr.submit(x) for x in feats]
            for f in futs:
                f.result()
            dt = time.perf_counter() - t0
        out[label] = {"wall_s": dt, "requests_per_sec": N / dt,
                      "aggregate_rtfx": audio_s / dt,
                      "mean_occupancy": tr.stats.mean_occupancy}
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    # rbg PRNG for dropout/sampling, matching the Trainer default
    # (config.TrainConfig.rng_impl) — ~2x cheaper than threefry on TPU.
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _model_cfg
    from e2e_asr_tpu.config import LMConfig

    cfg = _model_cfg(vocab_size=VOCAB, feat=FEAT)
    lm_cfg = LMConfig(vocab_size=VOCAB)
    rng = np.random.default_rng(0)

    frames_per_sec, train_dt = _measure_train(jax, jnp, cfg, lm_cfg, rng)
    flagship_mfu, flagship_tflops = _mfu(cfg, train_dt, B=TRAIN_B,
                                         T=TRAIN_T, L=TRAIN_L - 1)
    full_recipe = _measure_full_recipe(jax, jnp, rng)
    transformer = _measure_transformer(jax, jnp, rng)
    all_transformer = _measure_transformer_decoder(jax, jnp, rng)
    gru = _measure_gru(jax, jnp, rng)
    fwd_only = _measure_forward_only(jax, jnp, rng)
    rnnt = _measure_transducer(jax, jnp, rng)
    driver_fps, driver_resident_fps = _measure_driver(jax, jnp)
    decode_rows = _measure_decode(jax, jnp, cfg, rng)
    serving = _measure_serving(jax, jnp, cfg, rng)

    vs_baseline = frames_per_sec / TF_BASELINE_FRAMES_PER_SEC
    b1 = decode_rows.get("1", {})
    # Explicit north-star verdicts (BASELINE.md:22-23) so the artifact
    # self-reports instead of leaving sub-target-looking numbers to be
    # explained by buried notes.
    targets = {
        "train_10x": {
            "target": ">=10x TF-baseline train frames/sec/chip",
            "value": round(vs_baseline, 2),
            "pass": bool(vs_baseline >= 10.0),
            "note": ("ratio divides by the documented 50k GPU-era ESTIMATE; "
                     "the measured TF baseline on this host is CPU-only "
                     "(1,636 frames/s, hardware-incomparable)"),
        },
        "rtfx_200": {
            "target": ">=200x real-time on-device beam decode",
            "value_b1_pipelined": round(b1.get("pipelined_rtfx", 0.0), 1),
            "value_b1_per_call": round(b1.get("per_call_rtfx", 0.0), 1),
            "pass": bool(b1.get("pipelined_rtfx", 0.0) >= 200.0),
            "note": ("pipelined = back-to-back dispatch, one final sync: the "
                     "serving model and the on-device number. per_call rows "
                     "are bound by this environment's ~36 ms RPC round trip "
                     "(decode-only on-device is 1.19 ms; VALIDATION.md) — on "
                     "a production host per_call ~= pipelined."),
        },
        "wer_parity": {
            "target": "WER parity on eval2000",
            "pass": None,
            "note": ("environment-blocked: no speech corpus + zero egress; "
                     "trained-TF-checkpoint decode equivalence is pinned "
                     "token-for-token (tests/test_tf_fixture.py) and the "
                     "one-command corpus->WER pipeline is ready "
                     "(docs/REALDATA.md)"),
        },
    }

    details = {
        "train_frames_per_sec_per_chip": frames_per_sec,
        "train_step_ms": train_dt * 1e3,
        "train_mfu": flagship_mfu,
        "train_tflops_per_step": flagship_tflops,
        "mfu_note": ("MFU = analytic model FLOPs (core/flops.py: matmul "
                     "FLOPs, train = 3x fwd) / step time / bf16 peak "
                     "(v5e: 197 TFLOP/s). Small-dim LSTM stacks are "
                     "latency-chain-bound, not MXU-bound — MFU is reported "
                     "for scale, the frames/sec metric is the target."),
        "targets": targets,
        "train_shape": {"B": TRAIN_B, "T": TRAIN_T, "feat": FEAT,
                        "L": TRAIN_L, "vocab": VOCAB},
        "full_recipe": full_recipe,
        "transformer_encoder": transformer,
        "all_transformer": all_transformer,
        "gru_family": gru,
        "forward_only_streaming": fwd_only,
        "transducer_family": rnnt,
        "driver_frames_per_sec": driver_fps,
        "driver_over_step_ratio": driver_fps / frames_per_sec,
        "driver_resident_frames_per_sec": driver_resident_fps,
        "driver_resident_over_step_ratio": driver_resident_fps / frames_per_sec,
        "driver_note": (
            "Development-tunnel bound: measured host->device bandwidth here "
            "is 1.8 MB/s (f32) / 15.5 MB/s (bf16) with 36 ms RPC round-trips "
            "(VALIDATION.md round-2), so shipping the 7.9 MB bf16 bucket-0 "
            "batch dominates the streaming mode. The device-resident mode "
            "(same policy loop, batches staged on-device once) isolates the "
            "driver itself — its ratio to the step metric is the proof that "
            "on a production host (PCIe, GB/s, overlapped) driver ~= step."),
        "beam_decode": decode_rows,
        "decode_note": (
            "B<=2 rows run the whole-decode mega-kernel "
            "(ops/beam_megakernel.py): the full 120-step search in ONE "
            "Pallas launch per utterance (state + weights VMEM-resident, "
            "in-kernel while_loop with early exit). Decode-only on-device "
            "cost at B=1/T=512/k=4 measured 1.19 ms vs 2.95 ms step-fused "
            "(2.5x); the pipelined row above additionally includes the "
            "encoder pass. per_call rows are bound by this environment's "
            "~36 ms RPC round trip (VALIDATION.md) — on a production host "
            "per-call ~= pipelined."),
        "decode_shape": {"T": DECODE_T, "beam": BEAM,
                         "max_steps": 120, "worst_case_no_eos": True},
        "serving_engine": serving,
        "device": str(jax.devices()[0]),
        "tf_baseline_frames_per_sec_estimate": TF_BASELINE_FRAMES_PER_SEC,
        "tf_baseline_measured": TF_BASELINE_MEASURED,
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
        # Denominator provenance: the ratio divides by the documented 50k
        # GPU-era ESTIMATE (measured TF on this host is CPU-only, 1,636
        # frames/s, hardware-incomparable) — details in BENCH_DETAILS.json.
        "vs_baseline_basis": "estimate",
        "mfu": (round(flagship_mfu, 4) if flagship_mfu is not None else None),
        # Both RTFx forms up front: per_call pays this environment's ~36 ms
        # RPC round trip per decode; pipelined is the serving/on-device form.
        "rtfx_per_call": round(b1.get("per_call_rtfx", 0.0), 1),
        "rtfx_pipelined": round(b1.get("pipelined_rtfx", 0.0), 1),
        "targets": {k: v["pass"] for k, v in targets.items()},
    }))


if __name__ == "__main__":
    main()
