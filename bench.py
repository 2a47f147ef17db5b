"""Benchmark: training throughput (frames/sec/chip) + beam-decode RTFx.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Secondary metrics go to BENCH_DETAILS.json.

Baseline note: the reference repo publishes no throughput numbers and TF-1.x
cannot run in this environment (BASELINE.md), so vs_baseline is computed
against a DOCUMENTED ESTIMATE of the TF-1 single-GPU baseline for this model:
50,000 frames/sec (bucket-0 shape, dynamic_rnn-era GPU training). The driver
north-star (>=10x TF baseline) therefore corresponds to vs_baseline >= 10.
"""
from __future__ import annotations

import json
import time

import numpy as np

TF_BASELINE_FRAMES_PER_SEC = 50_000.0  # documented estimate, see module docstring

# Flagship SWBD-like shapes: bucket-0 training batch.
TRAIN_B, TRAIN_T, FEAT, TRAIN_L, VOCAB = 128, 384, 80, 48, 40
DECODE_B, DECODE_T, BEAM = 64, 512, 4
FRAME_HOP_S = 0.01  # 10 ms log-mel hop


def main() -> None:
    import jax
    import jax.numpy as jnp

    # rbg PRNG for dropout/sampling, matching the Trainer default
    # (config.TrainConfig.rng_impl) — ~2x cheaper than threefry on TPU.
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _batch, _model_cfg
    from e2e_asr_tpu.config import BeamConfig, LMConfig
    from e2e_asr_tpu.eval.beam_eval import make_beam_decoder
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib

    dtype = jnp.bfloat16
    cfg = _model_cfg(vocab_size=VOCAB, feat=FEAT)
    lm_cfg = LMConfig(vocab_size=VOCAB)
    rng = np.random.default_rng(0)

    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg, compute_dtype=dtype)
    asr_step = jax.jit(asr_step, donate_argnums=0)

    batch = _batch(rng, B=TRAIN_B, T=TRAIN_T, feat=FEAT, L=TRAIN_L, vocab=VOCAB)
    step_rng = jax.random.PRNGKey(1)

    # --- train throughput ---------------------------------------------------
    # NOTE: under the remote-tunnel platform block_until_ready can return
    # before execution finishes; a host value fetch is the reliable sync.
    state, m = asr_step(state, batch, step_rng)  # compile
    float(m["loss"])
    n_iter = 20
    t0 = time.perf_counter()
    for i in range(n_iter):
        state, m = asr_step(state, batch, step_rng)
    float(m["loss"])  # chain-dependent: forces all n_iter steps to finish
    train_dt = (time.perf_counter() - t0) / n_iter
    frames_per_sec = TRAIN_B * TRAIN_T / train_dt

    # --- beam decode RTFx ---------------------------------------------------
    beam_cfg = BeamConfig(beam_size=BEAM, max_steps=120)
    decode = make_beam_decoder(cfg, beam_cfg, compute_dtype=dtype)
    dec_batch = {
        "logmel": jnp.asarray(
            rng.normal(size=(DECODE_B, DECODE_T, FEAT)).astype(np.float32)),
        "logmel_len": jnp.full((DECODE_B,), DECODE_T, jnp.int32),
    }
    tokens, lens, scores = decode(state.params, dec_batch)  # compile
    np.asarray(tokens)
    n_dec = 5
    t0 = time.perf_counter()
    for _ in range(n_dec):
        tokens, lens, scores = decode(state.params, dec_batch)
        np.asarray(tokens)  # host fetch = reliable completion barrier
    dec_dt = (time.perf_counter() - t0) / n_dec
    audio_seconds = DECODE_B * DECODE_T * FRAME_HOP_S
    rtfx = audio_seconds / dec_dt

    details = {
        "train_frames_per_sec_per_chip": frames_per_sec,
        "train_step_ms": train_dt * 1e3,
        "train_shape": {"B": TRAIN_B, "T": TRAIN_T, "feat": FEAT,
                        "L": TRAIN_L, "vocab": VOCAB},
        "beam_decode_rtfx": rtfx,
        "beam_decode_ms": dec_dt * 1e3,
        "decode_shape": {"B": DECODE_B, "T": DECODE_T, "beam": BEAM},
        "device": str(jax.devices()[0]),
        "tf_baseline_frames_per_sec_estimate": TF_BASELINE_FRAMES_PER_SEC,
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / TF_BASELINE_FRAMES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
