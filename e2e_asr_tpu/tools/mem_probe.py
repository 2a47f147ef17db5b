"""Measure the -remat / -grad_accum memory levers on the flagship step.

For each variant (baseline, remat, grad_accum=4, both) this runs the real
jitted train step at the bench shape (B=128/T=384, bf16) and reports step
time plus the device allocator's peak-bytes watermark — the honest "how much
activation memory did the backward keep alive" number users size models by.

Usage: python -m e2e_asr_tpu.tools.mem_probe [-B 128] [-T 384] [-reps 10]
Writes a JSON summary to stdout (one object per variant).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time


def _peak_bytes(dev) -> int | None:
    try:
        stats = dev.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("peak_bytes_in_use")


def run_variant(name: str, *, remat: bool, grad_accum: int, B: int, T: int,
                reps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _batch, _model_cfg
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.models import seq2seq
    from e2e_asr_tpu.train import step as step_lib
    import numpy as np

    cfg = _model_cfg()
    if remat:
        cfg = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, remat=True))
    lm_cfg = LMConfig(lm_hidden_size=256, proj_size=256, emb_size=256,
                      vocab_size=40)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg,
                                           compute_dtype=jnp.bfloat16,
                                           grad_accum=grad_accum)
    asr_step = jax.jit(asr_step, donate_argnums=0)
    batch = _batch(np.random.default_rng(0), B=B, T=T, feat=80, L=48,
                   vocab=40)
    rng = jax.random.PRNGKey(1)

    dev = jax.devices()[0]
    # Compile-time memory analysis: temp_size is XLA's peak scratch (the
    # activation buffers the backward keeps alive) — available even where
    # the remote tunnel hides runtime allocator stats.
    compiled = asr_step.lower(state, batch, rng).compile()
    try:
        ma = compiled.memory_analysis()
        temp_bytes = int(ma.temp_size_in_bytes)
    except Exception:
        temp_bytes = None
    state, m = asr_step(state, batch, rng)  # compile
    loss0 = float(m["loss"])  # sync (tunnel-safe: host value fetch)
    peak = _peak_bytes(dev)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m = asr_step(state, batch, rng)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / reps)
    return {"variant": name, "remat": remat, "grad_accum": grad_accum,
            "step_ms": round(best * 1e3, 2),
            "frames_per_sec": round(B * T / best),
            "xla_temp_mib": (round(temp_bytes / 2**20, 1)
                             if temp_bytes else None),
            "peak_bytes_in_use": peak,
            "peak_mib": round(peak / 2**20, 1) if peak else None,
            "loss_after_compile": round(loss0, 4)}


VARIANTS = {"baseline": (False, 1), "remat": (True, 1),
            "grad_accum4": (False, 4), "both": (True, 4)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=128)
    ap.add_argument("-T", type=int, default=384)
    ap.add_argument("-reps", type=int, default=10)
    ap.add_argument("-variant", choices=sorted(VARIANTS), default=None,
                    help="run ONE variant in-process; default spawns a "
                         "fresh process per variant (peak_bytes_in_use is "
                         "an allocator-lifetime watermark, so variants must "
                         "not share a process)")
    args = ap.parse_args()

    if args.variant:
        remat, ga = VARIANTS[args.variant]
        print(json.dumps(run_variant(args.variant, remat=remat,
                                     grad_accum=ga, B=args.B, T=args.T,
                                     reps=args.reps)), flush=True)
        return

    import subprocess
    import sys
    for name in ("baseline", "remat", "grad_accum4", "both"):
        subprocess.run([sys.executable, "-m", "e2e_asr_tpu.tools.mem_probe",
                        "-variant", name, "-B", str(args.B),
                        "-T", str(args.T), "-reps", str(args.reps)],
                       check=True)


if __name__ == "__main__":
    main()
