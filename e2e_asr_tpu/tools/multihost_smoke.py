"""REAL multi-process (jax.distributed) training-step smoke test.

The multi-host machinery — per-process file sharding
(data/speech.py:load_files), global-batch assembly (core/mesh.shard_batch),
replicated/sharded state placement (core/sharding.place_state), and the
SPMD train step — was previously validated only with SPOOFED processes
(tests/test_multihost.py monkeypatches jax.process_index). This tool runs it
for real: it spawns N separate Python WORKER PROCESSES, each with its own
jax.distributed runtime (TCP coordination service, 2 local CPU devices per
process), forming one global {data: N*2} mesh whose gradient all-reduce
genuinely crosses process boundaries.

    python -m e2e_asr_tpu.tools.multihost_smoke            # launcher
    (workers are spawned internally with --process_id/--coordinator)

What it proves, end to end:
1. Every worker computes the SAME loss trajectory (the replicated metrics
   leave the cross-process collective consistent).
2. The trajectory equals a single-controller run over the same global
   batches (assembled by concatenating the per-process dataset shards in
   process order — make_array_from_process_local_data's layout) on an
   equally-sized local mesh: multi-process introduces no numeric drift.

The reference is single-process (SURVEY §2.2); this is the TPU-pod-style
multi-controller contract jax.distributed provides, scaled down to one
machine. On a real pod the same worker code runs once per host with the
coordinator address pointing at host 0.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

LOCAL_DEVICES = 2        # per worker process
STEPS = 4
B_LOCAL = 4              # per-process batch rows (global = N * B_LOCAL)


def _smoke_cfg():
    from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig, LMConfig,
                                    Seq2SeqConfig)
    cfg = Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 8},
        encoder=EncoderConfig(hidden_size=8, out_prob=1.0),
        decoders={"char": DecoderConfig(
            hidden_size_dec=8, emb_size=6, vocab_size=40,
            attention_vec_size=5, lm_hidden_size=8, out_prob_dec=1.0,
            max_output=8)},
        feat_length=8)
    return cfg, LMConfig(vocab_size=40)


def _datasets(data_dir: str, process_index: int, process_count: int):
    """This process's file shard — the REAL training data path."""
    import glob

    from e2e_asr_tpu.data.speech import SpeechDataset
    files = sorted(glob.glob(os.path.join(data_dir, "train_1k.0.*")))
    return SpeechDataset(files, B_LOCAL, 8, is_training=True,
                         tasks=("char",), seed=10,
                         process_index=process_index,
                         process_count=process_count)


def _run_steps(mesh, batches):
    """The shared step loop: place state + batches on `mesh`, run STEPS
    ASR steps, return the loss trajectory. `batches` yields host batch
    dicts — local rows under multi-process (shard_batch assembles the
    global array), global rows single-controller (same call)."""
    import jax

    from e2e_asr_tpu.core import mesh as mesh_lib
    from e2e_asr_tpu.core import sharding as sharding_lib
    from e2e_asr_tpu.train import step as step_lib

    cfg, lm_cfg = _smoke_cfg()
    params = step_lib.init_params(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    state = sharding_lib.place_state(state, mesh)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg)
    asr_step = jax.jit(asr_step, donate_argnums=0)
    key = jax.random.PRNGKey(7)
    losses = []
    for batch in batches:
        host_b = {k: v for k, v in batch.items() if k != "utt_ids"}
        dev_b = mesh_lib.shard_batch(mesh, host_b)
        key, sub = jax.random.split(key)
        state, m = asr_step(state, dev_b, sub)
        losses.append(float(m["loss"]))
    return losses


def _take_batches(ds, n):
    out = []
    while len(out) < n:
        for b in ds.epoch():
            out.append(b)
            if len(out) == n:
                break
    return out


def worker_main(args) -> None:
    # JAX_PLATFORMS=cpu and the virtual-device XLA flag arrive via the
    # environment (set by the launcher BEFORE interpreter startup — the
    # sitecustomize hook reads them then).
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == LOCAL_DEVICES * args.num_processes

    from e2e_asr_tpu.core import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(n_data=jax.device_count(), n_model=1)
    ds = _datasets(args.data_dir, args.process_id, args.num_processes)
    losses = _run_steps(mesh, _take_batches(ds, STEPS))
    with open(os.path.join(args.out, f"losses_{args.process_id}.json"),
              "w") as f:
        json.dump(losses, f)
    print(f"worker {args.process_id}: losses={losses}", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launcher_main(num_processes: int = 2) -> dict:
    # The launcher itself needs num_processes * LOCAL_DEVICES local virtual
    # devices for the single-controller reference run.
    n_dev = num_processes * LOCAL_DEVICES
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{n_dev}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from e2e_asr_tpu.data.synth import write_speech_corpus

    root = tempfile.mkdtemp(prefix="mh_smoke_")
    data = os.path.join(root, "data")
    os.makedirs(data)
    # >= num_processes files so every process's shard is non-empty.
    for i in range(2 * num_processes):
        write_speech_corpus(os.path.join(data, f"train_1k.0.{i:04d}"),
                            3 * B_LOCAL, seed=i, feat_length=8,
                            char_vocab=36, min_tokens=3, max_tokens=5,
                            frames_per_token=4)

    port = _free_port()
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "E2E_ASR_NO_PALLAS": "1",
           "XLA_FLAGS": f"--xla_force_host_platform_device_count="
                        f"{LOCAL_DEVICES}"}
    logs = [open(os.path.join(root, f"worker_{p}.log"), "w")
            for p in range(num_processes)]
    procs = [subprocess.Popen(
        [sys.executable, "-m", "e2e_asr_tpu.tools.multihost_smoke",
         "--process_id", str(p), "--num_processes", str(num_processes),
         "--coordinator", f"127.0.0.1:{port}", "--data_dir", data,
         "--out", root],
        env=env, stdout=logs[p], stderr=subprocess.STDOUT)
        for p in range(num_processes)]
    codes = [p.wait(timeout=600) for p in procs]
    for f in logs:
        f.close()
    if any(codes):
        tails = []
        for p in range(num_processes):
            with open(os.path.join(root, f"worker_{p}.log")) as f:
                tails.append(f"--- worker {p} ---\n"
                             + "".join(f.readlines()[-15:]))
        raise RuntimeError(f"worker exit codes: {codes}\n" + "\n".join(tails))

    trajs = []
    for p in range(num_processes):
        with open(os.path.join(root, f"losses_{p}.json")) as f:
            trajs.append(json.load(f))
    for p in range(1, num_processes):
        np.testing.assert_allclose(trajs[p], trajs[0], rtol=0, atol=0)

    # Single-controller reference: the same global batches (per-process
    # shards concatenated in process order) on an equal-size local mesh.
    from e2e_asr_tpu.core import mesh as mesh_lib
    shards = [_take_batches(_datasets(data, p, num_processes), STEPS)
              for p in range(num_processes)]
    global_batches = [
        {k: np.concatenate([shards[p][i][k] for p in range(num_processes)])
         for k in shards[0][i] if k != "utt_ids"}
        for i in range(STEPS)]
    mesh = mesh_lib.make_mesh(n_data=n_dev, n_model=1,
                              devices=jax.devices()[:n_dev])
    ref = _run_steps(mesh, global_batches)
    np.testing.assert_allclose(trajs[0], ref, rtol=1e-6, atol=1e-6)
    print(f"multihost_smoke OK: {num_processes} processes x "
          f"{LOCAL_DEVICES} devices, losses {trajs[0]} == single-controller "
          f"reference")
    return {"losses": trajs[0], "reference": ref}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--process_id", type=int, default=-1)
    parser.add_argument("--num_processes", type=int, default=2)
    parser.add_argument("--coordinator", type=str, default="")
    parser.add_argument("--data_dir", type=str, default="")
    parser.add_argument("--out", type=str, default="")
    args = parser.parse_args(argv)
    if args.process_id >= 0:
        worker_main(args)
    else:
        launcher_main(args.num_processes)


if __name__ == "__main__":
    main()
