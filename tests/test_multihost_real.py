"""REAL multi-process jax.distributed smoke (tools/multihost_smoke.py).

tests/test_multihost.py exercises the multi-host code paths with spoofed
process indices; this launches TWO actual Python processes with their own
jax.distributed runtimes (TCP coordinator, cross-process gradient
all-reduce) and checks the loss trajectory against a single-controller run
— the tool itself asserts both invariants and prints OK."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_real_two_process_jax_distributed():
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "E2E_ASR_NO_PALLAS": "1"}
    # The launcher sets its own virtual-device counts (4 for the reference
    # run, 2 per worker); the suite's 8-device flag must not leak in.
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "e2e_asr_tpu.tools.multihost_smoke"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "multihost_smoke OK" in out.stdout, out.stdout


def test_real_two_process_full_cli():
    """--driver: TWO real jax.distributed processes each running the FULL
    production CLI (cli.main with -dist_coordinator/-dist_pid) over one
    shared run directory — per-process file shards, global mesh, complete
    Trainer policy loop in lockstep, process-0-only artifact writes, and a
    checkpoint that a plain single-controller eval then decodes. The tool
    asserts all of it and prints OK."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "E2E_ASR_NO_PALLAS": "1"}
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "e2e_asr_tpu.tools.multihost_smoke",
         "--driver"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "multihost_driver OK" in out.stdout, out.stdout


def test_real_two_process_fsdp():
    """--fsdp: the ZeRO-3 placement under REAL jax.distributed — parameter
    leaves genuinely span the two worker processes (the tool asserts
    non-fully-addressable shardings), the cross-process all-gather /
    reduce-scatter pipeline runs, and the loss trajectory equals the
    single-controller reference exactly."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "E2E_ASR_NO_PALLAS": "1"}
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "e2e_asr_tpu.tools.multihost_smoke",
         "--fsdp"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "multihost_smoke OK" in out.stdout and "(fsdp)" in out.stdout
