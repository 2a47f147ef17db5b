"""Suite-resident version of the driver's multi-chip dry run.

Round 4 shipped a regression the 677-test suite could not see: conftest pins
E2E_ASR_NO_PALLAS=1, so no test ran the *sharded* train step through the
Pallas-interpret path — exactly the configuration `__graft_entry__.
dryrun_multichip` (and the round driver) uses. The in-kernel PRNG dropout
path engaged off-TPU via pltpu.InterpretParams, whose io_callback lowering
the SPMD partitioner rejects ("side-effect HLO cannot have a replicated
sharding"), and whose interpret-mode PRNG bits are zeros (silent no-dropout).

These tests pin both fixes:

- dryrun_multichip(8) runs green in a FRESH subprocess with Pallas ENABLED
  (no E2E_ASR_NO_PALLAS) — the exact driver configuration.
- kernel_dropout_ok() is backend-gated: off-TPU it must return False so
  rnn_layer falls back to the XLA jax.random dropout, which actually drops
  (~1-keep fraction of zeros), byte-identical to external dropout.
"""
import os
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.smoke
def test_dryrun_multichip_pallas_enabled():
    """The driver's dryrun must pass with Pallas ENABLED (fresh process, no
    E2E_ASR_NO_PALLAS) — fused kernels run in interpret mode under the
    8-device SPMD partitioner. Round-4's kernel-dropout io_callback broke
    exactly this; the backend gate in kernel_dropout_ok restores it."""
    env = dict(os.environ)
    env.pop("E2E_ASR_NO_PALLAS", None)
    env.pop("JAX_PLATFORMS", None)
    # dryrun_multichip sets xla_force_host_platform_device_count itself, but
    # the suite's XLA_FLAGS already carries it — either way is fine.
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed with Pallas enabled:\n--- stdout ---\n"
        f"{proc.stdout[-4000:]}\n--- stderr ---\n{proc.stderr[-4000:]}")
    assert "OK" in proc.stdout, proc.stdout


@pytest.mark.smoke
def test_kernel_dropout_backend_gated():
    """Off-TPU kernel_dropout_ok must refuse even shapes that fit VMEM: the
    interpret-mode emulation is pure downside (SPMD crash + all-keep masks)."""
    from e2e_asr_tpu.ops import lstm_pallas
    assert jax.default_backend() == "cpu"
    # Flagship-like shape that certainly fits the Pallas fwd+bwd kernels.
    assert lstm_pallas.bidir_fits(16, 8, 256, False)
    assert lstm_pallas._bwd_choice(16, 8, 256, False) is not None
    assert not lstm_pallas.kernel_dropout_ok(16, 8, 256, False)


@pytest.mark.smoke
def test_fused_path_off_tpu_actually_drops(rng, monkeypatch):
    """With Pallas ON and a CPU backend, rnn_layer's out_dropout must apply
    REAL dropout (XLA fallback) on the fused-kernel output: ~(1-keep) zeros,
    byte-identical to the caller applying layers.dropout externally. Before
    the backend gate this path silently applied NO dropout (all-keep
    interpret-mode masks)."""
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)
    from e2e_asr_tpu.core import rnn
    from e2e_asr_tpu.core.layers import dropout as xla_dropout

    T, B, in_dim, H = 8, 4, 16, 128
    params = rnn.rnn_layer_init(jax.random.PRNGKey(0), in_dim, H)
    x = jnp.asarray(rng.normal(size=(T, B, in_dim)).astype(np.float32))
    lens = jnp.array([T, T - 2, T - 3, 1], jnp.int32)
    key = jax.random.PRNGKey(42)
    keep = 0.9

    assert rnn.use_pallas_lstm()  # the fused path is actually engaged
    plain = rnn.rnn_layer(params, x, lens)
    got = rnn.rnn_layer(params, x, lens, out_dropout=(key, keep))
    want = xla_dropout(key, plain, keep)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # Real drops happened: ~10% zeros at valid positions (padded steps are
    # masked to zero for both plain and dropped, so compare only where the
    # clean output is nonzero).
    p, g = np.asarray(plain), np.asarray(got)
    valid = p != 0.0
    frac = (g[valid] == 0.0).mean()
    assert 0.03 < frac < 0.25, frac
