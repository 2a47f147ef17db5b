"""Analytic FLOPs accounting (core/flops.py) pins.

Two independent cross-checks:
- the scan-free transformer encoder against XLA's own compiled cost
  analysis (matmul flops dominate; measured ratio 0.994);
- the recurrent flagship against a count derived from the REAL initialized
  parameter leaf shapes x per-leaf application counts — catches any drift
  between the model's actual dims and the analytic formulas.

Why not XLA cost analysis for the RNN paths: XLA counts a while/scan BODY
ONCE, not x T (measured: a 10-step scan of a [16,256]x[256,1024] matmul
reports 8.39e6 flops = exactly one iteration), so its number is a severe
undercount for recurrent models. The analytic module is the authority there.
"""
import dataclasses

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from __graft_entry__ import _model_cfg
from e2e_asr_tpu.core import flops as fl

B, T, L, V, FEAT = 8, 256, 32, 40, 80


def _xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def test_transformer_encoder_matches_xla_cost_analysis():
    from e2e_asr_tpu.models import transformer_encoder as te
    cfg = _model_cfg(vocab_size=V, feat=FEAT)
    ecfg = dataclasses.replace(cfg.encoder, encoder_type="transformer",
                               num_heads=4, ffn_mult=4, subsample=8)
    params = te.init(jax.random.PRNGKey(0), ecfg, 4, FEAT)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(B, T, FEAT)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    xla = _xla_flops(lambda p, x, l: te.apply(p, ecfg, x, l, {"char": 4}),
                     params, x, lens)
    ana = fl.encoder_fwd_flops(ecfg, 4, FEAT, B, T)
    assert ana == pytest.approx(xla, rel=0.05)


def test_rnn_encoder_matches_leaf_shapes():
    """Analytic == sum over real cell kernels of 2*B*T_layer*K*N."""
    from e2e_asr_tpu.models import encoder as enc_lib
    from e2e_asr_tpu.models import seq2seq
    cfg = _model_cfg(vocab_size=V, feat=FEAT)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)["encoder"]
    plan = enc_lib.layer_plan(cfg.encoder, 4)
    t, expected = T, 0.0
    for i in range(4):
        layer = params[f"layer_{i + 1}"]
        for d in ("fw", "bw"):
            k = layer[d]["kernel"]
            expected += 2.0 * B * t * k.shape[0] * k.shape[1]
        if plan[i]:
            t = -(-t // cfg.encoder.skip_step)
    ana = fl.encoder_fwd_flops(cfg.encoder, 4, FEAT, B, T)
    assert ana == pytest.approx(expected, rel=1e-6)


def test_attn_decoder_matches_leaf_shapes():
    from e2e_asr_tpu.models import seq2seq
    cfg = _model_cfg(vocab_size=V, feat=FEAT)
    dec = cfg.decoders["char"]
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)["decoder_char"]
    T_enc = 32
    sh = lambda name: params[name]["kernel"].shape

    def dense_f(n, shape):
        return 2.0 * n * shape[0] * shape[1]

    expected = 2.0 * B * T_enc * np.prod(params["attn_w"].shape)  # precompute
    step = dense_f(B, params["lm_cell"]["kernel"].shape)
    step += dense_f(B, sh("input_proj"))
    step += sum(dense_f(B, c["kernel"].shape) for c in params["dec_cells"])
    step += dense_f(B, sh("attn_query"))
    step += 2.0 * B * T_enc * params["attn_v"].shape[0]           # scores
    step += 2.0 * B * T_enc * params["attn_w"].shape[0]           # context
    step += dense_f(B, sh("attn_proj"))
    step += dense_f(B, sh("output_proj"))
    expected += L * step
    ana = fl.attn_decoder_fwd_flops(dec, 512, B, T_enc, L)
    assert ana == pytest.approx(expected, rel=1e-6)


def test_transducer_matches_leaf_shapes():
    from e2e_asr_tpu.models import transducer
    cfg = dataclasses.replace(_model_cfg(vocab_size=V, feat=FEAT),
                              model_family="transducer")
    params = transducer.init(jax.random.PRNGKey(0), cfg, V)
    U = L
    T_enc = fl._encoder_len_at_depth(cfg.encoder, 4, 4, T)

    def dense_f(n, shape):
        return 2.0 * n * shape[0] * shape[1]

    pred_cells = [v for k, v in sorted(params["pred"].items())
                  if k.startswith("layer_")]
    expected = sum(dense_f(B * (U + 1), c["kernel"].shape)
                   for c in pred_cells)
    expected += dense_f(B * T_enc, params["joint"]["enc_proj"]["kernel"].shape)
    expected += dense_f(B * (U + 1),
                        params["joint"]["pred_proj"]["kernel"].shape)
    expected += dense_f(B * T_enc * (U + 1),
                        params["joint"]["out"]["kernel"].shape)
    ana = fl.transducer_fwd_flops(cfg, B, T, U)
    assert ana == pytest.approx(expected, rel=1e-6)


def test_device_peak_lookup():
    assert fl.device_peak_flops("TPU v5e") == 197e12
    assert fl.device_peak_flops("TPU v5 lite") == 197e12
    assert fl.device_peak_flops("cpu") is None
    assert fl.mfu(1e12, 1.0, "TPU v5e") == pytest.approx(1e12 / 197e12)
    assert fl.mfu(1e12, 1.0, "TFRT_CPU_0") is None


def test_train_is_3x_forward():
    assert fl.train_flops(7.0) == 21.0
