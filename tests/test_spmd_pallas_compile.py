"""SPMD-partitioner contract for every Pallas kernel family (compile-only).

Round 4's multichip break (kernel-dropout io_callback vs the SPMD
partitioner) proved numeric tests on the XLA path cannot protect the
sharded-step x Pallas-interpret combination — the exact configuration the
driver's dryrun and any CPU-host smoke run uses. These tests LOWER AND
COMPILE (no execution: compile is where the partitioner RET_CHECKs live)
the DP and FSDP train steps with Pallas ENABLED for each kernel family:

- lstm:     fused bidir encoder (ops/lstm_pallas) + fused LSTM training
            decoder (ops/dec_train_pallas)
- gru:      ops/gru_pallas + ops/dec_train_gru_pallas
- mhsa:     ops/mhsa_pallas — inference-only by policy (E2E_ASR_MHSA_KERNEL);
            compiled through the DP eval decode instead of the train step

Training dropout is ON (out_prob 0.9) so the off-TPU xla_dropout fallback
(the round-5 backend gate) is part of the compiled program.
"""
import numpy as np

import jax
import pytest

from e2e_asr_tpu.config import (DecoderConfig, EncoderConfig, LMConfig,
                                Seq2SeqConfig)
from e2e_asr_tpu.core import mesh as mesh_lib
from e2e_asr_tpu.core import sharding as sharding_lib
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as step_lib

from tests.test_hlo_structure import _batch


def _cfg(family, V=24, H=128):
    enc = dict(hidden_size=H, out_prob=0.9)
    dec = dict(hidden_size_dec=H, emb_size=H, vocab_size=V,
               attention_vec_size=H, lm_hidden_size=H, samp_prob=0.1,
               out_prob_dec=0.9, max_output=6)
    if family == "gru":
        enc["use_lstm"] = False
        dec["use_lstm"] = False
    elif family == "mhsa":
        enc.update(encoder_type="transformer", num_heads=2, ffn_mult=2,
                   subsample=2)
    return Seq2SeqConfig(
        tasks=["char"], num_layers={"char": 2}, max_output={"char": 6},
        encoder=EncoderConfig(**enc),
        decoders={"char": DecoderConfig(**dec)},
        feat_length=8)


@pytest.fixture
def pallas_on(monkeypatch):
    monkeypatch.delenv("E2E_ASR_NO_PALLAS", raising=False)


@pytest.mark.parametrize("family", ["lstm", "gru"])
@pytest.mark.parametrize("fsdp", [False, True], ids=["dp", "fsdp"])
def test_sharded_train_step_compiles_with_pallas(family, fsdp, pallas_on):
    mesh = mesh_lib.make_mesh(n_data=8)
    cfg = _cfg(family)
    lm_cfg = LMConfig(vocab_size=24)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    state = sharding_lib.place_state(state, mesh, fsdp=fsdp)
    batch = mesh_lib.shard_batch(mesh, _batch(np.random.default_rng(0)))
    step = step_lib.make_train_step(cfg, lm_cfg)[0]
    compiled = jax.jit(step).lower(state, batch,
                                   jax.random.PRNGKey(1)).compile()
    assert compiled is not None


def test_dp_eval_decode_compiles_with_mhsa_kernel(pallas_on, monkeypatch):
    """The inference-only MHSA kernel under the DP eval mesh."""
    from e2e_asr_tpu.data import text
    monkeypatch.setenv("E2E_ASR_MHSA_KERNEL", "1")
    cfg = _cfg("mhsa")
    mesh = mesh_lib.make_mesh(n_data=8)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    params = mesh_lib.replicate(mesh, params)
    batch = _batch(np.random.default_rng(0))
    batch = mesh_lib.shard_decode_batch(
        {"logmel": batch["logmel"], "logmel_len": batch["logmel_len"]}, mesh)

    def decode(p, feats, lens):
        return seq2seq.apply_greedy(p, cfg, feats, lens, task="char",
                                    go_id=text.GO_ID)

    compiled = (jax.jit(decode)
                .lower(params, batch["logmel"], batch["logmel_len"])
                .compile())
    assert compiled is not None
