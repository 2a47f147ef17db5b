"""BEST-RQ-style self-supervised encoder pretraining (`-ssl`).

Extension with no reference counterpart: the reference's only transfer
hooks are supervised-checkpoint partial restores
(/root/reference/train.py:208-211, tf_utils.py:17-63 — `pretrain_lm_path` /
`pretrain_phone_path`). `-ssl` adds the missing leg of the training story —
pretraining the encoder on UNLABELED audio — and `-pretrain_enc_path` feeds
the result into a supervised run through the exact same pytree-path
partial-restore mechanism.

Technique: random-projection quantization + masked prediction (Chiu et al.,
"Self-supervised learning with random-projection quantizer for speech
recognition", 2022). It is the most TPU-friendly SSL recipe there is:

- the quantizer is FROZEN — one random projection matmul + a nearest-
  codebook argmax over l2-normalized vectors. No codebook learning, no EMA
  updates, no straight-through estimators; targets are pure data
  preprocessing that XLA fuses into the step.
- every shape is static: span masking is a Bernoulli + windowed-OR at the
  encoder's OUTPUT frame rate, upsampled by the (static) reduction factor
  to input frames; the loss is a masked CE over a fixed [B, T_out] grid.
- labels align with the encoder output by construction: one codebook id per
  output frame, quantized from the `R` raw input frames that frame covers
  (R = the pyramid/subsample reduction factor), so no label interpolation
  or dynamic gather is ever needed.

Works unchanged for both encoder families (recurrent pyramid and
transformer), since both expose `encoder.apply` with ceil-div length
semantics (models/encoder.py:79-93).
"""
from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from e2e_asr_tpu.config import EncoderConfig, Seq2SeqConfig, TrainConfig
from e2e_asr_tpu.core.layers import glorot_uniform
from e2e_asr_tpu.models import encoder, seq2seq
from e2e_asr_tpu.train import step as step_lib

Array = jax.Array

# Masked input frames are replaced with Gaussian noise of this scale —
# BEST-RQ's choice (features are roughly unit-variance log-mels).
NOISE_STD = 0.1


class SSLState(NamedTuple):
    """Pretraining state. `quantizer` (projection + codebook) is FROZEN —
    checkpointed so resume/eval see identical targets, but never touched by
    the optimizer."""
    params: Any             # {"encoder": ..., "ssl_head": {"w", "b"}}
    opt_state: Any
    quantizer: Any          # {"proj": [R*F, D_c], "codebook": [V_c, D_c]}
    global_step: Array      # int32 scalar
    epoch: Array            # int32 scalar


def output_reduction_factor(cfg: EncoderConfig, max_depth: int) -> int:
    """Input frames per encoder OUTPUT frame at `max_depth` — the label/mask
    alignment quantum. Recurrent: initial_res_fac x skip_step per reducing
    layer (encoder.py:94-119 ceil-div semantics chain to one ceil-div by the
    product). Transformer: the input reshape-subsample factor."""
    if cfg.encoder_type == "transformer":
        return max(cfg.subsample, 1)
    r = max(cfg.initial_res_fac, 1)
    for reduces in encoder.layer_plan(cfg, max_depth):
        if reduces:
            r *= cfg.skip_step
    return r


def init_ssl(key: Array, model_cfg: Seq2SeqConfig,
             tc: TrainConfig) -> SSLState:
    """Encoder + linear code-prediction head + frozen random quantizer."""
    enc_cfg = model_cfg.encoder
    max_depth = max(model_cfg.num_layers.values())
    k_enc, k_head, k_proj, k_code = jax.random.split(key, 4)
    h_out = encoder_output_dim(enc_cfg)
    params = {
        "encoder": encoder.init(k_enc, enc_cfg, max_depth,
                                model_cfg.feat_length),
        "ssl_head": {"w": glorot_uniform(k_head,
                                         (h_out, tc.ssl_codebook_size)),
                     "b": jnp.zeros((tc.ssl_codebook_size,))},
    }
    r = output_reduction_factor(enc_cfg, max_depth)
    window = model_cfg.feat_length * r
    quantizer = {
        # Frozen random projection + l2-normalized random codebook. The
        # projection sees RAW (un-stacked) frames: stacking only duplicates
        # feature context and would leak across window boundaries.
        "proj": jax.random.normal(k_proj, (window, tc.ssl_codebook_dim)),
        "codebook": _normalize(jax.random.normal(
            k_code, (tc.ssl_codebook_size, tc.ssl_codebook_dim))),
    }
    opt = step_lib.make_optimizer(model_cfg.learning_rate,
                                  model_cfg.max_gradient_norm,
                                  model_cfg.lr_warmup_steps)
    return SSLState(params=params, opt_state=opt.init(params),
                    quantizer=quantizer,
                    global_step=jnp.zeros((), jnp.int32),
                    epoch=jnp.zeros((), jnp.int32))


def encoder_output_dim(cfg: EncoderConfig) -> int:
    if cfg.encoder_type == "transformer":
        from e2e_asr_tpu.models.transformer_encoder import d_model
        return d_model(cfg)
    return cfg.hidden_size * (2 if cfg.bi_dir else 1)


def _normalize(x: Array, axis: int = -1) -> Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True),
                           1e-8)


def quantize_targets(quantizer: dict, feats: Array, r: int) -> Array:
    """Codebook ids [B, T_out] from CLEAN features [B, T, F]: each output
    frame's window of `r` raw frames is flattened, projected, l2-normalized,
    and matched to the nearest (max-cosine) codebook row."""
    B, T, F = feats.shape
    rem = T % r
    if rem:
        feats = jnp.pad(feats, ((0, 0), (0, r - rem), (0, 0)))
    t_out = feats.shape[1] // r
    windows = feats.reshape(B, t_out, r * F).astype(jnp.float32)
    projected = _normalize(windows @ quantizer["proj"])
    # codebook rows are stored normalized; argmax cosine == nearest on the
    # unit sphere.
    scores = projected @ quantizer["codebook"].T      # [B, T_out, V_c]
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def span_mask(rng: Array, shape: tuple[int, int], lens_out: Array,
              prob: float, span: int) -> Array:
    """Bool [B, T_out]: span starts ~ Bernoulli(prob) per valid output
    frame, dilated to `span` frames (windowed OR via a cumsum difference).
    Frames at or beyond each row's true length are never masked."""
    B, T = shape
    starts = jax.random.bernoulli(rng, prob, (B, T))
    valid = jnp.arange(T)[None, :] < lens_out[:, None]
    starts = jnp.logical_and(starts, valid)
    cums = jnp.cumsum(starts.astype(jnp.int32), axis=1)
    shifted = jnp.pad(cums, ((0, 0), (span, 0)))[:, :T]
    return jnp.logical_and((cums - shifted) > 0, valid)


def make_ssl_loss(model_cfg: Seq2SeqConfig, tc: TrainConfig, *,
                  compute_dtype=None):
    """(params, quantizer, batch, rng) -> (loss, metrics). Pure — shared by
    the train step and the fixed-rng dev evaluation."""
    enc_cfg = model_cfg.encoder
    max_depth = max(model_cfg.num_layers.values())
    r = output_reduction_factor(enc_cfg, max_depth)

    def loss_fn(params, quantizer, batch, rng):
        feats = batch["logmel"].astype(jnp.float32)      # clean, [B, T, F]
        lens = batch["logmel_len"].astype(jnp.int32)
        B, T, _ = feats.shape
        t_out = -(-T // r)
        lens_out = -(-lens // r)

        ids = quantize_targets(quantizer, feats, r)      # [B, T_out]
        rng_mask, rng_noise, rng_enc = jax.random.split(rng, 3)
        mask = span_mask(rng_mask, (B, t_out), lens_out,
                         tc.ssl_mask_prob, tc.ssl_mask_span)

        # Corrupt the input: upsample the output-frame mask by r and replace
        # masked frames with Gaussian noise.
        mask_in = jnp.repeat(mask, r, axis=1)[:, :T]     # [B, T]
        noise = NOISE_STD * jax.random.normal(rng_noise, feats.shape)
        corrupt = jnp.where(mask_in[:, :, None], noise, feats)

        moe = enc_cfg.moe_experts > 0
        aux_sink: list | None = [] if moe else None
        x = seq2seq.stack_frames(corrupt, enc_cfg.stack_cons)
        attn_states, _, _ = encoder.apply(
            params["encoder"], enc_cfg, x, lens, {"char": max_depth},
            train=True, rng=rng_enc, compute_dtype=compute_dtype,
            aux_sink=aux_sink)
        h = attn_states[max_depth].astype(jnp.float32)   # [B, T_out, H]
        logits = h @ params["ssl_head"]["w"] + params["ssl_head"]["b"]

        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, ids[:, :, None], axis=-1)[..., 0]
        m = mask.astype(jnp.float32)
        n_masked = jnp.maximum(jnp.sum(m), 1.0)
        loss = jnp.sum(ce * m) / n_masked
        hits = (jnp.argmax(logits, axis=-1) == ids).astype(jnp.float32)
        metrics = {"masked_acc": jnp.sum(hits * m) / n_masked,
                   "n_masked": jnp.sum(m)}
        if aux_sink:
            aux = sum(aux_sink)
            metrics["moe_aux"] = aux
            loss = loss + enc_cfg.moe_aux_weight * aux
        return loss, metrics

    return loss_fn


def make_ssl_step(model_cfg: Seq2SeqConfig, tc: TrainConfig, *,
                  compute_dtype=None):
    """Jittable (state, batch, rng) -> (state, metrics): masked-prediction
    CE over the frozen quantizer's codes, Adam + global-norm clip on the
    encoder + head only."""
    opt = step_lib.make_optimizer(model_cfg.learning_rate,
                                  model_cfg.max_gradient_norm,
                                  model_cfg.lr_warmup_steps)
    loss_fn = make_ssl_loss(model_cfg, tc, compute_dtype=compute_dtype)

    def step(state: SSLState, batch: dict, rng: Array):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.quantizer, batch, rng)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss)
        return state._replace(params=new_params, opt_state=new_opt,
                              global_step=state.global_step + 1), metrics

    return step


class SSLTrainer:
    """Pretraining driver: the supervised Trainer's data path (bucketed
    sets drained smallest-first, prefetch + overlapped device puts, DP mesh)
    around the masked-prediction step. No WER policies apply — the cadence
    metric is masked-prediction accuracy on the dev set under a FIXED mask
    rng (comparable across checkpoints); the run is step/epoch-bound
    (`-ssl_steps` / `-max_epochs`), not early-stopped."""

    def __init__(self, cfg):
        # Reuse the supervised Trainer for data/mesh/checkpoint plumbing
        # only — its jitted ASR/LM steps are built lazily and never traced.
        from e2e_asr_tpu.train.loop import Trainer
        self._base = Trainer(cfg, use_mesh=cfg.train.pp_stages <= 1
                             and cfg.train.sp_shards <= 1
                             and cfg.train.ep_shards <= 1)
        self.cfg = cfg
        self.model_cfg = cfg.model
        self.train_cfg = cfg.train
        self.compute_dtype = self._base.compute_dtype
        self.mesh = self._base.mesh
        self._primary = self._base._primary
        self.ssl_step = jax.jit(
            make_ssl_step(self.model_cfg, self.train_cfg,
                          compute_dtype=self.compute_dtype),
            donate_argnums=0)
        self._eval_loss = jax.jit(
            make_ssl_loss(self.model_cfg, self.train_cfg,
                          compute_dtype=self.compute_dtype))

    def dev_masked_acc(self, state: SSLState, dev_set) -> float:
        """Mean masked-prediction accuracy over the dev set under a fixed
        mask/noise rng — the SSL analogue of the dev-WER cadence metric."""
        accs, weights = [], []
        for i, batch in enumerate(dev_set.epoch()):
            dev_b = {k: jnp.asarray(v) for k, v in batch.items()
                     if k in ("logmel", "logmel_len")}
            _, metrics = self._eval_loss(state.params, state.quantizer,
                                         dev_b, jax.random.PRNGKey(i))
            accs.append(float(metrics["masked_acc"]))
            weights.append(float(metrics["n_masked"]))
        if not weights or sum(weights) == 0:
            return 0.0
        return float(np.average(accs, weights=weights))

    def train(self) -> None:
        import math
        import random
        import time
        from os import path

        from e2e_asr_tpu.core import checkpoint as ckpt_lib
        from e2e_asr_tpu.core.summary import NullWriter, SummaryWriter
        from e2e_asr_tpu.data.speech import prefetch

        tc = self.train_cfg
        seed = self._base._seed()
        random.seed(seed)
        np.random.seed(seed % (2 ** 32))
        os.makedirs(tc.train_dir, exist_ok=True)

        state = init_ssl(jax.random.PRNGKey(seed), self.model_cfg, tc)
        restored = ckpt_lib.restore_latest(tc.train_dir, state)
        if restored is not None:
            state, _ = restored
            print(f"Resumed SSL pretraining from step "
                  f"{int(state.global_step)}")
        if self.mesh is not None:
            from e2e_asr_tpu.core import sharding as sharding_lib
            state = sharding_lib.place_state(state, self.mesh)

        buckets, dev_set = self._base.get_data_sets()
        writer = (SummaryWriter(path.join(tc.train_dir, "summary"))
                  if self._primary else NullWriter())

        rng = jax.random.PRNGKey(seed + 1)
        loss_acc = jnp.zeros(())
        acc_acc = jnp.zeros(())
        frames = 0
        current_step = 0
        epoch = int(state.epoch)
        stop = False
        t0 = time.time()

        while epoch <= tc.max_epochs and not stop:
            print(f"\nSSL epochs done: {epoch}")
            bucket_iters = [
                prefetch(map(self._base._place_batch, b.epoch()), size=2)
                for b in buckets]
            bucket_idx = 0
            while bucket_idx < len(bucket_iters) and not stop:
                item = next(bucket_iters[bucket_idx], None)
                if item is None:
                    bucket_idx += 1
                    continue
                batch_frames, dev_b = item
                rng, sub = jax.random.split(rng)
                state, metrics = self.ssl_step(state, dev_b, sub)
                current_step += 1
                frames += batch_frames
                loss_acc = loss_acc + metrics["loss"]
                acc_acc = acc_acc + metrics["masked_acc"]

                if current_step % tc.steps_per_checkpoint == 0:
                    gstep = int(state.global_step)
                    mean_loss = float(loss_acc) / tc.steps_per_checkpoint
                    mean_acc = float(acc_acc) / tc.steps_per_checkpoint
                    if not math.isfinite(mean_loss):
                        print("SSL loss diverged; stopping")
                        return
                    dt = max(time.time() - t0, 1e-6)
                    print(f"SSL steps: {gstep}, masked CE: {mean_loss:.4f}, "
                          f"masked acc: {mean_acc:.4f}, "
                          f"frames/sec: {frames / dt:.0f}")
                    writer.scalar("SSL masked CE", mean_loss, gstep)
                    writer.scalar("SSL masked acc (train)", mean_acc, gstep)
                    if dev_set is not None:
                        dev_acc = self.dev_masked_acc(state, dev_set)
                        print(f"SSL dev masked acc: {dev_acc:.4f}")
                        writer.scalar("SSL masked acc (dev)", dev_acc, gstep)
                    self._base._save(tc.train_dir, "ssl.ckpt", gstep, state,
                                     meta={"ssl": True})
                    loss_acc = jnp.zeros(())
                    acc_acc = jnp.zeros(())
                    frames = 0
                    t0 = time.time()
                if tc.ssl_steps and int(state.global_step) >= tc.ssl_steps:
                    stop = True
            state = state._replace(epoch=state.epoch + 1)
            epoch += 1

        gstep = int(state.global_step)
        self._base._save(tc.train_dir, "ssl.ckpt", gstep, state,
                         meta={"ssl": True})
        print(f"SSL pretraining done at step {gstep}; fine-tune with "
              f"-pretrain_enc_path "
              f"{path.join(tc.train_dir, f'ssl.ckpt-{gstep}.npz')}")
        writer.close()
