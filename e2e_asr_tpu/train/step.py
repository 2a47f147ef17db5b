"""Jitted training steps: ASR multitask and the interleaved LM task.

The reference's per-step sess.run (train.py:297-299) becomes one compiled
train_step(state, batch, rng) -> (state, metrics) per bucket shape. Optimizer:
Adam behind global-norm clipping at 5.0 (seq2seq_model.py:137-155). The LM task
keeps its own Adam slots and step counter ("AdamLM", lm_model.py:76) but
updates the same parameter tree — gradients are nonzero only on the leaves the
LM shares with the char decoder, so Adam's zero-gradient updates are exact
no-ops on the rest.

The learning rate is a dynamic hyperparameter (optax.inject_hyperparams) so
the decay-on-plateau policy (train.py:334-343) can halve it without
recompiling.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from e2e_asr_tpu.config import LMConfig, Seq2SeqConfig
from e2e_asr_tpu.models import rnn_lm, seq2seq

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any          # ASR Adam (+clip) state
    lm_opt_state: Any       # LM Adam (+clip) state
    global_step: Array      # int32 scalar — ASR updates (train.py:80)
    lm_global_step: Array   # int32 scalar (lm_model.py:60)
    epoch: Array            # int32 scalar
    lm_epoch: Array         # int32 scalar — resume-visible LM epoch counter
                            # (lm_model.py:62, train.py:289-291)
    ema_params: Any = None  # Polyak/EMA shadow weights (-ema_decay > 0;
                            # extension). None contributes no pytree leaves,
                            # so checkpoints without EMA are unchanged.


def make_optimizer(learning_rate: float, max_grad_norm: float,
                   warmup_steps: int = 0):
    """Adam behind global-norm clipping; optional linear LR warmup
    (extension, -lr_warmup — the transformer family's standard ramp).

    Warmup is a traced scale on the updates AFTER the dynamic-LR Adam, so
    the decay-on-plateau policy (get_lr/set_lr on the hyperparams at chain
    index 1) keeps working unchanged and nothing recompiles per step."""
    parts = [
        optax.clip_by_global_norm(max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate),
    ]
    if warmup_steps > 0:
        parts.append(optax.scale_by_schedule(
            lambda count: jnp.minimum(1.0, (count + 1) / warmup_steps)))
    return optax.chain(*parts)


def create_state(params, model_cfg: Seq2SeqConfig, lm_cfg: LMConfig,
                 ema: bool = False) -> TrainState:
    """ema=True seeds EMA shadow weights at the initial params (so the
    running average needs no bias correction)."""
    asr_opt = make_optimizer(model_cfg.learning_rate,
                             model_cfg.max_gradient_norm,
                             model_cfg.lr_warmup_steps)
    lm_opt = make_optimizer(lm_cfg.lm_learning_rate, lm_cfg.max_gradient_norm)
    return TrainState(
        params=params,
        opt_state=asr_opt.init(params),
        lm_opt_state=lm_opt.init(params),
        global_step=jnp.zeros((), jnp.int32),
        lm_global_step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        lm_epoch=jnp.zeros((), jnp.int32),
        # Real copies, not aliases: params and ema_params both live in the
        # (donated) state — aliased buffers would be donated twice.
        ema_params=(jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params) if ema else None),
    )


def get_lr(state: TrainState) -> float:
    return float(state.opt_state[1].hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    """Set the ASR learning rate (the decay op, seq2seq_model.py:76-77)."""
    inner = state.opt_state[1]
    hyper = dict(inner.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    new_inner = inner._replace(hyperparams=hyper)
    return state._replace(opt_state=(state.opt_state[0], new_inner))


def init_params(key, model_cfg: Seq2SeqConfig) -> dict:
    """Model-family-aware parameter init: the hybrid CTC/attention family
    (ctc_weight > 0) is the seq2seq tree plus a CTC head — eval and
    checkpoints treat it as a superset; the pure-CTC family
    (model_family == "ctc") is the encoder plus a CTC head only.

    lora_rank > 0 additionally attaches the LoRA adapter subtree
    (core/lora.py) — HERE, so every surface that builds a template from the
    config (trainer, eval CLI, transcribe, serving, export) matches the
    checkpoint's leaf names automatically."""
    if model_cfg.model_family == "ctc":
        from e2e_asr_tpu.models import ctc
        params = ctc.init(key, model_cfg,
                          vocab_size=model_cfg.decoders["char"].vocab_size)
    elif model_cfg.model_family == "transducer":
        from e2e_asr_tpu.models import transducer
        params = transducer.init(
            key, model_cfg, vocab_size=model_cfg.decoders["char"].vocab_size)
    elif model_cfg.ctc_weight > 0:
        from e2e_asr_tpu.models import hybrid
        params = hybrid.init(key, model_cfg)
    else:
        params = seq2seq.init(key, model_cfg)
    if getattr(model_cfg, "lora_rank", 0) > 0:
        from e2e_asr_tpu.core import lora
        targets = tuple(t for t in model_cfg.lora_targets.split(",") if t)
        params = lora.attach(jax.random.fold_in(key, 0x10ae),
                             params, model_cfg.lora_rank, targets)
    return params


def lora_merged(params: dict, model_cfg: Seq2SeqConfig) -> dict:
    """Decode-surface view of a (possibly LoRA-carrying) tree: deltas folded
    into the kernels at the config's alpha, adapters stripped. Identity for
    plain trees."""
    from e2e_asr_tpu.core import lora
    if not isinstance(params, dict) or lora.SCOPE not in params:
        return params
    alpha = lora.resolve_alpha(getattr(model_cfg, "lora_rank", 0) or
                               next(iter(params[lora.SCOPE].values())
                                    )["a"].shape[1],
                               getattr(model_cfg, "lora_alpha", 0.0))
    return lora.merge(params, alpha)


def _ctc_labels(batch: dict):
    """CTC labels from the char ids: strip <go>, zero from <eos> on
    (char_len counts shifted targets incl. <eos>; labels exclude both
    specials -> len - 1)."""
    L = batch["char"].shape[1] - 1
    lab_lens = jnp.maximum(batch["char_len"] - 1, 0)
    labels = jnp.where(jnp.arange(L)[None, :] < lab_lens[:, None],
                       batch["char"][:, 1:], 0)
    return labels, lab_lens


def make_train_step(model_cfg: Seq2SeqConfig, lm_cfg: LMConfig,
                    compute_dtype=None, spec_augment: bool = False,
                    grad_accum: int = 1, ema_decay: float = 0.0,
                    pp_mesh=None, pp_micro: int = 1, sp_mesh=None,
                    ep_mesh=None, freeze: tuple[str, ...] = (),
                    speed_perturb: tuple[float, float] | None = None,
                    distill=None, skip_nonfinite: bool = False):
    """Build jittable (asr_step, lm_step) closures.

    spec_augment applies on-device time/frequency masking to the features
    before the encoder (frontend/specaugment.py) — a training-only
    augmentation the reference predates. model_cfg.ctc_weight > 0 trains the
    hybrid CTC/attention objective (models/hybrid.py); eval is unchanged.

    grad_accum > 1 splits the batch into that many equal micro-batches and
    accumulates gradients over a lax.scan before the single Adam update —
    activation memory drops ~grad_accum-fold while the update stays a
    full-batch one (the loss is a batch mean of per-example-normalized
    losses, so a mean of equal-size micro-batch means is exactly the
    full-batch mean). Dropout/scheduled-sampling noise is drawn per
    micro-batch (rng folded on the micro index), matching what a smaller
    physical batch would see.

    ema_decay > 0 maintains Polyak/EMA shadow weights (state.ema_params,
    seeded at the initial params by create_state(ema=True)):
    ema <- d*ema + (1-d)*params after EVERY update, including LM-task
    updates (which touch the shared decoder leaves). Evaluate them with
    -eval_ema; the train loop's dev-WER selection uses them automatically
    when enabled.

    pp_mesh: a ("stage",) Mesh engages pipeline parallelism for the
    transformer encoder's block stack (core/pipeline.py — blocks sharded
    over stages, pp_micro microbatches flowing via ppermute). All model
    families compose (attention, hybrid, pure CTC, transducer — each
    family's loss threads encode_fn through the shared encoder). A 2-D
    ("stage", "expert") mesh (make_stage_mesh with n_expert > 1)
    additionally shards MoE experts over the expert axis; sp_mesh
    composes the same way via make_seq_mesh(n_expert=...).

    freeze: "/"-joined pytree-path substrings whose leaves train with ZERO
    gradient (transfer-learning fine-tuning, e.g. freeze=("encoder",)
    after -pretrain_*_path init). Applied to ASR and LM tasks alike —
    Adam's moments see zeros, so frozen leaves never move.

    speed_perturb=(lo, hi): on-device tempo augmentation — each utterance's
    features are time-stretched by an independent factor s ~ U(lo, hi)
    (linear interpolation on the frame axis; lengths rescale by 1/s),
    the standard speed-perturbation recipe applied at the feature level.

    distill=(teacher_cfg, teacher_params, weight, temperature): knowledge
    distillation for the attention family (train/distill.py) — the char
    task trains against the frozen teacher's tempered posteriors.

    skip_nonfinite=True guards every update ENTIRELY ON DEVICE (no host
    sync, so the step pipeline keeps streaming): if the loss or any
    gradient leaf is non-finite, the whole TrainState — params, Adam
    moments, counters, EMA — keeps its pre-step value and
    metrics["skipped"] reports 1.0. A poisoned batch then costs one wasted
    step instead of permanently NaN-ing the optimizer moments (the classic
    divergence failure the reference has no answer to). Off by default:
    the select pass adds one extra HBM sweep over the state."""
    encode_fn = None
    if model_cfg.encoder.moe_experts > 0:
        if model_cfg.encoder.encoder_type != "transformer":
            raise ValueError("-moe_experts needs -encoder_type transformer "
                             "(the RNN encoder has no MoE blocks)")
    elif ep_mesh is not None:
        raise ValueError("ep_mesh without -moe_experts: there are no "
                         "experts to shard")
    if pp_mesh is not None and sp_mesh is not None:
        raise ValueError("pp_mesh and sp_mesh are mutually exclusive")
    if pp_mesh is not None or sp_mesh is not None:
        from functools import partial

        if pp_mesh is not None:
            from e2e_asr_tpu.core import pipeline as pipeline_lib
            encode_fn = partial(pipeline_lib.encode_pipeline, mesh=pp_mesh,
                                n_micro=pp_micro)
        else:
            from e2e_asr_tpu.core import seq_parallel as sp_lib
            encode_fn = partial(sp_lib.encode_seq_parallel, mesh=sp_mesh)
    asr_opt = make_optimizer(model_cfg.learning_rate,
                             model_cfg.max_gradient_norm,
                             model_cfg.lr_warmup_steps)
    lm_opt = make_optimizer(lm_cfg.lm_learning_rate, lm_cfg.max_gradient_norm)
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    lora_alpha = None
    if getattr(model_cfg, "lora_rank", 0) > 0:
        from e2e_asr_tpu.core import lora as lora_lib
        lora_alpha = lora_lib.resolve_alpha(model_cfg.lora_rank,
                                            model_cfg.lora_alpha)

    def with_lora(params):
        """Effective weights for any loss: kernels += adapter deltas.
        Applied INSIDE the loss functions so value_and_grad over the input
        tree reaches the adapters; the base kernels' (nonzero) gradients
        are zeroed by apply_freeze — LoRA trains the adapters only."""
        if lora_alpha is None:
            return params
        from e2e_asr_tpu.core import lora as lora_lib
        return lora_lib.apply(params, lora_alpha)

    def apply_freeze(grads):
        if not freeze and lora_alpha is None:
            return grads
        flat, treedef = jax.tree_util.tree_flatten_with_path(grads)
        out = []
        for path, g in flat:
            name = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                            for k in path)
            dead = any(f in name for f in freeze)
            if lora_alpha is not None and not name.startswith("lora"):
                dead = True            # LoRA mode: base weights frozen
            out.append(jnp.zeros_like(g) if dead else g)
        return jax.tree_util.tree_unflatten(treedef, out)

    def finite_guard(state: TrainState, new_state: TrainState, total,
                     grads, metrics: dict):
        """All-on-device non-finite-update skip (see make_train_step doc).
        Returns (guarded_state, metrics + skipped flag)."""
        if not skip_nonfinite:
            return new_state, metrics
        ok = jnp.isfinite(total)
        ok = jax.tree_util.tree_reduce(
            lambda a, g: jnp.logical_and(a, jnp.all(jnp.isfinite(g))),
            grads, ok)
        guarded = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_state, state)
        return guarded, {**metrics,
                         "skipped": 1.0 - ok.astype(jnp.float32)}

    def ema_update(state: TrainState, new_params):
        if ema_decay <= 0:
            return None
        if state.ema_params is None:
            raise ValueError("ema_decay > 0 needs create_state(ema=True)")
        d = ema_decay
        return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d),
                                      state.ema_params, new_params)

    def batch_loss(params, batch: dict, rng: Array):
        """(total, per_task) for one (micro-)batch, any model family."""
        params = with_lora(params)
        if model_cfg.model_family == "ctc":
            from e2e_asr_tpu.models import ctc
            cb = dict(batch)
            cb["labels"], cb["label_lens"] = _ctc_labels(batch)
            total = ctc.loss(params, model_cfg, cb, rng=rng,
                             compute_dtype=compute_dtype, ep_mesh=ep_mesh,
                             encode_fn=encode_fn)
            return total, {"ctc": total}
        if model_cfg.model_family == "transducer":
            from e2e_asr_tpu.models import transducer
            tb = dict(batch)
            tb["labels"], tb["label_lens"] = _ctc_labels(batch)
            total = transducer.loss(params, model_cfg, tb, rng=rng,
                                    compute_dtype=compute_dtype,
                                    ep_mesh=ep_mesh, encode_fn=encode_fn)
            return total, {"transducer": total}
        if model_cfg.ctc_weight > 0:
            from e2e_asr_tpu.models import hybrid
            hb = dict(batch)
            hb["labels"], hb["label_lens"] = _ctc_labels(batch)
            return hybrid.loss(params, model_cfg, hb,
                               ctc_weight=model_cfg.ctc_weight, rng=rng,
                               compute_dtype=compute_dtype, ep_mesh=ep_mesh,
                               encode_fn=encode_fn)
        if distill is not None:
            from e2e_asr_tpu.train import distill as distill_lib
            t_cfg, t_params, w, temp = distill
            return distill_lib.distill_loss(
                params, model_cfg, t_params, t_cfg, batch, rng=rng,
                weight=w, temperature=temp, compute_dtype=compute_dtype,
                encode_fn=encode_fn)
        return seq2seq.apply_train(params, model_cfg, batch, rng=rng,
                                   compute_dtype=compute_dtype,
                                   encode_fn=encode_fn, ep_mesh=ep_mesh)

    def asr_step(state: TrainState, batch: dict, rng: Array):
        if speed_perturb is not None:
            from e2e_asr_tpu.frontend.specaugment import speed_perturb as sp
            rng, sp_rng = jax.random.split(rng)
            batch = dict(batch)
            batch["logmel"], batch["logmel_len"] = sp(
                sp_rng, batch["logmel"], batch["logmel_len"],
                speed_perturb[0], speed_perturb[1])
        if spec_augment:
            from e2e_asr_tpu.frontend.specaugment import spec_augment as sa
            rng, sa_rng = jax.random.split(rng)
            batch = dict(batch)
            batch["logmel"] = sa(sa_rng, batch["logmel"],
                                 batch["logmel_len"])

        if grad_accum == 1:
            (total, per_task), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(state.params, batch, rng)
            grads = apply_freeze(grads)
        else:
            B = batch["logmel"].shape[0]
            if B % grad_accum:
                raise ValueError(
                    f"batch size {B} not divisible by grad_accum {grad_accum}")
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, B // grad_accum)
                                    + x.shape[1:]),
                batch)

            def body(g_acc, xs):
                mb, i = xs
                (t, pt), g = jax.value_and_grad(batch_loss, has_aux=True)(
                    state.params, mb, jax.random.fold_in(rng, i))
                return (jax.tree_util.tree_map(jnp.add, g_acc, g), (t, pt))

            g_sum, (totals, per_tasks) = jax.lax.scan(
                body, jax.tree_util.tree_map(jnp.zeros_like, state.params),
                (micro, jnp.arange(grad_accum)))
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, g_sum)
            grads = apply_freeze(grads)
            total = totals.mean()
            per_task = {k: v.mean() for k, v in per_tasks.items()}

        updates, new_opt = asr_opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state._replace(params=new_params, opt_state=new_opt,
                                   global_step=state.global_step + 1)
        if ema_decay > 0:
            new_state = new_state._replace(
                ema_params=ema_update(state, new_params))
        metrics = {"loss": total, **{f"loss_{t}": v for t, v in per_task.items()}}
        return finite_guard(state, new_state, total, grads, metrics)

    def lm_step(state: TrainState, token_ids: Array, seq_len: Array,
                rng: Array, valid: Array | None = None):
        def loss_fn(params):
            return rnn_lm.loss(with_lora(params), lm_cfg, token_ids, seq_len,
                               train=True, rng=rng, valid=valid,
                               compute_dtype=compute_dtype,
                               dec_cfg=model_cfg.decoders.get("char"))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = apply_freeze(grads)
        updates, new_opt = lm_opt.update(grads, state.lm_opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state._replace(params=new_params, lm_opt_state=new_opt,
                                   lm_global_step=state.lm_global_step + 1)
        if ema_decay > 0:
            new_state = new_state._replace(
                ema_params=ema_update(state, new_params))
        return finite_guard(state, new_state, loss, grads,
                            {"lm_loss": loss})

    return asr_step, lm_step
