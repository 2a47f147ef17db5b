"""Training driver: bucket scheduling, LM/ASR interleave, checkpoint /
LR-decay / early-stop policies.

Re-implements /root/reference/train.py:160-395 around jitted train steps:

- 5 length-bucketed training sets with per-bucket batch sizes, drained
  smallest-first each epoch (train.py:294-299, 379-383). Each bucket's fixed
  shape compiles exactly one step variant.
- per step, an `lm_prob` coin picks the LM task (train.py:269); the LM has its
  own optimizer slots and step counter but shares the parameter tree (§3.5).
- every `steps_per_checkpoint` ASR steps: log perplexity/LR, greedy dev WER,
  append to asr_err.txt, LR halving when the dev error is worse than the worst
  of the previous 3 checkpoints after min_steps (train.py:334-343), early stop
  when the best hasn't improved over 10 checkpoints at floor LR
  (train.py:153-158, 346-349), best-model save (best 2 kept) + periodic save.
- resume from the latest checkpoint; pretrained partial init via pytree-path
  merge (train.py:205-215, tf_utils.py:17-63).
"""
from __future__ import annotations

import glob
import math
import os
import random
import time
from os import path

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import ExperimentConfig
from e2e_asr_tpu.core import checkpoint as ckpt_lib
from e2e_asr_tpu.core import mesh as mesh_lib
from e2e_asr_tpu.core.summary import SummaryWriter
from e2e_asr_tpu.data import text
from e2e_asr_tpu.data.lm import LMDataset
from e2e_asr_tpu.data.speech import SpeechDataset
from e2e_asr_tpu.eval.greedy import (CTCEvaluator, GreedyEvaluator,
                                     TransducerEvaluator)
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as step_lib


def check_progress(previous_errs: list[float], num: int = 10) -> bool:
    """False when the best error hasn't improved in the last `num`
    checkpoints (train.py:153-158)."""
    if len(previous_errs) > num:
        if min(previous_errs) != min(previous_errs[-num:]):
            return False
    return True


def _device_batch(batch: dict, feats_dtype=None) -> dict:
    """Strip host-only fields; optionally ship features in bfloat16 (halves
    host->device transfer bytes — they feed bf16 matmuls anyway)."""
    out = {k: v for k, v in batch.items() if k not in ("utt_ids",)}
    if feats_dtype is not None:
        out["logmel"] = out["logmel"].astype(feats_dtype)
    return out


class Trainer:
    def __init__(self, cfg: ExperimentConfig, *, use_mesh: bool = True):
        self.cfg = cfg
        self.model_cfg = cfg.model
        self.train_cfg = cfg.train
        self.lm_cfg = cfg.lm
        # Multi-host (-dist_coordinator): every process runs the identical
        # policy loop (deterministic seeds keep the coin flips / LR decisions
        # in lockstep), but run-directory files have ONE writer. The
        # device->host checkpoint fetch still runs everywhere — it can be a
        # cross-process collective (core/checkpoint._host_leaf).
        self._primary = jax.process_index() == 0
        dtype = (jnp.bfloat16 if self.train_cfg.compute_dtype == "bfloat16"
                 else None)
        self.compute_dtype = dtype
        if self.train_cfg.rng_impl:
            jax.config.update("jax_default_prng_impl",
                              self.train_cfg.rng_impl)
        pp_mesh = sp_mesh = None
        # use_mesh=False (launch_eval) means "no training parallelism": skip
        # the pp/sp/ep mesh construction AND its flag validation entirely —
        # decoding is serial or eval-DP (launch_eval builds its own ("data",)
        # mesh), and the eval host may have fewer devices than training did.
        training = use_mesh
        n_ep = self.train_cfg.ep_shards if training else 1
        has_pp_sp = training and (self.train_cfg.pp_stages > 1
                                  or self.train_cfg.sp_shards > 1)
        if n_ep > 1:
            if self.model_cfg.encoder.moe_experts < 1:
                raise ValueError("-ep_shards needs -moe_experts (there are "
                                 "no experts to shard)")
            if self.model_cfg.encoder.moe_experts % n_ep:
                raise ValueError("-ep_shards must divide -moe_experts")
            # Standalone EP claims the devices as an ("expert",) mesh; under
            # -pp_stages/-sp_shards it (and -data_axis) rides the combined
            # pp/sp mesh instead.
            if not has_pp_sp and (self.train_cfg.data_axis > 1
                                  or self.train_cfg.model_axis > 1):
                raise ValueError("-ep_shards is mutually exclusive with "
                                 "-data_axis/-model_axis (compose them "
                                 "through -pp_stages/-sp_shards)")
        if has_pp_sp:
            # Pipeline/sequence parallelism claims the devices as stages /
            # time shards (core/pipeline.py, core/seq_parallel.py); the
            # ("data","model") mesh is not combined with them for now.
            # -ep_shards composes: the stage/seq mesh grows an "expert"
            # axis and the MoE FFNs shard over it in the same SPMD program.
            if self.train_cfg.pp_stages > 1 and self.train_cfg.sp_shards > 1:
                raise ValueError("-pp_stages and -sp_shards are mutually "
                                 "exclusive")
            if use_mesh and self.train_cfg.model_axis > 1:
                raise ValueError("-pp_stages/-sp_shards are mutually "
                                 "exclusive with -model_axis")
            # -data_axis > 1 composes: the mesh grows a leading "data"
            # axis and microbatch/batch rows shard over it.
            n_dp = max(1, self.train_cfg.data_axis)
            if self.train_cfg.pp_stages > 1:
                from e2e_asr_tpu.core import pipeline as pipeline_lib
                pp_mesh = pipeline_lib.make_stage_mesh(
                    self.train_cfg.pp_stages, n_expert=n_ep, n_data=n_dp)
            else:
                from e2e_asr_tpu.core import seq_parallel as sp_lib
                sp_mesh = sp_lib.make_seq_mesh(self.train_cfg.sp_shards,
                                               n_expert=n_ep, n_data=n_dp)
            use_mesh = False
            n_ep = 1                      # consumed by the combined mesh
        ep_mesh = None
        if n_ep > 1:
            import numpy as np
            from jax.sharding import Mesh
            ep_mesh = Mesh(np.array(jax.devices()[:n_ep]), ("expert",))
            use_mesh = False
        self.mesh = self._make_mesh() if use_mesh else None
        if self.train_cfg.fsdp and self.mesh is None:
            raise ValueError("-fsdp shards the TrainState over the (data, "
                             "model) mesh; it is mutually exclusive with "
                             "-pp_stages/-sp_shards/-ep_shards")
        freeze = tuple(f for f in self.train_cfg.freeze.split(",") if f)
        sp = None
        if self.train_cfg.speed_perturb:
            parts = [float(x) for x in self.train_cfg.speed_perturb.split(",")]
            if len(parts) != 2 or not (0 < parts[0] <= parts[1]):
                raise ValueError("-speed_perturb wants 'lo,hi' with "
                                 f"0 < lo <= hi, got {parts}")
            sp = (parts[0], parts[1])
        distill = None
        if self.train_cfg.distill_dir:
            from e2e_asr_tpu.train import distill as distill_lib
            t_cfg, t_params = distill_lib.load_teacher(
                self.train_cfg.distill_dir,
                vocab_size=self.model_cfg.decoders["char"].vocab_size)
            distill = (t_cfg, t_params, self.train_cfg.distill_weight,
                       self.train_cfg.distill_temp)
        asr_step, lm_step = step_lib.make_train_step(
            self.model_cfg, self.lm_cfg, compute_dtype=dtype,
            spec_augment=self.train_cfg.spec_augment,
            grad_accum=self.train_cfg.grad_accum,
            ema_decay=self.train_cfg.ema_decay,
            pp_mesh=pp_mesh, pp_micro=self.train_cfg.pp_micro,
            sp_mesh=sp_mesh, ep_mesh=ep_mesh, freeze=freeze,
            speed_perturb=sp, distill=distill,
            skip_nonfinite=self.train_cfg.skip_nonfinite)
        self.asr_step = jax.jit(asr_step, donate_argnums=0)
        self.lm_step = jax.jit(lm_step, donate_argnums=0)

    def _make_mesh(self):
        """("data", "model") mesh: the data axis divides every bucket's batch
        size (so each fixed-shape batch shards evenly, honoring
        cfg.data_axis); cfg.model_axis shards the vocab projections
        (core/sharding.py). Devices are ordered DCN-aware when running
        multi-slice (core/mesh.py:hybrid_device_grid)."""
        import math

        n_dev = jax.device_count()
        n_model = max(1, min(self.train_cfg.model_axis, n_dev))
        avail = max(n_dev // n_model, 1)
        if self.train_cfg.data_axis > 0:
            n_data = min(self.train_cfg.data_axis, avail)
        else:
            sizes = self.train_cfg.buck_batch_size[: self.train_cfg.num_buckets]
            n_data = math.gcd(math.gcd(*sizes) if sizes else avail, avail)
        n_data = max(n_data, 1)
        try:
            return mesh_lib.make_hybrid_mesh(n_data=n_data, n_model=n_model)
        except ValueError:
            # model axis doesn't divide the per-slice device count: fall back
            # to a flat mesh (the model axis then may cross DCN).
            return mesh_lib.make_mesh(n_data=n_data, n_model=n_model)

    # ------------------------------------------------------------------
    # Data
    # ------------------------------------------------------------------
    def get_data_sets(self, logging=True):
        tc = self.train_cfg
        tasks = tuple(self.model_cfg.tasks)
        buckets = []
        total = 0
        for bucket_id, batch_size in enumerate(
                tc.buck_batch_size[: tc.num_buckets]):
            files = sorted(glob.glob(
                path.join(tc.data_dir, f"train_1k.{bucket_id}.*")))
            if tc.subset_file:
                keep = set()
                try:
                    with open(tc.subset_file) as f:
                        keep = {line.strip() for line in f}
                except OSError:
                    keep = set()
                if keep:
                    files = [f for f in files if path.basename(f) in keep]
            total += len(files)
            if not files:
                continue
            # Multi-host: each process loads every k-th file (the host-side
            # data sharding of SURVEY §5; single-process -> 0/1).
            buckets.append(SpeechDataset(
                files, batch_size, tc.feat_length, is_training=True,
                tasks=tasks, seed=self._seed(),
                process_index=jax.process_index(),
                process_count=jax.process_count()))
        if logging:
            print(f"Total train files: {total}")
        dev_files = sorted(glob.glob(path.join(tc.data_dir, "dev*")))
        if logging:
            print(f"Total dev files: {len(dev_files)}")
        dev_set = (SpeechDataset(dev_files, tc.batch_size, tc.feat_length,
                                 is_training=False, tasks=("char",))
                   if dev_files else None)
        return buckets, dev_set

    def get_lm_dataset(self):
        files = sorted(glob.glob(path.join(self.train_cfg.lm_data_dir, "lm*")))
        if not files:
            return None
        return LMDataset(files, self.lm_cfg.lm_batch_size, seed=self._seed())

    def _seed(self) -> int:
        return int(time.time()) if self.train_cfg.chaos else 10

    def _place_batch(self, batch: dict):
        """Start the host->device transfer HERE (device_put is async): mapped
        inside the prefetch thread, the next batch's transfer overlaps the
        current step's compute instead of serializing in front of it.
        Returns (frame_count, device_batch)."""
        dev_b = _device_batch(batch, feats_dtype=self.compute_dtype)
        if self.mesh is not None:
            dev_b = mesh_lib.shard_batch(self.mesh, dev_b)
        else:
            dev_b = jax.device_put(dev_b)
        return int(np.sum(batch["logmel_len"])), dev_b

    def bench_throughput(self, n_steps: int = 30, warmup: int = 5,
                         device_resident: bool = False) -> float:
        """Driver-level frames/sec/chip: the real data path (host batch
        assembly, bf16 feature shipping, prefetch + overlapped device puts,
        jitted step) without checkpoint/eval cadence work — the honest
        end-to-end number next to bench.py's isolated-step metric.

        device_resident=True stages the epoch's bucketed batches on-device
        ONCE, then runs the same smallest-first per-step policy loop (bucket
        draining, rng threading, step dispatch) with zero per-step
        host->device traffic. Comparing the two modes against the isolated
        step metric separates what the driver itself costs (policy loop:
        ~nothing) from what the transfer path costs (on this development
        tunnel: everything; on a production host: overlapped, <1 step)."""
        from e2e_asr_tpu.core import sharding as sharding_lib
        from e2e_asr_tpu.data.speech import prefetch

        params = step_lib.init_params(jax.random.PRNGKey(0), self.model_cfg)
        state = step_lib.create_state(params, self.model_cfg, self.lm_cfg)
        if self.mesh is not None:
            state = sharding_lib.place_state(state, self.mesh,
                                             fsdp=self.train_cfg.fsdp)
        buckets, _ = self.get_data_sets(logging=False)

        def batches():
            while True:
                for b in buckets:
                    yield from map(self._place_batch, b.epoch())

        if device_resident:
            staged = [self._place_batch(x)
                      for b in buckets for x in b.epoch()]
            jax.block_until_ready([db for _, db in staged])

            def resident_batches():
                while True:
                    yield from staged

            it = resident_batches()
        else:
            it = prefetch(batches(), size=2)
        rng = jax.random.PRNGKey(0)
        frames = 0
        t0 = None
        metrics = None
        for i in range(warmup + n_steps):
            f, dev_b = next(it)
            rng, sub = jax.random.split(rng)
            state, metrics = self.asr_step(state, dev_b, sub)
            if i == warmup - 1:
                float(metrics["loss"])      # sync: exclude compile/warmup
                t0 = time.perf_counter()
            elif i >= warmup:
                frames += f
        float(metrics["loss"])
        return frames / (time.perf_counter() - t0)

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------
    def train(self) -> None:
        cfg, tc = self.model_cfg, self.train_cfg
        if not tc.chaos:
            random.seed(10)
            np.random.seed(10)
        else:
            random.seed(int(time.time()))

        os.makedirs(tc.train_dir, exist_ok=True)
        os.makedirs(tc.best_model_dir, exist_ok=True)

        params = step_lib.init_params(
            jax.random.PRNGKey(10 if not tc.chaos else int(time.time())), cfg)
        state = step_lib.create_state(params, cfg, self.lm_cfg,
                                      ema=tc.ema_decay > 0)

        restored = ckpt_lib.restore_latest(tc.train_dir, state)
        if restored is not None:
            state, meta = restored
            print(f"Resumed from step {int(state.global_step)}")
        else:
            if tc.pretrain_lm_path:
                state = state._replace(params=ckpt_lib.partial_restore(
                    state.params, tc.pretrain_lm_path))
            if tc.pretrain_phone_path:
                state = state._replace(params=ckpt_lib.partial_restore(
                    state.params, tc.pretrain_phone_path))
            if tc.pretrain_enc_path:
                # SSL-pretrained encoder (train/ssl.py): merge the encoder
                # subtree only — the SSL head/quantizer have no counterpart
                # here and the scope guard keeps any same-named non-encoder
                # leaf from matching.
                state = state._replace(params=ckpt_lib.partial_restore(
                    state.params, tc.pretrain_enc_path, scope="encoder"))
        if self.mesh is not None:
            # Replicates everywhere except the vocab-sized projections, which
            # shard over the model axis when model_axis > 1.
            from e2e_asr_tpu.core import sharding as sharding_lib
            state = sharding_lib.place_state(state, self.mesh,
                                             fsdp=self.train_cfg.fsdp)

        buckets, dev_set = self.get_data_sets()
        lm_data = self.get_lm_dataset() if tc.lm_prob > 0 else None
        lm_iter = None

        rev_vocab = self._load_rev_vocab()
        eval_cls = {"ctc": CTCEvaluator,
                    "transducer": TransducerEvaluator}.get(
            cfg.model_family, GreedyEvaluator)
        evaluator = (eval_cls(cfg, rev_vocab, tc.best_model_dir,
                              compute_dtype=self.compute_dtype)
                     if dev_set is not None and rev_vocab else None)

        mwer_stepper = None
        if tc.mwer:
            # MWER fine-tuning (train/mwer.py): the ASR step becomes
            # decode-n-best -> host word-error counts -> expected-WER grad
            # step. Same run dir / optimizer state: resumes a CE checkpoint.
            from e2e_asr_tpu.train import mwer as mwer_lib
            if not rev_vocab:
                raise ValueError("-mwer needs the char vocab for word-error "
                                 "counting")
            mwer_stepper = mwer_lib.MWERStepper(
                cfg, rev_vocab, nbest=tc.mwer_nbest, ce_weight=tc.mwer_ce,
                compute_dtype=self.compute_dtype,
                freeze=tuple(f for f in tc.freeze.split(",") if f))

        from e2e_asr_tpu.core.summary import NullWriter
        writer = (SummaryWriter(path.join(tc.train_dir, "summary"))
                  if self._primary else NullWriter())

        # best score + error history (train.py:221-253)
        asr_err_best = self._read_best()
        previous_errs = self._read_err_history()
        if previous_errs and not (step_lib.get_lr(state) > tc.lr_floor):
            if not check_progress(previous_errs, tc.early_stop_window):
                print("No improvement in 10 checkpoints")
                return

        print(f"\nBest ASR error rate - {asr_err_best:f}")
        # -async_ckpt: serialization/disk IO overlaps the next steps; the
        # cadence only pays the device->host fetch (checkpoint.py).
        self._ckpt_writer = (ckpt_lib.AsyncCheckpointer() if tc.async_ckpt
                             else None)
        rng = jax.random.PRNGKey(self._seed())
        epoch = int(state.epoch)
        current_step = 0
        # Loss accumulators live on device: fetching them per step would
        # force a host sync that serializes the step pipeline.
        loss_acc = jnp.zeros(())
        lm_loss_acc = jnp.zeros(())
        lm_steps = 0
        self._frames_acc = 0
        self._skip_acc = jnp.zeros(())   # -skip_nonfinite: skipped updates
        self._recoveries = 0             # -nan_recover restores so far
        ckpt_start = time.time()
        stop = False

        from e2e_asr_tpu.data.speech import prefetch

        while epoch <= tc.max_epochs and not stop:
            print(f"\nEpochs done: {epoch}")
            epc_start = time.time()
            # Smallest-utterance buckets drain first (train.py:294-299);
            # host batch assembly AND the host->device transfer overlap the
            # device compute: _place_batch (device_put, async) runs inside the
            # prefetch thread one batch ahead (the tf.data-thread analogue).
            bucket_iters = [prefetch(map(self._place_batch, b.epoch()), size=2)
                            for b in buckets]
            bucket_idx = 0
            while bucket_idx < len(bucket_iters) and not stop:
                task = "lm" if (tc.lm_prob > random.random()) else "asr"
                if task == "lm" and lm_data is not None:
                    if lm_iter is None:
                        lm_iter = iter(lm_data.epoch())
                    lm_batch = next(lm_iter, None)
                    if lm_batch is None:
                        lm_iter = iter(lm_data.epoch())  # reshuffle
                        state = state._replace(lm_epoch=state.lm_epoch + 1)
                        print(f"LM Epoch done !! (epoch {int(state.lm_epoch)})")
                        continue
                    rng, sub = jax.random.split(rng)
                    state, metrics = self.lm_step(
                        state, jnp.asarray(lm_batch["char"].T),
                        jnp.asarray(lm_batch["char_len"]), sub,
                        jnp.asarray(lm_batch["valid"]))
                    lm_loss_acc = lm_loss_acc + metrics["lm_loss"]
                    lm_steps += 1
                    if lm_steps % tc.steps_per_checkpoint == 0:
                        mean_l = float(lm_loss_acc) / tc.steps_per_checkpoint
                        ppl = math.exp(mean_l) if mean_l < 300 else float("inf")
                        print(f"LM steps: {int(state.lm_global_step)}, "
                              f"Perplexity: {ppl:f}")
                        writer.scalar("LM Perplexity", ppl,
                                      int(state.global_step))
                        lm_loss_acc = jnp.zeros(())
                    continue

                item = next(bucket_iters[bucket_idx], None)
                if item is None:
                    bucket_idx += 1
                    continue
                batch_frames, dev_b = item
                rng, sub = jax.random.split(rng)
                if tc.profile_dir and current_step == 10:
                    jax.profiler.start_trace(tc.profile_dir)
                if mwer_stepper is not None:
                    state, metrics = mwer_stepper(state, dev_b, sub)
                else:
                    state, metrics = self.asr_step(state, dev_b, sub)
                current_step += 1
                if tc.profile_dir and current_step == 15:
                    float(metrics["loss"])  # sync before stopping the trace
                    jax.profiler.stop_trace()
                self._frames_acc += batch_frames
                # char-CE for the perplexity summary (train.py:315-319);
                # the CTC family reports its CTC loss there instead.
                contrib = metrics.get("loss_char", metrics["loss"])
                if tc.skip_nonfinite and "skipped" in metrics:
                    # A skipped (non-finite) step changed nothing; keep its
                    # NaN out of the cadence perplexity too.
                    self._skip_acc = self._skip_acc + metrics["skipped"]
                    contrib = jnp.where(metrics["skipped"] > 0, 0.0, contrib)
                loss_acc = loss_acc + contrib

                if current_step % tc.steps_per_checkpoint == 0:
                    skips = (int(self._skip_acc) if tc.skip_nonfinite else 0)
                    if skips:
                        print(f"Skipped {skips} non-finite updates in the "
                              f"last {tc.steps_per_checkpoint} steps")
                        writer.scalar("Skipped updates", skips,
                                      int(state.global_step))
                    mean_loss = (float(loss_acc)
                                 / max(tc.steps_per_checkpoint - skips, 1))
                    state, asr_err_best, stop = self._checkpoint_cadence(
                        state, writer, evaluator, dev_set, mean_loss,
                        previous_errs, asr_err_best, ckpt_start)
                    loss_acc = jnp.zeros(())
                    self._skip_acc = jnp.zeros(())
                    ckpt_start = time.time()

            print(f"Total steps: {int(state.global_step)}")
            state = state._replace(epoch=state.epoch + 1)
            epoch += 1
            print(f"\nEPOCH TIME: {time.time() - epc_start:.1f}s\n")
            print("Reshuffling ASR training data!")
            # SpeechDataset reshuffles per epoch() call; nothing to rebuild.

        if self._ckpt_writer is not None:
            self._ckpt_writer.close()      # drain pending writes, surface
            self._ckpt_writer = None       # any background failure
        writer.close()

    # ------------------------------------------------------------------
    def _checkpoint_cadence(self, state, writer, evaluator, dev_set,
                            loss_acc, previous_errs, asr_err_best,
                            ckpt_start):
        tc = self.train_cfg
        stop = False
        if not math.isfinite(loss_acc):
            # The run has diverged. NEVER checkpoint or dev-decode a
            # non-finite state; recover from the last good checkpoint with
            # a halved LR (-nan_recover N times) or stop.
            self._frames_acc = 0
            state, stop = self._recover_nonfinite(state)
            return state, asr_err_best, stop
        gstep = int(state.global_step)
        lr = step_lib.get_lr(state)
        ppl = math.exp(loss_acc) if loss_acc < 300 else float("inf")
        elapsed = time.time() - ckpt_start
        frames_per_sec = self._frames_acc / max(elapsed, 1e-9)
        self._frames_acc = 0
        print(f"Step {gstep} Learning rate {lr:.4f} Checkpoint time "
              f"{elapsed:.2f} Perplexity {ppl:.2f} "
              f"Frames/sec {frames_per_sec:,.0f}")
        writer.scalar("ASR Perplexity", ppl, gstep)
        writer.scalar("Learning rate", lr, gstep)
        writer.scalar("Frames per sec", frames_per_sec, gstep)

        if evaluator is not None and dev_set is not None:
            t0 = time.time()
            # With -ema_decay, checkpoint selection scores the EMA shadow
            # weights — the weights -eval_ema decodes (the raw params keep
            # training; both live in the checkpoint).
            eval_params = (state.ema_params if tc.ema_decay > 0
                           else state.params)
            # LoRA runs decode the merged view (adapters folded in).
            eval_params = step_lib.lora_merged(eval_params, self.model_cfg)
            asr_err_cur = evaluator(eval_params, dev_set.epoch(),
                                    write_files=self._primary)
            print(f"ASR error: {asr_err_cur:.4f}, Decoding time: "
                  f"{time.time() - t0:.1f}s")
            if self._primary:
                with open(path.join(tc.train_dir, "asr_err.txt"), "a") as f:
                    f.write(str(asr_err_cur) + "\n")
            writer.scalar("ASR Error", asr_err_cur, gstep)

            if gstep >= tc.min_steps:
                if (len(previous_errs) > 3
                        and asr_err_cur >= max(previous_errs[-3:])):
                    if lr > tc.lr_floor:
                        state = step_lib.set_lr(
                            state, lr * self.model_cfg.learning_rate_decay_factor)
                        print("Learning rate decreased !!")
            previous_errs.append(asr_err_cur)
            if not (step_lib.get_lr(state) > tc.lr_floor):
                if not check_progress(previous_errs, tc.early_stop_window):
                    print("No improvement in 10 checkpoints")
                    stop = True

            if asr_err_best > asr_err_cur:
                asr_err_best = asr_err_cur
                print(f"Best ASR Error rate: {asr_err_best:.4f}")
                print("Saving the best model !!")
                if self._primary:
                    with open(path.join(tc.train_dir, "best.txt"), "w") as f:
                        f.write(str(asr_err_best))
                self._save(tc.best_model_dir, "asr.ckpt", gstep, state,
                           meta={"best": asr_err_best}, max_to_keep=2)

        self._save(tc.train_dir, "asr.ckpt", gstep, state,
                   meta={"best": asr_err_best})
        return state, asr_err_best, stop

    def _recover_nonfinite(self, state):
        """Divergence recovery (-nan_recover): restore the latest checkpoint
        (the last state known finite) and halve the learning rate — the
        standard answer to a mid-training blow-up — up to nan_recover
        times. Returns (state, stop). With no recovery budget or no
        checkpoint to fall back to, stops the run: training on NaN only
        burns chips. Multi-host safe: every process restores the same file
        and makes the same decision."""
        tc = self.train_cfg
        print("Non-finite training loss detected !!")
        self._recoveries = getattr(self, "_recoveries", 0) + 1
        if self._recoveries > tc.nan_recover:
            print(f"Stopping: recovery budget exhausted "
                  f"({tc.nan_recover} allowed)")
            return state, True
        if getattr(self, "_ckpt_writer", None) is not None:
            self._ckpt_writer.flush()    # the restore target must be on disk
        restored = ckpt_lib.restore_latest(tc.train_dir, state)
        if restored is None:
            print("Stopping: no checkpoint to recover from")
            return state, True
        state, _ = restored
        # The checkpoint carries the LR it was saved with; decay by the
        # ATTEMPT count so retries from the same checkpoint don't just
        # re-run the exact trajectory that diverged.
        new_lr = (step_lib.get_lr(state)
                  * self.model_cfg.learning_rate_decay_factor
                  ** self._recoveries)
        state = step_lib.set_lr(state, new_lr)
        if self.mesh is not None:
            from e2e_asr_tpu.core import sharding as sharding_lib
            state = sharding_lib.place_state(state, self.mesh,
                                             fsdp=self.train_cfg.fsdp)
        print(f"Recovered from step {int(state.global_step)} "
              f"(attempt {self._recoveries}/{tc.nan_recover}); "
              f"LR decayed to {new_lr:.6f}")
        return state, False

    def _save(self, ckpt_dir, prefix, gstep, state, *, meta, max_to_keep=None):
        writer = getattr(self, "_ckpt_writer", None)
        if writer is not None:
            writer.save(ckpt_dir, prefix, gstep, state, meta=meta,
                        max_to_keep=max_to_keep, primary=self._primary)
        else:
            ckpt_lib.save(ckpt_dir, prefix, gstep, state, meta=meta,
                          max_to_keep=max_to_keep, primary=self._primary)

    def _read_best(self) -> float:
        score_file = path.join(self.train_cfg.train_dir, "best.txt")
        if path.isfile(score_file):
            try:
                return float(open(score_file).readline().strip())
            except ValueError:
                pass
        return 1.0

    def _read_err_history(self) -> list[float]:
        errs = []
        try:
            with open(path.join(self.train_cfg.train_dir, "asr_err.txt")) as f:
                errs = [float(line.strip()) for line in f]
            print(f"Previous perf. log of {len(errs)} checkpoints loaded")
        except (OSError, ValueError):
            pass
        return errs

    def _load_rev_vocab(self):
        vocab_path = path.join(self.train_cfg.vocab_dir, "char.vocab")
        if not path.isfile(vocab_path):
            return None
        _, rev = text.initialize_vocabulary(vocab_path)
        return rev
