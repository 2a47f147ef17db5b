"""Train a standalone transformer LM on the corpus's LM shards — the neural
complement of tools/train_ngram.py for `-lm_path` shallow fusion and
`-lm_rescore` second-pass rescoring on every model family.

The reference's only LM is the weight-tied RNN trained inside the ASR run
(/root/reference/lm_model.py, train.py:268-291); external-LM fusion there
means pointing at ANOTHER ASR run's checkpoint (main.py:220-223). This tool
removes that coupling: it trains a text-only causal transformer LM
(models/transformer_lm.py) directly on the LM TFRecord shards
prepare_corpus emits, and writes a self-describing artifact any decode
surface accepts via `-lm_path` (eval CLI, beam grid, HTTP server, serving
engine) — the loader discriminates artifact kinds by content
(eval/lm_loader.py).

Training is TPU-shaped: fixed [B, cap] batches (data/lm.py pads the tail
with valid=0 rows), one parallel causal pass per step (no T-step scan), the
framework's Adam-behind-clip optimizer (train/step.make_optimizer), bf16
compute optional.

Artifact: `<out>` (.npz) of "/"-joined pytree leaves; every architecture
dimension is shape-borne, so loading needs no config sidecar.
"""
from __future__ import annotations

import argparse
import glob
import time

import jax
import jax.numpy as jnp
import numpy as np


def _dataset(pattern: str, batch: int, cap: int, seed: int = 10):
    from e2e_asr_tpu.data.lm import LMDataset
    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no LM shards match {pattern}")
    ds = LMDataset(files, batch, seed=seed, cap=cap)
    if not len(ds):
        raise ValueError(f"no sequences in {pattern}")
    return ds


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(
        description="train a standalone transformer LM from LM shards")
    p.add_argument("-lm_glob", required=True,
                   help="LM TFRecord shards, e.g. data/tfrecords/lm/lm.*")
    p.add_argument("-vocab", required=True, help="char.vocab path")
    p.add_argument("-out", required=True, help="output .npz artifact")
    p.add_argument("-dev_glob", default="",
                   help="optional dev shards: best-dev artifact selection")
    p.add_argument("-dim", default=256, type=int)
    p.add_argument("-blocks", default=4, type=int)
    p.add_argument("-heads", default=4, type=int)
    p.add_argument("-ffn_mult", default=4, type=int)
    p.add_argument("-max_len", default=512, type=int,
                   help="context horizon (decodes may take at most this "
                        "many fusion steps)")
    p.add_argument("-batch", default=64, type=int)
    p.add_argument("-lr", default=1e-3, type=float)
    p.add_argument("-max_gradient_norm", default=5.0, type=float)
    p.add_argument("-keep_prob", default=1.0, type=float,
                   help="residual-branch dropout keep probability")
    p.add_argument("-epochs", default=10, type=int)
    p.add_argument("-max_steps", default=0, type=int,
                   help="stop after this many updates (0 = epochs only)")
    p.add_argument("-seed", default=0, type=int)
    p.add_argument("-bf16", default=False, action="store_true",
                   help="bf16 compute (params stay f32)")
    p.add_argument("-log_every", default=100, type=int)
    args = p.parse_args(argv)

    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.models import transformer_lm
    from e2e_asr_tpu.train.step import make_optimizer

    _, rev_vocab = text.initialize_vocabulary(args.vocab)
    cfg = transformer_lm.TLMConfig(
        vocab_size=len(rev_vocab), d_model=args.dim, blocks=args.blocks,
        heads=args.heads, ffn_mult=args.ffn_mult, max_len=args.max_len,
        keep_prob=args.keep_prob)
    # Typed keys pin the impl: the Trainer sets the GLOBAL
    # jax_default_prng_impl (train/loop.py rng_impl) — with plain PRNGKey
    # this tool's random stream (init + dropout) would depend on whether a
    # Trainer ran earlier in the process (observed as order-dependent test
    # convergence).
    params = transformer_lm.init(
        jax.random.key(args.seed, impl="threefry2x32"), cfg)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    print(f"Transformer LM: {cfg.blocks}x{cfg.d_model} heads={cfg.heads} "
          f"horizon={cfg.max_len} vocab={cfg.vocab_size} "
          f"({n_params / 1e6:.2f}M params)")

    # Sequences hold [<go>, tokens..., <eos>]; the model consumes cap-1
    # positions, which must fit the trained horizon.
    cap = args.max_len + 1
    train_ds = _dataset(args.lm_glob, args.batch, cap, seed=args.seed + 10)
    dev_ds = (_dataset(args.dev_glob, args.batch, cap)
              if args.dev_glob else None)
    print(f"Train sequences: {len(train_ds)}"
          + (f", dev: {len(dev_ds)}" if dev_ds else ""))

    import optax

    cd = jnp.bfloat16 if args.bf16 else None
    opt = make_optimizer(args.lr, args.max_gradient_norm)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            return transformer_lm.loss(
                p, batch["char"].T, batch["char_len"], train=True, rng=rng,
                keep_prob=args.keep_prob, valid=batch["valid"],
                compute_dtype=cd)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_loss(params, batch):
        return transformer_lm.loss(
            params, batch["char"].T, batch["char_len"], train=False,
            valid=batch["valid"], compute_dtype=cd)

    def dev_eval(params) -> float:
        tot, n = 0.0, 0
        for b in dev_ds.epoch():
            w = float(b["valid"].sum())
            tot += float(eval_loss(params, b)) * w
            n += int(w)
        return tot / max(n, 1)

    key = jax.random.key(args.seed + 1, impl="threefry2x32")
    step = 0
    best_dev = float("inf")
    saved = False
    t0 = time.time()
    for epoch in range(args.epochs):
        for batch in train_ds.epoch():
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(params, opt_state,
                                                 batch, sub)
            step += 1
            if step % args.log_every == 0 or step == 1:
                lv = float(loss)
                print(f"step {step} (epoch {epoch}): loss {lv:.4f} "
                      f"ppl {np.exp(min(lv, 30.0)):.2f} "
                      f"[{time.time() - t0:.1f}s]")
            if args.max_steps and step >= args.max_steps:
                break
        if dev_ds is not None:
            dl = dev_eval(params)
            print(f"epoch {epoch}: dev loss {dl:.4f} "
                  f"ppl {np.exp(min(dl, 30.0)):.2f}")
            if dl < best_dev:
                best_dev = dl
                transformer_lm.save_artifact(args.out, params)
                saved = True
                print(f"  new best — wrote {args.out}")
        if args.max_steps and step >= args.max_steps:
            break

    if not saved:
        transformer_lm.save_artifact(args.out, params)
        print(f"wrote {args.out}")
    final = {"steps": step, "out": args.out,
             "train_loss": float(loss),
             "dev_loss": (best_dev if dev_ds is not None else None)}
    return final


if __name__ == "__main__":
    main()
