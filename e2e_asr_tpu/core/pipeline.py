"""Pipeline parallelism (pp) for the transformer encoder family.

Extension (no reference counterpart — SURVEY.md §2.2: the reference has no
parallelism of any kind). GPipe-style microbatch wavefront over a "stage"
mesh axis, built the TPU way:

- The homogeneous `block_i` stack (models/transformer_encoder.py) is
  stacked on a leading [L] axis and **sharded over the stage axis**, so
  each device holds L/S contiguous blocks — weights never move.
- The batch is split into M microbatches that flow device→device via
  `lax.ppermute` (ICI neighbor hops, no all-to-all): one `lax.scan` over
  M+S-1 ticks, every tick = each stage applies its blocks to its current
  microbatch, then hands the activation to the next stage. Bubble overhead
  is the standard (S-1)/(M+S-1).
- Everything is a single SPMD program under `shard_map` — same code on
  every device, compiler-visible collectives, static shapes throughout.

Numerics: block math reuses the serial encoder's `_mhsa`/`_conv_module`/
`_layer_norm`/`dense` with identical op order, so inference and no-dropout
training are EXACTLY equal to the serial encoder (pinned by
tests/test_pipeline.py, forward and grads). With dropout, masks are drawn
per (block, microbatch) — `fold_in(fold_in(rng, 3*gi+o), m)` — the same
rng discipline as `-grad_accum`'s per-micro noise: statistically
equivalent to serial, not bit-equal (the mask shape differs).

Scope: all decoder taps must sit at the final block (`num_layers` values
all == max depth); intermediate-depth taps would need per-stage output
collection (raise for now). The replicated [M,Bm,T,D] microbatch buffer is
the correctness-first layout; shard it over stages if activations ever
dominate HBM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.8 top-level; older releases keep it in experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from e2e_asr_tpu.config import EncoderConfig, Seq2SeqConfig
from e2e_asr_tpu.core.layers import dense
from e2e_asr_tpu.models import transformer_encoder as te

Array = jax.Array


def _pvary(x, axis):
    """Type x as varying over `axis` (pcast on new jax, pvary on older)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis, to="varying")
    return jax.lax.pvary(x, axis)


def make_stage_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(jax.devices() if devices is None else devices)
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), ("stage",))


def stack_blocks(params: dict, depth: int):
    """block_1..block_L dicts -> one pytree with leading [L] leaf axis."""
    blocks = [params[f"block_{i}"] for i in range(1, depth + 1)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


# The block math is te.block_fwd — ONE definition shared with the serial
# encoder, so pipeline numerics cannot drift from what the tests pin.


def pipeline_blocks(params: dict, cfg: EncoderConfig, h: Array, lens: Array,
                    depth: int, *, mesh: Mesh, n_micro: int,
                    train: bool = False, rng: Array | None = None,
                    compute_dtype=None) -> Array:
    """Run `depth` transformer blocks over h [B,T,D] as an S-stage pipeline
    of M microbatches. Returns the final-block output [B,T,D] (pre-ln_out,
    exactly where the serial block loop ends)."""
    S = mesh.shape["stage"]
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by {S} stages")
    B = h.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")
    Ls, Bm = depth // S, B // n_micro
    M = n_micro
    T, D = h.shape[1], h.shape[2]
    keep = cfg.out_prob if train else 1.0
    drop_rng = rng if rng is not None else jax.random.PRNGKey(0)

    stacked = stack_blocks(params, depth)
    h_micro = h.reshape(M, Bm, T, D)
    lens_micro = lens.reshape(M, Bm)

    def staged(blocks, h_micro, lens_micro):
        sid = jax.lax.axis_index("stage")

        def local_apply(h, m_idx):
            ln = jax.lax.dynamic_index_in_dim(lens_micro, m_idx, 0,
                                              keepdims=False)
            valid = jnp.arange(T)[None, :] < ln[:, None]
            bias = jnp.where(valid, 0.0, -1e30)[:, None, None, :]
            vmask = valid.astype(h.dtype)[:, :, None]

            def body(h, xs):
                blk, j = xs
                gi = sid * Ls + j + 1          # global 1-based block index
                keys = tuple(
                    jax.random.fold_in(
                        jax.random.fold_in(drop_rng, 3 * gi + o), m_idx)
                    for o in (0, 1, 2))
                return te.block_fwd(blk, h, bias, vmask, keys, keep, cfg,
                                    compute_dtype=compute_dtype,
                                    train=train), None

            h, _ = jax.lax.scan(body, h, (blocks, jnp.arange(Ls)))
            return h

        def tick(carry, t):
            buf, out = carry
            m_in = t - sid                     # microbatch at this stage now
            m_c = jnp.clip(m_in, 0, M - 1)
            inject = jax.lax.dynamic_index_in_dim(h_micro, m_c, 0,
                                                  keepdims=False)
            h_in = jnp.where(sid == 0, inject, buf)
            y = local_apply(h_in, m_c)
            is_out = (sid == S - 1) & (m_in >= 0) & (m_in < M)
            out = jnp.where(is_out,
                            jax.lax.dynamic_update_index_in_dim(out, y, m_c,
                                                                0),
                            out)
            nxt = jax.lax.ppermute(y, "stage",
                                   [(i, i + 1) for i in range(S - 1)])
            return (nxt, out), None

        # The carry is device-varying (ppermute output); the zeros must be
        # typed as such under shard_map's varying-axis checking.
        buf0 = _pvary(jnp.zeros_like(h_micro[0]), "stage")
        out0 = _pvary(jnp.zeros_like(h_micro), "stage")
        (_, out), _ = jax.lax.scan(tick, (buf0, out0),
                                   jnp.arange(M + S - 1))
        # Only the last stage holds real outputs; sum-gather them.
        out = jnp.where(sid == S - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "stage")

    out = shard_map(staged, mesh=mesh,
                    in_specs=(P("stage"), P(), P()),
                    out_specs=P())(stacked, h_micro, lens_micro)
    return out.reshape(B, T, D)


def encode_pipeline(params: dict, cfg: Seq2SeqConfig, feats: Array,
                    feat_lens: Array, *, mesh: Mesh, n_micro: int,
                    train: bool = False, rng: Array | None = None,
                    compute_dtype=None):
    """seq2seq.encode with the transformer block stack pipelined: same
    (attention_states, time_major_states, seq_lens) contract."""
    from e2e_asr_tpu.models.encoder import pyramid_reduce
    from e2e_asr_tpu.models.seq2seq import stack_frames

    enc_cfg = cfg.encoder
    if enc_cfg.encoder_type != "transformer":
        raise ValueError("pipeline parallelism targets the transformer "
                         "family (homogeneous block stack); the bidirectional "
                         "pyramid has cross-layer sequential dependencies "
                         "both time directions")
    depth = max(cfg.num_layers.values())
    if set(cfg.num_layers.values()) != {depth}:
        raise NotImplementedError("all decoder taps must sit at the final "
                                  "block under pipeline parallelism")
    if enc_cfg.moe_experts > 0:
        raise NotImplementedError("MoE blocks under pipeline parallelism: "
                                  "use -ep_shards (expert parallelism) "
                                  "instead")
    eparams = params["encoder"]

    x = stack_frames(feats, enc_cfg.stack_cons)
    if enc_cfg.subsample > 1:
        x, lens = pyramid_reduce(x, feat_lens, enc_cfg.subsample)
    else:
        lens = feat_lens.astype(jnp.int32)
    T = x.shape[1]
    D = te.d_model(enc_cfg)
    h = dense(eparams["input_proj"], x, compute_dtype=compute_dtype)
    h = h + jnp.asarray(te._sinusoidal(T, D))

    h = pipeline_blocks(eparams, enc_cfg, h, lens, depth, mesh=mesh,
                        n_micro=n_micro, train=train, rng=rng,
                        compute_dtype=compute_dtype)

    valid = jnp.arange(T)[None, :] < lens[:, None]
    vmask = valid.astype(h.dtype)[:, :, None]
    out = te._layer_norm(eparams["ln_out"], h) * vmask
    return ({depth: out}, {depth: jnp.transpose(out, (1, 0, 2))},
            {depth: lens})
