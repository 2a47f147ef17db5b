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

Intermediate-depth decoder taps (the reference's multitask layout) are
collected from their owning stages, and MoE blocks compose: routing
capacity binds per microbatch, the load-balance aux is pooled from raw
routing statistics so it equals the serial value exactly, and expert
parallelism rides a 2-D ("stage", "expert") mesh
(`make_stage_mesh(n_expert=...)`) — each stage column holds its blocks'
expert shards, with one psum over "expert" per MoE FFN. The replicated
[M,Bm,T,D] microbatch buffer is the correctness-first layout; shard it
over stages if activations ever dominate HBM.
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


def _pvary(x, axes):
    """Type x as varying over `axes` (pcast on new jax, pvary on older),
    skipping axes the value already varies over (e.g. zeros_like of a
    "data"-sharded input under a dp-composed mesh — pcast rejects
    re-casting an already-varying axis)."""
    if isinstance(axes, str):
        axes = (axes,)
    try:
        vma = jax.typeof(x).vma
    except Exception:
        vma = frozenset()
    need = tuple(a for a in axes if a not in vma)
    if not need:
        return x
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, need, to="varying")
    return jax.lax.pvary(x, need)


def composed_mesh(axis_name: str, n: int, devices=None, n_expert: int = 1,
                  n_data: int = 1) -> Mesh:
    """(axis_name,) mesh, optionally composed with expert parallelism
    (n_expert > 1 — each row spans the devices holding its MoE expert
    shards) and/or data parallelism (n_data > 1 — batch rows split over a
    leading "data" axis). Up to 3-D: ("data", axis_name, "expert"). The
    single factory behind make_stage_mesh and make_seq_mesh."""
    devices = list(jax.devices() if devices is None else devices)
    names, dims = [], []
    if n_data > 1:
        names.append("data")
        dims.append(n_data)
    names.append(axis_name)
    dims.append(n)
    if n_expert > 1:
        names.append("expert")
        dims.append(n_expert)
    need = int(np.prod(dims))
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(dims), tuple(names))


def make_stage_mesh(n_stages: int, devices=None, n_expert: int = 1,
                    n_data: int = 1) -> Mesh:
    """("stage",) mesh, or its dp/ep-composed variants — every
    (data, stage[, expert]) coordinate runs the same microbatch wavefront
    on its slice of the batch."""
    return composed_mesh("stage", n_stages, devices=devices,
                         n_expert=n_expert, n_data=n_data)


def stack_blocks(params: dict, depth: int):
    """block_1..block_L dicts -> one pytree with leading [L] leaf axis."""
    blocks = [params[f"block_{i}"] for i in range(1, depth + 1)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


# The block math is te.block_fwd — ONE definition shared with the serial
# encoder, so pipeline numerics cannot drift from what the tests pin.


_EP_LEAVES = ("w1", "b1", "w2", "b2")   # expert-dim MoE leaves (router and
                                        # everything else stay replicated
                                        # over the expert axis)


def moe_leaf_specs(tree, lead: tuple, expert_axis: str | None):
    """Per-leaf in_specs for a block pytree: every leaf gets P(*lead)
    (e.g. the stacked [L] axis over "stage"; empty for unstacked blocks);
    when `expert_axis` is set, the MoE expert-dim leaves (_EP_LEAVES)
    additionally shard their expert dimension over it. Shared by the
    pipeline and sequence-parallel shard_map callers."""
    def spec(path, leaf):
        if expert_axis is not None:
            keys = [str(getattr(k, "key", k)) for k in path]
            if "moe" in keys and keys[-1] in _EP_LEAVES:
                return P(*lead, expert_axis)
        return P(*lead)
    return jax.tree_util.tree_map_with_path(spec, tree)


def pipeline_blocks(params: dict, cfg: EncoderConfig, h: Array, lens: Array,
                    depth: int, *, mesh: Mesh, n_micro: int,
                    train: bool = False, rng: Array | None = None,
                    compute_dtype=None, taps: tuple = (),
                    collect_aux: bool = False):
    """Run `depth` transformer blocks over h [B,T,D] as an S-stage pipeline
    of M microbatches. Returns (h_final, {d: h_d for d in taps}, aux):
    h_final is the final-block output [B,T,D] (pre-ln_out, exactly where
    the serial block loop ends), `taps` are non-final depths whose block
    outputs are collected from their owning stages, and aux is the pooled
    MoE load-balance loss (None unless collect_aux).

    MoE notes: routing capacity binds per MICROBATCH (C = ceil(f*Bm*T/E) —
    the -grad_accum semantics; ample capacity makes it identical to the
    serial whole-batch run), while the aux loss pools raw routing counts
    across all microbatches and stages, so it equals the serial value
    EXACTLY regardless of the microbatch split."""
    S = mesh.shape["stage"]
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by {S} stages")
    ep = "expert" in mesh.axis_names
    if ep and cfg.moe_experts % mesh.shape["expert"]:
        raise ValueError(f"{cfg.moe_experts} experts not divisible by the "
                         f"{mesh.shape['expert']}-way expert axis")
    dp = "data" in mesh.axis_names
    B = h.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")
    Ls, Bm = depth // S, B // n_micro
    if dp and Bm % mesh.shape["data"]:
        raise ValueError(f"microbatch rows {Bm} not divisible by the "
                         f"{mesh.shape['data']}-way data axis")
    vary = ("stage", "data") if dp else "stage"
    M = n_micro
    T, D = h.shape[1], h.shape[2]
    keep = cfg.out_prob if train else 1.0
    drop_rng = rng if rng is not None else jax.random.PRNGKey(0)
    want_aux = collect_aux and train and cfg.moe_experts > 0
    taps = tuple(sorted(d for d in set(taps) if d != depth))
    if taps and (min(taps) < 1 or max(taps) > depth):
        raise ValueError(f"tap depths {taps} outside 1..{depth}")

    stacked = stack_blocks(params, depth)
    h_micro = h.reshape(M, Bm, T, D)
    lens_micro = lens.reshape(M, Bm)

    def staged(blocks, h_micro, lens_micro):
        sid = jax.lax.axis_index("stage")
        # Per-data-shard dropout streams (matching what a smaller physical
        # batch would draw; without this, shards would reuse one mask).
        local_rng = (jax.random.fold_in(drop_rng, jax.lax.axis_index("data"))
                     if dp else drop_rng)

        def local_apply(h, m_idx):
            ln = jax.lax.dynamic_index_in_dim(lens_micro, m_idx, 0,
                                              keepdims=False)
            valid = jnp.arange(T)[None, :] < ln[:, None]
            bias = jnp.where(valid, 0.0, -1e30)[:, None, None, :]
            if cfg.attn_chunk > 0:
                # Chunk-causal attention (static mask — same add as the
                # serial transformer_encoder.apply).
                bias = bias + jnp.asarray(
                    te.chunk_bias(T, cfg.attn_chunk, cfg.attn_left))
            vmask = valid.astype(h.dtype)[:, :, None]

            def body(h, xs):
                blk, j = xs
                gi = sid * Ls + j + 1          # global 1-based block index
                keys = tuple(
                    jax.random.fold_in(
                        jax.random.fold_in(local_rng, 3 * gi + o), m_idx)
                    for o in (0, 1, 2))
                sink = [] if want_aux else None
                y = te.block_fwd(blk, h, bias, vmask, keys, keep, cfg,
                                 compute_dtype=compute_dtype, train=train,
                                 aux_sink=sink, aux_stats=True,
                                 ep_axis="expert" if ep else None)
                return y, (sink[0] if want_aux else None,
                           y if taps else None)

            h, (stats, block_outs) = jax.lax.scan(
                body, h, (blocks, jnp.arange(Ls)))
            return h, stats, block_outs     # stats: ([Ls,E], [Ls,E])

        def tick(carry, t):
            buf, out, acc, tap_bufs = carry
            m_in = t - sid                     # microbatch at this stage now
            m_c = jnp.clip(m_in, 0, M - 1)
            inject = jax.lax.dynamic_index_in_dim(h_micro, m_c, 0,
                                                  keepdims=False)
            h_in = jnp.where(sid == 0, inject, buf)
            y, stats, block_outs = local_apply(h_in, m_c)
            is_real = (m_in >= 0) & (m_in < M)
            is_out = (sid == S - 1) & is_real
            out = jnp.where(is_out,
                            jax.lax.dynamic_update_index_in_dim(out, y, m_c,
                                                                0),
                            out)
            if want_aux:
                # Bubble ticks compute clipped garbage; exclude their stats.
                w = is_real.astype(jnp.float32)
                acc = (acc[0] + w * stats[0], acc[1] + w * stats[1])
            if taps:
                upd = []
                for d, tb in zip(taps, tap_bufs):
                    # Block d lives at a STATIC local index on one stage.
                    stage_d, j_d = (d - 1) // Ls, (d - 1) % Ls
                    hit = (sid == stage_d) & is_real
                    upd.append(jnp.where(
                        hit,
                        jax.lax.dynamic_update_index_in_dim(
                            tb, block_outs[j_d], m_c, 0),
                        tb))
                tap_bufs = tuple(upd)
            nxt = jax.lax.ppermute(y, "stage",
                                   [(i, i + 1) for i in range(S - 1)])
            return (nxt, out, acc, tap_bufs), None

        # The carry is device-varying (ppermute output); the zeros must be
        # typed as such under shard_map's varying-axis checking (over
        # "data" too when the batch rows are sharded).
        buf0 = _pvary(jnp.zeros_like(h_micro[0]), vary)
        out0 = _pvary(jnp.zeros_like(h_micro), vary)
        acc0 = ((_pvary(jnp.zeros((Ls, cfg.moe_experts)), vary),
                 _pvary(jnp.zeros((Ls, cfg.moe_experts)), vary))
                if want_aux else None)
        taps0 = tuple(_pvary(jnp.zeros_like(h_micro), vary)
                      for _ in taps)
        (_, out, acc, tap_bufs), _ = jax.lax.scan(
            tick, (buf0, out0, acc0, taps0), jnp.arange(M + S - 1))
        # Only the last stage holds real outputs; sum-gather them.
        out = jnp.where(sid == S - 1, out, jnp.zeros_like(out))
        res = [jax.lax.psum(out, "stage")]
        if taps:
            gathered = []
            for d, tb in zip(taps, tap_bufs):
                stage_d = (d - 1) // Ls
                tb = jnp.where(sid == stage_d, tb, jnp.zeros_like(tb))
                gathered.append(jax.lax.psum(tb, "stage"))
            res.append(tuple(gathered))
        if want_aux:
            # Each stage pooled its own blocks' stats over ALL microbatches;
            # pool over the data shards too (stats are sums over tokens, so
            # this recovers whole-batch routing counts), THEN form the aux
            # (it is nonlinear in the stats) and sum across stages.
            if dp:
                acc = (jax.lax.psum(acc[0], "data"),
                       jax.lax.psum(acc[1], "data"))
            aux = te.moe_aux_from_stats(acc[0], acc[1], float(M * Bm * T))
            res.append(jax.lax.psum(aux, "stage"))
        return tuple(res)

    io_spec = P(None, "data") if dp else P()
    out_specs = [io_spec]
    if taps:
        out_specs.append(tuple(io_spec for _ in taps))
    if want_aux:
        out_specs.append(P())
    res = shard_map(staged, mesh=mesh,
                    in_specs=(moe_leaf_specs(
                        stacked, ("stage",), "expert" if ep else None),
                        io_spec, io_spec),
                    out_specs=tuple(out_specs))(stacked, h_micro, lens_micro)
    res = list(res)
    out = res.pop(0).reshape(B, T, D)
    tap_outs = {}
    if taps:
        tap_outs = {d: tb.reshape(B, T, D)
                    for d, tb in zip(taps, res.pop(0))}
    aux = res.pop(0) if want_aux else None
    return out, tap_outs, aux


def encode_pipeline(params: dict, cfg: Seq2SeqConfig, feats: Array,
                    feat_lens: Array, *, mesh: Mesh, n_micro: int,
                    train: bool = False, rng: Array | None = None,
                    compute_dtype=None, aux_sink: list | None = None,
                    ep_mesh=None):
    """seq2seq.encode with the transformer block stack pipelined: same
    (attention_states, time_major_states, seq_lens) contract, including
    intermediate-depth decoder taps (collected from their owning stages)
    and the MoE aux loss (appended to aux_sink, exact vs serial)."""
    from e2e_asr_tpu.models.encoder import pyramid_reduce
    from e2e_asr_tpu.models.seq2seq import stack_frames

    enc_cfg = cfg.encoder
    if enc_cfg.encoder_type != "transformer":
        raise ValueError("pipeline parallelism targets the transformer "
                         "family (homogeneous block stack); the bidirectional "
                         "pyramid has cross-layer sequential dependencies "
                         "both time directions")
    if ep_mesh is not None:
        raise ValueError("expert parallelism under pipeline parallelism "
                         "rides a combined 2-D (stage, expert) mesh "
                         "(make_stage_mesh(n_expert=...)), not a separate "
                         "ep_mesh — the Trainer wires -pp_stages with "
                         "-ep_shards that way")
    depth = max(cfg.num_layers.values())
    taps = tuple(sorted({d for d in cfg.num_layers.values() if d != depth}))
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

    h, tap_outs, aux = pipeline_blocks(
        eparams, enc_cfg, h, lens, depth, mesh=mesh, n_micro=n_micro,
        train=train, rng=rng, compute_dtype=compute_dtype, taps=taps,
        collect_aux=aux_sink is not None)
    if aux is not None:
        aux_sink.append(aux)

    valid = jnp.arange(T)[None, :] < lens[:, None]
    vmask = valid.astype(h.dtype)[:, :, None]
    attn_states, time_major, seq_lens = {}, {}, {}
    for d in (*taps, depth):
        out = te._layer_norm(eparams["ln_out"],
                             h if d == depth else tap_outs[d]) * vmask
        attn_states[d] = out
        time_major[d] = jnp.transpose(out, (1, 0, 2))
        seq_lens[d] = lens
    return attn_states, time_major, seq_lens
