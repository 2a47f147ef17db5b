"""Sequence parallelism (sp) for the transformer encoder family.

Extension (no reference counterpart). Activations are sharded over TIME
across a ("seq",) mesh axis — each device holds [B, T/S, D] — which divides
the dominant activation memory (and the LN/FFN/projection FLOPs) S ways for
long pre-subsample sequences (long-form training, 'run/eval on audio minutes
long'):

- LayerNorm, QKV/output projections, FFN, residuals, dropout: strictly
  local to the time shard — no communication at all.
- Attention: queries stay local; K and V are `all_gather`ed over the seq
  axis (the one collective per block, riding ICI), so every device scores
  its local queries against the full sequence — exactly the serial math.
- The learned relative-position bias indexes its table with the shard's
  absolute row offset (axis_index * T/S), so biases match serial exactly.
- The Conformer depthwise conv exchanges a (k-1)-frame halo with the two
  neighbor shards via `ppermute` (edge shards receive the collective's
  zero-fill — exactly the serial SAME zero padding), then runs the conv
  VALID over [left_halo | local | right_halo]; all other conv-module ops
  are pointwise and stay local.
- Outputs reassemble for free via the sharded out_spec.

Scope: T after subsampling must divide the seq-axis size, and each time
shard must be at least as long as the conv halo it lends out.

Numerics: identical op order to the serial encoder per shard; forward and
grads are exactly equal (tests/test_seq_parallel.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from e2e_asr_tpu.config import EncoderConfig, Seq2SeqConfig
from e2e_asr_tpu.core.layers import dense, dropout
from e2e_asr_tpu.core.pipeline import shard_map  # version-portable import
from e2e_asr_tpu.models import transformer_encoder as te

Array = jax.Array


def make_seq_mesh(n_shards: int, devices=None, n_expert: int = 1,
                  n_data: int = 1) -> Mesh:
    """("seq",) mesh, or its dp/ep-composed variants (up to the 3-D
    ("data", "seq", "expert") mesh) — core/pipeline.composed_mesh."""
    from e2e_asr_tpu.core.pipeline import composed_mesh
    return composed_mesh("seq", n_shards, devices=devices,
                         n_expert=n_expert, n_data=n_data)


def _mhsa_sp(blk: dict, h: Array, bias_full: Array, row0: Array,
             num_heads: int, T_full: int, compute_dtype=None,
             chunk_full: Array | None = None) -> Array:
    """MHSA with local queries [B,Ts,D] against all-gathered K/V [B,T,*].

    bias_full: [B,1,1,T] padding bias (replicated — built from lens).
    row0: this shard's absolute first row (for the rel-bias / chunk-mask
    row slices). chunk_full: [1,1,T,T] chunk-causal mask (attn_chunk > 0).
    """
    import math

    B, Ts, D = h.shape
    hd = D // num_heads
    qkv = dense(blk["qkv"], h, compute_dtype=compute_dtype)    # [B,Ts,3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    shp = lambda x, t: x.reshape(B, t, num_heads, hd).transpose(0, 2, 1, 3)
    q = shp(q, Ts)                                             # [B,nh,Ts,hd]
    # One collective per block: K/V over the seq axis -> full sequence.
    k = shp(jax.lax.all_gather(k, "seq", axis=1, tiled=True), T_full)
    v = shp(jax.lax.all_gather(v, "seq", axis=1, tiled=True), T_full)
    if compute_dtype is not None:
        q, k, v = (x.astype(compute_dtype) for x in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    if "rel_bias" in blk:
        full = te._rel_bias(blk["rel_bias"], T_full)           # [1,nh,T,T]
        s = s + jax.lax.dynamic_slice_in_dim(full, row0, Ts, axis=2)
    if chunk_full is not None:
        # This shard's query rows of the global chunk-causal mask.
        s = s + jax.lax.dynamic_slice_in_dim(chunk_full, row0, Ts, axis=2)
    a = jax.nn.softmax(s + bias_full, axis=-1)
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v,
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(B, Ts, D)
    return dense(blk["attn_out"], o, compute_dtype=compute_dtype)


def _conv_sp(p: dict, h: Array, vmask: Array, kernel: int, S: int,
             compute_dtype=None, causal: bool = False) -> Array:
    """te._conv_module with the depthwise conv's receptive field crossing
    shard boundaries via halo exchange.

    SAME padding at stride 1 pads (k-1)//2 low / k-1-(k-1)//2 high, so each
    shard borrows that many post-GLU frames from its left/right neighbor
    (exchanged AFTER the padding mask — identical values to the serial
    conv's inputs) and convolves VALID over the extended sequence. Edge
    shards get ppermute's zero fill = serial's zero padding. causal
    (attn_chunk mode): the serial conv left-pads k-1 / right-pads 0, so the
    halo is k-1 frames from the left neighbor only.
    """
    D = h.shape[-1]
    x = te._layer_norm(p["ln"], h)
    x = dense(p["pw1"], x, compute_dtype=compute_dtype)        # [B,Ts,2D]
    a, b = jnp.split(x, 2, axis=-1)
    x = (a * jax.nn.sigmoid(b)) * vmask                        # GLU, masked
    lo, hi = ((kernel - 1, 0) if causal
              else ((kernel - 1) // 2, kernel - 1 - (kernel - 1) // 2))
    parts = []
    if lo:
        parts.append(jax.lax.ppermute(
            x[:, -lo:, :], "seq", [(i, i + 1) for i in range(S - 1)]))
    parts.append(x)
    if hi:
        parts.append(jax.lax.ppermute(
            x[:, :hi, :], "seq", [(i, i - 1) for i in range(1, S)]))
    ext = jnp.concatenate(parts, axis=1) if len(parts) > 1 else x
    x = jax.lax.conv_general_dilated(
        ext, p["dw"][:, None, :], window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=D)
    x = te._layer_norm(p["ln2"], x)
    x = x * jax.nn.sigmoid(x)                                  # swish
    return dense(p["pw2"], x, compute_dtype=compute_dtype)


def encode_seq_parallel(params: dict, cfg: Seq2SeqConfig, feats: Array,
                        feat_lens: Array, *, mesh: Mesh,
                        train: bool = False, rng: Array | None = None,
                        compute_dtype=None, aux_sink: list | None = None,
                        ep_mesh=None):
    """seq2seq.encode with transformer activations sharded over time: same
    (attention_states, time_major_states, seq_lens) contract, including
    intermediate-depth decoder taps and the MoE aux loss (appended to
    aux_sink; routing stats are pooled over the seq axis so the aux equals
    serial EXACTLY — only capacity binds per time shard)."""
    from e2e_asr_tpu.models.encoder import pyramid_reduce
    from e2e_asr_tpu.models.seq2seq import stack_frames

    enc_cfg = cfg.encoder
    if enc_cfg.encoder_type != "transformer":
        raise ValueError("sequence parallelism targets the transformer "
                         "family (time-local blocks + one attention "
                         "gather); the recurrent pyramid is sequential "
                         "in time by construction")
    if ep_mesh is not None:
        raise ValueError("expert parallelism under sequence parallelism "
                         "rides a combined 2-D (seq, expert) mesh "
                         "(make_seq_mesh(n_expert=...)), not a separate "
                         "ep_mesh — the Trainer wires -sp_shards with "
                         "-ep_shards that way")
    ep = "expert" in mesh.axis_names
    if ep and enc_cfg.moe_experts % mesh.shape["expert"]:
        raise ValueError(f"{enc_cfg.moe_experts} experts not divisible by "
                         f"the {mesh.shape['expert']}-way expert axis")
    dp = "data" in mesh.axis_names
    depth = max(cfg.num_layers.values())
    taps = tuple(sorted({d for d in cfg.num_layers.values() if d != depth}))
    want_aux = (aux_sink is not None and train and enc_cfg.moe_experts > 0)
    S = mesh.shape["seq"]
    eparams = params["encoder"]

    x = stack_frames(feats, enc_cfg.stack_cons)
    if enc_cfg.subsample > 1:
        x, lens = pyramid_reduce(x, feat_lens, enc_cfg.subsample)
    else:
        lens = feat_lens.astype(jnp.int32)
    B, T, _ = x.shape
    if T % S:
        raise ValueError(f"post-subsample length {T} not divisible by "
                         f"{S} sequence shards")
    if dp and B % mesh.shape["data"]:
        raise ValueError(f"batch {B} not divisible by the "
                         f"{mesh.shape['data']}-way data axis")
    D = te.d_model(enc_cfg)
    h = dense(eparams["input_proj"], x, compute_dtype=compute_dtype)
    h = h + jnp.asarray(te._sinusoidal(T, D))

    valid = jnp.arange(T)[None, :] < lens[:, None]              # [B,T]
    bias_full = jnp.where(valid, 0.0, -1e30)[:, None, None, :]
    causal = enc_cfg.attn_chunk > 0
    chunk_full = (jnp.asarray(te.chunk_bias(T, enc_cfg.attn_chunk,
                                            enc_cfg.attn_left))
                  if causal else None)
    keep = enc_cfg.out_prob if train else 1.0
    drop_rng = rng if rng is not None else jax.random.PRNGKey(0)
    Ts = T // S
    halo = ((enc_cfg.conv_kernel - 1) if causal
            else enc_cfg.conv_kernel - 1 - (enc_cfg.conv_kernel - 1) // 2)
    if halo > Ts:
        raise ValueError(f"conv halo {halo} exceeds the {Ts}-frame time "
                         f"shard (fewer -sp_shards, or a smaller "
                         f"-conv_kernel)")

    blocks = [eparams[f"block_{i}"] for i in range(1, depth + 1)]
    vmask = valid.astype(h.dtype)[:, :, None]                   # [B,T,1]

    def staged(blocks, h, bias_full, vmask_sh, chunk_full):
        sid = jax.lax.axis_index("seq")
        row0 = sid * Ts
        # Distinct dropout streams per (data, seq) shard coordinate.
        shard_rng = (jax.random.fold_in(drop_rng,
                                        jax.lax.axis_index("data"))
                     if dp else drop_rng)
        tap_hs, stats = [], []
        for i, blk in enumerate(blocks, start=1):
            a = _mhsa_sp(blk, te._layer_norm(blk["ln1"], h), bias_full,
                         row0, enc_cfg.num_heads, T,
                         compute_dtype=compute_dtype,
                         chunk_full=chunk_full if causal else None)
            if train and keep < 1.0:
                # Per-(block, shard) masks — same discipline as the
                # pipeline's per-microbatch dropout.
                a = dropout(jax.random.fold_in(
                    jax.random.fold_in(shard_rng, 3 * i), sid), a, keep)
            h = h + a
            if "conv" in blk:
                c = _conv_sp(blk["conv"], h, vmask_sh, enc_cfg.conv_kernel,
                             S, compute_dtype=compute_dtype, causal=causal)
                if train and keep < 1.0:
                    c = dropout(jax.random.fold_in(
                        jax.random.fold_in(shard_rng, 3 * i + 1), sid),
                        c, keep)
                h = h + c
            if "moe" in blk:
                sink = [] if want_aux else None
                f = te._moe_ffn(blk["moe"], te._layer_norm(blk["ln2"], h),
                                enc_cfg.moe_capacity, sink,
                                compute_dtype=compute_dtype, aux_stats=True,
                                ep_axis="expert" if ep else None)
                if want_aux:
                    stats.append(sink[0])
            else:
                f = te._ffn_fwd(blk, h, compute_dtype=compute_dtype)
            if train and keep < 1.0:
                f = dropout(jax.random.fold_in(
                    jax.random.fold_in(shard_rng, 3 * i + 2), sid), f, keep)
            h = h + f
            if i in taps:
                tap_hs.append(h)
        res = [h, tuple(tap_hs)]
        if want_aux:
            # Pool routing counts over the seq axis -> whole-batch stats,
            # so the aux equals the serial whole-batch value exactly.
            pool = ("seq", "data") if dp else "seq"
            cnt = jax.lax.psum(jnp.stack([s[0] for s in stats]), pool)
            psm = jax.lax.psum(jnp.stack([s[1] for s in stats]), pool)
            res.append(te.moe_aux_from_stats(cnt, psm, float(B * T)))
        return tuple(res)

    sharded = P("data", "seq", None) if dp else P(None, "seq", None)
    bias_spec = P("data") if dp else P()
    out_specs = [sharded, tuple(sharded for _ in taps)]
    if want_aux:
        out_specs.append(P())

    from e2e_asr_tpu.core.pipeline import moe_leaf_specs
    res = shard_map(staged, mesh=mesh,
                    in_specs=(moe_leaf_specs(blocks, (), "expert")
                              if ep else P(),
                              sharded, bias_spec, sharded, P()),
                    out_specs=tuple(out_specs))(
        blocks, h, bias_full, vmask,
        chunk_full if causal else jnp.zeros((1, 1, 1, 1)))
    h, tap_hs = res[0], dict(zip(taps, res[1]))
    if want_aux:
        aux_sink.append(res[2])
    attn_states, time_major, seq_lens = {}, {}, {}
    for d in (*taps, depth):
        out = te._layer_norm(eparams["ln_out"],
                             h if d == depth else tap_hs[d]) * vmask
        attn_states[d] = out
        time_major[d] = jnp.transpose(out, (1, 0, 2))
        seq_lens[d] = lens
    return attn_states, time_major, seq_lens
