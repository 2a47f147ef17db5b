"""Self-attention (Transformer) encoder family — a TPU-first alternative to
the reference's pyramidal BiLSTM encoder (encoder.py), selected with
`EncoderConfig.encoder_type = "transformer"`.

Rationale: the recurrent encoder's per-step [B,H]x[H,4H] matmuls are
latency-bound on the MXU (see VALIDATION.md); a Transformer's batched
[B,T,D] matmuls tile onto the systolic array with no sequential dependency,
so it trains far closer to the chip's FLOP roofline and scales to deeper /
wider configurations without custom kernels. Sequence length is tamed the
same way the pyramid does it: one stack-and-project subsampling stage (the
pyramid_reduce reshape from the RNN encoder, default 8x — "roughly 8 frames
per character", reference encoder.py:171) before the attention blocks.

Drop-in API parity with models/encoder.py: same init/apply signatures, same
(attention_states, time_major_states, seq_lens) per-depth returns with
depth d = output of block d, so the multitask decoders, the CTC/hybrid
families, long-form chunked inference, checkpointing, and the parallelism
layer all work unchanged. d_model = hidden_size * (2 if bi_dir else 1) so
downstream attention sizes match the RNN encoder exactly.

Pre-LN blocks, sinusoidal positions, masked softmax over padded frames,
residual dropout at 1 - out_prob (training only).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.config import EncoderConfig
from e2e_asr_tpu.core.layers import dense, dense_params, dropout

Array = jax.Array


def d_model(cfg: EncoderConfig) -> int:
    return cfg.hidden_size * (2 if cfg.bi_dir else 1)


REL_RADIUS = 64   # relative distances are clamped to [-63, 63]


def init(key: Array, cfg: EncoderConfig, max_depth: int, feat_dim: int) -> dict:
    D = d_model(cfg)
    F_in = feat_dim * cfg.stack_cons * cfg.subsample
    ks = iter(jax.random.split(key, 2 + 6 * max_depth))
    params: dict = {"input_proj": dense_params(next(ks), F_in, D)}
    for i in range(1, max_depth + 1):
        blk = {
            "ln1": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "qkv": dense_params(next(ks), D, 3 * D),
            "attn_out": dense_params(next(ks), D, D),
            "ln2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        }
        if cfg.moe_experts > 0:
            # Switch-style MoE FFN (extension): E expert FFNs + a top-1
            # router; the dense ffn1/ffn2 are replaced per block.
            from e2e_asr_tpu.core.layers import glorot_uniform
            E, F = cfg.moe_experts, cfg.ffn_mult * D
            km = jax.random.split(next(ks), 2 * E + 1)
            blk["moe"] = {
                "router": dense_params(km[0], D, E),
                "w1": jnp.stack([glorot_uniform(km[1 + e], (D, F))
                                 for e in range(E)]),
                "b1": jnp.zeros((E, F)),
                "w2": jnp.stack([glorot_uniform(km[1 + E + e], (F, D))
                                 for e in range(E)]),
                "b2": jnp.zeros((E, D)),
            }
        else:
            blk["ffn1"] = dense_params(next(ks), D, cfg.ffn_mult * D)
            blk["ffn2"] = dense_params(next(ks), cfg.ffn_mult * D, D)
        if cfg.rel_pos_bias:
            # Zero-init learned relative-position bias per head (T5-style):
            # at init the model is exactly the sinusoidal-only baseline.
            blk["rel_bias"] = jnp.zeros((cfg.num_heads, 2 * REL_RADIUS - 1))
        if cfg.conv_kernel > 0:
            # Conformer-style conv module: LN -> pointwise(2D) -> GLU ->
            # depthwise conv(k) -> LN -> swish -> pointwise(D) (+residual).
            from e2e_asr_tpu.core.layers import glorot_uniform
            kc = jax.random.split(next(ks), 3)
            blk["conv"] = {
                "ln": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
                "pw1": dense_params(kc[0], D, 2 * D),
                "dw": glorot_uniform(kc[1], (cfg.conv_kernel, D)),
                "ln2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
                "pw2": dense_params(kc[2], D, D),
            }
        params[f"block_{i}"] = blk
    params["ln_out"] = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    return params


def _layer_norm(p: dict, x: Array, eps: float = 1e-6) -> Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _sinusoidal_at(positions: Array, D: int) -> Array:
    """Sinusoidal position encoding at explicit (possibly traced) positions:
    [...]-shaped ints -> [..., D] f32. ONE implementation shared by the
    offline encoder and the streaming K/V-cache path (apply_streaming) so
    their position terms match exactly."""
    pos = positions.astype(jnp.float32)[..., None]            # [..., 1]
    dim = jnp.arange(D // 2, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(jnp.float32(10000.0), 2.0 * dim / D)
    pe = jnp.zeros(angle.shape[:-1] + (D,), jnp.float32)
    pe = pe.at[..., 0::2].set(jnp.sin(angle))
    pe = pe.at[..., 1::2].set(jnp.cos(angle))
    return pe


def _sinusoidal(T: int, D: int) -> Array:
    return _sinusoidal_at(jnp.arange(T), D)


def chunk_bias(T: int, chunk: int, left: int) -> np.ndarray:
    """[1,1,T,T] additive block-causal attention mask (attn_chunk > 0):
    query frame q sees key k iff 0 <= chunk(q) - chunk(k) <= left — full
    attention within a chunk, `left` whole chunks of history, no future.
    This is what makes the trained encoder EXACTLY streamable with a
    left*chunk-frame K/V cache (apply_streaming)."""
    c = np.arange(T) // chunk
    d = c[:, None] - c[None, :]
    keep = (d >= 0) & (d <= left)
    return np.where(keep, 0.0, -1e30).astype(np.float32)[None, None]


def _rel_bias(table: Array, T: int) -> Array:
    """[nh, 2R-1] bias table -> [1, nh, T, T] additive attention bias with
    relative distances q-k clamped to the table radius."""
    dist = np.arange(T)[:, None] - np.arange(T)[None, :]
    idx = np.clip(dist, -(REL_RADIUS - 1), REL_RADIUS - 1) + REL_RADIUS - 1
    return table[:, jnp.asarray(idx)][None]                   # [1,nh,T,T]


# Banded attention for chunk-causal configs: chunk-causality bounds every
# query's visible keys to the (attn_left+1)*attn_chunk-frame window of its
# own + left chunks, so at long post-subsample lengths the [T,T] score
# matrix is waste — computing per-chunk [ch, W] scores against gathered key
# windows is O(T*W) FLOPs and memory instead of O(T^2).
#
# On-chip (v5e) measurement, fwd+bwd through the 4-block encoder, window 72
# (chunk 8, left 8), bf16: banded LOSES on speed at every length probed —
# 0.57x at T'=128, 0.34x at T'=512, 0.59x at T'=2048 (dense 2.58/4.23/
# 10.75 ms vs banded 4.56/12.37/18.12). The dense masked form is batched
# square GEMMs the MXU eats; the banded form's per-chunk key-window gathers
# and [nq, ch, W] einsum tiles don't pay for the 28x FLOP reduction at
# these sizes. So the banded form is kept as a MEMORY guard, not a speed
# path: auto-engaged (trace-time static on T) only when the dense [T,T]
# scores would be >= BANDED_MIN_FACTOR windows wide (T' >= 64*72 = 4608 at
# the default window, where per-(B,head,layer) dense scores pass ~40 MB
# f32 and HBM pressure, not FLOPs, is the binding constraint). Tests pin
# both paths via _FORCE_BANDED.
# Numerics: identical key set per query (out-of-window keys hold exactly
# softmax weight 0 in the dense form), so outputs match the dense path to
# reduction-order tolerance (pinned by tests/test_transformer_streaming.py).
BANDED_MIN_FACTOR = 64
_FORCE_BANDED: bool | None = None       # tests pin both paths explicitly


def use_banded(T: int, cfg: EncoderConfig) -> bool:
    if _FORCE_BANDED is not None:
        return _FORCE_BANDED
    return (cfg.attn_chunk > 0
            and T >= BANDED_MIN_FACTOR * (cfg.attn_left + 1) * cfg.attn_chunk)


def _conv_module(p: dict, h: Array, vmask: Array, compute_dtype=None,
                 causal: bool = False) -> Array:
    """Conformer-style convolution module (lite: LayerNorm instead of
    BatchNorm): LN -> pointwise(2D) -> GLU -> masked depthwise conv ->
    LN -> swish -> pointwise(D). Padding frames are zeroed before the conv
    so valid outputs depend only on in-length context. causal (attn_chunk
    mode): left-only padding so outputs never see future frames — the
    streaming path carries the kernel-1 previous frames instead."""
    D = h.shape[-1]
    kk = p["dw"].shape[0]
    x = _layer_norm(p["ln"], h)
    x = dense(p["pw1"], x, compute_dtype=compute_dtype)       # [B,T,2D]
    a, b = jnp.split(x, 2, axis=-1)
    x = (a * jax.nn.sigmoid(b)) * vmask                       # GLU, masked
    x = jax.lax.conv_general_dilated(
        x, p["dw"][:, None, :], window_strides=(1,),
        padding=[(kk - 1, 0)] if causal else "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=D)
    x = _layer_norm(p["ln2"], x)
    x = x * jax.nn.sigmoid(x)                                 # swish
    return dense(p["pw2"], x, compute_dtype=compute_dtype)


def _moe_ffn(p: dict, x: Array, capacity_factor: float, aux_sink,
             ep_mesh=None, compute_dtype=None,
             aux_stats: bool = False, ep_axis: str | None = None) -> Array:
    """Switch-style top-1 MoE FFN (extension; replaces the dense FFN when
    EncoderConfig.moe_experts > 0).

    Static-shape dense dispatch, the TPU formulation: a [N,E,C] one-hot
    dispatch tensor routes each token to its argmax expert at a fixed
    capacity C = ceil(cap_factor*N/E); over-capacity tokens fall through to
    the residual stream (output 0). The load-balance aux loss
    (E * sum_e frac_e * meanprob_e) is appended to aux_sink for the trainer
    to weigh in. Padded frames route like real ones (the serial dense FFN
    also computes them; outputs are masked downstream) — they spend
    capacity, which bucketing keeps modest.

    ep_mesh: optional ("expert",) mesh — experts sharded via shard_map
    (each device computes its E/n experts; one psum combines [N,D]).
    ep_axis: for callers ALREADY inside a shard_map whose mesh carries an
    "expert" axis (pipeline / sequence parallelism on a 2-D mesh): the
    expert weights w1/b1/w2/b2 arrive as LOCAL shards (E/K experts); the
    router stays replicated so routing/gating/capacity see the GLOBAL
    expert set, each device slices its experts' rows out of the dispatch
    tensor, and one psum over ep_axis combines the [N,D] outputs —
    numerically identical to the unsharded dispatch.
    """
    from e2e_asr_tpu.core.pipeline import shard_map
    from jax.sharding import PartitionSpec as P

    B, T, D = x.shape
    E = p["router"]["kernel"].shape[-1]      # GLOBAL expert count (the
                                             # router is never sharded)
    N = B * T
    xf = x.reshape(N, D)
    logits = dense(p["router"], xf).astype(jnp.float32)       # [N,E]
    probs = jax.nn.softmax(logits, axis=-1)
    gate = jnp.max(probs, axis=-1)                            # [N]
    onehot = jax.nn.one_hot(jnp.argmax(probs, axis=-1), E,
                            dtype=jnp.float32)                # [N,E]
    C = max(1, int(math.ceil(capacity_factor * N / E)))
    pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot         # [N,E]
    disp = onehot * (pos < C)
    dtensor = disp[:, :, None] * jax.nn.one_hot(
        pos.astype(jnp.int32), C, dtype=jnp.float32)          # [N,E,C]
    if aux_sink is not None:
        if aux_stats:
            # Raw routing statistics (sum-of-onehot, sum-of-probs over the
            # N local tokens) so a sharded caller (pipeline / sequence
            # parallelism) can pool them across microbatches/shards and
            # recover the EXACT whole-batch aux via moe_aux_from_stats.
            aux_sink.append((jnp.sum(onehot, axis=0),
                             jnp.sum(probs, axis=0)))
        else:
            frac = jnp.mean(onehot, axis=0)
            aux_sink.append(E * jnp.sum(frac * jnp.mean(probs, axis=0)))

    cd = compute_dtype or jnp.float32

    def expert_compute(dt, w1, b1, w2, b2):
        ein = jnp.einsum("nec,nd->ecd", dt.astype(cd), xf.astype(cd),
                         preferred_element_type=jnp.float32)  # [El,C,D]
        mid = jax.nn.gelu(jnp.einsum(
            "ecd,edf->ecf", ein.astype(cd), w1.astype(cd),
            preferred_element_type=jnp.float32) + b1[:, None, :])
        eo = jnp.einsum("ecf,efd->ecd", mid.astype(cd), w2.astype(cd),
                        preferred_element_type=jnp.float32) + b2[:, None, :]
        return jnp.einsum("nec,ecd->nd", dt.astype(cd), eo.astype(cd),
                          preferred_element_type=jnp.float32)  # [N,D]

    if ep_axis is not None:
        # Inside an enclosing shard_map: local El-expert weights, full
        # router. Slice this device's expert rows from the dispatch tensor
        # and psum the partial outputs over the expert axis.
        El = p["b1"].shape[0]
        idx = jax.lax.axis_index(ep_axis)
        dt_local = jax.lax.dynamic_slice_in_dim(dtensor, idx * El, El,
                                                axis=1)
        out = jax.lax.psum(
            expert_compute(dt_local, p["w1"], p["b1"], p["w2"], p["b2"]),
            ep_axis)
    elif ep_mesh is None:
        out = expert_compute(dtensor, p["w1"], p["b1"], p["w2"], p["b2"])
    else:
        def sharded(dt, w1, b1, w2, b2):
            return jax.lax.psum(expert_compute(dt, w1, b1, w2, b2),
                                "expert")
        out = shard_map(sharded, mesh=ep_mesh,
                        in_specs=(P(None, "expert", None), P("expert"),
                                  P("expert"), P("expert"), P("expert")),
                        out_specs=P())(dtensor, p["w1"], p["b1"],
                                       p["w2"], p["b2"])
    return (out * gate[:, None]).reshape(B, T, D)


def _mhsa(p: dict, h: Array, bias: Array, num_heads: int,
          compute_dtype=None, train: bool = False,
          chunk: tuple[int, int] | None = None) -> Array:
    from e2e_asr_tpu.core.rnn import use_pallas_lstm
    from e2e_asr_tpu.ops import mhsa_pallas

    B, T, D = h.shape
    hd = D // num_heads
    qkv = dense(p["qkv"], h, compute_dtype=compute_dtype)     # [B,T,3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    shp = lambda x: x.reshape(B, T, num_heads, hd).transpose(0, 2, 1, 3)
    q, k, v = shp(q), shp(k), shp(v)                          # [B,nh,T,hd]
    if chunk is not None:
        # Banded chunk-causal attention: per-chunk queries against gathered
        # key windows — O(T*W) instead of O(T^2). `bias` arrives as the
        # PADDING-only [B,1,1,T] form (the caller skips the dense chunk
        # mask); the window itself realizes the chunk constraint, because
        # every whole chunk in [i-left, i] is visible to chunk i's queries.
        ch, left = chunk
        Wn = (left + 1) * ch
        assert T % ch == 0, "caller pads T to a chunk multiple"
        nc = T // ch
        kidx = (np.arange(nc)[:, None] * ch
                + np.arange(Wn)[None, :] - left * ch)         # [nc,Wn]
        in_range = kidx >= 0                # pre-stream slots don't exist
        kidx_c = np.clip(kidx, 0, T - 1)
        # Per-row key validity: gather the padding bias at window slots.
        win_bias = bias[:, 0, 0, :][:, jnp.asarray(kidx_c)]   # [B,nc,Wn]
        win_bias = jnp.where(jnp.asarray(in_range), win_bias, -1e30)
        if compute_dtype is not None:
            q, k, v = (x.astype(compute_dtype) for x in (q, k, v))
        q5 = q.reshape(B, num_heads, nc, ch, hd)
        gather = lambda x: jnp.take(x, jnp.asarray(kidx_c.reshape(-1)),
                                    axis=2).reshape(B, num_heads, nc, Wn, hd)
        kw, vw = gather(k), gather(v)
        s = jnp.einsum("bhncd,bhnwd->bhncw", q5, kw,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        if "rel_bias" in p:
            # dist(q,k) = u + left*ch - m: the same for every chunk.
            dist = (np.arange(ch)[:, None] + left * ch
                    - np.arange(Wn)[None, :])
            ridx = np.clip(dist, -(REL_RADIUS - 1),
                           REL_RADIUS - 1) + REL_RADIUS - 1
            s = s + p["rel_bias"][:, jnp.asarray(ridx)][None, :, None]
        a = jax.nn.softmax(s + win_bias[:, None, :, None, :], axis=-1)
        if compute_dtype is not None:
            a = a.astype(compute_dtype)
        o = jnp.einsum("bhncw,bhnwd->bhncd", a, vw,
                       preferred_element_type=jnp.float32)
        o = o.reshape(B, num_heads, T, hd).transpose(0, 2, 1, 3)
        o = o.reshape(B, T, D)
        return dense(p["attn_out"], o, compute_dtype=compute_dtype)
    if (not train and mhsa_pallas.enabled() and use_pallas_lstm()
            and bias.shape[2] == 1    # chunk-causal [B,1,T,T] bias: XLA path
            and mhsa_pallas.supported(num_heads, T, hd, "rel_bias" in p)):
        # Fused scores/softmax/AV kernel — OPT-IN (E2E_ASR_MHSA_KERNEL=1)
        # and inference-only: XLA's fused batched GEMMs measured faster at
        # this family's short post-subsample lengths in BOTH training and
        # embedded inference (ops/mhsa_pallas.py module docstring).
        # The padding bias arrives as [B,1,1,T]; the kernel wants [B,T].
        relmat = (_rel_bias(p["rel_bias"], T)[0] if "rel_bias" in p
                  else jnp.zeros((num_heads, T, T), jnp.float32))
        o = mhsa_pallas.attend(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32), bias[:, 0, 0, :],
                               relmat, compute_dtype == jnp.bfloat16)
    else:
        if compute_dtype is not None:
            q, k, v = (x.astype(compute_dtype) for x in (q, k, v))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        if "rel_bias" in p:
            s = s + _rel_bias(p["rel_bias"], T)
        a = jax.nn.softmax(s + bias, axis=-1)
        if compute_dtype is not None:
            a = a.astype(compute_dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v,
                       preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
    return dense(p["attn_out"], o, compute_dtype=compute_dtype)


def _ffn_fwd(blk: dict, h: Array, compute_dtype=None) -> Array:
    """The dense pre-LN FFN half of a block (shared by the serial, pipeline,
    and sequence-parallel paths)."""
    return dense(blk["ffn2"],
                 jax.nn.gelu(dense(blk["ffn1"], _layer_norm(blk["ln2"], h),
                                   compute_dtype=compute_dtype)),
                 compute_dtype=compute_dtype)


def moe_aux_from_stats(cnt: Array, psm: Array, n_tokens: float) -> Array:
    """Load-balance aux loss from pooled routing statistics: `cnt`/`psm`
    are [..., E] sums of the routing one-hot / router probs over `n_tokens`
    tokens. Returns sum over every leading axis of the per-block
    E * sum_e frac_e * meanprob_e — identical to what the serial sink
    accumulates when the stats cover the same token set."""
    E = cnt.shape[-1]
    return jnp.sum(E * (cnt / n_tokens) * (psm / n_tokens))


def block_fwd(blk: dict, h: Array, attn_bias: Array, vmask: Array, keys,
              keep: float, cfg: EncoderConfig, compute_dtype=None,
              train: bool = False, aux_sink: list | None = None,
              ep_mesh=None, aux_stats: bool = False,
              ep_axis: str | None = None,
              banded_chunk: tuple[int, int] | None = None) -> Array:
    """One pre-LN encoder block — THE single definition of the block math.

    The serial encoder (`apply`) and the pipeline-parallel path
    (core/pipeline.py) both call this; the sequence-parallel path reuses
    `_ffn_fwd` but swaps `_mhsa` for its gathered-K/V variant. keys is the
    (attn, conv, ffn) dropout-key triple. banded_chunk: (attn_chunk,
    attn_left) when the caller selected the banded O(T*W) attention form
    (attn_bias is then the padding-only [B,1,1,T]).
    """
    a = _mhsa(blk, _layer_norm(blk["ln1"], h), attn_bias, cfg.num_heads,
              compute_dtype=compute_dtype, train=train, chunk=banded_chunk)
    if train and keep < 1.0:
        a = dropout(keys[0], a, keep)
    h = h + a
    if "conv" in blk:
        c = _conv_module(blk["conv"], h, vmask, compute_dtype=compute_dtype,
                         causal=cfg.attn_chunk > 0)
        if train and keep < 1.0:
            c = dropout(keys[1], c, keep)
        h = h + c
    if "moe" in blk:
        f = _moe_ffn(blk["moe"], _layer_norm(blk["ln2"], h),
                     cfg.moe_capacity, aux_sink if train else None,
                     ep_mesh=ep_mesh, compute_dtype=compute_dtype,
                     aux_stats=aux_stats, ep_axis=ep_axis)
    else:
        f = _ffn_fwd(blk, h, compute_dtype=compute_dtype)
    if train and keep < 1.0:
        f = dropout(keys[2], f, keep)
    return h + f


# ----------------------------------------------------------------- streaming
#
# A chunk-causal encoder (attn_chunk > 0) has a BOUNDED left-only receptive
# field per block: block-causal attention (chunk_bias) plus a causal conv
# module. Carrying, per block, the last attn_left*attn_chunk frames of K/V
# and the last conv_kernel-1 post-GLU conv-input frames therefore reproduces
# the offline encoder EXACTLY, chunk by chunk — the transformer analogue of
# the forward-only recurrent stack's carried cell states
# (models/encoder.apply_streaming). Same chunking contract: non-final chunks
# must be multiples of subsample * attn_chunk input frames so attention-chunk
# boundaries land where the offline pass puts them.


def supports_exact_streaming(cfg: EncoderConfig) -> bool:
    """Chunk-causal transformer encoders stream exactly. MoE blocks are
    excluded: routing capacity binds over the whole [B*T] token set (and the
    over-capacity cumsum orders tokens globally), which a chunked pass cannot
    reproduce."""
    return cfg.attn_chunk > 0 and cfg.moe_experts == 0


def streaming_state(cfg: EncoderConfig, max_depth: int, batch: int) -> dict:
    """Zero carried state for apply_streaming: per block, [B,nh,L,hd] K/V
    caches (L = attn_left*attn_chunk post-subsample frames; zeros are
    correctly masked out via the `pos` counter) and, with a conv module, the
    [B,conv_kernel-1,D] previous conv-input frames (zeros == the offline
    causal pass's left zero-padding). `pos` counts each row's consumed
    post-subsample frames (position offset + cache-validity horizon)."""
    D = d_model(cfg)
    hd = D // cfg.num_heads
    L = cfg.attn_left * cfg.attn_chunk
    blocks = []
    for _ in range(max_depth):
        blk = {"k": jnp.zeros((batch, cfg.num_heads, L, hd), jnp.float32),
               "v": jnp.zeros((batch, cfg.num_heads, L, hd), jnp.float32)}
        if cfg.conv_kernel > 1:
            blk["conv"] = jnp.zeros((batch, cfg.conv_kernel - 1, D),
                                    jnp.float32)
        blocks.append(blk)
    return {"pos": jnp.zeros((batch,), jnp.int32), "blocks": tuple(blocks)}


def _stream_chunk_bias(W: int, ch: int, left: int, L: int) -> np.ndarray:
    """[1,1,W,L+W] additive chunk-causal mask for one streaming chunk: query
    local frame qi (global pos0+qi) vs key slot m (global pos0-L+m; the
    first L slots are the carried cache). Because pos0 and L are multiples
    of `ch`, chunk(q)-chunk(k) = qi//ch - (m-L)//ch is offset-independent —
    the mask is STATIC."""
    qc = np.arange(W) // ch
    kc = (np.arange(L + W) - L) // ch            # negative for cache slots
    d = qc[:, None] - kc[None, :]
    keep = (d >= 0) & (d <= left)
    return np.where(keep, 0.0, -1e30).astype(np.float32)[None, None]


def _rel_bias_stream(table: Array, W: int, L: int) -> Array:
    """_rel_bias for a streaming chunk: distances q-k = qi+L-m are also
    offset-independent, so the [1,nh,W,L+W] bias is static."""
    dist = np.arange(W)[:, None] + L - np.arange(L + W)[None, :]
    idx = np.clip(dist, -(REL_RADIUS - 1), REL_RADIUS - 1) + REL_RADIUS - 1
    return table[:, jnp.asarray(idx)][None]


def apply_streaming(params: dict, cfg: EncoderConfig, x: Array,
                    seq_len: Array, num_layers: dict[str, int], state, *,
                    compute_dtype=None, final: bool = False):
    """One chunk of the exact streaming chunk-causal transformer encoder.

    x: [B, T_chunk, F] stacked features — T_chunk must be a multiple of
    subsample * attn_chunk (so post-subsample attention-chunk boundaries
    align with the offline pass), EXCEPT the last chunk (final=True), whose
    pyramid padding is exactly the whole-utterance tail padding. seq_len:
    [B] valid frames in this chunk (rows with 0 freeze their cache and
    position — idle batched-server slots). state: streaming_state() or the
    previous chunk's carry.

    Returns (attention_states {depth: [B, W, D]}, seq_lens {depth: [B]},
    new_state). Feeding a sequence chunk-by-chunk reproduces apply()'s
    outputs exactly (tests/test_streaming_exact.py)."""
    from e2e_asr_tpu.models.encoder import pyramid_reduce

    if not supports_exact_streaming(cfg):
        raise ValueError("exact transformer streaming needs chunk-causal "
                         "attention (-attn_chunk > 0) and dense FFNs "
                         "(moe_experts 0 — routing capacity is batch-global)")
    ch, left = cfg.attn_chunk, cfg.attn_left
    L = left * ch
    if cfg.subsample > 1:
        if x.shape[1] % cfg.subsample and not final:
            raise ValueError("chunk length must be a multiple of "
                             f"subsample*attn_chunk "
                             f"({cfg.subsample * ch})")
        x, lens = pyramid_reduce(x, seq_len, cfg.subsample)
    else:
        lens = seq_len.astype(jnp.int32)
    B, W, _ = x.shape
    if W % ch and not final:
        raise ValueError("chunk length must be a multiple of "
                         f"subsample*attn_chunk ({cfg.subsample * ch})")
    D = d_model(cfg)
    nh = cfg.num_heads
    hd = D // nh
    pos0 = state["pos"]                                       # [B] int32

    h = dense(params["input_proj"], x, compute_dtype=compute_dtype)
    h = h + _sinusoidal_at(pos0[:, None] + jnp.arange(W)[None, :], D)

    valid = jnp.arange(W)[None, :] < lens[:, None]            # [B,W]
    vmask = valid.astype(h.dtype)[:, :, None]
    # Key validity over [cache | chunk]: cache slot m holds global frame
    # pos0-L+m (valid iff >= 0); in-chunk key m-L valid iff < lens.
    m = jnp.arange(L + W)[None, :]
    kvalid = jnp.where(m < L, m >= (L - pos0)[:, None],
                       (m - L) < lens[:, None])
    bias = (jnp.where(kvalid, 0.0, -1e30)[:, None, None, :]
            + jnp.asarray(_stream_chunk_bias(W, ch, left, L)))

    upd = lens > 0                # rows with no valid frames freeze fully
    max_depth = max(num_layers.values())
    attn_states: dict[int, Array] = {}
    seq_lens: dict[int, Array] = {}
    new_blocks = []
    for i in range(1, max_depth + 1):
        blk = params[f"block_{i}"]
        st = state["blocks"][i - 1]
        ns: dict[str, Array] = {}
        qkv = dense(blk["qkv"], _layer_norm(blk["ln1"], h),
                    compute_dtype=compute_dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shp = lambda t: t.reshape(B, W, nh, hd).transpose(0, 2, 1, 3)
        q, k, v = shp(q), shp(k), shp(v)                      # [B,nh,W,hd]
        # The cache stores PRE-cast (f32) K/V — the offline path casts at
        # use, and bf16->f32->bf16 round-trips exactly.
        kf = jnp.concatenate([st["k"], k.astype(jnp.float32)], axis=2)
        vf = jnp.concatenate([st["v"], v.astype(jnp.float32)], axis=2)
        ns["k"] = jnp.where(upd[:, None, None, None], kf[:, :, -L:], st["k"])
        ns["v"] = jnp.where(upd[:, None, None, None], vf[:, :, -L:], st["v"])
        if compute_dtype is not None:
            q, kf, vf = (t.astype(compute_dtype) for t in (q, kf, vf))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kf,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        if "rel_bias" in blk:
            s = s + _rel_bias_stream(blk["rel_bias"], W, L)
        a = jax.nn.softmax(s + bias, axis=-1)
        if compute_dtype is not None:
            a = a.astype(compute_dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, vf,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(B, W, D)
        h = h + dense(blk["attn_out"], o, compute_dtype=compute_dtype)

        if "conv" in blk:
            p = blk["conv"]
            kk = p["dw"].shape[0]
            xg = dense(p["pw1"], _layer_norm(p["ln"], h),
                       compute_dtype=compute_dtype)
            ga, gb = jnp.split(xg, 2, axis=-1)
            xg = (ga * jax.nn.sigmoid(gb)) * vmask             # GLU, masked
            if kk > 1:
                # Prepend the carried kk-1 previous frames; VALID padding
                # then equals the offline causal (left-padded) conv.
                xin = jnp.concatenate([st["conv"].astype(xg.dtype), xg],
                                      axis=1)
                ns["conv"] = jnp.where(upd[:, None, None],
                                       xin[:, -(kk - 1):].astype(jnp.float32),
                                       st["conv"])
            else:
                xin = xg
            c = jax.lax.conv_general_dilated(
                xin, p["dw"][:, None, :].astype(xin.dtype),
                window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=D)
            c = _layer_norm(p["ln2"], c)
            c = c * jax.nn.sigmoid(c)
            h = h + dense(p["pw2"], c, compute_dtype=compute_dtype)

        h = h + _ffn_fwd(blk, h, compute_dtype=compute_dtype)
        new_blocks.append(ns)
        attn_states[i] = _layer_norm(params["ln_out"], h) * vmask
        seq_lens[i] = lens
    new_state = {"pos": pos0 + lens, "blocks": tuple(new_blocks)}
    return attn_states, seq_lens, new_state


def apply(params: dict, cfg: EncoderConfig, x: Array, seq_len: Array,
          num_layers: dict[str, int], *, train: bool = False,
          rng: Array | None = None, compute_dtype=None,
          aux_sink: list | None = None, ep_mesh=None,
          ) -> tuple[dict[int, Array], dict[int, Array], dict[int, Array]]:
    """Same contract as encoder.apply: x [B,T,F] (already frame-stacked),
    returns per-depth (attention_states, time_major_states, seq_lens)."""
    from e2e_asr_tpu.models.encoder import pyramid_reduce

    max_depth = max(num_layers.values())
    want_attn = {d for t, d in num_layers.items() if t != "state"}
    want_tm = {d for t, d in num_layers.items() if t == "state"}

    if cfg.subsample > 1:
        x, lens = pyramid_reduce(x, seq_len, cfg.subsample)
    else:
        lens = seq_len.astype(jnp.int32)
    B, T, _ = x.shape
    T_out = T
    banded = use_banded(T, cfg)
    if banded and T % cfg.attn_chunk:
        # Banded gathers index whole chunks: pad T up (the pad frames are
        # past every length, masked everywhere, and sliced off below).
        x = jnp.pad(x, ((0, 0), (0, cfg.attn_chunk - T % cfg.attn_chunk),
                        (0, 0)))
        T = x.shape[1]
    D = d_model(cfg)
    h = dense(params["input_proj"], x, compute_dtype=compute_dtype)
    h = h + jnp.asarray(_sinusoidal(T, D))

    valid = (jnp.arange(T)[None, :] < lens[:, None])          # [B,T]
    attn_bias = jnp.where(valid, 0.0, -1e30)[:, None, None, :]
    if cfg.attn_chunk > 0 and not banded:
        # Block-causal chunk mask -> [B,1,T,T] bias; trains an encoder the
        # streaming path (apply_streaming) reproduces exactly from chunks.
        # (When `banded`, _mhsa realizes the same constraint as gathered
        # key windows — O(T*W) — and wants the padding-only bias.)
        attn_bias = attn_bias + jnp.asarray(
            chunk_bias(T, cfg.attn_chunk, cfg.attn_left))
    vmask = valid.astype(h.dtype)[:, :, None]

    keep = cfg.out_prob if train else 1.0
    drop_rng = rng if rng is not None else jax.random.PRNGKey(0)
    bc = (cfg.attn_chunk, cfg.attn_left) if banded else None

    def run_block(blk, h, k_a, k_c, k_f):
        return block_fwd(blk, h, attn_bias, vmask, (k_a, k_c, k_f), keep,
                         cfg, compute_dtype=compute_dtype, train=train,
                         aux_sink=aux_sink, ep_mesh=ep_mesh,
                         banded_chunk=bc)

    if train and cfg.remat:
        # Per-block rematerialization (-remat): backward recomputes the
        # block forward instead of storing its [B,T,D] residuals.
        if cfg.moe_experts > 0:
            # The MoE aux loss must cross the checkpoint boundary as a
            # VALUE: the wrapped block returns (h, aux) so jax.checkpoint
            # differentiates through both, and the router gradient
            # survives rematerialization.
            @jax.checkpoint
            def run_block_aux(blk, h, k_a, k_c, k_f):
                sink = []
                out = block_fwd(blk, h, attn_bias, vmask, (k_a, k_c, k_f),
                                keep, cfg, compute_dtype=compute_dtype,
                                train=train, aux_sink=sink, ep_mesh=ep_mesh,
                                banded_chunk=bc)
                aux = (sum(sink) if sink
                       else jnp.zeros((), jnp.float32))
                return out, aux

            def run_block(blk, h, k_a, k_c, k_f):
                out, aux = run_block_aux(blk, h, k_a, k_c, k_f)
                if aux_sink is not None:
                    aux_sink.append(aux)
                return out
        else:
            run_block = jax.checkpoint(run_block)

    attn_states: dict[int, Array] = {}
    time_major: dict[int, Array] = {}
    seq_lens: dict[int, Array] = {}
    for i in range(1, max_depth + 1):
        h = run_block(params[f"block_{i}"], h,
                      jax.random.fold_in(drop_rng, 3 * i),
                      jax.random.fold_in(drop_rng, 3 * i + 1),
                      jax.random.fold_in(drop_rng, 3 * i + 2))
        if i in want_attn or i in want_tm:
            out = (_layer_norm(params["ln_out"], h) * vmask)[:, :T_out]
            if i in want_attn:
                attn_states[i] = out
            if i in want_tm:
                time_major[i] = jnp.transpose(out, (1, 0, 2))
            seq_lens[i] = lens
    return attn_states, time_major, seq_lens
