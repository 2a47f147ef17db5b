"""Pallas TPU kernel: fused multi-head self-attention core for the
Transformer encoder family (models/transformer_encoder._mhsa).

The XLA path materializes the [B, nh, T, T] score tensor in HBM between
the QK^T dot, the masked softmax, and the AV dot (two dots cannot fuse in
XLA). After the 8x input subsampling the per-utterance sequence is short
(bench shape: T' = 48 from 384 input frames), so an entire (batch item x
all heads) attention problem — scores included — fits VMEM comfortably.
This kernel runs the whole chain

    scores = (Q_h K_h^T) * 1/sqrt(hd) + pad_bias + rel_bias
    probs  = softmax(scores, axis=-1)
    out_h  = probs V_h

in ONE launch with a grid over the batch; both dots hit the MXU in bf16
(matching the XLA path's compute_dtype semantics) with fp32 accumulation,
the softmax runs on the VPU between them. supported() bounds the VMEM
envelope; beyond it the XLA path is the fallback.

ENGAGEMENT — OPT-IN ONLY (E2E_ASR_MHSA_KERNEL=1): this kernel is a
measured NEGATIVE RESULT at the family's shapes and is kept as the
documented, parity-tested artifact of that measurement (VALIDATION
round-3). On-chip: isolated forward 1.13x vs an isolated einsum chain,
but embedded in the full model XLA fuses the attention chain with the
surrounding layernorm/residual/projection ops and wins everywhere we
measured — train step 0.87-0.95x across three backward designs
(XLA-replay-under-vjp re-ran the whole forward; the saved-probs direct
backward fixed that; the head-major layout still pays four [B,nh,T,hd]
transpose materializations per block that XLA fuses into its einsums),
and even pure inference encode 0.88x. A packed-qkv kernel that eliminates
the transposes triggers a Mosaic compile-time pathology (323 s to compile
ONE forward at the bench shape). Conclusion: at T' <= ~256 post-subsample
lengths the [T,T] score tensor is too small for fusion to beat XLA's
batched-GEMM + elementwise fusion; flash-style fusion pays at length
scales this family never reaches (the 8x subsample is the whole point).

The forward also emits the softmax probabilities, and the backward is the
direct matmul chain FROM the saved probs (dV = P^T g, dP = g V^T, softmax
vjp, dQ/dK) — no recomputation of the fused forward, exact-parity tested
against the einsum oracle's autodiff.

Masking parity: fully-padded query rows see a constant -1e30 row and
softmax returns the uniform distribution — exactly what jax.nn.softmax
produces on the XLA path; downstream multiplies by the valid-frame mask,
so the garbage rows never escape (transformer_encoder.apply).

No reference counterpart: the reference has no self-attention encoder
(encoder.py is the pyramidal BiLSTM); this family and kernel are the
TPU-first extension documented in SURVEY.md section 2.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

VMEM_BUDGET = 14 * 1024 * 1024


def enabled() -> bool:
    """Opt-in gate (module docstring: measured net loss at this family's
    shapes — kept for longer-sequence configs and as the measured
    artifact)."""
    import os
    return bool(os.environ.get("E2E_ASR_MHSA_KERNEL"))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem_bytes(nh: int, T: int, hd: int, with_rel: bool) -> int:
    """Double-buffered per-step blocks (q,k,v,out,pad row, probs out,
    optional rel) + the in-flight fp32 score matrices per head."""
    blocked = (4 * nh * T * hd + T + nh * T * T
               + (nh * T * T if with_rel else 0))
    live = 2 * T * T
    return 4 * (2 * blocked + nh * live)


def supported(nh: int, T: int, hd: int, with_rel: bool = False) -> bool:
    return (hd % 8 == 0
            and _vmem_bytes(nh, T, hd, with_rel) <= VMEM_BUDGET)


def _fwd_kernel(*refs, nh: int, scale: float, with_rel: bool, bf16: bool):
    it = iter(refs)
    q_ref, k_ref, v_ref, pb_ref = next(it), next(it), next(it), next(it)
    rel_ref = next(it) if with_rel else None
    o_ref, p_ref = next(it), next(it)

    pb = pb_ref[0, 0]                                  # [T] additive bias
    for h in range(nh):
        q, k, v = q_ref[0, h], k_ref[0, h], v_ref[0, h]
        if bf16:
            q, k = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # [T, T]
        if rel_ref is not None:
            s = s + rel_ref[h]
        probs = jax.nn.softmax(s + pb[None, :], axis=-1)
        p_ref[0, h] = probs                            # residual (f32)
        if bf16:
            probs = probs.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)
        o_ref[0, h] = jnp.dot(probs, v, preferred_element_type=jnp.float32)


def _fwd(q: Array, k: Array, v: Array, pad_bias: Array,
         relmat: Array | None, bf16: bool) -> tuple[Array, Array]:
    """q/k/v: [B, nh, T, hd]. Returns (out [B, nh, T, hd],
    probs [B, nh, T, T] — the backward residual)."""
    B, nh, T, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    qkv_spec = pl.BlockSpec((1, nh, T, hd), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    # The bias row rides as [B, 1, T] so the block's trailing two dims
    # equal the array's (Mosaic requires (8,128)-divisible or full-dim
    # trailing block dims; a (1, T) block of a [B, T] array is neither).
    in_specs = [qkv_spec, qkv_spec, qkv_spec,
                pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [q, k, v, pad_bias[:, None, :]]
    if relmat is not None:
        in_specs.append(pl.BlockSpec((nh, T, T), lambda b: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(relmat)
    kernel = functools.partial(_fwd_kernel, nh=nh, scale=scale,
                               with_rel=relmat is not None, bf16=bf16)
    out, probs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, nh, T, hd), lambda b: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, nh, T, T), lambda b: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, nh, T, hd), jnp.float32),
                   jax.ShapeDtypeStruct((B, nh, T, T), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    return out, probs


def _replay(q: Array, k: Array, v: Array, pad_bias: Array,
            relmat: Array | None, bf16: bool) -> Array:
    """Differentiable XLA oracle of the kernel math (tests). Mirrors
    transformer_encoder._mhsa's einsum form exactly."""
    hd = q.shape[-1]
    qm, km = (q, k) if not bf16 else (q.astype(jnp.bfloat16),
                                      k.astype(jnp.bfloat16))
    s = jnp.einsum("bhqd,bhkd->bhqk", qm, km,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    if relmat is not None:
        s = s + relmat[None]
    probs = jax.nn.softmax(s + pad_bias[:, None, None, :], axis=-1)
    vm = v if not bf16 else v.astype(jnp.bfloat16)
    if bf16:
        probs = probs.astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, vm,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def attend(q: Array, k: Array, v: Array, pad_bias: Array, relmat: Array,
           bf16: bool = False) -> Array:
    """Fused attention core: softmax(QK^T/sqrt(hd) + biases) V.

    q/k/v: [B, nh, T, hd] fp32; pad_bias: [B, T] additive (0 valid /
    -1e30 pad); relmat: [nh, T, T] additive relative-position bias (pass
    zeros when unused — it is batch-shared and tiny). Returns
    [B, nh, T, hd] fp32.
    """
    out, _ = _fwd(q, k, v, pad_bias, relmat, bf16)
    return out


def _attend_fwd(q, k, v, pad_bias, relmat, bf16):
    out, probs = _fwd(q, k, v, pad_bias, relmat, bf16)
    return out, (q, k, v, probs, pad_bias)


def _attend_bwd(bf16, res, g):
    """Direct backward from the saved probs — batched GEMMs only, nothing
    recomputed. Mirrors the vjp of _replay's math (cast points included)."""
    q, k, v, probs, pad_bias = res
    hd = q.shape[-1]
    cast = (lambda x: x.astype(jnp.bfloat16)) if bf16 else (lambda x: x)
    dv = jnp.einsum("bhqk,bhqd->bhkd", cast(probs), cast(g),
                    preferred_element_type=jnp.float32)
    dprobs = jnp.einsum("bhqd,bhkd->bhqk", cast(g), cast(v),
                        preferred_element_type=jnp.float32)
    ds = probs * (dprobs
                  - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
    dsm = cast(ds)
    dq = jnp.einsum("bhqk,bhkd->bhqd", dsm, cast(k),
                    preferred_element_type=jnp.float32) / math.sqrt(hd)
    dk = jnp.einsum("bhqk,bhqd->bhkd", dsm, cast(q),
                    preferred_element_type=jnp.float32) / math.sqrt(hd)
    drel = jnp.sum(ds, axis=0)                         # [nh, T, T]
    return dq, dk, dv, jnp.zeros_like(pad_bias), drel


attend.defvjp(_attend_fwd, _attend_bwd)
