"""SpecAugment: time and frequency masking on log-mel features.

Training-time augmentation (Park et al., 2019) the reference predates; fully
static-shape and jit-friendly: masks are built from random starts/widths via
broadcasted-iota comparisons — no dynamic slicing, no host work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("n_freq_masks", "max_freq_width",
                                             "n_time_masks", "max_time_frac"))
def spec_augment(rng: Array, feats: Array, feat_lens: Array, *,
                 n_freq_masks: int = 2, max_freq_width: int = 27,
                 n_time_masks: int = 2, max_time_frac: float = 0.05) -> Array:
    """feats: [B, T, F]; feat_lens: [B]. Returns masked features.

    Each mask zeroes a random band: frequency bands of width U[0, W_f), time
    bands of width U[0, max_time_frac * len) per example — the SpecAugment
    "LD" style policy scaled to utterance length.
    """
    B, T, F = feats.shape
    lens = feat_lens.astype(jnp.float32)
    keys = jax.random.split(rng, 2 * (n_freq_masks + n_time_masks))
    ki = iter(range(len(keys)))

    freq_ids = jnp.arange(F)[None, None, :]      # [1, 1, F]
    time_ids = jnp.arange(T)[None, :, None]      # [1, T, 1]
    out = feats
    for _ in range(n_freq_masks):
        w = jax.random.randint(keys[next(ki)], (B, 1, 1), 0, max_freq_width)
        f0 = jax.random.randint(keys[next(ki)], (B, 1, 1), 0,
                                max(F - max_freq_width, 1))
        mask = (freq_ids >= f0) & (freq_ids < f0 + w)
        out = jnp.where(mask, 0.0, out)
    for _ in range(n_time_masks):
        max_w = jnp.maximum((lens * max_time_frac).astype(jnp.int32), 1)
        w = (jax.random.uniform(keys[next(ki)], (B,))
             * max_w.astype(jnp.float32)).astype(jnp.int32)
        t0 = (jax.random.uniform(keys[next(ki)], (B,))
              * jnp.maximum(lens - w.astype(jnp.float32), 1.0)
              ).astype(jnp.int32)
        mask = ((time_ids >= t0[:, None, None])
                & (time_ids < (t0 + w)[:, None, None]))
        out = jnp.where(mask, 0.0, out)
    return out


def speed_perturb(rng: Array, feats: Array, feat_lens: Array,
                  lo: float, hi: float) -> tuple[Array, Array]:
    """Per-utterance tempo augmentation on features: each row is
    time-stretched by an independent factor s ~ U(lo, hi) — output frame t
    reads input position t*s via linear interpolation, so s > 1 compresses
    (faster speech) and s < 1 dilates (slower). New lengths are
    floor(len/s), capped at the bucket width T (a stretched tail past T is
    truncated — acceptable for augmentation, the bucket's static shape is
    the TPU contract). feats: [B, T, F]; returns (feats', lens')."""
    B, T, F = feats.shape
    s = jax.random.uniform(rng, (B,), minval=lo, maxval=hi)
    lens = feat_lens.astype(jnp.float32)
    new_lens = jnp.clip(jnp.floor(lens / s), 1, T).astype(jnp.int32)
    pos = jnp.arange(T, dtype=jnp.float32)[None, :] * s[:, None]   # [B, T]
    lo_i = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    hi_i = jnp.clip(lo_i + 1, 0, T - 1)
    frac = jnp.clip(pos - lo_i.astype(jnp.float32), 0.0, 1.0)[:, :, None]
    take = lambda idx: jnp.take_along_axis(  # noqa: E731
        feats, idx[:, :, None], axis=1)
    out = take(lo_i) * (1.0 - frac) + take(hi_i) * frac
    valid = (jnp.arange(T)[None, :] < new_lens[:, None])[:, :, None]
    return jnp.where(valid, out, 0.0), new_lens
