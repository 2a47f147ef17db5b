"""Standalone causal transformer language model (extension — the reference's
only LM is the weight-tied RNN, /root/reference/lm_model.py).

Completes the fusion-LM kind axis: external RNN checkpoints, the tied decoder
LM, dense trigram tables (tools/train_ngram.py), and — with this module —
a transformer LM trained on text alone (tools/train_lm.py), all consumed by
the SAME shallow-fusion hooks every family's beam and the n-best rescorer
drive (models/rnn_lm.fusion_step / fusion_init / fusion_next_input), so
fusion semantics cannot drift by kind.

TPU-first design notes:
- Training/rescoring is ONE parallel causal pass (batched GEMMs on the MXU),
  not a T-step scan.
- The shallow-fusion state is {per-block KV caches [..., S, nh, hd], per-row
  position int32} — an opaque pytree the beams already gather along the beam
  axis (eval/beam._gather_beam) and select with rank-generic jnp.where
  (eval/transducer_beam, eval/ctc_beam), so no beam changes are needed.
  Positions are PER-ROW because the CTC/transducer beams advance the LM only
  on label emissions (stay-hypotheses keep their state), unlike the attention
  beam's uniform step.
- Static metadata rides in array SHAPES so lm_params stays an array-only
  pytree (eval/rescore.py tree_maps jnp.asarray over it, and jit tracing
  must still see static cache sizes): the context horizon S is
  pos_emb.shape[0] (learned absolute positions) and the head count is
  heads_marker.shape[0].

Architecture: pre-LN blocks (LN -> causal self-attention -> +res; LN -> GELU
FFN -> +res), final LN, vocab projection — the decoder-block conventions of
models/transformer_decoder.py minus cross-attention. Leaf names "embedding"/
"output_proj" match the other LM kinds on purpose.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from e2e_asr_tpu.core import losses
from e2e_asr_tpu.core.layers import dense, dense_params, dropout, uniform_init
from e2e_asr_tpu.models.transformer_encoder import _layer_norm

Array = jax.Array
NEG_INF = -1e30


@dataclass(frozen=True)
class TLMConfig:
    vocab_size: int
    d_model: int = 256
    blocks: int = 4
    heads: int = 4
    ffn_mult: int = 4
    max_len: int = 512        # context horizon S (positions 0..S-1)
    keep_prob: float = 1.0    # residual-branch dropout keep probability


def config_of(params: dict) -> TLMConfig:
    """Recover the (shape-borne) architecture from a params tree."""
    V, D = params["embedding"].shape
    return TLMConfig(
        vocab_size=V, d_model=D, blocks=len(params["tlm_blocks"]),
        heads=params["heads_marker"].shape[0],
        ffn_mult=params["tlm_blocks"][0]["ffn1"]["kernel"].shape[1] // D,
        max_len=params["pos_emb"].shape[0])


def _heads(params: dict) -> tuple[int, int]:
    nh = params["heads_marker"].shape[0]
    D = params["embedding"].shape[1]
    if D % nh != 0:
        raise ValueError(f"d_model {D} not divisible by heads {nh}")
    return nh, D // nh


def init(key: Array, cfg: TLMConfig) -> dict:
    if cfg.d_model % cfg.heads != 0:
        raise ValueError(
            f"-dim {cfg.d_model} must be divisible by -heads {cfg.heads}")
    D, F = cfg.d_model, cfg.ffn_mult * cfg.d_model
    ks = iter(jax.random.split(key, 3 + 6 * cfg.blocks))
    ln = lambda: {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}  # noqa: E731
    params: dict = {
        "embedding": uniform_init(next(ks), (cfg.vocab_size, D), 1.0),
        # Learned absolute positions; shape[0] IS the fusion horizon.
        "pos_emb": uniform_init(next(ks), (cfg.max_len, D), 0.02),
        # Zero-sized payload; shape[0] carries the (static) head count.
        "heads_marker": jnp.zeros((cfg.heads,), jnp.float32),
        "ln_out": ln(),
        "output_proj": dense_params(next(ks), D, cfg.vocab_size),
    }
    blocks = []
    for _ in range(cfg.blocks):
        blocks.append({
            "ln1": ln(),
            "self_q": dense_params(next(ks), D, D),
            "self_k": dense_params(next(ks), D, D),
            "self_v": dense_params(next(ks), D, D),
            "self_o": dense_params(next(ks), D, D),
            "ln2": ln(),
            "ffn1": dense_params(next(ks), D, F),
            "ffn2": dense_params(next(ks), F, D),
        })
    params["tlm_blocks"] = blocks
    return params


def _split(x: Array, nh: int, hd: int) -> Array:
    return x.reshape(x.shape[:-1] + (nh, hd))


def _merge(x: Array) -> Array:
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


# ---------------------------------------------------------------------------
# Parallel (training / scoring) forward
# ---------------------------------------------------------------------------

def apply(params: dict, token_ids: Array, seq_len: Array, *,
          train: bool = False, rng: Array | None = None,
          keep_prob: float = 1.0, compute_dtype=None) -> Array:
    """LM forward with the rnn_lm.apply contract: token_ids [T, B] time-major
    (row 0 is <go>); consumes rows [0, T-1) and returns logits [T-1, B, V]
    predicting rows [1, T). Causality makes valid positions independent of
    the padding rows behind them; the loss masks past seq_len.
    """
    nh, hd = _heads(params)
    S_max = params["pos_emb"].shape[0]
    T = token_ids.shape[0]
    if T - 1 > S_max:
        raise ValueError(
            f"sequence of {T - 1} positions exceeds the LM's trained "
            f"horizon {S_max}; retrain with a larger -max_len")
    cd = compute_dtype
    x = (params["embedding"][token_ids[:-1]]
         + params["pos_emb"][: T - 1, None])                # [S, B, D]
    h = jnp.transpose(x, (1, 0, 2))                         # [B, S, D]
    S = T - 1
    causal = jnp.tril(jnp.ones((S, S), bool))
    use_drop = train and rng is not None and keep_prob < 1.0
    if use_drop:
        drop_keys = iter(jax.random.split(rng, 2 * len(params["tlm_blocks"])))

    def maybe_drop(y):
        if not use_drop:
            return y
        return dropout(next(drop_keys), y, keep_prob)

    for blk in params["tlm_blocks"]:
        y = _layer_norm(blk["ln1"], h)
        q = _split(dense(blk["self_q"], y, compute_dtype=cd), nh, hd)
        k = _split(dense(blk["self_k"], y, compute_dtype=cd), nh, hd)
        v = _split(dense(blk["self_v"], y, compute_dtype=cd), nh, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        s = jnp.where(causal[None, None], s, NEG_INF)
        a = jax.nn.softmax(s, axis=-1)
        if cd is not None:
            a = a.astype(cd)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                       preferred_element_type=jnp.float32)
        h = h + maybe_drop(dense(blk["self_o"], _merge(o), compute_dtype=cd))
        if "cross_bias" in blk:
            # Tied transformer-decoder LM view (transformer_decoder.
            # tied_lm_view): the zero-crossed cross-attention residual
            # still adds cross_o's bias.
            h = h + blk["cross_bias"]
        y = _layer_norm(blk["ln2"], h)
        h = h + maybe_drop(dense(blk["ffn2"],
                                 jax.nn.gelu(dense(blk["ffn1"], y,
                                                   compute_dtype=cd)),
                                 compute_dtype=cd))
    logits = dense(params["output_proj"], _layer_norm(params["ln_out"], h),
                   compute_dtype=cd)
    return jnp.transpose(logits, (1, 0, 2))                 # [S, B, V]


def loss(params: dict, token_ids: Array, seq_len: Array, *,
         train: bool = True, rng: Array | None = None,
         keep_prob: float = 1.0, valid: Array | None = None,
         compute_dtype=None) -> Array:
    """Shifted-target CE with the reference LM normalization
    (/root/reference/lm_model.py:94-106), padded-tail row weights included
    (data/lm.py `valid`)."""
    logits = apply(params, token_ids, seq_len, train=train, rng=rng,
                   keep_prob=keep_prob, compute_dtype=compute_dtype)
    targets, _ = losses.shifted_targets(token_ids, seq_len)
    return losses.cross_entropy_loss(logits, targets, seq_len, weights=valid)


# ---------------------------------------------------------------------------
# Incremental fusion step (consumed by models/rnn_lm fusion hooks)
# ---------------------------------------------------------------------------

def fusion_state(params: dict, batch_shape: tuple) -> dict:
    """Zeroed fusion carry: per-block KV caches [*batch, S, nh, hd] and
    per-row positions [*batch] int32. An opaque pytree for the beams."""
    nh, hd = _heads(params)
    S = params["pos_emb"].shape[0]
    shape = tuple(batch_shape) + (S, nh, hd)
    return {
        "pos": jnp.zeros(tuple(batch_shape), jnp.int32),
        "kv": tuple({"k": jnp.zeros(shape), "v": jnp.zeros(shape)}
                    for _ in range(len(params["tlm_blocks"]))),
    }


def _fusion_body(params: dict, x: Array, kv_caches, update_cache, attend
                 ) -> tuple[Array, list]:
    """Shared per-step block math for fusion_step/fusion_step_indirect.

    The two variants differ ONLY in how the K/V caches are written
    (`update_cache(cache_leaf, new_row) -> updated leaf`) and how
    self-attention routes the cached rows (`attend(q, ck, cv) -> [..., nh,
    hd]` output); embeddings, residuals, FFNs, LNs, and logits live once,
    here. Returns (next-token log-probs [..., V] f32, new kv list).
    """
    nh, hd = _heads(params)
    h = x
    new_kv = []
    for blk, kv in zip(params["tlm_blocks"], kv_caches):
        y = _layer_norm(blk["ln1"], h)
        q = _split(dense(blk["self_q"], y), nh, hd)         # [..., nh, hd]
        kk = _split(dense(blk["self_k"], y), nh, hd)
        vv = _split(dense(blk["self_v"], y), nh, hd)
        ck = update_cache(kv["k"], kk)
        cv = update_cache(kv["v"], vv)
        new_kv.append({"k": ck, "v": cv})
        o = attend(q, ck, cv)
        h = h + dense(blk["self_o"], _merge(o))
        if "cross_bias" in blk:
            # Tied decoder view: the zero-crossed residual's cross_o bias.
            h = h + blk["cross_bias"]
        y = _layer_norm(blk["ln2"], h)
        h = h + dense(blk["ffn2"], jax.nn.gelu(dense(blk["ffn1"], y)))
    logits = dense(params["output_proj"], _layer_norm(params["ln_out"], h))
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), new_kv


def fusion_step(params: dict, ids: Array, state: dict
                ) -> tuple[Array, dict]:
    """Consume one token per row at that row's own position.

    ids: [...] int32 (raw token ids — the LM embeds internally, like the
    trigram kind); state: fusion_state pytree. Returns (next-token log-probs
    [..., V] f32, advanced state). Rows at pos >= S (past the trained
    horizon) drop the cache write and attend to the full cache — callers
    guard against ever getting there (rnn_lm.fusion_init's `steps` check).
    """
    S = params["pos_emb"].shape[0]
    pos = state["pos"]                                      # [...]
    x = (params["embedding"][ids]
         + params["pos_emb"][jnp.clip(pos, 0, S - 1)])      # [..., D]
    write = (jnp.arange(S) == pos[..., None]).astype(
        x.dtype)[..., :, None, None]                        # [..., S, 1, 1]
    mask = (jnp.arange(S) <= pos[..., None])[..., None, :]  # [..., 1(h), S]

    def update_cache(cache, new_row):
        return cache * (1.0 - write) + new_row[..., None, :, :] * write

    def attend(q, ck, cv):
        hd = q.shape[-1]
        s = jnp.einsum("...hd,...shd->...hs", q, ck,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        s = jnp.where(mask, s, NEG_INF)
        a = jax.nn.softmax(s, axis=-1).astype(ck.dtype)
        return jnp.einsum("...hs,...shd->...hd", a, cv,
                          preferred_element_type=jnp.float32)

    logp, new_kv = _fusion_body(params, x, state["kv"], update_cache, attend)
    return logp, {"pos": pos + 1, "kv": tuple(new_kv)}


def fusion_step_indirect(params: dict, ids: Array, state: dict, t: Array
                         ) -> tuple[Array, dict]:
    """fusion_step for a [B, k] beam WITHOUT per-step cache reorders.

    The attention beam's uniform step makes every row's position equal to
    the scalar step counter `t`, so the cache write is one
    dynamic_update_slice (not the one-hot full-cache rewrite fusion_step's
    per-row positions force), and — the point — the caches are NEVER
    gathered along the beam axis on selection. Cache row j, position s
    holds the K/V computed by whatever hypothesis occupied rank j at step
    s; `state["anc"]` [B, k, S] int32 maps each CURRENT hypothesis's
    position s to the rank that computed it (maintained by eval/beam.py
    exactly like the transformer decoder's ancestry: gather the parent's
    map on selection, then set position t to the parent's rank).
    Self-attention scores every source row and selects by ancestry — the
    transformer decoder's step_beam_indirect trick (k x the score FLOPs,
    negligible; the multi-MB caches are read once and never rewritten).

    Numerically identical to fusion_step on gathered caches (exact in f32:
    the ancestry one-hot selects, it never mixes rows — pinned by
    tests/test_transformer_lm.py). Past-horizon divergence: where
    fusion_step drops the write at pos >= S, the dynamic-slice write here
    clamps t to S-1 and would overwrite that position — callers MUST bound
    steps by the horizon (rnn_lm.fusion_init's `steps` check; beam_decode
    always passes max_steps).
    """
    from e2e_asr_tpu.models.transformer_decoder import (ancestry_attend,
                                                        ancestry_onehot)
    S = params["pos_emb"].shape[0]
    pos = state["pos"]                                      # [B, k]
    k = pos.shape[1]
    x = (params["embedding"][ids]
         + params["pos_emb"][jnp.clip(pos, 0, S - 1)])      # [B, k, D]
    step_mask = jnp.arange(S) <= t                          # [S]
    onehot = ancestry_onehot(state["anc"], t, k)            # [B, k, c, S]

    def update_cache(cache, new_row):
        return jax.lax.dynamic_update_slice_in_dim(
            cache, new_row[:, :, None].astype(cache.dtype), t, axis=2)

    def attend(q, ck, cv):
        return ancestry_attend(q, ck, cv, onehot, step_mask, cast=ck.dtype)

    logp, new_kv = _fusion_body(params, x, state["kv"], update_cache, attend)
    return logp, {"pos": pos + 1, "kv": tuple(new_kv), "anc": state["anc"]}


# ---------------------------------------------------------------------------
# Artifact IO (self-describing named-npz, loadable without a template)
# ---------------------------------------------------------------------------

def save_artifact(path: str, params: dict) -> None:
    """One .npz with "/"-joined pytree paths (the framework checkpoint leaf
    naming, core/checkpoint.py) — lm_loader detects the kind by the
    "pos_emb" leaf."""
    from e2e_asr_tpu.core.checkpoint import flatten_named
    np.savez(path, **flatten_named(params))


def load_artifact(path: str) -> dict:
    """Rebuild the params tree purely from leaf names (numeric path
    components are list indices) — no config sidecar needed: every
    architecture dimension is shape-borne (see module docstring)."""
    with np.load(path) as z:
        named = {k: z[k] for k in z.files}
    root: dict = {}
    for name, arr in named.items():
        parts = name.split("/")
        node = root
        for i, p in enumerate(parts):
            last = i == len(parts) - 1
            key: int | str = int(p) if p.isdigit() else p
            if last:
                node[key] = jnp.asarray(arr)
            else:
                node = node.setdefault(key, {})

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(isinstance(k, int) for k in node):
            return [listify(node[i]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    params = listify(root)
    if "tlm_blocks" not in params or "pos_emb" not in params:
        raise ValueError(f"{path} is not a transformer-LM artifact")
    return params
