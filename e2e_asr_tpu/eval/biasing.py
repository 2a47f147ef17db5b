"""Contextual biasing (hotword boosting) for all decode families.

Production serving feature with no reference counterpart: a list of boost
phrases (token sequences — names, commands, rare terms) is compiled into a
prefix trie, and during beam search every candidate token that ADVANCES a
trie path earns `boost_weight`; a candidate that falls off a partial match
gives the accumulated partial bonus back (the standard subtract-on-failure
semantics of shallow biasing FSTs, cf. Aleksic et al. 2015 / Zhao et al.
2019), so only genuine phrase matches keep their reward. When a phrase
completes, its bonus is committed permanently and matching restarts at the
root.

TPU shape discipline: the trie is three dense arrays — `trans` [N, V]
(child node per token, -1 = no edge), `depth` [N], `final` [N] — so one
gather per beam step yields every candidate's transition and score delta:

    delta(v) = boost * (depth[target(v)] - depth[node])

with target(v) = the advanced child, else the root's child for v (restart),
else the root. This single formula implements earn / give-back / restart
uniformly. Per-hypothesis search state is ONE int32 (the trie node).

Greedy-commit note: when one phrase is a strict prefix of another, reaching
the shorter phrase's final node commits it and restarts matching — the
longer phrase is then only matched from scratch. Documented simplification;
split such phrase lists if exact longest-match semantics matter.

Failure-restart note: the restart transition consults only the trie ROOT
(not Aho-Corasick suffix links): after a mismatch, a new match starts only
if the mismatching token itself begins a phrase. Overlaps that need proper
suffix fallbacks are rare at word granularity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def build_bias_trie(phrases: list[list[int]], vocab_size: int, *,
                    pad_to: int | None = None) -> dict:
    """Compile token-id phrases into the dense-array trie.

    Empty phrases and phrases with out-of-range ids are dropped.
    Returns {"trans": [N, V] int32, "depth": [N] int32, "final": [N] bool}.

    pad_to: fixed node capacity — pads the arrays with edge-less nodes so
    different phrase lists share ONE compiled program (per-request serving
    biasing stacks padded tries on a leading batch axis); raises if the
    phrases need more nodes.
    """
    children: list[dict[int, int]] = [{}]
    depth = [0]
    final = [False]
    for ph in phrases:
        if not ph or any(not (0 <= t < vocab_size) for t in ph):
            continue
        cur = 0
        for tok in ph:
            nxt = children[cur].get(tok)
            if nxt is None:
                nxt = len(children)
                children.append({})
                depth.append(depth[cur] + 1)
                final.append(False)
                children[cur][tok] = nxt
            cur = nxt
        final[cur] = True
    import numpy as np
    N = len(children)
    if pad_to is not None:
        if N > pad_to:
            raise ValueError(f"boost phrases need {N} trie nodes > "
                             f"pad_to={pad_to}")
        depth = depth + [0] * (pad_to - N)
        final = final + [False] * (pad_to - N)
        N = pad_to
    trans = np.full((N, vocab_size), -1, np.int32)
    for node, edges in enumerate(children):
        for tok, child in edges.items():
            trans[node, tok] = child
    return {"trans": jnp.asarray(trans),
            "depth": jnp.asarray(depth, jnp.int32),
            "final": jnp.asarray(final)}


def load_phrases(path: str, vocab: dict[str, int], *,
                 bpe: bool = False) -> list[list[int]]:
    """Read one phrase per line and tokenize like training targets
    (char-level '▁'-separated words, or BPE when the vocab is subword)."""
    from e2e_asr_tpu.data import text as text_lib
    phrases = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if bpe:
                from e2e_asr_tpu.data.bpe import sentence_to_ids_bpe
                ids = sentence_to_ids_bpe(line, vocab, add_go_eos=False)
            else:
                ids = text_lib.sentence_to_ids(line, vocab, add_go_eos=False)
            phrases.append(list(ids))
    return phrases


def bias_step(trie: dict, node: Array, boost: float
              ) -> tuple[Array, Array]:
    """Score every candidate token for hypotheses at `node` [B, k].

    Returns (delta [B, k, V] additive score, targets [B, k, V]: the
    POST-selection node per candidate, final-commit restarts applied).

    The trie may be shared (`trans` [N, V]) or PER ROW (`trans` [B, N, V],
    stacked pad_to-sized tries — the serving engine's per-request hotword
    mode); both shapes produce the same [B, k, V] outputs."""
    trans, depth, final = trie["trans"], trie["depth"], trie["final"]
    if trans.ndim == 3:                           # per-row tries
        B, k = node.shape
        V = trans.shape[-1]
        row = jnp.take_along_axis(
            trans, jnp.broadcast_to(node[:, :, None], (B, k, V)), axis=1)
        restart = trans[:, 0, :][:, None, :]      # [B, 1, V]
        tgt = jnp.where(row >= 0, row, jnp.maximum(restart, 0))
        b_idx = jnp.arange(B)[:, None, None]
        delta = boost * (depth[b_idx, tgt]
                         - depth[jnp.arange(B)[:, None], node][:, :, None]
                         ).astype(jnp.float32)
        new_node = jnp.where(final[b_idx, tgt], 0, tgt)
        return delta, new_node
    row = trans[node]                             # [B, k, V]
    restart = trans[0][None, None, :]             # [1, 1, V]
    tgt = jnp.where(row >= 0, row, jnp.maximum(restart, 0))
    delta = boost * (depth[tgt]
                     - depth[node][:, :, None]).astype(jnp.float32)
    new_node = jnp.where(final[tgt], 0, tgt)
    return delta, new_node


def bias_select(targets: Array, parent: Array, token: Array) -> Array:
    """Advance: targets [B, k, V] from bias_step, parent/token [B, k]."""
    by_parent = jnp.take_along_axis(targets, parent[:, :, None], axis=1)
    return jnp.take_along_axis(by_parent, token[:, :, None],
                               axis=2)[:, :, 0]


def pending_bonus(trie: dict, node: Array, boost: float) -> Array:
    """The uncommitted partial-match bonus at `node` — subtract it from
    final scores so unfinished matches earn nothing."""
    depth = trie["depth"]
    if trie["trans"].ndim == 3:                   # per-row tries
        B = node.shape[0]
        return boost * depth[jnp.arange(B)[:, None],
                             node].astype(jnp.float32)
    return boost * depth[node].astype(jnp.float32)
