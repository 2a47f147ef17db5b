"""Shared fusion-LM artifact loader for decode surfaces (eval CLI, HTTP
server, grid search): resolves a `-lm_path` file into the `lm_params` tree
the beam decoders fuse.

Three artifact kinds, discriminated by content:
- tools/train_ngram.py dense trigram tables ({"ngram": [V,V,V]}), fused
  through the same hooks as an RNN-LM (models/rnn_lm.fusion_step);
- tools/train_lm.py transformer LMs (self-describing named-npz with a
  "pos_emb" leaf, models/transformer_lm.py);
- RNN-LM checkpoints — possibly from a DIFFERENTLY-SHAPED run (an external
  LM, /root/reference/main.py:220-223; beam_search.py:111-134 reads the
  rnn_decoder_char tensors by name): merged by name-matching partial
  restore into a fresh params template, never a strict full-state restore.
"""
from __future__ import annotations

import numpy as np


def load_fusion_lm(lm_path: str, model_cfg, rev_vocab: list[str],
                   *, verbose: bool = True, max_steps: int | None = None):
    """Returns the lm_params tree for `lm_path`, or None when empty.

    max_steps: the decode's step cap — sizes the tied transformer-decoder
    LM view's position table as max(512, max_steps + 2), matching how
    beam_eval/serving size the in-jit fallback view (a too-small table is
    a trace-time error at fusion_init for long decodes)."""
    if not lm_path:
        return None
    import jax

    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.models import rnn_lm, seq2seq

    with np.load(lm_path) as z:
        is_ngram = "ngram" in z.files
        is_tlm = "pos_emb" in z.files
        if is_ngram:
            table = z["ngram"]
    if is_tlm:
        from e2e_asr_tpu.models import transformer_lm
        lm = transformer_lm.load_artifact(lm_path)
        V = lm["embedding"].shape[0]
        if V != len(rev_vocab):
            raise ValueError(
                f"transformer LM vocab {V} != {len(rev_vocab)} "
                f"(train it on this run's vocab)")
        if verbose:
            tc = transformer_lm.config_of(lm)
            print(f"Fusion LM: transformer {tc.blocks}x{tc.d_model} "
                  f"(heads {tc.heads}, horizon {tc.max_len})")
        return lm
    if is_ngram:
        if table.shape[-1] != len(rev_vocab):
            raise ValueError(
                f"ngram table vocab {table.shape[-1]} != {len(rev_vocab)} "
                f"(train it on this run's vocab)")
        if verbose:
            print(f"Fusion LM: trigram table {table.shape}")
        return {"ngram": table}
    lm_tree = ckpt_lib.partial_restore(
        seq2seq.init(jax.random.PRNGKey(0), model_cfg), lm_path,
        scope="decoder_char")
    horizon = 512 if max_steps is None else max(512, max_steps + 2)
    return rnn_lm.shared_lm_params(lm_tree,
                                   dec_cfg=model_cfg.decoders.get("char"),
                                   horizon=horizon)
