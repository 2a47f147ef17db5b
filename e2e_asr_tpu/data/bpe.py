"""Subword (BPE) tokenization — single-vocab-file, SentencePiece-style.

Extension (no reference counterpart: /root/reference is strictly
character-level, data_utils.py:35-62). Modern ASR recipes use subword
targets; this module adds them WITHOUT changing any interchange format:

- Pieces are SentencePiece-style: "▁" marks a word start and is part of the
  piece ("▁the", "ing"). `text.ids_to_sentence` already decodes such vocabs
  unchanged ("".join(pieces).replace("▁", " ")), so scoring, evaluators,
  beam search, and the LM task all work on BPE targets with zero changes.
- The learned vocabulary is a plain one-token-per-line file (the reference's
  vocab format, data/text.py): merged symbols are appended in merge-creation
  order, so the FILE ORDER ENCODES THE MERGE PRIORITY. Encoding needs no
  sidecar merges file — apply the mergeable pair whose merged token has the
  lowest vocab index, repeatedly (exactly the training-time merge order).
  One artifact, fully self-describing.
- Training is classic BPE (Sennrich et al. 2016) over word-frequency counts
  with deterministic tie-breaking (count desc, then lexicographic), so a
  given corpus always yields the same vocab.

Unknown characters at encode time are dropped (the char-level encoder maps
them to <pad>, which the detokenizer treats as end-of-sequence — silently
truncating; dropping is strictly safer for subwords).
"""
from __future__ import annotations

from collections import Counter

from e2e_asr_tpu.data.text import GO_ID, EOS_ID, START_VOCAB

WORD_MARK = "▁"


def train_bpe(transcripts: list[str], vocab_size: int) -> list[str]:
    """Learn a BPE vocabulary. Returns the rev_vocab list (specials, base
    symbols, then merged symbols in merge order — write with
    text.write_vocabulary). vocab_size caps the TOTAL list length."""
    word_freq: Counter[tuple[str, ...]] = Counter()
    chars: set[str] = set()
    for t in transcripts:
        for word in t.split():
            word_freq[(WORD_MARK,) + tuple(word)] += 1
            chars.update(word)

    base = START_VOCAB + [WORD_MARK] + sorted(chars)
    if vocab_size < len(base):
        raise ValueError(f"vocab_size {vocab_size} < base vocabulary "
                         f"{len(base)} (specials + chars)")
    merged: list[str] = []
    words = dict(word_freq)

    while len(base) + len(merged) < vocab_size:
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, freq in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # Deterministic: highest count, lexicographically smallest pair.
        (a, b), count = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if count < 2:
            break                       # singleton merges add nothing
        merged.append(a + b)
        new_words = {}
        for sym, freq in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + freq
        words = new_words
    return base + merged


def is_bpe_vocab(rev_vocab: list[str]) -> bool:
    """A vocab is subword iff any non-special token is multi-character
    (the reference char vocab has only 1-char tokens past the specials and
    the SWBD compact symbols, which this deliberately treats as BPE-free)."""
    for tok in rev_vocab[len(START_VOCAB):]:
        if len(tok) > 1 and tok not in ("<sp>",):
            return True
    return False


def encode_word(word: str, vocab: dict[str, int]) -> list[int]:
    """BPE-encode one word (without the leading space): start from
    ["▁", c1, ..., cn], repeatedly apply the mergeable pair whose merged
    token has the LOWEST vocab index (= training merge order)."""
    # Drop characters the vocab cannot express at all (see module note).
    syms = [s for s in [WORD_MARK] + list(word) if s in vocab]
    if not syms:
        return []
    while len(syms) > 1:
        best_idx, best_rank = -1, None
        for i in range(len(syms) - 1):
            cand = syms[i] + syms[i + 1]
            rank = vocab.get(cand)
            if rank is not None and (best_rank is None or rank < best_rank):
                best_idx, best_rank = i, rank
        if best_rank is None:
            break
        syms[best_idx:best_idx + 2] = [syms[best_idx] + syms[best_idx + 1]]
    return [vocab[s] for s in syms]


def sentence_to_ids_bpe(sentence: str, vocab: dict[str, int],
                        *, add_go_eos: bool = True) -> list[int]:
    """Sentence -> BPE token ids (the subword analogue of
    text.sentence_to_ids; decode with the unchanged text.ids_to_sentence)."""
    ids: list[int] = []
    for word in sentence.split():
        ids.extend(encode_word(word, vocab))
    if add_go_eos:
        return [GO_ID] + ids + [EOS_ID]
    return ids
