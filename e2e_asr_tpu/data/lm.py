"""LM dataset: TFRecord char sequences -> fixed-shape batches
(/root/reference/lm_dataset.py)."""
from __future__ import annotations

import numpy as np

from e2e_asr_tpu.data import example as pb
from e2e_asr_tpu.data import tfrecord
from e2e_asr_tpu.data.speech import TOKEN_QUANTUM, _round_up


class LMDataset:
    def __init__(self, files: list[str], batch_size: int, *, seed: int = 10,
                 cap: int | None = None):
        self.seqs: list[np.ndarray] = []
        for path in sorted(files):
            for rec in tfrecord.read_records(path):
                _, seqs = pb.decode_sequence_example(rec)
                if seqs.get("cint"):
                    ids = np.concatenate(
                        [np.asarray(x, np.int64) for x in seqs["cint"]])
                    self.seqs.append(ids.astype(np.int32))
        self.batch_size = batch_size
        max_len = max((len(s) for s in self.seqs), default=2)
        self.cap = cap or _round_up(max_len, TOKEN_QUANTUM)
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.seqs)

    def epoch(self):
        """Shuffled fixed-shape batches, drop remainder.

        Returns dicts {"char": [B, cap] int32, "char_len": [B] int32} with
        char_len counting shifted targets (len-1)."""
        order = np.arange(len(self.seqs))
        self._rng.shuffle(order)
        B = self.batch_size
        n_full = len(order) // B
        for bi in range(n_full):
            chunk = order[bi * B:(bi + 1) * B]
            batch_ids = np.zeros((B, self.cap), np.int32)
            lens = np.zeros((B,), np.int32)
            for i, idx in enumerate(chunk):
                seq = self.seqs[idx][: self.cap]
                batch_ids[i, : len(seq)] = seq
                lens[i] = max(len(seq) - 1, 1)
            yield {"char": batch_ids, "char_len": lens}
