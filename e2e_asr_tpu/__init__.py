"""e2e_asr_tpu — a TPU-native (JAX/XLA/Pallas) attention encoder-decoder ASR framework.

Re-designed from scratch with the capabilities of the reference TF-1.x stack
(shtoshni/e2e_asr): pyramidal BiLSTM/GRU encoder, Bahdanau-attention LSTM decoder
with scheduled sampling, multitask auxiliary decoders, an interleaved weight-tied
RNN-LM task, on-device batched beam search with LM shallow fusion, bucketed
TFRecord data pipelines, and a training driver with checkpointing / LR decay /
early stopping.

One runtime, not two: training, greedy decode and beam decode are all jitted JAX
functions over the same parameter pytree (the reference split decoding across a
TF graph and a NumPy re-implementation; see /root/reference/main.py:217-222).
"""

__version__ = "0.1.0"
