"""Convert reference TF-1.x checkpoints to this framework's parameter tree.

The canonical TF variable naming is pinned by the reference's own NumPy
runtime, which reloads checkpoint tensors by name
(/root/reference/beam_search.py:53-134, tf_utils.py:66-90). This module maps
those names onto the e2e_asr_tpu pytree so reference-trained models can be
evaluated here for WER parity.

Input format: an .npz archive of {tf_variable_name: array}. TensorFlow's
checkpoint bundle format requires TF to read; dump it once wherever TF is
available:

    import tensorflow as tf, numpy as np
    r = tf.train.NewCheckpointReader(ckpt_path)
    np.savez("ckpt.npz", **{n: r.get_tensor(n)
                            for n in r.get_variable_to_shape_map()
                            if "Adam" not in n})

Kernel layouts transfer 1:1: TF BasicLSTMCell kernels are [in+h, 4h] with
gate order i,j,f,o and a zero bias (+1 forget bias applied in-cell), exactly
this framework's convention (core/cells.py).
"""
from __future__ import annotations

import numpy as np

# Decoder-side map (beam_search.py:53-98). {tf_name: pytree path}
_DEC_MAP = {
    "model/rnn_decoder_{task}/rnn/basic_lstm_cell/kernel":
        ("decoder_{task}", "lm_cell", "kernel"),
    "model/rnn_decoder_{task}/rnn/basic_lstm_cell/bias":
        ("decoder_{task}", "lm_cell", "bias"),
    "model/rnn_decoder_{task}/rnn/basic_lstm_cell_1/kernel":
        ("decoder_{task}", "dec_cells", 0, "kernel"),
    "model/rnn_decoder_{task}/rnn/basic_lstm_cell_1/bias":
        ("decoder_{task}", "dec_cells", 0, "bias"),
    "model/rnn_decoder_{task}/rnn/Attention/kernel":
        ("decoder_{task}", "attn_query", "kernel"),
    "model/rnn_decoder_{task}/rnn/Attention/bias":
        ("decoder_{task}", "attn_query", "bias"),
    "model/rnn_decoder_{task}/rnn/InputProjection/kernel":
        ("decoder_{task}", "input_proj", "kernel"),
    "model/rnn_decoder_{task}/rnn/InputProjection/bias":
        ("decoder_{task}", "input_proj", "bias"),
    "model/rnn_decoder_{task}/rnn/AttnProjection/kernel":
        ("decoder_{task}", "attn_proj", "kernel"),
    "model/rnn_decoder_{task}/rnn/AttnProjection/bias":
        ("decoder_{task}", "attn_proj", "bias"),
    "model/rnn_decoder_{task}/rnn/OutputProjection/kernel":
        ("decoder_{task}", "output_proj", "kernel"),
    "model/rnn_decoder_{task}/rnn/OutputProjection/bias":
        ("decoder_{task}", "output_proj", "bias"),
    "model/rnn_decoder_{task}/rnn/OutputProjection2/kernel":
        ("decoder_{task}", "output_proj_ind", "kernel"),
    "model/rnn_decoder_{task}/rnn/OutputProjection2/bias":
        ("decoder_{task}", "output_proj_ind", "bias"),
    "model/rnn_decoder_{task}/rnn/SimpleProjection/kernel":
        ("decoder_{task}", "simple_proj", "kernel"),
    "model/rnn_decoder_{task}/rnn/SimpleProjection/bias":
        ("decoder_{task}", "simple_proj", "bias"),
    "model/rnn_decoder_{task}/decoder/embedding":
        ("decoder_{task}", "embedding"),
    # AttnW is a [1,1,attn_size,A] conv kernel in TF; squeezed to [attn_size,A]
    # (beam_search.py:94).
    "model/rnn_decoder_{task}/AttnW": ("decoder_{task}", "attn_w"),
    "model/rnn_decoder_{task}/AttnV": ("decoder_{task}", "attn_v"),
}


def _encoder_names(layer: int, direction: str, use_lstm: bool):
    cell = "basic_lstm_cell" if use_lstm else "gru_cell"
    base = (f"model/encoder/RNNLayer{layer}/bidirectional_rnn/{direction}/"
            f"{cell}")
    return base


def convert(tf_arrays: dict[str, np.ndarray], params: dict,
            *, tasks=("char",), use_lstm: bool = True,
            verbose: bool = True) -> dict:
    """Merge TF-named arrays into a pytree initialized by seq2seq.init.

    Returns a new params dict; leaves absent from the dump keep their values.
    """
    import copy
    out = copy.deepcopy(jax_to_numpy(params))
    n = 0

    def assign(path, value):
        nonlocal n
        node = out
        for key in path[:-1]:
            if isinstance(key, int):
                if key >= len(node):
                    return
                node = node[key]
            else:
                if key not in node:
                    return
                node = node[key]
        last = path[-1]
        if isinstance(last, int):
            if last >= len(node):
                return
        elif last not in node:
            return
        target = node[last]
        if np.asarray(target).shape != value.shape:
            if verbose:
                print(f"convert: shape mismatch at {path}: "
                      f"{value.shape} vs {np.asarray(target).shape} — skipped")
            return
        node[last] = value.astype(np.float32)
        n += 1

    for task in tasks:
        for tf_name_tpl, path_tpl in _DEC_MAP.items():
            tf_name = tf_name_tpl.format(task=task)
            if tf_name not in tf_arrays:
                continue
            value = np.asarray(tf_arrays[tf_name])
            if tf_name.endswith("AttnW"):
                value = np.squeeze(value)     # [1,1,H,A] -> [H,A]
            path = tuple(k.format(task=task) if isinstance(k, str) else k
                         for k in path_tpl)
            assign(path, value)
        # Deep decoders: basic_lstm_cell_{i+1} -> dec_cells[i]
        for i in range(1, 8):
            for leaf in ("kernel", "bias"):
                tf_name = (f"model/rnn_decoder_{task}/rnn/"
                           f"basic_lstm_cell_{i + 1}/{leaf}")
                if tf_name in tf_arrays:
                    assign((f"decoder_{task}", "dec_cells", i, leaf),
                           np.asarray(tf_arrays[tf_name]))

    # Encoder bidirectional layers (encoder.py:73-84 scope structure).
    for layer in range(1, 16):
        for tf_dir, ours in (("fw", "fw"), ("bw", "bw")):
            base = _encoder_names(layer, tf_dir, use_lstm)
            if use_lstm:
                leaves = {"kernel": "kernel", "bias": "bias"}
                for tf_leaf, our_leaf in leaves.items():
                    name = f"{base}/{tf_leaf}"
                    if name in tf_arrays:
                        assign(("encoder", f"layer_{layer}", ours, our_leaf),
                               np.asarray(tf_arrays[name]))
            else:
                for tf_leaf, path_leaf in (
                        ("gates/kernel", ("gates", "kernel")),
                        ("gates/bias", ("gates", "bias")),
                        ("candidate/kernel", ("candidate", "kernel")),
                        ("candidate/bias", ("candidate", "bias"))):
                    name = f"{base}/{tf_leaf}"
                    if name in tf_arrays:
                        assign(("encoder", f"layer_{layer}", ours) +
                               path_leaf, np.asarray(tf_arrays[name]))

    if verbose:
        print(f"convert: merged {n} tensors")
    return out


def jax_to_numpy(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def convert_npz(npz_path: str, params: dict, **kw) -> dict:
    with np.load(npz_path) as z:
        tf_arrays = {k: z[k] for k in z.files}
    return convert(tf_arrays, params, **kw)


def main(argv=None) -> None:
    """CLI: convert a TF-named npz dump into an e2e_asr_tpu checkpoint.

    python -m e2e_asr_tpu.tools.convert_tf_ckpt dump.npz out_dir \\
        [reference CLI flags to describe the model, e.g. -tasks p -hsize 256]
    """
    import argparse
    import sys

    import jax

    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.models import seq2seq

    argv = list(sys.argv[1:] if argv is None else argv)
    npz_path, out_dir = argv[0], argv[1]
    parser = argparse.ArgumentParser()
    config_lib.add_parse_options(parser)
    opts = vars(parser.parse_args(argv[2:]))
    cfg = config_lib.process_args(opts)

    params = seq2seq.init(jax.random.PRNGKey(0), cfg.model)
    converted = convert_npz(npz_path, params, tasks=tuple(cfg.model.tasks),
                            use_lstm=cfg.model.encoder.use_lstm)
    path = ckpt_lib.save(out_dir, "asr.ckpt", 0, converted,
                         meta={"converted_from": npz_path})
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
