"""Convert reference TF-1.x checkpoints to this framework's parameter tree.

The canonical TF variable naming is pinned by the reference's own NumPy
runtime, which reloads checkpoint tensors by name
(/root/reference/beam_search.py:53-134, tf_utils.py:66-90), and was verified
against ground-truth checkpoints produced by real TF cells under the
reference's scopes (tools/tf_fixture.py, tests/test_tf_fixture.py) — in
particular the deep-decoder MultiRNNCell scope
`rnn/multi_rnn_cell/cell_{i}/basic_lstm_cell/...` (decoder.py:66-70).

Input format: an .npz archive of {tf_variable_name: array}. TensorFlow's
checkpoint bundle format requires TF to read; dump it once wherever TF is
available:

    import tensorflow as tf, numpy as np
    r = tf.train.NewCheckpointReader(ckpt_path)
    np.savez("ckpt.npz", **{n: r.get_tensor(n)
                            for n in r.get_variable_to_shape_map()
                            if "Adam" not in n})

(tools/tf_fixture.py automates this when TF is importable.)

Kernel layouts transfer 1:1: TF BasicLSTMCell kernels are [in+h, 4h] with
gate order i,j,f,o and a zero bias (+1 forget bias applied in-cell), exactly
this framework's convention (core/cells.py). TF GRUCell splits into
gates/candidate sub-layers, also this framework's layout.
"""
from __future__ import annotations

import re

import numpy as np

# Simple decoder-side tensors (beam_search.py:53-98). {tf_name: pytree path}
_DEC_MAP = {
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

# TF cell leaf name -> our pytree sub-path, per cell type.
_CELL_LEAVES = {
    True: {("kernel",): ("kernel",), ("bias",): ("bias",)},   # BasicLSTMCell
    False: {("gates", "kernel"): ("gates", "kernel"),         # GRUCell
            ("gates", "bias"): ("gates", "bias"),
            ("candidate", "kernel"): ("candidate", "kernel"),
            ("candidate", "bias"): ("candidate", "bias")},
}

# Checkpoint tensors that are never model parameters: optimizer slots
# ("Adam", "AdamLM", beta powers — tf_utils.py:88 excludes slots too) and the
# unnamed scalar counters (seq2seq_model.py:74-82, lm_model.py:54-62 create
# learning_rate/global_step/epoch as anonymous model/Variable{,_N}).
_NONPARAM = re.compile(
    r"(.*Adam.*|.*beta[12]_power.*|(.*/)?Variable(_\d+)?|.*global_step.*)$")


def _cell_name(use_lstm: bool) -> str:
    return "basic_lstm_cell" if use_lstm else "gru_cell"


def convert(tf_arrays: dict[str, np.ndarray], params: dict,
            *, tasks=("char",), use_lstm: bool = True,
            verbose: bool = True, strict: bool = False) -> dict:
    """Merge TF-named arrays into a pytree initialized by seq2seq.init.

    Returns a new params dict; leaves absent from the dump keep their values.
    Every tensor in `tf_arrays` must either be consumed or match the
    known-nonparameter patterns; leftovers are reported (and raise when
    `strict=True`) so silent drift in the name map cannot pass unnoticed.
    """
    import copy
    out = copy.deepcopy(jax_to_numpy(params))
    consumed: set[str] = set()

    def assign(tf_name: str, path, value) -> None:
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
        consumed.add(tf_name)

    cell = _cell_name(use_lstm)
    cell_leaves = _CELL_LEAVES[use_lstm]

    for task in tasks:
        for tf_name_tpl, path_tpl in _DEC_MAP.items():
            tf_name = tf_name_tpl.format(task=task)
            if tf_name not in tf_arrays:
                continue
            value = np.asarray(tf_arrays[tf_name])
            if tf_name.endswith("AttnW"):
                value = np.squeeze(value, axis=(0, 1))  # [1,1,H,A] -> [H,A]
            path = tuple(k.format(task=task) if isinstance(k, str) else k
                         for k in path_tpl)
            assign(tf_name, path, value)

        dec_scope = f"model/rnn_decoder_{task}/rnn"
        for tf_sub, our_sub in cell_leaves.items():
            # Internal "LM LSTM" (attn_decoder.py:47): first cell under rnn/.
            name = "/".join((dec_scope, cell) + tf_sub)
            if name in tf_arrays:
                assign(name, (f"decoder_{task}", "lm_cell") + our_sub,
                       np.asarray(tf_arrays[name]))
            # Single-layer main cell: uniquified to {cell}_1 because the lm
            # cell claimed the base name (beam_search.py:74-77).
            name = "/".join((dec_scope, f"{cell}_1") + tf_sub)
            if name in tf_arrays:
                assign(name, (f"decoder_{task}", "dec_cells", 0) + our_sub,
                       np.asarray(tf_arrays[name]))
            # Deep main cell: MultiRNNCell scopes (decoder.py:66-70), names
            # verified ground-truth by tools/tf_fixture.py.
            for i in range(16):
                name = "/".join(
                    (dec_scope, "multi_rnn_cell", f"cell_{i}", cell) + tf_sub)
                if name in tf_arrays:
                    assign(name, (f"decoder_{task}", "dec_cells", i) + our_sub,
                           np.asarray(tf_arrays[name]))

    # Encoder bidirectional layers (encoder.py:73-84 scope structure).
    for layer in range(1, 16):
        for direction in ("fw", "bw"):
            base = (f"model/encoder/RNNLayer{layer}/bidirectional_rnn/"
                    f"{direction}/{cell}")
            for tf_sub, our_sub in cell_leaves.items():
                name = "/".join((base,) + tf_sub)
                if name in tf_arrays:
                    assign(name, ("encoder", f"layer_{layer}", direction)
                           + our_sub, np.asarray(tf_arrays[name]))

    unmatched = sorted(n for n in tf_arrays
                       if n not in consumed and not _NONPARAM.match(n))
    if verbose:
        print(f"convert: merged {len(consumed)} tensors")
        for n in unmatched:
            print(f"convert: UNMATCHED reference tensor: {n} "
                  f"{np.asarray(tf_arrays[n]).shape}")
    if strict and unmatched:
        raise ValueError(
            f"{len(unmatched)} reference tensors not consumed: {unmatched}")
    return out


def export_tf_names(params: dict, *, tasks=("char",),
                    use_lstm: bool = True) -> dict[str, np.ndarray]:
    """Inverse of convert(): dump this framework's parameters under the
    reference's canonical TF variable names (beam_search.py:53-134 +
    ground-truth cell scopes), so reference-side tooling — including its
    NumPy beam runtime — can consume models trained here. Round-tripped
    against real TF dumps in tests/test_tf_fixture.py."""
    def get(path):
        node = params
        for k in path:
            node = node[k]
        return np.asarray(node)

    out: dict[str, np.ndarray] = {}
    cell = _cell_name(use_lstm)
    cell_leaves = _CELL_LEAVES[use_lstm]
    for task in tasks:
        dec = params.get(f"decoder_{task}")
        if dec is None:
            continue
        for tf_tpl, path_tpl in _DEC_MAP.items():
            path = tuple(k.format(task=task) if isinstance(k, str) else k
                         for k in path_tpl)
            try:
                value = get(path)
            except (KeyError, IndexError, TypeError):
                continue          # optional leaves (simple_proj, ind softmax)
            name = tf_tpl.format(task=task)
            if name.endswith("AttnW"):
                value = value[None, None]          # [H,A] -> [1,1,H,A]
            out[name] = value
        scope = f"model/rnn_decoder_{task}/rnn"
        for tf_sub, our_sub in cell_leaves.items():
            out["/".join((scope, cell) + tf_sub)] = get(
                (f"decoder_{task}", "lm_cell") + our_sub)
        n_dec = len(dec["dec_cells"])
        for i in range(n_dec):
            base = ((scope, f"{cell}_1") if n_dec == 1 else
                    (scope, "multi_rnn_cell", f"cell_{i}", cell))
            for tf_sub, our_sub in cell_leaves.items():
                out["/".join(base + tf_sub)] = get(
                    (f"decoder_{task}", "dec_cells", i) + our_sub)
    for lname, layer in params.get("encoder", {}).items():
        idx = lname.split("_")[1]
        for d in ("fw", "bw"):
            if d not in layer:
                continue
            base = (f"model/encoder/RNNLayer{idx}/bidirectional_rnn/{d}/"
                    f"{cell}")
            for tf_sub, our_sub in cell_leaves.items():
                node = layer[d]
                for k in our_sub:
                    node = node[k]
                out["/".join((base,) + tf_sub)] = np.asarray(node)
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

    # Conversion is pure host work; don't spin up an accelerator runtime.
    jax.config.update("jax_platforms", "cpu")

    argv = list(sys.argv[1:] if argv is None else argv)
    npz_path, out_dir = argv[0], argv[1]
    parser = argparse.ArgumentParser()
    config_lib.add_parse_options(parser)
    parser.add_argument("-strict", default=False, action="store_true",
                        help="Fail if any reference tensor goes unconsumed")
    parser.add_argument("-vocab_size", default=0, type=int,
                        help="Decoder vocab size (the reference CLI derives "
                        "it from the vocab files; set it explicitly here)")
    opts = vars(parser.parse_args(argv[2:]))
    strict = opts.pop("strict")
    vocab_size = opts.pop("vocab_size")
    cfg = config_lib.process_args(opts)
    if vocab_size > 0:
        for dec in cfg.model.decoders.values():
            dec.vocab_size = vocab_size
        cfg.lm.vocab_size = vocab_size

    params = seq2seq.init(jax.random.PRNGKey(0), cfg.model)
    converted = convert_npz(npz_path, params, tasks=tuple(cfg.model.tasks),
                            use_lstm=cfg.model.encoder.use_lstm,
                            strict=strict)
    path = ckpt_lib.save(out_dir, "asr.ckpt", 0, converted,
                         meta={"converted_from": npz_path})
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
