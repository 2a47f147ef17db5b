"""Export an int8 weight-only quantized serving artifact from a checkpoint.

Extension (no reference counterpart): `python -m
e2e_asr_tpu.tools.quantize_ckpt in.npz out.npz [-ema]` reads a training
checkpoint (core/checkpoint.py naming), quantizes the params subtree
(core/quant.py, per-output-channel symmetric int8), and writes a ~4x smaller
artifact holding ONLY the inference weights — no optimizer slots, no
counters. Load it back with `core.quant.load_artifact(path, params_template)`
and feed the QuantState straight to any evaluator (GreedyEvaluator /
BeamEvaluator / CTCEvaluator dequantize inside their jitted closures).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def quantize_checkpoint(in_path: str, out_path: str, *,
                        use_ema: bool = False) -> dict:
    from e2e_asr_tpu.core import quant

    arch = np.load(in_path)
    prefix = "ema_params/" if use_ema else "params/"
    named = {n[len(prefix):]: arch[n] for n in arch.files
             if n.startswith(prefix)}
    if not named:
        raise ValueError(f"no '{prefix}' leaves in {in_path} "
                         f"({'train with -ema_decay' if use_ema else 'not a checkpoint?'})")
    # Rebuild the nested params dict from the "/"-joined names.
    params: dict = {}
    for name, arr in named.items():
        node = params
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    if "lora" in params:
        # LoRA checkpoints quantize the MERGED view. alpha comes from the
        # run's own parameters.txt when the checkpoint sits in its run dir;
        # otherwise the -lora_alpha default (alpha = rank, unit scale).
        from e2e_asr_tpu.core import lora as lora_lib
        alpha = 0.0
        ptxt = os.path.join(os.path.dirname(os.path.abspath(in_path)),
                            "parameters.txt")
        if os.path.isfile(ptxt):
            from e2e_asr_tpu import config as config_lib
            mcfg = config_lib.config_from_text(open(ptxt).read()).model
            alpha = lora_lib.resolve_alpha(max(mcfg.lora_rank, 1),
                                           mcfg.lora_alpha)
        params = lora_lib.maybe_merge(params, alpha)
        print("Merged LoRA adapters into the kernels before quantization")
    quant.save_artifact(out_path, params,
                        meta={"source": os.path.basename(in_path),
                              "ema": use_ema})
    in_size = os.path.getsize(in_path)
    out_size = os.path.getsize(out_path)
    stats = {"in_bytes": in_size, "out_bytes": out_size,
             "ratio": out_size / in_size, "leaves": len(named)}
    print(f"{in_path} ({in_size/1e6:.2f} MB) -> {out_path} "
          f"({out_size/1e6:.2f} MB), {stats['ratio']:.2%} of the full "
          f"checkpoint ({len(named)} param leaves)")
    return stats


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("in_ckpt")
    ap.add_argument("out_artifact")
    ap.add_argument("-ema", action="store_true",
                    help="quantize the EMA shadow weights instead of the "
                         "raw params (needs a -ema_decay checkpoint)")
    a = ap.parse_args()
    quantize_checkpoint(a.in_ckpt, a.out_artifact, use_ema=a.ema)


if __name__ == "__main__":
    main()
