"""AOT-exported serving artifacts (jax.export / StableHLO).

Extension (no reference counterpart — the reference redeploys Python code
plus checkpoints and rebuilds its TF graph at startup,
/root/reference/main.py:173-215). An exported artifact pins the EXACT
decode computation at export time:

- **Pinned behavior**: the serialized StableHLO is what runs — later model-
  code changes, flag drift, or dependency bumps cannot silently change a
  deployed model's transcripts (jax.export versions its calling convention
  and IR compatibility window).
- **No tracing at startup**: serving hosts skip Python tracing/lowering
  entirely (the usual multi-second cold-start per (bucket, batch) shape);
  XLA still compiles the deserialized IR once per process, which the
  persistent compilation cache (``-compile_cache``, core/cache.py) then
  eliminates across restarts.
- **Self-contained**: one directory holds the per-bucket programs, the
  parameters (float or int8 QuantState — the dequantize lives INSIDE the
  exported program), the vocab, and the config; `load_artifact()` needs no
  run dir, vocab dir, or flags.

The exported function is the SAME family decoder the serving engine batches
(eval/serving._make_family_decoder), so attention/CTC/transducer beams, LM
fusion/rescoring, and int8 dequantize all ride along; parity with the live
decoder is pinned by tests/test_export_model.py.

Usage:
    python -m e2e_asr_tpu.tools.export_model -out DIR \
        -vocab_dir VOCAB -tb_dir MODELS [-run_id N ...model flags...] \
        [-buckets 128,256,512] [-batch 8] [-platforms cpu,tpu] \
        [-beam_size 4] [-lm_path ... -lm_weight w] [-int8] \
        [-eval_ema] [-eval_avg_ckpts N] [-boost_phrases F -boost_weight w]

The CLI honors the SAME weight-selection and decode flags as the eval CLI
(-eval_ema, -eval_avg_ckpts, -quantize int8, -boost_phrases), so the flag
line that produced a validated WER exports exactly those weights/behavior.

Then, anywhere (no flags, no vocab, no checkpoints):
    from e2e_asr_tpu.tools.export_model import load_artifact
    dec = load_artifact("DIR")
    print(dec.transcribe(feats))          # [T, feat] float32 log-mels
"""
from __future__ import annotations

import contextlib
import json
import os
from os import path

import numpy as np

FORMAT_VERSION = 2
_MANIFEST = "manifest.json"
_PARAMS = "params.npz"


def _program_name(bucket: int, batch: int) -> str:
    return f"program_b{bucket}_n{batch}.bin"


_REGISTERED = False


def _register_serializations() -> None:
    """jax.export serializes input PyTreeDefs; custom containers (the int8
    QuantState NamedTuple) must be registered once per process."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jax_export

    from e2e_asr_tpu.core import quant
    jax_export.register_namedtuple_serialization(
        quant.QuantState, serialized_name="e2e_asr_tpu.core.quant.QuantState")
    _REGISTERED = True


@contextlib.contextmanager
def _force_xla_compute():
    """Trace the pure-XLA compute paths (no Pallas, no mega-kernel).

    Kernel selection (core/rnn.use_pallas_lstm and every ops/_interpret())
    happens at TRACE time from the HOST's default backend — it knows nothing
    about the export's target platforms. Tracing Pallas for a non-TPU
    target fails to lower (tpu_custom_call on cpu); tracing from a non-TPU
    host for a TPU target would silently bake interpret-mode EMULATION HLO
    into the deployed program. Forcing the XLA scan paths produces programs
    that lower and run natively on every requested platform."""
    old = os.environ.get("E2E_ASR_NO_PALLAS")
    os.environ["E2E_ASR_NO_PALLAS"] = "1"
    try:
        yield
    finally:
        if old is None:
            del os.environ["E2E_ASR_NO_PALLAS"]
        else:
            os.environ["E2E_ASR_NO_PALLAS"] = old


def _nest_named(named: dict[str, np.ndarray]) -> dict:
    """Rebuild a plain nested-dict pytree from "/"-joined leaf names (the
    fusion-LM trees are plain dicts — lm_loader.load_fusion_lm — so their
    structure is fully determined by the names, no template needed)."""
    root: dict = {}
    for name, leaf in named.items():
        parts = name.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = leaf
    return root


def export_artifact(out_dir: str, params, cfg, rev_vocab: list[str], *,
                    beam_cfg=None, bucket_frames=(128, 256, 512),
                    batch_size: int = 8, lm_params=None, bias=None,
                    compute_dtype=None, platforms=None) -> dict:
    """Export `params` + the family decoder as a self-contained artifact.

    params: float pytree or core.quant.QuantState (int8 weight-only —
    dequantize is traced into the program, so the artifact stays ~4x
    smaller AND the program serves it directly).
    lm_params: fusion-LM tree (eval/lm_loader.py) — a PROGRAM INPUT stored
    once in params.npz (never baked as per-bucket StableHLO constants).
    bias: (trie, boost_weight) engine-level contextual biasing
    (eval/biasing.py); trie arrays are small and baked into the programs.
    platforms: lowering targets, e.g. ("cpu", "tpu"); None = the current
    default backend only. Cross-platform export works from any host — the
    TPU lowering does not need a TPU attached. The fused Pallas kernels are
    traced in only for a single-target TPU export from a TPU host; every
    other combination pins the (equivalent, exactness-tested) XLA paths so
    the program is native on each target.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.core import quant
    from e2e_asr_tpu.eval.serving import _make_family_decoder

    _register_serializations()
    beam_cfg = beam_cfg or config_lib.BeamConfig(
        beam_size=4, max_steps=cfg.max_output["char"])
    bucket_frames = tuple(sorted(int(b) for b in bucket_frames))
    platforms = tuple(platforms) if platforms else (
        jax.default_backend(),)
    native = platforms == ("tpu",) and jax.default_backend() == "tpu"
    guard = contextlib.nullcontext() if native else _force_xla_compute()

    # The params AND the fusion LM ride as one input pytree; the decoder
    # closure is rebuilt per trace so the LM leaves are traced arguments.
    bundle = {"model": params}
    if lm_params is not None:
        bundle["lm"] = lm_params

    def fn(b, feats, lens):
        fam = _make_family_decoder(cfg, beam_cfg,
                                   compute_dtype=compute_dtype,
                                   lm_params=b.get("lm"), bias=bias)
        return fam(b["model"], {"logmel": feats, "logmel_len": lens})

    b_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        bundle)
    os.makedirs(out_dir, exist_ok=True)
    sizes = {}
    with guard:
        jitted = jax.jit(fn)
        for bucket in bucket_frames:
            f_spec = jax.ShapeDtypeStruct(
                (batch_size, bucket, cfg.feat_length), jnp.float32)
            l_spec = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
            exp = jax_export.export(jitted, platforms=platforms)(
                b_spec, f_spec, l_spec)
            blob = exp.serialize()
            name = _program_name(bucket, batch_size)
            with open(path.join(out_dir, name), "wb") as f:
                f.write(blob)
            sizes[name] = len(blob)

    named = ckpt_lib.flatten_named(bundle)
    with open(path.join(out_dir, _PARAMS), "wb") as f:
        np.savez(f, **named)

    exp_cfg = config_lib.ExperimentConfig(model=cfg, beam=beam_cfg)
    manifest = {
        "format_version": FORMAT_VERSION,
        "family": cfg.model_family,
        "feat_length": cfg.feat_length,
        "bucket_frames": list(bucket_frames),
        "batch_size": batch_size,
        "platforms": list(platforms),
        "kernels": "tpu-pallas" if native else "xla",
        "quantized": isinstance(params, quant.QuantState),
        "has_lm": lm_params is not None,
        "has_bias": bias is not None,
        "boost_weight": float(bias[1]) if bias is not None else 0.0,
        "compute_dtype": ("bfloat16" if compute_dtype == jnp.bfloat16
                          else "float32"),
        "vocab": list(rev_vocab),
        "config_text": config_lib.config_to_text(exp_cfg),
        "jax_version": jax.__version__,
        "program_bytes": sizes,
    }
    with open(path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


class ExportedDecoder:
    """Serve an exported artifact: pick the bucket, pad, run the pinned
    program, detokenize — the serving engine's per-batch recipe without
    any model code in the decode path."""

    def __init__(self, art_dir: str):
        import jax
        from jax import export as jax_export

        from e2e_asr_tpu import config as config_lib
        from e2e_asr_tpu.core import checkpoint as ckpt_lib
        from e2e_asr_tpu.core import quant
        from e2e_asr_tpu.train import step as step_lib

        _register_serializations()
        with open(path.join(art_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.manifest['format_version']} != "
                f"this framework's {FORMAT_VERSION}")
        self.rev_vocab = self.manifest["vocab"]
        self.buckets = tuple(self.manifest["bucket_frames"])
        self.batch_size = int(self.manifest["batch_size"])
        self.feat_length = int(self.manifest["feat_length"])
        exp_cfg = config_lib.config_from_text(self.manifest["config_text"])
        self.cfg = exp_cfg.model
        self.beam_cfg = exp_cfg.beam

        # Rebuild the exact input pytree: model template from the config's
        # own init (quantized artifacts re-derive the QuantState skeleton —
        # quantize() is shape-deterministic), fusion-LM tree from the leaf
        # names alone (plain nested dicts), leaves from the npz.
        template = step_lib.init_params(jax.random.PRNGKey(0), self.cfg)
        if self.manifest["quantized"]:
            template = quant.quantize(template)
        with np.load(path.join(art_dir, _PARAMS)) as z:
            named = {k: z[k] for k in z.files}
        model_named = {k[len("model/"):]: v for k, v in named.items()
                       if k.startswith("model/")}
        bundle = {"model": ckpt_lib.unflatten_named(template, model_named)}
        lm_named = {k[len("lm/"):]: v for k, v in named.items()
                    if k.startswith("lm/")}
        if lm_named:
            bundle["lm"] = _nest_named(lm_named)
        # Device-resident once: numpy leaves would re-transfer the whole
        # tree host->device on EVERY program call.
        self.bundle = jax.tree_util.tree_map(jax.device_put, bundle)
        self.params = self.bundle["model"]

        self.programs = {}
        self._calls = {}
        for bucket in self.buckets:
            name = _program_name(bucket, self.batch_size)
            with open(path.join(art_dir, name), "rb") as f:
                exp = jax_export.deserialize(f.read())
            self.programs[bucket] = exp
            # Exported.call re-stages on every invocation (measured 2.5 s
            # per warm call vs 0.12 s live on the chip); one jit wrapper
            # restores the compiled-executable fast path.
            self._calls[bucket] = jax.jit(exp.call)

    def decode_batch(self, feats_list: list[np.ndarray]) -> list[str]:
        """Transcribe up to batch_size utterances ([T, feat] float32 each)
        in one program call (same padding contract as eval/serving.py)."""
        from e2e_asr_tpu.data import text

        if not feats_list:
            return []
        if len(feats_list) > self.batch_size:
            raise ValueError(f"{len(feats_list)} utterances > artifact "
                             f"batch size {self.batch_size}")
        longest = max(f.shape[0] for f in feats_list)
        try:
            bucket = next(b for b in self.buckets if longest <= b)
        except StopIteration:
            raise ValueError(
                f"utterance of {longest} frames exceeds the largest "
                f"exported bucket ({self.buckets[-1]})") from None
        B = self.batch_size
        feats = np.zeros((B, bucket, self.feat_length), np.float32)
        lens = np.ones((B,), np.int32)
        for i, f in enumerate(feats_list):
            feats[i, : f.shape[0]] = np.asarray(f, np.float32)
            lens[i] = f.shape[0]
        tokens, _, _ = self._calls[bucket](self.bundle, feats, lens)
        tokens = np.asarray(tokens)
        out = []
        for i in range(len(feats_list)):
            sent = text.ids_to_sentence(tokens[i], self.rev_vocab)
            _, words = text.get_relevant_words(sent)
            out.append(" ".join(words))
        return out

    def transcribe(self, feats: np.ndarray) -> str:
        return self.decode_batch([feats])[0]


def load_artifact(art_dir: str) -> ExportedDecoder:
    return ExportedDecoder(art_dir)


def build_parser():
    import argparse

    from e2e_asr_tpu import config as config_lib

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-out", required=True, help="artifact directory")
    parser.add_argument("-buckets", default="128,256,512",
                        help="comma-separated frame buckets to export")
    parser.add_argument("-batch", type=int, default=8,
                        help="batch size baked into every program")
    parser.add_argument("-platforms", default="",
                        help="comma-separated lowering targets (cpu,tpu); "
                             "default = the current backend")
    parser.add_argument("-int8", action="store_true",
                        help="quantize weights (core/quant.py) before "
                             "export; dequantize is traced into the "
                             "programs")
    parser.add_argument("-ckpt", type=str, default="",
                        help="explicit checkpoint file (else best/latest "
                             "from the run dir)")
    parser.add_argument("-allow_fresh_init", action="store_true",
                        help="export random-init weights when no "
                             "checkpoint is found (default: error — a "
                             "deploy artifact of untrained weights is "
                             "almost always a typo'd -tb_dir/-run_id)")
    config_lib.add_parse_options(parser)
    return parser


def main(argv=None) -> dict:
    import jax

    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.core import quant
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.train import step as step_lib

    args = vars(build_parser().parse_args(argv))
    out_dir = args.pop("out")
    buckets = [int(b) for b in args.pop("buckets").split(",")]
    batch = args.pop("batch")
    platforms = [p for p in args.pop("platforms").split(",") if p]
    int8 = args.pop("int8")
    ckpt_file = args.pop("ckpt")
    allow_fresh = args.pop("allow_fresh_init")

    vocab, rev_vocab = text.initialize_vocabulary(
        path.join(args["vocab_dir"], "char.vocab"))
    cfg = config_lib.process_args(args, {"char": len(rev_vocab)})
    tc = cfg.train
    if tc.platform:
        # Same contract as the train/eval CLI (cli/main.py): -platform
        # forces the backend BEFORE first device use (startup hooks may
        # pin JAX_PLATFORMS at interpreter start, so env vars are too
        # late by now).
        jax.config.update("jax_platforms", tc.platform)

    # Weight selection mirrors the eval CLI (cli/main.py) so the flag line
    # that produced a validated WER exports exactly those weights:
    # -eval_avg_ckpts, -eval_ema (EMA shadow leaves), -quantize int8.
    params = step_lib.init_params(jax.random.PRNGKey(10), cfg.model)
    state = step_lib.create_state(params, cfg.model, cfg.lm,
                                  ema=tc.ema_decay > 0 or tc.eval_ema)
    ckpt_path = None
    if ckpt_file:
        ckpt_path = ckpt_file
        state = ckpt_lib.restore(ckpt_file, state)
    elif tc.eval_avg_ckpts > 1:
        found = ckpt_lib.restore_averaged(tc.train_dir, state,
                                          tc.eval_avg_ckpts)
        if found:
            state, used = found
            ckpt_path = f"avg of {[path.basename(p) for p in used]}"
    if ckpt_path is None and not ckpt_file:
        for d in (tc.best_model_dir, tc.train_dir):
            found = ckpt_lib.latest_path(d)
            if found:
                ckpt_path = found[0]
                state = ckpt_lib.restore(ckpt_path, state)
                break
    if ckpt_path is None and not allow_fresh:
        raise SystemExit(
            f"no checkpoint found under {tc.best_model_dir} or "
            f"{tc.train_dir} — refusing to export random-init weights "
            f"(pass -allow_fresh_init to override)")
    print(f"Exporting the model from: {ckpt_path}")
    params = state.ema_params if tc.eval_ema else state.params
    params = step_lib.lora_merged(params, cfg.model)
    if int8 or tc.quantize == "int8":
        params = quant.quantize(params)
        print("Quantized params to int8 (weight-only, per-channel)")

    from e2e_asr_tpu.eval.lm_loader import load_fusion_lm
    lm_params = load_fusion_lm(cfg.beam.lm_path, cfg.model, rev_vocab,
                               max_steps=cfg.beam.max_steps)

    # Engine-level contextual biasing (same recipe as the eval CLI).
    bias = None
    if cfg.beam.boost_phrases and cfg.beam.boost_weight != 0.0:
        from e2e_asr_tpu.data.bpe import is_bpe_vocab
        from e2e_asr_tpu.eval import biasing
        phrases = biasing.load_phrases(cfg.beam.boost_phrases, vocab,
                                       bpe=is_bpe_vocab(rev_vocab))
        bias = (biasing.build_bias_trie(phrases, len(rev_vocab)),
                cfg.beam.boost_weight)
        print(f"Contextual biasing: {len(phrases)} phrases, "
              f"boost {cfg.beam.boost_weight}")

    import jax.numpy as jnp
    cd = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else None
    manifest = export_artifact(
        out_dir, params, cfg.model, rev_vocab, beam_cfg=cfg.beam,
        bucket_frames=buckets, batch_size=batch, lm_params=lm_params,
        bias=bias, compute_dtype=cd, platforms=platforms or None)
    total = sum(manifest["program_bytes"].values())
    print(f"Exported {len(buckets)} program(s) ({total/1e6:.2f} MB) + "
          f"params to {out_dir} for platforms="
          f"{','.join(manifest['platforms'])}")
    return manifest


if __name__ == "__main__":
    main()
