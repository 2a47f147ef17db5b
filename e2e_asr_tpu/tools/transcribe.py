"""Long-form WAV transcription CLI (serving entry point).

End-to-end: WAV -> on-device log-mel frontend -> chunked long-form encoder
(eval/longform.py: windows with context margins, one batched encoder pass,
stitched attention states) -> on-device beam search with a
length-proportional step cap -> detokenized transcript.

The reference has no serving path at all — its eval harness requires a
TFRecord dataset and caps decodes at 120 characters
(/root/reference/eval_model.py:155-197, beam_search.py:269). This tool
transcribes arbitrarily long audio with the same flags as the training CLI
(model shape is read from the run-dir checkpoint's configuration flags).

Usage:
    python -m e2e_asr_tpu.tools.transcribe audio.wav [audio2.wav ...] \
        -vocab_dir VOCAB -tb_dir MODELS [-run_id N ...model flags...] \
        [-window 512 -margin 64] [-beam_size 4] [-ckpt file.npz]
"""
from __future__ import annotations

import argparse
import glob
import sys
from os import path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from e2e_asr_tpu import config as config_lib

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("wavs", nargs="+", help="WAV file(s) to transcribe")
    parser.add_argument("-window", type=int, default=512,
                        help="chunk window in frames (multiple of the "
                             "pyramid reduction)")
    parser.add_argument("-margin", type=int, default=64,
                        help="context margin frames on each side of a chunk")
    parser.add_argument("-int8_ckpt", type=str, default="",
                        help="int8 serving artifact from "
                             "tools/quantize_ckpt.py (overrides -ckpt; "
                             "1/4 the load size, dequantized once at "
                             "startup for the long-form paths)")
    parser.add_argument("-ckpt", type=str, default="",
                        help="explicit checkpoint file (else best/latest "
                             "from the run dir)")
    parser.add_argument("-segment", type=int, default=64,
                        help="decode in segments of N encoder frames "
                             "(keeps each decode within the training length "
                             "distribution); 0 = one whole-utterance decode")
    parser.add_argument("-timestamps", action="store_true",
                        help="emit per-word time spans: CTC = Viterbi "
                             "realignment to the frame posteriors "
                             "(eval/align.py), transducer = exact greedy "
                             "emission frames, attention = attention-"
                             "argmax anchors from the segmented decode's "
                             "replay (needs -segment > 0)")
    parser.add_argument("-vad", action="store_true",
                        help="align segment boundaries with pauses "
                             "(minimum-energy frames) instead of fixed "
                             "hops; attention family with -segment > 0")
    parser.add_argument("-vad_slack", type=int, default=16,
                        help="how many encoder frames before the nominal "
                             "cut the pause search may move a boundary")
    parser.add_argument("-stream_block_s", type=float, default=0.0,
                        help="streaming demo: push the audio in blocks of "
                             "this many seconds through eval/streaming."
                             "StreamingTranscriber, printing deltas as they "
                             "finalize; 0 = batch long-form decode")
    config_lib.add_parse_options(parser)
    return parser


def main(argv=None) -> list[str]:
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu import config as config_lib
    from e2e_asr_tpu.core import checkpoint as ckpt_lib
    from e2e_asr_tpu.data import text
    from e2e_asr_tpu.data.audio import read_wav
    from e2e_asr_tpu.eval import longform
    from e2e_asr_tpu.frontend.logmel import featurize_utterance
    from e2e_asr_tpu.train import step as step_lib

    args = vars(build_parser().parse_args(argv))
    wavs, window, margin = args.pop("wavs"), args.pop("window"), args.pop("margin")
    ckpt_file, segment = args.pop("ckpt"), args.pop("segment")
    vad, vad_slack = args.pop("vad"), args.pop("vad_slack")
    stream_block_s = args.pop("stream_block_s")
    int8_ckpt = args.pop("int8_ckpt")
    timestamps = args.pop("timestamps")

    _, rev_vocab = text.initialize_vocabulary(
        path.join(args["vocab_dir"], "char.vocab"))
    cfg = config_lib.process_args(args, {"char": len(rev_vocab)})
    tc = cfg.train

    params = step_lib.init_params(jax.random.PRNGKey(10), cfg.model)
    if int8_ckpt:
        from e2e_asr_tpu.core import quant
        qs = quant.load_artifact(int8_ckpt, params)
        params, ckpt_path = quant.dequantize(qs), int8_ckpt
    elif ckpt_file:
        state = step_lib.create_state(params, cfg.model, cfg.lm)
        state = ckpt_lib.restore(ckpt_file, state)
        params, ckpt_path = state.params, ckpt_file
    else:
        state = step_lib.create_state(params, cfg.model, cfg.lm)
        ckpt_path = None
        for d in (tc.best_model_dir, tc.train_dir):
            found = ckpt_lib.latest_path(d)
            if found:
                ckpt_path = found[0]
                state = ckpt_lib.restore(ckpt_path, state)
                break
        params = state.params
    params = step_lib.lora_merged(params, cfg.model)
    print(f"Using the model from: {ckpt_path}")

    compute_dtype = (jnp.bfloat16 if tc.compute_dtype == "bfloat16" else None)
    out = []
    for pattern in wavs:
        for wav in sorted(glob.glob(pattern)) or [pattern]:
            # read_wav already returns float32 in [-1, 1] — the SAME scale
            # prepare_corpus featurizes at training time. (A second /32768
            # here used to push mel powers below the log floor: a
            # train/serve feature mismatch.)
            wave_f32, sr = read_wav(wav)
            feats = featurize_utterance(wave_f32, sample_rate=sr,
                                        n_mels=cfg.model.feat_length)
            if stream_block_s > 0:
                from e2e_asr_tpu.eval.streaming import StreamingTranscriber
                st = StreamingTranscriber(
                    params, cfg.model, rev_vocab, window=window,
                    margin=margin, seg_enc_frames=max(segment, 1),
                    beam_cfg=cfg.beam, compute_dtype=compute_dtype,
                    sample_rate=sr, n_mels=cfg.model.feat_length)
                block = max(1, int(stream_block_s * sr))
                for off in range(0, len(wave_f32), block):
                    delta = st.push(wave_f32[off:off + block])
                    if delta:
                        print(f"  [{off / sr:6.2f}s] {delta}")
                delta = st.finish()
                if delta:
                    print(f"  [flush ] {delta}")
                sent = st.transcript
                dur = len(wave_f32) / sr
                print(f"{wav}\t({dur:.1f}s, streamed)\t{sent}")
                out.append(sent)
                continue
            if (timestamps and cfg.model.model_family == "attention"
                    and segment <= 0):
                raise SystemExit("attention-family -timestamps needs "
                                 "-segment > 0 (frames come from the "
                                 "segmented decode's attention replay)")
            if cfg.model.model_family == "ctc":
                # CTC is frame-local: one whole-sequence decode at any
                # length, no segmentation needed.
                res = longform.transcribe_ctc_longform(
                    params, cfg.model, jnp.asarray(feats),
                    window=window, margin=margin,
                    beam_size=cfg.beam.beam_size,
                    compute_dtype=compute_dtype,
                    return_timestamps=timestamps)
                if timestamps:
                    from e2e_asr_tpu.eval.align import word_timestamps
                    ids, t_starts, t_ends = res
                    for word, t0, t1 in word_timestamps(
                            np.asarray(ids), np.asarray(t_starts),
                            np.asarray(t_ends), rev_vocab, cfg.model,
                            sample_rate=sr):
                        print(f"  [{t0:7.2f}s - {t1:7.2f}s] {word}")
                else:
                    ids = res
            elif cfg.model.model_family == "transducer":
                # The transducer decoder is monotonic: one left-to-right
                # pass at any length, no segmentation needed.
                res = longform.transcribe_transducer_longform(
                    params, cfg.model, jnp.asarray(feats),
                    window=window, margin=margin,
                    beam_size=cfg.beam.beam_size,
                    compute_dtype=compute_dtype,
                    return_timestamps=timestamps)
                if timestamps:
                    from e2e_asr_tpu.eval.align import word_timestamps
                    ids, t_starts, t_ends = res
                    for word, t0, t1 in word_timestamps(
                            np.asarray(ids), np.asarray(t_starts),
                            np.asarray(t_ends), rev_vocab, cfg.model,
                            sample_rate=sr):
                        print(f"  [{t0:7.2f}s - {t1:7.2f}s] {word}")
                else:
                    ids = res
            elif segment > 0:
                res = longform.transcribe_segmented(
                    params, cfg.model, jnp.asarray(feats),
                    seg_enc_frames=segment, beam_cfg=cfg.beam,
                    window=window, margin=margin,
                    vad=vad, vad_slack=vad_slack,
                    compute_dtype=compute_dtype,
                    return_timestamps=timestamps)
                if timestamps:
                    from e2e_asr_tpu.eval.align import word_timestamps
                    ids, t_starts, t_ends = res
                    for word, t0, t1 in word_timestamps(
                            np.asarray(ids), np.asarray(t_starts),
                            np.asarray(t_ends), rev_vocab, cfg.model,
                            sample_rate=sr):
                        print(f"  [{t0:7.2f}s - {t1:7.2f}s] {word}")
                else:
                    ids = res
            else:
                ids = longform.transcribe_longform(
                    params, cfg.model, jnp.asarray(feats),
                    beam_cfg=cfg.beam, window=window, margin=margin,
                    compute_dtype=compute_dtype)
            sent = text.ids_to_sentence(np.asarray(ids), rev_vocab)
            dur = len(wave_f32) / sr
            print(f"{wav}\t({dur:.1f}s, {feats.shape[0]} frames)\t{sent}")
            out.append(sent)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
