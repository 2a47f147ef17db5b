import time
import numpy as np
import jax

from e2e_asr_tpu.config import BeamConfig, DecoderConfig, EncoderConfig, Seq2SeqConfig
from e2e_asr_tpu.data.synth import make_vocab_dir
from e2e_asr_tpu.data import text
from e2e_asr_tpu.eval.streaming import BatchedStreamingServer, StreamingTranscriber
from e2e_asr_tpu.models import seq2seq

cfg = Seq2SeqConfig(tasks=["char"], num_layers={"char": 4},
                    max_output={"char": 120},
                    encoder=EncoderConfig(hidden_size=256, out_prob=1.0),
                    feat_length=80)
cfg.decoders["char"] = DecoderConfig(hidden_size_dec=256, emb_size=256,
                                     vocab_size=39, attention_vec_size=128,
                                     lm_hidden_size=256, samp_prob=0.0,
                                     out_prob_dec=1.0, max_output=120)
params = seq2seq.init(jax.random.PRNGKey(0), cfg)
make_vocab_dir("/tmp/sv")
_, rev = text.initialize_vocabulary("/tmp/sv/char.vocab")

S = 8
secs = 30.0
sr = 16000
rng = np.random.default_rng(0)
waves = [rng.normal(size=int(secs * sr)).astype(np.float32) * 0.1
         for _ in range(S)]
kw = dict(window=512, margin=64, seg_enc_frames=64,
          beam_cfg=BeamConfig(beam_size=4), n_mels=80)
block = sr  # 1-second pushes

def run_batched():
    srv = BatchedStreamingServer(params, cfg, rev, max_streams=S, **kw)
    sids = [srv.open() for _ in range(S)]
    for off in range(0, int(secs * sr), block):
        for j, sid in enumerate(sids):
            srv.push(sid, waves[j][off:off + block])
        srv.step()
    for sid in sids:
        srv.finish(sid)

def run_single():
    sts = [StreamingTranscriber(params, cfg, rev, **kw) for _ in range(S)]
    for off in range(0, int(secs * sr), block):
        for j, st in enumerate(sts):
            st.push(waves[j][off:off + block])
    for st in sts:
        st.finish()

# Warmup (compile both paths), then time.
run_batched(); run_single()
t0 = time.time(); run_batched(); tb = time.time() - t0
t0 = time.time(); run_single(); ts = time.time() - t0
audio = S * secs
print(f"batched_server_wall_s={tb:.2f} aggregate_rtfx={audio/tb:.1f}")
print(f"single_streams_wall_s={ts:.2f} aggregate_rtfx={audio/ts:.1f}")
print(f"speedup={ts/tb:.2f}x")
