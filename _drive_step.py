import os, time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_prng_impl", "rbg")
from __graft_entry__ import _batch, _model_cfg
from e2e_asr_tpu.config import LMConfig
from e2e_asr_tpu.models import seq2seq
from e2e_asr_tpu.train import step as step_lib

cfg = _model_cfg(vocab_size=40, feat=80)
lm_cfg = LMConfig(vocab_size=40)
rng = np.random.default_rng(0)

batch = _batch(rng, B=128, T=384, feat=80, L=48, vocab=40)
for tag in sys.argv[1:]:
    if tag == "2-launch": os.environ["E2E_ASR_NO_BIDIR_FUSED"] = "1"
    else: os.environ.pop("E2E_ASR_NO_BIDIR_FUSED", None)
    params = seq2seq.init(jax.random.PRNGKey(0), cfg)
    state = step_lib.create_state(params, cfg, lm_cfg)
    asr_step, _ = step_lib.make_train_step(cfg, lm_cfg, compute_dtype=jnp.bfloat16)
    asr_step = jax.jit(asr_step, donate_argnums=0)
    state, m = asr_step(state, batch, jax.random.PRNGKey(1)); float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = asr_step(state, batch, jax.random.PRNGKey(1))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(f"{tag}: train step {dt*1e3:.2f} ms = {128*384/dt/1e6:.2f}M frames/s")
