import time
import jax, jax.numpy as jnp, numpy as np
from e2e_asr_tpu.core import cells
import e2e_asr_tpu.ops.lstm_pallas as lp

T, B, F, H = 384, 128, 512, 256
params = cells.lstm_init(jax.random.PRNGKey(0), F, H)
x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
xp = cells.lstm_precompute_inputs(params, x, F)
w = params["kernel"][F:]

def timed(fn, *a, n=30):
    o = fn(*a); float(o)
    t0 = time.perf_counter()
    for _ in range(n): o = fn(*a)
    float(o)
    return (time.perf_counter()-t0)/n*1e3

fns = {}
for S in (1, 2, 4, 6):
    lp._steps_per_block = lambda T, S=S: S if T % S == 0 else 1
    fns[S] = jax.jit(lambda xp, w, S=S: jnp.sum(lp.lstm_seq(xp, w, True)) + S)
    fns[S](xp, w)  # compile
for rep in range(3):
    print({S: round(timed(f, xp, w, n=20), 3) for S, f in fns.items()})
