"""Scratch: true device time via in-jit chaining (dispatch paid once)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from srsran_4g_tpu.ops import turbo

K, B, WIN, TRAIN = 5824, 1664, 112, 32
rng = np.random.default_rng(0)
ls = jnp.asarray(rng.normal(0, 4.0, (B, K)).astype(np.float32))
lp = jnp.asarray(rng.normal(0, 4.0, (B, K)).astype(np.float32))
ts = jnp.asarray(rng.normal(0, 4.0, (B, 3)).astype(np.float32))
tp = jnp.asarray(rng.normal(0, 4.0, (B, 3)).astype(np.float32))

CHAIN = int(os.environ.get("CHAIN", "8"))

def bench(name, fn):
    @jax.jit
    def chained(ls, lp, ts, tp):
        acc = jnp.float32(0)
        x = ls
        for i in range(CHAIN):
            llr = fn(x, lp, ts, tp)
            acc = acc + llr[0, 0]
            x = x + 1e-9 * llr  # serialize: next call depends on previous
        return acc
    float(chained(ls, lp, ts, tp))
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        r = chained(ls, lp, ts, tp)
    float(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3/CHAIN:8.3f} ms/half (chain {CHAIN})", flush=True)

ver = os.environ.get("TURBO_KERNEL", "v4")
if ver == "v4":
    bench("r4 half-iter incl prep", lambda a, b, c, d: turbo._map_windowed_pl_r4(a, b, c, d, WIN, TRAIN))
else:
    bench("v1 half-iter incl prep", lambda a, b, c, d: turbo._map_windowed_pl(a, b, c, d, WIN, TRAIN))
