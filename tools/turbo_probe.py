"""Scratch probes: what dominates the r4 kernel? (not part of the suite)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import srsran_4g_tpu.ops.pallas.turbo_map as tm

K, B, WIN, TRAIN = 5824, 1664, 112, 32
w = K // WIN
n = B * w
rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(0, 4.0, (WIN + 2 * TRAIN, n)).astype(np.float32))
a0 = jnp.asarray(rng.normal(0, 1.0, (8, n)).astype(np.float32))


def timeit(name, f, *args, iters=10):
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1e3:8.3f} ms", flush=True)


def bench(name):
    tm._make_kernel_v4.__wrapped__ if hasattr(tm._make_kernel_v4, "__wrapped__") else None
    kern = jax.jit(lambda gg, aa: jnp.sum(tm.map_windowed_pallas_r4(
        gg, gg, aa, aa, TRAIN, WIN, B, w)))
    timeit(name, kern, g, a0)


probe = sys.argv[1] if len(sys.argv) > 1 else "base"
if probe == "noperm":
    tm._restack = lambda x, order: x  # identity: times everything else
elif probe == "nonorm":
    real_max = jnp.max
    import jax.numpy as _j
    orig = tm.jnp.max
    def fake_max(x, axis=None, keepdims=False):
        if axis == 0 and keepdims:
            return x[0:1, :] * 0.0  # cheap placeholder, kills the reduce
        return orig(x, axis=axis, keepdims=keepdims)
    tm.jnp = type(sys)("fake_jnp")
    for k in dir(_j):
        try:
            setattr(tm.jnp, k, getattr(_j, k))
        except Exception:
            pass
    tm.jnp.max = fake_max
elif probe == "tile":
    for t in ("512", "1024", "2048", "4096"):
        os.environ["TURBO_TILE"] = t
        bench(f"r4 tile={t}")
    sys.exit(0)
bench(f"r4 probe={probe}")
