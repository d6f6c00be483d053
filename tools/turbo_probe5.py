"""Scratch: chained split of r4 prep vs kernel + tile sweep."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from srsran_4g_tpu.ops import turbo
from srsran_4g_tpu.ops.pallas.turbo_map import map_windowed_pallas_r4

K, B, WIN, TRAIN = 5824, 1664, 112, 32
W = K // WIN
N = B * W
R = WIN + 2 * TRAIN
rng = np.random.default_rng(0)
CHAIN = int(os.environ.get("CHAIN", "8"))

def bench(name, fn, *args):
    @jax.jit
    def chained(*a):
        acc = jnp.float32(0)
        x = a[0]
        rest = a[1:]
        for i in range(CHAIN):
            o = fn(x, *rest)
            acc = acc + o.reshape(-1)[0]
            x = x + 1e-9 * jnp.mean(o) * jnp.ones_like(x)
        return acc
    float(chained(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        r = chained(*args)
    float(r)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name:44s} {dt*1e3/CHAIN:8.3f} ms/call", flush=True)

g = jnp.asarray(rng.normal(0, 4.0, (R, N)).astype(np.float32))
a0 = jnp.asarray(rng.normal(0, 1.0, (8, N)).astype(np.float32))

# kernel only
for tile in (512, 1024, 2048):
    os.environ["TURBO_TILE"] = str(tile)
    bench(f"r4 kernel only tile={tile}",
          lambda gg, aa: map_windowed_pallas_r4(gg, gg, aa, aa, TRAIN, WIN, B, W),
          g, a0)
os.environ["TURBO_TILE"] = "1024"

# prep only (gather + transposes, no kernel)
ls = jnp.asarray(rng.normal(0, 4.0, (B, K)).astype(np.float32))
def prep(lsa):
    gs = jnp.swapaxes(lsa, 0, 1)
    k_idx = np.arange(W)[None, :] * WIN - TRAIN + np.arange(R)[:, None]
    gidx = jnp.asarray(np.clip(k_idx, 0, K - 1))
    return gs[gidx].reshape(R, N)
bench("r4 prep gather only", prep, ls)

# output transpose only
llr = jnp.asarray(rng.normal(0, 4.0, (WIN, N)).astype(np.float32))
def otr(llr):
    return jnp.transpose(llr.reshape(WIN, W, B), (2, 1, 0)).reshape(B, K)
bench("out transpose only", otr, llr)
