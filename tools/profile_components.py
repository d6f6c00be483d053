"""Per-component timing of the 20 MHz PDSCH receive chain on TPU."""
import time, sys
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pdsch, chest, equalizer, sch
from srsran_4g_tpu.ops import modem, scrambling, rate_match as rm, turbo

cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1)
cfg = pdsch.PdschConfig(cell=cell, rnti=0x1234, subframe=4, mod="64qam", tbs=75376)
B = 32

rng = np.random.default_rng(0)
bits = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))
tx = jax.jit(lambda b: pdsch.add_crs(cfg, pdsch.encode(cfg, b)))(bits)
rx = jax.block_until_ready(awgn(jax.random.PRNGKey(1), tx, snr_to_noise_var(30.0)))

def _sync(out):
    # the remote-TPU tunnel's block_until_ready is unreliable; force a
    # real device->host scalar transfer to fence each call
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        # index a single element on-device, then fetch the scalar: fences
        # the computation without paying for a full-array transfer
        s = leaf[(0,) * getattr(leaf, "ndim", 0)] if getattr(leaf, "ndim", 0) else leaf
        float(jnp.real(s) if jnp.iscomplexobj(s) else s)
    return out

def timeit(name, fn, *args, iters=5):
    out = _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:8.2f} ms", file=sys.stderr)
    return out

ccfg = chest.ChestConfig(cell=cell)
f_chest = jax.jit(lambda g: chest.estimate(ccfg, g, cfg.subframe))
est = timeit("chest", f_chest, rx)

idx = np.asarray(cfg.re_indices)
def eq_fn(g, h, nv):
    y = g.reshape(B, -1)[:, idx]
    h_re = h.reshape(B, -1)[:, idx]
    return equalizer.equalize_single(y, h_re, nv)
f_eq = jax.jit(eq_fn)
x, eff = timeit("equalize", f_eq, rx, est["h"], est["noise_var"])

f_dem = jax.jit(lambda x, nv: modem.demodulate_soft(cfg.mod, x, nv))
llr = timeit("demod_64qam", f_dem, x, eff)

seq = np.asarray(cfg.scramble_seq)
f_scr = jax.jit(lambda l: scrambling.descramble_llrs(l.reshape(B, -1), jnp.asarray(seq)))
llrs = timeit("descramble", f_scr, llr)

f_dec = jax.jit(lambda l: sch.dlsch_decode(cfg.plan, l, n_iter=4)[0:2])
timeit("dlsch_decode_total", f_dec, llrs, iters=3)

# turbo alone: 13 CBs x B at K=6144
plan = cfg.plan
K = plan.groups[-1].K
d = jnp.asarray(rng.standard_normal((B*13, 3, K+4)).astype(np.float32))
f_turbo = jax.jit(lambda d: turbo.turbo_decode(d, n_iter=4, window=128, train=32))
timeit("turbo_4it_w128", f_turbo, d, iters=3)
f_turbo2 = jax.jit(lambda d: turbo.turbo_decode(d, n_iter=4, window=32, train=16))
timeit("turbo_4it_w32", f_turbo2, d, iters=3)
f_turbo3 = jax.jit(lambda d: turbo.turbo_decode(d, n_iter=4, window=64, train=16))
timeit("turbo_4it_w64t16", f_turbo3, d, iters=3)
