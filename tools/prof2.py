import time, numpy as np, jax, jax.numpy as jnp
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pdsch, sch, chest as chest_mod, equalizer
from srsran_4g_tpu.ops import modem, scrambling, rate_match as rm, turbo

cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1)
cfg = pdsch.PdschConfig(cell=cell, rnti=0x1234, subframe=4, mod="64qam", tbs=75376)
B = 32
rng = np.random.default_rng(0)
bits = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))
tx = jax.jit(lambda b: pdsch.add_crs(cfg, pdsch.encode(cfg, b)))(bits)
rx = awgn(jax.random.PRNGKey(1), tx, snr_to_noise_var(30.0))

idx_np = np.asarray(cfg.re_indices)
seq_np = np.asarray(cfg.scramble_seq)

def frontend(rx_grid):
    ccfg = chest_mod.ChestConfig(cell=cfg.cell)
    est = chest_mod.estimate(ccfg, rx_grid, cfg.subframe)
    idx = jnp.asarray(idx_np)
    b = rx_grid.shape[0]
    y = rx_grid.reshape(b, -1)[:, idx]
    h_re = est["h"].reshape(b, -1)[:, idx]
    x, eff_nv = equalizer.equalize_single(y, h_re, est["noise_var"])
    llr = modem.demodulate_soft(cfg.mod, x, eff_nv)
    return scrambling.descramble_llrs(llr.reshape(b, -1), jnp.asarray(seq_np))

def dematch_only(l):
    e_off = np.cumsum([0] + [e for grp in cfg.plan.groups for e in grp.e_bits])
    acc = 0.0
    ci = 0
    for grp in cfg.plan.groups:
        for i in range(grp.count):
            nf = grp.n_filler if i == 0 else 0
            acc = acc + jnp.sum(rm.rate_dematch(l[:, e_off[ci]:e_off[ci+1]], grp.K, 0, n_filler=nf))
            ci += 1
    return acc

def bench(name, fn, *args, iters=5):
    g = jax.jit(lambda *a: jnp.sum(jnp.abs(jax.tree_util.tree_leaves(fn(*a))[0].astype(jnp.float32))))
    float(g(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(g(*args))
    print(f"{name:24s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")

bench("frontend", frontend, rx)
llrs = jax.jit(frontend)(rx)
bench("rate_dematch_x13", dematch_only, llrs)
bench("dlsch_decode_early", lambda l: sch.dlsch_decode(cfg.plan, l, n_iter=4)[0], llrs, iters=5)
d = jnp.asarray((rng.standard_normal((B*13, 3, 6148)) + 4.0).astype(np.float32))
bench("turbo_1it_w128", lambda d: turbo.turbo_decode(d, n_iter=1, window=128, train=32)[1], d, iters=3)
bench("encode_tx", lambda b: pdsch.add_crs(cfg, pdsch.encode(cfg, b)), bits, iters=3)
