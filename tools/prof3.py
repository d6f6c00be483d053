import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pdsch, sch
from srsran_4g_tpu.ops import rate_match as rm

cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1)
cfg = pdsch.PdschConfig(cell=cell, rnti=0x1234, subframe=4, mod="64qam", tbs=75376)
B = 32
rng = np.random.default_rng(0)
bits = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))
tx = jax.jit(lambda b: pdsch.add_crs(cfg, pdsch.encode(cfg, b)))(bits)
rx = awgn(jax.random.PRNGKey(1), tx, snr_to_noise_var(30.0))

def timeit(name, fn, iters=5):
    f = jax.jit(fn)
    float(f(rx))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(rx))
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)

def decode_full(rx_grid):
    out = pdsch.decode(cfg, rx_grid, n_iter=4)
    return jnp.sum(out["bits"].astype(jnp.float32))

def decode_1it_noearly(rx_grid):
    from srsran_4g_tpu.models import chest as chest_mod, equalizer
    from srsran_4g_tpu.ops import modem, scrambling
    ccfg = chest_mod.ChestConfig(cell=cfg.cell)
    est = chest_mod.estimate(ccfg, rx_grid, cfg.subframe)
    idx = jnp.asarray(np.asarray(cfg.re_indices))
    b = rx_grid.shape[0]
    y = rx_grid.reshape(b, -1)[:, idx]
    h_re = est["h"].reshape(b, -1)[:, idx]
    x, eff_nv = equalizer.equalize_single(y, h_re, est["noise_var"])
    llr = modem.demodulate_soft(cfg.mod, x, eff_nv)
    llr = scrambling.descramble_llrs(llr.reshape(b, -1), jnp.asarray(np.asarray(cfg.scramble_seq)))
    bits_o, ok, _ = sch.dlsch_decode(cfg.plan, llr, n_iter=1, early_stop=False)
    return jnp.sum(bits_o.astype(jnp.float32))

def no_turbo(rx_grid):
    from srsran_4g_tpu.models import chest as chest_mod, equalizer
    from srsran_4g_tpu.ops import modem, scrambling
    ccfg = chest_mod.ChestConfig(cell=cfg.cell)
    est = chest_mod.estimate(ccfg, rx_grid, cfg.subframe)
    idx = jnp.asarray(np.asarray(cfg.re_indices))
    b = rx_grid.shape[0]
    y = rx_grid.reshape(b, -1)[:, idx]
    h_re = est["h"].reshape(b, -1)[:, idx]
    x, eff_nv = equalizer.equalize_single(y, h_re, est["noise_var"])
    llr = modem.demodulate_soft(cfg.mod, x, eff_nv)
    llr = scrambling.descramble_llrs(llr.reshape(b, -1), jnp.asarray(np.asarray(cfg.scramble_seq)))
    acc = 0.0
    e_off = np.cumsum([0] + [e for grp in cfg.plan.groups for e in grp.e_bits])
    ci = 0
    for grp in cfg.plan.groups:
        for i in range(grp.count):
            nf = grp.n_filler if i == 0 else 0
            acc = acc + jnp.sum(rm.rate_dematch(llr[:, e_off[ci]:e_off[ci+1]], grp.K, 0, n_filler=nf))
            ci += 1
    return acc

timeit("decode_full(early)", decode_full)
timeit("decode_1it_noearly", decode_1it_noearly, iters=3)
timeit("frontend+dematch_only", no_turbo)
