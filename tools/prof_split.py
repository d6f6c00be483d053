"""Round-5 perf probe: per-program dispatch overhead + split-graph batch
scaling.

Two questions:
  1. What is the fixed per-program cost under pipelined dispatch?  A
     trivial kernel (scalar add on a tiny array) enqueued ITERS deep
     gives the floor.
  2. The axon backend miscompiles the FUSED receiver above batch ~160
     (tools/axon_repro.py batch_cliff) but the SPLIT front-end/dlsch
     graphs are correct at any batch (dp_evidence).  If a fixed
     per-program overhead dominates, a split pipeline at batch 256/384
     may beat the fused batch-128 headline despite the extra LLR
     round-trip through HBM.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pdsch, chest as chest_mod
from srsran_4g_tpu.models import equalizer, sch
from srsran_4g_tpu.ops import modem, scrambling

ITERS = int(os.environ.get("PROF_ITERS", "16"))

cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1)
cfg = pdsch.PdschConfig(cell=cell, rnti=0x1234, subframe=4, mod="64qam",
                        tbs=75376)


def fence(x):
    return float(x)


def bench_overhead():
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda a: jnp.sum(a + 1.0))
    fence(f(x))
    t0 = time.perf_counter()
    outs = [f(x) for _ in range(64)]
    fence(outs[-1])
    dt = (time.perf_counter() - t0) / 64
    print(f"trivial program            {dt*1e3:8.3f} ms/step", flush=True)


def bench_split(batch):
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (batch, cfg.tbs)).astype(np.int8))
    rx = jax.block_until_ready(jax.jit(lambda b, k: awgn(
        k, pdsch.add_crs(cfg, pdsch.encode(cfg, b)),
        snr_to_noise_var(30.0)))(bits, jax.random.PRNGKey(1)))

    idx = jnp.asarray(cfg.re_indices)
    seq = jnp.asarray(cfg.scramble_seq)

    def front(rx_grid):
        est = chest_mod.estimate(chest_mod.ChestConfig(cell=cfg.cell),
                                 rx_grid, cfg.subframe)
        b = rx_grid.shape[0]
        y = rx_grid.reshape(b, -1)[:, idx]
        h_re = est["h"].reshape(b, -1)[:, idx]
        x, eff_nv = equalizer.equalize_single(y, h_re, est["noise_var"])
        llr = modem.demodulate_soft(cfg.mod, x, eff_nv)
        return scrambling.descramble_llrs(llr.reshape(b, cfg.g_bits), seq)

    fe = jax.jit(front)
    de = jax.jit(lambda llr: jnp.sum(
        sch.dlsch_decode(cfg.plan, llr, n_iter=4)[1].astype(jnp.float32)))
    n_ok = fence(de(fe(rx)))
    ok = n_ok / batch
    t0 = time.perf_counter()
    outs = [de(fe(rx)) for _ in range(ITERS)]
    v = fence(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    assert v == n_ok
    print(f"split batch={batch:4d}        {dt*1e3:8.2f} ms/step  "
          f"{batch/dt:8.0f} sf/s  crc_ok={ok}", flush=True)


def bench_fused(batch):
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (batch, cfg.tbs)).astype(np.int8))
    rx = jax.block_until_ready(jax.jit(lambda b, k: awgn(
        k, pdsch.add_crs(cfg, pdsch.encode(cfg, b)),
        snr_to_noise_var(30.0)))(bits, jax.random.PRNGKey(1)))
    f = jax.jit(lambda g: jnp.sum(
        pdsch.decode(cfg, g, n_iter=4)["crc_ok"].astype(jnp.float32)))
    n_ok = fence(f(rx))
    ok = n_ok / batch
    t0 = time.perf_counter()
    outs = [f(rx) for _ in range(ITERS)]
    v = fence(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    assert v == n_ok
    print(f"fused batch={batch:4d}        {dt*1e3:8.2f} ms/step  "
          f"{batch/dt:8.0f} sf/s  crc_ok={ok}", flush=True)


def bench_chunked(n_chunks, chunk=128):
    """ONE program that lax.maps the fused receiver over `n_chunks`
    chunks of `chunk` subframes — each chunk stays below the axon
    batch-cliff while the per-program launch cost amortises."""
    batch = n_chunks * chunk
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (chunk, cfg.tbs)).astype(np.int8))
    rx1 = jax.block_until_ready(jax.jit(lambda b, k: awgn(
        k, pdsch.add_crs(cfg, pdsch.encode(cfg, b)),
        snr_to_noise_var(30.0)))(bits, jax.random.PRNGKey(1)))
    rx = jnp.broadcast_to(rx1[None], (n_chunks,) + rx1.shape)

    f = jax.jit(lambda g: jnp.sum(jax.lax.map(
        lambda c: jnp.sum(
            pdsch.decode(cfg, c, n_iter=4)["crc_ok"].astype(jnp.float32)),
        g)))
    n_ok = fence(f(rx))
    ok = n_ok / batch
    t0 = time.perf_counter()
    outs = [f(rx) for _ in range(ITERS)]
    v = fence(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    assert v == n_ok
    print(f"chunked {n_chunks}x{chunk:4d}        {dt*1e3:8.2f} ms/step  "
          f"{batch/dt:8.0f} sf/s  crc_ok={ok}", flush=True)


if __name__ == "__main__":
    print(f"iters={ITERS} platform={jax.default_backend()}", flush=True)
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("all", "overhead"):
        bench_overhead()
    if mode in ("all", "fused"):
        for b in (128,):
            bench_fused(b)
    if mode in ("all", "split"):
        for b in (128, 256, 384):
            bench_split(b)
    if mode in ("all", "chunked"):
        for n in (2, 4):
            bench_chunked(n)
