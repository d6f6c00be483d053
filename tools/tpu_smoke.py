"""Real-TPU kernel smoke gate — run before shipping changes to
`ops/pallas/` or `ops/turbo.py`.

Compiles and runs EVERY selectable TURBO_KERNEL version at the exact
bench shapes (the round-3 v6 default OOM'd scoped VMEM at the 100 PRB
SISO bench shape while passing every CPU interpret-mode test — this gate
catches that class locally):

  * SISO headline: 100 PRB 64QAM TBS 75376 → 13 CBs x K=5824, batch 128
    (= 1664 code blocks, the bench.py lane count)
  * MIMO lane: TM4 2x2 dual-codeword at the same TBS, batch 64

Asserts crc_ok == 1.0 for each (kernel, shape) combination and prints a
per-combination wall time so a slower-than-default kernel is visible.
Exits non-zero on any compile error, VMEM OOM, or CRC failure.

Usage: python tools/tpu_smoke.py            # all kernels, both shapes
       python tools/tpu_smoke.py v4 v6      # subset of kernels
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KERNELS = ("v4", "v5", "v6", "v7", "v8", "v9")


def run_siso(batch: int) -> tuple[float, float]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    from srsran_4g_tpu.models import grid as G, pdsch

    cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1)
    cfg = pdsch.PdschConfig(cell=cell, rnti=0x1234, subframe=4,
                            mod="64qam", tbs=75376)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (batch, cfg.tbs)).astype(np.int8))

    @jax.jit
    def make_rx(bits, key):
        tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
        return awgn(key, tx, snr_to_noise_var(30.0))

    rx = jax.block_until_ready(make_rx(bits, jax.random.PRNGKey(1)))

    @jax.jit
    def rx_step(rx_grid):
        out = pdsch.decode(cfg, rx_grid, n_iter=4)
        return jnp.sum(out["crc_ok"].astype(jnp.float32))

    n_ok = float(rx_step(rx))  # compile + run
    t0 = time.perf_counter()
    v = float(rx_step(rx))
    dt = time.perf_counter() - t0
    assert v == n_ok
    return n_ok / batch, dt


def run_mimo(batch: int) -> tuple[float, float]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srsran_4g_tpu.channel.awgn import awgn
    from srsran_4g_tpu.models import grid as G, pdsch, pdsch_mimo

    cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1, nof_ports=2)
    tbs = 75376
    cfg = pdsch_mimo.PdschMimoConfig(
        cell=cell, rnti=0x1234, subframe=4, mod0="64qam", tbs0=tbs,
        mod1="64qam", tbs1=tbs, tm="tm4", pmi=2)
    rng = np.random.default_rng(0)
    tb0 = jnp.asarray(rng.integers(0, 2, (batch, tbs)).astype(np.int8))
    tb1 = jnp.asarray(rng.integers(0, 2, (batch, tbs)).astype(np.int8))
    hmat = np.array([[1.0 + 0.1j, 0.3 - 0.4j],
                     [0.2 + 0.4j, -0.9 + 0.2j]], np.complex64)
    nv = float(10 ** (-30.0 / 10))

    @jax.jit
    def make_rx(tb0, tb1, key):
        tx = pdsch.add_crs(cfg.cw[0], pdsch_mimo.encode(cfg, tb0, tb1))
        y = jnp.einsum("rt,btsk->brsk", hmat, tx)
        return awgn(key, y, nv)

    rx = jax.block_until_ready(make_rx(tb0, tb1, jax.random.PRNGKey(1)))

    @jax.jit
    def rx_step(rx_grids):
        out = pdsch_mimo.decode(cfg, rx_grids, n_iter=4)
        return jnp.sum(out["crc_ok0"].astype(jnp.float32)
                       + out["crc_ok1"].astype(jnp.float32))

    n_ok = float(rx_step(rx))
    t0 = time.perf_counter()
    v = float(rx_step(rx))
    dt = time.perf_counter() - t0
    assert v == n_ok
    return n_ok / (2 * batch), dt


def main() -> int:
    import jax

    kernels = sys.argv[1:] or list(KERNELS)
    plat = jax.devices()[0].platform
    if plat == "cpu":
        print("tpu_smoke: WARNING running on CPU backend — VMEM limits and "
              "Mosaic lowering are NOT exercised; run on the TPU rig.",
              file=sys.stderr)
    # the MIMO compile alone takes ~20 min on the axon tunnel, so it runs
    # only for the production-default kernel; every kernel still compiles
    # + runs at the SISO bench shape (the VMEM-OOM class that broke
    # round 3 shows up there)
    default_kern = "v9"
    failures = []
    for kern in kernels:
        os.environ["TURBO_KERNEL"] = kern
        shapes = [("siso", run_siso, 128)]
        if kern == default_kern:
            shapes.append(("mimo", run_mimo, 64))
        for name, fn, batch in shapes:
            tag = f"{kern}/{name}"
            try:
                jax.clear_caches()  # force recompile under the new kernel
                ok_frac, dt = fn(batch)
            except Exception as e:  # noqa: BLE001 — gate must report, not die
                failures.append(tag)
                print(f"tpu_smoke: {tag}: FAIL ({type(e).__name__}: "
                      f"{str(e)[:200]})", file=sys.stderr)
                continue
            status = "ok" if ok_frac == 1.0 else f"CRC FAIL ({ok_frac:.3f})"
            if ok_frac != 1.0:
                failures.append(tag)
            print(f"tpu_smoke: {tag}: {status}  {dt * 1e3:.1f} ms/step "
                  f"({batch / dt:.0f} sf/s)", file=sys.stderr)
    if failures:
        print(f"tpu_smoke: FAILED: {failures}", file=sys.stderr)
        return 1
    print("tpu_smoke: all kernels green", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
