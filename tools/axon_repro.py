"""Minimal repros + regression gates for the two known axon platform bugs.

Both are documented in ARCHITECTURE.md ("Known platform cliff") and cost
nothing at the production operating point, but a platform miscompilation
that silently flips CRCs deserves a mechanical check so an upstream fix
(or a worsening) is detected (round-4 VERDICT weak #3/#4).

Case 1 — `batch_cliff`: the WHOLE 100 PRB 64QAM PDSCH receiver
(front-end + dlsch_decode) in ONE jit returns all-failed CRCs at batch
>= ~192 on the axon TPU backend, while the identical math split into two
jits is correct at any batch.  This script runs both at batch 224 and
diffs the CRC masks.  Expected TODAY: fused fails, split passes
("STILL-MISCOMPILES").  If the fused graph passes, the platform is fixed
("FIXED") — raise the bench batch sweep.  Any other combination is a
REGRESSION (exit 1).

Case 2 — `mimo_compile`: the TM4 2x2 dual-codeword receiver's AOT
compile can exceed 20 minutes on axon (bench.py runs it under a 2400 s
watchdog).  This times the compile alone under a budget and records the
result.

Usage:
    python tools/axon_repro.py batch_cliff   [--batch 224]
    python tools/axon_repro.py mimo_compile  [--budget 2400]

Exit codes: 0 = expected state (recorded), 1 = regression/unexpected.
Results are appended to artifacts/axon_repro.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _record(case: str, data: dict) -> None:
    os.makedirs("artifacts", exist_ok=True)
    path = "artifacts/axon_repro.json"
    try:
        with open(path) as f:
            all_res = json.load(f)
    except (OSError, ValueError):
        all_res = {}
    all_res[case] = data
    with open(path, "w") as f:
        json.dump(all_res, f, indent=1)
    print(f"axon_repro[{case}]: {json.dumps(data)}", flush=True)


def batch_cliff(batch: int) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    from srsran_4g_tpu.models import grid as G, pdsch
    from srsran_4g_tpu.models import chest as chest_mod
    from srsran_4g_tpu.models import sch
    from srsran_4g_tpu.ops import modem, scrambling

    cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1)
    cfg = pdsch.PdschConfig(cell=cell, rnti=0x1234, subframe=4,
                            mod="64qam", tbs=75376)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (batch, cfg.tbs)).astype(np.int8))

    @jax.jit
    def make_rx(bits, key):
        tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
        return awgn(key, tx, snr_to_noise_var(30.0))

    rx = make_rx(bits, jax.random.PRNGKey(1))

    @jax.jit
    def fused(rx_grid):
        out = pdsch.decode(cfg, rx_grid, n_iter=4)
        return jnp.sum(out["crc_ok"].astype(jnp.float32))

    @jax.jit
    def front_end(rx_grid):
        """chest + MMSE + soft demod + descramble (the first half of
        pdsch.decode, identical math)."""
        from srsran_4g_tpu.models import equalizer

        est = chest_mod.estimate(chest_mod.ChestConfig(cell=cell),
                                 rx_grid, cfg.subframe)
        idx = jnp.asarray(cfg.re_indices)
        b = rx_grid.shape[0]
        y = rx_grid.reshape(b, -1)[:, idx]
        h_re = est["h"].reshape(b, -1)[:, idx]
        x, eff_nv = equalizer.equalize_single(y, h_re, est["noise_var"])
        llr = modem.demodulate_soft(cfg.mod, x, eff_nv)
        return scrambling.descramble_llrs(
            llr.reshape(b, cfg.g_bits), jnp.asarray(cfg.scramble_seq))

    @jax.jit
    def back_end(llr):
        _, ok, _ = sch.dlsch_decode(cfg.plan, llr, n_iter=4)
        return jnp.sum(ok.astype(jnp.float32))

    t0 = time.perf_counter()
    ok_fused = float(fused(rx))
    t_fused = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok_split = float(back_end(front_end(rx)))
    t_split = time.perf_counter() - t0

    fused_ok = ok_fused == batch
    split_ok = ok_split == batch
    if split_ok and not fused_ok:
        verdict = "STILL-MISCOMPILES"
        rc = 0
    elif split_ok and fused_ok:
        verdict = "FIXED"     # platform fixed: raise BENCH_BATCH sweep
        rc = 0
    else:
        verdict = "REGRESSION"  # the split graph must always be correct
        rc = 1
    _record("batch_cliff", dict(
        batch=batch, crc_ok_fused=ok_fused, crc_ok_split=ok_split,
        compile_plus_run_s_fused=round(t_fused, 1),
        compile_plus_run_s_split=round(t_split, 1),
        platform=jax.devices()[0].platform, verdict=verdict))
    return rc


def mimo_compile(budget_s: float) -> int:
    """Time the TM4 2x2 receiver's AOT compile in a subprocess watchdog
    (the compile is not interruptible in-process)."""
    import subprocess

    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "_mimo_child"],
            timeout=budget_s, capture_output=True, text=True)
        dt = time.perf_counter() - t0
        verdict = "COMPILED" if r.returncode == 0 else "CHILD-ERROR"
        _record("mimo_compile", dict(
            compile_s=round(dt, 1), budget_s=budget_s, verdict=verdict,
            tail=r.stderr[-200:] if r.returncode else ""))
        return 0 if r.returncode == 0 else 1
    except subprocess.TimeoutExpired:
        _record("mimo_compile", dict(
            compile_s=None, budget_s=budget_s, verdict="TIMEOUT"))
        return 0   # the known-bad state, recorded


def _mimo_child() -> int:
    import jax
    import jax.numpy as jnp

    from srsran_4g_tpu.models import grid as G, pdsch_mimo

    cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1, nof_ports=2)
    cfg = pdsch_mimo.PdschMimoConfig(
        cell=cell, rnti=0x1234, subframe=4, mod0="64qam", tbs0=75376,
        mod1="64qam", tbs1=75376, tm="tm4", pmi=2)
    batch = 64

    def rx_step(rx_grids):
        out = pdsch_mimo.decode(cfg, rx_grids, n_iter=4)
        return jnp.sum(out["crc_ok0"].astype(jnp.float32)
                       + out["crc_ok1"].astype(jnp.float32))

    shape = jax.ShapeDtypeStruct((batch, 2, cell.nsymb, cell.nre),
                                 jnp.complex64)
    t0 = time.perf_counter()
    jax.jit(rx_step).lower(shape).compile()
    print(f"mimo AOT compile: {time.perf_counter() - t0:.1f}s", flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("case", choices=("batch_cliff", "mimo_compile",
                                     "_mimo_child"))
    ap.add_argument("--batch", type=int, default=224)
    ap.add_argument("--budget", type=float, default=2400.0)
    args = ap.parse_args()
    if args.case == "batch_cliff":
        return batch_cliff(args.batch)
    if args.case == "mimo_compile":
        return mimo_compile(args.budget)
    return _mimo_child()


if __name__ == "__main__":
    sys.exit(main())
