"""Benchmark: 20 MHz PDSCH receive pipeline throughput on one TPU chip.

Headline metric (BASELINE.md): subframes/s of the full 20 MHz (100 PRB)
PDSCH receiver — channel estimation, MMSE equalisation, 64QAM soft demod,
descrambling, rate dematching and windowed max-log-MAP turbo decode with CRC
early stop (per half-iteration, per code block) — batched over subframes.
vs_baseline is measured against the reference's MEASURED host-aggregate
throughput at the same configuration: 8,790 subframes/s (pdsch_test
-n 100 -m 28, noiseless + CRC early stop, 2 processes saturating this
host's 2 AVX-512 cores — BASELINE.md "Measured reference baseline").
Current: 25,644 sf/s on one v5e chip = 2.92x the whole reference host
(full both-lane run, round 5; isolated SISO runs 25,858-25,941 =
~1% spread.  TURBO_KERNEL=v9 default + 24x128 chunked dispatch —
round 4 driver-recorded BENCH_r04.json was 16,385 = 1.86x).

Prints exactly ONE JSON line on stdout; details go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import os

    mode = os.environ.get("BENCH_MODE", "both")
    if mode == "mimo":
        return main_mimo()
    if mode == "both":
        # One driver invocation records BOTH lanes: the 2x2 MIMO line
        # first, the SISO headline (parsed as the last JSON line) second.
        # The MIMO lane runs in a watchdog subprocess: its axon AOT
        # compile can take tens of minutes on this rig, and the headline
        # must land even if it stalls (round-3 lesson: never let a
        # secondary lane take down the official number).
        import subprocess

        budget = float(os.environ.get("BENCH_MIMO_TIMEOUT_S", "2400"))
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, BENCH_MODE="mimo"),
                timeout=budget, capture_output=True, text=True)
            sys.stderr.write(r.stderr)
            sys.stdout.write(r.stdout)
        except subprocess.TimeoutExpired:
            print(f"bench-mimo: SKIPPED (compile exceeded {budget:.0f}s "
                  "watchdog)", file=sys.stderr)
    import jax
    import jax.numpy as jnp

    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    from srsran_4g_tpu.models import grid as G, pdsch

    cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1)
    # 20 MHz, 64QAM, TBS 75376 (max single-stream 64QAM TBS @ 100 PRB)
    cfg = pdsch.PdschConfig(
        cell=cell, rnti=0x1234, subframe=4, mod="64qam", tbs=75376
    )
    import os

    # batch sweep on v5e (round 5, after the soft-demod rewrite):
    # 96→19391, 128→23025 (plateau), 160→15475 sf/s; above ~160 the axon
    # backend miscompiles the fused graph (see ARCHITECTURE.md +
    # tools/axon_repro.py batch_cliff).  Re-swept in chunked mode:
    # 96→23.2k, 128→25.9k, 144→16.5k (the pre-cliff slowdown already
    # bites at 144; CRCs stay green) — 128 per chunk stands.  Round-5 chunked dispatch: ONE
    # program lax.maps the fused receiver over `chunks` chunks of
    # `batch` subframes — each chunk stays below the cliff (CRCs
    # verified every run) while the ~0.6 ms per-program launch cost
    # (tools/prof_split.py: a trivial kernel costs 0.594 ms/step even
    # pipelined) amortises.  Quiet-rig chunk sweep (round 5): 1×128 →
    # 23.1k, 8→24.2k, 12→24.9k, 16→25.1k, 24→25.6k, 32→25.6k sf/s
    # (plateau); default 24 = the knee.
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    chunks = int(os.environ.get("BENCH_CHUNKS", "24"))
    n_iter = int(os.environ.get("BENCH_TURBO_ITERS", "4"))
    # 16 reps x 24 chunks ~= 2 s of measurement: repeatable to ~0.3%
    # (25,858/25,941/25,919 sf/s in three consecutive quiet-rig runs);
    # 8 reps showed ~5% downward noise
    iters = int(os.environ.get("BENCH_REPS", "16"))

    print(
        f"bench: 100 PRB 64QAM tbs={cfg.tbs} G={cfg.g_bits} "
        f"nof_re={cfg.nof_re} batch={batch} CBs={cfg.plan.segm.C}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)

    @jax.jit
    def make_rx(bits, key):
        tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
        nv = snr_to_noise_var(30.0)
        return awgn(key, tx, nv)

    # independent payloads + noise per chunk (chunk axis leading)
    rx = jnp.stack([
        make_rx(
            jnp.asarray(rng.integers(0, 2, size=(batch, cfg.tbs))
                        .astype(np.int8)),
            jax.random.PRNGKey(1 + c),
        )
        for c in range(chunks)
    ])
    rx = jax.block_until_ready(rx)

    @jax.jit
    def rx_step(rx_chunks):
        def one(rx_grid):
            out = pdsch.decode(cfg, rx_grid, n_iter=n_iter)
            return (jnp.sum(out["crc_ok"].astype(jnp.float32)),
                    out["bits"][0, 0])
        oks, b0 = jax.lax.map(one, rx_chunks)
        # scalar summary forces a real device->host sync per call (the
        # remote-TPU tunnel's block_until_ready alone is not reliable)
        return jnp.sum(oks), b0

    # warmup / compile
    n_ok, _ = rx_step(rx)
    ok_frac = float(n_ok) / (batch * chunks)
    print(f"bench: warmup crc_ok fraction = {ok_frac}", file=sys.stderr)

    # Pipelined dispatch: enqueue all steps, fence once on the last
    # scalar.  TPU execution is in-order, so the final fetch implies all
    # prior steps completed; the ~30 ms dispatch+tunnel RTT is paid once
    # instead of per step (a real serving pipeline runs exactly this way).
    t0 = time.perf_counter()
    outs = [rx_step(rx)[0] for _ in range(iters)]
    v = float(outs[-1])
    dt = time.perf_counter() - t0
    assert v == float(n_ok), "late-step decode diverged"

    sf_per_s = batch * chunks * iters / dt
    result = {
        "metric": "pdsch_rx_subframes_per_sec_20mhz_64qam",
        "value": round(sf_per_s, 2),
        "unit": "subframes/s",
        "vs_baseline": round(sf_per_s / 8790.0, 3),
    }
    print(
        f"bench: {sf_per_s:.1f} sf/s ({sf_per_s * cfg.tbs / 1e6:.1f} Mb/s info"
        f", crc_ok={ok_frac})",
        file=sys.stderr,
    )
    print(json.dumps(result))


def main_mimo() -> None:
    """Secondary bench (BENCH_MODE=mimo): TM4 2×2 dual-codeword 20 MHz
    receiver — the reference's 150 Mbps headline configuration
    (debian/man/srsue.txt:17)."""
    import os

    import jax
    import jax.numpy as jnp

    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    from srsran_4g_tpu.models import grid as G, pdsch, pdsch_mimo

    cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1, nof_ports=2)
    tbs = 75376
    # TM4 closed loop: the eNB transmits with the PMI the UE reports —
    # select it from the bench channel exactly as models/mimo.pmi_select_2tx
    # does (pmi sweep on this channel: {0: 2301, 1: 2298, 2: 3016} sf/s;
    # the best-capacity PMI needs fewer turbo half-iterations)
    pmi = int(os.environ.get("BENCH_PMI", "2"))
    cfg = pdsch_mimo.PdschMimoConfig(
        cell=cell, rnti=0x1234, subframe=4, mod0="64qam", tbs0=tbs,
        mod1="64qam", tbs1=tbs, tm="tm4", pmi=pmi)
    # chunk sweep (loaded host): 4x64 -> 5,968, 8 -> 6,419, 16 -> 6,604
    # sf/s; 16 is the measured knee and its AOT compile stays well
    # inside the watchdog
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    chunks = int(os.environ.get("BENCH_CHUNKS", "16"))
    n_iter = int(os.environ.get("BENCH_TURBO_ITERS", "4"))
    iters = int(os.environ.get("BENCH_REPS", "16"))
    rng = np.random.default_rng(0)
    # host numpy (NOT an eager device array: closed-over device constants
    # need an eager fetch at trace time, which the axon tunnel rejects)
    hmat = np.array([[1.0 + 0.1j, 0.3 - 0.4j],
                     [0.2 + 0.4j, -0.9 + 0.2j]], np.complex64)
    nv = float(10 ** (-30.0 / 10))

    @jax.jit
    def make_rx(tb0, tb1, key):
        tx = pdsch.add_crs(cfg.cw[0], pdsch_mimo.encode(cfg, tb0, tb1))
        y = jnp.einsum("rt,btsk->brsk", hmat, tx)
        return awgn(key, y, nv)

    # independent payloads + noise per chunk; chunked dispatch amortises
    # the ~0.6 ms per-program launch cost (see main()) and keeps each
    # chunk at the verified batch size
    rx = jnp.stack([
        make_rx(
            jnp.asarray(rng.integers(0, 2, (batch, tbs)).astype(np.int8)),
            jnp.asarray(rng.integers(0, 2, (batch, tbs)).astype(np.int8)),
            jax.random.PRNGKey(1 + c),
        )
        for c in range(chunks)
    ])
    rx = jax.block_until_ready(rx)

    @jax.jit
    def rx_step(rx_all):
        def one(rx_grids):
            out = pdsch_mimo.decode(cfg, rx_grids, n_iter=n_iter)
            ok = (out["crc_ok0"].astype(jnp.float32)
                  + out["crc_ok1"].astype(jnp.float32))
            return jnp.sum(ok)
        return jnp.sum(jax.lax.map(one, rx_all))

    n_ok = float(rx_step(rx))
    print(f"bench-mimo: warmup crc_ok fraction = "
          f"{n_ok / (2 * batch * chunks)}", file=sys.stderr)
    t0 = time.perf_counter()
    outs = [rx_step(rx) for _ in range(iters)]
    v = float(outs[-1])
    dt = time.perf_counter() - t0
    assert v == n_ok
    sf_per_s = batch * chunks * iters / dt
    mbps = sf_per_s * 2 * tbs / 1e6
    print(f"bench-mimo: {sf_per_s:.1f} sf/s ({mbps:.1f} Mb/s info)",
          file=sys.stderr)
    # MIMO baseline: the MEASURED host-saturated aggregate of the
    # reference's own `pdsch_test -x 4 -a 2 -m 28 -M 28 -p 2` on this
    # host — 3,700 sf/s, the maximum of the observed spread (BASELINE.md
    # "Round-5 correction + measured MIMO baseline"); replaces the
    # round-4 apples-to-oranges comparison vs the published 150 Mb/s
    print(json.dumps({
        "metric": "pdsch_mimo2x2_rx_subframes_per_sec_20mhz_64qam",
        "value": round(sf_per_s, 2), "unit": "subframes/s",
        "vs_baseline": round(sf_per_s / 3700.0, 3)}))


if __name__ == "__main__":
    main()
