"""Neighbour-cell search, CRS measurement, UL power control tests
(reference: scell_recv.cc, intra_measure_lte.cc, refsignal_dl_sync.c,
ue_ul.c power functions)."""

import numpy as np

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn
from srsran_4g_tpu.models import enb_dl, grid as G, meas
from srsran_4g_tpu.ops.ofdm import OfdmConfig, modulate

PRB = 6


def _cell_samples(cell_id: int, gain: float, subframe: int = 0) -> np.ndarray:
    cell = G.CellConfig(nof_prb=PRB, cell_id=cell_id, cfi=1)
    cfg = OfdmConfig(nof_prb=PRB)
    out = []
    for sf in (subframe, subframe + 5):
        g = jnp.zeros((1, cell.nsymb, cell.nre), jnp.complex64)
        ls, ks = G.crs_pattern(cell, 0)
        vals = G.crs_values(cell, 0, sf % 10)
        g = g.at[..., jnp.asarray(ls)[:, None], jnp.asarray(ks)].set(
            jnp.asarray(vals))
        g = enb_dl.put_sync_signals(cell, g, sf % 10)
        out.append(np.asarray(modulate(cfg, g)))
    return gain * np.concatenate(out, axis=-1)


def test_find_neighbour_cells():
    # serving cell (PCI 150, N_ID_2=0) + weaker neighbour (PCI 259, N_ID_2=1)
    # offset by ~0.2 ms — neighbours are never sample-aligned
    a = _cell_samples(150, 1.0)
    b = _cell_samples(259, 0.5)
    shift = 384
    sig = a.copy()
    sig[..., shift:] += b[..., :-shift]
    rx = awgn(jax.random.PRNGKey(0), jnp.asarray(sig), 1e-4)
    cells = meas.find_neighbour_cells(rx, PRB, serving_cell_id=150)
    ids = [c["cell_id"] for c in cells]
    assert 259 in ids
    assert 150 not in ids
    # searching with no exclusion finds the serving cell strongest
    all_cells = meas.find_neighbour_cells(rx, PRB)
    assert all_cells[0]["cell_id"] == 150


def test_measure_cell_rsrp_snr_cfo():
    cell = G.CellConfig(nof_prb=PRB, cell_id=77, cfi=1)
    cfg = OfdmConfig(nof_prb=PRB)
    g = jnp.zeros((1, cell.nsymb, cell.nre), jnp.complex64)
    ls, ks = G.crs_pattern(cell, 0)
    g = g.at[..., jnp.asarray(ls)[:, None], jnp.asarray(ks)].set(
        jnp.asarray(G.crs_values(cell, 0, 0)))
    amp = 0.5
    samples = np.asarray(modulate(cfg, g)) * amp
    # apply a known CFO of 300 Hz (15 kHz subcarrier spacing)
    n = np.arange(samples.shape[-1])
    cfo_norm = 300.0 / 15000.0
    samples = samples * np.exp(2j * np.pi * cfo_norm * n / cfg.symbol_sz)
    rx = awgn(jax.random.PRNGKey(1), jnp.asarray(samples), 1e-6)
    from srsran_4g_tpu.ops.ofdm import demodulate
    m = meas.measure_cell(demodulate(cfg, rx), cell, 0)
    rsrp = float(np.asarray(m["rsrp"])[0])
    assert abs(rsrp - amp ** 2) < 0.05 * amp ** 2
    assert float(np.asarray(m["snr_db"])[0]) > 15.0
    assert abs(float(np.asarray(m["cfo_hz"])[0]) - 300.0) < 30.0
    # RSRQ for a CRS-only grid: RSSI ≈ N_re_crs_per_symbol·RSRP·...; just
    # check it is finite and ≤ 0 dB-ish bound
    assert np.isfinite(float(np.asarray(m["rsrq_db"])[0]))


def test_power_control_formulas():
    st = meas.PowerCtrlState()
    # open loop: 10log10(M) + p0 + alpha*PL
    p = st.pusch_power(n_prb=4, pathloss_db=100.0)
    expect = 10 * np.log10(4) + (-85.0) + 0.8 * 100.0
    assert abs(p - expect) < 1e-6
    # TPC accumulation
    st.apply_tpc_pusch(3)
    st.apply_tpc_pusch(0)
    assert abs(st.pusch_power(4, 100.0) - (expect + 2.0)) < 1e-6
    # clipped at Pcmax
    assert st.pusch_power(100, 150.0) == meas.PC_MAX_DBM
    # msg3 override uses preamble power + delta
    p3 = st.pusch_power(1, 100.0, p0_preamble=-90.0)
    assert abs(p3 - (0 + (-90.0 + 6.0) + 100.0 + st.f_pusch)) < 1e-6

    # PUCCH: format 2 with 4+ CQI bits gets h = 10log10(n/4)
    p1 = st.pucch_power(100.0, fmt="1")
    p2 = st.pucch_power(100.0, fmt="2", n_cqi=8)
    assert p2 > p1
    st.apply_tpc_pucch(2)
    assert st.pucch_power(100.0, fmt="1") - p1 == 1.0

    # SRS tracks the PUSCH open-loop state
    assert st.srs_power(4, 100.0) >= st.pusch_power(4, 100.0) - 1e-9
