"""2-port TX-diversity control channels: SFBC loopback for PBCH, PCFICH,
PHICH and PDCCH (TS 36.211 §6.3.4.3; reference enb_dl.c transmits every
control channel on all ports via precoding_diversity when nof_ports=2).

TX on a (B, 2, nsymb, nre) grid → per-port flat channel into ONE RX
antenna → per-port CRS estimation → SFBC combining → decode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srsran_4g_tpu.models import chest as chest_mod
from srsran_4g_tpu.models import dci as dci_mod
from srsran_4g_tpu.models import grid as G
from srsran_4g_tpu.models import pbch, pcfich, pdcch, phich
from srsran_4g_tpu.models import pdsch as pdsch_mod

B = 2
SNR_DB = 20.0


@pytest.fixture(scope="module")
def loopback():
    cell = G.CellConfig(nof_prb=15, cell_id=123, nof_ports=2, cfi=2)
    sf = 0
    rng = np.random.default_rng(9)
    ref_cfg = pdsch_mod.PdschConfig(cell=cell, rnti=0, subframe=sf,
                                    mod="qpsk", tbs=16)
    g = jnp.zeros((B, 2, cell.nsymb, cell.nre), jnp.complex64)
    g = pdsch_mod.add_crs(ref_cfg, g)

    mib_bits = jnp.asarray(rng.integers(0, 2, (B, 24)).astype(np.int8))
    syms = pbch.encode(cell, mib_bits, n_ports=2)
    g = pbch.put_into_grid(cell, g, syms[:, 0])

    cfi_arr = jnp.full((B,), cell.cfi, jnp.int32)
    g = pcfich.put_into_grid(cell, g, pcfich.encode(cell, cfi_arr, sf))

    ack = jnp.asarray([1, 0], jnp.int8)
    g = phich.put_into_grid(cell, g, phich.encode(cell, ack, 1, 2, sf), 1)

    d = dci_mod.Dci1A(rb_start=2, l_crbs=5, mcs=9, harq_pid=3, ndi=1)
    dci_bits = np.tile(dci_mod.pack_1a(d, cell.nof_prb), (B, 1))
    rnti = 0x46
    cands = pdcch.search_space_candidates(cell, cell.cfi, rnti, sf)
    l_agg, cce_start = cands[0]
    g = pdcch.put_dci(cell, cell.cfi, sf, g, jnp.asarray(dci_bits), rnti,
                      l_agg, cce_start)

    # per-port flat channel into one RX antenna + AWGN
    h0 = np.complex64(0.9 + 0.3j)
    h1 = np.complex64(-0.4 + 0.8j)
    nv = 10 ** (-SNR_DB / 10)
    noise = (rng.normal(0, np.sqrt(nv / 2), (B, cell.nsymb, cell.nre))
             + 1j * rng.normal(0, np.sqrt(nv / 2), (B, cell.nsymb, cell.nre)))
    rx = h0 * g[:, 0] + h1 * g[:, 1] + jnp.asarray(noise.astype(np.complex64))

    ccfg = chest_mod.ChestConfig(cell=cell)
    e0 = chest_mod.estimate(ccfg, rx, sf, port=0)
    e1 = chest_mod.estimate(ccfg, rx, sf, port=1)
    return dict(cell=cell, sf=sf, rx=rx, e0=e0, e1=e1, mib=mib_bits,
                ack=ack, dci_bits=dci_bits, rnti=rnti, h0=h0, h1=h1,
                cands=[(l_agg, cce_start)])


def test_chest_per_port(loopback):
    lb = loopback
    for est, href in ((lb["e0"], lb["h0"]), (lb["e1"], lb["h1"])):
        h = np.asarray(est["h"])
        err = np.abs(h - href).mean()
        assert err < 0.15, err


def test_pbch_2port(loopback):
    lb = loopback
    r = pbch.decode(lb["cell"], lb["rx"], lb["e0"]["h"],
                    lb["e0"]["noise_var"], frame_idx=0, h1=lb["e1"]["h"])
    assert bool(np.asarray(r["crc_ok"]).all())
    assert (np.asarray(r["n_ports"]) == 2).all()
    assert (np.asarray(r["mib"]) == np.asarray(lb["mib"])).all()


def test_pcfich_2port(loopback):
    lb = loopback
    r = pcfich.decode(lb["cell"], lb["rx"], lb["e0"]["h"],
                      lb["e0"]["noise_var"], lb["sf"], h1=lb["e1"]["h"])
    assert (np.asarray(r["cfi"]) == lb["cell"].cfi).all()


def test_phich_2port(loopback):
    lb = loopback
    r = phich.decode(lb["cell"], lb["rx"], lb["e0"]["h"],
                     lb["e0"]["noise_var"], 1, 2, lb["sf"],
                     h1=lb["e1"]["h"])
    assert (np.asarray(r["ack"]) == np.asarray(lb["ack"])).all()


def test_pdcch_2port(loopback):
    lb = loopback
    r = pdcch.blind_decode(lb["cell"], lb["cell"].cfi, lb["sf"], lb["rx"],
                           lb["e0"]["h"], lb["e0"]["noise_var"], lb["rnti"],
                           lb["dci_bits"].shape[1], h1=lb["e1"]["h"])
    assert bool(np.asarray(r["found"]).all())
    assert (np.asarray(r["dci"]) == lb["dci_bits"]).all()


def test_pdcch_2port_full_search(loopback):
    """The whole search space (not just the planted candidate) must find
    exactly the planted DCI under SFBC combining."""
    lb = loopback
    r = pdcch.blind_decode(lb["cell"], lb["cell"].cfi, lb["sf"], lb["rx"],
                           lb["e0"]["h"], lb["e0"]["noise_var"], lb["rnti"],
                           lb["dci_bits"].shape[1], h1=lb["e1"]["h"])
    ok = np.asarray(r["ok_per_candidate"])
    assert ok.any(axis=-1).all()
