"""Composite eNB TX → UE RX tests: cell search + full subframe decode.

This is the BASELINE "full DL subframe pipeline" configuration: sync +
chest + PDSCH decode (reference: ue_cell_search/ue_mib/ue_dl chain, and the
enb_phy_test-style in-process loopback).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import enb_dl, grid as G, pdsch, ue_dl
from srsran_4g_tpu.ops.ofdm import OfdmConfig


@pytest.mark.parametrize("cell_id", [0, 151, 503])
def test_cell_search(cell_id):
    cell = G.CellConfig(nof_prb=6, cell_id=cell_id, cfi=1)
    cfg = pdsch.PdschConfig(cell=cell, rnti=0x50, subframe=0, mod="qpsk", tbs=120)
    rng = np.random.default_rng(cell_id)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    grid_tx = enb_dl.assemble_subframe(cfg, bits)
    sf = np.asarray(enb_dl.subframe_to_samples(cell, grid_tx))
    # capture window: noise-padded, PSS somewhere inside; small CFO
    pad = 333
    cap = np.concatenate(
        [np.zeros((2, pad), np.complex64), sf,
         np.zeros((2, 400), np.complex64)], axis=-1)
    ofdm_cfg = OfdmConfig(nof_prb=6)
    cfo_true = 0.12
    cap = cap * np.exp(2j * np.pi * cfo_true * np.arange(cap.shape[-1]) / ofdm_cfg.symbol_sz)
    cap = np.asarray(awgn(jax.random.PRNGKey(0), cap, snr_to_noise_var(15.0) * 0.05))
    out = ue_dl.cell_search(jnp.asarray(cap), 6)
    assert (np.asarray(out["cell_id"]) == cell_id).all(), (
        np.asarray(out["cell_id"]), cell_id)
    assert (np.asarray(out["phase"]) == 0).all()
    assert np.allclose(np.asarray(out["cfo"]), cfo_true, atol=0.05)


def test_full_subframe_tx_rx():
    """eNB assembles sf=0 w/ PBCH+PCFICH+DCI+PDSCH; UE decodes PDSCH."""
    cell = G.CellConfig(nof_prb=25, cell_id=123, cfi=2)
    cfg = pdsch.PdschConfig(cell=cell, rnti=0x1234, subframe=0, mod="16qam",
                            tbs=1000)
    rng = np.random.default_rng(7)
    b = 2
    bits = rng.integers(0, 2, size=(b, cfg.tbs)).astype(np.int8)
    mib = rng.integers(0, 2, size=(b, 24)).astype(np.int8)
    dci_bits = rng.integers(0, 2, size=(b, 27)).astype(np.int8)
    grid_tx = enb_dl.assemble_subframe(
        cfg, bits, mib_bits=mib, dcis=[(dci_bits, cfg.rnti, 4, 0)]
    )
    sf = enb_dl.subframe_to_samples(cell, grid_tx)
    h = 0.95 * np.exp(1j * 0.2)
    rx = awgn(jax.random.PRNGKey(1), np.asarray(sf) * h,
              snr_to_noise_var(18.0) * 0.05)
    out = ue_dl.receive_pdsch_subframe(cfg, rx)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)

    # the same grid also yields PBCH + PCFICH + PDCCH for the UE stack
    from srsran_4g_tpu.models import pbch, pcfich, pdcch
    from srsran_4g_tpu.ops.ofdm import OfdmConfig, demodulate

    grid_rx = demodulate(OfdmConfig(nof_prb=25), rx)
    hh = out["h"]
    nv = out["noise_var"]
    cfi = pcfich.decode(cell, grid_rx, hh, nv, 0)
    assert (np.asarray(cfi["cfi"]) == 2).all()
    mib_out = pbch.decode(cell, grid_rx, hh, nv, frame_idx=0)
    assert np.asarray(mib_out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(mib_out["mib"]), mib)
    dci_out = pdcch.blind_decode(cell, 2, 0, grid_rx, hh, nv, cfg.rnti, 27)
    assert np.asarray(dci_out["found"]).all()
    np.testing.assert_array_equal(np.asarray(dci_out["dci"]), dci_bits)
