"""CQI mapping + SRS sounding tests."""

import numpy as np
import pytest

import jax

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import cqi, grid as G, srs


def test_cqi_from_snr():
    assert cqi.cqi_from_snr(-5.0) == 0
    assert cqi.cqi_from_snr(2.0) == 1
    assert cqi.cqi_from_snr(30.0) == 15
    assert cqi.cqi_from_snr(16.5) == 8
    np.testing.assert_array_equal(
        cqi.cqi_from_snr(np.array([0.0, 10.0, 29.0])), [0, 5, 15])


def test_cqi_report_pack():
    r = cqi.CqiReport(wideband_cqi=11)
    bits = cqi.pack_wideband(r, pmi_present=True, pmi=2)
    assert bits.shape[0] == 6
    c, p = cqi.unpack_wideband(bits, pmi_present=True)
    assert (c, p) == (11, 2)


def test_srs_roundtrip():
    cell = G.CellConfig(nof_prb=25, cell_id=17, cfi=1)
    cfg = srs.SrsConfig(cell=cell, n_prb_srs=16, prb_offset=2,
                        cyclic_shift=3)
    tx = srs.put_srs(cfg, np.zeros((2, 14, cell.nre), np.complex64), 1)
    h_true = 0.8 * np.exp(1j * 0.9)
    nv = snr_to_noise_var(20.0) * 0.1
    rx = awgn(jax.random.PRNGKey(0), np.asarray(tx) * h_true, float(nv))
    est = srs.estimate_srs(cfg, rx, 1)
    h = np.asarray(est["h"])
    assert np.mean(np.abs(h - h_true) ** 2) < 0.01
    assert float(np.asarray(est["snr_db"]).mean()) > 10.0


def test_srs_comb_positions():
    cell = G.CellConfig(nof_prb=25, cell_id=17, cfi=1)
    cfg = srs.SrsConfig(cell=cell, n_prb_srs=8, k_tc=1)
    ks = srs.srs_subcarriers(cfg)
    assert (ks % 2 == 1).all()
    assert ks.size == 48
