"""PDSCH end-to-end chain tests.

Parity model: reference lib/src/phy/phch/test/pdsch_test.c:505-547 — decode
must return CRC OK across MCS/PRB sweeps; chest gates from
chest_test_dl.c:190-207 (channel-estimate MSE).
"""

import numpy as np
import pytest

import jax

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import chest, equalizer, grid as G, pdsch
from srsran_4g_tpu.ops.ofdm import OfdmConfig, modulate, demodulate

CELL = G.CellConfig(nof_prb=25, cell_id=123, cfi=2)


def make_cfg(mod="qpsk", tbs=1000, subframe=1, **kw):
    return pdsch.PdschConfig(
        cell=CELL, rnti=0x1234, subframe=subframe, mod=mod, tbs=tbs, **kw
    )


def test_re_indices_disjoint_from_crs_and_control():
    cfg = make_cfg()
    mask = G.reserved_mask(CELL, 1)
    flat_mask = mask.reshape(-1)
    assert not flat_mask[cfg.re_indices].any()
    # control symbols excluded
    assert (cfg.re_indices // CELL.nre >= CELL.cfi).all()


def test_crs_values_unit_power():
    v = G.crs_values(CELL, 0, 0)
    np.testing.assert_allclose(np.abs(v), 1.0, atol=1e-6)


def test_chest_flat_channel():
    """Known flat channel: estimate MSE must be tiny (chest_test_dl ideal)."""
    cfg = make_cfg()
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
    h_true = 0.8 * np.exp(1j * 0.7)
    rx = np.asarray(tx) * h_true
    est = chest.estimate(chest.ChestConfig(cell=CELL), rx, cfg.subframe)
    h = np.asarray(est["h"])
    mse = np.mean(np.abs(h - h_true) ** 2)
    assert mse < 1e-6
    assert np.asarray(est["noise_var"]).max() < 1e-6


def test_chest_noisy_mse():
    cfg = make_cfg()
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
    h_true = 1.1 * np.exp(-1j * 1.1)
    nv = snr_to_noise_var(10.0)
    rx = awgn(jax.random.PRNGKey(0), np.asarray(tx) * h_true, nv)
    est = chest.estimate(chest.ChestConfig(cell=CELL), rx, cfg.subframe)
    h = np.asarray(est["h"])
    mse = np.mean(np.abs(h - h_true) ** 2)
    assert mse < 0.05  # heavily averaged; well below noise floor
    # noise estimate within 3 dB of the truth
    nv_est = float(np.mean(np.asarray(est["noise_var"])))
    assert 0.5 * float(nv) < nv_est < 2.0 * float(nv)


@pytest.mark.parametrize("mod,tbs,snr_db", [
    ("qpsk", 1000, 10.0),
    ("16qam", 2000, 16.0),
    ("64qam", 3000, 22.0),
])
def test_pdsch_known_channel(mod, tbs, snr_db):
    cfg = make_cfg(mod=mod, tbs=tbs)
    rng = np.random.default_rng(tbs)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = pdsch.encode(cfg, bits)
    nv = snr_to_noise_var(snr_db, signal_power=1.0)
    rx = awgn(jax.random.PRNGKey(tbs), tx, nv)
    h = np.ones((2, CELL.nsymb, CELL.nre), np.complex64)
    out = pdsch.decode(cfg, rx, h=h, noise_var=float(nv), n_iter=5)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_pdsch_full_receiver_with_chest():
    """encode → CRS → flat channel + AWGN → chest → decode (ue_dl path)."""
    cfg = make_cfg(mod="16qam", tbs=2000)
    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, size=(4, cfg.tbs)).astype(np.int8)
    tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
    h_true = 0.9 * np.exp(1j * 0.3)
    nv = snr_to_noise_var(15.0) * abs(h_true) ** 2
    rx = awgn(jax.random.PRNGKey(1), np.asarray(tx) * h_true, float(nv))
    out = pdsch.decode(cfg, rx, n_iter=5)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_pdsch_through_ofdm():
    """Full subframe: grid → OFDM mod → samples → OFDM demod → decode."""
    cfg = make_cfg(mod="qpsk", tbs=1000, subframe=5)  # exercises PSS/SSS mask
    ofdm_cfg = OfdmConfig(nof_prb=CELL.nof_prb)
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx_grid = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
    samples = modulate(ofdm_cfg, tx_grid)
    # sample-domain noise at high SNR
    rx_samples = awgn(jax.random.PRNGKey(2), samples, 1e-4)
    rx_grid = demodulate(ofdm_cfg, rx_samples)
    out = pdsch.decode(cfg, rx_grid, n_iter=4)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_alamouti_roundtrip():
    rng = np.random.default_rng(3)
    n = 256
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    h0 = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    h1 = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    # hold h constant over RE pairs as the decoder assumes
    h0[1::2] = h0[0::2]
    h1[1::2] = h1[0::2]
    # transmit per LTE SFBC mapping
    x0, x1 = x[0::2], x[1::2]
    y0 = (h0[0::2] * x0 - h1[0::2] * np.conj(x1)) / np.sqrt(2)
    y1 = (h0[0::2] * x1 + h1[0::2] * np.conj(x0)) / np.sqrt(2)
    y = np.empty(n, np.complex64)
    y[0::2], y[1::2] = y0, y1
    xhat, _ = equalizer.alamouti_decode_2x1(y, h0.astype(np.complex64),
                                            h1.astype(np.complex64), 1e-4)
    np.testing.assert_allclose(np.asarray(xhat), x, atol=1e-4)
