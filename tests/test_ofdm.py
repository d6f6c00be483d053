"""OFDM loopback parity: reference gate is MSE < 1e-4 (ofdm_test.c:182)."""

import numpy as np
import pytest

from srsran_4g_tpu.ops.ofdm import OfdmConfig, modulate, demodulate


def rand_grid(rng, cfg, batch=()):
    shape = batch + (cfg.nsymb_sf, cfg.nre)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    ) / np.sqrt(2)


@pytest.mark.parametrize("nof_prb", [6, 15, 25, 50, 75, 100])
def test_loopback_mse(nof_prb):
    cfg = OfdmConfig(nof_prb=nof_prb)
    rng = np.random.default_rng(nof_prb)
    grid = rand_grid(rng, cfg, batch=(2,))
    samples = np.asarray(modulate(cfg, grid))
    assert samples.shape == (2, cfg.sf_len)
    out = np.asarray(demodulate(cfg, samples))
    mse = np.mean(np.abs(out - grid) ** 2) / np.mean(np.abs(grid) ** 2)
    assert mse < 1e-4, f"MSE {mse} for {nof_prb} PRB"


def test_loopback_rx_window_offset():
    cfg = OfdmConfig(nof_prb=25, rx_window_offset=0.5)
    rng = np.random.default_rng(7)
    grid = rand_grid(rng, cfg)
    out = np.asarray(demodulate(cfg, np.asarray(modulate(OfdmConfig(nof_prb=25), grid))))
    mse = np.mean(np.abs(out - grid) ** 2)
    assert mse < 1e-4


def test_extended_cp():
    cfg = OfdmConfig(nof_prb=6, normal_cp=False)
    rng = np.random.default_rng(3)
    grid = rand_grid(rng, cfg)
    out = np.asarray(demodulate(cfg, np.asarray(modulate(cfg, grid))))
    assert np.mean(np.abs(out - grid) ** 2) < 1e-4


def test_power_normalization():
    # Unit-power grid -> approx unit-power time samples (sqrt(N)/N scaling).
    cfg = OfdmConfig(nof_prb=50)
    rng = np.random.default_rng(11)
    grid = rand_grid(rng, cfg)
    samples = np.asarray(modulate(cfg, grid))
    p = np.mean(np.abs(samples) ** 2)
    occupancy = cfg.nre / cfg.symbol_sz
    assert abs(p - occupancy) < 0.1 * occupancy
