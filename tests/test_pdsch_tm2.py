"""PDSCH TM2 (2-port SFBC) end-to-end (reference: pdsch_test -x 2 TM2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pdsch

CELL2 = G.CellConfig(nof_prb=25, cell_id=99, cfi=2, nof_ports=2)


def make_cfg(mod="qpsk", tbs=1000):
    return pdsch.PdschConfig(cell=CELL2, rnti=0x1234, subframe=3, mod=mod, tbs=tbs)


def test_tm2_known_channel():
    cfg = make_cfg()
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = np.asarray(pdsch.encode(cfg, bits))  # (B, 2, nsymb, nre)
    assert tx.shape[1] == 2
    h0 = 0.9 * np.exp(1j * 0.4)
    h1 = 0.7 * np.exp(-1j * 1.2)
    y = tx[:, 0] * h0 + tx[:, 1] * h1
    nv = snr_to_noise_var(12.0)
    rx = awgn(jax.random.PRNGKey(0), jnp.asarray(y), float(nv))
    h = np.stack([np.full(y.shape, h0), np.full(y.shape, h1)], axis=1).astype(
        np.complex64
    )
    out = pdsch.decode(cfg, rx, h=jnp.asarray(h), noise_var=float(nv), n_iter=5)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_tm2_with_chest():
    """Full TM2 receive incl. per-port CRS channel estimation."""
    cfg = make_cfg(mod="16qam", tbs=1500)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
    h0 = 1.1 * np.exp(1j * 0.2)
    h1 = 0.8 * np.exp(1j * 2.0)
    y = np.asarray(tx)[:, 0] * h0 + np.asarray(tx)[:, 1] * h1
    nv = snr_to_noise_var(18.0)
    rx = awgn(jax.random.PRNGKey(1), jnp.asarray(y), float(nv))
    out = pdsch.decode(cfg, rx, n_iter=5)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_tm2_diversity_gain():
    """With one port in a deep fade, SFBC still decodes (diversity)."""
    cfg = make_cfg()
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
    h0 = 0.05  # deep fade on port 0
    h1 = 1.0
    y = np.asarray(tx)[:, 0] * h0 + np.asarray(tx)[:, 1] * h1
    nv = snr_to_noise_var(10.0)
    rx = awgn(jax.random.PRNGKey(2), jnp.asarray(y), float(nv))
    out = pdsch.decode(cfg, rx, n_iter=5)
    assert np.asarray(out["crc_ok"]).all()


CELL4 = G.CellConfig(nof_prb=25, cell_id=99, cfi=2, nof_ports=4)


def test_tm2_4port_known_channel():
    """SFBC-FSTD (4 TX ports) with a known flat channel per port."""
    cfg = pdsch.PdschConfig(cell=CELL4, rnti=0x1234, subframe=3,
                            mod="qpsk", tbs=1000)
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = np.asarray(pdsch.encode(cfg, bits))  # (B, 4, nsymb, nre)
    assert tx.shape[1] == 4
    hs = [0.9 * np.exp(1j * 0.4), 0.6 * np.exp(-1j * 1.2),
          1.1 * np.exp(1j * 2.2), 0.8 * np.exp(-1j * 0.7)]
    y = sum(tx[:, p] * hs[p] for p in range(4))
    nv = snr_to_noise_var(12.0)
    rx = awgn(jax.random.PRNGKey(3), jnp.asarray(y), float(nv))
    h = np.stack([np.full(y.shape, hp) for hp in hs], axis=1).astype(
        np.complex64)
    out = pdsch.decode(cfg, rx, h=jnp.asarray(h), noise_var=float(nv))
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_tm2_4port_with_chest():
    """Full 4-port receive incl. per-port CRS channel estimation."""
    cfg = pdsch.PdschConfig(cell=CELL4, rnti=0x1234, subframe=2,
                            mod="16qam", tbs=1480)
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
    hs = [1.0, 0.7 * np.exp(1j * 1.0), 0.9 * np.exp(-1j * 0.5),
          1.2 * np.exp(1j * 2.8)]
    y = sum(np.asarray(tx)[:, p] * hs[p] for p in range(4))
    nv = snr_to_noise_var(20.0)
    rx = awgn(jax.random.PRNGKey(4), jnp.asarray(y), float(nv))
    out = pdsch.decode(cfg, rx, n_iter=5)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_tm2_4port_diversity_gain():
    """Deep fade on one pair's port still decodes via the other port."""
    cfg = pdsch.PdschConfig(cell=CELL4, rnti=0x1234, subframe=3,
                            mod="qpsk", tbs=600)
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
    hs = [0.02, 1.0, 1.0 * np.exp(1j * 1.5), 0.03]  # ports 0 and 3 faded
    y = sum(np.asarray(tx)[:, p] * hs[p] for p in range(4))
    nv = snr_to_noise_var(14.0)
    rx = awgn(jax.random.PRNGKey(6), jnp.asarray(y), float(nv))
    out = pdsch.decode(cfg, rx, n_iter=5)
    assert np.asarray(out["crc_ok"]).all()
