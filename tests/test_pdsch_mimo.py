"""PDSCH TM3/TM4 2x2 dual-codeword spatial multiplexing
(reference: pdsch_test.c TM3/TM4 sweeps, srsran_dlsch_decode2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pdsch, pdsch_mimo

CELL = G.CellConfig(nof_prb=25, cell_id=31, cfi=2, nof_ports=2)


def _mix(tx, hmat):
    """(B, 2, nsymb, nre) ports through a constant 2x2 channel."""
    t = np.asarray(tx)
    y0 = hmat[0, 0] * t[:, 0] + hmat[0, 1] * t[:, 1]
    y1 = hmat[1, 0] * t[:, 0] + hmat[1, 1] * t[:, 1]
    return jnp.asarray(np.stack([y0, y1], axis=1))


HMAT = np.array([[1.0 + 0.2j, 0.35 - 0.5j],
                 [0.25 + 0.45j, -0.9 + 0.3j]], np.complex64)


@pytest.mark.parametrize("tm,pmi", [("tm4", 0), ("tm4", 2), ("tm3", 0)])
def test_mimo_2x2_known_channel(tm, pmi):
    cfg = pdsch_mimo.PdschMimoConfig(
        cell=CELL, rnti=0x4601, subframe=4, mod0="qpsk", tbs0=1000,
        mod1="16qam", tbs1=2024, tm=tm, pmi=pmi)
    rng = np.random.default_rng(pmi + (tm == "tm3"))
    tb0 = rng.integers(0, 2, (2, cfg.tbs0)).astype(np.int8)
    tb1 = rng.integers(0, 2, (2, cfg.tbs1)).astype(np.int8)
    tx = pdsch_mimo.encode(cfg, jnp.asarray(tb0), jnp.asarray(tb1))
    nv = float(snr_to_noise_var(20.0))
    rx = awgn(jax.random.PRNGKey(1), _mix(tx, HMAT), nv)
    s = CELL.nsymb * CELL.nre
    h = np.broadcast_to(HMAT[None, :, :, None], (2, 2, 2, s)).reshape(
        2, 2, 2, CELL.nsymb, CELL.nre)
    out = pdsch_mimo.decode(cfg, rx, h=jnp.asarray(h), noise_var=nv)
    assert np.asarray(out["crc_ok0"]).all() and np.asarray(
        out["crc_ok1"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits0"]), tb0)
    np.testing.assert_array_equal(np.asarray(out["bits1"]), tb1)


def test_mimo_2x2_with_chest():
    """Full receive: per-antenna per-port CRS chest + MMSE + dual decode."""
    cfg = pdsch_mimo.PdschMimoConfig(
        cell=CELL, rnti=0x4601, subframe=2, mod0="16qam", tbs0=2024,
        mod1="16qam", tbs1=2024, tm="tm4", pmi=1)
    rng = np.random.default_rng(9)
    tb0 = rng.integers(0, 2, (2, cfg.tbs0)).astype(np.int8)
    tb1 = rng.integers(0, 2, (2, cfg.tbs1)).astype(np.int8)
    tx = pdsch.add_crs(cfg.cw[0],
                       pdsch_mimo.encode(cfg, jnp.asarray(tb0),
                                         jnp.asarray(tb1)))
    nv = float(snr_to_noise_var(24.0))
    rx = awgn(jax.random.PRNGKey(3), _mix(tx, HMAT), nv)
    out = pdsch_mimo.decode(cfg, rx, n_iter=5)
    assert np.asarray(out["crc_ok0"]).all() and np.asarray(
        out["crc_ok1"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits0"]), tb0)
    np.testing.assert_array_equal(np.asarray(out["bits1"]), tb1)


def test_mimo_tm3_cdd_layer_balance():
    """TM3 CDD spreads each codeword across both ports: knocking out one
    TX port degrades both codewords about equally (open-loop diversity)."""
    cfg = pdsch_mimo.PdschMimoConfig(
        cell=CELL, rnti=0x4601, subframe=4, mod0="qpsk", tbs0=1000,
        mod1="qpsk", tbs1=1000, tm="tm3")
    rng = np.random.default_rng(2)
    tb0 = rng.integers(0, 2, (2, cfg.tbs0)).astype(np.int8)
    tb1 = rng.integers(0, 2, (2, cfg.tbs1)).astype(np.int8)
    tx = np.asarray(pdsch_mimo.encode(cfg, jnp.asarray(tb0),
                                      jnp.asarray(tb1)))
    p0 = np.abs(tx[:, 0]).sum()
    p1 = np.abs(tx[:, 1]).sum()
    assert abs(p0 - p1) / max(p0, p1) < 0.05  # CDD balances port power
