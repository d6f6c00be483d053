"""PUSCH (SC-FDMA) chain tests (reference: pusch_test.c, chest_test_ul)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pusch
from srsran_4g_tpu.models.refsignal_ul import base_sequence, pusch_dmrs

CELL = G.CellConfig(nof_prb=25, cell_id=42, cfi=1)


def test_base_sequence_unit_modulus():
    for m_sc in (12, 24, 36, 120, 300):
        for u in (0, 7, 29):
            r = base_sequence(u, 0, m_sc)
            np.testing.assert_allclose(np.abs(r), 1.0, atol=1e-6)
    # distinct groups give distinct sequences
    assert not np.allclose(base_sequence(0, 0, 36), base_sequence(1, 0, 36))


def test_transform_precode_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 12, 48)) + 1j * rng.standard_normal((2, 12, 48))
         ).astype(np.complex64)
    y = pusch.transform_precode(jnp.asarray(x))
    x2 = np.asarray(pusch.transform_deprecode(y))
    np.testing.assert_allclose(x2, x, atol=1e-5)
    # power preserved
    np.testing.assert_allclose(
        np.mean(np.abs(np.asarray(y)) ** 2), np.mean(np.abs(x) ** 2), rtol=1e-5)


@pytest.mark.parametrize("mod,tbs,snr_db", [("qpsk", 600, 10.0), ("16qam", 1000, 18.0)])
def test_pusch_loopback(mod, tbs, snr_db):
    cfg = pusch.PuschConfig(cell=CELL, rnti=0x777, subframe=2, mod=mod,
                            tbs=tbs, prb_start=3, nof_prb_alloc=4)
    rng = np.random.default_rng(tbs)
    bits = rng.integers(0, 2, size=(3, tbs)).astype(np.int8)
    tx = pusch.encode(cfg, bits)
    h = 0.9 * np.exp(1j * 0.6)
    nv = snr_to_noise_var(snr_db) * (cfg.m_sc / CELL.nre)
    rx = awgn(jax.random.PRNGKey(0), np.asarray(tx) * h, float(nv))
    out = pusch.decode(cfg, rx, n_iter=5)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_pusch_freq_selective_channel():
    """Mild frequency-selective channel: DMRS chest must track it."""
    cfg = pusch.PuschConfig(cell=CELL, rnti=0x777, subframe=1, mod="qpsk",
                            tbs=600, prb_start=0, nof_prb_alloc=8)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    tx = np.asarray(pusch.encode(cfg, bits))
    # 2-tap channel in freq domain over the grid
    k = np.arange(CELL.nre)
    h = (1.0 + 0.4 * np.exp(-2j * np.pi * k * 3 / CELL.nre))[None, None, :]
    rx = awgn(jax.random.PRNGKey(2), tx * h.astype(np.complex64),
              float(snr_to_noise_var(20.0) * cfg.m_sc / CELL.nre))
    out = pusch.decode(cfg, rx, n_iter=5)
    assert np.asarray(out["crc_ok"]).all()


def test_interleaver_is_permutation():
    cfg = pusch.PuschConfig(cell=CELL, rnti=1, subframe=0, mod="16qam",
                            tbs=1000, nof_prb_alloc=4)
    p = cfg.interleave_perm
    assert np.array_equal(np.sort(p), np.arange(cfg.g_bits))
