"""PBCH and PCFICH tests (reference: pbch_test.c, pcfich_test.c)."""

import numpy as np
import pytest

import jax

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pbch, pcfich

CELL = G.CellConfig(nof_prb=6, cell_id=150, cfi=2)


def test_pbch_re_count_and_positions():
    idx = pbch.pbch_re_indices(CELL)
    assert idx.shape[0] == 240
    # all inside symbols 7..10, central 72 SC
    sym = idx // CELL.nre
    assert set(np.unique(sym)) == {7, 8, 9, 10}


@pytest.mark.parametrize("n_ports", [1, 2, 4])
def test_pbch_single_frame_decode(n_ports):
    rng = np.random.default_rng(n_ports)
    mib = rng.integers(0, 2, size=(2, 24)).astype(np.int8)
    syms = np.asarray(pbch.encode(CELL, mib, n_ports=n_ports))
    assert syms.shape == (2, 4, 240)
    grid_tx = np.zeros((2, CELL.nsymb, CELL.nre), np.complex64)
    grid_tx = pbch.put_into_grid(CELL, grid_tx, syms[:, 0])
    h = np.full(grid_tx.shape, 0.9 * np.exp(1j * 0.4), np.complex64)
    nv = snr_to_noise_var(10.0)
    rx = awgn(jax.random.PRNGKey(0), np.asarray(grid_tx) * h, float(nv))
    out = pbch.decode(CELL, rx, h, float(nv), frame_idx=0)
    assert np.asarray(out["crc_ok"]).all()
    assert (np.asarray(out["n_ports"]) == n_ports).all()
    np.testing.assert_array_equal(np.asarray(out["mib"]), mib)


def test_pbch_multiframe_combining():
    """At very low SNR one frame fails but 4 combined frames decode."""
    rng = np.random.default_rng(42)
    mib = rng.integers(0, 2, size=(4, 24)).astype(np.int8)
    syms = np.asarray(pbch.encode(CELL, mib, n_ports=1))
    nv = snr_to_noise_var(-8.0)
    h = np.ones((4, CELL.nsymb, CELL.nre), np.complex64)
    buf = None
    outs = []
    for f in range(4):
        grid_tx = np.zeros((4, CELL.nsymb, CELL.nre), np.complex64)
        grid_tx = pbch.put_into_grid(CELL, grid_tx, syms[:, f])
        rx = awgn(jax.random.PRNGKey(f), np.asarray(grid_tx), float(nv))
        out = pbch.decode(CELL, rx, h, float(nv), frame_idx=f, llr_buffer=buf)
        buf = out["llr_buffer"]
        outs.append(np.asarray(out["crc_ok"]).all())
    assert outs[-1], f"combined decode failed (per-frame: {outs})"
    np.testing.assert_array_equal(np.asarray(out["mib"]), mib)


def test_pcfich_roundtrip():
    rng = np.random.default_rng(1)
    for sf in (0, 3):
        cfi = np.array([1, 2, 3, 2], dtype=np.int32)
        syms = pcfich.encode(CELL, cfi, sf)
        grid_tx = np.zeros((4, CELL.nsymb, CELL.nre), np.complex64)
        grid_tx = pcfich.put_into_grid(CELL, grid_tx, syms)
        h = np.full(grid_tx.shape, 1.2 * np.exp(-1j * 0.2), np.complex64)
        nv = snr_to_noise_var(5.0)
        rx = awgn(jax.random.PRNGKey(sf), np.asarray(grid_tx) * h, float(nv))
        out = pcfich.decode(CELL, rx, h, float(nv), sf)
        np.testing.assert_array_equal(np.asarray(out["cfi"]), cfi)


def test_pcfich_regs_avoid_crs():
    idx = pcfich.pcfich_re_indices(CELL)
    assert idx.shape[0] == 16
    mask = G.reserved_mask(CELL, 1)  # symbol 0 is control region anyway
    crs_sym0 = np.zeros(CELL.nre, bool)
    for p in range(2):
        syms, scs = G.crs_pattern(CELL, p)
        for s, k in zip(syms, scs):
            if s == 0:
                crs_sym0[k] = True
    assert not crs_sym0[idx].any()
