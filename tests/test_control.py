"""PDCCH / PHICH / REG mapping tests (reference: pdcch_test.c, phich_test.c)."""

import numpy as np
import pytest

import jax

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pdcch, phich, regs
from srsran_4g_tpu.models.pcfich import pcfich_re_indices

CELL = G.CellConfig(nof_prb=25, cell_id=77, cfi=2)


def test_reg_counts():
    # symbol 0: 2 REGs/PRB, symbols 1,2 (<=2 ports): 3 REGs/PRB
    assert regs.regs_in_symbol(CELL, 0).shape == (50, 4)
    assert regs.regs_in_symbol(CELL, 1).shape == (75, 4)
    assert regs.regs_in_symbol(CELL, 2).shape == (75, 4)


def test_phich_regs_disjoint_from_pcfich():
    ph = regs.phich_reg_indices(CELL, 1.0)
    assert ph.shape[0] == int(np.ceil(CELL.nof_prb / 8))
    pc = set(pcfich_re_indices(CELL).tolist())
    assert not (set(ph.reshape(-1).tolist()) & pc)
    # no duplicates within PHICH
    flat = ph.reshape(-1)
    assert len(set(flat.tolist())) == flat.size


def test_pdcch_regs_partition():
    """PCFICH + PHICH + PDCCH REGs exactly tile the control region."""
    p = regs.pdcch_regs(CELL, 2, 1.0)
    pc = pcfich_re_indices(CELL)
    ph = regs.phich_reg_indices(CELL, 1.0).reshape(-1)
    all_res = np.concatenate([p.reshape(-1), pc, ph])
    assert len(set(all_res.tolist())) == all_res.size  # disjoint
    # cfi=2 control region: symbol-0 REGs + symbol-1 REGs
    n_ctrl = 50 * 4 + 75 * 4
    assert all_res.size == n_ctrl


def test_cce_indices():
    cce = pdcch.cce_re_indices(CELL, 2)
    assert cce.shape[1] == 36
    flat = cce.reshape(-1)
    assert len(set(flat.tolist())) == flat.size


def test_phich_roundtrip():
    rng = np.random.default_rng(0)
    ack = np.array([1, 0, 1, 1], dtype=np.int8)
    syms = phich.encode(CELL, ack, group=0, nseq=3, subframe=2)
    grid_tx = np.zeros((4, CELL.nsymb, CELL.nre), np.complex64)
    grid_tx = phich.put_into_grid(CELL, grid_tx, syms, group=0)
    h = np.full(grid_tx.shape, 0.8 + 0.3j, np.complex64)
    nv = snr_to_noise_var(6.0)
    rx = awgn(jax.random.PRNGKey(0), np.asarray(grid_tx) * h, float(nv))
    out = phich.decode(CELL, rx, h, float(nv), group=0, nseq=3, subframe=2)
    np.testing.assert_array_equal(np.asarray(out["ack"]), ack)


def test_phich_orthogonality():
    """Two UEs on different sequences of the same group don't interfere."""
    ack_a = np.array([1, 0], dtype=np.int8)
    ack_b = np.array([0, 1], dtype=np.int8)
    sa = phich.encode(CELL, ack_a, group=1, nseq=0, subframe=0)
    sb = phich.encode(CELL, ack_b, group=1, nseq=1, subframe=0)
    grid_tx = np.zeros((2, CELL.nsymb, CELL.nre), np.complex64)
    grid_tx = phich.put_into_grid(CELL, grid_tx, sa + sb, group=1)
    h = np.ones(grid_tx.shape, np.complex64)
    out_a = phich.decode(CELL, np.asarray(grid_tx), h, 1e-3, group=1, nseq=0, subframe=0)
    out_b = phich.decode(CELL, np.asarray(grid_tx), h, 1e-3, group=1, nseq=1, subframe=0)
    np.testing.assert_array_equal(np.asarray(out_a["ack"]), ack_a)
    np.testing.assert_array_equal(np.asarray(out_b["ack"]), ack_b)


@pytest.mark.parametrize("l_agg,cce_start", [(1, 3), (4, 0), (8, 0)])
def test_pdcch_blind_decode(l_agg, cce_start):
    rng = np.random.default_rng(l_agg)
    rnti = 0x1234
    dci_len = 27
    dci = rng.integers(0, 2, size=(3, dci_len)).astype(np.int8)
    grid_tx = np.zeros((3, CELL.nsymb, CELL.nre), np.complex64)
    grid_tx = pdcch.put_dci(CELL, 2, 1, grid_tx, dci, rnti, l_agg, cce_start)
    h = np.full(grid_tx.shape, 1.1 * np.exp(1j * 0.5), np.complex64)
    nv = snr_to_noise_var(8.0)
    rx = awgn(jax.random.PRNGKey(1), np.asarray(grid_tx) * h, float(nv))
    cands = pdcch.search_space_candidates(CELL, 2, rnti, 1)
    cands = list({(l_agg, cce_start)} | set(cands))
    out = pdcch.blind_decode(CELL, 2, 1, rx, h, float(nv), rnti, dci_len,
                             candidates=cands)
    assert np.asarray(out["found"]).all()
    np.testing.assert_array_equal(np.asarray(out["dci"]), dci)


def test_pdcch_wrong_rnti_not_found():
    rng = np.random.default_rng(9)
    dci = rng.integers(0, 2, size=(2, 27)).astype(np.int8)
    grid_tx = np.zeros((2, CELL.nsymb, CELL.nre), np.complex64)
    grid_tx = pdcch.put_dci(CELL, 2, 1, grid_tx, dci, 0x1234, 4, 0)
    h = np.ones(grid_tx.shape, np.complex64)
    rx = awgn(jax.random.PRNGKey(2), np.asarray(grid_tx), 1e-3)
    out = pdcch.blind_decode(CELL, 2, 1, rx, h, 1e-3, 0x4321, 27)
    assert not np.asarray(out["found"]).any()
