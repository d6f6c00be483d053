"""PUCCH format 1a/1b/2 tests (reference: pucch_test.c)."""

import numpy as np
import pytest

import jax

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pucch
from srsran_4g_tpu.ops import block_code

CELL = G.CellConfig(nof_prb=25, cell_id=31, cfi=1)


def test_block_code_roundtrip():
    rng = np.random.default_rng(0)
    for n, a in ((20, 4), (20, 10), (32, 6)):
        bits = rng.integers(0, 2, size=(8, a)).astype(np.int8)
        coded = np.asarray(block_code.encode(bits, n))
        llr = (2.0 * coded - 1.0).astype(np.float32) * 4
        out, _ = block_code.decode(llr, n, a)
        np.testing.assert_array_equal(np.asarray(out), bits)


@pytest.mark.parametrize("nof_bits", [1, 2])
def test_pucch_format1_roundtrip(nof_bits):
    cfg = pucch.PucchConfig(cell=CELL, subframe=3, n_pucch=11)
    rng = np.random.default_rng(nof_bits)
    bits = rng.integers(0, 2, size=(4, nof_bits)).astype(np.int8)
    tx = pucch.encode_format1(cfg, bits)
    h = 0.8 * np.exp(1j * 1.1)
    rx = awgn(jax.random.PRNGKey(0), np.asarray(tx) * h,
              float(snr_to_noise_var(5.0)) / CELL.nof_prb)
    out = pucch.decode_format1(cfg, rx, nof_bits)
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)
    assert np.asarray(out["detected"]).all()


def test_pucch_format1_orthogonal_users():
    """Two UEs on different resource indices do not interfere."""
    cfg_a = pucch.PucchConfig(cell=CELL, subframe=1, n_pucch=0)
    cfg_b = pucch.PucchConfig(cell=CELL, subframe=1, n_pucch=1)
    bits_a = np.array([[1]], dtype=np.int8)
    bits_b = np.array([[0]], dtype=np.int8)
    tx = np.asarray(pucch.encode_format1(cfg_a, bits_a)) + np.asarray(
        pucch.encode_format1(cfg_b, bits_b))
    out_a = pucch.decode_format1(cfg_a, tx, 1)
    out_b = pucch.decode_format1(cfg_b, tx, 1)
    np.testing.assert_array_equal(np.asarray(out_a["bits"]), bits_a)
    np.testing.assert_array_equal(np.asarray(out_b["bits"]), bits_b)


@pytest.mark.parametrize("a", [4, 11])
def test_pucch_format2_roundtrip(a):
    cfg = pucch.PucchConfig(cell=CELL, subframe=2, n_pucch=3)
    rng = np.random.default_rng(a)
    bits = rng.integers(0, 2, size=(3, a)).astype(np.int8)
    tx = pucch.encode_format2(cfg, bits)
    h = 1.1 * np.exp(-1j * 0.4)
    rx = awgn(jax.random.PRNGKey(1), np.asarray(tx) * h,
              float(snr_to_noise_var(8.0)) / CELL.nof_prb)
    out = pucch.decode_format2(cfg, rx, a)
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_pucch_prb_hopping():
    cfg = pucch.PucchConfig(cell=CELL, subframe=0, n_pucch=0)
    p0 = pucch.pucch_prb(cfg, 0)
    p1 = pucch.pucch_prb(cfg, 1)
    assert {p0, p1} == {0, CELL.nof_prb - 1}
