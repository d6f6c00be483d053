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


@pytest.mark.parametrize("nof_ack", [1, 2])
def test_pucch_format2ab_roundtrip(nof_ack):
    """Format 2a/2b: CQI + ACK on the second DMRS symbol, through AWGN."""
    cfg = pucch.PucchConfig(cell=CELL, subframe=2, n_pucch=5, rnti=0x4601)
    rng = np.random.default_rng(7 + nof_ack)
    cqi = rng.integers(0, 2, size=(6, 6)).astype(np.int8)
    ack = rng.integers(0, 2, size=(6, nof_ack)).astype(np.int8)
    tx = pucch.encode_format2(cfg, cqi, ack_bits=ack)
    rx = awgn(jax.random.PRNGKey(1), tx, snr_to_noise_var(10.0))
    out = pucch.decode_format2(cfg, rx, nof_bits=6, nof_ack=nof_ack)
    np.testing.assert_array_equal(np.asarray(out["bits"]), cqi)
    np.testing.assert_array_equal(np.asarray(out["ack_bits"]), ack)


@pytest.mark.parametrize("n_ack", [3, 7, 11])
def test_pucch_format3_roundtrip(n_ack):
    """Format 3: up to 11 ACK bits, block-spread DFT-S-OFDM, through AWGN."""
    cfg = pucch.PucchConfig(cell=CELL, subframe=4, n_pucch=7, rnti=0x4601)
    rng = np.random.default_rng(n_ack)
    ack = rng.integers(0, 2, size=(5, n_ack)).astype(np.int8)
    tx = pucch.encode_format3(cfg, ack)
    rx = awgn(jax.random.PRNGKey(2), tx, snr_to_noise_var(6.0))
    out = pucch.decode_format3(cfg, rx, nof_bits=n_ack)
    np.testing.assert_array_equal(np.asarray(out["bits"]), ack)


def test_pucch_format3_cover_orthogonality():
    """Two UEs on the same format-3 PRB with different n_oc separate."""
    rng = np.random.default_rng(3)
    acks = [rng.integers(0, 2, size=(1, 4)).astype(np.int8) for _ in range(2)]
    cfgs = [pucch.PucchConfig(cell=CELL, subframe=1, n_pucch=n, rnti=100 + n)
            for n in (0, 1)]  # same PRB (m=0), n_oc 0 vs 1
    tx = pucch.encode_format3(cfgs[0], acks[0]) + pucch.encode_format3(
        cfgs[1], acks[1])
    for cfg, ack in zip(cfgs, acks):
        out = pucch.decode_format3(cfg, tx, nof_bits=4)
        np.testing.assert_array_equal(np.asarray(out["bits"]), ack)


def test_pucch_format2_scrambling_rnti():
    """Different RNTIs decorrelate: decoding with the wrong RNTI fails."""
    cfg_a = pucch.PucchConfig(cell=CELL, subframe=0, n_pucch=2, rnti=10)
    cfg_b = pucch.PucchConfig(cell=CELL, subframe=0, n_pucch=2, rnti=11)
    cqi = np.ones((1, 8), np.int8)
    tx = pucch.encode_format2(cfg_a, jax.numpy.asarray(cqi))
    ok = pucch.decode_format2(cfg_a, tx, nof_bits=8)
    bad = pucch.decode_format2(cfg_b, tx, nof_bits=8)
    np.testing.assert_array_equal(np.asarray(ok["bits"]), cqi)
    assert float(ok["metric"][0]) > float(bad["metric"][0])
