"""Modulation table + soft demod tests (reference: modem/test/modem_test.c)."""

import numpy as np
import pytest

from srsran_4g_tpu.ops import modem, scrambling
from srsran_4g_tpu.utils.constants import BITS_PER_SYMBOL

MODS = ["bpsk", "qpsk", "16qam", "64qam", "256qam"]


@pytest.mark.parametrize("mod", MODS)
def test_unit_energy(mod):
    table = modem._symbol_table(mod)
    np.testing.assert_allclose(np.mean(np.abs(table) ** 2), 1.0, atol=1e-6)


def test_qpsk_table():
    t = modem._symbol_table("qpsk")
    s = 1 / np.sqrt(2)
    np.testing.assert_allclose(t, [s + 1j * s, s - 1j * s, -s + 1j * s, -s - 1j * s],
                               atol=1e-7)


def test_16qam_table_spec_points():
    # TS 36.211 Table 7.1.3-1 first rows: 0000 → (1+j)/√10, 0001 → (1+3j)/√10
    t = modem._symbol_table("16qam")
    n = np.sqrt(10)
    np.testing.assert_allclose(t[0b0000], (1 + 1j) / n, atol=1e-7)
    np.testing.assert_allclose(t[0b0001], (1 + 3j) / n, atol=1e-7)
    np.testing.assert_allclose(t[0b0010], (3 + 1j) / n, atol=1e-7)
    np.testing.assert_allclose(t[0b1111], (-3 - 3j) / n, atol=1e-7)


def test_256qam_spec_point():
    t = modem._symbol_table("256qam")
    n = np.sqrt(170)
    np.testing.assert_allclose(t[0], (5 + 5j) / n, atol=1e-7)


@pytest.mark.parametrize("mod", MODS)
def test_mod_demod_roundtrip_noiseless(mod):
    qm = BITS_PER_SYMBOL[mod]
    rng = np.random.default_rng(42)
    bits = rng.integers(0, 2, size=(3, 32 * qm)).astype(np.int8)
    syms = modem.modulate(mod, bits)
    hard = np.asarray(modem.demodulate_hard(mod, syms))
    np.testing.assert_array_equal(hard, bits)


@pytest.mark.parametrize("mod", ["qpsk", "16qam", "64qam"])
def test_soft_demod_awgn_ber(mod):
    """At high SNR, hard decisions from LLRs must have (near-)zero errors."""
    qm = BITS_PER_SYMBOL[mod]
    rng = np.random.default_rng(1)
    n_sym = 4096
    bits = rng.integers(0, 2, size=(n_sym * qm,)).astype(np.int8)
    syms = np.asarray(modem.modulate(mod, bits))
    snr_db = 25.0
    nv = 10 ** (-snr_db / 10)
    noise = (rng.standard_normal(n_sym) + 1j * rng.standard_normal(n_sym)) * np.sqrt(nv / 2)
    llr = np.asarray(modem.demodulate_soft(mod, syms + noise, nv))
    ber = np.mean((llr > 0) != bits)
    assert ber < 1e-3


def test_llr_scaling_matches_exact_qpsk():
    """QPSK max-log LLR should equal 2·sqrt(2)·y/σ² per axis."""
    rng = np.random.default_rng(2)
    y = (rng.standard_normal(100) + 1j * rng.standard_normal(100)).astype(np.complex64)
    nv = 0.5
    llr = np.asarray(modem.demodulate_soft("qpsk", y, nv))
    s = 1 / np.sqrt(2)
    expect_i = ((np.real(y) + s) ** 2 - (np.real(y) - s) ** 2) / nv * -1
    # d0 - d1: b=0 level +s, b=1 level -s → (y-s)^2 - (y+s)^2 = -4sy
    expect_i = ((np.real(y) - s) ** 2 - (np.real(y) + s) ** 2) / nv
    np.testing.assert_allclose(llr[0::2], expect_i, rtol=1e-4, atol=1e-4)


def test_scrambling_roundtrip():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, size=200).astype(np.int8)
    seq = rng.integers(0, 2, size=200).astype(np.int8)
    scr = np.asarray(scrambling.scramble_bits(bits, seq))
    np.testing.assert_array_equal(np.asarray(scrambling.scramble_bits(scr, seq)), bits)
    # LLR descramble: positive LLR for bit 1
    llr = (2.0 * scr - 1.0).astype(np.float32)
    dll = np.asarray(scrambling.descramble_llrs(llr, seq))
    np.testing.assert_array_equal((dll > 0).astype(np.int8), bits)
