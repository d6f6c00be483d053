"""Convolutional code + Viterbi tests (reference: viterbi_test.c)."""

import numpy as np
import pytest

from srsran_4g_tpu.ops import convcode, rate_match


def conv_encode_direct(bits):
    """Independent tail-biting encoder, TS 36.212 §5.1.3.1."""
    n = len(bits)
    reg = list(bits[-6:][::-1])  # reg[0] = u_{N-1} ... reg[5] = u_{N-6}
    outs = [[], [], []]
    for u in bits:
        window = [u] + reg  # D^0 .. D^6
        for gi, g in enumerate((0o133, 0o171, 0o165)):
            gb = [int(c) for c in bin(g)[2:].zfill(7)]
            outs[gi].append(sum(w * c for w, c in zip(window, gb)) % 2)
        reg = [u] + reg[:5]
    return np.array(outs)


def test_encoder_matches_direct():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(1, 40)).astype(np.int8)
    got = np.asarray(convcode.conv_encode(bits))[0]
    expect = conv_encode_direct(list(bits[0]))
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("n", [40, 100])
def test_viterbi_noiseless(n):
    rng = np.random.default_rng(n)
    bits = rng.integers(0, 2, size=(3, n)).astype(np.int8)
    d = np.asarray(convcode.conv_encode(bits)).astype(np.float32)
    llr = 4.0 * (2.0 * d - 1.0)
    out = np.asarray(convcode.viterbi_decode(llr))
    np.testing.assert_array_equal(out, bits)


def test_viterbi_awgn():
    rng = np.random.default_rng(1)
    n, b = 40, 16
    bits = rng.integers(0, 2, size=(b, n)).astype(np.int8)
    d = np.asarray(convcode.conv_encode(bits)).astype(np.float64)
    ebn0 = 10 ** (4.0 / 10)
    sigma2 = 1.0 / (2 * (1 / 3) * ebn0)
    y = (1 - 2 * d) + rng.standard_normal(d.shape) * np.sqrt(sigma2)
    llr = (-2 * y / sigma2).astype(np.float32)
    out = np.asarray(convcode.viterbi_decode(llr))
    ber = np.mean(out != bits)
    assert ber < 5e-3, ber


def test_conv_rate_match_roundtrip():
    rng = np.random.default_rng(2)
    n = 120
    d = rng.integers(0, 2, size=(2, 3, n)).astype(np.int8)
    for e in (100, 3 * n, 1920):
        tx = np.asarray(rate_match.conv_rate_match(d, e))
        assert tx.shape == (2, e)
        llr = (2.0 * tx - 1.0).astype(np.float32)
        sb = np.asarray(rate_match.conv_rate_dematch(llr, n))
        g = rate_match.conv_rm_indices(n, e)
        touched = np.zeros(3 * n, dtype=bool)
        touched[g] = True
        flat_d = d.reshape(2, -1)
        flat_sb = sb.reshape(2, -1)
        np.testing.assert_array_equal(
            (flat_sb[:, touched] > 0).astype(np.int8), flat_d[:, touched]
        )


def test_conv_rm_plus_viterbi_chain():
    """PBCH-like chain: 40 bits → conv → RM 1920 → dematch → viterbi."""
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, size=(2, 40)).astype(np.int8)
    d = np.asarray(convcode.conv_encode(bits))
    tx = np.asarray(rate_match.conv_rate_match(d, 1920))
    llr = (2.0 * tx - 1.0).astype(np.float32) * 4
    sb = rate_match.conv_rate_dematch(llr, 40)
    out = np.asarray(convcode.viterbi_decode(sb))
    np.testing.assert_array_equal(out, bits)
