"""NR polar code tests (reference: polar_chain_test)."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_4g_tpu.ops import polar


def encode_direct(u):
    """Independent recursive F^{⊗n} implementation."""
    n = len(u)
    if n == 1:
        return np.array(u) % 2
    l = encode_direct(u[: n // 2])
    r = encode_direct(u[n // 2:])
    return np.concatenate([(l + r) % 2, r])


def test_encoder_matches_direct():
    rng = np.random.default_rng(0)
    for n_log in (3, 5, 8):
        n = 1 << n_log
        u = rng.integers(0, 2, size=n)
        got = np.asarray(polar.encode(jnp.asarray(u[None, :])))[0]
        np.testing.assert_array_equal(got, encode_direct(list(u)))


def test_frozen_mask():
    m = polar.frozen_mask(16, 5)
    assert m.sum() == 16  # 16 frozen, 16 info
    # position 31 (fully polarised) must always be information
    assert not m[31]
    # position 0 (worst channel) must be frozen for any K < N
    assert m[0]


@pytest.mark.parametrize("k,n_log", [(8, 5), (32, 7), (70, 8)])
def test_sc_decode_noiseless(k, n_log):
    rng = np.random.default_rng(k)
    bits = rng.integers(0, 2, size=(3, k)).astype(np.int8)
    cw = np.asarray(polar.encode_info(jnp.asarray(bits), n_log)).astype(np.float32)
    llr = 6.0 * (2 * cw - 1)
    out = np.asarray(polar.decode(jnp.asarray(llr), k, n_log))
    np.testing.assert_array_equal(out, bits)


def test_sc_decode_awgn():
    k, n_log = 40, 8  # rate ~0.16, very robust
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(8, k)).astype(np.int8)
    cw = np.asarray(polar.encode_info(jnp.asarray(bits), n_log)).astype(np.float64)
    snr_db = 0.0
    sigma2 = 10 ** (-snr_db / 10)
    y = (1 - 2 * cw) + rng.standard_normal(cw.shape) * np.sqrt(sigma2)
    llr = (-2 * y / sigma2).astype(np.float32)
    out = np.asarray(polar.decode(jnp.asarray(llr), k, n_log))
    ber = np.mean(out != bits)
    assert ber < 0.01, ber
