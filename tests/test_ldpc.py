"""NR LDPC tests (reference: ldpc chain/enc/dec tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_4g_tpu.ops import ldpc


def parity_check(cw, bg, z):
    """Verify H·c = 0 via the shift matrix (independent of the encoder)."""
    kb, m, nfull = ldpc.bg_params(bg)
    h = ldpc._shift_matrix(bg, z)
    blocks = cw.reshape(-1, nfull, z)
    ok = True
    for i in range(m):
        acc = np.zeros((cw.shape[0], z), np.int64)
        for c in range(nfull):
            if h[i, c] >= 0:
                acc ^= np.roll(blocks[:, c], -int(h[i, c]), axis=-1)
        ok = ok and not acc.any()
    return ok


@pytest.mark.parametrize("bg,z", [(1, 16), (1, 96), (2, 16), (2, 52)])
def test_encoder_satisfies_parity(bg, z):
    kb = ldpc.bg_params(bg)[0]
    rng = np.random.default_rng(z)
    bits = rng.integers(0, 2, size=(2, kb * z)).astype(np.int8)
    cw = np.asarray(ldpc.encode(jnp.asarray(bits), bg, z))
    np.testing.assert_array_equal(cw[:, :kb * z], bits)  # systematic
    assert parity_check(cw, bg, z)


@pytest.mark.parametrize("bg,z", [(1, 32), (2, 32)])
def test_decode_noiseless(bg, z):
    kb, m, nfull = ldpc.bg_params(bg)
    rng = np.random.default_rng(bg)
    bits = rng.integers(0, 2, size=(2, kb * z)).astype(np.int8)
    cw = np.asarray(ldpc.encode(jnp.asarray(bits), bg, z)).astype(np.float32)
    llr = 8.0 * (2 * cw - 1)
    llr[:, :2 * z] = 0.0  # standard NR puncturing of the first 2Z
    out = np.asarray(ldpc.decode(jnp.asarray(llr), bg, z, n_iter=15))
    np.testing.assert_array_equal(out, bits)


def test_decode_awgn():
    bg, z = 1, 64
    kb = ldpc.bg_params(bg)[0]
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, size=(4, kb * z)).astype(np.int8)
    cw = np.asarray(ldpc.encode(jnp.asarray(bits), bg, z)).astype(np.float64)
    rate = kb / (ldpc.bg_params(bg)[2] - 2)  # ~1/3
    ebn0 = 10 ** (2.5 / 10)
    sigma2 = 1.0 / (2 * rate * ebn0)
    y = (1 - 2 * cw) + rng.standard_normal(cw.shape) * np.sqrt(sigma2)
    llr = (-2 * y / sigma2).astype(np.float32)
    llr[:, :2 * z] = 0.0
    out = np.asarray(ldpc.decode(jnp.asarray(llr), bg, z, n_iter=20))
    ber = np.mean(out != bits)
    assert ber == 0.0, ber


def test_rate_match_roundtrip():
    bg, z = 2, 16
    kb, _, nfull = ldpc.bg_params(bg)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(2, kb * z)).astype(np.int8)
    cw = ldpc.encode(jnp.asarray(bits), bg, z)
    e = (nfull - 2) * z + 40  # wrap-around repetition
    tx = np.asarray(ldpc.rm_select(cw, bg, z, e, rv=0))
    llr = (2.0 * tx - 1.0).astype(np.float32) * 6
    buf = np.asarray(ldpc.rm_collect(jnp.asarray(llr), bg, z, rv=0))
    out = np.asarray(ldpc.decode(jnp.asarray(buf), bg, z, n_iter=15))
    np.testing.assert_array_equal(out, bits)


def test_rv_offsets_differ():
    bg, z = 1, 16
    kb = ldpc.bg_params(bg)[0]
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=(1, kb * z)).astype(np.int8)
    cw = ldpc.encode(jnp.asarray(bits), bg, z)
    t0 = np.asarray(ldpc.rm_select(cw, bg, z, 256, rv=0))
    t2 = np.asarray(ldpc.rm_select(cw, bg, z, 256, rv=2))
    assert not np.array_equal(t0, t2)


@pytest.mark.parametrize("bg,z", [(1, 32), (2, 52)])
def test_ldpc_layered_schedule(bg, z):
    """Layered min-sum decodes with half the flooded iterations."""
    kb = 22 if bg == 1 else 10
    rng = np.random.default_rng(bg * 10 + z)
    bits = rng.integers(0, 2, size=(8, kb * z)).astype(np.int8)
    cw = ldpc.encode(jnp.asarray(bits), bg, z)
    # transmit everything except the first 2Z punctured columns
    n = cw.shape[1]
    x = 1.0 - 2.0 * np.asarray(cw, np.float32)
    snr_db = 3.0
    sigma2 = 10 ** (-snr_db / 10)
    noise = rng.normal(0, np.sqrt(sigma2), size=x.shape).astype(np.float32)
    llr = 2.0 * (x + noise) / sigma2
    llr_in = -llr  # positive => bit 1 convention
    llr_in[:, :2 * z] = 0.0  # punctured
    out_fl = ldpc.decode(jnp.asarray(llr_in), bg, z, n_iter=10)
    out_la = ldpc.decode(jnp.asarray(llr_in), bg, z, n_iter=5,
                         schedule="layered")
    np.testing.assert_array_equal(np.asarray(out_fl), bits)
    np.testing.assert_array_equal(np.asarray(out_la), bits)
