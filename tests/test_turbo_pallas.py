"""Pallas BCJR kernel vs XLA scan path parity (interpreter mode on CPU).

Every selectable TURBO_KERNEL version is exercised (v4/v5/v6) so that a
default-kernel flip cannot ship untested — the round-3 regression where
the v6 default crashed bench.py while only v4 had coverage.
"""

import numpy as np
import pytest

from srsran_4g_tpu.ops import turbo

KERNELS = ["v4", "v5", "v6", "v7", "v8", "v9"]


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("k,l,t", [(512, 64, 32), (256, 64, 16)])
def test_pallas_matches_xla(k, l, t, kernel, monkeypatch):
    monkeypatch.setenv("TURBO_KERNEL", kernel)
    rng = np.random.default_rng(k)
    b = 3
    bits = rng.integers(0, 2, size=(b, k)).astype(np.int8)
    d = np.asarray(turbo.turbo_encode(bits)).astype(np.float32)
    llr = (2 * d - 1) * 2 + rng.standard_normal(d.shape).astype(np.float32) * 0.7
    h_x, a_x = turbo.turbo_decode(llr, n_iter=2, window=l, train=t, backend="xla")
    h_p, a_p = turbo.turbo_decode(
        llr, n_iter=2, window=l, train=t, backend="pallas_interpret"
    )
    if kernel == "v9":
        # bf16 lane-paired kernel: metrics carry the bf16 quantum, so
        # LLRs match the f32 reference to ~the quantisation scale and
        # hard decisions must agree exactly at this operating point
        np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x),
                                   atol=2.5)
        assert float(np.abs(np.asarray(a_p) - np.asarray(a_x)).mean()) < 0.5
    else:
        np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(h_p), np.asarray(h_x))


@pytest.mark.parametrize("kernel", KERNELS)
def test_pallas_decodes_awgn(kernel, monkeypatch):
    monkeypatch.setenv("TURBO_KERNEL", kernel)
    rng = np.random.default_rng(1)
    k, b = 512, 4
    bits = rng.integers(0, 2, size=(b, k)).astype(np.int8)
    d = np.asarray(turbo.turbo_encode(bits))
    rate = k / (3.0 * (k + 4))
    sigma2 = 1.0 / (2 * rate * 10 ** (3.0 / 10))
    y = (1 - 2 * d.astype(np.float64)) + rng.standard_normal(d.shape) * np.sqrt(sigma2)
    llr = (-2 * y / sigma2).astype(np.float32)
    hard, _ = turbo.turbo_decode(llr, n_iter=5, window=128, train=32,
                                 backend="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(hard), bits)
