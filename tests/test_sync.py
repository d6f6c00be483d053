"""PSS/SSS/CFO sync tests (reference: pss_usrp/sync_test, cfo_test)."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import sync
from srsran_4g_tpu.ops.ofdm import OfdmConfig
from srsran_4g_tpu.ops.zadoff_chu import pss_sequence

import jax


def make_pss_capture(n_id_2, offset, n, symbol_sz, cfo=0.0, snr_db=20.0, seed=0):
    rng = np.random.default_rng(seed)
    x = np.zeros(n, dtype=np.complex64)
    rep = sync.pss_time_domain(n_id_2, symbol_sz) * np.sqrt(symbol_sz)
    x[offset:offset + symbol_sz] = rep
    if cfo:
        x = x * np.exp(2j * np.pi * cfo * np.arange(n) / symbol_sz)
    nv = snr_to_noise_var(snr_db) * np.mean(np.abs(rep) ** 2)
    return np.asarray(awgn(jax.random.PRNGKey(seed), x, float(nv))), x


@pytest.mark.parametrize("n_id_2", [0, 1, 2])
def test_pss_detection(n_id_2):
    symbol_sz = 128
    offset = 517
    cap, _ = make_pss_capture(n_id_2, offset, 1920, symbol_sz)
    out = sync.find_pss(cap[None, :], symbol_sz)
    assert int(out["n_id_2"][0]) == n_id_2
    assert abs(int(out["offset"][0]) - offset) <= 1


def test_pss_cfo_estimate():
    symbol_sz = 128
    offset = 300
    cfo_true = 0.37
    cap, _ = make_pss_capture(1, offset, 1920, symbol_sz, cfo=cfo_true, snr_db=25.0)
    seg = cap[offset:offset + symbol_sz][None, :]
    cfo = float(sync.pss_cfo_estimate(seg, 1, symbol_sz)[0])
    assert abs(cfo - cfo_true) < 0.05


def test_cp_cfo_and_correct():
    cfg = OfdmConfig(nof_prb=6)
    rng = np.random.default_rng(1)
    grid = (rng.standard_normal((1, 14, 72)) + 1j * rng.standard_normal((1, 14, 72))
            ).astype(np.complex64)
    from srsran_4g_tpu.ops.ofdm import modulate

    x = np.asarray(modulate(cfg, grid))
    cfo_true = 0.21
    xc = x * np.exp(2j * np.pi * cfo_true * np.arange(x.shape[-1]) / cfg.symbol_sz)
    est = float(sync.cp_cfo_estimate(cfg, jnp.asarray(xc))[0])
    assert abs(est - cfo_true) < 0.02
    fixed = sync.cfo_correct(jnp.asarray(xc), jnp.asarray([est]), cfg.symbol_sz)
    resid = float(sync.cp_cfo_estimate(cfg, fixed)[0])
    assert abs(resid) < 0.02


@pytest.mark.parametrize("n_id_1,phase", [(0, 0), (37, 1), (167, 0)])
def test_sss_detection(n_id_1, phase):
    n_id_2 = 1
    cand = np.asarray(sync.sss_sequences())[n_id_1, phase].copy()
    s, c, z = sync._sss_base()
    n = np.arange(31)
    c0 = c[(n + n_id_2) % 31]
    c1 = c[(n + n_id_2 + 3) % 31]
    tx = cand.copy()
    tx[0::2] *= c0
    tx[1::2] *= c1
    rng = np.random.default_rng(0)
    rx = tx + 0.3 * rng.standard_normal(62)
    out = sync.sss_detect(jnp.asarray(rx[None, :].astype(np.complex64)), n_id_2)
    assert int(out["n_id_1"][0]) == n_id_1
    assert int(out["phase"][0]) == phase
