"""PRACH generation/detection tests (reference: prach_test.c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import prach

CFG = prach.PrachConfig(symbol_sz=256, root_seq_index=0, zero_corr_zone=5)


def test_preamble_plan():
    plan = CFG.preamble_plan()
    assert len(plan) == 64
    # Ncs=26 at zczc=5 → 32 shifts per root → roots change every 32
    assert plan[0][0] == plan[31][0]
    assert plan[32][0] != plan[0][0]
    assert len(set(plan)) == 64


def test_preamble_waveform():
    x = np.asarray(prach.generate(CFG, 0))
    assert x.shape[0] == CFG.cp_len + CFG.seq_len_samples
    # CP really is cyclic
    np.testing.assert_allclose(x[:CFG.cp_len], x[-CFG.cp_len:], atol=1e-5)


@pytest.mark.parametrize("pidx", [0, 17, 33, 63])
def test_detect_single(pidx):
    x = np.asarray(prach.generate(CFG, pidx))[None, :]
    rx = awgn(jax.random.PRNGKey(pidx), jnp.asarray(x),
              float(np.mean(np.abs(x) ** 2) * snr_to_noise_var(10.0)))
    out = prach.detect(CFG, rx)
    det = np.asarray(out["power"])[0]
    assert int(np.argmax(det)) == pidx, (int(np.argmax(det)), pidx, det.max())


def test_detect_multiple_and_absent():
    x = np.asarray(prach.generate(CFG, 5)) + np.asarray(prach.generate(CFG, 40))
    out = prach.detect(CFG, jnp.asarray(x[None, :]))
    p = np.asarray(out["power"])[0]
    top2 = set(np.argsort(p)[-2:].tolist())
    assert top2 == {5, 40}
    # pure noise: no detection at a sane threshold
    noise = awgn(jax.random.PRNGKey(9), jnp.zeros((1, x.shape[0]), jnp.complex64), 1.0)
    out_n = prach.detect(CFG, noise)
    assert np.asarray(out_n["power"]).max() < 0.5 * p.max()


def test_detect_with_delay():
    pidx = 3
    x = np.asarray(prach.generate(CFG, pidx))
    delay = 40
    xd = np.concatenate([np.zeros(delay, np.complex64), x[:-delay]])
    out = prach.detect(CFG, jnp.asarray(xd[None, :]))
    p = np.asarray(out["power"])[0]
    assert int(np.argmax(p)) == pidx
    est = float(np.asarray(out["delay_samples"])[0, pidx])
    assert abs(est - delay) < 8, (est, delay)
