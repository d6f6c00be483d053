"""Resampling / AGC / CFR / channel impairment tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_4g_tpu.channel import impairments as imp
from srsran_4g_tpu.channel.fading import FadingConfig, tap_gains
from srsran_4g_tpu.ops import agc, cfr, resampling


def _tone(n, f, fs=1.0):
    return np.exp(2j * np.pi * f / fs * np.arange(n)).astype(np.complex64)


def test_resample_fft_tone():
    x = _tone(1024, 0.01)
    y = np.asarray(resampling.resample_fft(jnp.asarray(x), 3, 2))
    assert y.shape[-1] == 1536
    # same absolute frequency → digital freq scales by 2/3
    ref = _tone(1536, 0.01 * 2 / 3)
    err = np.mean(np.abs(y[100:-100] / y[100] - ref[100:-100] / ref[100]) ** 2)
    assert err < 1e-3


def test_resample_polyphase_tone():
    x = _tone(2048, 0.013)
    rate = 0.7
    y = np.asarray(resampling.resample_polyphase(jnp.asarray(x), rate))
    n = y.shape[-1]
    assert n == int(2048 * rate)
    ref = _tone(n, 0.013 / rate)
    # compare away from edges, phase-aligned
    s = slice(64, n - 64)
    err = np.mean(np.abs(y[s] / y[64] - ref[s] / ref[64]) ** 2)
    assert err < 1e-2


def test_agc_converges():
    cfg = agc.AgcConfig(target=0.5)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, 1000)) + 1j * rng.standard_normal((1, 1000))
         ).astype(np.complex64) * 1e-3
    g = jnp.zeros(1)
    for _ in range(10):
        y, g = agc.agc_step(cfg, jnp.asarray(x), g)
    peak = float(np.max(np.abs(np.asarray(y))))
    assert 0.3 < peak < 0.8


def test_cfr_reduces_papr():
    rng = np.random.default_rng(1)
    cfg = cfr.CfrConfig(symbol_sz=256, nof_re=180, alpha=1.3)
    freq = np.zeros((4, 256), np.complex64)
    sc = np.r_[1:91, 256 - 90:256]
    freq[:, sc] = (rng.standard_normal((4, 180)) + 1j * rng.standard_normal((4, 180))) / np.sqrt(2)
    x = np.fft.ifft(freq, axis=-1).astype(np.complex64) * 16
    before = np.asarray(cfr.papr_db(jnp.asarray(x)))
    y = cfr.cfr_apply(cfg, jnp.asarray(x))
    after = np.asarray(cfr.papr_db(y))
    assert (after < before - 0.5).all(), (before, after)
    # in-band distortion bounded
    yf = np.fft.fft(np.asarray(y), axis=-1)
    evm = np.mean(np.abs(yf[:, sc] - freq[:, sc] * 16) ** 2) / np.mean(np.abs(freq[:, sc] * 16) ** 2)
    assert evm < 0.05


def test_delay_impairment():
    x = _tone(512, 0.05)
    y = np.asarray(imp.apply_delay(jnp.asarray(x[None]), jnp.asarray([3.0])))[0]
    # integer delay of a tone = phase shift; check cross-correlation peak
    xc = np.abs(np.fft.ifft(np.fft.fft(y) * np.conj(np.fft.fft(x))))
    assert np.argmax(xc) == 3


def test_rlf_blanking():
    cfg = imp.RlfConfig(t_on_ms=1.0, t_off_ms=1.0)
    x = np.ones((1, 4000), np.complex64)
    y = np.asarray(imp.apply_rlf(cfg, jnp.asarray(x), 0.0, 2_000_000.0))
    # 2 Msps: 2000 samples per ms → on/off/on/off pattern
    assert np.all(np.abs(y[0, :2000]) > 0)
    assert np.all(np.abs(y[0, 2000:4000]) == 0)


def test_fading_taps_statistics():
    cfg = FadingConfig(profile="eva", doppler_hz=70.0, srate_hz=7.68e6)
    t = jnp.arange(0, 0.2, 1e-3)
    g = np.asarray(tap_gains(cfg, 0, t))
    # total mean power ≈ 1 (normalised profile)
    p = np.mean(np.sum(np.abs(g) ** 2, axis=0))
    assert 0.5 < p < 2.0


def test_cedron_freq_estimator():
    """Fine-frequency estimate far below bin spacing (cedron_freq_estimator.c)."""
    import jax
    import jax.numpy as jnp
    from srsran_4g_tpu.models import sync

    n, f = 64, 0.1234
    x = jnp.exp(2j * np.pi * f * jnp.arange(n))[None]
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, n, 2)) @ \
        jnp.asarray([1.0, 1j])
    est = float(sync.cedron_freq_estimate(x + 0.05 * noise)[0])
    assert abs(est - f) < 1e-3          # ~1/100 of the bin spacing
    est_neg = float(sync.cedron_freq_estimate(
        jnp.exp(-2j * np.pi * 0.07 * jnp.arange(n))[None])[0])
    assert abs(est_neg + 0.07) < 1e-3


def test_sfo_estimator():
    """SFO from per-frame timing drift (sfo.c)."""
    import jax.numpy as jnp
    from srsran_4g_tpu.models import sync

    drift = 2.5  # samples/s
    offs = jnp.asarray(
        100 + drift * 0.01 * np.arange(20)
        + 0.1 * np.random.default_rng(0).standard_normal(20))[None]
    est = float(sync.sfo_estimate(offs)[0])
    assert abs(est - drift) < 0.5
