"""Channel impairments: delay sweep, high-speed-train Doppler, periodic RLF.

Counterparts of the reference's `lib/src/phy/channel/{delay.c,hst.c,rlf.c}`
— the fault-injection/impairment blocks wired into the UE/eNB rx paths
(srsue/src/phy/sync.cc:88-90), used to reproduce BER curves and recovery
behaviour without hardware.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DelayConfig:
    """Periodic delay sweep between min and max (delay.c)."""

    min_samples: float
    max_samples: float
    period_s: float
    srate_hz: float


def delay_at(cfg: DelayConfig, t_s: jnp.ndarray) -> jnp.ndarray:
    """Triangular sweep of the current delay in samples."""
    phase = (t_s / cfg.period_s) % 1.0
    tri = 1.0 - jnp.abs(2.0 * phase - 1.0)
    return cfg.min_samples + (cfg.max_samples - cfg.min_samples) * tri


def apply_delay(samples: jnp.ndarray, delay_samples: jnp.ndarray) -> jnp.ndarray:
    """Fractional delay via frequency-domain phase ramp (per batch row)."""
    n = samples.shape[-1]
    f = jnp.fft.fftfreq(n).astype(jnp.float32)
    ph = jnp.exp(
        (-2j * jnp.pi) * (jnp.asarray(delay_samples, jnp.float32)[..., None] * f)
    ).astype(jnp.complex64)
    return jnp.fft.ifft(jnp.fft.fft(samples, axis=-1) * ph, axis=-1).astype(
        jnp.complex64
    )


@dataclass(frozen=True)
class HstConfig:
    """High-speed-train Doppler profile (hst.c / TS 36.101 B.3)."""

    fd_hz: float  # max Doppler
    period_s: float = 7.2
    init_time_s: float = 0.0


def hst_doppler_at(cfg: HstConfig, t_s: jnp.ndarray) -> jnp.ndarray:
    """fs(t) per TS 36.101 B.3A piecewise cosine trajectory."""
    ds, dmin = 300.0, 2.0
    v = 300.0 / 3.6
    t = (t_s + cfg.init_time_s) % cfg.period_s
    half = cfg.period_s / 2
    x1 = ds / 2 - v * t
    x2 = -ds / 2 + v * (t - half)
    cos1 = x1 / jnp.sqrt(dmin**2 + x1**2)
    cos2 = -x2 / jnp.sqrt(dmin**2 + x2**2)
    return cfg.fd_hz * jnp.where(t < half, cos1, cos2)


def apply_hst(cfg: HstConfig, samples: jnp.ndarray, t0_s: float,
              srate_hz: float) -> jnp.ndarray:
    n = samples.shape[-1]
    t = t0_s + jnp.arange(n, dtype=jnp.float32) / srate_hz
    fs = hst_doppler_at(cfg, t)
    ph = jnp.exp((2j * jnp.pi) * jnp.cumsum(fs) / srate_hz).astype(jnp.complex64)
    return samples * ph


@dataclass(frozen=True)
class RlfConfig:
    """Periodic radio-link-failure injector (rlf.c:25-55): the signal is
    zeroed for t_off out of every t_on + t_off period."""

    t_on_ms: float
    t_off_ms: float


def apply_rlf(cfg: RlfConfig, samples: jnp.ndarray, t0_ms: float,
              srate_hz: float) -> jnp.ndarray:
    n = samples.shape[-1]
    t = t0_ms + jnp.arange(n, dtype=jnp.float32) / srate_hz * 1e3
    period = cfg.t_on_ms + cfg.t_off_ms
    on = (t % period) < cfg.t_on_ms
    return samples * on.astype(samples.dtype)
