"""Crest-factor reduction (reference: lib/src/phy/cfr/cfr.c).

Clip-and-filter CFR: hard-clip samples above a PAPR-derived threshold, then
remove the out-of-band clipping noise with an FFT-domain brick-wall filter
over the occupied subcarriers — both steps batched over symbols/subframes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CfrConfig:
    symbol_sz: int
    nof_re: int  # occupied subcarriers
    alpha: float = 1.5  # clip threshold relative to RMS
    skip_dc: bool = True


def _inband_mask(cfg: CfrConfig) -> np.ndarray:
    m = np.zeros(cfg.symbol_sz, dtype=np.float32)
    h = cfg.nof_re // 2
    m[:h + 1] = 1.0
    m[-h:] = 1.0
    if cfg.skip_dc:
        m[0] = 0.0
    return m


def cfr_apply(cfg: CfrConfig, symbols_time: jnp.ndarray) -> jnp.ndarray:
    """Apply clip-and-filter CFR per OFDM symbol body (..., symbol_sz)."""
    rms = jnp.sqrt(jnp.mean(jnp.abs(symbols_time) ** 2, axis=-1, keepdims=True))
    thr = cfg.alpha * rms
    mag = jnp.abs(symbols_time)
    scale = jnp.where(mag > thr, thr / jnp.maximum(mag, 1e-12), 1.0)
    clipped = symbols_time * scale.astype(symbols_time.dtype)
    # remove out-of-band clipping products
    f = jnp.fft.fft(clipped, axis=-1)
    f = f * jnp.asarray(_inband_mask(cfg)).astype(f.dtype)
    return jnp.fft.ifft(f, axis=-1).astype(jnp.complex64)


def papr_db(x: jnp.ndarray) -> jnp.ndarray:
    p = jnp.abs(x) ** 2
    return 10.0 * jnp.log10(
        jnp.max(p, axis=-1) / jnp.maximum(jnp.mean(p, axis=-1), 1e-12)
    )
