"""AWGN channel emulator (reference: lib/src/phy/channel/ch_awgn.c).

The reference uses Box-Muller on a host RNG; here noise comes from JAX's
counter-based PRNG so the whole channel+receiver pipeline stays inside one
jitted program and is reproducible per (key, batch) regardless of sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn(
    key: jax.Array, x: jnp.ndarray, noise_var: float | jnp.ndarray
) -> jnp.ndarray:
    """Add complex white Gaussian noise of total variance ``noise_var``."""
    nv = jnp.asarray(noise_var, jnp.float32)
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(nv / 2.0)
    n = (
        jax.random.normal(kr, x.shape, dtype=jnp.float32)
        + 1j * jax.random.normal(ki, x.shape, dtype=jnp.float32)
    )
    return x + std.astype(jnp.complex64) * n.astype(jnp.complex64)


def snr_to_noise_var(snr_db: float | jnp.ndarray, signal_power: float = 1.0):
    return signal_power * 10.0 ** (-jnp.asarray(snr_db, jnp.float32) / 10.0)
