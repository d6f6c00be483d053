"""Bit packing/unpacking helpers (host + device).

Counterpart of the reference's `lib/src/phy/utils/bit.c`.  Bits are kept
MSB-first within bytes, matching the reference's convention for transport
blocks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def unpack_bytes_np(data: np.ndarray, n_bits: int | None = None) -> np.ndarray:
    bits = np.unpackbits(data.astype(np.uint8), axis=-1)
    if n_bits is not None:
        bits = bits[..., :n_bits]
    return bits


def pack_bytes_np(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.astype(np.uint8), axis=-1)


def pack_bits_to_u32(bits: jnp.ndarray) -> jnp.ndarray:
    """Device: (..., N) bits → (..., N/32) uint32, MSB-first per word."""
    n = bits.shape[-1]
    assert n % 32 == 0
    b = bits.reshape(bits.shape[:-1] + (n // 32, 32)).astype(jnp.uint32)
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)
