"""Scrambling / descrambling, TS 36.211 §6.3.1.

Counterpart of `lib/src/phy/scrambling/scrambling.c`: XOR for bits, sign
flip for LLRs.  The scrambling sequence is a Gold sequence (ops/sequence.py);
helpers compute the standard c_init values.
"""

from __future__ import annotations

import jax.numpy as jnp


def pdsch_cinit(rnti: int, codeword: int, subframe: int, cell_id: int) -> int:
    """c_init for PDSCH scrambling (TS 36.211 §6.3.1): n_s = 2·subframe."""
    return (rnti << 14) + (codeword << 13) + (subframe << 9) + cell_id


def pbch_cinit(cell_id: int) -> int:
    return cell_id


def pcfich_cinit(subframe: int, cell_id: int) -> int:
    return (subframe + 1) * (2 * cell_id + 1) * (1 << 9) + cell_id


def pdcch_cinit(subframe: int, cell_id: int) -> int:
    return (subframe << 9) + cell_id


def scramble_bits(bits: jnp.ndarray, seq: jnp.ndarray) -> jnp.ndarray:
    """bits, seq: (..., N) 0/1 → XOR."""
    return jnp.bitwise_xor(bits.astype(jnp.int8), seq.astype(jnp.int8))


def descramble_llrs(llrs: jnp.ndarray, seq: jnp.ndarray) -> jnp.ndarray:
    """Flip LLR sign where the scrambling bit is 1 (positive-LLR ⇒ bit 1)."""
    sign = 1.0 - 2.0 * seq.astype(jnp.float32)
    return llrs * sign
