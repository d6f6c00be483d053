"""PCFICH: control format indicator channel, TS 36.211 §6.7 / 36.212 §5.3.4.

Counterpart of the reference's `lib/src/phy/phch/pcfich.c`.  The CFI value
(1..3) selects one of three fixed 32-bit codewords; after cell/subframe
scrambling and QPSK it occupies 4 REGs (16 REs) of symbol 0 at
cell-id-derived positions.  Decoding is a correlation against the three
candidate codewords (soft max-likelihood, as pcfich.c:cfi_decode).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.models import grid as G
from srsran_4g_tpu.ops import modem, scrambling
from srsran_4g_tpu.ops.sequence import gold_sequence_np
from srsran_4g_tpu.utils import constants as C

# TS 36.212 Table 5.3.4-1
_CFI_CODEWORDS = np.array(
    [
        [0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0,
         1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1],
        [1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1,
         0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0],
        [1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1,
         1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1],
    ],
    dtype=np.int8,
)


@functools.lru_cache(maxsize=64)
def pcfich_re_indices(cell: G.CellConfig) -> np.ndarray:
    """Flat indices of the 16 PCFICH REs (4 REGs in symbol 0)."""
    nrb = cell.nof_prb
    vshift = cell.cell_id % 6
    k_bar = (C.NRE // 2) * (cell.cell_id % (2 * nrb))
    crs_mod3 = vshift % 3
    out = []
    for i in range(4):
        k0 = (k_bar + (i * nrb // 2) * (C.NRE // 2)) % (nrb * C.NRE)
        # REG = the 4 non-CRS REs among 6 consecutive subcarriers
        ks = k0 + np.arange(6)
        keep = ks[(ks % 3) != crs_mod3][:4]
        out.append(keep)  # symbol 0 → flat index == subcarrier
    return np.concatenate(out)


def _seq(cell: G.CellConfig, subframe: int) -> np.ndarray:
    cinit = scrambling.pcfich_cinit(subframe, cell.cell_id)
    return gold_sequence_np(cinit, 32)


def encode(cell: G.CellConfig, cfi: jnp.ndarray, subframe: int) -> jnp.ndarray:
    """cfi (B,) int ∈ {1,2,3} → 16 QPSK symbols (B, 16)."""
    cw = jnp.asarray(_CFI_CODEWORDS)[cfi - 1]
    scr = scrambling.scramble_bits(cw, jnp.asarray(_seq(cell, subframe)))
    return modem.modulate("qpsk", scr)


def put_into_grid(cell, grid_tx, pcfich_syms):
    from srsran_4g_tpu.models import mimo

    return mimo.scatter_ctrl_syms(grid_tx, pcfich_re_indices(cell),
                                  pcfich_syms)


def decode(
    cell: G.CellConfig, rx_grid: jnp.ndarray, h: jnp.ndarray, noise_var,
    subframe: int, h1: jnp.ndarray | None = None,
) -> dict:
    """Soft CFI detection. Returns dict(cfi (B,), corr (B, 3)).

    With ``h1`` (port-1 estimates) the 16 REs are SFBC-combined pairwise
    (2-port TX diversity, as `pcfich.c` via predecoding_diversity)."""
    from srsran_4g_tpu.models import equalizer

    idx = jnp.asarray(pcfich_re_indices(cell))
    b = rx_grid.shape[0]
    y = rx_grid.reshape(b, -1)[:, idx]
    h_re = h.reshape(b, -1)[:, idx]
    if h1 is not None:
        x, eff_nv = equalizer.alamouti_decode_2x1(
            y, h_re, h1.reshape(b, -1)[:, idx], noise_var)
    else:
        x, eff_nv = equalizer.equalize_single(y, h_re, noise_var)
    llr = modem.demodulate_soft("qpsk", x, eff_nv)
    llr = scrambling.descramble_llrs(llr, jnp.asarray(_seq(cell, subframe)))
    # correlate: codeword bits ±1 vs LLR sign
    cw = jnp.asarray(2.0 * _CFI_CODEWORDS - 1.0, jnp.float32)  # (3, 32)
    corr = jnp.einsum("bn,cn->bc", llr, cw)
    cfi = jnp.argmax(corr, axis=-1).astype(jnp.int32) + 1
    return dict(cfi=cfi, corr=corr)
