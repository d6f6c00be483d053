"""SRS: sounding reference signal generation + eNB-side channel sounding.

Counterpart of the reference's SRS parts of
`lib/src/phy/ch_estimation/refsignal_ul.c` (srsran_refsignal_srs_gen) —
comb-2 mapping in the last SC-FDMA symbol, base sequences with cyclic
shifts, and the wideband channel estimate the eNB derives from them.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.models import grid as G
from srsran_4g_tpu.models.refsignal_ul import base_sequence, group_hopping_pattern
from srsran_4g_tpu.utils.constants import NRE

SRS_SYMBOL = 13  # last symbol of the subframe (normal CP)


@dataclass(frozen=True)
class SrsConfig:
    cell: G.CellConfig
    n_prb_srs: int = 16  # sounding bandwidth in PRB (multiple of 4)
    k_tc: int = 0  # transmission comb (0/1)
    cyclic_shift: int = 0  # 0..7
    prb_offset: int = 0


def srs_sequence(cfg: SrsConfig, subframe: int) -> np.ndarray:
    """SRS sequence (comb-2 → M_sc = n_prb_srs*12/2 values)."""
    m_sc = cfg.n_prb_srs * NRE // 2
    u = int(group_hopping_pattern(cfg.cell.cell_id)[2 * subframe])
    r = base_sequence(u, 0, m_sc)
    alpha = 2 * np.pi * cfg.cyclic_shift / 8.0
    n = np.arange(m_sc)
    return (r * np.exp(1j * alpha * n)).astype(np.complex64)


def srs_subcarriers(cfg: SrsConfig) -> np.ndarray:
    k0 = cfg.prb_offset * NRE + cfg.k_tc
    return k0 + 2 * np.arange(cfg.n_prb_srs * NRE // 2)


def put_srs(cfg: SrsConfig, grid_tx: jnp.ndarray, subframe: int) -> jnp.ndarray:
    seq = jnp.asarray(srs_sequence(cfg, subframe))
    ks = jnp.asarray(srs_subcarriers(cfg))
    g = jnp.asarray(grid_tx)
    return g.at[..., SRS_SYMBOL, ks].set(seq)


def estimate_srs(cfg: SrsConfig, rx_grid: jnp.ndarray, subframe: int) -> dict:
    """eNB sounding: LS estimate over the sounded band + wideband SNR."""
    seq = jnp.asarray(srs_sequence(cfg, subframe))
    ks = jnp.asarray(srs_subcarriers(cfg))
    y = rx_grid[..., SRS_SYMBOL, ks]
    h_ls = y * jnp.conj(seq)
    # light smoothing for noise estimation
    ker = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    hp = jnp.pad(h_ls, [(0, 0)] * (h_ls.ndim - 1) + [(1, 1)], mode="edge")
    h_sm = ker[0] * hp[..., :-2] + ker[1] * hp[..., 1:-1] + ker[2] * hp[..., 2:]
    nv = jnp.mean(jnp.abs(h_ls - h_sm) ** 2, axis=-1) / 0.375
    snr_db = 10 * jnp.log10(
        jnp.maximum(jnp.mean(jnp.abs(h_sm) ** 2, axis=-1), 1e-12)
        / jnp.maximum(nv, 1e-12))
    return dict(h=h_sm, noise_var=nv, snr_db=snr_db)
