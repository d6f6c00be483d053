"""NR CSI-RS generation + CSI measurement/reporting (TS 38.211 7.4.1.5,
TS 38.214 5.2).

Counterpart of `lib/src/phy/ch_estimation/csi_rs.c` and
`lib/src/phy/phch/csi.c`: NZP CSI-RS (row-1, single port: one RE per
PRB per configured symbol, density 3 simplified to 1), channel/SINR
measurement on the CSI-RS REs, and the CQI/RI wideband report
(reusing the LTE SNR->CQI map, which both stacks share in spirit).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.models import cqi as cqi_mod
from srsran_4g_tpu.models import grid_nr
from srsran_4g_tpu.ops import sequence

NRE = 12


@dataclass(frozen=True)
class CsiRsConfig:
    carrier: grid_nr.NrCarrierConfig
    symbol: int = 4
    subcarrier_offset: int = 0   # k0 within each PRB
    slot: int = 0
    scrambling_id: int = 0

    @functools.cached_property
    def re_indices(self) -> np.ndarray:
        return (self.subcarrier_offset
                + NRE * np.arange(self.carrier.nof_prb)).astype(np.int32)


@functools.lru_cache(maxsize=128)
def _csi_rs_seq(nof_prb: int, slot: int, symbol: int,
                scrambling_id: int) -> np.ndarray:
    cinit = ((1 << 10) * (grid_nr.NSYMB * slot + symbol + 1)
             * (2 * scrambling_id + 1) + scrambling_id) % (1 << 31)
    c = sequence.gold_sequence_np(cinit, 2 * nof_prb).astype(np.float32)
    r = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
    return r.astype(np.complex64)


def put_csi_rs(cfg: CsiRsConfig, grid: jnp.ndarray) -> jnp.ndarray:
    """Insert NZP CSI-RS into a (B, 14, nre) slot grid."""
    r = jnp.asarray(_csi_rs_seq(cfg.carrier.nof_prb, cfg.slot, cfg.symbol,
                                cfg.scrambling_id))
    return grid.at[:, cfg.symbol, jnp.asarray(cfg.re_indices)].set(r)


def measure(cfg: CsiRsConfig, rx_grid: jnp.ndarray) -> dict:
    """CSI measurement on the CSI-RS REs: RSRP, noise, SINR (csi_rs.c
    srsran_csi_rs_nzp_measure)."""
    r = jnp.asarray(_csi_rs_seq(cfg.carrier.nof_prb, cfg.slot, cfg.symbol,
                                cfg.scrambling_id))
    y = rx_grid[:, cfg.symbol, jnp.asarray(cfg.re_indices)]
    h_ls = y * jnp.conj(r)
    h_avg = jnp.mean(h_ls, axis=-1, keepdims=True)
    rsrp = jnp.mean(jnp.abs(h_ls) ** 2, axis=-1)
    noise = jnp.mean(jnp.abs(h_ls - h_avg) ** 2, axis=-1) + 1e-12
    sinr_db = 10.0 * jnp.log10(jnp.maximum(rsrp - noise, 1e-12) / noise)
    return dict(rsrp=rsrp, noise_var=noise, sinr_db=sinr_db)


def generate_report(sinr_db: jnp.ndarray) -> dict:
    """Wideband CSI report (38.214 5.2.2): CQI from SINR, RI=1, PMI=0
    for the single-port row-1 resource."""
    cqi = jnp.asarray(cqi_mod.cqi_from_snr(np.asarray(sinr_db)))
    return dict(cqi=cqi, ri=jnp.ones_like(cqi), pmi=jnp.zeros_like(cqi))
