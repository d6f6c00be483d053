"""NR PUSCH (CP-OFDM) — LDPC UL-SCH over a slot grid with type-1 DMRS.

Counterpart of `lib/src/phy/phch/pusch_nr.c` (srsran_pusch_nr_encode /
srsran_pusch_nr_decode, gNB side in `gnb_ul.c`): for CP-OFDM waveform
the PUSCH chain is the PDSCH chain with the UL scrambling identity and
DMRS; transform precoding (DFT-s-OFDM) is available via the LTE
`models/pusch.py` transform_precode ops when configured.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.models import grid_nr, pdsch_nr
from srsran_4g_tpu.models.pdsch_nr import DMRS_SYMS


@dataclass(frozen=True)
class PuschNrConfig(pdsch_nr.PdschNrConfig):
    """Same geometry as PDSCH-NR; scrambling uses the UL identity
    (38.211 6.3.1.1 c_init = rnti*2^15 + n_ID)."""


def encode(cfg: PuschNrConfig, tb_bits: jnp.ndarray) -> jnp.ndarray:
    return pdsch_nr.encode(cfg, tb_bits)


def decode(cfg: PuschNrConfig, rx_grid: jnp.ndarray,
           softbuffers: dict | None = None, n_iter: int = 12) -> dict:
    """gNB-side receiver (gnb_ul.c -> pusch_nr.c decode)."""
    return pdsch_nr.decode(cfg, rx_grid, softbuffers=softbuffers,
                           n_iter=n_iter)
