"""eNB DL subframe assembly: the TX counterpart of the UE receiver.

Counterpart of the reference's `lib/src/phy/enb/enb_dl.c`
(srsran_enb_dl_put_*: PSS/SSS/CRS/PBCH/PCFICH/PDCCH/PDSCH into the RE grid
followed by the IFFT).  Everything is batched over subframes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from srsran_4g_tpu.models import grid as G, pbch as pbch_mod, pcfich as pcfich_mod
from srsran_4g_tpu.models import pdcch as pdcch_mod, pdsch as pdsch_mod, sync
from srsran_4g_tpu.ops.ofdm import OfdmConfig, modulate
from srsran_4g_tpu.ops.zadoff_chu import pss_sequence


def pss_sss_values(cell: G.CellConfig, subframe: int):
    """(sss (62,), pss (62,)) signals for subframes 0/5, else None."""
    if subframe not in (0, 5):
        return None
    n_id_2 = cell.cell_id % 3
    n_id_1 = cell.cell_id // 3
    pss = pss_sequence(n_id_2)
    s, c, z = sync._sss_base()
    n = np.arange(31)
    phase = 0 if subframe == 0 else 1
    d = sync.sss_sequences()[n_id_1, phase].copy()
    d[0::2] *= c[(n + n_id_2) % 31]
    d[1::2] *= c[(n + n_id_2 + 3) % 31]
    return d.astype(np.complex64), pss


def put_sync_signals(
    cell: G.CellConfig, grid_tx: jnp.ndarray, subframe: int
) -> jnp.ndarray:
    vals = pss_sss_values(cell, subframe)
    if vals is None:
        return grid_tx
    sss_v, pss_v = vals
    nsy = cell.nsymb // 2
    mid = cell.nre // 2
    ks = jnp.arange(mid - 31, mid + 31)
    g = jnp.asarray(grid_tx)
    g = g.at[..., nsy - 2, ks].set(jnp.asarray(sss_v))
    g = g.at[..., nsy - 1, ks].set(jnp.asarray(pss_v))
    return g


def put_sync_signals_tdd(
    cell: G.CellConfig, grid_tx: jnp.ndarray, subframe: int
) -> jnp.ndarray:
    """TDD (frame structure type 2, TS 36.211 §6.11): SSS in the last
    symbol of subframes 0/5, PSS in symbol 2 (third DwPTS symbol) of the
    special subframes 1/6."""
    mid = cell.nre // 2
    ks = jnp.arange(mid - 31, mid + 31)
    g = jnp.asarray(grid_tx)
    if subframe in (0, 5):
        sss_v, _ = pss_sss_values(cell, subframe)
        g = g.at[..., cell.nsymb - 1, ks].set(jnp.asarray(sss_v))
    elif subframe in (1, 6):
        pss = pss_sequence(cell.cell_id % 3).astype(np.complex64)
        g = g.at[..., 2, ks].set(jnp.asarray(pss))
    return g


def assemble_subframe(
    pdsch_cfg: pdsch_mod.PdschConfig,
    tb_bits: jnp.ndarray,
    cfi_value: int | None = None,
    mib_bits: jnp.ndarray | None = None,
    frame_idx: int = 0,
    dcis: list[tuple] | None = None,
) -> jnp.ndarray:
    """Full DL subframe grid: PDSCH + CRS + sync + PCFICH (+ PBCH, + DCIs).

    dcis: list of (dci_bits (B, A), rnti, l_agg, cce_start).
    """
    cell = pdsch_cfg.cell
    sf = pdsch_cfg.subframe
    g = pdsch_mod.encode(pdsch_cfg, tb_bits)
    g = pdsch_mod.add_crs(pdsch_cfg, g)
    g = put_sync_signals(cell, g, sf)
    cfi = cfi_value if cfi_value is not None else cell.cfi
    b = tb_bits.shape[0]
    cfi_arr = jnp.full((b,), cfi, jnp.int32)
    g = pcfich_mod.put_into_grid(cell, g, pcfich_mod.encode(cell, cfi_arr, sf))
    if mib_bits is not None and sf == 0:
        syms = pbch_mod.encode(cell, mib_bits)
        g = pbch_mod.put_into_grid(cell, g, syms[:, frame_idx % 4])
    for dci_bits, rnti, l_agg, cce_start in dcis or []:
        g = pdcch_mod.put_dci(cell, cell.cfi, sf, g, dci_bits, rnti, l_agg, cce_start)
    return g


def subframe_to_samples(cell: G.CellConfig, grid_tx: jnp.ndarray) -> jnp.ndarray:
    return modulate(OfdmConfig(nof_prb=cell.nof_prb), grid_tx)
