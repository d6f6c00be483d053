"""LTE DL resource grid: CRS positions/sequences and PDSCH RE mapping.

Counterpart of the reference's cell-reference-signal generation
(`lib/src/phy/ch_estimation/refsignal_dl.c`) and the PDSCH RE mapping logic
inside `lib/src/phy/phch/pdsch.c` (srsran_pdsch_put/get).  All index
computation happens once on the host per static cell/allocation config; the
device sees only gathers/scatters with cached index tensors.

Grid tensors are (..., nsymb_sf=14, nre) complex64 (normal CP).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from srsran_4g_tpu.ops.sequence import gold_sequence_np
from srsran_4g_tpu.utils import constants as C


@dataclass(frozen=True)
class CellConfig:
    nof_prb: int
    cell_id: int
    nof_ports: int = 1
    cfi: int = 1
    normal_cp: bool = True
    frame_type: str = "fdd"   # "tdd" moves the sync-signal reservations

    @property
    def nre(self) -> int:
        return self.nof_prb * C.NRE

    @property
    def nsymb(self) -> int:
        return C.NSYMB_SF_NORM if self.normal_cp else C.NSYMB_SF_EXT


def crs_symbol_indices(cell: CellConfig, port: int) -> list[int]:
    """Subframe symbol indices carrying CRS for the given port (TS 36.211
    §6.10.1.2)."""
    nsy = cell.nsymb // 2
    if port in (0, 1):
        per_slot = [0, nsy - 3]
    else:
        per_slot = [1]
    return [s + slot * nsy for slot in range(2) for s in per_slot]


def _crs_v(port: int, l_in_slot: int, ns: int) -> int:
    if port == 0:
        return 0 if l_in_slot == 0 else 3
    if port == 1:
        return 3 if l_in_slot == 0 else 0
    if port == 2:
        return 3 * (ns % 2)
    return 3 + 3 * (ns % 2)


@functools.lru_cache(maxsize=128)
def crs_pattern(cell: CellConfig, port: int) -> tuple[np.ndarray, np.ndarray]:
    """(symbols (S,), subcarriers (S, P)) of the CRS REs for one port."""
    nsy = cell.nsymb // 2
    vshift = cell.cell_id % 6
    syms, scs = [], []
    for l_sf in crs_symbol_indices(cell, port):
        ns = l_sf // nsy  # slot
        l = l_sf % nsy
        v = _crs_v(port, l, ns)
        k0 = (v + vshift) % 6
        k = k0 + 6 * np.arange(2 * cell.nof_prb)
        syms.append(l_sf)
        scs.append(k)
    return np.asarray(syms), np.stack(scs)


@functools.lru_cache(maxsize=512)
def crs_values(cell: CellConfig, port: int, subframe: int) -> np.ndarray:
    """CRS QPSK values (S, 2*nof_prb) complex64 for one port/subframe
    (TS 36.211 §6.10.1.1)."""
    nsy = cell.nsymb // 2
    n_cp = 1 if cell.normal_cp else 0
    out = []
    for l_sf in crs_symbol_indices(cell, port):
        ns = 2 * subframe + l_sf // nsy
        l = l_sf % nsy
        c_init = (
            1024 * (7 * (ns + 1) + l + 1) * (2 * cell.cell_id + 1)
            + 2 * cell.cell_id
            + n_cp
        )
        seq = gold_sequence_np(c_init, 4 * C.MAX_PRB).astype(np.float32)
        m = np.arange(2 * cell.nof_prb) + C.MAX_PRB - cell.nof_prb
        re = (1.0 - 2.0 * seq[2 * m]) / np.sqrt(2)
        im = (1.0 - 2.0 * seq[2 * m + 1]) / np.sqrt(2)
        out.append((re + 1j * im).astype(np.complex64))
    return np.stack(out)


@functools.lru_cache(maxsize=128)
def reserved_mask(cell: CellConfig, subframe: int) -> np.ndarray:
    """(nsymb, nre) bool — True where PDSCH may NOT map: control region,
    CRS of all cell ports, PSS/SSS/PBCH (subframes 0/5)."""
    mask = np.zeros((cell.nsymb, cell.nre), dtype=bool)
    # ≤10 PRB cells use CFI+1 control symbols (36.211 §6.7)
    nctrl = cell.cfi + 1 if cell.nof_prb <= 10 else cell.cfi
    mask[:nctrl, :] = True  # PDCCH/PCFICH/PHICH control region
    for p in range(cell.nof_ports):
        syms, scs = crs_pattern(cell, p)
        for s, k in zip(syms, scs):
            mask[s, k] = True
    nsy = cell.nsymb // 2
    mid = cell.nre // 2
    sync_k = np.arange(mid - 36, mid + 36)
    if cell.frame_type == "tdd":
        # frame structure type 2 (36.211 §6.11): SSS in the LAST symbol
        # of sf 0/5, PSS in symbol 2 of the special subframes 1/6
        if subframe in (0, 5):
            mask[cell.nsymb - 1, sync_k] = True   # SSS
            if subframe == 0:
                mask[nsy:nsy + 4, sync_k] = True  # PBCH
        if subframe in (1, 6):
            mask[2, sync_k] = True                # PSS
        return mask
    if subframe in (0, 5):
        mask[nsy - 2, sync_k] = True  # SSS
        mask[nsy - 1, sync_k] = True  # PSS
        if subframe == 0:
            mask[nsy:nsy + 4, sync_k] = True  # PBCH
    return mask


@functools.lru_cache(maxsize=128)
def pdsch_re_indices(
    cell: CellConfig, subframe: int, prb_alloc: tuple[int, ...] | None = None
) -> np.ndarray:
    """Flat (symbol*nre + sc) indices of PDSCH REs in mapping order
    (k fastest, then l — TS 36.211 §6.3.5)."""
    mask = reserved_mask(cell, subframe)
    if prb_alloc is None:
        prb_alloc = tuple(range(cell.nof_prb))
    alloc = np.zeros(cell.nre, dtype=bool)
    for prb in prb_alloc:
        alloc[prb * C.NRE:(prb + 1) * C.NRE] = True
    out = []
    for l in range(cell.nsymb):
        ks = np.nonzero(alloc & ~mask[l])[0]
        out.append(l * cell.nre + ks)
    return np.concatenate(out)
