"""CORESET#0 and Type0-PDCCH common search space (TS 38.213 §13,
38.211 §7.3.2.2 interleaved CCE-to-REG mapping).

Counterpart of the reference's `srsran_coreset_zero`
(phy_common_nr.c:659) + `pdcch_nr_cce_to_reg_mapping_interleaved`
(pdcch_nr.c:346): derives the SIB1 CORESET from the (SSB, pointA)
frequency offset and a Table 13-1 index, enumerates the Type0 CSS
candidates, and blind-decodes DCI 1_0 with the 38.212-exact polar
chain (`ops/polar_3gpp.py`).

Acceptance: the reference's committed real-gNB capture
`ue_dl_nr_pci500_rb52_si_coreset0_idx6_s15.36e6.dat` — the SI-RNTI DCI
decodes with its CRC (tests/test_ref_captures_nr.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.ops import modem, polar_3gpp, sequence

NRE = 12
SSB_BW_SUBC = 240

# TS 38.213 Table 13-1 ({SSB, PDCCH} SCS = {15, 15} kHz, min channel bw
# 5/10 MHz): (multiplexing pattern, CORESET PRBs, symbols, RB offset)
CORESET0_15_15 = [
    (1, 24, 2, 0), (1, 24, 2, 2), (1, 24, 2, 4),
    (1, 24, 3, 0), (1, 24, 3, 2), (1, 24, 3, 4),
    (1, 48, 1, 12), (1, 48, 1, 16),
    (1, 48, 2, 12), (1, 48, 2, 16),
    (1, 48, 3, 12), (1, 48, 3, 16),
    (1, 96, 1, 38), (1, 96, 2, 38), (1, 96, 3, 38),
    None,
]


@dataclass(frozen=True)
class Coreset0:
    nof_prb: int          # CORESET bandwidth
    duration: int         # symbols
    offset_rb: int        # first CORESET RB relative to pointA
    shift_index: int      # = PCI for CORESET#0


def coreset_zero(pci: int, ssb_pointa_offset_hz: float, idx: int,
                 scs_hz: float = 15e3) -> Coreset0:
    """38.213 §13 CORESET#0 derivation (srsran_coreset_zero)."""
    entry = CORESET0_15_15[idx]
    if entry is None:
        raise ValueError(f"reserved CORESET0 index {idx}")
    _, nof_prb, duration, table_offset = entry
    off = ssb_pointa_offset_hz
    half_ssb = scs_hz * (SSB_BW_SUBC / 2)
    off = off - half_ssb if off > half_ssb else 0.0
    ssb_rb = int(off // (NRE * scs_hz))
    offset_rb = max(0, ssb_rb - table_offset)
    return Coreset0(nof_prb=nof_prb, duration=duration,
                    offset_rb=offset_rb, shift_index=pci)


def interleaved_candidate_rbs(cs: Coreset0, ncce: int,
                              l_agg: int) -> list[int]:
    """CORESET-relative RBs of a PDCCH candidate under the 38.211
    §7.3.2.2 interleaved mapping (CORESET#0: bundle L=6, R=2,
    n_shift = PCI), ascending."""
    n_reg = cs.duration * cs.nof_prb
    big_l, big_r = 6, 2
    big_c = n_reg // (big_l * big_r)
    rbs: set[int] = set()
    for j in range(ncce, ncce + l_agg):
        x = (6 * j) // big_l
        r, c = x % big_r, x // big_r
        i = (r * big_c + c + cs.shift_index) % (n_reg // big_l)
        rb0 = (i * big_l) // cs.duration
        rb1 = ((i + 1) * big_l) // cs.duration
        rbs.update(range(rb0, rb1))
    return sorted(rbs)


def type0_candidates(nof_cce: int) -> list[tuple[int, int]]:
    """(L, ncce) Type0 CSS candidates (38.213 Table 10.1-1: up to 4/2/1
    at L = 4/8/16)."""
    out = []
    for l_agg, m_max in ((4, 4), (8, 2), (16, 1)):
        for m in range(m_max):
            if (m + 1) * l_agg <= nof_cce:
                out.append((l_agg, m * l_agg))
    return out


def _pdcch_dmrs(pci: int, slot: int, sym: int, nof_prb: int) -> np.ndarray:
    """(3·nof_prb,) PDCCH DMRS referenced from the CORESET's first RB
    (38.211 §7.4.1.3.2: CORESET#0 reference point is its lowest RB)."""
    cinit = ((1 << 17) * (14 * slot + sym + 1) * (2 * pci + 1)
             + 2 * pci) % (1 << 31)
    c = sequence.gold_sequence_np(cinit, 2 * 3 * nof_prb).astype(np.float32)
    r = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
    return r.astype(np.complex64)


def blind_decode_type0(grid: jnp.ndarray, pci: int, slot: int,
                       cs: Coreset0, rnti: int, a: int,
                       noise_var: float = 0.05) -> dict | None:
    """Blind-search the Type0 CSS over one slot grid (B=1, 14, nre).

    The carrier grid's RB 0 is pointA.  Returns None or
    dict(l_agg, ncce, bits (A,)).  Single-symbol CORESETs only (the
    Table 13-1 48-PRB entries used by the committed captures)."""
    assert cs.duration == 1, "multi-symbol CORESET0 not implemented"
    row = np.asarray(grid[0, 0])
    dm = _pdcch_dmrs(pci, slot, 0, cs.nof_prb)
    n_cce = cs.nof_prb * cs.duration // 6
    for l_agg, ncce in type0_candidates(n_cce):
        rbs = interleaved_candidate_rbs(cs, ncce, l_agg)
        parts = []
        for p in rbs:
            crb = cs.offset_rb + p
            ks_d = [crb * NRE + o for o in range(12) if o not in (1, 5, 9)]
            ks_m = [crb * NRE + o for o in (1, 5, 9)]
            h = (row[ks_m] * np.conj(dm[3 * p:3 * p + 3])).mean()
            x = row[ks_d] * np.conj(h) / (abs(h) ** 2 + 1e-3)
            parts.append(np.asarray(modem.demodulate_soft(
                "qpsk", jnp.asarray(x[None]), noise_var))[0])
        llr = np.concatenate(parts)
        scr = polar_3gpp.pdcch_scramble_seq(llr.size, pci)
        llr = llr * (1.0 - 2.0 * scr.astype(np.float32))
        out = polar_3gpp.dci_decode(jnp.asarray(llr[None]), a, rnti)
        if bool(out["crc_ok"][0]):
            return dict(l_agg=l_agg, ncce=ncce,
                        bits=np.asarray(out["bits"][0]))
    return None


def nr_slot_grid(samples: np.ndarray, nof_prb: int,
                 symbol_sz: int) -> jnp.ndarray:
    """One 15 kHz NR slot (LTE-equal CP structure) → (1, 14, nof_prb·12)."""
    cp0 = symbol_sz * 160 // 2048
    cp = symbol_sz * 144 // 2048
    nre = nof_prb * NRE
    rows = []
    pos = 0
    for l in range(14):
        pos += cp0 if l in (0, 7) else cp
        x = np.fft.fft(samples[pos:pos + symbol_sz]) / np.sqrt(symbol_sz)
        rows.append(np.concatenate([x[-(nre // 2):], x[:nre // 2]]))
        pos += symbol_sz
    return jnp.asarray(np.stack(rows)[None])
