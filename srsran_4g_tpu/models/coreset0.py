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

from srsran_4g_tpu.models import ra_nr, sch_nr
from srsran_4g_tpu.ops import modem, polar_3gpp, scrambling, sequence

NRE = 12
SSB_BW_SUBC = 240

# 38.214 Table 5.1.2.1.1-2 default PDSCH time allocation A, normal CP,
# dmrs-TypeA-Position = pos2: (mapping, S, L).  'A'/'B' per row as in
# srsran_ra_dl_nr_time_default_A (ra_dl_nr.c:68).
TIME_DEFAULT_A_POS2 = [
    ("A", 2, 12), ("A", 2, 10), ("A", 2, 9), ("A", 2, 7), ("A", 2, 5),
    ("B", 9, 4), ("B", 4, 4), ("B", 5, 7), ("B", 5, 2), ("B", 9, 2),
    ("B", 12, 2), ("A", 1, 13), ("A", 1, 6), ("A", 2, 4), ("B", 4, 7),
    ("B", 8, 4),
]

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
    # CCE-to-REG mapping: CORESET#0 is always interleaved (38.211
    # §7.3.2.2); RRC-configured CORESETs may be non-interleaved
    # (pdcch_nr_cce_to_reg_mapping_non_interleaved, pdcch_nr.c:316)
    interleaved: bool = True


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
    §7.3.2.2 mapping (interleaved: bundle L=6, R=2, n_shift = PCI, as
    CORESET#0; non-interleaved: f(x) = x), ascending.  The candidate
    occupies these RBs on every CORESET symbol."""
    n_reg = cs.duration * cs.nof_prb
    big_l, big_r = 6, 2
    big_c = n_reg // (big_l * big_r)
    rbs: set[int] = set()
    for j in range(ncce, ncce + l_agg):
        x = (6 * j) // big_l
        if cs.interleaved:
            r, c = x % big_r, x // big_r
            i = (r * big_c + c + cs.shift_index) % (n_reg // big_l)
        else:
            i = x
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


def css_candidates(nof_cce: int) -> list[tuple[int, int]]:
    """(L, ncce) common-search-space candidates, largest L first: Y=0,
    M = min(nof_cce/L, 8) per level (38.213 §10.1;
    srsran_pdcch_nr_locations_coreset / max_candidates_coreset,
    pdcch_nr.c:133)."""
    out = []
    for l_agg in (16, 8, 4, 2, 1):
        if l_agg > nof_cce:
            continue
        m_max = min(nof_cce // l_agg, 8)
        for m in range(m_max):
            ncce = l_agg * ((m * nof_cce // (l_agg * m_max))
                            % (nof_cce // l_agg))
            out.append((l_agg, ncce))
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
                       noise_var: float = 0.05,
                       candidates: list[tuple[int, int]] | None = None,
                       ) -> dict | None:
    """Blind-search a common search space over one slot grid
    (B=1, 14, nre).

    The carrier grid's RB 0 is pointA.  Returns None or
    dict(l_agg, ncce, bits (A,)).  REs are read symbol-major over the
    candidate's RBs with 9 data REs per RB (k mod 4 ≠ 1), matching the
    reference's pdcch_nr_cp extraction order (pdcch_nr.c:424-456);
    DMRS and its per-RB LS channel estimate are per CORESET symbol."""
    rows = np.asarray(grid[0])
    dms = [_pdcch_dmrs(pci, slot, l, cs.nof_prb)
           for l in range(cs.duration)]
    n_cce = cs.nof_prb * cs.duration // 6
    if candidates is None:
        candidates = type0_candidates(n_cce)
    for l_agg, ncce in candidates:
        rbs = interleaved_candidate_rbs(cs, ncce, l_agg)
        parts = []
        for l in range(cs.duration):
            for p in rbs:
                crb = cs.offset_rb + p
                ks_d = [crb * NRE + o for o in range(12)
                        if o not in (1, 5, 9)]
                ks_m = [crb * NRE + o for o in (1, 5, 9)]
                h = (rows[l, ks_m] * np.conj(dms[l][3 * p:3 * p + 3])).mean()
                x = rows[l, ks_d] * np.conj(h) / (abs(h) ** 2 + 1e-3)
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


def dmrs_positions_type_a(ld: int, add_pos: int = 2,
                          l0: int = 2) -> list[int]:
    """Single-symbol PDSCH DMRS symbols for mapping type A (38.211
    Table 7.4.1.1.2-3; srsran_dmrs_sch_get_symbols_idx, dmrs_sch.c:262)."""
    syms = [l0]
    if ld < 8 or add_pos == 0:
        return syms
    if ld < 10:
        syms += [7]
    elif ld < 12:
        syms += ([6, 9] if add_pos > 2 else [9])
    elif ld == 12:
        syms += {1: [9], 2: [6, 9]}.get(add_pos, [5, 8, 11])
    else:
        syms += {1: [11], 2: [7, 11]}.get(add_pos, [5, 8, 11])
    return syms


def _sch_dmrs(pci: int, slot: int, sym: int, off_prb: int,
              n_prb: int) -> np.ndarray:
    """(6·n_prb,) type-1 PDSCH DMRS, CDM group 0, for allocated PRBs
    [off_prb, off_prb+n_prb) relative to the sequence reference point
    (38.211 §7.4.1.1.1: c_init with n_SCID=0, N_ID = PCI)."""
    cinit = ((1 << 17) * (14 * slot + sym + 1) * (2 * pci + 1)
             + 2 * pci) % (1 << 31)
    c = sequence.gold_sequence_np(
        cinit, 2 * 6 * (off_prb + n_prb)).astype(np.float32)
    r = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
    return r[6 * off_prb:6 * (off_prb + n_prb)].astype(np.complex64)


def decode_pdsch_common(grid: jnp.ndarray, pci: int, slot: int, rnti: int,
                        ref_rb: int, riv: int, bwp_prb: int,
                        time_assign: int, mcs: int, rv: int = 0,
                        time_ra: tuple[int, int] | None = None,
                        dmrs_ref_rb: int | None = None,
                        n_iter: int = 15) -> dict:
    """Decode a DCI-1_0-scheduled PDSCH from one slot grid.

    Counterpart of srsran_ra_dl_dci_to_grant_nr (ra_nr.c) +
    srsran_ue_dl_nr_decode_pdsch for the common-search-space case:
    frequency type-1 RIV over `bwp_prb` PRBs referenced at carrier RB
    `ref_rb` (= CORESET0's lowest RB for SI/RA/Type0-CSS grants,
    38.214 §5.1.2.2.2), default time allocation table A with
    typeA_pos=2 (or an explicit `time_ra` = (S, L) override as the
    reference's -t flag), 38.214 §5.1.3 MCS/TBS, single-symbol type-1
    DMRS with 2 CDM groups without data (-3 dB data/DMRS EPRE).
    """
    rb_s, rb_l = ra_nr.sliv_decode(bwp_prb, riv)
    if time_ra is not None:
        s_sym, l_sym = time_ra
    else:
        _, s_sym, l_sym = TIME_DEFAULT_A_POS2[time_assign]
    ld = s_sym + l_sym  # mapping type A: duration from symbol 0
    dmrs_syms = dmrs_positions_type_a(ld)
    qm, r_target = ra_nr.mcs_to_qm_r(mcs)
    mod = {2: "qpsk", 4: "16qam", 6: "64qam", 8: "256qam"}[qm]
    tbs = ra_nr.tbs(rb_l, mcs, nof_symb=l_sym,
                    nof_dmrs_re=12 * len(dmrs_syms))

    row = np.asarray(grid[0])  # (14, nre)
    crb0 = ref_rb + rb_s       # first allocated carrier RB
    # DMRS sequence reference point: CORESET start for SI-RNTI grants,
    # CRB0 otherwise (38.211 §7.4.1.1.2; ra_nr.c:660-667)
    dmrs_ref = ref_rb if dmrs_ref_rb is None else dmrs_ref_rb
    seq_off = crb0 - dmrs_ref
    sc = np.arange(crb0 * NRE, (crb0 + rb_l) * NRE)
    ks_dmrs = sc[::2]          # comb-2, delta 0
    # LS estimate per DMRS symbol on the comb, smooth, interp to full band
    h_syms, h_raw = [], []
    for l in dmrs_syms:
        r = _sch_dmrs(pci, slot, l, seq_off, rb_l)
        h_ls = row[l, ks_dmrs] * np.conj(r)
        h_raw.append(h_ls)
        hp = np.pad(h_ls, 1, mode="edge")
        h_syms.append(0.25 * hp[:-2] + 0.5 * hp[1:-1] + 0.25 * hp[2:])
    h_p = np.stack(h_syms)     # (n_dmrs, 6·rb_l)
    nv = float(np.mean(np.abs(np.stack(h_raw) - h_p) ** 2) / 0.375)
    comb_k = ks_dmrs.astype(np.float32)
    full_k = sc.astype(np.float32)
    ri = np.clip(np.searchsorted(comb_k, full_k), 1, len(comb_k) - 1)
    li = ri - 1
    w = (full_k - comb_k[li]) / np.maximum(comb_k[ri] - comb_k[li], 1e-9)
    h_f = (1 - w) * h_p[:, li] + w * h_p[:, ri]   # (n_dmrs, 12·rb_l)
    # time interpolation (nearest/linear between DMRS symbols)
    data_syms = [l for l in range(s_sym, s_sym + l_sym)
                 if l not in dmrs_syms]
    t = np.asarray(dmrs_syms, np.float32)
    h_t = np.stack([
        h_f[0] if l <= t[0] else h_f[-1] if l >= t[-1] else
        (lambda j: h_f[j] + (h_f[j + 1] - h_f[j])
         * (l - t[j]) / (t[j + 1] - t[j]))(int(np.searchsorted(t, l) - 1))
        for l in data_syms])
    # 2 CDM groups without data -> data EPRE is -3 dB vs DMRS (38.214 4.1)
    h_t = h_t / np.sqrt(2)
    y = row[np.asarray(data_syms)][:, sc]          # (n_data, 12·rb_l)
    x = (y * np.conj(h_t) / (np.abs(h_t) ** 2 + nv)).reshape(1, -1)
    llr = np.asarray(modem.demodulate_soft(
        mod, jnp.asarray(x), max(nv, 1e-4))).reshape(-1)
    cinit = ((rnti << 15) + pci) % (1 << 31)
    scr = sequence.gold_sequence_np(cinit, llr.size)
    llr = llr * (1.0 - 2.0 * scr.astype(np.float32))
    seg = sch_nr.nr_segment(tbs, llr.size, qm, rv, target_rate=r_target)
    bits, ok, _ = sch_nr.decode(seg, jnp.asarray(llr[None]), n_iter=n_iter)
    return dict(bits=np.asarray(bits[0]), crc_ok=bool(ok[0]), tbs=tbs,
                rb=(rb_s, rb_l), syms=(s_sym, l_sym), mod=mod)


def nr_slot_grid(samples: np.ndarray, nof_prb: int, symbol_sz: int,
                 fc_hz: float = 0.0, slot: int = 0) -> jnp.ndarray:
    """One 15 kHz NR slot (LTE-equal CP structure) → (1, 14, nof_prb·12).

    `fc_hz` undoes the 38.211 §5.4 upconversion phase compensation the
    transmitter applied per symbol (e^{-j2π f_c t_l}, t_l = post-CP
    symbol start); pass the carrier frequency to make the channel
    phase-coherent across symbols (srsran bakes it into baseband
    captures — common_phase_compensation in ofdm.c).  `samples` holds
    exactly one slot; `slot` only offsets the phase-compensation time
    reference (t_l is counted from the start of the radio frame)."""
    cp0 = symbol_sz * 160 // 2048
    cp = symbol_sz * 144 // 2048
    nre = nof_prb * NRE
    fs = symbol_sz * 15e3
    rows = []
    t_off = slot * (14 * symbol_sz + 2 * cp0 + 12 * cp)
    pos = 0
    for l in range(14):
        pos += cp0 if l in (0, 7) else cp
        x = np.fft.fft(samples[pos:pos + symbol_sz]) / np.sqrt(symbol_sz)
        if fc_hz:
            x = x * np.exp(2j * np.pi * fc_hz * ((pos + t_off) / fs))
        rows.append(np.concatenate([x[-(nre // 2):], x[:nre // 2]]))
        pos += symbol_sz
    return jnp.asarray(np.stack(rows)[None].astype(np.complex64))
