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


# --------------------------------------------------------------------------
# UCI on PUSCH (38.212 §6.3.2, counterpart of `phch/uci_nr.c` +
# `pusch_nr.c` UCI multiplexing): HARQ-ACK and CSI ride the PUSCH
# allocation.  CSI is rate-matched (UL-SCH data skips its REs); ACK
# punctures data REs near the first DMRS symbol, so a missed DL grant
# cannot desync the data rate matching (the reason the spec punctures).

import math

from srsran_4g_tpu.models.pucch_nr import uci_decode, uci_encode


@dataclass(frozen=True)
class NrUciCfg:
    o_ack: int = 0
    o_csi: int = 0
    beta_ack: float = 2.0   # beta-offset (38.213 table 9.3-1 value)
    beta_csi: float = 2.0
    alpha: float = 0.5      # scaling cap (38.212 6.3.2.4)


@dataclass(frozen=True)
class PuschNrUciConfig(PuschNrConfig):
    uci: NrUciCfg | None = None


@functools.lru_cache(maxsize=128)
def _uci_plan(cfg: "PuschNrUciConfig"):
    """Static bit-position plan: (e_ack, e_csi, ack_bit_idx, csi_bit_idx,
    data_bit_idx) — all indices into the (g_bits,) codeword."""
    u = cfg.uci
    qm = cfg.qm
    nre = cfg.nof_re
    r_data = cfg.tbs / cfg.g_bits

    def e_of(o: int, beta: float) -> int:
        if o == 0:
            return 0
        l_crc = 0 if o <= 11 else 11
        e = qm * math.ceil((o + l_crc) * beta / (r_data * qm))
        cap = qm * max(1, int(u.alpha * nre))
        return max(qm, min(e, cap))

    e_ack = e_of(u.o_ack, u.beta_ack)
    e_csi = e_of(u.o_csi, u.beta_csi)
    nre_sym = cfg.carrier.nre
    data_syms = [l for l in range(cfg.start_sym, cfg.start_sym + cfg.nof_syms)
                 if l not in DMRS_SYMS]
    # ACK REs: from the first data symbol after the first DMRS symbol,
    # evenly strided across each symbol (38.212 6.2.7 distribution idea)
    ack_re: list[int] = []
    sym_i = next(i for i, l in enumerate(data_syms) if l > DMRS_SYMS[0])
    remaining = e_ack // qm
    while remaining > 0:
        take = min(remaining, nre_sym)
        stride = nre_sym // take
        ack_re.extend(sym_i * nre_sym + k * stride for k in range(take))
        remaining -= take
        sym_i += 1
    ack_re_arr = np.asarray(sorted(ack_re), np.int64)
    ack_set = set(ack_re)
    # CSI REs: first free REs in mapping order, skipping ACK positions
    csi_re: list[int] = []
    need = e_csi // qm
    i = 0
    while len(csi_re) < need:
        if i not in ack_set:
            csi_re.append(i)
        i += 1
    csi_re_arr = np.asarray(csi_re, np.int64)
    csi_set = set(csi_re)
    data_re = np.asarray([k for k in range(nre) if k not in csi_set],
                         np.int64)

    def bit_idx(re_arr: np.ndarray) -> np.ndarray:
        return (re_arr[:, None] * qm + np.arange(qm)).reshape(-1)

    return (e_ack, e_csi, bit_idx(ack_re_arr), bit_idx(csi_re_arr),
            bit_idx(data_re))


def encode_uci(cfg: PuschNrUciConfig, tb_bits: jnp.ndarray,
               ack_bits: jnp.ndarray | None = None,
               csi_bits: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, tbs) + optional ACK/CSI -> slot grid with UCI multiplexed."""
    if cfg.uci is None:
        return encode(cfg, tb_bits)
    e_ack, e_csi, ack_idx, csi_idx, data_idx = _uci_plan(cfg)
    import srsran_4g_tpu.models.sch_nr as sch_nr_mod
    g_data = cfg.g_bits - e_csi
    seg = sch_nr_mod.nr_segment(cfg.tbs, g_data, cfg.qm, cfg.rv)
    cw = sch_nr_mod.encode(seg, tb_bits)
    b = tb_bits.shape[0]
    full = jnp.zeros((b, cfg.g_bits), jnp.int8)
    full = full.at[:, jnp.asarray(data_idx)].set(cw)
    if e_csi:
        full = full.at[:, jnp.asarray(csi_idx)].set(
            uci_encode(csi_bits, e_csi))
    if e_ack:
        full = full.at[:, jnp.asarray(ack_idx)].set(
            uci_encode(ack_bits, e_ack))
    from srsran_4g_tpu.ops import modem as modem_ops
    from srsran_4g_tpu.ops import scrambling as scr_ops
    scr = scr_ops.scramble_bits(full, jnp.asarray(cfg.scramble_seq))
    syms = modem_ops.modulate(cfg.mod, scr)
    grid = jnp.zeros((b, grid_nr.NSYMB, cfg.carrier.nre), jnp.complex64)
    flat = grid.reshape(b, -1).at[:, jnp.asarray(cfg.re_indices)].set(syms)
    grid = flat.reshape(b, grid_nr.NSYMB, cfg.carrier.nre)
    return grid_nr.put_dmrs_type1(grid, cfg.carrier, cfg.slot, DMRS_SYMS)


def decode_uci(cfg: PuschNrUciConfig, rx_grid: jnp.ndarray,
               n_iter: int = 12) -> dict:
    """-> dict(bits, crc_ok, ack_bits?, csi_bits?) (gnb_ul.c UCI path)."""
    if cfg.uci is None:
        return decode(cfg, rx_grid)
    e_ack, e_csi, ack_idx, csi_idx, data_idx = _uci_plan(cfg)
    import srsran_4g_tpu.models.sch_nr as sch_nr_mod
    from srsran_4g_tpu.models import pdsch_nr as _p
    from srsran_4g_tpu.ops import modem as modem_ops
    from srsran_4g_tpu.ops import scrambling as scr_ops
    b = rx_grid.shape[0]
    est = _p.estimate(cfg, rx_grid)
    idx = jnp.asarray(cfg.re_indices)
    y = rx_grid.reshape(b, -1)[:, idx]
    h = est["h"].reshape(b, -1)[:, idx]
    from srsran_4g_tpu.models import equalizer as eq_mod
    x, eff_nv = eq_mod.equalize_single(y, h, est["noise_var"][:, None])
    llr = modem_ops.demodulate_soft(cfg.mod, x, eff_nv).reshape(b, cfg.g_bits)
    llr = scr_ops.descramble_llrs(llr, jnp.asarray(cfg.scramble_seq))
    out: dict = {}
    if e_ack:
        a_llr = llr[:, jnp.asarray(ack_idx)]
        out["ack_bits"], _ = uci_decode(a_llr, cfg.uci.o_ack)
        llr = llr.at[:, jnp.asarray(ack_idx)].set(0.0)  # punctured for data
    if e_csi:
        c_llr = llr[:, jnp.asarray(csi_idx)]
        out["csi_bits"], _ = uci_decode(c_llr, cfg.uci.o_csi)
    g_data = cfg.g_bits - e_csi
    seg = sch_nr_mod.nr_segment(cfg.tbs, g_data, cfg.qm, cfg.rv)
    bits, ok, _ = sch_nr_mod.decode(seg, llr[:, jnp.asarray(data_idx)],
                                    n_iter=n_iter)
    out.update(bits=bits, crc_ok=ok)
    return out
