"""PMCH / MBSFN: multicast channel over extended-CP subframes (36.211 §6.5).

Counterpart of `lib/src/phy/phch/pmch.c` + the MBSFN path of
`lib/src/phy/dft/ofdm.c` (ofdm_init_mbsfn_): MBSFN subframes use
extended CP (12 symbols); the first 2 symbols carry the (non-MBSFN)
control region, the MBSFN region carries PMCH over every RE except the
MBSFN reference signals (port 4, symbols {2, 6, 10}, every 2nd
subcarrier, Gold-seeded by the MBSFN area id).  Transport coding is the
DL-SCH turbo chain scrambled by the area id instead of an RNTI.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.models import equalizer, grid as G, sch
from srsran_4g_tpu.ops import modem, scrambling, sequence
from srsran_4g_tpu.ops.ofdm import OfdmConfig
from srsran_4g_tpu.utils import constants as C

MBSFN_RS_SYMS = (2, 6, 10)   # extended-CP subframe symbols with MBSFN-RS
NSYMB_EXT = 12
CONTROL_SYMS = 2

BITS_PER_SYMBOL = {"qpsk": 2, "16qam": 4, "64qam": 6, "256qam": 8}


@dataclass(frozen=True)
class PmchConfig:
    nof_prb: int
    area_id: int
    subframe: int
    mod: str
    tbs: int

    @property
    def nre(self) -> int:
        return self.nof_prb * C.NRE

    @functools.cached_property
    def rs_indices(self) -> np.ndarray:
        """Flat (sym*nre + k) indices of MBSFN-RS REs (36.211 §6.10.2.2:
        symbols {2, 6, 10}, subcarrier offsets {0, 1, 0}, density 2;
        srsran_refsignal_mbsfn_fidx, refsignal_dl.c:355)."""
        out = []
        for l, fidx in zip(MBSFN_RS_SYMS, (0, 1, 0)):
            out.extend(l * self.nre + k
                       for k in range(fidx, self.nre, 2))
        return np.asarray(sorted(out), np.int32)

    @functools.cached_property
    def data_indices(self) -> np.ndarray:
        rs = set(self.rs_indices.tolist())
        out = [l * self.nre + k
               for l in range(CONTROL_SYMS, NSYMB_EXT)
               for k in range(self.nre)
               if (l * self.nre + k) not in rs]
        return np.asarray(out, np.int32)

    @property
    def nof_re(self) -> int:
        return int(self.data_indices.shape[0])

    @property
    def qm(self) -> int:
        return BITS_PER_SYMBOL[self.mod]

    @property
    def g_bits(self) -> int:
        return self.nof_re * self.qm

    @functools.cached_property
    def plan(self) -> sch.DlschPlan:
        return sch.dlsch_plan(self.tbs, self.g_bits, self.qm, 0)

    @functools.cached_property
    def scramble_seq(self) -> np.ndarray:
        # 36.211 §6.5.1: c_init = floor(ns/2)·2^9 + N_MBSFN_ID
        # (srsran_sequence_pmch, sequences.c:174-178)
        cinit = ((self.subframe << 9) + self.area_id) % (1 << 31)
        return sequence.gold_sequence_np(cinit, self.g_bits)


@functools.lru_cache(maxsize=64)
def mbsfn_rs(area_id: int, subframe: int, nre: int) -> np.ndarray:
    """MBSFN reference symbols for the 3 RS-bearing symbols {2, 6, 10}
    (36.211 §6.10.2.1; srsran_refsignal_mbsfn_gen_seq,
    refsignal_dl.c): c_init = 512·(7·(ns'+1)+l'+1)·(2·N_id+1) + N_id
    with l' = l mod 6 and ns' = 2·sf for symbol 2, 2·sf+1 for symbols
    6/10; 6 pilots per PRB drawn from the centre of a virtual
    110-PRB grid."""
    nof_prb = nre // C.NRE
    out = []
    for l, slot_add in zip(MBSFN_RS_SYMS, (0, 1, 1)):
        lp = l % 6
        slot = 2 * subframe + slot_add
        cinit = (512 * (7 * (slot + 1) + lp + 1) * (2 * area_id + 1)
                 + area_id) % (1 << 31)
        c = sequence.gold_sequence_np(cinit, 20 * C.MAX_PRB).astype(
            np.float32)
        m = np.arange(6 * nof_prb) + 3 * (C.MAX_PRB - nof_prb)
        r = ((1 - 2 * c[2 * m]) + 1j * (1 - 2 * c[2 * m + 1])) / np.sqrt(2)
        out.append(r)
    return np.concatenate(out).astype(np.complex64)


def encode(cfg: PmchConfig, tb_bits: jnp.ndarray) -> jnp.ndarray:
    """(B, tbs) -> (B, 12, nre) extended-CP MBSFN subframe grid."""
    b = tb_bits.shape[0]
    cw = sch.dlsch_encode(cfg.plan, tb_bits)
    scr = scrambling.scramble_bits(cw, jnp.asarray(cfg.scramble_seq))
    syms = modem.modulate(cfg.mod, scr)
    grid_tx = jnp.zeros((b, NSYMB_EXT, cfg.nre), jnp.complex64)
    flat = grid_tx.reshape(b, -1)
    flat = flat.at[:, jnp.asarray(cfg.data_indices)].set(syms)
    rs = jnp.asarray(mbsfn_rs(cfg.area_id, cfg.subframe, cfg.nre))
    flat = flat.at[:, jnp.asarray(cfg.rs_indices)].set(rs[None, :len(cfg.rs_indices)])
    return flat.reshape(b, NSYMB_EXT, cfg.nre)


def decode(cfg: PmchConfig, rx_grid: jnp.ndarray, n_iter: int = 4) -> dict:
    """UE-side PMCH receiver: MBSFN-RS LS chest + MMSE + turbo decode."""
    b = rx_grid.shape[0]
    flat = rx_grid.reshape(b, -1)
    rs_ref = jnp.asarray(mbsfn_rs(cfg.area_id, cfg.subframe, cfg.nre))
    rs_ref = rs_ref[: len(cfg.rs_indices)]
    h_ls = flat[:, jnp.asarray(cfg.rs_indices)] * jnp.conj(rs_ref)
    # smooth across the (dense) RS grid; average over symbols
    h_avg = jnp.mean(h_ls.reshape(b, len(MBSFN_RS_SYMS), -1), axis=1)
    ker = jnp.asarray([0.25, 0.5, 0.25])
    hp = jnp.pad(h_avg, ((0, 0), (1, 1)), mode="edge")
    h_sm = ker[0] * hp[:, :-2] + ker[1] * hp[:, 1:-1] + ker[2] * hp[:, 2:]
    nv = jnp.mean(jnp.abs(h_avg - h_sm) ** 2, axis=-1) / 0.375 + 1e-9
    # interpolate comb-2 -> full band (nearest/linear via repeat)
    h_full = jnp.repeat(h_sm, 2, axis=-1)[:, :cfg.nre]
    y = flat[:, jnp.asarray(cfg.data_indices)]
    k_of_re = jnp.asarray(cfg.data_indices % cfg.nre)
    h_re = h_full[:, k_of_re]
    x, eff_nv = equalizer.equalize_single(y, h_re, nv[:, None])
    llr = modem.demodulate_soft(cfg.mod, x, eff_nv).reshape(b, cfg.g_bits)
    llr = scrambling.descramble_llrs(llr, jnp.asarray(cfg.scramble_seq))
    bits, ok, _ = sch.dlsch_decode(cfg.plan, llr, n_iter=n_iter)
    return dict(bits=bits, crc_ok=ok, noise_var=nv)
