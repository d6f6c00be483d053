"""NR PDSCH: LDPC transport chain over a slot grid with DMRS chest.

Counterpart of `lib/src/phy/phch/pdsch_nr.c` (srsran_pdsch_nr_encode/
decode) composed with `dmrs_sch.c` channel estimation and `sch_nr.c`
(models/sch_nr.py here): scrambling (38.211 7.3.1.1), modulation,
RE mapping around type-1 DMRS, and on receive DMRS-based LS estimation
with time/frequency interpolation, MMSE equalization, soft demod and
LDPC decode with HARQ soft combining.

Batched over slots: (B, 14, nre) grids; one jit compiles the whole
encode or decode graph.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.models import equalizer, grid_nr, sch_nr
from srsran_4g_tpu.ops import modem, scrambling, sequence

BITS_PER_SYMBOL = {"qpsk": 2, "16qam": 4, "64qam": 6, "256qam": 8}
DMRS_SYMS = (2, 11)


@dataclass(frozen=True)
class PdschNrConfig:
    carrier: grid_nr.NrCarrierConfig
    rnti: int
    slot: int
    mod: str
    tbs: int
    rv: int = 0
    start_sym: int = 1
    nof_syms: int = 13
    # type-1 frequency allocation (DCI 1_0/0_0 RIV); None = full carrier.
    # DMRS stays carrier-wide (one UE per slot direction in this model).
    rb_start: int = 0
    nof_rb: int | None = None

    @functools.cached_property
    def re_indices(self) -> np.ndarray:
        return grid_nr.data_re_indices_type1(
            self.carrier, DMRS_SYMS, self.start_sym, self.nof_syms,
            rb_start=self.rb_start, nof_rb=self.nof_rb)

    @property
    def nof_re(self) -> int:
        return int(self.re_indices.shape[0])

    @property
    def qm(self) -> int:
        return BITS_PER_SYMBOL[self.mod]

    @property
    def g_bits(self) -> int:
        return self.nof_re * self.qm

    @functools.cached_property
    def seg(self) -> sch_nr.NrSegm:
        return sch_nr.nr_segment(self.tbs, self.g_bits, self.qm, self.rv)

    @functools.cached_property
    def scramble_seq(self) -> np.ndarray:
        # 38.211 7.3.1.1: c_init = rnti*2^15 + q*2^14 + n_ID
        cinit = (self.rnti << 15) + self.carrier.pci
        return sequence.gold_sequence_np(cinit % (1 << 31), self.g_bits)


def encode(cfg: PdschNrConfig, tb_bits: jnp.ndarray) -> jnp.ndarray:
    """(B, tbs) -> (B, 14, nre) slot grid with PDSCH + DMRS."""
    b = tb_bits.shape[0]
    cw = sch_nr.encode(cfg.seg, tb_bits)
    scr = scrambling.scramble_bits(cw, jnp.asarray(cfg.scramble_seq))
    syms = modem.modulate(cfg.mod, scr)
    grid = jnp.zeros((b, grid_nr.NSYMB, cfg.carrier.nre), jnp.complex64)
    flat = grid.reshape(b, -1)
    flat = flat.at[:, jnp.asarray(cfg.re_indices)].set(syms)
    grid = flat.reshape(b, grid_nr.NSYMB, cfg.carrier.nre)
    return grid_nr.put_dmrs_type1(grid, cfg.carrier, cfg.slot, DMRS_SYMS)


def estimate(cfg: PdschNrConfig, rx_grid: jnp.ndarray) -> dict:
    """DMRS LS estimate + smoothing + time interpolation (dmrs_sch.c)."""
    c = cfg.carrier
    ks = jnp.asarray(grid_nr.dmrs_re_indices_type1(c.nof_prb))
    h_ls = []
    for l in DMRS_SYMS:
        r = jnp.asarray(grid_nr.dmrs_symbols_type1(c.nof_prb, cfg.slot, l,
                                                   c.pci))
        y = rx_grid[:, l, ks]
        h_ls.append(y * jnp.conj(r))
    h_p = jnp.stack(h_ls, axis=1)  # (B, 2, 6*nof_prb) on the comb
    # frequency smoothing on the comb
    ker = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    hp = jnp.pad(h_p, ((0, 0), (0, 0), (1, 1)), mode="edge")
    h_sm = ker[0] * hp[..., :-2] + ker[1] * hp[..., 1:-1] + ker[2] * hp[..., 2:]
    noise_var = jnp.mean(jnp.abs(h_p - h_sm) ** 2, axis=(-1, -2)) / 0.375
    # interpolate comb -> full band (linear between comb REs)
    comb_k = grid_nr.dmrs_re_indices_type1(c.nof_prb).astype(np.float32)
    full_k = np.arange(c.nre, dtype=np.float32)
    # use jnp.interp per batch/symbol via broadcasting: implement as gather
    # of neighbouring comb points + linear weights (static indices)
    ri = np.clip(np.searchsorted(comb_k, full_k), 1, len(comb_k) - 1)
    li = ri - 1
    w = ((full_k - comb_k[li]) /
         np.maximum(comb_k[ri] - comb_k[li], 1e-9)).astype(np.float32)
    w = jnp.asarray(w)
    h_full = ((1 - w) * h_sm[..., jnp.asarray(li)]
              + w * h_sm[..., jnp.asarray(ri)])  # (B, 2, nre)
    # time interpolation across the slot between the two DMRS symbols
    t = ((jnp.arange(grid_nr.NSYMB, dtype=jnp.float32) - DMRS_SYMS[0])
         / (DMRS_SYMS[1] - DMRS_SYMS[0]))
    t = jnp.clip(t, 0.0, 1.0)[None, :, None]
    h = (1 - t) * h_full[:, 0:1, :] + t * h_full[:, 1:2, :]
    return dict(h=h.astype(jnp.complex64),
                noise_var=noise_var.astype(jnp.float32))


def decode(cfg: PdschNrConfig, rx_grid: jnp.ndarray,
           softbuffers: dict | None = None, n_iter: int = 12) -> dict:
    b = rx_grid.shape[0]
    est = estimate(cfg, rx_grid)
    idx = jnp.asarray(cfg.re_indices)
    y = rx_grid.reshape(b, -1)[:, idx]
    h = est["h"].reshape(b, -1)[:, idx]
    x, eff_nv = equalizer.equalize_single(y, h, est["noise_var"][:, None])
    llr = modem.demodulate_soft(cfg.mod, x, eff_nv).reshape(b, cfg.g_bits)
    llr = scrambling.descramble_llrs(llr, jnp.asarray(cfg.scramble_seq))
    bits, ok, soft = sch_nr.decode(cfg.seg, llr, softbuffers=softbuffers,
                                   n_iter=n_iter)
    return dict(bits=bits, crc_ok=ok, softbuffers=soft,
                noise_var=est["noise_var"])
