"""PDSCH physical channel: encode (eNB side) and decode (UE side).

Counterpart of the reference's `lib/src/phy/phch/pdsch.c`
(srsran_pdsch_encode :1017, srsran_pdsch_decode :788) composed with the
composite receivers `lib/src/phy/ue/ue_dl.c` / `lib/src/phy/enb/enb_dl.c`.

Chain (single codeword, port 0; SFBC via equalizer.alamouti for TM2):

  encode:  TB bits → DL-SCH (CRC/segment/turbo/rate-match) → scramble →
           modulate → RE-map into the resource grid (+ CRS insertion)
  decode:  grid → chest → RE-gather → equalise → soft demod → descramble →
           DL-SCH decode (dematch/HARQ/turbo/CRC)

Everything is batched over a leading subframe/UE dimension and jit-stable:
RE maps, scrambling sequences and interpolation matrices are host-cached
per static config.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.models import chest as chest_mod
from srsran_4g_tpu.models import equalizer
from srsran_4g_tpu.models import grid as G
from srsran_4g_tpu.models import sch
from srsran_4g_tpu.ops import modem, scrambling
from srsran_4g_tpu.utils.constants import BITS_PER_SYMBOL


@dataclass(frozen=True)
class PdschConfig:
    cell: G.CellConfig
    rnti: int
    subframe: int
    mod: str  # "qpsk" | "16qam" | "64qam" | "256qam"
    tbs: int
    rv: int = 0
    prb_alloc: tuple[int, ...] | None = None  # None = full band
    codeword: int = 0

    @functools.cached_property
    def re_indices(self) -> np.ndarray:
        return G.pdsch_re_indices(self.cell, self.subframe, self.prb_alloc)

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
    def plan(self) -> sch.DlschPlan:
        return sch.dlsch_plan(self.tbs, self.g_bits, self.qm, self.rv)

    @functools.cached_property
    def scramble_seq(self) -> np.ndarray:
        from srsran_4g_tpu.ops.sequence import gold_sequence_np

        cinit = scrambling.pdsch_cinit(
            self.rnti, self.codeword, self.subframe, self.cell.cell_id
        )
        return gold_sequence_np(cinit, self.g_bits)


def encode(cfg: PdschConfig, tb_bits: jnp.ndarray) -> jnp.ndarray:
    """TB bits (B, tbs) → resource grid with PDSCH REs set.

    Returns (B, nsymb, nre) for 1 port, (B, 2, nsymb, nre) for 2 ports
    (TM2 SFBC transmit diversity, TS 36.211 §6.3.4.3).
    """
    cw = sch.dlsch_encode(cfg.plan, tb_bits)
    seq = jnp.asarray(cfg.scramble_seq)
    scr = scrambling.scramble_bits(cw, seq)
    syms = modem.modulate(cfg.mod, scr)  # (B, nof_re)
    b = tb_bits.shape[0]
    idx = jnp.asarray(cfg.re_indices)
    if cfg.cell.nof_ports == 1:
        flat = jnp.zeros((b, cfg.cell.nsymb * cfg.cell.nre), dtype=jnp.complex64)
        flat = flat.at[:, idx].set(syms)
        return flat.reshape(b, cfg.cell.nsymb, cfg.cell.nre)
    assert cfg.cell.nof_ports == 2, "1 or 2 ports supported"
    x0 = syms[:, 0::2]
    x1 = syms[:, 1::2]
    s = jnp.sqrt(2.0).astype(jnp.complex64)
    p0 = jnp.stack([x0, x1], axis=-1).reshape(b, -1) / s
    p1 = jnp.stack([-jnp.conj(x1), jnp.conj(x0)], axis=-1).reshape(b, -1) / s
    flat = jnp.zeros((b, 2, cfg.cell.nsymb * cfg.cell.nre), dtype=jnp.complex64)
    flat = flat.at[:, 0, idx].set(p0)
    flat = flat.at[:, 1, idx].set(p1)
    return flat.reshape(b, 2, cfg.cell.nsymb, cfg.cell.nre)


def add_crs(cfg: PdschConfig, grid_tx: jnp.ndarray, port: int = 0) -> jnp.ndarray:
    """Insert cell reference signals into a TX grid (enb_dl.c put_refs).

    For multi-port grids (B, P, nsymb, nre), each port gets its own CRS and
    zeros on the other ports' CRS REs (already guaranteed by the reserved
    mask in the RE mapping).
    """
    cell = cfg.cell
    g = jnp.asarray(grid_tx)
    if g.ndim >= 3 and cell.nof_ports >= 2 and g.shape[-3] == cell.nof_ports:
        for p in range(cell.nof_ports):
            syms, scs = G.crs_pattern(cell, p)
            vals = jnp.asarray(G.crs_values(cell, p, cfg.subframe))
            g = g.at[..., p, jnp.asarray(syms)[:, None], jnp.asarray(scs)].set(vals)
        return g
    syms, scs = G.crs_pattern(cell, port)
    vals = jnp.asarray(G.crs_values(cell, port, cfg.subframe))
    return g.at[..., jnp.asarray(syms)[:, None], jnp.asarray(scs)].set(vals)


def decode(
    cfg: PdschConfig,
    rx_grid: jnp.ndarray,
    h: jnp.ndarray | None = None,
    noise_var: jnp.ndarray | float | None = None,
    softbuffers: dict | None = None,
    n_iter: int = 5,
    chest_cfg: chest_mod.ChestConfig | None = None,
) -> dict:
    """Decode PDSCH from a received resource grid.

    If ``h``/``noise_var`` are not given, they are estimated from the CRS
    (srsran_ue_dl_decode_fft_estimate path, ue_dl.c:349).

    Returns dict(bits, crc_ok, softbuffers, h, noise_var, snr_db?).
    """
    out: dict = {}
    two_port = cfg.cell.nof_ports == 2
    if h is None or noise_var is None:
        ccfg = chest_cfg or chest_mod.ChestConfig(cell=cfg.cell)
        est = chest_mod.estimate(ccfg, rx_grid, cfg.subframe, port=0)
        if two_port:
            est1 = chest_mod.estimate(ccfg, rx_grid, cfg.subframe, port=1)
            h = jnp.stack([est["h"], est1["h"]], axis=1) if h is None else h
            noise_var = (
                0.5 * (est["noise_var"] + est1["noise_var"])
                if noise_var is None else noise_var
            )
        else:
            h = est["h"] if h is None else h
            noise_var = est["noise_var"] if noise_var is None else noise_var
        out["snr_db"] = est["snr_db"]

    idx = jnp.asarray(cfg.re_indices)
    b = rx_grid.shape[0]
    y = rx_grid.reshape(b, -1)[:, idx]
    if two_port:
        h0 = h[:, 0].reshape(b, -1)[:, idx]
        h1 = h[:, 1].reshape(b, -1)[:, idx]
        x, eff_nv = equalizer.alamouti_decode_2x1(y, h0, h1, noise_var)
    else:
        h_re = h.reshape(b, -1)[:, idx]
        x, eff_nv = equalizer.equalize_single(y, h_re, noise_var)

    # per-RE CSI-scaled LLRs: demod divides by the effective noise variance
    llr_scr = modem.demodulate_soft(cfg.mod, x, eff_nv)
    llr = scrambling.descramble_llrs(
        llr_scr.reshape(b, cfg.g_bits), jnp.asarray(cfg.scramble_seq)
    )
    bits, ok, soft = sch.dlsch_decode(
        cfg.plan, llr, softbuffers=softbuffers, n_iter=n_iter
    )
    out.update(bits=bits, crc_ok=ok, softbuffers=soft, h=h, noise_var=noise_var)
    return out
