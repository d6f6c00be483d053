"""PUSCH: uplink shared channel (SC-FDMA), TS 36.211 §5.3 / 36.212 §5.2.2.

Counterpart of the reference's `lib/src/phy/phch/pusch.c`,
`lib/src/phy/dft/dft_precoding.c` and `lib/src/phy/ch_estimation/chest_ul.c`:
UL-SCH coding (same turbo/rate-match chain as DL-SCH), the PUSCH
time-first channel interleaver, scrambling, modulation, DFT transform
precoding, DMRS insertion at symbol 3 of each slot, and the eNB-side
receiver (DMRS channel estimation → MMSE equalisation → IDFT → soft demod
→ UL-SCH decode).

The channel interleaver and RE maps are host-precomputed permutations;
the transform precoding is a batched FFT over the allocated subcarriers
(sizes 12·N_prb with N_prb of the form 2^a·3^b·5^c — §5.3.3's constraint).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.models import grid as G, sch
from srsran_4g_tpu.models import uci as uci_mod
from srsran_4g_tpu.models.refsignal_ul import pusch_dmrs
from srsran_4g_tpu.models import equalizer
from srsran_4g_tpu.ops import modem, scrambling
from srsran_4g_tpu.ops.sequence import gold_sequence_np
from srsran_4g_tpu.utils.constants import BITS_PER_SYMBOL, NRE

DMRS_SYM = (3, 10)  # normal CP
N_DATA_SYMS = 12


@dataclass(frozen=True)
class PuschConfig:
    cell: G.CellConfig
    rnti: int
    subframe: int
    mod: str
    tbs: int
    prb_start: int = 0
    nof_prb_alloc: int = 4
    rv: int = 0
    cyclic_shift: int = 0
    uci: uci_mod.UciCfg | None = None

    @property
    def m_sc(self) -> int:
        return self.nof_prb_alloc * NRE

    @property
    def nof_re(self) -> int:
        return self.m_sc * N_DATA_SYMS

    @property
    def qm(self) -> int:
        return BITS_PER_SYMBOL[self.mod]

    @property
    def g_bits(self) -> int:
        return self.nof_re * self.qm

    @functools.cached_property
    def uci_plan(self) -> uci_mod.UciPlan | None:
        if self.uci is None:
            return None
        return uci_mod.uci_plan(self.tbs, self.m_sc, self.qm, self.uci)

    @property
    def g_data(self) -> int:
        """UL-SCH coded bits (= g_bits unless UCI reserves symbols)."""
        return self.g_bits if self.uci_plan is None else self.uci_plan.g_data

    @functools.cached_property
    def plan(self) -> sch.DlschPlan:
        return sch.dlsch_plan(self.tbs, self.g_data, self.qm, self.rv)

    @functools.cached_property
    def scramble_seq(self) -> np.ndarray:
        cinit = scrambling.pdsch_cinit(self.rnti, 0, self.subframe,
                                       self.cell.cell_id)
        return gold_sequence_np(cinit, self.g_bits)

    @functools.cached_property
    def interleave_perm(self) -> np.ndarray:
        """Time-first channel interleaver (§5.2.2.8, data-only):
        out[i] = in[perm[i]]."""
        c_mux = N_DATA_SYMS
        qm = self.qm
        h = self.g_bits
        r = h // (c_mux * qm)
        idx = np.arange(h).reshape(r, c_mux, qm)
        return idx.transpose(1, 0, 2).reshape(-1)

    @functools.cached_property
    def data_symbols(self) -> np.ndarray:
        return np.asarray([l for l in range(14) if l not in DMRS_SYM])


def transform_precode(x: jnp.ndarray) -> jnp.ndarray:
    """DFT precoding per SC-FDMA symbol: (..., M_sc) → (..., M_sc)."""
    m = x.shape[-1]
    return (jnp.fft.fft(x, axis=-1) / jnp.sqrt(jnp.asarray(m, jnp.float32))
            ).astype(jnp.complex64)


def transform_deprecode(y: jnp.ndarray) -> jnp.ndarray:
    m = y.shape[-1]
    return (jnp.fft.ifft(y, axis=-1) * jnp.sqrt(jnp.asarray(m, jnp.float32))
            ).astype(jnp.complex64)


def encode(
    cfg: PuschConfig,
    tb_bits: jnp.ndarray,
    cqi_bits: jnp.ndarray | None = None,
    ack_bits: jnp.ndarray | None = None,
    ri_bits: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """TB bits (B, tbs) → UL subframe grid (B, 14, nre) with PUSCH+DMRS.

    With `cfg.uci` set, CQI/RI coded symbols are multiplexed with the
    UL-SCH data and HARQ-ACK punctures it (sch.c ulsch_interleave)."""
    cw = sch.dlsch_encode(cfg.plan, tb_bits)  # UL-SCH shares the FEC chain
    if cfg.uci_plan is not None:
        inter = uci_mod.mux(cfg.uci_plan, cw, cqi_bits=cqi_bits,
                            ack_bits=ack_bits, ri_bits=ri_bits)
    else:
        inter = cw[..., jnp.asarray(cfg.interleave_perm)]
    scr = scrambling.scramble_bits(inter, jnp.asarray(cfg.scramble_seq))
    syms = modem.modulate(cfg.mod, scr)  # (B, 12*M_sc), symbol-major
    b = tb_bits.shape[0]
    syms = syms.reshape(b, N_DATA_SYMS, cfg.m_sc)
    freq = transform_precode(syms)

    grid_tx = jnp.zeros((b, cfg.cell.nsymb, cfg.cell.nre), jnp.complex64)
    k0 = cfg.prb_start * NRE
    ks = jnp.arange(k0, k0 + cfg.m_sc)
    grid_tx = grid_tx.at[:, jnp.asarray(cfg.data_symbols)[:, None], ks].set(freq)
    for slot, l in enumerate(DMRS_SYM):
        dm = pusch_dmrs(cfg.cell.cell_id, cfg.nof_prb_alloc,
                        2 * cfg.subframe + slot, cfg.cyclic_shift)
        grid_tx = grid_tx.at[:, l, ks].set(jnp.asarray(dm))
    return grid_tx


def estimate_ul(cfg: PuschConfig, rx_grid: jnp.ndarray) -> dict:
    """DMRS-based UL channel estimate over the allocation (chest_ul.c)."""
    b = rx_grid.shape[0]
    k0 = cfg.prb_start * NRE
    ks = jnp.arange(k0, k0 + cfg.m_sc)
    h_slots = []
    for slot, l in enumerate(DMRS_SYM):
        dm = jnp.asarray(
            pusch_dmrs(cfg.cell.cell_id, cfg.nof_prb_alloc,
                       2 * cfg.subframe + slot, cfg.cyclic_shift)
        )
        y = rx_grid[:, l, ks]
        h_slots.append(y * jnp.conj(dm))
    h_ls = jnp.stack(h_slots, axis=1)  # (B, 2, M_sc)
    # light freq smoothing
    ker = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    hp = jnp.pad(h_ls, ((0, 0), (0, 0), (1, 1)), mode="edge")
    h_sm = ker[0] * hp[..., :-2] + ker[1] * hp[..., 1:-1] + ker[2] * hp[..., 2:]
    resid = h_ls - h_sm
    noise_var = jnp.mean(jnp.abs(resid) ** 2, axis=(-1, -2)) / 0.375
    # linear time interpolation between the two DMRS symbols
    t = (jnp.arange(14, dtype=jnp.float32) - DMRS_SYM[0]) / (DMRS_SYM[1] - DMRS_SYM[0])
    w1 = t[None, :, None]
    h = (1 - w1) * h_sm[:, 0:1, :] + w1 * h_sm[:, 1:2, :]  # (B, 14, M_sc)
    return dict(h=h.astype(jnp.complex64), noise_var=noise_var.astype(jnp.float32))


def decode(
    cfg: PuschConfig,
    rx_grid: jnp.ndarray,
    softbuffers: dict | None = None,
    n_iter: int = 5,
) -> dict:
    """eNB-side PUSCH receiver (enb_ul.c srsran_enb_ul_get_pusch)."""
    est = estimate_ul(cfg, rx_grid)
    b = rx_grid.shape[0]
    k0 = cfg.prb_start * NRE
    ks = jnp.arange(k0, k0 + cfg.m_sc)
    y = rx_grid[:, jnp.asarray(cfg.data_symbols)[:, None], ks]  # (B, 12, M)
    h = est["h"][:, jnp.asarray(cfg.data_symbols)[:, None],
                 jnp.arange(cfg.m_sc)]
    x_f, eff_nv = equalizer.equalize_single(y, h, est["noise_var"][:, None, None])
    x_t = transform_deprecode(x_f)
    # post-IDFT noise is the average over the DFT block
    nv_t = jnp.mean(eff_nv, axis=-1, keepdims=True)
    llr = modem.demodulate_soft(cfg.mod, x_t, nv_t)
    llr = llr.reshape(b, cfg.g_bits)
    llr = scrambling.descramble_llrs(llr, jnp.asarray(cfg.scramble_seq))
    extra: dict = {}
    if cfg.uci_plan is not None:
        dmx = uci_mod.demux(cfg.uci_plan, llr)
        deinter = dmx.pop("data_llrs")
        extra = dmx
    else:
        deinter = jnp.zeros_like(llr)
        deinter = deinter.at[..., jnp.asarray(cfg.interleave_perm)].set(llr)
    bits, ok, soft = sch.dlsch_decode(
        cfg.plan, deinter, softbuffers=softbuffers, n_iter=n_iter
    )
    return dict(bits=bits, crc_ok=ok, softbuffers=soft, **extra, **est)
