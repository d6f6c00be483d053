"""LTE air interface: scheduler-driven subframes over the jitted TPU PHY.

This is the glue the reference implements in `srsenb/src/phy/lte/cc_worker.cc`
(encode_pdsch:596 + PDCCH put) and `srsue/src/phy/lte/cc_worker.cc`
(work_dl_regular:214 → decode_pdcch:259 → decode_pdsch:442, work_ul:600):
every grant travels over the air as a DCI on PDCCH, the UE blind-decodes
its search space every TTI, HARQ-ACK/SR/CQI ride PUCCH, and UL data rides
PUSCH — nothing is handed between the nodes out-of-band.

Each distinct (config)-shaped step is jitted once and cached; subframe
composition sums disjoint-RE grids (PDSCH allocations, PUCCH resources,
PUSCH allocations never overlap by scheduler construction).  The PHY uses
one fixed subframe index per direction (DL 4, UL 3) so the jit cache stays
bounded while MAC/RRC timing runs on the real TTI counter; scrambling and
search-space hashing are exercised with those indices.

PUCCH resource derivation follows 36.213 §10.1: the HARQ-ACK format-1a
index is the first CCE of the scheduling PDCCH; SR and CQI resources are
RRC-configured per UE (here: allocated at attach).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from srsran_4g_tpu.models import dci as dci_mod, pdcch as pdcch_mod
from srsran_4g_tpu.models import grid as G, pdsch as pdsch_mod
from srsran_4g_tpu.models import pucch as pucch_mod, pusch as pusch_mod
from srsran_4g_tpu.models import chest as chest_mod, prach as prach_mod
from srsran_4g_tpu.models import ra
from srsran_4g_tpu.ops.ofdm import OfdmConfig, demodulate, modulate
from srsran_4g_tpu.stack import enb_mac as enb_mac_mod
from srsran_4g_tpu.utils import constants as C

DL_SF = 4   # fixed PHY subframe index for the DL (scrambling/search space)
UL_SF = 3   # fixed PHY subframe index for the UL


@dataclass(frozen=True)
class UePucchRes:
    """RRC-configured PUCCH resources of one UE."""

    n_pucch_sr: int
    n_pucch_2: int     # CQI (format 2) resource index


class CchAllocator:
    """Per-TTI CCE allocation over the search spaces
    (sf_cch_allocator.cc): first non-colliding candidate wins."""

    def __init__(self, cell: G.CellConfig, cfi: int) -> None:
        self.cell = cell
        self.cfi = cfi
        self.n_cce = pdcch_mod.cce_re_indices(cell, cfi).shape[0]

    def alloc(self, rnti: int, used: set[int],
              min_l: int = 1) -> tuple[int, int] | None:
        for l_agg, start in pdcch_mod.search_space_candidates(
                self.cell, self.cfi, rnti, DL_SF):
            if l_agg < min_l:
                continue
            cces = set(range(start, start + l_agg))
            if not (cces & used):
                used |= cces
                return l_agg, start
        return None


def dci_to_pdsch_cfg(cell: G.CellConfig, rnti: int,
                     d: dci_mod.Dci1A) -> pdsch_mod.PdschConfig:
    """Both sides derive the PDSCH parameters from the DCI alone
    (ra_dl.c: MCS→modulation/I_TBS→TBS)."""
    return pdsch_mod.PdschConfig(
        cell=cell, rnti=rnti, subframe=DL_SF, mod=ra.dl_mcs_to_mod(d.mcs),
        tbs=ra.dl_tbs(d.mcs, d.l_crbs), rv=d.rv,
        prb_alloc=tuple(range(d.rb_start, d.rb_start + d.l_crbs)))


def _ul_cfg(cell: G.CellConfig, rnti: int, prb_start: int, prb_len: int,
            mcs: int, rv: int = 0) -> pusch_mod.PuschConfig:
    return pusch_mod.PuschConfig(
        cell=cell, rnti=rnti, subframe=UL_SF, mod=ra.ul_mcs_to_mod(mcs),
        tbs=ra.tbs_from_itbs(ra.ul_mcs_to_itbs(mcs), prb_len),
        prb_start=prb_start, nof_prb_alloc=prb_len, rv=rv)


class LteAirPhy:
    """The jitted sample-domain channel both nodes share."""

    def __init__(self, nof_prb: int, cell_id: int = 1, cfi: int | None = None,
                 snr_db: float = 20.0, seed: int = 7) -> None:
        import jax

        self.jax = jax
        if cfi is None:
            cfi = 3 if nof_prb <= 10 else 2
        self.cell = G.CellConfig(nof_prb=nof_prb, cell_id=cell_id, cfi=cfi)
        self.ofdm = OfdmConfig(nof_prb=nof_prb)
        self.cch = CchAllocator(self.cell, cfi)
        self.dci_len = dci_mod.format1a_len(nof_prb)
        from srsran_4g_tpu.channel.awgn import snr_to_noise_var

        self.nv = float(snr_to_noise_var(snr_db))
        self._key = jax.random.PRNGKey(seed)
        self._fns: dict = {}
        self.prach_cfg = prach_mod.PrachConfig(
            symbol_sz=C.symbol_sz(nof_prb), root_seq_index=0,
            zero_corr_zone=5)

    # -- utilities -----------------------------------------------------------

    def key(self):
        self._key, k = self.jax.random.split(self._key)
        return k

    def _fn(self, k, builder):
        f = self._fns.get(k)
        if f is None:
            f = self._fns[k] = self.jax.jit(builder())
        return f

    def _bits(self, pdu: bytes, nbits: int) -> np.ndarray:
        b = np.unpackbits(np.frombuffer(pdu, np.uint8))[:nbits]
        return np.pad(b, (0, nbits - len(b))).astype(np.int8)[None]

    # -- eNB TX --------------------------------------------------------------

    def enb_dl_tx(self, items: list[tuple[pdsch_mod.PdschConfig | None, bytes,
                                          np.ndarray, int, int, int]]):
        """items: (cfg, pdu, dci_bits, rnti, l_agg, cce_start) → samples.

        cfg None = DCI-only item (UL grant: PDCCH but no PDSCH).
        Returns noisy time-domain samples (1, sf_len).
        """
        jnp = self.jax.numpy
        grid = None
        for cfg, pdu, _, _, _, _ in items:
            if cfg is None:
                continue
            enc = self._fn(("pdsch_enc", cfg),
                           lambda cfg=cfg: functools.partial(pdsch_mod.encode, cfg))
            g = enc(jnp.asarray(self._bits(pdu, cfg.tbs)))
            grid = g if grid is None else grid + g

        def build_overhead():
            from srsran_4g_tpu.models import enb_dl, pcfich as pcfich_mod

            cell, cfi = self.cell, self.cell.cfi

            def f(g):
                ref_cfg = pdsch_mod.PdschConfig(
                    cell=cell, rnti=0, subframe=DL_SF, mod="qpsk", tbs=16)
                g = pdsch_mod.add_crs(ref_cfg, g)
                cfi_arr = jnp.full((g.shape[0],), cfi, jnp.int32)
                return pcfich_mod.put_into_grid(
                    cell, g, pcfich_mod.encode(cell, cfi_arr, DL_SF))
            return f

        if grid is None:
            grid = jnp.zeros((1, self.cell.nsymb, self.cell.nre),
                             jnp.complex64)
        grid = self._fn(("overhead",), build_overhead)(grid)

        for cfg, _, dci_bits, rnti, l_agg, cce_start in items:
            put = self._fn(
                ("dci_put", rnti, l_agg, cce_start, len(dci_bits)),
                lambda rnti=rnti, l_agg=l_agg, cce_start=cce_start:
                    functools.partial(pdcch_mod.put_dci, self.cell,
                                      self.cell.cfi, DL_SF, rnti=rnti,
                                      l_agg=l_agg, cce_start=cce_start))
            grid = put(grid, dci_bits=jnp.asarray(dci_bits[None]))

        mod = self._fn(("ofdm_mod",),
                       lambda: functools.partial(modulate, self.ofdm))
        awgn_f = self._fn(("awgn",), self._build_awgn)
        return awgn_f(mod(grid), self.key())

    def _build_awgn(self):
        from srsran_4g_tpu.channel.awgn import awgn

        nv = self.nv

        def f(x, key):
            return awgn(key, x, nv)
        return f

    # -- UE RX ----------------------------------------------------------------

    def ue_dl_rx_multi(self, samples, rnti: int) -> dict:
        """Blind-decode the UE's full search space for `rnti`.

        Returns dict(snr_db, hits=[{dci|ul_dci, cce_start, pdu?}, ...]).
        Every CRC-passing candidate is taken, smallest aggregation level
        first, skipping candidates whose CCEs overlap an accepted one
        (overlapping "echo" detections of the same DCI at a larger L).
        pdu None on a DL hit = PDSCH KO (CRC fail).
        """
        demod = self._fn(("ofdm_demod",),
                         lambda: functools.partial(demodulate, self.ofdm))
        grid = demod(samples)
        est = self._fn(("chest",), lambda: functools.partial(
            chest_mod.estimate, chest_mod.ChestConfig(cell=self.cell),
            subframe=DL_SF))(grid)
        h, nv, snr_db = est["h"], est["noise_var"], est["snr_db"]

        blind = self._fn(("blind", rnti), lambda: functools.partial(
            pdcch_mod.blind_decode, self.cell, self.cell.cfi, DL_SF,
            rnti=rnti, dci_len=self.dci_len))
        out = blind(grid, h=h, noise_var=nv)
        res = dict(snr_db=float(snr_db[0]), hits=[])
        ok = np.asarray(out["ok_per_candidate"][0])
        if not ok.any():
            return res
        cands = pdcch_mod.search_space_candidates(
            self.cell, self.cell.cfi, rnti, DL_SF)
        payloads = np.asarray(out["payload_per_candidate"][0])
        used: set[int] = set()
        for i in sorted(range(len(cands)), key=lambda i: cands[i][0]):
            if not ok[i]:
                continue
            l_agg, start = cands[i]
            cces = set(range(start, start + l_agg))
            if cces & used:
                continue
            used |= cces
            bits = payloads[i]
            if bits[0] == 0:       # format 0/1A flag: UL grant
                res["hits"].append(dict(
                    ul_dci=dci_mod.unpack_0(bits, self.cell.nof_prb),
                    cce_start=start))
                continue
            d = dci_mod.unpack_1a(bits, self.cell.nof_prb)
            cfg = dci_to_pdsch_cfg(self.cell, rnti, d)
            dec = self._fn(("pdsch_dec", cfg), lambda cfg=cfg:
                           functools.partial(pdsch_mod.decode, cfg, n_iter=6))
            r = dec(grid, h=h, noise_var=nv)
            pdu = (np.packbits(np.asarray(r["bits"][0], np.uint8)).tobytes()
                   if bool(r["crc_ok"][0]) else None)
            res["hits"].append(dict(dci=d, cce_start=start, pdu=pdu))
        return res

    # -- UE UL TX --------------------------------------------------------------

    def pucch_cfg(self, n_pucch: int, rnti: int = 0,
                  n_rb_2: int = 1) -> pucch_mod.PucchConfig:
        return pucch_mod.PucchConfig(cell=self.cell, subframe=UL_SF,
                                     n_pucch=n_pucch, n_rb_2=n_rb_2,
                                     rnti=rnti)

    def ue_ul_tx(self, pusch: tuple[pusch_mod.PuschConfig, bytes] | None,
                 ack: tuple[int, int] | None = None,
                 sr: int | None = None,
                 cqi: tuple[int, int, int] | None = None):
        """One UE's UL grid: PUSCH + PUCCH contributions (or None).

        ack: (n_pucch, ack_bit); sr: n_pucch_sr; cqi: (n_pucch_2, rnti, cqi).
        """
        jnp = self.jax.numpy
        grid = None
        if pusch is not None:
            cfg, pdu = pusch
            enc = self._fn(("pusch_enc", cfg), lambda cfg=cfg:
                           functools.partial(pusch_mod.encode, cfg))
            grid = enc(jnp.asarray(self._bits(pdu, cfg.tbs)))
        if ack is not None:
            n_pucch, bit = ack
            pcfg = self.pucch_cfg(n_pucch)
            enc = self._fn(("pucch1a_enc", n_pucch), lambda pcfg=pcfg:
                           lambda bits: pucch_mod.encode_format1(pcfg, bits))
            g = enc(jnp.asarray([[bit]], jnp.int8))
            grid = g if grid is None else grid + g
        if sr is not None:
            pcfg = self.pucch_cfg(sr)
            g = pucch_mod.encode_format1(pcfg, None)
            grid = g if grid is None else grid + g
        if cqi is not None:
            n2, rnti, val = cqi
            pcfg = self.pucch_cfg(n2, rnti=rnti)
            enc = self._fn(("pucch2_enc", n2, rnti), lambda pcfg=pcfg:
                           lambda bits: pucch_mod.encode_format2(pcfg, bits))
            bits = ((val >> np.arange(3, -1, -1)) & 1).astype(np.int8)
            g = enc(jnp.asarray(bits[None]))
            grid = g if grid is None else grid + g
        return grid

    def combine_ul(self, grids: list):
        """Sum per-UE UL grids and push through OFDM + AWGN → eNB samples."""
        jnp = self.jax.numpy
        total = None
        for g in grids:
            if g is not None:
                total = g if total is None else total + g
        if total is None:
            total = jnp.zeros((1, self.cell.nsymb, self.cell.nre),
                              jnp.complex64)
        mod = self._fn(("ofdm_mod",),
                       lambda: functools.partial(modulate, self.ofdm))
        awgn_f = self._fn(("awgn",), self._build_awgn)
        return awgn_f(mod(total), self.key())

    # -- eNB UL RX ---------------------------------------------------------------

    def enb_ul_grid(self, samples):
        demod = self._fn(("ofdm_demod",),
                         lambda: functools.partial(demodulate, self.ofdm))
        return demod(samples)

    def enb_pusch_rx(self, ul_grid, cfg: pusch_mod.PuschConfig) -> bytes | None:
        dec = self._fn(("pusch_dec", cfg), lambda cfg=cfg:
                       functools.partial(pusch_mod.decode, cfg, n_iter=6))
        r = dec(ul_grid)
        if not bool(r["crc_ok"][0]):
            return None
        return np.packbits(np.asarray(r["bits"][0], np.uint8)).tobytes()

    def enb_pucch_ack_rx(self, ul_grid, n_pucch: int) -> bool | None:
        """→ True (ACK) / False (NACK) / None (DTX)."""
        pcfg = self.pucch_cfg(n_pucch)
        dec = self._fn(("pucch1a_dec", n_pucch), lambda pcfg=pcfg:
                       lambda g: pucch_mod.decode_format1(pcfg, g, 1,
                                                          noise_var=self.nv))
        r = dec(ul_grid)
        if not bool(r["detected"][0]):
            return None
        return int(np.asarray(r["bits"])[0, 0]) == 0  # bit 0 ⇔ ACK

    def enb_sr_rx(self, ul_grid, n_pucch_sr: int) -> bool:
        pcfg = self.pucch_cfg(n_pucch_sr)
        dec = self._fn(("sr_dec", n_pucch_sr), lambda pcfg=pcfg:
                       lambda g: pucch_mod.decode_format1(pcfg, g, 1,
                                                          noise_var=self.nv))
        return bool(dec(ul_grid)["detected"][0])

    def enb_cqi_rx(self, ul_grid, n_pucch_2: int, rnti: int) -> int:
        pcfg = self.pucch_cfg(n_pucch_2, rnti=rnti)
        dec = self._fn(("pucch2_dec", n_pucch_2, rnti), lambda pcfg=pcfg:
                       lambda g: pucch_mod.decode_format2(pcfg, g, 4))
        bits = np.asarray(dec(ul_grid)["bits"])[0]
        return int(bits.dot(1 << np.arange(3, -1, -1)))

    # -- PRACH ---------------------------------------------------------------------

    def prach(self, preamble_idx: int) -> int | None:
        """UE preamble TX → eNB detect; returns detected index or None."""
        jnp = self.jax.numpy

        def build():
            cfg = self.prach_cfg

            def f(pre_t, key):
                from srsran_4g_tpu.channel.awgn import awgn

                pre_t = pre_t / jnp.sqrt(jnp.mean(jnp.abs(pre_t) ** 2))
                rx = awgn(key, pre_t[None, :], self.nv)
                det = prach_mod.detect(cfg, rx)
                return det["detected"][0], det["power"][0]
            return f

        pre = prach_mod.generate(self.prach_cfg, preamble_idx)
        det, power = self._fn(("prach",), build)(pre, self.key())
        if not np.asarray(det).any():
            return None
        return int(np.asarray(power).argmax())
