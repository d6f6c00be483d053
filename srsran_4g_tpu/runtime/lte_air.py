"""LTE air interface: scheduler-driven subframes over the jitted TPU PHY.

This is the glue the reference implements in `srsenb/src/phy/lte/cc_worker.cc`
(encode_pdsch:596 + PDCCH put) and `srsue/src/phy/lte/cc_worker.cc`
(work_dl_regular:214 → decode_pdcch:259 → decode_pdsch:442, work_ul:600):
every grant travels over the air as a DCI on PDCCH, the UE blind-decodes
its search space every TTI, HARQ-ACK/SR/CQI ride PUCCH, and UL data rides
PUSCH — nothing is handed between the nodes out-of-band.

Each distinct (config, subframe)-shaped step is jitted once and cached;
subframe composition sums disjoint-RE grids (PDSCH allocations, PUCCH
resources, PUSCH allocations never overlap by scheduler construction).
Every method takes the real subframe index (tti % 10), so scrambling,
CRS phase and the PDCCH search-space Yk recursion are exercised at all
ten indices with a bounded (10-entry per config) jit cache; DL_SF/UL_SF
remain only as defaults for single-subframe harnesses.

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
from srsran_4g_tpu.models import phich as phich_mod
from srsran_4g_tpu.models import ra
from srsran_4g_tpu.ops.ofdm import OfdmConfig, demodulate, modulate
from srsran_4g_tpu.stack import enb_mac as enb_mac_mod
from srsran_4g_tpu.utils import constants as C

DL_SF = 4   # default DL subframe index for single-subframe harnesses
UL_SF = 3   # default UL subframe index for single-subframe harnesses


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
              min_l: int = 1, sf: int = DL_SF) -> tuple[int, int] | None:
        for l_agg, start in pdcch_mod.search_space_candidates(
                self.cell, self.cfi, rnti, sf):
            if l_agg < min_l:
                continue
            cces = set(range(start, start + l_agg))
            if not (cces & used):
                used |= cces
                return l_agg, start
        return None


def dci_to_pdsch_cfg(cell: G.CellConfig, rnti: int, d: dci_mod.Dci1A,
                     sf: int = DL_SF) -> pdsch_mod.PdschConfig:
    """Both sides derive the PDSCH parameters from the DCI alone
    (ra_dl.c: MCS→modulation/I_TBS→TBS)."""
    return pdsch_mod.PdschConfig(
        cell=cell, rnti=rnti, subframe=sf, mod=ra.dl_mcs_to_mod(d.mcs),
        tbs=ra.dl_tbs(d.mcs, d.l_crbs), rv=d.rv,
        prb_alloc=tuple(range(d.rb_start, d.rb_start + d.l_crbs)))


def _ul_cfg(cell: G.CellConfig, rnti: int, prb_start: int, prb_len: int,
            mcs: int, rv: int = 0, sf: int = UL_SF) -> pusch_mod.PuschConfig:
    return pusch_mod.PuschConfig(
        cell=cell, rnti=rnti, subframe=sf, mod=ra.ul_mcs_to_mod(mcs),
        tbs=ra.tbs_from_itbs(ra.ul_mcs_to_itbs(mcs), prb_len),
        prb_start=prb_start, nof_prb_alloc=prb_len, rv=rv)


class LteAirPhy:
    """The jitted sample-domain channel both nodes share."""

    def __init__(self, nof_prb: int, cell_id: int = 1, cfi: int | None = None,
                 snr_db: float = 20.0, seed: int = 7,
                 fading=None) -> None:
        """`fading`: optional channel.fading.FadingConfig — applied (with
        independent DL/UL realisations) between the nodes, as the
        reference's channel emulator hooks into its rx/tx paths
        (srsue/src/phy/sync.cc:88-90)."""
        import jax

        self.jax = jax
        self.fading = fading
        self.seed = seed
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
                                          np.ndarray, int, int, int]],
                  sf: int = DL_SF,
                  phich: list[tuple[int, int, int]] | None = None,
                  mib: tuple[np.ndarray, int] | None = None,
                  tti: int = 0):
        """items: (cfg, pdu, dci_bits, rnti, l_agg, cce_start) → samples.

        cfg None = DCI-only item (UL grant: PDCCH but no PDSCH).
        `sf` is the subframe index (tti % 10); at sf 0/5 the sync
        signals (PSS/SSS, and PBCH at sf 0) are added so a UE can
        acquire the cell over the air.  `phich`: (group, nseq, ack)
        UL-HARQ indications to carry (phich.c counterpart).
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
            from srsran_4g_tpu.models import pcfich as pcfich_mod

            cell, cfi = self.cell, self.cell.cfi

            def f(g):
                ref_cfg = pdsch_mod.PdschConfig(
                    cell=cell, rnti=0, subframe=sf, mod="qpsk", tbs=16)
                g = pdsch_mod.add_crs(ref_cfg, g)
                cfi_arr = jnp.full((g.shape[0],), cfi, jnp.int32)
                return pcfich_mod.put_into_grid(
                    cell, g, pcfich_mod.encode(cell, cfi_arr, sf))
            return f

        if grid is None:
            grid = jnp.zeros((1, self.cell.nsymb, self.cell.nre),
                             jnp.complex64)
        grid = self._fn(("overhead", sf), build_overhead)(grid)
        if sf in (0, 5):
            grid = self._fn(("sync", sf), self._build_sync(sf))(grid)
        if mib is not None and sf == 0:
            mib_bits, block = mib
            putb = self._fn(("pbch", block % 4), self._build_pbch(block % 4))
            grid = putb(grid, jnp.asarray(mib_bits[None]))
        for group, nseq, ack in (phich or []):
            put_ph = self._fn(
                ("phich", group, nseq, sf),
                lambda group=group, nseq=nseq: functools.partial(
                    self._phich_put, group=group, nseq=nseq, sf=sf))
            grid = put_ph(grid, jnp.asarray([ack], jnp.int8))

        for cfg, _, dci_bits, rnti, l_agg, cce_start in items:
            put = self._fn(
                ("dci_put", rnti, l_agg, cce_start, len(dci_bits), sf),
                lambda rnti=rnti, l_agg=l_agg, cce_start=cce_start:
                    functools.partial(pdcch_mod.put_dci, self.cell,
                                      self.cell.cfi, sf, rnti=rnti,
                                      l_agg=l_agg, cce_start=cce_start))
            grid = put(grid, dci_bits=jnp.asarray(dci_bits[None]))

        chan = self._fn(("chan_dl",), lambda: self._build_channel(0))
        return chan(grid, jnp.asarray(float(tti) * 1e-3), self.key())

    def _build_channel(self, link: int):
        """grid → (fading) → OFDM → AWGN → samples; `link` decorrelates
        the DL (0) and UL (1) fading realisations."""
        from srsran_4g_tpu.channel.awgn import awgn

        nv, cfg, fcfg = self.nv, self.ofdm, self.fading
        if fcfg is None:
            def f(grid, t0, key):
                return awgn(key, modulate(cfg, grid), nv)
            return f
        from srsran_4g_tpu.channel import fading as fad
        from srsran_4g_tpu.ops import ofdm as ofdm_ops

        jnp = self.jax.numpy
        n = cfg.symbol_sz
        # per-symbol start times (s) within the subframe
        offs = ofdm_ops._symbol_offsets(cfg) / (cfg.sf_len / 1e-3) * 1e-3
        bins = ofdm_ops._sc_to_bin(cfg).astype(np.int64)
        signed = np.where(bins >= n // 2, bins - n, bins)
        sc_f = (signed / n).astype(np.float32)
        seed = self.seed * 2 + link

        def f(grid, t0, key):
            h = fad.freq_response(fcfg, seed, t0 + jnp.asarray(offs,
                                                               jnp.float32),
                                  jnp.asarray(sc_f))
            return awgn(key, modulate(cfg, grid * h[None]), nv)
        return f

    def _build_sync(self, sf: int):
        """PSS/SSS into subframes 0/5 (enb_dl.put_sync_signals)."""
        from srsran_4g_tpu.models import enb_dl

        cell = self.cell

        def build():
            def f(g):
                return enb_dl.put_sync_signals(cell, g, sf)
            return f
        return build

    def _build_pbch(self, block: int):
        """PBCH segment `block` (sfn %% 4) into subframe 0 (pbch.c)."""
        from srsran_4g_tpu.models import pbch as pbch_mod

        cell = self.cell

        def build():
            def f(g, mib_bits):
                syms = pbch_mod.encode(cell, mib_bits)
                return pbch_mod.put_into_grid(cell, g, syms[:, block])
            return f
        return build

    def _phich_put(self, g, ack, group: int, nseq: int, sf: int):
        syms = phich_mod.encode(self.cell, ack, group, nseq, sf)
        return phich_mod.put_into_grid(self.cell, g, syms, group)

    # -- UE cell acquisition ---------------------------------------------------

    def ue_cell_search(self, samples) -> dict:
        """PSS/SSS blind search on one subframe of samples
        (srsue sync.cc FIND via ue_dl.cell_search).

        Returns dict(found, cell_id, phase (0: sf 0, 1: sf 5), peak)."""
        from srsran_4g_tpu.models import ue_dl as ue_dl_mod

        search = self._fn(("cell_search",), lambda: functools.partial(
            ue_dl_mod.cell_search, nof_prb=self.cell.nof_prb))
        out = search(samples)
        peak = float(np.asarray(out["pss_peak"])[0])
        return dict(found=peak > 0.5,
                    cell_id=int(np.asarray(out["cell_id"])[0]),
                    phase=int(np.asarray(out["phase"])[0]), peak=peak)

    def ue_mib_rx(self, samples, cell_id: int) -> dict | None:
        """PBCH decode from a subframe-0 sample buffer (ue_mib.c): the
        central 6 PRB of the full-band grid carry the PBCH; the 40 ms
        segment index (sfn %% 4) is blind-tried.  Returns
        dict(mib (24,), n_ports, block) or None."""
        demod = self._fn(("ofdm_demod",),
                         lambda: functools.partial(demodulate, self.ofdm))
        grid = demod(samples)
        mid = self.cell.nre // 2
        grid6 = grid[..., mid - 36:mid + 36]
        cell6 = G.CellConfig(nof_prb=6, cell_id=cell_id, cfi=self.cell.cfi)

        def build():
            from srsran_4g_tpu.models import pbch as pbch_mod

            def f(g6):
                est = chest_mod.estimate(
                    chest_mod.ChestConfig(cell=cell6), g6, 0)
                outs = []
                for blk in range(4):
                    r = pbch_mod.decode(cell6, g6, est["h"],
                                        est["noise_var"], frame_idx=blk)
                    outs.append((r["crc_ok"], r["mib"], r["n_ports"]))
                return outs
            return f

        outs = self._fn(("mib_rx", cell_id), build)(grid6)
        for blk, (ok, mib, ports) in enumerate(outs):
            if bool(np.asarray(ok)[0]):
                return dict(mib=np.asarray(mib)[0],
                            n_ports=int(np.asarray(ports)[0]), block=blk)
        return None

    # -- PHICH -----------------------------------------------------------------

    def ue_phich_rx(self, samples, group: int, nseq: int,
                    sf: int = DL_SF) -> bool:
        """Decode one PHICH: True = ACK, False = NACK
        (srsue cc_worker decode_phich)."""
        demod = self._fn(("ofdm_demod",),
                         lambda: functools.partial(demodulate, self.ofdm))
        grid = demod(samples)
        est = self._fn(("chest", sf), lambda: functools.partial(
            chest_mod.estimate, chest_mod.ChestConfig(cell=self.cell),
            subframe=sf))(grid)
        dec = self._fn(("phich_dec", group, nseq, sf), lambda:
                       functools.partial(phich_mod.decode, self.cell,
                                         group=group, nseq=nseq,
                                         subframe=sf))
        r = dec(grid, h=est["h"], noise_var=est["noise_var"])
        return bool(np.asarray(r["ack"])[0])

    # -- UE RX ----------------------------------------------------------------

    def ue_dl_rx_multi(self, samples, rnti: int, sf: int = DL_SF,
                       harq_bufs: dict | None = None) -> dict:
        """Blind-decode the UE's full search space for `rnti`.

        Returns dict(snr_db, hits=[{dci|ul_dci, cce_start, pdu?}, ...]).
        Every CRC-passing candidate is taken, smallest aggregation level
        first, skipping candidates whose CCEs overlap an accepted one
        (overlapping "echo" detections of the same DCI at a larger L).
        pdu None on a DL hit = PDSCH KO (CRC fail).

        `harq_bufs` is the UE's per-process soft-buffer store
        ({pid: {"ndi", "tbs", "bufs"}}): retransmissions of the same
        process (same NDI/TBS) chase-combine their LLRs before turbo
        decoding, as the reference's srsran_softbuffer_rx
        (ue_dl.c decode_tb softbuffer path).
        """
        demod = self._fn(("ofdm_demod",),
                         lambda: functools.partial(demodulate, self.ofdm))
        grid = demod(samples)
        est = self._fn(("chest", sf), lambda: functools.partial(
            chest_mod.estimate, chest_mod.ChestConfig(cell=self.cell),
            subframe=sf))(grid)
        h, nv, snr_db = est["h"], est["noise_var"], est["snr_db"]

        blind = self._fn(("blind", rnti, sf), lambda: functools.partial(
            pdcch_mod.blind_decode, self.cell, self.cell.cfi, sf,
            rnti=rnti, dci_len=self.dci_len))
        out = blind(grid, h=h, noise_var=nv)
        res = dict(snr_db=float(snr_db[0]), hits=[])
        ok = np.asarray(out["ok_per_candidate"][0])
        if not ok.any():
            return res
        cands = pdcch_mod.search_space_candidates(
            self.cell, self.cell.cfi, rnti, sf)
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
            cfg = dci_to_pdsch_cfg(self.cell, rnti, d, sf)
            sb = None
            if harq_bufs is not None:
                ent = harq_bufs.get(d.harq_pid)
                if (ent is not None and ent["ndi"] == d.ndi
                        and ent["tbs"] == cfg.tbs):
                    sb = ent["bufs"]
            dec = self._fn(("pdsch_dec", cfg, sb is not None),
                           lambda cfg=cfg:
                           functools.partial(pdsch_mod.decode, cfg, n_iter=6))
            r = (dec(grid, h=h, noise_var=nv) if sb is None
                 else dec(grid, h=h, noise_var=nv, softbuffers=sb))
            crc_ok = bool(r["crc_ok"][0])
            if harq_bufs is not None:
                harq_bufs[d.harq_pid] = dict(
                    ndi=d.ndi, tbs=cfg.tbs,
                    bufs=None if crc_ok else r.get("softbuffers"))
            pdu = (np.packbits(np.asarray(r["bits"][0], np.uint8)).tobytes()
                   if crc_ok else None)
            res["hits"].append(dict(dci=d, cce_start=start, pdu=pdu))
        return res

    # -- UE UL TX --------------------------------------------------------------

    def pucch_cfg(self, n_pucch: int, rnti: int = 0,
                  n_rb_2: int = 1, sf: int = UL_SF) -> pucch_mod.PucchConfig:
        return pucch_mod.PucchConfig(cell=self.cell, subframe=sf,
                                     n_pucch=n_pucch, n_rb_2=n_rb_2,
                                     rnti=rnti)

    def ue_ul_tx(self, pusch: tuple[pusch_mod.PuschConfig, bytes] | None,
                 ack: tuple[int, int] | None = None,
                 sr: int | None = None,
                 cqi: tuple[int, int, int] | None = None,
                 sf: int = UL_SF):
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
            pcfg = self.pucch_cfg(n_pucch, sf=sf)
            enc = self._fn(("pucch1a_enc", n_pucch, sf), lambda pcfg=pcfg:
                           lambda bits: pucch_mod.encode_format1(pcfg, bits))
            g = enc(jnp.asarray([[bit]], jnp.int8))
            grid = g if grid is None else grid + g
        if sr is not None:
            pcfg = self.pucch_cfg(sr, sf=sf)
            g = pucch_mod.encode_format1(pcfg, None)
            grid = g if grid is None else grid + g
        if cqi is not None:
            n2, rnti, val = cqi
            pcfg = self.pucch_cfg(n2, rnti=rnti, sf=sf)
            enc = self._fn(("pucch2_enc", n2, rnti, sf), lambda pcfg=pcfg:
                           lambda bits: pucch_mod.encode_format2(pcfg, bits))
            bits = ((val >> np.arange(3, -1, -1)) & 1).astype(np.int8)
            g = enc(jnp.asarray(bits[None]))
            grid = g if grid is None else grid + g
        return grid

    def combine_ul(self, grids: list, tti: int = 0):
        """Sum per-UE UL grids and push through the channel → eNB samples."""
        jnp = self.jax.numpy
        total = None
        for g in grids:
            if g is not None:
                total = g if total is None else total + g
        if total is None:
            total = jnp.zeros((1, self.cell.nsymb, self.cell.nre),
                              jnp.complex64)
        chan = self._fn(("chan_ul",), lambda: self._build_channel(1))
        return chan(total, jnp.asarray(float(tti) * 1e-3), self.key())

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

    def enb_pucch_ack_rx(self, ul_grid, n_pucch: int,
                         sf: int = UL_SF) -> bool | None:
        """→ True (ACK) / False (NACK) / None (DTX)."""
        pcfg = self.pucch_cfg(n_pucch, sf=sf)
        dec = self._fn(("pucch1a_dec", n_pucch, sf), lambda pcfg=pcfg:
                       lambda g: pucch_mod.decode_format1(pcfg, g, 1,
                                                          noise_var=self.nv))
        r = dec(ul_grid)
        if not bool(r["detected"][0]):
            return None
        return int(np.asarray(r["bits"])[0, 0]) == 0  # bit 0 ⇔ ACK

    def enb_sr_rx(self, ul_grid, n_pucch_sr: int, sf: int = UL_SF) -> bool:
        pcfg = self.pucch_cfg(n_pucch_sr, sf=sf)
        dec = self._fn(("sr_dec", n_pucch_sr, sf), lambda pcfg=pcfg:
                       lambda g: pucch_mod.decode_format1(pcfg, g, 1,
                                                          noise_var=self.nv))
        return bool(dec(ul_grid)["detected"][0])

    def enb_cqi_rx(self, ul_grid, n_pucch_2: int, rnti: int,
                   sf: int = UL_SF) -> int:
        pcfg = self.pucch_cfg(n_pucch_2, rnti=rnti, sf=sf)
        dec = self._fn(("pucch2_dec", n_pucch_2, rnti, sf), lambda pcfg=pcfg:
                       lambda g: pucch_mod.decode_format2(pcfg, g, 4))
        bits = np.asarray(dec(ul_grid)["bits"])[0]
        return int(bits.dot(1 << np.arange(3, -1, -1)))

    # -- PRACH ---------------------------------------------------------------------

    def prach_tx_samples(self, preamble_idx: int) -> np.ndarray:
        """UE-side PRACH for the sample-stream (multi-process) deployment:
        normalised noisy preamble padded to one subframe of samples
        (the three-process analog of `prach`; prach.c preamble gen)."""
        jnp = self.jax.numpy

        def build():
            def f(pre_t, key):
                from srsran_4g_tpu.channel.awgn import awgn

                pre_t = pre_t / jnp.sqrt(jnp.mean(jnp.abs(pre_t) ** 2))
                return awgn(key, pre_t[None, :], self.nv)
            return f

        pre = prach_mod.generate(self.prach_cfg, preamble_idx)
        noisy = np.asarray(self._fn(("prach_tx", pre.shape[0]), build)(
            pre, self.key()))
        out = np.zeros((1, self.ofdm.sf_len), np.complex64)
        n = min(noisy.shape[1], self.ofdm.sf_len)
        out[:, :n] = noisy[:, :n]
        return out

    def prach_rx(self, samples) -> int | None:
        """eNB-side PRACH correlation on one UL subframe of samples
        (prach_worker.cc FFT correlation off the fast path)."""
        cfg = self.prach_cfg
        n_pre = cfg.cp_len + cfg.seq_len_samples

        def build():
            def f(rx):
                det = prach_mod.detect(cfg, rx)
                return det["detected"][0], det["power"][0]
            return f

        sl = np.asarray(samples)[:, :n_pre]
        # energy gate: an idle (zero/PUCCH-only) subframe must not reach
        # the correlator with pathological normalisation
        if float(np.mean(np.abs(sl) ** 2)) < 1e-6:
            return None
        det, power = self._fn(("prach_det",), build)(self.jax.numpy.asarray(sl))
        if not np.asarray(det).any():
            return None
        return int(np.asarray(power).argmax())

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
