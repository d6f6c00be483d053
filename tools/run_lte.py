"""Full-system E2E: multi-UE <-> eNB over the TPU PHY with OTA control.

The framework's counterpart of the reference's system test
`test/run_lte.sh` (srsEPC + srsENB + srsUE over ZMQ RF + netns).  Unlike
round 1, EVERY grant now travels over the air exactly as in the
reference's `srsenb/src/stack/mac/mac.cc:639` → `srsue/src/phy/lte/
cc_worker.cc:259-301` contract:

  eNB MAC scheduler → DCI 1A/0 pack → PDCCH encode (CCE allocation) →
  OFDM → AWGN → UE blind decode over its search space → PDSCH/PUSCH at
  the granted allocation → HARQ-ACK on PUCCH format 1a at n_pucch =
  first CCE → scheduler dl_ack_info; SR on PUCCH format 1 requests UL
  grants; wideband CQI on PUCCH format 2 drives the scheduler's MCS.

Pass criteria mirror run_lte.sh:82-160: every UE attaches, exactly one
PRACH per UE, zero unrecovered PDSCH/PUSCH KO, 0% ping loss, and all
CQI reports at the target (15 at the default SNR).

Usage: python tools/run_lte.py [--ttis 400] [--pings 3] [--snr 30]
                               [--prb 6] [--ues 2]
"""

from __future__ import annotations

import argparse
import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class UeNode:
    """One UE: MAC + RRC/NAS + RLC bearers + PUCCH resources."""

    def __init__(self, idx: int, air, stats: dict, log) -> None:
        from srsran_4g_tpu.stack.nas_ue import NasUe
        from srsran_4g_tpu.stack.rlc_am import RlcAm
        from srsran_4g_tpu.stack.rlc_um import RlcTm
        from srsran_4g_tpu.stack.rrc_ue import RrcUe
        from srsran_4g_tpu.stack.ue_mac import LogicalChannel, UeMac
        from srsran_4g_tpu.stack.usim import Usim, UsimConfig

        self.idx = idx
        self.air = air
        self.stats = stats
        self.log = log
        base = UsimConfig()
        imsi = str(int(base.imsi) + idx).zfill(len(base.imsi))
        self.ucfg = replace(base, imsi=imsi)
        self.nas = NasUe(Usim(self.ucfg))
        self.mac = UeMac(contention_id=bytes([0x42] * 5 + [0x40 + idx]))
        import random
        self.mac.ra.rng = random.Random(1000 + idx)  # per-UE preamble draw
        self.rlc = {0: RlcTm(), 1: RlcAm(), 3: RlcAm()}
        self.rrc = RrcUe(nas=self.nas)
        self.rrc.tx = lambda lcid, pdu: self.rlc[lcid].write_sdu(pdu)
        self.crnti = 0
        self.ra_rnti = 0
        # over-the-air acquisition state (srsue sync.cc FSM analog):
        # search (PSS/SSS) -> mib (PBCH) -> camped
        self.sync_state = "search"
        self.acq_pci = -1
        self.sf_off = 0          # tti of the last detected subframe 0
        self.acq_sfn = -1
        self.phich_watch: list[tuple[int, int, int]] = []  # (tti, grp, seq)
        self.last_pusch: dict[int, tuple] = {}   # pid -> (cfg, pdu, rv)
        self.dl_softbufs: dict = {}     # HARQ chase-combining buffers
        from srsran_4g_tpu.stack.ue_mac import DlHarqEntity
        self.scell_harq = DlHarqEntity()   # per-carrier DL HARQ entity
        self.prach_sent = False
        self.last_snr = 0.0
        self.cqi_sent: list[int] = []
        self.pending_ack: list[tuple[int, int, int]] = []   # (tti, n_pucch, bit)
        self.pending_pusch: list[tuple[int, object, bytes]] = []  # (tti, cfg, pdu)
        self.sr_count = 0
        n_cce = air.cch.n_cce
        self.n_pucch_sr = n_cce + 2 + idx
        self.n_pucch_2 = idx

        self.mac.demux.add_rlc(0, self.rrc.rx_ccch)
        for lc in (1, 3):
            self.mac.demux.add_rlc(lc, self._mk_sink(lc))
        for lcid, prio in ((0, 0), (1, 1), (3, 3)):
            self.mac.mux.setup_lcid(self._mk_chan(lcid, prio, LogicalChannel))

    def _mk_sink(self, lc):
        def sink(p):
            ent = self.rlc[lc]
            ent.write_pdu(p)
            q = getattr(ent, "delivered", None)
            if q is None:
                q = getattr(ent, "rx_sdus", [])
            sdus, q[:] = list(q), []
            for sdu in sdus:
                if lc in (1, 2):
                    self.rrc.rx_dcch(lc, sdu)
                else:
                    for ip_pkt in self.rrc.rx_drb_pdu(lc, sdu):
                        self.stats["dl_ping_rx"] += 1
                        self.rrc.write_drb_sdu(lc, b"echo:" + ip_pkt[-8:])
        return sink

    def _mk_chan(self, lcid, prio, LogicalChannel):
        ent = self.rlc[lcid]
        return LogicalChannel(
            lcid=lcid, priority=prio,
            has_data=lambda e=ent: (200 if e.has_data() else 0),
            read_pdu=lambda n, e=ent: e.read_pdu(n))

    def has_ul_data(self) -> bool:
        return any(c.has_data() > 0 for c in self.mac.mux.channels)

    # -- DL reception ------------------------------------------------------

    def handle_rar(self, tti: int, pdu: bytes) -> None:
        from srsran_4g_tpu.stack import mac_pdu
        from srsran_4g_tpu.stack.enb_mac import (MSG3_DELAY,
                                                 unpack_rar_ul_grant)

        backoff, grants = mac_pdu.unpack_rar(pdu)
        for g in grants:
            if self.mac.ra.rar_received(g, backoff):
                self.crnti = g.temp_crnti
                st, ln, mcs, tbs = unpack_rar_ul_grant(
                    self.air.cell.nof_prb, g.ul_grant)
                self._queue_pusch(tti + MSG3_DELAY, st, ln, mcs, tbs,
                                  pid=(tti + MSG3_DELAY) % 8, ndi=False,
                                  is_rar=True)

    def _queue_pusch(self, due: int, prb_start: int, prb_len: int, mcs: int,
                     tbs: int, pid: int, ndi: bool, is_rar: bool) -> None:
        from srsran_4g_tpu.runtime.lte_air import _ul_cfg
        from srsran_4g_tpu.stack.ue_mac import UlMacGrant

        g = UlMacGrant(rnti=self.crnti, pid=pid, tbs=tbs // 8, ndi=ndi,
                       is_rar=is_rar)
        out = self.mac.new_grant_ul(g)
        if out["pdu"]:
            if is_rar:
                # 36.321 §5.1.5: the contention-resolution identity is the
                # first 48 bits of the transmitted msg3 CCCH SDU
                from srsran_4g_tpu.stack import mac_pdu
                up = mac_pdu.unpack(out["pdu"], ul=True)
                for sub in up.subpdus:
                    if sub.is_sdu and sub.lcid == 0:
                        self.mac.ra.ue_contention_id = \
                            sub.payload[:6].ljust(6, b"\0")
                        break
            cfg = _ul_cfg(self.air.cell, self.crnti, prb_start, prb_len,
                          mcs, sf=due % 10)
            self.pending_pusch.append((due, cfg, out["pdu"]))
            self.last_pusch[pid] = (cfg, out["pdu"], 0)
            from srsran_4g_tpu.models.phich import phich_alloc
            grp, seq = phich_alloc(self.air.cell.nof_prb, prb_start)
            self.phich_watch.append((due + 4, grp, seq))

    def handle_dl_dci(self, tti: int, d, cce_start: int,
                      pdu: bytes | None, cc: int = 0) -> None:
        from srsran_4g_tpu.stack.ue_mac import DlMacGrant

        tbs_bytes = len(pdu) if pdu else 0
        g = DlMacGrant(rnti=self.crnti, pid=d.harq_pid,
                       tbs=tbs_bytes, ndi=bool(d.ndi), tti=tti)
        if cc == 0:
            self.mac.new_grant_dl(g)
        else:
            self.scell_harq.new_grant(g)
        ok = pdu is not None
        if ok:
            if cc == 0:
                self.mac.tb_decoded(g, pdu)
            elif self.scell_harq.tb_decoded(g.pid, True):
                # one MAC entity, many carriers: SCell TBs feed the same
                # demux (36.321: HARQ entity per serving cell, common demux)
                self.mac.demux.push_pdu(pdu)
                self.mac.metrics["dl_ok"] += 1
        else:
            self.stats["pdsch_ko"] += 1
        # HARQ-ACK on the PCell PUCCH: n_pucch = first CCE (+ an offset
        # region for the SCell, the framework's channel-selection analog)
        n_pucch = cce_start if cc == 0 else self.air.cch.n_cce + 4 + cce_start
        self.pending_ack.append((tti + 4, n_pucch, 0 if ok else 1, cc,
                                 d.harq_pid))

    def handle_ul_dci(self, tti: int, d) -> None:
        from srsran_4g_tpu.models import ra

        tbs = ra.tbs_from_itbs(ra.ul_mcs_to_itbs(d.mcs), d.l_crbs)
        self._queue_pusch(tti + 4, d.rb_start, d.l_crbs, d.mcs, tbs,
                          pid=(tti + 4) % 8, ndi=bool(d.ndi), is_rar=False)

    # -- UL composition ------------------------------------------------------

    def ul_grid(self, tti: int, cqi_due: bool):
        from dataclasses import replace as dc_replace

        pusch = None
        due = [p for p in self.pending_pusch if p[0] <= tti]
        self.pending_pusch = [p for p in self.pending_pusch if p[0] > tti]
        if due:
            _, cfg, pdu = due[0]
            if cfg.subframe != tti % 10:     # slipped past its due TTI
                cfg = dc_replace(cfg, subframe=tti % 10)
            pusch = (cfg, pdu)
            self.stats["pusch_tx"] += 1
        acks = [a for a in self.pending_ack if a[0] <= tti]
        self.pending_ack = [a for a in self.pending_ack if a[0] > tti]
        ack = None
        ack2 = None
        if acks:
            _, n_pucch, bit = acks[0][:3]
            ack = (n_pucch, bit)
            if len(acks) > 1:                 # second carrier's ACK
                ack2 = (acks[1][1], acks[1][2])
        sr = None
        if (pusch is None and self.mac.ra.is_complete()
                and self.has_ul_data() and not self.pending_pusch):
            sr = self.n_pucch_sr
            self.sr_count += 1
        cqi = None
        if cqi_due and self.mac.ra.is_complete() and self.last_snr > 0:
            from srsran_4g_tpu.models.cqi import cqi_from_snr

            val = int(cqi_from_snr(self.last_snr))
            self.cqi_sent.append(val)
            cqi = (self.n_pucch_2, self.crnti, val)
        if pusch is None and ack is None and sr is None and cqi is None:
            return None
        sf = tti % 10
        g = self.air.ue_ul_tx(pusch, ack=ack, sr=sr, cqi=cqi, sf=sf)
        if ack2 is not None:
            g2 = self.air.ue_ul_tx(None, ack=ack2, sf=sf)
            g = g2 if g is None else g + g2
        return g


def run(n_ttis: int, n_pings: int, snr_db: float, nof_prb: int = 6,
        n_ues: int = 1, n_cc: int = 1, burst_bytes: int = 0,
        fading_profile: str | None = None, doppler_hz: float = 5.0,
        verbose: bool = False):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from srsran_4g_tpu.models import dci as dci_mod
    from srsran_4g_tpu.models import pdcch as pdcch_mod
    from srsran_4g_tpu.runtime.lte_air import (DL_SF, LteAirPhy,
                                               dci_to_pdsch_cfg)
    from srsran_4g_tpu.stack.enb_mac import EnbMac
    from srsran_4g_tpu.stack.epc import Hss, Mme
    from srsran_4g_tpu.stack.rrc_enb import EnbCellConfig, RrcEnb

    stats = {"prach": 0, "pdsch_ko": 0, "pusch_ko": 0, "pdsch_tx": 0,
             "pusch_tx": 0, "dl_ping_rx": 0, "ul_ping_rx": 0,
             "dci_tx": 0, "dci_missed": 0, "phich_ack": 0,
             "phich_nack": 0}
    log = (lambda *a: print(*a, flush=True)) if verbose else (lambda *a: None)

    fading = None
    if fading_profile:
        from srsran_4g_tpu.channel.fading import FadingConfig
        from srsran_4g_tpu.utils import constants as C

        fading = FadingConfig(fading_profile, doppler_hz,
                              C.symbol_sz(nof_prb) * 15e3)
    air = LteAirPhy(nof_prb=nof_prb, snr_db=snr_db, fading=fading)
    # carrier aggregation: a second carrier with its own cell id/PHY
    air_s = (LteAirPhy(nof_prb=nof_prb, cell_id=2, snr_db=snr_db, seed=11)
             if n_cc == 2 else None)

    # ----- EPC
    hss = Hss()
    mme = Mme(hss=hss)

    # ----- UEs
    ues = [UeNode(i, air, stats, log) for i in range(n_ues)]
    for ue in ues:
        hss.add_subscriber(ue.ucfg.imsi, ue.ucfg.k, ue.ucfg.opc)

    # ----- eNB: MAC entity + RRC + S1
    enb_mac = EnbMac(nof_prb=nof_prb)
    enb_mac.ul_sched.edge_guard = 2   # PUCCH format-2 + format-1 regions
    if n_cc == 2:
        enb_mac.enable_scell(nof_prb)
    enb_rrc = RrcEnb(cell=EnbCellConfig(nof_prb=nof_prb))
    # BCCH broadcast: MIB + SIB1 + SIB2 over SI-RNTI PDSCH (sched_si)
    enb_mac.set_si([
        bytes([0]) + enb_rrc.gen_mib().pack(),
        bytes([1]) + enb_rrc.gen_sib1().pack(),
        bytes([2]) + enb_rrc.gen_sib2().pack(),
    ])
    enb_rrc.tx_rrc = enb_mac.write_dl_sdu
    enb_rrc.tx_s1ap = lambda pdu: [enb_rrc.rx_s1ap(r) for r in mme.rx_s1ap(pdu)]
    enb_mac.rx_ccch = enb_rrc.rx_ccch
    enb_mac.rx_dcch = enb_rrc.rx_dcch

    def enb_rx_drb(rnti: int, lcid: int, sdu: bytes) -> None:
        for pkt in enb_rrc.drb_rx(rnti, lcid, sdu):
            ue_ctx = enb_rrc.ues.get(rnti)
            if ue_ctx is None:
                continue
            erab = ue_ctx.erab_by_lcid.get(lcid)
            teid = ue_ctx.spgw_teids.get(erab)
            if teid is not None:
                mme.spgw.rx_s1u(teid, pkt)

    enb_mac.rx_drb = enb_rx_drb
    mme.spgw.sgi_tx = lambda pkt: stats.__setitem__(
        "ul_ping_rx", stats["ul_ping_rx"] + 1)

    def spgw_dl(teid: int, pkt: bytes) -> None:
        for rnti, ue_ctx in enb_rrc.ues.items():
            for erab, t in ue_ctx.erab_teids.items():
                if t == teid:
                    lcids = [lc for lc, e in ue_ctx.erab_by_lcid.items()
                             if e == erab]
                    lcid = lcids[0] if lcids else 3
                    enb_mac.write_dl_sdu(rnti, lcid,
                                         enb_rrc.drb_tx(rnti, lcid, pkt))
                    return

    mme.spgw.s1u_tx = spgw_dl

    # eNB-side PUCCH expectations
    ack_watch: list[tuple[int, int, int, int]] = []  # (tti, rnti, pid, n_pucch)
    pusch_watch: list[tuple[int, object, object]] = []  # (tti, grant, cfg)
    phich_pending: list[tuple[int, int, int, int]] = []  # (tti, grp, seq, ack)

    pings_sent = {ue.idx: 0 for ue in ues}
    attach_tti: dict[int, int] = {}

    for tti in range(n_ttis):
        for ue in ues:
            ue.mac.tick(1)
            ue.rrc.tick(1)
            for ent in ue.rlc.values():
                if hasattr(ent, "tick"):
                    ent.tick(1)
        enb_mac.tick(1)

        # 1. PRACH (once per UE, as in run_lte.sh's "exactly 1 PRACH");
        # the UE must first acquire the cell over the air (PSS/SSS sync +
        # PBCH MIB, sync.cc:684-709 FSM) then SI over BCCH before the
        # connection_request_proc
        for ue in ues:
            idle = ue.rrc.idle
            pci = ue.acq_pci          # known only after OTA acquisition
            if (not ue.prach_sent and pci >= 0 and idle.si_acquired(pci)
                    and idle.serving_pci is None):
                idle.select_cell()
            # one PRACH occasion per UE index (staggered RA subframes)
            if (not ue.prach_sent and pci >= 0 and idle.serving_pci == pci
                    and tti % 10 == (2 * ue.idx + 2) % 10):
                ue.rrc.connect()
                idx = ue.mac.ra.start(ue.mac.contention_id)
                det = air.prach(idx)
                ue.prach_sent = True
                ue.ra_rnti = 1 + tti % 10
                if det is not None:
                    stats["prach"] += 1
                    enb_mac.rach_detected(tti, det)
                    log(f"tti {tti}: PRACH ue{ue.idx} idx={det}")

        # 2. eNB scheduling: DL items + UL DCIs for this TTI's PDCCH
        from srsran_4g_tpu.runtime.lte_air import _ul_cfg

        sf = tti % 10
        dl_items = enb_mac.get_dl_sched(tti)
        ul_items = enb_mac.get_ul_sched(tti)
        used_cces: set[int] = set()
        tx_list = []
        for it in dl_items:
            bits = dci_mod.pack_1a(it.dci, nof_prb)
            alloc = air.cch.alloc(it.grant.rnti, used_cces,
                                  min_l=4 if it.is_rar else 1, sf=sf)
            if alloc is None:
                continue
            l_agg, cce_start = alloc
            cfg = dci_to_pdsch_cfg(air.cell, it.grant.rnti, it.dci, sf)
            tx_list.append((cfg, it.pdu, bits, it.grant.rnti, l_agg,
                            cce_start))
            stats["pdsch_tx"] += 1
            stats["dci_tx"] += 1
            if not it.is_rar:
                ack_watch.append((tti + 4, it.grant.rnti,
                                  it.grant.harq_pid, cce_start, 0))
        for it in ul_items:
            g = it.grant
            cfg = _ul_cfg(air.cell, g.rnti, g.prb_start, g.prb_len, g.mcs,
                          rv=g.rv, sf=(tti + 4) % 10)
            if it.is_msg3:
                pusch_watch.append((tti, g, cfg))
                continue
            bits = dci_mod.pack_0(it.dci, nof_prb)
            alloc = air.cch.alloc(g.rnti, used_cces, sf=sf)
            if alloc is None:
                continue
            l_agg, cce_start = alloc
            tx_list.append((None, None, bits, g.rnti, l_agg, cce_start))
            stats["dci_tx"] += 1
            pusch_watch.append((tti + 4, g, cfg))

        # 3. DL over the air: the eNB transmits EVERY subframe (CRS +
        # PCFICH always; PSS/SSS at sf 0/5, PBCH at sf 0, PHICH for
        # pending UL HARQ feedback) so UEs can acquire and track OTA
        due_ph = [p for p in phich_pending if p[0] == tti]
        phich_pending[:] = [p for p in phich_pending if p[0] != tti]
        mib = None
        if sf == 0:
            sfn = tti // 10
            mib_bytes = enb_rrc.gen_mib(sfn).pack()
            mib = (np.unpackbits(np.frombuffer(mib_bytes, np.uint8))[:24]
                   .astype(np.int8), sfn % 4)
        dl_samples = air.enb_dl_tx(tx_list, sf=sf,
                                   phich=[p[1:] for p in due_ph], mib=mib,
                                   tti=tti)

        # 3b. SCell DL (data-only; CaScheduler shared-buffer draining)
        scell_samples = None
        if air_s is not None:
            s_items = enb_mac.get_dl_sched_scell(tti)
            s_tx = []
            s_used: set[int] = set()
            for it in s_items:
                bits = dci_mod.pack_1a(it.dci, nof_prb)
                alloc = air_s.cch.alloc(it.grant.rnti, s_used, sf=sf)
                if alloc is None:
                    continue
                l_agg, cce_start = alloc
                cfg = dci_to_pdsch_cfg(air_s.cell, it.grant.rnti, it.dci, sf)
                s_tx.append((cfg, it.pdu, bits, it.grant.rnti, l_agg,
                             cce_start))
                stats["pdsch_tx"] += 1
                stats["dci_tx"] += 1
                ack_watch.append((tti + 4, it.grant.rnti,
                                  it.grant.harq_pid,
                                  air.cch.n_cce + 4 + cce_start, 1))
            if s_tx:
                scell_samples = air_s.enb_dl_tx(s_tx, sf=sf)

        # 4. UE DL reception.  Each UE first acquires the cell over the
        # air: PSS/SSS search -> PBCH MIB (+ sfn/subframe alignment) ->
        # camped; only then does it blind-decode PDCCH each TTI using
        # its OWN tracked subframe index.
        if dl_samples is not None:
            from srsran_4g_tpu.stack.enb_mac import SI_RNTI
            from srsran_4g_tpu.stack.rrc_msgs import Mib

            for ue in ues:
                if ue.sync_state == "search":
                    found = air.ue_cell_search(dl_samples)
                    if found["found"]:
                        ue.acq_pci = found["cell_id"]
                        # PSS marks sf 0 (phase 0) or sf 5 (phase 1)
                        ue.sf_off = (tti - 5 * found["phase"]) % 10
                        ue.sync_state = "mib"
                        log(f"tti {tti}: ue{ue.idx} SYNC pci="
                            f"{ue.acq_pci} phase={found['phase']}")
                    continue
                ue_sf = (tti - ue.sf_off) % 10
                if ue.sync_state == "mib":
                    if ue_sf != 0:
                        continue
                    r = air.ue_mib_rx(dl_samples, ue.acq_pci)
                    if r is not None:
                        m = Mib.unpack(np.packbits(
                            r["mib"].astype(np.uint8)).tobytes())
                        assert m.dl_bandwidth == nof_prb
                        ue.acq_sfn = m.sfn + r["block"]
                        ue.sync_state = "camped"
                        log(f"tti {tti}: ue{ue.idx} MIB ok bw="
                            f"{m.dl_bandwidth} sfn={ue.acq_sfn}")
                    continue
                pci = ue.acq_pci
                # PHICH for PUSCHs sent 4 TTIs ago (cc_worker decode_phich)
                ph_due = [w for w in ue.phich_watch if w[0] == tti]
                ue.phich_watch = [w for w in ue.phich_watch if w[0] > tti]
                for _, grp, seq in ph_due:
                    if air.ue_phich_rx(dl_samples, grp, seq, sf=ue_sf):
                        stats["phich_ack"] += 1
                    else:
                        stats["phich_nack"] += 1
                watch = []
                if not ue.rrc.idle.si_acquired(pci):
                    watch.append(SI_RNTI)
                if ue.mac.ra.state == ue.mac.ra.MSG3_SENT or ue.crnti:
                    watch.append(ue.crnti)
                if ue.mac.ra.state == ue.mac.ra.RAR_WAIT:
                    watch.append(ue.ra_rnti)
                for rnti in [r for r in watch if r]:
                    rx = air.ue_dl_rx_multi(
                        dl_samples, rnti, sf=ue_sf,
                        harq_bufs=(ue.dl_softbufs if rnti == ue.crnti
                                   else None))
                    ue.last_snr = rx["snr_db"]
                    for hit in rx["hits"]:
                        if rnti == SI_RNTI and hit.get("pdu") is not None:
                            ue.rrc.rx_bcch(hit["pdu"], pci)
                            ue.rrc.idle.report_cell(
                                pci, -100.0 + rx["snr_db"])
                        elif rnti == ue.ra_rnti and hit.get("pdu") is not None:
                            ue.handle_rar(tti, hit["pdu"])
                        elif "ul_dci" in hit:
                            ue.handle_ul_dci(tti, hit["ul_dci"])
                        elif rnti == ue.crnti:
                            ue.handle_dl_dci(tti, hit["dci"],
                                             hit["cce_start"],
                                             hit.get("pdu"))
        if scell_samples is not None:
            for ue in ues:
                if 1 not in ue.mac.demux.active_scells or not ue.crnti:
                    continue
                rx = air_s.ue_dl_rx_multi(scell_samples, ue.crnti, sf=sf)
                for hit in rx["hits"]:
                    if "dci" in hit:
                        ue.handle_dl_dci(tti, hit["dci"], hit["cce_start"],
                                         hit.get("pdu"), cc=1)

        # 5. UL over the air
        cqi_due = (tti % 20) == 5
        grids = [ue.ul_grid(tti, cqi_due) for ue in ues]
        if any(g is not None for g in grids) or pusch_watch or ack_watch:
            from dataclasses import replace as dc_replace

            ul_samples = air.combine_ul(grids, tti=tti)
            ul_grid = air.enb_ul_grid(ul_samples)
            # PUSCH; each decode also produces a PHICH ACK/NACK on the
            # DL 4 TTIs later (phich.c; srsenb cc_worker encode_phich)
            from srsran_4g_tpu.models.phich import phich_alloc

            due = [w for w in pusch_watch if w[0] <= tti]
            pusch_watch = [w for w in pusch_watch if w[0] > tti]
            for _, g, cfg in due:
                if cfg.subframe != sf:
                    cfg = dc_replace(cfg, subframe=sf)
                pdu = air.enb_pusch_rx(ul_grid, cfg)
                enb_mac.crc_info(tti, g.rnti, g.harq_pid, pdu is not None)
                grp, seq = phich_alloc(nof_prb, g.prb_start)
                phich_pending.append((tti + 4, grp, seq,
                                      1 if pdu is not None else 0))
                if pdu is None:
                    stats["pusch_ko"] += 1
                else:
                    enb_mac.push_pdu(g.rnti, pdu)
            # HARQ-ACK
            acks = [w for w in ack_watch if w[0] <= tti]
            ack_watch = [w for w in ack_watch if w[0] > tti]
            for _, rnti, pid, n_pucch, cc in acks:
                r = air.enb_pucch_ack_rx(ul_grid, n_pucch, sf=sf)
                enb_mac.dl_ack_info(rnti, pid, bool(r), cc=cc)
            # SR + CQI
            for ue in ues:
                if not ue.crnti:
                    continue
                if air.enb_sr_rx(ul_grid, ue.n_pucch_sr, sf=sf):
                    enb_mac.ul_bsr(ue.crnti, 128)
                if cqi_due:
                    cqi = air.enb_cqi_rx(ul_grid, ue.n_pucch_2, ue.crnti,
                                         sf=sf)
                    enb_mac.dl_cqi_info(ue.crnti, cqi)
                    if air_s is not None and cqi >= 13:
                        # good-CQI trigger: activate the SCell (36.321 CE)
                        enb_mac.scell_activate(ue.crnti)
                        enb_mac.scell_sched.dl_cqi_info(ue.crnti, cqi)

        # 6. ping trains once attached
        for ue in ues:
            if ue.nas.is_registered() and ue.idx not in attach_tti:
                attach_tti[ue.idx] = tti
                log(f"tti {tti}: ue{ue.idx} ATTACHED ip="
                    f"{'.'.join(str(b) for b in ue.nas.ip_addr)}")
            if (burst_bytes and ue.idx == 0 and ue.idx in attach_tti
                    and tti == attach_tti[ue.idx] + 30):
                # one large DL burst after the SCell is active: exceeds
                # the PCell's per-TTI capacity so the SCell carries part
                sess = mme.spgw.sessions[ue.ucfg.imsi]
                mme.spgw.rx_sgi(bytes(16) + sess.ue_ip + bytes(burst_bytes))
            if (ue.idx in attach_tti and pings_sent[ue.idx] < n_pings
                    and tti > attach_tti[ue.idx] + 2
                    and (tti - attach_tti[ue.idx]) % 12 == 0):
                sess = mme.spgw.sessions[ue.ucfg.imsi]
                pkt = (bytes(16) + sess.ue_ip
                       + f"ping{ue.idx}{pings_sent[ue.idx]:03d}".encode())
                mme.spgw.rx_sgi(pkt)
                pings_sent[ue.idx] += 1

    stats["scell_tx"] = enb_mac.metrics["scell_tx"]
    stats["dl_retx"] = enb_mac.metrics["dl_retx"]
    total_pings = n_pings * len(ues) + (1 if burst_bytes else 0)
    impaired = fading_profile is not None or snr_db < 25
    all_cqi_target = all(
        c >= 13 for ue in ues for c in ue.cqi_sent[1:]) \
        if not impaired else True
    ok = (all(ue.nas.is_registered() for ue in ues)
          and stats["prach"] == len(ues)
          and stats["dl_ping_rx"] == total_pings
          and stats["ul_ping_rx"] >= total_pings
          and all_cqi_target)
    if impaired:
        # HARQ-under-fire: losses must occur AND be recovered
        # (attach + 0% ping loss above, retransmissions observed)
        ok = ok and (stats["pdsch_ko"] + stats["pusch_ko"]) > 0 \
            and stats["dl_retx"] > 0
    else:
        ok = ok and stats["pdsch_ko"] == 0 and stats["pusch_ko"] == 0
    return ok, stats, ues, mme


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ttis", type=int, default=400)
    ap.add_argument("--pings", type=int, default=3)
    ap.add_argument("--snr", type=float, default=30.0)
    ap.add_argument("--prb", type=int, default=6)
    ap.add_argument("--ues", type=int, default=2)
    ap.add_argument("--cc", type=int, default=1, choices=(1, 2))
    ap.add_argument("--burst", type=int, default=0)
    ap.add_argument("--fading", choices=("epa", "eva", "etu"), default=None)
    ap.add_argument("--doppler", type=float, default=5.0)
    ap.add_argument("-v", action="store_true")
    args = ap.parse_args()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    if args.cc == 2 and not args.burst:
        args.burst = 1400
    ok, stats, ues, mme = run(args.ttis, args.pings, args.snr,
                              nof_prb=args.prb, n_ues=args.ues,
                              n_cc=args.cc, burst_bytes=args.burst,
                              fading_profile=args.fading,
                              doppler_hz=args.doppler, verbose=args.v)
    for ue in ues:
        print(f"ue{ue.idx}: attached={ue.nas.is_registered()} "
              f"crnti={ue.crnti:#x} cqi={ue.cqi_sent}")
    print(f"stats={stats}")
    print("E2E RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
