"""RRC message codecs (TS 36.331 subset) on the PER-style bit runtime.

Counterpart of the reference's generated RRC ASN.1 codecs
(`lib/src/asn1/rrc.cc` + `lib/src/asn1/rrc/*`, ~10 k LoC generated):
typed dataclasses with pack()/unpack() into bit buffers via
stack.asn1.  Covers the connection-establishment / security /
reconfiguration / reestablishment message set used by the reference's
E2E attach flow (srsue/src/stack/rrc/rrc_procedures.h:38-342,
srsenb/src/stack/rrc/rrc_ue.cc), plus MIB/SIB1/SIB2.

Encodings are self-consistent PER-flavoured (choice index + fields),
not byte-compatible with 3GPP UPER.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .asn1 import (BitReader, BitWriter, pack_constrained_int,
                   pack_varlen_bytes, unpack_constrained_int,
                   unpack_varlen_bytes)

# UL-CCCH / DL-CCCH / UL-DCCH / DL-DCCH message type tags (choice indices)
UL_CCCH_CONN_REQUEST = 0
UL_CCCH_REEST_REQUEST = 1
DL_CCCH_CONN_SETUP = 0
DL_CCCH_CONN_REJECT = 1
DL_CCCH_REEST = 2
DL_CCCH_REEST_REJECT = 3
UL_DCCH_CONN_SETUP_COMPLETE = 0
UL_DCCH_SEC_MODE_COMPLETE = 1
UL_DCCH_SEC_MODE_FAILURE = 2
UL_DCCH_RECONF_COMPLETE = 3
UL_DCCH_UL_INFO_TRANSFER = 4
UL_DCCH_MEAS_REPORT = 5
UL_DCCH_REEST_COMPLETE = 6
DL_DCCH_SEC_MODE_COMMAND = 0
DL_DCCH_RECONF = 1
DL_DCCH_DL_INFO_TRANSFER = 2
DL_DCCH_CONN_RELEASE = 3


# --------------------------------------------------------------------------
# BCCH: MIB / SIB1 / SIB2


@dataclass
class Mib:
    """MasterInformationBlock (36.331 6.2.2); PHY transport via models/pbch."""
    dl_bandwidth: int = 100   # PRBs: one of 6,15,25,50,75,100
    phich_duration: int = 0   # 0=normal
    phich_resource: int = 1   # index into {1/6,1/2,1,2}
    sfn: int = 0

    _BW = [6, 15, 25, 50, 75, 100]

    def pack(self) -> bytes:
        w = BitWriter()
        pack_constrained_int(w, self._BW.index(self.dl_bandwidth), 0, 5)
        w.put(self.phich_duration, 1)
        pack_constrained_int(w, self.phich_resource, 0, 3)
        w.put(self.sfn >> 2, 8)
        w.put(0, 10)  # spare
        return w.to_bytes()

    @classmethod
    def unpack(cls, data: bytes) -> "Mib":
        r = BitReader(data)
        bw = cls._BW[unpack_constrained_int(r, 0, 5)]
        dur = r.get(1)
        res = unpack_constrained_int(r, 0, 3)
        sfn = r.get(8) << 2
        return cls(dl_bandwidth=bw, phich_duration=dur, phich_resource=res,
                   sfn=sfn)


@dataclass
class Sib1:
    plmn_mcc: int = 1
    plmn_mnc: int = 1
    tac: int = 0x0001
    cell_id: int = 0x01
    q_rx_lev_min: int = -65   # *2 dBm
    freq_band: int = 7
    si_window_len_ms: int = 20
    sched_info_period: int = 16  # SIB2 periodicity (radio frames)

    def pack(self) -> bytes:
        w = BitWriter()
        pack_constrained_int(w, self.plmn_mcc, 0, 999)
        pack_constrained_int(w, self.plmn_mnc, 0, 999)
        w.put(self.tac, 16)
        w.put(self.cell_id, 28)
        pack_constrained_int(w, self.q_rx_lev_min, -70, -22)
        pack_constrained_int(w, self.freq_band, 1, 64)
        pack_constrained_int(w, self.si_window_len_ms, 1, 40)
        pack_constrained_int(w, self.sched_info_period, 8, 512)
        return w.to_bytes()

    @classmethod
    def unpack(cls, data: bytes) -> "Sib1":
        r = BitReader(data)
        return cls(
            plmn_mcc=unpack_constrained_int(r, 0, 999),
            plmn_mnc=unpack_constrained_int(r, 0, 999),
            tac=r.get(16), cell_id=r.get(28),
            q_rx_lev_min=unpack_constrained_int(r, -70, -22),
            freq_band=unpack_constrained_int(r, 1, 64),
            si_window_len_ms=unpack_constrained_int(r, 1, 40),
            sched_info_period=unpack_constrained_int(r, 8, 512),
        )


@dataclass
class Sib2:
    """The RACH/PUSCH/PUCCH common config subset the MAC/PHY need."""
    nof_ra_preambles: int = 52
    preamble_init_power: int = -104
    power_ramp_db: int = 4
    preamble_trans_max: int = 10
    ra_resp_window_sf: int = 10
    contention_timer_sf: int = 64
    prach_config_index: int = 3
    prach_freq_offset: int = 2
    prach_root_seq: int = 128
    t300_ms: int = 1000
    t301_ms: int = 1000
    t310_ms: int = 1000
    n310: int = 1
    t311_ms: int = 1000
    n311: int = 1

    def pack(self) -> bytes:
        w = BitWriter()
        pack_constrained_int(w, self.nof_ra_preambles, 4, 64)
        pack_constrained_int(w, self.preamble_init_power, -120, -90)
        pack_constrained_int(w, self.power_ramp_db, 0, 6)
        pack_constrained_int(w, self.preamble_trans_max, 3, 200)
        pack_constrained_int(w, self.ra_resp_window_sf, 2, 10)
        pack_constrained_int(w, self.contention_timer_sf, 8, 64)
        pack_constrained_int(w, self.prach_config_index, 0, 63)
        pack_constrained_int(w, self.prach_freq_offset, 0, 94)
        pack_constrained_int(w, self.prach_root_seq, 0, 837)
        for v in (self.t300_ms, self.t301_ms, self.t310_ms):
            pack_constrained_int(w, v, 0, 2000)
        pack_constrained_int(w, self.n310, 1, 20)
        pack_constrained_int(w, self.t311_ms, 0, 30000)
        pack_constrained_int(w, self.n311, 1, 10)
        return w.to_bytes()

    @classmethod
    def unpack(cls, data: bytes) -> "Sib2":
        r = BitReader(data)
        return cls(
            nof_ra_preambles=unpack_constrained_int(r, 4, 64),
            preamble_init_power=unpack_constrained_int(r, -120, -90),
            power_ramp_db=unpack_constrained_int(r, 0, 6),
            preamble_trans_max=unpack_constrained_int(r, 3, 200),
            ra_resp_window_sf=unpack_constrained_int(r, 2, 10),
            contention_timer_sf=unpack_constrained_int(r, 8, 64),
            prach_config_index=unpack_constrained_int(r, 0, 63),
            prach_freq_offset=unpack_constrained_int(r, 0, 94),
            prach_root_seq=unpack_constrained_int(r, 0, 837),
            t300_ms=unpack_constrained_int(r, 0, 2000),
            t301_ms=unpack_constrained_int(r, 0, 2000),
            t310_ms=unpack_constrained_int(r, 0, 2000),
            n310=unpack_constrained_int(r, 1, 20),
            t311_ms=unpack_constrained_int(r, 0, 30000),
            n311=unpack_constrained_int(r, 1, 10),
        )


# --------------------------------------------------------------------------
# CCCH


@dataclass
class RrcConnectionRequest:
    ue_identity: int = 0      # 40-bit S-TMSI/random value
    establishment_cause: int = 3  # mo-Data

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(UL_CCCH_CONN_REQUEST, 2)
        w.put(self.ue_identity, 40)
        pack_constrained_int(w, self.establishment_cause, 0, 7)
        return w.to_bytes()


@dataclass
class RrcConnectionReestablishmentRequest:
    c_rnti: int = 0
    phys_cell_id: int = 0
    cause: int = 0  # reconfigurationFailure/handoverFailure/otherFailure

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(UL_CCCH_REEST_REQUEST, 2)
        w.put(self.c_rnti, 16)
        w.put(self.phys_cell_id, 9)
        pack_constrained_int(w, self.cause, 0, 3)
        return w.to_bytes()


def unpack_ul_ccch(data: bytes):
    r = BitReader(data)
    t = r.get(2)
    if t == UL_CCCH_CONN_REQUEST:
        return RrcConnectionRequest(ue_identity=r.get(40),
                                    establishment_cause=unpack_constrained_int(r, 0, 7))
    if t == UL_CCCH_REEST_REQUEST:
        return RrcConnectionReestablishmentRequest(
            c_rnti=r.get(16), phys_cell_id=r.get(9),
            cause=unpack_constrained_int(r, 0, 3))
    raise ValueError(f"unknown UL-CCCH type {t}")


@dataclass
class SrbToAddMod:
    srb_id: int = 1


@dataclass
class DrbToAddMod:
    drb_id: int = 1
    eps_bearer_id: int = 5
    lcid: int = 3
    pdcp_sn_len: int = 12
    rlc_mode: str = "am"  # am | um


@dataclass
class RrcConnectionSetup:
    rnti: int = 0
    srb1: SrbToAddMod = field(default_factory=SrbToAddMod)

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(DL_CCCH_CONN_SETUP, 2)
        w.put(self.rnti, 16)
        pack_constrained_int(w, self.srb1.srb_id, 1, 2)
        return w.to_bytes()


@dataclass
class RrcConnectionReject:
    wait_time_s: int = 1

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(DL_CCCH_CONN_REJECT, 2)
        pack_constrained_int(w, self.wait_time_s, 1, 16)
        return w.to_bytes()


@dataclass
class RrcConnectionReestablishment:
    rnti: int = 0
    next_hop_chaining_count: int = 0

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(DL_CCCH_REEST, 2)
        w.put(self.rnti, 16)
        pack_constrained_int(w, self.next_hop_chaining_count, 0, 7)
        return w.to_bytes()


@dataclass
class RrcConnectionReestablishmentReject:
    def pack(self) -> bytes:
        w = BitWriter()
        w.put(DL_CCCH_REEST_REJECT, 2)
        return w.to_bytes()


def unpack_dl_ccch(data: bytes):
    r = BitReader(data)
    t = r.get(2)
    if t == DL_CCCH_CONN_SETUP:
        rnti = r.get(16)
        srb = unpack_constrained_int(r, 1, 2)
        return RrcConnectionSetup(rnti=rnti, srb1=SrbToAddMod(srb_id=srb))
    if t == DL_CCCH_CONN_REJECT:
        return RrcConnectionReject(wait_time_s=unpack_constrained_int(r, 1, 16))
    if t == DL_CCCH_REEST:
        return RrcConnectionReestablishment(
            rnti=r.get(16),
            next_hop_chaining_count=unpack_constrained_int(r, 0, 7))
    if t == DL_CCCH_REEST_REJECT:
        return RrcConnectionReestablishmentReject()
    raise ValueError(f"unknown DL-CCCH type {t}")


# --------------------------------------------------------------------------
# DCCH


def _pack_dedicated(w: BitWriter, nas_pdu: bytes) -> None:
    w.put_bool(bool(nas_pdu))
    if nas_pdu:
        pack_varlen_bytes(w, nas_pdu)


def _unpack_dedicated(r: BitReader) -> bytes:
    return unpack_varlen_bytes(r) if r.get_bool() else b""


@dataclass
class RrcConnectionSetupComplete:
    selected_plmn: int = 1
    nas_pdu: bytes = b""

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(UL_DCCH_CONN_SETUP_COMPLETE, 3)
        pack_constrained_int(w, self.selected_plmn, 1, 6)
        _pack_dedicated(w, self.nas_pdu)
        return w.to_bytes()


@dataclass
class SecurityModeCommandRrc:
    ciph_alg: int = 2   # eea2
    integ_alg: int = 2  # eia2

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(DL_DCCH_SEC_MODE_COMMAND, 3)
        pack_constrained_int(w, self.ciph_alg, 0, 7)
        pack_constrained_int(w, self.integ_alg, 0, 7)
        return w.to_bytes()


@dataclass
class SecurityModeCompleteRrc:
    def pack(self) -> bytes:
        w = BitWriter()
        w.put(UL_DCCH_SEC_MODE_COMPLETE, 3)
        return w.to_bytes()


@dataclass
class MobilityControlInfo:
    """Handover command payload (36.331 6.3.4 mobilityControlInfo)."""
    target_pci: int = 0
    new_c_rnti: int = 0
    t304_ms: int = 1000
    ncc: int = 0  # nextHopChainingCount: >0 -> vertical K_eNB* re-key


@dataclass
class AsConfig:
    """Source→target transparent container (36.331 10.2.2 AS-Config,
    reduced): the source cell and DRB configuration the target eNB
    rebuilds at an S1 handover (srsenb rrc_mobility.cc
    fill_mobility_reconf_common / HandoverPreparationInformation)."""
    source_pci: int = 0
    drbs: list[DrbToAddMod] = field(default_factory=list)

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(self.source_pci, 9)
        pack_constrained_int(w, len(self.drbs), 0, 11)
        for d in self.drbs:
            pack_constrained_int(w, d.drb_id, 1, 32)
            pack_constrained_int(w, d.eps_bearer_id, 0, 15)
            pack_constrained_int(w, d.lcid, 3, 10)
        return w.to_bytes()

    @classmethod
    def unpack(cls, data: bytes) -> "AsConfig":
        r = BitReader(data)
        out = cls(source_pci=r.get(9))
        for _ in range(unpack_constrained_int(r, 0, 11)):
            out.drbs.append(DrbToAddMod(
                drb_id=unpack_constrained_int(r, 1, 32),
                eps_bearer_id=unpack_constrained_int(r, 0, 15),
                lcid=unpack_constrained_int(r, 3, 10)))
        return out


@dataclass
class RrcConnectionReconfiguration:
    drbs: list[DrbToAddMod] = field(default_factory=list)
    nas_pdu: bytes = b""
    meas_config: bool = False
    mobility: MobilityControlInfo | None = None
    # EN-DC (36.331 nr-SecondaryCellGroupConfig-r15 + sk-Counter-r15):
    # opaque NR RRC container from the SgNB plus the S-KgNB counter
    nr_scg: bytes = b""
    sk_counter: int = 0

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(DL_DCCH_RECONF, 3)
        pack_constrained_int(w, len(self.drbs), 0, 11)
        for d in self.drbs:
            pack_constrained_int(w, d.drb_id, 1, 32)
            pack_constrained_int(w, d.eps_bearer_id, 0, 15)
            pack_constrained_int(w, d.lcid, 3, 10)
            w.put_bool(d.pdcp_sn_len == 12)
            w.put_bool(d.rlc_mode == "am")
        _pack_dedicated(w, self.nas_pdu)
        w.put_bool(self.meas_config)
        w.put_bool(self.mobility is not None)
        if self.mobility is not None:
            w.put(self.mobility.target_pci, 9)
            w.put(self.mobility.new_c_rnti, 16)
            pack_constrained_int(w, self.mobility.t304_ms, 0, 8000)
            w.put(self.mobility.ncc, 3)
        w.put_bool(bool(self.nr_scg))
        if self.nr_scg:
            pack_varlen_bytes(w, self.nr_scg)
            w.put(self.sk_counter, 16)
        return w.to_bytes()


@dataclass
class RrcConnectionReconfigurationComplete:
    def pack(self) -> bytes:
        w = BitWriter()
        w.put(UL_DCCH_RECONF_COMPLETE, 3)
        return w.to_bytes()


@dataclass
class UlInformationTransfer:
    nas_pdu: bytes = b""

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(UL_DCCH_UL_INFO_TRANSFER, 3)
        pack_varlen_bytes(w, self.nas_pdu)
        return w.to_bytes()


@dataclass
class DlInformationTransfer:
    nas_pdu: bytes = b""

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(DL_DCCH_DL_INFO_TRANSFER, 3)
        pack_varlen_bytes(w, self.nas_pdu)
        return w.to_bytes()


@dataclass
class RrcConnectionRelease:
    cause: int = 0

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(DL_DCCH_CONN_RELEASE, 3)
        pack_constrained_int(w, self.cause, 0, 3)
        return w.to_bytes()


@dataclass
class MeasReport:
    rsrp: int = 0   # 0..97 (36.133 9.1.4)
    rsrq: int = 0   # 0..34
    pci: int = 0
    is_nr: bool = False  # B1 inter-RAT NR report (measResultNeighCellListNR)

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(UL_DCCH_MEAS_REPORT, 3)
        pack_constrained_int(w, self.rsrp, 0, 97)
        pack_constrained_int(w, self.rsrq, 0, 34)
        w.put(self.pci, 9)
        w.put_bool(self.is_nr)
        return w.to_bytes()


def unpack_ul_dcch(data: bytes):
    r = BitReader(data)
    t = r.get(3)
    if t == UL_DCCH_CONN_SETUP_COMPLETE:
        plmn = unpack_constrained_int(r, 1, 6)
        nas = _unpack_dedicated(r)
        return RrcConnectionSetupComplete(selected_plmn=plmn, nas_pdu=nas)
    if t == UL_DCCH_SEC_MODE_COMPLETE:
        return SecurityModeCompleteRrc()
    if t == UL_DCCH_RECONF_COMPLETE:
        return RrcConnectionReconfigurationComplete()
    if t == UL_DCCH_UL_INFO_TRANSFER:
        return UlInformationTransfer(nas_pdu=unpack_varlen_bytes(r))
    if t == UL_DCCH_MEAS_REPORT:
        return MeasReport(rsrp=unpack_constrained_int(r, 0, 97),
                          rsrq=unpack_constrained_int(r, 0, 34),
                          pci=r.get(9), is_nr=r.get_bool())
    raise ValueError(f"unknown UL-DCCH type {t}")


# --------------------------------------------------------------------------
# PCCH (paging, 36.331 6.2.2)


@dataclass
class Paging:
    """PCCH Paging with up to 16 records (S-TMSI identities)."""
    tmsis: list[int] = field(default_factory=list)
    system_info_modification: bool = False

    def pack(self) -> bytes:
        w = BitWriter()
        pack_constrained_int(w, len(self.tmsis), 0, 16)
        for t in self.tmsis:
            w.put(t, 32)
        w.put_bool(self.system_info_modification)
        return w.to_bytes()

    @classmethod
    def unpack(cls, data: bytes) -> "Paging":
        r = BitReader(data)
        n = unpack_constrained_int(r, 0, 16)
        tmsis = [r.get(32) for _ in range(n)]
        return cls(tmsis=tmsis, system_info_modification=r.get_bool())


def unpack_dl_dcch(data: bytes):
    r = BitReader(data)
    t = r.get(3)
    if t == DL_DCCH_SEC_MODE_COMMAND:
        return SecurityModeCommandRrc(
            ciph_alg=unpack_constrained_int(r, 0, 7),
            integ_alg=unpack_constrained_int(r, 0, 7))
    if t == DL_DCCH_RECONF:
        n = unpack_constrained_int(r, 0, 11)
        drbs = []
        for _ in range(n):
            drbs.append(DrbToAddMod(
                drb_id=unpack_constrained_int(r, 1, 32),
                eps_bearer_id=unpack_constrained_int(r, 0, 15),
                lcid=unpack_constrained_int(r, 3, 10),
                pdcp_sn_len=12 if r.get_bool() else 18,
                rlc_mode="am" if r.get_bool() else "um"))
        nas = _unpack_dedicated(r)
        meas = r.get_bool()
        mob = None
        if r.get_bool():
            mob = MobilityControlInfo(
                target_pci=r.get(9), new_c_rnti=r.get(16),
                t304_ms=unpack_constrained_int(r, 0, 8000),
                ncc=r.get(3))
        nr_scg, sk = b"", 0
        if r.get_bool():
            nr_scg = unpack_varlen_bytes(r)
            sk = r.get(16)
        return RrcConnectionReconfiguration(drbs=drbs, nas_pdu=nas,
                                            meas_config=meas, mobility=mob,
                                            nr_scg=nr_scg, sk_counter=sk)
    if t == DL_DCCH_DL_INFO_TRANSFER:
        return DlInformationTransfer(nas_pdu=unpack_varlen_bytes(r))
    if t == DL_DCCH_CONN_RELEASE:
        return RrcConnectionRelease(cause=unpack_constrained_int(r, 0, 3))
    raise ValueError(f"unknown DL-DCCH type {t}")
