"""NR RRC (TS 38.331 subset): codecs + UE/gNB SA connection entities.

Counterpart of the reference's generated RRC-NR codec (`lib/src/asn1/
rrc_nr.cc`, ~60 k LoC), `srsue/src/stack/rrc_nr/` and
`srsgnb/src/stack/rrc/rrc_nr.cc` (~4.5 k): RRCSetupRequest/RRCSetup/
RRCSetupComplete, SecurityModeCommand/Complete, RRCReconfiguration
with DRB+SDAP config, UL/DL InformationTransfer — driving the SA
registration flow against ngap.Amf, with PDCP-NR on SRB1 and
SDAP/PDCP-NR on DRBs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from . import ngap
from . import nas_5g as N5
from . import security
from .asn1 import BitReader, BitWriter, pack_varlen_bytes, unpack_varlen_bytes
from .pdcp_nr import PdcpNrConfig, PdcpNrEntity, sdap_pack, sdap_unpack

UL_SETUP_REQUEST = 0
DL_SETUP = 0
UL_SETUP_COMPLETE = 0
UL_SMC_COMPLETE = 1
UL_RECONF_COMPLETE = 2
UL_INFO_TRANSFER = 3
DL_SMC = 0
DL_RECONF = 1
DL_INFO_TRANSFER = 2


@dataclass
class RrcSetupRequest:
    ue_id: int = 0       # 39-bit random
    cause: int = 3

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(self.ue_id, 39)
        w.put(self.cause, 4)
        return w.to_bytes()

    @classmethod
    def unpack(cls, d: bytes) -> "RrcSetupRequest":
        r = BitReader(d)
        return cls(ue_id=r.get(39), cause=r.get(4))


@dataclass
class RrcSetup:
    c_rnti: int = 0

    def pack(self) -> bytes:
        w = BitWriter()
        w.put(self.c_rnti, 16)
        return w.to_bytes()

    @classmethod
    def unpack(cls, d: bytes) -> "RrcSetup":
        return cls(c_rnti=BitReader(d).get(16))


def _pack_dcch(msg_type: int, nas_pdu: bytes = b"",
               extra: bytes = b"") -> bytes:
    w = BitWriter()
    w.put(msg_type, 3)
    pack_varlen_bytes(w, nas_pdu)
    pack_varlen_bytes(w, extra)
    return w.to_bytes()


def _unpack_dcch(d: bytes) -> tuple[int, bytes, bytes]:
    r = BitReader(d)
    t = r.get(3)
    nas = unpack_varlen_bytes(r)
    extra = unpack_varlen_bytes(r)
    return t, nas, extra


class RrcNrUe:
    """UE-side SA RRC (rrc_nr.cc + nas_5g glue)."""

    def __init__(self, nas: N5.Nas5gUe | None = None,
                 tx: Callable[[int, bytes], None] | None = None) -> None:
        self.nas = nas or N5.Nas5gUe()
        self.tx = tx or (lambda lcid, pdu: None)
        self.state = "IDLE"
        self.c_rnti = 0
        self.srb1: Optional[PdcpNrEntity] = None
        self.drbs: dict[int, PdcpNrEntity] = {}
        self.drb_qfi: dict[int, int] = {}
        self.events: list[str] = []

    def connect(self) -> None:
        self.state = "CONNECTING"
        self.tx(0, RrcSetupRequest(ue_id=0x123456789 & ((1 << 39) - 1)).pack())
        self.events.append("setup_request")

    def rx_ccch(self, pdu: bytes) -> None:
        setup = RrcSetup.unpack(pdu)
        self.c_rnti = setup.c_rnti
        self.state = "CONNECTED"
        self.srb1 = PdcpNrEntity(PdcpNrConfig(is_srb=True, bearer_id=1))
        self.events.append("setup")
        nas_pdu = self.nas.start_registration()
        self._tx_dcch(_pack_dcch(UL_SETUP_COMPLETE, nas_pdu))

    def _tx_dcch(self, rrc_pdu: bytes) -> None:
        self.tx(1, self.srb1.write_sdu(rrc_pdu, direction=0))

    def rx_dcch(self, pdcp_pdu: bytes) -> None:
        n0 = len(self.srb1.delivered)
        self.srb1.write_pdu(pdcp_pdu, direction=1)
        for sdu in self.srb1.delivered[n0:]:
            self._handle(sdu)

    def _handle(self, pdu: bytes) -> None:
        t, nas, extra = _unpack_dcch(pdu)
        if t == DL_SMC:
            # derive AS keys off K_gNB (38.331 5.3.4 + 33.501 A.8)
            replies = self.nas.rx(nas) if nas else []
            k_gnb = security._kdf(self.nas.k_amf, 0x6E, b"\x00\x00\x00\x01")
            k_int = security.k_rrc_up(k_gnb, 2, "rrc_int")
            k_enc = security.k_rrc_up(k_gnb, 2, "rrc_enc")
            self.k_up_enc = security.k_rrc_up(k_gnb, 2, "up_enc")
            self.srb1.cfg.integrity_key = k_int
            self._tx_dcch(_pack_dcch(UL_SMC_COMPLETE))
            self.srb1.cfg.cipher_key = k_enc
            self.events.append("as_security")
            # NAS replies (e.g. RegistrationComplete) go out secured
            for ul in replies:
                self._tx_dcch(_pack_dcch(UL_INFO_TRANSFER, ul))
        elif t == DL_RECONF:
            r = BitReader(extra)
            n = r.get(4)
            for _ in range(n):
                lcid = r.get(5)
                qfi = r.get(6)
                self.drbs[lcid] = PdcpNrEntity(PdcpNrConfig(
                    is_srb=False, sn_len=18, bearer_id=lcid,
                    cipher_key=getattr(self, "k_up_enc", None)))
                self.drb_qfi[lcid] = qfi
                self.events.append(f"drb{lcid}_up")
            if nas:
                for ul in self.nas.rx(nas):
                    self._tx_dcch(_pack_dcch(UL_INFO_TRANSFER, ul))
            self._tx_dcch(_pack_dcch(UL_RECONF_COMPLETE))
        elif t == DL_INFO_TRANSFER:
            for ul in self.nas.rx(nas):
                self._tx_dcch(_pack_dcch(UL_INFO_TRANSFER, ul))

    # user plane (SDAP on top of PDCP-NR)
    def write_drb_sdu(self, lcid: int, ip_pkt: bytes) -> None:
        sdu = sdap_pack(ip_pkt, self.drb_qfi.get(lcid, 1))
        self.tx(lcid, self.drbs[lcid].write_sdu(sdu, direction=0))

    def rx_drb_pdu(self, lcid: int, pdu: bytes) -> list[bytes]:
        ent = self.drbs[lcid]
        n0 = len(ent.delivered)
        ent.write_pdu(pdu, direction=1)
        return [sdap_unpack(s)[0] for s in ent.delivered[n0:]]


class GnbUeCtx:
    def __init__(self, rnti: int, ran_ue_id: int) -> None:
        self.rnti = rnti
        self.ran_ue_id = ran_ue_id
        self.amf_ue_id = 0
        self.srb1 = PdcpNrEntity(PdcpNrConfig(is_srb=True, bearer_id=1))
        self.drbs: dict[int, PdcpNrEntity] = {}
        self.k_gnb = b""
        self.k_up_enc: Optional[bytes] = None
        self.pending_sessions: list = []
        self.state = "SETUP"
        self.n3_teids: dict[int, int] = {}


class RrcNrGnb:
    """gNB-side SA RRC + NGAP glue (rrc_nr.cc / ngap.cc)."""

    def __init__(self, tx_rrc=None, tx_ngap=None) -> None:
        self.tx_rrc = tx_rrc or (lambda rnti, lcid, pdu: None)
        self.tx_ngap = tx_ngap or (lambda pdu: None)
        self.ues: dict[int, GnbUeCtx] = {}
        self.by_ran_id: dict[int, GnbUeCtx] = {}
        self.next_rnti = 0x4601
        self.next_ran_id = 1
        self.next_teid = 0x2000
        self.events: list[str] = []

    def ng_setup(self) -> None:
        self.tx_ngap(ngap.pack_pdu(ngap.PROC_NG_SETUP, ngap.PDU_INITIATING,
                                   ngap.NgSetupRequest()))

    def rx_ccch(self, pdu: bytes) -> int:
        RrcSetupRequest.unpack(pdu)
        rnti = self.next_rnti
        self.next_rnti += 1
        ue = GnbUeCtx(rnti, self.next_ran_id)
        self.next_ran_id += 1
        self.ues[rnti] = ue
        self.by_ran_id[ue.ran_ue_id] = ue
        self.events.append("setup_request")
        self.tx_rrc(rnti, 0, RrcSetup(c_rnti=rnti).pack())
        return rnti

    def _tx_dcch(self, ue: GnbUeCtx, pdu: bytes) -> None:
        self.tx_rrc(ue.rnti, 1, ue.srb1.write_sdu(pdu, direction=1))

    def rx_dcch(self, rnti: int, pdcp_pdu: bytes) -> None:
        ue = self.ues.get(rnti)
        if ue is None:
            return
        n0 = len(ue.srb1.delivered)
        ue.srb1.write_pdu(pdcp_pdu, direction=0)
        for sdu in ue.srb1.delivered[n0:]:
            self._handle(ue, sdu)

    def _handle(self, ue: GnbUeCtx, pdu: bytes) -> None:
        t, nas, extra = _unpack_dcch(pdu)
        if t == UL_SETUP_COMPLETE:
            ue.state = "CONNECTED"
            self.tx_ngap(ngap.pack_pdu(
                ngap.PROC_INITIAL_UE_MESSAGE, ngap.PDU_INITIATING,
                ngap.NgInitialUeMessage(ran_ue_id=ue.ran_ue_id,
                                        nas_pdu=nas)))
        elif t == UL_SMC_COMPLETE:
            ue.srb1.cfg.cipher_key = security.k_rrc_up(ue.k_gnb, 2,
                                                       "rrc_enc")
            self.events.append("as_security")
            self._setup_drbs(ue)
        elif t == UL_RECONF_COMPLETE:
            self.events.append("reconf_complete")
            if ue.state == "RECONF":
                ue.state = "ACTIVE"
                self.tx_ngap(ngap.pack_pdu(
                    ngap.PROC_INITIAL_CTX_SETUP, ngap.PDU_SUCCESSFUL,
                    ngap.NgInitialCtxSetupResponse(
                        amf_ue_id=ue.amf_ue_id, ran_ue_id=ue.ran_ue_id,
                        gnb_teids=[(sid, teid) for sid, teid
                                   in ue.n3_teids.items()])))
        elif t == UL_INFO_TRANSFER:
            self.tx_ngap(ngap.pack_pdu(
                ngap.PROC_UL_NAS_TRANSPORT, ngap.PDU_INITIATING,
                ngap.NgNasTransport(amf_ue_id=ue.amf_ue_id,
                                    ran_ue_id=ue.ran_ue_id, nas_pdu=nas)))

    def rx_ngap(self, raw: bytes) -> None:
        try:
            proc, t, msg = ngap.unpack_pdu(raw)
        except (ValueError, IndexError):
            self.events.append("malformed_ngap")
            return
        if proc == ngap.PROC_NG_SETUP and t == ngap.PDU_SUCCESSFUL:
            self.events.append("ng_setup_ok")
            return
        if proc == ngap.PROC_DL_NAS_TRANSPORT:
            ue = self.by_ran_id.get(msg.ran_ue_id)
            if ue:
                ue.amf_ue_id = msg.amf_ue_id
                self._tx_dcch(ue, _pack_dcch(DL_INFO_TRANSFER, msg.nas_pdu))
            return
        if proc == ngap.PROC_INITIAL_CTX_SETUP and t == ngap.PDU_INITIATING:
            ue = self.by_ran_id.get(msg.ran_ue_id)
            if ue is None:
                return
            ue.amf_ue_id = msg.amf_ue_id
            ue.k_gnb = msg.security_key
            ue.pending_sessions = list(msg.pdu_sessions)
            ue.srb1.cfg.integrity_key = security.k_rrc_up(ue.k_gnb, 2,
                                                          "rrc_int")
            ue.k_up_enc = security.k_rrc_up(ue.k_gnb, 2, "up_enc")
            # NAS SMC rides in the ICS nas_pdu? (here: RegistrationAccept
            # is deferred to the reconfiguration; SMC went via DL NAS)
            self._tx_dcch(ue, _pack_dcch(DL_SMC, msg.nas_pdu))
            self.events.append("smc_sent")
            return

    def _setup_drbs(self, ue: GnbUeCtx) -> None:
        w = BitWriter()
        w.put(len(ue.pending_sessions), 4)
        nas_pdu = b""
        for i, (sid, teid, nas) in enumerate(ue.pending_sessions):
            lcid = 4 + i
            w.put(lcid, 5)
            w.put(1, 6)  # QFI
            ue.drbs[lcid] = PdcpNrEntity(PdcpNrConfig(
                is_srb=False, sn_len=18, bearer_id=lcid,
                cipher_key=ue.k_up_enc))
            ue.n3_teids[sid] = self.next_teid
            self.next_teid += 1
            if nas:
                nas_pdu = nas
        ue.state = "RECONF"
        self._tx_dcch(ue, _pack_dcch(DL_RECONF, nas_pdu, w.to_bytes()))

    def drb_tx(self, rnti: int, lcid: int, ip_pkt: bytes) -> bytes:
        ue = self.ues[rnti]
        return ue.drbs[lcid].write_sdu(sdap_pack(ip_pkt, 1), direction=1)

    def drb_rx(self, rnti: int, lcid: int, pdu: bytes) -> list[bytes]:
        ent = self.ues[rnti].drbs[lcid]
        n0 = len(ent.delivered)
        ent.write_pdu(pdu, direction=0)
        return [sdap_unpack(s)[0] for s in ent.delivered[n0:]]
