"""E2 agent: E2AP subset + E2SM-KPM service model (O-RAN RIC interface).

Counterpart of `srsgnb/src/stack/ric/e2_agent.cc`, `e2ap.cc`,
`e2sm_kpm*.cc` (~2.4 k LoC): E2 Setup with RAN-function list,
RIC Subscription (report trigger period), and RIC Indication messages
carrying KPM measurement reports (per-UE/cell counters pulled from the
metrics hub).  Framing matches s1ap_msgs/ngap.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Optional

from .asn1 import BitReader, BitWriter, pack_varlen_bytes, unpack_varlen_bytes

PROC_E2_SETUP = 1
PROC_RIC_SUBSCRIPTION = 8
PROC_RIC_INDICATION = 5

PDU_INITIATING = 0
PDU_SUCCESSFUL = 1

KPM_RAN_FUNCTION_ID = 147
KPM_METRICS = ("rsrp", "rsrq", "dl_mbps", "ul_mbps", "dl_bler", "ul_bler",
               "cqi", "nof_ue")


@dataclass
class E2SetupRequest:
    global_e2node_id: int = 0x19B
    ran_functions: tuple[int, ...] = (KPM_RAN_FUNCTION_ID,)

    def pack_ies(self) -> bytes:
        w = BitWriter()
        w.put(self.global_e2node_id, 32)
        w.put(len(self.ran_functions), 8)
        for f in self.ran_functions:
            w.put(f, 16)
        return w.to_bytes()

    @classmethod
    def unpack_ies(cls, d: bytes) -> "E2SetupRequest":
        r = BitReader(d)
        gid = r.get(32)
        funcs = tuple(r.get(16) for _ in range(r.get(8)))
        return cls(global_e2node_id=gid, ran_functions=funcs)


@dataclass
class E2SetupResponse:
    accepted_functions: tuple[int, ...] = (KPM_RAN_FUNCTION_ID,)

    def pack_ies(self) -> bytes:
        w = BitWriter()
        w.put(len(self.accepted_functions), 8)
        for f in self.accepted_functions:
            w.put(f, 16)
        return w.to_bytes()

    @classmethod
    def unpack_ies(cls, d: bytes) -> "E2SetupResponse":
        r = BitReader(d)
        return cls(accepted_functions=tuple(
            r.get(16) for _ in range(r.get(8))))


@dataclass
class RicSubscription:
    request_id: int = 1
    ran_function_id: int = KPM_RAN_FUNCTION_ID
    report_period_ms: int = 1000
    metrics: tuple[str, ...] = KPM_METRICS

    def pack_ies(self) -> bytes:
        w = BitWriter()
        w.put(self.request_id, 16)
        w.put(self.ran_function_id, 16)
        w.put(self.report_period_ms, 16)
        pack_varlen_bytes(w, ",".join(self.metrics).encode())
        return w.to_bytes()

    @classmethod
    def unpack_ies(cls, d: bytes) -> "RicSubscription":
        r = BitReader(d)
        return cls(request_id=r.get(16), ran_function_id=r.get(16),
                   report_period_ms=r.get(16),
                   metrics=tuple(unpack_varlen_bytes(r).decode().split(",")))


@dataclass
class RicIndication:
    request_id: int = 1
    ran_function_id: int = KPM_RAN_FUNCTION_ID
    sn: int = 0
    kpm_report: dict = field(default_factory=dict)

    def pack_ies(self) -> bytes:
        w = BitWriter()
        w.put(self.request_id, 16)
        w.put(self.ran_function_id, 16)
        w.put(self.sn, 16)
        pack_varlen_bytes(w, json.dumps(self.kpm_report,
                                        sort_keys=True).encode())
        return w.to_bytes()

    @classmethod
    def unpack_ies(cls, d: bytes) -> "RicIndication":
        r = BitReader(d)
        return cls(request_id=r.get(16), ran_function_id=r.get(16),
                   sn=r.get(16),
                   kpm_report=json.loads(unpack_varlen_bytes(r).decode()))


_CODECS = {
    (PROC_E2_SETUP, PDU_INITIATING): E2SetupRequest,
    (PROC_E2_SETUP, PDU_SUCCESSFUL): E2SetupResponse,
    (PROC_RIC_SUBSCRIPTION, PDU_INITIATING): RicSubscription,
    (PROC_RIC_INDICATION, PDU_INITIATING): RicIndication,
}


def pack_pdu(proc: int, t: int, msg) -> bytes:
    ies = msg.pack_ies()
    return bytes([proc, t]) + len(ies).to_bytes(2, "big") + ies


def unpack_pdu(d: bytes):
    cls = _CODECS.get((d[0], d[1]))
    n = int.from_bytes(d[2:4], "big")
    if cls is None or len(d[4:4 + n]) != n:
        raise ValueError("bad E2AP PDU")
    return d[0], d[1], cls.unpack_ies(d[4:4 + n])


class E2Agent:
    """eNB/gNB-side agent: answers subscriptions with periodic KPM
    indications built from a metrics callback (metrics_e2.cc)."""

    def __init__(self, metrics_source: Callable[[], dict],
                 tx: Callable[[bytes], None] | None = None) -> None:
        self.metrics_source = metrics_source
        self.tx = tx or (lambda pdu: None)
        self.subs: dict[int, RicSubscription] = {}
        self.timers: dict[int, int] = {}
        self.sn = 0
        self.events: list[str] = []

    def setup(self) -> None:
        self.tx(pack_pdu(PROC_E2_SETUP, PDU_INITIATING, E2SetupRequest()))

    def rx(self, raw: bytes) -> None:
        try:
            proc, t, msg = unpack_pdu(raw)
        except (ValueError, IndexError):
            self.events.append("malformed_e2ap")
            return
        if proc == PROC_E2_SETUP and t == PDU_SUCCESSFUL:
            self.events.append("e2_setup_ok")
        elif proc == PROC_RIC_SUBSCRIPTION:
            self.subs[msg.request_id] = msg
            self.timers[msg.request_id] = 0
            self.events.append(f"subscribed:{msg.request_id}")

    def tick(self, ms: int = 1) -> None:
        for rid, sub in self.subs.items():
            self.timers[rid] += ms
            if self.timers[rid] >= sub.report_period_ms:
                self.timers[rid] = 0
                snap = self.metrics_source()
                report = {k: snap.get(k, 0) for k in sub.metrics}
                self.sn += 1
                self.tx(pack_pdu(
                    PROC_RIC_INDICATION, PDU_INITIATING,
                    RicIndication(request_id=rid, sn=self.sn,
                                  kpm_report=report)))
