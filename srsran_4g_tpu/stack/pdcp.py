"""PDCP entity (LTE), TS 36.323.

Counterpart of the reference's `lib/src/pdcp/pdcp_entity_lte.cc`: data-plane
(DRB, 12-bit SN) and control-plane (SRB, 5-bit SN) PDU formats, COUNT
maintenance with hyper-frame numbers, ciphering (security.eea*) and
integrity (security.eia2) hooks, duplicate/reorder handling for RLC UM
delivery, and per-SDU discard timers (pdcp_entity_lte.h:91).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from srsran_4g_tpu.stack import security

SN_LEN_SRB = 5
SN_LEN_DRB = 12


@dataclass
class PdcpConfig:
    is_control: bool = False  # SRB (5-bit SN + MAC-I) vs DRB (12-bit SN)
    bearer_id: int = 1
    discard_timer_ms: int = 0  # 0 = off
    cipher_key: bytes | None = None
    integrity_key: bytes | None = None


class PdcpEntity:
    def __init__(self, cfg: PdcpConfig):
        self.cfg = cfg
        self.sn_len = SN_LEN_SRB if cfg.is_control else SN_LEN_DRB
        self.sn_mod = 1 << self.sn_len
        self.tx_count = 0
        self.rx_hfn = 0
        self.next_rx_sn = 0
        self.delivered: list[bytes] = []
        self.integrity_failures = 0
        self._discard: dict[int, int] = {}  # count -> remaining ms

    # --- TX ---------------------------------------------------------------

    def _header(self, sn: int) -> bytes:
        if self.cfg.is_control:
            return bytes([sn & 0x1F])
        return bytes([0x80 | (sn >> 8), sn & 0xFF])  # D/C=1 data

    def write_sdu(self, sdu: bytes, direction: int = 0) -> bytes:
        count = self.tx_count
        sn = count % self.sn_mod
        self.tx_count += 1
        payload = sdu
        mac = b""
        if self.cfg.is_control and self.cfg.integrity_key:
            mac = security.eia2(self.cfg.integrity_key, count,
                                self.cfg.bearer_id - 1, direction,
                                self._header(sn) + sdu)
        if self.cfg.cipher_key:
            payload = security.eea2(self.cfg.cipher_key, count,
                                    self.cfg.bearer_id - 1, direction,
                                    sdu + mac)
        else:
            payload = sdu + mac
        if self.cfg.discard_timer_ms:
            self._discard[count] = self.cfg.discard_timer_ms
        return self._header(sn) + payload

    # --- RX ---------------------------------------------------------------

    def write_pdu(self, pdu: bytes, direction: int = 1) -> None:
        if self.cfg.is_control:
            sn = pdu[0] & 0x1F
            body = pdu[1:]
        else:
            sn = ((pdu[0] & 0x0F) << 8) | pdu[1]
            body = pdu[2:]
        # COUNT reconstruction with HFN window (36.323 §5.1.2.1.2)
        if sn < self.next_rx_sn - self.sn_mod // 2:
            hfn = self.rx_hfn + 1
        elif sn > self.next_rx_sn + self.sn_mod // 2:
            hfn = self.rx_hfn - 1
        else:
            hfn = self.rx_hfn
        count = hfn * self.sn_mod + sn

        if self.cfg.cipher_key:
            body = security.eea2(self.cfg.cipher_key, count,
                                 self.cfg.bearer_id - 1, direction, body)
        if self.cfg.is_control and self.cfg.integrity_key:
            sdu, mac = body[:-4], body[-4:]
            expect = security.eia2(self.cfg.integrity_key, count,
                                   self.cfg.bearer_id - 1, direction,
                                   pdu[:1] + sdu)
            if mac != expect:
                self.integrity_failures += 1
                return
        else:
            sdu = body
        if sn >= self.next_rx_sn or hfn > self.rx_hfn:
            self.next_rx_sn = (sn + 1) % self.sn_mod
            if sn + 1 >= self.sn_mod:
                self.rx_hfn = hfn + 1
            else:
                self.rx_hfn = hfn
        self.delivered.append(sdu)

    # --- timers -----------------------------------------------------------

    def tick(self, ms: int = 1) -> list[int]:
        """Advance discard timers; returns COUNTs discarded this tick."""
        dead = []
        for count in list(self._discard):
            self._discard[count] -= ms
            if self._discard[count] <= 0:
                dead.append(count)
                del self._discard[count]
        return dead
