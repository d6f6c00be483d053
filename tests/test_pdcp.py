"""PDCP entity tests (reference: lib/test/pdcp/pdcp_lte_test*.cc)."""

import os

import pytest

from srsran_4g_tpu.stack.pdcp import PdcpConfig, PdcpEntity


def make_pair(**kw):
    cfg = PdcpConfig(**kw)
    return PdcpEntity(cfg), PdcpEntity(cfg)


def test_drb_plain_roundtrip():
    tx, rx = make_pair()
    sdus = [bytes([i]) * 10 for i in range(5)]
    for s in sdus:
        rx.write_pdu(tx.write_sdu(s, direction=0), direction=0)
    assert rx.delivered == sdus


def test_drb_ciphered_roundtrip():
    key = os.urandom(16)
    tx, rx = make_pair(cipher_key=key)
    sdus = [os.urandom(50) for _ in range(20)]
    pdus = [tx.write_sdu(s, 0) for s in sdus]
    # ciphertext differs from plaintext
    assert all(p[2:] != s for p, s in zip(pdus, sdus))
    for p in pdus:
        rx.write_pdu(p, direction=0)
    assert rx.delivered == sdus


def test_srb_integrity():
    ck, ik = os.urandom(16), os.urandom(16)
    tx, rx = make_pair(is_control=True, cipher_key=ck, integrity_key=ik)
    pdu = tx.write_sdu(b"rrc message", 0)
    rx.write_pdu(pdu, direction=0)
    assert rx.delivered == [b"rrc message"]
    # corrupt → integrity failure, not delivered
    bad = bytearray(tx.write_sdu(b"second", 0))
    bad[-1] ^= 0xFF
    rx.write_pdu(bytes(bad), direction=0)
    assert rx.delivered == [b"rrc message"]
    assert rx.integrity_failures == 1


def test_sn_wrap_hfn():
    key = os.urandom(16)
    tx, rx = make_pair(cipher_key=key)
    n = (1 << 12) + 50  # cross one SN wrap
    for i in range(n):
        rx.write_pdu(tx.write_sdu(i.to_bytes(4, "big"), 0), direction=0)
    assert len(rx.delivered) == n
    assert rx.delivered[-1] == (n - 1).to_bytes(4, "big")
    assert rx.rx_hfn == 1


def test_discard_timer():
    tx, _ = make_pair(discard_timer_ms=3)
    tx.write_sdu(b"a", 0)
    tx.write_sdu(b"b", 0)
    assert tx.tick(2) == []
    assert tx.tick(2) == [0, 1]


# --- status reports (TS 36.323 §5.3.1) ---------------------------------------

def test_status_report_roundtrip():
    from srsran_4g_tpu.stack.pdcp import PdcpConfig, PdcpEntity

    tx = PdcpEntity(PdcpConfig(discard_timer_ms=100))
    rx = PdcpEntity(PdcpConfig())
    pdus = [tx.write_sdu(bytes([i]) * 8) for i in range(6)]
    # deliver 0,1,3,5 — 2 and 4 missing
    for i in (0, 1, 3, 5):
        rx.write_pdu(pdus[i])
    rep = rx.status_report()
    fms = ((rep[0] & 0x0F) << 8) | rep[1]
    assert fms == 2
    acked = tx.handle_status_report(rep)
    assert acked == [0, 1, 3, 5]
    # discard timers for acked SDUs are cancelled; 2 and 4 remain
    assert sorted(tx._discard) == [2, 4]


def test_status_report_no_gaps():
    from srsran_4g_tpu.stack.pdcp import PdcpConfig, PdcpEntity

    tx = PdcpEntity(PdcpConfig(discard_timer_ms=50))
    rx = PdcpEntity(PdcpConfig())
    for i in range(4):
        rx.write_pdu(tx.write_sdu(b"x" * 4))
    rep = rx.status_report()
    assert len(rep) == 2  # FMS only, empty bitmap
    assert tx.handle_status_report(rep) == [0, 1, 2, 3]
    assert not tx._discard
