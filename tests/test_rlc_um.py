"""RLC UM/TM tests incl. a random-drop stress run
(reference: lib/test/rlc/rlc_um_data_test.cc, rlc_stress_test.cc)."""

import numpy as np
import pytest

from srsran_4g_tpu.stack import rlc_um as R


def test_umd_header_roundtrip():
    for pdu in (
        R.UmdPdu(sn=5, fi_first=True, fi_last=True, lis=[], data=b"abc"),
        R.UmdPdu(sn=1023, fi_first=False, fi_last=False, lis=[7], data=b"x" * 20),
        R.UmdPdu(sn=300, fi_first=True, fi_last=False, lis=[3, 900],
                 data=b"y" * 950),
    ):
        out = R.unpack_umd(R.pack_umd(pdu))
        assert out == pdu


def test_tm_passthrough():
    tm = R.RlcTm()
    tm.write_sdu(b"hello")
    assert tm.read_pdu(3) is None  # TM never segments
    assert tm.read_pdu(10) == b"hello"


def test_um_in_order():
    tx, rx = R.RlcUmTx(), R.RlcUmRx()
    sdus = [bytes([i]) * (20 + i) for i in range(10)]
    for s in sdus:
        tx.write_sdu(s)
    while tx.has_data():
        pdu = tx.read_pdu(25)  # forces segmentation
        rx.write_pdu(pdu)
    assert rx.delivered == sdus


def test_um_concatenation():
    tx, rx = R.RlcUmTx(), R.RlcUmRx()
    sdus = [b"a" * 5, b"b" * 6, b"c" * 7]
    for s in sdus:
        tx.write_sdu(s)
    pdu = tx.read_pdu(100)  # all three in one PDU with LIs
    assert not tx.has_data()
    rx.write_pdu(pdu)
    assert rx.delivered == sdus


def test_um_out_of_order_delivery():
    tx, rx = R.RlcUmTx(), R.RlcUmRx()
    sdus = [bytes([i]) * 30 for i in range(4)]
    for s in sdus:
        tx.write_sdu(s)
    pdus = []
    while tx.has_data():
        pdus.append(tx.read_pdu(40))
    order = [1, 0, 3, 2]
    for i in order:
        rx.write_pdu(pdus[i])
    assert rx.delivered == sdus


def test_um_loss_with_timer_skip():
    tx, rx = R.RlcUmTx(), R.RlcUmRx(t_reordering_ms=5)
    sdus = [bytes([i]) * 10 for i in range(5)]
    for s in sdus:
        tx.write_sdu(s)
    # 12 bytes = header + exactly one SDU per PDU (no straddling)
    pdus = [tx.read_pdu(12) for _ in range(5)]
    assert not tx.has_data()
    rx.write_pdu(pdus[0])
    # drop pdus[1]
    for p in pdus[2:]:
        rx.write_pdu(p)
    assert rx.delivered == sdus[:1]  # stuck on the gap
    for _ in range(5):
        rx.tick()
    assert rx.delivered == [sdus[0], *sdus[2:]]


def test_um_stress_random_drops():
    rng = np.random.default_rng(0)
    tx, rx = R.RlcUmTx(), R.RlcUmRx(t_reordering_ms=10)
    sent = []
    for i in range(300):
        s = bytes(rng.integers(0, 256, size=int(rng.integers(5, 200))).tolist())
        sent.append(s)
        tx.write_sdu(s)
    while tx.has_data():
        pdu = tx.read_pdu(int(rng.integers(10, 120)))
        r = rng.random()
        if r < 0.1:
            continue  # drop
        rx.write_pdu(pdu)
        if r < 0.2:
            rx.write_pdu(pdu)  # duplicate
        rx.tick()
    for _ in range(20):
        rx.tick()
    # delivered SDUs must be a subsequence of the sent ones (no corruption,
    # no reordering, no duplication) and most must survive 10% PDU loss
    it = iter(sent)
    for d in rx.delivered:
        assert any(d == s for s in it), "delivered SDU out of order/corrupt"
    assert len(rx.delivered) > 0.5 * len(sent)
