"""NR stack: RLC-NR (UM/AM), PDCP-NR, SDAP, and the 5G SA registration.

Reference scenarios: lib/test/rlc/rlc_um_nr_test.cc / rlc_am_nr_test.cc
(segmentation, ARQ, status), lib/test/pdcp/pdcp_nr_test.cc, and the SA
flow of srsue/src/stack/rrc_nr + srsgnb rrc_nr/ngap.
"""

import numpy as np
import pytest

from srsran_4g_tpu.stack.epc import Hss
from srsran_4g_tpu.stack.nas_5g import Nas5gUe
from srsran_4g_tpu.stack.ngap import Amf
from srsran_4g_tpu.stack.pdcp_nr import (PdcpNrConfig, PdcpNrEntity,
                                         sdap_pack, sdap_unpack)
from srsran_4g_tpu.stack.rlc_nr import (RlcAmNr, RlcUmNr, pack_umd_nr,
                                        unpack_umd_nr, UmdNrPdu, SI_FIRST,
                                        SI_FULL)
from srsran_4g_tpu.stack.rrc_nr import RrcNrGnb, RrcNrUe
from srsran_4g_tpu.stack.usim import Usim, UsimConfig


def test_umd_nr_codec():
    for sn_len in (6, 12):
        p = UmdNrPdu(si=SI_FIRST, sn=33, data=b"abc")
        assert unpack_umd_nr(pack_umd_nr(p, sn_len), sn_len) == p
    full = UmdNrPdu(si=SI_FULL, data=b"whole")
    assert unpack_umd_nr(pack_umd_nr(full)).data == b"whole"


def test_rlc_um_nr_segmentation_reassembly():
    tx, rx = RlcUmNr(), RlcUmNr()
    sdu = bytes(range(256)) * 3
    tx.write_sdu(sdu)
    while tx.has_data():
        pdu = tx.read_pdu(100)
        assert pdu is not None
        rx.write_pdu(pdu)
    assert rx.delivered == [sdu]


def test_rlc_um_nr_out_of_order_segments():
    tx, rx = RlcUmNr(), RlcUmNr()
    sdu = bytes(200)
    tx.write_sdu(sdu)
    pdus = []
    while tx.has_data():
        pdus.append(tx.read_pdu(80))
    for p in reversed(pdus):
        rx.write_pdu(p)
    assert rx.delivered == [sdu]


def test_rlc_um_nr_reassembly_timer_discard():
    tx, rx = RlcUmNr(t_reassembly_ms=10), RlcUmNr(t_reassembly_ms=10)
    tx.write_sdu(bytes(300))
    rx.write_pdu(tx.read_pdu(100))  # only the first segment arrives
    rx.tick(11)
    assert rx.delivered == [] and not rx.rx_segs


def test_rlc_am_nr_arq_with_loss():
    a, b = RlcAmNr(), RlcAmNr()
    sdus = [bytes([i]) * (20 + i) for i in range(10)]
    for s in sdus:
        a.write_sdu(s)
    rng = np.random.default_rng(7)
    # lossy forward channel; lossless reverse for STATUS
    for _ in range(200):
        if a.has_data():
            pdu = a.read_pdu(200)
            if pdu is not None and rng.random() > 0.3:
                b.write_pdu(pdu)
        if b.has_data():
            st = b.read_pdu(200)
            if st is not None:
                a.write_pdu(st)
        a.tick(5)
        b.tick(5)
        if len(b.delivered) == len(sdus):
            break
    assert b.delivered == sdus
    assert not a.max_retx_reached


def test_rlc_am_nr_max_retx():
    a = RlcAmNr(max_retx=2, t_poll_retx_ms=1)
    a.write_sdu(b"x" * 10)
    for _ in range(30):
        a.read_pdu(100)   # transmitted into the void
        a.tick(2)
    assert a.max_retx_reached


@pytest.mark.parametrize("sn_len", [12, 18])
def test_pdcp_nr_cipher_integrity_roundtrip(sn_len):
    key_c, key_i = bytes(range(16)), bytes(range(16, 32))
    tx = PdcpNrEntity(PdcpNrConfig(sn_len=sn_len, cipher_key=key_c,
                                   integrity_key=key_i,
                                   integrity_on_drb=True))
    rx = PdcpNrEntity(PdcpNrConfig(sn_len=sn_len, cipher_key=key_c,
                                   integrity_key=key_i,
                                   integrity_on_drb=True))
    msgs = [f"packet-{i}".encode() for i in range(20)]
    for m in msgs:
        pdu = tx.write_sdu(m, direction=0)
        assert m not in pdu  # ciphered
        rx.write_pdu(pdu, direction=0)
    assert rx.delivered == msgs


def test_pdcp_nr_reordering_and_timer_flush():
    tx = PdcpNrEntity(PdcpNrConfig(sn_len=12))
    rx = PdcpNrEntity(PdcpNrConfig(sn_len=12, t_reordering_ms=20))
    pdus = [tx.write_sdu(bytes([i])) for i in range(5)]
    rx.write_pdu(pdus[0])
    rx.write_pdu(pdus[2])          # gap at 1
    rx.write_pdu(pdus[4])
    assert rx.delivered == [bytes([0])]
    rx.tick(21)                    # t-Reordering flush
    assert rx.delivered == [bytes([0]), bytes([2]), bytes([4])]
    rx.write_pdu(pdus[1])          # stale now
    assert len(rx.delivered) == 3


def test_pdcp_nr_tampered_integrity():
    key_i = bytes(16)
    tx = PdcpNrEntity(PdcpNrConfig(is_srb=True, integrity_key=key_i))
    rx = PdcpNrEntity(PdcpNrConfig(is_srb=True, integrity_key=key_i))
    pdu = bytearray(tx.write_sdu(b"rrc-message"))
    pdu[-1] ^= 0xFF
    rx.write_pdu(bytes(pdu))
    assert rx.delivered == [] and rx.integrity_failures == 1


def test_sdap_header():
    pdu = sdap_pack(b"ip", qfi=9, rdi=True)
    sdu, qfi, rdi, rqi = sdap_unpack(pdu)
    assert (sdu, qfi, rdi, rqi) == (b"ip", 9, True, False)


def _sa_network():
    cfg = UsimConfig()
    hss = Hss()
    hss.add_subscriber(cfg.imsi, cfg.k, cfg.opc)
    amf = Amf(hss=hss)
    gnb = RrcNrGnb()
    ue = RrcNrUe(nas=Nas5gUe(Usim(cfg)))
    q = {"u2g": [], "g2u": [], "g2a": [], "a2g": []}
    ue.tx = lambda l, p: q["u2g"].append((l, p))
    gnb.tx_rrc = lambda r, l, p: q["g2u"].append((r, l, p))
    gnb.tx_ngap = lambda p: q["g2a"].append(p)

    def pump():
        for _ in range(60):
            if not any(q.values()):
                return
            while q["u2g"]:
                l, p = q["u2g"].pop(0)
                if l == 0:
                    gnb.rx_ccch(p)
                else:
                    gnb.rx_dcch(gnb.next_rnti - 1, p)
            while q["g2u"]:
                r, l, p = q["g2u"].pop(0)
                if l == 0:
                    ue.rx_ccch(p)
                else:
                    ue.rx_dcch(p)
            while q["g2a"]:
                q["a2g"].extend(amf.rx_ngap(q["g2a"].pop(0)))
            while q["a2g"]:
                gnb.rx_ngap(q["a2g"].pop(0))

    return ue, gnb, amf, cfg, pump


def test_sa_registration_flow():
    ue, gnb, amf, cfg, pump = _sa_network()
    gnb.ng_setup()
    ue.connect()
    pump()
    assert ue.nas.state == "REGISTERED"
    assert amf.registered_ues() == [cfg.imsi]
    assert ue.nas.ip_addr is not None
    assert "as_security" in ue.events and "as_security" in gnb.events
    assert "n3_tunnel_up" in amf.events


def test_sa_user_plane_sdap_pdcp():
    ue, gnb, amf, cfg, pump = _sa_network()
    gnb.ng_setup()
    ue.connect()
    pump()
    sent = []
    ue.tx = lambda l, p: sent.append((l, p))
    ue.write_drb_sdu(4, b"nr-uplink-ip")
    l, pdu = sent[-1]
    assert b"nr-uplink-ip" not in pdu  # ciphered
    assert gnb.drb_rx(ue.c_rnti, l, pdu) == [b"nr-uplink-ip"]
    dl = gnb.drb_tx(ue.c_rnti, 4, b"nr-downlink-ip")
    assert ue.rx_drb_pdu(4, dl) == [b"nr-downlink-ip"]


def test_sa_unknown_imsi():
    from srsran_4g_tpu.stack import ngap as NG
    from srsran_4g_tpu.stack import nas_5g as N5
    amf = Amf(hss=Hss())
    out = amf.rx_ngap(NG.pack_pdu(
        NG.PROC_INITIAL_UE_MESSAGE, NG.PDU_INITIATING,
        NG.NgInitialUeMessage(ran_ue_id=1, nas_pdu=N5.RegistrationRequest(
            suci="999990000000001").pack())))
    assert out == [] and "unknown_suci" in amf.events
