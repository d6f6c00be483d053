"""eNB MAC entity unit tests (srsenb/src/stack/mac/mac.cc contract)."""

from srsran_4g_tpu.models import ra
from srsran_4g_tpu.stack import mac_pdu
from srsran_4g_tpu.stack.enb_mac import (EnbMac, MSG3_DELAY,
                                         pack_rar_ul_grant,
                                         unpack_rar_ul_grant)


def test_rar_grant_roundtrip():
    for prb in (6, 25, 100):
        g = pack_rar_ul_grant(prb, 2, 2, 5)
        st, ln, mcs, tbs = unpack_rar_ul_grant(prb, g)
        assert (st, ln, mcs) == (2, 2, 5)
        assert tbs == ra.tbs_from_itbs(ra.ul_mcs_to_itbs(5), 2)
        assert g < (1 << 20)  # fits the RAR 20-bit grant field


def test_rach_to_rar_to_msg3():
    m = EnbMac(nof_prb=25)
    rnti = m.rach_detected(tti=7, preamble=13)
    assert rnti in m.ues
    items = m.get_dl_sched(8)
    assert len(items) == 1 and items[0].is_rar
    assert items[0].grant.rnti == 1 + 7 % 10  # RA-RNTI from the PRACH tti
    _, grants = mac_pdu.unpack_rar(items[0].pdu)
    assert grants[0].rapid == 13 and grants[0].temp_crnti == rnti
    # msg3 expected MSG3_DELAY after the RAR
    ul = m.get_ul_sched(8 + MSG3_DELAY)
    assert len(ul) == 1 and ul[0].is_msg3 and ul[0].grant.rnti == rnti


def test_ccch_contention_and_dl_pdu_assembly():
    m = EnbMac(nof_prb=25)
    seen = []
    m.rx_ccch = lambda rnti, pdu: seen.append((rnti, pdu)) or rnti
    rnti = m.rach_detected(0, 1)
    assert m.get_dl_sched(1)[0].is_rar  # drain the pending RAR
    msg3 = mac_pdu.MacPdu()
    msg3.add_sdu(0, b"\x5a" * 8)
    m.push_pdu(rnti, mac_pdu.pack(msg3, 16, ul=True))
    assert seen and seen[0][0] == rnti
    # duplicate msg3 (HARQ retx) must not re-trigger CCCH
    m.push_pdu(rnti, mac_pdu.pack(msg3, 16, ul=True))
    assert len(seen) == 1
    # msg4 carries the contention-resolution CE with the msg3 SDU prefix
    m.write_dl_sdu(rnti, 0, b"setup-msg")
    items = m.get_dl_sched(2)
    assert len(items) == 1
    up = mac_pdu.unpack(items[0].pdu)
    ces = [s for s in up.subpdus if not s.is_sdu]
    assert any(s.lcid == mac_pdu.LCID_CON_RES and
               s.payload[:6] == (b"\x5a" * 8)[:6] for s in ces)
    sdus = [s for s in up.subpdus if s.is_sdu and s.lcid == 0]
    assert sdus and sdus[0].payload == b"setup-msg"
    # DCI carries the allocation the grant describes
    d = items[0].dci
    assert ra.dl_tbs(d.mcs, d.l_crbs) == items[0].grant.tbs


def test_dl_harq_retx_uses_buffered_pdu():
    m = EnbMac(nof_prb=25)
    rnti = m.rach_detected(0, 1)
    assert m.get_dl_sched(1)[0].is_rar
    m.ues[rnti].con_res_done = True
    m.write_dl_sdu(rnti, 3, b"payload-x" * 10)
    items = m.get_dl_sched(10)
    assert items and not items[0].is_rar
    g = items[0].grant
    first_pdu = items[0].pdu
    # NACK → retransmission of the SAME bytes with the next rv
    m.dl_ack_info(rnti, g.harq_pid, False)
    retx = m.get_dl_sched(11)
    assert retx and retx[0].grant.is_retx
    assert retx[0].pdu == first_pdu
    assert retx[0].grant.rv == 2 and retx[0].grant.ndi == g.ndi
    # ACK clears the buffer
    m.dl_ack_info(rnti, g.harq_pid, True)
    assert (0, g.harq_pid) not in m.ues[rnti].dl_pdu_buf


def test_ul_bsr_triggers_grant_and_sync_harq_pid():
    m = EnbMac(nof_prb=25)
    rnti = m.rach_detected(0, 1)
    assert m.get_dl_sched(1)[0].is_rar
    assert m.get_ul_sched(1 + MSG3_DELAY)[0].is_msg3  # drain msg3
    m.ues[rnti].con_res_done = True
    m.ul_bsr(rnti, 100)
    tti = 16
    ul = m.get_ul_sched(tti)
    assert ul and ul[0].grant.rnti == rnti
    assert ul[0].grant.harq_pid == (tti + 4) % 8  # synchronous UL HARQ
    assert ul[0].dci is not None
    # CRC KO → synchronous retx 8 TTIs later, same pid, next rv
    m.crc_info(tti + 4, rnti, ul[0].grant.harq_pid, False)
    assert not m.get_ul_sched(tti + 1)  # wrong process, no data
    retx = m.get_ul_sched(tti + 8)
    assert retx and retx[0].grant.is_retx
    assert retx[0].grant.harq_pid == ul[0].grant.harq_pid
    assert retx[0].grant.rv == 2


def test_ul_mac_pdu_bsr_ce_parsed():
    from srsran_4g_tpu.stack.ue_mac import BSR_TABLE, buff_size_index

    m = EnbMac(nof_prb=25)
    rnti = m.rach_detected(0, 1)
    m.ues[rnti].con_res_done = True
    pdu = mac_pdu.MacPdu()
    pdu.add_ce(mac_pdu.LCID_SHORT_BSR, bytes([buff_size_index(500) & 0x3F]))
    pdu.add_sdu(3, b"data")
    m.push_pdu(rnti, mac_pdu.pack(pdu, 32, ul=True))
    assert m.ul_sched.ues[rnti].buffer_bytes == BSR_TABLE[buff_size_index(500)]
