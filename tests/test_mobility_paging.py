"""Mobility (intra-eNB HO), paging, UL scheduler, GTP-C codec.

Reference scenarios: srsenb/test/rrc mobility tests (rrc_mobility.cc),
rrc_paging.cc, sched UL suites, gtpc.cc S11.
"""

from srsran_4g_tpu.stack import gtpc, rrc_msgs as R, s1ap_msgs as S
from srsran_4g_tpu.stack.sched import UlScheduler
from tests.test_attach import _wire


def test_mobility_control_info_roundtrip():
    reconf = R.RrcConnectionReconfiguration(
        mobility=R.MobilityControlInfo(target_pci=301, new_c_rnti=0x5001,
                                       t304_ms=500))
    back = R.unpack_dl_dcch(reconf.pack())
    assert back.mobility == reconf.mobility


def test_paging_roundtrip():
    p = R.Paging(tmsis=[0x12340001, 0xDEADBEEF],
                 system_info_modification=True)
    back = R.Paging.unpack(p.pack())
    assert back == p


def test_intra_enb_handover_via_meas_report():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    old_rnti = ue.c_rnti
    enb.neighbor_pcis = {301}
    # strong neighbor -> A3 -> HO command
    ue.send_meas_report(rsrp_dbm=-70.0, rsrq_db=-8.0, pci=301)
    pump()
    assert any(e.startswith("ho_cmd") for e in enb.events)
    assert f"ho_to_pci301" in ue.events
    assert ue.c_rnti != old_rnti
    assert ue.phys_cell_id == 301
    # context moved under the new rnti at the eNB
    assert ue.c_rnti in enb.ues and old_rnti not in enb.ues
    # user plane still works after HO (PDCP continues)
    sent = []
    ue.tx = lambda lcid, pdu: sent.append((lcid, pdu))
    ue.write_drb_sdu(3, b"post-ho-packet")
    assert enb.drb_rx(ue.c_rnti, 3, sent[-1][1]) == [b"post-ho-packet"]


def test_meas_report_ignores_unknown_neighbor():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    rnti = ue.c_rnti
    ue.send_meas_report(rsrp_dbm=-60.0, rsrq_db=-5.0, pci=999 % 504)
    pump()
    assert ue.c_rnti == rnti  # no HO to unconfigured neighbor


def test_s1_paging_to_pcch():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    pcch = []
    enb.pcch_tx = pcch.append
    for pdu in mme.page_ue(ue.nas.usim.imsi):
        enb.rx_s1ap(pdu)
    assert pcch, "paging PCCH not broadcast"
    assert ue.rx_pcch(pcch[0]) is True
    assert "paged" in ue.events
    # a different UE's TMSI does not page us
    other = R.Paging(tmsis=[0x11111111]).pack()
    assert ue.rx_pcch(other) is False


def test_ul_scheduler_grants_and_arq():
    s = UlScheduler(nof_prb=50)
    s.ue_cfg(0x46)
    s.ul_bsr(0x46, 2000)
    s.ul_cqi_info(0x46, 12)
    grants = s.get_ul_sched(tti=0)
    assert len(grants) == 1
    g = grants[0]
    assert g.tbs >= 2000 * 8 or g.prb_len == 48  # meets BSR or max alloc
    assert 1 <= g.prb_start and g.prb_start + g.prb_len <= 49  # PUCCH guard
    assert g.harq_pid == 4  # synchronous UL HARQ: pid = (tti+4) % 8
    # CRC KO -> non-adaptive retx with rv 2, 8 TTIs later (same process)
    s.ul_crc_info(0x46, g.harq_pid, False)
    assert not s.get_ul_sched(tti=1)  # process 5 has nothing pending
    r = s.get_ul_sched(tti=8)[0]
    assert r.is_retx and r.rv == 2 and r.tbs == g.tbs
    # CRC OK clears the process
    s.ul_crc_info(0x46, g.harq_pid, True)
    assert not s.ues[0x46].harq[g.harq_pid].active


def test_ul_scheduler_multi_ue_no_overlap():
    s = UlScheduler(nof_prb=25)
    for r in (1, 2, 3):
        s.ue_cfg(r)
        s.ul_bsr(r, 10000)
    grants = s.get_ul_sched(0)
    spans = sorted((g.prb_start, g.prb_start + g.prb_len) for g in grants)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0


def test_gtpc_codec_roundtrips():
    req = gtpc.CreateSessionRequest(imsi="001010123456789",
                                    sender_teid=0xAA55, seq=7)
    back = gtpc.unpack(req.pack())
    assert back == req
    rsp = gtpc.CreateSessionResponse(spgw_teid=42, ue_ip=b"\xac\x10\x00\x05",
                                     seq=7)
    back = gtpc.unpack(rsp.pack())
    assert back.spgw_teid == 42 and back.ue_ip == b"\xac\x10\x00\x05"
    mb = gtpc.ModifyBearerRequest(spgw_teid=42, enb_teid=0x1000, seq=8)
    back = gtpc.unpack(mb.pack())
    assert back.enb_teid == 0x1000 and back.spgw_teid == 42
    ds = gtpc.DeleteSessionRequest(spgw_teid=42, seq=9)
    assert gtpc.unpack(ds.pack()).spgw_teid == 42


def test_rlf_reestablishment_accepted():
    """After RLF, a known UE with active security is reestablished
    (36.331 5.3.7) instead of dropping to IDLE."""
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    ue.phys_cell_id = enb.cell.pci  # camped on this cell
    ue.out_of_sync()
    for _ in range(ue.rlf.t310_ms + 2):
        ue.tick(1)
    assert ue.state == "REESTABLISHING"
    pump()  # reest request -> eNB accept -> UE back to CONNECTED
    assert ue.state == "CONNECTED"
    assert "reestablished" in ue.events
    assert any(e.startswith("reest_accept") for e in enb.events)
    # context moved to the new rnti
    assert ue.c_rnti in enb.ues


def test_reestablishment_unknown_ue_rejected():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    from srsran_4g_tpu.stack import rrc_msgs as R
    pdus = []
    enb.tx_rrc = lambda rnti, lcid, pdu: pdus.append((rnti, lcid, pdu))
    enb.rx_ccch(0, R.RrcConnectionReestablishmentRequest(
        c_rnti=0x9999, phys_cell_id=enb.cell.pci).pack())
    assert isinstance(R.unpack_dl_ccch(pdus[-1][2]),
                      R.RrcConnectionReestablishmentReject)
