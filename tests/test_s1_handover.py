"""S1 (inter-eNB) handover through the MME.

Reference scenario: srsenb/test/rrc rrc_mobility_test.cc
(test_s1ap_tenb_mobility / s1_source_ho_st in rrc_mobility.cc) plus the
MME-side HandoverRequired -> HandoverRequest -> HandoverCommand ->
HandoverNotify relay of 36.413 8.4, including the vertical {NH, NCC}
K_eNB* re-keying of 33.401 7.2.8.4 and PDCP COUNT continuation via the
eNB/MME Status Transfer.
"""

from srsran_4g_tpu.stack.epc import Hss, Mme
from srsran_4g_tpu.stack.nas_ue import NasUe
from srsran_4g_tpu.stack.rrc_enb import EnbCellConfig, RrcEnb
from srsran_4g_tpu.stack.rrc_ue import RrcUe
from srsran_4g_tpu.stack.usim import Usim, UsimConfig


def _wire2():
    """UE + two eNBs (global ids 1, 2) + one MME with S1 fan-out."""
    cfg = UsimConfig()
    hss = Hss()
    hss.add_subscriber(cfg.imsi, cfg.k, cfg.opc)
    mme = Mme(hss=hss)
    enb1 = RrcEnb(cell=EnbCellConfig(pci=1))
    enb2 = RrcEnb(cell=EnbCellConfig(pci=301, cell_id=0x02,
                                     enb_s1u_teid_base=0x2000))
    ue = RrcUe(nas=NasUe(Usim(cfg)))
    enbs = {1: enb1, 2: enb2}

    q_ue, q_dl, q_s1 = [], [], []   # (lcid,pdu) / (enb,rnti,lcid,pdu) / (enb_id,pdu)
    ue.tx = lambda lcid, pdu: q_ue.append((lcid, pdu))
    enb1.tx_rrc = lambda rnti, lcid, pdu: q_dl.append((enb1, rnti, lcid, pdu))
    enb2.tx_rrc = lambda rnti, lcid, pdu: q_dl.append((enb2, rnti, lcid, pdu))
    enb1.tx_s1ap = lambda pdu: q_s1.append((1, pdu))
    enb2.tx_s1ap = lambda pdu: q_s1.append((2, pdu))

    def serving():
        return enb1 if ue.phys_cell_id == enb1.cell.pci else enb2

    def pump(max_rounds=80):
        for _ in range(max_rounds):
            if not (q_ue or q_dl or q_s1 or mme.outbox):
                return
            while q_ue:
                lcid, pdu = q_ue.pop(0)
                enb = serving()
                if lcid == 0:
                    enb.rx_ccch(0, pdu)
                else:
                    enb.rx_dcch(ue.c_rnti, lcid, pdu)
            while q_dl:
                enb, rnti, lcid, pdu = q_dl.pop(0)
                if lcid == 0:
                    # MAC temp C-RNTI promotion (36.321): the identity
                    # rides the RAR, not the RRC message
                    ue.c_rnti = rnti or ue.c_rnti
                    ue.rx_ccch(pdu)
                else:
                    ue.rx_dcch(lcid, pdu)
            while q_s1:
                enb_id, pdu = q_s1.pop(0)
                for rsp in mme.rx_s1ap(pdu, enb_id=enb_id):
                    mme.outbox.append((enb_id, rsp))
            while mme.outbox:
                enb_id, pdu = mme.outbox.pop(0)
                enbs[enb_id].rx_s1ap(pdu)

    return ue, enb1, enb2, mme, pump


def _attach(ue, enb1, enb2, pump):
    enb1.s1_setup()
    enb2.s1_setup()
    ue.connect()
    pump()
    assert ue.nas.is_registered()


def test_s1_handover_full_flow():
    ue, enb1, enb2, mme, pump = _wire2()
    _attach(ue, enb1, enb2, pump)
    src_rnti = ue.c_rnti

    # advance user-plane PDCP COUNTs before the handover
    for i in range(3):
        ue.write_drb_sdu(3, b"pre-ho-%d" % i)
    pump()
    sent = []
    ue.tx = lambda lcid, pdu: sent.append((lcid, pdu))
    ue.write_drb_sdu(3, b"ul-counts")
    assert enb1.drb_rx(src_rnti, 3, sent[-1][1]) == [b"ul-counts"]
    dl_before = enb1.ues[src_rnti].drbs[3].tx_count

    # rewire UE uplink back into the pump queues
    q = []
    ue.tx = lambda lcid, pdu: q.append((lcid, pdu))

    def drain_ue():
        while q:
            lcid, pdu = q.pop(0)
            enb = enb1 if ue.phys_cell_id == enb1.cell.pci else enb2
            if lcid == 0:
                enb.rx_ccch(0, pdu)
            else:
                enb.rx_dcch(ue.c_rnti, lcid, pdu)
        pump()

    # A3 report for the other eNB's PCI -> S1 handover
    enb1.s1_neighbors = {301: 2}
    ue.send_meas_report(rsrp_dbm=-70.0, rsrq_db=-8.0, pci=301)
    for _ in range(6):
        drain_ue()

    # signalling milestones on every node
    assert any(e.startswith("s1_ho_required") for e in enb1.events)
    assert "ho_request" in mme.events and "ho_command" in mme.events
    assert "s1_ho_request_ack" in enb2.events
    assert "s1_ho_command_fwd" in enb1.events
    assert "mme_status_transfer" in mme.events
    assert "s1_ho_counts_set" in enb2.events
    assert "rekey ncc=1" in ue.events
    assert "ho_to_pci301" in ue.events
    assert "ho_complete" in enb2.events
    assert "path_switch" in mme.events

    # UE moved: target has the context, source released it
    assert ue.phys_cell_id == 301
    tgt = enb2.ues[ue.c_rnti]
    assert tgt.state == "ACTIVE"
    assert src_rnti not in enb1.ues

    # vertical re-keying agrees end to end
    assert tgt.k_up_enc == ue.k_up_enc
    assert tgt.k_rrc_int == ue.k_rrc_int

    # SPGW path switched to the target eNB's DL TEID
    sess = mme.spgw.sessions[ue.nas.usim.imsi]
    assert sess.enb_teid == tgt.erab_teids[5]
    assert sess.enb_teid >= 0x2000  # allocated by the target

    # user plane continues: UL with continued COUNTs deciphers at target
    sent.clear()
    ue.tx = lambda lcid, pdu: sent.append((lcid, pdu))
    ue.write_drb_sdu(3, b"post-ho-ul")
    assert enb2.drb_rx(ue.c_rnti, 3, sent[-1][1]) == [b"post-ho-ul"]
    # DL continues where the source's COUNT left off
    assert tgt.drbs[3].tx_count == dl_before
    assert ue.rx_drb_pdu(3, enb2.drb_tx(ue.c_rnti, 3, b"post-ho-dl")) \
        == [b"post-ho-dl"]


def test_s1_handover_unknown_ue_ignored():
    ue, enb1, enb2, mme, pump = _wire2()
    _attach(ue, enb1, enb2, pump)
    from srsran_4g_tpu.stack import s1ap_msgs as S
    n = len(mme.outbox)
    mme.rx_s1ap(S.pack_pdu(S.PROC_HANDOVER_REQUIRED, S.PDU_INITIATING,
                           S.HandoverRequired(mme_ue_s1ap_id=999,
                                              target_enb_id=2)), enb_id=1)
    assert "ho_required_unknown_ue" in mme.events
    assert len(mme.outbox) == n  # nothing forwarded


def test_handover_codecs_roundtrip():
    from srsran_4g_tpu.stack import s1ap_msgs as S
    for proc, pdu_type, msg in [
        (S.PROC_HANDOVER_REQUIRED, S.PDU_INITIATING,
         S.HandoverRequired(mme_ue_s1ap_id=7, enb_ue_s1ap_id=3,
                            target_enb_id=2, container=b"ctx")),
        (S.PROC_HANDOVER_REQUEST, S.PDU_INITIATING,
         S.HandoverRequest(mme_ue_s1ap_id=7, security_key=bytes(range(32)),
                           ncc=3, erabs=[S.ErabToSetup(erab_id=5, qci=9,
                                                       gtp_teid=0xAB)],
                           container=b"as-config")),
        (S.PROC_HANDOVER_REQUEST, S.PDU_SUCCESSFUL,
         S.HandoverRequestAcknowledge(mme_ue_s1ap_id=7, enb_ue_s1ap_id=9,
                                      erabs=[S.ErabSetupItem(erab_id=5,
                                                             gtp_teid=0xCD)],
                                      container=b"ho-cmd")),
        (S.PROC_HANDOVER_REQUIRED, S.PDU_SUCCESSFUL,
         S.HandoverCommand(mme_ue_s1ap_id=7, enb_ue_s1ap_id=3,
                           container=b"ho-cmd")),
        (S.PROC_ENB_STATUS_TRANSFER, S.PDU_INITIATING,
         S.StatusTransfer(mme_ue_s1ap_id=7, enb_ue_s1ap_id=3,
                          bearers=[S.BearerStatus(erab_id=5, ul_count=17,
                                                  dl_count=41)])),
        (S.PROC_HANDOVER_NOTIFY, S.PDU_INITIATING,
         S.HandoverNotify(mme_ue_s1ap_id=7, enb_ue_s1ap_id=9, tac=0x2,
                          cell_id=0x5)),
    ]:
        p, t, back = S.unpack_pdu(S.pack_pdu(proc, pdu_type, msg))
        assert (p, t) == (proc, pdu_type)
        assert back == msg
