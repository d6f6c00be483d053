"""Control-plane integration: UE (RRC+NAS+USIM) <-> eNB (RRC+S1AP) <-> EPC.

The framework counterpart of the reference's attach call stack
(SURVEY.md §3.4, test/run_lte.sh): RRCConnectionRequest -> Setup ->
SetupComplete(+AttachRequest) -> S1AP InitialUEMessage -> AKA auth ->
NAS SMC -> InitialContextSetup -> RRC SMC -> Reconfiguration(DRB +
AttachAccept) -> AttachComplete -> InitialContextSetupResponse ->
ModifyBearer; then ciphered user-plane PDCP loopback and RLF handling.
"""

import pytest

from srsran_4g_tpu.stack import rrc_msgs as R
from srsran_4g_tpu.stack import nas_msgs as M
from srsran_4g_tpu.stack import s1ap_msgs as S
from srsran_4g_tpu.stack.epc import Hss, Mme, Spgw
from srsran_4g_tpu.stack.nas_ue import NasUe
from srsran_4g_tpu.stack.rrc_enb import EnbCellConfig, RrcEnb
from srsran_4g_tpu.stack.rrc_ue import RrcUe
from srsran_4g_tpu.stack.usim import Usim, UsimConfig


# ---------------------------------------------------------------------------
# codec round-trips


def test_mib_sib_roundtrip():
    mib = R.Mib(dl_bandwidth=50, phich_resource=2, sfn=504)
    assert R.Mib.unpack(mib.pack()) == mib
    sib1 = R.Sib1(plmn_mcc=901, plmn_mnc=70, tac=0xBEEF, cell_id=0x1234567)
    assert R.Sib1.unpack(sib1.pack()) == sib1
    sib2 = R.Sib2(prach_root_seq=700, t310_ms=2000)
    assert R.Sib2.unpack(sib2.pack()) == sib2


def test_rrc_ccch_dcch_roundtrip():
    req = R.RrcConnectionRequest(ue_identity=0xABCDE12345, establishment_cause=1)
    out = R.unpack_ul_ccch(req.pack())
    assert out == req
    # the C-RNTI is not on the wire (36.331) — only srb1 round-trips
    setup = R.RrcConnectionSetup(rnti=0x4601)
    back = R.unpack_dl_ccch(setup.pack())
    assert back.rnti == 0 and back.srb1 == setup.srb1
    reconf = R.RrcConnectionReconfiguration(
        drbs=[R.DrbToAddMod(drb_id=2, eps_bearer_id=6, lcid=4,
                            rlc_mode="um", pdcp_sn_len=7)],
        nas_pdu=b"\x07\x42\x01", meas_config=True)
    back = R.unpack_dl_dcch(reconf.pack())
    assert back == reconf
    rep = R.MeasReport(rsrp=80, rsrq=20, pci=301)
    assert R.unpack_ul_dcch(rep.pack()) == rep


def test_nas_codec_roundtrip():
    ar = M.AttachRequest(imsi="001010123456789", esm_msg=b"\x02\x01\xd0\x01")
    assert M.AttachRequest.unpack(ar.pack()) == ar
    # odd-digit IMSI too
    ar15 = M.AttachRequest(imsi="90170123456789")
    assert M.AttachRequest.unpack(ar15.pack()).imsi == "90170123456789"
    esm = M.ActivateDefaultEpsBearerRequest(apn="internet",
                                            ip_addr=b"\x0a\x00\x00\x05")
    assert M.ActivateDefaultEpsBearerRequest.unpack(esm.pack()) == esm
    acc = M.AttachAccept(esm_msg=esm.pack(), guti_mtmsi=0xCAFE1234)
    back = M.AttachAccept.unpack(acc.pack())
    assert back.guti_mtmsi == 0xCAFE1234 and back.esm_msg == esm.pack()


def test_nas_protected_framing():
    k_int = bytes(range(16))
    k_enc = bytes(range(16, 32))
    plain = M.DetachRequest().pack()
    pdu = M.pack_protected(plain, k_int, k_enc, count=5,
                           direction=M.NAS_DIR_UL,
                           sec_hdr=M.SEC_INTEGRITY_CIPHERED)
    out, ok, count = M.unpack_protected(pdu, k_int, k_enc, 5, M.NAS_DIR_UL)
    assert ok and count == 5 and out == plain
    # tampered MAC
    bad = pdu[:1] + b"\x00\x00\x00\x00" + pdu[5:]
    _, ok, _ = M.unpack_protected(bad, k_int, k_enc, 5, M.NAS_DIR_UL)
    assert not ok


def test_s1ap_pdu_roundtrip():
    ics = S.InitialContextSetupRequest(
        mme_ue_s1ap_id=77, enb_ue_s1ap_id=3, security_key=bytes(range(32)),
        erabs=[S.ErabToSetup(erab_id=5, qci=9, gtp_teid=0xDEAD,
                             nas_pdu=b"\x07\x42")])
    proc, t, back = S.unpack_pdu(
        S.pack_pdu(S.PROC_INITIAL_CONTEXT_SETUP, S.PDU_INITIATING, ics))
    assert proc == S.PROC_INITIAL_CONTEXT_SETUP
    assert back.security_key == bytes(range(32))
    assert back.erabs[0].gtp_teid == 0xDEAD and back.erabs[0].nas_pdu == b"\x07\x42"


# ---------------------------------------------------------------------------
# full attach


def _wire():
    """Build UE + eNB + EPC with lossless in-process pipes."""
    cfg = UsimConfig()
    hss = Hss()
    hss.add_subscriber(cfg.imsi, cfg.k, cfg.opc)
    mme = Mme(hss=hss)
    enb = RrcEnb(cell=EnbCellConfig())
    ue = RrcUe(nas=NasUe(Usim(cfg)))

    # queues to avoid unbounded recursion
    q_ue2enb, q_enb2ue, q_enb2mme, q_mme2enb = [], [], [], []
    ue.tx = lambda lcid, pdu: q_ue2enb.append((lcid, pdu))
    enb.tx_rrc = lambda rnti, lcid, pdu: q_enb2ue.append((rnti, lcid, pdu))
    enb.tx_s1ap = lambda pdu: q_enb2mme.append(pdu)

    def pump(max_rounds=50):
        for _ in range(max_rounds):
            if not (q_ue2enb or q_enb2ue or q_enb2mme or q_mme2enb):
                return
            while q_ue2enb:
                lcid, pdu = q_ue2enb.pop(0)
                if lcid == 0:
                    enb.rx_ccch(0, pdu)
                else:
                    enb.rx_dcch(enb.next_rnti - 1, lcid, pdu)
            while q_enb2ue:
                rnti, lcid, pdu = q_enb2ue.pop(0)
                if lcid == 0:
                    # MAC temp C-RNTI promotion (36.321): the identity
                    # rides the RAR, not the RRC message
                    ue.c_rnti = rnti or ue.c_rnti
                    ue.rx_ccch(pdu)
                else:
                    ue.rx_dcch(lcid, pdu)
            while q_enb2mme:
                for rsp in mme.rx_s1ap(q_enb2mme.pop(0)):
                    q_mme2enb.append(rsp)
            while q_mme2enb:
                enb.rx_s1ap(q_mme2enb.pop(0))

    return ue, enb, mme, pump


def test_full_attach_flow():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()

    assert ue.state == "CONNECTED"
    assert ue.nas.is_registered()
    assert mme.attached_ues() == [ue.nas.usim.imsi]
    assert "security_activated" in ue.events
    assert "security_activated" in enb.events
    assert ue.nas.ip_addr is not None
    # DRB ready on both sides
    assert ue.drb_lcids == [3]
    ectx = enb.ues[ue.c_rnti]
    assert 3 in ectx.drbs
    # SPGW session has both TEIDs after ModifyBearer
    sess = mme.spgw.sessions[ue.nas.usim.imsi]
    assert sess.enb_teid != 0 and sess.ue_ip == ue.nas.ip_addr
    # keys agree end to end
    assert ectx.k_enb == ue.nas.get_k_enb()


def test_user_plane_ciphered_loopback():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()

    sent = []
    ue.tx = lambda lcid, pdu: sent.append((lcid, pdu))
    # UE -> eNB (UL)
    ue.write_drb_sdu(3, b"ping-payload-1234")
    lcid, pdu = sent[-1]
    assert lcid == 3 and b"ping-payload-1234" not in pdu  # ciphered
    out = enb.drb_rx(ue.c_rnti, 3, pdu)
    assert out == [b"ping-payload-1234"]
    # eNB -> UE (DL)
    dl_pdu = enb.drb_tx(ue.c_rnti, 3, b"pong-payload-5678")
    assert b"pong-payload-5678" not in dl_pdu
    assert ue.rx_drb_pdu(3, dl_pdu) == [b"pong-payload-5678"]


def test_user_plane_through_spgw():
    """IP packet DL: SGi -> SPGW (by dest IP) -> GTP-U TEID -> eNB."""
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    got = []
    mme.spgw.s1u_tx = lambda teid, pkt: got.append((teid, pkt))
    ip = ue.nas.ip_addr
    pkt = bytes(16) + ip + b"payload"  # minimal IPv4-ish: dst at [16:20]
    mme.spgw.rx_sgi(pkt)
    sess = mme.spgw.sessions[ue.nas.usim.imsi]
    assert got == [(sess.enb_teid, pkt)]
    # UL: eNB tunnel -> SGi
    up = []
    mme.spgw.sgi_tx = up.append
    mme.spgw.rx_s1u(sess.spgw_teid, b"ul-ip-packet")
    assert up == [b"ul-ip-packet"]


def test_attach_unknown_imsi_rejected():
    cfg = UsimConfig(imsi="999990000000001")
    mme = Mme(hss=Hss())  # empty HSS
    iue = S.InitialUeMessage(
        enb_ue_s1ap_id=1,
        nas_pdu=M.AttachRequest(imsi=cfg.imsi).pack())
    out = mme.rx_s1ap(S.pack_pdu(S.PROC_INITIAL_UE_MESSAGE,
                                 S.PDU_INITIATING, iue))
    assert out == [] and "unknown_imsi" in mme.events


def test_rlf_t310_reestablishment():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    sent = []
    ue.tx = lambda lcid, pdu: sent.append((lcid, pdu))
    # N310 out-of-sync indications start T310; expiry -> reestablishment
    ue.out_of_sync()
    assert "t310_start" in ue.events
    for _ in range(ue.rlf.t310_ms + 2):
        ue.tick(1)
    assert "rlf" in ue.events and ue.state == "REESTABLISHING"
    assert sent and sent[-1][0] == 0  # reest request on CCCH
    msg = R.unpack_ul_ccch(sent[-1][1])
    assert isinstance(msg, R.RrcConnectionReestablishmentRequest)
    assert msg.c_rnti == ue.c_rnti
    # T311 expiry with no response -> IDLE
    for _ in range(ue.rlf.t311_ms + 2):
        ue.tick(1)
    assert ue.state == "IDLE"


def test_rlf_in_sync_recovery():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    ue.out_of_sync()
    assert ue.t310 >= 0
    ue.in_sync()
    assert ue.t310 == -1 and "t310_stop" in ue.events
    assert ue.state == "CONNECTED"


def test_simulate_rlf_injection():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    ue.simulate_rlf = True
    ue.tick(1)
    assert "rlf_injected" in ue.events and ue.state == "REESTABLISHING"


def test_detach():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    detach = ue.nas.start_detach()
    ue.send_ul_info_transfer(detach)
    pump()
    assert "detach" in mme.events
    assert ue.nas.usim.imsi not in mme.spgw.sessions
