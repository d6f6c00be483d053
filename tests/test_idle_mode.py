"""Idle-mode NAS procedures: UE context release → service request →
context re-setup, and tracking area update (reference: srsue nas.cc
service request / TAU, srsepc mme nas.cc handlers)."""

from srsran_4g_tpu.stack import nas_msgs as M
from srsran_4g_tpu.stack import s1ap_msgs as S
from srsran_4g_tpu.stack.epc import Hss, Mme
from srsran_4g_tpu.stack.nas_ue import NasUe
from srsran_4g_tpu.stack.usim import Usim, UsimConfig

K = bytes(range(16))
OPC = bytes(range(16, 32))
IMSI = "001010123456789"


def _attach() -> tuple[NasUe, Mme, int]:
    hss = Hss()
    hss.add_subscriber(IMSI, K, OPC)
    mme = Mme(hss=hss)
    ue = NasUe(usim=Usim(UsimConfig(imsi=IMSI, k=K, opc=OPC)))
    enb_id = 7
    dl = mme.rx_s1ap(S.pack_pdu(
        S.PROC_INITIAL_UE_MESSAGE, S.PDU_INITIATING,
        S.InitialUeMessage(enb_ue_s1ap_id=enb_id,
                           nas_pdu=ue.start_attach())))
    # run the NAS ping-pong until both sides settle
    for _ in range(8):
        ups = []
        for pdu in dl:
            proc, _, msg = S.unpack_pdu(pdu)
            if proc == S.PROC_DOWNLINK_NAS_TRANSPORT:
                ups += ue.rx(msg.nas_pdu)
            elif proc == S.PROC_INITIAL_CONTEXT_SETUP:
                ups += ue.rx(msg.erabs[0].nas_pdu)
                # eNB confirms the context setup
                mme.rx_s1ap(S.pack_pdu(
                    S.PROC_INITIAL_CONTEXT_SETUP, S.PDU_SUCCESSFUL,
                    S.InitialContextSetupResponse(
                        mme_ue_s1ap_id=msg.mme_ue_s1ap_id,
                        enb_ue_s1ap_id=enb_id,
                        erabs=[S.ErabSetupItem(gtp_teid=0x42)])))
        if not ups:
            break
        dl = []
        for up in ups:
            dl += mme.rx_s1ap(S.pack_pdu(
                S.PROC_UPLINK_NAS_TRANSPORT, S.PDU_INITIATING,
                S.NasTransport(mme_ue_s1ap_id=1, enb_ue_s1ap_id=enb_id,
                               nas_pdu=up)))
    assert ue.is_registered()
    assert mme.attached_ues() == [IMSI]
    return ue, mme, 1


def test_service_request_after_idle():
    ue, mme, mme_id = _attach()
    mtmsi = ue.guti_mtmsi
    assert mtmsi and mme.ues[mme_id].mtmsi == mtmsi
    # eNB releases the UE context → ECM-IDLE, session survives
    mme.rx_s1ap(S.pack_pdu(S.PROC_UE_CONTEXT_RELEASE, S.PDU_INITIATING,
                           S.UeContextRelease(mme_ue_s1ap_id=mme_id)))
    assert mme.ues[mme_id].ecm_state == "IDLE"
    assert mme.attached_ues() == [IMSI]
    # service request restores the connection and re-establishes the E-RAB
    sr = ue.start_service_request()
    assert M.is_service_request(sr)
    out = mme.rx_s1ap(S.pack_pdu(
        S.PROC_INITIAL_UE_MESSAGE, S.PDU_INITIATING,
        S.InitialUeMessage(enb_ue_s1ap_id=9, nas_pdu=sr, mtmsi=mtmsi)))
    assert len(out) == 1
    proc, _, ics = S.unpack_pdu(out[0])
    assert proc == S.PROC_INITIAL_CONTEXT_SETUP
    assert ics.erabs and ics.erabs[0].gtp_teid
    assert mme.ues[mme_id].ecm_state == "CONNECTED"
    assert "service_request" in mme.events


def test_service_request_bad_mac_rejected():
    ue, mme, mme_id = _attach()
    sr = bytearray(ue.start_service_request())
    sr[3] ^= 0xFF  # corrupt the short MAC
    out = mme.rx_s1ap(S.pack_pdu(
        S.PROC_INITIAL_UE_MESSAGE, S.PDU_INITIATING,
        S.InitialUeMessage(enb_ue_s1ap_id=9, nas_pdu=bytes(sr),
                           mtmsi=ue.guti_mtmsi)))
    proc, _, msg = S.unpack_pdu(out[0])
    assert proc == S.PROC_DOWNLINK_NAS_TRANSPORT
    rej = M.parse(msg.nas_pdu)
    assert isinstance(rej, M.ServiceReject)
    # UE handles the reject by falling back to DEREGISTERED
    ue.rx(msg.nas_pdu)
    assert not ue.is_registered()


def test_service_request_unknown_mtmsi_rejected():
    ue, mme, _ = _attach()
    out = mme.rx_s1ap(S.pack_pdu(
        S.PROC_INITIAL_UE_MESSAGE, S.PDU_INITIATING,
        S.InitialUeMessage(enb_ue_s1ap_id=9,
                           nas_pdu=ue.start_service_request(),
                           mtmsi=0xDEAD)))
    proc, _, msg = S.unpack_pdu(out[0])
    assert isinstance(M.parse(msg.nas_pdu), M.ServiceReject)


def test_tracking_area_update():
    ue, mme, mme_id = _attach()
    old_mtmsi = ue.guti_mtmsi
    tau = ue.start_tau()
    assert ue.tau_pending
    out = mme.rx_s1ap(S.pack_pdu(
        S.PROC_UPLINK_NAS_TRANSPORT, S.PDU_INITIATING,
        S.NasTransport(mme_ue_s1ap_id=mme_id, enb_ue_s1ap_id=7,
                       nas_pdu=tau)))
    proc, _, msg = S.unpack_pdu(out[0])
    assert proc == S.PROC_DOWNLINK_NAS_TRANSPORT
    comp = ue.rx(msg.nas_pdu)
    assert not ue.tau_pending
    assert ue.guti_mtmsi != old_mtmsi          # fresh GUTI assigned
    assert ue.guti_mtmsi == mme.ues[mme_id].mtmsi
    # TAU complete closes the procedure at the MME
    mme.rx_s1ap(S.pack_pdu(
        S.PROC_UPLINK_NAS_TRANSPORT, S.PDU_INITIATING,
        S.NasTransport(mme_ue_s1ap_id=mme_id, enb_ue_s1ap_id=7,
                       nas_pdu=comp[0])))
    assert "tau_complete" in mme.events


def test_idle_tau_via_initial_ue_message():
    ue, mme, mme_id = _attach()
    mme.rx_s1ap(S.pack_pdu(S.PROC_UE_CONTEXT_RELEASE, S.PDU_INITIATING,
                           S.UeContextRelease(mme_ue_s1ap_id=mme_id)))
    tau = ue.start_tau()
    out = mme.rx_s1ap(S.pack_pdu(
        S.PROC_INITIAL_UE_MESSAGE, S.PDU_INITIATING,
        S.InitialUeMessage(enb_ue_s1ap_id=11, nas_pdu=tau,
                           mtmsi=ue.guti_mtmsi)))
    proc, _, msg = S.unpack_pdu(out[0])
    ue.rx(msg.nas_pdu)
    assert not ue.tau_pending
    assert mme.ues[mme_id].ecm_state == "CONNECTED"
