"""TFT packet filters + dedicated EPS bearers.

Counterpart of the reference's TFT matching in
`srsue/src/stack/upper/tft_packet_filter.cc` (24.008 §10.5.6.12) and the
gw's apply_traffic_flow_template bearer steering; plus the NAS dedicated
bearer activation flow (24.301 8.3.3) end to end through the MME.
"""

import struct

from srsran_4g_tpu.stack import nas_msgs as M
from srsran_4g_tpu.stack import tft


def _ipv4(src, dst, proto=17, tos=0, sport=1000, dport=2000):
    hdr = bytearray(20)
    hdr[0] = 0x45
    hdr[1] = tos
    hdr[9] = proto
    hdr[12:16] = tft._ip4(src)
    hdr[16:20] = tft._ip4(dst)
    return bytes(hdr) + struct.pack("!HH", sport, dport) + b"\x00" * 12


def test_filter_codec_roundtrip():
    f = (tft.TftFilter(filter_id=3, eval_precedence=7,
                       direction=tft.DIR_UPLINK)
         .add_ipv4_remote("10.0.0.0", "255.0.0.0")
         .add_protocol(tft.UDP_PROTOCOL)
         .add_remote_port_range(5000, 5100)
         .add_tos(0x2E, 0xFC))
    wire = tft.pack_tft([f])
    back = tft.parse_tft(wire, eps_bearer_id=6)
    assert len(back) == 1
    g = back[0]
    assert g.filter_id == 3 and g.eval_precedence == 7
    assert g.direction == tft.DIR_UPLINK and g.eps_bearer_id == 6
    assert g.ipv4_remote == (b"\x0a\x00\x00\x00", b"\xff\x00\x00\x00")
    assert g.protocol_id == tft.UDP_PROTOCOL
    assert g.remote_port_range == (5000, 5100)
    assert g.tos == (0x2E, 0xFC)
    assert g.pack() == f.pack()


def test_component_matching():
    f = (tft.TftFilter().add_ipv4_remote("10.1.2.3")
         .add_protocol(tft.UDP_PROTOCOL).add_single_remote_port(2000))
    assert f.match(_ipv4("172.16.0.2", "10.1.2.3"))
    assert not f.match(_ipv4("172.16.0.2", "10.1.2.4"))       # wrong dst
    assert not f.match(_ipv4("172.16.0.2", "10.1.2.3", proto=6))
    assert not f.match(_ipv4("172.16.0.2", "10.1.2.3", dport=2001))
    # masked subnet match
    sub = tft.TftFilter().add_ipv4_remote("10.1.0.0", "255.255.0.0")
    assert sub.match(_ipv4("1.1.1.1", "10.1.200.9"))
    assert not sub.match(_ipv4("1.1.1.1", "10.2.0.1"))
    # ToS with mask
    t = tft.TftFilter().add_tos(0x2E, 0xFC)
    assert t.match(_ipv4("1.1.1.1", "2.2.2.2", tos=0x2F))     # masked bits equal
    assert not t.match(_ipv4("1.1.1.1", "2.2.2.2", tos=0x10))
    # port filter on a non-UDP/TCP packet never matches (reference :317)
    p = tft.TftFilter().add_single_remote_port(2000)
    assert not p.match(_ipv4("1.1.1.1", "2.2.2.2", proto=1))
    # empty filter matches nothing (reference match() :199)
    assert not tft.TftFilter().match(_ipv4("1.1.1.1", "2.2.2.2"))


def test_matcher_precedence_and_default():
    m = tft.TftMatcher(default_bearer_id=5)
    voice = (tft.TftFilter(eval_precedence=1)
             .add_protocol(tft.UDP_PROTOCOL).add_remote_port_range(4000, 4999))
    video = (tft.TftFilter(eval_precedence=2)
             .add_protocol(tft.UDP_PROTOCOL).add_remote_port_range(4000, 5999))
    m.apply_tft(7, [video])
    m.apply_tft(6, [voice])
    # precedence 1 (bearer 6) wins inside the overlap
    assert m.lookup(_ipv4("1.1.1.1", "2.2.2.2", dport=4500)) == 6
    assert m.lookup(_ipv4("1.1.1.1", "2.2.2.2", dport=5500)) == 7
    assert m.lookup(_ipv4("1.1.1.1", "2.2.2.2", dport=80)) == 5
    # downlink-only filters are skipped for UL
    dl = tft.TftFilter(eval_precedence=0, direction=tft.DIR_DOWNLINK) \
        .add_single_remote_port(4500)
    m.apply_tft(8, [dl])
    assert m.lookup(_ipv4("1.1.1.1", "2.2.2.2", dport=4500)) == 6
    m.remove_bearer(6)
    assert m.lookup(_ipv4("1.1.1.1", "2.2.2.2", dport=4500)) == 7


def test_nas_dedicated_bearer_codec():
    f = tft.TftFilter(filter_id=1).add_single_remote_port(7000)
    msg = M.ActivateDedicatedEpsBearerRequest(
        eps_bearer_id=6, linked_ebi=5, qci=1, tft=tft.pack_tft([f]))
    back = M.parse(msg.pack())
    assert isinstance(back, M.ActivateDedicatedEpsBearerRequest)
    assert back.eps_bearer_id == 6 and back.linked_ebi == 5 and back.qci == 1
    flt = tft.parse_tft(back.tft)[0]
    assert flt.single_remote_port == 7000
    acc = M.parse(M.ActivateDedicatedEpsBearerAccept(eps_bearer_id=6).pack())
    assert isinstance(acc, M.ActivateDedicatedEpsBearerAccept)


def test_dedicated_bearer_e2e_through_attach():
    """Full attach, then network-initiated dedicated bearer with TFT; the
    UE installs the filters and steers matching UL packets to the new
    bearer."""
    from srsran_4g_tpu.stack import s1ap_msgs as S
    from srsran_4g_tpu.stack.epc import Hss, Mme
    from srsran_4g_tpu.stack.nas_ue import NasUe
    from srsran_4g_tpu.stack.usim import Usim, UsimConfig

    ucfg = UsimConfig()
    hss = Hss()
    hss.add_subscriber(ucfg.imsi, ucfg.k, ucfg.opc)
    mme = Mme(hss=hss)
    nas = NasUe(Usim(ucfg))

    # --- attach via direct NAS relay (s1ap framing as in test_attach.py)
    ul = nas.start_attach()
    enb_ue_id = 1
    dl_queue = mme.rx_s1ap(S.pack_pdu(
        S.PROC_INITIAL_UE_MESSAGE, S.PDU_INITIATING,
        S.InitialUeMessage(enb_ue_s1ap_id=enb_ue_id, nas_pdu=ul)))
    mme_ue_id = None
    for _ in range(8):
        new_dl = []
        for pdu in dl_queue:
            proc, _, body = S.unpack_pdu(pdu)
            if proc == S.PROC_DOWNLINK_NAS_TRANSPORT:
                mme_ue_id = body.mme_ue_s1ap_id
                for up in nas.rx(body.nas_pdu):
                    new_dl += mme.rx_s1ap(S.pack_pdu(
                        S.PROC_UPLINK_NAS_TRANSPORT, S.PDU_INITIATING,
                        S.NasTransport(mme_ue_s1ap_id=body.mme_ue_s1ap_id,
                                       enb_ue_s1ap_id=enb_ue_id,
                                       nas_pdu=up)))
            elif proc == S.PROC_INITIAL_CONTEXT_SETUP:
                mme_ue_id = body.mme_ue_s1ap_id
                for up in nas.rx(body.erabs[0].nas_pdu):
                    new_dl += mme.rx_s1ap(S.pack_pdu(
                        S.PROC_UPLINK_NAS_TRANSPORT, S.PDU_INITIATING,
                        S.NasTransport(mme_ue_s1ap_id=body.mme_ue_s1ap_id,
                                       enb_ue_s1ap_id=enb_ue_id,
                                       nas_pdu=up)))
        dl_queue = new_dl
        if not dl_queue:
            break
    assert nas.is_registered()

    # --- network-initiated dedicated bearer (QCI 1, RTP ports)
    f = (tft.TftFilter(filter_id=1, eval_precedence=1)
         .add_protocol(tft.UDP_PROTOCOL).add_remote_port_range(4000, 4999))
    pdus = mme.activate_dedicated_bearer(ucfg.imsi, ebi=6, qci=1, filters=[f])
    assert len(pdus) == 1
    proc, _, body = S.unpack_pdu(pdus[0])
    ul_pdus = nas.rx(body.nas_pdu)
    assert 6 in nas.dedicated_bearers
    assert any(e.startswith("dedicated_bearer:6") for e in nas.events)
    # accept flows back
    for up in ul_pdus:
        mme.rx_s1ap(S.pack_pdu(
            S.PROC_UPLINK_NAS_TRANSPORT, S.PDU_INITIATING,
            S.NasTransport(mme_ue_s1ap_id=mme_ue_id, enb_ue_s1ap_id=enb_ue_id,
                           nas_pdu=up)))
    assert any(e == "dedicated_bearer_accept:6" for e in mme.events)

    # --- UL steering: RTP-range packet → bearer 6, web traffic → default
    rtp = _ipv4("172.16.0.2", "8.8.8.8", dport=4100)
    web = _ipv4("172.16.0.2", "8.8.8.8", proto=6, dport=443)
    assert nas.tft_matcher.lookup(rtp) == 6
    assert nas.tft_matcher.lookup(web) == nas.eps_bearer_id
