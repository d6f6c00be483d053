"""UE NR MAC entity (srsue/src/stack/mac_nr/ contract): proc_ra_nr,
16-process HARQ, NR MAC subPDU mux/demux, BSR."""

from srsran_4g_tpu.stack import mac_pdu_nr as MAC
from srsran_4g_tpu.stack.ue_mac_nr import (DlGrantNr, LogicalChannelNr,
                                           UeMacNr, UlGrantNr, bsr_index_nr,
                                           _BSR_NR)


def _mk_mac(queue: list) -> UeMacNr:
    m = UeMacNr(contention_id=b"\x51" * 6, rng_seed=3)
    m.mux.setup_lcid(LogicalChannelNr(
        lcid=0, priority=0, has_data=lambda: len(queue),
        read_pdu=lambda n: queue.pop(0) if queue else None))
    return m


def test_ra_procedure_contention_resolution_by_msg3_prefix():
    q = [b"RRCSetupRequest-bytes"]
    m = _mk_mac(q)
    idx = m.ra.start(m.contention_id)
    assert 0 <= idx < 64
    assert m.ra.rar_received(MAC.NrRarGrant(rapid=idx, tc_rnti=0x4601))
    out = m.new_grant_ul(UlGrantNr(rnti=0x4601, pid=0, tbs=40, ndi=True,
                                   is_msg3=True))
    assert out["new_tx"]
    # the entity captured the transmitted CCCH SDU's first 48 bits
    assert m.ra.ue_contention_id == b"RRCSet"
    # msg4 with the matching con-res CE completes RA
    dl = MAC.NrMacPdu()
    dl.add_ce(MAC.LCID_CON_RES, b"RRCSet")
    g = DlGrantNr(rnti=0x4601, pid=1, tbs=32, ndi=True)
    m.new_grant_dl(g)
    m.tb_decoded(g, MAC.pack(dl, 32))
    assert m.ra.is_complete() and m.ra.crnti == 0x4601


def test_ra_rar_window_expiry_retries_with_new_preamble():
    m = _mk_mac([])
    m.ra.start(b"\x51" * 6)
    n0 = m.ra.preamble_tx_count
    retry = None
    for _ in range(12):
        retry = m.tick(1)
        if retry is not None:
            break
    assert retry is not None
    assert m.ra.preamble_tx_count == n0 + 1


def test_dl_harq_16_processes_ndi_toggle():
    m = _mk_mac([])
    seen = []
    m.demux.add_rlc(1, seen.append)
    pdu = MAC.NrMacPdu()
    pdu.add_sdu(1, b"dcch")
    raw = MAC.pack(pdu, 24)
    g = DlGrantNr(rnti=0x4601, pid=15, tbs=24, ndi=True)
    assert m.new_grant_dl(g)             # new transmission
    m.tb_decoded(g, raw)
    # same NDI on the same pid = retransmission
    assert not m.new_grant_dl(g)
    # toggled NDI = new tx again
    g2 = DlGrantNr(rnti=0x4601, pid=15, tbs=24, ndi=False)
    assert m.new_grant_dl(g2)
    assert seen == [b"dcch"]


def test_ul_harq_retx_keeps_pdu_new_tx_rebuilds():
    q = [b"first", b"second"]
    m = _mk_mac(q)
    g = UlGrantNr(rnti=0x4601, pid=2, tbs=24, ndi=True)
    out1 = m.new_grant_ul(g)
    assert out1["new_tx"]
    # un-toggled NDI: adaptive retx of the SAME bytes
    out2 = m.new_grant_ul(UlGrantNr(rnti=0x4601, pid=2, tbs=24, ndi=True,
                                    rv=2))
    assert not out2["new_tx"] and out2["pdu"] == out1["pdu"]
    # toggled NDI: new PDU with the next SDU
    out3 = m.new_grant_ul(UlGrantNr(rnti=0x4601, pid=2, tbs=24, ndi=False))
    assert out3["new_tx"] and out3["pdu"] != out1["pdu"]
    assert m.metrics["ul_retx"] == 1


def test_bsr_ce_in_ul_pdu():
    q = [b"data!"]
    m = _mk_mac(q)
    m.bsr.buffer_fn = lambda: 300
    out = m.new_grant_ul(UlGrantNr(rnti=0x4601, pid=0, tbs=24, ndi=True))
    up = MAC.unpack(out["pdu"], ul=True)
    ces = [s for s in up.subpdus if not s.is_sdu
           and s.lcid == MAC.LCID_SHORT_BSR]
    assert ces and (ces[0].payload[0] & 0x1F) == bsr_index_nr(300)
    assert _BSR_NR[bsr_index_nr(300)] >= 300


def test_crnti_ce_path_completes_on_crnti_pdcch():
    q = [b"ReestablishmentRequest"]
    m = _mk_mac(q)
    idx = m.ra.start(b"\x51" * 6, crnti=0x4601)   # RA with existing C-RNTI
    assert m.ra.rar_received(MAC.NrRarGrant(rapid=idx, tc_rnti=0x9999))
    out = m.new_grant_ul(UlGrantNr(rnti=0x4601, pid=0, tbs=40, ndi=True,
                                   is_msg3=True))
    up = MAC.unpack(out["pdu"], ul=True)
    assert any(not s.is_sdu and s.lcid == MAC.LCID_C_RNTI
               and s.payload == b"\x46\x01" for s in up.subpdus)
    # a PDCCH addressed to the C-RNTI completes the procedure (38.321 5.1.5b)
    m.new_grant_dl(DlGrantNr(rnti=0x4601, pid=0, tbs=24, ndi=True))
    assert m.ra.is_complete() and m.ra.crnti == 0x4601
