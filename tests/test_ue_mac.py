"""UE MAC tests: HARQ entities, mux/demux, RA/BSR procedures.

Mirrors the reference's mac_test.cc scenarios (srsue/src/stack/mac/test):
NDI-toggle new-tx detection, duplicate-TB suppression, RAR matching,
contention resolution, LCP with PBR buckets, BSR triggering.
"""

from srsran_4g_tpu.stack import mac_pdu
from srsran_4g_tpu.stack.ue_mac import (
    BsrProc, Demux, DlHarqEntity, DlMacGrant, LogicalChannel, Mux, RaProc,
    RachConfig, UeMac, UlHarqEntity, UlMacGrant, buff_size_index,
)


def test_buff_size_index():
    assert buff_size_index(0) == 0
    assert buff_size_index(10) == 1
    assert buff_size_index(11) == 2
    assert buff_size_index(150001) == 63
    assert buff_size_index(99999999) == 63


def test_dl_harq_ndi_toggle_and_dedup():
    h = DlHarqEntity()
    g = DlMacGrant(rnti=0x46, pid=0, tbs=100, ndi=True)
    a = h.new_grant(g)
    assert a["decode"] and a["reset_softbuffer"]
    assert h.tb_decoded(0, True) is True       # first decode delivers
    # retx of same TB (same NDI): already decoded -> no decode
    a = h.new_grant(g)
    assert not a["decode"]
    # NDI toggles -> new TB
    g2 = DlMacGrant(rnti=0x46, pid=0, tbs=100, ndi=False)
    a = h.new_grant(g2)
    assert a["decode"] and a["reset_softbuffer"]
    # failed decode then retx: decode without reset (soft combine)
    assert h.tb_decoded(0, False) is False
    a = h.new_grant(g2)
    assert a["decode"] and not a["reset_softbuffer"]


def test_ul_harq_rv_sequence_and_max_retx():
    h = UlHarqEntity(max_harq_tx=4)
    built = []

    def builder(tbs):
        built.append(tbs)
        return b"x" * tbs

    g = UlMacGrant(rnti=0x46, pid=1, tbs=50, ndi=True)
    out = h.new_grant(g, builder)
    assert out["new_tx"] and out["rv"] == 0 and len(out["pdu"]) == 50
    # non-adaptive retx follows rv sequence 0,2,3,1
    out = h.new_grant(UlMacGrant(rnti=0x46, pid=1, tbs=50, ndi=True), builder)
    assert not out["new_tx"] and out["rv"] == 2 and out["pdu"] == b"x" * 50
    out = h.new_grant(UlMacGrant(rnti=0x46, pid=1, tbs=50, ndi=True), builder)
    assert out["rv"] == 3
    # 4th transmission (last allowed by max_harq_tx=4)
    out = h.new_grant(UlMacGrant(rnti=0x46, pid=1, tbs=50, ndi=True), builder)
    assert out["rv"] == 1 and out["pdu"] is not None
    # 5th exceeds max_harq_tx -> dropped
    out = h.new_grant(UlMacGrant(rnti=0x46, pid=1, tbs=50, ndi=True), builder)
    assert out["pdu"] is None and h.dropped == 1
    assert built == [50]  # PDU built exactly once


def test_demux_routes_sdus_and_ces():
    d = Demux()
    got = {}
    d.add_rlc(3, lambda p: got.setdefault(3, p))
    pdu = mac_pdu.MacPdu()
    pdu.add_ce(mac_pdu.LCID_TA_CMD, bytes([31]))
    pdu.add_ce(mac_pdu.LCID_CON_RES, b"\x01\x02\x03\x04\x05\x06")
    pdu.add_sdu(3, b"hello-rlc")
    raw = mac_pdu.pack(pdu, 40)
    d.push_pdu(raw)
    assert got[3] == b"hello-rlc"
    assert d.ta_cmds == [31]
    assert d.contention_id == b"\x01\x02\x03\x04\x05\x06"


def test_mux_lcp_priority_and_pbr():
    m = Mux()
    q1, q2 = [b"A" * 200], [b"B" * 200]

    def mk(q):
        def has():
            return sum(len(x) for x in q)

        def rd(n):
            if not q:
                return None
            out = q[0][:n]
            q[0] = q[0][n:]
            if not q[0]:
                q.pop(0)
            return out

        return has, rd

    h1, r1 = mk(q1)
    h2, r2 = mk(q2)
    # lcid 3 high priority but PBR-limited to 8 B/tti; lcid 4 lower prio, inf PBR
    m.setup_lcid(LogicalChannel(lcid=3, priority=1, pbr_bytes_per_tti=8,
                                has_data=h1, read_pdu=r1))
    m.setup_lcid(LogicalChannel(lcid=4, priority=2, pbr_bytes_per_tti=-1,
                                has_data=h2, read_pdu=r2))
    m.tick(1)  # bucket(3) = 8
    raw = m.pdu_get(100)
    pdu = mac_pdu.unpack(raw, ul=True)
    sdus = {s.lcid: s.payload for s in pdu.subpdus if s.is_sdu}
    # round 1: lcid3 limited to its 8-byte bucket; round 2 serves the rest
    assert len(sdus[3]) >= 8
    assert len(sdus[4]) > 0
    assert len(raw) == 100


def test_mux_pdu_exact_size_with_ce():
    m = Mux()
    m.push_ce(mac_pdu.LCID_SHORT_BSR, bytes([5]))
    raw = m.pdu_get(10)
    assert len(raw) == 10
    pdu = mac_pdu.unpack(raw, ul=True)
    ces = [s for s in pdu.subpdus if not s.is_sdu]
    assert ces and ces[0].lcid == mac_pdu.LCID_SHORT_BSR


def test_ra_proc_happy_path():
    ra = RaProc(RachConfig(), rng_seed=7)
    idx = ra.start(b"\xaa\xbb\xcc\xdd\xee\xff")
    assert 0 <= idx < 52 and ra.state == RaProc.RAR_WAIT
    rar = mac_pdu.RarGrant(rapid=idx, ta=11, ul_grant=0x321, temp_crnti=0x46)
    assert ra.rar_received(rar, None) is True
    assert ra.state == RaProc.MSG3_SENT
    assert ra.contention_resolution(b"\xaa\xbb\xcc\xdd\xee\xff") is True
    assert ra.is_complete() and ra.rntis["crnti"] == 0x46


def test_ra_proc_rar_window_expiry_power_ramp():
    ra = RaProc(RachConfig(rar_window_ms=5, power_ramp_db=2.0), rng_seed=1)
    ra.start(b"\x01" * 6)
    p0 = ra.tx_power
    # no RAR for > window -> retry with ramped power
    new_idx = None
    for _ in range(7):
        r = ra.tick(1)
        if r is not None:
            new_idx = r
    assert new_idx is not None
    assert ra.tx_power == p0 + 2.0
    assert ra.preamble_tx_count == 2


def test_ra_proc_wrong_rapid_backoff():
    ra = RaProc(RachConfig(), rng_seed=3)
    idx = ra.start(b"\x01" * 6)
    wrong = mac_pdu.RarGrant(rapid=(idx + 1) % 52, ta=0, ul_grant=0,
                             temp_crnti=0x50)
    assert ra.rar_received(wrong, backoff_ms=8) is False
    assert ra.state == RaProc.RAR_WAIT


def test_ra_trans_max_problem():
    ra = RaProc(RachConfig(rar_window_ms=2, preamble_trans_max=3), rng_seed=0)
    ra.start(b"\x01" * 6)
    for _ in range(40):
        ra.tick(1)
    assert ra.is_problem()


def test_bsr_short_ce_pushed():
    m = Mux()
    q = [b"Z" * 57]

    def has():
        return sum(len(x) for x in q)

    def rd(n):
        out = q[0][:n]
        q[0] = q[0][n:]
        if not q[0]:
            q.pop(0)
        return out

    m.setup_lcid(LogicalChannel(lcid=3, priority=1, has_data=has, read_pdu=rd))
    b = BsrProc(m)
    b.new_data()
    b.generate()
    raw = m.pdu_get(80)
    pdu = mac_pdu.unpack(raw, ul=True)
    bsr = [s for s in pdu.subpdus if s.lcid == mac_pdu.LCID_SHORT_BSR]
    assert bsr and bsr[0].payload[0] == buff_size_index(57)


def test_ue_mac_end_to_end_dl_then_ul():
    mac = UeMac(contention_id=b"\x11" * 6)
    delivered = []
    mac.demux.add_rlc(3, delivered.append)

    # DL: grant + decoded PDU flows to RLC sink
    g = DlMacGrant(rnti=0x46, pid=2, tbs=30, ndi=True)
    act = mac.new_grant_dl(g)
    assert act["decode"]
    pdu = mac_pdu.MacPdu()
    pdu.add_sdu(3, b"downlink-sdu")
    mac.tb_decoded(g, mac_pdu.pack(pdu, 30))
    assert delivered == [b"downlink-sdu"]
    # duplicate retx is suppressed
    mac.tb_decoded(g, mac_pdu.pack(pdu, 30))
    assert len(delivered) == 1

    # UL: grant builds a PDU through the mux
    q = [b"uplink-data"]
    mac.mux.setup_lcid(LogicalChannel(
        lcid=3, priority=1,
        has_data=lambda: sum(len(x) for x in q),
        read_pdu=lambda n: q.pop(0)[:n] if q else None))
    out = mac.new_grant_ul(UlMacGrant(rnti=0x46, pid=0, tbs=40, ndi=True))
    assert out["new_tx"] and len(out["pdu"]) == 40
    up = mac_pdu.unpack(out["pdu"], ul=True)
    assert any(s.payload == b"uplink-data" for s in up.subpdus if s.is_sdu)
