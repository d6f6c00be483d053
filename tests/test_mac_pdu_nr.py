"""NR MAC PDU codec tests (38.321 §6.1; mac_sch_pdu_nr_test.cc)."""

from srsran_4g_tpu.stack import mac_pdu_nr as M


def test_subpdu_roundtrip_short_and_long_l():
    pdu = M.NrMacPdu()
    pdu.add_sdu(4, b"short")
    pdu.add_sdu(5, bytes(300))      # needs 16-bit L
    raw = M.pack(pdu, 400)
    assert len(raw) == 400
    back = M.unpack(raw)
    assert [(s.lcid, len(s.payload)) for s in back.subpdus] == [(4, 5), (5, 300)]


def test_ces_and_padding():
    pdu = M.NrMacPdu()
    pdu.add_ce(M.LCID_TA_CMD, bytes([17]))
    pdu.add_ce(M.LCID_CON_RES, b"\x01\x02\x03\x04\x05\x06")
    pdu.add_sdu(1, b"rrc")
    raw = M.pack(pdu, 64)
    back = M.unpack(raw)
    ces = [s for s in back.subpdus if not s.is_sdu]
    assert ces[0].payload == bytes([17])
    assert ces[1].payload == b"\x01\x02\x03\x04\x05\x06"
    assert [s.payload for s in back.subpdus if s.is_sdu] == [b"rrc"]


def test_overflow_raises():
    pdu = M.NrMacPdu()
    pdu.add_sdu(1, bytes(100))
    try:
        M.pack(pdu, 50)
        assert False
    except ValueError:
        pass


def test_nr_rar_roundtrip():
    grants = [M.NrRarGrant(rapid=13, ta=123, ul_grant=0x155aa, tc_rnti=0x4601),
              M.NrRarGrant(rapid=44, ta=0xFFF, ul_grant=0x7FFFFFF,
                           tc_rnti=0xFFFF)]
    back = M.unpack_rar(M.pack_rar(grants))
    assert back == grants
