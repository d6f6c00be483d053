"""MAC PDU pack/unpack tests (reference: lib/test/mac/pdu_test.cc)."""

import pytest

from srsran_4g_tpu.stack import mac_pdu as m


def test_single_sdu_with_padding():
    pdu = m.MacPdu()
    pdu.add_sdu(3, b"hello world")
    raw = m.pack(pdu, 40)
    assert len(raw) == 40
    out = m.unpack(raw)
    sdus = [s for s in out.subpdus if s.is_sdu]
    assert len(sdus) == 1
    assert sdus[0].lcid == 3
    assert sdus[0].payload == b"hello world"


def test_multi_sdu_and_ce():
    pdu = m.MacPdu()
    pdu.add_ce(m.LCID_TA_CMD, b"\x2a")
    pdu.add_sdu(1, b"A" * 130)  # forces 16-bit length field
    pdu.add_sdu(2, b"B" * 17)
    raw = m.pack(pdu, 200)
    out = m.unpack(raw)
    ces = [s for s in out.subpdus if not s.is_sdu]
    sdus = [s for s in out.subpdus if s.is_sdu]
    assert ces[0].lcid == m.LCID_TA_CMD and ces[0].payload == b"\x2a"
    assert sdus[0].payload == b"A" * 130
    assert sdus[1].payload == b"B" * 17


def test_exact_fit_no_padding():
    pdu = m.MacPdu()
    pdu.add_sdu(1, b"xyz")
    raw = m.pack(pdu, 4)  # 1 header byte + 3 payload
    out = m.unpack(raw)
    assert out.subpdus[0].payload == b"xyz"


def test_single_byte_padding():
    pdu = m.MacPdu()
    pdu.add_sdu(1, b"xyz")
    raw = m.pack(pdu, 5)
    out = m.unpack(raw)
    sdus = [s for s in out.subpdus if s.is_sdu]
    assert sdus[0].payload == b"xyz"


def test_rar_roundtrip():
    grants = [
        m.RarGrant(rapid=5, ta=123, ul_grant=0xABCDE, temp_crnti=0x4601),
        m.RarGrant(rapid=33, ta=2047, ul_grant=0xFFFFF, temp_crnti=0xFFFF),
    ]
    raw = m.pack_rar(grants, backoff=7, pdu_len=32)
    bo, out = m.unpack_rar(raw)
    assert bo == 7
    assert out == grants


def test_rar_no_backoff():
    grants = [m.RarGrant(rapid=1, ta=0, ul_grant=1, temp_crnti=2)]
    bo, out = m.unpack_rar(m.pack_rar(grants))
    assert bo is None and out == grants
