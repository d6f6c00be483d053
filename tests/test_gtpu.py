"""GTP-U codec + tunnel manager tests (reference: gtpu_test.cc)."""

from srsran_4g_tpu.stack import gtpu


def test_header_roundtrip():
    for h in (gtpu.GtpuHeader(teid=0x12345678),
              gtpu.GtpuHeader(teid=1, seq=77),
              gtpu.GtpuHeader(teid=9, msg_type=gtpu.GTPU_MSG_ECHO_REQUEST, seq=0)):
        raw = gtpu.pack(h, b"payload!")
        out, payload = gtpu.unpack(raw)
        assert out == h
        assert payload == b"payload!"


def test_tunnel_manager_ho_flow():
    tm = gtpu.TunnelManager()
    t = tm.add_tunnel(rnti=0x46, bearer_id=3, teid_out=900)
    assert tm.handle_rx(t.teid_in, b"a") == ("deliver", None, b"a")
    # handover starts: buffer
    tm.set_buffering(t.teid_in)
    assert tm.handle_rx(t.teid_in, b"b")[0] == "buffered"
    assert tm.handle_rx(t.teid_in, b"c")[0] == "buffered"
    # target ready: flush + forward
    buffered = tm.set_forwarding(t.teid_in, forward_teid=555)
    assert buffered == [b"b", b"c"]
    assert tm.handle_rx(t.teid_in, b"d") == ("forward", 555, b"d")
    tm.rem_tunnel(t.teid_in)
    assert tm.handle_rx(t.teid_in, b"e") == ("drop", None, None)
