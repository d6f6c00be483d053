"""RLC AM tests: ARQ recovery under loss (reference: rlc_am_data_test,
rlc_stress_test with random drops — zero-loss delivery is the AM invariant)."""

import numpy as np
import pytest

from srsran_4g_tpu.stack import rlc_am as R


def test_amd_header_roundtrip():
    for p in (
        R.AmdPdu(sn=3, fi_first=True, fi_last=True, poll=False, lis=[], data=b"abc"),
        R.AmdPdu(sn=1000, fi_first=False, fi_last=False, poll=True,
                 lis=[5, 600], data=b"z" * 700),
    ):
        out = R.unpack_amd(R.pack_amd(p))
        assert out == p


def test_status_roundtrip():
    raw = R.pack_status(517, [3, 515, 1020])
    ack, nacks = R.unpack_status(raw)
    assert ack == 517 and nacks == [3, 515, 1020]
    ack, nacks = R.unpack_status(R.pack_status(0, []))
    assert ack == 0 and nacks == []


def _run_link(a: R.RlcAm, b: R.RlcAm, rng, drop_prob, n_ms=2000,
              grant=lambda rng: int(rng.integers(20, 120))):
    """Simulate a bidirectional link for n_ms TTIs with PDU loss a→b."""
    for _ in range(n_ms):
        pdu = a.read_pdu(grant(rng))
        if pdu is not None and rng.random() >= drop_prob:
            b.write_pdu(pdu)
        back = b.read_pdu(grant(rng))
        if back is not None and rng.random() >= drop_prob:
            a.write_pdu(back)
        a.tick()
        b.tick()
        if not a.has_data() and not b.has_data() and not a.tx_window:
            break


def test_am_lossless_delivery():
    rng = np.random.default_rng(0)
    a, b = R.RlcAm(), R.RlcAm()
    sdus = [bytes(rng.integers(0, 256, size=int(rng.integers(10, 300))).tolist())
            for _ in range(50)]
    for s in sdus:
        a.write_sdu(s)
    _run_link(a, b, rng, drop_prob=0.0)
    assert b.delivered == sdus


@pytest.mark.parametrize("drop", [0.1, 0.3])
def test_am_recovers_all_sdus_under_loss(drop):
    """The AM contract: every SDU is delivered exactly once, in order,
    despite PDU loss — via STATUS-driven retransmission."""
    rng = np.random.default_rng(int(drop * 10))
    a, b = R.RlcAm(), R.RlcAm()
    sdus = [bytes(rng.integers(0, 256, size=int(rng.integers(10, 200))).tolist())
            for _ in range(40)]
    for s in sdus:
        a.write_sdu(s)
    _run_link(a, b, rng, drop_prob=drop, n_ms=8000)
    assert b.delivered == sdus, (
        f"delivered {len(b.delivered)}/{len(sdus)} under {drop} loss")
    assert not a.max_retx_reached


def test_am_max_retx_flag():
    a = R.RlcAm(R.AmConfig(max_retx=2, t_poll_retx_ms=2))
    a.write_sdu(b"data")
    for _ in range(30):
        a.read_pdu(100)  # PDUs vanish (100% loss)
        a.tick()
    assert a.max_retx_reached  # RLF indication to upper layers


# --- re-segmentation (TS 36.322 §5.2.1, rlc_am_lte.cc resegmentation) -------

def test_resegmentation_roundtrip():
    from srsran_4g_tpu.stack.rlc_am import AmConfig, RlcAm

    tx = RlcAm(AmConfig(poll_pdu=1))
    rx = RlcAm()
    sdus = [bytes([i]) * (40 + i * 10) for i in range(3)]
    for s in sdus:
        tx.write_sdu(s)
    # one big PDU concatenating all three SDUs
    pdu = tx.read_pdu(300)
    assert pdu is not None and len(pdu) > 100
    # drop it; NACK via status after a poll-triggered status from rx side
    rx.write_pdu(tx.read_pdu(300) or b"")  # nothing else to send
    # force status: simulate the receiver asking for SN 0
    from srsran_4g_tpu.stack.rlc_am import pack_status
    tx.handle_status(pack_status(1, [0]))
    assert list(tx.retx_q) == [0]
    # grant is now much smaller: the PDU must be re-segmented
    segs = []
    while True:
        seg = tx.read_pdu(50)
        if seg is None:
            break
        segs.append(seg)
        if not tx.retx_q:
            break
    assert len(segs) >= 3  # original ~170 B in ≤50 B segments
    # all segments are RF=1
    assert all(s[0] & 0x40 for s in segs)
    # deliver out of order: receiver must reassemble the original SDUs
    order = [segs[i] for i in (1, 0, *range(2, len(segs)))]
    for s in order:
        rx.write_pdu(s)
    assert rx.delivered == sdus


def test_resegment_single_byte_grants():
    from srsran_4g_tpu.stack.rlc_am import AmConfig, RlcAm, pack_status

    tx = RlcAm(AmConfig(poll_pdu=1))
    rx = RlcAm()
    tx.write_sdu(b"hello world, this is rlc am")
    full = tx.read_pdu(100)
    assert full is not None
    tx.handle_status(pack_status(1, [0]))
    segs = []
    for _ in range(100):
        s = tx.read_pdu(9)  # 4-byte header + ≤5 data bytes
        if s is None:
            break
        segs.append(s)
    assert len(segs) >= 5
    for s in segs:
        rx.write_pdu(s)
    assert rx.delivered == [b"hello world, this is rlc am"]


def test_resegmentation_preserves_field_boundaries():
    """Segment edges falling inside and exactly on SDU boundaries."""
    from srsran_4g_tpu.stack.rlc_am import AmConfig, RlcAm, pack_status

    for grant in (20, 23, 26, 31, 40):
        tx = RlcAm(AmConfig(poll_pdu=1))
        rx = RlcAm()
        sdus = [b"A" * 17, b"B" * 13, b"C" * 29, b"D" * 5]
        for s in sdus:
            tx.write_sdu(s)
        assert tx.read_pdu(200) is not None
        tx.handle_status(pack_status(1, [0]))
        for _ in range(100):
            s = tx.read_pdu(grant)
            if s is None:
                break
            rx.write_pdu(s)
        assert rx.delivered == sdus, grant
