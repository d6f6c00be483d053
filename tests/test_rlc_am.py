"""RLC AM tests: ARQ recovery under loss (reference: rlc_am_data_test,
rlc_stress_test with random drops — zero-loss delivery is the AM invariant)."""

import numpy as np
import pytest

from srsran_4g_tpu.stack import rlc_am as R


def test_amd_header_roundtrip():
    for p in (
        R.AmdPdu(sn=3, fi_first=True, fi_last=True, poll=False, lis=[], data=b"abc"),
        R.AmdPdu(sn=1000, fi_first=False, fi_last=False, poll=True,
                 lis=[5, 600], data=b"z" * 700, retx=True),
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
