"""eMBMS end-to-end: MBMS-GW (M1-U GTP-U) → eNB MCH → PMCH → UE decode.

Counterpart of the reference's `srsepc/src/mbms-gw/` + srsenb MBSFN/PMCH
path: multicast IP packets enter at the SGi-mb side, ride GTP-U to the
eNB, are scheduled into MCH MAC PDUs and transmitted on real PMCH MBSFN
subframes (extended CP, MBSFN-RS chest, turbo decode) through AWGN.
"""

import numpy as np
import pytest

from srsran_4g_tpu.stack import gtpu
from srsran_4g_tpu.stack.mbms_gw import (EnbMbms, M1U_TEID, MTCH_LCID,
                                         MbmsGw, ue_mch_rx)


def _ip4(dst: str, payload: bytes) -> bytes:
    """Minimal IPv4 packet with the given destination."""
    hdr = bytearray(20)
    hdr[0] = 0x45
    hdr[16:20] = bytes(int(x) for x in dst.split("."))
    return bytes(hdr) + payload


def test_mbms_gw_filters_and_encapsulates():
    gw = MbmsGw()
    gw.add_service("239.255.0.1")
    out = []
    gw.m1u_tx = out.append
    gw.rx_sgi_mb(_ip4("239.255.0.1", b"segment-0"))
    gw.rx_sgi_mb(_ip4("10.0.0.1", b"unicast"))        # not multicast
    gw.rx_sgi_mb(_ip4("239.9.9.9", b"other-group"))   # not joined
    assert len(out) == 1 and gw.metrics["dropped"] == 2
    h, payload = gtpu.unpack(out[0])
    assert h.teid == M1U_TEID and payload.endswith(b"segment-0")


def test_embms_end_to_end_over_pmch():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    from srsran_4g_tpu.models import pmch

    TBS = 1608
    cfg = pmch.PmchConfig(nof_prb=15, area_id=1, subframe=3, mod="qpsk",
                          tbs=TBS)
    gw = MbmsGw()
    gw.add_service("239.255.0.1")
    enb = EnbMbms(pdu_bytes=TBS // 8)
    gw.m1u_tx = enb.rx_m1u

    sent = [_ip4("239.255.0.1", f"mbms-seg-{i:03d}".encode())
            for i in range(6)]
    for pkt in sent:
        gw.rx_sgi_mb(pkt)
    assert enb.metrics["m1u_rx"] == 6

    key = jax.random.PRNGKey(0)
    nv = snr_to_noise_var(15.0)
    received: list[bytes] = []
    sf = 0
    while enb.has_data() and sf < 10:
        raw = enb.get_mch_pdu()
        assert raw is not None
        bits = np.unpackbits(np.frombuffer(raw, np.uint8))[:TBS]
        bits = np.pad(bits, (0, TBS - len(bits))).astype(np.int8)
        tx = pmch.encode(cfg, jnp.asarray(bits[None]))
        key, k = jax.random.split(key)
        out = pmch.decode(cfg, awgn(k, tx, nv), n_iter=6)
        assert bool(out["crc_ok"][0]), "PMCH KO"
        rx_raw = np.packbits(np.asarray(out["bits"][0], np.uint8)).tobytes()
        for lcid, pkt in ue_mch_rx(rx_raw):
            assert lcid == MTCH_LCID
            received.append(pkt)
        sf += 1

    assert received == sent, (len(received), len(sent))
