"""Sidelink PSCCH/PSSCH blind-search interop: decode the reference's
committed real-device and ideal TM2/TM4 IQ captures through
`models/sl_rx.decode_capture` and assert the reference's own ctest pass
criteria (`lib/src/phy/phch/test/CMakeLists.txt:126-158` — the
`num_decoded_sci=… num_decoded_tb=…` PASS_REGULAR_EXPRESSIONs of
`pssch_pscch_file_test`).

Captures come from a Qualcomm 9150 C-V2X chipset, a Huawei device (with
PHY retransmission), a Rohde&Schwarz CMW500 and a Keysight UXM tester —
decoding them proves 36.211/36.212/36.213 sidelink conformance against
third-party implementations, not just self-loopback.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/lib/src/phy/phch/test"

# (file, prb, tm, std_rate, size_sub, num_sub, first_sf, offset,
#  want_sci, want_tb, want_mcs) — want_tb/want_mcs None = not part of the
# reference's pass regex for that file
CASES = [
    # qc9150: CMakeLists.txt:133-134 "num_decoded_sci=1 num_decoded_tb=1"
    ("signal_sidelink_qc9150_f5.92e9_s15.36e6_50prb_20offset.dat",
     50, 4, True, None, None, 0, 20, 1, 1, None),
    # cmw500: :137-138 (-o 20; ~64-sample SFO, 20 is enough)
    ("signal_sidelink_cmw500_f5.92e9_s11.52e6_50prb_0offset_1ms.dat",
     50, 4, False, None, None, 0, 20, 1, 1, None),
    # huawei with retx: :141-142 "num_decoded_sci=2 num_decoded_tb=2"
    ("signal_sidelink_huawei_s11.52e6_50prb_10prb_offset_with_retx.dat",
     50, 4, False, None, None, 5, 0, 2, 2, None),
    # uxm1: :145-146 "mcs=12.*num_decoded_sci=2 num_decoded_tb=2"
    ("signal_sidelink_uxm_s15.36e6_50prb_0prb_offset_mcs12.dat",
     50, 4, True, 5, 10, 0, 0, 2, 2, 12),
    # uxm2: :149-150 "mcs=12.*num_decoded_sci=4"
    ("signal_sidelink_uxm_s23.04e6_100prb_1prb_offset_mcs12_padding.dat",
     100, 4, False, 10, 10, 0, 0, 4, None, 12),
    # uxm3: :153-154 "mcs=12.*num_decoded_sci=1"
    ("signal_sidelink_uxm_s30.72e6_100prb_1prb_offset_mcs12_its.dat",
     100, 4, True, 10, 10, 6, 0, 1, None, 12),
    # uxm4: :157-158 "mcs=28.*num_decoded_sci=5"
    ("signal_sidelink_uxm_s15.36e6_50prb_0prb_offset_mcs28_padding_5ms.dat",
     50, 4, True, 5, 10, 1, 0, 5, None, 28),
    # ideal tm4: :130-131 "num_decoded_sci=1"
    ("signal_sidelink_ideal_tm4_p100_c335_size10_num10_cshift0_s30.72e6.dat",
     100, 4, True, 10, 10, 6, 0, 1, None, None),
]

# LTE-standard vs reduced ("-d" flag absent) symbol sizes per PRB count
SZ_STD = {6: 128, 15: 256, 25: 512, 50: 1024, 75: 1536, 100: 2048}
SZ_RED = {6: 128, 15: 256, 25: 384, 50: 768, 75: 1024, 100: 1536}


def _decode(fn, prb, tm, std, ssc, nsc, first_sf, offset):
    path = os.path.join(REF, fn)
    if not os.path.exists(path):
        pytest.skip("reference captures not available")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from srsran_4g_tpu.models import sl_rx

    raw = np.fromfile(path, np.complex64)
    pool = sl_rx.SlPool.default(prb, tm)
    if ssc:
        pool.size_sub_channel, pool.num_sub_channel = ssc, nsc
    return sl_rx.decode_capture(raw, prb, tm, (SZ_STD if std else SZ_RED)[prb],
                                pool, first_sf_idx=first_sf,
                                file_offset=offset)


@pytest.mark.parametrize(
    "fn,prb,tm,std,ssc,nsc,first_sf,offset,want_sci,want_tb,want_mcs",
    CASES, ids=[c[0].split("sidelink_")[1][:22] for c in CASES])
def test_pssch_pscch_capture_tm4(fn, prb, tm, std, ssc, nsc, first_sf,
                                 offset, want_sci, want_tb, want_mcs):
    r = _decode(fn, prb, tm, std, ssc, nsc, first_sf, offset)
    assert r["num_decoded_sci"] == want_sci, r
    if want_tb is not None:
        assert r["num_decoded_tb"] == want_tb, r
    if want_mcs is not None:
        assert all(e["mcs"] == want_mcs for e in r["events"]
                   if "mcs" in e), r["events"]


def test_pssch_pscch_capture_ideal_tm2():
    """CMakeLists.txt:126-127: `num_decoded_sci=[2,3] num_decoded_tb=1`."""
    r = _decode("signal_sidelink_ideal_tm2_p100_c335_s30.72e6.dat",
                100, 2, True, None, None, 0, 0)
    assert r["num_decoded_sci"] in (2, 3), r
    assert r["num_decoded_tb"] == 1, r
