"""E2AP/E2SM-KPM wire exactness against the reference's own codec.

Two directions:
1. The reference's COMMITTED E2AP test vectors
   (`srsgnb/src/stack/ric/test/e2ap_test.cc:38,93`) decode and re-encode
   byte-exactly through the framework's `stack/e2ap_per.py` container.
2. Every PDU the framework's E2 agent generates (E2 Setup Request/
   Response, RIC Subscription Request, RIC Indication with a KPM report)
   unpacks and re-encodes IDENTICALLY through the reference's compiled
   `e2ap.cpp` + `e2sm_kpm_v2.cpp` (`tools/ref_e2.py` harness), as do the
   E2SM-KPM structures on their own.
"""

import os
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isfile("/root/reference/lib/src/asn1/e2ap.cpp")
    or shutil.which("g++") is None,
    reason="reference tree or toolchain unavailable")

# e2ap_test.cc:38 (E2 Setup Request w/ KPM RAN function description)
VECTOR_SETUP = bytes.fromhex(
    "00010080a3000004003100020000000300090005f5103000000010000a0053000008"
    "004e0000933800304f52414e2d4532534d2d4b504d000018312e332e362e312e342e"
    "312e35333134382e312e322e322e3205004b504d204d6f6e69746f72000000000c4f"
    "52414e2d4532534d2d4b504d0032003200000033002c00018044554d4d59204f4149"
    "2d414d46000c46414b4520524551554553540d46414b4520524553504f4e5345")
# e2ap_test.cc:93 (RIC Subscription Request)
VECTOR_SUBSCRIPTION = bytes.fromhex(
    "0008402b000003001d000500007b00150005000200010"
    "01e001500040102030400001340 0a60010004010203040200".replace(" ", ""))


@pytest.fixture(scope="module")
def harness():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import ref_e2

    ref_e2.build()

    def roundtrip(cls, pdu):
        r = subprocess.run(["/tmp/ref_e2/harness", cls, pdu.hex()],
                           capture_output=True, text=True, timeout=30)
        out = r.stdout.strip()
        assert out not in ("UNPACK_FAIL", "PACK_FAIL", ""), (cls, pdu.hex())
        return bytes.fromhex(out)

    return roundtrip


def test_committed_vectors_roundtrip_our_codec():
    from srsran_4g_tpu.stack import e2ap_per as E

    for vec in (VECTOR_SETUP, VECTOR_SUBSCRIPTION):
        pdu = E.E2apPdu.unpack(vec)
        assert pdu.pack() == vec
    # and the typed fields decode to the committed values
    setup = E.E2apPdu.unpack(VECTOR_SETUP)
    funcs = E.unpack_ran_functions_added(
        setup.ie(E.IE_RAN_FUNCTIONS_ADDED).value)
    assert funcs[0][0] == 147 and funcs[0][3] == "ORAN-E2SM-KPM"
    fd = E.KpmRanFunctionDescription.unpack(funcs[0][1])
    assert fd.short_name == "ORAN-E2SM-KPM"
    assert fd.oid == "1.3.6.1.4.1.53148.1.2.2.2"
    sub = E.E2apPdu.unpack(VECTOR_SUBSCRIPTION)
    assert E.unpack_ric_request_id(
        sub.ie(E.IE_RIC_REQUEST_ID).value) == (123, 21)
    assert E.unpack_ran_function_id(sub.ie(E.IE_RAN_FUNCTION_ID).value) == 1


def test_agent_pdus_exact_through_reference(harness):
    from srsran_4g_tpu.stack import e2 as e2mod

    wire = []
    agent = e2mod.E2Agent(metrics_source=lambda: {"cqi": 15, "dl_mbps": 42},
                          tx=wire.append)
    agent.setup()
    sub = e2mod.RicSubscription(request_id=3, report_period_ms=10,
                                metrics=("cqi", "dl_mbps"))
    agent.rx(sub.to_pdu().pack())
    agent.tick(10)
    resp = e2mod.E2SetupResponse().to_pdu().pack()
    for pdu in [*wire, sub.to_pdu().pack(), resp]:
        assert harness("e2ap", pdu) == pdu, pdu.hex()


def test_kpm_structures_exact_through_reference(harness):
    from srsran_4g_tpu.stack import e2ap_per as E

    fd = E.KpmRanFunctionDescription().pack()
    assert harness("kpm_func_desc", fd) == fd
    tr = E.KpmEventTriggerDefinition(report_period_ms=1000).pack()
    assert harness("kpm_trigger", tr) == tr
    hdr = E.KpmIndicationHeader(collect_start_time=0x01020304,
                                sender_name="enb1").pack()
    assert harness("kpm_ind_hdr", hdr) == hdr
    msg = E.KpmIndicationMessage(names=("cqi", "nof_ue"),
                                 values=(15, 2)).pack()
    assert harness("kpm_ind_msg", msg) == msg
    act = E.KpmActionDefinition(names=("cqi", "dl_mbps"),
                                granul_period_ms=100).pack()
    assert harness("kpm_action", act) == act
