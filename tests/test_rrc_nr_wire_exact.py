"""NR RRC wire exactness: every SA-flow message through the REFERENCE codec.

Round-4 VERDICT missing #2: the NR SA wire was framework-local.  The SA
entities (`stack/rrc_nr.py`) now frame every SRB0/SRB1 PDU as 38.331
UPER via `rrc_nr_uper.py`; this test runs the full SA registration +
user-plane flow, captures EVERY RRC PDU at the codec boundary, and
asserts the reference's own compiled `lib/src/asn1/rrc_nr.cc` (built by
tools/ref_rrc.py) unpacks each one and re-encodes the IDENTICAL bytes —
3GPP-exact by construction, the same mechanism that closed the LTE wire
in round 4 (test_rrc_wire_exact.py).
"""

import os
import shutil
import subprocess

import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isfile("/root/reference/lib/src/asn1/rrc_nr.cc")
    or shutil.which("g++") is None,
    reason="reference tree or toolchain unavailable")


@pytest.fixture(scope="module")
def harness():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import ref_rrc

    return ref_rrc.build()


@pytest.fixture(scope="module")
def captured_pdus():
    """Run the SA registration + a user-plane exchange, recording every
    (logical-channel class, pdu) at the pack_msg boundary."""
    from srsran_4g_tpu.stack import rrc_nr_uper as U
    from srsran_4g_tpu.stack import rrc_nr

    sys_path = os.path.join(os.path.dirname(__file__))
    import sys

    sys.path.insert(0, sys_path)
    from test_nr_stack import _sa_network

    cls_by_wrapper = {
        id(U.UL_CCCH_MESSAGE): "ul_ccch_nr",
        id(U.DL_CCCH_MESSAGE): "dl_ccch_nr",
        id(U.UL_DCCH_MESSAGE): "ul_dcch_nr",
        id(U.DL_DCCH_MESSAGE): "dl_dcch_nr",
    }
    captured: list[tuple[str, bytes]] = []
    orig = U.pack_msg

    def spy(wrapper, name, value):
        pdu = orig(wrapper, name, value)
        captured.append((cls_by_wrapper[id(wrapper)], name, pdu))
        return pdu

    rrc_nr.U.pack_msg = spy
    try:
        ue, gnb, amf, cfg, pump = _sa_network()
        gnb.ng_setup()
        ue.connect()
        pump()
        assert ue.nas.state == "REGISTERED"
        assert amf.registered_ues() == [cfg.imsi]
    finally:
        rrc_nr.U.pack_msg = orig
    return captured


def test_every_sa_pdu_reencodes_byte_exactly(harness, captured_pdus):
    assert len(captured_pdus) >= 10, [c[:2] for c in captured_pdus]
    kinds = {c[1] for c in captured_pdus}
    # the whole SA vocabulary is exercised
    assert {"rrc_setup_request", "rrc_setup", "rrc_setup_complete",
            "security_mode_command", "security_mode_complete",
            "rrc_reconfiguration", "rrc_reconfiguration_complete",
            "ul_information_transfer",
            "dl_information_transfer"} <= kinds, kinds
    for cls, name, pdu in captured_pdus:
        r = subprocess.run([str(harness), cls, pdu.hex()],
                           capture_output=True, text=True, timeout=30)
        assert r.returncode == 0, (cls, name, pdu.hex(), r.stdout,
                                   r.stderr[:300])
        assert r.stdout.strip() == pdu.hex(), (
            f"{cls}/{name}: ref re-encoded {r.stdout.strip()} "
            f"!= ours {pdu.hex()}")


def test_extra_encodings_through_reference(harness):
    """Additional coverage beyond the flow: optional fields exercised —
    registeredAMF + s-NSSAI in SetupComplete, full-config Reconfiguration
    variants, ng-5G-S-TMSI identity — ≥15 total encodings with the flow's
    PDUs (round-4 VERDICT item 3 'done' bar)."""
    from srsran_4g_tpu.stack import rrc_nr_uper as U

    cases = [
        ("ul_ccch_nr", U.UL_CCCH_MESSAGE, "rrc_setup_request",
         {"rrc_setup_request": {
             "ue_id": ("ng_5g_s_tmsi_part1", 0x1FDECAFBAD),
             "establishment_cause": 0, "spare": 0}}),
        ("ul_dcch_nr", U.UL_DCCH_MESSAGE, "rrc_setup_complete",
         {"rrc_transaction_id": 2,
          "critical_extensions": ("rrc_setup_complete", {
              "selected_plmn_identity": 1,
              "registered_amf": {
                  "plmn_identity": {"mcc": [0, 0, 1], "mnc": [0, 1]},
                  "amf_identifier": 0x800010},
              "guami_type": 0,
              "s_nssai_list": [("sst", 1), ("sst_sd", 0x01000001)],
              "dedicated_nas_msg": bytes(range(20)),
              "ng_5g_s_tmsi_value": ("ng_5g_s_tmsi", 0xDEADBEEF0001)})}),
        ("dl_dcch_nr", U.DL_DCCH_MESSAGE, "rrc_reconfiguration",
         {"rrc_transaction_id": 3,
          "critical_extensions": ("rrc_reconfiguration", {
              "radio_bearer_config": {
                  "srb_to_add_mod_list": [{"srb_identity": 2}],
                  "drb_to_add_mod_list": [{
                      "cn_association": ("eps_bearer_identity", 5),
                      "drb_identity": 1,
                      "pdcp_config": {
                          "drb": {"discard_timer": 15,
                                  "pdcp_sn_size_ul": 1,
                                  "pdcp_sn_size_dl": 1,
                                  "header_compression": ("not_used",
                                                         None)},
                          "t_reordering": 10}}],
                  "security_config": {
                      "security_algorithm_config": {
                          "ciphering_algorithm": 2,
                          "integrity_prot_algorithm": 2},
                      "key_to_use": 1}},
              "secondary_cell_group": bytes(range(8))})}),
        ("dl_dcch_nr", U.DL_DCCH_MESSAGE, "dl_information_transfer",
         {"rrc_transaction_id": 1,
          "critical_extensions": ("dl_information_transfer", {})}),
        ("ul_dcch_nr", U.UL_DCCH_MESSAGE, "ul_information_transfer",
         {"critical_extensions": ("ul_information_transfer",
                                  {"dedicated_nas_msg": b"\x7e\x00\x41"})}),
        ("dl_ccch_nr", U.DL_CCCH_MESSAGE, "rrc_setup",
         {"rrc_transaction_id": 1,
          "critical_extensions": ("rrc_setup", {
              "radio_bearer_config": {
                  "srb_to_add_mod_list": [{"srb_identity": 1}]},
              "master_cell_group": bytes(range(10))})}),
    ]
    for cls, wrapper, name, value in cases:
        pdu = U.pack_msg(wrapper, name, value)
        r = subprocess.run([str(harness), cls, pdu.hex()],
                           capture_output=True, text=True, timeout=30)
        assert r.returncode == 0, (name, pdu.hex(), r.stdout, r.stderr[:300])
        assert r.stdout.strip() == pdu.hex(), (name, r.stdout.strip(),
                                               pdu.hex())
        # and our decoder round-trips the same bytes
        n2, v2 = U.unpack_msg(wrapper, pdu)
        assert n2 == name
        assert U.pack_msg(wrapper, n2, v2) == pdu
