"""ASN.1/NAS golden interop: decode + byte-exact re-encode of the
reference's committed 3GPP-encoded test vectors.

The vectors are real 24.501/24.301 NAS messages and 36.331 UPER RRC
messages committed in the reference's ASN.1 tests
(`lib/test/asn1/nas_5g_msg_test.cc`, `srsran_asn1_nas_test.cc`,
`srsran_asn1_rrc_{dl_ccch,dl_dcch,meas,mcch}_test.cc`); a message our
codecs round-trip byte-exactly is one a real srsRAN node would accept
(round 1 gap: the framework codecs were only self-consistent).
"""

import pytest

from srsran_4g_tpu.stack import nas_5gs_codec as N5
from srsran_4g_tpu.stack import nas_eps_codec as N4
from srsran_4g_tpu.stack import rrc_uper as U

# ---- 24.501 5GS NAS (nas_5g_msg_test.cc) ----------------------------------

NAS_5GS_VECTORS = {
    "registration_request_guti":
        "7e004179000bf2000000000000000000002e02f0f01707f0f0c0c0018030",
    "registration_request_suci":
        "7e00417900360100f11071ff021b03997ee4012de36c86e22997c899704b0f61"
        "3abd6c3b1c9ca78a4b147e22afb064cbbd5d27341e8b9e3328184bec2e028020",
    "deregistration_request":
        "7e016f0325f5027e004509000b0200f110cafe0000000001",
    "authentication_request":
        "7e005600020000211646243275b8b9c718b605c6ff0396712010a30926e42eea"
        "8000f687d5baa2d956ed",
    "authentication_response": "7e00572d10a11f51a41da9b529b33b043ae1e20208",
    "security_mode_command": "7e03533fcb29007e005d020004f070f070e1360100",
    "security_mode_complete":
        "7e044088e4e4007e005e7700098556110654282021f57100577e004179003601"
        "00f11071ff021b03e3424299674b24bc8c8a54e2f9065bf6920963b09e372613"
        "48f5fedca242079100f96d5782bf257ecba4d6ce2d1001032e04f070f0701707"
        "f070c0401180b0180101740000530101",
    "registration_accept":
        "7e02d2b078f7017e0042010177000bf200f110cafe000000000354070000f110"
        "000001150a040101020304011122335e010616012c",
    "registration_complete": "7e02a0b88817017e0043",
    "deregistration_request_2":
        "7e02b1b87698027e004509000b0200f110cafe0000000003",
    "pdu_session_establishment_request":
        "7e02dcf91d1b027e00670100062e0a00c1ffff1""20a81220401010203250908"
        "696e7465726e6574",
    "pdu_session_establishment_accept":
        "7e021acaa292027e006801001d2e0a00c211000801063131010100090601e803"
        "01e8032905013c3c0001120a",
}


@pytest.mark.parametrize("name", sorted(NAS_5GS_VECTORS))
def test_nas_5gs_golden_roundtrip(name):
    raw = bytes.fromhex(NAS_5GS_VECTORS[name])
    m = N5.decode(raw)
    assert N5.encode(m) == raw


def test_nas_5gs_decoded_fields_match_reference_asserts():
    m = N5.decode(bytes.fromhex(NAS_5GS_VECTORS["registration_request_guti"]))
    assert m.name == "RegistrationRequest" and m.sec_hdr == 0
    b = m.fields["reg_type_ngksi"]
    assert b & 0x07 == 1          # initial registration
    assert b & 0x08               # follow-on request pending
    assert (b >> 4) & 0x07 == 7   # ngKSI 7
    ident = m.fields["mobile_identity"]
    assert len(ident) == 11 and ident[0] & 0x07 == 2    # 5G-GUTI
    assert m.ie(0x2E) == bytes.fromhex("f0f0")          # EA0-3/IA0-3
    assert len(m.ie(0x17)) == 7

    m = N5.decode(bytes.fromhex(NAS_5GS_VECTORS["authentication_response"]))
    assert m.name == "AuthenticationResponse"
    assert len(m.ie(0x2D)) == 16                        # RES*

    m = N5.decode(bytes.fromhex(NAS_5GS_VECTORS["security_mode_command"]))
    assert m.sec_hdr == 3          # integrity protected with new context
    assert m.fields["nas_sec_algs"] == 0x02
    assert m.fields["replayed_ue_sec_caps"] == bytes.fromhex("f070f070")

    m = N5.decode(bytes.fromhex(NAS_5GS_VECTORS["security_mode_complete"]))
    inner_container = m.ie(0x71)   # NAS message container
    nested = N5.decode(inner_container)                  # a full inner PDU
    assert nested.name == "RegistrationRequest"

    m = N5.decode(bytes.fromhex(NAS_5GS_VECTORS["registration_accept"]))
    assert m.fields["reg_result"] == b"\x01"             # 3GPP access
    assert len(m.ie(0x77)) == 11                         # 5G-GUTI


# ---- 24.301 EPS NAS (srsran_asn1_nas_test.cc) ------------------------------

NAS_EPS_VECTORS = {
    "activate_dedicated_eps_bearer_request":
        "273511fdf6076200c505010107213100034008ae5d0200c28134014d",
    "dl_generic_nas_transport": "27ae80c8f9060768010006f00000000870",
    "dl_generic_nas_transport_packed":
        "270000000" "0ff0768010006f00000000870",
    "dl_generic_nas_transport_add_info":
        "27ae80c8f9060768010006f0000000087065021111",
    "dl_generic_nas_transport_add_info_packed":
        "270000000" "0ff0768010006f0000000087065021111",
}


@pytest.mark.parametrize("name", sorted(NAS_EPS_VECTORS))
def test_nas_eps_golden_roundtrip(name):
    raw = bytes.fromhex(NAS_EPS_VECTORS[name])
    m = N4.decode(raw)
    assert N4.encode(m) == raw


def test_nas_eps_decoded_fields_match_reference_asserts():
    m = N4.decode(bytes.fromhex(
        NAS_EPS_VECTORS["activate_dedicated_eps_bearer_request"]))
    assert m.name == "ActivateDedicatedEpsBearerContextRequest"
    assert m.ebi == 6 and m.pti == 0
    assert m.fields["linked_ebi"] & 0x0F == 5
    assert m.fields["eps_qos"][0] == 1                  # QCI 1
    tft = m.fields["tft"]
    assert tft[0] >> 5 == 1                             # create new TFT
    assert tft[0] & 0x0F == 1                           # 1 packet filter
    assert tft[1] & 0x0F == 1                           # filter id 1
    assert tft[1] >> 4 == 3                             # bidirectional
    assert int.from_bytes(tft[5:7], "big") == 2222      # local port
    ti = m.ie(0x5D)
    assert ti == bytes([0x00, 0xC2])                    # tio 0, tie 0x42
    assert m.ie(0x80) == b"\x01"                        # radio priority 1
    assert m.ie(0x34) == bytes([77])                    # packet flow id

    m = N4.decode(bytes.fromhex(NAS_EPS_VECTORS["dl_generic_nas_transport"]))
    assert m.fields["container_type"] == 1
    assert len(m.fields["container"]) == 6 and m.ie(0x65) is None

    m = N4.decode(bytes.fromhex(
        NAS_EPS_VECTORS["dl_generic_nas_transport_add_info"]))
    assert m.ie(0x65) == b"\x11\x11"


def test_nas_eps_pack_from_fields_matches_reference_pack_test():
    """Build the DL generic NAS transport exactly as the reference's
    packing test does (count 0xffffffff -> seq 0xff, zero MAC)."""
    m = N4.NasEpsMessage(
        pd=N4.PD_EMM, msg_type=N4.MSG_DL_GENERIC_NAS_TRANSPORT,
        sec_hdr=2, mac=b"\x00" * 4, seq=0xFF,
        fields=dict(container_type=1,
                    container=bytes.fromhex("f00000000870")))
    assert N4.encode(m) == bytes.fromhex(
        "270000000" "0ff0768010006f00000000870")


# ---- 36.331 RRC UPER (srsran_asn1_rrc_*_test.cc) ---------------------------

RRC_VECTORS = [
    (U.UL_DCCH_MESSAGE, "0810493C0D978983C084208208210001BC48",
     "measurement_report"),
    (U.DL_DCCH_MESSAGE,
     "201b3f8000000001a9088000002900978000000001042214"
     "00f8020ac06000a00c8042029f4307dabcf84b321834c0002d68085e1800168000",
     "rrc_connection_reconfiguration"),
    (U.DL_DCCH_MESSAGE, "380000", "ue_capability_enquiry"),
    (U.DL_CCCH_MESSAGE, "6012980bfdd204fa183ed5e6c25990c1a60001314042508000f8",
     "rrc_connection_setup"),
    (U.MCCH_MESSAGE,
     "0d8fdfffffffe22ffc385e61eca80000020210002005e61eca8000004042",
     "mbsfn_area_configuration_r9"),
]


@pytest.mark.parametrize("spec,hx,expect", RRC_VECTORS,
                         ids=[v[2] for v in RRC_VECTORS])
def test_rrc_uper_golden_roundtrip(spec, hx, expect):
    raw = bytes.fromhex(hx)
    v, nbits = U.decode_bytes(spec, raw)
    assert v[0] == "c1" and v[1][0] == expect
    assert U.encode_bytes(spec, v) == raw
    assert (len(raw) - 1) * 8 < nbits <= len(raw) * 8   # pad < 1 byte


def test_rrc_measurement_report_fields():
    raw = bytes.fromhex(RRC_VECTORS[0][1])
    v, _ = U.decode_bytes(U.UL_DCCH_MESSAGE, raw)
    mr = v[1][1]["critical_extensions"][1][1]["meas_results"]
    assert mr["meas_id"] == 1
    assert mr["meas_result_pcell"] == dict(rsrp_result=73, rsrq_result=15)
    kind, cells = mr["meas_result_neigh_cells"]
    assert kind == "meas_result_list_eutra" and len(cells) == 1
    n = cells[0]
    assert n["phys_cell_id"] == 357
    cgi = n["cgi_info"]
    plmn = cgi["cell_global_id"]["plmn_identity"]
    assert plmn["mcc"] == [8, 9, 8] and plmn["mnc"] == [7, 8]  # "89878"
    assert cgi["cell_global_id"]["cell_identity"] == 0x1084104
    assert cgi["tracking_area_code"] == 0x1042
    assert len(cgi["plmn_identity_list"]) == 1
    assert "mcc" not in cgi["plmn_identity_list"][0]
    assert n["meas_result"] == dict(rsrp_result=60, rsrq_result=18)


def test_rrc_reconfiguration_ho_fields():
    """The 57-byte handover command (srsran_asn1_rrc_dl_dcch_test.cc
    rrc_conn_reconfig_ho_test1): full measConfig + mobilityControlInfo
    (radioResourceConfigCommon incl. PRACH/PUSCH/PUCCH/SRS/power
    control) + securityConfigHO, byte-exact incl. an X.691 extension
    addition group preserved as an open type."""
    raw = bytes.fromhex(RRC_VECTORS[1][1])
    v, _ = U.decode_bytes(U.DL_DCCH_MESSAGE, raw)
    r8 = v[1][1]["critical_extensions"][1][1]
    mci = r8["mobility_control_info"]
    assert mci["target_phys_cell_id"] == 272
    assert mci["new_ue_identity"] == 0x3E
    assert mci["radio_resource_config_common"]["prach_config"][
        "root_sequence_index"] == 86
    mc = r8["meas_config"]
    assert mc["meas_id_to_add_mod_list"] == [
        dict(meas_id=1, meas_object_id=1, report_config_id=1)]
    ho = r8["security_config_ho"]["handover_type"]
    assert ho[0] == "intra_lte" and ho[1]["next_hop_chaining_count"] == 0
    assert "radio_resource_config_dedicated" in r8


def test_rrc_connection_setup_fields():
    raw = bytes.fromhex(RRC_VECTORS[3][1])
    v, _ = U.decode_bytes(U.DL_CCCH_MESSAGE, raw)
    r8 = v[1][1]["critical_extensions"][1][1]
    phy = r8["radio_resource_config_dedicated"]["physical_config_dedicated"]
    cqi = phy["cqi_report_config"]
    assert cqi["nom_pdsch_rs_epre_offset"] == 0
    kind, per = cqi["cqi_report_periodic"]
    assert kind == "setup"
    assert per["cqi_pucch_resource_index"] == 0
    assert per["cqi_pmi_config_index"] == 38
    srbs = r8["radio_resource_config_dedicated"]["srb_to_add_mod_list"]
    assert srbs[0]["srb_identity"] == 1


def test_rrc_mcch_fields():
    raw = bytes.fromhex(RRC_VECTORS[4][1])
    v, _ = U.decode_bytes(U.MCCH_MESSAGE, raw)
    cfg = v[1][1]
    a0, a1 = cfg["common_sf_alloc_r9"]
    assert a0["radioframe_allocation_period"] == 5          # n32
    assert a0["radioframe_allocation_offset"] == 4
    assert a0["subframe_allocation"] == ("one_frame", 0b111111)
    assert a1["radioframe_allocation_period"] == 3          # n8
    assert a1["subframe_allocation"][0] == "four_frames"
    assert cfg["common_sf_alloc_period_r9"] == 6            # rf256
    p0, p1 = cfg["pmch_info_list_r9"]
    assert p0["pmch_config_r9"]["sf_alloc_end_r9"] == 1535
    assert p0["pmch_config_r9"]["data_mcs_r9"] == 16
    assert p0["pmch_config_r9"]["mch_scheduling_period_r9"] == 7  # rf1024
    s0 = p0["mbms_session_info_list_r9"][0]
    assert s0["tmgi_r9"]["plmn_id_r9"][1] == dict(mcc=[9, 8, 7],
                                                  mnc=[6, 5, 4])
    assert s0["tmgi_r9"]["service_id_r9"] == b"\x00\x00\x01"
    assert s0["session_id_r9"] == b"\x01"
    assert s0["logical_channel_identity_r9"] == 1
    assert p1["pmch_config_r9"]["data_mcs_r9"] == 8


def test_rrc_connection_request_encode_per_spec():
    """Encode an UL-CCCH RRCConnectionRequest from fields and check the
    36.331-defined layout (1+1 bit choices, 40-bit random value, 3-bit
    cause, 1 spare bit = exactly 6 bytes)."""
    v = ("c1", ("rrc_connection_request", {
        "critical_extensions": ("rrc_connection_request_r8", {
            "ue_identity": ("random_value", 0xDEADBEEF42),
            "establishment_cause": 3,     # mo-Data
            "spare": 0,
        })}))
    raw = U.encode_bytes(U.UL_CCCH_MESSAGE, v)
    assert len(raw) == 6
    back, nbits = U.decode_bytes(U.UL_CCCH_MESSAGE, raw)
    assert nbits == 48      # exactly 6 bytes, no padding
    assert back == v
