"""Golden interop: S1AP/NGAP/RRC-NR vectors from the reference's own
test suite decode and re-encode byte-exactly.

Vectors are the reference's committed acceptance data
(lib/test/asn1/s1ap_test.cc, ngap_test.cc, srsran_asn1_rrc_nr_test.cc);
byte-exact pack/unpack round trip is the reference's own
test_pack_unpack_consistency criterion.
"""

import pytest

from srsran_4g_tpu.stack import rrc_nr_uper as RN
from srsran_4g_tpu.stack import s1ap_msgs as M
from srsran_4g_tpu.stack import s1ap_per as S

# (name, hex) — 6 S1AP (36.413) + 6 NGAP (38.413) PDUs
VECTORS = [
    ("s1_setup_request", "0011002D000004003B00080009F107000019B0003C400A0380656E62303031396200400007000001C009F1070089400140"),
    ("s1_init_ctxt_setup_req", "00090080c60000060000000200640008000200010042000a183b9aca00603b9aca000018007800003400734500093c0f800a0021f0b7361c5664273e5b04b7020742023e060009f107000700375266c101091b0774657374313233066d6e63303730066d636339303104677072730501c0a80302270e8080210a0300000a810608080808500bf609f107800101f67e72691309f10700012305f4f67e7269006b000518000c0000004900204525e49a77c8d5cf263363eb5bb9c3439b9eb3861fa8a7cf435407ae422b63b9"),
    ("s1_ue_ctxt_release_req", "00124015000003000000020001000800020001000240020280"),
    ("s1_paging", "000A402A00000400504002B4C0002B40096854020430687405F7006D400100002E400B00002F40060054F24004D2"),
    ("s1_ho_request", "00010080E600000800000002006400010001000002400200000042000A183B9ACA00603B9ACA000035001900001B00144A1F0A0021F0B7361C5600093C0000008F4001000068007574005F0A100C81A00000180002E87FE40000150000000591000002900978000000627C1F50298F00E9CE021300009501004640000001901384001C006700A0518041400670DFBC44006B01400080020800C14CA2D54E2803517240E0591401217B000009F1070019B0100009F1070019C02100001F006B000518000C000000280021108B0DABD7E59834B3EF6CC1AAA727FBF45308FF74947CA71BD9B437B902786212"),
    ("s1_setup_resp_gummeis", "201100260000020069001a014000f11000f11000f11000f11000f11000f11000008888007b00574001ff"),
    ("ngap_error_indication", "0000000F00000100010008028073727372616E"),
    ("ngap_ng_setup_request", "00150030000004001b00090000f1105000000001005240060180676e62310066000d00000000750000f110000000080015400160"),
    ("ngap_ng_setup_response", "2015005e0000040001003a1b80616d66312e636c7573746572312e6e6574322e616d662e3567632e6d6e633030312e6d63633030312e336770706e6574776f726b2e6f726700600008000000f1103808970056400105005000080000f11000000008"),
    ("ngap_initial_ue_message", "000f4080a20000040055000200010026007d7c7e00417100760100f110000001014d436f77425159444b325675417945416e363648396b7a485461465a4b30353741497237412b6e6c736149587852334e6973364c566f75466942343ddfabf5cd652eb2541491484d41432d53484100858bbb1f42f1256f9a37531a772a2cf2b78ff160488402ed489399b6b737420079000f4000f110000000001000f110000075005a400118"),
    ("ngap_dl_nas_transport_1", "0004403e000003000a000200010055000200010026002b2a7e00560002000021681cd489650fdcc7c70eca8fa9be44702010c7f0791fa852e282847c9f4ce5c19451"),
    ("ngap_dl_nas_transport_2", "00044042000003000a0006800303cf37d00055000200010026002b2a7e00560002000021bc8de561f5b4a7058fdbe23b4e21da4520105ab8d1db137680001b1a8d3c984c0106"),
]


@pytest.mark.parametrize("name,hx", VECTORS, ids=[v[0] for v in VECTORS])
def test_container_byte_exact(name, hx):
    raw = bytes.fromhex(hx)
    pdu = S.S1apPdu.unpack(raw)
    assert pdu.pack() == raw


def test_s1_setup_request_fields():
    """The reference's own assertions (s1ap_test.cc:44-56)."""
    pdu = S.S1apPdu.unpack(bytes.fromhex(VECTORS[0][1]))
    assert pdu.pdu_type == S.PDU_INITIATING and pdu.proc_code == 17
    assert pdu.crit == S.CRIT_REJECT
    plmn, enb_id = S.unpack_global_enb_id(pdu.ie(S.IE_GLOBAL_ENB_ID).value)
    assert enb_id == 0x19B                       # s1ap_test.cc:54
    assert S.unpack_enb_name(pdu.ie(S.IE_ENB_NAME).value) == "enb0019b"


def test_init_ctxt_setup_fields():
    """s1ap_test.cc:91-94: security capability bitmaps."""
    pdu = S.S1apPdu.unpack(bytes.fromhex(VECTORS[1][1]))
    ie = pdu.ie(S.IE_UE_SECURITY_CAPABILITIES)
    assert ie.id == 107                          # s1ap_test.cc:91
    eea, eia = S.unpack_ue_security_capabilities(ie.value)
    assert f"{eea:016b}" == "1100000000000000"
    assert f"{eia:016b}" == "1100000000000000"
    # ... and the framework repacks the IE byte-exactly
    assert S.pack_ue_security_capabilities(eea, eia) == ie.value


def test_framework_s1ap_pdus_are_3gpp_encoded():
    """The E2E's own S1 messages now ride real S1AP-PDUs: pack with the
    framework API, unpack with the raw container, check real IEs."""
    raw = M.pack_pdu(M.PROC_INITIAL_UE_MESSAGE, M.PDU_INITIATING,
                     M.InitialUeMessage(enb_ue_s1ap_id=7,
                                        nas_pdu=b"\x07\x41\x01"))
    pdu = S.S1apPdu.unpack(raw)
    assert pdu.proc_code == 12
    assert S.unpack_nas_pdu(pdu.ie(S.IE_NAS_PDU).value) == b"\x07\x41\x01"
    assert S.unpack_uint(pdu.ie(S.IE_ENB_UE_S1AP_ID).value, 16777215) == 7
    # round trip through the typed layer
    proc, typ, msg = M.unpack_pdu(raw)
    assert msg.enb_ue_s1ap_id == 7 and msg.nas_pdu == b"\x07\x41\x01"


# ---- RRC-NR (38.331 UPER) ---------------------------------------------------

RBC_VECTOR = bytes.fromhex("1409281787c00c28")


def test_radio_bearer_config_vector():
    """srsran_asn1_rrc_nr_test.cc test_radio_bearer_config: the
    reference's asserted fields + byte-exact re-encode."""
    v = RN.unpack(RN.RADIO_BEARER_CONFIG, RBC_VECTOR)
    assert len(v["drb_to_add_mod_list"]) == 1            # :247
    drb = v["drb_to_add_mod_list"][0]
    assert drb["drb_identity"] == 1
    assert drb["cn_association"] == ("eps_bearer_identity", 5)
    sec = v["security_config"]                           # :248-250
    assert sec["security_algorithm_config"]["ciphering_algorithm"] == 2
    assert sec["key_to_use"] == 1                        # secondary
    assert RN.pack(RN.RADIO_BEARER_CONFIG, v) == RBC_VECTOR


def test_rrc_reconfiguration_vector():
    """srsran_asn1_rrc_nr_test.cc test_ue_rrc_reconfiguration: the full
    397-byte EN-DC RRCReconfiguration."""
    hx = ("08817c5c40b1c07d483a04c03e0104541eb50002e85398df46934b8004d26934"
          "000008c98d6d8ca201ff00000000011b82210000040400d1140e70000008c9c6"
          "b6c644a0001eb89563e02494220db844700c0210b01d8048f11806ea00080e01"
          "25c0c8803708420000881650020c820000020698101450a000e4818000133556"
          "4841c001040c2050c1c9c409142c60d1c3c8e0000322140302001914a0182000c"
          "8c500c1800644280e100032294070a001918a0386000c88502c3800645281620"
          "6400416c4804628218a008c504b160118a0a6300231416c6804628318e008c50"
          "6b1e0118a0e64000323140b223100a08409086051043cc3b2a6e4d01a4921e2e"
          "e00c10e00000018ffd29498c637281600002197000000000000052f00fa0848a"
          "d5450047001800082000e21002408070101084000e21001cb00e0402208001c4"
          "20039601c0c04210003884007300382008820007108 00e60004000000410c040"
          "80c100e0d0000e48100000020040008060008090022000a40000238901131c8")
    raw = bytes.fromhex(hx.replace(" ", ""))
    v = RN.unpack(RN.RRC_RECONFIGURATION, raw)
    assert v["rrc_transaction_id"] == 0                  # :206
    kind, ies = v["critical_extensions"]
    assert kind == "rrc_reconfiguration"                 # :214
    assert len(ies["secondary_cell_group"]) == 380       # :215 (>0)
    # re-encode: byte-exact over the encoded length (the committed C
    # array carries one trailing byte past the message, which the
    # reference's own unpack also ignores)
    out = RN.pack(RN.RRC_RECONFIGURATION, v)
    assert out == raw[:len(out)] and len(raw) - len(out) <= 1
