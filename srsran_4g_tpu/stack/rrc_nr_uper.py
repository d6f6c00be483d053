"""38.331 (NR RRC) UPER schema subset on the rrc_uper engine.

Counterpart of the generated `lib/src/asn1/rrc_nr.cc` for the messages
the framework's NSA/SA flows exchange: RRCReconfiguration (with the
secondaryCellGroup container) and RadioBearerConfig with its full
DRB/PDCP/security substructure — declarative specs interpreted by
`rrc_uper.decode/encode`, validated byte-exactly against the
reference's committed vectors (lib/test/asn1/srsran_asn1_rrc_nr_test.cc
test_ue_rrc_reconfiguration, test_radio_bearer_config).
"""

from __future__ import annotations

from .asn1 import BitReader, BitWriter
from .rrc_uper import decode, encode

# ---- PDCP-Config (38.331 §6.3.2) -------------------------------------------

_DISCARD_TIMER = ("enum", 16)     # ms10..infinity
_SN_SIZE = ("enum", 2)            # len12bits, len18bits
_T_REORDERING = ("enum", 36)

_PDCP_DRB = ("seq", False, [
    ("discard_timer", _DISCARD_TIMER, "o"),
    ("pdcp_sn_size_ul", _SN_SIZE, "o"),
    ("pdcp_sn_size_dl", _SN_SIZE, "o"),
    ("header_compression", ("choice", True, [
        ("not_used", ("null",)),
        ("rohc", ("seq", False, [
            ("max_cid", ("int", 1, 16383), "o"),
            ("profiles", ("bits", 9), "m"),
            ("drb_continue_rohc", ("enum", 1), "o")])),
        ("ul_only_rohc", ("seq", False, [
            ("max_cid", ("int", 1, 16383), "o"),
            ("profiles", ("bits", 1), "m"),
            ("drb_continue_rohc", ("enum", 1), "o")]))]), "m"),
    ("integrity_protection", ("enum", 1), "o"),
    ("status_report_required", ("enum", 1), "o"),
    ("out_of_order_delivery", ("enum", 1), "o"),
])

PDCP_CONFIG = ("seq", True, [
    ("drb", _PDCP_DRB, "o"),
    ("more_than_one_rlc", ("seq", False, [
        ("primary_path", ("seq", False, [
            ("cell_group", ("int", 0, 3), "o"),
            ("logical_channel", ("int", 1, 32), "o")]), "m"),
        ("ul_data_split_threshold", ("enum", 64), "o"),
        ("pdcp_duplication", ("bool",), "o")]), "o"),
    ("t_reordering", _T_REORDERING, "o"),
])

# ---- RadioBearerConfig ------------------------------------------------------

SDAP_CONFIG = ("seq", True, [
    ("pdu_session", ("int", 0, 255), "m"),
    ("sdap_hdr_dl", ("enum", 2), "m"),
    ("sdap_hdr_ul", ("enum", 2), "m"),
    ("default_drb", ("bool",), "m"),
    ("mapped_qos_flows_to_add", ("seqof", 1, 64, ("int", 0, 63)), "o"),
    ("mapped_qos_flows_to_release", ("seqof", 1, 64, ("int", 0, 63)), "o"),
])

DRB_TO_ADD_MOD = ("seq", True, [
    ("cn_association", ("choice", False, [
        ("eps_bearer_identity", ("int", 0, 15)),
        ("sdap_config", SDAP_CONFIG)]), "o"),
    ("drb_identity", ("int", 1, 32), "m"),
    ("reestablish_pdcp", ("enum", 1), "o"),
    ("recover_pdcp", ("enum", 1), "o"),
    ("pdcp_config", PDCP_CONFIG, "o"),
])

SRB_TO_ADD_MOD_NR = ("seq", True, [
    ("srb_identity", ("int", 1, 3), "m"),
    ("reestablish_pdcp", ("enum", 1), "o"),
    ("discard_on_pdcp", ("enum", 1), "o"),
    ("pdcp_config", PDCP_CONFIG, "o"),
])

SECURITY_ALGORITHM_CONFIG = ("seq", True, [
    ("ciphering_algorithm", ("enum+", 8), "m"),
    ("integrity_prot_algorithm", ("enum+", 8), "o"),
])

SECURITY_CONFIG = ("seq", True, [
    ("security_algorithm_config", SECURITY_ALGORITHM_CONFIG, "o"),
    ("key_to_use", ("enum", 2), "o"),
])

RADIO_BEARER_CONFIG = ("seq", True, [
    ("srb_to_add_mod_list", ("seqof", 1, 2, SRB_TO_ADD_MOD_NR), "o"),
    ("srb3_to_release", ("enum", 1), "o"),
    ("drb_to_add_mod_list", ("seqof", 1, 29, DRB_TO_ADD_MOD), "o"),
    ("drb_to_release_list", ("seqof", 1, 29, ("int", 1, 32)), "o"),
    ("security_config", SECURITY_CONFIG, "o"),
])

# ---- RRCReconfiguration -----------------------------------------------------

_MEAS_CONFIG_OPAQUE = ("octets*",)   # not exercised by the NSA flow

RRC_RECFG_V1530_IES = ("seq", False, [
    ("master_cell_group", ("octets*",), "o"),
    ("full_config", ("enum", 1), "o"),
    ("dedicated_nas_msg_list", ("seqof", 1, 29, ("octets*",)), "o"),
    ("master_key_update", ("seq", True, [
        ("key_set_change_ind", ("bool",), "m"),
        ("next_hop_chaining_count", ("int", 0, 7), "m"),
        ("nas_container", ("octets*",), "o")]), "o"),
    ("dedicated_sib1_delivery", ("octets*",), "o"),
    ("dedicated_sys_info_delivery", ("octets*",), "o"),
    ("other_config", ("seq", False, [
        ("delay_budget_report_cfg", ("choice", False, [
            ("release", ("null",)),
            ("setup", ("seq", False, [
                ("delay_budget_report_prohibit_timer",
                 ("enum", 8), "m")]))]), "o")]), "o"),
    ("non_crit_ext", ("seq", False, []), "o"),
])

RRC_RECFG_IES = ("seq", False, [
    ("radio_bearer_config", RADIO_BEARER_CONFIG, "o"),
    ("secondary_cell_group", ("octets*",), "o"),
    ("meas_config", _MEAS_CONFIG_OPAQUE, "o"),
    ("late_non_critical_extension", ("octets*",), "o"),
    ("non_critical_extension", RRC_RECFG_V1530_IES, "o"),
])

RRC_RECONFIGURATION = ("seq", False, [
    ("rrc_transaction_id", ("int", 0, 3), "m"),
    ("critical_extensions", ("choice", False, [
        ("rrc_reconfiguration", RRC_RECFG_IES),
        ("critical_extensions_future", ("seq", False, []))]), "m"),
])


def unpack(spec, data: bytes):
    return decode(spec, BitReader(data))


def pack(spec, value) -> bytes:
    w = BitWriter()
    encode(spec, value, w)
    return w.to_bytes()
