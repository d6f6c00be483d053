"""Build + drive the reference's OWN generated RRC ASN.1 codec.

Compiles `lib/src/asn1/rrc.cc` + `lib/src/asn1/rrc/*.cc` from
/root/reference into a round-trip CLI: it unpacks a UPER PDU with the
reference codec, re-packs it, and prints the re-encoded hex (stdout)
plus the decoded JSON tree (stderr).  This is the ground truth for the
framework's `stack/rrc_uper.py` wire encodings: a framework-encoded
PDU that the reference decodes and re-encodes to the SAME bytes is
3GPP-exact by construction.

Usage:
    python tools/ref_rrc.py build
    /tmp/ref_rrc/harness <class> <hex>
        class in {bcch_bch, bcch_dl_sch, pcch, dl_ccch, ul_ccch,
                  dl_dcch, ul_dcch}
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REF = "/root/reference/lib/src/asn1"
INC = "/root/reference/lib/include"
WORK = pathlib.Path("/tmp/ref_rrc")

RRC_MODULES = [
    "common", "common_ext", "bcch_msg", "dl_ccch_msg", "dl_dcch_msg",
    "ul_ccch_msg", "ul_dcch_msg", "si", "rr_common", "rr_ded", "phy_ded",
    "security", "meascfg", "paging", "uecap", "ho_cmd",
]

HARNESS = r"""
#include "srsran/asn1/rrc/bcch_msg.h"
#include "srsran/asn1/rrc/dl_ccch_msg.h"
#include "srsran/asn1/rrc/dl_dcch_msg.h"
#include "srsran/asn1/rrc/paging.h"
#include "srsran/asn1/rrc/ul_ccch_msg.h"
#include "srsran/asn1/rrc/ul_dcch_msg.h"
#include "srsran/asn1/rrc_nbiot.h"
#include "srsran/asn1/rrc_nr.h"
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

using namespace asn1;
using namespace asn1::rrc;

static std::vector<uint8_t> from_hex(const char* s) {
  std::vector<uint8_t> out;
  for (size_t i = 0; i + 1 < strlen(s); i += 2) {
    unsigned v;
    sscanf(s + i, "%2x", &v);
    out.push_back((uint8_t)v);
  }
  return out;
}

template <class Msg>
static int roundtrip(const std::vector<uint8_t>& in) {
  Msg msg;
  cbit_ref bref(in.data(), in.size());
  if (msg.unpack(bref) != SRSASN_SUCCESS) {
    printf("UNPACK_FAIL\n");
    return 1;
  }
  uint8_t buf[8192] = {0};
  bit_ref wref(buf, sizeof buf);
  if (msg.pack(wref) != SRSASN_SUCCESS) {
    printf("PACK_FAIL\n");
    return 1;
  }
  int nbytes = (int)((wref.distance() + 7) / 8);
  for (int i = 0; i < nbytes; i++) printf("%02x", buf[i]);
  printf("\n");
  json_writer jw;
  msg.to_json(jw);
  fprintf(stderr, "%s\n", jw.to_string().c_str());
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: harness <class> <hex>\n");
    return 2;
  }
  std::string cls = argv[1];
  auto pdu = from_hex(argv[2]);
  if (cls == "bcch_bch") return roundtrip<bcch_bch_msg_s>(pdu);
  if (cls == "bcch_dl_sch") return roundtrip<bcch_dl_sch_msg_s>(pdu);
  if (cls == "pcch") return roundtrip<pcch_msg_s>(pdu);
  if (cls == "dl_ccch") return roundtrip<dl_ccch_msg_s>(pdu);
  if (cls == "ul_ccch") return roundtrip<ul_ccch_msg_s>(pdu);
  if (cls == "dl_dcch") return roundtrip<dl_dcch_msg_s>(pdu);
  if (cls == "ul_dcch") return roundtrip<ul_dcch_msg_s>(pdu);
  if (cls == "bcch_bch_nb") return roundtrip<bcch_bch_msg_nb_s>(pdu);
  if (cls == "bcch_dl_sch_nb") return roundtrip<bcch_dl_sch_msg_nb_s>(pdu);
  if (cls == "ul_ccch_nb") return roundtrip<ul_ccch_msg_nb_s>(pdu);
  if (cls == "dl_ccch_nb") return roundtrip<dl_ccch_msg_nb_s>(pdu);
  if (cls == "ul_dcch_nb") return roundtrip<ul_dcch_msg_nb_s>(pdu);
  if (cls == "ul_ccch_nr") return roundtrip<asn1::rrc_nr::ul_ccch_msg_s>(pdu);
  if (cls == "dl_ccch_nr") return roundtrip<asn1::rrc_nr::dl_ccch_msg_s>(pdu);
  if (cls == "ul_dcch_nr") return roundtrip<asn1::rrc_nr::ul_dcch_msg_s>(pdu);
  if (cls == "dl_dcch_nr") return roundtrip<asn1::rrc_nr::dl_dcch_msg_s>(pdu);
  fprintf(stderr, "unknown class %s\n", cls.c_str());
  return 2;
}
"""

# asn1_utils calls srslog on error paths; link the real (small) srslog
# frontend + bundled fmt rather than stubbing its class hierarchy.
SRSLOG_SRCS = [
    "/root/reference/lib/src/srslog/srslog.cpp",
    "/root/reference/lib/src/srslog/backend_worker.cpp",
    "/root/reference/lib/src/srslog/formatters/text_formatter.cpp",
    "/root/reference/lib/src/srslog/formatters/json_formatter.cpp",
    "/root/reference/lib/src/srslog/bundled/fmt/format.cc",
    "/root/reference/lib/src/srslog/bundled/fmt/os.cc",
]


def build() -> pathlib.Path:
    WORK.mkdir(parents=True, exist_ok=True)
    (WORK / "harness.cc").write_text(HARNESS)
    objs = []
    srcs = [f"{REF}/asn1_utils.cc", f"{REF}/rrc.cc",
            f"{REF}/rrc_nbiot.cc", f"{REF}/rrc_nr.cc"] + [
        f"{REF}/rrc/{m}.cc" for m in RRC_MODULES
    ] + SRSLOG_SRCS + [str(WORK / "harness.cc")]
    for src in srcs:
        obj = WORK / (pathlib.Path(src).stem + ".o")
        if obj.exists() and obj.stat().st_mtime > pathlib.Path(src).stat().st_mtime:
            objs.append(str(obj))
            continue
        subprocess.run(
            ["g++", "-std=c++14", "-O1", "-c", src, f"-I{INC}",
             f"-I{INC}/srsran/srslog/bundled", "-o", str(obj)], check=True)
        objs.append(str(obj))
    exe = WORK / "harness"
    subprocess.run(["g++", "-o", str(exe), *objs], check=True)
    return exe


def roundtrip(cls: str, pdu: bytes) -> bytes | None:
    """Round-trip `pdu` through the reference codec; returns the
    re-encoded bytes or None on unpack/pack failure."""
    exe = WORK / "harness"
    if not exe.exists():
        build()
    r = subprocess.run([str(exe), cls, pdu.hex()], capture_output=True,
                       text=True)
    line = r.stdout.strip()
    if r.returncode != 0 or not line or "FAIL" in line:
        return None
    return bytes.fromhex(line)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build())
    else:
        print(__doc__)
