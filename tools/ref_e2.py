"""Build + drive the reference's OWN E2AP / E2SM-KPM codecs.

Round-trip harness over `lib/src/asn1/e2ap.cpp` + `e2sm_kpm_v2.cpp`:
unpack an aligned-PER PDU with the reference codec and re-encode it.
Ground truth for `stack/e2ap_per.py` (tests/test_e2_wire_exact.py).

Usage:
    python tools/ref_e2.py build
    /tmp/ref_e2/harness <class> <hex>
        class in {e2ap            (E2AP-PDU),
                  kpm_func_desc   (E2SM-KPM-RANfunction-Description),
                  kpm_ind_hdr     (E2SM-KPM-IndicationHeader),
                  kpm_ind_msg     (E2SM-KPM-IndicationMessage),
                  kpm_trigger     (E2SM-KPM-EventTriggerDefinition),
                  kpm_action      (E2SM-KPM-ActionDefinition)}
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REF = "/root/reference/lib/src/asn1"
INC = "/root/reference/lib/include"
WORK = pathlib.Path("/tmp/ref_e2")

HARNESS = r"""
#include "srsran/asn1/e2ap.h"
#include "srsran/asn1/e2sm_kpm_v2.h"
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

using namespace asn1;

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
  static uint8_t buf[16384];
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
  if (cls == "e2ap") return roundtrip<asn1::e2ap::e2_ap_pdu_c>(pdu);
  if (cls == "kpm_func_desc")
    return roundtrip<asn1::e2sm_kpm::e2_sm_kpm_ra_nfunction_description_s>(pdu);
  if (cls == "kpm_ind_hdr")
    return roundtrip<asn1::e2sm_kpm::e2_sm_kpm_ind_hdr_s>(pdu);
  if (cls == "kpm_ind_msg")
    return roundtrip<asn1::e2sm_kpm::e2_sm_kpm_ind_msg_s>(pdu);
  if (cls == "kpm_trigger")
    return roundtrip<asn1::e2sm_kpm::e2_sm_kpm_event_trigger_definition_s>(pdu);
  if (cls == "kpm_action")
    return roundtrip<asn1::e2sm_kpm::e2_sm_kpm_action_definition_s>(pdu);
  fprintf(stderr, "unknown class %s\n", cls.c_str());
  return 2;
}
"""

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
    srcs = [f"{REF}/asn1_utils.cc", f"{REF}/e2ap.cpp",
            f"{REF}/e2sm_kpm_v2.cpp"] + SRSLOG_SRCS + [
        str(WORK / "harness.cc")]
    for src in srcs:
        obj = WORK / (pathlib.Path(src).stem + ".o")
        if not (obj.exists() and obj.stat().st_mtime
                > pathlib.Path(src).stat().st_mtime):
            subprocess.run(
                ["g++", "-std=c++14", "-O1", "-c", src, f"-I{INC}",
                 f"-I{INC}/srsran/srslog/bundled", "-o", str(obj)],
                check=True)
        objs.append(str(obj))
    exe = WORK / "harness"
    subprocess.run(["g++", "-o", str(exe), *objs], check=True)
    return exe


def roundtrip(cls: str, pdu: bytes) -> bytes | None:
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
