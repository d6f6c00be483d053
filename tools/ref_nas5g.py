"""Build + drive the reference's OWN generated 5G NAS codec.

Compiles `lib/src/asn1/nas_5g_msg.cc` + `nas_5g_ies.cc` +
`nas_5g_utils.cc` from /root/reference into a round-trip CLI: it unpacks
a plain 24.501 PDU with the reference codec, re-packs it, and prints the
re-encoded hex.  Ground truth for `stack/nas_5gs_codec.py` /
`stack/nas_5g.py` message encodings (tests/test_nas5g_wire_exact.py) —
the same sanctioned pattern as tools/ref_rrc.py / ref_nas.py.

Usage:
    python tools/ref_nas5g.py build
    /tmp/ref_nas5g/harness <hex>
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REF = "/root/reference/lib/src/asn1"
INC = "/root/reference/lib/include"
WORK = pathlib.Path("/tmp/ref_nas5g")

HARNESS = r"""
#include "srsran/asn1/nas_5g_msg.h"
#include <cstdio>
#include <cstring>
#include <vector>

using namespace srsran::nas_5g;

static std::vector<uint8_t> from_hex(const char* s) {
  std::vector<uint8_t> out;
  for (size_t i = 0; i + 1 < strlen(s); i += 2) {
    unsigned v;
    sscanf(s + i, "%2x", &v);
    out.push_back((uint8_t)v);
  }
  return out;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: harness <hex>\n");
    return 2;
  }
  auto pdu = from_hex(argv[1]);
  nas_5gs_msg msg;
  if (msg.unpack(pdu) != asn1::SRSASN_SUCCESS) {
    printf("UNPACK_FAIL\n");
    return 1;
  }
  std::vector<uint8_t> out;
  if (msg.pack(out) != asn1::SRSASN_SUCCESS) {
    printf("PACK_FAIL\n");
    return 1;
  }
  for (uint8_t b : out) printf("%02x", b);
  printf("\n");
  return 0;
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
    srcs = [f"{REF}/asn1_utils.cc", f"{REF}/nas_5g_msg.cc",
            f"{REF}/nas_5g_ies.cc", f"{REF}/nas_5g_utils.cc",
            ] + SRSLOG_SRCS + [str(WORK / "harness.cc")]
    for src in srcs:
        obj = WORK / (pathlib.Path(src).stem + ".o")
        if obj.exists() and obj.stat().st_mtime > \
                pathlib.Path(src).stat().st_mtime:
            objs.append(str(obj))
            continue
        subprocess.run(
            ["g++", "-std=c++14", "-O1", "-c", src, f"-I{INC}",
             f"-I{INC}/srsran/srslog/bundled", "-o", str(obj)], check=True)
        objs.append(str(obj))
    exe = WORK / "harness"
    subprocess.run(["g++", "-o", str(exe), *objs, "-lpthread"], check=True)
    return exe


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build())
    else:
        print(__doc__)
