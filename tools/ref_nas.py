"""Build + drive the reference's OWN NAS codec (liblte_mme.cc).

Round-trip harness over `lib/src/asn1/liblte_mme.cc`: unpack a plain
(sec_hdr=0) 24.301 EMM/ESM message with the reference codec and re-pack
it, printing the re-encoded hex.  Ground truth for
`stack/nas_msgs.py`'s wire encodings (tests/test_nas_wire_exact.py):
a framework-encoded PDU the reference decodes and re-encodes to the
SAME bytes is 24.301-exact by construction.

Usage:
    python tools/ref_nas.py build
    /tmp/ref_nas/harness <type> <hex>
        type in {attach_request, attach_accept, attach_complete,
                 authentication_request, authentication_response,
                 security_mode_command, security_mode_complete,
                 act_def_bearer_req, act_def_bearer_accept,
                 pdn_connectivity_request, detach_request,
                 identity_request, identity_response}
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REF = "/root/reference/lib/src/asn1"
INC = "/root/reference/lib/include"
WORK = pathlib.Path("/tmp/ref_nas")

HARNESS = r"""
#include "srsran/asn1/liblte_mme.h"
#include <cstdio>
#include <cstring>
#include <string>

static LIBLTE_BYTE_MSG_STRUCT g_in, g_out;

static void load_hex(const char* s) {
  g_in.N_bytes = 0;
  for (size_t i = 0; i + 1 < strlen(s); i += 2) {
    unsigned v;
    sscanf(s + i, "%2x", &v);
    g_in.msg[g_in.N_bytes++] = (uint8)v;
  }
}

// NOTE: unpack must run before pack — C++ leaves argument evaluation
// order unspecified, so the two steps are sequenced with a macro.
static int emit(LIBLTE_ERROR_ENUM up, LIBLTE_ERROR_ENUM pk) {
  if (up != LIBLTE_SUCCESS) { printf("UNPACK_FAIL\n"); return 1; }
  if (pk != LIBLTE_SUCCESS) { printf("PACK_FAIL\n"); return 1; }
  for (uint32 i = 0; i < g_out.N_bytes; i++) printf("%02x", g_out.msg[i]);
  printf("\n");
  return 0;
}

#define ROUNDTRIP(unpack_call, pack_call)      \
  do {                                         \
    LIBLTE_ERROR_ENUM up_ = (unpack_call);     \
    LIBLTE_ERROR_ENUM pk_ = (pack_call);       \
    return emit(up_, pk_);                     \
  } while (0)

int main(int argc, char** argv) {
  if (argc < 3) { fprintf(stderr, "usage: harness <type> <hex>\n"); return 2; }
  std::string t = argv[1];
  load_hex(argv[2]);
  if (t == "attach_request") {
    LIBLTE_MME_ATTACH_REQUEST_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_attach_request_msg(&g_in, &m), liblte_mme_pack_attach_request_msg(&m, &g_out));
  }
  if (t == "attach_accept") {
    LIBLTE_MME_ATTACH_ACCEPT_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_attach_accept_msg(&g_in, &m), liblte_mme_pack_attach_accept_msg(
                    &m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &g_out));
  }
  if (t == "attach_complete") {
    LIBLTE_MME_ATTACH_COMPLETE_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_attach_complete_msg(&g_in, &m), liblte_mme_pack_attach_complete_msg(
                    &m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &g_out));
  }
  if (t == "authentication_request") {
    LIBLTE_MME_AUTHENTICATION_REQUEST_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_authentication_request_msg(&g_in, &m), liblte_mme_pack_authentication_request_msg(&m, &g_out));
  }
  if (t == "authentication_response") {
    LIBLTE_MME_AUTHENTICATION_RESPONSE_MSG_STRUCT m = {};
    LIBLTE_ERROR_ENUM up = liblte_mme_unpack_authentication_response_msg(&g_in, &m);
    // the reference's unpack never fills res_len (it only copies the RES
    // bytes) — recover it from the wire so the repack is faithful
    m.res_len = g_in.msg[2];
    return emit(up, liblte_mme_pack_authentication_response_msg(
                        &m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0,
                        &g_out));
  }
  if (t == "security_mode_command") {
    LIBLTE_MME_SECURITY_MODE_COMMAND_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_security_mode_command_msg(&g_in, &m), liblte_mme_pack_security_mode_command_msg(
                    &m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &g_out));
  }
  if (t == "security_mode_complete") {
    LIBLTE_MME_SECURITY_MODE_COMPLETE_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_security_mode_complete_msg(&g_in, &m), liblte_mme_pack_security_mode_complete_msg(
                    &m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &g_out));
  }
  if (t == "act_def_bearer_req") {
    LIBLTE_MME_ACTIVATE_DEFAULT_EPS_BEARER_CONTEXT_REQUEST_MSG_STRUCT m = {};
    ROUNDTRIP(
        liblte_mme_unpack_activate_default_eps_bearer_context_request_msg(
            &g_in, &m),
        liblte_mme_pack_activate_default_eps_bearer_context_request_msg(
            &m, &g_out));
  }
  if (t == "act_def_bearer_accept") {
    LIBLTE_MME_ACTIVATE_DEFAULT_EPS_BEARER_CONTEXT_ACCEPT_MSG_STRUCT m = {};
    ROUNDTRIP(
        liblte_mme_unpack_activate_default_eps_bearer_context_accept_msg(
            &g_in, &m),
        liblte_mme_pack_activate_default_eps_bearer_context_accept_msg(
            &m, &g_out));
  }
  if (t == "pdn_connectivity_request") {
    LIBLTE_MME_PDN_CONNECTIVITY_REQUEST_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_pdn_connectivity_request_msg(&g_in, &m), liblte_mme_pack_pdn_connectivity_request_msg(&m, &g_out));
  }
  if (t == "detach_request") {
    LIBLTE_MME_DETACH_REQUEST_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_detach_request_msg(&g_in, &m), liblte_mme_pack_detach_request_msg(
                    &m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &g_out));
  }
  if (t == "identity_request") {
    LIBLTE_MME_ID_REQUEST_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_identity_request_msg(&g_in, &m), liblte_mme_pack_identity_request_msg(&m, &g_out));
  }
  if (t == "identity_response") {
    LIBLTE_MME_ID_RESPONSE_MSG_STRUCT m = {};
    ROUNDTRIP(liblte_mme_unpack_identity_response_msg(&g_in, &m), liblte_mme_pack_identity_response_msg(
                    &m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &g_out));
  }
  fprintf(stderr, "unknown type %s\n", t.c_str());
  return 2;
}
"""


def build() -> pathlib.Path:
    WORK.mkdir(parents=True, exist_ok=True)
    (WORK / "harness.cc").write_text(HARNESS)
    objs = []
    srcs = [f"{REF}/liblte_mme.cc", f"{REF}/liblte_common.cc",
            str(WORK / "harness.cc")]
    for src in srcs:
        obj = WORK / (pathlib.Path(src).stem + ".o")
        if not (obj.exists() and obj.stat().st_mtime
                > pathlib.Path(src).stat().st_mtime):
            subprocess.run(
                ["g++", "-std=c++14", "-O1", "-c", src, f"-I{INC}",
                 "-o", str(obj)], check=True)
        objs.append(str(obj))
    exe = WORK / "harness"
    subprocess.run(["g++", "-o", str(exe), *objs], check=True)
    return exe


def roundtrip(msg_type: str, pdu: bytes) -> bytes | None:
    exe = WORK / "harness"
    if not exe.exists():
        build()
    r = subprocess.run([str(exe), msg_type, pdu.hex()], capture_output=True,
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
