"""Build + drive a standalone reference NR SCH (LDPC DL-SCH) harness.

Compiles `lib/src/phy/phch/sch_nr.c` and its FEC dependencies from
/root/reference into a tiny CLI that encodes or decodes one transport
block, so framework bit chains can be checked against the reference's
own code without building the whole PHY (no FFTW on this image).

Usage:
    python tools/ref_nr_sch.py build
    /tmp/ref_nr_sch/harness dec <tbs> <qm> <rv> <R_x1024> <llr.i8>
    /tmp/ref_nr_sch/harness enc <tbs> <qm> <rv> <R_x1024> <G> <payload.bin>

LLR file: G int8 values in the REFERENCE's sign convention
(positive => bit 0).  Decode prints `crc=OK|KO payload=<hex>`;
encode writes e_bits (one byte per bit) to stdout as hex.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REF = "/root/reference/lib/src/phy"
INC = "/root/reference/lib/include"
WORK = pathlib.Path("/tmp/ref_nr_sch")

SOURCES = [
    "phch/sch_nr", "fec/cbsegm", "fec/crc", "fec/softbuffer",
    "fec/ldpc/ldpc_decoder", "fec/ldpc/ldpc_dec_c", "fec/ldpc/ldpc_dec_f",
    "fec/ldpc/ldpc_dec_s", "fec/ldpc/ldpc_dec_c_flood",
    "fec/ldpc/ldpc_encoder", "fec/ldpc/ldpc_enc_c", "fec/ldpc/ldpc_rm",
    "fec/ldpc/base_graph", "utils/bit", "utils/vector", "utils/vector_simd",
    "utils/debug", "common/phy_common_nr", "common/phy_common",
    "common/sequence", "phch/ra_nr_stub",
]

RA_NR_STUB = r"""
// srsran_ra_nr_tbs is only reached with limited_buffer_rm=true, which the
// harness never sets; stub it to avoid pulling in the whole ra_nr chain.
#include <stdint.h>
uint32_t srsran_ra_nr_tbs(uint32_t nof_re, double S, double R, uint32_t Qm,
                          uint32_t nof_layers) {
  (void)nof_re; (void)S; (void)R; (void)Qm; (void)nof_layers;
  return 0;
}
// softbuffer_{tx,rx}_init (non-guru) use the LTE TBS table; the harness
// only calls the _guru variants.
int srsran_ra_tbs_from_idx(uint32_t tbs_idx, uint32_t n_prb) {
  (void)tbs_idx; (void)n_prb;
  return 0;
}
// debug.c's logger hook (normally from srslog's C shim)
#include <stdarg.h>
#include <stdio.h>
void srsran_phy_log_print(int level, const char* fmt, ...) {
  (void)level;
  va_list a; va_start(a, fmt); vfprintf(stderr, fmt, a); va_end(a);
}
"""

HARNESS = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "srsran/phy/phch/sch_nr.h"
#include "srsran/phy/fec/softbuffer.h"
#include "srsran/phy/utils/vector.h"

static srsran_mod_t qm_to_mod(int qm) {
  switch (qm) {
    case 1: return SRSRAN_MOD_BPSK;
    case 2: return SRSRAN_MOD_QPSK;
    case 4: return SRSRAN_MOD_16QAM;
    case 6: return SRSRAN_MOD_64QAM;
    default: return SRSRAN_MOD_256QAM;
  }
}

int main(int argc, char** argv) {
  if (argc < 6) { fprintf(stderr, "args\n"); return 2; }
  int dec = strcmp(argv[1], "dec") == 0;
  int tbs = atoi(argv[2]);
  int qm = atoi(argv[3]);
  int rv = atoi(argv[4]);
  double R = atof(argv[5]) / 1024.0;

  srsran_sch_nr_t q = {};
  srsran_sch_nr_args_t args = {};
  args.disable_simd = true;
  args.max_nof_iter = 20;
  if (dec ? srsran_sch_nr_init_rx(&q, &args) : srsran_sch_nr_init_tx(&q, &args)) {
    fprintf(stderr, "init failed\n"); return 1;
  }
  srsran_carrier_nr_t carrier = {};
  carrier.nof_prb = 106;
  srsran_sch_nr_set_carrier(&q, &carrier);

  srsran_sch_cfg_t sch_cfg = {};
  srsran_sch_tb_t tb = {};
  tb.mod = qm_to_mod(qm);
  tb.N_L = 1;
  tb.tbs = tbs;
  tb.R = R;
  tb.rv = rv;
  tb.cw_idx = 0;
  tb.enabled = true;

  if (dec) {
    // dec <tbs> <qm> <rv> <R_x1024> <llr.i8>
    FILE* f = fopen(argv[6], "rb");
    if (!f) { fprintf(stderr, "open\n"); return 1; }
    fseek(f, 0, SEEK_END); long g = ftell(f); fseek(f, 0, SEEK_SET);
    int8_t* llr = srsran_vec_i8_malloc(g);
    if (fread(llr, 1, g, f) != (size_t)g) { return 1; }
    fclose(f);
    tb.nof_bits = (uint32_t)g;
    tb.nof_re = (uint32_t)g / qm;
    srsran_softbuffer_rx_t sb = {};
    srsran_softbuffer_rx_init_guru(&sb, SRSRAN_SCH_NR_MAX_NOF_CB_LDPC,
                                   SRSRAN_LDPC_MAX_LEN_ENCODED_CB);
    tb.softbuffer.rx = &sb;
    uint8_t* data = srsran_vec_u8_malloc(tbs / 8 + 16);
    srsran_sch_tb_res_nr_t res = {};
    res.payload = data;
    if (srsran_dlsch_nr_decode(&q, &sch_cfg, &tb, llr, &res) < 0) {
      fprintf(stderr, "decode error\n"); return 1;
    }
    printf("crc=%s payload=", res.crc ? "OK" : "KO");
    for (int i = 0; i < tbs / 8; i++) printf("%02x", data[i]);
    printf("\n");
  } else {
    // enc <tbs> <qm> <rv> <R_x1024> <G> <payload.bin>
    int g = atoi(argv[6]);
    tb.nof_bits = g;
    tb.nof_re = g / qm;
    FILE* f = fopen(argv[7], "rb");
    if (!f) { fprintf(stderr, "open\n"); return 1; }
    uint8_t* data = srsran_vec_u8_malloc(tbs / 8 + 16);
    if (fread(data, 1, tbs / 8, f) != (size_t)(tbs / 8)) { return 1; }
    fclose(f);
    srsran_softbuffer_tx_t sb = {};
    srsran_softbuffer_tx_init_guru(&sb, SRSRAN_SCH_NR_MAX_NOF_CB_LDPC,
                                   SRSRAN_LDPC_MAX_LEN_ENCODED_CB);
    tb.softbuffer.tx = &sb;
    uint8_t* e = srsran_vec_u8_malloc(g);
    if (srsran_dlsch_nr_encode(&q, &sch_cfg, &tb, data, e) < 0) {
      fprintf(stderr, "encode error\n"); return 1;
    }
    for (int i = 0; i < g; i++) putchar(e[i] ? '1' : '0');
    putchar('\n');
  }
  return 0;
}
"""


def build() -> pathlib.Path:
    WORK.mkdir(exist_ok=True)
    (WORK / "ra_nr_stub.c").write_text(RA_NR_STUB)
    (WORK / "harness.c").write_text(HARNESS)
    objs = []
    for s in SOURCES:
        src = (WORK / "ra_nr_stub.c" if s.endswith("ra_nr_stub")
               else pathlib.Path(f"{REF}/{s}.c"))
        obj = WORK / (s.replace("/", "_") + ".o")
        if not obj.exists() or obj.stat().st_mtime < src.stat().st_mtime:
            r = subprocess.run(
                ["gcc", "-O2", "-I", INC, "-c", str(src), "-o", str(obj)],
                capture_output=True)
            if r.returncode:
                sys.exit(f"compile failed {s}:\n{r.stderr.decode()[:2000]}")
        objs.append(str(obj))
    r = subprocess.run(
        ["gcc", "-O2", "-I", INC, str(WORK / "harness.c"), *objs, "-lm",
         "-o", str(WORK / "harness")], capture_output=True)
    if r.returncode:
        sys.exit(f"link failed:\n{r.stderr.decode()[:2000]}")
    return WORK / "harness"


if __name__ == "__main__":
    print(build())
