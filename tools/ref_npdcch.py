"""Build + drive a standalone reference NB-IoT NPDCCH harness.

Compiles `lib/src/phy/phch/npdcch.c` + `ch_estimation/chest_dl_nbiot.c`
and their FEC dependencies from /root/reference (all FFT-free) into a
CLI that takes a frequency-domain subframe grid, runs the reference's
own channel estimation and NPDCCH decode, and prints the CRC remainder
per candidate location — ground truth for the committed NPDCCH capture
interop (npdcch_file_test.c counterpart past the FFT).

Usage:
    python tools/ref_npdcch.py build
    /tmp/ref_npdcch/harness <grid.cf32> <sf_idx> <format:0|1> <L> <ncce>
grid.cf32: 14*12 complex64 RE values, symbol-major (one 1-PRB subframe).
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REF = "/root/reference/lib/src/phy"
INC = "/root/reference/lib/include"
WORK = pathlib.Path("/tmp/ref_npdcch")

SOURCES = [
    "phch/npdcch", "phch/dci_nbiot", "phch/ra_nbiot", "phch/prb_dl", "phch/sequences",
    "ch_estimation/chest_dl_nbiot", "ch_estimation/refsignal_dl_nbiot",
    "ch_estimation/chest_common", "ch_estimation/refsignal_dl",
    "fec/ldpc/base_graph",
    "fec/crc", "fec/convolutional/convcoder",
    "fec/convolutional/viterbi", "fec/convolutional/viterbi37_port",
    "fec/turbo/rm_conv", "fec/cbsegm",
    "modem/demod_soft", "modem/mod", "modem/modem_table",
    "modem/lte_tables", "scrambling/scrambling",
    "utils/bit", "utils/vector", "utils/vector_simd", "utils/debug",
    "utils/convolution", "utils/filter",
    "common/phy_common", "common/sequence", "mimo/precoding",
    "mimo/layermap", "resampling/interp", "utils/mat", "stubs",
]

STUBS = r"""
#include <stdarg.h>
#include <stdio.h>
#include <stdint.h>
void srsran_phy_log_print(int level, const char* fmt, ...) {
  (void)level;
  va_list a; va_start(a, fmt); vfprintf(stderr, fmt, a); va_end(a);
}
int srsran_ra_tbs_from_idx(uint32_t tbs_idx, uint32_t n_prb) {
  (void)tbs_idx; (void)n_prb;
  return 0;
}
// debug-print helper from dci.c (not compiled in)
const char* srsran_dci_format_string(int format) {
  (void)format;
  return "FormatN";
}
// FFT-based convolution path (conv_fft) is never taken by
// chest_dl_nbiot (it uses the time-domain srsran_conv_same_cf);
// stub the FFTW-backed DFT API so convolution.c links.
int srsran_dft_plan(void* p, int s, int d, int t) {
  (void)p; (void)s; (void)d; (void)t;
  return -1;
}
int srsran_dft_replan(void* p, int s) {
  (void)p; (void)s;
  return -1;
}
void srsran_dft_plan_free(void* p) { (void)p; }
void srsran_dft_plan_set_norm(void* p, int n) { (void)p; (void)n; }
void srsran_dft_run_c(void* p, const void* in, void* out) {
  (void)p; (void)in; (void)out;
}
"""

HARNESS = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "srsran/phy/ch_estimation/chest_dl_nbiot.h"
#include "srsran/phy/phch/dci_nbiot.h"
#include "srsran/phy/phch/npdcch.h"
#include "srsran/phy/utils/vector.h"

int main(int argc, char** argv) {
  if (argc < 6) { fprintf(stderr, "args\n"); return 2; }
  uint32_t sf_idx = atoi(argv[2]);
  srsran_dci_format_t fmt = atoi(argv[3]) == 0 ? SRSRAN_DCI_FORMATN0
                                               : SRSRAN_DCI_FORMATN1;
  srsran_dci_location_t loc = {.L = (uint32_t)atoi(argv[4]),
                               .ncce = (uint32_t)atoi(argv[5])};

  srsran_nbiot_cell_t cell = {
      .base = {.nof_prb = 1, .nof_ports = 1, .cp = SRSRAN_CP_NORM, .id = 0},
      .nbiot_prb = 0, .n_id_ncell = 0, .nof_ports = 1,
      .mode = SRSRAN_NBIOT_MODE_STANDALONE};

  int nof_re = 6 * SRSRAN_SF_LEN_RE(1, SRSRAN_CP_NORM);
  cf_t* grid = srsran_vec_cf_malloc(nof_re);
  memset(grid, 0, nof_re * sizeof(cf_t));
  FILE* f = fopen(argv[1], "rb");
  if (!f || fread(grid, sizeof(cf_t), 14 * 12, f) != 14 * 12) {
    fprintf(stderr, "read\n"); return 1;
  }
  fclose(f);

  cf_t* ce[SRSRAN_MAX_PORTS] = {};
  for (int i = 0; i < SRSRAN_MAX_PORTS; i++) {
    ce[i] = srsran_vec_cf_malloc(nof_re);
    for (int j = 0; j < nof_re; j++) ce[i][j] = 1;
  }

  srsran_chest_dl_nbiot_t chest;
  if (srsran_chest_dl_nbiot_init(&chest, SRSRAN_NBIOT_MAX_PRB) ||
      srsran_chest_dl_nbiot_set_cell(&chest, cell)) {
    fprintf(stderr, "chest\n"); return 1;
  }
  srsran_npdcch_t npdcch = {};
  if (srsran_npdcch_init(&npdcch) || srsran_npdcch_set_cell(&npdcch, cell)) {
    fprintf(stderr, "npdcch\n"); return 1;
  }

  srsran_chest_dl_nbiot_estimate(&chest, grid, ce, sf_idx);
  float noise = srsran_chest_dl_nbiot_get_noise_estimate(&chest);
  if (srsran_npdcch_extract_llr(&npdcch, grid, ce, noise, sf_idx)) {
    fprintf(stderr, "extract\n"); return 1;
  }
  srsran_dci_msg_t dci = {};
  uint16_t crc_rem = 0;
  if (srsran_npdcch_decode_msg(&npdcch, &dci, &loc, fmt, &crc_rem)) {
    fprintf(stderr, "decode\n"); return 1;
  }
  printf("crc_rem=0x%x nof_bits=%d data=", crc_rem, dci.nof_bits);
  for (uint32_t i = 0; i < dci.nof_bits; i++) printf("%d", dci.payload[i]);
  printf("\n");
  return 0;
}
"""


def build() -> pathlib.Path:
    WORK.mkdir(exist_ok=True)
    # srsran/version.h is CMake-generated; provide a minimal one
    inc2 = WORK / "inc" / "srsran"
    inc2.mkdir(parents=True, exist_ok=True)
    (inc2 / "version.h").write_text(
        '#define SRSRAN_VERSION_STRING "local"\n'
        "#define SRSRAN_VERSION_MAJOR 23\n#define SRSRAN_VERSION_MINOR 11\n"
        "#define SRSRAN_VERSION_PATCH 0\n")
    (WORK / "stubs.c").write_text(STUBS)
    (WORK / "harness.c").write_text(HARNESS)
    objs = []
    for s in SOURCES:
        src = (WORK / "stubs.c" if s == "stubs"
               else pathlib.Path(f"{REF}/{s}.c"))
        obj = WORK / (s.replace("/", "_") + ".o")
        if not obj.exists() or obj.stat().st_mtime < src.stat().st_mtime:
            r = subprocess.run(
                ["gcc", "-O2", "-I", INC, "-I", str(WORK / "inc"), "-I", f"{REF}/phch",
                 "-c", str(src), "-o", str(obj)], capture_output=True)
            if r.returncode:
                sys.exit(f"compile failed {s}:\n{r.stderr.decode()[:2000]}")
        objs.append(str(obj))
    r = subprocess.run(
        ["gcc", "-O2", "-I", INC, "-I", str(WORK / "inc"), str(WORK / "harness.c"), *objs, "-lm",
         "-o", str(WORK / "harness")], capture_output=True)
    if r.returncode:
        sys.exit(f"link failed:\n{r.stderr.decode()[:2000]}")
    return WORK / "harness"


if __name__ == "__main__":
    print(build())
