"""Build + drive the reference's DCI codec as a parity oracle.

Compiles the reference's `lib/src/phy/phch/dci.c` (+ its small dependency
closure) into a CLI that prints `srsran_dci_format_sizeof` for every DL
format and the exact packed payload bits of formats 1A/1/1B/1C/1D/2/2A/2B
— the ground truth for `models/dci.py` (same pattern as tools/ref_rrc.py:
the reference's own compiled code is the oracle, never imported into the
framework).

Usage:
    python tools/ref_dci.py build
    /tmp/ref_dci/ref_dci sizeof <nof_prb> <nof_ports>
    /tmp/ref_dci/ref_dci pack <fmt> <nof_prb> <nof_ports> <k=v ...>
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REF = "/root/reference/lib/src/phy"
INC = "/root/reference/lib/include"
WORK = pathlib.Path("/tmp/ref_dci")

MAIN_C = r"""
#include "srsran/phy/phch/dci.h"
#include "srsran/phy/phch/ra.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static srsran_dci_format_t FMTS[] = {
    SRSRAN_DCI_FORMAT0,  SRSRAN_DCI_FORMAT1,  SRSRAN_DCI_FORMAT1A,
    SRSRAN_DCI_FORMAT1B, SRSRAN_DCI_FORMAT1C, SRSRAN_DCI_FORMAT1D,
    SRSRAN_DCI_FORMAT2,  SRSRAN_DCI_FORMAT2A, SRSRAN_DCI_FORMAT2B};
static const char* NAMES[] = {"0", "1", "1A", "1B", "1C", "1D",
                              "2", "2A", "2B"};

static int arg_int(int argc, char** argv, const char* key, int dflt) {
  size_t n = strlen(key);
  for (int i = 0; i < argc; i++)
    if (!strncmp(argv[i], key, n) && argv[i][n] == '=')
      return atoi(argv[i] + n + 1);
  return dflt;
}

int main(int argc, char** argv) {
  if (argc < 4) return 1;
  srsran_cell_t cell;
  memset(&cell, 0, sizeof(cell));
  cell.nof_prb = atoi(argv[2]);
  cell.nof_ports = atoi(argv[3]);
  cell.cp = SRSRAN_CP_NORM;
  cell.frame_type = SRSRAN_FDD;
  srsran_dl_sf_cfg_t sf;
  memset(&sf, 0, sizeof(sf));
  srsran_dci_cfg_t cfg;
  memset(&cfg, 0, sizeof(cfg));

  if (!strcmp(argv[1], "sizeof")) {
    for (unsigned i = 0; i < sizeof(FMTS) / sizeof(FMTS[0]); i++)
      printf("%s %d\n", NAMES[i],
             srsran_dci_format_sizeof(&cell, &sf, &cfg, FMTS[i]));
    return 0;
  }
  if (!strcmp(argv[1], "pack")) {
    /* argv: pack <fmt> <nof_prb> <nof_ports> k=v... */
    const char* fmt = argv[2];
    cell.nof_prb = atoi(argv[3]);
    cell.nof_ports = atoi(argv[4]);
    srsran_dci_dl_t dci;
    memset(&dci, 0, sizeof(dci));
    srsran_dci_msg_t msg;
    memset(&msg, 0, sizeof(msg));
    dci.pid = arg_int(argc, argv, "pid", 0);
    dci.tpc_pucch = arg_int(argc, argv, "tpc", 0);
    dci.tb[0].mcs_idx = arg_int(argc, argv, "mcs0", 0);
    dci.tb[0].ndi = arg_int(argc, argv, "ndi0", 0);
    dci.tb[0].rv = arg_int(argc, argv, "rv0", 0);
    dci.tb[1].mcs_idx = arg_int(argc, argv, "mcs1", 0);
    dci.tb[1].ndi = arg_int(argc, argv, "ndi1", 0);
    dci.tb[1].rv = arg_int(argc, argv, "rv1", 0);
    dci.pinfo = arg_int(argc, argv, "pinfo", 0);
    dci.tb_cw_swap = arg_int(argc, argv, "swap", 0);
    dci.sram_id = arg_int(argc, argv, "swap", 0);
    dci.power_offset = arg_int(argc, argv, "poff", 0);
    dci.rnti = 0x46;
    if (!strcmp(fmt, "2")) {
      dci.format = SRSRAN_DCI_FORMAT2;
    } else if (!strcmp(fmt, "2A")) {
      dci.format = SRSRAN_DCI_FORMAT2A;
    } else if (!strcmp(fmt, "2B")) {
      dci.format = SRSRAN_DCI_FORMAT2B;
    } else if (!strcmp(fmt, "1")) {
      dci.format = SRSRAN_DCI_FORMAT1;
    } else if (!strcmp(fmt, "1A")) {
      dci.format = SRSRAN_DCI_FORMAT1A;
    } else if (!strcmp(fmt, "1B")) {
      dci.format = SRSRAN_DCI_FORMAT1B;
    } else if (!strcmp(fmt, "1C")) {
      dci.format = SRSRAN_DCI_FORMAT1C;
    } else if (!strcmp(fmt, "1D")) {
      dci.format = SRSRAN_DCI_FORMAT1D;
    } else {
      return 2;
    }
    if (!strcmp(fmt, "2") || !strcmp(fmt, "2A") || !strcmp(fmt, "2B") ||
        !strcmp(fmt, "1")) {
      dci.alloc_type = SRSRAN_RA_ALLOC_TYPE0;
      dci.type0_alloc.rbg_bitmask = arg_int(argc, argv, "rbg", 0);
    } else if (!strcmp(fmt, "1C")) {
      dci.alloc_type = SRSRAN_RA_ALLOC_TYPE2;
      dci.type2_alloc.mode = SRSRAN_RA_TYPE2_DIST;
      dci.type2_alloc.n_gap = arg_int(argc, argv, "ngap", 0);
      dci.type2_alloc.riv = arg_int(argc, argv, "riv", 0);
    } else {
      dci.alloc_type = SRSRAN_RA_ALLOC_TYPE2;
      dci.type2_alloc.mode =
          arg_int(argc, argv, "dist", 0) ? SRSRAN_RA_TYPE2_DIST
                                         : SRSRAN_RA_TYPE2_LOC;
      dci.type2_alloc.n_gap = arg_int(argc, argv, "ngap", 0);
      dci.type2_alloc.riv = arg_int(argc, argv, "riv", 0);
    }
    if (srsran_dci_msg_pack_pdsch(&cell, &sf, &cfg, &dci, &msg)) return 3;
    for (unsigned i = 0; i < msg.nof_bits; i++) putchar('0' + msg.payload[i]);
    putchar('\n');
    return 0;
  }
  if (!strcmp(argv[1], "unpack")) {
    /* argv: unpack <fmt> <nof_prb> <nof_ports> <bitstring> */
    if (argc < 6) return 1;
    const char* fmt = argv[2];
    cell.nof_prb = atoi(argv[3]);
    cell.nof_ports = atoi(argv[4]);
    srsran_dci_msg_t msg;
    memset(&msg, 0, sizeof(msg));
    const char* bits = argv[5];
    msg.nof_bits = strlen(bits);
    for (unsigned i = 0; i < msg.nof_bits; i++) msg.payload[i] = bits[i] - '0';
    msg.rnti = 0x46;
    if (!strcmp(fmt, "1B")) msg.format = SRSRAN_DCI_FORMAT1B;
    else if (!strcmp(fmt, "1D")) msg.format = SRSRAN_DCI_FORMAT1D;
    else if (!strcmp(fmt, "1C")) msg.format = SRSRAN_DCI_FORMAT1C;
    else if (!strcmp(fmt, "2")) msg.format = SRSRAN_DCI_FORMAT2;
    else if (!strcmp(fmt, "2A")) msg.format = SRSRAN_DCI_FORMAT2A;
    else return 2;
    srsran_dci_dl_t dci;
    memset(&dci, 0, sizeof(dci));
    if (srsran_dci_msg_unpack_pdsch(&cell, &sf, &cfg, &msg, &dci)) return 3;
    printf("riv=%u mode=%d ngap=%d mcs0=%d pid=%d ndi0=%d rv0=%d tpc=%d "
           "pinfo=%d poff=%d pconf=%d mcs1=%d ndi1=%d rv1=%d swap=%d\n",
           dci.type2_alloc.riv, (int)dci.type2_alloc.mode,
           (int)dci.type2_alloc.n_gap, dci.tb[0].mcs_idx, dci.pid,
           (int)dci.tb[0].ndi, dci.tb[0].rv, dci.tpc_pucch, dci.pinfo,
           (int)dci.power_offset, (int)dci.pconf, dci.tb[1].mcs_idx, (int)dci.tb[1].ndi,
           dci.tb[1].rv, (int)dci.tb_cw_swap);
    return 0;
  }
  return 1;
}
"""

SOURCES = [
    "phch/dci.c",
    "phch/ra.c",
    "phch/tbs_tables.c" if pathlib.Path(f"{REF}/phch/tbs_tables.c").exists()
    else None,
    "utils/bit.c",
    "utils/vector.c",
    "utils/vector_simd.c",
    "utils/debug.c",
    "utils/phy_logger.c",
    "common/phy_common.c",
    "common/sequence.c",
]

VERSION_H = ('#define SRSRAN_VERSION_STRING "ref-harness"\n'
             '#define SRSRAN_VERSION_MAJOR 23\n'
             '#define SRSRAN_VERSION_MINOR 4\n'
             '#define SRSRAN_VERSION_PATCH 0\n')


def build() -> pathlib.Path:
    WORK.mkdir(parents=True, exist_ok=True)
    (WORK / "main.c").write_text(MAIN_C)
    (WORK / "srsran").mkdir(exist_ok=True)
    (WORK / "srsran" / "version.h").write_text(VERSION_H)
    objs = []
    srcs = [f"{REF}/{s}" for s in SOURCES if s] + [str(WORK / "main.c")]
    for src in srcs:
        obj = WORK / (pathlib.Path(src).stem + ".o")
        if not (obj.exists() and obj.stat().st_mtime
                > pathlib.Path(src).stat().st_mtime):
            subprocess.run(
                ["gcc", "-O1", "-std=gnu99", "-c", src, f"-I{INC}",
                 f"-I{WORK}", "-o", str(obj)], check=True)
        objs.append(str(obj))
    exe = WORK / "ref_dci"
    subprocess.run(["gcc", "-o", str(exe), *objs, "-lm", "-lpthread"],
                   check=True)
    return exe


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build())
    else:
        print(__doc__)
