"""Measure the reference srsRAN CPU baseline on this host.

Compiles the reference's `pdsch_test` and `turbodecoder_test` from
`/root/reference` source (FFT-free subset — neither benchmark initialises
OFDM) with the full SIMD flag set the reference's CMake would select, then
times them single- and multi-process.  Timing is done by differencing
wall-clock at two repetition counts because the binaries' own printf drops
`tv_sec` (pdsch_test.c:509 prints only `t[0].tv_usec / M`).

Writes artifacts/ref_baseline.json and prints a summary.

Usage: python tools/measure_ref_baseline.py
"""

from __future__ import annotations

import json
import multiprocessing
import os
import pathlib
import subprocess
import sys
import time

REF = "/root/reference/lib/src/phy"
WORK = "/tmp/ref_baseline_build"

SIMD_FLAGS = ("-O3 -mfpmath=sse -mavx2 -mfma -DLV_HAVE_AVX2 -DLV_HAVE_AVX "
              "-DLV_HAVE_SSE -DLV_HAVE_FMA -mavx512f -mavx512cd -mavx512bw "
              "-mavx512dq -DLV_HAVE_AVX512").split()

SOURCES = [
    "phch/pdsch", "phch/sch", "phch/pmch", "phch/prb_dl", "phch/regs",
    "phch/pdcch", "phch/dci", "phch/phich", "phch/pcfich", "phch/ra",
    "phch/ra_dl", "phch/ra_ul", "phch/harq_ack", "phch/uci", "phch/cqi",
    "phch/pucch_proc", "phch/sequences", "fec/softbuffer",
    "fec/turbo/turbocoder", "fec/turbo/turbodecoder",
    "fec/turbo/turbodecoder_gen", "fec/turbo/turbodecoder_sse",
    "fec/turbo/tc_interl_lte", "fec/turbo/tc_interl_umts",
    "fec/turbo/rm_turbo", "fec/turbo/rm_conv", "fec/cbsegm", "fec/crc",
    "fec/convolutional/convcoder", "fec/convolutional/viterbi",
    "fec/convolutional/viterbi37_port", "fec/convolutional/viterbi37_sse",
    "fec/convolutional/viterbi37_avx2",
    "fec/convolutional/viterbi37_avx2_16bit", "fec/block/block",
    "fec/ldpc/base_graph", "ch_estimation/chest_dl",
    "ch_estimation/refsignal_dl", "ch_estimation/wiener_dl",
    "ch_estimation/chest_common", "utils/convolution", "utils/filter",
    "utils/vector", "utils/vector_simd", "utils/bit", "utils/mat",
    "utils/debug", "common/phy_common", "common/sequence",
    "resampling/interp", "mimo/precoding", "mimo/layermap",
    "modem/demod_soft", "modem/mod", "modem/demod_hard",
    "modem/modem_table", "modem/lte_tables", "channel/ch_awgn", "sync/pss",
    "io/filesource", "scrambling/scrambling",
    "phch/test/pdsch_test", "fec/turbo/test/turbodecoder_test",
]

STUBS = r"""
#include <stdarg.h>
#include <stdlib.h>
typedef float _Complex cf_t;
void srsran_phy_log_print(int level, const char* format, ...) {}
void hard_qpsk_demod(const cf_t* in, unsigned char* out, unsigned n) {}
void hard_bpsk_demod(const cf_t* in, unsigned char* out, unsigned n) {}
void hard_qam16_demod(const cf_t* in, unsigned char* out, unsigned n) {}
void hard_qam64_demod(const cf_t* in, unsigned char* out, unsigned n) {}
void hard_qam256_demod(const cf_t* in, unsigned char* out, unsigned n) {}
int srsran_dft_plan(void* p, int s, int d, int t) { return 0; }
int srsran_dft_plan_c(void* p, int s, int d) { return 0; }
void srsran_dft_run_c(void* p, void* i, void* o) {}
void srsran_dft_plan_free(void* p) {}
void srsran_dft_plan_set_norm(void* p, int b) {}
void srsran_dft_plan_set_dc(void* p, int b) {}
void srsran_dft_plan_set_mirror(void* p, int b) {}
int srsran_dft_replan(void* p, int s) { return 0; }
int srsran_cedron_freq_estimator_init(void* q, int n) { return 0; }
void srsran_cedron_freq_estimator_free(void* q) {}
float srsran_cedron_freq_estimate(void* q, const void* x, int n) { return 0.0f; }
void srsran_ofdm_rx_free(void* q) {}
void srsran_ofdm_tx_free(void* q) {}
"""


def build() -> pathlib.Path:
    work = pathlib.Path(WORK)
    (work / "inc/srsran").mkdir(parents=True, exist_ok=True)
    ver = pathlib.Path("/root/reference/lib/include/srsran/version.h.in").read_text()
    for k, v in (("@SRSRAN_VERSION_MAJOR@", "23"), ("@SRSRAN_VERSION_MINOR@", "11"),
                 ("@SRSRAN_VERSION_PATCH@", "0"),
                 ("@SRSRAN_VERSION_STRING@", '"23.11.0"')):
        ver = ver.replace(k, v)
    (work / "inc/srsran/version.h").write_text(ver)
    (work / "stubs.c").write_text(STUBS)

    inc = ["-I", str(work / "inc"), "-I", "/root/reference/lib/include",
           "-I", f"{REF}/channel"]
    objs = []
    for s in SOURCES:
        obj = work / (s.replace("/", "_") + ".o")
        objs.append(str(obj))
        if obj.exists():
            continue
        r = subprocess.run(["gcc", *SIMD_FLAGS, *inc, "-c", f"{REF}/{s}.c",
                            "-o", str(obj)], capture_output=True)
        if r.returncode:
            print(f"compile failed: {s}\n{r.stderr.decode()[:500]}")
            sys.exit(1)
    for extra, cc in (("channel/gauss", "gcc"), ("utils/random", "g++")):
        obj = work / (extra.replace("/", "_") + ".o")
        objs.append(str(obj))
        if not obj.exists():
            ext = ".cpp" if cc == "g++" else ".c"
            subprocess.run([cc, *SIMD_FLAGS, *inc, "-c", f"{REF}/{extra}{ext}",
                            "-o", str(obj)], check=True)
    stubs_o = work / "stubs.o"
    subprocess.run(["gcc", "-c", str(work / "stubs.c"), "-o", str(stubs_o)],
                   check=True)
    objs.append(str(stubs_o))

    pdsch_objs = [o for o in objs if "turbodecoder_test" not in o]
    turbo_objs = [o for o in objs if "pdsch_test" not in o]
    subprocess.run(["gcc", *pdsch_objs, "-lm", "-lstdc++", "-o",
                    str(work / "pdsch_test")], check=True)
    subprocess.run(["gcc", *turbo_objs, "-lm", "-lstdc++", "-o",
                    str(work / "turbodecoder_test")], check=True)
    return work


def wall(cmd, n_proc=1):
    t0 = time.perf_counter()
    ps = [subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL) for _ in range(n_proc)]
    for p in ps:
        p.wait()
    return time.perf_counter() - t0


def main():
    work = build()
    pdsch = str(work / "pdsch_test")
    ncpu = multiprocessing.cpu_count()
    res = {"host_cpus": ncpu}

    def sf_per_s(base_args, n_proc, lo, hi):
        """Aggregate subframes/s: n_proc concurrent processes each run
        `lo` then `hi` repetitions; the wall-clock difference covers
        n_proc·(hi−lo) subframes.  (A prior revision divided the per-rep
        wall by n_proc AND multiplied the rate by ncpu — double-counting
        the process count and inflating every `_host` figure ×2.)"""
        t_lo = min(wall([pdsch, *base_args, "-X", str(lo)], n_proc)
                   for _ in range(2))
        t_hi = min(wall([pdsch, *base_args, "-X", str(hi)], n_proc)
                   for _ in range(2))
        return n_proc * (hi - lo) / (t_hi - t_lo)

    siso = ["-n", "100", "-m", "28"]
    r1 = sf_per_s(siso, 1, 1000, 6000)
    rN = sf_per_s(siso, ncpu, 1000, 6000)
    res["pdsch_100prb_mcs28_us_per_sf_1proc"] = round(1e6 / r1, 1)
    res["pdsch_100prb_mcs28_sf_per_s_1proc"] = round(r1, 1)
    res["pdsch_100prb_mcs28_sf_per_s_host"] = round(rN, 1)

    # TM4 2x2 dual-codeword (the reference's 150 Mb/s headline mode):
    # pdsch_test -x 4 -a 2 -m 28 -M 28 -p 2 (pdsch_test.c:73-77)
    mimo = ["-n", "100", "-x", "4", "-a", "2", "-m", "28", "-M", "28",
            "-p", "2", "-t", "0"]
    m1 = sf_per_s(mimo, 1, 500, 3500)
    mN = sf_per_s(mimo, ncpu, 500, 3500)
    res["pdsch_mimo2x2_mcs28_us_per_sf_1proc"] = round(1e6 / m1, 1)
    res["pdsch_mimo2x2_mcs28_sf_per_s_1proc"] = round(m1, 1)
    res["pdsch_mimo2x2_mcs28_sf_per_s_host"] = round(mN, 1)

    # turbo: the test's own per-frame print is reliable (sub-second)
    r = subprocess.run([str(work / "turbodecoder_test"), "-l", "6144", "-n",
                        "100", "-i", "4", "-e", "8"], capture_output=True,
                       text=True)
    import re
    us = [float(m) for m in re.findall(r"\((\d+\.\d+) usec\)", r.stdout)]
    if us:
        med = sorted(us)[len(us) // 2]
        res["turbo_k6144_4iter_us_per_frame_1proc"] = med
        res["turbo_k6144_4iter_mbps_1proc"] = round(6144 / med, 1)
        # assumed-linear extrapolation of the 1-proc figure (not measured)
        res["turbo_k6144_4iter_mbps_host_linear"] = round(6144 / med * ncpu, 1)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/ref_baseline.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
