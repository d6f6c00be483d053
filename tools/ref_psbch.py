"""Build + drive the reference's psbch_file_test WITH a real FFT.

The reference's PHY needs FFTW, which this image lacks (no network to
fetch it).  This tool provides a minimal fftwf-compatible shim — a
Bluestein/radix-2 complex FFT plus the guru strided-plan surface
`dft_fftw.c` uses — and compiles `psbch_file_test.c` with the exact PHY
dependency closure, giving reference-binary ground truth for the
sidelink PSBCH captures (the one remaining undecoded capture,
`..._slss_id169.dat`, per the round-3 VERDICT).

Usage:
    python tools/ref_psbch.py build
    /tmp/ref_psbch/psbch_file_test -p 50 -c 169 -t 4 -i <capture.dat>
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REF = "/root/reference/lib/src/phy"
INC = "/root/reference/lib/include"
WORK = pathlib.Path("/tmp/ref_psbch")

FFTW_H = r"""
#ifndef SHIM_FFTW3_H
#define SHIM_FFTW3_H
/* Minimal fftwf API shim for the reference's dft_fftw.c (see
   tools/ref_psbch.py).  Not FFTW: a Bluestein/radix-2 DFT. */
#include <stddef.h>
#include <complex.h>
#ifdef __cplusplus
extern "C" {
#endif

/* like real FFTW with <complex.h> pre-included */
typedef float _Complex fftwf_complex;
typedef struct shim_plan_s* fftwf_plan;
typedef struct fftwf_iodim_do {
  int n, is, os;
} fftwf_iodim;

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_MEASURE (0U)
#define FFTW_ESTIMATE (1U << 6)
#define FFTW_R2HC 0
#define FFTW_HC2R 1

void* fftwf_malloc(size_t n);
void fftwf_free(void* p);
fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex* in, fftwf_complex* out,
                             int sign, unsigned flags);
fftwf_plan fftwf_plan_guru_dft(int rank, const fftwf_iodim* dims,
                               int howmany_rank, const fftwf_iodim* howmany,
                               fftwf_complex* in, fftwf_complex* out,
                               int sign, unsigned flags);
fftwf_plan fftwf_plan_r2r_1d(int n, float* in, float* out, int kind,
                             unsigned flags);
void fftwf_execute(const fftwf_plan p);
void fftwf_execute_dft(const fftwf_plan p, fftwf_complex* in,
                       fftwf_complex* out);
void fftwf_destroy_plan(fftwf_plan p);
void fftwf_cleanup(void);
int fftwf_import_wisdom_from_filename(const char* f);
int fftwf_export_wisdom_to_filename(const char* f);
int fftwf_import_wisdom_from_file(void* f);
void fftwf_export_wisdom_to_file(void* f);

#ifdef __cplusplus
}
#endif
#endif
"""

FFTW_C = r"""
/* Bluestein/radix-2 complex FFT behind the fftwf API surface the
   reference's dft_fftw.c uses.  Correctness over speed. */
#include "fftw3.h"
#include <complex.h>
#include <math.h>
#include <stdlib.h>
#include <string.h>

typedef float complex cf;

struct shim_plan_s {
  int n, sign, kind_r2r, is_r2r;
  int howmany, is, os, idist, odist;
  fftwf_complex *in, *out;
  float *rin, *rout;
  /* Bluestein workspace */
  int m;             /* pow2 >= 2n-1 (m==n for pow2 n) */
  cf *chirp, *bfft;  /* chirp and FFT of zero-padded conj chirp */
  cf *wa, *wb;
};

static int next_pow2(int n) {
  int m = 1;
  while (m < n) m <<= 1;
  return m;
}

/* iterative radix-2, in place, size m = 2^k */
static void fft_pow2(cf* a, int m, int sign) {
  for (int i = 1, j = 0; i < m; i++) {
    int bit = m >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) { cf t = a[i]; a[i] = a[j]; a[j] = t; }
  }
  for (int len = 2; len <= m; len <<= 1) {
    double ang = sign * 2.0 * M_PI / len;
    cf wl = cosf(ang) + sinf(ang) * I;
    for (int i = 0; i < m; i += len) {
      cf w = 1.0f;
      for (int j = 0; j < len / 2; j++) {
        cf u = a[i + j], v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wl;
      }
    }
  }
}

static void plan_bluestein(struct shim_plan_s* p) {
  int n = p->n;
  if ((n & (n - 1)) == 0) { p->m = n; return; }
  int m = next_pow2(2 * n - 1);
  p->m = m;
  p->chirp = malloc(sizeof(cf) * n);
  p->bfft = malloc(sizeof(cf) * m);
  p->wa = malloc(sizeof(cf) * m);
  p->wb = malloc(sizeof(cf) * m);
  memset(p->bfft, 0, sizeof(cf) * m);
  for (int k = 0; k < n; k++) {
    /* phase = sign * pi * k^2 / n  (mod 2n on k^2 keeps precision) */
    long long k2 = ((long long)k * k) % (2LL * n);
    double ang = p->sign * M_PI * (double)k2 / n;
    p->chirp[k] = cosf(ang) + sinf(ang) * I;
    cf c = conjf(p->chirp[k]);
    p->bfft[k] = c;
    if (k) p->bfft[m - k] = c;
  }
  fft_pow2(p->bfft, m, -1);
}

static void dft_run(struct shim_plan_s* p, const cf* x, cf* y,
                    int is, int os) {
  int n = p->n, m = p->m;
  if (m == n) {
    cf* buf = p->wa ? p->wa : (p->wa = malloc(sizeof(cf) * n));
    for (int k = 0; k < n; k++) buf[k] = x[(long)k * is];
    fft_pow2(buf, n, p->sign);
    for (int k = 0; k < n; k++) y[(long)k * os] = buf[k];
    return;
  }
  memset(p->wa, 0, sizeof(cf) * m);
  for (int k = 0; k < n; k++) p->wa[k] = x[(long)k * is] * p->chirp[k];
  fft_pow2(p->wa, m, -1);
  for (int k = 0; k < m; k++) p->wa[k] *= p->bfft[k];
  fft_pow2(p->wa, m, +1);
  float inv = 1.0f / m;
  for (int k = 0; k < n; k++)
    y[(long)k * os] = p->wa[k] * inv * p->chirp[k];
}

void* fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void* p) { free(p); }

static struct shim_plan_s* mk(int n, int sign) {
  struct shim_plan_s* p = calloc(1, sizeof *p);
  p->n = n;
  p->sign = sign;
  p->howmany = 1;
  p->is = p->os = 1;
  plan_bluestein(p);
  if (p->m == n) p->wa = malloc(sizeof(cf) * n);
  return p;
}

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex* in, fftwf_complex* out,
                             int sign, unsigned flags) {
  (void)flags;
  struct shim_plan_s* p = mk(n, sign);
  p->in = in;
  p->out = out;
  return p;
}

fftwf_plan fftwf_plan_guru_dft(int rank, const fftwf_iodim* dims,
                               int howmany_rank, const fftwf_iodim* howmany,
                               fftwf_complex* in, fftwf_complex* out,
                               int sign, unsigned flags) {
  (void)flags;
  if (rank != 1 || howmany_rank != 1) return NULL;
  struct shim_plan_s* p = mk(dims[0].n, sign);
  p->is = dims[0].is;
  p->os = dims[0].os;
  p->howmany = howmany[0].n;
  p->idist = howmany[0].is;
  p->odist = howmany[0].os;
  p->in = in;
  p->out = out;
  return p;
}

fftwf_plan fftwf_plan_r2r_1d(int n, float* in, float* out, int kind,
                             unsigned flags) {
  (void)flags;
  struct shim_plan_s* p = mk(n, kind == FFTW_R2HC ? -1 : +1);
  p->is_r2r = 1;
  p->kind_r2r = kind;
  p->rin = in;
  p->rout = out;
  return p;
}

static void run_all(struct shim_plan_s* p, fftwf_complex* in,
                    fftwf_complex* out) {
  for (int h = 0; h < p->howmany; h++)
    dft_run(p, (const cf*)(in + (long)h * p->idist),
            (cf*)(out + (long)h * p->odist), p->is, p->os);
}

void fftwf_execute(const fftwf_plan plan) {
  struct shim_plan_s* p = (struct shim_plan_s*)plan;
  if (p->is_r2r) {
    /* halfcomplex via the complex FFT (FFTW R2HC/HC2R layout) */
    int n = p->n;
    cf* tmp = malloc(sizeof(cf) * n);
    if (p->kind_r2r == FFTW_R2HC) {
      for (int k = 0; k < n; k++) tmp[k] = p->rin[k];
      cf* outb = malloc(sizeof(cf) * n);
      dft_run(p, tmp, outb, 1, 1);
      for (int k = 0; k <= n / 2; k++) p->rout[k] = crealf(outb[k]);
      for (int k = 1; k < (n + 1) / 2; k++)
        p->rout[n - k] = cimagf(outb[k]);
      free(outb);
    } else {
      cf* inb = malloc(sizeof(cf) * n);
      for (int k = 0; k <= n / 2; k++) inb[k] = p->rin[k];
      for (int k = 1; k < (n + 1) / 2; k++) {
        inb[k] += p->rin[n - k] * I;
        inb[n - k] = conjf(inb[k]);
      }
      cf* outb = malloc(sizeof(cf) * n);
      dft_run(p, inb, outb, 1, 1);
      for (int k = 0; k < n; k++) p->rout[k] = crealf(outb[k]);
      free(inb);
      free(outb);
    }
    free(tmp);
    return;
  }
  run_all(p, p->in, p->out);
}

void fftwf_execute_dft(const fftwf_plan plan, fftwf_complex* in,
                       fftwf_complex* out) {
  run_all((struct shim_plan_s*)plan, in, out);
}

void fftwf_destroy_plan(fftwf_plan plan) {
  struct shim_plan_s* p = (struct shim_plan_s*)plan;
  free(p->chirp);
  free(p->bfft);
  free(p->wa);
  free(p->wb);
  free(p);
}

void fftwf_cleanup(void) {}
int fftwf_import_wisdom_from_filename(const char* f) { (void)f; return 0; }
int fftwf_export_wisdom_to_filename(const char* f) { (void)f; return 0; }
int fftwf_import_wisdom_from_file(void* f) { (void)f; return 0; }
void fftwf_export_wisdom_to_file(void* f) { (void)f; }
"""

SOURCES = [
    "phch/psbch", "phch/mib_sl", "phch/sch", "phch/ra_ul", "phch/ra_dl",
    "phch/ra", "phch/ra_sl", "phch/pucch_proc", "phch/uci",
    "ch_estimation/chest_sl", "ch_estimation/refsignal_ul",
    "ch_estimation/refsignal_dl", "ch_estimation/chest_common",
    "ch_estimation/cedron_freq_estimator",
    "common/phy_common", "common/phy_common_sl", "common/sequence",
    "common/zc_sequence", "common/timestamp",
    "dft/dft_fftw", "dft/ofdm", "dft/dft_precoding",
    "fec/cbsegm", "fec/crc", "fec/convolutional/convcoder",
    "fec/convolutional/viterbi", "fec/convolutional/parity",
    "fec/convolutional/viterbi37_port", "fec/convolutional/viterbi37_sse",
    "fec/convolutional/viterbi37_avx2", "fec/convolutional/viterbi37_avx2_16bit",
    "fec/turbo/rm_conv",
    "fec/turbo/turbodecoder", "fec/turbo/turbodecoder_gen",
    "fec/turbo/turbodecoder_sse", "fec/turbo/tc_interl_lte",
    "fec/turbo/tc_interl_umts", "fec/turbo/turbocoder", "fec/turbo/rm_turbo",
    "fec/softbuffer",
    "modem/demod_hard", "modem/demod_soft", "modem/mod", "modem/modem_table",
    "modem/lte_tables", "modem/hard_demod_lte",
    "scrambling/scrambling",
    "mimo/precoding", "mimo/layermap",
    "io/filesource", "io/filesink",
    "fec/block/block", "cfr/cfr", "phch/cqi", "phch/dci", "phch/pucch",
    "phch/sequences",
    "ch_estimation/wiener_dl", "resampling/interp", "fec/ldpc/base_graph",
    "utils/vector", "utils/vector_simd", "utils/bit", "utils/debug",
    "utils/convolution", "utils/mat", "utils/cexptab", "utils/ringbuffer",
    "utils/phy_logger", "utils/primes", "utils/filter",
]

CFLAGS = ["-O2", "-std=c11", "-D_GNU_SOURCE", "-mavx2", "-mfma", "-msse4.2",
          "-DLV_HAVE_SSE", "-DLV_HAVE_AVX", "-DLV_HAVE_AVX2"]


VERSION_H = """
#ifndef SRSRAN_VERSION_H_IN
#define SRSRAN_VERSION_H_IN
#define SRSRAN_VERSION_MAJOR 23
#define SRSRAN_VERSION_MINOR 11
#define SRSRAN_VERSION_PATCH 0
#define SRSRAN_VERSION_STRING "23.11.0-shim"
#define SRSRAN_VERSION_ENCODE(major, minor, patch) ( \\
    ((major) * 10000) + ((minor) * 100) + ((patch) * 1))
#define SRSRAN_VERSION SRSRAN_VERSION_ENCODE( \\
    SRSRAN_VERSION_MAJOR, SRSRAN_VERSION_MINOR, SRSRAN_VERSION_PATCH)
#define SRSRAN_VERSION_CHECK(major, minor, patch) \\
    (SRSRAN_VERSION >= SRSRAN_VERSION_ENCODE(major, minor, patch))
char* srsran_get_version();
int srsran_get_version_major();
int srsran_get_version_minor();
int srsran_get_version_patch();
#endif
"""


def build() -> pathlib.Path:
    WORK.mkdir(parents=True, exist_ok=True)
    (WORK / "fftw3.h").write_text(FFTW_H)
    (WORK / "fftw_shim.c").write_text(FFTW_C)
    (WORK / "srsran").mkdir(exist_ok=True)
    (WORK / "srsran" / "version.h").write_text(VERSION_H)
    objs = []
    srcs = [str(WORK / "fftw_shim.c")] + [f"{REF}/{s}.c" for s in SOURCES] + [
        f"{REF}/utils/random.cpp", f"{REF}/phch/test/psbch_file_test.c"]
    for src in srcs:
        obj = WORK / (pathlib.Path(src).stem + ".o")
        if not (obj.exists() and obj.stat().st_mtime
                > pathlib.Path(src).stat().st_mtime):
            cc = ["g++", "-O2", "-std=c++14"] if src.endswith(".cpp") \
                else ["gcc", *CFLAGS]
            subprocess.run(
                [*cc, "-c", src, f"-I{INC}", f"-I{WORK}",
                 "-o", str(obj)], check=True)
        objs.append(str(obj))
    exe = WORK / "psbch_file_test"
    subprocess.run(["g++", "-o", str(exe), *objs, "-lm", "-lpthread"],
                   check=True)
    return exe


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build())
    else:
        print(__doc__)
