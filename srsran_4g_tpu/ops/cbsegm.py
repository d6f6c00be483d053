"""Code-block segmentation, TS 36.212 §5.1.2.

Counterpart of `lib/src/phy/fec/cbsegm.c`.  Pure host-side static
configuration math: given a transport block size, compute the number of code
blocks, the two admissible sizes K+ (K1) / K- (K2), the split C1/C2 and the
filler count F.  The device-side pipeline receives these as static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

from srsran_4g_tpu.utils.constants import MAX_CB_LEN, cb_size_ceil, cb_sizes


@dataclass(frozen=True)
class CbSegm:
    tbs: int
    C: int  # total code blocks
    C1: int  # blocks of size K1
    C2: int  # blocks of size K2
    K1: int
    K2: int
    F: int  # filler bits (prepended to the first code block)
    L_cb: int  # per-CB CRC length (0 if C == 1)

    @property
    def Bp(self) -> int:
        return self.C1 * self.K1 + self.C2 * self.K2 - self.F


def cbsegm(tbs: int) -> CbSegm:
    b = tbs + 24  # TB CRC24A always attached first
    if b <= MAX_CB_LEN:
        c, bp, l_cb = 1, b, 0
    else:
        z = MAX_CB_LEN
        c = -(-b // (z - 24))
        bp = b + 24 * c
        l_cb = 24
    k1 = cb_size_ceil(-(-bp // c))
    if c == 1:
        k2, c2, c1 = 0, 0, 1
    else:
        sizes = cb_sizes()
        idx = int(sizes.searchsorted(k1))
        k2 = int(sizes[idx - 1]) if idx > 0 else int(sizes[0])
        c2 = (c * k1 - bp) // (k1 - k2) if k1 != k2 else 0
        c1 = c - c2
    f = c1 * k1 + c2 * k2 - bp
    return CbSegm(tbs=tbs, C=c, C1=c1, C2=c2, K1=k1, K2=k2, F=f, L_cb=l_cb)
