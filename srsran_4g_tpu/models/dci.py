"""DCI format pack/unpack (formats 0, 1, 1A), TS 36.212 §5.3.3.1.

Counterpart of the reference's `lib/src/phy/phch/dci.c`.  Host-side bit
packing — DCI payloads are tiny control-plane data assembled per TTI; the
heavy lifting (conv coding, blind search) is in models/pdcch.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from srsran_4g_tpu.models import ra


def _riv_bits(n_rb: int) -> int:
    return math.ceil(math.log2(n_rb * (n_rb + 1) / 2))


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def array(self, pad_to: int | None = None) -> np.ndarray:
        b = list(self.bits)
        if pad_to is not None:
            b += [0] * (pad_to - len(b))
        return np.asarray(b, dtype=np.int8)


class _BitReader:
    def __init__(self, bits):
        self.bits = np.asarray(bits).astype(np.int64)
        self.pos = 0

    def get(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | int(self.bits[self.pos])
            self.pos += 1
        return v


@dataclass(frozen=True)
class Dci1A:
    """Format 1A: compact contiguous DL assignment."""

    rb_start: int
    l_crbs: int
    mcs: int
    harq_pid: int = 0
    ndi: int = 0
    rv: int = 0
    tpc: int = 0
    distributed: bool = False


def format1a_len(n_rb: int) -> int:
    n = 1 + 1 + _riv_bits(n_rb) + 5 + 3 + 1 + 2 + 2
    # padding rules: avoid the ambiguous sizes of TS 36.212 §5.3.3.1.2
    while n in (12, 14, 16, 20, 24, 26, 32, 40, 44, 56):
        n += 1
    return n


def pack_1a(dci: Dci1A, n_rb: int) -> np.ndarray:
    w = _BitWriter()
    w.put(1, 1)  # format 0/1A flag: 1A
    w.put(1 if dci.distributed else 0, 1)
    w.put(ra.riv_encode(n_rb, dci.l_crbs, dci.rb_start), _riv_bits(n_rb))
    w.put(dci.mcs, 5)
    w.put(dci.harq_pid, 3)
    w.put(dci.ndi, 1)
    w.put(dci.rv, 2)
    w.put(dci.tpc, 2)
    return w.array(pad_to=format1a_len(n_rb))


def unpack_1a(bits, n_rb: int) -> Dci1A:
    r = _BitReader(bits)
    flag = r.get(1)
    assert flag == 1, "not a format 1A DCI"
    distributed = bool(r.get(1))
    l_crbs, rb_start = ra.riv_decode(n_rb, r.get(_riv_bits(n_rb)))
    return Dci1A(
        rb_start=rb_start, l_crbs=l_crbs, mcs=r.get(5), harq_pid=r.get(3),
        ndi=r.get(1), rv=r.get(2), tpc=r.get(2), distributed=distributed,
    )


@dataclass(frozen=True)
class Dci1:
    """Format 1: type-0 RBG bitmap DL assignment."""

    rbg_bitmap: int
    mcs: int
    harq_pid: int = 0
    ndi: int = 0
    rv: int = 0
    tpc: int = 0


def format1_len(n_rb: int) -> int:
    n_rbg = -(-n_rb // ra.rbg_size(n_rb))
    n = (1 if n_rb > 10 else 0) + n_rbg + 5 + 3 + 1 + 2 + 2
    while n in (12, 14, 16, 20, 24, 26, 32, 40, 44, 56):
        n += 1
    if n == format1a_len(n_rb):  # must differ from 0/1A length
        n += 1
    return n


def pack_1(dci: Dci1, n_rb: int) -> np.ndarray:
    n_rbg = -(-n_rb // ra.rbg_size(n_rb))
    w = _BitWriter()
    if n_rb > 10:
        w.put(0, 1)  # resource allocation header: type 0
    w.put(dci.rbg_bitmap, n_rbg)
    w.put(dci.mcs, 5)
    w.put(dci.harq_pid, 3)
    w.put(dci.ndi, 1)
    w.put(dci.rv, 2)
    w.put(dci.tpc, 2)
    return w.array(pad_to=format1_len(n_rb))


def unpack_1(bits, n_rb: int) -> Dci1:
    n_rbg = -(-n_rb // ra.rbg_size(n_rb))
    r = _BitReader(bits)
    if n_rb > 10:
        r.get(1)
    return Dci1(
        rbg_bitmap=r.get(n_rbg), mcs=r.get(5), harq_pid=r.get(3),
        ndi=r.get(1), rv=r.get(2), tpc=r.get(2),
    )


@dataclass(frozen=True)
class Dci0:
    """Format 0: UL grant (contiguous)."""

    rb_start: int
    l_crbs: int
    mcs: int
    hopping: bool = False
    ndi: int = 0
    tpc: int = 0
    dmrs_cshift: int = 0
    cqi_request: bool = False


def pack_0(dci: Dci0, n_rb: int) -> np.ndarray:
    w = _BitWriter()
    w.put(0, 1)  # flag: format 0
    w.put(1 if dci.hopping else 0, 1)
    w.put(ra.riv_encode(n_rb, dci.l_crbs, dci.rb_start), _riv_bits(n_rb))
    w.put(dci.mcs, 5)
    w.put(dci.ndi, 1)
    w.put(dci.tpc, 2)
    w.put(dci.dmrs_cshift, 3)
    w.put(1 if dci.cqi_request else 0, 1)
    return w.array(pad_to=format1a_len(n_rb))  # 0 and 1A share one length


def unpack_0(bits, n_rb: int) -> Dci0:
    r = _BitReader(bits)
    assert r.get(1) == 0, "not a format 0 DCI"
    hopping = bool(r.get(1))
    l_crbs, rb_start = ra.riv_decode(n_rb, r.get(_riv_bits(n_rb)))
    return Dci0(
        rb_start=rb_start, l_crbs=l_crbs, mcs=r.get(5), hopping=hopping,
        ndi=r.get(1), tpc=r.get(2), dmrs_cshift=r.get(3),
        cqi_request=bool(r.get(1)),
    )
