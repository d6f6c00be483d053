"""X.691 robustness fuzz: randomized valid PDUs through the REFERENCE codec.

Round-4 VERDICT item 9: `rrc_uper` unpack used to raise on extended enum
values and fragmented PER lengths.  Both now decode per X.691 (an
`("ext-enum", n)` marker; §11.9 fragment loops), and this fuzz generates
≥1000 structurally-random PDUs from the declarative LTE schemas, asserts
our own encode/decode round-trips them, and pushes each through the
reference's compiled codec (tools/ref_rrc.py) which must re-encode the
identical bytes.
"""

import os
import random
import shutil
import subprocess

import pytest

from srsran_4g_tpu.stack import rrc_uper as RU
from srsran_4g_tpu.stack.asn1 import BitReader, BitWriter

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/lib/src/asn1/rrc")
    or shutil.which("g++") is None,
    reason="reference tree or toolchain unavailable")


@pytest.fixture(scope="module")
def harness():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import ref_rrc

    return ref_rrc.build()


def _gen(spec, rng: random.Random):
    """Random structurally-valid value for a declarative schema node."""
    kind = spec[0]
    if kind == "int":
        return rng.randint(spec[1], spec[2])
    if kind in ("enum", "enum+"):
        return rng.randrange(spec[1])
    if kind == "bool":
        return rng.random() < 0.5
    if kind == "bits":
        return rng.getrandbits(spec[1])
    if kind == "octets":
        return bytes(rng.getrandbits(8) for _ in range(spec[1]))
    if kind == "octets*":
        # never empty: the reference's generated pack derives a
        # dyn_octstring's presence bit from size() > 0, so an empty
        # optional container would legitimately re-encode shorter
        return bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 12)))
    if kind == "null":
        return None
    if kind == "seq":
        _, _ext, fields = spec
        out = {}
        for name, fspec, opt in fields:
            # empty-seq / null optionals are stubs for substructures the
            # framework never emits (nonCriticalExtension chains, R9+
            # feature subtrees) — the reference parses real content
            # there, so skip them, matching the entities' behaviour
            if opt == "o" and fspec in (("seq", False, []), ("null",)):
                continue
            if opt == "m" or rng.random() < 0.5:
                out[name] = _gen(fspec, rng)
        return out
    if kind == "choice":
        alts = spec[2]
        # spare/null alternatives stand in for message types this
        # framework does not model — the reference would try to parse a
        # real message there, so fuzz only the substantive branches
        real = [(n, a) for n, a in alts
                if a != ("null",) and a != ("seq", False, [])]
        name, aspec = (real or alts)[rng.randrange(len(real or alts))]
        return (name, _gen(aspec, rng))
    if kind == "seqof":
        _, lo, hi, espec = spec
        n = rng.randint(lo, min(hi, lo + 3))
        return [_gen(espec, rng) for _ in range(n)]
    raise ValueError(kind)


def _pack(spec, v) -> bytes:
    w = BitWriter()
    RU.encode(spec, v, w)
    return w.to_bytes()


# (harness class, schema) — the four logical channels + BCCH/PCCH
TARGETS = [
    ("ul_ccch", RU.UL_CCCH_MESSAGE),
    ("dl_ccch", RU.DL_CCCH_MESSAGE),
    ("ul_dcch", RU.UL_DCCH_MESSAGE),
    ("dl_dcch", RU.DL_DCCH_MESSAGE),
    ("bcch_bch", RU.BCCH_BCH_MESSAGE),
    ("bcch_dl_sch", RU.BCCH_DL_SCH_MESSAGE),
    ("pcch", RU.PCCH_MESSAGE),
]

N_PER_TARGET = 160   # 7 targets × 160 = 1120 ≥ 1000 PDUs


def test_fuzz_roundtrip_through_reference(harness):
    rng = random.Random(20260821)
    n_exact = 0
    for cls, spec in TARGETS:
        for _ in range(N_PER_TARGET):
            v = _gen(spec, rng)
            pdu = _pack(spec, v)
            # our own round trip is always byte-exact
            v2 = RU.decode(spec, BitReader(pdu))
            assert _pack(spec, v2) == pdu, (cls, v)
            r = subprocess.run([str(harness), cls, pdu.hex()],
                               capture_output=True, text=True, timeout=30)
            assert r.returncode == 0, (cls, pdu.hex(), r.stderr[:300])
            assert r.stdout.strip() == pdu.hex(), (
                cls, pdu.hex(), r.stdout.strip())
            n_exact += 1
    assert n_exact >= 1000, n_exact


def test_extended_enum_skips_not_raises():
    """An extension enum value decodes to the ("ext-enum", n) marker and
    re-encodes byte-exactly (X.691 §14.6; 36.331 §10.4 receivers skip
    unknown extension values)."""
    spec = ("enum+", 4)
    w = BitWriter()
    w.put(1, 1)   # extension bit
    w.put(0, 1)   # normally-small
    w.put(9, 6)
    data = w.to_bytes()
    v = RU.decode(spec, BitReader(data))
    assert v == ("ext-enum", 9)
    assert _pack(spec, v) == data


def test_fragmented_octet_string_roundtrip():
    """X.691 §11.9 fragmented general lengths (≥16K) decode and
    re-encode identically in both the UPER and APER runtimes."""
    from srsran_4g_tpu.stack.aper import AperReader, AperWriter

    blob = bytes(random.Random(7).getrandbits(8) for _ in range(40000))
    spec = ("octets*",)
    enc = _pack(spec, blob)
    assert RU.decode(spec, BitReader(enc)) == blob
    w = AperWriter()
    w.put_open(blob)
    assert AperReader(w.to_bytes()).get_open() == blob
