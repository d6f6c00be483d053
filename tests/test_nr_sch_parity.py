"""Golden cross-validation of the NR DL-SCH chain against the
reference's own code.

tools/ref_nr_sch.py compiles `lib/src/phy/phch/sch_nr.c` + its LDPC/CRC
dependencies from /root/reference into a standalone CLI; these tests
prove bit-exactness in both directions:

- framework encode → reference `srsran_dlsch_nr_decode` (CRC OK and the
  exact payload back),
- reference `srsran_dlsch_nr_encode` → framework decode.

This is the evidence backing the documented exclusion of the
older-vintage capture PDSCHs (tests/test_ref_captures_nr.py): the
chains agree bit-for-bit today, so those captures' failures are an
upstream historical convention change, not a framework gap.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/lib/src/phy/phch/sch_nr.c")
    or shutil.which("gcc") is None,
    reason="reference sources or gcc not available")


@pytest.fixture(scope="module")
def harness():
    from tools.ref_nr_sch import build
    return str(build())


# (tbs, qm, R_x1024, rv): QPSK single-CB, 16QAM single-CB, 64QAM
# multi-CB, and a non-zero redundancy version (at a low enough rate to
# be self-decodable without combining)
CONFIGS = [
    (672, 2, 308, 0),
    (7680, 4, 658, 0),
    (40976, 6, 822, 0),     # 5 CBs, BG1
    (672, 2, 193, 2),
]


def _g(tbs, qm, r1024):
    return int(np.ceil(tbs / (r1024 / 1024) / qm) * qm + 6 * qm)


def _seg(tbs, g, qm, rv, r1024):
    from srsran_4g_tpu.models import sch_nr
    return sch_nr.nr_segment(tbs, g, qm, rv, target_rate=r1024 / 1024)


@pytest.mark.parametrize("tbs,qm,r1024,rv", CONFIGS)
def test_framework_encode_reference_decode(harness, tbs, qm, r1024, rv,
                                           tmp_path):
    import jax.numpy as jnp

    from srsran_4g_tpu.models import sch_nr

    g = _g(tbs, qm, r1024)
    rng = np.random.default_rng(tbs)
    tb = rng.integers(0, 2, tbs).astype(np.int8)
    seg = _seg(tbs, g, qm, rv, r1024)
    e = np.asarray(sch_nr.encode(seg, jnp.asarray(tb[None])))[0]
    # reference LLR convention: positive => bit 0
    llr = tmp_path / "llr.i8"
    np.where(e > 0, -100, 100).astype(np.int8).tofile(llr)
    r = subprocess.run(
        [harness, "dec", str(tbs), str(qm), str(rv), str(r1024), str(llr)],
        capture_output=True, text=True, timeout=120)
    assert "crc=OK" in r.stdout, r.stdout[:200] + r.stderr[-300:]
    got = r.stdout.split("payload=")[1].strip()
    assert got == np.packbits(tb).tobytes().hex()


@pytest.mark.parametrize("tbs,qm,r1024,rv", CONFIGS)
def test_reference_encode_framework_decode(harness, tbs, qm, r1024, rv,
                                           tmp_path):
    import jax.numpy as jnp

    from srsran_4g_tpu.models import sch_nr

    g = _g(tbs, qm, r1024)
    rng = np.random.default_rng(tbs + 1)
    tb = rng.integers(0, 2, tbs).astype(np.int8)
    payload = tmp_path / "payload.bin"
    np.packbits(tb).tofile(payload)
    r = subprocess.run(
        [harness, "enc", str(tbs), str(qm), str(rv), str(r1024), str(g),
         str(payload)], capture_output=True, text=True, timeout=120)
    bits = r.stdout.strip()
    assert len(bits) == g, (len(bits), g, r.stderr[-300:])
    e = np.frombuffer(bits.encode(), np.uint8) - ord("0")
    # framework LLR convention: positive => bit 1
    llr = np.where(e > 0, 8.0, -8.0).astype(np.float32)
    seg = _seg(tbs, g, qm, rv, r1024)
    out, ok, _ = sch_nr.decode(seg, jnp.asarray(llr[None]), n_iter=12)
    assert bool(ok[0])
    assert np.array_equal(np.asarray(out[0]), tb)
