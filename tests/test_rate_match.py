"""Rate matching vs a direct TS 36.212 §5.1.4.1 reference implementation."""

import numpy as np
import pytest

from srsran_4g_tpu.ops import cbsegm, rate_match
from srsran_4g_tpu.utils.constants import RM_PERM_TC

NULL = -999


def rm_direct(d0, d1, d2, rv, e):
    """Straight-line spec implementation with explicit NULL handling."""
    dlen = len(d0)
    rows = -(-dlen // 32)
    kp = rows * 32
    nd = kp - dlen

    def subblock_01(stream):
        y = [NULL] * nd + list(stream)
        mat = np.array(y).reshape(rows, 32)
        return mat[:, RM_PERM_TC].T.reshape(-1)

    def subblock_2(stream):
        y = np.array([NULL] * nd + list(stream))
        pi = [(RM_PERM_TC[k // rows] + 32 * (k % rows) + 1) % kp for k in range(kp)]
        return y[pi]

    v0, v1, v2 = subblock_01(d0), subblock_01(d1), subblock_2(d2)
    w = list(v0)
    for j in range(kp):
        w.append(v1[j])
        w.append(v2[j])
    w = np.array(w)
    ncb = 3 * kp
    k0 = rows * (2 * (-(-ncb // (8 * rows))) * rv + 2)
    out = []
    j = 0
    while len(out) < e:
        pos = (k0 + j) % ncb
        if w[pos] != NULL:
            out.append(w[pos])
        j += 1
    return np.array(out)


@pytest.mark.parametrize("k", [40, 104, 512])
@pytest.mark.parametrize("rv", [0, 1, 2, 3])
def test_rate_match_vs_direct(k, rv):
    rng = np.random.default_rng(k + rv)
    d = rng.integers(0, 2, size=(1, 3, k + 4)).astype(np.int8)
    for e in (3 * (k + 4) // 2, 2 * k, 5 * k):
        expect = rm_direct(d[0, 0], d[0, 1], d[0, 2], rv, e)
        got = np.asarray(rate_match.rate_match(d, k, rv, e))[0]
        np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("k", [40, 512])
def test_dematch_roundtrip(k):
    """encode→match→dematch→decode-by-sign recovers d where transmitted."""
    rng = np.random.default_rng(k)
    d = rng.integers(0, 2, size=(2, 3, k + 4)).astype(np.int8)
    e = 3 * (k + 4) + 17  # more than one full wrap → repetition combining
    tx = np.asarray(rate_match.rate_match(d, k, 0, e))
    llr = (2.0 * tx - 1.0).astype(np.float32)
    sb = np.asarray(rate_match.rate_dematch(llr, k, 0))
    # every non-NULL position transmitted at least once → sign recovers bits
    g = rate_match.rm_indices(k, 0, e)
    touched = np.zeros(3 * (k + 4), dtype=bool)
    touched[g] = True
    flat_d = d.reshape(2, -1)
    flat_sb = sb.reshape(2, -1)
    np.testing.assert_array_equal(
        (flat_sb[:, touched] > 0).astype(np.int8), flat_d[:, touched]
    )
    # untouched positions stay zero LLR
    assert np.all(flat_sb[:, ~touched] == 0)


def test_harq_accumulation():
    k = 40
    rng = np.random.default_rng(0)
    d = rng.integers(0, 2, size=(1, 3, k + 4)).astype(np.int8)
    e = k
    tx0 = np.asarray(rate_match.rate_match(d, k, 0, e))
    tx2 = np.asarray(rate_match.rate_match(d, k, 2, e))
    llr0 = (2.0 * tx0 - 1.0).astype(np.float32)
    llr2 = (2.0 * tx2 - 1.0).astype(np.float32)
    sb = rate_match.rate_dematch(llr0, k, 0)
    sb = np.asarray(rate_match.rate_dematch(llr2, k, 2, softbuffer=sb))
    # combined coverage must be at least the union of both transmissions
    g = set(rate_match.rm_indices(k, 0, e)) | set(rate_match.rm_indices(k, 2, e))
    flat_sb = sb.reshape(-1)
    flat_d = d.reshape(-1)
    for i in sorted(g):
        assert (flat_sb[i] > 0) == bool(flat_d[i])


def test_cbsegm_basic():
    s = cbsegm.cbsegm(1000)
    assert s.C == 1 and s.K1 == 1024 and s.F == 0 and s.L_cb == 0
    s = cbsegm.cbsegm(6144)
    # 6144+24 > 6144 → 2 CBs with CB CRCs
    assert s.C == 2 and s.L_cb == 24
    assert s.C1 * s.K1 + s.C2 * s.K2 == s.tbs + 24 + 24 * s.C + s.F
    s = cbsegm.cbsegm(75376)  # large TB, many CBs
    assert s.C == 13
    assert s.C1 * s.K1 + s.C2 * s.K2 - s.F == 75376 + 24 + 24 * 13
