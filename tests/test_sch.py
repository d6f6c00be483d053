"""DL-SCH encode/decode chain tests (reference: sch.c via pdsch_test)."""

import numpy as np
import pytest

from srsran_4g_tpu.models import sch


def awgn_llr(bits, ebn0_db, rate, rng):
    ebn0 = 10 ** (ebn0_db / 10)
    sigma2 = 1.0 / (2 * rate * ebn0)
    x = 1.0 - 2.0 * bits.astype(np.float64)
    y = x + rng.standard_normal(bits.shape) * np.sqrt(sigma2)
    return (-2.0 * y / sigma2).astype(np.float32)


@pytest.mark.parametrize(
    "tbs,g",
    [
        (104, 528),        # single CB, tiny
        (1000, 2100),      # single CB K=1024, rate ~0.49
        (6200, 13000),     # 2 CBs with CB CRCs + fillers
    ],
)
def test_encode_decode_noiseless(tbs, g):
    plan = sch.dlsch_plan(tbs, g, qm=2)
    rng = np.random.default_rng(tbs)
    bits = rng.integers(0, 2, size=(2, tbs)).astype(np.int8)
    cw = np.asarray(sch.dlsch_encode(plan, bits))
    assert cw.shape == (2, g)
    llr = 8.0 * (2.0 * cw - 1.0)
    out, ok, _ = sch.dlsch_decode(plan, llr, n_iter=3)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_encode_decode_awgn():
    tbs, g = 1000, 3072
    plan = sch.dlsch_plan(tbs, g, qm=2)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(4, tbs)).astype(np.int8)
    cw = np.asarray(sch.dlsch_encode(plan, bits))
    llr = awgn_llr(cw, 3.0, tbs / g, rng)
    out, ok, _ = sch.dlsch_decode(plan, llr, n_iter=5)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_crc_flags_failure():
    tbs, g = 104, 312
    plan = sch.dlsch_plan(tbs, g, qm=2)
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=(2, tbs)).astype(np.int8)
    cw = np.asarray(sch.dlsch_encode(plan, bits))
    llr = 8.0 * (2.0 * cw - 1.0)
    llr[:, : g // 2] = -llr[:, : g // 2] * 0.1  # heavy corruption
    _, ok, _ = sch.dlsch_decode(plan, llr, n_iter=2)
    assert not np.asarray(ok).any()


def test_harq_rv_combining():
    """A TB undecodable at rv=0 alone decodes after combining rv=2."""
    tbs = 1000
    plan0 = sch.dlsch_plan(tbs, 1500, qm=2, rv=0)  # rate ~0.68
    plan2 = sch.dlsch_plan(tbs, 1500, qm=2, rv=2)
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, size=(2, tbs)).astype(np.int8)
    cw0 = np.asarray(sch.dlsch_encode(plan0, bits))
    cw2 = np.asarray(sch.dlsch_encode(plan2, bits))
    snr = -1.0
    llr0 = awgn_llr(cw0, snr, tbs / 1500, rng)
    llr2 = awgn_llr(cw2, snr, tbs / 1500, rng)
    _, ok0, soft = sch.dlsch_decode(plan0, llr0, n_iter=4)
    out, ok, _ = sch.dlsch_decode(plan2, llr2, softbuffers=soft, n_iter=4)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_plan_consistency():
    plan = sch.dlsch_plan(75376, 150000, qm=6)
    s = plan.segm
    assert s.C == 13
    assert sum(e for grp in plan.groups for e in grp.e_bits) == 150000
    assert sum(plan.cb_data_len) == 75376 + 24
