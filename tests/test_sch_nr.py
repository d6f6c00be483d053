"""NR transport chain tests (reference: sch_nr_test / pusch_nr_bler_test)."""

import numpy as np
import pytest

from srsran_4g_tpu.models import sch_nr


def awgn_llr(bits, snr_db, rng):
    s2 = 10 ** (-snr_db / 10)
    y = (1 - 2 * bits.astype(np.float64)) + rng.standard_normal(bits.shape) * np.sqrt(s2)
    return (-2 * y / s2).astype(np.float32)


def test_bg_selection():
    assert sch_nr.nr_segment(200, 1200, 2).bg == 2      # small A
    assert sch_nr.nr_segment(4000, 6000, 2).bg == 1     # big A, high rate
    assert sch_nr.nr_segment(4000, 20000, 2).bg == 2    # rate <= 0.25
    s = sch_nr.nr_segment(3000, 6000, 2)
    assert s.L_tb == 16 and s.C == 1
    s2 = sch_nr.nr_segment(20000, 30000, 4)
    assert s2.L_tb == 24 and s2.C > 1 and s2.L_cb == 24


@pytest.mark.parametrize("tbs,g,qm", [(280, 1000, 2), (3000, 6144, 2),
                                      (20000, 36864, 4)])
def test_nr_chain_noiseless(tbs, g, qm):
    seg = sch_nr.nr_segment(tbs, g, qm)
    rng = np.random.default_rng(tbs)
    bits = rng.integers(0, 2, size=(2, tbs)).astype(np.int8)
    cw = np.asarray(sch_nr.encode(seg, bits))
    assert cw.shape == (2, g)
    llr = 8.0 * (2.0 * cw - 1.0)
    out, ok, _ = sch_nr.decode(seg, llr, n_iter=12)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_nr_chain_awgn():
    seg = sch_nr.nr_segment(3000, 9000, 2)  # rate 1/3
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(2, 3000)).astype(np.int8)
    cw = np.asarray(sch_nr.encode(seg, bits))
    llr = awgn_llr(cw, 1.5, rng)
    out, ok, _ = sch_nr.decode(seg, llr, n_iter=20)
    assert np.asarray(ok).all()


def test_nr_harq_rv_combining():
    tbs = 3000
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
    g = 4608  # rate ~0.65
    seg0 = sch_nr.nr_segment(tbs, g, 2, rv=0)
    seg2 = sch_nr.nr_segment(tbs, g, 2, rv=2)
    snr = -1.0  # rv0 alone fails here; IR-combined rv0+rv2 decodes
    llr0 = awgn_llr(np.asarray(sch_nr.encode(seg0, bits)), snr, rng)
    llr2 = awgn_llr(np.asarray(sch_nr.encode(seg2, bits)), snr, rng)
    _, ok0, soft = sch_nr.decode(seg0, llr0, n_iter=15)
    assert not np.asarray(ok0).all()
    out, ok, _ = sch_nr.decode(seg2, llr2, softbuffers=soft, n_iter=25)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), bits)
