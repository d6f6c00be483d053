"""Resource allocation + DCI pack/unpack tests (reference: dci.c, ra.c)."""

import numpy as np
import pytest

from srsran_4g_tpu.models import dci, ra


def test_tbs_table_spec_points():
    assert ra.tbs_from_itbs(0, 1) == 16
    assert ra.tbs_from_itbs(26, 110) == 75376
    assert ra.dl_tbs(28, 100) == 75376
    assert ra.dl_tbs(0, 6) == 152


def test_mcs_mod_mapping():
    assert ra.dl_mcs_to_mod(0) == "qpsk"
    assert ra.dl_mcs_to_mod(10) == "16qam"
    assert ra.dl_mcs_to_mod(17) == "64qam"
    assert ra.dl_mcs_to_mod(27, use_256qam=True) == "256qam"


@pytest.mark.parametrize("n_rb", [6, 25, 50, 100])
def test_riv_roundtrip(n_rb):
    for l in (1, 2, n_rb // 2, n_rb):
        for s in (0, 1, n_rb - l):
            if s + l > n_rb:
                continue  # invalid allocation
            riv = ra.riv_encode(n_rb, l, s)
            l2, s2 = ra.riv_decode(n_rb, riv)
            assert (l2, s2) == (l, s), (n_rb, l, s, riv)


def test_type0_alloc():
    prbs = ra.type0_alloc_to_prbs((1 << 16) | 1, 50)
    # 50 PRB → P=3, 17 RBGs; first and last RBG set
    assert prbs[:3] == (0, 1, 2)
    assert prbs[-2:] == (48, 49)


@pytest.mark.parametrize("n_rb", [6, 25, 50, 100])
def test_dci_1a_roundtrip(n_rb):
    d = dci.Dci1A(rb_start=2, l_crbs=min(4, n_rb - 2), mcs=17, harq_pid=5,
                  ndi=1, rv=2, tpc=3)
    bits = dci.pack_1a(d, n_rb)
    assert bits.shape[0] == dci.format1a_len(n_rb)
    out = dci.unpack_1a(bits, n_rb)
    assert out == d


def test_dci_1_roundtrip():
    d = dci.Dci1(rbg_bitmap=0b10110, mcs=9, harq_pid=1, ndi=1, rv=0, tpc=2)
    bits = dci.pack_1(d, 25)
    assert dci.unpack_1(bits, 25) == d
    assert dci.format1_len(25) != dci.format1a_len(25)


def test_dci_0_roundtrip():
    d = dci.Dci0(rb_start=5, l_crbs=10, mcs=20, ndi=1, tpc=1, dmrs_cshift=4)
    bits = dci.pack_0(d, 50)
    assert bits.shape[0] == dci.format1a_len(50)
    assert dci.unpack_0(bits, 50) == d


def test_nr_sliv_roundtrip():
    from srsran_4g_tpu.models import ra_nr
    n = 14
    for s in range(n):
        for l in range(1, n - s + 1):
            v = ra_nr.sliv_encode(n, s, l)
            assert v < 128
            assert ra_nr.sliv_decode(n, v) == (s, l)
