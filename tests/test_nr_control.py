"""NR control channels: PDCCH blind decode, DCI codecs, PUCCH, TBS.

Reference parity: pdcch_nr_test.c (DCI through CORESET w/ RNTI-masked
CRC), pucch_nr_test.c (formats 0/1/2), ra_nr TBS determination.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import dci_nr, pdcch_nr, pucch_nr, ra_nr


def test_riv_roundtrip():
    for n_rb in (24, 52, 106):
        for start, length in ((0, 1), (3, 7), (0, n_rb), (n_rb - 1, 1)):
            riv = dci_nr.riv_encode(n_rb, start, length)
            assert dci_nr.riv_decode(n_rb, riv) == (start, length)
    with pytest.raises(ValueError):
        dci_nr.riv_encode(24, 20, 10)


def test_dci_1_0_roundtrip():
    d = dci_nr.DciNr10(n_rb=52, rb_start=10, l_rbs=20, mcs=21, ndi=1,
                       rv=2, harq_pid=7, dai=1, tpc=3, pucch_res=5,
                       harq_timing=2)
    back = dci_nr.DciNr10.unpack(d.pack(), n_rb=52)
    assert back == d


def test_dci_0_0_padded_size():
    d1 = dci_nr.DciNr10(n_rb=52)
    d0 = dci_nr.DciNr00(n_rb=52, rb_start=2, l_rbs=5, mcs=9,
                        target_bits=d1.nof_bits)
    assert len(d0.pack()) == len(d1.pack())
    back = dci_nr.DciNr00.unpack(d0.pack(), n_rb=52)
    assert (back.rb_start, back.l_rbs, back.mcs) == (2, 5, 9)


def test_pdcch_nr_blind_decode():
    cfg = pdcch_nr.CoresetConfig(nof_prb=24, pci=77, slot=2)
    dci = dci_nr.DciNr10(n_rb=52, rb_start=4, l_rbs=24, mcs=17, harq_pid=3)
    bits = np.unpackbits(np.frombuffer(dci.pack(), np.uint8))[:dci.nof_bits]
    tx = pdcch_nr.encode(cfg, bits, rnti=0x4601, aggregation=2, start_cce=2)
    rx = awgn(jax.random.PRNGKey(0), tx, snr_to_noise_var(10.0))
    out = pdcch_nr.blind_decode(cfg, rx, rnti=0x4601, dci_len=dci.nof_bits)
    assert bool(out["found"][0]) and int(out["agg"][0]) == 2
    dec = dci_nr.DciNr10.unpack(
        np.packbits(np.asarray(out["bits"][0])).tobytes(), n_rb=52)
    assert dec == dci
    # wrong RNTI finds nothing
    miss = pdcch_nr.blind_decode(cfg, rx, rnti=0x1234, dci_len=dci.nof_bits)
    assert not bool(miss["found"][0])


def test_pucch_nr_f0_f1():
    nv = snr_to_noise_var(5.0)
    c0 = pucch_nr.PucchNrF0Config(pci=33, nof_bits=2)
    for v in range(4):
        rx = awgn(jax.random.PRNGKey(v), pucch_nr.f0_encode(c0, v)[None], nv)
        assert int(pucch_nr.f0_detect(c0, rx)["value"][0]) == v
    c1 = pucch_nr.PucchNrF1Config(pci=33, nof_bits=2, nof_symb=4, occ_idx=1)
    bits = jnp.asarray(np.array([[0, 1], [1, 0], [1, 1]], np.int8))
    rx = awgn(jax.random.PRNGKey(9), pucch_nr.f1_encode(c1, bits), nv)
    assert (np.asarray(pucch_nr.f1_decode(c1, rx)["bits"])
            == np.asarray(bits)).all()


@pytest.mark.parametrize("a,prb", [(1, 1), (4, 1), (11, 2), (16, 4)])
def test_pucch_nr_f2_uci(a, prb):
    cfg = pucch_nr.PucchNrF2Config(pci=33, rnti=0x777, nof_prb=prb,
                                   nof_symb=2, nof_uci_bits=a)
    ub = jnp.asarray(
        np.random.default_rng(a).integers(0, 2, (3, a)).astype(np.int8))
    rx = awgn(jax.random.PRNGKey(a), pucch_nr.f2_encode(cfg, ub),
              snr_to_noise_var(10.0))
    out = pucch_nr.f2_decode(cfg, rx)
    assert (np.asarray(out["bits"]) == np.asarray(ub)).all()


def test_ra_nr_tbs():
    # spot values: small allocations quantise onto Table 5.1.3.2-1
    assert ra_nr.tbs(1, 0, nof_symb=12, nof_dmrs_re=12) in ra_nr.TBS_TABLE
    # monotonic in PRBs and MCS
    t = [ra_nr.dl_tbs(10, n) for n in (5, 20, 52, 106)]
    assert t == sorted(t) and len(set(t)) == len(t)
    t2 = [ra_nr.dl_tbs(m, 52) for m in (0, 5, 10, 17, 25)]
    assert t2 == sorted(t2)
    # large-TBS branch is byte aligned (+24 CRC divisible by 8)
    big = ra_nr.dl_tbs(27, 106)
    assert big > 3824 and (big + 24) % 8 == 0
