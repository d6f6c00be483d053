"""NB-IoT data-channel tests (reference: npdcch_*test, npdsch_*test,
dci_nbiot, ra_nbiot TBS tables)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import nbiot_data as nb

NCELL = 17
RNTI = 0x4604


def test_tbs_tables():
    assert nb.npdsch_tbs(0, 0) == 16
    assert nb.npdsch_tbs(12, 2) == 680
    assert nb.npdsch_tbs(4, 3) == 256
    with pytest.raises(ValueError):
        nb.npdsch_tbs(12, 7)
    assert int(nb.TBS_SIB1[9]) == 680
    assert int(nb.TBS_NPUSCH[12][3]) == 1000


def test_dci_pack_unpack_roundtrip():
    d1 = nb.DciN1(i_delay=3, i_sf=2, mcs=7, i_rep=1, ndi=1, harq_ack=5)
    bits = d1.pack()
    assert bits.shape == (23,)
    assert nb.unpack_dci_n1(bits) == d1
    assert d1.nof_sf == 3 and d1.tbs == 328

    d0 = nb.DciN0(sc_indication=18, i_ru=4, i_delay=1, mcs=5, rv=1,
                  i_rep=2, ndi=1, dci_sf_rep=1)
    assert nb.unpack_dci_n0(d0.pack()) == d0


def test_nrs_pattern_and_values():
    ls, ks = nb.nrs_pattern(NCELL)
    np.testing.assert_array_equal(ls, [5, 6, 12, 13])
    assert ks.shape == (4, 2) and (ks < 12).all()
    v = nb.nrs_values(NCELL, 3)
    np.testing.assert_allclose(np.abs(v), 1.0, atol=1e-5)
    # NPDSCH REs exclude NRS: 160 for standalone
    assert nb.npdsch_re_indices(NCELL).shape == (160,)
    assert nb.ncce_re_indices(NCELL, 0).shape[0] + \
        nb.ncce_re_indices(NCELL, 1).shape[0] == 160


@pytest.mark.parametrize("ncce,l_agg", [(0, 1), (1, 1), (0, 2)])
def test_npdcch_blind_decode(ncce, l_agg):
    dci = nb.DciN1(i_delay=0, i_sf=1, mcs=4, i_rep=0, ndi=1, harq_ack=2)
    bits = jnp.asarray(np.tile(dci.pack(), (2, 1)))
    tx = nb.npdcch_encode(bits, RNTI, NCELL, subframe=1, ncce=ncce,
                          l_agg=l_agg)
    h = 0.8 * np.exp(1j * 0.4)
    rx = awgn(jax.random.PRNGKey(1), np.asarray(tx) * h,
              float(snr_to_noise_var(8.0)))
    out = nb.npdcch_blind_decode(rx, RNTI, NCELL, subframe=1)
    ok = np.asarray(out["crc_ok"])
    cand = {(0, 1): 0, (1, 1): 1, (0, 2): 2}[(ncce, l_agg)]
    assert ok[:, cand].all()
    dec = nb.unpack_dci_n1(np.asarray(out["bits"])[0, cand])
    assert dec == dci
    # wrong RNTI must not match anywhere
    bad = nb.npdcch_blind_decode(rx, RNTI + 1, NCELL, subframe=1)
    assert not np.asarray(bad["crc_ok"]).any()


@pytest.mark.parametrize("i_tbs,i_sf,snr_db",
                         [(1, 0, 6.0), (4, 3, 6.0), (12, 2, 16.0)])
def test_npdsch_loopback(i_tbs, i_sf, snr_db):
    cfg = nb.NpdschConfig(n_id_ncell=NCELL, rnti=RNTI, i_tbs=i_tbs,
                          i_sf=i_sf, sfn=8, start_sf=4)
    rng = np.random.default_rng(i_tbs)
    bits = rng.integers(0, 2, size=(3, cfg.tbs)).astype(np.int8)
    tx = nb.npdsch_encode(cfg, jnp.asarray(bits))
    assert tx.shape == (3, cfg.nof_sf, 14, 12)
    h = 0.9 * np.exp(-1j * 0.7)
    rx = awgn(jax.random.PRNGKey(2), np.asarray(tx) * h,
              float(snr_to_noise_var(snr_db)))
    out = nb.npdsch_decode(cfg, rx)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)


def test_npdsch_sf_list_skips_sync_subframes():
    cfg = nb.NpdschConfig(n_id_ncell=NCELL, rnti=RNTI, i_tbs=5, i_sf=4,
                          sfn=0, start_sf=3)
    sfs = cfg.sf_list()
    assert len(sfs) == 5
    assert all(sf not in (0, 5, 9) for _, sf in sfs)


def test_npdsch_bcch_scrambling_differs():
    cfg_a = nb.NpdschConfig(n_id_ncell=NCELL, rnti=0xFFFF, i_tbs=3,
                            i_sf=0, is_bcch=True)
    cfg_b = nb.NpdschConfig(n_id_ncell=NCELL, rnti=0xFFFF, i_tbs=3,
                            i_sf=0, is_bcch=False)
    bits = jnp.asarray(np.zeros((1, cfg_a.tbs), np.int8))
    ga = np.asarray(nb.npdsch_encode(cfg_a, bits))
    gb = np.asarray(nb.npdsch_encode(cfg_b, bits))
    assert not np.allclose(ga, gb)
