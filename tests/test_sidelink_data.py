"""PSCCH/PSSCH sidelink data-channel tests (reference: pscch_test.c, pssch_test.c)."""

import numpy as np
import pytest
import jax.numpy as jnp

from srsran_4g_tpu.models import sidelink as sl


# --------------------------------------------------------------------------
# PSCCH / PSSCH (sidelink data channels)


def test_pscch_sci_roundtrip_awgn():
    """SCI-0 over PSCCH: pack, encode, AWGN, blind-ish decode, unpack."""
    import jax
    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    cfg = sl.PscchConfig(nof_prb_cell=25, nof_prb_sl=50, prb_start=5)
    sci = sl.SciFormat0(riv=113, trp=0x2A, mcs=9, group_dst_id=0xA5)
    bits = sci.pack(nof_prb=50)
    assert len(bits) == cfg.sci_len
    tx = sl.pscch_encode(cfg, jnp.asarray(bits[None].repeat(4, 0)))
    nv = snr_to_noise_var(6.0)
    rx = awgn(jax.random.PRNGKey(3), tx, nv)
    out = sl.pscch_decode(cfg, rx, noise_var=nv)
    assert np.asarray(out["crc_ok"]).all()
    got = sl.SciFormat0.unpack(np.asarray(out["bits"])[0], nof_prb=50)
    assert got == sci
    # n_x_id consistency between TX helper and RX derivation
    assert int(np.asarray(out["n_x_id"])[0]) == sl.sci0_n_x_id(bits)


@pytest.mark.parametrize("mod,tbs", [("qpsk", 328), ("16qam", 936)])
def test_pssch_tb_roundtrip_awgn(mod, tbs):
    """SL-SCH transport block over PSSCH through AWGN."""
    import jax
    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    cfg = sl.PsschConfig(tbs=tbs, nof_prb_cell=25, prb_start=6, nof_prb=6,
                         mod=mod, n_x_id=0xBEEF, sf_idx=4)
    rng = np.random.default_rng(tbs)
    tb = rng.integers(0, 2, size=(4, tbs)).astype(np.int8)
    tx = sl.pssch_encode(cfg, jnp.asarray(tb))
    nv = snr_to_noise_var(14.0 if mod == "16qam" else 8.0)
    rx = awgn(jax.random.PRNGKey(9), tx, nv)
    out = sl.pssch_decode(cfg, rx, noise_var=nv)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), tb)


def test_pscch_pssch_same_subframe():
    """Control+data in one subframe: decode SCI, derive n_x_id, decode TB."""
    import jax
    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    ctrl = sl.PscchConfig(nof_prb_cell=25, nof_prb_sl=25, prb_start=0)
    sci = sl.SciFormat0(riv=40, trp=3, mcs=5, group_dst_id=7)
    bits = sci.pack(nof_prb=25)
    nxid = sl.sci0_n_x_id(bits)
    data = sl.PsschConfig(tbs=256, nof_prb_cell=25, prb_start=2, nof_prb=4,
                          n_x_id=nxid, sf_idx=2)
    rng = np.random.default_rng(1)
    tb = rng.integers(0, 2, size=(2, 256)).astype(np.int8)
    tx = sl.pscch_encode(ctrl, jnp.asarray(bits[None].repeat(2, 0))) \
        + sl.pssch_encode(data, jnp.asarray(tb))
    nv = snr_to_noise_var(10.0)
    rx = awgn(jax.random.PRNGKey(5), tx, nv)
    c = sl.pscch_decode(ctrl, rx, noise_var=nv)
    assert np.asarray(c["crc_ok"]).all()
    assert int(np.asarray(c["n_x_id"])[0]) == nxid
    d = sl.pssch_decode(data, rx, noise_var=nv)
    assert np.asarray(d["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(d["bits"]), tb)


def test_ra_sl_pscch_resources_and_trp():
    from srsran_4g_tpu.models import ra_sl
    bitmap = np.zeros(40, np.uint8)
    bitmap[::4] = 1  # 10 PSCCH subframes in the period
    (prb_a, prb_b), (sf_a, sf_b) = ra_sl.pscch_resources(
        prb_num=4, prb_start=2, prb_end=22, sf_bitmap=bitmap, n_pscch=13)
    assert 2 <= prb_a <= 22 and 2 <= prb_b <= 22 and prb_a != prb_b
    assert bitmap[sf_a] == 1 and bitmap[sf_b] == 1 and sf_a != sf_b
    # TRP: k set bits; the bitmap gates PSSCH subframes
    idx = ra_sl.trp_idx_from_k(8, 4)
    bm = ra_sl.trp_bitmap(8, idx)
    assert bm.sum() == 4
    allowed = [ra_sl.pssch_allowed_sf(i, idx) for i in range(16)]
    assert allowed[:8] == allowed[8:16]  # periodic with the TRP length
    assert sum(allowed[:8]) == 4
    # RIV round-trip shared with UL type 0
    from srsran_4g_tpu.models.ra import riv_decode, riv_encode
    riv = riv_encode(50, 6, 10)
    assert riv_decode(50, riv) == (6, 10)
