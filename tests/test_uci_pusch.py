"""UCI-on-PUSCH multiplexing tests (reference: uci.c, sch.c ulsch UCI mux,
pusch_test.c UCI configurations)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pusch
from srsran_4g_tpu.models import uci

CELL = G.CellConfig(nof_prb=25, cell_id=42, cfi=1)


def _mk_cfg(mod="qpsk", tbs=600, **uci_kw):
    return pusch.PuschConfig(
        cell=CELL, rnti=0x777, subframe=2, mod=mod, tbs=tbs,
        prb_start=3, nof_prb_alloc=4, uci=uci.UciCfg(**uci_kw))


def test_plan_sizes_and_bijection():
    cfg = _mk_cfg(o_cqi=8, o_ack=2, o_ri=1)
    p = cfg.uci_plan
    # total coded bits conserved: CQI + data + RI fill the grid, ACK punctures
    assert p.q_cqi + p.g_data + p.q_ri == cfg.g_bits
    assert p.q_prime_ack <= 4 * cfg.m_sc and p.q_prime_ri <= 4 * cfg.m_sc
    # perm is a bijection over the output bit grid
    assert np.array_equal(np.sort(p.perm), np.arange(cfg.g_bits))
    # ACK lands only in columns {2,3,8,9}, RI only in {1,4,7,10}
    rp = p.m_sc
    ack_cols = set((p.ack_pos // p.qm) // rp)
    assert ack_cols <= set(uci.ACK_COLS)
    ri_out_syms = np.where(p.perm // p.qm >= (cfg.g_bits // p.qm - p.q_prime_ri))[0]
    ri_cols = set((ri_out_syms // p.qm) // rp)
    assert ri_cols <= set(uci.RI_COLS)


def test_ack_ri_codes_roundtrip():
    for o in (1, 2):
        bits = jnp.asarray(np.array([[i >> j & 1 for j in range(o)]
                                     for i in range(2 ** o)], np.int8))
        cw = uci.encode_ack_ri(bits, 24)
        llr = (2.0 * cw.astype(jnp.float32) - 1.0) * 4.0
        dec = uci.decode_ack_ri(llr, o)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))


@pytest.mark.parametrize("o_cqi", [4, 11, 16])
def test_cqi_codes_roundtrip(o_cqi):
    rng = np.random.default_rng(o_cqi)
    bits = jnp.asarray(rng.integers(0, 2, size=(4, o_cqi)).astype(np.int8))
    cw = uci.encode_cqi(bits, 96 * 2)
    llr = (2.0 * cw.astype(jnp.float32) - 1.0) * 4.0
    dec, ok = uci.decode_cqi(llr, o_cqi)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))
    assert np.asarray(ok).all()


def test_mux_demux_noiseless():
    cfg = _mk_cfg(mod="16qam", tbs=1000, o_cqi=16, o_ack=2, o_ri=1)
    p = cfg.uci_plan
    rng = np.random.default_rng(7)
    b = 2
    data = jnp.asarray(rng.integers(0, 2, (b, p.g_data)).astype(np.int8))
    cqi = jnp.asarray(rng.integers(0, 2, (b, 16)).astype(np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (b, 2)).astype(np.int8))
    ri = jnp.asarray(rng.integers(0, 2, (b, 1)).astype(np.int8))
    out = uci.mux(p, data, cqi_bits=cqi, ack_bits=ack, ri_bits=ri)
    llr = (2.0 * out.astype(jnp.float32) - 1.0) * 6.0
    dmx = uci.demux(p, llr)
    np.testing.assert_array_equal(np.asarray(dmx["ack_bits"]), np.asarray(ack))
    np.testing.assert_array_equal(np.asarray(dmx["ri_bits"]), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(dmx["cqi_bits"]), np.asarray(cqi))
    assert np.asarray(dmx["cqi_ok"]).all()
    # data LLRs: ACK positions are erasures, all others match the sent bits
    dl = np.asarray(dmx["data_llrs"])
    sent = (2.0 * np.asarray(data) - 1.0) * 6.0
    nz = dl != 0
    np.testing.assert_array_equal(dl[nz], sent[nz])
    assert nz.mean() > 0.9


@pytest.mark.parametrize("mod,tbs,snr_db,o_cqi",
                         [("qpsk", 600, 10.0, 8), ("16qam", 1000, 18.0, 16)])
def test_pusch_with_uci_loopback(mod, tbs, snr_db, o_cqi):
    cfg = _mk_cfg(mod=mod, tbs=tbs, o_cqi=o_cqi, o_ack=1, o_ri=1)
    rng = np.random.default_rng(tbs)
    b = 3
    bits = rng.integers(0, 2, size=(b, tbs)).astype(np.int8)
    cqi = jnp.asarray(rng.integers(0, 2, (b, o_cqi)).astype(np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (b, 1)).astype(np.int8))
    ri = jnp.asarray(rng.integers(0, 2, (b, 1)).astype(np.int8))
    tx = pusch.encode(cfg, jnp.asarray(bits), cqi_bits=cqi, ack_bits=ack,
                      ri_bits=ri)
    h = 0.9 * np.exp(1j * 0.6)
    nv = snr_to_noise_var(snr_db) * (cfg.m_sc / CELL.nre)
    rx = awgn(jax.random.PRNGKey(0), np.asarray(tx) * h, float(nv))
    out = pusch.decode(cfg, rx, n_iter=5)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), bits)
    np.testing.assert_array_equal(np.asarray(out["ack_bits"]), np.asarray(ack))
    np.testing.assert_array_equal(np.asarray(out["ri_bits"]), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(out["cqi_bits"]), np.asarray(cqi))
    assert np.asarray(out["cqi_ok"]).all()


def test_uci_without_data_room_raises():
    with pytest.raises(ValueError):
        pusch.PuschConfig(
            cell=CELL, rnti=1, subframe=0, mod="qpsk", tbs=104,
            nof_prb_alloc=1,
            uci=uci.UciCfg(o_cqi=20, beta_cqi=100.0)).uci_plan
