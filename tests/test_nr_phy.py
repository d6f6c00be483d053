"""NR PHY composites: PDSCH-NR, PUSCH-NR, SSB (PSS/SSS/PBCH).

Reference parity targets: pdsch_nr_test.c / pusch_nr_bler_test.c
(CRC OK across MCS sweep), ssb_*_test (PCI search + PBCH decode).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid_nr, pdsch_nr, pusch_nr, ssb

CAR = grid_nr.NrCarrierConfig(nof_prb=24, pci=101)


def _tb(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2, (b, cfg.tbs)).astype(np.int8))


@pytest.mark.parametrize("mod,tbs,snr", [
    ("qpsk", 1032, 5.0),
    ("16qam", 4224, 14.0),
    ("64qam", 8448, 22.0),   # multi-CB BG1
])
def test_pdsch_nr_chain(mod, tbs, snr):
    cfg = pdsch_nr.PdschNrConfig(carrier=CAR, rnti=0x4601, slot=3,
                                 mod=mod, tbs=tbs)
    bits = _tb(cfg, 4)
    tx = pdsch_nr.encode(cfg, bits)
    rx = awgn(jax.random.PRNGKey(1), tx, snr_to_noise_var(snr))
    out = pdsch_nr.decode(cfg, rx)
    assert bool(np.asarray(out["crc_ok"]).all()), np.asarray(out["noise_var"])
    assert (np.asarray(out["bits"]) == np.asarray(bits)).all()


def test_pdsch_nr_harq_ir():
    """rv0 fails at low SNR; rv0+rv2 soft-combined succeeds."""
    mk = lambda rv: pdsch_nr.PdschNrConfig(
        carrier=CAR, rnti=0x4601, slot=3, mod="16qam", tbs=4224, rv=rv)
    cfg0, cfg2 = mk(0), mk(2)
    bits = _tb(cfg0, 2)
    nv = snr_to_noise_var(3.5)
    rx0 = awgn(jax.random.PRNGKey(2), pdsch_nr.encode(cfg0, bits), nv)
    out0 = pdsch_nr.decode(cfg0, rx0)
    rx2 = awgn(jax.random.PRNGKey(3), pdsch_nr.encode(cfg2, bits), nv)
    out2 = pdsch_nr.decode(cfg2, rx2, softbuffers=out0["softbuffers"])
    # the combined decode must do at least as well, and decode fully
    assert bool(np.asarray(out2["crc_ok"]).all())
    assert (np.asarray(out2["bits"]) == np.asarray(bits)).all()


def test_pusch_nr_chain():
    cfg = pusch_nr.PuschNrConfig(carrier=CAR, rnti=0x17, slot=8,
                                 mod="qpsk", tbs=2048)
    bits = _tb(cfg, 3, seed=5)
    tx = pusch_nr.encode(cfg, bits)
    rx = awgn(jax.random.PRNGKey(9), tx, snr_to_noise_var(8.0))
    out = pusch_nr.decode(cfg, rx)
    assert bool(np.asarray(out["crc_ok"]).all())


def test_pss_sss_sequences():
    # PSS: BPSK ±1, distinct per NID2, good cross-correlation separation
    s0, s1 = ssb.pss_sequence(0), ssb.pss_sequence(1)
    assert set(np.unique(s0)) <= {-1.0, 1.0}
    assert abs(np.dot(s0, s0)) == 127
    assert abs(np.dot(s0, s1)) < 30
    # SSS distinct per (nid1, nid2)
    a = ssb.sss_sequence(0, 0)
    b = ssb.sss_sequence(1, 0)
    assert abs(np.dot(a, b)) < 40


@pytest.mark.parametrize("pci", [0, 777])
def test_ssb_search_and_pbch(pci):
    cfg = ssb.SsbConfig(pci=pci)
    rng = np.random.default_rng(pci)
    payload = jnp.asarray(rng.integers(0, 2, (2, 32)).astype(np.int8))
    tx = ssb.assemble(cfg, payload)
    rx = awgn(jax.random.PRNGKey(pci), tx, snr_to_noise_var(8.0))
    s = ssb.search_pci(rx)
    assert (np.asarray(s["pci"]) == pci).all()
    out = ssb.decode_pbch(cfg, rx)
    assert bool(np.asarray(out["crc_ok"]).all())
    assert (np.asarray(out["payload"]) == np.asarray(payload)).all()


def test_ssb_search_wrong_cell_low_metric():
    """Noise-only capture: the PSS metric must be far below a real hit."""
    key = jax.random.PRNGKey(0)
    noise = (jax.random.normal(key, (2, 4, 240, 2)) @ jnp.asarray([1.0, 1j]))
    s = ssb.search_pci(noise.astype(jnp.complex64))
    assert float(np.asarray(s["metric"]).max()) < 0.3


# --- UCI on PUSCH (uci_nr.c + pusch_nr.c multiplexing) ----------------------


@pytest.mark.parametrize("o_ack,o_csi", [(1, 0), (2, 8), (4, 16), (0, 11)])
def test_uci_on_pusch_nr(o_ack, o_csi):
    """ACK (punctured) + CSI (rate-matched) on PUSCH through AWGN."""
    from srsran_4g_tpu.models import pusch_nr
    cfg = pusch_nr.PuschNrUciConfig(
        carrier=CAR, rnti=0x4601, slot=5, mod="16qam", tbs=4224,
        uci=pusch_nr.NrUciCfg(o_ack=o_ack, o_csi=o_csi))
    rng = np.random.default_rng(o_ack * 31 + o_csi)
    tb = rng.integers(0, 2, (3, cfg.tbs)).astype(np.int8)
    ack = (rng.integers(0, 2, (3, o_ack)).astype(np.int8)
           if o_ack else None)
    csi = (rng.integers(0, 2, (3, o_csi)).astype(np.int8)
           if o_csi else None)
    tx = pusch_nr.encode_uci(
        cfg, jnp.asarray(tb),
        None if ack is None else jnp.asarray(ack),
        None if csi is None else jnp.asarray(csi))
    rx = awgn(jax.random.PRNGKey(7), tx, float(snr_to_noise_var(14.0)))
    out = pusch_nr.decode_uci(cfg, rx)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["bits"]), tb)
    if o_ack:
        np.testing.assert_array_equal(np.asarray(out["ack_bits"]), ack)
    if o_csi:
        np.testing.assert_array_equal(np.asarray(out["csi_bits"]), csi)


def test_uci_on_pusch_data_survives_unknown_ack():
    """ACK puncturing (not rate matching) means a receiver that does not
    expect ACK still decodes the data: the punctured LLRs are just noise
    to the LDPC decoder (why 38.212 punctures ACK)."""
    from srsran_4g_tpu.models import pusch_nr
    uci = pusch_nr.NrUciCfg(o_ack=2, o_csi=0)
    cfg_tx = pusch_nr.PuschNrUciConfig(
        carrier=CAR, rnti=0x4601, slot=5, mod="qpsk", tbs=2088, uci=uci)
    rng = np.random.default_rng(3)
    tb = rng.integers(0, 2, (2, cfg_tx.tbs)).astype(np.int8)
    ack = rng.integers(0, 2, (2, 2)).astype(np.int8)
    tx = pusch_nr.encode_uci(cfg_tx, jnp.asarray(tb), jnp.asarray(ack))
    rx = awgn(jax.random.PRNGKey(9), tx, float(snr_to_noise_var(10.0)))
    # decode WITHOUT knowing about the ACK: plain PUSCH decode
    cfg_rx = pusch_nr.PuschNrConfig(carrier=CAR, rnti=0x4601, slot=5,
                                    mod="qpsk", tbs=2088)
    out = pusch_nr.decode(cfg_rx, rx)
    assert np.asarray(out["crc_ok"]).all()
