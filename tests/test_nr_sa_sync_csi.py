"""NR SA sync (SSB time search), CSI-RS/CSI reports, HARQ-ACK codebooks.

Reference scenarios: ue_sync_nr / sync_sa cell search + tracking,
csi_rs measurement tests, harq_ack codebook tests.
"""

import numpy as np

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import csi_nr, grid_nr, harq_ack_nr, ssb, ue_sync_nr


def test_sa_cell_search_and_track():
    pci = 345
    payload = jnp.asarray(np.random.default_rng(0).integers(
        0, 2, (1, 32)).astype(np.int8))
    grid = ssb.assemble(ssb.SsbConfig(pci=pci), payload)
    t = ue_sync_nr.ssb_to_samples(grid)
    delay = 777
    stream = jnp.concatenate(
        [jnp.zeros((1, delay), jnp.complex64), t,
         jnp.zeros((1, 500), jnp.complex64)], axis=-1)
    sig_pow = float(jnp.mean(jnp.abs(t) ** 2))
    rx = awgn(jax.random.PRNGKey(1), stream,
              snr_to_noise_var(10.0) * sig_pow)

    us = ue_sync_nr.UeSyncNr()
    out = us.process(rx)
    assert out["in_sync"] and out["pci"] == pci
    assert out["offset"] == delay + 18  # exact timing: delay + CP
    mib = us.decode_mib(out["ssb_grid"])
    assert bool(np.asarray(mib["crc_ok"]).all())
    assert (np.asarray(mib["payload"]) == np.asarray(payload)).all()
    # loss of signal -> back to FIND
    noise = awgn(jax.random.PRNGKey(2), jnp.zeros_like(rx), 1.0)
    for _ in range(6):
        us.process(noise)
    assert us.s.state == ue_sync_nr.FIND


def test_csi_rs_measurement_and_report():
    car = grid_nr.NrCarrierConfig(nof_prb=24, pci=11)
    cfg = csi_nr.CsiRsConfig(carrier=car, slot=2)
    g = csi_nr.put_csi_rs(cfg, jnp.zeros((2, 14, car.nre), jnp.complex64))
    h = 0.8 * np.exp(1j * 0.3)
    rx = awgn(jax.random.PRNGKey(0), g * h, snr_to_noise_var(18.0) * 0.64)
    m = csi_nr.measure(cfg, rx)
    sinr = np.asarray(m["sinr_db"])
    assert (np.abs(sinr - 18.0) < 3.0).all()
    rep = csi_nr.generate_report(m["sinr_db"])
    assert (np.asarray(rep["cqi"]) >= 8).all()  # ~18 dB -> CQI 9
    # at very low SNR the CQI collapses
    rx_bad = awgn(jax.random.PRNGKey(1), g * 0.01, 1.0)
    rep_bad = csi_nr.generate_report(
        csi_nr.measure(cfg, rx_bad)["sinr_db"])
    assert (np.asarray(rep_bad["cqi"]) <= 2).all()


def test_harq_ack_type1():
    occ = [(0, 0), (1, 0), (2, 0), (3, 0)]
    acks = {(1, 0): True, (3, 0): True}
    assert harq_ack_nr.type1_codebook(occ, acks) == [0, 1, 0, 1]


def test_harq_ack_type2_dai_gap():
    # received DAIs 1,2,4 -> the 3rd assignment was missed -> NACK filled
    bits = harq_ack_nr.type2_codebook([(1, True), (2, True), (4, True)])
    assert bits == [1, 1, 0, 1]
    # clean sequence
    assert harq_ack_nr.type2_codebook([(1, True), (2, False)]) == [1, 0]


def test_harq_ack_sr_multiplex():
    assert harq_ack_nr.multiplex_with_sr([1, 0], True) == [1, 0, 1]
