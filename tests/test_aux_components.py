"""NR scheduler, NB-IoT, sidelink, ue_sync FSM, Wiener chest, sys
metrics, E2 agent.

Reference scenarios: sched_nr_parallel_test.cc (multi-carrier slot
scheduling invariants), npss/nsss/npbch tests, psss/ssss/psbch tests,
ue_sync FIND/TRACK, wiener_dl.c hook, sys_metrics_processor.cc,
e2sm_kpm tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import nbiot, sidelink as sl
from srsran_4g_tpu.stack.sched_nr import BwpConfig, SchedNr
from srsran_4g_tpu.stack import e2
from srsran_4g_tpu.utils.sys_metrics import SysMetricsProcessor


# ---------------------------------------------------------------------------
# NR scheduler


def test_sched_nr_basic_allocation():
    s = SchedNr(nof_carriers=2, bwp=BwpConfig(nof_prb=52))
    s.ue_cfg(0x4601)
    s.carriers[0].dl_buffer_state(0x4601, 5000)
    grants = s.run_slot(0)
    assert len(grants) == 2            # one list per carrier
    g = grants[0][0]
    assert g.rnti == 0x4601 and g.tbs > 0 and not g.is_retx
    assert g.rb_start + g.rb_len <= 52
    # carrier 1 has no buffer -> no grant
    assert grants[1] == []


def test_sched_nr_harq_retx_and_drop():
    s = SchedNr(nof_carriers=1)
    c = s.carriers[0]
    s.ue_cfg(2)
    c.dl_buffer_state(2, 1000)
    g = c.run_slot(0)[0]
    # NACK -> retx with rv progression, same tbs
    c.ack_info(2, g.harq_pid, False)
    r = c.run_slot(1)[0]
    assert r.is_retx and r.tbs == g.tbs and r.rv == 2
    # three more NACKs -> process dropped
    for i in range(3):
        c.ack_info(2, g.harq_pid, False)
    assert all(not h.active for h in c.ues[2].harq[: 1])


def test_sched_nr_no_overlap_multi_ue():
    s = SchedNr(nof_carriers=1, bwp=BwpConfig(nof_prb=52))
    for rnti in (1, 2, 3):
        s.ue_cfg(rnti)
        s.carriers[0].dl_buffer_state(rnti, 100000)
    grants = s.run_slot(0)[0]
    spans = sorted((g.rb_start, g.rb_start + g.rb_len) for g in grants
                   if not g.is_ul)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0  # disjoint PRBs
    assert all(a1 <= 52 for _, a1 in spans)


def test_sched_nr_ul_grants_on_bsr():
    s = SchedNr(nof_carriers=1)
    s.ue_cfg(7)
    s.carriers[0].ul_bsr(7, 500)
    grants = s.run_slot(0)[0]
    assert any(g.is_ul for g in grants)


def test_sched_nr_pf_fairness():
    s = SchedNr(nof_carriers=1, bwp=BwpConfig(nof_prb=10), policy="pf")
    s.ue_cfg(1)
    s.ue_cfg(2)
    c = s.carriers[0]
    c.cqi_info(1, 15)
    c.cqi_info(2, 5)
    served = {1: 0, 2: 0}
    for slot in range(100):
        c.dl_buffer_state(1, 10000)
        c.dl_buffer_state(2, 10000)
        for g in c.run_slot(slot):
            if not g.is_ul and not g.is_retx:
                served[g.rnti] += g.tbs
        for ue, pid in [(1, 0), (2, 0)]:
            pass
        for rnti in (1, 2):
            for pid, h in enumerate(c.ues[rnti].harq):
                if h.active:
                    c.ack_info(rnti, pid, True)
    assert served[2] > 0  # PF still serves the low-CQI UE


# ---------------------------------------------------------------------------
# NB-IoT


def test_npss_metric():
    g = nbiot.put_npss(jnp.zeros((2, 14, 12), jnp.complex64))
    rx = awgn(jax.random.PRNGKey(0), g, snr_to_noise_var(5.0))
    assert (np.asarray(nbiot.npss_metric(rx)) > 0.5).all()
    noise = awgn(jax.random.PRNGKey(1), jnp.zeros((2, 14, 12),
                                                  jnp.complex64), 1.0)
    assert (np.asarray(nbiot.npss_metric(noise)) < 0.2).all()


@pytest.mark.parametrize("cid", [0, 257, 503])
def test_nsss_cell_id(cid):
    g = nbiot.put_nsss(jnp.zeros((1, 14, 12), jnp.complex64), cid)
    rx = awgn(jax.random.PRNGKey(cid), g, snr_to_noise_var(6.0))
    assert int(nbiot.nsss_detect(rx)["cell_id"][0]) == cid


@pytest.mark.parametrize("frame_idx,r14", [(0, False), (12, False), (35, True)])
def test_npbch_roundtrip(frame_idx, r14):
    mib = jnp.asarray(np.random.default_rng(0).integers(
        0, 2, (3, nbiot.MIB_NB_LEN)).astype(np.int8))
    tx = nbiot.npbch_encode(257, mib, frame_idx=frame_idx, is_r14=r14)
    nv = float(snr_to_noise_var(8.0))
    rx = awgn(jax.random.PRNGKey(7), tx, nv)
    block = (frame_idx // nbiot.NPBCH_REP) % nbiot.NPBCH_BLOCKS
    out = nbiot.npbch_decode(257, rx, block_idx=block, nf=frame_idx,
                             is_r14=r14)
    assert bool(np.asarray(out["crc_ok"]).all())
    assert (np.asarray(out["mib"]) == np.asarray(mib)).all()
    assert (np.asarray(out["n_ports"]) == 1).all()
    # wrong cell id -> descramble fails
    bad = nbiot.npbch_decode(11, rx, block_idx=block, nf=frame_idx,
                             is_r14=r14)
    assert not np.asarray(bad["crc_ok"]).any()


# ---------------------------------------------------------------------------
# sidelink


def test_psss_ssss():
    nv = snr_to_noise_var(6.0)
    rx = awgn(jax.random.PRNGKey(0),
              jnp.asarray(sl.psss_for_id(5))[None], nv)
    assert int(sl.psss_detect(rx)["root_idx"][0]) == 0
    rx = awgn(jax.random.PRNGKey(1),
              jnp.asarray(sl.psss_for_id(200))[None], nv)
    assert int(sl.psss_detect(rx)["root_idx"][0]) == 1
    for nid in (0, 167, 335):
        rx = awgn(jax.random.PRNGKey(nid),
                  jnp.asarray(sl.ssss_sequence(nid))[None], nv)
        assert int(sl.ssss_detect(rx)["n_sl_id"][0]) == nid


def test_psbch_mib_sl():
    mib = sl.MibSl(sl_bandwidth=50, direct_frame_number=777,
                   direct_subframe_number=3)
    bits = jnp.asarray(mib.pack()[None])
    nv = float(snr_to_noise_var(8.0))
    rx = awgn(jax.random.PRNGKey(1), sl.psbch_encode(170, bits), nv)
    out = sl.psbch_decode(170, rx, noise_var=nv)
    assert bool(np.asarray(out["crc_ok"]).all())
    assert sl.MibSl.unpack(np.asarray(out["mib"][0])) == mib


def test_sci_format0_roundtrip():
    sci = sl.SciFormat0(riv=1234, trp=88, mcs=12, timing_advance=512,
                        group_dst_id=0xAB)
    assert sl.SciFormat0.unpack(sci.pack()) == sci


# ---------------------------------------------------------------------------
# ue_sync FSM (FIND -> TRACK -> loss -> FIND) + MIB


def test_ue_sync_fsm_and_mib():
    from srsran_4g_tpu.models import enb_dl, grid as G, pdsch, ue_sync

    cell = G.CellConfig(nof_prb=6, cell_id=123, cfi=1)
    cfg = pdsch.PdschConfig(cell=cell, rnti=0x46, subframe=0, mod="qpsk",
                            tbs=152)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (1, cfg.tbs)).astype(np.int8))
    mib_bits = jnp.asarray(rng.integers(0, 2, (1, 24)).astype(np.int8))
    grid_tx = enb_dl.assemble_subframe(cfg, bits, mib_bits=mib_bits)
    samples = enb_dl.subframe_to_samples(cell, grid_tx)
    stream = jnp.concatenate([samples[0], samples[0]])
    rx = awgn(jax.random.PRNGKey(1), stream, snr_to_noise_var(15.0))

    us = ue_sync.UeSync(nof_prb=6)
    out = us.zerocopy(rx)
    assert out["in_sync"] and out["cell_id"] == 123
    assert us.s.state == ue_sync.TRACK

    mib = ue_sync.decode_mib(123, out["sf_samples"][None])
    assert bool(np.asarray(mib["crc_ok"]).all())
    assert (np.asarray(mib["mib"]) == np.asarray(mib_bits)).all()

    # signal loss -> back to FIND after N misses
    noise = awgn(jax.random.PRNGKey(2),
                 jnp.zeros_like(rx[:us.sf_len]), 1.0)
    for _ in range(30):
        us.zerocopy(noise)
    assert us.s.state == ue_sync.FIND


# ---------------------------------------------------------------------------
# Wiener chest


def test_wiener_chest_beats_linear_on_dispersive_channel():
    from srsran_4g_tpu.models import chest, grid as G, pdsch

    cell = G.CellConfig(nof_prb=50, cell_id=7, cfi=1)
    cfg = pdsch.PdschConfig(cell=cell, rnti=0x46, subframe=4, mod="qpsk",
                            tbs=4392)
    rng = np.random.default_rng(3)
    bits = jnp.asarray(rng.integers(0, 2, (4, cfg.tbs)).astype(np.int8))
    tx = pdsch.add_crs(cfg, pdsch.encode(cfg, bits))
    # 3-tap dispersive channel in time -> frequency-selective H
    taps = jnp.asarray([0.9, 0.4 * 1j, 0.2])
    h_freq = jnp.sum(
        taps[None, :] * jnp.exp(-2j * np.pi * jnp.arange(cell.nre)[:, None]
                                * jnp.asarray([0, 3, 7])[None, :]
                                / cell.nre), axis=-1)
    rx = tx * h_freq[None, None, :]
    rx = awgn(jax.random.PRNGKey(5), rx, snr_to_noise_var(15.0))

    est_lin = chest.estimate(chest.ChestConfig(cell=cell), rx, 4)
    est_wnr = chest.estimate(
        chest.ChestConfig(cell=cell, wiener=True, wiener_snr_db=15.0), rx, 4)
    h_true = jnp.broadcast_to(h_freq[None, None, :], est_lin["h"].shape)
    mse_lin = float(jnp.mean(jnp.abs(est_lin["h"] - h_true) ** 2))
    mse_wnr = float(jnp.mean(jnp.abs(est_wnr["h"] - h_true) ** 2))
    assert mse_wnr < mse_lin


# ---------------------------------------------------------------------------
# sys metrics + E2 KPM


def test_sys_metrics_reads_proc():
    p = SysMetricsProcessor()
    _ = sum(range(100000))  # burn a little CPU
    m = p.get_metrics()
    assert m.process_rss_kb > 1000
    assert m.process_threads >= 1
    assert 0.0 <= m.system_mem_percent <= 100.0


def test_e2_kpm_subscription_and_indication():
    wire = []
    agent = e2.E2Agent(metrics_source=lambda: {"cqi": 15, "dl_mbps": 42,
                                               "nof_ue": 1},
                       tx=wire.append)
    agent.setup()
    proc, t, setup = e2.unpack_pdu(wire[-1])
    assert isinstance(setup, e2.E2SetupRequest)
    assert e2.KPM_RAN_FUNCTION_ID in setup.ran_functions
    # RIC answers + subscribes at 10 ms
    agent.rx(e2.pack_pdu(e2.PROC_E2_SETUP, e2.PDU_SUCCESSFUL,
                         e2.E2SetupResponse()))
    agent.rx(e2.pack_pdu(e2.PROC_RIC_SUBSCRIPTION, e2.PDU_INITIATING,
                         e2.RicSubscription(report_period_ms=10,
                                            metrics=("cqi", "dl_mbps"))))
    for _ in range(25):
        agent.tick(1)
    decoded = [e2.unpack_pdu(p) for p in wire[1:]]
    inds = [m for proc2, _, m in decoded
            if proc2 == e2.PROC_RIC_INDICATION]
    assert len(inds) == 2
    assert inds[0].kpm_report == {"cqi": 15, "dl_mbps": 42}
    assert inds[1].sn > inds[0].sn
    # malformed E2AP is counted, not raised
    agent.rx(b"\xff\xff\x00\x01z")
    assert "malformed_e2ap" in agent.events


def test_sweep_checkpoint_resume(tmp_path):
    """SweepCheckpoint: atomic persist, resume skip, meta invalidation."""
    from srsran_4g_tpu.utils.checkpoint import SweepCheckpoint
    path = str(tmp_path / "sweep.ckpt.json")
    c1 = SweepCheckpoint(path, meta={"frames": 8})
    assert "a" not in c1
    c1.put("a", {"bler": 0.5})
    c1.put("b", {"bler": 0.25})
    # resume with same meta: rows restored
    c2 = SweepCheckpoint(path, meta={"frames": 8})
    assert "a" in c2 and c2.get("b") == {"bler": 0.25}
    # different meta (grid changed): discarded
    c3 = SweepCheckpoint(path, meta={"frames": 16})
    assert "a" not in c3
    c2.done()
    import os
    assert not os.path.exists(path)
