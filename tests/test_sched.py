"""MAC DL scheduler tests: randomized multi-TTI sim with invariant checks
(reference: srsenb/test/mac/sched_test_rand.cc pattern)."""

import numpy as np
import pytest

from srsran_4g_tpu.stack.sched import DlScheduler, MAX_RETX, N_HARQ


def check_invariants(sched, grants, nof_prb):
    used = []
    for g in grants:
        used.extend(g.prb_mask)
        assert 0 <= g.mcs <= 28
        assert g.tbs > 0
        assert 0 <= g.harq_pid < N_HARQ
    # no PRB double-booked, all within the bandwidth
    assert len(used) == len(set(used))
    assert all(0 <= p < nof_prb for p in used)


def run_sim(policy, n_tti=200, seed=0, nof_prb=25, n_ues=4, ack_prob=0.9):
    rng = np.random.default_rng(seed)
    s = DlScheduler(nof_prb, policy=policy)
    rntis = [0x46 + i for i in range(n_ues)]
    for r in rntis:
        s.ue_cfg(r)
    served = {r: 0 for r in rntis}
    inflight = []  # (tti_acked, rnti, pid, ack)
    for tti in range(n_tti):
        for r in rntis:
            if rng.random() < 0.5:
                s.dl_rlc_buffer_state(r, int(rng.integers(100, 5000)))
            if rng.random() < 0.2:
                s.dl_cqi_info(r, int(rng.integers(1, 16)))
        # deliver pending ACKs (4 TTIs later)
        for t, r, pid, ack in [x for x in inflight if x[0] == tti]:
            s.dl_ack_info(r, pid, ack)
        inflight = [x for x in inflight if x[0] != tti]
        grants = s.get_dl_sched(tti)
        check_invariants(s, grants, nof_prb)
        for g in grants:
            served[g.rnti] += g.tbs if not g.is_retx else 0
            inflight.append((tti + 4, g.rnti, g.harq_pid,
                             bool(rng.random() < ack_prob)))
    return s, served


@pytest.mark.parametrize("policy", ["rr", "pf"])
def test_randomized_sim(policy):
    s, served = run_sim(policy)
    # every UE with traffic got scheduled
    assert all(v > 0 for v in served.values())


def test_harq_retx_same_tbs():
    s = DlScheduler(25, policy="rr")
    s.ue_cfg(0x50)
    s.dl_rlc_buffer_state(0x50, 1000)
    g0 = s.get_dl_sched(0)
    assert len(g0) == 1 and not g0[0].is_retx and g0[0].rv == 0
    s.dl_ack_info(0x50, g0[0].harq_pid, False)  # NACK
    g1 = s.get_dl_sched(1)
    retx = [g for g in g1 if g.is_retx]
    assert len(retx) == 1
    assert retx[0].tbs == g0[0].tbs and retx[0].mcs == g0[0].mcs
    assert retx[0].rv == 2  # rv sequence 0,2,3,1
    assert retx[0].ndi == g0[0].ndi  # same data


def test_harq_gives_up_after_max_retx():
    s = DlScheduler(25, policy="rr")
    s.ue_cfg(0x50)
    s.dl_rlc_buffer_state(0x50, 100)
    g = s.get_dl_sched(0)[0]
    pid = g.harq_pid
    for i in range(MAX_RETX):
        s.dl_ack_info(0x50, pid, False)
        gs = s.get_dl_sched(i + 1)
    assert not s.ues[0x50].harq[pid].active  # dropped
    assert not s.ues[0x50].pending_retx


def test_pf_fairness_vs_rate():
    """PF must serve a low-CQI UE a non-trivial share; a pure max-rate
    scheduler would starve it."""
    rng = np.random.default_rng(1)
    s = DlScheduler(50, policy="pf", pf_fairness=0.1)
    s.ue_cfg(1)
    s.ue_cfg(2)
    s.dl_cqi_info(1, 15)
    s.dl_cqi_info(2, 4)
    count = {1: 0, 2: 0}
    for tti in range(300):
        s.dl_rlc_buffer_state(1, 100000)
        s.dl_rlc_buffer_state(2, 100000)
        for g in s.get_dl_sched(tti):
            if not g.is_retx:
                count[g.rnti] += 1
            s.dl_ack_info(g.rnti, g.harq_pid, True)
    assert count[2] > 0.15 * count[1], count


def test_ca_two_carriers_throughput_and_invariants():
    """2-CC CA: per-cc invariants hold; a CA UE out-delivers an identical
    single-carrier UE (sched.cc per-carrier carriers + scell activation)."""
    from srsran_4g_tpu.stack.sched import CaScheduler
    rng = np.random.default_rng(0)
    s = CaScheduler([25, 25], policy="pf")
    s.ue_cfg(0x46, scells=(1,))   # CA-capable
    s.ue_cfg(0x47)                # PCell only
    served = {0x46: 0, 0x47: 0}
    for tti in range(300):
        for rnti in served:
            s.dl_rlc_buffer_state(rnti, 200_000)
            s.dl_cqi_info(rnti, 12, cc_idx=0)
        s.dl_cqi_info(0x46, 12, cc_idx=1)
        per_cc = s.get_dl_sched(tti)
        assert len(per_cc) == 2
        for c, grants in enumerate(per_cc):
            check_invariants(s.cc[c], grants, 25)
            # PCell-only UE never scheduled on the SCell
            if c == 1:
                assert all(g.rnti != 0x47 for g in grants)
            for g in grants:
                if not g.is_retx:
                    served[g.rnti] += g.tbs
                s.dl_ack_info(g.rnti, g.harq_pid,
                              rng.random() > 0.1, cc_idx=c)
    assert served[0x46] > 1.5 * served[0x47]


def test_ca_scell_deactivation():
    from srsran_4g_tpu.stack.sched import CaScheduler
    s = CaScheduler([15, 15])
    s.ue_cfg(0x46, scells=(1,))
    s.dl_rlc_buffer_state(0x46, 100_000)
    s.dl_cqi_info(0x46, 10, cc_idx=0)
    s.dl_cqi_info(0x46, 10, cc_idx=1)
    assert any(g.rnti == 0x46 for g in s.get_dl_sched(0)[1])
    s.scell_activate(0x46, 1, on=False)
    s.dl_rlc_buffer_state(0x46, 100_000)
    assert s.get_dl_sched(1)[1] == []
