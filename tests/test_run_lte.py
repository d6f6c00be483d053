"""System E2E test over the real PHY (counterpart of test/run_lte.sh).

Runs the full network — PRACH detect, RAR + msg3, contention resolution,
RRC attach with AKA + SMC, DRB setup, ciphered ping train — where every
grant travels over the air: eNB MAC scheduler → DCI on PDCCH → UE blind
decode → PDSCH/PUSCH, HARQ-ACK + SR + CQI on PUCCH (the reference's
mac.cc:639 → cc_worker.cc:259-301 contract).  Pass criteria mirror
run_lte.sh:82-160: attach OK, exactly 1 PRACH per UE, 0 unrecovered PHY
KO, 0% ping loss, CQI at target.

The PRB matrix mirrors the reference's test/CMakeLists.txt:27-33
(6/15/25/50/75/100 PRB).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _run(prb: int, ues: int, ttis: int, pings: int = 2):
    import run_lte

    ok, stats, ue_nodes, mme = run_lte.run(
        n_ttis=ttis, n_pings=pings, snr_db=30.0, nof_prb=prb, n_ues=ues)
    assert all(u.nas.is_registered() for u in ue_nodes), stats
    assert stats["prach"] == ues
    assert stats["pdsch_ko"] == 0 and stats["pusch_ko"] == 0, stats
    assert stats["dl_ping_rx"] == pings * ues, stats
    assert stats["ul_ping_rx"] >= pings * ues, stats
    # every grant travelled via PDCCH
    assert stats["dci_tx"] >= stats["pdsch_tx"], stats
    # reference criterion: CQI at target after the first report
    for u in ue_nodes:
        assert all(c >= 13 for c in u.cqi_sent[1:]), u.cqi_sent
        # SI was acquired over BCCH before the attach (connect() is gated)
        assert u.rrc.idle.si_acquired(), u.rrc.idle.events
    assert ok
    return stats, ue_nodes


def test_two_ue_attach_and_ping_6prb():
    """Main case: 2 UEs, full OTA control loop, 6 PRB."""
    stats, ues = _run(prb=6, ues=2, ttis=280)
    # distinct C-RNTIs allocated at RACH
    assert len({u.crnti for u in ues}) == 2


@pytest.mark.parametrize("prb", [15, 50, 100])
def test_prb_matrix_single_ue(prb):
    _run(prb=prb, ues=1, ttis=200)


def test_carrier_aggregation_two_cc():
    """2-CC CA over the air: SCell activation CE after a good CQI
    report, SCell grants via its own PDCCH, HARQ-ACK for both carriers
    on the PCell PUCCH, a DL burst exceeding the PCell's per-TTI
    capacity split across the carriers (test/CMakeLists.txt 2-CC rows;
    CaScheduler shared-buffer semantics)."""
    import run_lte

    ok, stats, ues, mme = run_lte.run(
        n_ttis=280, n_pings=2, snr_db=30.0, nof_prb=6, n_ues=1,
        n_cc=2, burst_bytes=1400)
    assert ok, stats
    assert stats["scell_tx"] > 0, stats          # SCell carried data
    assert stats["pdsch_ko"] == 0, stats
    assert 1 in ues[0].mac.demux.active_scells   # activation CE received
