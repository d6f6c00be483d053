"""System E2E test over the real PHY (counterpart of test/run_lte.sh).

Runs the full network — PRACH detect, RRC attach with AKA + SMC, DRB
setup, ciphered ping train — through the jitted PDSCH/PUSCH/PRACH
chains at 15 PRB on CPU, and asserts the reference's pass criteria:
attach OK, exactly 1 PRACH, 0 PHY KO, 0% ping loss.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_full_system_attach_and_ping():
    import run_lte

    ok, stats, nas, mme = run_lte.run(n_ttis=120, n_pings=3, snr_db=20.0)
    assert nas.is_registered()
    assert stats["prach"] == 1
    assert stats["pdsch_ko"] == 0 and stats["pusch_ko"] == 0
    assert stats["dl_ping_rx"] == 3 and stats["ul_ping_rx"] >= 3
    assert ok
