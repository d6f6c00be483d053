"""Three-OS-process system test: srsUE ↔ srsENB ↔ srsEPC.

The framework's counterpart of the reference's `test/run_lte.sh:82-160`
(3 processes over ZMQ RF + netns): real `srsue`/`srsenb`/`srsepc`
processes wired by
  * the native TCP IQ sample bridge (UE↔eNB air interface, incl. PRACH
    preambles in the UL stream; `rf_zmq_imp.c` model) — UE i rides
    ports (dl+2i, ul+2i), the eNB broadcasts DL and sums the UL streams,
  * S1AP over TCP with 3GPP-exact aligned-PER PDUs (eNB↔EPC; TCP stands
    in for SCTP on this image — see ARCHITECTURE §inventory),
  * GTP-U over UDP (S1-U user plane).

Pass criteria mirror run_lte.sh: every UE attaches, exactly one PRACH
per UE, zero unrecovered PDSCH/PUSCH KO, 0% DL/UL ping loss.  The
matrix widens the round-4 single point (6 PRB × 1 UE) with a 2-UE and a
25 PRB point (reference matrix `test/CMakeLists.txt:27-33`).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
PINGS = 2


def _spawn(mod: str, *args: str) -> subprocess.Popen:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.Popen(
        [sys.executable, "-m", mod, *args],
        cwd=ROOT, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def _result(proc: subprocess.Popen, timeout: float) -> dict:
    out, _ = proc.communicate(timeout=timeout)
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line (rc={proc.returncode}):\n{out}")


@pytest.mark.parametrize("n_ues,prb,ttis,base,tm,tdd,cc", [
    (1, 6, 480, 46200, 1, False, 1),   # the round-4 point
    (2, 6, 600, 46300, 1, False, 1),   # >=2 UEs through the processes
    (1, 25, 360, 46400, 1, False, 1),  # >=25 PRB over the transports
    (1, 6, 480, 46500, 4, False, 1),   # flagship TM4 2x2 over the bridge
    (1, 6, 600, 46600, 1, True, 1),    # frame structure type 2 (TDD cfg 1)
    (1, 6, 600, 46700, 1, False, 2),   # 2-CC CA: SCell on its own bridge
])
def test_three_process_attach_and_ping(n_ues, prb, ttis, base, tm, tdd, cc):
    tdd_args = ["--tdd"] if tdd else []
    # a post-ping DL burst exceeds the 6 PRB PCell's per-TTI capacity,
    # so part of it must drain on the SCell (run_lte.py CA criterion)
    epc_extra = ["--burst-bytes", "4000"] if cc == 2 else []
    n_extra = 1 if cc == 2 else 0      # the burst is one more DL packet
    s1ap_port, gtpu_port = base + 12, base + 52
    dl_port, ul_port = base + 1, base + 2

    epc = _spawn("srsran_4g_tpu.apps.srsepc",
                 "--s1ap-port", str(s1ap_port), "--gtpu-port", str(gtpu_port),
                 "--ues", str(n_ues), "--pings", str(PINGS),
                 "--timeout", "1500", *epc_extra)
    import time
    time.sleep(1.0)                       # EPC binds its listeners
    enb = _spawn("srsran_4g_tpu.apps.srsenb",
                 "--dl-port", str(dl_port), "--ul-port", str(ul_port),
                 "--s1ap-port", str(s1ap_port), "--gtpu-port", str(gtpu_port),
                 "--prb", str(prb), "--ttis", str(ttis),
                 "--ues", str(n_ues), "--tm", str(tm), "--cc", str(cc),
                 *tdd_args)
    ues = [_spawn("srsran_4g_tpu.apps.srsue",
                  "--dl-port", str(dl_port + 2 * i),
                  "--ul-port", str(ul_port + 2 * i),
                  "--prb", str(prb), "--ttis", str(ttis),
                  "--ue-idx", str(i), "--tm", str(tm), "--cc", str(cc),
                  *tdd_args)
           for i in range(n_ues)]
    try:
        ue_stats = [_result(u, timeout=1500) for u in ues]
        enb_stats = _result(enb, timeout=300)
        epc_stats = _result(epc, timeout=120)
    finally:
        for p in (*ues, enb, epc):
            if p.poll() is None:
                p.kill()

    # run_lte.sh criteria
    for st in ue_stats:
        assert st["registered"], st
        assert st["sync_state"] == "camped", st
        assert st["pdsch_ko"] == 0, st
        assert st["dl_ping_rx"] == PINGS + n_extra, st  # 0% DL loss
        # CQI at target once reported (criterion: all cqi=15 at 30 dB)
        assert all(c >= 13 for c in st["cqi"][1:]), st
    assert enb_stats["prach"] == n_ues, enb_stats
    assert enb_stats["pusch_ko"] == 0, enb_stats
    if tm == 4:
        # flagship-mode criterion (run_lte.py): rank-2 spatial
        # multiplexing actually crossed the process boundary
        assert enb_stats.get("pdsch_tx_rank2", 0) > 0, enb_stats
        assert any(st.get("pdsch_rank2", 0) > 0 for st in ue_stats), ue_stats
    if cc == 2:
        # CA criterion: part of the burst drained on the SCell
        assert enb_stats.get("scell_tx", 0) > 0, enb_stats
    assert epc_stats["ul_ping_rx"] >= PINGS * n_ues + n_extra, epc_stats
    assert epc_stats["attach"] == n_ues, epc_stats
