"""Three-OS-process system test: srsUE ↔ srsENB ↔ srsEPC.

The framework's counterpart of the reference's `test/run_lte.sh:82-160`
(3 processes over ZMQ RF + netns): real `srsue`/`srsenb`/`srsepc`
processes wired by
  * the native TCP IQ sample bridge (UE↔eNB air interface, incl. PRACH
    preambles in the UL stream; `rf_zmq_imp.c` model),
  * S1AP over TCP with 3GPP-exact aligned-PER PDUs (eNB↔EPC),
  * GTP-U over UDP (S1-U user plane).

Pass criteria mirror run_lte.sh: attach OK, exactly 1 PRACH detected,
zero unrecovered PDSCH/PUSCH KO, 0% DL/UL ping loss.
"""

import json
import os
import subprocess
import sys

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


def test_three_process_attach_and_ping():
    s1ap_port, gtpu_port = 46412, 46152
    dl_port, ul_port = 46201, 46202
    ttis = 480

    epc = _spawn("srsran_4g_tpu.apps.srsepc",
                 "--s1ap-port", str(s1ap_port), "--gtpu-port", str(gtpu_port),
                 "--ues", "1", "--pings", str(PINGS), "--timeout", "1500")
    import time
    time.sleep(1.0)                       # EPC binds its listeners
    enb = _spawn("srsran_4g_tpu.apps.srsenb",
                 "--dl-port", str(dl_port), "--ul-port", str(ul_port),
                 "--s1ap-port", str(s1ap_port), "--gtpu-port", str(gtpu_port),
                 "--prb", "6", "--ttis", str(ttis))
    ue = _spawn("srsran_4g_tpu.apps.srsue",
                "--dl-port", str(dl_port), "--ul-port", str(ul_port),
                "--prb", "6", "--ttis", str(ttis))
    try:
        ue_stats = _result(ue, timeout=1500)
        enb_stats = _result(enb, timeout=120)
        epc_stats = _result(epc, timeout=120)
    finally:
        for p in (ue, enb, epc):
            if p.poll() is None:
                p.kill()

    # run_lte.sh criteria
    assert ue_stats["registered"], ue_stats
    assert ue_stats["sync_state"] == "camped", ue_stats
    assert enb_stats["prach"] == 1, enb_stats
    assert ue_stats["pdsch_ko"] == 0, ue_stats
    assert enb_stats["pusch_ko"] == 0, enb_stats
    assert ue_stats["dl_ping_rx"] == PINGS, ue_stats     # 0% DL loss
    assert epc_stats["ul_ping_rx"] >= PINGS, epc_stats   # 0% UL loss
    assert epc_stats["attach"] == 1, epc_stats
    # CQI at target once reported (criterion: all cqi=15 at 30 dB)
    assert all(c >= 13 for c in ue_stats["cqi"][1:]), ue_stats
