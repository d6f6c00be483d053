"""Two-process eNB→UE PHY loopback over the native TCP IQ bridge
(the reference's ZMQ E2E test pattern, test/run_lte.sh)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_phy_loopback():
    port = 45113
    n_sf = 6
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    enb = subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "tools", "phy_e2e.py"), "enb",
         "--port", str(port), "--subframes", str(n_sf)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        ue = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "phy_e2e.py"), "ue",
             "--port", str(port), "--subframes", str(n_sf)],
            env=env, capture_output=True, text=True, timeout=300,
        )
        enb_out, _ = enb.communicate(timeout=60)
        assert ue.returncode == 0, f"UE: {ue.stdout}\n{ue.stderr}\nENB: {enb_out}"
        assert f"{n_sf}/{n_sf} subframes CRC-OK" in ue.stdout
        assert "payload match=True" in ue.stdout
    finally:
        if enb.poll() is None:
            enb.kill()
