"""Config tree, IQ file IO, radio layer, logging, metrics tests."""

import os

import numpy as np
import pytest

from srsran_4g_tpu import config as cfg_mod
from srsran_4g_tpu.runtime.radio import Radio, RadioArgs
from srsran_4g_tpu.utils import io, log, metrics


def test_config_defaults_and_overrides(tmp_path):
    conf = tmp_path / "ue.conf"
    conf.write_text(
        """
[rf]
srate_hz = 23.04e6
device_name = file

[phy]
nof_phy_threads = 4
pdsch_max_its = 6

[rat.eutra]
dl_earfcn = 2850

[channel.dl.awgn]
enable = true
snr_db = 12
"""
    )
    c = cfg_mod.load_config(str(conf), overrides=["cell.nof_prb=50"])
    assert c.rf.srate_hz == 23.04e6
    assert c.rf.device_name == "file"
    assert c.phy.pdsch_max_its == 6
    assert c.rat_eutra.dl_earfcn == 2850
    assert c.channel.awgn_enable is True
    assert c.channel.awgn_snr_db == 12.0
    assert c.cell.nof_prb == 50
    d = cfg_mod.to_dict(c)
    assert d["phy"]["nof_phy_threads"] == 4


def test_shipped_example_configs_load_cleanly():
    """The shipped ue/enb.conf.example files (the reference's
    ue.conf.example / enb.conf.example counterparts) must parse with
    ZERO unknown-key warnings — every key maps onto the typed tree."""
    import warnings

    apps = os.path.join(os.path.dirname(cfg_mod.__file__), "apps")
    for name in ("ue.conf.example", "enb.conf.example"):
        path = os.path.join(apps, name)
        assert os.path.exists(path), path
        with warnings.catch_warnings():
            warnings.simplefilter("error")       # unknown keys -> failure
            c = cfg_mod.load_config(path)
        assert c.cell.nof_prb == 25
        assert c.rf.device_name == "file"
        assert c.phy.turbo_train == 32
        assert c.channel.awgn_enable is False
    # and CLI overrides compose on top, as the apps use them
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        c = cfg_mod.load_config(
            os.path.join(apps, "enb.conf.example"),
            overrides=["cell.tm=4", "cell.nof_ports=2"])
    assert (c.cell.tm, c.cell.nof_ports) == (4, 2)


def test_iq_file_roundtrip(tmp_path):
    path = str(tmp_path / "iq.dat")
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(
        np.complex64
    )
    io.write_iq(path, x)
    np.testing.assert_array_equal(io.read_iq(path), x)
    src = io.FileSource(path)
    a = src.read(600)
    b = src.read(600)  # past EOF → zero-padded
    np.testing.assert_array_equal(a, x[:600])
    np.testing.assert_array_equal(b[:400], x[600:])
    np.testing.assert_array_equal(b[400:], 0)


def test_radio_file_resample(tmp_path):
    path = str(tmp_path / "cap.dat")
    n_dev = 1024
    f = 0.01
    x = np.exp(2j * np.pi * f * np.arange(n_dev)).astype(np.complex64)
    io.write_iq(path, x)
    # device at 1.0, PHY at 2.0 → upsample by 2
    r = Radio(RadioArgs(device="file", rx_path=path, phy_srate_hz=2.0,
                        dev_srate_hz=1.0))
    y, ts = r.rx_now(2048)
    assert ts == 0.0
    assert y.shape[0] == 2048
    ref = np.exp(2j * np.pi * f / 2 * np.arange(2048))
    err = np.mean(np.abs(y[50:-50] / y[50] - ref[50:-50] / ref[50]) ** 2)
    assert err < 1e-3
    _, ts2 = r.rx_now(2048)
    assert ts2 == pytest.approx(1024.0)


def test_logger_and_trace(tmp_path, capsys):
    log.init(tracing=True)
    lg = log.fetch_logger("TEST", "info")
    lg.info("hello %d", 42)
    lg.debug("hidden")
    with log.trace_duration("evt", threshold_us=0.0):
        pass
    log._backend.flush()
    out = capsys.readouterr().out
    assert "hello 42" in out
    assert "hidden" not in out
    tr = str(tmp_path / "trace.json")
    log.dump_trace(tr)
    import json
    events = json.load(open(tr))["traceEvents"]
    assert any(e["name"] == "evt" for e in events)


def test_metrics_hub(tmp_path):
    hub = metrics.MetricsHub()
    state = {"n": 0}

    def src():
        state["n"] += 1
        return {"bler": 0.01, "n": state["n"]}

    hub.add_source("phy", src)
    rows = []
    hub.add_listener(lambda t, s: rows.append(s))
    csv_path = str(tmp_path / "m.csv")
    hub.add_listener(metrics.CsvListener(csv_path))
    hub.poll_once()
    hub.poll_once()
    assert rows[0]["phy"]["n"] == 1 and rows[1]["phy"]["n"] == 2
    assert "phy.bler" in open(csv_path).read()


def test_rr_conf_cell_list():
    """libconfig-subset rr.conf parsing (srsenb parser.cc)."""
    import tempfile, os
    from srsran_4g_tpu import config

    rr = '''
    // reference-style cell list with comments
    cell_list = (
      { cell_id = 0x01; pci = 1; dl_earfcn = 3350; tac = 0x0007;
        root_seq_idx = 204; },
      { cell_id = 0x02; pci = 2; dl_earfcn = 3400; }
    );
    '''
    with tempfile.NamedTemporaryFile("w", suffix=".conf",
                                     delete=False) as f:
        f.write(rr)
        p = f.name
    try:
        cells = config.load_rr_conf(p)
    finally:
        os.unlink(p)
    assert len(cells) == 2
    assert cells[0].tac == 7 and cells[0].root_seq_idx == 204
    assert cells[1].dl_earfcn == 3400 and cells[1].root_seq_idx == 128
