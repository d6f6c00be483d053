"""C++ host runtime tests: ring buffer, IQ bridge, pcap writer."""

import os
import struct
import threading

import numpy as np
import pytest

from srsran_4g_tpu.runtime import native


def test_ring_buffer():
    rb = native.RingBuffer(1000)
    x = (np.arange(10) + 1j * np.arange(10)).astype(np.complex64)
    assert rb.write(x) == 10
    assert rb.size == 10
    out = rb.read(6)
    np.testing.assert_array_equal(out, x[:6])
    out2 = rb.read(10)  # only 4 left
    np.testing.assert_array_equal(out2, x[6:])
    # wrap-around
    big = np.ones(900, np.complex64)
    assert rb.write(big) == 900
    assert rb.write(big) == 100  # full at 1000
    assert rb.read(1000).size == 1000


def test_iq_bridge_loopback():
    port = 44321
    tx = native.IqBridgeTx(port)
    rng = np.random.default_rng(0)
    data = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
        np.complex64
    )

    received = {}

    def rx_side():
        rx = native.IqBridgeRx("127.0.0.1", port)
        # read in odd chunk sizes to exercise re-buffering
        parts = [rx.read(1000), rx.read(3000), rx.read(96)]
        received["data"] = np.concatenate(parts)
        received["count"] = rx.sample_count
        rx.close()

    t = threading.Thread(target=rx_side)
    t.start()
    tx.accept()
    tx.send(data[:2048])
    tx.send(data[2048:])
    t.join(timeout=10)
    tx.close()
    np.testing.assert_array_equal(received["data"], data)
    assert received["count"] == 4096


def test_pcap_writer(tmp_path):
    path = str(tmp_path / "test.pcap")
    w = native.PcapWriter(path)
    pkts = [bytes([i] * (10 + i)) for i in range(5)]
    for p in pkts:
        assert w.write(p)
    w.close()
    raw = open(path, "rb").read()
    magic, vmaj, vmin = struct.unpack("<IHH", raw[:8])
    assert magic == 0xA1B2C3D4 and (vmaj, vmin) == (2, 4)
    pos = 24
    for p in pkts:
        sec, usec, caplen, length = struct.unpack("<IIII", raw[pos:pos + 16])
        assert caplen == len(p) == length
        assert raw[pos + 16:pos + 16 + caplen] == p
        pos += 16 + caplen
    assert pos == len(raw)


def test_tsan_ring_race_free():
    """ThreadSanitizer gate for the native SPSC ring (the reference's
    ENABLE_TSAN CI equivalent, CMakeLists.txt:85-88): a producer and a
    consumer thread stream 2M samples through the ring under TSAN; any
    data race aborts the binary, and the sequence-numbered stream must
    arrive intact."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    native = os.path.join(os.path.dirname(__file__), "..", "native")
    r = subprocess.run(["make", "-C", native, "tsan"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    assert "stream intact" in r.stdout
    assert "WARNING: ThreadSanitizer" not in r.stderr
