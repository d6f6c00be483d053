"""Radio layer: device abstraction + rate conversion.

Counterpart of the reference's `lib/src/radio/radio.cc` (carrier/port→
device-channel mapping, FFT resampling between PHY rate and device rate,
timestamp bookkeeping) over the `rf_dev_t` plugin vtable
(lib/src/phy/rf/rf_dev.h) with its {zmq, file, null, ...} device table.

Devices here: "null" (zeros), "file" (record/replay, filesource-compatible)
and "bridge" (the native TCP IQ bridge — the ZMQ-virtual-radio equivalent
that lets a UE process and an eNB process run against each other with no
hardware, sample-count as the clock).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from srsran_4g_tpu.ops.resampling import resample_fft
from srsran_4g_tpu.utils.io import FileSink, FileSource


class RadioError(enum.Enum):
    """RF device error kinds (rf.h:63-73 srsran_rf_error_t)."""

    LATE = "late"
    UNDERFLOW = "underflow"
    OVERFLOW = "overflow"
    RX = "rx"


@dataclass
class RadioArgs:
    device: str = "null"  # null | file | bridge
    rx_path: str = ""  # file path or host:port
    tx_path: str = ""
    phy_srate_hz: float = 11.52e6
    dev_srate_hz: float = 11.52e6


class Radio:
    """rx_now/tx with PHY↔device rate conversion (radio.cc:290,420).

    `error_handler` is the RF error callback of the reference's plugin
    contract (rf.h:194 srsran_rf_register_error_handler): the PHY sync
    layer registers it and reacts to OVERFLOW/UNDERFLOW/LATE by forcing
    a resync (srsue/src/phy/sync.cc radio_error)."""

    def __init__(self, args: RadioArgs):
        self.args = args
        self._rx_count = 0
        self._rx_dev = None
        self._tx_dev = None
        self.error_handler: Optional[Callable[[RadioError], None]] = None
        self.error_counts: dict[RadioError, int] = {e: 0 for e in RadioError}
        self._pending_drop = 0
        if args.device == "file":
            if args.rx_path:
                self._rx_dev = FileSource(args.rx_path)
            if args.tx_path:
                self._tx_dev = FileSink(args.tx_path)
        elif args.device == "bridge":
            from srsran_4g_tpu.runtime.native import IqBridgeRx, IqBridgeTx

            if args.tx_path:
                port = int(args.tx_path.rsplit(":", 1)[1])
                self._tx_dev = IqBridgeTx(port)
            if args.rx_path:
                host, port = args.rx_path.rsplit(":", 1)
                self._rx_dev = IqBridgeRx(host, int(port))
        elif args.device != "null":
            raise ValueError(f"unknown radio device {args.device}")

    @property
    def _ratio(self) -> tuple[int, int]:
        from math import gcd

        up = int(self.args.phy_srate_hz)
        down = int(self.args.dev_srate_hz)
        g = gcd(up, down)
        return up // g, down // g

    def _fire(self, err: RadioError) -> None:
        self.error_counts[err] += 1
        if self.error_handler is not None:
            self.error_handler(err)

    def inject_drop(self, nof_dev_samples: int) -> None:
        """Fault injection: the device drops samples before the next read
        (an RX-ring overflow — the 'O' the reference prints)."""
        self._pending_drop += nof_dev_samples

    def rx_now(self, nof_samples_phy: int) -> tuple[np.ndarray, float]:
        """Receive exactly nof_samples at the PHY rate; returns (samples,
        timestamp in seconds of the first sample)."""
        up, down = self._ratio
        n_dev = nof_samples_phy * down // up
        ts = self._rx_count / self.args.phy_srate_hz
        if self._rx_dev is None:
            dev = np.zeros(n_dev, np.complex64)
        else:
            if self._pending_drop > 0 and hasattr(self._rx_dev, "read"):
                # stream discontinuity: consume-and-discard, then report
                self._rx_dev.read(self._pending_drop)
                self._pending_drop = 0
                self._fire(RadioError.OVERFLOW)
            dev = self._rx_dev.read(n_dev)
            short = getattr(self._rx_dev, "last_read_short", 0)
            if short > 0:
                # device could not deliver a full buffer (stalled stream)
                self._fire(RadioError.UNDERFLOW)
        self._rx_count += nof_samples_phy
        if up == down:
            return dev, ts
        return np.asarray(resample_fft(dev, up, down)), ts

    def tx(self, samples_phy: np.ndarray) -> None:
        up, down = self._ratio
        if up == down:
            dev = np.asarray(samples_phy, np.complex64)
        else:
            dev = np.asarray(resample_fft(samples_phy, down, up))
        if self._tx_dev is not None:
            if hasattr(self._tx_dev, "send"):
                self._tx_dev.send(dev)
            else:
                self._tx_dev.write(dev)

    def close(self) -> None:
        for d in (self._rx_dev, self._tx_dev):
            if d is not None and hasattr(d, "close"):
                d.close()
