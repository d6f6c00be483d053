"""Radio error/recovery contract: RF error callbacks → PHY resync.

Counterpart of the reference's `rf.h:63-73` error-handler registration
and `srsue/src/phy/sync.cc` radio_error path: a mid-stream sample drop
(RX-ring overflow) fires the OVERFLOW callback, the sync layer drops to
FIND and reacquires cell timing on the shifted stream; reading past the
end of a file stream fires UNDERFLOW.
"""

import os
import tempfile

import numpy as np
import pytest


@pytest.fixture(scope="module")
def stream_file():
    """A cf32 capture of 40 subframes with PSS/SSS (6 PRB, cell 1)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from srsran_4g_tpu.models import enb_dl, grid as G
    from srsran_4g_tpu.ops.ofdm import OfdmConfig, modulate
    from srsran_4g_tpu.utils.io import write_iq

    cell = G.CellConfig(nof_prb=6, cell_id=1, cfi=1)
    cfg = OfdmConfig(nof_prb=6)
    sfs = []
    for sf in range(10):
        g = jnp.zeros((1, cell.nsymb, cell.nre), jnp.complex64)
        g = enb_dl.put_sync_signals(cell, g, sf)
        sfs.append(np.asarray(modulate(cfg, g))[0])
    frame = np.concatenate(sfs)
    stream = np.tile(frame, 4).astype(np.complex64)
    # small noise floor so PSS correlation is realistic
    rng = np.random.default_rng(0)
    stream += (0.01 * (rng.standard_normal(stream.size)
                       + 1j * rng.standard_normal(stream.size))
               ).astype(np.complex64)
    path = os.path.join(tempfile.mkdtemp(), "stream.cf32")
    write_iq(path, stream)
    return path, cfg.sf_len


def test_overflow_fires_callback_and_sync_reacquires(stream_file):
    import jax.numpy as jnp

    from srsran_4g_tpu.models.ue_sync import UeSync
    from srsran_4g_tpu.runtime.radio import Radio, RadioArgs, RadioError

    path, sf_len = stream_file
    srate = sf_len * 1000.0
    radio = Radio(RadioArgs(device="file", rx_path=path,
                            phy_srate_hz=srate, dev_srate_hz=srate))
    us = UeSync(nof_prb=6)
    errors = []

    def on_error(err: RadioError) -> None:
        errors.append(err)
        us.radio_error()          # sync.cc radio_error → resync

    radio.error_handler = on_error

    # acquire
    samples, _ = radio.rx_now(2 * sf_len)
    out = us.zerocopy(jnp.asarray(samples))
    assert out["in_sync"] and out["cell_id"] == 1

    # track a few subframes
    for _ in range(6):
        samples, _ = radio.rx_now(sf_len)
        us.zerocopy(jnp.asarray(samples))
    assert us.s.state == "TRACK"

    # fault injection: the device drops a non-multiple-of-sf_len chunk
    radio.inject_drop(sf_len // 3)
    samples, _ = radio.rx_now(sf_len)
    assert errors == [RadioError.OVERFLOW]
    assert us.s.state == "FIND"   # immediate resync, no counter wait

    # reacquisition on the shifted stream within a few subframes
    reacquired = False
    for _ in range(6):
        samples, _ = radio.rx_now(2 * sf_len)
        out = us.zerocopy(jnp.asarray(samples))
        if out["in_sync"]:
            reacquired = True
            break
    assert reacquired and us.s.state == "TRACK"
    assert int(np.asarray(out["cell_id"])) == 1
    assert radio.error_counts[RadioError.OVERFLOW] == 1


def test_stream_end_fires_underflow(stream_file):
    from srsran_4g_tpu.runtime.radio import Radio, RadioArgs, RadioError

    path, sf_len = stream_file
    srate = sf_len * 1000.0
    radio = Radio(RadioArgs(device="file", rx_path=path,
                            phy_srate_hz=srate, dev_srate_hz=srate))
    errors = []
    radio.error_handler = errors.append
    # read the whole 40-subframe stream, then past its end
    for _ in range(40):
        radio.rx_now(sf_len)
    assert not errors
    radio.rx_now(sf_len)
    assert errors == [RadioError.UNDERFLOW]
