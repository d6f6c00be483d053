"""File-vector decode tests: IQ capture -> radio file device -> receivers.

Counterpart of the reference's `*_file_test` tier (pbch_file_test,
pdsch_pdcch_file_test etc., SURVEY §4): pre-generated IQ signals are
replayed through the file radio path and must decode cleanly.  Here the
"captures" are produced by this framework's own transmitters, written in
the reference-compatible cf32 format, and decoded from disk via the same
utils/io + runtime.radio path an external capture would take.
"""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import enb_dl, grid as G, pdsch, ue_dl
from srsran_4g_tpu.utils import io as iq_io


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    """One noisy 6-PRB subframe (PBCH + PDSCH) written as cf32."""
    cell = G.CellConfig(nof_prb=6, cell_id=42, cfi=1)
    cfg = pdsch.PdschConfig(cell=cell, rnti=0x46, subframe=0, mod="qpsk",
                            tbs=152)
    rng = np.random.default_rng(7)
    bits = jnp.asarray(rng.integers(0, 2, (1, cfg.tbs)).astype(np.int8))
    mib = jnp.asarray(rng.integers(0, 2, (1, 24)).astype(np.int8))
    grid_tx = enb_dl.assemble_subframe(cfg, bits, mib_bits=mib)
    samples = enb_dl.subframe_to_samples(cell, grid_tx)
    noisy = awgn(jax.random.PRNGKey(3), samples, snr_to_noise_var(20.0))
    path = str(tmp_path_factory.mktemp("vec") / "pdsch_6prb.cf32")
    iq_io.write_iq(path, np.asarray(noisy[0]))
    return path, cfg, np.asarray(bits), np.asarray(mib)


def test_iq_file_roundtrip_format(capture):
    path, cfg, bits, mib = capture
    x = iq_io.read_iq(path)
    assert x.dtype == np.complex64
    # cf32 interleaved float32 I/Q — byte length must be 8*N
    assert os.path.getsize(path) == 8 * len(x)


def test_file_source_chunked_reads(capture):
    path, cfg, bits, mib = capture
    src = iq_io.FileSource(path)
    whole = iq_io.read_iq(path)
    a = src.read(1000)
    b = src.read(len(whole) - 1000)
    assert len(a) == 1000
    np.testing.assert_array_equal(np.concatenate([a, b]), whole)
    # past-EOF reads zero-pad (reference filesource semantics)
    tail = src.read(16)
    assert np.all(tail == 0)


def test_decode_pdsch_from_file(capture):
    """The pdsch 'file test': decode the on-disk capture end to end."""
    path, cfg, bits, mib = capture
    samples = jnp.asarray(iq_io.read_iq(path))[None]
    from srsran_4g_tpu.ops.ofdm import OfdmConfig, demodulate

    grid_rx = demodulate(OfdmConfig(nof_prb=6), samples)
    out = pdsch.decode(cfg, grid_rx)
    assert bool(np.asarray(out["crc_ok"]).all())
    assert (np.asarray(out["bits"]) == bits).all()


def test_cell_search_from_file(capture):
    """The ue_cell_search file test: blind search on the capture."""
    path, cfg, bits, mib = capture
    samples = iq_io.read_iq(path)
    stream = jnp.asarray(np.concatenate([samples, samples]))[None]
    found = ue_dl.cell_search(stream, nof_prb=6)
    assert int(np.asarray(found["cell_id"])[0]) == 42


def test_mib_from_file(capture):
    """The pbch file test: MIB decode from the capture."""
    path, cfg, bits, mib = capture
    from srsran_4g_tpu.models import ue_sync

    samples = jnp.asarray(iq_io.read_iq(path))
    out = ue_sync.decode_mib(42, samples[None])
    assert bool(np.asarray(out["crc_ok"]).all())
    assert (np.asarray(out["mib"]) == mib).all()
