"""Sharded pipeline tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from srsran_4g_tpu.models import grid as G, pdsch
from srsran_4g_tpu.ops.ofdm import OfdmConfig, modulate, demodulate
from srsran_4g_tpu.parallel import mesh as mesh_mod, pipeline, stream


def test_mesh_shapes():
    m = mesh_mod.make_mesh(dp=4, sp=2)
    assert m.shape == {"dp": 4, "sp": 2}


def test_fir_filter_sharded_matches_dense():
    m = mesh_mod.make_mesh(dp=1, sp=8)
    rng = np.random.default_rng(0)
    n = 1024
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    taps = (rng.standard_normal(5) + 1j * rng.standard_normal(5)).astype(np.complex64)

    def f(x_loc):
        return stream.fir_filter_sharded(x_loc, jnp.asarray(taps), "sp")

    sharded = shard_map(f, mesh=m, in_specs=P(None, "sp"), out_specs=P(None, "sp"))
    got = np.asarray(jax.jit(sharded)(x[None, :]))[0]
    expect = np.convolve(x, taps)[:n]
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_ofdm_demod_sharded_matches_single():
    cfg = OfdmConfig(nof_prb=25)
    m = mesh_mod.make_mesh(dp=1, sp=8)
    rng = np.random.default_rng(1)
    grid = (
        rng.standard_normal((2, cfg.nsymb_sf, cfg.nre))
        + 1j * rng.standard_normal((2, cfg.nsymb_sf, cfg.nre))
    ).astype(np.complex64)
    samples = np.asarray(modulate(cfg, grid))
    expect = np.asarray(demodulate(cfg, samples))

    def f(s_loc):
        return stream.ofdm_demodulate_sharded(cfg, s_loc, "sp")

    sharded = shard_map(f, mesh=m, in_specs=P(None, "sp"), out_specs=P())
    got = np.asarray(jax.jit(sharded)(samples))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_full_pipeline_step_8dev():
    cell = G.CellConfig(nof_prb=15, cell_id=7, cfi=1)
    cfg = pdsch.PdschConfig(
        cell=cell, rnti=0x46, subframe=4, mod="qpsk", tbs=1000
    )
    m = mesh_mod.make_mesh(dp=4, sp=2)
    step = pipeline.make_pipeline_step(cfg, m, snr_db=20.0, n_iter=4)
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=(8, cfg.tbs)).astype(np.int8)
    out = step(pipeline.shard_batch(m, bits), jax.random.PRNGKey(0))
    assert float(out["blocks"]) == 8.0
    assert float(out["bler"]) == 0.0, f"BLER {float(out['bler'])}"
