"""MIMO layer map / precoding / 2x2 MMSE / PMI tests (reference: precoding_test)."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_4g_tpu.models import mimo


def rand_c(rng, shape):
    return ((rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
            / np.sqrt(2)).astype(np.complex64)


def test_layer_map_roundtrip():
    rng = np.random.default_rng(0)
    d = rand_c(rng, (3, 64))
    layers = mimo.layer_map([jnp.asarray(d)], 2)
    assert layers.shape == (3, 2, 32)
    out = mimo.layer_demap(layers, 1)[0]
    np.testing.assert_allclose(np.asarray(out), d)
    # two codewords
    d2 = rand_c(rng, (3, 64))
    layers = mimo.layer_map([jnp.asarray(d), jnp.asarray(d2)], 2)
    o1, o2 = mimo.layer_demap(layers, 2)
    np.testing.assert_allclose(np.asarray(o1), d)
    np.testing.assert_allclose(np.asarray(o2), d2)


@pytest.mark.parametrize("pmi", [0, 1, 2])
def test_mmse_2x2_recovers_layers(pmi):
    rng = np.random.default_rng(pmi)
    s = 256
    x = rand_c(rng, (2, 2, s))  # (batch, layers, S)
    h_phys = rand_c(rng, (2, 2, 2, 1)) * np.sqrt(2)  # (batch, rx, tx, 1)
    w = np.asarray(mimo._CODEBOOK_2TX_R2[pmi])
    tx = np.einsum("ij,bjs->bis", w, x)
    nv = 1e-4
    y = np.einsum("brti,bts->brs", h_phys[..., None][..., 0], tx) if False else \
        np.einsum("brt,bts->brs", h_phys[..., 0], tx)
    y = y + rand_c(rng, y.shape) * np.sqrt(nv / 2)
    # effective per-layer channel = H_phys @ W
    h_eff = np.einsum("brt,tl->brl", h_phys[..., 0], w)[..., None] * np.ones((1, 1, 1, s))
    xh, env = mimo.mmse_detect_2x2(jnp.asarray(y), jnp.asarray(h_eff.astype(np.complex64)), nv)
    err = np.mean(np.abs(np.asarray(xh) - x) ** 2)
    assert err < 1e-2, err


def test_cdd_power_split():
    # W = I/sqrt(2) splits layer power across the 2 ports: per-element
    # power halves, total radiated power is preserved.
    rng = np.random.default_rng(3)
    x = rand_c(rng, (2, 2, 128))
    y = np.asarray(mimo.cdd_precode_2x2(jnp.asarray(x)))
    np.testing.assert_allclose(
        np.mean(np.abs(y) ** 2), 0.5 * np.mean(np.abs(x) ** 2), rtol=1e-5)


def test_pmi_select_picks_best():
    """PMI must pick the codebook vector aligned with the channel."""
    rng = np.random.default_rng(4)
    s = 64
    for target in range(4):
        w = np.asarray(mimo._CODEBOOK_2TX_R1[target])
        # rank-1 channel aligned with w: h = g · w^H  (h·w = g·|w|² max)
        g = rand_c(rng, (1, 2, 1, s)) * 2
        h = g * np.conj(w)[None, None, :, None]
        pmi, m = mimo.pmi_select_2tx(jnp.asarray(h.astype(np.complex64)), 0.1)
        assert int(np.asarray(pmi)[0]) == target
