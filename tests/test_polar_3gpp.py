"""38.212-exact polar layer (ops/polar_3gpp.py).

Golden frozen-set vectors were produced by compiling the reference's
own `lib/src/phy/fec/polar/polar_code.c` standalone and dumping
srsran_polar_code_get's K_set for each (K, E) — our declarative
construction must match the reference bit-for-bit before any capture
can decode."""

import numpy as np
import pytest

from srsran_4g_tpu.ops import polar_3gpp as P3

# (K, E, nMax) -> reference K_set (srsran_polar_code_get dump)
GOLDEN_K_SETS = {
    # PDCCH L=1 (E=108), shortening regime
    (61, 108, 9): [
        15, 23, 27, 29, 30, 31, 39, 43, 44, 45, 46, 47, 50, 51, 52, 53, 54,
        55, 56, 57, 58, 59, 60, 61, 62, 63, 70, 71, 73, 74, 75, 76, 77, 78,
        79, 81, 82, 83, 84, 85, 86, 87, 88, 89, 90, 91, 92, 93, 94, 95, 97,
        98, 99, 100, 101, 102, 103, 104, 105, 106, 107],
    # PDCCH L=2 (E=216), puncturing regime (16K <= 7E)
    (41, 216, 9): [
        123, 125, 126, 127, 175, 183, 187, 189, 190, 191, 207, 215, 219,
        220, 221, 222, 223, 230, 231, 233, 234, 235, 236, 237, 238, 239,
        241, 242, 243, 244, 245, 246, 247, 248, 249, 250, 251, 252, 253,
        254, 255],
    (44, 108, 9): [
        47, 55, 58, 59, 60, 61, 62, 63, 79, 86, 87, 89, 90, 91, 92, 93, 94,
        95, 99, 101, 102, 103, 105, 106, 107, 108, 109, 110, 111, 113, 114,
        115, 116, 117, 118, 119, 120, 121, 122, 123, 124, 125, 126, 127],
    # PDCCH L=8 (E=864), repetition over N=512
    (61, 864, 9): [
        247, 251, 253, 254, 255, 367, 375, 379, 381, 382, 383, 415, 431,
        438, 439, 441, 442, 443, 444, 445, 446, 447, 462, 463, 467, 469,
        470, 471, 473, 474, 475, 476, 477, 478, 479, 483, 485, 486, 487,
        489, 490, 491, 492, 493, 494, 495, 497, 498, 499, 500, 501, 502,
        503, 504, 505, 506, 507, 508, 509, 510, 511],
}


@pytest.mark.parametrize("key", sorted(GOLDEN_K_SETS),
                         ids=[f"K{k}_E{e}" for k, e, _ in
                              sorted(GOLDEN_K_SETS)])
def test_frozen_sets_match_reference(key):
    k, e, n_max = key
    n, k_set, mask = P3.dci_sets(k, e, n_max)
    assert k_set.tolist() == GOLDEN_K_SETS[key]
    assert int((~mask).sum()) == k
    assert not mask[k_set].any()


@pytest.mark.parametrize("a,e", [(37, 108), (20, 216), (37, 300),
                                 (50, 864), (16, 108)])
def test_dci_chain_selfloop(a, e):
    """Encode→decode through CRC24C-with-ones + RNTI mask + I_IL +
    38.212 rate matching, across shorten/puncture/repetition regimes."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(a * 1000 + e)
    pl = jnp.asarray(rng.integers(0, 2, (3, a)).astype(np.int8))
    coded = P3.dci_encode(pl, e, 0x4601)
    llr = (2.0 * coded.astype(jnp.float32) - 1.0) * 8.0
    out = P3.dci_decode(llr, a, 0x4601)
    assert bool(jnp.all(out["crc_ok"]))
    assert bool(jnp.all(out["bits"] == pl))
    # wrong RNTI must not pass
    bad = P3.dci_decode(llr, a, 0x4602)
    assert not bool(jnp.any(bad["crc_ok"]))


def test_il_pattern_properties():
    for k in (37, 61, 140, 164):
        p = P3._il_perm(k)
        assert len(p) == k
        assert sorted(p.tolist()) == list(range(k))
