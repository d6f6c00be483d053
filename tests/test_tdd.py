"""LTE TDD tests: UL/DL config tables, HARQ-ACK association/bundling,
frame-type detection (reference: phy_common.c TDD helpers, harq_ack.c,
sync.c frame-type detection)."""

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.models import enb_dl, grid as G, sync, tdd
from srsran_4g_tpu.ops.ofdm import OfdmConfig, modulate

CELL = G.CellConfig(nof_prb=6, cell_id=151, cfi=1)


def test_ul_dl_config_tables():
    # every config: sf0 DL, sf1 special, sf2 UL (spec invariants)
    for c in range(7):
        assert tdd.sf_type(c, 0) == "D"
        assert tdd.sf_type(c, 1) == "S"
        assert tdd.sf_type(c, 2) == "U"
    # config 5 has a single UL subframe per frame
    assert sum(1 for s in range(10) if tdd.sf_type(5, s) == "U") == 1
    # 10 subframes each
    assert all(len(s) == 10 for s in tdd.UL_DL_CONFIGS)


def test_dl_symbol_mask():
    m = tdd.dl_symbol_mask(1, 4, 0)
    assert m.all()
    m = tdd.dl_symbol_mask(1, 4, 2)
    assert not m.any()
    m = tdd.dl_symbol_mask(1, 0, 1)   # ssf config 0: DwPTS = 3 symbols
    assert m[:3].all() and not m[3:].any()
    m = tdd.dl_symbol_mask(1, 4, 1)   # ssf config 4: DwPTS = 12 symbols
    assert m[:12].all() and not m[12:].any()


def test_association_sets_cover_all_dl():
    """Every DL/special subframe must have an ACK reporting UL subframe,
    and that subframe must actually be UL (Table 10.1.3.1-1 coherence)."""
    for c in range(7):
        for n_ul, ks in tdd.DL_ASSOC_SETS[c].items():
            assert tdd.sf_type(c, n_ul) == "U"
            for k in ks:
                assert tdd.sf_type(c, (n_ul - k) % 10) in ("D", "S")
        for sf in range(10):
            if tdd.sf_type(c, sf) in ("D", "S"):
                n = tdd.ack_subframe_for_dl(c, sf)
                assert tdd.sf_type(c, n) == "U"


def test_ul_grant_k_targets_ul_subframes():
    for c in range(7):
        for n_dl, k in tdd.UL_GRANT_K[c].items():
            assert tdd.sf_type(c, n_dl) in ("D", "S")
            assert tdd.sf_type(c, (n_dl + k) % 10) == "U"


def test_bundle_and_multiplex():
    acks = jnp.asarray([[1, 1, 1, 0], [1, 0, 1, 1], [1, 1, 1, 1]], jnp.int8)
    valid = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0], [0, 0, 0, 0]], jnp.int8)
    b = np.asarray(tdd.bundle_acks(acks, valid))
    # row0: all valid ACKs are 1 → ACK; row1: one NACK → 0; row2: nothing → 0
    np.testing.assert_array_equal(b, [1, 0, 0])
    m = np.asarray(tdd.multiplex_acks(acks, valid, 4))
    np.testing.assert_array_equal(m, [[1, 1, 1, 0], [1, 0, 0, 0], [0, 0, 0, 0]])


def _half_frame(frame_type: str) -> np.ndarray:
    cfg = OfdmConfig(nof_prb=CELL.nof_prb)
    grids = []
    for sf in range(3):
        g = jnp.zeros((1, CELL.nsymb, CELL.nre), jnp.complex64)
        if frame_type == "fdd":
            g = enb_dl.put_sync_signals(CELL, g, sf)
        else:
            g = tdd_put(g, sf)
        grids.append(modulate(cfg, g))
    return np.concatenate([np.asarray(x) for x in grids], axis=-1)




def tdd_put(g, sf):
    return enb_dl.put_sync_signals_tdd(CELL, g, sf)


def test_frame_type_detection():
    cfg = OfdmConfig(nof_prb=CELL.nof_prb)
    for ft_true, ft_idx in (("fdd", 0), ("tdd", 1)):
        samples = jnp.asarray(_half_frame(ft_true))
        found = sync.find_pss(samples, cfg.symbol_sz)
        res = tdd.detect_frame_type(samples, found["offset"],
                                    found["n_id_2"], cfg)
        assert int(np.asarray(found["n_id_2"])[0]) == CELL.cell_id % 3
        assert int(np.asarray(res.frame_type)[0]) == ft_idx, ft_true
        assert int(np.asarray(res.n_id_1)[0]) == CELL.cell_id // 3
        assert int(np.asarray(res.phase)[0]) == 0
        # PSS found where the frame type says it should be
        p = int(np.asarray(found["offset"])[0])
        assert p == tdd.pss_to_sf_start(cfg, ft_true)
