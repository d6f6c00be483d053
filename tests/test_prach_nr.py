"""NR PRACH: FR1 occasion tables + long-preamble detection in NR mode.

Mirrors the reference's `prach.c` NR path (`is_nr`,
`srsran_prach_nr_tti_opportunity_fr1_{paired,unpaired}`, prach.c:308-430,
tables prach_tables.h:450-482).
"""

import numpy as np
import pytest

from srsran_4g_tpu.models import prach


def test_nr_paired_table_shape():
    assert len(prach.PRACH_NR_FR1_PAIRED) == 28
    assert len(prach.PRACH_NR_FR1_UNPAIRED) == 28
    assert all(c.preamble_format == 0 for c in prach.PRACH_NR_FR1_PAIRED)


def test_nr_paired_opportunity():
    # cfg 0: x=16, y=1, sf={1}: occasion only in SFN % 16 == 1, subframe 1
    assert prach.prach_nr_tti_opportunity(0, 1 * 10 + 1, paired=True)
    assert not prach.prach_nr_tti_opportunity(0, 1 * 10 + 2, paired=True)
    assert not prach.prach_nr_tti_opportunity(0, 2 * 10 + 1, paired=True)
    assert prach.prach_nr_tti_opportunity(0, 17 * 10 + 1, paired=True)
    # cfg 27: every subframe of every frame
    for tti in range(0, 40):
        assert prach.prach_nr_tti_opportunity(27, tti, paired=True)
    # cfg 26: odd subframes only
    assert prach.prach_nr_tti_opportunity(26, 3, paired=True)
    assert not prach.prach_nr_tti_opportunity(26, 4, paired=True)


def test_nr_unpaired_opportunity_and_symbol():
    # cfg 0: x=16 y=1 sf={9}
    assert prach.prach_nr_tti_opportunity(0, 19, paired=False)
    assert not prach.prach_nr_tti_opportunity(0, 9, paired=False)
    # cfg 16 = {1,6} with starting symbol 7
    assert prach.prach_nr_start_symbol(16, paired=False) == 7
    assert prach.prach_nr_start_symbol(0, paired=False) == 0
    assert prach.prach_nr_start_symbol(0, paired=True) == 0
    with pytest.raises(ValueError):
        prach.prach_nr_cfg(28, paired=True)


def test_nr_preamble_detect_roundtrip():
    """NR mode format-0 preamble through the shared ZC engine."""
    cfg = prach.PrachConfig(symbol_sz=512, root_seq_index=22, is_nr=True)
    rng = np.random.default_rng(7)
    for pid in (0, 17):
        tx = np.asarray(prach.generate(cfg, pid))
        # SNR scaled to the per-sample signal power (the preamble occupies
        # only 839 of the 6144 bins, so its time-domain power is low)
        sig_p = float(np.mean(np.abs(tx) ** 2))
        noise = (rng.normal(size=tx.shape) + 1j * rng.normal(size=tx.shape))
        rx = (tx + np.sqrt(sig_p / 20.0 / 2.0) * noise).astype(np.complex64)
        out = prach.detect(cfg, rx[None], threshold=0.1)
        det = np.asarray(out["detected"][0])
        assert det[pid]
        assert int(np.argmax(np.asarray(out["power"][0]))) == pid
