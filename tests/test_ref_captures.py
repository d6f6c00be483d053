"""Reference-capture interop tier: decode the reference repo's committed
real-world IQ captures through the TPU receivers.

Counterpart of the reference's `*_file_test` binaries — same files, same
pass criteria:

- ``signal.1.92M.dat``      -> pbch_file_test (phch/test/CMakeLists.txt:453):
  MIB decoded, 2 TX ports, payload == the hard-coded bch_payload_file
  (pbch_file_test.c:63-64,232).
- ``signal.1.92M.amar.dat`` -> pdcch_file_test / pdsch_pdcch_file_test
  (CMakeLists.txt:461-462): SI-RNTI DCI 1A with RIV=11 (full 6 PRB),
  mcs_idx=2, rv=0, pid=0 (pdcch_file_test.c:264-268), and the SIB
  transport block CRC-OK (pdsch_pdcch_file_test.c:205).

These captures were produced by real eNB hardware/software (Amarisoft),
so a decode here proves spec interop, not just TX/RX self-consistency.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_4g_tpu.models import chest, dci as dci_mod, grid as G, pcfich, pdcch, pdsch, ra
from srsran_4g_tpu.ops import ofdm

REF = "/root/reference/lib/src/phy/phch/test"

SF_LEN_6PRB = 1920


def _subframe_grids(path: str, nof_prb: int = 6):
    x = np.fromfile(path, dtype=np.complex64)
    cfg = ofdm.OfdmConfig(nof_prb=nof_prb)
    sf_len = cfg.sf_len
    n_sf = len(x) // sf_len
    grids = []
    for sf in range(n_sf):
        s = jnp.asarray(x[sf * sf_len:(sf + 1) * sf_len])[None]
        grids.append(ofdm.demodulate(cfg, s))
    return grids


# ---------------------------------------------------------------- PBCH

class TestPbchFile:
    """pbch_file_test -i signal.1.92M.dat (cell 150, 6 PRB, 2 ports)."""

    @pytest.fixture(scope="class")
    def grid0(self):
        return _subframe_grids(f"{REF}/signal.1.92M.dat")[0]

    def test_mib_decodes_with_reference_payload(self, grid0):
        cell = G.CellConfig(nof_prb=6, cell_id=150, cfi=1, nof_ports=2)
        ch = chest.estimate(chest.ChestConfig(cell=cell), grid0, subframe=0,
                            port=0)
        from srsran_4g_tpu.models import pbch
        res = pbch.decode(cell, grid0, ch["h"], ch["noise_var"], frame_idx=0)
        assert bool(res["crc_ok"][0])
        # reference pbch_file_test.c:232: 2 ports, sfn_offset 0, payload:
        expect = np.array([0, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1,
                           1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])
        assert int(res["n_ports"][0]) == 2
        np.testing.assert_array_equal(np.asarray(res["mib"][0]), expect)


# ----------------------------------------------------- PDCCH (amar eNB)

AMAR_CELL = G.CellConfig(nof_prb=6, cell_id=1, cfi=3, nof_ports=1)


@pytest.fixture(scope="module")
def amar_grids():
    return _subframe_grids(f"{REF}/signal.1.92M.amar.dat")


@pytest.fixture(scope="module")
def amar_chests(amar_grids):
    return [
        chest.estimate(chest.ChestConfig(cell=AMAR_CELL), g, subframe=sf,
                       port=0)
        for sf, g in enumerate(amar_grids)
    ]


class TestAmarFile:
    def test_cfi_on_every_subframe(self, amar_grids, amar_chests):
        """PCFICH reads CFI=3 in all 10 subframes of the capture."""
        for sf, (g, ch) in enumerate(zip(amar_grids, amar_chests)):
            out = pcfich.decode(AMAR_CELL, g, ch["h"], ch["noise_var"],
                                subframe=sf)
            assert int(out["cfi"][0]) == 3, f"sf{sf}"

    def test_chest_snr_high_all_subframes(self, amar_chests):
        for sf, ch in enumerate(amar_chests):
            assert float(ch["snr_db"][0]) > 20.0, f"sf{sf}"

    def test_si_dci_sf5_matches_reference_criterion(self, amar_grids,
                                                    amar_chests):
        """pdcch_file_test.c:264-268: type2 localized, RIV=11, rv=0,
        pid=0, mcs_idx=2."""
        g, ch = amar_grids[5], amar_chests[5]
        out = pdcch.blind_decode(AMAR_CELL, 3, 5, g, ch["h"], ch["noise_var"],
                                 rnti=0xFFFF,
                                 dci_len=dci_mod.format1a_len(6))
        assert bool(out["found"][0])
        d = dci_mod.unpack_1a(np.asarray(out["dci"][0]), 6)
        assert ra.riv_encode(6, d.l_crbs, d.rb_start) == 11
        assert d.mcs == 2 and d.rv == 0 and d.harq_pid == 0
        assert not d.distributed

    @pytest.mark.parametrize("sf,mcs,rv", [(5, 2, 0), (2, 6, 3)])
    def test_sib_pdsch_crc_ok(self, amar_grids, sf, mcs, rv):
        """pdsch_pdcch_file_test: DCI-driven PDSCH decode, CRC OK.

        sf5 carries SIB1 (mcs 2, rv 0), sf2 another SI message
        (mcs 6, rv 3); both DCIs have TPC=1 -> N_prb^1A = 3
        (36.212 §5.3.3.1.3, ra_dl.c).
        """
        tbs = ra.tbs_from_itbs(mcs, 3)
        pc = pdsch.PdschConfig(cell=AMAR_CELL, rnti=0xFFFF, subframe=sf,
                               mod="qpsk", tbs=tbs, rv=rv)
        out = pdsch.decode(pc, amar_grids[sf])
        assert bool(out["crc_ok"][0])

    def test_si_dci_found_only_in_si_subframes(self, amar_grids, amar_chests):
        """Blind SI-RNTI search across the whole capture finds DCIs in
        exactly the two SI subframes (2 and 5) — no false alarms."""
        found = []
        for sf, (g, ch) in enumerate(zip(amar_grids, amar_chests)):
            out = pdcch.blind_decode(AMAR_CELL, 3, sf, g, ch["h"],
                                     ch["noise_var"], rnti=0xFFFF,
                                     dci_len=dci_mod.format1a_len(6))
            if bool(out["found"][0]):
                found.append(sf)
        assert found == [2, 5]


# --------------------------------------------------- NB-IoT NPBCH captures

class TestNpbchFiles:
    """npbch_file_test on the four committed NB-IoT captures
    (phch/test/CMakeLists.txt:168-171): real Amarisoft R13 capture plus
    R13/R14 single-frame captures with different cell ids, repetition
    blocks and port counts. Pass criterion: MIB-NB CRC OK
    (npbch_file_test.c:229 nof_decoded_mibs > 0)."""

    CASES = [
        # (file, n_id_ncell, block/nf, is_r14, expect_ports, expect_sfn_msb)
        ("signal_nbiot_amari_nid0_sfn514_sib2.bin", 0, 0, False, 1, 512),
        ("signal_nbiot_nid256_r14_sf0.bin", 256, 0, True, 2, 832),
        ("signal_nbiot_nid257_r13_sf0.bin", 257, 4, False, 1, 64),
        ("signal_nbiot_nid257_r14_sf0.bin", 257, 7, True, 2, 384),
    ]

    @pytest.mark.parametrize("fn,cid,nf,r14,ports,sfn", CASES)
    def test_mib_nb_decodes(self, fn, cid, nf, r14, ports, sfn):
        from srsran_4g_tpu.models import nbiot

        x = np.fromfile(f"{REF}/{fn}", dtype=np.complex64)
        cfg = ofdm.OfdmConfig(nof_prb=1, half_sc_shift=True)
        g = ofdm.demodulate(cfg, jnp.asarray(x[:cfg.sf_len])[None])
        out = nbiot.npbch_decode(cid, g, block_idx=nf, nf=nf, is_r14=r14)
        assert bool(out["crc_ok"][0])
        assert int(out["n_ports"][0]) == ports
        mib = nbiot.mib_nb_unpack(out["mib"][0])
        assert mib["sfn_msb"] == sfn
