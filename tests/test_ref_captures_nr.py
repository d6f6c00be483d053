"""NR reference-capture interop: decode the real-gNB CORESET#0 capture
committed next to ue_dl_nr_file_test (lib/src/phy/ue/test/
CMakeLists.txt:70): 52-PRB carrier at 15.36 Msps, PCI 500, CORESET#0
index 6 derived from the test's ARFCNs (-A 368500 -a 368410), SI-RNTI
Type0-PDCCH with the 38.211 interleaved CCE-to-REG mapping and the
38.212-exact polar chain."""

import os

import numpy as np
import pytest

CAP = ("/root/reference/lib/src/phy/ue/test/"
       "ue_dl_nr_pci500_rb52_si_coreset0_idx6_s15.36e6.dat")


@pytest.mark.skipif(not os.path.exists(CAP),
                    reason="reference captures not available")
def test_si_dci_decodes_from_coreset0_capture():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from srsran_4g_tpu.models import coreset0 as C0
    from srsran_4g_tpu.models import dci_nr

    # frequencies from the reference test command line (ARFCN × 5 kHz)
    dl_center = 368500 * 5e3
    ssb_center = 368410 * 5e3
    nof_prb, pci = 52, 500
    point_a = dl_center - nof_prb * 6 * 15e3
    cs = C0.coreset_zero(pci, ssb_center - point_a, idx=6)
    assert (cs.nof_prb, cs.duration, cs.offset_rb) == (48, 1, 1)

    raw = np.fromfile(CAP, np.complex64)
    assert raw.size == 15360              # exactly one 15 kHz slot
    grid = C0.nr_slot_grid(raw, nof_prb, symbol_sz=1024, fc_hz=dl_center)

    # DCI 1_0 size in the Type0 CSS = the C-RNTI 1_0 size over the
    # CORESET0 bandwidth (38.212 7.3.1.0 alignment): 39 bits at 48 PRB
    a = dci_nr.DciNr10(n_rb=48).nof_bits
    assert a == 39
    hit = C0.blind_decode_type0(grid, pci, slot=0, cs=cs, rnti=0xFFFF, a=a)
    assert hit is not None, "SI-RNTI DCI not found in the capture"
    # the gNB transmitted at aggregation 4, first candidate
    assert hit["l_agg"] == 4 and hit["ncce"] == 0
    bits = hit["bits"]
    # SI DCI 1_0 fields (38.212 7.3.1.2.1, SI-RNTI): RIV(11 @48 PRB),
    # time(4), vrb(1), mcs(5), rv(2), si(1), zero padding to 39
    riv = int("".join(map(str, bits[0:11])), 2)
    time_assign = int("".join(map(str, bits[11:15])), 2)
    mcs = int("".join(map(str, bits[16:21])), 2)
    assert riv == 288 and time_assign == 0 and mcs == 6
    assert not bits[21:].any()            # rv 0, si 0, padding zero

    # ... and the SIB1 PDSCH that DCI schedules decodes: 7 PRB from
    # CORESET0's first RB, symbols 2..13, QPSK MCS6 -> TBS 672
    # (the reference's ue_dl_nr_pci500_rb52_si_coreset0_idx6 test's
    # "Decoded PDSCH" pass criterion, ue_dl_nr_file_test.cc:241)
    res = C0.decode_pdsch_common(grid, pci, 0, 0xFFFF, cs.offset_rb,
                                 riv, 48, time_assign, mcs, rv=0)
    assert res["crc_ok"] and res["tbs"] == 672
    assert res["rb"] == (0, 7) and res["syms"] == (2, 12)
    payload = np.packbits(res["bits"].astype(np.uint8)).tobytes()
    # a real SIB1: non-zero body, zero-padded tail
    assert payload[:4] == bytes.fromhex("74810170")
    assert any(payload) and payload[-6:] == bytes(6)


RAR_CAP = ("/root/reference/lib/src/phy/ue/test/"
           "ue_dl_nr_pci500_rb52_rar_s15.36e6.dat")
CRNTI_CAP = ("/root/reference/lib/src/phy/ue/test/"
             "ue_dl_nr_pci500_rb52_rnti0x100_s15.36e6.dat")


@pytest.mark.skipif(not os.path.exists(RAR_CAP),
                    reason="reference captures not available")
def test_rar_decodes_from_capture():
    """ue_dl_nr_pci500_rb52_rar: RA-RNTI 0xf DCI in the Type1 CSS on
    CORESET#0 at slot 5, then the RAR PDSCH (S=1 L=13 as the
    reference's common_time_ra override, ue_dl_nr_file_test.cc:218)."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from srsran_4g_tpu.models import coreset0 as C0

    fc = 368500 * 5e3
    raw = np.fromfile(RAR_CAP, np.complex64)
    grid = C0.nr_slot_grid(raw, 52, 1024, fc_hz=fc, slot=5)
    cs = C0.coreset_zero(500, 368410 * 5e3 - (fc - 52 * 6 * 15e3), idx=6)
    hit = C0.blind_decode_type0(grid, 500, 5, cs, 0xF, 39,
                                candidates=C0.css_candidates(8))
    assert hit is not None and hit["l_agg"] == 4 and hit["ncce"] == 0
    b = hit["bits"]
    riv = int("".join(map(str, b[0:11])), 2)
    mcs = int("".join(map(str, b[16:21])), 2)
    assert riv == 156 and mcs == 5      # 4 PRB at RB 12, QPSK
    res = C0.decode_pdsch_common(grid, 500, 5, 0xF, cs.offset_rb, riv, 48,
                                 0, mcs, 0, time_ra=(1, 13), dmrs_ref_rb=0)
    assert res["crc_ok"] and res["tbs"] == 352
    pdu = np.packbits(res["bits"].astype(np.uint8)).tobytes()
    # MAC RAR: E/T/RAPID subheader + grant, TC-RNTI 0x4601
    assert pdu[:8] == bytes.fromhex("4201780680024601")


@pytest.mark.skipif(not os.path.exists(CRNTI_CAP),
                    reason="reference captures not available")
def test_crnti_pdsch_decodes_from_capture():
    """ue_dl_nr_pci500_rb52_pdsch: C-RNTI 0x100 DCI in a Type3 CSS on a
    48-PRB interleaved CORESET (same geometry as CORESET#0), dedicated
    time RA S=1 L=13 (the reference's -t 1 13), full-band 16QAM."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from srsran_4g_tpu.models import coreset0 as C0

    fc = 368500 * 5e3
    raw = np.fromfile(CRNTI_CAP, np.complex64)
    grid = C0.nr_slot_grid(raw, 52, 1024, fc_hz=fc, slot=1)
    cs = C0.Coreset0(nof_prb=48, duration=1, offset_rb=1, shift_index=500)
    hit = C0.blind_decode_type0(grid, 500, 1, cs, 0x100, 39,
                                candidates=C0.css_candidates(8))
    assert hit is not None and hit["l_agg"] == 4
    b = hit["bits"]
    assert b[0] == 1                     # DCI format identifier: DL
    riv = int("".join(map(str, b[1:12])), 2)
    mcs = int("".join(map(str, b[17:22])), 2)
    rv = int("".join(map(str, b[23:25])), 2)
    assert riv == 95 and mcs == 10       # 48 PRB at RB 0, 16QAM
    res = C0.decode_pdsch_common(grid, 500, 1, 0x100, cs.offset_rb, riv,
                                 48, 0, mcs, rv, time_ra=(1, 13),
                                 dmrs_ref_rb=0)
    assert res["crc_ok"] and res["tbs"] == 7680 and res["mod"] == "16qam"
    payload = np.packbits(res["bits"].astype(np.uint8)).tobytes()
    assert any(payload)                  # ue_dl_nr_file_test.cc:256


@pytest.mark.skipif(not os.path.exists(CAP),
                    reason="reference captures not available")
def test_si_grid_needs_phase_compensation():
    """The capture carries the 38.211 §5.4 TX phase compensation; the
    grid helper must undo it for cross-symbol channel coherence."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from srsran_4g_tpu.models import coreset0 as C0

    raw = np.fromfile(CAP, np.complex64)
    fc = 368500 * 5e3
    grid = np.asarray(C0.nr_slot_grid(raw, 52, 1024, fc_hz=fc))[0]
    sc0 = np.arange(1 * 12, 8 * 12, 2)
    h = {}
    for l in (2, 7, 11):
        r = C0._sch_dmrs(500, 0, l, 0, 7)
        h[l] = (np.asarray(grid[l])[sc0] * np.conj(r)).mean()
    # inter-DMRS-symbol phase is flat after compensation
    assert abs(np.angle(h[7] * np.conj(h[2]))) < 0.02
    assert abs(np.angle(h[11] * np.conj(h[7]))) < 0.02


def test_interleaved_mapping_properties():
    from srsran_4g_tpu.models import coreset0 as C0

    cs = C0.Coreset0(nof_prb=48, duration=1, offset_rb=1, shift_index=500)
    # candidate ncce0/L4 must land on bundles {0,1,4,5} for shift 500
    assert C0.interleaved_candidate_rbs(cs, 0, 4) == (
        list(range(0, 12)) + list(range(24, 36)))
    # all CCEs together tile the CORESET exactly once
    all_rbs = C0.interleaved_candidate_rbs(cs, 0, 8)
    assert all_rbs == list(range(48))
    # distinct L4 candidates are disjoint
    c0 = set(C0.interleaved_candidate_rbs(cs, 0, 4))
    c1 = set(C0.interleaved_candidate_rbs(cs, 4, 4))
    assert not (c0 & c1)


# ------------------------- older-vintage captures (disabled upstream)

UE_TEST = "/root/reference/lib/src/phy/ue/test"


@pytest.mark.skipif(not os.path.exists(UE_TEST),
                    reason="reference captures not available")
class TestOldVintageNrCaptures:
    """The 12 remaining NR captures: 10× ``ue_dl_nr_pci1_rb25_n*``,
    ``...si_coreset0_idx7`` and ``...n4_ra_L2``.  Their ctest entries are
    commented out in the reference itself (ue/test/CMakeLists.txt:62-71).

    The PDCCH DCIs all decode with the current 38.212/38.211 chain
    (non-interleaved duration-2 CORESET blind search, reduced sample
    rates).  The PDSCH payloads do NOT decode with current conventions —
    and provably not because of a framework gap: the reference's OWN
    current DL-SCH decoder (srsran_dlsch_nr_decode compiled standalone
    from this tree via tools/ref_nr_sch.py) also fails CRC on the same
    RE-exact LLR extraction (pci1 n0: crc=KO at the DCI's rv; idx7:
    converges only to the degenerate all-zero codeword, which
    ue_dl_nr_file_test.cc:256 rejects).  The captures predate an
    upstream SCH convention change; the PDSCH tier is therefore a
    documented justified exclusion, kept honest by
    tests/test_nr_sch_parity.py proving our chain is bit-exact with the
    reference's current encoder/decoder.
    """

    # srsran dci_location.L is log2(aggregation): filename "L1" = 2 CCEs
    # on a duration-2 CORESET clamped to carrier 25 PRB -> 24 PRB
    # (dmrs_pdcch.c:72 nof_freq_res = min(carrier/6, 45)).
    @pytest.mark.parametrize("n", range(10))
    def test_pci1_rb25_dci_decodes(self, n):
        from srsran_4g_tpu.models import coreset0 as C0
        from srsran_4g_tpu.models import dci_nr

        raw = np.fromfile(
            f"{UE_TEST}/ue_dl_nr_pci1_rb25_n{n}_common_L1_ncce0.dat",
            np.complex64)
        assert raw.size == 5760          # one slot at the reduced 5.76 Msps
        grid = C0.nr_slot_grid(raw, 25, 384, slot=n)
        cs = C0.Coreset0(nof_prb=24, duration=2, offset_rb=0,
                         shift_index=1, interleaved=False)
        # DCI sized by the 25-PRB initial BWP (the old generator's
        # convention; current code would size by coreset0_bw=48)
        hit = C0.blind_decode_type0(grid, 1, n, cs, 0x1234, 37,
                                    candidates=[(2, 0)])
        assert hit is not None, f"C-RNTI DCI not found in slot {n}"
        b = hit["bits"]
        assert b[0] == 1                 # format identifier: DL
        riv = int("".join(map(str, b[1:10])), 2)
        rb_start, l_rbs = dci_nr.riv_decode(25, riv)
        mcs = int("".join(map(str, b[15:20])), 2)
        # every slot carries the same 10-PRB QPSK MCS-2 grant at RB 0
        assert (rb_start, l_rbs, mcs) == (0, 10, 2)
        assert int("".join(map(str, b[10:14])), 2) == 0   # time row 0

    def test_idx7_si_dci_decodes(self):
        from srsran_4g_tpu.models import coreset0 as C0

        fc = 161200 * 5e3                # ARFCNs from CMakeLists.txt:71
        raw = np.fromfile(
            f"{UE_TEST}/ue_dl_nr_pci500_rb52_si_coreset0_idx7_s15.36e6.dat",
            np.complex64)
        point_a = fc - 52 * 6 * 15e3
        cs = C0.coreset_zero(500, 161290 * 5e3 - point_a, idx=7)
        assert (cs.nof_prb, cs.duration, cs.offset_rb) == (48, 1, 2)
        grid = C0.nr_slot_grid(raw, 52, 1024, fc_hz=fc, slot=0)
        hit = C0.blind_decode_type0(grid, 500, 0, cs, 0xFFFF, 39)
        assert hit is not None and hit["l_agg"] == 4 and hit["ncce"] == 0
        b = hit["bits"]
        riv = int("".join(map(str, b[0:11])), 2)
        mcs = int("".join(map(str, b[16:21])), 2)
        rv = int("".join(map(str, b[21:23])), 2)
        # same SIB1 grant as the idx6 capture, but at redundancy v. 1
        assert (riv, mcs, rv) == (288, 6, 1)

    def test_ra_l2_dci_decodes(self):
        from srsran_4g_tpu.models import coreset0 as C0
        from srsran_4g_tpu.models import dci_nr

        raw = np.fromfile(
            f"{UE_TEST}/ue_dl_nr_pci500_rb52_n4_ra_L2_ncce0.dat",
            np.complex64)
        assert raw.size == 11520         # one slot at the reduced 11.52 Msps
        grid = C0.nr_slot_grid(raw, 52, 768, slot=4)
        # 48-PRB duration-2 non-interleaved CORESET; "L2" = 4 CCEs
        cs = C0.Coreset0(nof_prb=48, duration=2, offset_rb=0,
                         shift_index=500, interleaved=False)
        hit = C0.blind_decode_type0(grid, 500, 4, cs, 0x7F, 39,
                                    candidates=[(4, 0)])
        assert hit is not None
        b = hit["bits"]
        # RA-RNTI layout: RIV(11@48) time(4) vrb(1) mcs(5) tb_scaling(2)
        riv = int("".join(map(str, b[0:11])), 2)
        rb_start, l_rbs = dci_nr.riv_decode(48, riv)
        mcs = int("".join(map(str, b[16:21])), 2)
        assert (rb_start, l_rbs, mcs) == (0, 16, 2)
