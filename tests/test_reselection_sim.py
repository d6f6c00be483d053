"""Multi-cell idle-mode simulation over the real PHY: SI acquisition,
camping, reselection on a rising neighbour, SI-change reacquisition.

The reference's idle-mode procedures (cell_selection_proc +
si_acquire_proc + reselection in rrc_cell.cc) driven end-to-end: two
cells broadcast MIB/SIB1/SIB2 on SI-RNTI PDSCH through their own OFDM
air interfaces; the UE measures both cells' CRS RSRP from the combined
stream, acquires SI over BCCH, camps by S-criterion, and — when the
neighbour's gain rises above the serving cell plus hysteresis for
T_reselection — reselects, reads the new cell's SI, and may connect.
A Paging systemInfoModification invalidates the stored SI, forcing a
reacquisition in the next SI window.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sim_env():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from srsran_4g_tpu.runtime.lte_air import LteAirPhy
    from srsran_4g_tpu.stack import rrc_msgs as R
    from srsran_4g_tpu.stack.enb_mac import EnbMac

    cells = []
    for pci in (1, 2):
        air = LteAirPhy(nof_prb=6, cell_id=pci, snr_db=35.0, seed=pci)
        mac = EnbMac(nof_prb=6)
        mac.set_si([
            bytes([0]) + R.Mib(dl_bandwidth=6).pack(),
            bytes([1]) + R.Sib1(tac=0x100 + pci, cell_id=pci,
                                q_rx_lev_min=-65).pack(),
            bytes([2]) + R.Sib2().pack(),
        ])
        cells.append((pci, air, mac))
    return cells


def test_reselection_and_si_change_over_the_air(sim_env):
    import jax.numpy as jnp

    from srsran_4g_tpu.models import dci as dci_mod, meas as meas_mod
    from srsran_4g_tpu.runtime.lte_air import DL_SF, dci_to_pdsch_cfg
    from srsran_4g_tpu.stack import rrc_msgs as R
    from srsran_4g_tpu.stack.enb_mac import SI_RNTI
    from srsran_4g_tpu.stack.rrc_idle import ReselectionConfig
    from srsran_4g_tpu.stack.rrc_ue import RrcUe

    cells = sim_env
    ue = RrcUe()
    ue.idle.resel = ReselectionConfig(q_hyst_db=3.0, t_reselection_ms=40)
    events = []

    def gains(tti):
        # phase 1: cell 1 strong; phase 2 (tti >= 140): cell 2 strong
        return (1.0, 0.1) if tti < 140 else (0.1, 1.0)

    camped_first = None
    reselected_at = None
    si_reacquired = False

    for tti in range(340):
        g = gains(tti)
        # cells broadcast SI in disjoint windows (periods offset by 10)
        for i, (pci, air, mac) in enumerate(cells):
            items = mac.get_dl_sched(tti - 10 * i)
            if not items:
                continue
            it = items[0]
            bits = dci_mod.pack_1a(it.dci, 6)
            used: set = set()
            l_agg, cce = air.cch.alloc(it.grant.rnti, used, min_l=4)
            cfg = dci_to_pdsch_cfg(air.cell, it.grant.rnti, it.dci)
            samples = g[i] * air.enb_dl_tx(
                [(cfg, it.pdu, bits, it.grant.rnti, l_agg, cce)])
            # UE: measure this cell's CRS RSRP from the subframe
            from srsran_4g_tpu.ops.ofdm import OfdmConfig, demodulate

            grid = demodulate(OfdmConfig(nof_prb=6), samples)
            m = meas_mod.measure_cell(grid, air.cell, DL_SF)
            rsrp_db = float(10.0 * np.log10(
                max(float(m["rsrp"][0]), 1e-12))) - 30.0
            ue.idle.report_cell(pci, rsrp_db)
            # acquire SI of any cell whose SI we don't have yet
            if not ue.idle.si_acquired(pci):
                rx = air.ue_dl_rx_multi(samples / g[i], SI_RNTI)
                for hit in rx["hits"]:
                    if hit.get("pdu") is not None:
                        ue.rx_bcch(hit["pdu"], pci)

        # initial camping once the strongest cell's SI is in
        if ue.idle.serving_pci is None and ue.idle.si_acquired(1):
            ue.idle.select_cell()
            camped_first = ue.idle.serving_pci
        new_pci = ue.idle.reselection_tick(1)
        if new_pci is not None and reselected_at is None:
            reselected_at = tti
            events.append(f"reselected@{tti}->{new_pci}")
        # SI-change on the serving cell while camped on cell 1
        if tti == 70 and ue.idle.serving_pci == 1:
            assert ue.idle.si_acquired(1)
            ue.rx_pcch(R.Paging(system_info_modification=True).pack())
            assert not ue.idle.si_acquired(1)
        if tti == 139 and ue.idle.serving_pci == 1:
            si_reacquired = ue.idle.si_acquired(1)

    assert camped_first == 1
    # SI was invalidated at tti 70 and reacquired from BCCH before 140
    # (SIB1 window at 81, SIB2 at 101 — one 60-TTI SI cycle)
    assert si_reacquired, ue.idle.events
    # the rising neighbour triggered a reselection after T_reselection
    assert reselected_at is not None and reselected_at >= 140 + 40
    assert ue.idle.serving_pci == 2
    # the new serving cell's SI was read from its own BCCH
    assert ue.idle.si_acquired(2)
    c2 = ue.idle.cells[2]
    assert c2.sib1.tac == 0x102 and c2.sib1.cell_id == 2
    # connection establishment is now allowed on the new cell
    ue.phys_cell_id = 2
    sent = []
    ue.tx = lambda lcid, pdu: sent.append(pdu)
    ue.connect()
    assert ue.state == "CONNECTING" and sent