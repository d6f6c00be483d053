"""UE RRC idle-mode procedures + A1–A5 measurement events
(rrc_procedures.h:38-342, rrc_meas.cc, 36.304/36.331 §5.5.4)."""

from srsran_4g_tpu.stack import rrc_msgs as R
from srsran_4g_tpu.stack.rrc_idle import IdleProcs, ReselectionConfig
from srsran_4g_tpu.stack.rrc_meas import MeasEngine, ReportConfig
from srsran_4g_tpu.stack.rrc_ue import RrcUe


def _give_si(idle: IdleProcs, pci: int, mcc: int = 1, mnc: int = 1,
             q_min: int = -65) -> None:
    idle.rx_mib(pci, R.Mib(dl_bandwidth=25, sfn=0))
    idle.rx_bcch_dlsch(pci, bytes([1]) + R.Sib1(
        plmn_mcc=mcc, plmn_mnc=mnc, q_rx_lev_min=q_min).pack())
    idle.rx_bcch_dlsch(pci, bytes([2]) + R.Sib2().pack())


def test_si_acquisition_and_s_criterion():
    idle = IdleProcs()
    idle.report_cell(7, rsrp_dbm=-80.0)
    assert not idle.si_acquired(7)
    _give_si(idle, 7)
    assert idle.si_acquired(7)
    # S-criterion: -80 dBm > 2*(-65) = -130 → suitable
    assert idle.cells[7].s_criterion()
    idle.report_cell(7, rsrp_dbm=-135.0)
    assert not idle.cells[7].s_criterion()


def test_cell_selection_picks_strongest_suitable():
    idle = IdleProcs()
    for pci, rsrp in ((1, -90.0), (2, -70.0), (3, -60.0)):
        idle.report_cell(pci, rsrp)
        _give_si(idle, pci)
    idle.report_cell(3, -135.0)   # strongest cell fails S-criterion now
    assert idle.select_cell() == 2


def test_reselection_on_better_cell_needs_treselection():
    idle = IdleProcs(ReselectionConfig(q_hyst_db=3.0, t_reselection_ms=50))
    for pci, rsrp in ((1, -80.0), (2, -90.0)):
        idle.report_cell(pci, rsrp)
        _give_si(idle, pci)
    assert idle.select_cell() == 1
    # neighbour rises above serving + hysteresis
    idle.report_cell(2, -75.0)
    for _ in range(49):
        assert idle.reselection_tick(1) is None
    assert idle.reselection_tick(1) == 2
    assert idle.serving_pci == 2
    # a dip below the ranking resets the T_reselection window
    idle.report_cell(1, -70.0)
    for _ in range(30):
        idle.reselection_tick(1)
    idle.report_cell(1, -90.0)
    idle.reselection_tick(1)
    idle.report_cell(1, -70.0)
    for _ in range(49):
        assert idle.reselection_tick(1) is None


def test_plmn_search_collects_distinct_plmns():
    idle = IdleProcs()
    idle.report_cell(1, -70.0); _give_si(idle, 1, mcc=1, mnc=1)
    idle.report_cell(2, -60.0); _give_si(idle, 2, mcc=1, mnc=1)
    idle.report_cell(3, -80.0); _give_si(idle, 3, mcc=208, mnc=93)
    found = idle.plmn_search()
    assert ((1, 1), 2) in found            # strongest cell of PLMN 001/01
    assert ((208, 93), 3) in found
    assert len(found) == 2


def test_connect_gated_on_si_and_si_modification():
    ue = RrcUe()
    ue.idle.report_cell(1, -70.0)
    ue.idle.serving_pci = 1
    ue.connect()
    assert "conn_request_blocked_no_si" in ue.events
    assert ue.state == "IDLE"
    _give_si(ue.idle, 1)
    ue.connect()
    assert ue.state == "CONNECTING"
    # paging with systemInfoModification invalidates stored SI
    ue.rx_pcch(R.Paging(system_info_modification=True).pack())
    assert not ue.idle.si_acquired(1)


def test_a1_a2_events_serving_thresholds():
    e = MeasEngine()
    e.configure(ReportConfig(event="a1", thresh1_dbm=-80, report_id=1,
                             time_to_trigger_ms=2))
    e.configure(ReportConfig(event="a2", thresh1_dbm=-95, report_id=2,
                             time_to_trigger_ms=2))
    assert not e.tick(-90.0, {})          # neither condition
    assert not e.tick(-70.0, {})          # a1 entering, TTT running
    fired = e.tick(-70.0, {})
    assert [r["event"] for r in fired] == ["a1"]
    # a1 stays triggered (no duplicate reports)
    assert not e.tick(-70.0, {})
    # drop → a1 leaves, a2 enters and fires after TTT
    e.tick(-100.0, {})
    fired = e.tick(-100.0, {})
    assert [r["event"] for r in fired] == ["a2"]


def test_a3_a4_a5_neighbour_events():
    e = MeasEngine()
    e.configure(ReportConfig(event="a3", offset_db=3.0, hysteresis_db=1.0,
                             report_id=3, time_to_trigger_ms=2))
    e.configure(ReportConfig(event="a4", thresh1_dbm=-75, report_id=4,
                             time_to_trigger_ms=2))
    e.configure(ReportConfig(event="a5", thresh1_dbm=-85, thresh2_dbm=-78,
                             report_id=5, time_to_trigger_ms=2))
    # neighbour 9 above serving + offset + hyst; above a4 thresh;
    # serving below a5 t1, neighbour above a5 t2
    for _ in range(2):
        fired = e.tick(-90.0, {9: -70.0})
    events = sorted(r["event"] for r in fired)
    assert events == ["a3", "a4", "a5"]
    assert all(r["pci"] == 9 for r in fired)
    # hysteresis: neighbour fades → all leave; re-trigger works
    for _ in range(3):
        e.tick(-70.0, {9: -120.0})
    for _ in range(2):
        fired = e.tick(-90.0, {9: -70.0})
    assert sorted(r["event"] for r in fired) == ["a3", "a4", "a5"]


def test_meas_reports_sent_when_connected():
    sent = []
    ue = RrcUe()
    ue.state = "CONNECTED"
    from srsran_4g_tpu.stack.pdcp import PdcpConfig, PdcpEntity
    ue.pdcp[1] = PdcpEntity(PdcpConfig(is_control=True, bearer_id=1))
    ue.tx = lambda lcid, pdu: sent.append((lcid, pdu))
    ue.meas.configure(ReportConfig(event="a3", report_id=1,
                                   time_to_trigger_ms=1))
    ue.meas_tick(-90.0, {5: -70.0}, dt_ms=1)
    assert sent and sent[0][0] == 1
