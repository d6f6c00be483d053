"""Host task runtime + PMCH + X2/EN-DC tests.

Reference scenarios: lib/test/common/task_scheduler_test.cc,
multiqueue_test.cc, stack_procedure_test.cc, tti_sempahore (ordered
commit), adt/fsm tests; pmch tests; rrc_endc / x2_adapter flow.
"""

import numpy as np

import jax
import jax.numpy as jnp

from srsran_4g_tpu.runtime.tasks import (Fsm, MultiQueue, Proc, ProcState,
                                         TaskScheduler, TtiSemaphore)
from srsran_4g_tpu.stack.x2 import EnbEndc, GnbEndcTerm, X2Adapter


def test_timer_wheel():
    s = TaskScheduler()
    fired = []
    s.timers.start(5, lambda: fired.append("a"))
    tid = s.timers.start(3, lambda: fired.append("b"))
    s.timers.stop(tid)
    for _ in range(6):
        s.tick(1)
    assert fired == ["a"]


def test_multiqueue_round_robin_ports():
    s = TaskScheduler()
    out = []
    p1, p2 = s.make_port(), s.make_port()
    for i in range(3):
        p1.push(lambda i=i: out.append(("p1", i)))
        p2.push(lambda i=i: out.append(("p2", i)))
    s.run_pending()
    assert len(out) == 6
    assert {o[0] for o in out[:2]} == {"p1", "p2"}  # fair interleave


def test_defer_runs_before_external():
    s = TaskScheduler()
    out = []
    p = s.make_port()
    p.push(lambda: out.append("ext"))
    s.defer(lambda: out.append("int"))
    s.run_pending()
    assert out == ["int", "ext"]


def test_tti_semaphore_in_order_commit():
    sem = TtiSemaphore()
    for t in (10, 11, 12, 13):
        sem.push(t)
    done = {12: "c", 10: "a"}
    assert sem.commit_ready(done) == ["a"]     # 11 blocks 12
    done[11] = "b"
    assert sem.commit_ready(done) == ["b", "c"]
    done[13] = "d"
    assert sem.commit_ready(done) == ["d"]


def test_proc_multi_step_with_events():
    steps = []

    def connection_proc():
        steps.append("start")
        rsp = yield          # await setup response
        steps.append(f"got:{rsp}")
        ok = yield           # await complete
        steps.append("done")
        return ok == "ok"

    p = Proc(connection_proc)
    p.launch()
    assert p.is_busy and steps == ["start"]
    p.trigger("setup")
    assert steps == ["start", "got:setup"]
    results = []
    p.then(results.append)
    p.trigger("ok")
    assert p.state == ProcState.SUCCESS and results == [True]


def test_proc_error_path():
    def failing():
        yield
        return False

    p = Proc(failing)
    p.launch()
    p.trigger("x")
    assert p.state == ProcState.ERROR


def test_fsm_transitions_and_on_enter():
    entered = []
    fsm = Fsm("IDLE")
    fsm.add("IDLE", "connect", "CONNECTING")
    fsm.add("CONNECTING", "setup", "CONNECTED")
    fsm.add("CONNECTED", "rlf", "IDLE")
    fsm.on_enter("CONNECTED", lambda: entered.append("conn"))
    assert fsm.fire("connect") and fsm.state == "CONNECTING"
    assert not fsm.fire("bogus")           # unknown event ignored
    assert fsm.fire("setup") and entered == ["conn"]
    assert fsm.fire("rlf") and fsm.state == "IDLE"
    assert fsm.history == ["IDLE", "CONNECTING", "CONNECTED", "IDLE"]


def test_pmch_mbsfn_roundtrip():
    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    from srsran_4g_tpu.models import pmch

    cfg = pmch.PmchConfig(nof_prb=25, area_id=1, subframe=3, mod="16qam",
                          tbs=7480)
    bits = jnp.asarray(np.random.default_rng(0).integers(
        0, 2, (2, cfg.tbs)).astype(np.int8))
    rx = awgn(jax.random.PRNGKey(1), pmch.encode(cfg, bits),
              snr_to_noise_var(14.0))
    out = pmch.decode(cfg, rx)
    assert bool(np.asarray(out["crc_ok"]).all())
    assert (np.asarray(out["bits"]) == np.asarray(bits)).all()
    # wrong MBSFN area id -> scrambling/RS mismatch -> CRC fails
    bad = pmch.PmchConfig(nof_prb=25, area_id=2, subframe=3, mod="16qam",
                          tbs=7480)
    assert not np.asarray(pmch.decode(bad, rx)["crc_ok"]).any()


def test_endc_sgnb_addition_flow():
    gnb = GnbEndcTerm()
    x2 = X2Adapter(gnb)
    enb = EnbEndc(x2)
    out = enb.start_endc(rnti=0x46, erab_id=5, spgw_teid=0xAA)
    assert out["nr_rnti"] >= 0x4601 and out["gnb_teid"] >= 0x3000
    assert out["nr_config"]  # opaque NR SCG blob for the UE
    assert any(e.startswith("sgnb_add") for e in gnb.events)
    assert any(e.startswith("endc_active") for e in enb.events)
    # second UE gets distinct identifiers
    out2 = enb.start_endc(rnti=0x47, erab_id=5, spgw_teid=0xBB)
    assert out2["nr_rnti"] != out["nr_rnti"]
    assert out2["gnb_teid"] != out["gnb_teid"]
    # release
    gnb.sgnb_release(1)
    assert gnb.ues[1]["state"] == "RELEASED"
