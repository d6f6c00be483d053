"""Full-system E2E: UE <-> eNB over the TPU PHY + EPC, with pass criteria.

The framework's counterpart of the reference's system test
`test/run_lte.sh` (srsEPC + srsENB + srsUE over ZMQ RF + netns, then
assert 0% ping loss / zero PHY KO / exactly 1 PRACH).  Here the three
nodes run as Python entities wired through the *real* PHY chain:

  eNB stack -> MAC PDU -> PDSCH encode -> AWGN channel -> UE PDSCH
  decode -> UE MAC/RLC/PDCP/RRC/NAS, and the reverse over PRACH/PUSCH;
  S1AP between eNB and MME; GTP-U-level forwarding in the SPGW.

The whole radio session — random access (PRACH correlate/detect), RRC
connection, AKA + SMC security, DRB setup, ciphered IP ping loop — runs
TTI by TTI over the jitted PHY.  Pass criteria mirror run_lte.sh:
attach completes, exactly one PRACH detection, zero unrecovered PDSCH/
PUSCH KO, 0% ping loss.

Usage:  python tools/run_lte.py [--ttis 300] [--pings 5] [--snr 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_phy(snr_db: float, nof_prb: int = 15, seed: int = 7,
              cpu: bool = True):
    """Jitted DL/UL subframe transports and the PRACH path."""
    import jax

    if cpu:
        # the axon plugin overrides JAX_PLATFORMS; force through the config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
    from srsran_4g_tpu.models import grid as G, pdsch, prach, pusch
    from srsran_4g_tpu.utils import constants as C

    cell = G.CellConfig(nof_prb=nof_prb, cell_id=1, cfi=1)
    TBS = 1096  # fixed transport block (137 B MAC PDU) for jit stability
    dl_cfg = pdsch.PdschConfig(cell=cell, rnti=0x46, subframe=4, mod="qpsk",
                               tbs=TBS)
    ul_cfg = pusch.PuschConfig(cell=cell, rnti=0x46, subframe=4, mod="qpsk",
                               tbs=TBS, nof_prb_alloc=8)
    nv = snr_to_noise_var(snr_db)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def dl_step(bits, key):
        tx = pdsch.add_crs(dl_cfg, pdsch.encode(dl_cfg, bits))
        rx = awgn(key, tx, nv)
        out = pdsch.decode(dl_cfg, rx, n_iter=6)
        return out["crc_ok"], out["bits"]

    @jax.jit
    def ul_step(bits, key):
        tx = pusch.encode(ul_cfg, bits)
        rx = awgn(key, tx, nv)
        out = pusch.decode(ul_cfg, rx, n_iter=6)
        return out["crc_ok"], out["bits"]

    p_cfg = prach.PrachConfig(symbol_sz=C.symbol_sz(nof_prb),
                              root_seq_index=0, zero_corr_zone=5)

    @jax.jit
    def prach_step(pre_t, key):
        # normalise preamble to unit average power (radio TX scaling)
        pre_t = pre_t / jnp.sqrt(jnp.mean(jnp.abs(pre_t) ** 2))
        rx = awgn(key, pre_t[None, :], nv)
        det = prach.detect(p_cfg, rx)
        return det["detected"][0], det["power"][0]

    state = {"key": key, "tbs": TBS}

    def keys():
        state["key"], k = jax.random.split(state["key"])
        return k

    def dl(pdu: bytes) -> bytes | None:
        bits = np.unpackbits(np.frombuffer(pdu, np.uint8))[:TBS]
        bits = np.pad(bits, (0, TBS - len(bits))).astype(np.int8)
        ok, out = dl_step(jnp.asarray(bits[None]), keys())
        if not bool(ok[0]):
            return None
        return np.packbits(np.asarray(out[0], np.uint8)).tobytes()

    def ul(pdu: bytes) -> bytes | None:
        bits = np.unpackbits(np.frombuffer(pdu, np.uint8))[:TBS]
        bits = np.pad(bits, (0, TBS - len(bits))).astype(np.int8)
        ok, out = ul_step(jnp.asarray(bits[None]), keys())
        if not bool(ok[0]):
            return None
        return np.packbits(np.asarray(out[0], np.uint8)).tobytes()

    def prach_tx_detect(preamble_idx: int) -> int | None:
        pre = prach.generate(p_cfg, preamble_idx)
        det, power = prach_step(pre, keys())
        det = np.asarray(det)
        if not det.any():
            return None
        return int(np.asarray(power).argmax())

    return dl, ul, prach_tx_detect, TBS // 8


def run(n_ttis: int, n_pings: int, snr_db: float, verbose: bool = False):
    from srsran_4g_tpu.stack import mac_pdu
    from srsran_4g_tpu.stack.epc import Hss, Mme
    from srsran_4g_tpu.stack.nas_ue import NasUe
    from srsran_4g_tpu.stack.rlc_am import RlcAm
    from srsran_4g_tpu.stack.rlc_um import RlcTm
    from srsran_4g_tpu.stack.rrc_enb import EnbCellConfig, RrcEnb
    from srsran_4g_tpu.stack.rrc_ue import RrcUe
    from srsran_4g_tpu.stack.ue_mac import (DlMacGrant, LogicalChannel, RaProc,
                                            UeMac, UlMacGrant)
    from srsran_4g_tpu.stack.usim import Usim, UsimConfig

    dl_phy, ul_phy, prach_phy, PDU_BYTES = build_phy(snr_db)

    stats = {"prach": 0, "pdsch_ko": 0, "pusch_ko": 0, "pdsch_tx": 0,
             "pusch_tx": 0, "dl_ping_rx": 0, "ul_ping_rx": 0}
    log = (lambda *a: print(*a, flush=True)) if verbose else (lambda *a: None)

    # ----- EPC
    ucfg = UsimConfig()
    hss = Hss()
    hss.add_subscriber(ucfg.imsi, ucfg.k, ucfg.opc)
    mme = Mme(hss=hss)

    # ----- eNB: RRC + RLC bearers + thin MAC
    enb = RrcEnb(cell=EnbCellConfig(nof_prb=15))
    enb_rlc = {0: RlcTm(), 1: RlcAm(), 3: RlcAm()}
    enb_dl_q: list[bytes] = []            # assembled MAC PDUs awaiting PDSCH
    enb_pending_conres: list[bytes] = []  # contention-resolution CE payloads

    def enb_tx_rrc(rnti: int, lcid: int, pdu: bytes) -> None:
        enb_rlc[lcid].write_sdu(pdu)

    enb.tx_rrc = enb_tx_rrc
    enb.tx_s1ap = lambda pdu: [enb.rx_s1ap(r) for r in mme.rx_s1ap(pdu)]

    # ----- UE: MAC + RRC/NAS + RLC bearers
    ue_nas = NasUe(Usim(ucfg))
    ue_mac = UeMac(contention_id=b"\x42\x42\x42\x42\x42\x42")
    ue_rlc = {0: RlcTm(), 1: RlcAm(), 3: RlcAm()}
    ue_rrc = RrcUe(nas=ue_nas)
    ue_rrc.tx = lambda lcid, pdu: ue_rlc[lcid].write_sdu(pdu)

    def drain(ent) -> list[bytes]:
        """Pop delivered SDUs from an RLC entity (AM uses .delivered)."""
        q = getattr(ent, "delivered", None)
        if q is None:
            q = getattr(ent, "rx_sdus", [])
        out, q[:] = list(q), []
        return out

    # UE RLC->PDCP->RRC delivery
    def ue_rlc_deliver(lcid: int) -> None:
        for sdu in drain(ue_rlc[lcid]):
            if lcid == 0:
                ue_rrc.rx_ccch(sdu)
            elif lcid in (1, 2):
                ue_rrc.rx_dcch(lcid, sdu)
            else:
                for ip_pkt in ue_rrc.rx_drb_pdu(lcid, sdu):
                    stats["dl_ping_rx"] += 1
                    # reflect the ping back up (UE "app")
                    ue_rrc.write_drb_sdu(lcid, b"echo:" + ip_pkt[-8:])

    def ue_ccch_sink(p: bytes) -> None:
        ue_rrc.rx_ccch(p)

    ue_mac.demux.add_rlc(0, ue_ccch_sink)
    for lc in (1, 3):
        def mk(lc=lc):
            def sink(p):
                ue_rlc[lc].write_pdu(p)
                ue_rlc_deliver(lc)
            return sink
        ue_mac.demux.add_rlc(lc, mk())

    # UE mux logical channels feed from RLC entities
    def mk_chan(lcid: int, prio: int) -> LogicalChannel:
        ent = ue_rlc[lcid]

        def has() -> int:
            return 200 if ent.has_data() else 0

        def rd(n: int):
            return ent.read_pdu(n)

        return LogicalChannel(lcid=lcid, priority=prio, has_data=has,
                              read_pdu=rd)

    for lcid, prio in ((0, 0), (1, 1), (3, 3)):
        ue_mac.mux.setup_lcid(mk_chan(lcid, prio))


    # ----- eNB thin MAC: assemble DL MAC PDUs from RLC + CEs
    def enb_build_dl_pdu() -> bytes | None:
        pdu = mac_pdu.MacPdu()
        budget = PDU_BYTES
        while enb_pending_conres and budget >= 7:
            pdu.add_ce(mac_pdu.LCID_CON_RES, enb_pending_conres.pop(0))
            budget -= 7
        for lcid in (0, 1, 3):
            ent = enb_rlc[lcid]
            while ent.has_data() and budget > 3:
                sdu = ent.read_pdu(budget - 3)
                if not sdu:
                    break
                pdu.add_sdu(lcid, sdu)
                budget -= len(sdu) + 3
        if not pdu.subpdus:
            return None
        return mac_pdu.pack(pdu, PDU_BYTES)

    def enb_rx_ul_pdu(raw: bytes) -> None:
        up = mac_pdu.unpack(raw, ul=True)
        for sub in up.subpdus:
            if not sub.is_sdu:
                continue
            if sub.lcid == 0:
                if enb.ues:
                    # duplicate msg3 (HARQ retx of CCCH): contention
                    # resolution already pending — don't fork a 2nd ctx
                    stats["dup_ccch"] = stats.get("dup_ccch", 0) + 1
                    continue
                rnti = enb.rx_ccch(0, sub.payload)
                # schedule contention resolution + the queued ConnSetup
                enb_pending_conres.append(ue_mac.contention_id)
            elif sub.lcid in (1, 2):
                ent = enb_rlc[sub.lcid]
                ent.write_pdu(sub.payload)
                for sdu in drain(ent):
                    enb.rx_dcch(enb.next_rnti - 1, sub.lcid, sdu)
            else:
                ent = enb_rlc[sub.lcid]
                ent.write_pdu(sub.payload)
                for sdu in drain(ent):
                    for pkt in enb.drb_rx(enb.next_rnti - 1, sub.lcid, sdu):
                        # user plane: hand to SPGW (UL ping / echo)
                        sess = mme.spgw.sessions.get(ucfg.imsi)
                        if sess:
                            mme.spgw.rx_s1u(sess.spgw_teid, pkt)

    # SPGW SGi loopback: every UL packet is echoed back down (ping peer)
    def sgi_rx(pkt: bytes) -> None:
        stats["ul_ping_rx"] += 1

    mme.spgw.sgi_tx = sgi_rx

    def spgw_dl(teid: int, pkt: bytes) -> None:
        # DL user plane: GTP-U -> eNB -> PDCP -> RLC (DRB lcid 3)
        rnti = enb.next_rnti - 1
        enb_rlc[3].write_sdu(enb.drb_tx(rnti, 3, pkt))

    mme.spgw.s1u_tx = spgw_dl

    # ----- TTI loop ------------------------------------------------------
    ra_started = False
    ra_msg3_pending = False
    pings_sent = 0
    attach_tti = None

    for tti in range(n_ttis):
        ue_mac.tick(1)
        ue_rrc.tick(1)
        for ent in list(ue_rlc.values()) + list(enb_rlc.values()):
            if hasattr(ent, "tick"):
                ent.tick(1)

        # 1. random access
        if not ra_started:
            ue_rrc.connect()          # queues RRCConnectionRequest in SRB0
            idx = ue_mac.ra.start(ue_mac.contention_id)
            det = prach_phy(idx)
            if det is not None:
                stats["prach"] += 1
                log(f"tti {tti}: PRACH detected idx={det}")
                ue_mac.ra.rar_received(
                    mac_pdu.RarGrant(rapid=idx, ta=2, ul_grant=1,
                                     temp_crnti=0x46), None)
                ra_msg3_pending = True
            ra_started = True
            continue

        # 2. UL: msg3 or regular grant whenever UE has data
        ue_has_ul = any(c.has_data() > 0 for c in ue_mac.mux.channels)
        if ra_msg3_pending or ue_has_ul:
            g = UlMacGrant(rnti=0x46, pid=tti % 8, tbs=PDU_BYTES,
                           ndi=bool((tti // 8) % 2), is_rar=ra_msg3_pending)
            out = ue_mac.new_grant_ul(g)
            if out["pdu"]:
                stats["pusch_tx"] += 1
                rx = ul_phy(out["pdu"])
                if rx is None:
                    stats["pusch_ko"] += 1
                else:
                    enb_rx_ul_pdu(rx)
            ra_msg3_pending = False

        # 3. DL: anything queued at the eNB (KO retransmissions first)
        raw = enb_dl_q.pop(0) if enb_dl_q else enb_build_dl_pdu()
        if raw is not None:
            stats["pdsch_tx"] += 1
            g = DlMacGrant(rnti=0x46, pid=tti % 8, tbs=PDU_BYTES,
                           ndi=bool((tti // 8) % 2), tti=tti)
            act = ue_mac.new_grant_dl(g)
            rx = dl_phy(raw)
            if rx is None:
                stats["pdsch_ko"] += 1
                # retransmit next TTI by re-queueing at the front
                enb_dl_q.insert(0, raw)
            else:
                ue_mac.tb_decoded(g, rx)

        # 4. once attached, run the ping train (DL pings via SPGW SGi)
        if ue_nas.is_registered() and attach_tti is None:
            attach_tti = tti
            log(f"tti {tti}: ATTACHED ip="
                f"{'.'.join(str(b) for b in ue_nas.ip_addr)}")
        if attach_tti is not None and pings_sent < n_pings \
                and tti > attach_tti + 2 and tti % 10 == 0:
            sess = mme.spgw.sessions[ucfg.imsi]
            pkt = bytes(16) + sess.ue_ip + f"ping{pings_sent:04d}".encode()
            mme.spgw.rx_sgi(pkt)
            pings_sent += 1

    ok = (ue_nas.is_registered()
          and stats["prach"] == 1
          and stats["dl_ping_rx"] == n_pings
          and stats["ul_ping_rx"] >= n_pings  # echoes (+ any extra UL)
          and stats["pdsch_ko"] == 0 and stats["pusch_ko"] == 0)
    return ok, stats, ue_nas, mme


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ttis", type=int, default=300)
    ap.add_argument("--pings", type=int, default=5)
    ap.add_argument("--snr", type=float, default=20.0)
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("-v", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    ok, stats, nas, mme = run(args.ttis, args.pings, args.snr, verbose=args.v)
    print(f"attached={nas.is_registered()} ip="
          f"{nas.ip_addr and '.'.join(str(b) for b in nas.ip_addr)} "
          f"stats={stats}")
    print("E2E RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
