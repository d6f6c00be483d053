"""NSA (EN-DC) end-to-end: LTE attach, B1 NR report, X2 SgNB addition,
S-KgNB derivation on both sides, then ciphered user-plane traffic over the
real NR PDSCH/PUSCH slot chain on the SCG bearer.

Counterpart of the reference's NSA mode (srsue `ue.cc:97-157` NSA wiring,
`srsenb/src/stack/rrc/rrc_endc.cc`, in-process `x2_adapter` enb.cc:86) —
the reference tests NSA against commercial 5GC/UEs; here UE, eNB, gNB and
EPC run in-process with the NR leg through the jitted PHY.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid_nr, pdsch_nr, pusch_nr
from srsran_4g_tpu.stack import security
from srsran_4g_tpu.stack.x2 import EnbEndc, X2Adapter

from tests.test_attach import _wire


def _attach():
    ue, enb, mme, pump = _wire()
    enb.s1_setup()
    ue.connect()
    pump()
    assert ue.state == "CONNECTED" and ue.nas.is_registered()
    return ue, enb, mme, pump


def test_endc_b1_trigger_and_keys():
    """B1 NR report → SgNB addition → both sides hold the same NR UP key."""
    ue, enb, mme, pump = _attach()
    x2 = X2Adapter()
    endc = EnbEndc(x2)
    enb.enable_endc(endc)

    ue.send_meas_report(rsrp_dbm=-70, rsrq_db=-8, pci=500 % 504, is_nr=True)
    pump()

    assert any(e.startswith("endc_start") for e in enb.events)
    assert any(e.startswith("endc_scg") for e in ue.events)
    gnb_ue = x2.gnb.ues[1]
    assert gnb_ue["state"] == "ADDED"
    # S-KgNB chain agrees: UE derived from its K_eNB + sk-Counter 0
    ectx = enb.ues[ue.c_rnti]
    s_kgnb = security.s_kgnb(ectx.k_enb, 0)
    assert gnb_ue["s_kgnb"] == s_kgnb
    assert ue.scg_pdcp.cfg.cipher_key == security.k_rrc_up(s_kgnb, 2,
                                                           "up_enc")
    assert ue.nr_rnti == gnb_ue["nr_rnti"]


def test_endc_user_plane_over_nr_phy():
    """IP packets on the SCG bearer ride the real NR slot chain both ways."""
    ue, enb, mme, pump = _attach()
    x2 = X2Adapter()
    enb.enable_endc(EnbEndc(x2))
    ue.send_meas_report(rsrp_dbm=-70, rsrq_db=-8, pci=1, is_nr=True)
    pump()
    gnb_ue = x2.gnb.ues[1]
    gnb_pdcp = gnb_ue["pdcp"]

    car = grid_nr.NrCarrierConfig(nof_prb=24, pci=101)
    nv = float(snr_to_noise_var(12.0))
    tbs = 1032

    def nr_transport(mod, pdu: bytes, slot: int, key: int) -> bytes:
        """One PDCP PDU through encode → AWGN → decode of an NR slot."""
        cfgcls = (pusch_nr.PuschNrConfig if mod is pusch_nr
                  else pdsch_nr.PdschNrConfig)
        cfg = cfgcls(carrier=car, rnti=ue.nr_rnti & 0xFFFF, slot=slot,
                     mod="qpsk", tbs=tbs)
        framed = len(pdu).to_bytes(2, "big") + pdu
        bits = np.unpackbits(np.frombuffer(framed.ljust(tbs // 8, b"\0"),
                                           np.uint8))[:tbs]
        tx = mod.encode(cfg, jnp.asarray(bits[None].astype(np.int8)))
        rx = awgn(jax.random.PRNGKey(key), tx, nv)
        out = mod.decode(cfg, rx)
        assert bool(np.asarray(out["crc_ok"])[0]), "NR slot CRC failed"
        rec = np.packbits(np.asarray(out["bits"])[0]).tobytes()
        n = int.from_bytes(rec[:2], "big")
        return rec[2:2 + n]

    # UL: UE → gNB over PUSCH-NR
    pkt_ul = bytes([0x45, 0, 0, 40]) + bytes(36)
    pdu = ue.write_scg_sdu(pkt_ul)
    arrived = nr_transport(pusch_nr, pdu, slot=2, key=1)
    n0 = len(gnb_pdcp.delivered)
    gnb_pdcp.write_pdu(arrived, direction=0)
    assert gnb_pdcp.delivered[n0:] == [pkt_ul]

    # DL: gNB → UE over PDSCH-NR
    pkt_dl = bytes([0x45, 0, 0, 84]) + bytes(80)
    pdu_dl = gnb_pdcp.write_sdu(pkt_dl, direction=1)
    arrived_dl = nr_transport(pdsch_nr, pdu_dl, slot=3, key=2)
    assert ue.rx_scg_pdu(arrived_dl) == [pkt_dl]

    # tampering on the NR leg is caught by PDCP-NR deciphering producing
    # garbage (no integrity on this DRB): flip a payload byte
    bad = bytearray(gnb_pdcp.write_sdu(pkt_dl, direction=1))
    bad[-1] ^= 0xFF
    out = ue.rx_scg_pdu(bytes(bad))
    assert out != [pkt_dl]
