"""NR PUCCH formats 0, 1, 2 (TS 38.211 6.3.2) + UCI coding glue.

Counterpart of `lib/src/phy/phch/pucch_nr.c`: format 0 (sequence
selection by cyclic shift), format 1 (base sequence x modulated UCI
symbol with time-domain OCC spreading), format 2 (coded UCI, QPSK,
with DMRS every 3rd subcarrier), and the gNB-side detectors.

The length-12 low-PAPR base sequences use the 38.211 Table 5.2.2.2-2
phi values (same table as `lib/src/phy/common/zc_sequence.c`
zc_sequence_nr_phi_M_sc_12).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.ops import block_code, crc as crc_ops, modem, polar, sequence

NRE = 12

# TS 38.211 Table 5.2.2.2-2 (phi / 4 units of pi)
_PHI_12 = np.array([
    [-3, 1, -3, -3, -3, 3, -3, -1, 1, 1, 1, -3],
    [-3, 3, 1, -3, 1, 3, -1, -1, 1, 3, 3, 3],
    [-3, 3, 3, 1, -3, 3, -1, 1, 3, -3, 3, -3],
    [-3, -3, -1, 3, 3, 3, -3, 3, -3, 1, -1, -3],
    [-3, -1, -1, 1, 3, 1, 1, -1, 1, -1, -3, 1],
    [-3, -3, 3, 1, -3, -3, -3, -1, 3, -1, 1, 3],
    [1, -1, 3, -1, -1, -1, -3, -1, 1, 1, 1, -3],
    [-1, -3, 3, -1, -3, -3, -3, -1, 1, -1, 1, -3],
    [-3, -1, 3, 1, -3, -1, -3, 3, 1, 3, 3, 1],
    [-3, -1, -1, -3, -3, -1, -3, 3, 1, 3, -1, -3],
    [-3, 3, -3, 3, 3, -3, -1, -1, 3, 3, 1, -3],
    [-3, -1, -3, -1, -1, -3, 3, 3, -1, -1, 1, -3],
    [-3, -1, 3, -3, -3, -1, -3, 1, -1, -3, 3, 3],
    [-3, 1, -1, -1, 3, 3, -3, -1, -1, -3, -1, -3],
    [1, 3, -3, 1, 3, 3, 3, 1, -1, 1, -1, 3],
    [-3, 1, 3, -1, -1, -3, -3, -1, -1, 3, 1, -3],
    [-1, -1, -1, -1, 1, -3, -1, 3, 3, -1, -3, 1],
    [-1, 1, 1, -1, 1, 3, 3, -1, -1, -3, 1, -3],
    [-3, 1, 3, 3, -1, -1, -3, 3, 3, -3, 3, -3],
    [-3, -3, 3, -3, -1, 3, 3, 3, -1, -3, 1, -3],
    [3, 1, 3, 1, 3, -3, -1, 1, 3, 1, -1, -3],
    [-3, 3, 1, 3, -3, 1, 1, 1, 1, 3, -3, 3],
    [-3, 3, 3, 3, -1, -3, -3, -1, -3, 1, 3, -3],
    [3, -1, -3, 3, -3, -1, 3, 3, 3, -3, -1, -3],
    [-3, -1, 1, -3, 1, 3, 3, 3, -1, -3, 3, 3],
    [-3, 3, 1, -1, 3, 3, -3, 1, -1, 1, -1, 1],
    [-1, 1, 3, -3, 1, -1, 1, -1, -1, -3, 1, -1],
    [-3, -3, 3, 3, 3, -3, -1, 1, -3, 3, 1, -3],
    [1, -1, 3, 1, 1, -1, -1, -1, 1, 3, -3, 1],
    [-3, 3, -3, 3, -3, -3, 3, -1, -1, 1, 3, -3]], np.float32)


@functools.lru_cache(maxsize=64)
def base_sequence(u: int) -> np.ndarray:
    """r_u(n) = exp(j*phi(n)*pi/4), length 12 (38.211 5.2.2.2)."""
    return np.exp(1j * _PHI_12[u % 30] * np.pi / 4).astype(np.complex64)


def group_hopping_u(pci: int) -> int:
    """Neither group nor sequence hopping: u = n_ID mod 30."""
    return pci % 30


def _shifted(u: int, alpha_idx: int) -> np.ndarray:
    n = np.arange(NRE)
    return (base_sequence(u)
            * np.exp(2j * np.pi * alpha_idx * n / NRE)).astype(np.complex64)


# --------------------------------------------------------------------------
# format 0: sequence selection (1-2 HARQ bits via cyclic shift offset)


@dataclass(frozen=True)
class PucchNrF0Config:
    pci: int
    initial_shift: int = 0
    nof_bits: int = 1     # 1 or 2


def f0_encode(cfg: PucchNrF0Config, uci: int) -> jnp.ndarray:
    """uci value (0..2^nof_bits-1) -> (12,) sequence."""
    step = 6 if cfg.nof_bits == 1 else 3
    alpha = (cfg.initial_shift + uci * step) % NRE
    return jnp.asarray(_shifted(group_hopping_u(cfg.pci), alpha))


def f0_detect(cfg: PucchNrF0Config, rx: jnp.ndarray) -> dict:
    """(B, 12) -> correlate against all hypotheses."""
    step = 6 if cfg.nof_bits == 1 else 3
    n_hyp = 1 << cfg.nof_bits
    u = group_hopping_u(cfg.pci)
    mat = np.stack([_shifted(u, (cfg.initial_shift + v * step) % NRE)
                    for v in range(n_hyp)])
    corr = jnp.abs(rx @ jnp.conj(jnp.asarray(mat)).T) ** 2  # (B, n_hyp)
    energy = jnp.sum(jnp.abs(rx) ** 2, axis=-1) * NRE
    return dict(value=jnp.argmax(corr, axis=-1),
                metric=jnp.max(corr, axis=-1) / (energy + 1e-9))


# --------------------------------------------------------------------------
# format 1: BPSK/QPSK symbol on base sequence with time OCC


_OCC = {  # DFT OCC of length up to 7 (38.211 Table 6.3.2.4.1-2)
    n: np.exp(-2j * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    .astype(np.complex64)
    for n in range(1, 8)
}


@dataclass(frozen=True)
class PucchNrF1Config:
    pci: int
    initial_shift: int = 0
    nof_symb: int = 4      # data symbols (DMRS interleaved not modelled)
    occ_idx: int = 0
    nof_bits: int = 1


def f1_encode(cfg: PucchNrF1Config, bits: jnp.ndarray) -> jnp.ndarray:
    """(B, nof_bits) -> (B, nof_symb, 12)."""
    d = modem.modulate("bpsk" if cfg.nof_bits == 1 else "qpsk", bits)
    d = d[:, 0]
    seq = jnp.asarray(_shifted(group_hopping_u(cfg.pci), cfg.initial_shift))
    w = jnp.asarray(_OCC[cfg.nof_symb][cfg.occ_idx])
    return d[:, None, None] * w[None, :, None] * seq[None, None, :]


def f1_decode(cfg: PucchNrF1Config, rx: jnp.ndarray) -> dict:
    """(B, nof_symb, 12) -> soft symbol + hard bits."""
    seq = jnp.asarray(_shifted(group_hopping_u(cfg.pci), cfg.initial_shift))
    w = jnp.asarray(_OCC[cfg.nof_symb][cfg.occ_idx])
    z = jnp.einsum("bsk,s,k->b", rx, jnp.conj(w), jnp.conj(seq)) \
        / (cfg.nof_symb * NRE)
    if cfg.nof_bits == 1:
        bits = (jnp.real(z) < 0).astype(jnp.int8)[:, None]
    else:
        bits = jnp.stack([(jnp.real(z) < 0), (jnp.imag(z) < 0)],
                         axis=-1).astype(jnp.int8)
    return dict(bits=bits, symbol=z)


# --------------------------------------------------------------------------
# UCI coding (38.212 6.3.1.2/6.3.1.4) + format 2


def uci_encode(bits: jnp.ndarray, e: int) -> jnp.ndarray:
    """(B, A) -> (B, E).  A<=2: repetition; 3..11: RM(32,A) + repeat;
    >=12: CRC11 + polar (38.212 6.3.1.2.1 simplified)."""
    a = bits.shape[-1]
    if a <= 2:
        rep = -(-e // a)
        return jnp.tile(bits, (1, rep))[:, :e].astype(jnp.int8)
    if a <= 11:
        cw = block_code.encode(bits, 32)  # (B, 32)
        rep = -(-e // 32)
        return jnp.tile(cw, (1, rep))[:, :e].astype(jnp.int8)
    payload = jnp.concatenate([bits.astype(jnp.int8),
                               crc_ops.crc_compute(bits, "11")], -1)
    k = a + 11
    n_log = 5
    while (1 << n_log) < max(k + 1, e // 2) and n_log < 10:
        n_log += 1
    cw = polar.encode_info(payload, n_log)
    n = 1 << n_log
    return cw[:, jnp.asarray(np.arange(e) % n)].astype(jnp.int8)


def uci_decode(llrs: jnp.ndarray, a: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, E) -> (bits (B, A), ok (B,))."""
    b, e = llrs.shape
    if a <= 2:
        rep = e // a
        acc = llrs[:, :rep * a].reshape(b, rep, a).sum(axis=1)
        return (acc > 0).astype(jnp.int8), jnp.ones(b, bool)
    if a <= 11:
        rep = -(-e // 32)
        pad = jnp.zeros((b, rep * 32 - e), llrs.dtype)
        acc = jnp.concatenate([llrs, pad], -1).reshape(b, rep, 32).sum(axis=1)
        bits, _ = block_code.decode(acc, 32, a)
        return bits, jnp.ones(b, bool)
    k = a + 11
    n_log = 5
    while (1 << n_log) < max(k + 1, e // 2) and n_log < 10:
        n_log += 1
    n = 1 << n_log
    idx = jnp.asarray(np.arange(e) % n)
    acc = jnp.zeros((b, n), llrs.dtype).at[:, idx].add(llrs)
    dec = polar.decode(acc, k, n_log)
    ok = crc_ops.crc_check(dec, "11")
    return dec[:, :a], ok


@dataclass(frozen=True)
class PucchNrF2Config:
    pci: int
    rnti: int
    nof_prb: int = 1
    nof_symb: int = 1
    nof_uci_bits: int = 4

    @property
    def e_bits(self) -> int:
        # 8 data RE per PRB (4 DMRS at k%3==1), QPSK
        return self.nof_prb * 8 * self.nof_symb * 2


def _f2_dmrs(cfg: PucchNrF2Config) -> np.ndarray:
    cinit = (cfg.rnti * (1 << 15) + cfg.pci) % (1 << 31)
    n = 4 * cfg.nof_prb * cfg.nof_symb
    c = sequence.gold_sequence_np(cinit, 2 * n).astype(np.float32)
    return (((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)) \
        .astype(np.complex64)


def f2_encode(cfg: PucchNrF2Config, uci_bits: jnp.ndarray) -> jnp.ndarray:
    """(B, A) -> (B, nof_symb, 12*nof_prb)."""
    b = uci_bits.shape[0]
    cw = uci_encode(uci_bits, cfg.e_bits)
    # scramble (c_init = rnti*2^15 + n_ID)
    scr = sequence.gold_sequence_np(
        (cfg.rnti * (1 << 15) + cfg.pci) % (1 << 31), cfg.e_bits)
    cw = jnp.bitwise_xor(cw, jnp.asarray(scr.astype(np.int8)))
    syms = modem.modulate("qpsk", cw)
    k_all = np.arange(NRE * cfg.nof_prb)
    dmrs_k = k_all[k_all % 3 == 1]
    data_k = k_all[k_all % 3 != 1]
    out = jnp.zeros((b, cfg.nof_symb, NRE * cfg.nof_prb), jnp.complex64)
    syms = syms.reshape(b, cfg.nof_symb, -1)
    out = out.at[:, :, jnp.asarray(data_k)].set(syms)
    r = jnp.asarray(_f2_dmrs(cfg)).reshape(cfg.nof_symb, -1)
    out = out.at[:, :, jnp.asarray(dmrs_k)].set(r[None])
    return out


def f2_decode(cfg: PucchNrF2Config, rx: jnp.ndarray) -> dict:
    b = rx.shape[0]
    k_all = np.arange(NRE * cfg.nof_prb)
    dmrs_k = k_all[k_all % 3 == 1]
    data_k = k_all[k_all % 3 != 1]
    r = jnp.asarray(_f2_dmrs(cfg)).reshape(cfg.nof_symb, -1)
    h_ls = rx[:, :, jnp.asarray(dmrs_k)] * jnp.conj(r)[None]
    h = jnp.mean(h_ls, axis=(-1, -2), keepdims=True)
    nv = jnp.mean(jnp.abs(h_ls - h) ** 2, axis=(-1, -2), keepdims=True) + 1e-9
    y = rx[:, :, jnp.asarray(data_k)]
    x = y * jnp.conj(h) / (jnp.abs(h) ** 2 + nv)
    llr = modem.demodulate_soft("qpsk", x, nv / (jnp.abs(h) ** 2 + 1e-9))
    llr = llr.reshape(b, cfg.e_bits)
    scr = sequence.gold_sequence_np(
        (cfg.rnti * (1 << 15) + cfg.pci) % (1 << 31), cfg.e_bits)
    llr = llr * jnp.asarray(1.0 - 2.0 * scr.astype(np.float32))
    bits, ok = uci_decode(llr, cfg.nof_uci_bits)
    return dict(bits=bits, ok=ok)
