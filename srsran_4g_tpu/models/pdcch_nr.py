"""NR PDCCH: polar-coded DCI over a CORESET with blind search.

Counterpart of `lib/src/phy/phch/pdcch_nr.c` + `dmrs_pdcch.c`:
CORESET REG/CCE structure (6 REGs of 1 PRB x 1 symbol per CCE,
non-interleaved mapping), per-REG DMRS on subcarriers {1,5,9}, DCI
CRC24C scrambled by RNTI, polar encoding (N=512 max, E = 108*L bits
at aggregation level L), QPSK — and the UE-side blind decoder that
tries all aggregation levels/candidates as one batched graph
(pdcch.c-style tree search re-expressed as a batch dimension).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.ops import crc as crc_ops
from srsran_4g_tpu.ops import modem, polar, sequence

NRE = 12
REG_DATA_RE = 9          # 12 - 3 DMRS
CCE_BITS = 6 * REG_DATA_RE * 2   # 108 coded bits per CCE (QPSK)


@dataclass(frozen=True)
class CoresetConfig:
    nof_prb: int = 24      # CORESET bandwidth (6 REGs -> 4 CCEs at 1 symbol)
    duration: int = 1      # symbols (1 supported)
    pci: int = 1
    slot: int = 0
    start_sym: int = 0

    @property
    def nof_cce(self) -> int:
        return self.nof_prb // 6


def _dmrs_seq(cfg: CoresetConfig) -> np.ndarray:
    """38.211 7.4.1.3: PDCCH DMRS over the CORESET symbol."""
    cinit = ((1 << 17) * (14 * cfg.slot + cfg.start_sym + 1)
             * (2 * cfg.pci + 1) + 2 * cfg.pci) % (1 << 31)
    n = 3 * cfg.nof_prb
    c = sequence.gold_sequence_np(cinit, 2 * n).astype(np.float32)
    r = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
    return r.astype(np.complex64)


@functools.lru_cache(maxsize=32)
def _re_maps(nof_prb: int):
    """(data_k, dmrs_k) subcarrier indices within the CORESET symbol."""
    dmrs = np.asarray([p * NRE + o for p in range(nof_prb)
                       for o in (1, 5, 9)], np.int32)
    all_k = np.arange(nof_prb * NRE, dtype=np.int32)
    data = np.setdiff1d(all_k, dmrs)
    return data, dmrs


def _polar_nlog(e_bits: int, k: int) -> int:
    """N selection (38.212 5.3.1 simplified: smallest N >= max(K, E/2),
    capped at 512)."""
    n = 32
    while n < max(k, e_bits // 2) and n < 512:
        n *= 2
    return int(np.log2(n))


def encode(cfg: CoresetConfig, dci_bits: np.ndarray, rnti: int,
           aggregation: int = 4, start_cce: int = 0) -> jnp.ndarray:
    """DCI payload bits (A,) -> (1, nof_prb*12) CORESET symbol values."""
    a = len(dci_bits)
    payload = jnp.asarray(np.asarray(dci_bits, np.int8)[None])
    crc = crc_ops.crc_compute(payload, "24C")
    mask = np.zeros(24, np.int8)
    for i in range(16):
        mask[8 + i] = (rnti >> (15 - i)) & 1
    crc = jnp.bitwise_xor(crc.astype(jnp.int8), jnp.asarray(mask[None]))
    k = a + 24
    e = CCE_BITS * aggregation
    n_log = _polar_nlog(e, k)
    cw = polar.encode_info(jnp.concatenate([payload, crc], -1), n_log)
    n = 1 << n_log
    eb = cw[:, jnp.asarray(np.arange(e) % n)]
    syms = modem.modulate("qpsk", eb)  # (1, e/2)

    grid = jnp.zeros((1, cfg.nof_prb * NRE), jnp.complex64)
    data_k, dmrs_k = _re_maps(cfg.nof_prb)
    # CCEs occupy contiguous PRBs (non-interleaved): 9 data RE per REG
    lo = start_cce * 6 * REG_DATA_RE
    sel = data_k[lo:lo + e // 2]
    grid = grid.at[:, jnp.asarray(sel)].set(syms)
    grid = grid.at[:, jnp.asarray(dmrs_k)].set(jnp.asarray(_dmrs_seq(cfg)))
    return grid


def blind_decode(cfg: CoresetConfig, rx_sym: jnp.ndarray, rnti: int,
                 dci_len: int, aggregations=(1, 2, 4)) -> dict:
    """UE-side search over aggregation levels and candidate positions.

    rx_sym: (B, nof_prb*12) received CORESET symbol.  Returns the best
    candidate whose RNTI-scrambled CRC checks: dict(found (B,),
    bits (B, dci_len), agg (B,)).
    """
    b = rx_sym.shape[0]
    data_k, dmrs_k = _re_maps(cfg.nof_prb)
    r = jnp.asarray(_dmrs_seq(cfg))
    h_ls = rx_sym[:, jnp.asarray(dmrs_k)] * jnp.conj(r)
    h = jnp.mean(h_ls, axis=-1, keepdims=True)   # flat estimate per burst
    nv = jnp.mean(jnp.abs(h_ls - h) ** 2, axis=-1, keepdims=True) + 1e-9
    y = rx_sym[:, jnp.asarray(data_k)]
    x = y * jnp.conj(h) / (jnp.abs(h) ** 2 + nv)
    llr_all = modem.demodulate_soft(
        "qpsk", x, nv / (jnp.abs(h) ** 2 + 1e-9))  # (B, 2*len(data_k))

    mask = np.zeros(24, np.int8)
    for i in range(16):
        mask[8 + i] = (rnti >> (15 - i)) & 1
    k = dci_len + 24

    found = jnp.zeros(b, bool)
    best_bits = jnp.zeros((b, dci_len), jnp.int8)
    best_agg = jnp.zeros(b, jnp.int32)
    for agg in aggregations:
        e = CCE_BITS * agg
        n_log = _polar_nlog(e, k)
        n = 1 << n_log
        for start in range(0, cfg.nof_cce - agg + 1, agg):
            lo = start * CCE_BITS
            llr = llr_all[:, lo:lo + e]
            idx = jnp.asarray(np.arange(e) % n)
            acc = jnp.zeros((b, n), llr.dtype).at[:, idx].add(llr)
            dec = polar.decode(acc, k, n_log)
            crc_in = jnp.concatenate(
                [dec[:, :dci_len],
                 jnp.bitwise_xor(dec[:, dci_len:].astype(jnp.int8),
                                 jnp.asarray(mask[None]))], -1)
            ok = crc_ops.crc_check(crc_in, "24C")
            new = ok & ~found
            best_bits = jnp.where(new[:, None], dec[:, :dci_len], best_bits)
            best_agg = jnp.where(new, agg, best_agg)
            found = found | ok
    return dict(found=found, bits=best_bits, agg=best_agg)
