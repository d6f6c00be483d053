"""PUCCH: uplink control channel, formats 1/1a/1b and 2, TS 36.211 §5.4.

Counterpart of the reference's `lib/src/phy/phch/pucch.c` + `pucch_proc.c`.

Format 1x: one BPSK/QPSK symbol spread over length-12 cyclic-shifted base
sequences (shift hops per symbol via the cell PRNG) and a length-4
orthogonal cover across the 4 data SC-FDMA symbols of each slot (DMRS on
the middle 3 symbols with a DFT-3 cover).  Format 2: RM(20, A)-coded CQI,
QPSK on 10 symbols with per-symbol cyclic shifts (DMRS on symbols 1, 5).

Decoding is coherent: channel from the DMRS symbols, then correlation
against the known spreading — batched over UEs.  PRB mapping follows the
band-edge + slot-hopping rule (§5.4.3).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.models import grid as G
from srsran_4g_tpu.models.refsignal_ul import base_sequence
from srsran_4g_tpu.ops import block_code, modem
from srsran_4g_tpu.ops.sequence import gold_sequence_np
from srsran_4g_tpu.utils.constants import NRE

# normal CP symbol roles per slot
F1_DATA_SYMS = (0, 1, 5, 6)
F1_DMRS_SYMS = (2, 3, 4)
F2_DATA_SYMS = (0, 2, 3, 4, 6)
F2_DMRS_SYMS = (1, 5)

# orthogonal covers (TS 36.211 Table 5.4.1-2 / 5.5.2.2.1-2)
_W4 = np.array([[1, 1, 1, 1], [1, -1, 1, -1], [1, -1, -1, 1]], dtype=np.complex64)
_W3 = np.exp(2j * np.pi / 3 * np.array([[0, 0, 0], [0, 1, 2], [0, 2, 1]])).astype(
    np.complex64
)


@dataclass(frozen=True)
class PucchConfig:
    cell: G.CellConfig
    subframe: int
    n_pucch: int  # resource index (n^(1) or n^(2))
    delta_shift: int = 2  # deltaPUCCH-Shift
    n_rb_2: int = 0  # nRB-CQI
    n_cs_1: int = 0  # nCS-AN


@functools.lru_cache(maxsize=256)
def _ncs_cell(cell_id: int, ns: int) -> np.ndarray:
    """Per-symbol cell cyclic-shift hopping n_cs_cell(ns, l) (§5.4)."""
    c = gold_sequence_np(cell_id, 8 * 7 * 20)
    out = np.zeros(7, dtype=np.int64)
    for l in range(7):
        out[l] = sum(int(c[8 * 7 * ns + 8 * l + i]) << i for i in range(8)) % 12
    return out


def _f1_resource(cfg: PucchConfig, ns: int) -> tuple[int, int]:
    """(n', n_oc) for format 1 in slot ns (§5.4.1, all-format-1 PRB case)."""
    c = 3  # normal CP
    np_prime = c * NRE // cfg.delta_shift  # resources per PRB
    n1 = cfg.n_pucch
    if ns % 2 == 0:
        n_p = n1 % np_prime
    else:
        n_even = n1 % np_prime
        n_p = (c * (n_even + 1)) % (c * NRE // cfg.delta_shift + 1) - 1
        if n_p < 0:
            n_p = n_even  # degenerate small-index case
    n_oc = n_p * cfg.delta_shift // NRE
    return n_p, n_oc


def _f1_alpha(cfg: PucchConfig, ns: int, l: int, n_p: int, n_oc: int) -> float:
    ncs_cell = _ncs_cell(cfg.cell.cell_id, ns)[l]
    n_cs = (ncs_cell + (n_p * cfg.delta_shift + (n_oc % cfg.delta_shift)) % NRE) % NRE
    return 2 * np.pi * n_cs / NRE


def pucch_prb(cfg: PucchConfig, ns: int) -> int:
    """Band-edge PRB with slot hopping (§5.4.3)."""
    c = 3
    m = (cfg.n_pucch * cfg.delta_shift) // (c * NRE) + cfg.n_rb_2
    if (m + ns) % 2 == 0:
        return m // 2
    return cfg.cell.nof_prb - 1 - m // 2


@functools.lru_cache(maxsize=512)
def _f1_slot_matrix(cfg: PucchConfig, ns: int) -> tuple[np.ndarray, np.ndarray]:
    """(data (4, 12), dmrs (3, 12)) spreading for d(0)=1 in slot ns."""
    u = cfg.cell.cell_id % 30
    r = base_sequence(u, 0, NRE)
    n_p, n_oc = _f1_resource(cfg, ns)
    n = np.arange(NRE)
    data = np.zeros((4, NRE), np.complex64)
    for i, l in enumerate(F1_DATA_SYMS):
        alpha = _f1_alpha(cfg, ns, l, n_p, n_oc)
        data[i] = r * np.exp(1j * alpha * n) * _W4[n_oc, i]
    dmrs = np.zeros((3, NRE), np.complex64)
    for i, l in enumerate(F1_DMRS_SYMS):
        alpha = _f1_alpha(cfg, ns, l, n_p, n_oc)
        dmrs[i] = r * np.exp(1j * alpha * n) * _W3[n_oc, i]
    return data, dmrs


def encode_format1(
    cfg: PucchConfig, bits: jnp.ndarray | None
) -> jnp.ndarray:
    """Format 1/1a/1b TX grid (B, 14, nre).

    bits: None (format 1 / SR), (B,1) (1a) or (B,2) (1b).
    """
    if bits is None:
        d = jnp.ones((1, 1), jnp.complex64)
    elif bits.shape[-1] == 1:
        d = modem.modulate("bpsk", bits)
    else:
        d = modem.modulate("qpsk", bits)
    b = d.shape[0]
    grid_tx = jnp.zeros((b, cfg.cell.nsymb, cfg.cell.nre), jnp.complex64)
    for slot in (0, 1):
        ns = 2 * cfg.subframe + slot
        data, dmrs = _f1_slot_matrix(cfg, ns)
        prb = pucch_prb(cfg, ns)
        ks = jnp.arange(prb * NRE, (prb + 1) * NRE)
        base_l = 7 * slot
        for i, l in enumerate(F1_DATA_SYMS):
            grid_tx = grid_tx.at[:, base_l + l, ks].set(
                d[:, 0:1] * jnp.asarray(data[i])[None, :]
            )
        for i, l in enumerate(F1_DMRS_SYMS):
            grid_tx = grid_tx.at[:, base_l + l, ks].set(
                jnp.asarray(dmrs[i])[None, :]
            )
    return grid_tx


def decode_format1(
    cfg: PucchConfig, rx_grid: jnp.ndarray, nof_bits: int, noise_var=1e-2
) -> dict:
    """Coherent format 1a/1b detection. Returns dict(bits, metric, detected)."""
    b = rx_grid.shape[0]
    zs = []
    for slot in (0, 1):
        ns = 2 * cfg.subframe + slot
        data, dmrs = _f1_slot_matrix(cfg, ns)
        prb = pucch_prb(cfg, ns)
        ks = jnp.arange(prb * NRE, (prb + 1) * NRE)
        base_l = 7 * slot
        y_dm = rx_grid[:, [base_l + l for l in F1_DMRS_SYMS]][..., ks]
        h = jnp.mean(y_dm * jnp.conj(jnp.asarray(dmrs))[None], axis=(1, 2))
        y_d = rx_grid[:, [base_l + l for l in F1_DATA_SYMS]][..., ks]
        z = jnp.sum(y_d * jnp.conj(jnp.asarray(data))[None], axis=(1, 2))
        zs.append(z * jnp.conj(h))
    z = (zs[0] + zs[1]) / (8 * NRE)
    if nof_bits == 1:
        llr = -jnp.real(z)[..., None]  # d=+1 ⇔ bit 0 (BPSK table)
        bits = (llr > 0).astype(jnp.int8)
    else:
        llr = jnp.stack([-jnp.real(z), -jnp.imag(z)], axis=-1) * jnp.sqrt(2.0)
        bits = (llr > 0).astype(jnp.int8)
    return dict(bits=bits, metric=jnp.abs(z), detected=jnp.abs(z) > noise_var)


@functools.lru_cache(maxsize=512)
def _f2_params(cfg: PucchConfig, ns: int):
    u = cfg.cell.cell_id % 30
    r = base_sequence(u, 0, NRE)
    alphas = []
    for l in range(7):
        ncs = (_ncs_cell(cfg.cell.cell_id, ns)[l] + cfg.n_pucch % NRE) % NRE
        alphas.append(2 * np.pi * ncs / NRE)
    return r, alphas


def encode_format2(cfg: PucchConfig, cqi_bits: jnp.ndarray) -> jnp.ndarray:
    """Format 2: (B, A≤13) CQI bits → TX grid."""
    coded = block_code.encode(cqi_bits, 20)
    d = modem.modulate("qpsk", coded)  # (B, 10)
    b = d.shape[0]
    grid_tx = jnp.zeros((b, cfg.cell.nsymb, cfg.cell.nre), jnp.complex64)
    n = np.arange(NRE)
    for slot in (0, 1):
        ns = 2 * cfg.subframe + slot
        r, alphas = _f2_params(cfg, ns)
        prb = pucch_prb(cfg, ns)
        ks = jnp.arange(prb * NRE, (prb + 1) * NRE)
        base_l = 7 * slot
        for i, l in enumerate(F2_DATA_SYMS):
            seq = jnp.asarray((r * np.exp(1j * alphas[l] * n)).astype(np.complex64))
            grid_tx = grid_tx.at[:, base_l + l, ks].set(
                d[:, 5 * slot + i:5 * slot + i + 1] * seq[None]
            )
        for l in F2_DMRS_SYMS:
            seq = jnp.asarray((r * np.exp(1j * alphas[l] * n)).astype(np.complex64))
            grid_tx = grid_tx.at[:, base_l + l, ks].set(seq[None])
    return grid_tx


def decode_format2(cfg: PucchConfig, rx_grid: jnp.ndarray, nof_bits: int) -> dict:
    b = rx_grid.shape[0]
    n = np.arange(NRE)
    sym_llr = []
    for slot in (0, 1):
        ns = 2 * cfg.subframe + slot
        r, alphas = _f2_params(cfg, ns)
        prb = pucch_prb(cfg, ns)
        ks = jnp.arange(prb * NRE, (prb + 1) * NRE)
        base_l = 7 * slot
        h = 0
        for l in F2_DMRS_SYMS:
            seq = jnp.asarray((r * np.exp(1j * alphas[l] * n)).astype(np.complex64))
            h = h + jnp.mean(rx_grid[:, base_l + l][..., ks] * jnp.conj(seq), axis=-1)
        h = h / len(F2_DMRS_SYMS)
        for i, l in enumerate(F2_DATA_SYMS):
            seq = jnp.asarray((r * np.exp(1j * alphas[l] * n)).astype(np.complex64))
            z = jnp.mean(rx_grid[:, base_l + l][..., ks] * jnp.conj(seq), axis=-1)
            sym_llr.append(z * jnp.conj(h) / jnp.maximum(jnp.abs(h) ** 2, 1e-9))
    syms = jnp.stack(sym_llr, axis=-1)  # (B, 10)
    llr = modem.demodulate_soft("qpsk", syms, 0.1)
    bits, metric = block_code.decode(llr, 20, nof_bits)
    return dict(bits=bits, metric=metric)
