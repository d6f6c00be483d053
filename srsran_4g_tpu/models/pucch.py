"""PUCCH: uplink control channel, formats 1/1a/1b, 2/2a/2b and 3 (36.211 §5.4).

Counterpart of the reference's `lib/src/phy/phch/pucch.c` + `pucch_proc.c`.

Format 1x: one BPSK/QPSK symbol spread over length-12 cyclic-shifted base
sequences (shift hops per symbol via the cell PRNG) and a length-4
orthogonal cover across the 4 data SC-FDMA symbols of each slot (DMRS on
the middle 3 symbols with a DFT-3 cover).  Format 2: RM(20, A)-coded CQI,
scrambled then QPSK on 10 symbols with per-symbol cyclic shifts (DMRS on
symbols 1, 5).  Formats 2a/2b additionally modulate the second DMRS symbol
of each slot with 1-2 HARQ-ACK bits (Table 5.4.2-1).  Format 3 carries up
to 11 ACK(+SR) bits: (32, O) block code cyclically extended to 48 bits,
QPSK, then block-spread over the 5 data SC-FDMA symbols per slot with a
length-5 DFT cover and per-symbol cell cyclic rotation, DFT-12 precoded
(`pucch.c encode_signal_format3`).

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
    rnti: int = 0  # C-RNTI seeding format 2/3 scrambling


@functools.lru_cache(maxsize=256)
def _ncs_cell_raw(cell_id: int, ns: int) -> np.ndarray:
    """Raw 8-bit n_cs_cell(ns, l) (§5.4): format 3 consumes the full
    value (cyclic rotation mod 12 + quadrant phase from the high bits)."""
    c = gold_sequence_np(cell_id, 8 * 7 * 20)
    out = np.zeros(7, dtype=np.int64)
    for l in range(7):
        out[l] = sum(int(c[8 * 7 * ns + 8 * l + i]) << i for i in range(8))
    return out


def _ncs_cell(cell_id: int, ns: int) -> np.ndarray:
    return _ncs_cell_raw(cell_id, ns) % 12


def _f2_scramble(cfg: PucchConfig, n: int) -> np.ndarray:
    """Format 2/3 bit scrambling (§5.4.2): c_init =
    (⌊ns/2⌋+1)(2 N_id+1)·2^16 + rnti (`phch/sequences.c:171`)."""
    cinit = ((cfg.subframe + 1) * (2 * cfg.cell.cell_id + 1) << 16) + cfg.rnti
    return gold_sequence_np(cinit, n)


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


def _mod_ack_2ab(ack_bits: jnp.ndarray) -> jnp.ndarray:
    """d(10) for formats 2a/2b (Table 5.4.2-1): (B, 1|2) bits → (B,)."""
    if ack_bits.shape[-1] == 1:
        return (1.0 - 2.0 * ack_bits[:, 0]).astype(jnp.complex64)
    b0, b1 = ack_bits[:, 0], ack_bits[:, 1]
    # 00→1, 01→-j, 10→j, 11→-1
    re = (1 - b0) * (1 - b1) - b0 * b1
    im = b0 * (1 - b1) - (1 - b0) * b1
    return (re + 1j * im).astype(jnp.complex64)


def encode_format2(cfg: PucchConfig, cqi_bits: jnp.ndarray,
                   ack_bits: jnp.ndarray | None = None) -> jnp.ndarray:
    """Format 2/2a/2b: (B, A≤13) CQI bits (+ optional (B, 1|2) ACK bits
    modulating the second DMRS symbol of each slot) → TX grid."""
    coded = block_code.encode(cqi_bits, 20)
    scr = jnp.asarray(_f2_scramble(cfg, 20).astype(np.int8))
    d = modem.modulate("qpsk", coded ^ scr[None])  # (B, 10)
    d10 = None if ack_bits is None else _mod_ack_2ab(ack_bits)
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
        for m, l in enumerate(F2_DMRS_SYMS):
            seq = jnp.asarray((r * np.exp(1j * alphas[l] * n)).astype(np.complex64))
            z_m = d10[:, None] if (m == 1 and d10 is not None) else 1.0
            grid_tx = grid_tx.at[:, base_l + l, ks].set(z_m * seq[None])
    return grid_tx


def decode_format2(cfg: PucchConfig, rx_grid: jnp.ndarray, nof_bits: int,
                   nof_ack: int = 0) -> dict:
    """Format 2/2a/2b decode.  With nof_ack > 0, the channel comes from
    the first DMRS symbol of each slot and the second one is detected as
    the ACK symbol (2a: BPSK, 2b: QPSK)."""
    n = np.arange(NRE)
    sym_llr = []
    z_ack = 0.0
    for slot in (0, 1):
        ns = 2 * cfg.subframe + slot
        r, alphas = _f2_params(cfg, ns)
        prb = pucch_prb(cfg, ns)
        ks = jnp.arange(prb * NRE, (prb + 1) * NRE)
        base_l = 7 * slot
        h_m = []
        for l in F2_DMRS_SYMS:
            seq = jnp.asarray((r * np.exp(1j * alphas[l] * n)).astype(np.complex64))
            h_m.append(jnp.mean(rx_grid[:, base_l + l][..., ks] * jnp.conj(seq),
                                axis=-1))
        if nof_ack:
            h = h_m[0]
            z_ack = z_ack + h_m[1] * jnp.conj(h)
        else:
            h = (h_m[0] + h_m[1]) / 2
        for i, l in enumerate(F2_DATA_SYMS):
            seq = jnp.asarray((r * np.exp(1j * alphas[l] * n)).astype(np.complex64))
            z = jnp.mean(rx_grid[:, base_l + l][..., ks] * jnp.conj(seq), axis=-1)
            sym_llr.append(z * jnp.conj(h) / jnp.maximum(jnp.abs(h) ** 2, 1e-9))
    syms = jnp.stack(sym_llr, axis=-1)  # (B, 10)
    llr = modem.demodulate_soft("qpsk", syms, 0.1)
    scr = jnp.asarray(_f2_scramble(cfg, 20).astype(np.float32))
    llr = llr * (1.0 - 2.0 * scr)[None]
    bits, metric = block_code.decode(llr, 20, nof_bits)
    out = dict(bits=bits, metric=metric)
    if nof_ack == 1:
        out["ack_bits"] = (jnp.real(z_ack) < 0).astype(jnp.int8)[:, None]
    elif nof_ack == 2:
        out["ack_bits"] = jnp.stack(
            [(jnp.imag(z_ack) > jnp.real(z_ack)).astype(jnp.int8),
             (jnp.imag(z_ack) < -jnp.real(z_ack)).astype(jnp.int8)], axis=-1)
    return out


# --- format 3 (block-spread DFT-S-OFDM, §5.4.2A) -------------------------------

F3_DATA_SYMS = F2_DATA_SYMS
F3_DMRS_SYMS = F2_DMRS_SYMS
PUCCH3_NOF_BITS = 48


def _f3_spread_params(cfg: PucchConfig, slot: int):
    """(w (5,), ncs (5,), phase (5,)) for the 5 data symbols of `slot`."""
    ns = 2 * cfg.subframe + slot
    n_oc = cfg.n_pucch % 5 if slot == 0 else (3 * cfg.n_pucch) % 5
    m = np.arange(5)
    w = np.exp(2j * np.pi * n_oc * m / 5).astype(np.complex64)
    ncs = _ncs_cell_raw(cfg.cell.cell_id, ns)[list(F3_DATA_SYMS)]
    phase = np.exp(1j * np.pi * (ncs // 64) / 2).astype(np.complex64)
    return w, ncs, phase


def pucch3_prb(cfg: PucchConfig, ns: int) -> int:
    """Band-edge PRB for format 3: m = n_pucch/5 (`pucch.c:1008`)."""
    m = cfg.n_pucch // 5
    if (m + ns) % 2 == 0:
        return m // 2
    return cfg.cell.nof_prb - 1 - m // 2


def encode_format3(cfg: PucchConfig, ack_bits: jnp.ndarray) -> jnp.ndarray:
    """Format 3: (B, O≤11) ACK(+SR) bits → TX grid.

    (32, O) block code cyclically extended to 48 bits, scrambled, QPSK,
    then per slot: cover w(n_oc), cell cyclic rotation + quadrant phase,
    DFT-12 precoding (`pucch.c encode_signal_format3`).
    """
    coded32 = block_code.encode(ack_bits, 32)
    coded = jnp.concatenate([coded32, coded32[:, :16]], axis=-1)  # 48 bits
    scr = jnp.asarray(_f2_scramble(cfg, PUCCH3_NOF_BITS).astype(np.int8))
    d = modem.modulate("qpsk", coded ^ scr[None])  # (B, 24)
    b = d.shape[0]
    grid_tx = jnp.zeros((b, cfg.cell.nsymb, cfg.cell.nre), jnp.complex64)
    n = np.arange(NRE)
    for slot in (0, 1):
        ns = 2 * cfg.subframe + slot
        w, ncs, phase = _f3_spread_params(cfg, slot)
        prb = pucch3_prb(cfg, ns)
        ks = jnp.arange(prb * NRE, (prb + 1) * NRE)
        base_l = 7 * slot
        d_slot = d[:, 12 * slot:12 * (slot + 1)]
        for i, l in enumerate(F3_DATA_SYMS):
            rot = jnp.asarray((n + int(ncs[i])) % NRE)
            y = complex(w[i] * phase[i]) * d_slot[:, rot]
            z = jnp.fft.fft(y, axis=-1) / np.sqrt(NRE)
            grid_tx = grid_tx.at[:, base_l + l, ks].set(z.astype(jnp.complex64))
        r, alphas = _f2_params(cfg, ns)
        for l in F3_DMRS_SYMS:
            seq = jnp.asarray((r * np.exp(1j * alphas[l] * n)).astype(np.complex64))
            grid_tx = grid_tx.at[:, base_l + l, ks].set(seq[None])
    return grid_tx


def decode_format3(cfg: PucchConfig, rx_grid: jnp.ndarray, nof_bits: int) -> dict:
    """Format 3 decode: despread + IDFT + ML block decode → (B, O) bits."""
    n = np.arange(NRE)
    d_est = []
    for slot in (0, 1):
        ns = 2 * cfg.subframe + slot
        w, ncs, phase = _f3_spread_params(cfg, slot)
        prb = pucch3_prb(cfg, ns)
        ks = jnp.arange(prb * NRE, (prb + 1) * NRE)
        base_l = 7 * slot
        r, alphas = _f2_params(cfg, ns)
        h = 0
        for l in F3_DMRS_SYMS:
            seq = jnp.asarray((r * np.exp(1j * alphas[l] * n)).astype(np.complex64))
            h = h + jnp.mean(rx_grid[:, base_l + l][..., ks] * jnp.conj(seq),
                             axis=-1)
        h = h / len(F3_DMRS_SYMS)
        acc = 0.0
        for i, l in enumerate(F3_DATA_SYMS):
            z = rx_grid[:, base_l + l][..., ks]
            y = jnp.fft.ifft(z, axis=-1) * np.sqrt(NRE)
            inv = jnp.asarray((n - int(ncs[i])) % NRE)
            acc = acc + jnp.conj(complex(w[i] * phase[i])) * y[:, inv]
        eq = acc / 5 * jnp.conj(h)[:, None] / jnp.maximum(
            jnp.abs(h) ** 2, 1e-9)[:, None]
        d_est.append(eq)
    syms = jnp.concatenate(d_est, axis=-1)  # (B, 24)
    llr = modem.demodulate_soft("qpsk", syms, 0.1)
    scr = jnp.asarray(_f2_scramble(cfg, PUCCH3_NOF_BITS).astype(np.float32))
    llr = llr * (1.0 - 2.0 * scr)[None]
    # fold the cyclic extension back onto the 32 base positions
    llr32 = llr[:, :32].at[:, :16].add(llr[:, 32:])
    bits, metric = block_code.decode(llr32, 32, nof_bits)
    return dict(bits=bits, metric=metric)
