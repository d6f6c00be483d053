"""NB-IoT PHY: NPSS/NSSS synchronisation + NPBCH (TS 36.211 §10).

Counterpart of the reference's NB-IoT set (`lib/src/phy/sync/npss.c`,
`nsss.c`, `lib/src/phy/phch/npbch.c`, `ra_nbiot.c`): the length-11
Zadoff-Chu NPSS repeated over 11 symbols with a cover code, the NSSS
from a ZC-131 root indexed by cell id with Hadamard scrambling, and
the NPBCH (MIB-NB + CRC16 + tail-biting convolutional code, QPSK on
the anchor PRB).

All sequences operate on the single NB-IoT PRB: grids are
(B, 14, 12) per subframe.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.ops import convcode, crc as crc_ops, modem, rate_match, sequence

NPSS_COVER = np.array([1, 1, 1, 1, -1, -1, 1, 1, 1, -1, 1], np.float32)
NPSS_SYMS = tuple(range(3, 14))  # symbols 3..13


@functools.lru_cache(maxsize=4)
def npss_sequence() -> np.ndarray:
    """(11, 11) NPSS: ZC root 5, length 11, with per-symbol cover code."""
    n = np.arange(11)
    zc = np.exp(-1j * np.pi * 5 * n * (n + 1) / 11)
    return (NPSS_COVER[:, None] * zc[None, :]).astype(np.complex64)


def put_npss(grid: jnp.ndarray) -> jnp.ndarray:
    """Insert NPSS into subframe-5 grid (B, 14, 12), subcarriers 0..10."""
    seq = jnp.asarray(npss_sequence())
    return grid.at[:, NPSS_SYMS[0]:NPSS_SYMS[-1] + 1, :11].set(seq[None])


def npss_metric(grid: jnp.ndarray) -> jnp.ndarray:
    """Correlation metric on an aligned (B, 14, 12) subframe."""
    seq = jnp.asarray(npss_sequence())
    y = grid[:, NPSS_SYMS[0]:NPSS_SYMS[-1] + 1, :11]
    num = jnp.abs(jnp.sum(y * jnp.conj(seq)[None], axis=(-1, -2))) ** 2
    den = jnp.sum(jnp.abs(y) ** 2, axis=(-1, -2)) * 121 + 1e-9
    return num / den


@functools.lru_cache(maxsize=512)
def nsss_sequence(cell_id: int, frame_idx: int = 0) -> np.ndarray:
    """132-sample NSSS (36.211 10.2.7.2): ZC-131 root u with binary
    scrambling b_q and phase theta_f."""
    q = cell_id // 126
    u = cell_id % 126 + 3
    n = np.arange(132)
    np_ = n % 131
    zc = np.exp(-1j * np.pi * u * np_ * (np_ + 1) / 131)
    # b_q: length-128 Hadamard rows extended; use rows of H_128 index q
    bq = np.ones(132, np.float32)
    for bit in range(7):
        mask = ((n >> bit) & 1).astype(bool)
        if (q >> bit) & 1:
            bq[mask] *= -1
    theta = np.exp(-2j * np.pi * (33 / 132) * frame_idx * n / 4)
    return (bq * zc * theta).astype(np.complex64)


def put_nsss(grid: jnp.ndarray, cell_id: int, frame_idx: int = 0
             ) -> jnp.ndarray:
    """NSSS occupies the last 11 symbols x 12 subcarriers of subframe 9."""
    seq = jnp.asarray(nsss_sequence(cell_id, frame_idx).reshape(11, 12))
    return grid.at[:, 3:14, :].set(seq[None])


def nsss_detect(grid: jnp.ndarray, frame_idx: int = 0,
                n_cells: int = 504) -> dict:
    """Matched filter over all cell ids as one (B, 132)x(132, N) matmul."""
    y = grid[:, 3:14, :].reshape(grid.shape[0], 132)
    mat = np.stack([nsss_sequence(c, frame_idx) for c in range(n_cells)])
    corr = jnp.abs(y @ jnp.conj(jnp.asarray(mat)).T) ** 2
    energy = jnp.sum(jnp.abs(y) ** 2, axis=-1, keepdims=True) * 132 + 1e-9
    m = corr / energy
    return dict(cell_id=jnp.argmax(m, axis=-1), metric=jnp.max(m, axis=-1))


# --------------------------------------------------------------------------
# NPBCH (36.211 10.2.4): MIB-NB 34 bits + CRC16, TBCC, QPSK


MIB_NB_LEN = 34
_NPBCH_RE = 100  # REs in the anchor PRB used per NPBCH subframe


def _npbch_scramble(cell_id: int, n: int) -> np.ndarray:
    return sequence.gold_sequence_np(cell_id, n).astype(np.int8)


def npbch_encode(cell_id: int, mib_bits: jnp.ndarray) -> jnp.ndarray:
    """(B, 34) -> (B, 14, 12) anchor-PRB subframe-0 grid."""
    b = mib_bits.shape[0]
    with_crc = jnp.concatenate(
        [mib_bits.astype(jnp.int8),
         crc_ops.crc_compute(mib_bits, "16")], axis=-1)
    cw = convcode.conv_encode(with_crc)             # (B, 3, 50) tail-biting
    e = rate_match.conv_rate_match(cw, 2 * _NPBCH_RE)
    scr = _npbch_scramble(cell_id, 2 * _NPBCH_RE)
    e = jnp.bitwise_xor(e.astype(jnp.int8), jnp.asarray(scr))
    syms = modem.modulate("qpsk", e)                 # (B, 100)
    grid = jnp.zeros((b, 14, 12), jnp.complex64)
    flat = grid.reshape(b, -1)
    # NPBCH avoids the first 3 symbols (control region of the host LTE
    # carrier) -> map onto symbols 3..13 minus CRS positions (simplified:
    # first 100 REs of symbols 3..12)
    idx = np.arange(3 * 12, 3 * 12 + _NPBCH_RE)
    flat = flat.at[:, jnp.asarray(idx)].set(syms)
    return flat.reshape(b, 14, 12)


def npbch_decode(cell_id: int, rx_grid: jnp.ndarray,
                 noise_var=0.01) -> dict:
    b = rx_grid.shape[0]
    idx = np.arange(3 * 12, 3 * 12 + _NPBCH_RE)
    y = rx_grid.reshape(b, -1)[:, jnp.asarray(idx)]
    llr = modem.demodulate_soft("qpsk", y, jnp.asarray(noise_var))
    llr = llr.reshape(b, 2 * _NPBCH_RE)
    scr = _npbch_scramble(cell_id, 2 * _NPBCH_RE).astype(np.float32)
    llr = llr * jnp.asarray(1.0 - 2.0 * scr)
    d = rate_match.conv_rate_dematch(llr, MIB_NB_LEN + 16)
    bits = convcode.viterbi_decode(d)
    ok = crc_ops.crc_check(bits, "16")
    return dict(mib=bits[..., :MIB_NB_LEN], crc_ok=ok)
