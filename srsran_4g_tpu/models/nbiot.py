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


NPBCH_BLOCKS = 8  # MIB-NB codeword split into 8 blocks
NPBCH_REP = 8     # each block repeated in 8 consecutive frames
NPBCH_BITS_SF = 2 * _NPBCH_RE          # 200 bits per subframe
NPBCH_TOTAL_BITS = NPBCH_BLOCKS * NPBCH_BITS_SF  # 1600


def _npbch_scramble(cell_id: int) -> np.ndarray:
    """Full 1600-bit NPBCH scrambling sequence, c_init = N_id_ncell
    (36.211 §10.2.4.1, reference sequences.c srsran_sequence_npbch)."""
    return sequence.gold_sequence_np(cell_id, NPBCH_TOTAL_BITS).astype(np.int8)


@functools.lru_cache(maxsize=32)
def _npbch_r14_phase(cell_id: int, nf: int) -> np.ndarray:
    """(100,) per-RE rotation for R14 NPBCH (36.211 §10.2.4.4): phase
    from gold-bit pairs with c_init = (Ncell+1)·((nf%8+1)^3)·512 + Ncell."""
    cinit = (cell_id + 1) * (((nf % 8) + 1) ** 3) * 512 + cell_id
    c = sequence.gold_sequence_np(cinit, NPBCH_BITS_SF)
    phase_lut = np.array([1, -1, 1j, -1j], np.complex64)
    return phase_lut[2 * c[0::2] + c[1::2]]


@functools.lru_cache(maxsize=32)
def npbch_re_indices(cell_id: int) -> np.ndarray:
    """(100,) flat RE indices (l*12+k) of NPBCH in subframe 0.

    36.211 §10.2.4.2 via reference npbch.c srsran_npbch_cp: symbols 3..13;
    symbols 3, 9, 10 carry all 12 REs, every other symbol skips the four
    reference REs at (N_id_ncell%3) + 3k (LTE CRS + NRS positions, always
    reserved regardless of actual port count)."""
    out = []
    off = cell_id % 3
    for l in range(3, 14):
        if l in (3, 9, 10):
            ks = np.arange(12)
        else:
            ks = np.array([k for k in range(12) if (k % 3) != off])
        out.append(l * 12 + ks)
    idx = np.concatenate(out)
    assert idx.shape[0] == _NPBCH_RE
    return idx


def nrs_pattern(cell_id: int, port: int) -> tuple[np.ndarray, np.ndarray]:
    """NRS RE positions in one subframe: (symbols (4,), subcarriers (4, 2)).

    NRS occupy the last two symbols of each slot; v = 0/3 alternating per
    symbol (swapped for port 1), shifted by N_id_ncell % 6 (reference
    refsignal_dl_nbiot.c:37-71)."""
    syms = np.array([5, 6, 12, 13])
    vs = np.array([0, 3, 0, 3]) if port == 0 else np.array([3, 0, 3, 0])
    scs = ((vs[:, None] + cell_id % 6) % 6) + 6 * np.arange(2)[None, :]
    return syms, scs


@functools.lru_cache(maxsize=32)
def nrs_values(cell_id: int, subframe: int = 0) -> np.ndarray:
    """(4, 2) complex64 NRS pilot values for one subframe (any port —
    the sequence depends only on slot/symbol, reference
    refsignal_dl_nbiot.c:138-170)."""
    from srsran_4g_tpu.utils import constants as C

    out = []
    for l_sf in (5, 6, 12, 13):
        ns = 2 * subframe + l_sf // 7
        lp = l_sf % 7
        c_init = (1024 * (7 * (ns + 1) + lp + 1) * (2 * cell_id + 1)
                  + 2 * cell_id + 1)
        seq = sequence.gold_sequence_np(c_init, 4 * C.MAX_PRB).astype(np.float32)
        m = np.arange(2) + C.MAX_PRB - 1
        re = (1.0 - 2.0 * seq[2 * m]) / np.sqrt(2)
        im = (1.0 - 2.0 * seq[2 * m + 1]) / np.sqrt(2)
        out.append((re + 1j * im).astype(np.complex64))
    return np.stack(out)


def chest_nbiot(cell_id: int, rx_grid: jnp.ndarray, port: int,
                subframe: int = 0) -> dict:
    """LS channel estimate from the NRS of one port.

    rx_grid: (B, 14, 12). Returns dict(h (B, 14, 12), noise_var (B,)).
    The 180 kHz anchor carrier is essentially flat: pilots are averaged
    per slot and linearly interpolated over symbols (reference
    chest_dl_nbiot.c does LS + averaging)."""
    syms, scs = nrs_pattern(cell_id, port)
    pil = jnp.asarray(nrs_values(cell_id, subframe))
    rx_pil = rx_grid[..., jnp.asarray(syms)[:, None], jnp.asarray(scs)]
    h_ls = rx_pil * jnp.conj(pil)  # (B, 4, 2)
    # slot averages at symbol centres 5.5 and 12.5
    h_slot = jnp.mean(h_ls.reshape(h_ls.shape[:-2] + (2, 4)), axis=-1)
    t = (jnp.arange(14, dtype=jnp.float32) - 5.5) / 7.0
    w = jnp.clip(t, 0.0, 1.0)
    h_t = (1 - w)[None, :] * h_slot[..., :1] + w[None, :] * h_slot[..., 1:]
    h = jnp.repeat(h_t[..., None], 12, axis=-1)  # flat in frequency
    mean_h = jnp.mean(h_ls, axis=(-1, -2), keepdims=True)
    noise = jnp.mean(jnp.abs(h_ls - mean_h) ** 2, axis=(-1, -2))
    return dict(h=h, noise_var=jnp.maximum(noise, 1e-9))


def npbch_codeword(cell_id: int, mib_bits: jnp.ndarray,
                   nof_ports: int = 1) -> jnp.ndarray:
    """(B, 34) MIB-NB -> (B, 1600) scrambled rate-matched codeword
    (CRC16 masked by the port count, 36.212 table 5.3.1.1-1)."""
    crc = crc_ops.crc_compute(mib_bits, "16")
    if nof_ports == 2:
        crc = jnp.bitwise_xor(crc.astype(jnp.int8), jnp.ones(16, jnp.int8))
    with_crc = jnp.concatenate([mib_bits.astype(jnp.int8),
                                crc.astype(jnp.int8)], axis=-1)
    cw = convcode.conv_encode(with_crc)  # (B, 3, 50) tail-biting
    e = rate_match.conv_rate_match(cw, NPBCH_TOTAL_BITS)
    scr = _npbch_scramble(cell_id)
    return jnp.bitwise_xor(e.astype(jnp.int8), jnp.asarray(scr))


def npbch_encode(cell_id: int, mib_bits: jnp.ndarray, frame_idx: int = 0,
                 nof_ports: int = 1, is_r14: bool = False) -> jnp.ndarray:
    """(B, 34) -> (B, 14, 12) anchor-PRB grid for subframe 0 of
    ``frame_idx`` within the 64-frame NPBCH TTI (single-port path)."""
    b = mib_bits.shape[0]
    block = (frame_idx // NPBCH_REP) % NPBCH_BLOCKS
    e = npbch_codeword(cell_id, mib_bits, nof_ports)
    bits = e[:, block * NPBCH_BITS_SF:(block + 1) * NPBCH_BITS_SF]
    syms = modem.modulate("qpsk", bits)  # (B, 100)
    if is_r14:
        syms = syms * jnp.asarray(_npbch_r14_phase(cell_id, frame_idx))
    grid = jnp.zeros((b, 14, 12), jnp.complex64)
    flat = grid.reshape(b, -1)
    flat = flat.at[:, jnp.asarray(npbch_re_indices(cell_id))].set(syms)
    # add NRS so the self-receive chain can estimate the channel
    syms_p, scs_p = nrs_pattern(cell_id, 0)
    grid = flat.reshape(b, 14, 12)
    grid = grid.at[:, jnp.asarray(syms_p)[:, None], jnp.asarray(scs_p)].set(
        jnp.asarray(nrs_values(cell_id)))
    return grid


def npbch_decode(cell_id: int, rx_grid: jnp.ndarray, block_idx: int = 0,
                 nf: int = 0, is_r14: bool = False,
                 noise_var=None) -> dict:
    """Decode the MIB-NB from one subframe-0 grid.

    Tries the 1- and 2-port hypotheses (single-tap / SFBC diversity,
    reference npbch.c:413-453); ``block_idx`` selects which eighth of the
    1600-bit codeword this subframe carries.

    Returns dict(mib (B,34), crc_ok (B,), n_ports (B,)).
    """
    from srsran_4g_tpu.models import equalizer

    b = rx_grid.shape[0]
    idx = jnp.asarray(npbch_re_indices(cell_id))
    y = rx_grid.reshape(b, -1)[:, idx]
    if is_r14:
        y = y * jnp.conj(jnp.asarray(_npbch_r14_phase(cell_id, nf)))

    ch0 = chest_nbiot(cell_id, rx_grid, 0)
    ch1 = chest_nbiot(cell_id, rx_grid, 1)
    nv = ch0["noise_var"] if noise_var is None else jnp.asarray(noise_var)
    h0 = ch0["h"].reshape(b, -1)[:, idx]
    h1 = ch1["h"].reshape(b, -1)[:, idx]

    scr = _npbch_scramble(cell_id).astype(np.float32)
    sgn = jnp.asarray(1.0 - 2.0 * scr[block_idx * NPBCH_BITS_SF:
                                      (block_idx + 1) * NPBCH_BITS_SF])

    mib_out = jnp.zeros((b, MIB_NB_LEN), jnp.int8)
    ok_any = jnp.zeros(b, bool)
    ports_out = jnp.zeros(b, jnp.int32)
    for n_ports in (1, 2):
        if n_ports == 1:
            x, eff_nv = equalizer.equalize_single(y, h0, nv)
        else:
            x, eff_nv = equalizer.alamouti_decode_2x1(y, h0, h1, nv)
        llr = modem.demodulate_soft("qpsk", x, eff_nv) * sgn
        full = jnp.zeros((b, NPBCH_TOTAL_BITS), jnp.float32)
        full = full.at[:, block_idx * NPBCH_BITS_SF:
                       (block_idx + 1) * NPBCH_BITS_SF].set(llr)
        d = rate_match.conv_rate_dematch(full, MIB_NB_LEN + 16)
        bits = convcode.viterbi_decode(d)
        mib = bits[..., :MIB_NB_LEN]
        crc_rx = bits[..., MIB_NB_LEN:]
        expect = crc_ops.crc_compute(mib, "16")
        if n_ports == 2:
            expect = jnp.bitwise_xor(expect.astype(jnp.int8),
                                     jnp.ones(16, jnp.int8))
        ok = jnp.all(expect == crc_rx, axis=-1) & jnp.any(mib != 0, axis=-1)
        mib_out = jnp.where((ok & ~ok_any)[:, None], mib, mib_out)
        ports_out = jnp.where(ok & ~ok_any, n_ports, ports_out)
        ok_any = ok_any | ok
    return dict(mib=mib_out, crc_ok=ok_any, n_ports=ports_out)


def mib_nb_unpack(mib: np.ndarray) -> dict:
    """MIB-NB field unpack (TS 36.331 §6.7.2, reference npbch.c:204-214).

    Quick field access for capture tests; the 3GPP-exact full codec
    (incl. the operation-mode CHOICE bodies and r15-r17 fields) is
    `stack/rrc_nbiot.MibNb`, byte-exact vs the reference's rrc_nbiot.cc."""
    bits = np.asarray(mib).astype(np.int64)

    def take(o, n):
        v = 0
        for i in range(n):
            v = (v << 1) | bits[o + i]
        return int(v)

    return dict(
        sfn_msb=take(0, 4) << 6,
        hfn_lsb=take(4, 2),
        sched_info_sib1=take(6, 4),
        sys_info_tag=take(10, 5),
        ac_barring=take(15, 1),
        mode=take(16, 2),
    )
