"""LTE sidelink: PSSS/SSSS sync, PSBCH, SCI format 0 (TS 36.211 §9).

Counterpart of the reference's sidelink set (`lib/src/phy/sync/psss.c`,
`ssss.c`, `lib/src/phy/phch/psbch.c`, `sci.c`, `mib_sl.c`): sidelink
PSS uses ZC roots {26, 37} (N_SL_ID in 0..167 -> root 26, else 37),
SSSS reuses the SSS m-sequence structure keyed by N_SL_ID, PSBCH
carries the 40-bit MIB-SL (+CRC16, TBCC, QPSK) on the centre 6 PRB,
and SCI format 0 is the PSCCH scheduling grant codec.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.ops import convcode, crc as crc_ops, modem, rate_match, sequence
from ..stack.asn1 import BitReader, BitWriter

MIB_SL_LEN = 40
_PSBCH_RE = 288  # 6 PRB x 4 symbols


@functools.lru_cache(maxsize=4)
def psss_sequence(root: int) -> np.ndarray:
    """Length-62 ZC (same structure as PSS but roots 26/37)."""
    n = np.arange(31)
    a = np.exp(-1j * np.pi * root * n * (n + 1) / 63)
    b = np.exp(-1j * np.pi * root * (n + 31) * (n + 32) / 63)
    return np.concatenate([a, b]).astype(np.complex64)


def psss_for_id(n_sl_id: int) -> np.ndarray:
    return psss_sequence(26 if n_sl_id < 168 else 37)


def psss_detect(rx_62: jnp.ndarray) -> dict:
    """(B, 62) centre REs -> which root (in-coverage vs out-of-coverage)."""
    mats = jnp.asarray(np.stack([psss_sequence(26), psss_sequence(37)]))
    corr = jnp.abs(rx_62 @ jnp.conj(mats).T) ** 2
    energy = jnp.sum(jnp.abs(rx_62) ** 2, axis=-1, keepdims=True) * 62
    m = corr / (energy + 1e-9)
    return dict(root_idx=jnp.argmax(m, axis=-1), metric=jnp.max(m, axis=-1))


@functools.lru_cache(maxsize=512)
def ssss_sequence(n_sl_id: int) -> np.ndarray:
    """62-length SSSS built from the SSS m-sequences keyed by N_SL_ID
    (36.211 9.7.2 reuses the 36.211 6.11.2 structure)."""
    id1, id2 = n_sl_id % 168, n_sl_id // 168

    def mseq(taps):
        x = np.zeros(36, np.int64)
        x[4] = 1
        for i in range(26):
            x[i + 5] = sum(x[i + t] for t in taps) % 2
        return 1 - 2 * x[:31]

    s = mseq((0, 2))
    c = mseq((0, 3))
    z = mseq((0, 1, 2, 4))
    m0 = id1 % 31
    m1 = (m0 + id1 // 31 + 1) % 31
    n = np.arange(31)
    d_even = s[(n + m0) % 31] * c[(n + id2) % 31]
    d_odd = s[(n + m1) % 31] * c[(n + id2 + 3) % 31] * z[(n + m0 % 8) % 31]
    out = np.empty(62, np.float32)
    out[0::2] = d_even
    out[1::2] = d_odd
    return out.astype(np.complex64)


def ssss_detect(rx_62: jnp.ndarray, n_ids: int = 336) -> dict:
    mat = jnp.asarray(np.stack([ssss_sequence(i) for i in range(n_ids)]))
    corr = jnp.abs(rx_62 @ jnp.conj(mat).T) ** 2
    energy = jnp.sum(jnp.abs(rx_62) ** 2, axis=-1, keepdims=True) * 62
    m = corr / (energy + 1e-9)
    return dict(n_sl_id=jnp.argmax(m, axis=-1), metric=jnp.max(m, axis=-1))


# --------------------------------------------------------------------------
# PSBCH: MIB-SL (40 bits) + CRC16 + TBCC + QPSK over centre 6 PRB


@dataclass
class MibSl:
    """mib_sl.c fields (36.331 SL-BCH payload)."""
    sl_bandwidth: int = 100      # PRBs
    tdd_config: int = 0
    direct_frame_number: int = 0  # 10 bits
    direct_subframe_number: int = 0  # 4 bits
    in_coverage: bool = True

    _BW = [6, 15, 25, 50, 75, 100]

    def pack(self) -> np.ndarray:
        w = BitWriter()
        w.put(self._BW.index(self.sl_bandwidth), 3)
        w.put(self.tdd_config, 3)
        w.put(self.direct_frame_number, 10)
        w.put(self.direct_subframe_number, 4)
        w.put_bool(self.in_coverage)
        w.put(0, 19)  # reserved
        bits = np.asarray(w.bits, np.int8)
        assert len(bits) == MIB_SL_LEN
        return bits

    @classmethod
    def unpack(cls, bits: np.ndarray) -> "MibSl":
        r = BitReader(np.packbits(np.asarray(bits, np.uint8)).tobytes())
        return cls(sl_bandwidth=cls._BW[r.get(3)], tdd_config=r.get(3),
                   direct_frame_number=r.get(10),
                   direct_subframe_number=r.get(4),
                   in_coverage=r.get_bool())


def psbch_encode(n_sl_id: int, mib_bits: jnp.ndarray) -> jnp.ndarray:
    """(B, 40) -> (B, 576) QPSK symbol block for the PSBCH REs."""
    with_crc = jnp.concatenate(
        [mib_bits.astype(jnp.int8), crc_ops.crc_compute(mib_bits, "16")],
        axis=-1)
    cw = convcode.conv_encode(with_crc)
    e = rate_match.conv_rate_match(cw, 2 * _PSBCH_RE)
    scr = sequence.gold_sequence_np(n_sl_id, 2 * _PSBCH_RE).astype(np.int8)
    e = jnp.bitwise_xor(e.astype(jnp.int8), jnp.asarray(scr))
    return modem.modulate("qpsk", e)


def psbch_decode(n_sl_id: int, syms: jnp.ndarray, noise_var=0.01) -> dict:
    b = syms.shape[0]
    llr = modem.demodulate_soft("qpsk", syms, jnp.asarray(noise_var))
    llr = llr.reshape(b, 2 * _PSBCH_RE)
    scr = sequence.gold_sequence_np(n_sl_id, 2 * _PSBCH_RE).astype(np.float32)
    llr = llr * jnp.asarray(1.0 - 2.0 * scr)
    d = rate_match.conv_rate_dematch(llr, MIB_SL_LEN + 16)
    bits = convcode.viterbi_decode(d)
    ok = crc_ops.crc_check(bits, "16")
    return dict(mib=bits[..., :MIB_SL_LEN], crc_ok=ok)


# --------------------------------------------------------------------------
# SCI format 0 (sci.c): PSCCH scheduling grant


@dataclass
class SciFormat0:
    freq_hopping: bool = False
    riv: int = 0            # resource block assignment
    trp: int = 0            # time resource pattern (7 bits)
    mcs: int = 0            # 5 bits
    timing_advance: int = 0  # 11 bits
    group_dst_id: int = 0   # 8 bits

    def pack(self, nof_prb: int = 100) -> np.ndarray:
        import math
        riv_bits = math.ceil(math.log2(nof_prb * (nof_prb + 1) / 2))
        w = BitWriter()
        w.put_bool(self.freq_hopping)
        w.put(self.riv, riv_bits)
        w.put(self.trp, 7)
        w.put(self.mcs, 5)
        w.put(self.timing_advance, 11)
        w.put(self.group_dst_id, 8)
        return np.asarray(w.bits, np.int8)

    @classmethod
    def unpack(cls, bits: np.ndarray, nof_prb: int = 100) -> "SciFormat0":
        import math
        riv_bits = math.ceil(math.log2(nof_prb * (nof_prb + 1) / 2))
        r = BitReader(np.packbits(np.asarray(bits, np.uint8)).tobytes())
        return cls(freq_hopping=r.get_bool(), riv=r.get(riv_bits),
                   trp=r.get(7), mcs=r.get(5), timing_advance=r.get(11),
                   group_dst_id=r.get(8))
