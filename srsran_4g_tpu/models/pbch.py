"""PBCH: physical broadcast channel (MIB), TS 36.211 §6.6 / 36.212 §5.3.1.

Counterpart of the reference's `lib/src/phy/phch/pbch.c`.

Chain: 24-bit MIB → CRC16 masked by the antenna-port pattern → tail-biting
convolutional 1/3 → rate match to 1920 bits (normal CP) → cell scrambling
over a 40 ms TTI → QPSK → 240 REs per radio frame on subframe 0, symbols
7-10, central 72 subcarriers (rate-matched around 4-port CRS positions
regardless of the actual port count).

Decode tries all three antenna-mask hypotheses and reports the detected
port count — the reference's behaviour during cell search.  Soft combining
across up to 4 frames is a sum into the 40 ms LLR buffer.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.models import grid as G
from srsran_4g_tpu.ops import convcode, modem, rate_match, scrambling
from srsran_4g_tpu.ops.crc import crc_matrix
from srsran_4g_tpu.ops.sequence import gold_sequence_np
from srsran_4g_tpu.utils import constants as C

E_NORM = 1920  # 40 ms TTI rate-matched bits, normal CP
_CRC_MASKS = {1: 0x0000, 2: 0xFFFF, 4: 0xAAAA}  # TS 36.212 Table 5.3.1.1-1


def _crc16_masked(bits: jnp.ndarray, n_ports: int) -> jnp.ndarray:
    g = jnp.asarray(crc_matrix(bits.shape[-1], "16"), jnp.float32)
    crc = (
        jnp.dot(bits.astype(jnp.float32), g, preferred_element_type=jnp.float32)
        .astype(jnp.int32) & 1
    )
    mask = (_CRC_MASKS[n_ports] >> np.arange(15, -1, -1)) & 1
    return jnp.bitwise_xor(crc.astype(jnp.int8), jnp.asarray(mask, jnp.int8))


@functools.lru_cache(maxsize=64)
def pbch_re_indices(cell: G.CellConfig) -> np.ndarray:
    """Flat (symbol*nre + sc) indices of the 240 PBCH REs of one frame."""
    nsy = cell.nsymb // 2
    mid = cell.nre // 2
    ks = np.arange(mid - 36, mid + 36)
    vshift = cell.cell_id % 6
    out = []
    for li, l in enumerate(range(nsy, nsy + 4)):
        if li < 2:  # symbols 0,1 of slot 1: avoid 4-port CRS comb (mod 3)
            keep = ks[(ks % 3) != (vshift % 3)]
        else:
            keep = ks
        out.append(l * cell.nre + keep)
    idx = np.concatenate(out)
    assert idx.shape[0] == 240
    return idx


@functools.lru_cache(maxsize=64)
def _scramble_seq(cell_id: int) -> np.ndarray:
    return gold_sequence_np(cell_id, E_NORM)


def encode(
    cell: G.CellConfig, mib_bits: jnp.ndarray, n_ports: int = 1
) -> jnp.ndarray:
    """MIB (B, 24) → PBCH QPSK symbols for the 40 ms TTI (B, 4, 120)."""
    a = jnp.concatenate(
        [mib_bits.astype(jnp.int8), _crc16_masked(mib_bits, n_ports)], axis=-1
    )
    d = convcode.conv_encode(a)
    e = rate_match.conv_rate_match(d, E_NORM)
    scr = scrambling.scramble_bits(e, jnp.asarray(_scramble_seq(cell.cell_id)))
    syms = modem.modulate("qpsk", scr)  # (B, 960)
    return syms.reshape(syms.shape[:-1] + (4, 240))


def put_into_grid(
    cell: G.CellConfig, grid_tx: jnp.ndarray, pbch_syms_frame: jnp.ndarray
) -> jnp.ndarray:
    """Scatter one frame's 240 PBCH symbols into a subframe-0 grid
    (SFBC-mapped on a 2-port grid; remember to encode with n_ports=2 so
    the CRC mask matches)."""
    from srsran_4g_tpu.models import mimo

    return mimo.scatter_ctrl_syms(grid_tx, pbch_re_indices(cell),
                                  pbch_syms_frame)


def decode(
    cell: G.CellConfig,
    rx_grid: jnp.ndarray,
    h: jnp.ndarray,
    noise_var,
    frame_idx: int = 0,
    llr_buffer: jnp.ndarray | None = None,
    h1: jnp.ndarray | None = None,
) -> dict:
    """Decode the MIB from one subframe-0 grid (plus optional accumulated
    40 ms LLR buffer from earlier frames).

    With ``h1`` (port-1 estimates) the PBCH REs are SFBC-combined (2-port
    TX diversity; the CRC antenna mask confirms the hypothesis).

    Returns dict(mib (B,24), crc_ok (B,), n_ports (B,), llr_buffer).
    """
    from srsran_4g_tpu.models import equalizer

    idx = jnp.asarray(pbch_re_indices(cell))
    b = rx_grid.shape[0]
    y = rx_grid.reshape(b, -1)[:, idx]
    h_re = h.reshape(b, -1)[:, idx]
    if h1 is not None:
        x, eff_nv = equalizer.alamouti_decode_2x1(
            y, h_re, h1.reshape(b, -1)[:, idx], noise_var)
    else:
        x, eff_nv = equalizer.equalize_single(y, h_re, noise_var)
    llr = modem.demodulate_soft("qpsk", x, eff_nv)  # (B, 480)

    buf = jnp.zeros((b, E_NORM), jnp.float32) if llr_buffer is None else llr_buffer
    buf = buf.at[:, frame_idx * 480:(frame_idx + 1) * 480].add(
        scrambling.descramble_llrs(
            llr, jnp.asarray(
                _scramble_seq(cell.cell_id)[frame_idx * 480:(frame_idx + 1) * 480]
            )
        )
    )

    d_llr = rate_match.conv_rate_dematch(buf, 40)
    bits = convcode.viterbi_decode(d_llr)  # (B, 40)

    # try the three antenna-mask hypotheses
    mib = bits[:, :24]
    crc_rx = bits[:, 24:]
    ok_any = jnp.zeros(b, bool)
    ports = jnp.zeros(b, jnp.int32)
    for np_hyp in (1, 2, 4):
        expect = _crc16_masked(mib, np_hyp)
        ok = jnp.all(expect == crc_rx, axis=-1)
        ports = jnp.where(ok & ~ok_any, np_hyp, ports)
        ok_any = ok_any | ok
    return dict(mib=mib, crc_ok=ok_any, n_ports=ports, llr_buffer=buf)
