"""PHICH: hybrid-ARQ indicator channel, TS 36.211 §6.9.

Counterpart of the reference's `lib/src/phy/phch/phich.c`.  Each HARQ
ACK/NACK bit is repeated ×3 (BPSK), spread by a length-4 orthogonal
Walsh sequence (8 sequences per group: 4 codes × I/Q), scrambled, and the
12 resulting symbols are mapped onto the group's 3 REGs in symbol 0.
Decoding despreads and correlates; many UEs' ACKs decode in one batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.models import grid as G, regs
from srsran_4g_tpu.ops.sequence import gold_sequence_np
from srsran_4g_tpu.ops import scrambling

_NSF = 4  # spreading factor, normal CP
# TS 36.211 Table 6.9.1-2: w for nseq 0..7 (normal CP)
_W = np.array(
    [
        [1, 1, 1, 1],
        [1, -1, 1, -1],
        [1, 1, -1, -1],
        [1, -1, -1, 1],
    ],
    dtype=np.complex64,
)


def _seq(cell: G.CellConfig, subframe: int) -> np.ndarray:
    cinit = (subframe + 1) * (2 * cell.cell_id + 1) * (1 << 9) + cell.cell_id
    return gold_sequence_np(cinit, 12)


def _spread(ack: jnp.ndarray, nseq: int, cell: G.CellConfig, subframe: int):
    """ack (B,) 0/1 → (B, 12) spread symbols for sequence index nseq."""
    z = (2.0 * ack.astype(jnp.float32) - 1.0)[:, None]  # BPSK ±1 (ACK=1→+1)
    w = _W[nseq % 4] * (1.0 if nseq < 4 else 1j)
    c = _seq(cell, subframe).astype(np.float32)
    scr = (1.0 - 2.0 * c)
    d = z * jnp.asarray((np.tile(w, 3) * scr).astype(np.complex64))[None, :]
    return d


def encode(
    cell: G.CellConfig, ack: jnp.ndarray, group: int, nseq: int,
    subframe: int, ng: float = 1.0,
) -> jnp.ndarray:
    """Spread one UE's ACK into its PHICH group symbols (B, 12)."""
    return _spread(ack, nseq, cell, subframe) / jnp.sqrt(2.0).astype(jnp.complex64)


def put_into_grid(cell, grid_tx, phich_syms, group: int, ng: float = 1.0):
    from srsran_4g_tpu.models import mimo

    idx = regs.phich_reg_indices(cell, ng)[group].reshape(-1)
    return mimo.scatter_ctrl_syms(grid_tx, idx, phich_syms, add=True)


def decode(
    cell: G.CellConfig, rx_grid: jnp.ndarray, h: jnp.ndarray, noise_var,
    group: int, nseq: int, subframe: int, ng: float = 1.0,
    h1: jnp.ndarray | None = None,
) -> dict:
    """Despread one PHICH. Returns dict(ack (B,), metric (B,)).

    With ``h1`` (port-1 estimates) the group's 12 REs are SFBC-combined
    pairwise (2-port TX diversity, phich.c via predecoding_diversity)."""
    from srsran_4g_tpu.models import equalizer

    idx = jnp.asarray(regs.phich_reg_indices(cell, ng)[group].reshape(-1))
    b = rx_grid.shape[0]
    y = rx_grid.reshape(b, -1)[:, idx]
    h_re = h.reshape(b, -1)[:, idx]
    if h1 is not None:
        x, _ = equalizer.alamouti_decode_2x1(
            y, h_re, h1.reshape(b, -1)[:, idx], noise_var)
    else:
        x, _ = equalizer.equalize_single(y, h_re, noise_var)
    w = _W[nseq % 4] * (1.0 if nseq < 4 else 1j)
    c = _seq(cell, subframe).astype(np.float32)
    ref = jnp.asarray((np.tile(w, 3) * (1.0 - 2.0 * c)).astype(np.complex64))
    metric = jnp.real(jnp.sum(x * jnp.conj(ref), axis=-1)) * jnp.sqrt(2.0)
    return dict(ack=(metric > 0).astype(jnp.int8), metric=metric)


def phich_alloc(cell_nof_prb: int, i_prb_ra: int, n_dmrs: int = 0,
                ng: float = 1.0) -> tuple[int, int]:
    """(group, sequence) of the PHICH acknowledging a PUSCH at lowest
    PRB index `i_prb_ra` (36.213 §9.1.2; phich.c srsran_phich_calc):
    n_group = (I_PRB_RA + n_DMRS) mod N_group,
    n_seq = (floor(I_PRB_RA / N_group) + n_DMRS) mod 2·N_SF."""
    n_group = int(np.ceil(ng * cell_nof_prb / 8))
    group = (i_prb_ra + n_dmrs) % n_group
    nseq = (i_prb_ra // n_group + n_dmrs) % 8
    return group, nseq
