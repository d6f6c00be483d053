"""UE DL composite receiver: cell search → sync → demod → decode.

Counterpart of the reference's `lib/src/phy/ue/{ue_sync.c,ue_cell_search.c,
ue_mib.c,ue_dl.c}`: the FIND/TRACK loop becomes a batched, feed-forward
program — PSS matched filter over the capture, CFO correction, subframe
alignment by gather, OFDM demod, SSS/cell-id resolution, then the PDSCH
receiver of models/pdsch.py.

`cell_search_and_decode` is the BASELINE "full 20 MHz DL subframe pipeline:
sync + chest + PDSCH decode, batched multi-UE" configuration.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.models import grid as G, pdsch as pdsch_mod, sync
from srsran_4g_tpu.ops.ofdm import OfdmConfig, demodulate


def align_subframe(
    samples: jnp.ndarray, pss_offset: jnp.ndarray, cfg: OfdmConfig,
    subframe_of_pss: int = 0,
) -> jnp.ndarray:
    """Extract one aligned subframe given the detected PSS symbol start.

    PSS occupies the last symbol of slot 0, so the subframe start is
    pss_offset − (6 symbol durations + CP of symbol 0 ... ), i.e. the
    PSS body start minus the offset of symbol 6's body.
    """
    from srsran_4g_tpu.ops.ofdm import _symbol_offsets

    sym6_body = int(_symbol_offsets(cfg)[6])
    start = pss_offset - sym6_body
    idx = start[..., None] + jnp.arange(cfg.sf_len)
    idx = jnp.clip(idx, 0, samples.shape[-1] - 1)
    return jnp.take_along_axis(samples, idx, axis=-1)


def cell_search(samples: jnp.ndarray, nof_prb: int) -> dict:
    """Blind cell search over a capture of ≥ 1 subframe + sf_len samples.

    Returns dict(cell_id, n_id_2, n_id_1, phase, cfo, sf_samples, grid).
    """
    cfg = OfdmConfig(nof_prb=nof_prb)
    n = cfg.symbol_sz

    found = sync.find_pss(samples, n)
    cfo = sync.pss_cfo_estimate(
        jnp.take_along_axis(
            samples,
            found["offset"][..., None] + jnp.arange(n),
            axis=-1,
        ),
        found["n_id_2"],
        n,
    )
    corrected = sync.cfo_correct(samples, cfo, n)
    sf = align_subframe(corrected, found["offset"], cfg)
    grid = demodulate(cfg, sf)

    nsy = cfg.nsymb_slot
    mid = cfg.nre // 2
    sss_re = grid[..., nsy - 2, mid - 31:mid + 31]
    # differential-coherent vs PSS channel: equalise SSS by the PSS channel
    from srsran_4g_tpu.ops.zadoff_chu import pss_sequence

    pss_re = grid[..., nsy - 1, mid - 31:mid + 31]
    n_id_2 = found["n_id_2"]
    pss_refs = jnp.stack([jnp.asarray(pss_sequence(i)) for i in range(3)])
    h_pss = pss_re * jnp.conj(pss_refs[n_id_2])
    sss_eq = sss_re * jnp.conj(h_pss) / jnp.maximum(jnp.abs(h_pss) ** 2, 1e-9)

    # sss_detect needs a static n_id_2; run all three and select
    outs = [sync.sss_detect(sss_eq, i) for i in range(3)]
    n_id_1 = jnp.stack([o["n_id_1"] for o in outs], -1)
    phase = jnp.stack([o["phase"] for o in outs], -1)
    sel = n_id_2[..., None]
    n_id_1 = jnp.take_along_axis(n_id_1, sel, axis=-1)[..., 0]
    phase = jnp.take_along_axis(phase, sel, axis=-1)[..., 0]
    cell_id = 3 * n_id_1 + n_id_2
    return dict(
        cell_id=cell_id, n_id_2=n_id_2, n_id_1=n_id_1, phase=phase,
        cfo=cfo, sf_samples=sf, grid=grid, pss_peak=found["peak"],
    )


def receive_pdsch_subframe(
    cfg: pdsch_mod.PdschConfig, samples: jnp.ndarray, n_iter: int = 5
) -> dict:
    """Known-cell receive: OFDM demod + chest + PDSCH decode
    (srsran_ue_dl_decode_fft_estimate, ue_dl.c:349)."""
    ofdm_cfg = OfdmConfig(nof_prb=cfg.cell.nof_prb)
    grid = demodulate(ofdm_cfg, samples)
    return pdsch_mod.decode(cfg, grid, n_iter=n_iter)
