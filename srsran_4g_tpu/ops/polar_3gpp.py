"""38.212-exact polar coding for NR DCI (PDCCH), on top of ops/polar.py.

The framework's `ops/polar.py` supplies the F^{⊗n} butterfly encoder and
the batched SC decoder; this module adds the 3GPP-interop pieces the
simplified construction omits (counterpart of the reference's
`polar_code.c` get_code_params/srsran_polar_code_get,
`polar_rm.c`, `polar_interleaver.c`, `pdcch_nr.c` DCI conventions):

- N selection per 38.212 §5.3.1 (n1/n2/nMax rules, N ≥ 32);
- frozen-set construction from the universal reliability sequence
  (utils/polar_tables.npz — 3GPP standard tables) INCLUDING the
  rate-matching pre-frozen bits: for E < N the sub-block interleaver's
  first N−E positions (puncturing, 16K ≤ 7E) or the positions from E on
  (shortening), plus the T-threshold for puncturing;
- rate matching: sub-block interleave → puncture/shorten/repeat, and the
  soft inverse (punctured LLR = 0 unknown; shortened LLR = known 0);
- the DCI input interleaver I_IL (Table 5.3.1.1-1 pattern, K_IL = 164);
- DCI CRC24C over 24 prepended ones with the RNTI masking the last 16
  CRC bits (38.212 §7.3.2), and PDCCH scrambling c_init
  (38.211 §7.3.2.3).

Acceptance: the reference's own committed PDCCH capture
`ue_dl_nr_pci1_rb25_n0_common_L1_ncce0.dat` decodes
(tests/test_ref_captures_nr.py).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from srsran_4g_tpu.ops import crc as crc_ops, polar, sequence

K_MAX_IL = 164

# TS 38.212 Table 5.3.1.1-1 interleaving pattern (3GPP standard table)
_IL_PATTERN = np.asarray([
    0, 2, 4, 7, 9, 14, 19, 20, 24, 25, 26, 28, 31, 34, 42, 45, 49, 50, 51,
    53, 54, 56, 58, 59, 61, 62, 65, 66, 67, 69, 70, 71, 72, 76, 77, 81, 82,
    83, 87, 88, 89, 91, 93, 95, 98, 101, 104, 106, 108, 110, 111, 113, 115,
    118, 119, 120, 122, 123, 126, 127, 129, 132, 134, 138, 139, 140, 1, 3,
    5, 8, 10, 15, 21, 27, 29, 32, 35, 43, 46, 52, 55, 57, 60, 63, 68, 73,
    78, 84, 90, 92, 94, 96, 99, 102, 105, 107, 109, 112, 114, 116, 121,
    124, 128, 130, 133, 135, 141, 6, 11, 16, 22, 30, 33, 36, 44, 47, 64,
    74, 79, 85, 97, 100, 103, 117, 125, 131, 136, 142, 12, 17, 23, 37, 48,
    75, 80, 86, 137, 143, 13, 18, 38, 144, 39, 145, 40, 146, 41, 147, 148,
    149, 150, 151, 152, 153, 154, 155, 156, 157, 158, 159, 160, 161, 162,
    163], np.int32)


def code_params(k: int, e: int, n_max: int = 9) -> int:
    """→ n (N = 2^n) per 38.212 §5.3.1 (DCI: nPC = 0, K ≥ 36)."""
    # K here includes the 24-bit CRC; 38.212 §7.3.3 pads DCI payloads to
    # >= 12 info bits, so K >= 36 always holds for a valid DCI
    assert k >= 36, f"polar DCI K={k} below the 38.212 minimum (12+24)"
    n_e = max(5, (e - 1).bit_length())
    n1 = n_e - 1 if (8 * e <= 9 * (1 << (n_e - 1)) and 16 * k < 9 * e) \
        else n_e
    n2 = max(1, (k - 1).bit_length()) + 3
    n = min(n1, n2, n_max)
    return max(n, 5)


@functools.lru_cache(maxsize=64)
def dci_sets(k: int, e: int, n_max: int = 9):
    """→ (n, K_set sorted (reliable info positions), frozen mask (N,))
    with the rate-matching pre-frozen bits (srsran_polar_code_get /
    38.212 §5.4.1.1)."""
    n = code_params(k, e, n_max)
    big_n = 1 << n
    tabs = polar._tables()
    mother = np.asarray(tabs[f"mother_{n}"], np.int64)
    blk = np.asarray(tabs[f"blk_interleaver_{n}"], np.int64)

    f_pre = np.zeros(0, np.int64)
    t = -1
    if e < big_n:
        if 16 * k <= 7 * e:       # puncturing
            n_th = 3 * big_n // 4
            t = (n_th - (e >> 1) - 1) if e >= n_th \
                else (9 * big_n // 16 - (e >> 2))
            f_pre = blk[: big_n - e]
        else:                     # shortening
            f_pre = blk[e:]
    pre = set(f_pre.tolist())
    # reliability order with pre-frozen (and <= T) positions removed
    usable = [p for p in mother.tolist() if p > t and p not in pre]
    k_set = np.asarray(sorted(usable[-k:]), np.int64)
    mask = np.ones(big_n, bool)
    mask[k_set] = False
    return n, k_set, mask


def _il_perm(k: int) -> np.ndarray:
    """pi(k) for the DCI input interleaver at size k."""
    sel = _IL_PATTERN[_IL_PATTERN >= K_MAX_IL - k] - (K_MAX_IL - k)
    return sel.astype(np.int64)


def rm_tx(d: jnp.ndarray, e: int, k: int) -> jnp.ndarray:
    """(B, N) encoded bits → (B, E) rate-matched bits."""
    n_log = int(np.log2(d.shape[-1]))
    big_n = d.shape[-1]
    blk = np.asarray(polar._tables()[f"blk_interleaver_{n_log}"], np.int64)
    y = d[..., jnp.asarray(blk)]
    if e >= big_n:
        reps = jnp.concatenate([y] * ((e + big_n - 1) // big_n), axis=-1)
        return reps[..., :e]
    if 16 * k <= 7 * e:
        return y[..., big_n - e:]     # puncture the first N-E
    return y[..., :e]                 # shorten the last N-E


def rm_rx(llr_e: jnp.ndarray, n_log: int, k: int) -> jnp.ndarray:
    """(B, E) LLRs → (B, N) de-rate-matched LLRs (framework convention:
    positive ⇒ bit 1; shortened bits are known 0 ⇒ large negative)."""
    big_n = 1 << n_log
    e = llr_e.shape[-1]
    blk = np.asarray(polar._tables()[f"blk_interleaver_{n_log}"], np.int64)
    b = llr_e.shape[0]
    if e >= big_n:
        y = jnp.zeros((b, big_n), llr_e.dtype)
        idx = jnp.asarray(np.arange(e) % big_n)
        y = y.at[:, idx].add(llr_e)
    elif 16 * k <= 7 * e:
        y = jnp.concatenate(
            [jnp.zeros((b, big_n - e), llr_e.dtype), llr_e], axis=-1)
    else:
        y = jnp.concatenate(
            [llr_e, jnp.full((b, big_n - e), -1e9, llr_e.dtype)], axis=-1)
    out = jnp.zeros((b, big_n), llr_e.dtype)
    return out.at[:, jnp.asarray(blk)].set(y)


def dci_encode(payload: jnp.ndarray, e: int, rnti: int) -> jnp.ndarray:
    """DCI payload bits (B, A) → rate-matched coded bits (B, E)
    (38.212 §7.3: ones-prepended CRC24C, RNTI on the last 16 CRC bits,
    I_IL input interleaving)."""
    b, a = payload.shape
    ones = jnp.ones((b, 24), jnp.int8)
    crc = crc_ops.crc_compute(
        jnp.concatenate([ones, payload.astype(jnp.int8)], -1), "24C")
    mask = np.zeros(24, np.int8)
    for i in range(16):
        mask[8 + i] = (rnti >> (15 - i)) & 1
    crc = jnp.bitwise_xor(crc.astype(jnp.int8), jnp.asarray(mask[None]))
    c = jnp.concatenate([payload.astype(jnp.int8), crc], -1)
    k = a + 24
    c = c[..., jnp.asarray(_il_perm(k))]
    n, k_set, _ = dci_sets(k, e)
    u = jnp.zeros((b, 1 << n), jnp.int32)
    u = u.at[..., jnp.asarray(k_set)].set(c.astype(jnp.int32))
    d = polar.encode(u)
    return rm_tx(d, e, k)


def dci_decode(llr_e: jnp.ndarray, a: int, rnti: int) -> dict:
    """(B, E) LLRs (positive ⇒ bit 1) → dict(bits (B, A), crc_ok (B,))."""
    k = a + 24
    e = llr_e.shape[-1]
    n, k_set, mask = dci_sets(k, e)
    llr_n = rm_rx(llr_e, n, k)
    u = polar.decode_masked(llr_n, mask)
    c = u[..., jnp.asarray(k_set)]
    inv = np.argsort(_il_perm(k))
    c = c[..., jnp.asarray(inv)]
    payload, crc_rx = c[..., :a], c[..., a:]
    b = payload.shape[0]
    ones = jnp.ones((b, 24), jnp.int8)
    crc = crc_ops.crc_compute(
        jnp.concatenate([ones, payload.astype(jnp.int8)], -1), "24C")
    m = np.zeros(24, np.int8)
    for i in range(16):
        m[8 + i] = (rnti >> (15 - i)) & 1
    expect = jnp.bitwise_xor(crc.astype(jnp.int8), jnp.asarray(m[None]))
    ok = jnp.all(expect == crc_rx.astype(jnp.int8), axis=-1)
    return dict(bits=payload, crc_ok=ok)


def pdcch_scramble_seq(e: int, pci: int, rnti: int = 0) -> np.ndarray:
    """38.211 §7.3.2.3: c_init = (n_RNTI·2^16 + n_ID) mod 2^31
    (n_RNTI = 0 except UE-specific config)."""
    cinit = ((rnti << 16) + pci) % (1 << 31)
    return sequence.gold_sequence_np(cinit, e)
