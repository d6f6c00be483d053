"""NR LDPC encoder/decoder (BG1/BG2), TS 38.212 §5.3.2.

Counterpart of the reference's `lib/src/phy/fec/ldpc/` (23 files of scalar/
AVX2/AVX512 encoders and layered/flooded decoders).  TPU design:

- The lifted parity-check structure is folded into ONE static gather-index
  tensor (row, edge, z) → flat variable index, with each edge's cyclic
  shift baked in.  A decoder iteration is then: one gather, a masked
  min-sum over the edge axis, and one scatter-add — no per-edge or
  per-layer loops, fully batched over codewords with the lifting dimension
  Z in lanes.
- Encoding solves the 4Z×4Z core via a host-precomputed GF(2) inverse
  applied as an MXU matmul (mod 2); the remaining parity rows are direct
  XOR accumulations.
- Normalized min-sum (factor 0.8), fixed iterations, two schedules: the
  flooding default (one fused gather/min/scatter per iteration — widest
  parallelism) and a layered schedule (`lax.scan` over the 42/46 base-graph
  rows, ~2× fewer iterations for the same BLER, matching the reference's
  `ldpc_decoder` layered variants).

Base-graph shift tables are TS 38.212 Tables 5.3.2-2/-3 spec data
(utils/ldpc_tables.npz).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_NO_CNCT = 65535

# lifting sets (TS 38.212 Table 5.3.2-1): iLS → allowed Z values
LIFT_SETS = {
    0: (2, 4, 8, 16, 32, 64, 128, 256),
    1: (3, 6, 12, 24, 48, 96, 192, 384),
    2: (5, 10, 20, 40, 80, 160, 320),
    3: (7, 14, 28, 56, 112, 224),
    4: (9, 18, 36, 72, 144, 288),
    5: (11, 22, 44, 88, 176, 352),
    6: (13, 26, 52, 104, 208),
    7: (15, 30, 60, 120, 240),
}


def lift_index(z: int) -> int:
    for ils, zs in LIFT_SETS.items():
        if z in zs:
            return ils
    raise ValueError(f"invalid lifting size {z}")


@functools.lru_cache(maxsize=1)
def _tables():
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "utils",
                        "ldpc_tables.npz")
    with np.load(os.path.abspath(path)) as f:
        return {k: f[k] for k in f.files}


def bg_params(bg: int) -> tuple[int, int, int]:
    """(n_info_blocks Kb, n_check M, n_cols Nfull)."""
    return (22, 46, 68) if bg == 1 else (10, 42, 52)


@functools.lru_cache(maxsize=64)
def _shift_matrix(bg: int, z: int) -> np.ndarray:
    """(M, Nfull) shifts mod Z, -1 = no connection."""
    t = _tables()["bg1" if bg == 1 else "bg2"][lift_index(z)].astype(np.int64)
    out = np.where(t == _NO_CNCT, -1, t % z)
    return out


@functools.lru_cache(maxsize=64)
def _edge_structure(bg: int, z: int):
    """Static decoder structure: gather indices + mask.

    Returns (gidx (M, D, Z) int32 into the flat (Nfull*Z,) variable vector,
    mask (M, D, 1) float32, degrees).
    """
    h = _shift_matrix(bg, z)
    m, nfull = h.shape
    deg = (h >= 0).sum(axis=1)
    d = int(deg.max())
    gidx = np.zeros((m, d, z), dtype=np.int32)
    mask = np.zeros((m, d, 1), dtype=np.float32)
    zr = np.arange(z)
    for i in range(m):
        cols = np.nonzero(h[i] >= 0)[0]
        for e, c in enumerate(cols):
            s = h[i, c]
            gidx[i, e] = c * z + (zr + s) % z
            mask[i, e] = 1.0
    return gidx, mask, deg


@functools.lru_cache(maxsize=64)
def _core_inverse(bg: int, z: int) -> np.ndarray:
    """GF(2) inverse of the 4Z×4Z parity core (columns Kb..Kb+3, rows 0..3).

    Solves M_c · p_core = t so p_core = inv · t; returned as (4Z, 4Z) uint8.
    """
    kb, m, nfull = bg_params(bg)
    h = _shift_matrix(bg, z)
    n = 4 * z
    mat = np.zeros((n, n), dtype=np.uint8)
    for i in range(4):
        for j in range(4):
            s = h[i, kb + j]
            if s >= 0:
                rows = i * z + np.arange(z)
                cols = kb * z * 0 + j * z + (np.arange(z) + s) % z
                mat[rows, cols] ^= 1
    # Gauss-Jordan over GF(2)
    a = np.concatenate([mat, np.eye(n, dtype=np.uint8)], axis=1)
    for col in range(n):
        piv = col + np.argmax(a[col:, col])
        assert a[piv, col], "singular LDPC core"
        if piv != col:
            a[[col, piv]] = a[[piv, col]]
        sel = a[:, col].copy()
        sel[col] = 0
        a[sel.astype(bool)] ^= a[col]
    return a[:, n:]


def encode(bits: jnp.ndarray, bg: int, z: int) -> jnp.ndarray:
    """Encode (B, Kb*Z) info bits → (B, Nfull*Z) full codeword (before the
    2Z-column puncturing of rate matching)."""
    kb, m, nfull = bg_params(bg)
    b = bits.shape[0]
    assert bits.shape[1] == kb * z
    h = _shift_matrix(bg, z)
    s_blocks = bits.reshape(b, kb, z).astype(jnp.int32)

    def row_acc(i, upto_cols):
        acc = jnp.zeros((b, z), jnp.int32)
        for c in range(upto_cols):
            sft = h[i, c]
            if sft >= 0:
                acc = acc ^ jnp.roll(s_blocks[:, c], -int(sft), axis=-1)
        return acc

    # core: rows 0..3 over the systematic columns
    t = jnp.concatenate([row_acc(i, kb) for i in range(4)], axis=-1)  # (B,4Z)
    inv = jnp.asarray(_core_inverse(bg, z), jnp.float32)
    p_core = (
        jnp.dot(t.astype(jnp.float32), inv.T, preferred_element_type=jnp.float32)
        .astype(jnp.int32) & 1
    )
    p_core_b = p_core.reshape(b, 4, z)

    full = jnp.concatenate([s_blocks, p_core_b,
                            jnp.zeros((b, m - 4, z), jnp.int32)], axis=1)

    # extension rows 4..M-1: p_i = sum of connections to cols < Kb+4
    ext = []
    for i in range(4, m):
        acc = jnp.zeros((b, z), jnp.int32)
        for c in range(kb + 4):
            sft = h[i, c]
            if sft >= 0:
                acc = acc ^ jnp.roll(full[:, c], -int(sft), axis=-1)
        ext.append(acc)
    full = full.at[:, kb + 4:].set(jnp.stack(ext, axis=1))
    return full.reshape(b, nfull * z).astype(jnp.int8)


def _minsum(v2c: jnp.ndarray, mask: jnp.ndarray, norm: float,
            axis: int) -> jnp.ndarray:
    """Normalized min-sum check update along `axis` (the edge axis)."""
    sgn = jnp.where(v2c < 0, -1.0, 1.0) * mask + (1.0 - mask)
    mag = jnp.where(mask > 0, jnp.abs(v2c), 1e30)
    row_sign = jnp.prod(sgn, axis=axis, keepdims=True)
    m1 = jnp.min(mag, axis=axis, keepdims=True)
    idx1 = jnp.argmin(mag, axis=axis, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, mag.shape, axis)
    mag2 = jnp.where(iota == idx1, 1e30, mag)
    m2 = jnp.min(mag2, axis=axis, keepdims=True)
    mins = jnp.where(iota == idx1, m2, m1)
    return norm * row_sign * sgn * mins * mask


def decode(
    llrs: jnp.ndarray, bg: int, z: int, n_iter: int = 10, norm: float = 0.8,
    schedule: str = "flooded",
) -> jnp.ndarray:
    """Normalized min-sum decode (flooding or layered schedule).

    Args:
      llrs: (B, Nfull*Z) float32, positive ⇒ bit 1, zeros for punctured /
        not-transmitted positions.
      schedule: "flooded" (default, one fused update per iteration) or
        "layered" (sequential row updates; use ~half the iterations).

    Returns (B, Kb*Z) hard info bits.
    """
    if schedule == "layered":
        return _decode_layered(llrs, bg, z, n_iter, norm)
    kb, m, nfull = bg_params(bg)
    gidx_np, mask_np, _ = _edge_structure(bg, z)
    gidx = jnp.asarray(gidx_np.reshape(-1))
    mask = jnp.asarray(mask_np)  # (M, D, 1)
    b = llrs.shape[0]
    d = mask_np.shape[1]
    # internal convention: positive ⇒ bit 0 (classic LLR); flip at IO
    chan = -llrs.astype(jnp.float32)

    def body(_, carry):
        lq, c2v = carry
        v2c = lq[:, gidx].reshape(b, m, d, z) - c2v
        c2v_new = _minsum(v2c, mask, norm, axis=2)
        delta = c2v_new.reshape(b, -1)
        lq_new = chan + jnp.zeros_like(chan).at[:, gidx].add(delta)
        return lq_new, c2v_new

    lq0 = chan
    c2v0 = jnp.zeros((b, m, d, z), jnp.float32)
    lq, _ = jax.lax.fori_loop(0, n_iter, body, (lq0, c2v0))
    hard = (lq < 0).astype(jnp.int8)  # internal positive ⇒ 0
    return hard[:, :kb * z]


def _decode_layered(llrs: jnp.ndarray, bg: int, z: int, n_iter: int,
                    norm: float) -> jnp.ndarray:
    """Layered normalized min-sum: APP (lq) is updated row by row within
    an iteration (`lax.scan` over the base-graph rows), so each check sees
    the newest messages — converges in roughly half the flooded iteration
    count (the reference's `ldpc_decoder` layered variants)."""
    kb, m, nfull = bg_params(bg)
    gidx_np, mask_np, _ = _edge_structure(bg, z)
    b = llrs.shape[0]
    d = mask_np.shape[1]
    gidx_rows = jnp.asarray(gidx_np.reshape(m, d * z))
    mask = jnp.asarray(mask_np)  # (M, D, 1)
    chan = -llrs.astype(jnp.float32)

    def row_step(lq, xs):
        gi, mk, c2v_row = xs  # (D*Z,), (D,1), (B,D,Z)
        v2c = lq[:, gi].reshape(b, d, z) - c2v_row
        c2v_new = _minsum(v2c, mk, norm, axis=1)
        lq = lq.at[:, gi].add((c2v_new - c2v_row).reshape(b, -1))
        return lq, c2v_new

    def body(_, carry):
        lq, c2v = carry  # c2v (M, B, D, Z)
        return jax.lax.scan(row_step, lq, (gidx_rows, mask, c2v))

    c2v0 = jnp.zeros((m, b, d, z), jnp.float32)
    lq, _ = jax.lax.fori_loop(0, n_iter, body, (chan, c2v0))
    return (lq < 0).astype(jnp.int8)[:, :kb * z]


# --- rate matching (TS 38.212 §5.4.2.1, simplified: no Qm interleaver) ------


@functools.lru_cache(maxsize=256)
def _rm_indices(bg: int, z: int, e: int, rv: int, n_filler: int,
                k_prime: int) -> np.ndarray:
    """Circular-buffer indices into the (Nfull*Z,) codeword for E bits,
    skipping the first 2Z punctured columns and the <NULL> filler range
    [k_prime, K) (TS 38.212 §5.4.2.1)."""
    kb, _, nfull = bg_params(bg)
    n = (nfull - 2) * z
    k0_frac = {1: (0, 17, 33, 56), 2: (0, 13, 25, 43)}[bg][rv]
    k0 = (k0_frac * n // ((66 if bg == 1 else 50) * z)) * z  # multiple of Z
    pos = np.arange(n)
    src = pos + 2 * z  # index into the full codeword
    if n_filler:
        valid = ~((src >= k_prime) & (src < kb * z))
    else:
        valid = np.ones(n, bool)
    ring = np.nonzero(valid[(k0 + pos) % n])[0]
    sel = ((k0 + ring) % n)
    reps = (e + sel.size - 1) // sel.size
    return (np.tile(sel, reps)[:e] + 2 * z).astype(np.int64)


def rm_select(codeword: jnp.ndarray, bg: int, z: int, e: int, rv: int = 0,
              n_filler: int = 0, k_prime: int = 0) -> jnp.ndarray:
    """Bit selection from the circular buffer (first 2Z columns punctured,
    filler <NULL> positions skipped)."""
    idx = _rm_indices(bg, z, e, rv, n_filler, k_prime)
    return codeword[:, jnp.asarray(idx)]


def rm_collect(e_llr: jnp.ndarray, bg: int, z: int, rv: int = 0,
               n_filler: int = 0, k_prime: int = 0,
               softbuffer: jnp.ndarray | None = None) -> jnp.ndarray:
    """Soft-combine received LLRs back into the (Nfull*Z) buffer (HARQ)."""
    nfull = bg_params(bg)[2]
    e = e_llr.shape[-1]
    idx = _rm_indices(bg, z, e, rv, n_filler, k_prime)
    b = e_llr.shape[0]
    out = (jnp.zeros((b, nfull * z), jnp.float32) if softbuffer is None
           else softbuffer.astype(jnp.float32))
    return out.at[:, jnp.asarray(idx)].add(e_llr.astype(jnp.float32))
