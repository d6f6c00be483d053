"""Pallas TPU kernel: one windowed max-log-MAP half-iteration.

The XLA windowed decoder in ops/turbo.py spends its time in `lax.scan`
dispatch overhead — each 8-state ACS step is tiny while a whole
half-iteration is thousands of steps.  This kernel runs the entire
half-iteration per tile inside one Mosaic program:

- layout (8 states × N lanes), N = B·W windows flattened into the lane
  dimension — the state dimension sits in sublanes, every lane is an
  independent window;
- the 8-state ACS works on whole (8, NT) vregs: the predecessor
  permutation is one static row-restack, the branch metrics are constant
  (8, 1) masks broadcast against the (1, NT) gamma rows — no per-state
  scalar code, no gathers;
- the no-op masking that protects window 0 (alpha) / the last window
  (beta) is only needed during the T training steps, so the loop is split
  into a masked training loop and an unmasked body loop;
- alpha values for the window body are parked in a VMEM scratch buffer and
  consumed by the LLR computation as the backward sweep passes the same
  trellis indices.

Inputs are the per-window gamma streams and masks precomputed by
ops/turbo.py (identical to the XLA path), so the two backends are
numerically interchangeable; `interpret=True` is used on CPU in tests.

Tuning record (v5e, 1664 CBs of K=5824, L=112/T=32, one half-iteration):
v1 (this kernel) 5.5 ms @ tile 1024.  Probed and rejected: interleaved
alpha/beta with vectorised LLR pass (6.0 ms — extra beta stores outweigh
ILP), split-lane dual-chain v3 (5.3 ms micro but loses at full-decode
level; selectable via TURBO_KERNEL=v3), block gamma loads with static
row slices (5.7 ms — row loads are not the bottleneck), state permute
as (8,8) MXU matmul (7.6 ms — MXU latency lengthens the chain).  The
recursion is bound by the serial dependence of ~10 multi-vreg VPU stages
per trellis step; tile 1024 saturates issue width (512: +2%, 256: +17%).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=1)
def _tables():
    from srsran_4g_tpu.ops.turbo import _trellis

    return _trellis()


def _restack(x, order):
    """Static sublane permutation of an (8, NT) array."""
    return jnp.concatenate([x[s:s + 1, :] for s in order], axis=0)


def _const_col(vals, dtype=jnp.float32):
    """(8, 1) 0/1 column built in-kernel from a scalar bit pattern (Pallas
    kernels may not capture array constants)."""
    pattern = int(sum(int(v) << i for i, v in enumerate(vals)))
    iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    return ((pattern >> iota) & 1).astype(dtype)


@functools.lru_cache(maxsize=1)
def _tables_r4():
    """Radix-4 (two-trellis-steps-fused) tables.

    alpha: for each target state s, its 4 two-step predecessors and the
    (u1, p1, u2, p2) gamma coefficient bits of the unique 2-step path.
    beta: for each source state s and input pair j=(u1,u2), the state two
    steps ahead and the same coefficient bits.
    """
    t = _tables()
    ns, par = t["ns"], t["par"]
    a_pred = np.zeros((8, 4), np.int64)
    a_c = np.zeros((8, 4, 4), np.int64)
    fill = np.zeros(8, np.int64)
    for p in range(8):
        for u1 in (0, 1):
            m = ns[p, u1]
            for u2 in (0, 1):
                s = ns[m, u2]
                j = fill[s]
                a_pred[s, j] = p
                a_c[s, j] = (u1, par[p, u1], u2, par[m, u2])
                fill[s] += 1
    assert (fill == 4).all()
    b_ns = np.zeros((8, 4), np.int64)
    b_c = np.zeros((8, 4, 4), np.int64)
    for s in range(8):
        for u1 in (0, 1):
            m = ns[s, u1]
            for u2 in (0, 1):
                j = u1 * 2 + u2
                b_ns[s, j] = ns[m, u2]
                b_c[s, j] = (u1, par[s, u1], u2, par[m, u2])
    # path-labelled alpha tables: j = u1*2 + u2 names the 2-step input
    # pair; ns(.,u) is a bijection, so each (s, j) has a unique 2-step
    # predecessor p with ns(ns(p,u1),u2) = s.  With j fixed, u1/u2 are
    # compile-time constants and only the parity bits vary per state —
    # the kernel shares the u1*gs0 + u2*gs1 row across all 8 states.
    a2_pred = np.zeros((8, 4), np.int64)
    a2_p1 = np.zeros((8, 4), np.int64)
    a2_p2 = np.zeros((8, 4), np.int64)
    for u1 in (0, 1):
        for u2 in (0, 1):
            j = u1 * 2 + u2
            for p in range(8):
                m = ns[p, u1]
                s = ns[m, u2]
                a2_pred[s, j] = p
                a2_p1[s, j] = par[p, u1]
                a2_p2[s, j] = par[m, u2]
    b_p1 = np.zeros((8, 4), np.int64)
    b_p2 = np.zeros((8, 4), np.int64)
    for s in range(8):
        for u1 in (0, 1):
            m = ns[s, u1]
            for u2 in (0, 1):
                j = u1 * 2 + u2
                b_p1[s, j] = par[s, u1]
                b_p2[s, j] = par[m, u2]
    return dict(a_pred=a_pred, a_c=a_c, b_ns=b_ns, b_c=b_c,
                a2_pred=a2_pred, a2_p1=a2_p1, a2_p2=a2_p2,
                b_p1=b_p1, b_p2=b_p2)


def _make_kernel_v4(t_train: int, l_win: int, tile_n: int,
                    nof_b: int, nof_w: int):
    """Radix-4 half-iteration kernel.

    Two trellis steps per ACS: alpha_{k+2} = max over the 4 two-step
    predecessors of alpha_k + G_j, where the combined branch metric
    G_j = u1*gs_k + p1*gp_k + u2*gs_{k+1} + p2*gp_{k+1} is independent of
    alpha — so the gamma arithmetic runs OFF the serial dependence chain
    and the chain per trellis step is ~half the radix-2 kernel's
    (restack → add → 2-level max tree → periodic norm, per TWO steps).

    Other deltas vs v1 (all feeding the same numerics):
    - one shared gamma pair (l+2t rows) serves both sweeps — the alpha
      window [w*l-t, w*l+l) and beta window [w*l, w*l+l+t) overlap, so
      rows are indexed from both loops instead of materialising 4 arrays;
    - the training-freeze masks (window 0 for alpha / last window for
      beta) are lane-constant, computed from a lane iota — the two
      (T+L, N) mask arrays are gone entirely;
    - only even-k alphas are stored (halves VMEM scratch); odd-k alphas
      and the odd-k beta are recomputed during LLR emission with single
      unnormalised radix-2 steps, off the carry chain.

    Lane layout is (W, B) — window-major — so the host-side gather writes
    its natural (rows, W, B) order with no big transpose.
    """
    tab = _tables()
    r4 = _tables_r4()
    ns0 = tuple(int(v) for v in tab["ns"][:, 0])
    ns1 = tuple(int(v) for v in tab["ns"][:, 1])
    p0v, p1v = tab["par"][:, 0], tab["par"][:, 1]
    pred0 = tuple(int(v) for v in tab["pred"][:, 0])
    pred1 = tuple(int(v) for v in tab["pred"][:, 1])
    u0v, u1v = tab["pred_u"][:, 0], tab["pred_u"][:, 1]
    q0v, q1v = tab["pred_p"][:, 0], tab["pred_p"][:, 1]
    a_pred = [tuple(int(v) for v in r4["a_pred"][:, j]) for j in range(4)]
    a_c = r4["a_c"]
    b_ns = [tuple(int(v) for v in r4["b_ns"][:, j]) for j in range(4)]
    b_c = r4["b_c"]
    t2, l2 = t_train // 2, l_win // 2

    def kernel(gs, gp, a0, b0, out, astore):
        P0, P1 = _const_col(p0v), _const_col(p1v)
        U0, U1 = _const_col(u0v), _const_col(u1v)
        Q0, Q1 = _const_col(q0v), _const_col(q1v)
        AC = [[_const_col(a_c[:, j, c]) for c in range(4)] for j in range(4)]
        BC = [[_const_col(b_c[:, j, c]) for c in range(4)] for j in range(4)]

        base = pl.program_id(0) * tile_n
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1) + base
        # training-freeze masks: window 0 (alpha) / last window (beta)
        m_a = (lane >= nof_b).astype(jnp.float32)
        m_b = (lane < (nof_w - 1) * nof_b).astype(jnp.float32)

        def rows(r):
            return (gs[pl.ds(r, 1), :], gp[pl.ds(r, 1), :],
                    gs[pl.ds(r + 1, 1), :], gp[pl.ds(r + 1, 1), :])

        def alpha_r4(alpha, g0s, g0p, g1s, g1p, norm=True):
            cs = [
                _restack(alpha, a_pred[j])
                + (AC[j][0] * g0s + AC[j][1] * g0p
                   + AC[j][2] * g1s + AC[j][3] * g1p)
                for j in range(4)
            ]
            new = jnp.maximum(jnp.maximum(cs[0], cs[1]),
                              jnp.maximum(cs[2], cs[3]))
            if norm:
                new = new - jnp.max(new, axis=0, keepdims=True)
            return new

        def beta_r4(beta, g0s, g0p, g1s, g1p, norm=True):
            cs = [
                _restack(beta, b_ns[j])
                + (BC[j][0] * g0s + BC[j][1] * g0p
                   + BC[j][2] * g1s + BC[j][3] * g1p)
                for j in range(4)
            ]
            new = jnp.maximum(jnp.maximum(cs[0], cs[1]),
                              jnp.maximum(cs[2], cs[3]))
            if norm:
                new = new - jnp.max(new, axis=0, keepdims=True)
            return new

        def alpha_r2(alpha, gsv, gpv):
            # unnormalised — only feeds LLR differences
            c0 = _restack(alpha, pred0) + U0 * gsv + Q0 * gpv
            c1 = _restack(alpha, pred1) + U1 * gsv + Q1 * gpv
            return jnp.maximum(c0, c1)

        def beta_r2(beta, gsv, gpv):
            c0 = _restack(beta, ns0) + P0 * gpv
            c1 = _restack(beta, ns1) + gsv + P1 * gpv
            return jnp.maximum(c0, c1)

        def emit(idx, a_k, b_k1, gsv, gpv):
            t0 = a_k + _restack(b_k1, ns0) + P0 * gpv
            t1 = a_k + _restack(b_k1, ns1) + P1 * gpv
            out[pl.ds(idx, 1), :] = (jnp.max(t1, axis=0, keepdims=True)
                                     + gsv
                                     - jnp.max(t0, axis=0, keepdims=True))

        # ---- alpha: masked training then body storing even-k metrics ----
        def a_train(i, alpha):
            new = alpha_r4(alpha, *rows(2 * i))
            return m_a * new + (1.0 - m_a) * alpha

        alpha = jax.lax.fori_loop(0, t2, a_train, a0[:, :])

        def a_body(i, alpha):
            astore[pl.ds(i, 1)] = alpha[None]
            return alpha_r4(alpha, *rows(t_train + 2 * i))

        jax.lax.fori_loop(0, l2, a_body, alpha)

        # ---- beta: masked training ----
        def b_train(i, beta):
            new = beta_r4(beta, *rows(l_win + 2 * t_train - 2 - 2 * i))
            return m_b * new + (1.0 - m_b) * beta

        beta = jax.lax.fori_loop(0, t2, b_train, b0[:, :])

        # ---- beta body with fused two-LLR emission -----------------------
        def b_body(j, beta):
            # carry: beta at k_rel = l - 2j; emit LLRs at e+1 and e,
            # e = l - 2j - 2
            e = l_win - 2 * j - 2
            r = t_train + e
            g0s, g0p, g1s, g1p = rows(r)
            a_e = astore[pl.ds(l2 - 1 - j, 1)][0]
            a_o = alpha_r2(a_e, g0s, g0p)
            emit(e + 1, a_o, beta, g1s, g1p)
            b1 = beta_r2(beta, g1s, g1p)
            emit(e, a_e, b1, g0s, g0p)
            return beta_r4(beta, g0s, g0p, g1s, g1p)

        jax.lax.fori_loop(0, l2, b_body, beta)

    return kernel


def map_windowed_pallas_r4(
    gs_ext: jnp.ndarray,  # (L+2T, N) shared gamma (systematic+apriori)
    gp_ext: jnp.ndarray,  # (L+2T, N) shared parity gamma
    a_init: jnp.ndarray,  # (8, N)
    b_init: jnp.ndarray,  # (8, N)
    t_train: int,
    l_win: int,
    nof_b: int,
    nof_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Radix-4 path: returns LLRs (L, N), lanes in (W, B) order."""
    import os

    steps, n = gs_ext.shape
    assert steps == l_win + 2 * t_train
    # tile 512 = 4 vregs per (8, tile) value: ~10-15 live values fit the
    # physical vreg file; 1024 measurably spills (see module docstring)
    tile_n = int(os.environ.get("TURBO_TILE", "512"))
    if interpret:
        tile_n = min(tile_n, 256)
    if n % tile_n != 0:
        pad = tile_n - n % tile_n
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        gs_ext, gp_ext = padf(gs_ext), padf(gp_ext)
        a_init, b_init = padf(a_init), padf(b_init)
    np_ = gs_ext.shape[1]
    grid = (np_ // tile_n,)
    spec_g = pl.BlockSpec((steps, tile_n), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((8, tile_n), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    kernel = _make_kernel_v4(t_train, l_win, tile_n, nof_b, nof_w)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_g, spec_g, spec_i, spec_i],
        out_specs=pl.BlockSpec((l_win, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l_win, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((l_win // 2, 8, tile_n), jnp.float32)],
        interpret=interpret,
    )(gs_ext, gp_ext, a_init, b_init)
    return out[:, :n]


def _make_kernel_v5(t_train: int, l_win: int, tile_n: int,
                    nof_b: int, nof_w: int, unroll: int):
    """Sweep-only radix-4 kernel: interleaved alpha+beta chains, LLRs off.

    The v4 kernel's beta body carries ~2x the ops of a pure sweep because
    the LLR emission (two emits + two radix-2 recomputes per iteration)
    rides the serial dependence chain, and the whole program is one chain
    so the VPU's issue slots sit idle waiting on it.  v5 restructures:

    - the kernel runs ONLY the two radix-4 recursions, *interleaved in one
      loop* — alpha sweeps forward while beta sweeps backward, two
      independent dependence chains for the VLIW scheduler to overlap;
    - it stores the even-k alpha (k_rel = 0,2,..,L-2) and even-k beta
      (k_rel = 2,4,..,L) metrics as kernel *outputs*; the LLR emission —
      embarrassingly parallel across trellis positions — happens afterwards
      in the `emit_llr_pallas` kernel below at full VPU width;
    - gamma rows are packed host-side as (S/2, 2, N) so one dynamic load
      fetches both rows of a radix-4 step (every step's row pair is
      (even, even+1) for even T/L), halving the dynamic-slice traffic that
      Mosaic schedules poorly;
    - metric normalisation subtracts the state-0 row (1 op) instead of the
      max-reduce (4 ops); the constant cancels in the LLR differences.
    """
    r4 = _tables_r4()
    a2_pred = [tuple(int(v) for v in r4["a2_pred"][:, j]) for j in range(4)]
    a2_p1, a2_p2 = r4["a2_p1"], r4["a2_p2"]
    b_ns = [tuple(int(v) for v in r4["b_ns"][:, j]) for j in range(4)]
    b_p2 = r4["b_p2"]
    t2, l2 = t_train // 2, l_win // 2
    assert l2 % unroll == 0
    tab = _tables()
    par0, par1 = tab["par"][:, 0], tab["par"][:, 1]

    def kernel(g2s, g2p, a0, b0, astore, bstore):
        AP1 = [_const_col(a2_p1[:, j]) for j in range(4)]
        AP2 = [_const_col(a2_p2[:, j]) for j in range(4)]
        BP2 = [_const_col(b_p2[:, j]) for j in range(4)]
        P0, P1 = _const_col(par0), _const_col(par1)

        base = pl.program_id(0) * tile_n
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1) + base
        m_a = lane >= nof_b  # train-freeze: window 0 (alpha)
        m_b = lane < (nof_w - 1) * nof_b  # last window (beta)

        def rows2(i):
            # one load -> both gamma rows (2i, 2i+1) of each stream
            gs = g2s[pl.ds(i, 1)]
            gp = g2p[pl.ds(i, 1)]
            return gs[0, 0:1, :], gp[0, 0:1, :], gs[0, 1:2, :], gp[0, 1:2, :]

        def alpha_r4(alpha, g0s, g0p, g1s, g1p):
            # path-labelled candidates j = (u1, u2): the u-part of the
            # branch metric is a per-j shared row; only the parity masks
            # are per-state.  4 restacks + 8 masked gp terms + 1 row add.
            s11 = g0s + g1s
            rows = (None, g1s, g0s, s11)  # u1*gs0 + u2*gs1 by j
            cs = []
            for j in range(4):
                c = _restack(alpha, a2_pred[j]) \
                    + (AP1[j] * g0p + AP2[j] * g1p)
                if rows[j] is not None:
                    c = c + rows[j]
                cs.append(c)
            new = jnp.maximum(jnp.maximum(cs[0], cs[1]),
                              jnp.maximum(cs[2], cs[3]))
            return new - new[0:1, :]

        def beta_r4(beta, g0s, g0p, g1s, g1p):
            # j = (u1, u2); par(s, u1) only depends on u1 -> 2 shared
            # gp0 terms; par(ns(s,u1), u2) -> 4 per-j gp1 terms.
            s11 = g0s + g1s
            rows = (None, g1s, g0s, s11)
            t1 = (P0 * g0p, P1 * g0p)
            cs = []
            for j in range(4):
                c = _restack(beta, b_ns[j]) + (t1[j // 2] + BP2[j] * g1p)
                if rows[j] is not None:
                    c = c + rows[j]
                cs.append(c)
            new = jnp.maximum(jnp.maximum(cs[0], cs[1]),
                              jnp.maximum(cs[2], cs[3]))
            return new - new[0:1, :]

        # ---- interleaved masked training --------------------------------
        def train(i, carry):
            alpha, beta = carry
            na = alpha_r4(alpha, *rows2(i))
            nb = beta_r4(beta, *rows2(l2 + t_train - 1 - i))
            return (jnp.where(m_a, na, alpha), jnp.where(m_b, nb, beta))

        alpha, beta = jax.lax.fori_loop(0, t2, train, (a0[:, :], b0[:, :]))

        # ---- interleaved body storing even-k metrics --------------------
        def body(jj, carry):
            alpha, beta = carry
            for u in range(unroll):
                j = jj * unroll + u
                astore[pl.ds(j, 1)] = alpha[None]
                bstore[pl.ds(l2 - 1 - j, 1)] = beta[None]
                alpha = alpha_r4(alpha, *rows2(t2 + j))
                beta = beta_r4(beta, *rows2(t2 + l2 - 1 - j))
            return alpha, beta

        jax.lax.fori_loop(0, l2 // unroll, body, (alpha, beta))

    return kernel


def map_windowed_pallas_v5(
    gs_ext: jnp.ndarray,  # (L+2T, N) shared gamma (systematic+apriori)
    gp_ext: jnp.ndarray,  # (L+2T, N) shared parity gamma
    a_init: jnp.ndarray,  # (8, N)
    b_init: jnp.ndarray,  # (8, N)
    t_train: int,
    l_win: int,
    nof_b: int,
    nof_w: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sweep-only radix-4 path: returns (astore, bstore), each
    (L/2, 8, N) — alpha at k_rel=2i / beta at k_rel=2i+2, lanes (W, B)."""
    import os

    steps, n = gs_ext.shape
    assert steps == l_win + 2 * t_train
    assert steps % 2 == 0
    tile_n = int(os.environ.get("TURBO_TILE", "512"))
    if interpret:
        tile_n = min(tile_n, 256)
    unroll = max(1, int(os.environ.get("TURBO_UNROLL", "4")))
    if (l_win // 2) % unroll != 0:
        unroll = 1
    if n % tile_n != 0:
        pad = tile_n - n % tile_n
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        gs_ext, gp_ext = padf(gs_ext), padf(gp_ext)
        a_init, b_init = padf(a_init), padf(b_init)
    np_ = gs_ext.shape[1]
    g2s = gs_ext.reshape(steps // 2, 2, np_)
    g2p = gp_ext.reshape(steps // 2, 2, np_)
    grid = (np_ // tile_n,)
    l2 = l_win // 2
    spec_g = pl.BlockSpec((steps // 2, 2, tile_n), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((8, tile_n), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((l2, 8, tile_n), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    kernel = _make_kernel_v5(t_train, l_win, tile_n, nof_b, nof_w, unroll)
    astore, bstore = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_g, spec_g, spec_i, spec_i],
        out_specs=[spec_o, spec_o],
        out_shape=[jax.ShapeDtypeStruct((l2, 8, np_), jnp.float32),
                   jax.ShapeDtypeStruct((l2, 8, np_), jnp.float32)],
        interpret=interpret,
    )(g2s, g2p, a_init, b_init)
    return astore[:, :, :n], bstore[:, :, :n]


@functools.lru_cache(maxsize=1)
def _tables_v6():
    """Combo-row selectors for the states-as-registers (v6) kernel.

    In v6 the 8 state metrics live in 8 separate kernel variables, so the
    trellis 'permutation' is free (it is just which variable feeds which
    max) and the per-(state, candidate) branch metric u*gs + p*gp reduces
    to adding one of the precomputed rows {None, gs, gp, gs+gp}, selected
    by a compile-time index."""
    t = _tables()
    ns, par = t["ns"], t["par"]
    pred, pu, pp = t["pred"], t["pred_u"], t["pred_p"]
    # alpha: candidate c of target s adds combo pu*1 + pp*2
    a_src = [[int(pred[s, c]) for c in range(2)] for s in range(8)]
    a_cmb = [[int(pu[s, c]) + 2 * int(pp[s, c]) for c in range(2)]
             for s in range(8)]
    # beta: candidate u of source s reads ns[s,u], adds u*gs + par*gp
    b_src = [[int(ns[s, u]) for u in range(2)] for s in range(8)]
    b_cmb = [[u + 2 * int(par[s, u]) for u in range(2)] for s in range(8)]
    return dict(a_src=a_src, a_cmb=a_cmb, b_src=b_src, b_cmb=b_cmb)


def _make_kernel_v6(t_train: int, l_win: int, tile_c: int,
                    nof_b: int, nof_w: int):
    """States-as-registers radix-2 kernel (the fast path).

    Probe result (tools/turbo_probe6.py): the (8, N) sublane layout is
    bound by the `_restack` state permutation — a skeleton with ONLY the
    restack+max chain runs as slowly as the full ACS.  v6 eliminates
    restacks entirely: the lane dim is folded to (8, N/8) full-density
    tiles and each of the 8 state metrics is its own kernel variable, so
    the predecessor wiring is static dataflow between variables, branch
    metrics are one add of a precomputed row, and the VPU sees 16
    independent dependence chains (8 states x fwd/bwd).
    """
    v6 = _tables_v6()
    a_src, a_cmb = v6["a_src"], v6["a_cmb"]
    b_src, b_cmb = v6["b_src"], v6["b_cmb"]
    t2, l2 = t_train // 2, l_win // 2
    s_all = l_win + 2 * t_train

    def kernel(g, a0, b0, astore, bstore):
        # g: (S, 2, 8, C) rows; [r, 0] = systematic(+apriori), [r, 1] = parity
        col = jax.lax.broadcasted_iota(jnp.int32, (8, tile_c), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, tile_c), 0)
        lane = sub * (pl.num_programs(0) * tile_c) + pl.program_id(0) * tile_c + col
        m_a = lane >= nof_b  # train-freeze: window 0 (alpha)
        m_b = lane < (nof_w - 1) * nof_b  # last window (beta)

        def rows(r):
            blk = g[pl.ds(r, 1)]  # (1, 2, 8, C)
            gs = blk[0, 0]
            gp = blk[0, 1]
            return (None, gs, gp, gs + gp)

        def astep(a, combos):
            return [jnp.maximum(
                a[a_src[s][0]] + combos[a_cmb[s][0]]
                if a_cmb[s][0] else a[a_src[s][0]],
                a[a_src[s][1]] + combos[a_cmb[s][1]]
                if a_cmb[s][1] else a[a_src[s][1]],
            ) for s in range(8)]

        def bstep(b, combos):
            return [jnp.maximum(
                b[b_src[s][0]] + combos[b_cmb[s][0]]
                if b_cmb[s][0] else b[b_src[s][0]],
                b[b_src[s][1]] + combos[b_cmb[s][1]]
                if b_cmb[s][1] else b[b_src[s][1]],
            ) for s in range(8)]

        def norm(x):
            z = x[0]
            return [v - z for v in x]

        # ---- interleaved masked training (pairs of trellis steps) -------
        def train(i, carry):
            a, b = carry
            na = astep(astep(a, rows(2 * i)), rows(2 * i + 1))
            nb = bstep(bstep(b, rows(s_all - 1 - 2 * i)),
                       rows(s_all - 2 - 2 * i))
            a = [jnp.where(m_a, x, y) for x, y in zip(na, a)]
            b = [jnp.where(m_b, x, y) for x, y in zip(nb, b)]
            return a, b

        a = [a0[s] for s in range(8)]
        b = [b0[s] for s in range(8)]
        a, b = jax.lax.fori_loop(0, t2, train, (a, b))

        # ---- interleaved body: store even-k metrics, 2 steps per iter ---
        def body(j, carry):
            a, b = carry
            for s in range(8):
                astore[pl.ds(j, 1), s] = a[s][None]
                bstore[pl.ds(l2 - 1 - j, 1), s] = b[s][None]
            a = astep(astep(a, rows(t_train + 2 * j)),
                      rows(t_train + 2 * j + 1))
            b = bstep(bstep(b, rows(t_train + l_win - 1 - 2 * j)),
                      rows(t_train + l_win - 2 - 2 * j))
            a, b = norm(a), norm(b)
            return a, b

        jax.lax.fori_loop(0, l2, body, (a, b))

    return kernel


def _make_emit_kernel_v6(j_blk: int):
    """LLR emission for v6: states-as-registers, no restacks, fully
    parallel across position pairs."""
    t = _tables()
    ns0 = [int(v) for v in t["ns"][:, 0]]
    ns1 = [int(v) for v in t["ns"][:, 1]]
    p0 = [int(v) for v in t["par"][:, 0]]
    p1 = [int(v) for v in t["par"][:, 1]]
    v6 = _tables_v6()
    a_src, a_cmb = v6["a_src"], v6["a_cmb"]
    b_src, b_cmb = v6["b_src"], v6["b_cmb"]

    def kernel(g, ast, bst, out):
        def treemax(xs):
            while len(xs) > 1:
                xs = [jnp.maximum(xs[i], xs[i + 1])
                      for i in range(0, len(xs) - 1, 2)] + (
                          [xs[-1]] if len(xs) % 2 else [])
            return xs[0]

        for j in range(j_blk):
            ges, gep = g[j, 0, 0], g[j, 0, 1]
            gos, gop = g[j, 1, 0], g[j, 1, 1]
            ce = (None, ges, gep, ges + gep)
            co = (None, gos, gop, gos + gop)
            a_e = [ast[j, s] for s in range(8)]
            b_e = [bst[j, s] for s in range(8)]
            # odd-position metrics: one unnormalised radix-2 step each
            a_o = [jnp.maximum(
                a_e[a_src[s][0]] + ce[a_cmb[s][0]]
                if a_cmb[s][0] else a_e[a_src[s][0]],
                a_e[a_src[s][1]] + ce[a_cmb[s][1]]
                if a_cmb[s][1] else a_e[a_src[s][1]],
            ) for s in range(8)]
            b_o = [jnp.maximum(
                b_e[b_src[s][0]] + co[b_cmb[s][0]]
                if b_cmb[s][0] else b_e[b_src[s][0]],
                b_e[b_src[s][1]] + co[b_cmb[s][1]]
                if b_cmb[s][1] else b_e[b_src[s][1]],
            ) for s in range(8)]

            def emit(a, b1, gsv, gpv):
                bp = [b1[x] + gpv for x in range(8)]
                m1 = treemax([a[s] + (bp if p1[s] else b1)[ns1[s]]
                              for s in range(8)])
                m0 = treemax([a[s] + (bp if p0[s] else b1)[ns0[s]]
                              for s in range(8)])
                return m1 + gsv - m0

            out[j, 0] = emit(a_e, b_o, ges, gep)
            out[j, 1] = emit(a_o, b_e, gos, gop)

    return kernel


def _make_kernel_v7(t_train: int, l_win: int, tile_c: int,
                    nof_b: int, nof_w: int, radix4: bool = False,
                    n_sub: int = 8, train_norm: bool = False,
                    unroll: int = 1):
    """States-as-registers radix-2 kernel with FUSED two-phase emission.

    v6's sweep eliminated the `_restack` bottleneck but paid for it with
    full (L/2, 8, 8, C) alpha+beta stores and a second emission kernel.
    v7 keeps the states-as-registers chains interleaved (alpha forward,
    beta backward — two independent dependence chains) and splits the
    body at the midpoint:

      phase 1 (j < L/4): advance both chains, storing only the FIRST
        half of each (astore/bstore are (L/4)-deep scratch);
      phase 2 (j >= L/4): keep advancing both chains and emit four LLRs
        per iteration — the alpha side emits the second-half position
        pairs against the phase-1 beta store, the beta side emits the
        first-half pairs against the phase-1 alpha store.  The odd-
        position metrics reuse the chains' own half-steps, so emission
        adds only one off-chain radix-2 step + two 8-way max trees per
        side and the VLIW scheduler fills the sweep chains' idle issue
        slots with it.
    """
    v6 = _tables_v6()
    a_src, a_cmb = v6["a_src"], v6["a_cmb"]
    b_src, b_cmb = v6["b_src"], v6["b_cmb"]
    t = _tables()
    ns0 = [int(v) for v in t["ns"][:, 0]]
    ns1 = [int(v) for v in t["ns"][:, 1]]
    p0 = [int(v) for v in t["par"][:, 0]]
    p1 = [int(v) for v in t["par"][:, 1]]
    r4 = _tables_r4()
    a2_pred = [[int(v) for v in r4["a2_pred"][s]] for s in range(8)]
    a2_k = [[2 * int(r4["a2_p1"][s][j]) + int(r4["a2_p2"][s][j])
             for j in range(4)] for s in range(8)]
    b4_ns = [[int(v) for v in r4["b_ns"][s]] for s in range(8)]
    b4_k = [[2 * int(r4["b_p1"][s][j]) + int(r4["b_p2"][s][j])
             for j in range(4)] for s in range(8)]
    t2, l2 = t_train // 2, l_win // 2
    h = l2 // 2
    s_all = l_win + 2 * t_train

    def kernel(g, a0, b0, out, astore, bstore):
        # g: (S, 2, n_sub, C); [r, 0] = systematic(+apriori), [r, 1] = parity
        col = jax.lax.broadcasted_iota(jnp.int32, (n_sub, tile_c), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (n_sub, tile_c), 0)
        lane = (sub * (pl.num_programs(0) * tile_c)
                + pl.program_id(0) * tile_c + col)
        m_a = lane >= nof_b                  # train-freeze: window 0
        m_b = lane < (nof_w - 1) * nof_b     # last window

        def rows(r):
            blk = g[pl.ds(r, 1)]
            gs = blk[0, 0]
            gp = blk[0, 1]
            return (None, gs, gp, gs + gp)

        def astep(a, combos):
            return [jnp.maximum(
                a[a_src[s][0]] + combos[a_cmb[s][0]]
                if a_cmb[s][0] else a[a_src[s][0]],
                a[a_src[s][1]] + combos[a_cmb[s][1]]
                if a_cmb[s][1] else a[a_src[s][1]],
            ) for s in range(8)]

        def bstep(b, combos):
            return [jnp.maximum(
                b[b_src[s][0]] + combos[b_cmb[s][0]]
                if b_cmb[s][0] else b[b_src[s][0]],
                b[b_src[s][1]] + combos[b_cmb[s][1]]
                if b_cmb[s][1] else b[b_src[s][1]],
            ) for s in range(8)]

        def norm(x):
            z = x[0]
            return [v - z for v in x]

        def treemax(xs):
            while len(xs) > 1:
                xs = [jnp.maximum(xs[i], xs[i + 1])
                      for i in range(0, len(xs) - 1, 2)] + (
                          [xs[-1]] if len(xs) % 2 else [])
            return xs[0]

        def emit(a, b1, combos):
            # LLR at the position of `a` given beta at the NEXT position
            gs, gp = combos[1], combos[2]
            bp = [b1[x] + gp for x in range(8)]
            m1 = treemax([a[s] + (bp if p1[s] else b1)[ns1[s]]
                          for s in range(8)])
            m0 = treemax([a[s] + (bp if p0[s] else b1)[ns0[s]]
                          for s in range(8)])
            return m1 + gs - m0

        # ---- radix-4: one fused two-step ACS (chain depth 3 vs 4) -------
        def combos4(c0, c1):
            """Memoised u-row + parity-row sums for one row pair."""
            u = (None, c1[1], c0[1], c0[1] + c1[1])
            p = (None, c1[2], c0[2], c0[2] + c1[2])
            cache = {}

            def get(j, k):
                if (j, k) not in cache:
                    a, b = u[j], p[k]
                    cache[(j, k)] = (b if a is None else
                                     (a if b is None else a + b))
                return cache[(j, k)]
            return get

        def astep4(a, get):
            out = []
            for s in range(8):
                cs = []
                for j in range(4):
                    c = get(j, a2_k[s][j])
                    x = a[a2_pred[s][j]]
                    cs.append(x if c is None else x + c)
                out.append(jnp.maximum(jnp.maximum(cs[0], cs[1]),
                                       jnp.maximum(cs[2], cs[3])))
            return out

        def bstep4(b, get):
            out = []
            for s in range(8):
                cs = []
                for j in range(4):
                    c = get(j, b4_k[s][j])
                    x = b[b4_ns[s][j]]
                    cs.append(x if c is None else x + c)
                out.append(jnp.maximum(jnp.maximum(cs[0], cs[1]),
                                       jnp.maximum(cs[2], cs[3])))
            return out

        def advance_a(a, c0, c1):
            if radix4:
                return astep4(a, combos4(c0, c1))
            return astep(astep(a, c0), c1)

        def advance_b(b, c0, c1):
            # c0/c1 = rows (even, even+1) of the pair; beta moves from
            # k_rel = even+2 down to even
            if radix4:
                return bstep4(b, combos4(c0, c1))
            return bstep(bstep(b, c1), c0)

        # ---- interleaved masked training (pairs of trellis steps) -------
        def train(i, carry):
            a, b = carry
            na = advance_a(a, rows(2 * i), rows(2 * i + 1))
            nb = advance_b(b, rows(s_all - 2 - 2 * i),
                           rows(s_all - 1 - 2 * i))
            if train_norm:
                # bf16 (v9): keep absolute metric magnitude at the state
                # SPREAD, not the accumulated path sum — otherwise 2T
                # un-normalised steps push metrics past the point where
                # the bf16 quantum (2^-8 relative) swamps the ~1-scale
                # differences that decide the max-log path.
                na, nb = norm(na), norm(nb)
            a = [jnp.where(m_a, x, y) for x, y in zip(na, a)]
            b = [jnp.where(m_b, x, y) for x, y in zip(nb, b)]
            return a, b

        def unrolled(lo, hi, body, carry):
            # manual unroll (Mosaic's fori_loop only lowers unroll=1 or
            # full): keeps the 16 loop-carried state tiles in vregs
            # across the unrolled span instead of a VMEM round-trip per
            # iteration
            n, u = hi - lo, unroll
            while n % u:
                u -= 1
            if u <= 1:
                return jax.lax.fori_loop(lo, hi, body, carry)

            def blk(i, c):
                for k in range(u):
                    c = body(lo + i * u + k, c)
                return c
            return jax.lax.fori_loop(0, n // u, blk, carry)

        a = [a0[s] for s in range(8)]
        b = [b0[s] for s in range(8)]
        a, b = unrolled(0, t2, train, (a, b))

        # ---- phase 1: advance + store the first half of each chain ------
        def phase1(j, carry):
            a, b = carry
            for s in range(8):
                astore[pl.ds(j, 1), s] = a[s][None]
                bstore[pl.ds(j, 1), s] = b[s][None]
            a = advance_a(a, rows(t_train + 2 * j),
                          rows(t_train + 2 * j + 1))
            b = advance_b(b, rows(t_train + l_win - 2 - 2 * j),
                          rows(t_train + l_win - 1 - 2 * j))
            return norm(a), norm(b)

        a, b = unrolled(0, h, phase1, (a, b))

        # ---- phase 2: advance + fused 4-LLR emission per iteration ------
        def phase2(j, carry):
            a, b = carry
            # alpha side: a = alpha(2j); emit pair (2j, 2j+1) against the
            # stored beta(2j+2) from beta-iteration l2-1-j
            ca0 = rows(t_train + 2 * j)
            ca1 = rows(t_train + 2 * j + 1)
            bsl = [bstore[pl.ds(l2 - 1 - j, 1), s][0] for s in range(8)]
            b1 = bstep(bsl, ca1)
            out[pl.ds(j, 1), 0] = emit(a, b1, ca0)[None].astype(jnp.float32)
            a_o = astep(a, ca0)
            out[pl.ds(j, 1), 1] = emit(a_o, bsl, ca1)[None].astype(jnp.float32)
            # beta side: b = beta(L-2j); emit pair e = L-2j-2 against the
            # stored alpha(e) from alpha-iteration l2-1-j
            cb1 = rows(t_train + l_win - 1 - 2 * j)   # row e+1
            cb0 = rows(t_train + l_win - 2 - 2 * j)   # row e
            b1b = bstep(b, cb1)          # beta(e+1); off-chain when radix4
            asl = [astore[pl.ds(l2 - 1 - j, 1), s][0] for s in range(8)]
            out[pl.ds(l2 - 1 - j, 1), 0] = (
                emit(asl, b1b, cb0)[None].astype(jnp.float32))
            a_ob = astep(asl, cb0)
            out[pl.ds(l2 - 1 - j, 1), 1] = (
                emit(a_ob, b, cb1)[None].astype(jnp.float32))
            # advance both chains
            a = norm(advance_a(a, ca0, ca1))
            b = norm(bstep(b1b, cb0) if not radix4
                     else advance_b(b, cb0, cb1))
            return a, b

        unrolled(h, l2, phase2, (a, b))

    return kernel


def map_windowed_pallas_v7(
    gs_ext: jnp.ndarray,  # (L+2T, N) shared gamma (systematic+apriori)
    gp_ext: jnp.ndarray,  # (L+2T, N) shared parity gamma
    a_init: jnp.ndarray,  # (8, N)
    b_init: jnp.ndarray,  # (8, N)
    t_train: int,
    l_win: int,
    nof_b: int,
    nof_w: int,
    interpret: bool = False,
    radix4: bool = False,
) -> jnp.ndarray:
    """Fused states-as-registers path (see _make_kernel_v7); radix4=True
    selects the v8 variant (fused two-step ACS, chain depth 3 vs 4).
    Returns LLRs (L, N), lanes in the caller's order."""
    import os

    steps, n = gs_ext.shape
    assert steps == l_win + 2 * t_train and steps % 2 == 0
    assert l_win % 4 == 0, "v7 splits the body at the midpoint"
    l2 = l_win // 2
    h = l2 // 2
    tile_c = max(8, int(os.environ.get("TURBO_TILE_C", "256")))
    # double-buffered blocks: gamma in + LLR out; scratch (stores) single
    vmem_budget = 15 * 1024 * 1024
    def _bytes(tc):
        dbuf = 4 * tc * (steps * 2 * 8 + l2 * 2 * 8)
        scratch = 4 * tc * (2 * h * 8 * 8 + 2 * 8 * 8)
        return 2 * dbuf + scratch
    while tile_c > 8 and _bytes(tile_c) > vmem_budget:
        tile_c //= 2
    if interpret:
        tile_c = min(tile_c, 128)
    fold = 8 * tile_c
    if n % fold != 0:
        pad = fold - n % fold
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        gs_ext, gp_ext = padf(gs_ext), padf(gp_ext)
        a_init, b_init = padf(a_init), padf(b_init)
    np_ = gs_ext.shape[1]
    c = np_ // 8
    g = jnp.stack([gs_ext.reshape(steps, 8, c),
                   gp_ext.reshape(steps, 8, c)], axis=1)  # (S, 2, 8, C)
    a0 = a_init.reshape(8, 8, c)
    b0 = b_init.reshape(8, 8, c)

    grid = (c // tile_c,)
    spec_g = pl.BlockSpec((steps, 2, 8, tile_c), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((8, 8, tile_c), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    kernel = _make_kernel_v7(t_train, l_win, tile_c, nof_b, nof_w,
                             radix4=radix4)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_g, spec_i, spec_i],
        out_specs=pl.BlockSpec((l2, 2, 8, tile_c),
                               lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l2, 2, 8, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h, 8, 8, tile_c), jnp.float32),
            pltpu.VMEM((h, 8, 8, tile_c), jnp.float32),
        ],
        interpret=interpret,
    )(g, a0, b0)
    return out.reshape(l_win, np_)[:, :n]


def map_windowed_pallas_v9(
    gs_ext: jnp.ndarray,  # (L+2T, N) shared gamma (systematic+apriori)
    gp_ext: jnp.ndarray,  # (L+2T, N) shared parity gamma
    a_init: jnp.ndarray,  # (8, N)
    b_init: jnp.ndarray,  # (8, N)
    t_train: int,
    l_win: int,
    nof_b: int,
    nof_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """bf16 lane-paired v7: the same fused states-as-registers dataflow
    with the lane dim folded to SIXTEEN sublanes per bf16 vreg (16, C)
    instead of eight f32 (8, C) — tools/turbo_probe7.py measured packed
    bf16 elementwise at 1.95x f32 element throughput on the VPU, so each
    ACS/max op advances 2x the code-block lanes.  Metrics are normalised
    every pair of trellis steps INCLUDING training (see train_norm in
    _make_kernel_v7) so values stay at the state-spread scale where the
    bf16 quantum (~2^-8 relative) is far below the max-log decision
    margins; LLRs are emitted in f32.  Mirrors the reference's reduced-
    precision decoders (turbodecoder.c:35-90 16-bit/8-bit SSE-AVX
    paths).  Returns LLRs (L, N), lanes in the caller's order."""
    import os

    steps, n = gs_ext.shape
    assert steps == l_win + 2 * t_train and steps % 2 == 0
    assert l_win % 4 == 0, "v9 splits the body at the midpoint"
    l2 = l_win // 2
    h = l2 // 2
    tile_c = max(8, int(os.environ.get("TURBO_TILE_C", "256")))
    # double-buffered blocks: gamma in (bf16) + LLR out (f32); scratch
    # (bf16 stores) single-buffered
    vmem_budget = 15 * 1024 * 1024
    def _bytes(tc):
        dbuf = tc * (steps * 2 * 16 * 2 + l2 * 2 * 16 * 4)
        scratch = tc * (2 * h * 8 * 16 * 2 + 2 * 8 * 16 * 2)
        return 2 * dbuf + scratch
    while tile_c > 8 and _bytes(tile_c) > vmem_budget:
        tile_c //= 2
    if interpret:
        tile_c = min(tile_c, 128)
    fold = 16 * tile_c
    if n % fold != 0:
        pad = fold - n % fold
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        gs_ext, gp_ext = padf(gs_ext), padf(gp_ext)
        a_init, b_init = padf(a_init), padf(b_init)
    np_ = gs_ext.shape[1]
    c = np_ // 16
    bf = jnp.bfloat16
    g = jnp.stack([gs_ext.reshape(steps, 16, c),
                   gp_ext.reshape(steps, 16, c)], axis=1).astype(bf)
    a0 = a_init.reshape(8, 16, c).astype(bf)
    b0 = b_init.reshape(8, 16, c).astype(bf)

    grid = (c // tile_c,)
    spec_g = pl.BlockSpec((steps, 2, 16, tile_c), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((8, 16, tile_c), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    unroll = max(1, int(os.environ.get("TURBO_UNROLL", "1")))
    kernel = _make_kernel_v7(t_train, l_win, tile_c, nof_b, nof_w,
                             n_sub=16, train_norm=True, unroll=unroll)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_g, spec_i, spec_i],
        out_specs=pl.BlockSpec((l2, 2, 16, tile_c),
                               lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l2, 2, 16, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h, 8, 16, tile_c), bf),
            pltpu.VMEM((h, 8, 16, tile_c), bf),
        ],
        interpret=interpret,
    )(g, a0, b0)
    return out.reshape(l_win, np_)[:, :n]


def map_windowed_pallas_v6(
    gs_ext: jnp.ndarray,  # (L+2T, N) shared gamma (systematic+apriori)
    gp_ext: jnp.ndarray,  # (L+2T, N) shared parity gamma
    a_init: jnp.ndarray,  # (8, N)
    b_init: jnp.ndarray,  # (8, N)
    t_train: int,
    l_win: int,
    nof_b: int,
    nof_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """States-as-registers path: sweep kernel + parallel emission.
    Returns LLRs (L, N), lanes in the caller's order."""
    import os

    steps, n = gs_ext.shape
    assert steps == l_win + 2 * t_train and steps % 2 == 0
    l2 = l_win // 2
    tile_c = max(8, int(os.environ.get("TURBO_TILE_C", "256")))
    # Mosaic double-buffers every block DMA, so the scoped-VMEM footprint is
    # ~2x the per-tile block bytes: gamma (S,2,8,Tc) + 2 inits (8,8,Tc) +
    # astore/bstore (L/2,8,8,Tc), all f32.  Clamp Tc so 2x fits the 16 MB
    # scoped-VMEM limit — this is the exact failure that crashed round 3's
    # bench (19.75 MB > 16 MB at Tc=256, L=192).
    vmem_budget = 15 * 1024 * 1024
    def _tile_bytes(tc):
        return 4 * tc * (steps * 2 * 8 + 2 * 8 * 8 + 2 * l2 * 8 * 8)
    while tile_c > 8 and 2 * _tile_bytes(tile_c) > vmem_budget:
        tile_c //= 2
    if interpret:
        tile_c = min(tile_c, 128)
    j_blk = max(1, int(os.environ.get("TURBO_EMIT_BLK", "8")))
    while l2 % j_blk != 0:
        j_blk //= 2
    fold = 8 * tile_c
    if n % fold != 0:
        pad = fold - n % fold
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        gs_ext, gp_ext = padf(gs_ext), padf(gp_ext)
        a_init, b_init = padf(a_init), padf(b_init)
    np_ = gs_ext.shape[1]
    c = np_ // 8
    # fold lanes: (..., N) -> (..., 8, C) row-major; in-kernel masks use
    # lane = sub*C + col
    g = jnp.stack([gs_ext.reshape(steps, 8, c),
                   gp_ext.reshape(steps, 8, c)], axis=1)  # (S, 2, 8, C)
    a0 = a_init.reshape(8, 8, c)
    b0 = b_init.reshape(8, 8, c)

    grid = (c // tile_c,)
    spec_g = pl.BlockSpec((steps, 2, 8, tile_c), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((8, 8, tile_c), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((l2, 8, 8, tile_c), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    kernel = _make_kernel_v6(t_train, l_win, tile_c, nof_b, nof_w)
    astore, bstore = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_g, spec_i, spec_i],
        out_specs=[spec_m, spec_m],
        out_shape=[jax.ShapeDtypeStruct((l2, 8, 8, c), jnp.float32)] * 2,
        interpret=interpret,
    )(g, a0, b0)

    # body gamma pairs for emission: (l2, 2 pos-parity, 2 stream, 8, C)
    gb = g[t_train:t_train + l_win].reshape(l2, 2, 2, 8, c)
    spec_ge = pl.BlockSpec((j_blk, 2, 2, 8, tile_c),
                           lambda j, i: (j, 0, 0, 0, i),
                           memory_space=pltpu.VMEM)
    spec_me = pl.BlockSpec((j_blk, 8, 8, tile_c),
                           lambda j, i: (j, 0, 0, i),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_emit_kernel_v6(j_blk),
        grid=(l2 // j_blk, c // tile_c),
        in_specs=[spec_ge, spec_me, spec_me],
        out_specs=pl.BlockSpec((j_blk, 2, 8, tile_c),
                               lambda j, i: (j, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l2, 2, 8, c), jnp.float32),
        interpret=interpret,
    )(gb, astore, bstore)
    return out.reshape(l_win, np_)[:, :n]


def _make_emit_kernel(tile_n: int, j_blk: int):
    """Parallel LLR emission: one grid cell per (j_blk even-position pairs,
    lane tile), no serial chain anywhere — the per-position work items are
    independent, so Mosaic pipelines them at issue width instead of riding
    the ACS recursion like the v4 in-loop emission did."""
    tab = _tables()
    pred0 = tuple(int(v) for v in tab["pred"][:, 0])
    pred1 = tuple(int(v) for v in tab["pred"][:, 1])
    u0v, u1v = tab["pred_u"][:, 0], tab["pred_u"][:, 1]
    q0v, q1v = tab["pred_p"][:, 0], tab["pred_p"][:, 1]
    ns0 = tuple(int(v) for v in tab["ns"][:, 0])
    ns1 = tuple(int(v) for v in tab["ns"][:, 1])
    p0v, p1v = tab["par"][:, 0], tab["par"][:, 1]

    def kernel(g2s, g2p, ast, bst, out):
        U0, U1 = _const_col(u0v), _const_col(u1v)
        Q0, Q1 = _const_col(q0v), _const_col(q1v)
        P0, P1 = _const_col(p0v), _const_col(p1v)
        for j in range(j_blk):
            ges, gos = g2s[j, 0:1, :], g2s[j, 1:2, :]
            gep, gop = g2p[j, 0:1, :], g2p[j, 1:2, :]
            a_e = ast[j]
            b_e = bst[j]  # beta at the odd position + 1
            # odd-position metrics: one unnormalised radix-2 step each
            a_o = jnp.maximum(_restack(a_e, pred0) + U0 * ges + Q0 * gep,
                              _restack(a_e, pred1) + U1 * ges + Q1 * gep)
            b_o = jnp.maximum(_restack(b_e, ns0) + P0 * gop,
                              _restack(b_e, ns1) + gos + P1 * gop)

            t0 = a_e + _restack(b_o, ns0) + P0 * gep
            t1 = a_e + _restack(b_o, ns1) + P1 * gep
            out[j, 0:1, :] = (jnp.max(t1, axis=0, keepdims=True) + ges
                              - jnp.max(t0, axis=0, keepdims=True))
            t0 = a_o + _restack(b_e, ns0) + P0 * gop
            t1 = a_o + _restack(b_e, ns1) + P1 * gop
            out[j, 1:2, :] = (jnp.max(t1, axis=0, keepdims=True) + gos
                              - jnp.max(t0, axis=0, keepdims=True))

    return kernel


def emit_llr_pallas(g2s, g2p, astore, bstore, interpret: bool = False):
    """LLRs from stored even-k metrics (v5 path).

    g2s/g2p: (L/2, 2, N) body gamma row pairs; astore: (L/2, 8, N) alpha
    at k_rel=2j; bstore: (L/2, 8, N) beta at k_rel=2j+2.  Returns
    (L/2, 2, N) LLRs (reshapeable to (L, N))."""
    import os

    l2, _, n = g2s.shape
    tile_n = int(os.environ.get("TURBO_TILE", "512"))
    j_blk = max(1, int(os.environ.get("TURBO_EMIT_BLK", "8")))
    while l2 % j_blk != 0:
        j_blk //= 2
    if interpret:
        tile_n = min(tile_n, 256)
    if n % tile_n != 0:
        pad = tile_n - n % tile_n
        g2s = jnp.pad(g2s, ((0, 0), (0, 0), (0, pad)))
        g2p = jnp.pad(g2p, ((0, 0), (0, 0), (0, pad)))
        astore = jnp.pad(astore, ((0, 0), (0, 0), (0, pad)))
        bstore = jnp.pad(bstore, ((0, 0), (0, 0), (0, pad)))
    np_ = g2s.shape[2]
    grid = (l2 // j_blk, np_ // tile_n)
    spec_g = pl.BlockSpec((j_blk, 2, tile_n), lambda j, i: (j, 0, i),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((j_blk, 8, tile_n), lambda j, i: (j, 0, i),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_emit_kernel(tile_n, j_blk),
        grid=grid,
        in_specs=[spec_g, spec_g, spec_m, spec_m],
        out_specs=pl.BlockSpec((j_blk, 2, tile_n), lambda j, i: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l2, 2, np_), jnp.float32),
        interpret=interpret,
    )(g2s, g2p, astore, bstore)
    return out[:, :, :n]


def _make_kernel_v3(t_train: int, l_win: int, tile_n: int):
    """Latency-hiding half-iteration kernel.

    The MAP recursions are long dependency chains of small (8, NT) vector
    ops, so the v1 kernel is latency-bound (tile-size sweeps show weak
    scaling with issue width).  v3 splits each tile's lanes into two
    halves and runs two *independent* chains in every phase:

      phase 1:  alpha sweep on half A   ∥   beta sweep on half B
      phase 2:  beta sweep + LLR on A   ∥   alpha sweep + LLR on B

    Phase 2's beta(A) consumes astore(A) written in phase 1, and
    alpha(B) consumes bstore(B) written in phase 1 — same scratch volume
    and op count as v1, but the VLIW scheduler always has two chains to
    overlap.

    EXPERIMENT — micro-benches ~3% faster than v1 per half at tile 512
    but loses at the full-decode level (smaller tiles double the grid);
    v1 stays the default.
    """
    tab = _tables()
    pred0 = tuple(int(v) for v in tab["pred"][:, 0])
    pred1 = tuple(int(v) for v in tab["pred"][:, 1])
    u0v, u1v = tab["pred_u"][:, 0], tab["pred_u"][:, 1]
    q0v, q1v = tab["pred_p"][:, 0], tab["pred_p"][:, 1]
    ns0 = tuple(int(v) for v in tab["ns"][:, 0])
    ns1 = tuple(int(v) for v in tab["ns"][:, 1])
    p0v, p1v = tab["par"][:, 0], tab["par"][:, 1]
    steps = t_train + l_win
    h = tile_n // 2  # lane split

    def kernel(gsa, gpa, ma, gsb, gpb, mb, a0, b0, out, astore, bstore):
        U0, U1 = _const_col(u0v), _const_col(u1v)
        Q0, Q1 = _const_col(q0v), _const_col(q1v)
        P0, P1 = _const_col(p0v), _const_col(p1v)

        def alpha_acs(alpha, gs, gp):
            c0 = _restack(alpha, pred0) + U0 * gs + Q0 * gp
            c1 = _restack(alpha, pred1) + U1 * gs + Q1 * gp
            new = jnp.maximum(c0, c1)
            return new - jnp.max(new, axis=0, keepdims=True)

        def beta_acs(beta, gs, gp):
            c0 = _restack(beta, ns0) + P0 * gp
            c1 = _restack(beta, ns1) + gs + P1 * gp
            new = jnp.maximum(c0, c1)
            return new - jnp.max(new, axis=0, keepdims=True)

        A = pl.ds(0, h)
        B = pl.ds(h, h)

        # ---- phase 1: alpha(A) ∥ beta(B), masked training then body ----
        def p1_train(i, carry):
            alpha, beta = carry
            na = alpha_acs(alpha, gsa[pl.ds(i, 1), A], gpa[pl.ds(i, 1), A])
            nb = beta_acs(beta, gsb[pl.ds(i, 1), B], gpb[pl.ds(i, 1), B])
            m_a = ma[pl.ds(i, 1), A]
            m_b = mb[pl.ds(i, 1), B]
            return (m_a * na + (1.0 - m_a) * alpha,
                    m_b * nb + (1.0 - m_b) * beta)

        alpha_a, beta_b = jax.lax.fori_loop(
            0, t_train, p1_train, (a0[:, A], b0[:, B]))

        bstore[pl.ds(l_win - 1, 1)] = beta_b[None]

        def p1_body(i, carry):
            alpha, beta = carry
            astore[pl.ds(i - t_train, 1)] = alpha[None]
            alpha = alpha_acs(alpha, gsa[pl.ds(i, 1), A], gpa[pl.ds(i, 1), A])
            beta = beta_acs(beta, gsb[pl.ds(i, 1), B], gpb[pl.ds(i, 1), B])

            @pl.when(i <= steps - 2)
            def _():
                bstore[pl.ds(l_win + t_train - 2 - i, 1)] = beta[None]

            return alpha, beta

        jax.lax.fori_loop(t_train, steps, p1_body, (alpha_a, beta_b))

        # ---- phase 2: beta(A)+LLR ∥ alpha(B)+LLR ------------------------
        def p2_train(i, carry):
            alpha, beta = carry
            na = alpha_acs(alpha, gsa[pl.ds(i, 1), B], gpa[pl.ds(i, 1), B])
            nb = beta_acs(beta, gsb[pl.ds(i, 1), A], gpb[pl.ds(i, 1), A])
            m_a = ma[pl.ds(i, 1), B]
            m_b = mb[pl.ds(i, 1), A]
            return (m_a * na + (1.0 - m_a) * alpha,
                    m_b * nb + (1.0 - m_b) * beta)

        alpha_b, beta_a = jax.lax.fori_loop(
            0, t_train, p2_train, (a0[:, B], b0[:, A]))

        def emit_a(idx, beta, i_gamma):
            a_k = astore[pl.ds(idx, 1)][0]
            gsv = gsb[pl.ds(i_gamma, 1), A]
            gpv = gpb[pl.ds(i_gamma, 1), A]
            t0 = a_k + _restack(beta, ns0) + P0 * gpv
            t1 = a_k + _restack(beta, ns1) + P1 * gpv
            out[pl.ds(idx, 1), A] = (jnp.max(t1, axis=0, keepdims=True) + gsv
                                     - jnp.max(t0, axis=0, keepdims=True))

        def emit_b(idx, alpha, i_gamma):
            # LLR at window pos idx for half B: beta_{k+1} from bstore,
            # alpha is the live forward metric at pos idx
            b_k1 = bstore[pl.ds(idx, 1)][0]
            gsv = gsa[pl.ds(i_gamma, 1), B]
            gpv = gpa[pl.ds(i_gamma, 1), B]
            t0 = alpha + _restack(b_k1, ns0) + P0 * gpv
            t1 = alpha + _restack(b_k1, ns1) + P1 * gpv
            out[pl.ds(idx, 1), B] = (jnp.max(t1, axis=0, keepdims=True) + gsv
                                     - jnp.max(t0, axis=0, keepdims=True))

        emit_a(l_win - 1, beta_a, t_train)

        def p2_body(i, carry):
            alpha, beta = carry
            emit_b(i - t_train, alpha, i)
            alpha = alpha_acs(alpha, gsa[pl.ds(i, 1), B], gpa[pl.ds(i, 1), B])
            beta = beta_acs(beta, gsb[pl.ds(i, 1), A], gpb[pl.ds(i, 1), A])

            @pl.when(i <= steps - 2)
            def _():
                emit_a(l_win + t_train - 2 - i, beta, i + 1)

            return alpha, beta

        jax.lax.fori_loop(t_train, steps, p2_body, (alpha_b, beta_a))

    return kernel




def _make_kernel(t_train: int, l_win: int, dtype=jnp.float32,
                 unroll: int = 1):
    assert l_win % unroll == 0
    tab = _tables()
    pred0 = tuple(int(v) for v in tab["pred"][:, 0])
    pred1 = tuple(int(v) for v in tab["pred"][:, 1])
    u0v, u1v = tab["pred_u"][:, 0], tab["pred_u"][:, 1]
    q0v, q1v = tab["pred_p"][:, 0], tab["pred_p"][:, 1]
    ns0 = tuple(int(v) for v in tab["ns"][:, 0])
    ns1 = tuple(int(v) for v in tab["ns"][:, 1])
    p0v, p1v = tab["par"][:, 0], tab["par"][:, 1]
    steps = t_train + l_win

    def kernel(gsa, gpa, ma, gsb, gpb, mb, a0, b0, out, astore):
        U0, U1 = _const_col(u0v, dtype), _const_col(u1v, dtype)
        Q0, Q1 = _const_col(q0v, dtype), _const_col(q1v, dtype)
        P0, P1 = _const_col(p0v, dtype), _const_col(p1v, dtype)
        one = jnp.asarray(1.0, dtype)

        def alpha_acs(alpha, gs, gp):
            c0 = _restack(alpha, pred0) + U0 * gs + Q0 * gp
            c1 = _restack(alpha, pred1) + U1 * gs + Q1 * gp
            new = jnp.maximum(c0, c1)
            return new - jnp.max(new, axis=0, keepdims=True)

        def beta_acs(beta, gs, gp):
            c0 = _restack(beta, ns0) + P0 * gp
            c1 = _restack(beta, ns1) + gs + P1 * gp
            new = jnp.maximum(c0, c1)
            return new - jnp.max(new, axis=0, keepdims=True)

        # ---- alpha: masked training then unmasked body ---------------------
        def fwd_train(i, alpha):
            gs = gsa[pl.ds(i, 1), :]
            gp = gpa[pl.ds(i, 1), :]
            m = ma[pl.ds(i, 1), :]
            new = alpha_acs(alpha, gs, gp)
            return m * new + (one - m) * alpha

        alpha = jax.lax.fori_loop(0, t_train, fwd_train, a0[:, :])

        def fwd_body(j, alpha):
            # unrolled: one loop iteration advances `unroll` trellis steps
            # (dynamic-slice index arithmetic + loop bookkeeping amortised)
            i0 = t_train + j * unroll
            for u in range(unroll):
                astore[pl.ds(i0 - t_train + u, 1)] = alpha[None]
                alpha = alpha_acs(alpha, gsa[pl.ds(i0 + u, 1), :],
                                  gpa[pl.ds(i0 + u, 1), :])
            return alpha

        jax.lax.fori_loop(0, l_win // unroll, fwd_body, alpha)

        # ---- beta: masked training then body with fused LLR ----------------
        def bwd_train(i, beta):
            gs = gsb[pl.ds(i, 1), :]
            gp = gpb[pl.ds(i, 1), :]
            m = mb[pl.ds(i, 1), :]
            new = beta_acs(beta, gs, gp)
            return m * new + (one - m) * beta

        # Masked steps (the last window's k >= K region) occur at i <= T-1,
        # so training covers [0, T).  The beta after step T-1 is the
        # beta_{k+1} of body position L-1 — emit its LLR before the body.
        beta = jax.lax.fori_loop(0, t_train, bwd_train, b0[:, :])

        def emit_llr(idx, beta, i_gamma):
            a_k = astore[pl.ds(idx, 1)][0]
            gsl = gsb[pl.ds(i_gamma, 1), :]
            gpl = gpb[pl.ds(i_gamma, 1), :]
            t0 = a_k + _restack(beta, ns0) + P0 * gpl
            t1 = a_k + _restack(beta, ns1) + P1 * gpl
            m0 = jnp.max(t0, axis=0, keepdims=True)
            m1 = jnp.max(t1, axis=0, keepdims=True)
            out[pl.ds(idx, 1), :] = m1 + gsl - m0

        emit_llr(l_win - 1, beta, t_train)

        def bwd_body(j, beta):
            i0 = t_train + j * unroll
            for u in range(unroll):
                i = i0 + u
                beta = beta_acs(beta, gsb[pl.ds(i, 1), :],
                                gpb[pl.ds(i, 1), :])
                if unroll == 1:
                    @pl.when(i <= steps - 2)
                    def _(beta=beta, i=i):
                        emit_llr(l_win + t_train - 2 - i, beta, i + 1)
                else:
                    # last step of the last unrolled iteration has no emit
                    @pl.when(i <= steps - 2)
                    def _(beta=beta, i=i):
                        emit_llr(l_win + t_train - 2 - i, beta, i + 1)
            return beta

        jax.lax.fori_loop(0, l_win // unroll, bwd_body, beta)

    return kernel


def map_windowed_pallas(
    gsa: jnp.ndarray,  # (T+L, N) alpha gammas (systematic+apriori)
    gpa: jnp.ndarray,  # (T+L, N) alpha parity gammas
    ma: jnp.ndarray,  # (T+L, N) alpha valid masks
    gsb: jnp.ndarray,
    gpb: jnp.ndarray,
    mb: jnp.ndarray,
    a_init: jnp.ndarray,  # (8, N)
    b_init: jnp.ndarray,  # (8, N)
    t_train: int,
    l_win: int,
    tile_n: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns LLRs (L, N)."""
    steps, n = gsa.shape
    assert steps == t_train + l_win
    import os
    kern_ver = os.environ.get("TURBO_KERNEL", "v1")
    if interpret:
        tile_n = min(tile_n, 256)
    else:
        tile_n = int(os.environ.get("TURBO_TILE", "1024" if kern_ver != "v3" else "512"))
    if n % tile_n != 0:
        pad = tile_n - n % tile_n
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        gsa, gpa, ma = padf(gsa), padf(gpa), padf(ma)
        gsb, gpb, mb = padf(gsb), padf(gpb), padf(mb)
        a_init, b_init = padf(a_init), padf(b_init)
    np_ = gsa.shape[1]

    grid = (np_ // tile_n,)
    spec_g = pl.BlockSpec((steps, tile_n), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((8, tile_n), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    if kern_ver == "v3":
        kernel = _make_kernel_v3(t_train, l_win, tile_n)
        scratch = [pltpu.VMEM((l_win, 8, tile_n // 2), jnp.float32),
                   pltpu.VMEM((l_win, 8, tile_n // 2), jnp.float32)]
        dtype = jnp.float32
    elif kern_ver == "bf16":
        # 16-bit metric path (the reference decodes in int16/int8,
        # turbodecoder.c:35-90): halves the vregs per trellis step; the
        # per-step max-normalisation keeps the dynamic range well inside
        # bf16's 8-bit mantissa
        dtype = jnp.bfloat16
        kernel = _make_kernel(t_train, l_win, dtype)
        scratch = [pltpu.VMEM((l_win, 8, tile_n), dtype)]
    else:
        dtype = jnp.float32
        unroll = max(1, int(os.environ.get("TURBO_UNROLL", "4")))
        if l_win % unroll != 0:
            unroll = 1
        kernel = _make_kernel(t_train, l_win, unroll=unroll)
        scratch = [pltpu.VMEM((l_win, 8, tile_n), jnp.float32)]
    if dtype != jnp.float32:
        conv = lambda x: x.astype(dtype)
        gsa, gpa, ma = conv(gsa), conv(gpa), conv(ma)
        gsb, gpb, mb = conv(gsb), conv(gpb), conv(mb)
        a_init, b_init = conv(a_init), conv(b_init)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_g] * 6 + [spec_i, spec_i],
        out_specs=pl.BlockSpec((l_win, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l_win, np_), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(gsa, gpa, ma, gsb, gpb, mb, a_init, b_init)
    return out[:, :n].astype(jnp.float32)
