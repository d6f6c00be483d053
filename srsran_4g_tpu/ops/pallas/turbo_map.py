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


def _const_col(vals):
    """(8, 1) 0/1 column built in-kernel from a scalar bit pattern (Pallas
    kernels may not capture array constants)."""
    pattern = int(sum(int(v) << i for i, v in enumerate(vals)))
    iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    return ((pattern >> iota) & 1).astype(jnp.float32)


def _make_kernel(t_train: int, l_win: int):
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

        # ---- alpha: masked training then unmasked body ---------------------
        def fwd_train(i, alpha):
            gs = gsa[pl.ds(i, 1), :]
            gp = gpa[pl.ds(i, 1), :]
            m = ma[pl.ds(i, 1), :]
            new = alpha_acs(alpha, gs, gp)
            return m * new + (1.0 - m) * alpha

        alpha = jax.lax.fori_loop(0, t_train, fwd_train, a0[:, :])

        def fwd_body(i, alpha):
            astore[pl.ds(i - t_train, 1)] = alpha[None]
            return alpha_acs(alpha, gsa[pl.ds(i, 1), :], gpa[pl.ds(i, 1), :])

        jax.lax.fori_loop(t_train, steps, fwd_body, alpha)

        # ---- beta: masked training then body with fused LLR ----------------
        def bwd_train(i, beta):
            gs = gsb[pl.ds(i, 1), :]
            gp = gpb[pl.ds(i, 1), :]
            m = mb[pl.ds(i, 1), :]
            new = beta_acs(beta, gs, gp)
            return m * new + (1.0 - m) * beta

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

        def bwd_body(i, beta):
            beta = beta_acs(beta, gsb[pl.ds(i, 1), :], gpb[pl.ds(i, 1), :])

            @pl.when(i <= steps - 2)
            def _():
                emit_llr(l_win + t_train - 2 - i, beta, i + 1)

            return beta

        jax.lax.fori_loop(t_train, steps, bwd_body, beta)

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
    if n % tile_n != 0:
        pad = tile_n - n % tile_n
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        gsa, gpa, ma = padf(gsa), padf(gpa), padf(ma)
        gsb, gpb, mb = padf(gsb), padf(gpb), padf(mb)
        a_init, b_init = padf(a_init), padf(b_init)
    np_ = gsa.shape[1]

    kernel = _make_kernel(t_train, l_win)
    grid = (np_ // tile_n,)
    spec_g = pl.BlockSpec((steps, tile_n), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((8, tile_n), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_g] * 6 + [spec_i, spec_i],
        out_specs=pl.BlockSpec((l_win, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l_win, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((l_win, 8, tile_n), jnp.float32)],
        interpret=interpret,
    )(gsa, gpa, ma, gsb, gpb, mb, a_init, b_init)
    return out[:, :n]
