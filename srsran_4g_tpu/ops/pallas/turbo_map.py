"""Pallas TPU kernel: one windowed max-log-MAP half-iteration.

The XLA windowed decoder in ops/turbo.py spends its time in `lax.scan`
dispatch overhead — each 8-state ACS step is tiny (µs-scale per step on a
(B, W, 8) tensor) while a whole half-iteration is thousands of steps.  This
kernel runs the *entire* half-iteration per tile inside one Mosaic program:

- layout (8 states × N lanes), N = B·W windows flattened into the lane
  dimension — the state dimension sits in sublanes, every lane is an
  independent window;
- the forward (alpha) and backward (beta) recursions run *in the same
  fori_loop step* (they are independent), halving the sequential step
  count; alpha values for the window body are parked in a VMEM scratch
  buffer and consumed by the LLR computation as the backward sweep passes
  over the same trellis indices;
- the 8-state ACS is fully unrolled with static predecessor tables — no
  gathers, just static row slices, adds and maxima on the VPU.

Inputs are the per-window gamma streams and no-op masks precomputed by
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

    t = _trellis()
    return {
        "pred": t["pred"].tolist(),
        "pred_u": t["pred_u"].tolist(),
        "pred_p": t["pred_p"].tolist(),
        "ns": t["ns"].tolist(),
        "par": t["par"].tolist(),
    }


# NOTE on the alpha-store race: the backward sweep reads astore[idx] with
# idx = L+T-2-i while the forward sweep writes astore[i-T].  The read of
# body position k happens at step i_r = L+T-2-k, the write at i_w = k+T;
# i_r >= i_w  ⇔  L-2 >= 2k — NOT true for the upper half of the window.
# We therefore run the loop in TWO phases: phase 1 (steps 0..T+L-1) does
# alpha only; phase 2 re-runs the backward recursion with LLR.  See
# map_windowed_pallas which calls the two-phase kernel below.


def _make_kernel_two_phase(t_train: int, l_win: int, nt: int):
    tab = _tables()
    pred, pred_u, pred_p = tab["pred"], tab["pred_u"], tab["pred_p"]
    ns, par = tab["ns"], tab["par"]
    steps = t_train + l_win

    def kernel(gsa, gpa, ma, gsb, gpb, mb, a0, b0, out, astore):
        def fwd(i, alpha):
            @pl.when(i >= t_train)
            def _():
                astore[pl.ds(i - t_train, 1)] = alpha[None]

            gs = gsa[pl.ds(i, 1), :]
            gp = gpa[pl.ds(i, 1), :]
            m = ma[pl.ds(i, 1), :]
            rows = []
            for s in range(8):
                c0 = alpha[pred[s][0]:pred[s][0] + 1, :]
                if pred_u[s][0]:
                    c0 = c0 + gs
                if pred_p[s][0]:
                    c0 = c0 + gp
                c1 = alpha[pred[s][1]:pred[s][1] + 1, :]
                if pred_u[s][1]:
                    c1 = c1 + gs
                if pred_p[s][1]:
                    c1 = c1 + gp
                rows.append(jnp.maximum(c0, c1))
            new_a = jnp.concatenate(rows, axis=0)
            new_a = new_a - jnp.max(new_a, axis=0, keepdims=True)
            return m * new_a + (1.0 - m) * alpha

        jax.lax.fori_loop(0, steps, fwd, a0[:, :])

        def bwd(i, beta):
            gsb_i = gsb[pl.ds(i, 1), :]
            gpb_i = gpb[pl.ds(i, 1), :]
            mb_i = mb[pl.ds(i, 1), :]
            rows_b = []
            for s in range(8):
                c0 = beta[ns[s][0]:ns[s][0] + 1, :]
                if par[s][0]:
                    c0 = c0 + gpb_i
                c1 = beta[ns[s][1]:ns[s][1] + 1, :] + gsb_i
                if par[s][1]:
                    c1 = c1 + gpb_i
                rows_b.append(jnp.maximum(c0, c1))
            new_b = jnp.concatenate(rows_b, axis=0)
            new_b = new_b - jnp.max(new_b, axis=0, keepdims=True)
            beta = mb_i * new_b + (1.0 - mb_i) * beta

            @pl.when((i >= t_train - 1) & (i <= steps - 2))
            def _():
                idx = l_win + t_train - 2 - i
                a_k = astore[pl.ds(idx, 1)][0]
                gsl = gsb[pl.ds(i + 1, 1), :]
                gpl = gpb[pl.ds(i + 1, 1), :]
                m0 = None
                m1 = None
                for s in range(8):
                    c0 = a_k[s:s + 1, :] + beta[ns[s][0]:ns[s][0] + 1, :]
                    if par[s][0]:
                        c0 = c0 + gpl
                    c1 = a_k[s:s + 1, :] + beta[ns[s][1]:ns[s][1] + 1, :]
                    if par[s][1]:
                        c1 = c1 + gpl
                    m0 = c0 if m0 is None else jnp.maximum(m0, c0)
                    m1 = c1 if m1 is None else jnp.maximum(m1, c1)
                out[pl.ds(idx, 1), :] = m1 + gsl - m0

            return beta

        jax.lax.fori_loop(0, steps, bwd, b0[:, :])

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
    tile_n: int = 512,
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

    kernel = _make_kernel_two_phase(t_train, l_win, tile_n)
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
