"""Scratch: isolate per-step costs in the r4 kernel (loads / loop / compute)."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srsran_4g_tpu.ops.pallas.turbo_map import (
    _tables, _tables_r4, _const_col, _restack)

K, B, WIN, TRAIN = 5824, 1664, 112, 32
W = K // WIN
N = B * W
TILE = int(os.environ.get("TURBO_TILE", "1024"))
STEPS = WIN + 2 * TRAIN
rng = np.random.default_rng(0)
NP = ((N + TILE - 1) // TILE) * TILE
g = jnp.asarray(rng.normal(0, 4.0, (STEPS, NP)).astype(np.float32))
a0 = jnp.asarray(rng.normal(0, 1.0, (8, NP)).astype(np.float32))

tab = _tables()
r4 = _tables_r4()
a_pred = [tuple(int(v) for v in r4["a_pred"][:, j]) for j in range(4)]
a_c = r4["a_c"]
t2, l2 = TRAIN // 2, WIN // 2


def run(name, kernel, n_scratch=1):
    grid = (NP // TILE,)
    spec_g = pl.BlockSpec((STEPS, TILE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((8, TILE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[spec_g, spec_g, spec_i],
        out_specs=pl.BlockSpec((WIN, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((WIN, NP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WIN // 2, 8, TILE), jnp.float32)],
    )
    jf = jax.jit(lambda gg, aa: jnp.sum(f(gg, gg, aa)))
    float(jf(g, a0))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        r = jf(g, a0)
    float(r)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms",
          flush=True)


def make(variant):
    def kernel(gs, gp, a0ref, out, astore):
        AC = [[_const_col(a_c[:, j, c]) for c in range(4)] for j in range(4)]

        def alpha_r4(alpha, g0s, g0p, g1s, g1p):
            cs = [
                _restack(alpha, a_pred[j])
                + (AC[j][0] * g0s + AC[j][1] * g0p
                   + AC[j][2] * g1s + AC[j][3] * g1p)
                for j in range(4)
            ]
            new = jnp.maximum(jnp.maximum(cs[0], cs[1]),
                              jnp.maximum(cs[2], cs[3]))
            return new - jnp.max(new, axis=0, keepdims=True)

        n_steps = t2 + l2  # one sweep's worth of r4 steps

        if variant == "full":  # alpha-sweep-equivalent: loads + compute
            def body(i, alpha):
                r = 2 * i
                alpha = alpha_r4(alpha, gs[pl.ds(r, 1), :], gp[pl.ds(r, 1), :],
                                 gs[pl.ds(r + 1, 1), :], gp[pl.ds(r + 1, 1), :])
                return alpha
            alpha = jax.lax.fori_loop(0, n_steps, body, a0ref[:, :])
            out[pl.ds(0, 1), :] = alpha[0:1]
        elif variant == "fixedrow":  # same compute, static row-0 loads
            def body(i, alpha):
                alpha = alpha_r4(alpha, gs[pl.ds(0, 1), :], gp[pl.ds(0, 1), :],
                                 gs[pl.ds(1, 1), :], gp[pl.ds(1, 1), :])
                return alpha
            alpha = jax.lax.fori_loop(0, n_steps, body, a0ref[:, :])
            out[pl.ds(0, 1), :] = alpha[0:1]
        elif variant == "block8":  # loads as aligned (8,N) blocks, 4 r4/iter
            def body(j, alpha):
                gsb = gs[pl.ds(j * 8, 8), :]
                gpb = gp[pl.ds(j * 8, 8), :]
                for u in range(4):
                    alpha = alpha_r4(alpha, gsb[2*u:2*u+1, :], gpb[2*u:2*u+1, :],
                                     gsb[2*u+1:2*u+2, :], gpb[2*u+1:2*u+2, :])
                return alpha
            alpha = jax.lax.fori_loop(0, n_steps // 4, body, a0ref[:, :])
            out[pl.ds(0, 1), :] = alpha[0:1]
        elif variant == "loadsonly":  # loads + trivial combine, no ACS
            def body(i, acc):
                r = 2 * i
                acc = acc + gs[pl.ds(r, 1), :] + gp[pl.ds(r, 1), :] \
                          + gs[pl.ds(r + 1, 1), :] + gp[pl.ds(r + 1, 1), :]
                return acc
            acc = jax.lax.fori_loop(0, n_steps, body, a0ref[0:1, :])
            out[pl.ds(0, 1), :] = acc
        elif variant == "acsonly":  # no loads: reuse carried rows
            def body(i, carry):
                alpha, row = carry
                alpha = alpha_r4(alpha, row, row, row, row)
                return alpha, row
            alpha, _ = jax.lax.fori_loop(0, n_steps, body,
                                         (a0ref[:, :], gs[0:1, :]))
            out[pl.ds(0, 1), :] = alpha[0:1]
        elif variant == "unroll4":  # dynamic loads, 4 r4-steps per iter
            def body(j, alpha):
                r0 = 8 * j
                for u in range(4):
                    r = r0 + 2 * u
                    alpha = alpha_r4(alpha, gs[pl.ds(r, 1), :],
                                     gp[pl.ds(r, 1), :],
                                     gs[pl.ds(r + 1, 1), :],
                                     gp[pl.ds(r + 1, 1), :])
                return alpha
            alpha = jax.lax.fori_loop(0, n_steps // 4, body, a0ref[:, :])
            out[pl.ds(0, 1), :] = alpha[0:1]
        elif variant == "astore":  # alpha body with scratch stores
            def body(i, alpha):
                astore[pl.ds(i % l2, 1)] = alpha[None]
                r = 2 * i
                alpha = alpha_r4(alpha, gs[pl.ds(r, 1), :], gp[pl.ds(r, 1), :],
                                 gs[pl.ds(r + 1, 1), :], gp[pl.ds(r + 1, 1), :])
                return alpha
            alpha = jax.lax.fori_loop(0, n_steps, body, a0ref[:, :])
            out[pl.ds(0, 1), :] = alpha[0:1]
        return

    return kernel


for v in sys.argv[1:] or ["full", "fixedrow", "block8", "loadsonly",
                          "acsonly", "unroll4", "astore"]:
    run(v, make(v))


def make2(variant):
    def kernel(gs, gp, a0ref, out, astore):
        n_steps = t2 + l2

        if variant == "empty":
            out[pl.ds(0, 1), :] = gs[0:1, :]
        elif variant == "load1":
            def body(i, acc):
                return acc + gs[pl.ds(2 * i, 1), :]
            acc = jax.lax.fori_loop(0, n_steps, body, a0ref[0:1, :])
            out[pl.ds(0, 1), :] = acc
        elif variant == "addchain":  # pure serial adds on (8,N), no loads
            def body(i, alpha):
                row = gs[0:1, :]
                for _ in range(8):
                    alpha = alpha + row
                return alpha
            alpha = jax.lax.fori_loop(0, n_steps, body, a0ref[:, :])
            out[pl.ds(0, 1), :] = alpha[0:1]
        elif variant == "addpar":  # 8 independent adds per iter
            def body(i, carry):
                a, b, c, d = carry
                row = gs[0:1, :]
                a = a + row; b = b + row; c = c + row; d = d + row
                a = a + row; b = b + row; c = c + row; d = d + row
                return a, b, c, d
            r = jax.lax.fori_loop(
                0, n_steps, body,
                (a0ref[0:2, :], a0ref[2:4, :], a0ref[4:6, :], a0ref[6:8, :]))
            out[pl.ds(0, 1), :] = r[0][0:1]
        elif variant == "load1x":  # 1 load + 1 add per iter on (8,N)
            def body(i, alpha):
                return alpha + gs[pl.ds(2 * i, 1), :]
            alpha = jax.lax.fori_loop(0, n_steps, body, a0ref[:, :])
            out[pl.ds(0, 1), :] = alpha[0:1]
        return

    return kernel


if os.environ.get("PROBE2"):
    for v in os.environ["PROBE2"].split(","):
        run(v, make2(v))
