"""Probe: what actually bounds the windowed ACS kernel?

Three micro-kernels over the bench-shaped lane set (86528 lanes x 144
trellis steps = 72 radix-4 steps), no LLR emission:

  full  - the v5 radix-4 ACS pair (alpha+beta interleaved) with real
          gamma row loads and masked-metric arithmetic
  skel  - same loop with the gamma arithmetic deleted (restack + add
          const + max + norm only): the irreducible serial skeleton
  bf16  - two lane-groups packed into 16 sublanes of bf16 (the v5e
          native (16,128) tile): if this runs ~2x the f32 rate, the
          16-sublane bf16 repack is the next kernel project

Usage: python tools/turbo_probe6.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srsran_4g_tpu.ops.pallas.turbo_map import (
    _tables, _tables_r4, _restack, _const_col)

N = 86528
STEPS = 72  # r4 steps per sweep (= (T+L)/2 at T=32, L=112)
TILE = int(os.environ.get("TURBO_TILE", "512"))

r4 = _tables_r4()
a2_pred = [tuple(int(v) for v in r4["a2_pred"][:, j]) for j in range(4)]
a2_p1, a2_p2 = r4["a2_p1"], r4["a2_p2"]
b_ns = [tuple(int(v) for v in r4["b_ns"][:, j]) for j in range(4)]
b_p2 = r4["b_p2"]
tab = _tables()
par0, par1 = tab["par"][:, 0], tab["par"][:, 1]


def timeit(name, f, *args, iters=10):
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.3f} ms", flush=True)
    return dt


# ---- A: full f32 interleaved r4 pair ---------------------------------------

def make_full():
    def kernel(g2s, g2p, a0, b0, aout, bout):
        AP1 = [_const_col(a2_p1[:, j]) for j in range(4)]
        AP2 = [_const_col(a2_p2[:, j]) for j in range(4)]
        BP2 = [_const_col(b_p2[:, j]) for j in range(4)]
        P0, P1 = _const_col(par0), _const_col(par1)

        def rows2(i):
            gs = g2s[pl.ds(i, 1)]
            gp = g2p[pl.ds(i, 1)]
            return gs[0, 0:1, :], gp[0, 0:1, :], gs[0, 1:2, :], gp[0, 1:2, :]

        def alpha_r4(alpha, g0s, g0p, g1s, g1p):
            s11 = g0s + g1s
            rows = (None, g1s, g0s, s11)
            cs = []
            for j in range(4):
                c = _restack(alpha, a2_pred[j]) + (AP1[j] * g0p + AP2[j] * g1p)
                if rows[j] is not None:
                    c = c + rows[j]
                cs.append(c)
            new = jnp.maximum(jnp.maximum(cs[0], cs[1]),
                              jnp.maximum(cs[2], cs[3]))
            return new - new[0:1, :]

        def beta_r4(beta, g0s, g0p, g1s, g1p):
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

        def body(i, carry):
            alpha, beta = carry
            alpha = alpha_r4(alpha, *rows2(i))
            beta = beta_r4(beta, *rows2(STEPS - 1 - i))
            return alpha, beta

        alpha, beta = jax.lax.fori_loop(0, STEPS, body, (a0[:, :], b0[:, :]))
        aout[:, :] = alpha
        bout[:, :] = beta

    spec_g = pl.BlockSpec((STEPS, 2, TILE), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((8, TILE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)

    def run(g2s, g2p, a0, b0):
        outs = pl.pallas_call(
            kernel, grid=(N // TILE,),
            in_specs=[spec_g, spec_g, spec_i, spec_i],
            out_specs=[spec_i, spec_i],
            out_shape=[jax.ShapeDtypeStruct((8, N), jnp.float32)] * 2,
        )(g2s, g2p, a0, b0)
        return outs[0].sum() + outs[1].sum()

    return jax.jit(run)


# ---- B: skeleton (no gamma arithmetic) -------------------------------------

def make_skel():
    def kernel(a0, b0, aout, bout):
        def acs(x, preds):
            cs = [_restack(x, preds[j]) + float(j) for j in range(4)]
            new = jnp.maximum(jnp.maximum(cs[0], cs[1]),
                              jnp.maximum(cs[2], cs[3]))
            return new - new[0:1, :]

        def body(i, carry):
            alpha, beta = carry
            return acs(alpha, a2_pred), acs(beta, b_ns)

        alpha, beta = jax.lax.fori_loop(0, STEPS, body, (a0[:, :], b0[:, :]))
        aout[:, :] = alpha
        bout[:, :] = beta

    spec_i = pl.BlockSpec((8, TILE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)

    def run(a0, b0):
        outs = pl.pallas_call(
            kernel, grid=(N // TILE,),
            in_specs=[spec_i, spec_i],
            out_specs=[spec_i, spec_i],
            out_shape=[jax.ShapeDtypeStruct((8, N), jnp.float32)] * 2,
        )(a0, b0)
        return outs[0].sum() + outs[1].sum()

    return jax.jit(run)


# ---- C: bf16 two-group (16, TILE) ------------------------------------------

def make_bf16():
    # lane-halves packed into sublanes 0-7 / 8-15; predecessor restack is
    # the same permutation applied within each group
    a2_pred16 = [tuple(list(p) + [s + 8 for s in p]) for p in a2_pred]
    b_ns16 = [tuple(list(p) + [s + 8 for s in p]) for p in b_ns]

    def col16(vals):
        pattern = int(sum(int(v) << i for i, v in enumerate(vals)))
        iota = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) % 8
        return ((pattern >> iota) & 1).astype(jnp.bfloat16)

    def kernel(g2s, g2p, a0, b0, aout, bout):
        AP1 = [col16(a2_p1[:, j]) for j in range(4)]
        AP2 = [col16(a2_p2[:, j]) for j in range(4)]
        BP2 = [col16(b_p2[:, j]) for j in range(4)]
        P0, P1 = col16(par0), col16(par1)
        bcast = tuple([0] * 8 + [1] * 8)

        def rows2(i):
            # (1, 2, 2, TILE): [row parity 2i/2i+1][lane-group]
            gs = g2s[pl.ds(i, 1)]
            gp = g2p[pl.ds(i, 1)]
            # build (16, TILE): top 8 sublanes = group 0's row, bottom =
            # group 1's — a 2->16 sublane broadcast restack
            g0s = _restack(gs[0, 0], bcast)
            g1s = _restack(gs[0, 1], bcast)
            g0p = _restack(gp[0, 0], bcast)
            g1p = _restack(gp[0, 1], bcast)
            return g0s, g0p, g1s, g1p

        def alpha_r4(alpha, g0s, g0p, g1s, g1p):
            s11 = g0s + g1s
            rows = (None, g1s, g0s, s11)
            cs = []
            for j in range(4):
                c = _restack(alpha, a2_pred16[j]) + (AP1[j] * g0p + AP2[j] * g1p)
                if rows[j] is not None:
                    c = c + rows[j]
                cs.append(c)
            new = jnp.maximum(jnp.maximum(cs[0], cs[1]),
                              jnp.maximum(cs[2], cs[3]))
            return new - _restack(new[0:1, :], tuple([0] * 16))

        def beta_r4(beta, g0s, g0p, g1s, g1p):
            s11 = g0s + g1s
            rows = (None, g1s, g0s, s11)
            t1 = (P0 * g0p, P1 * g0p)
            cs = []
            for j in range(4):
                c = _restack(beta, b_ns16[j]) + (t1[j // 2] + BP2[j] * g1p)
                if rows[j] is not None:
                    c = c + rows[j]
                cs.append(c)
            new = jnp.maximum(jnp.maximum(cs[0], cs[1]),
                              jnp.maximum(cs[2], cs[3]))
            return new - _restack(new[0:1, :], tuple([0] * 16))

        def body(i, carry):
            alpha, beta = carry
            alpha = alpha_r4(alpha, *rows2(i))
            beta = beta_r4(beta, *rows2(STEPS - 1 - i))
            return alpha, beta

        alpha, beta = jax.lax.fori_loop(0, STEPS, body, (a0[:, :], b0[:, :]))
        aout[:, :] = alpha
        bout[:, :] = beta

    half = N // 2
    spec_g = pl.BlockSpec((STEPS, 2, 2, TILE), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((16, TILE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)

    def run(g2s, g2p, a0, b0):
        outs = pl.pallas_call(
            kernel, grid=(half // TILE,),
            in_specs=[spec_g, spec_g, spec_i, spec_i],
            out_specs=[spec_i, spec_i],
            out_shape=[jax.ShapeDtypeStruct((16, half), jnp.bfloat16)] * 2,
        )(g2s, g2p, a0, b0)
        return (outs[0].astype(jnp.float32).sum()
                + outs[1].astype(jnp.float32).sum())

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    g2s = jnp.asarray(rng.normal(0, 4, (STEPS, 2, N)).astype(np.float32))
    g2p = jnp.asarray(rng.normal(0, 4, (STEPS, 2, N)).astype(np.float32))
    a0 = jnp.zeros((8, N), jnp.float32)
    b0 = jnp.zeros((8, N), jnp.float32)
    timeit("A full f32 (8,T) r4 pair", make_full(), g2s, g2p, a0, b0)
    timeit("B skeleton f32", make_skel(), a0, b0)

    half = N // 2
    g2s16 = jnp.asarray(
        rng.normal(0, 4, (STEPS, 2, 2, half)).astype(np.float32)
    ).astype(jnp.bfloat16)
    g2p16 = jnp.asarray(
        rng.normal(0, 4, (STEPS, 2, 2, half)).astype(np.float32)
    ).astype(jnp.bfloat16)
    a016 = jnp.zeros((16, half), jnp.bfloat16)
    b016 = jnp.zeros((16, half), jnp.bfloat16)
    try:
        timeit("C bf16 (16,T) two-group r4 pair", make_bf16(),
               g2s16, g2p16, a016, b016)
    except Exception as e:  # Mosaic layout rejections are expected here
        print("C bf16 failed:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
