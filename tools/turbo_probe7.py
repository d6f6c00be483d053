"""Probe: does the VPU execute packed bf16 elementwise ops at 2x f32 rate?

Decides whether a bf16 lane-paired turbo kernel (v9 candidate) can beat
v7.  Runs the v7 inner-loop op mix — 8 register tiles, each iteration
does a radix-2 ACS-like update (1 add + 1 max per candidate, 2
candidates per state) plus a norm subtract — for:

  * f32:  tiles (8, TC)   — one vreg per state at TC=128*k
  * bf16: tiles (16, TC)  — one vreg per state, 2x the lanes

Same op count per iteration, bf16 touches 2x elements.  If bf16 wall
time ~= f32 wall time, packed bf16 runs at 2x element throughput and
the v9 kernel should roughly halve the sweep cost.  If bf16 ~= 2x f32,
the ALU unpacks to f32 and there is nothing to win.

Usage: python tools/turbo_probe7.py [iters] [tile_c]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
TC = int(sys.argv[2]) if len(sys.argv) > 2 else 256

# the v7 wiring (predecessor rows + combo index), hard-coded shape-free
A_SRC = [[0, 4], [4, 0], [1, 5], [5, 1], [2, 6], [6, 2], [3, 7], [7, 3]]
A_CMB = [[0, 3], [3, 0], [3, 0], [0, 3], [1, 2], [2, 1], [2, 1], [1, 2]]


def make_kernel(rows: int):
    def kernel(g, a0, out):
        combos = (None, g[0], g[1], g[0] + g[1])

        def step(a):
            return [jnp.maximum(
                a[A_SRC[s][0]] + combos[A_CMB[s][0]]
                if A_CMB[s][0] else a[A_SRC[s][0]],
                a[A_SRC[s][1]] + combos[A_CMB[s][1]]
                if A_CMB[s][1] else a[A_SRC[s][1]],
            ) for s in range(8)]

        def body(i, a):
            a = step(step(a))
            z = a[0]
            return [v - z for v in a]

        a = [a0[s] for s in range(8)]
        a = jax.lax.fori_loop(0, ITERS, body, a)
        for s in range(8):
            out[pl.ds(s, 1)] = a[s][None]

    return kernel


def run(dtype, rows):
    g = jnp.ones((2, rows, TC), dtype) * 0.001
    a0 = jnp.zeros((8, rows, TC), dtype)
    fn = pl.pallas_call(
        make_kernel(rows),
        out_shape=jax.ShapeDtypeStruct((8, rows, TC), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def bench(g, a0):
        return jnp.sum(fn(g, a0).astype(jnp.float32))

    float(bench(g, a0))  # compile
    t0 = time.perf_counter()
    for _ in range(8):
        r = float(bench(g, a0))
    dt = (time.perf_counter() - t0) / 8
    # elements processed per trellis step
    eps = 8 * rows * TC * 2 * ITERS / dt
    return dt, eps, r


def main():
    print(f"iters={ITERS} tile_c={TC} dev={jax.devices()[0].platform}")
    t32, e32, _ = run(jnp.float32, 8)
    print(f"f32  (8,{TC}) : {t32 * 1e3:8.3f} ms   {e32 / 1e9:8.2f} Gelem/s")
    t16, e16, _ = run(jnp.bfloat16, 16)
    print(f"bf16 (16,{TC}): {t16 * 1e3:8.3f} ms   {e16 / 1e9:8.2f} Gelem/s")
    print(f"bf16 element-throughput advantage: {e16 / e32:.2f}x")


if __name__ == "__main__":
    main()
