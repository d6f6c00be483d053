"""Microbench: one windowed max-log-MAP half-iteration (the Pallas kernel)
at the headline bench configuration (1664 CBs x K=5824), plus the full
turbo_decode. Used to iterate on ops/pallas/turbo_map.py.

Usage: python tools/turbo_kernel_bench.py [half|full]
Env: TURBO_KERNEL / TURBO_TILE / TURBO_UNROLL / TURBO_WINDOW / BENCH_CBS
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from srsran_4g_tpu.ops import turbo

K = int(os.environ.get("BENCH_K", "5824"))
B = int(os.environ.get("BENCH_CBS", "1664"))
WIN = int(os.environ.get("TURBO_WINDOW", "208"))  # ops/turbo.py default
TRAIN = int(os.environ.get("TURBO_TRAIN", "32"))

rng = np.random.default_rng(0)
bits = rng.integers(0, 2, size=(B, K)).astype(np.int8)


def make_llrs():
    # timing only — random LLRs exercise the identical compute graph
    llr = rng.normal(0, 4.0, (B, 3, K + 4))
    return jnp.asarray(llr.astype(np.float32))


def timeit(name, f, *args, iters=10):
    # the axon tunnel's block_until_ready is unreliable; fetch the scalar
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(r)  # fence: in-order execution implies all prior steps done
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "half"
    d_llr = make_llrs()
    if mode in ("half", "all"):
        ls = d_llr[:, 0, :K]
        lp1 = d_llr[:, 1, :K]
        t1_sys = jnp.stack([d_llr[:, 0, K], d_llr[:, 2, K], d_llr[:, 1, K + 1]], -1)
        t1_par = jnp.stack([d_llr[:, 1, K], d_llr[:, 0, K + 1], d_llr[:, 2, K + 1]], -1)

        half = jax.jit(lambda a, b, c, dd: jnp.sum(
            turbo._map_windowed_pl(a, b, c, dd, WIN, TRAIN)))
        timeit(f"half-iter pallas (W={WIN},T={TRAIN})", half, ls, lp1, t1_sys, t1_par)

        # kernel alone, gamma streams prebuilt on device
        w = K // WIN
        n = B * w
        # default matches the production default in ops/turbo.py
        ver = os.environ.get("TURBO_KERNEL", "v9")
        if ver in ("v7", "v8", "v9"):
            from srsran_4g_tpu.ops.pallas import turbo_map as tmap
            if ver == "v9":
                fn = tmap.map_windowed_pallas_v9
            else:  # v8 = v7 kernel with the radix-4 two-step ACS body
                import functools
                fn = functools.partial(tmap.map_windowed_pallas_v7,
                                       radix4=(ver == "v8"))
            g = jnp.asarray(rng.normal(0, 4.0, (WIN + 2 * TRAIN, n))
                            .astype(np.float32))
            a0 = jnp.asarray(rng.normal(0, 1.0, (8, n)).astype(np.float32))
            kern = jax.jit(lambda gg, aa: jnp.sum(fn(
                gg, gg, aa, aa, TRAIN, WIN, B, w)))
            timeit(f"pallas kernel only ({ver})", kern, g, a0)
        elif ver == "v4":
            from srsran_4g_tpu.ops.pallas.turbo_map import map_windowed_pallas_r4
            g = jnp.asarray(rng.normal(0, 4.0, (WIN + 2 * TRAIN, n))
                            .astype(np.float32))
            a0 = jnp.asarray(rng.normal(0, 1.0, (8, n)).astype(np.float32))
            kern = jax.jit(lambda gg, aa: jnp.sum(map_windowed_pallas_r4(
                gg, gg, aa, aa, TRAIN, WIN, B, w)))
            timeit("pallas kernel only (r4)", kern, g, a0)
        else:
            from srsran_4g_tpu.ops.pallas.turbo_map import map_windowed_pallas
            steps = TRAIN + WIN
            g = jnp.asarray(rng.normal(0, 4.0, (steps, n)).astype(np.float32))
            m = jnp.asarray((rng.random((steps, n)) < 0.9).astype(np.float32))
            a0 = jnp.asarray(rng.normal(0, 1.0, (8, n)).astype(np.float32))
            kern = jax.jit(lambda gg, mm, aa: jnp.sum(map_windowed_pallas(
                gg, gg, mm, gg, gg, mm, aa, aa, TRAIN, WIN)))
            timeit("pallas kernel only (v1)", kern, g, m, a0)
    if mode in ("full", "all"):
        dec = jax.jit(lambda d: jnp.sum(turbo.turbo_decode(
            d, n_iter=4, window=WIN, train=TRAIN, backend="pallas",
            early_crc=None)[1]))
        timeit("turbo_decode 4 iters (no early)", dec, d_llr, iters=3)


if __name__ == "__main__":
    main()
