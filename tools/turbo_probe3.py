"""Scratch: where do the 28us/tile go? Grid-step overhead isolation."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 86528
rng = np.random.default_rng(0)

def timeit(name, jf, *args, iters=10):
    float(jf(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jf(*args)
    float(r)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)

def empty_bench(name, tile, steps=176, win=112, scratch=True, nin=2):
    npad = ((N + tile - 1) // tile) * tile
    g = jnp.asarray(rng.normal(0, 4.0, (steps, npad)).astype(np.float32))
    def kernel(*refs):
        out = refs[nin]
        out[pl.ds(0, 1), :] = refs[0][0:1, :]
    spec_g = pl.BlockSpec((steps, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=(npad // tile,),
        in_specs=[spec_g] * nin,
        out_specs=pl.BlockSpec((win, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((win, npad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((win // 2, 8, tile), jnp.float32)] if scratch else [],
    )
    jf = jax.jit(lambda gg: jnp.sum(f(*([gg] * nin))))
    timeit(f"{name} (tiles={npad//tile})", jf, g)

empty_bench("empty tile=1024", 1024)
empty_bench("empty tile=2048", 2048)
empty_bench("empty tile=512", 512)
empty_bench("empty tile=1024 no-scratch", 1024, scratch=False)
empty_bench("empty tile=1024 1-input", 1024, nin=1)
empty_bench("empty tile=1024 16-step blocks", 1024, steps=16)
empty_bench("empty tile=1024 win=8", 1024, win=8)
