import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from srsran_4g_tpu.channel.awgn import awgn, snr_to_noise_var
from srsran_4g_tpu.models import grid as G, pdsch

cell = G.CellConfig(nof_prb=100, cell_id=123, cfi=1)
cfg = pdsch.PdschConfig(cell=cell, rnti=0x1234, subframe=4, mod="64qam", tbs=75376)
B = 32
rng = np.random.default_rng(0)
bits = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))
tx = jax.jit(lambda b: pdsch.add_crs(cfg, pdsch.encode(cfg, b)))(bits)
rx = jax.block_until_ready(awgn(jax.random.PRNGKey(1), tx, snr_to_noise_var(30.0)))

f = jax.jit(lambda g: pdsch.decode(cfg, g, n_iter=4)["crc_ok"])
jax.block_until_ready(f(rx))
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        jax.block_until_ready(f(rx))
print("trace done")
