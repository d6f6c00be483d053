"""Multi-host (DCN) smoke test: 2 real OS processes, cross-process
collectives, and the sharded pipeline step over a global mesh.

The reference's P9 (process distribution over ZMQ/SCTP) maps to
multi-controller JAX (SURVEY.md §2.8); this test runs the actual
`jax.distributed` code path on CPU — two processes × 2 virtual devices
each, a psum crossing the process boundary, and one pipeline step over
the 4-device global (dp=4) mesh.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); port = sys.argv[2]
    # must configure BEFORE the first jax import touches the backend
    from srsran_4g_tpu.parallel.dist import (host_local_batch,
                                             init_distributed,
                                             make_global_mesh)
    init_distributed(f"localhost:{{port}}", 2, pid,
                     local_device_count=2, platform="cpu")
    import jax, numpy as np
    import jax.numpy as jnp
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    # 1) a psum that must cross the process boundary (DCN analog)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    mesh = make_global_mesh(dp=4, sp=1)
    f = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, ("dp", "sp")),
        mesh=mesh, in_specs=P("dp", None), out_specs=P(),
        check_vma=False))
    local = np.full((2, 3), float(pid + 1), np.float32)   # 2 rows/process
    ga = host_local_batch(mesh, local)
    total = f(ga)   # (3,): per-column sum over all 4 rows of the batch
    got = np.asarray(jax.device_get(total))
    assert np.allclose(got, 2 * 1.0 + 2 * 2.0), got

    # 2) one sharded pipeline step over the global mesh
    from srsran_4g_tpu.models import grid as G, pdsch
    from srsran_4g_tpu.parallel import pipeline
    cell = G.CellConfig(nof_prb=6, cell_id=1, cfi=1)
    cfg = pdsch.PdschConfig(cell=cell, rnti=0x46, subframe=4,
                            mod="qpsk", tbs=152)
    step = pipeline.make_pipeline_step(cfg, mesh, snr_db=20.0, n_iter=2)
    rng = np.random.default_rng(pid)
    bits = rng.integers(0, 2, size=(2, cfg.tbs)).astype(np.int8)
    out = step(host_local_batch(mesh, bits), jax.random.PRNGKey(0))
    bler = float(np.asarray(jax.device_get(out["bler"])))
    blocks = float(np.asarray(jax.device_get(out["blocks"])))
    assert blocks == 4.0, blocks          # both processes' blocks counted
    assert bler == 0.0, bler
    print(f"proc {{pid}} OK bler={{bler}}", flush=True)
""")


def test_two_process_dcn_pipeline(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    port = 29671
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
