#!/usr/bin/env bash
# Local CI runner — the same stages as .github/workflows/ci.yml plus the
# TPU-only gates, in the order that catches regressions cheapest-first.
# Counterpart of the reference's ccpp.yml cmake+ninja+ctest pipeline.
#
# Usage: bash tools/ci.sh [--no-tpu]
set -euo pipefail
cd "$(dirname "$0")/.."

NO_TPU=${1:-}

echo "=== stage 1: native runtime build + TSAN race gate ==="
make -C native
make -C native tsan   # builds AND runs rt_test_tsan under TSAN

echo "=== stage 2: pytest suite (virtual 8-device CPU mesh) ==="
python -m pytest tests/ -q

echo "=== stage 3: 8-device multichip dry run ==="
XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
EOF

if [ "$NO_TPU" != "--no-tpu" ]; then
  echo "=== stage 4 (TPU): kernel smoke gate, every TURBO_KERNEL ==="
  python tools/tpu_smoke.py

  echo "=== stage 5 (TPU): headline bench ==="
  python bench.py

  echo "=== stage 6 (TPU, non-fatal): axon platform-bug regression gates ==="
  # known platform bugs, recorded not fatal (ARCHITECTURE.md "Known
  # platform cliff"): fused-graph CRC miscompile above batch ~192, and
  # the >20-min TM4 2x2 AOT compile.  Exit 1 only on a REGRESSION
  # (the always-correct split graph failing).
  python tools/axon_repro.py batch_cliff \
    || echo "ci: axon batch_cliff REGRESSION (see artifacts/axon_repro.json)"
  python tools/axon_repro.py mimo_compile --budget 2400 \
    || echo "ci: axon mimo_compile child error (see artifacts/axon_repro.json)"
fi

echo "CI: all stages green"
