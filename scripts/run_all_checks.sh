#!/bin/bash
# Full local validation: tests (CPU, 8 virtual devices), driver entry
# points, and the TPU headline benchmark. Usage: bash scripts/run_all_checks.sh
set -e
cd "$(dirname "$0")/.."
echo "== tests =="
python -m pytest tests/ -x -q
echo "== driver entry points (virtual 8-device CPU mesh) =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python - <<'PY'
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry()
jax.block_until_ready(jax.jit(fn)(*args))
g.dryrun_multichip(8)
print('entry + dryrun OK')
PY
echo "== TPU benchmark =="
timeout 590 python bench.py
