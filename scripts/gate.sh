#!/bin/bash
# Snapshot gate (VERDICT r2/r3 ask): run this before committing a round
# snapshot.  Exits nonzero unless:
#   1. the fast suite is green,
#   2. the load-bearing slow subset is green (kernel<->jnp parity for all
#      three integrators, kernel-path gradients, sharding identity),
#   3. the on-chip bench runs AND its pallas<->jnp parity check passes.
#
# The full slow suite (~22 tests, >10 min of CPU compiles) is NOT required
# per snapshot — this subset is exactly the set whose breakage shipped the
# round-2 regression.  Usage:  bash scripts/gate.sh [--no-bench]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== gate 1/3: fast suite ==="
python -m pytest tests/ -q -m "not slow" -x

echo "=== gate 2/3: load-bearing slow subset ==="
python -m pytest -q -x \
  "tests/test_pallas.py::test_pallas_euler_matches_jnp" \
  "tests/test_pallas.py::test_pallas_rk45_matches_jnp" \
  "tests/test_pallas.py::test_pallas_kerr_matches_jnp" \
  "tests/test_march_grad.py" \
  "tests/test_dist.py::test_sharded_trace_matches_single_device" \
  "tests/test_dist.py::test_sharded_pallas_interpret_matches_single_device"

if [[ "${1:-}" == "--no-bench" ]]; then
  echo "=== gate 3/3: SKIPPED (--no-bench) ==="
  exit 0
fi

echo "=== gate 3/3: on-chip bench + parity ==="
python - <<'PY'
import json
from bhx.bench import run_bench, parity_check
r = run_bench(iters=3)
p = parity_check()
r.update(p)
print(json.dumps(r))
assert p["parity_ok"], "on-chip pallas<->jnp parity gate FAILED"
PY
echo "gate: ALL GREEN"
