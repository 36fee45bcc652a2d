#!/usr/bin/env bash
# Round gate: everything the external driver will check, runnable locally.
#   bash scripts/gate.sh           # full gate (~6 min)
#   bash scripts/gate.sh quick     # tests + sf0.001 oracles only (~3 min)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 unit + integration tests =="
python -m pytest tests/ -q

echo "== 2/4 oracle harness at sf0.01 (the driver's correctness gate scale) =="
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_correctness.py -q

if [ "${1:-}" != "quick" ]; then
  echo "== 3/4 vanilla-session driver simulation (no engine configs) =="
  # Rotation gate (VERDICT r4 ask #8): a query cannot hold a first-50 slot
  # without a green vanilla-session rows+schema+hash pass — driver_sim.py
  # hash-checks exactly the first 50 queries() entries and exits non-zero
  # on any red, so an ungated rotation physically fails the gate.
  python scripts/driver_sim.py /root/testdata/sf0.01

  echo "== 4/5 bench at sf0.1 =="
  python bench.py 2>/dev/null

  echo "== 5/5 plan audit (fails on scale flags) =="
  python scripts/plan_audit.py --write 2>/dev/null | grep '^|' \
    | grep -E "CARTESIAN|ROW_PYTHON_UDF|NONSCALAR|ERROR" \
    && { echo "plan audit flagged queries above"; exit 1; } || true
fi
echo "GATE PASSED"
