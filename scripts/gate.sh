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
  python - <<'EOF'
import sys, importlib.util; sys.path.insert(0, ".")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").appName("vanilla").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spec = importlib.util.spec_from_file_location("__spark_entry__", "__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
assert len(mod.entry(spark).collect()) > 0, "entry smoke failed"
bad = []
for name, fn in sorted(mod.queries().items()):
    try:
        fn(spark, "/root/testdata/sf0.01").count()
    except Exception as e:
        bad.append((name, str(e)[:80]))
assert not bad, f"vanilla-session failures: {bad}"
print(f"vanilla session OK: entry + {len(mod.queries())} queries")
EOF

  echo "== 4/5 bench at sf0.1 =="
  python bench.py 2>/dev/null

  echo "== 5/5 plan audit (fails on scale flags) =="
  python scripts/plan_audit.py --write 2>/dev/null | grep '^|' \
    | grep -E "CARTESIAN|ROW_PYTHON_UDF|NONSCALAR|ERROR" \
    && { echo "plan audit flagged queries above"; exit 1; } || true
fi
echo "GATE PASSED"
