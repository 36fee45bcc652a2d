#!/usr/bin/env python
"""Capture the INTERNAL physical plans of the MOR/snapshot operators the
r12 optimization round touches.  The snapshot-family registry queries
return eagerly-checkpointed aggregates (their outer explain is just an
ExistingRDD scan), so the plans that prove/disprove the optimization
claims are the operator-internal ones:

- dv_read:    SnapshotTable.read() on a table where only SOME files
              carry deletion vectors (the clean/dirty split target);
- dv_dml:     the _scan_subset positional capture a MOR delete runs;
- merge_scan: the _merge_mor target-scan shape (inner vs single-pass).

Usage: python scripts/capture_mor_plans.py <tag> <suffix>
Writes plans/<tag>/mor_<name>_<suffix>.txt
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.session import get_spark, load_tables
from aliyun_maxcompute_data_collectors_spark.snapshots import SnapshotTable

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-mor-plans")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="plan_mor_")
    try:
        o = load_tables(spark, SF_DIR, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        m10 = F.col("o_orderkey") % 10
        tab = SnapshotTable.init(spark, os.path.join(root, "t"))
        tab.append(o.where(m10 < 5).coalesce(1))            # file 1
        tab.append(o.where((m10 >= 5) & (m10 < 8)).coalesce(1))  # file 2
        # MOR delete that touches ONLY file 2 (keys %10 = 6 live there):
        # after it, file 1 is CLEAN and file 2 carries the vector - the
        # split-scan shape the r12 read-path change targets.
        tab.delete("o_orderkey % 10 = 6", mor=True)

        plans = {
            "dv_read": _explain(tab.read()),
            "dv_read_agg": _explain(
                tab.read().agg(F.count(F.lit(1)), F.sum("o_orderkey"))),
        }
        m = tab.manifest()
        plans["dv_dml_capture"] = _explain(
            tab._scan_subset(m, m["files"], file_col="__graft_file",
                             row_col="__graft_row"))
        for name, plan in plans.items():
            path = os.path.join(outdir, f"mor_{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
