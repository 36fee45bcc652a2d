#!/usr/bin/env python
"""Capture the zorder_by assembly plan (the subtree cluster() executes)
for the r12 before/after evidence trail.

Usage: python scripts/capture_zorder_plan.py <tag> <suffix>
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aliyun_maxcompute_data_collectors_spark.operators.zorder import zorder_by
from aliyun_maxcompute_data_collectors_spark.session import get_spark, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-zorder-plan")
    spark.sparkContext.setLogLevel("ERROR")
    o = load_tables(spark, SF_DIR, ["orders"])["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice")
    z = zorder_by(o, ["o_orderkey", "o_custkey"], n_files=8)
    txt = z._sc._jvm.PythonSQLUtils.explainString(
        z._jdf.queryExecution(), "formatted")
    path = os.path.join(outdir, f"zorder_assembly_{suffix}.txt")
    with open(path, "w") as f:
        f.write(txt)
    print("wrote", path, f"({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
