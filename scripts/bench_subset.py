#!/usr/bin/env python
"""Targeted bench: time NAMED registry queries with bench.py's exact
methodology (1 warmup + BENCH_ITERS timed runs, min, full-evaluation
noop sink) without paying for the whole headline set.  The round-12
optimization evidence trail uses this for the before/after numbers of
each change (guide #1: measure first, re-measure after), with the
machine load recorded so drift can be attributed.

Usage: python scripts/bench_subset.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), BENCH_ITERS
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY
from aliyun_maxcompute_data_collectors_spark.session import get_spark


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = max(1, int(os.environ.get("BENCH_ITERS", "3")))
    load_before = round(os.getloadavg()[0], 2)
    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name][0]
        spark.sparkContext.setJobDescription(f"bench-subset: {name}")
        runs = []
        for _ in range(1 + iters):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        times[name] = round(min(runs[1:]), 3)
    print(json.dumps({"queries": times, "sf_dir": sf_dir,
                      "load1_before": load_before,
                      "load1_after": round(os.getloadavg()[0], 2)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
