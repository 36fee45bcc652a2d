"""sf1 scale smoke: run the headline bench set at 10x the bench scale and
compare per-query against the sf0.1 reference timings.

    python scripts/scale_up.py 10          # once, writes /tmp/spark_graft_scale/sf1
    python scripts/sf1_smoke.py [SF1_DIR] [SF01_JSON]

A query is flagged SUPERLINEAR if t(sf1) > 10x t(sf0.1) + 2s (the constant
absorbs fixed per-query overhead - session/plan/codegen - that does not
scale with data).  On a linear-scaling engine every per-row cost grows 10x
while fixed costs stay flat, so anything well past 10x means the algorithm
itself degrades with scale (quadratic candidate growth, skew collapse,
driver-side materialization) - exactly what must not survive to 100 TB.

Writes SCALE_SMOKE.json {query: {sf01, sf1, ratio, flag}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY
from aliyun_maxcompute_data_collectors_spark.session import get_spark

from bench import BENCH_QUERIES, _evaluate  # noqa: E402


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1"
    base_json = sys.argv[2] if len(sys.argv) > 2 else None
    base: dict[str, float] = {}
    if base_json and os.path.exists(base_json):
        doc = json.load(open(base_json))
        base = (doc.get("parsed") or doc).get("queries", {})

    spark = get_spark("sf1-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in BENCH_QUERIES:
        if name not in REGISTRY:
            continue
        fn = REGISTRY[name][0]
        runs = []
        for _ in range(2):  # 1 warmup + 1 timed: smoke, not a benchmark
            t0 = time.perf_counter()
            _evaluate(fn(spark, sf1_dir))
            runs.append(time.perf_counter() - t0)
        t = round(runs[-1], 3)
        b = base.get(name)
        ratio = round(t / b, 2) if b else None
        flag = "SUPERLINEAR" if (b and t > 10 * b + 2.0) else "ok"
        out[name] = {"sf01": b, "sf1": t, "ratio": ratio, "flag": flag}
        print(f"{name:28s} sf0.1={b if b is not None else '?':>6} "
              f"sf1={t:7.3f}  x{ratio if ratio else '?':<6} {flag}")
    spark.stop()
    with open("SCALE_SMOKE.json", "w") as f:
        json.dump(out, f, indent=1)
    bad = [k for k, v in out.items() if v["flag"] != "ok"]
    print(json.dumps({"superlinear": bad, "n": len(out)}))


if __name__ == "__main__":
    main()
