"""Measure the merge-on-read READ TAX (r12, VERDICT r11 ask #6).

Builds a lineitem-backed snapshot table, accumulates deletion-vector
positions with successive ``delete(..., mor=True)`` calls, then times:

- ``plain_read``   - the pre-delete table (no DVs anywhere);
- ``dv_read``      - the same files through the DV anti-join
                     (positions folded to one live sidecar per file);
- ``compact``      - the one-off materialization cost;
- ``compacted_read`` - the post-compact plain scan.

Each timing is the min of 3 warm runs of a full-evaluation noop write
(bench.py's methodology).  Output: one JSON line for SCALE.md.

Run: python scripts/dv_read_tax.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aliyun_maxcompute_data_collectors_spark.session import get_spark, load_tables
from aliyun_maxcompute_data_collectors_spark.snapshots import SnapshotTable


def _timed(fn, iters: int = 3) -> float:
    runs = []
    fn()  # warm-up
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dv-read-tax")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_extendedprice")
    root = tempfile.mkdtemp(prefix="dv_tax_")
    tab = SnapshotTable.init(spark, root)
    tab.append(li.coalesce(2))
    v_plain = tab.current_version()

    def _read(version=None):
        tab.read(version).write.format("noop").mode("overwrite").save()

    plain = _timed(lambda: _read(v_plain))
    t0 = time.perf_counter()
    for i in range(16):
        tab.delete(f"l_orderkey % 100 = {i}", mor=True)
    mor_deletes_s = round(time.perf_counter() - t0, 4)
    m = tab.manifest()
    n_pos = sum(v["n"] for v in (m.get("dvs") or {}).values())
    dv_read = _timed(lambda: _read())
    t0 = time.perf_counter()
    tab.compact()
    compact_s = round(time.perf_counter() - t0, 4)
    compacted = _timed(lambda: _read())
    print(json.dumps({
        "sf_dir": sf_dir,
        "rows": m["rows"],
        "dv_positions": n_pos,
        "live_sidecars": len({v["path"]
                              for v in (m.get("dvs") or {}).values()}),
        "plain_read_s": plain,
        "dv_read_s": dv_read,
        "dv_read_tax_x": round(dv_read / plain, 2) if plain else None,
        "mor_deletes_16_s": mor_deletes_s,
        "compact_s": compact_s,
        "compacted_read_s": compacted,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
