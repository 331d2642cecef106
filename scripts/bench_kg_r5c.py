#!/usr/bin/env python
"""Quiet-gated sf0.1/sf1 timings for the part-13..16 round-5 rows
(per-graph path closure, union branch filters, nested negation).
Same protocol as bench_kg_r4.py: one Spark session local[32],
best-of-2 per cell, count() is the action."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

QUERIES = ["kg_path_graph", "sparql_union_filter", "sparql_double_neg"]


def wait_quiet(threshold: float = 2.5, timeout_s: float = 3600.0) -> float:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load = os.getloadavg()[0]
        if load < threshold:
            return load
        time.sleep(20)
    return os.getloadavg()[0]


def main() -> int:
    import __spark_entry__ as E
    from jsonld_spark.session import get_spark
    spark = get_spark("bench_kg_r5c", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for sf_dir in sys.argv[1:]:
        res, rows = {}, {}
        for name in QUERIES:
            load = wait_quiet()
            best = None
            for _ in range(2):
                t0 = time.time()
                rows[name] = qs[name](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            res[name] = round(best, 3)
        print(json.dumps({"sf_dir": sf_dir, "loadavg_pre": load,
                          "sec": res, "rows": rows}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
