#!/usr/bin/env python
"""Quiet-gated sf0.1/sf1 timings for the round-4 KG/SPARQL operators
(one JSON line per sf level; count() is the action)."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

QUERIES = ["bgp_optional", "bgp_filter", "bgp_union", "bgp_not_exists",
           "bgp_graph", "bgp_agg", "construct_media", "shacl_report",
           "owl_entail", "kg_incremental"]


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
    spark = get_spark("bench_kg_r4", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for sf_dir in sys.argv[1:]:
        res, rows = {}, {}
        for name in QUERIES:
            load = wait_quiet()
            t0 = time.time()
            rows[name] = qs[name](spark, sf_dir).count()
            res[name] = round(time.time() - t0, 3)
        print(json.dumps({"sf_dir": sf_dir, "loadavg_pre": load,
                          "sec": res, "rows": rows}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
