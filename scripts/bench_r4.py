#!/usr/bin/env python
"""Round-4 targeted bench: the verdict-fix operators at a given SF dir
(best-of-2, local[N]) — simhash collapse, embedding-cluster lineage
cut, and the new incremental / production-regime / stateful-streaming
queries. Prints one JSON line; pre-run loadavg recorded because only a
quiet box (<~2.5) gives meaningful numbers on this shared sandbox."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "simhash_neardup",
    "simhash_neardup_reps",
    "embedding_clusters",
    "embedding_neardup",
    "embedding_incremental",
    "embedding_neardup_hi",
    "strip_boilerplate",
    "streaming_sessions",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    load_pre = round(os.getloadavg()[0], 2)

    import __spark_entry__ as E
    from jsonld_spark.session import get_spark
    spark = get_spark("bench_r4", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs["dedup_exact"](spark, sf_dir).count()  # warm JIT + workers
    out: dict[str, dict] = {}
    for name in QUERIES:
        best, n = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = {"sec": round(best, 3), "rows": n}
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus),
                      "loadavg_pre": load_pre,
                      "loadavg_post": round(os.getloadavg()[0], 2),
                      "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
