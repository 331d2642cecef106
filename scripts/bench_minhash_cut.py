#!/usr/bin/env python
"""Quantify the minhash eager-lineage-cut tradeoff (round-2 VERDICT
item 9): time ``minhash_candidate_pairs`` with the eager materialize +
cache release (the wired default) against the lazy variant that leaves
the signature cache live, at a given SF dir. Best-of-N wall seconds,
one JSON line.

    python scripts/bench_minhash_cut.py /root/testdata/sf0.1
    python scripts/bench_minhash_cut.py /tmp/sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(os.environ.get("N_RUNS", "2"))
    from pyspark.sql import SparkSession

    from jsonld_spark.operators.dedup import minhash_candidate_pairs
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "48g")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm the scan

    def run(eager: bool) -> tuple[float, int]:
        best, rows = None, 0
        for _ in range(n_runs):
            t0 = time.time()
            out = minhash_candidate_pairs(docs, shingle_len=5,
                                          num_hashes=16, bands=4,
                                          hash_fn="md5",
                                          eager_cut=eager)
            pairs, sigs = out if not eager else (out, None)
            rows = pairs.count()
            wall = time.time() - t0
            if sigs is not None:
                sigs.unpersist()
            if best is None or wall < best:
                best = wall
        return round(best, 3), rows

    eager_s, rows = run(True)
    lazy_s, rows2 = run(False)
    assert rows == rows2, (rows, rows2)
    print(json.dumps({
        "sf_dir": sf_dir, "cpus": cpus, "rows": rows,
        "eager_cut_s": eager_s, "lazy_s": lazy_s,
        "cut_cost_s": round(eager_s - lazy_s, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
