#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): time individual declared
queries with the noop sink and/or .count(), capture explain("formatted")
plans. Does NOT replace bench.py (frozen for measurement) — numbers from
here are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py QUERY [QUERY...] [--sf DIR] [--reps N]
         [--explain OUTDIR] [--noop]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>.txt explain output")
    ap.add_argument("--noop", action="store_true",
                    help="time noop-sink write instead of .count()")
    ap.add_argument("--suffix", default="",
                    help="suffix for explain files (e.g. _before)")
    args = ap.parse_args()

    import __spark_entry__ as E
    from jsonld_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    # warm the JVM/UDF pool exactly like bench.py
    qs["dedup_exact"](spark, args.sf).count()
    qs["jsonld_doc_triples"](spark, args.sf).count()
    out: dict[str, dict] = {}
    for name in args.queries:
        df = qs[name](spark, args.sf)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        samples = []
        n = None
        for _ in range(args.reps):
            # timer starts BEFORE query construction, exactly like
            # bench.py — eager lineage cuts inside the query body are
            # part of the measured work
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(samples), "samples": samples, "rows": n}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
