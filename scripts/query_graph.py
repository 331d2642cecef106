#!/usr/bin/env python
"""Run a SPARQL text query against a materialized knowledge graph.

    spark-submit --py-files jsonld_spark.zip scripts/query_graph.py \
        --graph /warehouse/kg                 (run_pipeline --output) \
        --query 'PREFIX s: <http://schema.org/> SELECT ... WHERE {...}' \
        [--out /warehouse/answers]  [--show 20]

Completes the user story: construct the graph with run_pipeline, then
query it with plain SPARQL — the text compiles onto the engine's
relational algebra (operators/sparql.py), so constant terms push down
into the bucketed parquet scan and join order is Catalyst/AQE's.

--graph reads ``<dir>/triples`` (materialize_graph's layout, subject-
bucketed); --triples reads any parquet of (subj, pred, obj_value[,
graph]) directly. SELECT/CONSTRUCT/DESCRIBE write parquet to --out
(or print the first --show rows); ASK prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--graph", default=None,
                     help="materialized graph dir (reads <dir>/triples)")
    src.add_argument("--triples", default=None,
                     help="raw triples parquet path")
    q = p.add_mutually_exclusive_group(required=True)
    q.add_argument("--query", default=None, help="SPARQL query text")
    q.add_argument("--query-file", default=None,
                   help="file containing the SPARQL query")
    p.add_argument("--out", default=None,
                   help="write the result as parquet here")
    p.add_argument("--show", type=int, default=20,
                   help="without --out: print up to N rows (default 20)")
    args = p.parse_args(argv)

    from jsonld_spark.operators.sparql import sparql_query
    from jsonld_spark.session import get_spark

    query = args.query
    if query is None:
        with open(args.query_file, encoding="utf-8") as f:
            query = f.read()

    t0 = time.time()
    spark = get_spark("jsonld-kg-query")
    path = f"{args.graph}/triples" if args.graph else args.triples
    triples = spark.read.parquet(path)
    result = sparql_query(triples, query)
    if isinstance(result, bool):        # ASK
        print(json.dumps({"ask": result,
                          "wall_s": round(time.time() - t0, 2)}))
        return 0
    if args.out:
        result.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"rows": n, "out": args.out,
                          "wall_s": round(time.time() - t0, 2)}))
    else:
        rows = result.limit(args.show).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
        print(json.dumps({"rows_shown": len(rows),
                          "wall_s": round(time.time() - t0, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
