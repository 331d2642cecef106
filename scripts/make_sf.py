#!/usr/bin/env python
"""Deterministically scale the driver testdata for PERFORMANCE runs.

    python scripts/make_sf.py --src /root/testdata/sf0.1 --factor 10 \
        --out /tmp/sf1

Replicates ``documents`` and ``embeddings`` ``factor``× with
content-perturbed copies (replica suffix on text, first-coordinate
nudge on embeddings) so dedup/near-dup workloads keep realistic
selectivity instead of collapsing onto identical rows. Keys are
``old_id * factor + r`` — disjoint, deterministic, no randomness.
Relational tables are symlinked unscaled (the pipeline tables are the
scaling story; TPC-H-ish queries have their own sf ladder upstream).

This is a measurement tool only — correctness gates always run on the
driver-provided parquet.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def scale_documents(spark, src: str, out: str, factor: int) -> int:
    docs = spark.read.parquet(f"{src}/documents.parquet")
    repl = spark.range(factor).select(F.col("id").cast("int").alias("_r"))
    scaled = (docs.repartition(spark.sparkContext.defaultParallelism)
              .crossJoin(F.broadcast(repl))
              .withColumn("doc_id", F.col("doc_id") * factor + F.col("_r"))
              .withColumn("text",
                          F.concat(F.col("text"), F.lit(" rep"),
                                   F.col("_r").cast("string")))
              .withColumn("n_chars", F.length("text"))
              .drop("_r"))
    scaled.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return scaled.count()


def scale_embeddings(spark, src: str, out: str, factor: int) -> int:
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    repl = spark.range(factor).select(F.col("id").cast("int").alias("_r"))
    nudged = F.concat(
        F.array(F.element_at("embedding", 1)
                + F.col("_r").cast("float") * F.lit(0.001)),
        F.slice("embedding", 2, 1 << 30))
    scaled = (emb.repartition(spark.sparkContext.defaultParallelism)
              .crossJoin(F.broadcast(repl))
              .withColumn("vec_id", F.col("vec_id") * factor + F.col("_r"))
              .withColumn("embedding", nudged)
              .drop("_r"))
    scaled.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return scaled.count()


RELATIONAL = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--factor", type=int, default=10)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from jsonld_spark.session import get_spark
    spark = get_spark("make_sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    n_docs = scale_documents(spark, args.src, args.out, args.factor)
    n_vecs = scale_embeddings(spark, args.src, args.out, args.factor)
    # symlink targets resolve relative to the link's directory, not the
    # cwd — store absolute targets so a relative --src doesn't dangle
    src_abs = os.path.abspath(args.src)
    for t in RELATIONAL:
        dst = f"{args.out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src_abs}/{t}.parquet", dst)
    print({"documents": n_docs, "embeddings": n_vecs,
           "factor": args.factor, "out": args.out})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
