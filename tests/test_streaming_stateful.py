"""Stateful streaming: dedup state and applyInPandasWithState totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonld_spark.streaming.stateful import (stream_exact_dedup,
                                             stream_user_totals)

SF_DIR = "/root/testdata/sf0.001"


def _run_stream(df, out_dir, ckpt, mode="append"):
    q = (df.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_stream_exact_dedup_state_spans_batches(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    inp = str(tmp_path / "in")
    # write the same texts twice (two files) — duplicates across batches
    docs.write.mode("append").parquet(inp)
    docs.withColumn("doc_id", F.col("doc_id") + 10_000) \
        .write.mode("append").parquet(inp)

    stream = spark.readStream.schema("doc_id long, text string").parquet(inp)
    out = str(tmp_path / "out")
    _run_stream(stream_exact_dedup(stream), out, str(tmp_path / "ck"))

    got = spark.read.parquet(out)
    n_distinct_texts = docs.select("text").distinct().count()
    assert got.count() == n_distinct_texts
    assert got.select("text").distinct().count() == n_distinct_texts


def test_stream_user_totals_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("user_id", "value")
    inp = str(tmp_path / "ev")
    events.write.mode("append").parquet(inp)

    stream = spark.readStream.schema("user_id long, value double") \
        .parquet(inp)
    q = (stream_user_totals(stream).writeStream.format("memory")
         .queryName("user_totals")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)

    # update mode may emit a row per micro-batch per user — keep the last
    got = (spark.table("user_totals")
           .groupBy("user_id")
           .agg(F.max("n_events").alias("n_events"),
                F.max("total_value").alias("total_value")))
    want = (events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total_value")))
    g = {r.user_id: (r.n_events, round(r.total_value, 6))
         for r in got.collect()}
    w = {r.user_id: (r.n_events, round(r.total_value, 6))
         for r in want.collect()}
    assert g == w
