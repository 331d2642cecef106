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


def test_stream_sessionize_closed_sessions_equal_batch(spark, tmp_path):
    """Streaming sessionization over a two-file time-partitioned feed:
    the closed-session rows must equal the batch session_stats rollup
    minus each user's final (still-open) session — including sessions
    that straddle the micro-batch boundary."""
    from jsonld_spark.operators.sessions import session_stats
    from jsonld_spark.streaming.stateful import stream_sessionize

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    tsd = F.col("ts").cast("timestamp").cast("double")
    split_ts = events.select(
        F.percentile(tsd, F.lit(0.5)).alias("p")).first()["p"]
    inp = str(tmp_path / "ev")
    # time-partitioned files: batch 1 = early half, batch 2 = late half
    events.where(tsd < split_ts).write.mode("append").parquet(f"{inp}/f1")
    events.where(tsd >= split_ts).write.mode("append") \
        .parquet(f"{inp}/f2")
    schema = events.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{inp}/*"))
    out = str(tmp_path / "out")
    _run_stream(stream_sessionize(stream, gap_s=1800), out,
                str(tmp_path / "ck"))

    got = {(r.user_id, r.session_idx): (r.n_events, r.duration_s,
                                        r.total_value)
           for r in spark.read.parquet(out).collect()}
    batch = session_stats(events, gap_s=1800).collect()
    last_idx = {}
    for r in batch:
        last_idx[r.user_id] = max(last_idx.get(r.user_id, -1),
                                  r.session_idx)
    want = {(r.user_id, r.session_idx): (r.n_events, r.duration_s,
                                         r.total_value)
            for r in batch if r.session_idx < last_idx[r.user_id]}
    assert got == want and len(want) > 0


def test_stream_sessionize_drops_null_timestamps(spark, tmp_path):
    """ADVICE r3: a null/unparseable timestamp casts to NaN and would
    poison the open-session state (never closes, NaN durations) — such
    events are dropped before the state update."""
    rows = [(1, 10, 0.0, "2024-01-01 00:00:00"),
            (1, 11, 1.0, None),
            (1, 12, 2.0, "2024-01-01 03:00:00")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, value double, ts string")
    inp = str(tmp_path / "ev")
    df.coalesce(1).write.mode("append").parquet(inp)
    stream = spark.readStream.schema(df.schema).parquet(inp)
    out = str(tmp_path / "out")
    _run_stream(__import__("jsonld_spark.streaming.stateful",
                           fromlist=["stream_sessionize"])
                .stream_sessionize(stream, gap_s=1800), out,
                str(tmp_path / "ck"))
    got = spark.read.parquet(out).collect()
    # the 3h gap closes the first session; the null-ts event is absent
    assert [(r.user_id, r.session_idx, r.n_events, r.duration_s)
            for r in got] == [(1, 0, 1, 0.0)]
