"""Gap-based sessionization semantics."""

from __future__ import annotations

from jsonld_spark.operators.sessions import session_stats, sessionize


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s long, value double")
    from pyspark.sql import functions as F
    return df.withColumn("ts", F.col("ts_s").cast("timestamp")) \
             .drop("ts_s")


def test_sessionize_gap_semantics(spark):
    rows = [
        (0, 1, 0, 1.0),      # user 1, session 0
        (1, 1, 1000, 1.0),   # gap 1000 <= 1800: same session
        (2, 1, 2800, 1.0),   # gap exactly 1800: SAME session (>, not >=)
        (3, 1, 5000, 1.0),   # gap 2200 > 1800: session 1
        (4, 2, 0, 1.0),      # another user: independent numbering
    ]
    got = {r.event_id: (r.user_id, r.session_idx)
           for r in sessionize(_events(spark, rows), gap_s=1800).collect()}
    assert got == {0: (1, 0), 1: (1, 0), 2: (1, 0), 3: (1, 1), 4: (2, 0)}


def test_session_stats_rollup_and_tiebreak(spark):
    rows = [
        (1, 1, 100, 2.0),   # same ts as event 0 — tie broken by event_id
        (0, 1, 100, 1.0),
        (2, 1, 4000, 4.0),  # new session
    ]
    got = {(r.user_id, r.session_idx): (r.n_events, r.duration_s,
                                        r.total_value)
           for r in session_stats(_events(spark, rows),
                                  gap_s=1800).collect()}
    assert got == {(1, 0): (2, 0.0, 3.0), (1, 1): (1, 0.0, 4.0)}
