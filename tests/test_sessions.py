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


def test_chunked_equals_single_pass_boundary_straddle(spark):
    """Hand-built cases exercising every boundary shape: session
    straddling a chunk edge, session spanning a WHOLE chunk (n_k = 0
    chain), empty chunks between events, new session exactly at a
    chunk edge."""
    from jsonld_spark.operators.sessions import sessionize_chunked
    rows = [
        # user 1: events at 900-s chunks (chunk_s=1000), gap_s=300
        (0, 1, 950, 1.0),    # chunk 0
        (1, 1, 1050, 1.0),   # chunk 1, gap 100 — straddles boundary
        (2, 1, 1150, 1.0),   # same session
        (3, 1, 3100, 1.0),   # gap 1950 — new session, empty chunk 2
        (4, 1, 3990, 1.0),   # chunk 3, gap 890 > 300: new session
        (5, 1, 4010, 1.0),   # chunk 4, gap 20: continues
        (6, 1, 5010, 1.0),   # chunk 5, gap 1000: new session
        (7, 2, 0, 1.0),      # other user independent
        # user 3: one session chaining through 3 chunks (n_k=0 twice)
        (8, 3, 990, 1.0), (9, 3, 1100, 1.0), (10, 3, 1990, 1.0),
        (11, 3, 2100, 1.0), (12, 3, 2990, 1.0),
    ]
    ev = _events(spark, rows)
    want = {r.event_id: (r.user_id, r.session_idx)
            for r in sessionize(ev, gap_s=300).collect()}
    got = {r.event_id: (r.user_id, r.session_idx)
           for r in sessionize_chunked(ev, gap_s=300, chunk_s=1000)
           .collect()}
    assert got == want


def test_chunked_equals_single_pass_hot_user(spark):
    """A synthetic hot user with events spread far beyond one chunk —
    the key the per-user single-task bound would funnel — plus random
    users; chunked output must equal the single-pass output exactly."""
    import random

    from jsonld_spark.operators.sessions import sessionize_chunked
    rng = random.Random(42)
    rows, eid = [], 0
    t = 0
    for _ in range(400):  # hot user 99: many sessions over many chunks
        t += rng.choice([10, 100, 500, 2500, 7000])
        rows.append((eid, 99, t, 1.0))
        eid += 1
    for u in range(5):
        t = rng.randint(0, 5000)
        for _ in range(30):
            t += rng.choice([5, 300, 2000, 40000])
            rows.append((eid, u, t, 1.0))
            eid += 1
    ev = _events(spark, rows)
    want = {r.event_id: r.session_idx
            for r in sessionize(ev, gap_s=1800).collect()}
    got = {r.event_id: r.session_idx
           for r in sessionize_chunked(ev, gap_s=1800, chunk_s=3600)
           .collect()}
    assert got == want
    # and the rolled-up stats agree too (chunked routing flag)
    from jsonld_spark.operators.sessions import session_stats
    a = {(r.user_id, r.session_idx): (r.n_events, r.duration_s)
         for r in session_stats(ev, gap_s=1800).collect()}
    b = {(r.user_id, r.session_idx): (r.n_events, r.duration_s)
         for r in session_stats(ev, gap_s=1800, chunked=True,
                                chunk_s=3600).collect()}
    assert a == b


def test_chunked_equals_single_pass_null_timestamps(spark):
    """NULL timestamps: each null row is its own session (lag is null
    every time) and real events start fresh after them — chunked mode
    must number identically via its dedicated null chunk."""
    from pyspark.sql import functions as F

    from jsonld_spark.operators.sessions import sessionize_chunked
    df = spark.createDataFrame(
        [(0, 1, None, 1.0), (1, 1, None, 1.0), (2, 1, 100, 1.0),
         (3, 1, 150, 1.0), (4, 1, 5000, 1.0), (5, 2, 10, 1.0)],
        "event_id long, user_id long, ts_s long, value double")
    ev = df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    want = {r.event_id: r.session_idx
            for r in sessionize(ev, gap_s=1800).collect()}
    got = {r.event_id: r.session_idx
           for r in sessionize_chunked(ev, gap_s=1800, chunk_s=1000)
           .collect()}
    assert got == want
