"""Custom stateful streaming operators.

No reference analogue (jsonld-java is synchronous batch — SURVEY.md
§2.3); semantics are defined by our tests: the stream result must equal
the batch computation over the same rows.

Two state layers:

* ``stream_exact_dedup`` — engine-managed dedup state keyed by content
  hash. Without a watermark the state is unbounded (exact global dedup);
  pass ``within_watermark`` to bound state for append-heavy feeds where
  duplicates arrive close together.
* ``stream_user_totals`` — ``applyInPandasWithState``: an explicit
  GroupState per user accumulating (count, total) across micro-batches —
  the template for custom accumulators (session windows, dedup-with-TTL,
  incremental entity stats) that built-in operators can't express.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_TOTALS_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def stream_exact_dedup(docs: DataFrame, text_col: str = "text",
                       watermark_col: str | None = None,
                       within_watermark: str | None = None) -> DataFrame:
    """First occurrence of each distinct text survives; engine dedup
    state persists across micro-batches (and restarts, via the
    checkpoint)."""
    if bool(within_watermark) != bool(watermark_col):
        # a silently ignored half of the pair falls back to UNBOUNDED
        # dedup state — the exact failure the parameters exist to
        # prevent (state grows until executors OOM)
        raise ValueError(
            "stream_exact_dedup: watermark_col and within_watermark "
            "must be passed together (got "
            f"watermark_col={watermark_col!r}, "
            f"within_watermark={within_watermark!r})")
    hashed = docs.withColumn("_h", F.md5(F.col(text_col)))
    if within_watermark and watermark_col:
        return (hashed.withWatermark(watermark_col, within_watermark)
                .dropDuplicatesWithinWatermark(["_h"]).drop("_h"))
    return hashed.dropDuplicates(["_h"]).drop("_h")


def _update_user_totals(key, pdfs: Iterator, state: GroupState):
    import pandas as pd
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [total]})


def stream_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum) maintained in explicit GroupState —
    emits the updated totals for every user seen in each micro-batch."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user_totals,
                outputStructType=USER_TOTALS_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_idx", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("total_value", T.DoubleType()),
])

_SESSION_STATE_SCHEMA = T.StructType([
    T.StructField("start", T.DoubleType()),
    T.StructField("last", T.DoubleType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
    T.StructField("idx", T.LongType()),
])


def stream_sessionize(events: DataFrame, gap_s: int = 1800,
                      ts_col: str = "ts", user_col: str = "user_id",
                      value_col: str = "value",
                      order_tiebreak: str = "event_id") -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    — the per-user open session lives in explicit GroupState across
    micro-batches; a CLOSED session row (same shape as the batch
    ``session_stats`` rollup) is emitted the moment a later event
    exceeds ``gap_s``.

    Contract: micro-batches must arrive per-user time-ordered (true for
    time-partitioned file feeds and for any source after a watermark
    sort) — an event older than the open session's last timestamp would
    belong to an already-emitted session, which no online sessionizer
    can retract. Each user's final session stays open (in state) until
    more events arrive — the streaming-correct behavior; an
    event-time-timeout flush is one ``GroupStateTimeout`` away if the
    feed should force-close idle sessions."""
    gap = float(gap_s)

    def _r(x: float, nd: int) -> float:
        # Spark/DuckDB round() is HALF_UP (away from zero); Python's
        # built-in round is HALF_EVEN — a session total landing on an
        # exact binary half (e.g. 0.125 at 2 dp) would diverge from
        # the batch session_stats rollup the stream contracts to
        # equal (review finding)
        import math
        f = 10.0 ** nd
        return math.copysign(math.floor(abs(x) * f + 0.5) / f, x)

    def update(key, pdfs: Iterator, state: GroupState):
        import pandas as pd
        (user_id,) = key
        if state.exists:
            start, last, n, total, idx = state.get
        else:
            start, last, n, total, idx = None, None, 0, 0.0, 0
        closed = []
        batches = [pdf for pdf in pdfs if len(pdf)]
        if batches:
            df = pd.concat(batches).sort_values(["_t", "event_id"])
            for t, v in zip(df["_t"].tolist(), df["value"].tolist()):
                t, v = float(t), float(v)
                if last is None:
                    start, last, n, total = t, t, 1, v
                elif t - last > gap:
                    closed.append((user_id, idx, n,
                                   _r(last - start, 6),
                                   _r(total, 2)))
                    idx += 1
                    start, last, n, total = t, t, 1, v
                else:
                    last, n, total = t, n + 1, total + v
        state.update((start, last, n, total, idx))
        if closed:
            yield pd.DataFrame(closed, columns=[
                "user_id", "session_idx", "n_events", "duration_s",
                "total_value"])

    # column names are parameters like the batch session_stats API
    # (review finding: hardcoded names made the stream operator
    # unusable on batch-API-shaped inputs); try_cast — a malformed
    # string timestamp is NULL (dropped below), never an ANSI crash
    prepared = events.select(
        F.col(user_col).alias("user_id"),
        F.col(order_tiebreak).alias("event_id"),
        F.col(value_col).alias("value"),
        F.expr(f"try_cast(`{ts_col}` as timestamp)")
         .cast("double").alias("_t"))
    # null/unparseable timestamps cast to null → NaN in pandas, and a
    # NaN poisons the open-session state (NaN - last > gap is always
    # False, so the session never closes and emits NaN durations).
    # They are dropped here: an event with no event time has no place
    # on a session timeline. (Batch `sessionize` gives each null-ts row
    # its own session — callers needing that semantic must pre-assign
    # timestamps; for stream/batch comparisons filter nulls from both.)
    prepared = prepared.where(F.col("_t").isNotNull())
    return (prepared.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=SESSION_SCHEMA,
                stateStructType=_SESSION_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
