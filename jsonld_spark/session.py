"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def spread_partitions(df, min_factor: int = 1):
    """Repartition a DataFrame up to the session's default parallelism if
    the scan produced fewer partitions (small files → one split → every
    downstream expression and UDF runs on one core). No-op for inputs
    that already have enough splits — at warehouse scale a real table
    scan does, so this never adds a shuffle there."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def cut_lineage(df, eager: bool = True):
    """Materialize a DataFrame and truncate its lineage.

    Uses a **reliable** checkpoint (written to the session's configured
    checkpoint directory, surviving executor loss) when
    ``sparkContext.setCheckpointDir`` has been called; otherwise falls
    back to ``localCheckpoint`` (executor-local blocks — fine for tests
    and short jobs, lost on executor failure). Long multi-hour cluster
    jobs should set a checkpoint dir so iterative operators
    (connected components, canonicalization) survive executor churn.
    """
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isDefined():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def get_spark(app_name: str = "jsonld_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # one reduce task per core by default: iterative fixpoint
        # operators (connected components, canonicalize) pay per-task
        # overhead × rounds, and 4× partitions measurably hurt them at
        # bench scale (cc_components 5.3 s → 8.4 s). Big ONE-PASS
        # shuffles are the opposite — straggler-bound in a single wave —
        # so the throughput bench uses 4 waves/core explicitly (+10%
        # measured); size-to-workload on a real cluster.
        n = cpus if cpus != "*" else "32"
        shuffle_partitions = int(n)
    builder = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        # reliable checkpoints (cut_lineage with a checkpoint dir) are
        # full dataset copies; clean them when their RDD is GC'd, else a
        # long run accumulates copies until the store fills
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
