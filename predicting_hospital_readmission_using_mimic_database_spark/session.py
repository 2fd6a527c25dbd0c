"""SparkSession construction and tuning defaults.

Scale posture: these defaults are written for a real cluster (AQE on,
skew-join handling on, partition sizes tuned for 128 MB splits); local[N]
testing just shrinks shuffle partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session we are handed (the driver
# owns the session during verification; these are safe, documented knobs).
_RUNTIME_CONFS = {
    # the driver's events.parquet stores TIMESTAMP(NANOS); Spark's vectorized
    # reader rejects it unless read as long (we convert in sources.io)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic timestamp comparison with the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: partition coalescing + skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # route catalyst filters into python data sources' pushFilters()
    # (the snapshot source turns them into stats-based file skipping)
    "spark.sql.python.filterPushdown.enabled": "true",
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent).

    Called by every operator entry point so the engine behaves the same
    whether it builds the session or is handed one.
    """
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # conf not settable at runtime in this deployment: keep going,
            # readers have per-read fallbacks
            pass
    try:
        # make the engine's Python data sources (format "snapshot" /
        # "snapshot_changes") available on any session we touch
        from .sources.pydatasource import register_datasources

        register_datasources(spark)
    except Exception:
        pass  # pre-4.0 deployments without the Python DataSource API
    return spark


def get_spark(
    app_name: str = "readmission-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a tuned SparkSession.

    On a cluster, leave ``master`` unset and size ``shuffle_partitions``
    to ~2-3x total executor cores (or leave AQE to coalesce from a high
    initial number). Locally we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    return tune_session(spark)
