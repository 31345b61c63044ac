"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for the 100-TB posture (SURVEY.md §4.2): AQE on (runtime
broadcast switch, skew-join splitting, partition coalescing), Arrow for
every pandas bridge, and shuffle-partition counts that AQE can shrink.
Tests/bench run ``local[N]``; the same config is what you'd ship to a
1000-executor cluster (minus master).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    # Runtime re-planning: broadcast-on-observed-size, skew split, coalesce.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batches for pandas_udf / applyInPandas / mapInPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Sane local default; a real cluster would size this to cores*2-3.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # 128 MiB scan splits — parquet row-group aligned.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.session.timeZone": "UTC",
    # Read TIMESTAMP(NANOS) parquet columns as long (Spark has no nanos
    # type); sources convert to microsecond timestamps explicitly.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "interlinked-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a session with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for key, value in ENGINE_CONF.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
