"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full operator catalog (interlinked_spark.
catalog) for the sf0.01 DuckDB correctness gate.  Every catalog query
executes through the workflow engine (pattern routing, dependency
resolution, config injection, per-run memoization) — not as loose
DataFrame code.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from interlinked_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q5-shaped
    star join (broadcast dims + single fact shuffle) through the
    workflow engine."""
    _prepare(spark)
    return catalog.run_query("region_revenue", spark, "/root/testdata/sf0.001")


def _prepare(spark: SparkSession) -> None:
    """Ready an externally-created session: nanos-timestamp reads +
    package shipped to executors (the driver may launch us without the
    repo on the worker PYTHONPATH)."""
    from interlinked_spark.session import ship_package

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ship_package(spark)


def _runner(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prepare(spark)
        return catalog.run_query(name, spark, sf_dir)

    run.__name__ = f"q_{name}"
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2b."""
    return {name: _runner(name) for name in catalog.query_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops
    (approx sketches, LSH, streaming dedup) are omitted -> rows-only."""
    return {name: sql for name, sql in catalog.ORACLES.items() if sql}
